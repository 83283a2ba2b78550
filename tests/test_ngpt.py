"""NWhisper (nGPT hypersphere) backbone variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.models import ModelDims
from beatheritage_tpu.models.ngpt import (
    init_ngpt_params,
    l2norm,
    ngpt_decode_train,
    ngpt_encode,
    normalize_ngpt_params,
)
from beatheritage_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_ngpt_params(jax.random.PRNGKey(0), dims)
    return cfg, tok, dims, params


def test_forward_shapes_and_unit_norm_hidden(setup):
    cfg, tok, dims, params = setup
    audio = jax.random.normal(jax.random.PRNGKey(1),
                              (2, (cfg.data.src_seq_len - 1) * cfg.data.hop_length))
    enc = ngpt_encode(params, dims, cfg, audio, dtype=jnp.float32)
    # encoder states live on the unit hypersphere
    norms = np.linalg.norm(np.asarray(enc), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    ids = jnp.ones((2, 12), jnp.int32)
    logits = ngpt_decode_train(params, dims, ids, enc, dtype=jnp.float32)
    assert logits.shape == (2, 12, tok.vocab_size_out)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_causality(setup):
    cfg, tok, dims, params = setup
    enc = l2norm(jax.random.normal(jax.random.PRNGKey(2), (1, 8, dims.d_model)))
    a = jnp.array([[1, 5, 6, 7]], jnp.int32)
    b = jnp.array([[1, 5, 6, 9]], jnp.int32)
    la = ngpt_decode_train(params, dims, a, enc, dtype=jnp.float32)
    lb = ngpt_decode_train(params, dims, b, enc, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(la[:, :3]), np.asarray(lb[:, :3]), atol=1e-5)


def test_weight_renormalization(setup):
    cfg, tok, dims, params = setup
    # perturb weights off the sphere, renormalize, check unit columns
    noisy = jax.tree.map(lambda x: x * 1.7, params)
    fixed = normalize_ngpt_params(noisy)
    w = np.asarray(fixed["decoder"]["layers"]["q"]["w"][0])
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-4)
    emb = np.asarray(fixed["dec_embed"])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)
    # scales/convs untouched by renorm
    np.testing.assert_allclose(np.asarray(fixed["sz"]["s"]),
                               np.asarray(noisy["sz"]["s"]))


def test_gradients_flow(setup):
    cfg, tok, dims, params = setup
    audio = jax.random.normal(jax.random.PRNGKey(3),
                              (1, (cfg.data.src_seq_len - 1) * cfg.data.hop_length))
    ids = jnp.ones((1, 8), jnp.int32)
    labels = jnp.ones((1, 8), jnp.int32)

    def loss(p):
        enc = ngpt_encode(p, dims, cfg, audio, dtype=jnp.float32)
        logits = ngpt_decode_train(p, dims, ids, enc, dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(logp, labels[..., None], -1).mean()

    value, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(value))
    g = sum(float(jnp.sum(x * x)) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(g) and g > 0
