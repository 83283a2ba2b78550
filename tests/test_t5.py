"""nanoT5 backbone variant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.models import ModelDims
from beatheritage_tpu.models.t5 import (
    init_t5_params,
    position_bias_table,
    relative_position_bucket,
    t5_decode_train,
    t5_encode,
)
from beatheritage_tpu.tokenizer import Tokenizer


def _setup():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_t5_params(jax.random.PRNGKey(0), dims)
    return cfg, tok, dims, params


def test_relative_position_buckets():
    rp = np.array([[-130, -5, -1, 0, 1, 5, 130]])
    bi = relative_position_bucket(rp, bidirectional=True)
    # sign split: negatives in [0,16), positives offset by 16
    assert (bi[0, :3] < 16).all() and (bi[0, 4:] >= 16).all()
    assert bi[0, 3] == 0
    uni = relative_position_bucket(rp, bidirectional=False)
    # causal buckets: future positions (rp>0) collapse to bucket 0
    assert (uni[0, 4:] == 0).all()
    assert uni[0, 0] == 31  # clamped at max bucket
    tbl = position_bias_table(4, 4, bidirectional=False)
    assert tbl.shape == (4, 4)
    assert (np.diag(tbl) == 0).all()


def test_t5_forward_shapes_and_finite():
    cfg, tok, dims, params = _setup()
    b, t_dec = 2, 12
    audio = jnp.asarray(
        np.random.RandomState(0).randn(
            b, (cfg.data.src_seq_len - 1) * cfg.data.hop_length),
        jnp.float32)
    enc = t5_encode(params, dims, cfg, audio, dtype=jnp.float32)
    # no conv frontend: encoder seq == mel frames == src_seq_len
    assert enc.shape == (b, cfg.data.src_seq_len, dims.d_model)
    ids = jnp.ones((b, t_dec), jnp.int32)
    logits = t5_decode_train(params, dims, ids, enc, dtype=jnp.float32)
    assert logits.shape == (b, t_dec, tok.vocab_size_out)
    assert np.isfinite(np.asarray(logits)).all()


def test_t5_decoder_causality():
    cfg, tok, dims, params = _setup()
    enc = jnp.zeros((1, 16, dims.d_model))
    ids = jnp.arange(1, 9, dtype=jnp.int32)[None, :] % dims.vocab_size_in
    base = np.asarray(t5_decode_train(params, dims, ids, enc, dtype=jnp.float32))
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % dims.vocab_size_in)
    pert = np.asarray(t5_decode_train(params, dims, ids2, enc, dtype=jnp.float32))
    # changing the last input token must not affect earlier positions
    np.testing.assert_allclose(base[0, :-1], pert[0, :-1], atol=1e-5)
    assert not np.allclose(base[0, -1], pert[0, -1])


def test_t5_gradients_flow():
    cfg, tok, dims, params = _setup()
    enc = jnp.ones((1, 8, dims.d_model)) * 0.1
    ids = jnp.ones((1, 4), jnp.int32)

    def loss_fn(p):
        return t5_decode_train(p, dims, ids, enc, dtype=jnp.float32).mean()

    grads = jax.grad(loss_fn)(params)
    g = grads["decoder"]["layers"]["q"]["w"]
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
    assert float(jnp.abs(grads["decoder"]["rel_bias"]).sum()) > 0
