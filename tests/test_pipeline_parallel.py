"""Pipeline-parallel (GPipe / shard_map+ppermute) correctness on the
8-virtual-CPU mesh: forward and gradient parity with the sequential
lax.scan layer stack, with the real production decoder layer body, and
composed DP x PP. SURVEY.md §2.4 "Pipeline parallel" row (the reference
has none — DDP only, osuT5/train.py:33-43)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from beatheritage_tpu.parallel.pipeline import pipelined


def _stage_mesh(n_stages: int, data: int = 1) -> Mesh:
    devs = np.asarray(jax.devices()[: n_stages * data])
    if data > 1:
        return Mesh(devs.reshape(data, n_stages), ("data", "stage"))
    return Mesh(devs.reshape(n_stages), ("stage",))


def _mlp_layers(key, n_layers, d):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (n_layers, d, d)) * (0.5 / np.sqrt(d)),
        "w2": jax.random.normal(k2, (n_layers, d, d)) * (0.5 / np.sqrt(d)),
    }


def _mlp_block(layer, h):
    return h + jnp.tanh(h @ layer["w1"]) @ layer["w2"]


def _sequential(block_fn, layers, x, *consts):
    def one(h, layer):
        return block_fn(layer, h, *consts), None

    out, _ = jax.lax.scan(one, x, layers)
    return out


def test_forward_matches_sequential():
    d, n_layers, batch = 16, 8, 8
    layers = _mlp_layers(jax.random.PRNGKey(0), n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 6, d))

    ref = _sequential(_mlp_block, layers, x)
    mesh = _stage_mesh(4)
    apply = pipelined(mesh, _mlp_block, num_microbatches=4)
    out = apply(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grad_matches_sequential():
    """jax.grad through the ppermute/scan pipeline == sequential grads,
    for both the stage-sharded layer params and the input batch."""
    d, n_layers, batch = 8, 4, 4
    layers = _mlp_layers(jax.random.PRNGKey(2), n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, 3, d))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (batch, 3, d))

    mesh = _stage_mesh(4)
    apply = pipelined(mesh, _mlp_block, num_microbatches=4)

    def loss_pp(layers, x):
        return jnp.mean((apply(layers, x) - tgt) ** 2)

    def loss_seq(layers, x):
        return jnp.mean((_sequential(_mlp_block, layers, x) - tgt) ** 2)

    g_pp = jax.grad(loss_pp, argnums=(0, 1))(layers, x)
    g_seq = jax.grad(loss_seq, argnums=(0, 1))(layers, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_pp),
                    jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_x_pp_mesh():
    """Same numbers on a (data=2, stage=4) mesh with the per-microbatch
    batch dim sharded over `data` — DP x PP composes with no code change."""
    d, n_layers, batch = 16, 8, 8
    layers = _mlp_layers(jax.random.PRNGKey(5), n_layers, d)
    x = jax.random.normal(jax.random.PRNGKey(6), (batch, 5, d))

    ref = _sequential(_mlp_block, layers, x)
    mesh = _stage_mesh(4, data=2)
    apply = pipelined(mesh, _mlp_block, num_microbatches=4,
                      batch_axis="data")
    out = apply(layers, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_production_decoder_layer_pipelined():
    """Pipeline the REAL decoder layer body (self-attn + cross-attn + FFN,
    models/transformer.py decode_train) across 4 stages: per-microbatch
    encoder hidden states ride mb_consts, RoPE tables ride shared_consts.
    Output must match the sequential scan used in production."""
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.models import ModelDims, init_params
    from beatheritage_tpu.models.transformer import decoder_block
    from beatheritage_tpu.ops.rope import rope_cos_sin
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(7), dims)
    layers = params["decoder"]["layers"]
    n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    n_stages = 4 if n_layers % 4 == 0 else 2
    if n_layers % n_stages:
        pytest.skip(f"tiny config has {n_layers} decoder layers (odd)")

    batch, t, s = 4, 10, 12
    x = jax.random.normal(jax.random.PRNGKey(8),
                          (batch, t, dims.d_model), jnp.float32) * 0.3
    enc = jax.random.normal(jax.random.PRNGKey(9),
                            (batch, s, dims.d_model), jnp.float32) * 0.3
    cos, sin = rope_cos_sin(
        jnp.arange(t), dims.head_dim, theta=dims.rope_theta, seq_len=t,
        max_position_embeddings=dims.max_target_positions,
        scaling_factor=dims.rope_decoder_scaling, rope_type=dims.rope_type,
        dtype=jnp.float32)

    block = decoder_block(dims)
    ref = _sequential(block, layers, x, enc, cos, sin)
    mesh = _stage_mesh(n_stages)
    apply = pipelined(mesh, block, num_microbatches=2)
    out = apply(layers, x, mb_consts=(enc,), shared_consts=(cos, sin))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
