"""nanoT5-style T5 backbone variant, pure pytrees.

Re-design of the reference's compact T5 backbone
(reference: osuT5/osuT5/model/custom_transformers/t5.py:472 T5, :358 T5Stack,
:65 T5Attention; used by the legacy google/t5 configs via
modeling_mapperatorinator.py:19): RMSNorm pre-norm, bucketed relative
position bias on the first layer of each stack (shared T5-style), unscaled
attention, gated-GELU feed-forward, no biases. The encoder takes projected
mel embeddings directly (no conv frontend; the reference runs T5 with
project_encoder_input and inputs_embeds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import NEG_INF, merge_heads, split_heads
from .transformer import ModelDims, rms_norm

NUM_BUCKETS = 32
MAX_DISTANCE = 128


def relative_position_bucket(relative_position: np.ndarray,
                             bidirectional: bool = True,
                             num_buckets: int = NUM_BUCKETS,
                             max_distance: int = MAX_DISTANCE) -> np.ndarray:
    """T5's log-bucketed relative positions (host numpy; baked as constant)."""
    rp = relative_position.astype(np.int64)
    buckets = np.zeros_like(rp)
    if bidirectional:
        num_buckets //= 2
        buckets += (rp > 0).astype(np.int64) * num_buckets
        rp = np.abs(rp)
    else:
        rp = -np.minimum(rp, 0)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return buckets + np.where(is_small, rp, large)


def position_bias_table(tq: int, tk: int, bidirectional: bool) -> np.ndarray:
    """(tq, tk) bucket indices for the bias embedding lookup."""
    ctx = np.arange(tq)[:, None]
    mem = np.arange(tk)[None, :]
    return relative_position_bucket(mem - ctx, bidirectional=bidirectional)


def _dense(key, d_in, d_out, std=None, bias=False):
    std = std if std is not None else d_in ** -0.5
    p = {"w": jax.random.normal(key, (d_in, d_out)) * std}
    if bias:
        p["b"] = jnp.zeros(d_out)
    return p


def _init_t5_attn(key, dims: ModelDims, prefix=""):
    ks = jax.random.split(key, 4)
    d = dims.d_model
    inner = dims.num_heads * dims.head_dim
    return {
        f"{prefix}q": _dense(ks[0], d, inner, (d * dims.head_dim) ** -0.5),
        f"{prefix}k": _dense(ks[1], d, inner),
        f"{prefix}v": _dense(ks[2], d, inner),
        f"{prefix}o": _dense(ks[3], inner, d, inner ** -0.5),
    }


def _init_t5_layer(key, dims: ModelDims, cross=False):
    ks = jax.random.split(key, 5)
    d, ff = dims.d_model, dims.d_ff
    layer = {
        "ln1": {"g": jnp.ones(d)},
        **_init_t5_attn(ks[0], dims),
        "ln2": {"g": jnp.ones(d)},
        "wi0": _dense(ks[1], d, ff),
        "wi1": _dense(ks[2], d, ff),
        "wo": _dense(ks[3], ff, d, ff ** -0.5),
    }
    if cross:
        layer.update(_init_t5_attn(ks[4], dims, prefix="x"))
        layer["ln3"] = {"g": jnp.ones(d)}
    return layer


def init_t5_params(key, dims: ModelDims) -> dict:
    keys = jax.random.split(key, 8)
    enc_keys = jax.random.split(keys[0], dims.encoder_layers)
    dec_keys = jax.random.split(keys[1], dims.decoder_layers)
    return {
        # reference encoder_embedder is a biased nn.Linear (t5.py:481)
        "enc_proj": _dense(keys[2], dims.encoder_input_dim, dims.d_model, 0.02,
                           bias=True),
        "encoder": {
            "layers": jax.vmap(lambda k: _init_t5_layer(k, dims))(enc_keys),
            "lnf": {"g": jnp.ones(dims.d_model)},
            "rel_bias": jax.random.normal(keys[3], (NUM_BUCKETS, dims.num_heads)) * 0.02,
        },
        "decoder": {
            "layers": jax.vmap(lambda k: _init_t5_layer(k, dims, cross=True))(dec_keys),
            "lnf": {"g": jnp.ones(dims.d_model)},
            "rel_bias": jax.random.normal(keys[4], (NUM_BUCKETS, dims.num_heads)) * 0.02,
        },
        "dec_embed": jax.random.normal(keys[5], (dims.vocab_size_in, dims.d_model)),
        "lm_head": jax.random.normal(keys[6], (dims.d_model, dims.vocab_size_out))
        * dims.d_model ** -0.5,
    }


def _t5_attention(layer, h, bias, dims: ModelDims, *, is_causal,
                  kv_source=None, prefix=""):
    kv_in = h if kv_source is None else kv_source
    q = split_heads(h @ layer[f"{prefix}q"]["w"].astype(h.dtype), dims.num_heads)
    k = split_heads(kv_in @ layer[f"{prefix}k"]["w"].astype(h.dtype), dims.num_heads)
    v = split_heads(kv_in @ layer[f"{prefix}v"]["w"].astype(h.dtype), dims.num_heads)
    # T5 does not scale by sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    if is_causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(causal, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(h.dtype)
    return merge_heads(out) @ layer[f"{prefix}o"]["w"].astype(h.dtype)


def _t5_ff(layer, h):
    gelu = jax.nn.gelu(h @ layer["wi0"]["w"].astype(h.dtype), approximate=True)
    return (gelu * (h @ layer["wi1"]["w"].astype(h.dtype))) @ layer["wo"]["w"].astype(h.dtype)


def t5_encode(params, dims: ModelDims, cfg, audio, *, dtype=jnp.bfloat16):
    from ..ops.mel import mel_from_config  # noqa: PLC0415
    mel = mel_from_config(audio, cfg.model.spectrogram, dtype=dtype)
    x = mel @ params["enc_proj"]["w"].astype(dtype)
    if "b" in params["enc_proj"]:
        x = x + params["enc_proj"]["b"].astype(dtype)
    t = x.shape[1]
    buckets = position_bias_table(t, t, bidirectional=True)
    bias = params["encoder"]["rel_bias"].astype(jnp.float32)[buckets]  # (t,t,H)
    bias = bias.transpose(2, 0, 1)[None]  # (1,H,t,t)

    def layer_fn(h, layer):
        h = h + _t5_attention(layer, rms_norm(h, layer["ln1"]["g"]), bias,
                              dims, is_causal=False)
        h = h + _t5_ff(layer, rms_norm(h, layer["ln2"]["g"]))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["encoder"]["layers"])
    return rms_norm(x, params["encoder"]["lnf"]["g"])


def t5_decode_train(params, dims: ModelDims, decoder_input_ids, enc_hidden, *,
                    dtype=jnp.bfloat16):
    x = params["dec_embed"].astype(dtype)[decoder_input_ids]
    t = x.shape[1]
    buckets = position_bias_table(t, t, bidirectional=False)
    bias = params["decoder"]["rel_bias"].astype(jnp.float32)[buckets]
    bias = bias.transpose(2, 0, 1)[None]
    enc = enc_hidden.astype(dtype)

    def layer_fn(h, layer):
        h = h + _t5_attention(layer, rms_norm(h, layer["ln1"]["g"]), bias,
                              dims, is_causal=True)
        h = h + _t5_attention(layer, rms_norm(h, layer["ln3"]["g"]), None,
                              dims, is_causal=False, kv_source=enc, prefix="x")
        h = h + _t5_ff(layer, rms_norm(h, layer["ln2"]["g"]))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["decoder"]["layers"])
    x = rms_norm(x, params["decoder"]["lnf"]["g"])
    # T5 scales tied-head logits by d^-0.5; kept in the untied head init
    return (x @ params["lm_head"].astype(dtype)).astype(jnp.float32)
