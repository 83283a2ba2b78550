"""NWhisper-style hypersphere-normalized (nGPT) backbone variant.

Re-design of the reference's NWhisper backbone (reference:
osuT5/osuT5/model/custom_transformers/modeling_nwhisper.py: l2norm
everywhere, NormLinear with weight re-normalization hooks (:204,1094,1101),
learned Scale params, residual lerp (Residual:129), qk-norm attention
(:533-534)) following the nGPT recipe:

- hidden states live on the unit hypersphere: every residual update is a
  lerp toward the (normalized) branch output followed by re-normalization
- all weight matrices keep unit-norm rows (re-normalized after each
  optimizer step via `normalize_ngpt_params`, the JAX equivalent of the
  torch register_step_post_hook)
- attention q/k are per-head l2-normalized with a learned per-dim scale and
  a sqrt(head_dim) softmax scale; the FFN is SwiGLU with learned u/v scales
- logits come from a normalized head with a learned output scale

Shares the mel frontend and conditioning embedders with the main model.
Covers training and teacher-forced paths; incremental decode for this
variant lands with a follow-up (the main RoPEWhisper variant is the
production decode path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF, merge_heads, split_heads
from ..ops.rope import apply_rope, rope_cos_sin
from .transformer import ModelDims, _conv1d


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    out = x32 * jax.lax.rsqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True) + eps)
    return out.astype(x.dtype)


def _norm_linear(key, d_in, d_out):
    w = jax.random.normal(key, (d_in, d_out))
    return {"w": l2norm(w, axis=0)}  # unit-norm columns (per output feature)


def _scale(d, init: float = 1.0):
    return {"s": jnp.full((d,), init)}


def _init_ngpt_attn(key, dims: ModelDims, cross=False):
    ks = jax.random.split(key, 5)
    prefix = "x" if cross else ""
    d = dims.d_model
    return {
        f"{prefix}q": _norm_linear(ks[0], d, d),
        f"{prefix}k": _norm_linear(ks[1], d, d),
        f"{prefix}v": _norm_linear(ks[2], d, d),
        f"{prefix}o": _norm_linear(ks[3], d, d),
        f"{prefix}sqk": _scale(dims.head_dim),
    }


def _init_ngpt_layer(key, dims: ModelDims, cross=False):
    ks = jax.random.split(key, 6)
    d, ff = dims.d_model, dims.d_ff
    layer = {
        **_init_ngpt_attn(ks[0], dims),
        "alpha_attn": jnp.full((d,), 0.05),
        "ffu": _norm_linear(ks[1], d, ff),
        "ffv": _norm_linear(ks[2], d, ff),
        "ffo": _norm_linear(ks[3], ff, d),
        "su": _scale(ff), "sv": _scale(ff),
        "alpha_mlp": jnp.full((d,), 0.05),
    }
    if cross:
        layer.update(_init_ngpt_attn(ks[4], dims, cross=True))
        layer["alpha_cross"] = jnp.full((d,), 0.05)
    return layer


def init_ngpt_params(key, dims: ModelDims) -> dict:
    keys = jax.random.split(key, 8)
    enc_keys = jax.random.split(keys[0], dims.encoder_layers)
    dec_keys = jax.random.split(keys[1], dims.decoder_layers)
    params = {
        "encoder": {
            "conv1": {"w": jax.random.normal(
                keys[2], (3, dims.d_model if dims.project_encoder_input
                          else dims.encoder_input_dim, dims.d_model)) * 0.02,
                "b": jnp.zeros(dims.d_model)},
            "conv2": {"w": jax.random.normal(keys[3], (3, dims.d_model, dims.d_model)) * 0.02,
                      "b": jnp.zeros(dims.d_model)},
            "layers": jax.vmap(lambda k: _init_ngpt_layer(k, dims))(enc_keys),
        },
        "decoder": {
            "layers": jax.vmap(lambda k: _init_ngpt_layer(k, dims, cross=True))(dec_keys),
        },
        "dec_embed": l2norm(jax.random.normal(keys[4], (dims.vocab_size_in, dims.d_model))),
        "lm_head": l2norm(jax.random.normal(keys[5], (dims.d_model, dims.vocab_size_out)), axis=0),
        "sz": _scale(dims.vocab_size_out, 1.0),
    }
    if dims.project_encoder_input:
        params["enc_proj"] = _norm_linear(keys[6], dims.encoder_input_dim, dims.d_model)
    return params


def normalize_ngpt_params(params) -> dict:
    """Re-project all NormLinear weights/embeddings onto the unit sphere —
    call after each optimizer step (reference norm_weights_ hooks)."""
    def renorm(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if not hasattr(leaf, "ndim"):
            return leaf
        if names[-1] == "dec_embed":
            return l2norm(leaf, axis=-1)
        if names[-1] == "lm_head":
            return l2norm(leaf, axis=0)
        if names[-1] == "w" and leaf.ndim >= 2 and "conv" not in names[-2]:
            return l2norm(leaf, axis=-2)
        return leaf
    return jax.tree_util.tree_map_with_path(renorm, params)


def _lerp_norm(h, branch, alpha):
    return l2norm(h + alpha * (branch - h))


def _ngpt_attention(layer, h, cos, sin, dims: ModelDims, *, is_causal,
                    kv_source=None, prefix=""):
    kv_in = h if kv_source is None else kv_source
    q = split_heads(h @ layer[f"{prefix}q"]["w"].astype(h.dtype), dims.num_heads)
    k = split_heads(kv_in @ layer[f"{prefix}k"]["w"].astype(h.dtype), dims.num_heads)
    v = split_heads(kv_in @ layer[f"{prefix}v"]["w"].astype(h.dtype), dims.num_heads)
    if kv_source is None and cos is not None:
        q, k = apply_rope(q, k, cos, sin)
    sqk = layer[f"{prefix}sqk"]["s"].astype(jnp.float32)
    q = l2norm(q) * sqk
    k = l2norm(k) * sqk
    scale = dims.head_dim ** 0.5  # qk-normed attention uses sqrt(d) gain
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if is_causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(causal, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(h.dtype)
    return merge_heads(out) @ layer[f"{prefix}o"]["w"].astype(h.dtype)


def _ngpt_mlp(layer, h):
    u = (h @ layer["ffu"]["w"].astype(h.dtype)) * layer["su"]["s"].astype(h.dtype)
    v = (h @ layer["ffv"]["w"].astype(h.dtype)) * layer["sv"]["s"].astype(h.dtype)
    return (u * jax.nn.silu(v)) @ layer["ffo"]["w"].astype(h.dtype)


def ngpt_encode(params, dims: ModelDims, cfg, audio, *, dtype=jnp.bfloat16):
    from ..ops.mel import mel_from_config  # noqa: PLC0415
    mel = mel_from_config(audio, cfg.model.spectrogram, dtype=dtype)
    x = mel
    if dims.project_encoder_input:
        x = x @ params["enc_proj"]["w"].astype(dtype)
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv1"]), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv2"], stride=2), approximate=False)
    x = l2norm(x)
    t = x.shape[1]
    cos, sin = rope_cos_sin(jnp.arange(t), dims.head_dim, theta=dims.rope_theta,
                            rope_type="static", dtype=dtype)

    def layer_fn(h, layer):
        attn = l2norm(_ngpt_attention(layer, h, cos, sin, dims, is_causal=False))
        h = _lerp_norm(h, attn, layer["alpha_attn"].astype(h.dtype))
        mlp = l2norm(_ngpt_mlp(layer, h))
        h = _lerp_norm(h, mlp, layer["alpha_mlp"].astype(h.dtype))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["encoder"]["layers"])
    return x


def ngpt_decode_train(params, dims: ModelDims, decoder_input_ids, enc_hidden,
                      *, dtype=jnp.bfloat16):
    x = l2norm(params["dec_embed"].astype(dtype)[decoder_input_ids])
    t = x.shape[1]
    cos, sin = rope_cos_sin(jnp.arange(t), dims.head_dim, theta=dims.rope_theta,
                            rope_type="static", dtype=dtype)
    enc = enc_hidden.astype(dtype)

    def layer_fn(h, layer):
        attn = l2norm(_ngpt_attention(layer, h, cos, sin, dims, is_causal=True))
        h = _lerp_norm(h, attn, layer["alpha_attn"].astype(h.dtype))
        cross = l2norm(_ngpt_attention(layer, h, None, None, dims,
                                       is_causal=False, kv_source=enc,
                                       prefix="x"))
        h = _lerp_norm(h, cross, layer["alpha_cross"].astype(h.dtype))
        mlp = l2norm(_ngpt_mlp(layer, h))
        h = _lerp_norm(h, mlp, layer["alpha_mlp"].astype(h.dtype))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["decoder"]["layers"])
    logits = (x @ params["lm_head"].astype(dtype)) * params["sz"]["s"].astype(dtype)
    return logits.astype(jnp.float32)
