"""NWhisper backbone: hypersphere-normalized (nGPT-style) encoder-decoder.

Faithful TPU-native port of the reference's NWhisper backbone (reference:
osuT5/osuT5/model/custom_transformers/modeling_nwhisper.py; used by the v27
model via configs/model/nwhisper_base.yaml), so reference checkpoints
convert bit-for-bit (train/convert.py::convert_nwhisper_state_dict):

- hidden states live on the unit hypersphere; every residual update is
  ``h = l2norm(lerp(h, l2norm(branch(h)), branch_scale))``
  (modeling_nwhisper.py:129 Residual)
- absolute positions are *lerped* in, not added: encoder sinusoids /
  decoder learned table, ``l2norm(lerp(x, pos, alpha_positions))``
  (:1271-1273, :1453-1455)
- NormLinear weights keep unit rows along their normalization axis —
  inputs-per-output for q/k/v/fc1/embeddings, outputs-per-input for
  out_proj/fc2 (norm_dim_in, :176-218); re-normalized after each optimizer
  step via `normalize_ngpt_params` (the torch register_step_post_hook)
- attention: q scaled by sqrt(head_dim) (cancelled by the qk-norm), q/k
  per-head l2-normalized and multiplied by a learned per-channel scale
  reshaped to heads (:531-535); softmax WITHOUT 1/sqrt(d)
- MLP is fc1 -> GELU -> fc2 (:832-837); logits = proj_out(h) * logit_scale
  (:2135-2136)

Learned ``Scale`` parameters are stored exactly as the checkpoint stores
them and multiplied by their static ``forward_scale = init / scale`` in the
forward (Scale.forward, :122-124); the defaults below mirror
configuration_nwhisper.py:50-73.

Layers are stacked on a leading axis and applied with lax.scan. The mel
frontend / conditioning embedders are shared with the main model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import NEG_INF, merge_heads, split_heads
from .transformer import ModelDims, _conv1d
from .whisper import sinusoidal_positions

# configuration_nwhisper.py defaults: forward_scale = init / scale
ALPHA_INIT = 0.05          # encoder/decoder alpha_attn / alpha_ff / alpha_cross
ALPHA_POS_INIT = 0.1       # encoder/decoder alpha_pos
S_QK_INIT = 1.0            # qk scale: init 1, scale d_model**-1
S_LOGIT_INIT = 1.0         # logit scale: init 1, scale d_model**-0.5


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2): x / max(||x||, eps)."""
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    return (x32 / jnp.maximum(n, eps)).astype(x.dtype)


def _norm_linear(key, d_in, d_out, *, norm_dim_in=True, bias=False):
    w = jax.random.normal(key, (d_in, d_out)) * 0.02
    p = {"w": l2norm(w, axis=0 if norm_dim_in else 1)}
    if bias:
        p["b"] = jnp.zeros(d_out)
    return p


def _scale(d, init_value: float):
    """Stored scale parameter (Scale.scale); init = the `scale` hyperparam."""
    return {"s": jnp.full((d,), init_value)}


def _init_ngpt_attn(key, dims: ModelDims, cross=False):
    ks = jax.random.split(key, 5)
    p = "x" if cross else ""
    d = dims.d_model
    return {
        f"{p}q": _norm_linear(ks[0], d, d, bias=True),
        f"{p}k": _norm_linear(ks[1], d, d),
        f"{p}v": _norm_linear(ks[2], d, d, bias=True),
        f"{p}o": _norm_linear(ks[3], d, d, norm_dim_in=False, bias=True),
        f"{p}sqk": _scale(d, 1.0 / d),  # Scale(d, init=1, scale=d**-1)
    }


def _init_ngpt_layer(key, dims: ModelDims, cross=False):
    ks = jax.random.split(key, 4)
    d, ff = dims.d_model, dims.d_ff
    layer = {
        **_init_ngpt_attn(ks[0], dims),
        "alpha_attn": _scale(d, d ** -0.5),
        "ff1": _norm_linear(ks[1], d, ff),
        "ff2": _norm_linear(ks[2], ff, d, norm_dim_in=False),
        "alpha_mlp": _scale(d, d ** -0.5),
    }
    if cross:
        layer.update(_init_ngpt_attn(ks[3], dims, cross=True))
        layer["alpha_cross"] = _scale(d, d ** -0.5)
    return layer


def init_ngpt_params(key, dims: ModelDims) -> dict:
    keys = jax.random.split(key, 9)
    enc_keys = jax.random.split(keys[0], dims.encoder_layers)
    dec_keys = jax.random.split(keys[1], dims.decoder_layers)
    d = dims.d_model
    params = {
        "encoder": {
            "conv1": {"w": jax.random.normal(
                keys[2], (3, dims.d_model if dims.project_encoder_input
                          else dims.encoder_input_dim, d)) * 0.02,
                "b": jnp.zeros(d)},
            "conv2": {"w": jax.random.normal(keys[3], (3, d, d)) * 0.02,
                      "b": jnp.zeros(d)},
            "pos": jnp.asarray(sinusoidal_positions(dims.max_source_positions, d)),
            "alpha_pos": _scale(d, d ** -0.5),
            "layers": jax.vmap(lambda k: _init_ngpt_layer(k, dims))(enc_keys),
        },
        "decoder": {
            "pos": jax.random.normal(keys[4], (dims.max_target_positions, d)) * 0.02,
            "alpha_pos": _scale(d, d ** -0.5),
            "layers": jax.vmap(lambda k: _init_ngpt_layer(k, dims, cross=True))(dec_keys),
        },
        "dec_embed": l2norm(jax.random.normal(keys[5], (dims.vocab_size_in, d))),
        "lm_head": l2norm(jax.random.normal(keys[6], (d, dims.vocab_size_out)), axis=0),
        "sz": _scale(dims.vocab_size_out, d ** -0.5),
    }
    if dims.project_encoder_input:
        params["enc_proj"] = _norm_linear(keys[7], dims.encoder_input_dim, d)
    return params


def normalize_ngpt_params(params) -> dict:
    """Re-project all NormLinear weights/embeddings onto the unit sphere —
    call after each optimizer step (reference norm_weights_ hooks,
    modeling_nwhisper.py:1094-1101). out_proj ("o"/"xo") and fc2 ("ff2")
    normalize along the output axis (norm_dim_in=False)."""
    out_axis_names = {"o", "xo", "ff2"}

    def renorm(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if not hasattr(leaf, "ndim"):
            return leaf
        if names[-1] == "dec_embed":
            return l2norm(leaf, axis=-1)
        if names[-1] == "lm_head":
            return l2norm(leaf, axis=-2)
        if names[-1] == "w" and leaf.ndim >= 2 and "conv" not in names[-2]:
            axis = -1 if names[-2] in out_axis_names else -2
            return l2norm(leaf, axis=axis)
        return leaf
    return jax.tree_util.tree_map_with_path(renorm, params)


def _lerp_norm(h, branch, alpha):
    """Residual slerp update: l2norm(h.lerp(branch, alpha))."""
    return l2norm(h + alpha.astype(jnp.float32) * (branch.astype(jnp.float32) - h))


def _apply_nl(x, p):
    out = x @ p["w"].astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _ngpt_attention(layer, h, dims: ModelDims, *, is_causal, kv_source=None,
                    prefix=""):
    kv_in = h if kv_source is None else kv_source
    # q_proj output scaled by sqrt(head_dim) (modeling_nwhisper.py:457,502);
    # the per-head l2norm below cancels it, kept for exactness
    q = split_heads(_apply_nl(h, layer[f"{prefix}q"]) * dims.head_dim ** 0.5,
                    dims.num_heads)
    k = split_heads(_apply_nl(kv_in, layer[f"{prefix}k"]), dims.num_heads)
    v = split_heads(_apply_nl(kv_in, layer[f"{prefix}v"]), dims.num_heads)
    # sqk stored (d_model,), effective = stored * d_model (init/scale = d),
    # rearranged '(h d) -> h 1 d' (modeling_nwhisper.py:532-535)
    sqk = (layer[f"{prefix}sqk"]["s"].astype(jnp.float32) * dims.d_model)
    sqk = sqk.reshape(dims.num_heads, 1, dims.head_dim)
    q = sqk * l2norm(q)
    k = sqk * l2norm(k)
    # qk-normed attention: plain q @ k^T, no 1/sqrt(d) (:537,544)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if is_causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        logits = jnp.where(causal, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=jnp.float32).astype(h.dtype)
    return _apply_nl(merge_heads(out), layer[f"{prefix}o"])


def _ngpt_mlp(layer, h):
    return _apply_nl(jax.nn.gelu(_apply_nl(h, layer["ff1"]), approximate=False),
                     layer["ff2"])


def _alpha(scale_p, d: int, init: float) -> jnp.ndarray:
    """Effective Scale value: stored * forward_scale (init / d**-0.5)."""
    return scale_p["s"].astype(jnp.float32) * (init * d ** 0.5)


def _encoder_layer_fn(dims: ModelDims):
    d = dims.d_model

    def layer_fn(h, layer):
        attn = l2norm(_ngpt_attention(layer, h, dims, is_causal=False))
        h = _lerp_norm(h, attn, _alpha(layer["alpha_attn"], d, ALPHA_INIT))
        mlp = l2norm(_ngpt_mlp(layer, h))
        h = _lerp_norm(h, mlp, _alpha(layer["alpha_mlp"], d, ALPHA_INIT))
        return h, None
    return layer_fn


def ngpt_encode(params, dims: ModelDims, cfg, audio, *, dtype=jnp.bfloat16):
    from ..ops.mel import mel_from_config  # noqa: PLC0415
    mel = mel_from_config(audio, cfg.model.spectrogram, dtype=dtype)
    return ngpt_encode_embeds(params, dims, mel, dtype=dtype)


def ngpt_encode_embeds(params, dims: ModelDims, x, *, dtype=jnp.bfloat16):
    d = dims.d_model
    x = x.astype(dtype)
    if dims.project_encoder_input:
        x = _apply_nl(x, params["enc_proj"])
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv1"]), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv2"], stride=2), approximate=False)
    x = l2norm(x).astype(jnp.float32)
    pos = params["encoder"]["pos"][:x.shape[1]].astype(jnp.float32)
    alpha_pos = _alpha(params["encoder"]["alpha_pos"], d, ALPHA_POS_INIT)
    x = l2norm(x + alpha_pos * (pos - x)).astype(dtype)
    x, _ = jax.lax.scan(_encoder_layer_fn(dims), x, params["encoder"]["layers"])
    return x


def ngpt_decode_train(params, dims: ModelDims, decoder_input_ids, enc_hidden,
                      *, dtype=jnp.bfloat16):
    d = dims.d_model
    x = params["dec_embed"][decoder_input_ids].astype(jnp.float32)
    pos = params["decoder"]["pos"][:x.shape[1]].astype(jnp.float32)
    alpha_pos = _alpha(params["decoder"]["alpha_pos"], d, ALPHA_POS_INIT)
    x = l2norm(x + alpha_pos * (pos - x)).astype(dtype)
    enc = enc_hidden.astype(dtype)

    def layer_fn(h, layer):
        attn = l2norm(_ngpt_attention(layer, h, dims, is_causal=True))
        h = _lerp_norm(h, attn, _alpha(layer["alpha_attn"], d, ALPHA_INIT))
        cross = l2norm(_ngpt_attention(layer, h, dims, is_causal=False,
                                       kv_source=enc, prefix="x"))
        h = _lerp_norm(h, cross, _alpha(layer["alpha_cross"], d, ALPHA_INIT))
        mlp = l2norm(_ngpt_mlp(layer, h))
        h = _lerp_norm(h, mlp, _alpha(layer["alpha_mlp"], d, ALPHA_INIT))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["decoder"]["layers"])
    # logits = proj_out(h) * logit_scale (:2135-2136); logit forward_scale
    # = 1 / d**-0.5 = sqrt(d)
    logits = x @ params["lm_head"].astype(x.dtype)
    sz = params["sz"]["s"].astype(jnp.float32) * d ** 0.5
    return logits.astype(jnp.float32) * sz
