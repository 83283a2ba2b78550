"""Vanilla Whisper backbone variant (absolute positions, LayerNorm).

The reference's v19-v26 / v28 / v29 models wrap an unmodified HuggingFace
``openai/whisper-*`` backbone (reference:
osuT5/osuT5/model/modeling_mapperatorinator.py:19 get_backbone_model,
configs/model/whisper_base.yaml name 'openai/whisper-base'). This module is
the TPU-native equivalent so those checkpoints convert and run here:

- encoder: conv1(k3) GELU -> conv2(k3, stride 2) GELU -> + absolute position
  table (sinusoidal at init, stored in the checkpoint) -> pre-LN layers
  (LayerNorm with bias) -> final LayerNorm
- decoder: token embedding + learned absolute positions -> pre-LN layers
  with cross-attention -> final LayerNorm -> lm head
- attention: q/v/out biased, k unbiased, 1/sqrt(head_dim) scaling

Layers are stacked on a leading axis and applied with lax.scan, like the
main RoPE model (models/transformer.py). Conversion from PyTorch state
dicts lives in train/convert.py::convert_whisper_state_dict.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, merge_heads, split_heads
from .transformer import ModelDims, _conv1d, _dense, _linear

LN_EPS = 1e-5


def layer_norm(x, g, b, eps: float = LN_EPS):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def sinusoidal_positions(length: int, d_model: int) -> np.ndarray:
    """Whisper's sinusoid table: sin in the first half, cos in the second."""
    half = d_model // 2
    log_timescale = np.log(10000.0) / (half - 1)
    inv = np.exp(-log_timescale * np.arange(half))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _init_ln(d):
    return {"g": jnp.ones(d), "b": jnp.zeros(d)}


def _init_attn(key, d, std, cross=False):
    ks = jax.random.split(key, 4)
    p = "x" if cross else ""
    return {
        f"{p}q": _dense(ks[0], d, d, std),
        f"{p}k": _dense(ks[1], d, d, std, bias=False),
        f"{p}v": _dense(ks[2], d, d, std),
        f"{p}o": _dense(ks[3], d, d, std),
    }


def _init_encoder_layer(key, dims: ModelDims, std=0.02):
    k_attn, k1, k2 = jax.random.split(key, 3)
    return {
        "ln1": _init_ln(dims.d_model),
        **_init_attn(k_attn, dims.d_model, std),
        "ln2": _init_ln(dims.d_model),
        "ff1": _dense(k1, dims.d_model, dims.d_ff, std),
        "ff2": _dense(k2, dims.d_ff, dims.d_model, std),
    }


def _init_decoder_layer(key, dims: ModelDims, std=0.02):
    ks, kx, k1, k2 = jax.random.split(key, 4)
    return {
        "ln1": _init_ln(dims.d_model),
        **_init_attn(ks, dims.d_model, std),
        "ln2": _init_ln(dims.d_model),
        **_init_attn(kx, dims.d_model, std, cross=True),
        "ln3": _init_ln(dims.d_model),
        "ff1": _dense(k1, dims.d_model, dims.d_ff, std),
        "ff2": _dense(k2, dims.d_ff, dims.d_model, std),
    }


def init_whisper_params(key, dims: ModelDims, std: float = 0.02) -> dict:
    keys = jax.random.split(key, 10)
    enc_keys = jax.random.split(keys[0], dims.encoder_layers)
    dec_keys = jax.random.split(keys[1], dims.decoder_layers)
    params = {
        "encoder": {
            "conv1": {"w": jax.random.normal(
                keys[2], (3, dims.d_model if dims.project_encoder_input
                          else dims.encoder_input_dim, dims.d_model)) * std,
                "b": jnp.zeros(dims.d_model)},
            "conv2": {"w": jax.random.normal(keys[3], (3, dims.d_model, dims.d_model)) * std,
                      "b": jnp.zeros(dims.d_model)},
            "pos": jnp.asarray(sinusoidal_positions(dims.max_source_positions,
                                                    dims.d_model)),
            "layers": jax.vmap(lambda k: _init_encoder_layer(k, dims, std))(enc_keys),
            "lnf": _init_ln(dims.d_model),
        },
        "decoder": {
            "pos": jax.random.normal(keys[4], (dims.max_target_positions,
                                               dims.d_model)) * std,
            "layers": jax.vmap(lambda k: _init_decoder_layer(k, dims, std))(dec_keys),
            "lnf": _init_ln(dims.d_model),
        },
        "dec_embed": jax.random.normal(keys[5], (dims.vocab_size_in, dims.d_model)) * std,
        "lm_head": jax.random.normal(keys[6], (dims.d_model, dims.vocab_size_out)) * std,
        "cond": {},
    }
    if dims.project_encoder_input:
        params["enc_proj"] = _dense(keys[7], dims.encoder_input_dim, dims.d_model, std)
    return params


def _self_attention(layer, x, num_heads, *, is_causal, mask=None):
    q = split_heads(_linear(x, layer["q"]), num_heads)
    k = split_heads(_linear(x, layer["k"]), num_heads)
    v = split_heads(_linear(x, layer["v"]), num_heads)
    out = dot_product_attention(q, k, v, is_causal=is_causal, mask=mask)
    return _linear(merge_heads(out), layer["o"])


def _ffn(layer, x):
    return _linear(jax.nn.gelu(_linear(x, layer["ff1"]), approximate=False),
                   layer["ff2"])


def whisper_encode(params, dims: ModelDims, cfg, audio, *, beatmap_idx=None,
                   difficulty=None, mapper_idx=None, song_position=None,
                   dtype=jnp.bfloat16) -> jnp.ndarray:
    """Raw audio (B, n_samples) -> encoder hidden states (B, S/2, D)."""
    from ..ops.mel import mel_from_config  # noqa: PLC0415
    from .transformer import build_condition_vector  # noqa: PLC0415
    from .embedders import apply_label_embedder  # noqa: PLC0415

    mel = mel_from_config(audio, cfg.model.spectrogram, dtype=dtype)
    b, s, _ = mel.shape
    feats = [mel]
    if dims.do_style_embed:
        idx = beatmap_idx if beatmap_idx is not None else jnp.full((b,), dims.num_classes, jnp.int32)
        style = apply_label_embedder(params["cond"]["style"], idx).astype(dtype)
        feats.append(jnp.broadcast_to(style[:, None, :], (b, s, style.shape[-1])))
    cond = build_condition_vector(params, dims, b, difficulty, mapper_idx,
                                  song_position, dtype)
    if cond is not None:
        feats.append(jnp.broadcast_to(cond[:, None, :], (b, s, cond.shape[-1])))
    x = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else mel
    if dims.project_encoder_input:
        x = _linear(x, params["enc_proj"])
    return whisper_encode_embeds(params, dims, x, dtype=dtype)


def whisper_encode_embeds(params, dims: ModelDims, x, *, dtype=jnp.bfloat16):
    """Projected encoder input (B, S, D_in) -> hidden states (B, S/2, D)."""
    x = x.astype(dtype)
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv1"]), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv2"], stride=2), approximate=False)
    t = x.shape[1]
    x = x + params["encoder"]["pos"][:t].astype(dtype)

    def layer_fn(h, layer):
        h = h + _self_attention(layer, layer_norm(h, layer["ln1"]["g"], layer["ln1"]["b"]),
                                dims.num_heads, is_causal=False)
        h = h + _ffn(layer, layer_norm(h, layer["ln2"]["g"], layer["ln2"]["b"]))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["encoder"]["layers"])
    return layer_norm(x, params["encoder"]["lnf"]["g"], params["encoder"]["lnf"]["b"])


def whisper_decode_train(params, dims: ModelDims, decoder_input_ids, enc_hidden,
                         *, decoder_attention_mask: Optional[jnp.ndarray] = None,
                         encoder_attention_mask: Optional[jnp.ndarray] = None,
                         dtype=jnp.bfloat16) -> jnp.ndarray:
    """Teacher-forced decode: token ids (B, T) -> logits (B, T, vocab_out)."""
    x = params["dec_embed"].astype(dtype)[decoder_input_ids]
    t = x.shape[1]
    x = x + params["decoder"]["pos"][:t].astype(dtype)

    self_mask = None
    if decoder_attention_mask is not None:
        self_mask = decoder_attention_mask[:, None, None, :].astype(bool)
    cross_mask = None
    if encoder_attention_mask is not None:
        cross_mask = encoder_attention_mask[:, None, None, :].astype(bool)
    enc = enc_hidden.astype(dtype)

    def layer_fn(h, layer):
        h = h + _self_attention(layer, layer_norm(h, layer["ln1"]["g"], layer["ln1"]["b"]),
                                dims.num_heads, is_causal=True, mask=self_mask)
        hn = layer_norm(h, layer["ln2"]["g"], layer["ln2"]["b"])
        q = split_heads(_linear(hn, layer["xq"]), dims.num_heads)
        k = split_heads(_linear(enc, layer["xk"]), dims.num_heads)
        v = split_heads(_linear(enc, layer["xv"]), dims.num_heads)
        cross = dot_product_attention(q, k, v, mask=cross_mask)
        h = h + _linear(merge_heads(cross), layer["xo"])
        h = h + _ffn(layer, layer_norm(h, layer["ln3"]["g"], layer["ln3"]["b"]))
        return h, None

    x, _ = jax.lax.scan(layer_fn, x, params["decoder"]["layers"])
    x = layer_norm(x, params["decoder"]["lnf"]["g"], params["decoder"]["lnf"]["b"])
    return (x @ params["lm_head"].astype(dtype)).astype(jnp.float32)
