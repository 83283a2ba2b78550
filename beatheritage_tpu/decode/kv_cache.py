"""Preallocated KV caches for the jitted decode loop.

TPU-native equivalent of the reference's StaticCache pair (decoder self-attn
sized to target positions, encoder cross-attn precomputed once per window;
reference: osuT5/osuT5/inference/cache_utils.py:7-37). Cross-attention K/V are
computed a single time from the encoder output instead of cached lazily.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.transformer import ModelDims


def init_self_cache(dims: ModelDims, batch: int, max_len: int,
                    dtype=jnp.bfloat16) -> dict:
    shape = (dims.decoder_layers, batch, dims.num_heads, max_len, dims.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def precompute_cross_kv(params, dims: ModelDims, enc_hidden: jnp.ndarray,
                        dtype=jnp.bfloat16) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder hidden (B, S, D) -> per-layer cross K/V (L, B, H, S, Dh)."""
    enc = enc_hidden.astype(dtype)

    def one_layer(layer):
        k = enc @ layer["xk"]["w"].astype(dtype)
        v = enc @ layer["xv"]["w"].astype(dtype) + layer["xv"]["b"].astype(dtype)
        b, s, d = k.shape
        k = k.reshape(b, s, dims.num_heads, dims.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, dims.num_heads, dims.head_dim).transpose(0, 2, 1, 3)
        return k, v

    return jax.vmap(one_layer)(params["decoder"]["layers"])
