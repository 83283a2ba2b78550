"""Rotary position embeddings with dynamic-NTK length extension.

Replaces the reference's LlamaRotaryEmbedding in the RoPEWhisper backbone
(reference: osuT5/osuT5/model/custom_transformers/modeling_ropewhisper.py:262).
Under jit all shapes are static, so "dynamic" NTK rescaling becomes a
trace-time branch on the sequence length.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_inv_freq(head_dim: int, theta: float = 10000.0,
                  seq_len: int | None = None,
                  max_position_embeddings: int = 2048,
                  scaling_factor: float = 1.0,
                  rope_type: str = "dynamic") -> np.ndarray:
    """Inverse frequencies (head_dim/2,), with dynamic-NTK base rescaling when
    the (static) sequence length exceeds the trained context."""
    base = theta
    if rope_type == "dynamic" and seq_len is not None and seq_len > max_position_embeddings:
        base = theta * (
            (scaling_factor * seq_len / max_position_embeddings) - (scaling_factor - 1)
        ) ** (head_dim / (head_dim - 2))
    return 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, *,
                 theta: float = 10000.0, seq_len: int | None = None,
                 max_position_embeddings: int = 2048,
                 scaling_factor: float = 1.0, rope_type: str = "dynamic",
                 dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer `positions` (any shape) -> (..., head_dim).

    Layout matches Llama-style rotate-half: frequencies are repeated over the
    two halves of the head dimension.
    """
    inv_freq = jnp.asarray(rope_inv_freq(
        head_dim, theta, seq_len, max_position_embeddings, scaling_factor,
        rope_type))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q/k of shape (..., T, head_dim) by cos/sin of shape (T, head_dim)
    or any broadcast-compatible shape."""
    q_rot = q * cos + rotate_half(q) * sin
    k_rot = k * cos + rotate_half(k) * sin
    return q_rot.astype(q.dtype), k_rot.astype(k.dtype)
