"""Multi-head attention (XLA path; Pallas flash attention plugs in behind the
same signature).

Replaces HF SDPA/flash-attn in the reference backbones
(reference: modeling_ropewhisper.py:346 RoPEWhisperAttention). Softmax and
logit accumulation run in float32 regardless of the activation dtype; outputs
are cast back (bf16-safe).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                          bias: Optional[jnp.ndarray] = None,
                          mask: Optional[jnp.ndarray] = None,
                          is_causal: bool = False,
                          use_flash: bool = False) -> jnp.ndarray:
    """Attention over (B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D).

    mask: boolean, broadcastable to (B, H, Tq, Tk); True = attend.
    bias: additive float bias, broadcastable to (B, H, Tq, Tk).
    """
    if use_flash and bias is None:
        try:
            from .pallas.flash_attention import flash_attention  # noqa: PLC0415
            return flash_attention(q, k, v, mask=mask, is_causal=is_causal)
        except (ImportError, NotImplementedError):
            pass

    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if is_causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        logits = jnp.where(causal, logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, D) -> (B, H, T, D/H)."""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, Dh) -> (B, T, H*Dh)."""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)
