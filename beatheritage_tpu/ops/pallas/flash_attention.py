"""Blocked attention kernel (Pallas, TPU).

Replaces HF SDPA/flash-attn in the reference backbones for the long-sequence
paths (reference: modeling_nwhisper.py:571,702, Dockerfile:5): encoder
self-attention over up to 4096 mel frames and teacher-forced decoder
attention over up to 8192 tokens.

Strategy: K/V for one (batch, head) live in VMEM (T<=8192, D<=128 fits
comfortably); the grid tiles query blocks, so the (Tq, Tk) score matrix is
never materialized in HBM — scores live blockwise in VMEM/registers with the
softmax computed per query block in f32. This is the memory layout that
matters on TPU (HBM bandwidth), without the online-softmax bookkeeping that
flash attention needs when K/V exceed VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, is_causal: bool,
                 block_q: int):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (block_q, D)
    k = k_ref[0].astype(jnp.float32)  # (T, D)
    v = v_ref[0]                      # (T, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (block_q, T)

    if is_causal:
        t = k.shape[0]
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("is_causal", "block_q", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    mask=None, is_causal: bool = False, block_q: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """Attention (B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D).

    Arbitrary masks are not supported here (callers fall back to the XLA
    path); `is_causal` is. Tq is padded to a block multiple internally.
    """
    if mask is not None:
        raise NotImplementedError("arbitrary masks use the XLA path")
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = d ** -0.5

    block_q = min(block_q, max(tq, 16))
    pad_q = (-tq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    tq_p = tq + pad_q

    qf = q.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)

    grid = (b * h, tq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, is_causal=is_causal,
                          block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, tq_p, d)
    return out[:, :, :tq] if pad_q else out
