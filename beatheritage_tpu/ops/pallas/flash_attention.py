"""Blocked flash-attention kernel (Pallas, TPU).

Replaces HF SDPA/flash-attn in the reference backbones for the long-sequence
paths (reference: modeling_nwhisper.py:571,702, Dockerfile:5): encoder
self-attention over up to 4096 mel frames and teacher-forced decoder
attention over up to 8192 tokens.

Strategy: K/V for one (batch, head) live in VMEM (T<=8192, D<=128 fits
comfortably); the grid tiles query blocks and each query block walks K/V in
chunks with the online-softmax recurrence, so the (Tq, Tk) score matrix is
never materialized — per-chunk scores live in VMEM/registers in f32. Two
rules keep the MXU busy:
  * matmuls take the INPUT dtype (bf16 under training) with f32
    accumulation (`preferred_element_type`) — upcasting operands to f32
    would quarter the MXU rate;
  * causal blocks entirely above the diagonal are skipped (the chunk loop's
    upper bound depends on the query-block index), halving causal FLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _pick_chunk(tk: int) -> int:
    """Largest K-chunk length that tiles tk (whole-K fallback)."""
    return next((c for c in (1024, 512, 256, 128) if tk % c == 0), tk)


def _causal_upper(qi, block_q: int, block_k: int, n_chunks: int):
    """Number of K chunks a causal query block [qi*bq, (qi+1)*bq) can see."""
    return jnp.minimum((qi * block_q + block_q - 1) // block_k + 1, n_chunks)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                 is_causal: bool, block_q: int, block_k: int):
    qi = pl.program_id(1)
    q = q_ref[0]  # (block_q, D), input dtype — bf16 matmuls on the MXU
    d = q.shape[-1]
    n_chunks = k_ref.shape[1] // block_k

    def chunk_body(c, carry):
        m, l, acc = carry
        ks = pl.ds(c * block_k, block_k)
        kc = k_ref[0, ks, :]
        vc = v_ref[0, ks, :]
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (block_q, block_k)
        if is_causal:
            q_pos = (qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            k_pos = (c * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    upper = (_causal_upper(qi, block_q, block_k, n_chunks) if is_causal
             else n_chunks)
    m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, upper, chunk_body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # saved for the backward pass; lse laid out (bh, 1, tq) so the block's
    # trailing dims satisfy Mosaic tiling rules
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, is_causal: bool,
                     block_q: int, block_k: int):
    """Backward over one query block, looping K in chunks so the (block_q,
    block_k) f32 intermediates stay far under the VMEM scope even at
    T=8192; probabilities are recomputed from the saved logsumexp (no
    online-softmax bookkeeping needed). dK/dV accumulate across the
    sequential query-block grid dimension AND across k-chunks via
    read-modify-write stores. p/ds round to the input dtype before their
    matmuls (the flash-attn convention) so the MXU runs at bf16 rate."""
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]                        # (block_q, D) input dtype
    do = do_ref[0]                      # (block_q, D) input dtype
    lse = lse_ref[0, 0][:, None]        # (block_q, 1) f32
    delta = delta_ref[0, 0][:, None]    # (block_q, 1) = rowsum(do * o)
    d = q.shape[-1]
    n_chunks = k_ref.shape[1] // block_k
    in_dtype = q_ref.dtype

    def chunk_body(c, dq_acc):
        ks = pl.ds(c * block_k, block_k)
        kc = k_ref[0, ks, :]            # (block_k, D)
        vc = v_ref[0, ks, :]
        s = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if is_causal:
            q_pos = (qi * block_q
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            k_pos = (c * block_k
                     + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse)            # (block_q, block_k) f32

        # dv[c] += p^T . do ; dp = do . v^T ; ds = p*(dp-delta) ; dq += ds.k
        dv_ref[0, ks, :] += jax.lax.dot_general(
            p.astype(in_dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, vc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(in_dtype)
        dk_ref[0, ks, :] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        return dq_acc + jax.lax.dot_general(
            ds, kc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    upper = (_causal_upper(qi, block_q, block_k, n_chunks) if is_causal
             else n_chunks)
    dq = jax.lax.fori_loop(0, upper, chunk_body,
                           jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _pad_q(x, block_q):
    tq = x.shape[2]
    pad = (-tq) % block_q
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x, tq + pad


def _block_q(tq: int, block_q: int) -> int:
    """K is walked in chunks, so block_q no longer shrinks with Tk; only
    clamp to (a tiling-friendly floor of) the actual query length."""
    return min(block_q, max(tq, 16))


def _fwd_impl(q, k, v, is_causal, block_q, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = d ** -0.5
    block_q = _block_q(tq, block_q)
    block_k = _pick_chunk(tk)
    qp, tq_p = _pad_q(q, block_q)

    qf = qp.reshape(b * h, tq_p, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)

    grid = (b * h, tq_p // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, is_causal=is_causal,
                          block_q=block_q, block_k=block_k),
        out_shape=[jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, tq_p), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qf, kf, vf)
    o = out.reshape(b, h, tq_p, d)[:, :, :tq]
    return o, (qf, kf, vf, out, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, is_causal, block_q, interpret):
    return _fwd_impl(q, k, v, is_causal, block_q, interpret)[0]


def _flash_fwd(q, k, v, is_causal, block_q, interpret):
    o, res = _fwd_impl(q, k, v, is_causal, block_q, interpret)
    return o, (res, q.shape)


def _flash_bwd(is_causal, block_q, interpret, residuals, do):
    """Flash-attention backward: recompute probabilities blockwise from the
    saved logsumexp; dK/dV accumulate across the (sequential) query-block
    grid dimension into revisited output blocks."""
    (qf, kf, vf, of, lse), (b, h, tq, d) = residuals
    bh, tq_p, _ = qf.shape
    tk = kf.shape[1]
    scale = d ** -0.5
    blk = _block_q(tq, block_q)  # must match the forward's padding block
    acc_dtype = jnp.float32  # exact dK/dV accumulation (VMEM limit raised)

    pad = tq_p - tq  # match the forward's padded length exactly
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else do
    dof = dop.reshape(bh, tq_p, d)
    # delta_i = rowsum(dO_i * O_i); zero on padded rows since dO pads zero
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (bh, 1, tq_p)

    block_k = _pick_chunk(tk)
    grid = (bh, tq_p // blk)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, is_causal=is_causal,
                          block_q=blk, block_k=block_k),
        out_shape=[jax.ShapeDtypeStruct((bh, tq_p, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, tk, d), acc_dtype),
                   jax.ShapeDtypeStruct((bh, tk, d), acc_dtype)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # dK/dV blocks ignore j: revisited every query step (accumulate)
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qf, kf, vf, dof, lse, delta)

    dq = dq.reshape(b, h, tq_p, d)[:, :, :tq].astype(qf.dtype)
    dk = dk.reshape(b, h, tk, d).astype(kf.dtype)
    dv = dv.reshape(b, h, tk, d).astype(vf.dtype)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("is_causal", "block_q", "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    mask=None, is_causal: bool = False, block_q: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """Attention (B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D).

    Differentiable (custom VJP with a Pallas backward kernel), so the
    training path can use it too. Arbitrary masks are not supported here
    (callers fall back to the XLA path); `is_causal` is. Tq is padded to a
    block multiple internally.
    """
    if mask is not None:
        raise NotImplementedError("arbitrary masks use the XLA path")
    return _flash(q, k, v, is_causal, block_q, interpret)


# -- fused-layout variant: (B, T, H*D) in HBM -----------------------------------
#
# The split-heads layout (B*H, T, D) pads the minor dim D=64 to the 128-lane
# tile — 2x HBM for every q/k/v/o/dq/dk/dv array — and needs a transpose on
# each side. This variant reads the projection output layout (B, T, H*D)
# directly: the grid packs `hp` heads per block so the block's minor dim
# (hp*D) is lane-aligned, and the kernel loops the packed heads with
# independent softmax state. Training uses this path (transformer.py
# _self_attention); the 4D API above remains for generic callers.


def _heads_per_block(num_heads: int, d: int) -> int:
    for hp in (1, 2, 4, 8):
        if (hp * d) % 128 == 0 and num_heads % hp == 0:
            return hp
    raise NotImplementedError(f"head_dim {d} x heads {num_heads} "
                              "cannot tile the 128-lane minor dim")


def _fused_attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                       is_causal: bool, block_q: int, block_k: int,
                       hp: int, d: int):
    qi = pl.program_id(1)
    n_chunks = k_ref.shape[1] // block_k
    upper = (_causal_upper(qi, block_q, block_k, n_chunks) if is_causal
             else n_chunks)

    for s in range(hp):  # packed heads: independent softmax state each
        hs = slice(s * d, (s + 1) * d)
        q = q_ref[0, :, hs]

        def chunk_body(c, carry, q=q, hs=hs):
            m, l, acc = carry
            ks = pl.ds(c * block_k, block_k)
            kc = k_ref[0, ks, hs]
            vc = v_ref[0, ks, hs]
            sc = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if is_causal:
                q_pos = (qi * block_q
                         + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0))
                k_pos = (c * block_k
                         + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1))
                sc = jnp.where(k_pos <= q_pos, sc, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp(sc - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(vc.dtype), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, upper, chunk_body, (m0, l0, acc0))
        o_ref[0, :, hs] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, s, :] = (m + jnp.log(l))[:, 0]


def _fused_attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                           dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                           scale: float, is_causal: bool, block_q: int,
                           block_k: int, hp: int, d: int):
    """dK/dV accumulate across query blocks in f32 VMEM *scratch* (persists
    over the sequential j grid dim) and flush once, in the output dtype, on
    the last query block — f32 HBM gradient arrays never exist."""
    qi = pl.program_id(1)
    n_qblocks = pl.num_programs(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    n_chunks = k_ref.shape[1] // block_k
    upper = (_causal_upper(qi, block_q, block_k, n_chunks) if is_causal
             else n_chunks)
    in_dtype = q_ref.dtype

    for s in range(hp):
        hs = slice(s * d, (s + 1) * d)
        q = q_ref[0, :, hs]
        do = do_ref[0, :, hs]
        lse = lse_ref[0, s, :][:, None]
        delta = delta_ref[0, s, :][:, None]

        def chunk_body(c, dq_acc, q=q, do=do, lse=lse, delta=delta, hs=hs):
            ks = pl.ds(c * block_k, block_k)
            kc = k_ref[0, ks, hs]
            vc = v_ref[0, ks, hs]
            sc = jax.lax.dot_general(
                q, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if is_causal:
                q_pos = (qi * block_q
                         + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0))
                k_pos = (c * block_k
                         + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1))
                sc = jnp.where(k_pos <= q_pos, sc, NEG_INF)
            p = jnp.exp(sc - lse)
            dv_acc[ks, hs] += jax.lax.dot_general(
                p.astype(in_dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, vc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dp - delta) * scale).astype(in_dtype)
            dk_acc[ks, hs] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dq_acc + jax.lax.dot_general(
                ds, kc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dq = jax.lax.fori_loop(0, upper, chunk_body,
                               jnp.zeros((block_q, d), jnp.float32))
        dq_ref[0, :, hs] = dq.astype(dq_ref.dtype)

    @pl.when(qi == n_qblocks - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pad_rows(x, block):
    t = x.shape[1]
    pad = (-t) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x, t + pad


def _fused_fwd_impl(q, k, v, num_heads, is_causal, block_q, interpret):
    b, tq, hd = q.shape
    tk = k.shape[1]
    d = hd // num_heads
    hp = _heads_per_block(num_heads, d)
    g = b * (num_heads // hp)
    scale = d ** -0.5
    block_q = _block_q(tq, block_q)
    block_k = _pick_chunk(tk)
    qp, tq_p = _pad_rows(q, block_q)

    nh = num_heads // hp
    grid = (g, tq_p // block_q)
    kwargs = dict(scale=scale, is_causal=is_causal, block_q=block_q,
                  block_k=block_k, hp=hp, d=d)
    out, lse = pl.pallas_call(
        functools.partial(_fused_attn_kernel, **kwargs),
        out_shape=[jax.ShapeDtypeStruct((b, tq_p, hd), q.dtype),
                   jax.ShapeDtypeStruct((g, hp, tq_p), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hp * d),
                         lambda i, j, nh=nh: (i // nh, j, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, hp * d),
                         lambda i, j, nh=nh: (i // nh, 0, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, hp * d),
                         lambda i, j, nh=nh: (i // nh, 0, i % nh),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, hp * d),
                         lambda i, j, nh=nh: (i // nh, j, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, k, v)
    o = out[:, :tq]
    return o, (qp, k, v, out, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_fused(q, k, v, num_heads, is_causal, block_q, interpret):
    return _fused_fwd_impl(q, k, v, num_heads, is_causal, block_q, interpret)[0]


def _flash_fused_fwd(q, k, v, num_heads, is_causal, block_q, interpret):
    o, res = _fused_fwd_impl(q, k, v, num_heads, is_causal, block_q, interpret)
    return o, (res, q.shape[1])


def _flash_fused_bwd(num_heads, is_causal, block_q, interpret, residuals, do):
    (qp, k, v, of, lse), tq = residuals
    b, tq_p, hd = qp.shape
    tk = k.shape[1]
    d = hd // num_heads
    hp = _heads_per_block(num_heads, d)
    nh = num_heads // hp
    g = b * nh
    scale = d ** -0.5
    blk = _block_q(tq, block_q)
    block_k = _pick_chunk(tk)

    pad = tq_p - tq
    dop = jnp.pad(do, ((0, 0), (0, pad), (0, 0))) if pad else do
    # delta per head: rowsum(dO_h * O_h) -> (g, hp, tq_p) matching lse layout
    prod = (dop.astype(jnp.float32) * of.astype(jnp.float32)).reshape(
        b, tq_p, num_heads, d).sum(-1)                     # (b, tq_p, H)
    delta = prod.transpose(0, 2, 1).reshape(g, hp, tq_p)

    kwargs = dict(scale=scale, is_causal=is_causal, block_q=blk,
                  block_k=block_k, hp=hp, d=d)
    grid = (g, tq_p // blk)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_attn_bwd_kernel, **kwargs),
        out_shape=[jax.ShapeDtypeStruct((b, tq_p, hd), qp.dtype),
                   jax.ShapeDtypeStruct((b, tk, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, tk, hd), v.dtype)],
        grid=grid,
        scratch_shapes=[pltpu.VMEM((tk, hp * d), jnp.float32),
                        pltpu.VMEM((tk, hp * d), jnp.float32)],
        in_specs=[
            pl.BlockSpec((1, blk, hp * d),
                         lambda i, j, nh=nh: (i // nh, j, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, hp * d),
                         lambda i, j, nh=nh: (i // nh, 0, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, hp * d),
                         lambda i, j, nh=nh: (i // nh, 0, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, hp * d),
                         lambda i, j, nh=nh: (i // nh, j, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, blk), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, hp * d),
                         lambda i, j, nh=nh: (i // nh, j, i % nh),
                         memory_space=pltpu.VMEM),
            # dK/dV blocks ignore j: revisited every query step (accumulate)
            pl.BlockSpec((1, tk, hp * d),
                         lambda i, j, nh=nh: (i // nh, 0, i % nh),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, hp * d),
                         lambda i, j, nh=nh: (i // nh, 0, i % nh),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qp, k, v, dop, lse, delta)

    return dq[:, :tq], dk, dv


_flash_fused.defvjp(_flash_fused_fwd, _flash_fused_bwd)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "is_causal", "block_q",
                                    "interpret"))
def flash_attention_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          num_heads: int, *, is_causal: bool = False,
                          block_q: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Attention on the fused layout: (B, Tq, H*D) x (B, Tk, H*D) ->
    (B, Tq, H*D), no head split/merge transposes and no lane padding.
    Differentiable (custom VJP)."""
    return _flash_fused(q, k, v, num_heads, is_causal, block_q, interpret)
