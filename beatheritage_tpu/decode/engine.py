"""Jitted autoregressive decode engine.

TPU-native replacement for the reference's HF `GenerationMixin.generate`
sampling loop + StaticCache (reference: server.py:40 model_generate,
cache_utils.py:24). The whole loop — prefill, per-step decoder forward with a
preallocated KV cache, CFG folding, the constrained-sampling rule chain,
top-k/top-p sampling, and multi-EOS termination — compiles to ONE XLA
program driven by `lax.while_loop`; no host round-trips per token.

Layout conventions:
- prompts are LEFT-padded to a fixed length P (like the reference's batching
  server, server.py:230-299), with RoPE positions taken from the per-row
  non-pad count so padding is position-transparent;
- with CFG enabled the model batch is 2B: rows [0:B] conditional, rows
  [B:2B] negative-prompted; sampled tokens are appended to both halves.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import ModelDims
from ..ops.attention import NEG_INF, merge_heads, split_heads
from ..ops.rope import apply_rope, rope_cos_sin
from ..ops.sampling import (
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    sample_token,
)
from .kv_cache import init_self_cache, precompute_cross_kv
from .logit_rules import (
    conditional_temperature,
    fold_cfg,
    lookback_bias,
    monotonic_timeshift_mask,
    timeshift_bias,
)
from .tables import MILISECONDS_PER_STEP, TokenTables


@dataclasses.dataclass(frozen=True)
class SamplerSettings:
    """Static sampling configuration (hashable; part of the jit cache key)."""

    temperature: float = 1.0
    timing_temperature: float = 1.0
    mania_column_temperature: float = 1.0
    taiko_hit_temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    repetition_penalty: float = 1.0
    timeshift_bias: float = 0.0
    cfg_scale: float = 1.0
    types_first: bool = True
    do_sample: bool = True
    # static gate only; the lookback token mask itself is a DYNAMIC argument
    # to generate() so per-window lookback/lookahead values don't fragment
    # the jit cache (each extra variant costs a full decode recompile)
    use_lookback: bool = False

    @property
    def cfg_on(self) -> bool:
        return self.cfg_scale > 1.0


# -- cached decoder forward -----------------------------------------------------

def _ln(x, p):
    from ..models.transformer import rms_norm  # noqa: PLC0415
    return rms_norm(x, p["g"])


def _lin(x, p):
    out = x @ p["w"].astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def fuse_qkv(params, dtype=jnp.bfloat16) -> dict:
    """Precompute fused self-attention QKV weights per layer (one matmul per
    step instead of three; k has no bias so its slot is zero)."""
    layers = params["decoder"]["layers"]
    w = jnp.concatenate([layers["q"]["w"], layers["k"]["w"], layers["v"]["w"]],
                        axis=-1).astype(dtype)  # (L, D, 3D)
    d = layers["q"]["w"].shape[-1]
    b = jnp.concatenate([layers["q"]["b"], jnp.zeros_like(layers["q"]["b"]),
                         layers["v"]["b"]], axis=-1).astype(dtype)
    return {"w": w, "b": b, "d": d}


def decoder_cached_forward(params, dims: ModelDims, token_ids: jnp.ndarray,
                           cache: dict, cross_k: jnp.ndarray,
                           cross_v: jnp.ndarray, positions: jnp.ndarray,
                           slot_start, kv_valid: jnp.ndarray,
                           rope_seq_len: int, dtype=jnp.bfloat16,
                           cross_mask: Optional[jnp.ndarray] = None,
                           qkv: Optional[dict] = None,
                           unroll: bool = False,
                           cross_ks: Optional[jnp.ndarray] = None,
                           cross_vs: Optional[jnp.ndarray] = None
                           ) -> tuple[jnp.ndarray, dict]:
    """Run the decoder on a chunk of C tokens, reading/writing the KV cache.

    token_ids (B, C); positions (B, C) absolute RoPE positions; slot_start is
    the first cache slot this chunk occupies; kv_valid (B, T_max) marks
    attendable slots (False on left padding). Works for both the prompt
    prefill (C=P) and single-token steps (C=1).

    The full (L, B, H, T, D) cache arrays ride through the layer scan as
    CARRIES updated with dynamic_update_slice — XLA aliases them in place.
    Returning them per layer as stacked scan outputs would copy the whole
    cache every step, which dominates decode time.
    """
    b, c = token_ids.shape
    t_max = cache["k"].shape[4]  # transposed (L, B, H, Dh, T) layout
    quant = "ks" in cache  # int8 K/V with per-position scales (kv_cache.py)
    x = params["dec_embed"].astype(dtype)[token_ids]
    if qkv is None:
        qkv = fuse_qkv(params, dtype)

    cos, sin = rope_cos_sin(
        positions, dims.head_dim, theta=dims.rope_theta, seq_len=rope_seq_len,
        max_position_embeddings=dims.max_target_positions,
        scaling_factor=dims.rope_decoder_scaling, rope_type=dims.rope_type,
        dtype=dtype)
    cos = cos[:, None]  # (B, 1, C, Dh) broadcasting over heads
    sin = sin[:, None]

    # slot j attendable by query i iff valid and j <= slot_start + i
    slots = jnp.arange(t_max)[None, None, None, :]
    qidx = jnp.arange(c)[None, None, :, None]
    causal = slots <= (slot_start + qidx)
    self_mask = causal & kv_valid[:, None, None, :]
    scale = dims.head_dim ** -0.5
    d = dims.d_model

    def layer_fn(carry, xs):
        if quant:
            x, k_all, v_all, ks_all, vs_all = carry
            layer, wqkv, bqkv, ck, cv, cks, cvs, li = xs
        else:
            x, k_all, v_all = carry
            layer, wqkv, bqkv, ck, cv, li = xs
        # fused self-attention projections + cache write (in place)
        h = _ln(x, layer["ln1"])
        qkv_out = h @ wqkv + bqkv
        q = split_heads(qkv_out[..., :d], dims.num_heads)
        k = split_heads(qkv_out[..., d:2 * d], dims.num_heads)
        v = split_heads(qkv_out[..., 2 * d:], dims.num_heads)
        q, k = apply_rope(q, k, cos, sin)
        # caches are (B, H, Dh, T) per layer (kv_cache.py: T-minor avoids
        # the 2x lane padding of Dh=64-minor layouts)
        k_t = k.transpose(0, 1, 3, 2)
        v_t = v.transpose(0, 1, 3, 2)
        if quant:
            from .kv_cache import quantize_kv  # noqa: PLC0415
            k_t, ksc = quantize_kv(k_t, axis=2)  # scale over Dh -> (B,H,C)
            v_t, vsc = quantize_kv(v_t, axis=2)
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, ksc[None], (li, 0, 0, slot_start))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, vsc[None], (li, 0, 0, slot_start))
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_t[None], (li, 0, 0, 0, slot_start))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_t[None], (li, 0, 0, 0, slot_start))
        k_cache = jax.lax.dynamic_slice_in_dim(k_all, li, 1, 0)[0]
        v_cache = jax.lax.dynamic_slice_in_dim(v_all, li, 1, 0)[0]
        if quant:
            k_cache = k_cache.astype(x.dtype)
            v_cache = v_cache.astype(x.dtype)
        logits = jnp.einsum("bhqd,bhdk->bhqk", q, k_cache,
                            preferred_element_type=jnp.float32) * scale
        if quant:
            # the per-position scale factors out of the q·k contraction
            ks_cache = jax.lax.dynamic_slice_in_dim(ks_all, li, 1, 0)[0]
            logits = logits * ks_cache[:, :, None, :]
        logits = jnp.where(self_mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        if quant:
            # ... and of the probs·v contraction (scale the probs instead)
            vs_cache = jax.lax.dynamic_slice_in_dim(vs_all, li, 1, 0)[0]
            probs = probs * vs_cache[:, :, None, :]
        probs = probs.astype(v_cache.dtype)
        attn = jnp.einsum("bhqk,bhdk->bhqd", probs, v_cache,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + _lin(merge_heads(attn), layer["o"])

        # cross-attention against precomputed encoder K/V (B, H, Dh, S)
        h = _ln(x, layer["ln2"])
        xq = split_heads(_lin(h, layer["xq"]), dims.num_heads)
        ck_f = ck.astype(x.dtype) if quant else ck
        cv_f = cv.astype(x.dtype) if quant else cv
        xl = jnp.einsum("bhqd,bhdk->bhqk", xq, ck_f,
                        preferred_element_type=jnp.float32) * scale
        if quant:
            xl = xl * cks[:, :, None, :]
        if cross_mask is not None:
            xl = jnp.where(cross_mask[:, None, None, :], xl, NEG_INF)
        xp = jax.nn.softmax(xl, axis=-1)
        if quant:
            xp = xp * cvs[:, :, None, :]
        xp = xp.astype(cv_f.dtype)
        xa = jnp.einsum("bhqk,bhdk->bhqd", xp, cv_f,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + _lin(merge_heads(xa), layer["xo"])

        # feed-forward
        h = _ln(x, layer["ln3"])
        x = x + _lin(jax.nn.gelu(_lin(h, layer["ff1"]), approximate=False), layer["ff2"])
        return ((x, k_all, v_all, ks_all, vs_all) if quant
                else (x, k_all, v_all)), None

    n_layers = dims.decoder_layers
    if quant:
        carry0 = (x, cache["k"], cache["v"], cache["ks"], cache["vs"])
        xs_all = (params["decoder"]["layers"], qkv["w"], qkv["b"],
                  cross_k, cross_v, cross_ks, cross_vs,
                  jnp.arange(n_layers))
    else:
        carry0 = (x, cache["k"], cache["v"])
        xs_all = (params["decoder"]["layers"], qkv["w"], qkv["b"],
                  cross_k, cross_v, jnp.arange(n_layers))
    if unroll:
        # Python-unrolled layer loop: every cache dynamic_update_slice gets
        # a STATIC layer index, removing any reliance on XLA aliasing a
        # dynamically-indexed scan carry (A/B lever for the per-step HBM
        # gap — see scripts/profile_decode.py). Same math, same order.
        carry = carry0
        for li in range(n_layers):
            xs = jax.tree_util.tree_map(lambda a, i=li: a[i], xs_all[:-1])
            carry, _ = layer_fn(carry, xs + (li,))
        out_carry = carry
    else:
        out_carry, _ = jax.lax.scan(layer_fn, carry0, xs_all)
    if quant:
        x, new_k, new_v, new_ks, new_vs = out_carry
        new_cache = {"k": new_k, "v": new_v, "ks": new_ks, "vs": new_vs}
    else:
        x, new_k, new_v = out_carry
        new_cache = {"k": new_k, "v": new_v}
    x = _ln(x, params["decoder"]["lnf"])
    logits = (x @ params["lm_head"].astype(dtype)).astype(jnp.float32)
    return logits, new_cache


# -- prompt-derived sampling state ------------------------------------------------

def _prompt_monotonic_state(prompt, prompt_mask, tables: TokenTables):
    """Vectorized recovery of (last_ts_value, has_ts) from the prompt,
    matching the reference's full-sequence scan (logit_processors.py:143-170)."""
    b, p = prompt.shape
    idx = jnp.arange(p)[None, :]
    is_ts = (prompt >= tables.time_start) & (prompt < tables.time_end) & prompt_mask
    is_sos = jnp.isin(prompt, jnp.asarray(tables.sos_ids)) & prompt_mask
    last_ts_idx = jnp.max(jnp.where(is_ts, idx, -1), axis=1)
    last_sos_idx = jnp.max(jnp.where(is_sos, idx, -1), axis=1)
    has_ts = (last_ts_idx != -1) & (last_ts_idx > last_sos_idx)
    gathered = prompt[jnp.arange(b), jnp.clip(last_ts_idx, 0, p - 1)]
    last_ts = jnp.where(has_ts, gathered - tables.time_start, 0)
    return last_ts.astype(jnp.int32), has_ts


# -- the generation loop ----------------------------------------------------------

def _cache_stages(p_len: int, max_len: int, n_buckets: int) -> list[int]:
    """Static KV-cache size schedule: the decode loop runs in stages over a
    growing cache so early steps don't pay attention reads over the full
    max_len buffer. Sizes are 256-aligned (TPU-friendly tiles); the last
    stage is exactly max_len."""
    if n_buckets <= 1 or max_len - p_len <= 512:
        return [max_len]
    stages = []
    for k in range(1, n_buckets):
        size = p_len + (max_len - p_len) * k // n_buckets
        size = min(-(-size // 256) * 256, max_len)  # round up to 256
        if size > p_len and (not stages or size > stages[-1]):
            stages.append(size)
    if not stages or stages[-1] != max_len:
        stages.append(max_len)
    return stages


@functools.partial(
    jax.jit,
    static_argnames=("dims", "settings", "tables", "max_len", "dtype",
                     "cache_buckets", "unroll_layers", "kv_quant"))
def generate(params, dims: ModelDims, settings: SamplerSettings,
             tables: TokenTables, enc_hidden: jnp.ndarray,
             prompt: jnp.ndarray, prompt_mask: jnp.ndarray,
             eos_mask: jnp.ndarray, key: jax.Array, *, max_len: int,
             dtype=jnp.bfloat16,
             enc_mask: Optional[jnp.ndarray] = None,
             lookback_mask: Optional[jnp.ndarray] = None,
             cache_buckets: int = 4, unroll_layers: bool = False,
             kv_quant: bool = False):
    """Generate until EOS or `max_len` total positions.

    enc_hidden (Bm, S, D), prompt (Bm, P) left-padded, prompt_mask (Bm, P);
    Bm = 2B when settings.cfg_on (rows [0:B] conditional). eos_mask is a
    (V,) bool array of terminating ids (tables.eos_token_mask).

    The decode runs in `cache_buckets` stages over a growing KV cache
    (_cache_stages): per-step self-attention traffic scales with the CURRENT
    stage size instead of max_len, which is the dominant HBM term at serving
    batch sizes. Token streams are invariant to the staging (padded slots
    are masked to exact zeros before the probability-weighted sum).

    Returns dict with tokens (B, max_len), prompt lengths, final length, and
    finished flags (conditional half only).
    """
    bm, p_len = prompt.shape
    b = bm // 2 if settings.cfg_on else bm
    if lookback_mask is None:
        lookback_mask = jnp.zeros(tables.vocab_size_out, dtype=bool)
    timed_mask = jnp.asarray(tables.timed_token_mask)

    stages = _cache_stages(p_len, max_len, cache_buckets)
    cache = init_self_cache(dims, bm, stages[0], dtype, quant=kv_quant)
    if kv_quant:
        cross_k, cross_v, cross_ks, cross_vs = precompute_cross_kv(
            params, dims, enc_hidden, dtype, quant=True)
    else:
        cross_k, cross_v = precompute_cross_kv(params, dims, enc_hidden, dtype)
        cross_ks = cross_vs = None
    qkv = fuse_qkv(params, dtype)

    # tokens buffer holds prompt then generated ids
    tokens = jnp.full((bm, max_len), tables.pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))
    kv_valid = jnp.concatenate(
        [prompt_mask.astype(bool),
         jnp.ones((bm, max_len - p_len), dtype=bool)], axis=1)

    positions_prompt = jnp.clip(jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0)
    prefill_logits, cache = decoder_cached_forward(
        params, dims, prompt.astype(jnp.int32), cache, cross_k, cross_v,
        positions_prompt, 0, kv_valid[:, :stages[0]], max_len, dtype,
        cross_mask=enc_mask, qkv=qkv, unroll=unroll_layers,
        cross_ks=cross_ks, cross_vs=cross_vs)
    pending = prefill_logits[:, -1]

    cond_prompt = prompt[:b].astype(jnp.int32)
    cond_mask = prompt_mask[:b].astype(bool)
    last_ts, has_ts = _prompt_monotonic_state(cond_prompt, cond_mask, tables)
    seen = jnp.zeros((b, tables.vocab_size_out), dtype=bool)
    seen = seen.at[jnp.arange(b)[:, None], cond_prompt].max(cond_mask)

    state = {
        "tokens": tokens,
        "cache": cache,
        "pending": pending,
        "step": jnp.asarray(p_len, jnp.int32),
        "pos_next": positions_prompt[:, -1] + 1,
        "finished": jnp.zeros((b,), dtype=bool),
        "last_scores": jnp.zeros((b, tables.vocab_size_out), jnp.float32),
        "have_last": jnp.zeros((b,), dtype=bool),
        "last_ts": last_ts,
        "has_ts": has_ts,
        "seen": seen,
        "key": key,
    }

    def make_body(stage_len: int):
        kv_valid_s = kv_valid[:, :stage_len]

        def body_fn(s):
            step = s["step"]
            logits = fold_cfg(s["pending"], settings.cfg_scale) if settings.cfg_on else s["pending"]
            logits = apply_repetition_penalty(logits, s["seen"], settings.repetition_penalty)
            logits = monotonic_timeshift_mask(logits, s["last_ts"], s["has_ts"],
                                              tables.time_start, tables.time_end)
            logits = timeshift_bias(logits, settings.timeshift_bias,
                                    tables.time_start, tables.time_end)
            prev1 = s["tokens"][:b, jnp.clip(step - 1, 0)]
            prev3 = s["tokens"][:b, jnp.clip(step - 3, 0)]
            logits = conditional_temperature(logits, prev1, prev3, settings, tables)
            pre_lookback = logits
            if settings.use_lookback:
                logits = lookback_bias(logits, s["last_scores"], prev1,
                                       s["have_last"], timed_mask, lookback_mask,
                                       tables.eos_prob_ids, tables.time_start,
                                       settings.types_first)
            logits = apply_top_k(logits, settings.top_k)
            logits = apply_top_p(logits, settings.top_p)

            key, sub = jax.random.split(s["key"])
            token = sample_token(sub, logits, settings.do_sample)
            token = jnp.where(s["finished"], tables.pad_id, token)
            finished = s["finished"] | eos_mask[token]

            token_m = jnp.tile(token, 2) if settings.cfg_on else token
            tokens = s["tokens"].at[:, step].set(token_m)
            seen = s["seen"].at[jnp.arange(b), token].set(True)

            is_ts = (token >= tables.time_start) & (token < tables.time_end)
            is_sos = jnp.isin(token, jnp.asarray(tables.sos_ids))
            last_ts = jnp.where(is_ts, token - tables.time_start, s["last_ts"])
            has_ts = jnp.where(is_sos, False, s["has_ts"] | is_ts)

            step_logits, cache = decoder_cached_forward(
                params, dims, tokens[:, step][:, None], s["cache"], cross_k,
                cross_v, s["pos_next"][:, None], step, kv_valid_s, max_len,
                dtype, cross_mask=enc_mask, qkv=qkv, unroll=unroll_layers,
                cross_ks=cross_ks, cross_vs=cross_vs)

            return {
                "tokens": tokens,
                "cache": cache,
                "pending": step_logits[:, -1],
                "step": step + 1,
                "pos_next": s["pos_next"] + 1,
                "finished": finished,
                "last_scores": pre_lookback,
                "have_last": jnp.ones((b,), dtype=bool),
                "last_ts": last_ts,
                "has_ts": has_ts,
                "seen": seen,
                "key": key,
            }

        return body_fn

    for i, stage_len in enumerate(stages):
        if i > 0:
            # grow the cache to the next stage; fresh slots zero + masked.
            # T is the last axis of every cache entry (k/v AND the quant
            # scales), so pad each entry's final axis
            grow = stage_len - stages[i - 1]
            state = dict(state, cache={
                name: jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, grow)])
                for name, arr in state["cache"].items()})
        # the body at step t writes cache slot t, so a stage may run while
        # step < stage_len (slot indices 0..stage_len-1)
        def cond_fn(s, limit=stage_len):
            return (s["step"] < limit) & ~jnp.all(s["finished"])

        state = jax.lax.while_loop(cond_fn, make_body(stage_len), state)

    final = state
    return {
        "tokens": final["tokens"][:b],
        "length": final["step"],
        "finished": final["finished"],
        "prompt_len": p_len,
    }


# -- beam search -------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("dims", "settings", "tables", "max_len", "num_beams",
                     "dtype", "kv_quant"))
def beam_generate(params, dims: ModelDims, settings: SamplerSettings,
                  tables: TokenTables, enc_hidden: jnp.ndarray,
                  prompt: jnp.ndarray, prompt_mask: jnp.ndarray,
                  eos_mask: jnp.ndarray, *, max_len: int, num_beams: int = 2,
                  dtype=jnp.bfloat16, kv_quant: bool = False):
    """Jitted beam search (do_sample=False path for num_beams > 1;
    reference uses HF beam search via num_beams/timer_num_beams,
    processor.py:150). CFG is not combined with beams (matches practical
    reference usage: the super-timing generator runs beams with cfg 1).

    enc_hidden (B, S, D), prompt (B, P). Returns the best beam per row.
    """
    b, p_len = prompt.shape
    k = num_beams
    bk = b * k

    # expand to beams: every beam starts from the same prompt
    def expand(x):
        return jnp.repeat(x, k, axis=0)

    enc_k = expand(enc_hidden)
    prompt_k = expand(prompt.astype(jnp.int32))
    mask_k = expand(prompt_mask.astype(bool))

    cache = init_self_cache(dims, bk, max_len, dtype, quant=kv_quant)
    if kv_quant:
        cross_k, cross_v, cross_ks, cross_vs = precompute_cross_kv(
            params, dims, enc_k, dtype, quant=True)
    else:
        cross_k, cross_v = precompute_cross_kv(params, dims, enc_k, dtype)
        cross_ks = cross_vs = None
    qkv = fuse_qkv(params, dtype)

    tokens = jnp.full((bk, max_len), tables.pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_k, (0, 0))
    kv_valid = jnp.concatenate(
        [mask_k, jnp.ones((bk, max_len - p_len), dtype=bool)], axis=1)
    positions_prompt = jnp.clip(jnp.cumsum(mask_k.astype(jnp.int32), axis=1) - 1, 0)
    prefill_logits, cache = decoder_cached_forward(
        params, dims, prompt_k, cache, cross_k, cross_v, positions_prompt, 0,
        kv_valid, max_len, dtype, qkv=qkv, cross_ks=cross_ks,
        cross_vs=cross_vs)

    last_ts, has_ts = _prompt_monotonic_state(prompt_k, mask_k, tables)

    # beam 0 starts live, the rest start at -inf so the first step fans out
    beam_scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1)), (b,))

    state = {
        "tokens": tokens,
        "cache": cache,
        "pending": prefill_logits[:, -1],
        "step": jnp.asarray(p_len, jnp.int32),
        "pos_next": positions_prompt[:, -1] + 1,
        "scores": beam_scores,           # (BK,)
        "finished": jnp.zeros((bk,), bool),
        "last_ts": last_ts,
        "has_ts": has_ts,
    }

    v_size = tables.vocab_size_out
    neg_except_pad = jnp.full((v_size,), NEG_INF).at[tables.pad_id].set(0.0)

    def cond_fn(s):
        return (s["step"] < max_len) & ~jnp.all(s["finished"])

    def body_fn(s):
        step = s["step"]
        logits = s["pending"]  # (BK, V)
        logits = monotonic_timeshift_mask(logits, s["last_ts"], s["has_ts"],
                                          tables.time_start, tables.time_end)
        logits = timeshift_bias(logits, settings.timeshift_bias,
                                tables.time_start, tables.time_end)
        prev1 = s["tokens"][:, jnp.clip(step - 1, 0)]
        prev3 = s["tokens"][:, jnp.clip(step - 3, 0)]
        logits = conditional_temperature(logits, prev1, prev3, settings, tables)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # finished beams may only emit pad at zero cost
        logp = jnp.where(s["finished"][:, None], neg_except_pad[None, :], logp)

        cand = s["scores"][:, None] + logp           # (BK, V)
        cand = cand.reshape(b, k * v_size)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # (B, K)
        parent = top_idx // v_size                    # beam index within row
        token = (top_idx % v_size).astype(jnp.int32)  # (B, K)

        # flatten back to (BK,) and gather all per-beam state by parent
        gather = (jnp.arange(b)[:, None] * k + parent).reshape(-1)  # (BK,)
        token_flat = token.reshape(-1)
        tokens = s["tokens"][gather].at[:, step].set(token_flat)
        # beam reorder: every cache entry (K/V and quant scales) has the
        # beam-batch at axis 1
        cache = {name: arr[:, gather] for name, arr in s["cache"].items()}
        finished = s["finished"][gather] | eos_mask[token_flat]
        scores = top_scores.reshape(-1)

        is_ts = (token_flat >= tables.time_start) & (token_flat < tables.time_end)
        is_sos = jnp.isin(token_flat, jnp.asarray(tables.sos_ids))
        last_ts = jnp.where(is_ts, token_flat - tables.time_start,
                            s["last_ts"][gather])
        has_ts = jnp.where(is_sos, False, s["has_ts"][gather] | is_ts)

        step_logits, cache = decoder_cached_forward(
            params, dims, tokens[:, step][:, None], cache, cross_k, cross_v,
            s["pos_next"][gather][:, None], step, kv_valid, max_len, dtype,
            qkv=qkv, cross_ks=cross_ks, cross_vs=cross_vs)

        return {
            "tokens": tokens,
            "cache": cache,
            "pending": step_logits[:, -1],
            "step": step + 1,
            "pos_next": s["pos_next"][gather] + 1,
            "scores": scores,
            "finished": finished,
            "last_ts": last_ts,
            "has_ts": has_ts,
        }

    final = jax.lax.while_loop(cond_fn, body_fn, state)
    # pick the best beam per row (finished beams froze their scores)
    scores = final["scores"].reshape(b, k)
    best = jnp.argmax(scores, axis=1)
    tokens = final["tokens"].reshape(b, k, max_len)[jnp.arange(b), best]
    return {
        "tokens": tokens,
        "length": final["step"],
        "finished": final["finished"].reshape(b, k)[jnp.arange(b), best],
        "prompt_len": p_len,
        "scores": scores[jnp.arange(b), best],
    }
