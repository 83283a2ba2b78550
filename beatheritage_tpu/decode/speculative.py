"""Speculative decoding: prompt-lookup drafts verified in one chunk forward.

The decode loop is matmul-latency-bound at small batch (the per-step cost is
streaming the decoder weights from HBM, nearly independent of how many
positions ride along), so verifying K drafted tokens in one forward costs
about one plain step but can commit up to K+1 tokens. Beatmap token streams
are highly periodic (TIME_SHIFT/SNAPPING/DISTANCE groups repeat bar after
bar), which makes *prompt-lookup* drafting — copy the continuation of the
most recent occurrence of the current n-gram — a strong, model-free draft.

Acceptance replays the EXACT constrained-sampling rule chain of
decode/engine.py (CFG fold, repetition penalty, monotonic-timeshift mask,
timeshift bias, conditional temperature, lookback bias, top-k/top-p) at
every drafted position, with the cumulative rule state (seen set, last
timeshift, last pre-lookback scores) carried along the draft path:

- greedy (do_sample=False): accept while draft == argmax — identical
  token streams to the plain engine up to numerics (exact in f32/tests;
  under bf16 the K-position verification matmul reduces in a different
  order than single-token steps, so near-tie argmaxes can flip);
- sampling: point-mass speculative sampling (Leviathan et al.): accept
  draft d with probability p(d); on rejection the residual resample
  (p with d's mass removed) is carried forward and committed as the
  next token, so the committed prefix is distributed exactly as
  ancestral sampling from p.

Batch rows commit the *minimum* accepted length (the KV cache advances one
global slot pointer, keeping cache writes as cheap dynamic_update_slices);
stale verification entries are overwritten by the next chunk before any
query can attend them. The win is largest at the single-song latency case
(B = windows of one song), which is the north-star p50 metric.

(reference: the HF sampling loop in server.py:40 has no speculative path;
this is a TPU-native addition.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.transformer import ModelDims
from .engine import (
    SamplerSettings,
    _prompt_monotonic_state,
    decoder_cached_forward,
    fuse_qkv,
)
from .kv_cache import init_self_cache, precompute_cross_kv
from .logit_rules import (
    conditional_temperature,
    fold_cfg,
    lookback_bias,
    monotonic_timeshift_mask,
    timeshift_bias,
)
from ..ops.sampling import (
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
)
from .tables import TokenTables


def _rule_chain(raw, st, prev1, prev3, settings: SamplerSettings,
                tables: TokenTables, timed_mask, lookback_mask):
    """The engine's per-step logit rules; returns (final, pre_lookback).
    `raw` is already CFG-folded (B, V); st carries the sequential rule
    state (seen, last_ts, has_ts, last_scores, have_last)."""
    logits = apply_repetition_penalty(raw, st["seen"], settings.repetition_penalty)
    logits = monotonic_timeshift_mask(logits, st["last_ts"], st["has_ts"],
                                      tables.time_start, tables.time_end)
    logits = timeshift_bias(logits, settings.timeshift_bias,
                            tables.time_start, tables.time_end)
    logits = conditional_temperature(logits, prev1, prev3, settings, tables)
    pre_lookback = logits
    if settings.use_lookback:
        logits = lookback_bias(logits, st["last_scores"], prev1,
                               st["have_last"], timed_mask, lookback_mask,
                               tables.eos_prob_ids, tables.time_start,
                               settings.types_first)
    logits = apply_top_k(logits, settings.top_k)
    logits = apply_top_p(logits, settings.top_p)
    return logits, pre_lookback


def _advance_rule_state(st, token, pre_lookback, tables: TokenTables, b):
    """Rule state after committing `token` (B,)."""
    is_ts = (token >= tables.time_start) & (token < tables.time_end)
    is_sos = jnp.isin(token, jnp.asarray(tables.sos_ids))
    return {
        "seen": st["seen"].at[jnp.arange(b), token].set(True),
        "last_ts": jnp.where(is_ts, token - tables.time_start, st["last_ts"]),
        "has_ts": jnp.where(is_sos, False, st["has_ts"] | is_ts),
        "last_scores": pre_lookback,
        "have_last": jnp.ones((b,), bool),
    }


def prompt_lookup_draft(tokens, step, k: int, pad_id: int):
    """Draft K tokens per row by copying what followed the most recent
    earlier occurrence of the trailing bigram (unigram fallback) in the
    committed token buffer [0, step]. Rows with no match draft pad (which
    never verifies, costing nothing)."""
    b, t_max = tokens.shape
    t_last = tokens[jnp.arange(b), step]          # the just-sampled token
    t_prev = tokens[jnp.arange(b), jnp.maximum(step - 1, 0)]
    idx = jnp.arange(t_max - 1)

    committed = idx[None, :] + 1 < step  # continuation must start <= step
    bi = (tokens[:, :-1] == t_prev[:, None]) & (tokens[:, 1:] == t_last[:, None]) & committed
    uni = (tokens[:, 1:] == t_last[:, None]) & committed
    best_bi = jnp.max(jnp.where(bi, idx[None, :], -1), axis=1)
    best_uni = jnp.max(jnp.where(uni, idx[None, :], -1), axis=1)
    best = jnp.where(best_bi >= 0, best_bi, best_uni)
    found = best >= 0
    start = best + 2  # first position after the matched n-gram's end
    gather = jnp.clip(start[:, None] + jnp.arange(k)[None, :], 0, t_max - 1)
    draft = tokens[jnp.arange(b)[:, None], gather]
    # positions > step hold the previous iteration's uncommitted draft
    # tokens (the full-chunk write at commit time) — never copy those
    found = found[:, None] & (gather <= step)
    return jnp.where(found, draft, pad_id)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "settings", "tables", "max_len", "draft_k",
                     "dtype"))
def generate_speculative(params, dims: ModelDims, settings: SamplerSettings,
                         tables: TokenTables, enc_hidden: jnp.ndarray,
                         prompt: jnp.ndarray, prompt_mask: jnp.ndarray,
                         eos_mask: jnp.ndarray, key: jax.Array, *,
                         max_len: int, draft_k: int = 7, dtype=jnp.bfloat16,
                         enc_mask: Optional[jnp.ndarray] = None,
                         lookback_mask: Optional[jnp.ndarray] = None):
    """Drop-in replacement for engine.generate with lookup-draft speculation.

    Greedy streams are bit-identical to the plain engine; sampled streams
    are equal in distribution. Returns the same dict as engine.generate.
    """
    bm, p_len = prompt.shape
    b = bm // 2 if settings.cfg_on else bm
    kd = draft_k
    if lookback_mask is None:
        lookback_mask = jnp.zeros(tables.vocab_size_out, dtype=bool)
    timed_mask = jnp.asarray(tables.timed_token_mask)

    cache = init_self_cache(dims, bm, max_len, dtype)
    cross_k, cross_v = precompute_cross_kv(params, dims, enc_hidden, dtype)
    qkv = fuse_qkv(params, dtype)

    tokens = jnp.full((bm, max_len), tables.pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))
    kv_valid = jnp.concatenate(
        [prompt_mask.astype(bool),
         jnp.ones((bm, max_len - p_len), dtype=bool)], axis=1)

    positions_prompt = jnp.clip(jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1, 0)
    prefill_logits, cache = decoder_cached_forward(
        params, dims, prompt.astype(jnp.int32), cache, cross_k, cross_v,
        positions_prompt, 0, kv_valid, max_len, dtype, cross_mask=enc_mask,
        qkv=qkv)

    cond_prompt = prompt[:b].astype(jnp.int32)
    cond_mask = prompt_mask[:b].astype(bool)
    last_ts, has_ts = _prompt_monotonic_state(cond_prompt, cond_mask, tables)
    seen = jnp.zeros((b, tables.vocab_size_out), dtype=bool)
    seen = seen.at[jnp.arange(b)[:, None], cond_prompt].max(cond_mask)

    state = {
        "tokens": tokens,
        "cache": cache,
        "pending": prefill_logits[:, -1],   # raw (Bm, V)
        "step": jnp.asarray(p_len, jnp.int32),
        "pos_next": positions_prompt[:, -1] + 1,
        "finished": jnp.zeros((b,), dtype=bool),
        "last_scores": jnp.zeros((b, tables.vocab_size_out), jnp.float32),
        "have_last": jnp.zeros((b,), dtype=bool),
        "last_ts": last_ts,
        "has_ts": has_ts,
        "seen": seen,
        "key": key,
        # rejection-boundary carry: rows whose accepted count equals the
        # global commit count g rejected exactly at the commit boundary;
        # their residual resample (p with the draft's mass removed) IS the
        # next token under exact speculative sampling and must be committed
        # instead of a fresh full-p draw (which would bias toward the
        # drafted token: p(d) + (1-p(d))p(d) instead of p(d))
        "forced_token": jnp.zeros((b,), jnp.int32),
        "forced_valid": jnp.zeros((b,), bool),
    }

    def rule_state(s):
        return {k: s[k] for k in
                ("seen", "last_ts", "has_ts", "last_scores", "have_last")}

    def sample_from(key, logits, draft=None):
        """Sample/argmax; with a draft token, return (token, accept)."""
        if not settings.do_sample:
            token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if draft is None:
                return token, None
            return token, token == draft
        if draft is None:
            return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32), None
        # point-mass speculative sampling: accept d with prob p(d); on
        # reject, sample from p with d's mass removed (exactly the residual
        # distribution for a deterministic draft)
        logp = jax.nn.log_softmax(logits, axis=-1)
        p_d = jnp.exp(logp[jnp.arange(logp.shape[0]), draft])
        k_u, k_r = jax.random.split(key)
        accept = jax.random.uniform(k_u, p_d.shape) < p_d
        residual = logits.at[jnp.arange(logits.shape[0]), draft].set(-1e9)
        resample = jax.random.categorical(k_r, residual, axis=-1).astype(jnp.int32)
        return jnp.where(accept, draft, resample), accept

    def spec_cond(s):
        return (s["step"] + kd + 1 <= max_len) & ~jnp.all(s["finished"])

    def spec_body(s):
        step = s["step"]
        keys = jax.random.split(s["key"], kd + 2)

        # --- sample t0 from pending (identical to the plain engine step)
        raw0 = fold_cfg(s["pending"], settings.cfg_scale) if settings.cfg_on else s["pending"]
        prev1 = s["tokens"][:b, jnp.clip(step - 1, 0)]
        prev3 = s["tokens"][:b, jnp.clip(step - 3, 0)]
        st0 = rule_state(s)
        logits0, pre_lb0 = _rule_chain(raw0, st0, prev1, prev3, settings,
                                       tables, timed_mask, lookback_mask)
        t0, _ = sample_from(keys[1], logits0)
        t0 = jnp.where(s["forced_valid"], s["forced_token"], t0)
        t0 = jnp.where(s["finished"], tables.pad_id, t0)
        fin0 = s["finished"] | eos_mask[t0]
        st1 = _advance_rule_state(st0, t0, pre_lb0, tables, b)

        tokens = s["tokens"].at[:, step].set(
            jnp.tile(t0, 2) if settings.cfg_on else t0)

        # --- draft K continuations by prompt lookup on the conditional rows
        draft = prompt_lookup_draft(tokens[:b], step, kd, tables.pad_id)
        chunk = jnp.concatenate([t0[:, None], draft], axis=1)  # (B, K+1)
        chunk_m = jnp.tile(chunk, (2, 1)) if settings.cfg_on else chunk
        tokens = jax.lax.dynamic_update_slice(tokens, chunk_m, (0, step))

        # --- one verification forward over the chunk
        positions = s["pos_next"][:, None] + jnp.arange(kd + 1)[None, :]
        vlogits, cache = decoder_cached_forward(
            params, dims, chunk_m, s["cache"], cross_k, cross_v, positions,
            step, kv_valid, max_len, dtype, cross_mask=enc_mask, qkv=qkv)
        if settings.cfg_on:
            # fold each position: (2B, K+1, V) -> (B, K+1, V), same formula
            # as fold_cfg (neg + (cond - neg) * scale)
            cond, neg = vlogits[:b], vlogits[b:]
            vfold = neg + (cond - neg) * settings.cfg_scale
        else:
            vfold = vlogits

        # --- verify drafts with the exact rule chain, carrying rule state
        def verify(carry, i):
            st, accepting, fin, key = carry
            key, sub = jax.random.split(key)
            d_i = draft[:, i]
            prev1_i = chunk[:, i]
            prev3_i = tokens[:b][jnp.arange(b),
                                 jnp.clip(step + i - 2, 0, max_len - 1)]
            logits_i, pre_lb_i = _rule_chain(
                vfold[:, i], st, prev1_i, prev3_i, settings, tables,
                timed_mask, lookback_mask)
            tok_i, ok = sample_from(sub, logits_i, draft=d_i)
            # finished rows never constrain global acceptance
            ok = ok | fin
            accepting = accepting & ok
            d_commit = jnp.where(fin, tables.pad_id, d_i)
            fin_next = fin | (eos_mask[d_commit] & accepting)
            st_next = _advance_rule_state(st, d_commit, pre_lb_i, tables, b)
            out = {"accept": accepting, "fin": fin_next,
                   "d_commit": d_commit, "resample": tok_i,
                   **{k: st_next[k] for k in st_next}}
            return (st_next, accepting, fin_next, key), out

        init = (st1, jnp.ones((b,), bool), fin0, keys[0])
        _, scan_out = jax.lax.scan(verify, init,
                                   jnp.arange(kd, dtype=jnp.int32))

        # global commit count: min accepted drafts across rows
        acc_counts = jnp.sum(scan_out["accept"].astype(jnp.int32), axis=0)  # (B,)
        g = jnp.min(acc_counts)

        # committed-state selection at index g: g=0 -> state after t0 (st1),
        # g>=1 -> scan state after draft g-1
        def pick(name, after_t0):
            stacked = jnp.concatenate([after_t0[None], scan_out[name]], axis=0)
            return stacked[g]

        seen_c = pick("seen", st1["seen"])
        last_ts_c = pick("last_ts", st1["last_ts"])
        has_ts_c = pick("has_ts", st1["has_ts"])
        last_scores_c = pick("last_scores", st1["last_scores"])
        fin_c = pick("fin", fin0)

        # scrub uncommitted/post-EOS tokens: committed chunk prefix is
        # [t0, d_commit_0..d_commit_{g-1}]; the rest of the chunk region is
        # overwritten by the next iteration before any read
        commit_chunk = jnp.concatenate(
            [t0[:, None], jnp.swapaxes(scan_out["d_commit"], 0, 1)], axis=1)
        commit_m = jnp.tile(commit_chunk, (2, 1)) if settings.cfg_on else commit_chunk
        tokens = jax.lax.dynamic_update_slice(tokens, commit_m, (0, step))

        # rejection-boundary carry (see state init): a row with acc == g < K
        # rejected exactly at the commit boundary; its residual resample from
        # scan index g is the exact next token (the next iteration's rule
        # chain at that row reproduces the same logits, so committing the
        # resample realizes accept*delta_d + (1-p_d)*residual = p)
        if settings.do_sample:
            forced_token = scan_out["resample"][jnp.clip(g, 0, kd - 1)]
            forced_valid = (acc_counts == g) & (g < kd) & ~fin_c
        else:
            forced_token = s["forced_token"]
            forced_valid = jnp.zeros((b,), bool)

        return {
            "forced_token": forced_token,
            "forced_valid": forced_valid,
            "tokens": tokens,
            "cache": cache,
            "pending": jax.lax.dynamic_index_in_dim(vlogits, g, axis=1,
                                                    keepdims=False),
            "step": step + 1 + g,
            "pos_next": s["pos_next"] + 1 + g,
            "finished": fin_c,
            "last_scores": last_scores_c,
            "have_last": jnp.ones((b,), bool),
            "last_ts": last_ts_c,
            "has_ts": has_ts_c,
            "seen": seen_c,
            "key": keys[-1],
        }

    final = jax.lax.while_loop(spec_cond, spec_body, state)

    # tail: fewer than K+1 slots left — fall back to plain single-token steps
    def tail_cond(s):
        return (s["step"] < max_len) & ~jnp.all(s["finished"])

    def tail_body(s):
        step = s["step"]
        raw = fold_cfg(s["pending"], settings.cfg_scale) if settings.cfg_on else s["pending"]
        prev1 = s["tokens"][:b, jnp.clip(step - 1, 0)]
        prev3 = s["tokens"][:b, jnp.clip(step - 3, 0)]
        st = rule_state(s)
        logits, pre_lb = _rule_chain(raw, st, prev1, prev3, settings, tables,
                                     timed_mask, lookback_mask)
        key, sub = jax.random.split(s["key"])
        token, _ = sample_from(sub, logits)
        token = jnp.where(s["forced_valid"], s["forced_token"], token)
        token = jnp.where(s["finished"], tables.pad_id, token)
        finished = s["finished"] | eos_mask[token]
        st_next = _advance_rule_state(st, token, pre_lb, tables, b)
        token_m = jnp.tile(token, 2) if settings.cfg_on else token
        tokens = s["tokens"].at[:, step].set(token_m)
        step_logits, cache = decoder_cached_forward(
            params, dims, tokens[:, step][:, None], s["cache"], cross_k,
            cross_v, s["pos_next"][:, None], step, kv_valid, max_len, dtype,
            cross_mask=enc_mask, qkv=qkv)
        return {
            "tokens": tokens, "cache": cache, "pending": step_logits[:, -1],
            "step": step + 1, "pos_next": s["pos_next"] + 1,
            "finished": finished, "key": key,
            "forced_token": s["forced_token"],
            "forced_valid": jnp.zeros((b,), bool),
            **{k: st_next[k] for k in st_next},
        }

    final = jax.lax.while_loop(tail_cond, tail_body, final)
    return {
        "tokens": final["tokens"][:b],
        "length": final["step"],
        "finished": final["finished"],
        "prompt_len": p_len,
    }
