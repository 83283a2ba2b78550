"""Jit-compatible logit rules for constrained sampling.

Vectorized re-designs of the reference's LogitsProcessors
(reference: osuT5/osuT5/inference/logit_processors.py):

- classifier-free guidance mixing (dual-batch fold). NOTE: the reference
  routes its negative prompt into the batch half that HF's CFG processor
  treats as *conditional* (modeling_mapperatorinator.py:209-219 +
  HF ClassifierFreeGuidanceLogitsProcessor), which inverts the guidance
  direction; we implement standard CFG: out = neg + scale * (cond - neg).
- monotonic time-shift masking, tracked incrementally instead of re-scanning
  the whole sequence each step (logit_processors.py:136)
- conditional temperature by previous-token class, per-row (the reference
  keys off batch row 0 only; logit_processors.py:75-82)
- constant time-shift bias (logit_processors.py:36)
- lookback-bias probability-mass correction with synthetic-EOS injection
  (logit_processors.py:85-133)

All rules take/return (B, V) f32 logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9
MILISECONDS_PER_STEP = 10


def fold_cfg(logits2b: jnp.ndarray, cfg_scale: float) -> jnp.ndarray:
    """(2B, V) with rows [0:B]=conditional, [B:2B]=negative -> (B, V)."""
    b = logits2b.shape[0] // 2
    cond, neg = logits2b[:b], logits2b[b:]
    return neg + (cond - neg) * cfg_scale


def monotonic_timeshift_mask(logits: jnp.ndarray, last_ts: jnp.ndarray,
                             has_ts: jnp.ndarray, time_start: int,
                             time_end: int) -> jnp.ndarray:
    """Mask time tokens strictly earlier than the last emitted time token
    (since the last SOS). last_ts (B,) is the last time value; has_ts (B,)
    gates the mask."""
    v = logits.shape[-1]
    ids = jnp.arange(v)
    is_time = (ids >= time_start) & (ids < time_end)
    below = ids < (time_start + last_ts)[:, None]
    mask = is_time[None, :] & below & has_ts[:, None]
    return jnp.where(mask, NEG_INF, logits)


def timeshift_bias(logits: jnp.ndarray, bias: float, time_start: int,
                   time_end: int) -> jnp.ndarray:
    if bias == 0.0:
        return logits
    v = logits.shape[-1]
    ids = jnp.arange(v)
    in_range = (ids >= time_start) & (ids < time_end)
    return logits + jnp.where(in_range, bias, 0.0)[None, :]


def conditional_temperature(logits: jnp.ndarray, prev1: jnp.ndarray,
                            prev3: jnp.ndarray, settings, tables) -> jnp.ndarray:
    """Divide logits by a per-row temperature keyed on recent token classes
    (types_first layout): timing temp when the previous token is a
    beat/measure/timing-point type, mania-column temp when the token three
    back is a circle/hold type, taiko-hit temp when the previous token is a
    scroll-speed value. First match wins; falls back to the base temp."""
    base = settings.temperature
    if not settings.types_first:
        return logits / base

    temp = jnp.full((logits.shape[0],), base, dtype=jnp.float32)

    def isin(x, ids):
        if not ids:
            return jnp.zeros_like(x, dtype=bool)
        return jnp.isin(x, jnp.asarray(ids))

    # reverse priority order so that earlier conditionals override later ones
    if settings.taiko_hit_temperature != base and tables.scroll_speed_tokens:
        s, e = tables.scroll_speed_tokens[0], tables.scroll_speed_tokens[-1]
        temp = jnp.where((prev1 >= s) & (prev1 <= e),
                         settings.taiko_hit_temperature, temp)
    if settings.mania_column_temperature != base and tables.mania_type_tokens:
        temp = jnp.where(isin(prev3, tables.mania_type_tokens),
                         settings.mania_column_temperature, temp)
    if settings.timing_temperature != base and tables.beat_type_tokens:
        temp = jnp.where(isin(prev1, tables.beat_type_tokens),
                         settings.timing_temperature, temp)
    return logits / temp[:, None]


def lookback_bias(logits: jnp.ndarray, last_scores: jnp.ndarray,
                  last_token: jnp.ndarray, have_last: jnp.ndarray,
                  timed_token_mask: jnp.ndarray, lookback_mask: jnp.ndarray,
                  eos_prob_ids: tuple, time_start: int,
                  types_first: bool) -> jnp.ndarray:
    """Correct for the over-representation of the partially-filled lookback
    window: when the current logits predict a time token (previous token was
    a timed type token), remove probability mass from lookback-window time
    values, renormalize the rest, and inject the deferred EOS mass at time 0
    (which the trimming step treats as EOS)."""
    if not types_first:
        return jnp.where(lookback_mask[None, :], NEG_INF, logits)

    probs = jax.nn.softmax(logits, axis=-1)
    last_probs = jax.nn.softmax(last_scores, axis=-1)
    prob_eos = last_probs[:, jnp.asarray(eos_prob_ids)].sum(axis=-1)
    prob_event = 1.0 - prob_eos
    other = ~lookback_mask
    s = 1.0 / (jnp.sum(probs * other[None, :], axis=-1) * prob_event + prob_eos)
    new_probs = jnp.where(other[None, :], probs * s[:, None], 0.0)
    prob_eos_extra = jnp.clip((s - 1.0) * prob_eos / jnp.maximum(prob_event, 1e-9), 0.0, 1.0)
    new_probs = new_probs.at[:, time_start].set(prob_eos_extra)
    transformed = jnp.log(jnp.maximum(new_probs, 1e-20))

    apply = timed_token_mask[last_token] & have_last
    return jnp.where(apply[:, None], transformed, logits)
