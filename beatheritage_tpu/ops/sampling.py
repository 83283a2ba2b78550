"""On-device sampling ops: temperature, top-k, top-p, categorical.

Replaces HF's logits warpers (reference: server.py:40 model_generate wires
TemperatureLogitsWarper/top_k/top_p through GenerationMixin). All run inside
jit on (B, V) f32 logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k highest logits per row; k<=0 disables."""
    if k <= 0:
        return logits
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float,
                prefilter_k: int = 64) -> jnp.ndarray:
    """Nucleus filtering; p>=1 disables. Keeps the smallest set of tokens with
    cumulative probability > p (the most-probable token always survives).

    Instead of a full-vocab sort (O(V log^2 V) bitonic passes on TPU, in the
    per-token decode hot loop), take the top `prefilter_k` logits (already
    sorted) and normalize against the full-vocab logsumexp — exact whenever
    the nucleus fits inside the prefilter, which holds for any practical p
    given peaked decode distributions. When some row's nucleus extends past
    the prefilter (near-uniform logits), lax.cond falls back to the full
    sort, so the keep-set matches a full-sort implementation (up to f32
    rounding of the normalization at the nucleus boundary on near-uniform
    rows, where one edge token of ~equal probability may flip)."""
    if p >= 1.0:
        return logits
    v = logits.shape[-1]
    k = min(prefilter_k, v)

    def threshold_from_sorted(sorted_desc, probs):
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the cumulative mass *before* them is < p
        keep = (cum - probs) < p
        # threshold logit = smallest kept logit
        return jnp.min(jnp.where(keep, sorted_desc, jnp.inf),
                       axis=-1, keepdims=True), keep

    top_vals = jax.lax.top_k(logits, k)[0]  # sorted descending
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    kth_fast, keep_fast = threshold_from_sorted(top_vals, jnp.exp(top_vals - lse))
    need_full = keep_fast.all(axis=-1).any() if k < v else jnp.asarray(False)

    def full_path(_):
        sorted_all = jnp.sort(logits, axis=-1)[..., ::-1]
        return threshold_from_sorted(sorted_all, jnp.exp(sorted_all - lse))[0]

    kth = jax.lax.cond(need_full, full_path, lambda _: kth_fast, operand=None)
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_repetition_penalty(logits: jnp.ndarray, seen: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """HF semantics: for previously generated tokens, positive logits are
    divided by `penalty`, negative multiplied (penalty=1 disables).
    `seen` is a (B, V) bool mask of tokens present in the sequence."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def sample_token(key: jax.Array, logits: jnp.ndarray,
                 do_sample: bool = True) -> jnp.ndarray:
    """Categorical sample (or argmax) per row -> (B,) int32."""
    if do_sample:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
