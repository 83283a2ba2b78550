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


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering; p>=1 disables. Keeps the smallest set of tokens with
    cumulative probability > p (the most-probable token always survives)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < p
    keep_sorted = (cum - probs) < p
    # threshold logit = smallest kept logit
    kth = jnp.max(jnp.where(keep_sorted, sorted_logits, NEG_INF), axis=-1, keepdims=True)
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
