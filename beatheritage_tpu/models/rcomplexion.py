"""Rhythm-complexity estimator (OsuR), pure pytrees.

(reference: rcomplexion/libs/model/osu_r.py:13) A small MLP over an embedded
window of rhythm tokens predicting the next note-time token; its
cross-entropy on a real beatmap is the rhythm-complexity estimate
(rcomplexion/inference.py:20).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RComplexionDims:
    vocab_size_in: int
    vocab_size_out: int
    src_seq_len: int = 16
    hidden_size: int = 128


def init_rcomplexion_params(key, dims: RComplexionDims) -> dict:
    ks = jax.random.split(key, 5)
    h = dims.hidden_size
    flat = h * dims.src_seq_len

    def dense(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * (1.0 / jnp.sqrt(i)),
                "b": jnp.zeros(o)}

    return {
        "embed": jax.random.normal(ks[0], (dims.vocab_size_in, h)) * 0.02,
        "fc1": dense(ks[1], flat, h * 4),
        "fc2": dense(ks[2], h * 4, h * 2),
        "fc3": dense(ks[3], h * 2, h),
        "out": dense(ks[4], h, dims.vocab_size_out),
    }


def rcomplexion_forward(params, dims: RComplexionDims,
                        input_ids: jnp.ndarray) -> jnp.ndarray:
    """(B, L) token ids -> (B, vocab_out) next-note-time logits."""
    x = params["embed"][input_ids]                 # (B, L, H)
    x = x.reshape(x.shape[0], -1)                  # flatten

    def lin(x, p):
        return x @ p["w"] + p["b"]

    x = jax.nn.relu(lin(x, params["fc1"]))
    x = jax.nn.relu(lin(x, params["fc2"]))
    x = jax.nn.relu(lin(x, params["fc3"]))
    return lin(x, params["out"])


def rcomplexion_loss(params, dims: RComplexionDims, input_ids, labels,
                     sample_weights=None):
    logits = rcomplexion_forward(params, dims, input_ids)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if sample_weights is not None:
        nll = nll * sample_weights
    return nll.mean(), logits


def rhythm_complexity(params, dims: RComplexionDims, windows: jnp.ndarray,
                      targets: jnp.ndarray, od: float = 8.0) -> jnp.ndarray:
    """Aggregate next-time cross-entropy over a beatmap's windows with
    OD-based leniency: predictions within the hit window count as correct
    (reference rcomplexion/inference.py:20 calc_rhythm_complexity)."""
    logits = rcomplexion_forward(params, dims, windows)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # 300-score hit window in ms -> token steps (10ms)
    leniency_steps = jnp.maximum(jnp.round((79.5 - 6.0 * od) / 10.0), 0).astype(jnp.int32)
    vocab = logits.shape[-1]
    offsets = jnp.arange(-3, 4)
    near = jnp.clip(targets[:, None] + offsets[None, :], 0, vocab - 1)
    mask = jnp.abs(offsets)[None, :] <= leniency_steps
    probs = jnp.take_along_axis(jnp.exp(logp), near, axis=-1) * mask
    p = jnp.clip(probs.sum(axis=-1), 1e-9, 1.0)
    return -jnp.log2(p).mean()
