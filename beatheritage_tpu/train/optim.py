"""Optimizers and LR schedules (optax).

TPU-native implementations of the reference's optimizer stack
(reference: osuT5/osuT5/utils/model_utils.py:91 get_optimizer, :164
get_scheduler; copied_utils.py:242 AdamWScale; muon_utils.py:36
zeropower_via_newtonschulz5):

- adamwscale: AdamW with the per-tensor step size scaled by the RMS of the
  parameter (nanoT5 recipe)
- muon: SGD-momentum orthogonalized by a quintic Newton-Schulz iteration in
  bfloat16 for >=2D weight matrices, with embedded AdamW for embeddings,
  heads, and <=1D params. Our stacked-layer parameters (L, d_in, d_out) are
  orthogonalized per-layer via vmap — no python loop over layers.
- schedule: linear warmup (factor 0.5 -> 1.0) -> optional sustain -> cosine
  or linear decay to final_cosine
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


# -- adamwscale ----------------------------------------------------------------

def adamwscale(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
               weight_decay=0.0) -> optax.GradientTransformation:
    """AdamW with step size multiplied by max(1e-3, rms(param)) per tensor."""

    def init_fn(params):
        return {
            "count": jnp.zeros([], jnp.int32),
            "mu": jax.tree.map(jnp.zeros_like, params),
            "nu": jax.tree.map(jnp.zeros_like, params),
        }

    def update_fn(grads, state, params):
        count = state["count"] + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def tensor_update(m, v, p):
            rms = jnp.sqrt(jnp.mean(p.astype(jnp.float32) ** 2))
            step_size = lr * jnp.sqrt(bc2) / bc1 * jnp.maximum(1e-3, rms)
            upd = -step_size * m / (jnp.sqrt(v) + eps)
            if weight_decay > 0:
                upd = upd - lr * weight_decay * p
            return upd

        updates = jax.tree.map(tensor_update, mu, nu, params)
        return updates, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init_fn, update_fn)


# -- muon ----------------------------------------------------------------------

def newton_schulz_orthogonalize(g: jnp.ndarray, steps: int = 6,
                                eps: float = 1e-7) -> jnp.ndarray:
    """Quintic Newton-Schulz orthogonalization in bf16 of a 2D matrix
    (coefficients from the public Muon recipe; muon_utils.py:40)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    transpose = g.shape[0] > g.shape[1]
    x = g.astype(jnp.bfloat16)
    x = x / (jnp.linalg.norm(x.astype(jnp.float32)).astype(jnp.bfloat16) + eps)
    if transpose:
        x = x.T

    def body(_, x):
        xxt = x @ x.T
        return a * x + (b * xxt + c * xxt @ xxt) @ x

    x = jax.lax.fori_loop(0, steps, body, x)
    if transpose:
        x = x.T
    return x.astype(g.dtype)


def _orthogonalize_any(g: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Apply NS to the trailing 2 dims; leading dims (stacked layers) vmap."""
    if g.ndim == 2:
        return newton_schulz_orthogonalize(g, steps)
    flat = g.reshape((-1,) + g.shape[-2:])
    out = jax.vmap(lambda m: newton_schulz_orthogonalize(m, steps))(flat)
    return out.reshape(g.shape)


class MuonState(NamedTuple):
    momentum: dict


def muon_transform(momentum=0.95, nesterov=True, ns_steps=6,
                   momentum_dtype=None) -> optax.GradientTransformation:
    """Unit-step Muon update (orthogonalized momentum, negated); compose with
    optax.scale_by_schedule for the learning rate.

    momentum_dtype: storage dtype for the momentum buffer (None = grad
    dtype). bf16 halves the buffer's HBM (the NS iteration casts to bf16 on
    entry anyway, so only cross-step accumulation feels the rounding; the
    orthogonalization uses direction, not magnitude). The accumulation
    itself always runs in f32."""

    def init_fn(params):
        if momentum_dtype is None:
            return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))
        return MuonState(momentum=jax.tree.map(
            lambda p: jnp.zeros(p.shape, momentum_dtype), params))

    def update_fn(grads, state, params=None):
        del params

        def accumulate(b, g):
            new = momentum * b.astype(jnp.float32) + g.astype(jnp.float32)
            return new.astype(b.dtype)

        buf = jax.tree.map(accumulate, state.momentum, grads)
        eff = (jax.tree.map(lambda g, b: g + momentum * b.astype(g.dtype),
                            grads, buf)
               if nesterov else jax.tree.map(lambda g, b: b.astype(g.dtype),
                                             grads, buf))

        def upd(g):
            o = _orthogonalize_any(g, ns_steps)
            # Reference (muon_utils.py:173) scales by max(1, rows/cols)**0.5 on
            # torch (fan_out, fan_in) weights, i.e. max(1, fan_out/fan_in). Our
            # weights are stored (fan_in, fan_out), so that is shape[-1]/shape[-2].
            scale = max(1.0, g.shape[-1] / g.shape[-2]) ** 0.5
            return -scale * o

        return jax.tree.map(upd, eff), MuonState(momentum=buf)

    return optax.GradientTransformation(init_fn, update_fn)


def is_muon_param(path: tuple, value) -> bool:
    """Reference partition rule (model_utils.py:136-146): embeddings, output
    head, and <=1D params go to AdamW; matrix weights go to Muon. Our stacked
    per-layer weights are (L, d_in, d_out); LN gains (L, d) count as 1D."""
    name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path).lower()
    if any(kw in name for kw in ("embed", "lm_head", "table", "centers",
                                 "widths", "ln", "/b")):
        return False
    if name.endswith("b") or value.ndim <= 1:
        return False
    # stacked-layer bias/gain arrays are (L, d): treat as vectors
    if value.ndim == 2 and ("layers" in name and name.split("/")[-1] in ("b", "g")):
        return False
    return value.ndim >= 2 and value.shape[-1] > 1 and value.shape[-2] > 1


def build_optimizer(optim_cfg, schedule) -> optax.GradientTransformation:
    """Assemble the configured optimizer with gradient clipping + schedule."""
    name = optim_cfg.name
    clip = optax.clip_by_global_norm(optim_cfg.gradient_clip) \
        if optim_cfg.gradient_clip > 0 else optax.identity()

    if name == "adamw":
        core = optax.adamw(schedule, weight_decay=optim_cfg.weight_decay)
    elif name == "adafactor":
        core = optax.adafactor(schedule)
    elif name == "adamwscale":
        core = adamwscale(schedule, weight_decay=optim_cfg.weight_decay)
    elif name == "muon":
        mom_bf16 = getattr(optim_cfg, "muon_momentum_dtype", "f32") == "bf16"
        adamw_part = optax.chain(
            optax.adamw(lambda c: schedule(c) * optim_cfg.base_lr_2 / optim_cfg.base_lr,
                        b1=0.90, b2=0.95, weight_decay=optim_cfg.weight_decay,
                        # first moment follows the momentum-dtype knob (the
                        # tables are 122M params at flagship scale); the
                        # second moment stays f32 (sqrt of tiny values)
                        mu_dtype=jnp.bfloat16 if mom_bf16 else None),
        )
        muon_part = optax.chain(
            muon_transform(momentum_dtype=jnp.bfloat16 if mom_bf16 else None),
            optax.scale_by_schedule(schedule),
        )
        core = optax.multi_transform(
            {"muon": muon_part, "adamw": adamw_part},
            param_labels=lambda params: jax.tree_util.tree_map_with_path(
                lambda path, v: "muon" if is_muon_param(path, v) else "adamw",
                params),
        )
    else:
        raise NotImplementedError(f"unknown optimizer {name}")
    return optax.chain(clip, core)


# -- LR schedule (reference model_utils.py:164-208) -----------------------------

def build_schedule(optim_cfg) -> optax.Schedule:
    """warmup (0.5->1.0 linear) -> sustain (constant) -> cosine/linear decay."""
    base = optim_cfg.base_lr
    pieces = []
    boundaries = []
    step = 0
    if optim_cfg.warmup_steps > 0:
        pieces.append(optax.linear_schedule(0.5 * base, base, optim_cfg.warmup_steps))
        step += optim_cfg.warmup_steps
        boundaries.append(step)
    if optim_cfg.sustain_steps > 0:
        pieces.append(optax.constant_schedule(base))
        step += optim_cfg.sustain_steps
        boundaries.append(step)
    decay_steps = max(optim_cfg.total_steps - step, 1)
    if optim_cfg.lr_scheduler == "cosine":
        pieces.append(optax.cosine_decay_schedule(
            base, decay_steps, alpha=optim_cfg.final_cosine / base))
    else:
        pieces.append(optax.linear_schedule(base, optim_cfg.final_cosine, decay_steps))
    if len(pieces) == 1:
        return pieces[0]
    return optax.join_schedules(pieces, boundaries)
