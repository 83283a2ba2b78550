"""DDPM ancestral sampler as one lax.scan program.

JAX re-design of guided-diffusion's p_sample_loop with LEARNED_RANGE
variance (reference: osu_diffusion/utils/diffusion/gaussian_diffusion.py:469,
:250 p_mean_variance). The respaced step sequence is static, so the whole
sampling loop compiles into a single program; the per-step `denoised_fn`
hook (slider-end recomputation / in-painting) is a traced function — pure
JAX in-painting composes directly, host geometry goes through
jax.pure_callback.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule


def q_sample(schedule: DiffusionSchedule, x_start: jnp.ndarray,
             t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion: sample x_t ~ q(x_t | x_0)."""
    sqrt_ac = jnp.asarray(schedule.sqrt_alphas_cumprod)[t]
    sqrt_om = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)[t]
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    return sqrt_ac.reshape(shape) * x_start + sqrt_om.reshape(shape) * noise


def p_mean_variance(schedule: DiffusionSchedule, model_out: jnp.ndarray,
                    x: jnp.ndarray, t: jnp.ndarray, *,
                    clip_denoised: bool = True,
                    denoised_fn: Optional[Callable] = None):
    """Posterior mean and log-variance from an (eps, var-values) model output.

    model_out (..., 2C): epsilon prediction and learned variance values in
    [-1, 1] interpolating log(beta_t) .. log(posterior_variance_t).
    """
    c = x.shape[-1]
    eps, var_values = model_out[..., :c], model_out[..., c:]

    shape = (-1,) + (1,) * (x.ndim - 1)
    min_log = jnp.asarray(schedule.posterior_log_variance_clipped)[t].reshape(shape)
    max_log = jnp.log(jnp.asarray(schedule.betas))[t].reshape(shape)
    frac = (var_values + 1) / 2
    model_log_var = frac * max_log + (1 - frac) * min_log

    sqrt_recip = jnp.asarray(schedule.sqrt_recip_alphas_cumprod)[t].reshape(shape)
    sqrt_recipm1 = jnp.asarray(schedule.sqrt_recipm1_alphas_cumprod)[t].reshape(shape)
    x_start = sqrt_recip * x - sqrt_recipm1 * eps
    if clip_denoised:
        x_start = jnp.clip(x_start, -1.0, 1.0)
    if denoised_fn is not None:
        x_start = denoised_fn(x_start)

    coef1 = jnp.asarray(schedule.posterior_mean_coef1)[t].reshape(shape)
    coef2 = jnp.asarray(schedule.posterior_mean_coef2)[t].reshape(shape)
    mean = coef1 * x_start + coef2 * x
    return mean, model_log_var, x_start


def p_sample_step(schedule: DiffusionSchedule, model_fn: Callable,
                  x: jnp.ndarray, t: jnp.ndarray, key: jax.Array, *,
                  clip_denoised: bool = True,
                  denoised_fn: Optional[Callable] = None) -> jnp.ndarray:
    """One ancestral step x_t -> x_{t-1}. `t` is the respaced index; the
    model receives the ORIGINAL timestep via schedule.timestep_map."""
    t_model = jnp.asarray(schedule.timestep_map)[t]
    model_out = model_fn(x, jnp.broadcast_to(t_model, (x.shape[0],)))
    mean, log_var, _ = p_mean_variance(schedule, model_out, x, t,
                                       clip_denoised=clip_denoised,
                                       denoised_fn=denoised_fn)
    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    nonzero = (t != 0).astype(x.dtype)
    return mean + nonzero * jnp.exp(0.5 * log_var) * noise


def p_sample_segment(schedule: DiffusionSchedule, model_fn: Callable,
                     x: jnp.ndarray, key: jax.Array, ts: jnp.ndarray, *,
                     clip_denoised: bool = True,
                     denoised_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Reverse process over an explicit (descending) slice of respaced steps
    in one scan — the device-side building block that lets callers interleave
    host work (e.g. the slider-end projection on backends without host
    callbacks) every len(ts) steps instead of every step."""

    def body(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        x = p_sample_step(schedule, model_fn, x, t, sub,
                          clip_denoised=clip_denoised, denoised_fn=denoised_fn)
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, key), ts)
    return x


def p_sample_loop(schedule: DiffusionSchedule, model_fn: Callable,
                  noise: jnp.ndarray, key: jax.Array, *,
                  clip_denoised: bool = True,
                  denoised_fn: Optional[Callable] = None) -> jnp.ndarray:
    """Full reverse process over all respaced steps (descending) in one scan."""
    ts = jnp.arange(schedule.num_steps - 1, -1, -1)
    return p_sample_segment(schedule, model_fn, noise, key, ts,
                            clip_denoised=clip_denoised,
                            denoised_fn=denoised_fn)


def training_losses(schedule: DiffusionSchedule, model_fn: Callable,
                    x_start: jnp.ndarray, t: jnp.ndarray, key: jax.Array, *,
                    l1: bool = False, weights: jnp.ndarray = None) -> dict:
    """MSE (or L1) on epsilon + rescaled VLB term for the learned variance
    (mean frozen), as in guided-diffusion's LossType.MSE with LEARNED_RANGE
    (reference gaussian_diffusion.py:785)."""
    noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
    x_t = q_sample(schedule, x_start, t, noise)
    model_out = model_fn(x_t, t)
    c = x_start.shape[-1]
    eps, var_values = model_out[..., :c], model_out[..., c:]

    err = jnp.abs(eps - noise) if l1 else (eps - noise) ** 2
    mse = err.reshape(err.shape[0], -1).mean(axis=1)

    # vb term: KL between true posterior and model posterior with frozen mean
    frozen = jnp.concatenate([jax.lax.stop_gradient(eps), var_values], axis=-1)
    mean, log_var, _ = p_mean_variance(schedule, frozen, x_t, t, clip_denoised=False)
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    true_coef1 = jnp.asarray(schedule.posterior_mean_coef1)[t].reshape(shape)
    true_coef2 = jnp.asarray(schedule.posterior_mean_coef2)[t].reshape(shape)
    true_mean = true_coef1 * x_start + true_coef2 * x_t
    true_log_var = jnp.asarray(schedule.posterior_log_variance_clipped)[t].reshape(shape)
    kl = 0.5 * (-1.0 + log_var - true_log_var
                + jnp.exp(true_log_var - log_var)
                + (true_mean - mean) ** 2 * jnp.exp(-log_var))
    kl = kl.reshape(kl.shape[0], -1).mean(axis=1) / np.log(2.0)
    # at t=0 the vb term is the decoder NLL; approximate with kl (matches
    # the refiner regime t in [0,100) closely enough for training signal)
    vb = kl * schedule.num_steps / 1000.0

    loss = mse + vb
    # importance weights from a loss-aware timestep sampler keep the
    # expectation unbiased (timestep_sampler.py)
    w = jnp.ones_like(loss) if weights is None else weights
    return {"loss": (loss * w).mean(), "mse": mse.mean(), "vb": vb.mean(),
            "per_sample": loss}
