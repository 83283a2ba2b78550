"""Timestep schedule samplers for diffusion training.

(reference: osu_diffusion/utils/diffusion/timestep_sampler.py — uniform and
loss-second-moment importance sampling from Improved DDPM.) The sampler
state is tiny host-side numpy (per-timestep loss history), so it lives
outside jit: the train loop samples t on host, feeds (t, weights) into the
jitted step, and updates the history with the returned per-sample losses.
"""

from __future__ import annotations

import numpy as np


class UniformSampler:
    needs_losses = False  # stateless: the train loop can skip the device fetch

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, batch_size: int, rng: np.random.Generator):
        ts = rng.integers(0, self.num_timesteps, size=batch_size)
        weights = np.ones(batch_size, dtype=np.float32)
        return ts.astype(np.int32), weights

    def update_with_losses(self, ts, losses) -> None:  # no state
        pass


class LossSecondMomentResampler:
    """Importance-sample t proportional to sqrt(E[loss(t)^2]) once every
    timestep has `history_per_term` observations; uniform until warm."""

    needs_losses = True

    def __init__(self, num_timesteps: int, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._history = np.zeros((num_timesteps, history_per_term),
                                 dtype=np.float64)
        self._counts = np.zeros(num_timesteps, dtype=np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.full(self.num_timesteps, 1.0 / self.num_timesteps)
        w = np.sqrt((self._history ** 2).mean(axis=-1))
        w /= w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        return w

    def sample(self, batch_size: int, rng: np.random.Generator):
        p = self.weights()
        ts = rng.choice(self.num_timesteps, size=batch_size, p=p)
        # importance weights keep the loss estimator unbiased
        weights = 1.0 / (self.num_timesteps * p[ts])
        return ts.astype(np.int32), weights.astype(np.float32)

    def update_with_losses(self, ts, losses) -> None:
        for t, loss in zip(np.asarray(ts), np.asarray(losses, np.float64)):
            if self._counts[t] == self.history_per_term:
                self._history[t, :-1] = self._history[t, 1:]
                self._history[t, -1] = loss
            else:
                self._history[t, self._counts[t]] = loss
                self._counts[t] += 1


def create_schedule_sampler(name: str, num_timesteps: int):
    if name in ("uniform", "", None):
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise ValueError(f"unknown schedule sampler: {name}")
