"""DDPM noise schedules, posterior quantities, and timestep respacing.

Compact JAX re-implementation of the guided-diffusion math the reference
ports (reference: osu_diffusion/utils/diffusion/gaussian_diffusion.py:112
get_named_beta_schedule, :469 p_sample_loop quantities; respace.py:11
space_timesteps). All quantities are precomputed numpy constants baked into
the jitted sampler.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 0.02, num_steps, dtype=np.float64)
    if name == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = [min(1 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps), 0.999)
                 for i in range(num_steps)]
        return np.asarray(betas, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {name}")


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Select a subsequence of original timesteps: `section_counts[i]` steps
    taken evenly from the i-th equal slice of the schedule."""
    if isinstance(section_counts, str):
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 0:
            start_idx += size
            continue
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return sorted(set(all_steps))


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-step constants, optionally respaced onto a subsequence."""

    betas: np.ndarray
    timestep_map: np.ndarray  # respaced index -> original timestep

    def __hash__(self):
        return hash((self.betas.tobytes(), self.timestep_map.tobytes()))

    def __eq__(self, other):
        return (isinstance(other, DiffusionSchedule)
                and np.array_equal(self.betas, other.betas)
                and np.array_equal(self.timestep_map, other.timestep_map))

    @classmethod
    def create(cls, noise_schedule: str = "squaredcos_cap_v2",
               diffusion_steps: int = 1000,
               respacing=None) -> "DiffusionSchedule":
        base_betas = named_beta_schedule(noise_schedule, diffusion_steps)
        if respacing is None:
            return cls(betas=base_betas,
                       timestep_map=np.arange(diffusion_steps))
        use = space_timesteps(diffusion_steps, respacing)
        alphas_cumprod = np.cumprod(1.0 - base_betas)
        last = 1.0
        new_betas = []
        tmap = []
        for i, a in enumerate(alphas_cumprod):
            if i in set(use):
                new_betas.append(1 - a / last)
                last = a
                tmap.append(i)
        return cls(betas=np.asarray(new_betas), timestep_map=np.asarray(tmap))

    @property
    def num_steps(self) -> int:
        return len(self.betas)

    # -- derived quantities (guided-diffusion definitions) --------------------

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas)

    @property
    def alphas_cumprod_prev(self) -> np.ndarray:
        return np.append(1.0, self.alphas_cumprod[:-1])

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)

    @property
    def sqrt_recip_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 / self.alphas_cumprod)

    @property
    def sqrt_recipm1_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 / self.alphas_cumprod - 1.0)

    @property
    def posterior_variance(self) -> np.ndarray:
        return (self.betas * (1.0 - self.alphas_cumprod_prev)
                / (1.0 - self.alphas_cumprod))

    @property
    def posterior_log_variance_clipped(self) -> np.ndarray:
        pv = self.posterior_variance
        return np.log(np.append(pv[1], pv[1:]))

    @property
    def posterior_mean_coef1(self) -> np.ndarray:
        return (self.betas * np.sqrt(self.alphas_cumprod_prev)
                / (1.0 - self.alphas_cumprod))

    @property
    def posterior_mean_coef2(self) -> np.ndarray:
        return ((1.0 - self.alphas_cumprod_prev) * np.sqrt(1.0 - self.betas)
                / (1.0 - self.alphas_cumprod))
