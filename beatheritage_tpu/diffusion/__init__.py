"""DDPM schedules, lax.scan samplers, and the coordinate-refinement pipeline."""

from .pipeline import DiffusionPipeline, repeat_type
from .sampler import p_sample_loop, p_sample_step, q_sample, training_losses
from .schedule import DiffusionSchedule, named_beta_schedule, space_timesteps
from .tokenizer import DiffusionTokenizer

__all__ = [
    "DiffusionPipeline", "repeat_type", "p_sample_loop", "p_sample_step",
    "q_sample", "training_losses", "DiffusionSchedule", "named_beta_schedule",
    "space_timesteps", "DiffusionTokenizer",
]
