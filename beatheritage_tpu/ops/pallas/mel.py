"""Fused mel-spectrogram kernel (Pallas, TPU).

The BASELINE.json north-star native kernel: framed STFT (as a real-DFT
matmul on the MXU) -> |.|^2 -> mel filterbank GEMM -> optional log1p, all in
one VMEM-resident pass per frame block — the power spectrum (the big
intermediate, ~4x the mel output) never touches HBM.

(reference surface: osuT5/osuT5/model/spectrogram.py:7 via nnAudio/torchaudio
CUDA kernels.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mel import _dft_matrices, _hann, frame_signal, mel_filterbank


def _mel_kernel(frames_ref, cos_ref, sin_ref, fb_ref, o_ref, *, log_scale: bool):
    x = frames_ref[0].astype(jnp.float32)          # (block_t, n_fft) pre-windowed
    re = jnp.dot(x, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(x, sin_ref[...], preferred_element_type=jnp.float32)
    power = re * re + im * im                      # (block_t, n_bins) stays in VMEM
    mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32)
    if log_scale:
        mel = jnp.log1p(mel)
    o_ref[0] = mel.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "n_mels", "hop_length", "f_min",
                     "f_max", "pad_mode", "log_scale", "block_t", "interpret",
                     "dtype"))
def fused_mel_spectrogram(samples: jnp.ndarray, *, sample_rate: int = 16000,
                          n_fft: int = 1024, n_mels: int = 80,
                          hop_length: int = 128, f_min: float = 0.0,
                          f_max: float = 8000.0, pad_mode: str = "constant",
                          log_scale: bool = False, block_t: int = 256,
                          interpret: bool = False,
                          dtype=jnp.bfloat16) -> jnp.ndarray:
    """Audio (B, N) -> mel (B, N//hop + 1, n_mels), matching ops.mel
    semantics (torchaudio defaults: center, hann, power 2, HTK scale)."""
    frames = frame_signal(samples.astype(jnp.float32), n_fft, hop_length, pad_mode)
    window = jnp.asarray(_hann(n_fft))
    frames = frames * window
    b, t, _ = frames.shape

    block_t = min(block_t, max(t, 8))
    pad_t = (-t) % block_t
    if pad_t:
        frames = jnp.pad(frames, ((0, 0), (0, pad_t), (0, 0)))
    t_p = t + pad_t

    n_bins = n_fft // 2 + 1
    cos_m, sin_m = _dft_matrices(n_fft)
    fb = mel_filterbank(n_bins, f_min, f_max, n_mels, sample_rate)

    out = pl.pallas_call(
        functools.partial(_mel_kernel, log_scale=log_scale),
        out_shape=jax.ShapeDtypeStruct((b, t_p, n_mels), dtype),
        grid=(b, t_p // block_t),
        in_specs=[
            pl.BlockSpec((1, block_t, n_fft), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_bins), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, n_mels), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_p * n_fft * n_bins * 2 + 2 * b * t_p * n_bins * n_mels,
            bytes_accessed=(b * t_p * (n_fft + n_mels) * 4
                            + 2 * n_fft * n_bins * 4 + n_bins * n_mels * 4),
            transcendentals=b * t_p * n_mels if log_scale else 0),
        interpret=interpret,
    )(frames, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fb))
    return out[:, :t] if pad_t else out


def fused_mel(samples: jnp.ndarray, spec_cfg, dtype=jnp.bfloat16) -> jnp.ndarray:
    """SpectrogramConfig adapter used by ops.mel.mel_from_config."""
    import jax as _jax  # noqa: PLC0415
    interpret = _jax.default_backend() != "tpu"
    return fused_mel_spectrogram(
        samples, sample_rate=spec_cfg.sample_rate, n_fft=spec_cfg.n_fft,
        n_mels=spec_cfg.n_mels, hop_length=spec_cfg.hop_length,
        f_min=spec_cfg.f_min, f_max=spec_cfg.f_max, pad_mode=spec_cfg.pad_mode,
        log_scale=spec_cfg.log_scale, interpret=interpret, dtype=dtype)
