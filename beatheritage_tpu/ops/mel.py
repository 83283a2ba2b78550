"""Mel spectrogram frontend (XLA path).

TPU-native replacement for the reference's nnAudio/torchaudio GPU mel
(reference: osuT5/osuT5/model/spectrogram.py:7). Semantics match
torchaudio.transforms.MelSpectrogram defaults used by the production configs:
center=True (pad n_fft//2 each side), hann window, power=2, HTK mel scale,
no filterbank norm, n_frames = n_samples // hop_length + 1.

Two STFT strategies:
- "fft":     jnp.fft.rfft per frame (fine on CPU)
- "matmul":  real DFT as two matmuls (MXU-friendly; default on TPU, and the
             shape the fused Pallas kernel mirrors)

The whole pipeline is jit-compatible and differentiable.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(freq, mel_scale: str = "htk"):
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + np.asarray(freq) / 700.0)
    # slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (np.asarray(freq, dtype=np.float64) - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def mel_to_hz(mels, mel_scale: str = "htk"):
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (np.asarray(mels) / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * np.asarray(mels, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


def mel_filterbank(n_freqs: int, f_min: float, f_max: float, n_mels: int,
                   sample_rate: int, mel_scale: str = "htk",
                   norm: Optional[str] = None) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels), float32."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min, mel_scale), hz_to_mel(f_max, mel_scale),
                        n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def _hann(n_fft: int) -> np.ndarray:
    # periodic hann (torch.hann_window default)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: (n_fft, n_bins) cos and -sin matrices."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    return np.cos(angle).astype(np.float32), (-np.sin(angle)).astype(np.float32)


def frame_signal(samples: jnp.ndarray, n_fft: int, hop_length: int,
                 pad_mode: str = "constant") -> jnp.ndarray:
    """(B, N) -> (B, frames, n_fft) with center padding; frames = N//hop + 1."""
    pad = n_fft // 2
    mode = {"constant": "constant", "reflect": "reflect"}.get(pad_mode, "constant")
    x = jnp.pad(samples, ((0, 0), (pad, pad)), mode=mode)
    n_frames = samples.shape[-1] // hop_length + 1
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :])
    return x[:, idx]


def mel_spectrogram(samples: jnp.ndarray, *, sample_rate: int = 16000,
                    n_fft: int = 1024, n_mels: int = 388, hop_length: int = 128,
                    f_min: float = 0.0, f_max: float = 8000.0,
                    pad_mode: str = "constant", log_scale: bool = False,
                    mel_scale: str = "htk", norm: Optional[str] = None,
                    stft: str = "matmul",
                    dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Audio (B, N) float -> mel frames (B, N//hop + 1, n_mels)."""
    frames = frame_signal(samples.astype(jnp.float32), n_fft, hop_length, pad_mode)
    window = jnp.asarray(_hann(n_fft))
    frames = frames * window

    n_bins = n_fft // 2 + 1
    if stft == "fft":
        spec = jnp.fft.rfft(frames, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    else:
        cos_m, sin_m = _dft_matrices(n_fft)
        re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(cos_m),
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(sin_m),
                        preferred_element_type=jnp.float32)
        power = re * re + im * im

    fb = jnp.asarray(mel_filterbank(n_bins, f_min, f_max, n_mels, sample_rate,
                                    mel_scale, norm))
    mel = jnp.einsum("btk,km->btm", power, fb, preferred_element_type=jnp.float32)
    if log_scale:
        mel = jnp.log1p(mel)
    return mel.astype(dtype)


def mel_from_config(samples: jnp.ndarray, spec_cfg, dtype=jnp.float32) -> jnp.ndarray:
    """Apply a SpectrogramConfig. 'pallas' falls back to matmul until the
    fused kernel (ops.pallas.mel) takes over on TPU."""
    if samples.dtype == jnp.int16:
        # loaders may ship int16 PCM to halve host->device transfer
        # (DataConfig.pcm_int16); convert on device where FLOPs are free
        samples = samples.astype(jnp.float32) / 32768.0
    impl = spec_cfg.implementation
    stft = "fft" if impl == "xla_fft" else "matmul"
    if impl == "pallas":
        try:
            from .pallas.mel import fused_mel  # noqa: PLC0415
            return fused_mel(samples, spec_cfg, dtype=dtype)
        except (ImportError, NotImplementedError):
            stft = "matmul"
    return mel_spectrogram(
        samples,
        sample_rate=spec_cfg.sample_rate, n_fft=spec_cfg.n_fft,
        n_mels=spec_cfg.n_mels, hop_length=spec_cfg.hop_length,
        f_min=spec_cfg.f_min, f_max=spec_cfg.f_max, pad_mode=spec_cfg.pad_mode,
        log_scale=spec_cfg.log_scale, stft=stft, dtype=dtype)
