"""Host-side audio IO: decode, resample, normalize.

Replaces the reference's pydub/ffmpeg loader (reference:
osuT5/osuT5/dataset/data_utils.py:76 load_audio_file). The native C++
library decodes WAV directly and MP3/OGG through the system
libmpg123/libvorbisfile (osu! songs are almost always .mp3 or .ogg);
the pure-Python fallback covers WAV via stdlib/scipy, and an external
`ffmpeg` binary is used for anything else if one is present on PATH.
"""

from __future__ import annotations

import shutil
import subprocess
import wave
from pathlib import Path

import numpy as np
from scipy import signal

MILISECONDS_PER_SECOND = 1000


def _read_wav(path: Path) -> tuple[np.ndarray, int]:
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32)
    elif width == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32)
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0)
    elif width == 3:  # 24-bit packed
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        data = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        data = np.where(data & 0x800000, data - 0x1000000, data).astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, sr


def _read_via_ffmpeg(path: Path, sample_rate: int) -> np.ndarray:
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"cannot decode {path.suffix} without ffmpeg on PATH; "
            "convert to WAV or install ffmpeg")
    out = subprocess.run(
        [ffmpeg, "-v", "error", "-i", str(path), "-f", "s16le", "-ac", "1",
         "-ar", str(sample_rate), "-"],
        capture_output=True, check=True)
    return np.frombuffer(out.stdout, dtype=np.int16).astype(np.float32)


def resample(samples: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (band-limited), host-side."""
    if sr_in == sr_out:
        return samples
    g = np.gcd(int(sr_in), int(sr_out))
    return signal.resample_poly(samples, sr_out // g, sr_in // g).astype(np.float32)


def load_audio(path, sample_rate: int = 16000, speed: float = 1.0,
               normalize: bool = True) -> np.ndarray:
    """Audio file -> mono float32 array at `sample_rate`.

    `speed` > 1 plays the audio faster (DT augmentation): implemented by
    reinterpreting the source rate before resampling, matching the
    reference's frame-rate trick (data_utils.py:92)."""
    path = Path(path)
    # prefer the C++ decode+resample path when built (data-loader hot loop;
    # also the only mp3/ogg path without ffmpeg)
    from ..native import decode_audio_native  # noqa: PLC0415
    native = decode_audio_native(path.read_bytes(), sample_rate, speed,
                                 normalize)
    if native is not None:
        return native
    if path.suffix.lower() == ".wav":
        samples, sr = _read_wav(path)
    else:
        samples, sr = _read_via_ffmpeg(path, sample_rate), sample_rate
    effective_sr = sr * speed
    g = np.gcd(int(round(effective_sr)), sample_rate)
    if int(round(effective_sr)) != sample_rate:
        samples = signal.resample_poly(
            samples, sample_rate // g, int(round(effective_sr)) // g).astype(np.float32)
    samples = samples.astype(np.float32)
    if normalize and len(samples) > 0:
        peak = np.max(np.abs(samples))
        if peak > 0:
            samples = samples / peak
    return samples


def save_wav(path, samples: np.ndarray, sample_rate: int = 16000) -> None:
    data = np.clip(samples, -1.0, 1.0)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((data * 32767).astype(np.int16).tobytes())
