"""Native (C++) host-side runtime pieces, loaded via ctypes.

Build once with `python -m beatheritage_tpu.native.build`; loaders fall back
to the pure-Python implementations when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libbhaudio.so"
_lib: Optional[ctypes.CDLL] = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        # Build on first use: the .so is not shipped in git or the wheel.
        # Build to a temp name + atomic rename so a concurrent loader never
        # sees a half-written library.
        try:
            from .build import build
            tmp = _LIB_PATH.with_suffix(f".tmp{os.getpid()}.so")
            build(verbose=False, out=tmp)
            os.replace(tmp, _LIB_PATH)
        except Exception:
            return None
        if not _LIB_PATH.exists():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        # corrupt/foreign-arch library: drop it so the next call rebuilds
        try:
            _LIB_PATH.unlink()
        except OSError:
            pass
        return None
    lib.bh_decode_wav.restype = ctypes.c_int
    lib.bh_decode_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_size_t)]
    lib.bh_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.bh_frame_signal.restype = ctypes.c_int
    lib.bh_frame_signal.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_size_t]
    lib.bh_decode_audio.restype = ctypes.c_int
    lib.bh_decode_audio.argtypes = lib.bh_decode_wav.argtypes
    lib.bh_codec_support.restype = ctypes.c_int
    lib.bh_codec_support.argtypes = []
    for enc in (lib.bh_encode_mp3, lib.bh_encode_ogg):
        enc.restype = ctypes.c_int64
        enc.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
                        ctypes.c_int,
                        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    lib.bh_free_bytes.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def decode_wav_native(data: bytes, target_sr: int, speed: float = 1.0,
                      normalize: bool = True) -> Optional[np.ndarray]:
    """Decode WAV bytes -> mono float32 at target_sr via the C++ library.
    Returns None when the library is unavailable or decoding fails."""
    lib = load_library()
    if lib is None:
        return None
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_size_t()
    rc = lib.bh_decode_wav(data, len(data), target_sr, speed,
                           int(normalize), ctypes.byref(out_ptr),
                           ctypes.byref(out_len))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out_ptr, shape=(out_len.value,)).copy()
    finally:
        lib.bh_free(out_ptr)
    return arr


def decode_audio_native(data: bytes, target_sr: int, speed: float = 1.0,
                        normalize: bool = True) -> Optional[np.ndarray]:
    """Decode WAV/MP3/OGG bytes (sniffed from magic) -> mono float32 at
    target_sr. MP3/OGG route through the system libmpg123/libvorbisfile,
    resolved at runtime inside the C++ library."""
    lib = load_library()
    if lib is None:
        return None
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    out_len = ctypes.c_size_t()
    rc = lib.bh_decode_audio(data, len(data), target_sr, speed,
                             int(normalize), ctypes.byref(out_ptr),
                             ctypes.byref(out_len))
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out_ptr, shape=(out_len.value,)).copy()
    finally:
        lib.bh_free(out_ptr)
    return arr


def codec_support() -> dict:
    """Which compressed-audio decoders resolved on this host."""
    lib = load_library()
    if lib is None:
        return {"mp3": False, "ogg": False}
    mask = lib.bh_codec_support()
    return {"mp3": bool(mask & 1), "ogg": bool(mask & 2)}


def encode_for_test(samples: np.ndarray, sample_rate: int,
                    fmt: str) -> Optional[bytes]:
    """Encode mono float32 to mp3/ogg bytes — test-fixture helper only
    (uses the system lame/vorbisenc encoders)."""
    lib = load_library()
    if lib is None:
        return None
    fn = {"mp3": lib.bh_encode_mp3, "ogg": lib.bh_encode_ogg}[fmt]
    buf = np.ascontiguousarray(samples, dtype=np.float32)
    out_ptr = ctypes.POINTER(ctypes.c_uint8)()
    n = fn(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size,
           sample_rate, ctypes.byref(out_ptr))
    if n < 0:
        return None
    try:
        return bytes(np.ctypeslib.as_array(out_ptr, shape=(n,)))
    finally:
        lib.bh_free_bytes(out_ptr)
