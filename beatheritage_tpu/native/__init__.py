"""Native (C++) host-side runtime pieces, loaded via ctypes.

Build once with `python -m beatheritage_tpu.native.build`; loaders fall back
to the pure-Python implementations when the shared library is absent.
"""

from __future__ import annotations

import ctypes
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
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
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
