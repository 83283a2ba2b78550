"""Native mp3/ogg decode path (system libmpg123/libvorbisfile via C++).

Fixtures are synthesized in-process with the system lame/vorbisenc encoders
so no binary audio is checked in. Skipped when the native library or the
system codecs are absent (the loader falls back to ffmpeg/WAV paths).
"""

import numpy as np
import pytest

from beatheritage_tpu.native import (
    available,
    codec_support,
    decode_audio_native,
    encode_for_test,
)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native library not built")


def _sine(sr=44100, seconds=2.0, hz=440.0, amp=0.6):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _dominant_hz(samples, sr):
    spec = np.abs(np.fft.rfft(samples))
    return np.argmax(spec) * sr / len(samples)


@pytest.mark.parametrize("fmt", ["mp3", "ogg"])
def test_compressed_roundtrip_preserves_tone(fmt):
    if not codec_support()[fmt]:
        pytest.skip(f"system {fmt} codec unavailable")
    sr = 44100
    sig = _sine(sr)
    data = encode_for_test(sig, sr, fmt)
    assert data is not None and len(data) > 1000
    dec = decode_audio_native(data, 16000)
    assert dec is not None
    # length within codec padding tolerance, tone and peak preserved
    assert abs(len(dec) - 2 * 16000) < 4000
    assert abs(_dominant_hz(dec[:16000], 16000) - 440.0) < 2.0
    assert 0.9 < np.abs(dec).max() <= 1.0  # normalize=True


def test_decode_speed_stretch_ogg():
    if not codec_support()["ogg"]:
        pytest.skip("system ogg codec unavailable")
    sr = 44100
    data = encode_for_test(_sine(sr), sr, "ogg")
    # DT trick: speed=1.5 shortens audio and raises pitch by the same factor
    dec = decode_audio_native(data, 16000, speed=1.5)
    assert abs(len(dec) - 2 * 16000 / 1.5) < 4000
    assert abs(_dominant_hz(dec[:16000], 16000) - 440.0 * 1.5) < 2.0


def test_load_audio_routes_compressed(tmp_path):
    if not codec_support()["mp3"]:
        pytest.skip("system mp3 codec unavailable")
    from beatheritage_tpu.data.audio import load_audio
    sr = 44100
    data = encode_for_test(_sine(sr), sr, "mp3")
    p = tmp_path / "song.mp3"
    p.write_bytes(data)
    out = load_audio(p, sample_rate=16000)
    assert abs(_dominant_hz(out[:16000], 16000) - 440.0) < 2.0


def test_garbage_bytes_rejected():
    assert decode_audio_native(b"\x00\x01" * 500, 16000) is None
    assert decode_audio_native(b"OggS" + b"\x00" * 100, 16000) is None
