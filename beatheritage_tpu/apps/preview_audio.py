"""Render a beatmap over its song as audio with clicks — the listening
check used to validate datasets and generated maps by ear.

(reference: osuT5/dataloading.py:53 renders dataset sequences with
play_hs:21 click synthesis; this drives the same check through the public
beatmap/audio stack: each hit object contributes a click whose pitch/decay
reflect its hitsounds.)

Usage:
    python -m beatheritage_tpu.apps.preview_audio map.osu [-a song.mp3]
        [-o preview.wav] [--sr 16000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def click(sr: int, hz: float, seconds: float = 0.04, amp: float = 0.8):
    n = int(sr * seconds)
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * hz * t) * np.exp(-t * 60)).astype(np.float32)


def render_preview(beatmap, audio: np.ndarray, sr: int) -> np.ndarray:
    """Mix clicks at hit-object times: normal=1kHz, whistle=1.5kHz,
    clap=1.8kHz, finish adds a low 400Hz boom (longer decay)."""
    out = audio.copy()

    def add(at_ms: float, hz: float, seconds=0.04, amp=0.8):
        i = int(at_ms / 1000 * sr)
        c = click(sr, hz, seconds, amp)
        if 0 <= i < len(out):
            j = min(len(out), i + len(c))
            out[i:j] += c[: j - i]
        return None

    for ho in beatmap.hit_objects():
        hs = getattr(ho, "hitsound", 0) or 0
        add(ho.time, 1000.0)
        if hs & 2:  # whistle
            add(ho.time, 1500.0)
        if hs & 8:  # clap
            add(ho.time, 1800.0)
        if hs & 4:  # finish
            add(ho.time, 400.0, seconds=0.12, amp=0.9)
        end = getattr(ho, "end_time", None)
        if end is not None and end > ho.time:
            add(end, 800.0, amp=0.5)

    peak = np.abs(out).max()
    return out / peak if peak > 1.0 else out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="render beatmap click preview")
    parser.add_argument("beatmap", help=".osu file")
    parser.add_argument("-a", "--audio", default=None,
                        help="song file (defaults to AudioFilename next to the map)")
    parser.add_argument("-o", "--output", default=None,
                        help="output wav (default <map>.preview.wav)")
    parser.add_argument("--sr", type=int, default=16000)
    ns = parser.parse_args(argv)

    from ..data.audio import load_audio, save_wav
    from ..osu.beatmap import Beatmap

    bm_path = Path(ns.beatmap)
    bm = Beatmap.from_path(bm_path)
    audio_path = Path(ns.audio) if ns.audio else bm_path.parent / bm.audio_filename
    if audio_path.is_file():
        audio = load_audio(audio_path, sample_rate=ns.sr, normalize=True) * 0.5
    else:
        objs = bm.hit_objects()
        last = max((getattr(ho, "end_time", None) or ho.time)
                   for ho in objs) if objs else 1000.0
        print(f"audio not found at {audio_path}; rendering clicks over silence")
        audio = np.zeros(int((last / 1000 + 1) * ns.sr), np.float32)

    out = render_preview(bm, audio, ns.sr)
    out_path = Path(ns.output) if ns.output else bm_path.with_suffix(".preview.wav")
    save_wav(out_path, out, ns.sr)
    print(f"wrote {out_path} ({len(out) / ns.sr:.1f}s, "
          f"{len(bm.hit_objects())} objects)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
