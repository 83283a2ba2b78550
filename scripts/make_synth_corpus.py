"""Generate a synthetic MMRS-layout training corpus with learnable structure.

Real MMRS/ORS data is unreachable in this environment, so the real-weights
loop (train -> EOS-terminating generations -> FID/rhythm eval, VERDICT.md
item 1) runs on a synthetic corpus whose audio genuinely carries the signal
the model must learn:

- audio: kick on every beat, snare on 2/4, hi-hats + louder mix in chorus
  (kiai) sections, melodic tones — so onset times, BPM, section boundaries,
  and density are all recoverable from the mel spectrogram
- beatmaps: placed on the beat grid by per-mapper style presets (density,
  spacing, slider usage, flow), modulated by section and difficulty; kiai
  green lines and SV changes at section boundaries; hitsound patterns tied
  to the beat position

Layout matches what data/dataset.py::load_mmrs_metadata expects:
<root>/metadata.parquet + <root>/data/<folder>/{audio.wav,*.osu}.

Usage:
    python scripts/make_synth_corpus.py --out /tmp/synth_mmrs --sets 150
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from beatheritage_tpu.data.audio import save_wav  # noqa: E402

SR = 16000
PLAYFIELD = np.array([512.0, 384.0])
MARGIN = 24.0

# mapper style presets: (density multiplier, slider probability, mean spacing
# per star, angle jitter rad, descriptor tags)
STYLES = [
    dict(uid=101, density=1.0, slider_p=0.25, spacing=28.0, jitter=0.5,
         tags=["jump aim"]),
    dict(uid=102, density=0.8, slider_p=0.55, spacing=20.0, jitter=0.25,
         tags=["flow aim", "sliders"]),
    dict(uid=103, density=1.2, slider_p=0.15, spacing=34.0, jitter=0.9,
         tags=["jump aim", "aim control"]),
    dict(uid=104, density=0.7, slider_p=0.40, spacing=16.0, jitter=0.2,
         tags=["simple", "clean"]),
    dict(uid=105, density=1.0, slider_p=0.35, spacing=24.0, jitter=0.6,
         tags=["flow aim"]),
]

OSU_TEMPLATE = """osu file format v14

[General]
AudioFilename: audio.wav
AudioLeadIn: 0
PreviewTime: -1
Countdown: 0
SampleSet: Normal
StackLeniency: 0.7
Mode: {mode}
LetterboxInBreaks: 0

[Metadata]
Title:Synth Track {sid}
TitleUnicode:Synth Track {sid}
Artist:Generator
ArtistUnicode:Generator
Creator:mapper{uid}
Version:{version}
BeatmapID:{bid}
BeatmapSetID:{sid}

[Difficulty]
HPDrainRate:5
CircleSize:4
OverallDifficulty:{od}
ApproachRate:{ar}
SliderMultiplier:1.4
SliderTickRate:1

[Events]

[TimingPoints]
{timing_points}

[HitObjects]
{objects}
"""


def synth_audio(rng, bpm: float, n_measures: int, sections: list[str],
                offset_ms: float) -> np.ndarray:
    """Render a click-track song: kick/snare/hat + melody, section-dependent."""
    beat_s = 60.0 / bpm
    total_s = offset_ms / 1000.0 + n_measures * 4 * beat_s + 1.0
    n = int(total_s * SR)
    audio = np.zeros(n, np.float32)
    t_all = np.arange(n) / SR

    # pad-free helper to add a burst at time t
    def add(t_s, sig, gain):
        i = int(t_s * SR)
        j = min(i + len(sig), n)
        if i < n:
            audio[i:j] += gain * sig[: j - i]

    kick_t = np.arange(int(0.09 * SR)) / SR
    kick = np.sin(2 * np.pi * (90 - 300 * kick_t) * kick_t) * np.exp(-kick_t * 40)
    snare = (rng.standard_normal(int(0.07 * SR)) *
             np.exp(-np.arange(int(0.07 * SR)) / SR * 60)).astype(np.float32)
    hat = (rng.standard_normal(int(0.025 * SR)) *
           np.exp(-np.arange(int(0.025 * SR)) / SR * 250)).astype(np.float32)
    # high-pass-ish the hat by differencing
    hat = np.diff(hat, prepend=0.0) * 2.0

    scale = np.array([0, 2, 4, 7, 9])  # pentatonic
    base_f = 220.0 * 2 ** (rng.integers(-3, 4) / 12)

    for m in range(n_measures):
        sec = sections[m]
        loud = {"intro": 0.4, "verse": 0.7, "kiai": 1.0, "outro": 0.4}[sec]
        for b in range(4):
            t0 = offset_ms / 1000.0 + (m * 4 + b) * beat_s
            add(t0, kick, 0.9 * loud)
            if b in (1, 3):
                add(t0, snare, 0.5 * loud)
            if sec == "kiai":
                add(t0 + beat_s / 2, hat, 0.45)
                add(t0, hat, 0.3)
            elif sec == "verse" and b in (1, 3):
                add(t0 + beat_s / 2, hat, 0.25)
        # melody: one tone per beat pair
        for b in (0, 2):
            t0 = offset_ms / 1000.0 + (m * 4 + b) * beat_s
            f = base_f * 2 ** (scale[rng.integers(0, len(scale))] / 12)
            if sec == "kiai":
                f *= 2
            dur = int(1.6 * beat_s * SR)
            tt = np.arange(dur) / SR
            tone = (np.sin(2 * np.pi * f * tt) + 0.3 * np.sin(4 * np.pi * f * tt))
            tone *= np.minimum(1, tt * 30) * np.exp(-tt * 2)
            add(t0, tone.astype(np.float32), 0.12 * loud)

    peak = np.abs(audio).max()
    return audio / max(peak, 1e-6) * 0.9


def _fmt(x: float) -> int:
    return int(round(x))


def make_std_map(rng, style, diff_stars, bpm, n_measures, sections,
                 offset_ms) -> tuple[str, str]:
    """Generate timing points + hit objects for a std map."""
    beat_ms = 60000.0 / bpm
    sv_base = 1.0
    tp = [f"{_fmt(offset_ms)},{beat_ms:.6f},4,2,0,60,1,0"]
    # kiai/SV green lines at section boundaries
    for m in range(1, n_measures):
        if sections[m] != sections[m - 1]:
            t = offset_ms + m * 4 * beat_ms
            kiai = 1 if sections[m] == "kiai" else 0
            sv = 1.2 if sections[m] == "kiai" else 1.0
            tp.append(f"{_fmt(t)},{-100.0 / sv:.6f},4,2,0,{70 if kiai else 55},0,{kiai}")

    density = style["density"] * (0.45 + 0.28 * diff_stars / 2.5)
    spacing = style["spacing"] * diff_stars
    pos = rng.uniform([160, 120], [352, 264])
    angle = rng.uniform(0, 2 * np.pi)
    objects = []
    half = beat_ms / 2
    grid_len = n_measures * 8  # half-beats
    i = 0
    while i < grid_len:
        m = i // 8
        sec = sections[m]
        sec_mult = {"intro": 0.45, "verse": 0.8, "kiai": 1.15, "outro": 0.45}[sec]
        on_beat = i % 2 == 0
        p = density * sec_mult * (1.0 if on_beat else 0.55)
        if rng.random() > p:
            i += 1
            continue
        t = offset_ms + i * half
        new_combo = 4 if i % 8 == 0 else 0
        # hitsounds: clap on beats 2/4, finish at section starts
        hs = 0
        if i % 8 in (2, 6):
            hs |= 8  # clap
        if i % 32 == 0 and sec == "kiai":
            hs |= 4  # finish
        # flow: turn by style jitter, sometimes sharp
        angle += rng.normal(0, style["jitter"])
        if rng.random() < 0.12:
            angle += np.pi * rng.uniform(0.6, 1.0)
        dist = max(10.0, rng.normal(spacing, spacing * 0.2))
        step = np.array([np.cos(angle), np.sin(angle)]) * dist
        nxt = pos + step
        # reflect into the playfield
        for ax in range(2):
            lo, hi = MARGIN, PLAYFIELD[ax] - MARGIN
            if nxt[ax] < lo or nxt[ax] > hi:
                nxt[ax] = np.clip(2 * np.clip(nxt[ax], lo, hi) - nxt[ax], lo, hi)
                angle = np.arctan2(*(nxt - pos)[::-1])
        pos = nxt
        x, y = _fmt(pos[0]), _fmt(pos[1])

        sv = 1.2 if sec == "kiai" else 1.0
        if rng.random() < style["slider_p"] and i + 2 <= grid_len:
            beats = 1.0 if (on_beat and rng.random() < 0.7) else 0.5
            length = beats * 100.0 * 1.4 * sv
            end_angle = angle + rng.normal(0, 0.4)
            if not (MARGIN < pos[0] + np.cos(end_angle) * length < PLAYFIELD[0] - MARGIN
                    and MARGIN < pos[1] + np.sin(end_angle) * length < PLAYFIELD[1] - MARGIN):
                # point toward the playfield centre so the full length fits
                end_angle = np.arctan2(*(PLAYFIELD / 2 - pos)[::-1])
            end = pos + np.array([np.cos(end_angle), np.sin(end_angle)]) * length
            objects.append(
                f"{x},{y},{_fmt(t)},{2 | new_combo},{hs},"
                f"L|{_fmt(end[0])}:{_fmt(end[1])},1,{length:.2f}")
            pos = end
            i += int(beats * 2)
        elif rng.random() < 0.02 and i % 8 == 0:
            t_end = t + 4 * half
            objects.append(f"256,192,{_fmt(t)},{8 | new_combo},{hs},{_fmt(t_end)}")
            pos = rng.uniform([160, 120], [352, 264])
            i += 6
        else:
            objects.append(f"{x},{y},{_fmt(t)},{1 | new_combo},{hs},0:0:0:0:")
            i += 1
    return "\n".join(tp), "\n".join(objects)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_mmrs")
    ap.add_argument("--sets", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-measures", type=int, default=16)
    ap.add_argument("--max-measures", type=int, default=28)
    args = ap.parse_args()

    import pandas as pd

    root = Path(args.out)
    (root / "data").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    rows = []
    bid = 1000
    for sid in range(1, args.sets + 1):
        folder = f"set{sid:04d}"
        d = root / "data" / folder
        d.mkdir(exist_ok=True)
        bpm = float(rng.integers(80, 200))
        n_measures = int(rng.integers(args.min_measures, args.max_measures + 1))
        offset_ms = float(rng.integers(40, 400))
        # section plan in 4-measure blocks: intro verse kiai verse kiai outro...
        sections = []
        plan = ["intro", "verse", "kiai", "verse", "kiai", "outro"]
        block = 4
        k = 0
        while len(sections) < n_measures:
            sections += [plan[min(k, len(plan) - 1)]] * block
            k += 1
        sections = sections[:n_measures]

        audio = synth_audio(rng, bpm, n_measures, sections, offset_ms)
        save_wav(d / "audio.wav", audio, SR)

        style = STYLES[rng.integers(0, len(STYLES))]
        n_diffs = int(rng.integers(2, 4))
        year = int(rng.integers(2012, 2024))
        for di in range(n_diffs):
            stars = 1.8 + di * 1.1 + rng.uniform(-0.2, 0.2)
            version = ["Easy", "Normal", "Hard", "Insane"][di]
            tp, objects = make_std_map(rng, style, stars, bpm, n_measures,
                                       sections, offset_ms)
            fname = f"map{bid}.osu"
            (d / fname).write_text(OSU_TEMPLATE.format(
                mode=0, sid=sid, uid=style["uid"], version=version, bid=bid,
                od=5 + di, ar=5 + 1.5 * di, timing_points=tp, objects=objects))
            rows.append({
                "BeatmapSetId": sid, "Id": bid, "BeatmapIdx": bid - 1000,
                "BeatmapSetFolder": folder, "BeatmapFile": fname,
                "AudioFile": "audio.wav", "ModeInt": 0,
                "UserId": style["uid"],
                "StarRating": [float(stars)] * 7,
                "DifficultyRating": float(stars),
                "SubmittedDate": pd.Timestamp(f"{year}-03-01"),
                "RankedDate": pd.Timestamp(f"{year}-09-01"),
                "OmdbTags": list(style["tags"]),
            })
            bid += 1

    df = pd.DataFrame(rows)
    df.to_parquet(root / "metadata.parquet")
    print(f"wrote {len(df)} beatmaps across {args.sets} sets to {root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
