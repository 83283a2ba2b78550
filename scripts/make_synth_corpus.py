"""Generate a synthetic MMRS-layout training corpus with learnable structure.

Real MMRS/ORS data is unreachable in this environment, so the real-weights
loop (train -> EOS-terminating generations -> FID/rhythm eval, VERDICT.md
item 1) runs on a synthetic corpus whose audio genuinely carries the signal
the model must learn:

- audio: kick on every beat, snare on 2/4, hi-hats + louder mix in chorus
  (kiai) sections, melodic tones — so onset times, BPM, section boundaries,
  and density are all recoverable from the mel spectrogram
- songs may change BPM mid-song at section boundaries (uninherited timing
  points with integer BPM), so the redline-splitting timing inference and
  super-timing paths (reference postprocessor.py:656-874,
  super_timing_generator.py) see real variable-BPM training signal
- beatmaps: placed on the beat grid by per-mapper style presets (density,
  spacing, slider usage, streams, flow, hitsound habits), modulated by
  section and difficulty; kiai green lines and SV changes at section
  boundaries; hitsound patterns tied to the beat position
- 48 procedurally generated mapper styles (distinct enough that a mapper
  classifier has real signal to learn — the FID feature extractor's quality
  depends on it)

Layout matches what data/dataset.py::load_mmrs_metadata expects:
<root>/metadata.parquet + <root>/data/<folder>/{audio.wav,*.osu}.

Usage:
    python scripts/make_synth_corpus.py --out /tmp/synth_mmrs --sets 200
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

TAG_POOL = [
    ["jump aim"], ["flow aim", "sliders"], ["jump aim", "aim control"],
    ["simple", "clean"], ["flow aim"], ["tech"], ["streams"],
    ["old style"], ["symmetrical"], ["jump aim", "tech"],
    ["streams", "stamina"], ["sliders", "tech"], ["clean"],
    ["aim control", "flow aim"], ["simple"], ["jump aim", "streams"],
]


def make_styles(n: int = 48, seed: int = 7) -> list[dict]:
    """Procedural mapper-style presets (VERDICT r2 item 7: 12 -> ~48).

    Each style differs along axes a classifier can actually recover from the
    produced maps: density, spacing, slider usage, stream runs, angle jitter,
    combo length, and hitsound habit.
    """
    rng = np.random.default_rng(seed)
    styles = []
    for k in range(n):
        styles.append(dict(
            uid=101 + k,
            density=float(rng.uniform(0.6, 1.35)),
            slider_p=float(rng.uniform(0.08, 0.60)),
            spacing=float(rng.uniform(14.0, 36.0)),
            jitter=float(rng.uniform(0.15, 1.0)),
            stream_p=float(rng.choice([0.0, 0.0, 0.08, 0.2])),
            nc_every=int(rng.choice([4, 8, 8, 16])),
            hs_whistle=bool(rng.random() < 0.3),
            spinner_p=float(rng.uniform(0.005, 0.03)),
            tags=TAG_POOL[k % len(TAG_POOL)],
        ))
    return styles


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


def plan_bpms(rng, n_measures: int, base_bpm: float,
              change_prob: float) -> np.ndarray:
    """Per-measure integer BPM with 0-2 redline changes at 4-measure bounds."""
    bpms = np.full(n_measures, float(int(base_bpm)))
    n_changes = 0
    if rng.random() < change_prob:
        n_changes = 1 + int(rng.random() < 0.35)
    bounds = [b for b in range(4, n_measures - 3, 4)]
    rng.shuffle(bounds)
    for b in sorted(bounds[:n_changes]):
        factor = float(rng.choice([0.75, 0.8, 1.2, 1.25, 1.5]))
        new = float(int(np.clip(bpms[b - 1] * factor, 60, 240)))
        bpms[b:] = new
    return bpms


def half_beat_grid(bpms: np.ndarray, offset_ms: float) -> np.ndarray:
    """Times (ms) of every half-beat: shape (n_measures*8 + 1,).

    Entry i is the start of half-beat i; measure m covers entries 8m..8m+7.
    """
    halves = np.repeat(60000.0 / bpms / 2.0, 8)
    return offset_ms + np.concatenate([[0.0], np.cumsum(halves)])


def synth_audio(rng, half_times: np.ndarray, bpms: np.ndarray,
                sections: list[str]) -> np.ndarray:
    """Render a click-track song: kick/snare/hat + melody, section-dependent."""
    n_measures = len(sections)
    total_s = half_times[-1] / 1000.0 + 1.0
    n = int(total_s * SR)
    audio = np.zeros(n, np.float32)

    def add(t_ms, sig, gain):
        i = int(t_ms / 1000.0 * SR)
        j = min(i + len(sig), n)
        if 0 <= i < n:
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
        beat_ms = 60000.0 / bpms[m]
        loud = {"intro": 0.4, "verse": 0.7, "kiai": 1.0, "outro": 0.4}[sec]
        for b in range(4):
            t0 = half_times[m * 8 + b * 2]
            add(t0, kick, 0.9 * loud)
            if b in (1, 3):
                add(t0, snare, 0.5 * loud)
            if sec == "kiai":
                add(t0 + beat_ms / 2, hat, 0.45)
                add(t0, hat, 0.3)
            elif sec == "verse" and b in (1, 3):
                add(t0 + beat_ms / 2, hat, 0.25)
        # melody: one tone per beat pair
        for b in (0, 2):
            t0 = half_times[m * 8 + b * 2]
            f = base_f * 2 ** (scale[rng.integers(0, len(scale))] / 12)
            if sec == "kiai":
                f *= 2
            dur = int(1.6 * beat_ms / 1000.0 * SR)
            tt = np.arange(dur) / SR
            tone = (np.sin(2 * np.pi * f * tt) + 0.3 * np.sin(4 * np.pi * f * tt))
            tone *= np.minimum(1, tt * 30) * np.exp(-tt * 2)
            add(t0, tone.astype(np.float32), 0.12 * loud)

    peak = np.abs(audio).max()
    return audio / max(peak, 1e-6) * 0.9


def _fmt(x: float) -> int:
    return int(round(x))


def make_std_map(rng, style, diff_stars, half_times: np.ndarray,
                 bpms: np.ndarray, sections: list[str]) -> tuple[str, str]:
    """Generate timing points + hit objects for a std map."""
    n_measures = len(sections)
    offset_ms = half_times[0]
    tp = [f"{_fmt(offset_ms)},{60000.0 / bpms[0]:.6f},4,2,0,60,1,0"]
    # redlines at BPM changes; kiai/SV green lines at section boundaries
    for m in range(1, n_measures):
        t = half_times[m * 8]
        if bpms[m] != bpms[m - 1]:
            kiai = 1 if sections[m] == "kiai" else 0
            tp.append(f"{_fmt(t)},{60000.0 / bpms[m]:.6f},4,2,0,60,1,{kiai}")
        if sections[m] != sections[m - 1]:
            kiai = 1 if sections[m] == "kiai" else 0
            sv = 1.2 if sections[m] == "kiai" else 1.0
            tp.append(f"{_fmt(t)},{-100.0 / sv:.6f},4,2,0,{70 if kiai else 55},0,{kiai}")

    density = style["density"] * (0.45 + 0.28 * diff_stars / 2.5)
    spacing = style["spacing"] * diff_stars
    pos = rng.uniform([160, 120], [352, 264])
    angle = rng.uniform(0, 2 * np.pi)
    objects = []
    grid_len = n_measures * 8  # half-beats
    nc_every = style["nc_every"]
    stream_left = 0
    i = 0
    while i < grid_len:
        m = i // 8
        sec = sections[m]
        beat_ms = 60000.0 / bpms[m]
        half = beat_ms / 2
        sec_mult = {"intro": 0.45, "verse": 0.8, "kiai": 1.15, "outro": 0.45}[sec]
        on_beat = i % 2 == 0
        p = density * sec_mult * (1.0 if on_beat else 0.55)
        if stream_left <= 0 and rng.random() > p:
            i += 1
            continue
        if stream_left <= 0 and on_beat and sec == "kiai" and \
                rng.random() < style["stream_p"]:
            stream_left = int(rng.integers(3, 8))
        t = half_times[i]
        new_combo = 4 if i % nc_every == 0 else 0
        # hitsounds: clap/whistle on beats 2/4, finish at section starts
        hs = 0
        if i % 8 in (2, 6):
            hs |= 2 if style["hs_whistle"] else 8
        if i % 32 == 0 and sec == "kiai":
            hs |= 4  # finish
        # flow: turn by style jitter, sometimes sharp; streams flow smoothly
        in_stream = stream_left > 0
        angle += rng.normal(0, 0.15 if in_stream else style["jitter"])
        if not in_stream and rng.random() < 0.12:
            angle += np.pi * rng.uniform(0.6, 1.0)
        dist = max(10.0, rng.normal(spacing, spacing * 0.2))
        if in_stream:
            dist = min(dist, 18.0 + 4.0 * diff_stars)
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
        if in_stream:
            objects.append(f"{x},{y},{_fmt(t)},{1 | new_combo},{hs},0:0:0:0:")
            stream_left -= 1
            i += 1
        elif rng.random() < style["slider_p"] and i + 2 <= grid_len:
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
        elif rng.random() < style["spinner_p"] and i % 8 == 0:
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
    ap.add_argument("--sets", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--styles", type=int, default=48)
    ap.add_argument("--min-measures", type=int, default=16)
    ap.add_argument("--max-measures", type=int, default=28)
    ap.add_argument("--bpm-change-prob", type=float, default=0.5,
                    help="probability a song contains >=1 mid-song redline")
    args = ap.parse_args()

    import pandas as pd

    styles = make_styles(args.styles)
    root = Path(args.out)
    (root / "data").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    rows = []
    bid = 1000
    n_redline_songs = 0
    for sid in range(1, args.sets + 1):
        folder = f"set{sid:04d}"
        d = root / "data" / folder
        d.mkdir(exist_ok=True)
        n_measures = int(rng.integers(args.min_measures, args.max_measures + 1))
        offset_ms = float(rng.integers(40, 400))
        bpms = plan_bpms(rng, n_measures, float(rng.integers(80, 200)),
                         args.bpm_change_prob)
        n_redline_songs += int(len(np.unique(bpms)) > 1)
        # section plan in 4-measure blocks: intro verse kiai verse kiai outro...
        sections = []
        plan = ["intro", "verse", "kiai", "verse", "kiai", "outro"]
        block = 4
        k = 0
        while len(sections) < n_measures:
            sections += [plan[min(k, len(plan) - 1)]] * block
            k += 1
        sections = sections[:n_measures]

        half_times = half_beat_grid(bpms, offset_ms)
        audio = synth_audio(rng, half_times, bpms, sections)
        save_wav(d / "audio.wav", audio, SR)

        style = styles[rng.integers(0, len(styles))]
        n_diffs = int(rng.integers(2, 4))
        year = int(rng.integers(2012, 2024))
        for di in range(n_diffs):
            stars = 1.8 + di * 1.1 + rng.uniform(-0.2, 0.2)
            version = ["Easy", "Normal", "Hard", "Insane"][di]
            tp, objects = make_std_map(rng, style, stars, half_times, bpms,
                                       sections)
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
    print(f"wrote {len(df)} beatmaps across {args.sets} sets to {root} "
          f"({n_redline_songs} songs with mid-song BPM changes, "
          f"{len(styles)} mapper styles)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
