"""End-to-end p50 latency bench: audio file -> playable .osu on one chip.

Times the FULL pipeline (reference: inference.py:323 generate) — audio
load, windowing, timing pass, windowed decode, resnap, postprocess,
.osu write — not just the decode engine. This is the second half of the
BASELINE.md north star ("<10 s full-song beatmap on a single v5e chip");
bench.py covers the throughput half.

Usage:
    python scripts/bench_e2e.py --config synth --ckpt /tmp/synth_ckpt \
        --songs 3 --runs 5 --minutes 3
    python scripts/bench_e2e.py --config beatheritage_v1  # random weights

Prints ONE JSON line:
    {"metric": "e2e_p50_song_to_osu_seconds", "value": ..., "unit": "s",
     "vs_baseline": 10/value, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def make_song(seconds: float, seed: int, out_dir: Path) -> Path:
    """Beat-structured synthetic song (same signal family the synth corpus
    trains on: kicks on beats, snares on 2/4, kiai-section hats)."""
    from beatheritage_tpu.data.audio import save_wav  # noqa: PLC0415

    sr = 16000
    rng = np.random.default_rng(seed)
    bpm = float(rng.uniform(120, 190))
    spb = 60.0 / bpm
    n = int(seconds * sr)
    audio = np.zeros(n, np.float32)
    t_beat = 0.0
    k = 0
    while t_beat < seconds - spb:
        i = int(t_beat * sr)
        dur = int(0.05 * sr)
        env = np.exp(-np.linspace(0, 8, dur))
        audio[i:i + dur] += 0.8 * env * np.sin(
            2 * np.pi * 60 * np.linspace(0, 0.05, dur))
        if k % 2 == 1:
            audio[i:i + dur] += 0.4 * env * rng.standard_normal(dur)
        t_beat += spb
        k += 1
    audio += 0.02 * rng.standard_normal(n).astype(np.float32)
    path = out_dir / f"song_{seed}.wav"
    save_wav(path, audio, sr)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="synth")
    ap.add_argument("--ckpt", default="", help="trained checkpoint dir")
    ap.add_argument("--songs", type=int, default=3)
    ap.add_argument("--runs", type=int, default=5, help="timed runs (p50 over these)")
    ap.add_argument("--minutes", type=float, default=3.0)
    ap.add_argument("--tgt-cap", type=int, default=0,
                    help="optional tgt_seq_len cap to bound compile size")
    ap.add_argument("--out", default="/tmp/bench_e2e")
    ap.add_argument("--device", default="auto")
    ap.add_argument("--fresh-lengths", default="1.4,2.3,4.6",
                    help="comma list of song lengths (minutes) visited ONCE "
                         "each to measure the never-seen-song-length cost "
                         "(different window-batch buckets); empty disables")
    ap.add_argument("-O", "--override", action="append", default=[],
                    help="extra inference-config overrides (key=value)")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from beatheritage_tpu.config import load_config
    from beatheritage_tpu.config.schema import InferenceConfig
    from beatheritage_tpu.inference.pipeline import (
        build_configs, generate, load_model, load_tokenizer)

    overrides = []
    if args.ckpt:
        overrides.append(f"model_path={args.ckpt}")
    if args.tgt_cap:
        overrides.append(f"train.data.tgt_seq_len={args.tgt_cap}")
    overrides.extend(args.override)
    cfg = load_config(InferenceConfig, "inference", args.config,
                      overrides=overrides)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    songs = [make_song(args.minutes * 60, seed, out_dir)
             for seed in range(args.songs)]

    tokenizer = load_tokenizer(cfg)
    params, _ = load_model(cfg, tokenizer)
    gen_cfg, bm_cfg = build_configs(cfg)

    def run(song: Path, tag: str) -> tuple[float, Path]:
        t0 = time.perf_counter()
        _, path, _ = generate(
            cfg, audio_path=str(song), output_path=str(out_dir / tag),
            params=params, tokenizer=tokenizer,
            generation_config=gen_cfg, beatmap_config=bm_cfg, verbose=False)
        return time.perf_counter() - t0, Path(path)

    cold_s, first_path = run(songs[0], "cold")

    times = []
    paths = []
    for r in range(args.runs):
        song = songs[(r + 1) % len(songs)]
        dt, path = run(song, f"run{r}")
        times.append(dt)
        paths.append(path)
        print(f"  run {r}: {dt:.2f}s ({song.name})", file=sys.stderr)

    # never-seen song lengths: each visits a different window-batch bucket
    # exactly once, so this p50 carries whatever per-new-length compile cost
    # survives the bucketing (VERDICT r3: fresh songs paid ~15 s of decode
    # compiles; window-batch bucketing is supposed to kill that)
    fresh_times = []
    fresh_lengths = [float(m) for m in args.fresh_lengths.split(",") if m]
    for j, minutes in enumerate(fresh_lengths):
        song = make_song(minutes * 60, 100 + j, out_dir)
        dt, path = run(song, f"fresh{j}")
        fresh_times.append(dt)
        paths.append(path)
        print(f"  fresh {minutes:.1f}min: {dt:.2f}s", file=sys.stderr)

    # validate output: the generated .osu must reparse with objects + timing
    from beatheritage_tpu.osu.beatmap import Beatmap
    bm = Beatmap.from_path(paths[-1])
    n_objects = len(bm.hit_objects())
    n_timing = len(bm.timing_points)

    p50 = float(np.median(times))
    result = {
        "metric": "e2e_p50_song_to_osu_seconds",
        "value": round(p50, 3),
        "unit": "s",
        "vs_baseline": round(10.0 / p50, 3),  # north star: <10 s/song
        "detail": {
            "config": args.config,
            "checkpoint": args.ckpt or "random weights",
            "song_minutes": args.minutes,
            "cold_seconds": round(cold_s, 2),
            "runs": [round(t, 2) for t in times],
            "fresh_song_length_p50": (round(float(np.median(fresh_times)), 3)
                                      if fresh_times else None),
            "fresh_runs": {f"{m:.1f}min": round(t, 2)
                           for m, t in zip(fresh_lengths, fresh_times)},
            "last_osu_objects": n_objects,
            "last_osu_timing_points": n_timing,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
