"""Super-timing validation on variable-BPM songs (VERDICT r3 item 5).

Runs the full pipeline with `super_timing=true` (reference
super_timing_generator.py:15-41) — and, for comparison, the plain timing
pre-pass — over held-out synth-corpus songs whose ground-truth redlines
(mid-song BPM changes) are known, then scores the inferred timing:

- per-GT-redline time error (ms) and BPM error against the best match
- redline count delta (missed / spurious redlines)
- BPM hit rate: matched within 50 ms and 0.5 BPM (integer ground truth,
  so human BPM rounding should land exactly)
- wall latency of each mode

Usage:
    python scripts/eval_timing.py --ckpt /tmp/flagship_ckpt \
        --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 --songs 6 \
        --out EVAL_TIMING_r03.json
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


def gt_redlines(osu_path: Path) -> list[tuple[float, float]]:
    from beatheritage_tpu.osu.beatmap import Beatmap
    bm = Beatmap.from_path(osu_path)
    return [(tp.offset, 60000.0 / tp.ms_per_beat)
            for tp in bm.timing_points if tp.uninherited]


def score(gt: list[tuple[float, float]], got: list[tuple[float, float]],
          time_tol: float = 50.0, bpm_tol: float = 0.5) -> dict:
    rows = []
    for t_gt, bpm_gt in gt:
        if not got:
            rows.append({"dt_ms": None, "dbpm": None, "hit": False})
            continue
        t_i, bpm_i = min(got, key=lambda x: abs(x[0] - t_gt))
        dt = abs(t_i - t_gt)
        dbpm = abs(bpm_i - bpm_gt)
        rows.append({"dt_ms": round(dt, 1), "dbpm": round(dbpm, 3),
                     "hit": bool(dt <= time_tol and dbpm <= bpm_tol)})
    dts = [r["dt_ms"] for r in rows if r["dt_ms"] is not None]
    dbs = [r["dbpm"] for r in rows if r["dbpm"] is not None]
    return {
        "gt_redlines": len(gt),
        "inferred_redlines": len(got),
        "hit_rate": round(float(np.mean([r["hit"] for r in rows])), 3)
        if rows else None,
        "median_dt_ms": round(float(np.median(dts)), 1) if dts else None,
        "median_dbpm": round(float(np.median(dbs)), 3) if dbs else None,
        "rows": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="auto")
    ap.add_argument("--config", default="synth")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v3")
    ap.add_argument("--start", type=int, default=185)
    ap.add_argument("--end", type=int, default=200)
    ap.add_argument("--songs", type=int, default=6)
    ap.add_argument("--variable-only", action="store_true", default=True)
    ap.add_argument("--out", default="/tmp/eval_timing.json")
    ap.add_argument("--override", action="append", default=[])
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
    from beatheritage_tpu.osu.beatmap import Beatmap

    overrides = list(args.override)
    if args.ckpt:
        overrides.append(f"model_path={args.ckpt}")

    # pick held-out songs, preferring variable-BPM ones
    root = Path(args.dataset)
    picked: list[tuple[Path, Path]] = []  # (audio, gt_osu)
    fallback: list[tuple[Path, Path]] = []
    for sid in range(args.start + 1, args.end + 1):
        d = root / "data" / f"set{sid:04d}"
        osus = sorted(d.glob("*.osu"))
        if not d.is_dir() or not osus:
            continue
        entry = (d / "audio.wav", osus[0])
        if len(gt_redlines(osus[0])) > 1:
            picked.append(entry)
        else:
            fallback.append(entry)
    picked = (picked + fallback)[:args.songs]
    if not picked:
        print(json.dumps({"error": "no held-out songs found"}))
        return 1

    results = {}
    for mode, mode_overrides in (
            ("super_timing", ["super_timing=true"]),
            ("timing_pass", ["super_timing=false"])):
        cfg = load_config(InferenceConfig, "inference", args.config,
                          overrides=overrides + mode_overrides)
        tokenizer = load_tokenizer(cfg)
        params, _ = load_model(cfg, tokenizer)
        gen_cfg, bm_cfg = build_configs(cfg)

        per_song = []
        out_dir = Path("/tmp/eval_timing_out") / mode
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, (wav, gt_osu) in enumerate(picked):
            t0 = time.perf_counter()
            _, path, _ = generate(
                cfg, audio_path=str(wav), output_path=str(out_dir / f"s{i}"),
                params=params, tokenizer=tokenizer,
                generation_config=gen_cfg, beatmap_config=bm_cfg,
                verbose=False)
            dt = time.perf_counter() - t0
            got = [(tp.offset, 60000.0 / tp.ms_per_beat)
                   for tp in Beatmap.from_path(path).timing_points
                   if tp.uninherited]
            s = score(gt_redlines(gt_osu), got)
            s["song"] = str(wav.parent.name)
            s["seconds"] = round(dt, 2)
            per_song.append(s)
            print(f"  [{mode}] {wav.parent.name}: gt={s['gt_redlines']} "
                  f"got={s['inferred_redlines']} hit={s['hit_rate']} "
                  f"dt={s['median_dt_ms']}ms dbpm={s['median_dbpm']} "
                  f"({dt:.1f}s)", file=sys.stderr)

        hits = [s["hit_rate"] for s in per_song if s["hit_rate"] is not None]
        dts = [s["median_dt_ms"] for s in per_song
               if s["median_dt_ms"] is not None]
        lat = [s["seconds"] for s in per_song]
        results[mode] = {
            "mean_hit_rate": round(float(np.mean(hits)), 3) if hits else None,
            "median_dt_ms": round(float(np.median(dts)), 1) if dts else None,
            "p50_latency_s": round(float(np.median(lat)), 2),
            "songs": per_song,
        }

    payload = {
        "metric": "redline_hit_rate_super_timing",
        "value": results["super_timing"]["mean_hit_rate"],
        "unit": "fraction of GT redlines within 50ms/0.5BPM",
        "detail": {"checkpoint": args.ckpt or "random weights",
                   "n_songs": len(picked), **results},
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps({k: v for k, v in payload.items() if k != "detail"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
