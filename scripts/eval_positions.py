"""Position-refinement before/after metrics (VERDICT r3 item 2).

Generates maps for held-out songs twice — coarse decode positions
(generate_positions=false) and DiT-refined (true, trained refiner) — and
scores both position sets against the ground-truth corpus distribution:

- spacing Wasserstein distance: 1D earth-mover between the generated and
  corpus distributions of consecutive-object jump distance
- overlap rate: fraction of consecutive pairs closer than 0.4 circle
  diameters that are not exact stacks (unreadable near-overlaps)
- offscreen rate: objects outside the 512x384 playfield
- grid artifact score: fraction of coordinates on the coarse 32 px grid
  (the decode emits 32 px-quantized positions; the refiner should break
  the lattice)

Usage:
    python scripts/eval_positions.py --ckpt /tmp/flagship_ckpt \
        --diff-ckpt /tmp/synth_dit_ckpt --songs 6 --out EVAL_POS_r03.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def positions_and_spacings(osu_path) -> tuple[np.ndarray, np.ndarray]:
    from beatheritage_tpu.osu.beatmap import Beatmap, Circle, Slider
    bm = Beatmap.from_path(osu_path)
    pts = [(o.x, o.y) for o in bm.hit_objects()
           if isinstance(o, (Circle, Slider))]
    pts = np.asarray(pts, np.float32).reshape(-1, 2)
    sp = np.hypot(*(pts[1:] - pts[:-1]).T) if len(pts) > 1 else np.zeros(0)
    return pts, sp


def wasserstein_1d(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    qs = np.linspace(0, 1, 201)
    return float(np.mean(np.abs(np.quantile(a, qs) - np.quantile(b, qs))))


def metrics(paths: list[Path], corpus_sp: np.ndarray, cs: float = 4.0) -> dict:
    radius = 54.4 - 4.48 * cs
    all_sp, n_overlap, n_pairs, n_off, n_pts, n_grid = [], 0, 0, 0, 0, 0
    n_stacks = 0
    for p in paths:
        pts, sp = positions_and_spacings(p)
        all_sp.append(sp)
        n_pts += len(pts)
        n_off += int(np.sum((pts[:, 0] < 0) | (pts[:, 0] > 512)
                            | (pts[:, 1] < 0) | (pts[:, 1] > 384)))
        if len(pts):
            # lattice concentration at ANY offset: the decode emits a 32 px
            # grid SHIFTED by precision//2 (processor._rescale_positions),
            # so a plain %32==0 test reads 0 on coarse outputs
            mod = np.stack([pts[:, 0] % 32, pts[:, 1] % 32], 1).astype(int)
            _, counts = np.unique(mod, axis=0, return_counts=True)
            n_grid += int(counts.max())
        # <4 px = intentional stack: the synth corpus stacks objects at
        # EXACTLY the same position; a continuous refiner renders the same
        # stack with sub-grid jitter, and a 0.5 px stack threshold
        # reclassified 20% of pairs as "overlaps" (measured on set0186:
        # 31/151 GT pairs are exact stacks)
        near = (sp > 4.0) & (sp < 0.8 * radius)
        n_overlap += int(np.sum(near))
        n_stack = int(np.sum(sp <= 4.0))
        n_stacks += n_stack
        n_pairs += len(sp)
    sp = np.concatenate(all_sp) if all_sp else np.zeros(0)
    return {
        "n_objects": n_pts,
        "spacing_wasserstein_px": round(wasserstein_1d(sp, corpus_sp), 2),
        "mean_spacing_px": round(float(np.mean(sp)), 1) if len(sp) else None,
        "overlap_rate": round(n_overlap / max(n_pairs, 1), 4),
        "stack_rate": round(n_stacks / max(n_pairs, 1), 4),
        "offscreen_rate": round(n_off / max(n_pts, 1), 4),
        "grid32_rate": round(n_grid / max(n_pts, 1), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="auto")
    ap.add_argument("--config", default="synth_flagship")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--diff-ckpt", default="")
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v3")
    ap.add_argument("--start", type=int, default=185)
    ap.add_argument("--end", type=int, default=200)
    ap.add_argument("--songs", type=int, default=6)
    ap.add_argument("--out", default="/tmp/eval_positions.json")
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

    root = Path(args.dataset)
    songs = []
    corpus_sp = []
    for sid in range(args.start + 1, args.end + 1):
        d = root / "data" / f"set{sid:04d}"
        osus = sorted(d.glob("*.osu"))
        if not d.is_dir() or not osus:
            continue
        songs.append((d / "audio.wav", osus))
        for o in osus:
            corpus_sp.append(positions_and_spacings(o)[1])
    songs = songs[:args.songs]
    corpus_sp = np.concatenate(corpus_sp) if corpus_sp else np.zeros(0)
    if not songs:
        print(json.dumps({"error": "no held-out songs found"}))
        return 1

    base_overrides = list(args.override)
    if args.ckpt:
        base_overrides.append(f"model_path={args.ckpt}")

    results = {}
    for mode, mode_overrides in (
            ("coarse", ["generate_positions=false"]),
            ("refined", ["generate_positions=true"]
             + ([f"diff_ckpt={args.diff_ckpt}"] if args.diff_ckpt else []))):
        cfg = load_config(InferenceConfig, "inference", args.config,
                          overrides=base_overrides + mode_overrides)
        tokenizer = load_tokenizer(cfg)
        params, _ = load_model(cfg, tokenizer)
        gen_cfg, bm_cfg = build_configs(cfg)

        out_dir = Path("/tmp/eval_positions_out") / mode
        out_dir.mkdir(parents=True, exist_ok=True)
        paths, lat = [], []
        for i, (wav, osus) in enumerate(songs):
            # condition on the held-out map's metadata (style/difficulty/CS)
            # like calc_fid does — with the generic config every class field
            # is unknown, the CFG null vector equals the class vector, and
            # the refiner samples unconditionally
            from beatheritage_tpu.inference.processor import (
                generation_config_from_beatmap)
            from beatheritage_tpu.osu.beatmap import Beatmap
            song_gc = generation_config_from_beatmap(
                Beatmap.from_path(osus[0]), tokenizer)
            t0 = time.perf_counter()
            _, path, _ = generate(
                cfg, audio_path=str(wav), output_path=str(out_dir / f"s{i}"),
                params=params, tokenizer=tokenizer,
                generation_config=song_gc, beatmap_config=bm_cfg,
                verbose=False)
            lat.append(time.perf_counter() - t0)
            paths.append(Path(path))
            print(f"  [{mode}] {wav.parent.name}: {lat[-1]:.1f}s",
                  file=sys.stderr)
        m = metrics(paths, corpus_sp)
        m["p50_latency_s"] = round(float(np.median(lat)), 2)
        results[mode] = m

    # ground-truth baseline: the held-out maps scored by the same metrics —
    # the overlap/spacing level the corpus style itself exhibits (without
    # this, a refined overlap_rate has no reference point)
    gt_paths = [o for _, osus in songs for o in osus]
    results["corpus_gt"] = metrics(gt_paths, corpus_sp)

    delta = None
    if results["coarse"]["spacing_wasserstein_px"] == results["coarse"][
            "spacing_wasserstein_px"]:  # not NaN
        delta = round(results["coarse"]["spacing_wasserstein_px"]
                      - results["refined"]["spacing_wasserstein_px"], 2)
    payload = {
        "metric": "spacing_wasserstein_improvement_px",
        "value": delta,
        "unit": "px (coarse minus refined; positive = refiner helps)",
        "detail": {"checkpoint": args.ckpt or "random weights",
                   "diff_ckpt": args.diff_ckpt, "n_songs": len(songs),
                   **results},
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps({k: v for k, v in payload.items() if k != "detail"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
