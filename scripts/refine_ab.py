#!/usr/bin/env python
"""A/B the DiT refiner's distance-consistency guidance (diffusion/guidance.py).

Simulates the flagship refine stage in isolation: parse held-out corpus maps
(the parser's 32 px position grid IS what the decode emits), refine through
the real DiffusionPipeline at each guidance weight, and score the refined
positions against the map's own true spacing:

- spacing_w_px: 1D Wasserstein between refined and true jump-distance
  distributions (the r3 refiner compressed spacing: median 75 vs 98.8 px)
- median_jump_px vs the true median
- overlap_rate: consecutive pairs closer than 0.4 circle-diameters that are
  not exact stacks
- rms_to_input_px: how far refinement moved from the coarse grid (sanity;
  dequantization should stay small)

Usage:
  python scripts/refine_ab.py --diff-ckpt /tmp/synth_dit_b_ckpt \
      --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 --maps 4 \
      --weights 0 0.1 0.2 --device cpu
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def spacings(pos: np.ndarray) -> np.ndarray:
    return np.hypot(*(pos[1:] - pos[:-1]).T) if len(pos) > 1 else np.zeros(0)


def wasserstein_1d(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 or len(b) == 0:
        return float("nan")
    qs = np.linspace(0, 1, 201)
    return float(np.mean(np.abs(np.quantile(a, qs) - np.quantile(b, qs))))


def overlap_rate(pos: np.ndarray, cs: float = 4.0) -> float:
    sp = spacings(pos)
    if not len(sp):
        return 0.0
    diameter = 2 * (54.4 - 4.48 * cs)
    near = (sp < 0.4 * diameter) & (sp > 0.5)  # stacks (~0) excluded
    return float(near.mean())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="auto")
    ap.add_argument("--config", default="synth_flagship",
                    help="inference config (refine_entry, timesteps, ...)")
    ap.add_argument("--diff-ckpt", default="/tmp/synth_dit_b_ckpt")
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v3")
    ap.add_argument("--start", type=int, default=185)
    ap.add_argument("--end", type=int, default=200)
    ap.add_argument("--maps", type=int, default=4)
    ap.add_argument("--weights", type=float, nargs="*", default=[0.0, 0.1])
    ap.add_argument("--override", action="append", default=[])
    ap.add_argument("--out", default="/tmp/refine_ab.json")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    from beatheritage_tpu.config import InferenceConfig, load_config
    from beatheritage_tpu.data.dataset import (filter_mmrs_metadata,
                                               load_mmrs_metadata)
    from beatheritage_tpu.data.event_utils import get_groups
    from beatheritage_tpu.data.parser import BeatmapParser
    from beatheritage_tpu.diffusion.pipeline import DiffusionPipeline
    from beatheritage_tpu.events import EventType
    from beatheritage_tpu.inference.pipeline import load_diffusion_model
    from beatheritage_tpu.inference.processor import \
        generation_config_from_beatmap
    from beatheritage_tpu.osu.beatmap import Beatmap, Circle, Slider
    from beatheritage_tpu.tokenizer import Tokenizer

    from beatheritage_tpu.events import Event

    def rescale_positions(evts):
        """Combined POS grid tokens -> px POS_X/POS_Y pairs, exactly as the
        processor rescales decode output before the refiner
        (inference/processor.py _rescale_positions)."""
        d = cfg.train.data
        prec = d.position_precision
        offset = prec // 2 if prec > 1 else 0
        x_min, x_max, y_min, _ = (v // prec for v in d.position_range)
        x_count = x_max - x_min + 1
        out = []
        for e in evts:
            if e.type in (EventType.POS_X, EventType.POS_Y):
                out.append(Event(e.type, e.value * prec))
            elif e.type == EventType.POS:
                out.append(Event(EventType.POS_X,
                                 (e.value % x_count + x_min) * prec + offset))
                out.append(Event(EventType.POS_Y,
                                 (e.value // x_count + y_min) * prec + offset))
            else:
                out.append(e)
        return out

    def playable_positions(evts, types_first) -> np.ndarray:
        """Positions of circles + slider heads only — slider anchors sit a
        few px apart by design and would swamp the spacing stats."""
        groups, _ = get_groups(evts, types_first=types_first)
        pos = [(g.x, g.y) for g in groups
               if g.event_type in (EventType.CIRCLE, EventType.SLIDER_HEAD)
               and g.x is not None and g.y is not None]
        return np.asarray(pos, np.float32).reshape(-1, 2)

    cfg = load_config(InferenceConfig, "inference", args.config, overrides=[
        f"diff_ckpt={args.diff_ckpt}", "device=cpu"] + args.override)
    tokenizer = Tokenizer(cfg.train)
    md = load_mmrs_metadata(args.dataset)
    tokenizer.load_dataset_indices(md)
    parser = BeatmapParser(cfg.train, tokenizer)
    diff_params, _ = load_diffusion_model(cfg)
    if diff_params is None:
        print(json.dumps({"error": f"no diffusion ckpt at {args.diff_ckpt}"}))
        return 1

    rows = filter_mmrs_metadata(md, start=args.start, end=args.end,
                                gamemodes=[0]).reset_index()
    results = {w: {"spacing_w": [], "median": [], "overlap": [], "rms": []}
               for w in args.weights}
    true_medians = []
    n_maps = 0
    root = Path(args.dataset) / "data"
    for _, row in rows.iterrows():
        if n_maps >= args.maps:
            break
        p = root / row["BeatmapSetFolder"] / row["BeatmapFile"]
        if not p.is_file():
            continue
        bm = Beatmap.from_path(p)
        true_pos = np.asarray([(o.x, o.y) for o in bm.hit_objects()
                               if isinstance(o, (Circle, Slider))], np.float32)
        if len(true_pos) < 8:
            continue
        true_sp = spacings(true_pos)
        events, _ = parser.parse(bm)
        events = rescale_positions(events)
        gen_cfg = generation_config_from_beatmap(bm, tokenizer)
        types_first = cfg.train.data.types_first
        coarse_play = playable_positions(events, types_first)
        for w in args.weights:
            import dataclasses  # noqa: PLC0415
            pipe = DiffusionPipeline(
                dataclasses.replace(cfg, distance_consistency=w),
                diff_params, tokenizer=None)
            out_events, refined, coarse = pipe.generate(
                events, gen_cfg, timing=None, return_positions=True)
            play = playable_positions(out_events, types_first)
            sp = spacings(play)
            results[w]["spacing_w"].append(wasserstein_1d(sp, true_sp))
            results[w]["median"].append(float(np.median(sp)))
            results[w]["overlap"].append(overlap_rate(play,
                                                      bm.circle_size or 4.0))
            if len(play) == len(coarse_play):
                results[w]["rms"].append(float(np.sqrt(
                    np.mean((play - coarse_play) ** 2))))
        true_medians.append(float(np.median(true_sp)))
        n_maps += 1

    detail = {"true_median_jump_px": round(float(np.mean(true_medians)), 2),
              "maps": n_maps, "per_weight": {}}
    for w in args.weights:
        r = results[w]
        detail["per_weight"][str(w)] = {
            "spacing_w_px": round(float(np.mean(r["spacing_w"])), 2),
            "median_jump_px": round(float(np.mean(r["median"])), 2),
            "overlap_rate": round(float(np.mean(r["overlap"])), 4),
            "rms_to_input_px": round(float(np.mean(r["rms"])), 2),
        }
    payload = {"metric": "refine_distance_guidance_ab", "detail": detail}
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
