#!/usr/bin/env python
"""Generation-regime DiT eval: sample positions FROM NOISE on real map
skeletons and score the spacing distribution against the originals.

This is the quantified form of the reference's standalone sampler workflow
(osu_diffusion/sample.py + testing/test_toy.py): rhythm/timing/distance
context comes from an existing beatmap, every position is regenerated from
random init over the FULL noise schedule, and the result is scored with the
same playable-position metrics as scripts/refine_ab.py (circles + slider
heads; anchors excluded). Requires a DiT trained over the full t range
(configs/diffusion/synth_xs_gen_v5_cpu.yaml) — a refiner-regime model has
never seen t >= 100 and will not denoise from pure noise.

Usage:
  python scripts/eval_generation.py --device cpu \
      --diff-ckpt /tmp/synth_dit_xs_gen_ckpt \
      --diffusion-config synth_xs_gen_v5_cpu \
      --dataset /tmp/synth_mmrs_v5 --start 1120 --end 1200 --maps 4 \
      --beatmap /root/reference/osu_diffusion/testing/toy_datasets/kimi_no_bouken.osu \
      --out EVAL_GENERATION_r04_cpu.json
"""

from __future__ import annotations

import argparse
import dataclasses
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
                    help="inference config (train group sets the tokenizer)")
    ap.add_argument("--diffusion-config", default="synth_xs_gen_v5_cpu",
                    help="diffusion train config of the checkpoint (model "
                         "size + max_diffusion_step)")
    ap.add_argument("--diff-ckpt", default="/tmp/synth_dit_xs_gen_ckpt")
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v5")
    ap.add_argument("--start", type=int, default=1120)
    ap.add_argument("--end", type=int, default=1200)
    ap.add_argument("--maps", type=int, default=4)
    ap.add_argument("--beatmap", action="append", default=[],
                    help="extra .osu skeletons to sample (e.g. a real "
                         "ranked map)")
    ap.add_argument("--steps-per-decile", type=int, default=5,
                    help="respaced steps per schedule decile (5 -> 50 "
                         "sampling steps over the full chain)")
    ap.add_argument("--override", action="append", default=[])
    ap.add_argument("--out", default="/tmp/eval_generation.json")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    from beatheritage_tpu.config import InferenceConfig, load_config
    from beatheritage_tpu.data.dataset import (filter_mmrs_metadata,
                                               load_mmrs_metadata)
    from beatheritage_tpu.data.event_utils import get_groups
    from beatheritage_tpu.data.parser import BeatmapParser
    from beatheritage_tpu.diffusion.pipeline import DiffusionPipeline
    from beatheritage_tpu.events import Event, EventType
    from beatheritage_tpu.inference.pipeline import load_diffusion_model
    from beatheritage_tpu.inference.processor import \
        generation_config_from_beatmap
    from beatheritage_tpu.osu.beatmap import Beatmap, Circle, Slider
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(InferenceConfig, "inference", args.config, overrides=[
        f"diff_ckpt={args.diff_ckpt}", "device=cpu"] + args.override)
    # compose the diffusion group explicitly (the inference config's
    # defaults pin the production refiner; the checkpoint under test may be
    # a different size/schedule)
    from beatheritage_tpu.config import DiffusionTrainConfig  # noqa: PLC0415
    diff_cfg = load_config(DiffusionTrainConfig, "diffusion",
                           args.diffusion_config)
    cfg = dataclasses.replace(
        cfg, diffusion=diff_cfg, random_init=True, refine_entry=0,
        distance_consistency=0.0,
        timesteps=[args.steps_per_decile] * 10)

    tokenizer = Tokenizer(cfg.train)
    md = load_mmrs_metadata(args.dataset)
    tokenizer.load_dataset_indices(md)
    parser = BeatmapParser(cfg.train, tokenizer)
    diff_params, _ = load_diffusion_model(cfg)
    if diff_params is None:
        print(json.dumps({"error": f"no diffusion ckpt at {args.diff_ckpt}"}))
        return 1
    # class-conditioning tables: the trainer writes diffusion_tokenizer.json
    # only at completion — for an in-training checkpoint rebuild the same
    # tables from the same dataset/config
    from beatheritage_tpu.diffusion.tokenizer import DiffusionTokenizer
    tok_file = Path(args.diff_ckpt) / "diffusion_tokenizer.json"
    if tok_file.is_file():
        diff_tok = DiffusionTokenizer.from_pretrained(tok_file)
    else:
        diff_tok = DiffusionTokenizer(diff_cfg)
        diff_tok.load_dataset_indices(md, diff_cfg)

    d = cfg.train.data
    prec = d.position_precision
    offset = prec // 2 if prec > 1 else 0
    x_min, x_max, y_min, _ = (v // prec for v in d.position_range)
    x_count = x_max - x_min + 1

    def rescale_positions(evts):
        """Combined POS grid tokens -> px POS_X/POS_Y pairs (processor
        _rescale_positions semantics)."""
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

    types_first = cfg.train.data.types_first

    def playable_positions(evts) -> np.ndarray:
        groups, _ = get_groups(evts, types_first=types_first)
        pos = [(g.x, g.y) for g in groups
               if g.event_type in (EventType.CIRCLE, EventType.SLIDER_HEAD)
               and g.x is not None and g.y is not None]
        return np.asarray(pos, np.float32).reshape(-1, 2)

    def sample_map(path: Path) -> dict | None:
        bm = Beatmap.from_path(path)
        true_pos = np.asarray([(o.x, o.y) for o in bm.hit_objects()
                               if isinstance(o, (Circle, Slider))], np.float32)
        if len(true_pos) < 8:
            return None
        events, _ = parser.parse(bm)
        events = rescale_positions(events)
        gen_cfg = generation_config_from_beatmap(bm, tokenizer)
        pipe = DiffusionPipeline(cfg, diff_params, tokenizer=diff_tok)
        out_events = pipe.generate(events, gen_cfg, timing=None,
                                   verbose=False)
        play = playable_positions(out_events)
        sp, true_sp = spacings(play), spacings(true_pos)
        in_field = ((play[:, 0] >= 0) & (play[:, 0] <= 512)
                    & (play[:, 1] >= 0) & (play[:, 1] <= 384)).mean() \
            if len(play) else 0.0
        return {
            "objects": int(len(play)),
            "spacing_w_px": round(wasserstein_1d(sp, true_sp), 2),
            "median_jump_px": round(float(np.median(sp)), 2)
            if len(sp) else None,
            "true_median_jump_px": round(float(np.median(true_sp)), 2),
            "overlap_rate": round(overlap_rate(play, bm.circle_size or 4.0), 4),
            "true_overlap_rate": round(
                overlap_rate(true_pos, bm.circle_size or 4.0), 4),
            "in_playfield_rate": round(float(in_field), 4),
        }

    per_map = {}
    rows = filter_mmrs_metadata(md, start=args.start, end=args.end,
                                gamemodes=[0]).reset_index()
    root = Path(args.dataset) / "data"
    n = 0
    for _, row in rows.iterrows():
        if n >= args.maps:
            break
        p = root / row["BeatmapSetFolder"] / row["BeatmapFile"]
        if not p.is_file():
            continue
        r = sample_map(p)
        if r is None:
            continue
        per_map[str(p.name)] = r
        n += 1
    for extra in args.beatmap:
        r = sample_map(Path(extra))
        if r is not None:
            per_map[Path(extra).name] = r

    agg_keys = ["spacing_w_px", "median_jump_px", "overlap_rate",
                "in_playfield_rate"]
    agg = {k: round(float(np.mean([m[k] for m in per_map.values()
                                   if m[k] is not None])), 3)
           for k in agg_keys if per_map}
    payload = {
        "metric": "generation_from_noise_quality",
        "value": agg.get("spacing_w_px"),
        "unit": "px spacing Wasserstein vs originals (playable positions)",
        "detail": {"ckpt": args.diff_ckpt,
                   "diffusion_config": args.diffusion_config,
                   "sampling_steps": args.steps_per_decile * 10,
                   "aggregate": agg, "per_map": per_map},
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
