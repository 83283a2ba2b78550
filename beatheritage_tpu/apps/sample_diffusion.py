"""Standalone DiT sampler: re-generate a beatmap's positions from noise.

(reference: osu_diffusion/sample.py:35 + utils/export/create_beatmap.py)
Takes an existing .osu as the rhythm skeleton, replaces every position with
diffusion samples (random init), and writes a new .osu — the DiT testing
workflow used with the toy datasets (osu_diffusion/testing/test_toy.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="sample positions with the DiT")
    parser.add_argument("beatmap", help="input .osu skeleton")
    parser.add_argument("-o", "--output", default=".", help="output directory")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override
    apply_device_override(ns.overrides)

    from ..config import InferenceConfig, load_config
    from ..data.event_utils import remove_events_of_type
    from ..data.parser import BeatmapParser
    from ..diffusion.pipeline import DiffusionPipeline
    from ..events import EventType
    from ..inference.postprocessor import (Postprocessor,
                                           beatmap_config_from_beatmap)
    from ..inference.processor import generation_config_from_beatmap
    from ..osu.beatmap import Beatmap
    from ..tokenizer import Tokenizer

    args = load_config(InferenceConfig, "inference", ns.config_name,
                       overrides=["random_init=true"] + ns.overrides)
    beatmap = Beatmap.from_path(ns.beatmap)
    tokenizer = Tokenizer(args.train)
    bm_parser = BeatmapParser(args.train, tokenizer)

    events, event_times = bm_parser.parse(beatmap)
    # drop decoded positions so the DiT refiner regenerates them from noise
    events, event_times = remove_events_of_type(
        events, event_times, [EventType.POS, EventType.POS_X, EventType.POS_Y])

    generation_config = generation_config_from_beatmap(beatmap, tokenizer)
    timing = [tp for tp in beatmap.timing_points if tp.parent is None]
    from ..inference.pipeline import load_diffusion_model  # noqa: PLC0415
    diff_params, refine_params = load_diffusion_model(args)
    if diff_params is not None:
        print(f"Loaded diffusion model from {args.diff_ckpt}")
    # conditioning tables saved next to the checkpoint (reference
    # inference.py:516 restores the pickled tokenizer with the model)
    from ..diffusion.tokenizer import DiffusionTokenizer  # noqa: PLC0415
    diff_tok = None
    from ..train.checkpoints import resolve_ckpt_dir  # noqa: PLC0415
    tok_file = resolve_ckpt_dir(args.diff_ckpt) / "diffusion_tokenizer.json"
    if tok_file.is_file():
        diff_tok = DiffusionTokenizer.from_pretrained(tok_file)
    pipeline = DiffusionPipeline(args, diff_params, tokenizer=diff_tok,
                                 refine_params=refine_params)
    events = pipeline.generate(events, generation_config, timing, verbose=True)

    postprocessor = Postprocessor(args)
    config = beatmap_config_from_beatmap(beatmap)
    config.version = (config.version or "sampled") + " [diffusion]"
    result = postprocessor.generate(events, config, beatmap.timing_points)
    out_path = postprocessor.write_result(result, ns.output)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
