"""Command-line inference entry point.

Mirrors the reference's Hydra CLI surface (reference: inference.py:543,
README "Command-Line Inference"):

    python -m beatheritage_tpu.apps.cli -cn beatheritage_v1 \
        audio_path=/path/song.wav output_path=./out gamemode=0 difficulty=5.5
"""

from __future__ import annotations

from . import excepthook  # noqa: F401  (reference: excepthook.py — friendly error hints)

import argparse
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="beatheritage_tpu: song -> osu! beatmap (TPU-native)")
    parser.add_argument("-cn", "--config-name", default="default",
                        help="inference config name under configs/inference/")
    parser.add_argument("overrides", nargs="*",
                        help="dotted config overrides, e.g. gamemode=3 top_p=0.9")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    ns = parse_args(argv)
    from ._device import apply_device_override  # noqa: PLC0415
    apply_device_override(ns.overrides)
    from ..config import InferenceConfig, load_config  # noqa: PLC0415
    from ..inference.pipeline import generate  # noqa: PLC0415

    args = load_config(InferenceConfig, "inference", ns.config_name,
                       overrides=ns.overrides)
    if not args.audio_path and not args.beatmap_path:
        print("error: audio_path or beatmap_path is required "
              "(audio_path=/path/to/song.wav)", file=sys.stderr)
        return 2
    from ..inference.pipeline import get_args_from_beatmap, load_tokenizer  # noqa: PLC0415
    tokenizer = load_tokenizer(args)
    get_args_from_beatmap(args, tokenizer)
    generate(args, tokenizer=tokenizer)
    return 0


if __name__ == "__main__":
    sys.exit(main())
