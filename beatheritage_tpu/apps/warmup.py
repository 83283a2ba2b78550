"""Warmup CLI: precompile every inference program into the AOT cache.

Cold start on a fresh machine pays the remote-compile tail (minutes) the
first time each decode program shape is seen. This entry point populates the
serialized-executable cache (decode/aot.py, $BH_AOT_CACHE or
~/.cache/beatheritage_tpu/aot) for a preset's full window-bucket x
lookback x engine matrix via `Processor.warmup`, so every later process —
CLI, server, webui — starts warm. Run once per machine/preset (e.g. as a
deploy step after `docker run`, when the TPU is visible; compiles cannot
happen at image build time):

    python -m beatheritage_tpu.apps.warmup -cn beatheritage_v1 \
        model_path=/models/flagship_ckpt

(reference counterpart: the first-request torch.compile warmup the server
pays lazily, server.py; this moves it to an explicit deploy step.)
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-cn", "--config-name", default="beatheritage_v1")
    parser.add_argument("--windows", type=int, default=0,
                        help="warm window buckets up to this count "
                             "(default: the preset's max_batch_size)")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)

    from ..config import InferenceConfig, load_config  # noqa: PLC0415
    from ..inference.pipeline import load_model, load_tokenizer  # noqa: PLC0415
    from ..inference.processor import Processor  # noqa: PLC0415

    args = load_config(InferenceConfig, "inference", ns.config_name,
                       overrides=ns.overrides)
    tokenizer = load_tokenizer(args)
    params, _ = load_model(args, tokenizer)

    t0 = time.monotonic()
    proc = Processor(args, params, tokenizer, verbose=True)
    report = proc.warmup(ns.windows or None)
    dt = time.monotonic() - t0
    fresh = sum(1 for v in report.values() if v == "compiled")
    loaded = sum(1 for v in report.values() if v == "loaded")
    print(f"warmup done in {dt:.1f}s: {len(report)} programs "
          f"({fresh} compiled, {loaded} already cached) -> "
          f"{proc._aot_dir()}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
