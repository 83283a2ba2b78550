"""Model export / distribution tool.

(reference: push_to_hub.py — strips opted-out mappers' embedding rows from
the checkpoint before publishing, then uploads model + tokenizer.) This
image has no network; the export writes a distributable directory instead
(the upload itself is a one-liner with huggingface_hub when available).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def remove_mappers_from_model(params: dict, tokenizer, opted_out_user_ids) -> dict:
    """Zero the mapper-embedding rows of opted-out mappers
    (reference push_to_hub.py:11 remove_mappers_from_model)."""
    if "cond" not in params or "mapper" not in params.get("cond", {}):
        return params
    table = np.asarray(params["cond"]["mapper"]["table"]).copy()
    removed = []
    for user_id in opted_out_user_ids:
        idx = tokenizer.mapper_idx.get(user_id)
        if idx is not None and 0 <= idx < len(table):
            table[idx] = 0.0
            removed.append(user_id)
    params = dict(params)
    params["cond"] = dict(params["cond"])
    params["cond"]["mapper"] = dict(params["cond"]["mapper"], table=jnp.asarray(table))
    if removed:
        print(f"removed mapper embeddings for {len(removed)} opted-out users")
    return params


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="export a trained checkpoint")
    parser.add_argument("checkpoint", help="training checkpoint directory")
    parser.add_argument("output", help="export directory")
    parser.add_argument("--opted-out", default="",
                        help="JSON file with a list of opted-out mapper user ids")
    parser.add_argument("--device", default="auto",
                        help="cpu forces the host platform past site hooks")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override  # noqa: PLC0415
    apply_device_override([f"device={ns.device}"])

    from ..tokenizer import Tokenizer  # noqa: PLC0415
    from ..train.checkpoints import restore_params, save_params  # noqa: PLC0415

    ckpt = Path(ns.checkpoint)
    tokenizer = Tokenizer.from_pretrained(ckpt)
    params = restore_params(ckpt)
    if ns.opted_out:
        opted_out = json.loads(Path(ns.opted_out).read_text())
        params = remove_mappers_from_model(params, tokenizer, opted_out)

    out = Path(ns.output)
    save_params(out, params)
    tokenizer.save_pretrained(out)
    print(f"exported model to {out} (params/ + tokenizer.json)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
