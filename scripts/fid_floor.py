#!/usr/bin/env python
"""FID instrument calibration: real-vs-real FID noise floor.

"Matched FID" (BASELINE.md north star) is only meaningful relative to the
instrument's noise floor: the FID between two disjoint slices of REAL
ranked-style maps, scored with the same classifier features used for
generated-vs-real. Reports:
  - split_half: FID between two halves of the SAME slice (pure sampling
    noise of the estimator at this n),
  - disjoint_sets: FID between two disjoint mapset ranges (floor any
    generated-vs-real number should be read against).

Usage:
  python scripts/fid_floor.py --ckpt /tmp/synth_classifier_v4_small_best \
      --config synth_classifier_small --dataset /tmp/synth_mmrs_v4 \
      --a-start 560 --a-end 580 --b-start 580 --b-end 600 --device cpu
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="auto")
    ap.add_argument("--config", default="synth",
                    help="train config matching the classifier checkpoint")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v4")
    ap.add_argument("--a-start", type=int, default=560)
    ap.add_argument("--a-end", type=int, default=580)
    ap.add_argument("--b-start", type=int, default=580)
    ap.add_argument("--b-end", type=int, default=600)
    ap.add_argument("--max-maps", type=int, default=200)
    ap.add_argument("--tokenizer-dataset", default=None,
                    help="dataset whose tables the checkpoint was trained "
                         "with (defaults to --dataset); lets real maps come "
                         "from a different corpus than the tokenizer")
    ap.add_argument("--gen-dir", action="append", default=[],
                    help="directory of generated .osu files; reports "
                         "FID(generated, slice A) with the same features")
    ap.add_argument("--out", default="/tmp/fid_floor.json")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.data.dataset import (filter_mmrs_metadata,
                                               load_mmrs_metadata)
    from beatheritage_tpu.data.parser import BeatmapParser
    from beatheritage_tpu.eval.fid import fid_between
    from beatheritage_tpu.eval.harness import beatmap_windows_tokens
    from beatheritage_tpu.models.classifier import (ClassifierDims,
                                                    classifier_forward,
                                                    is_token_classifier,
                                                    token_classifier_forward)
    from beatheritage_tpu.osu.beatmap import Beatmap
    from beatheritage_tpu.tokenizer import Tokenizer
    from beatheritage_tpu.train.checkpoints import restore_params

    tok_ds = args.tokenizer_dataset or args.dataset
    cfg = load_config(TrainConfig, "train", args.config, overrides=[
        f"data.train_dataset_path={tok_ds}"])
    tokenizer = Tokenizer(cfg)
    tokenizer.load_dataset_indices(load_mmrs_metadata(tok_ds))
    md = load_mmrs_metadata(args.dataset)
    parser_obj = BeatmapParser(cfg, tokenizer)
    dims = ClassifierDims(
        d_model=cfg.model.arch.d_model, num_heads=cfg.model.arch.num_heads,
        d_ff=cfg.model.arch.d_ff, encoder_layers=cfg.model.arch.encoder_layers,
        decoder_layers=cfg.model.arch.decoder_layers,
        n_mels=cfg.model.spectrogram.n_mels,
        vocab_size=tokenizer.vocab_size_in,
        num_classes=max(tokenizer.num_mapper_classes + 1, 2))
    params = restore_params(args.ckpt)
    sr = cfg.model.spectrogram.sample_rate
    window_samples = int(8.192 * sr)
    max_tokens = int(cfg.model.add_config.get("classifier_max_tokens", 512))

    def window_features(windows: list) -> np.ndarray:
        if is_token_classifier(params):
            out = token_classifier_forward(params, dims, np.stack(windows),
                                           pad_id=tokenizer.pad_id)
        else:
            audio = np.zeros((len(windows), window_samples), np.float32)
            out = classifier_forward(params, dims, audio, np.stack(windows))
        return np.asarray(out["features"])

    def features_for(start: int, end: int) -> np.ndarray:
        rows = filter_mmrs_metadata(md, start=start, end=end,
                                    gamemodes=[0]).reset_index()
        feats = []
        root = Path(args.dataset) / "data"
        for _, row in rows.iterrows():
            if len(feats) >= args.max_maps:
                break
            p = root / row["BeatmapSetFolder"] / row["BeatmapFile"]
            if not p.is_file():
                continue
            windows = beatmap_windows_tokens(Beatmap.from_path(p),
                                             parser_obj, tokenizer,
                                             max_tokens=max_tokens)
            if not windows:
                continue
            feats.append(window_features(windows))
        return np.concatenate(feats, 0) if feats else np.zeros((0, 1))

    def features_for_dir(d: Path) -> np.ndarray:
        feats = []
        for p in sorted(d.rglob("*.osu"))[: args.max_maps]:
            windows = beatmap_windows_tokens(Beatmap.from_path(p),
                                             parser_obj, tokenizer,
                                             max_tokens=max_tokens)
            if not windows:
                continue
            feats.append(window_features(windows))
        return np.concatenate(feats, 0) if feats else np.zeros((0, 1))

    fa = features_for(args.a_start, args.a_end)
    fb = features_for(args.b_start, args.b_end)
    if len(fa) < 4 or len(fb) < 4:
        print(json.dumps({"error": "too few windows",
                          "a": len(fa), "b": len(fb)}))
        return 1
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(fa))
    half = len(fa) // 2
    payload = {
        "metric": "fid_floor",
        "split_half": round(fid_between(fa[perm[:half]], fa[perm[half:]]), 3),
        "disjoint_sets": round(fid_between(fa, fb), 3),
        "detail": {
            "ckpt": args.ckpt, "config": args.config,
            "windows_a": int(len(fa)), "windows_b": int(len(fb)),
            "sets_a": [args.a_start, args.a_end],
            "sets_b": [args.b_start, args.b_end],
        },
    }
    for d in args.gen_dir:
        fg = features_for_dir(Path(d))
        entry = {
            "fid_vs_a": round(fid_between(fg, fa), 3) if len(fg) >= 4
            else None,
            "windows": int(len(fg)),
        }
        # FID's estimator bias scales ~d/N, so a 70-window generated set
        # cannot be read against a 256-window floor. Report the real-vs-real
        # floor at the generated set's own sample size: FID(subsample of B
        # at n_gen, full A) — the apples-to-apples number to subtract.
        if len(fg) >= 4 and len(fb) >= len(fg):
            sub = rng.permutation(len(fb))[: len(fg)]
            entry["floor_at_n"] = round(fid_between(fb[sub], fa), 3)
        payload.setdefault("generated", {})[d] = entry
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
