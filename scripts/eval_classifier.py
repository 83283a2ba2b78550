"""Held-out mapper-classifier accuracy (VERDICT r3 item 7: the FID feature
extractor's quality must be documented, not assumed).

Scores window-level and majority-vote map-level top-1 over a held-out
corpus slice the classifier never trained on.

Usage:
    python scripts/eval_classifier.py --ckpt /tmp/synth_classifier_v3_ckpt \
        --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 \
        --out EVAL_CLASSIFIER_r03.json
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
    ap.add_argument("--config", default="synth")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v3")
    ap.add_argument("--start", type=int, default=185)
    ap.add_argument("--end", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/eval_classifier.json")
    ap.add_argument("--override", action="append", default=[],
                    help="extra train-config overrides (must match the "
                         "checkpoint's arch, e.g. model.arch.d_model=192)")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    import jax
    import jax.numpy as jnp

    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.data.classifier_dataset import ClassifierDataset
    from beatheritage_tpu.data.dataset import (batch_iterator,
                                               filter_mmrs_metadata,
                                               load_mmrs_metadata)
    from beatheritage_tpu.data.parser import BeatmapParser
    from beatheritage_tpu.models.classifier import (ClassifierDims,
                                                    classifier_forward,
                                                    is_token_classifier,
                                                    token_classifier_forward)
    from beatheritage_tpu.tokenizer import Tokenizer
    from beatheritage_tpu.train.checkpoints import restore_params

    cfg = load_config(TrainConfig, "train", args.config, overrides=[
        f"data.train_dataset_path={args.dataset}"] + args.override)
    tokenizer = Tokenizer(cfg)
    tokenizer.load_dataset_indices(load_mmrs_metadata(args.dataset))
    parser_obj = BeatmapParser(cfg, tokenizer)

    dims = ClassifierDims(
        d_model=cfg.model.arch.d_model, num_heads=cfg.model.arch.num_heads,
        d_ff=cfg.model.arch.d_ff, encoder_layers=cfg.model.arch.encoder_layers,
        decoder_layers=cfg.model.arch.decoder_layers,
        n_mels=cfg.model.spectrogram.n_mels, vocab_size=tokenizer.vocab_size_in,
        num_classes=max(tokenizer.num_mapper_classes + 1, 2))
    params = restore_params(args.ckpt)
    tokens_only = is_token_classifier(params)

    held = filter_mmrs_metadata(load_mmrs_metadata(args.dataset),
                                start=args.start, end=args.end, gamemodes=[0])
    ds = ClassifierDataset(cfg.data, parser_obj, tokenizer, metadata=held,
                           path=args.dataset, test=True,
                           use_audio=not tokens_only,
                           max_tokens=int(cfg.model.add_config.get(
                               "classifier_max_tokens", 512)))

    if tokens_only:
        fwd = jax.jit(lambda p, t: jnp.argmax(token_classifier_forward(
            p, dims, t, pad_id=tokenizer.pad_id)["logits"], -1))
    else:
        fwd = jax.jit(lambda p, a, t: jnp.argmax(
            classifier_forward(p, dims, a, t)["logits"], -1))

    window_hits, window_total = 0, 0
    map_label: dict[int, int] = {}
    per_map_preds: dict[int, list[int]] = {}
    for batch in batch_iterator(ds, args.batch):
        preds = np.asarray(fwd(params, batch["tokens"]) if tokens_only
                           else fwd(params, batch["audio"], batch["tokens"]))
        labels = np.asarray(batch["label"])
        window_hits += int((preds == labels).sum())
        window_total += len(labels)
        for k in range(len(labels)):
            key = int(batch["beatmap_id"][k])
            per_map_preds.setdefault(key, []).append(int(preds[k]))
            map_label[key] = int(labels[k])

    map_hits = 0
    for key, preds in per_map_preds.items():
        vals, counts = np.unique(preds, return_counts=True)
        if int(vals[np.argmax(counts)]) == map_label[key]:
            map_hits += 1

    n_classes = int(dims.num_classes)
    payload = {
        "metric": "classifier_heldout_top1",
        "value": round(window_hits / max(window_total, 1), 4),
        "unit": f"window top-1 over {n_classes} classes "
                f"(chance {1.0 / n_classes:.3f})",
        "detail": {
            "checkpoint": args.ckpt,
            "tokens_only": tokens_only,
            "windows": window_total,
            "map_majority_top1": round(map_hits / max(len(per_map_preds), 1), 4),
            "maps": len(per_map_preds),
            "num_classes": n_classes,
        },
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
