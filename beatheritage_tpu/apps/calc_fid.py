"""FID + rhythm evaluation CLI.

(reference: calc_fid.py:382 main) Generates beatmaps for a held-out corpus
slice with the full inference pipeline, then scores FID over classifier
features and active/passive rhythm precision/recall/F1 against the real
maps. The reference spreads generation over N OS processes each loading the
model stack (calc_fid.py:398); one process with batched device work replaces
that here.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="FID / rhythm evaluation")
    parser.add_argument("-cn", "--config-name", default="calc_fid")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override
    apply_device_override(ns.overrides)

    import numpy as np

    from ..config import FidConfig, load_config
    from ..data.dataset import filter_mmrs_metadata, load_mmrs_metadata
    from ..eval.harness import evaluate_pairs
    from ..inference.pipeline import generate, load_model, load_tokenizer
    from ..inference.processor import generation_config_from_beatmap
    from ..osu.beatmap import Beatmap

    try:
        args = load_config(FidConfig, "fid", ns.config_name, overrides=ns.overrides)
    except FileNotFoundError:
        args = load_config(FidConfig, "fid", None, overrides=ns.overrides)

    metadata = filter_mmrs_metadata(
        load_mmrs_metadata(args.dataset_path),
        start=args.dataset_start, end=args.dataset_end,
        gamemodes=args.gamemodes)
    flat = metadata.reset_index()
    dataset_path = Path(args.dataset_path)
    out_dir = Path(args.inference.output_path or "fid_output")
    out_dir.mkdir(parents=True, exist_ok=True)

    tokenizer = load_tokenizer(args.inference)
    params, _ = load_model(args.inference, tokenizer)

    real_paths, generated_paths = [], []
    if not args.skip_generation:
        for _, row in flat.iterrows():
            beatmap_path = (dataset_path / "data" / row["BeatmapSetFolder"]
                            / row["BeatmapFile"])
            audio_path = (dataset_path / "data" / row["BeatmapSetFolder"]
                          / row["AudioFile"])
            if not beatmap_path.is_file() or not audio_path.is_file():
                continue
            try:
                bm = Beatmap.from_path(beatmap_path)
                gc = generation_config_from_beatmap(bm, tokenizer)
                _, osu_path, _ = generate(
                    args.inference, audio_path=str(audio_path),
                    beatmap_path=str(beatmap_path), output_path=str(out_dir),
                    generation_config=gc, params=params, tokenizer=tokenizer,
                    verbose=False)
                if osu_path:
                    real_paths.append(str(beatmap_path))
                    generated_paths.append(osu_path)
            except Exception as e:  # keep evaluating the rest (calc_fid.py:261)
                print(f"generation failed for {beatmap_path.name}: {e}")

    feature_fn = None
    if args.fid and args.classifier_ckpt:
        feature_fn = _make_feature_fn(args, tokenizer)
    complexity_fn = None
    if args.rcomplexion_ckpt:
        complexity_fn = _make_complexity_fn(args, tokenizer)

    from ..data.parser import BeatmapParser  # noqa: PLC0415
    parser_obj = BeatmapParser(args.inference.train, tokenizer)
    report = evaluate_pairs(real_paths, generated_paths,
                            feature_fn=feature_fn, parser=parser_obj,
                            tokenizer=tokenizer, complexity_fn=complexity_fn)
    result = report.as_dict()
    print(json.dumps(result, indent=2))
    (out_dir / "fid_report.json").write_text(json.dumps(result))
    return 0


def _classifier_train_cfg(args):
    """Train config the auxiliary checkpoints were built with (FidConfig
    classifier_config; defaults to the inference model's train config)."""
    if args.classifier_config:
        from ..config import TrainConfig, load_config
        return load_config(TrainConfig, "train", args.classifier_config)
    return args.inference.train


def _make_feature_fn(args, tokenizer):
    import jax
    import numpy as np
    from ..data.audio import load_audio
    from ..data.parser import BeatmapParser
    from ..eval.harness import beatmap_windows_tokens
    from ..models.classifier import (ClassifierDims, classifier_forward,
                                     init_classifier_params,
                                     is_token_classifier,
                                     token_classifier_forward)
    from ..train.checkpoints import restore_params

    cfg = _classifier_train_cfg(args)
    dims = ClassifierDims(
        d_model=cfg.model.arch.d_model, num_heads=cfg.model.arch.num_heads,
        d_ff=cfg.model.arch.d_ff, encoder_layers=cfg.model.arch.encoder_layers,
        decoder_layers=cfg.model.arch.decoder_layers,
        n_mels=cfg.model.spectrogram.n_mels, vocab_size=tokenizer.vocab_size_in,
        num_classes=max(tokenizer.num_mapper_classes + 1, 2))
    from ..train.checkpoints import resolve_ckpt_dir  # noqa: PLC0415
    ckpt = resolve_ckpt_dir(args.classifier_ckpt)
    if ckpt.is_dir() and (ckpt / "params").exists():
        params = restore_params(ckpt)
    else:
        params = init_classifier_params(jax.random.PRNGKey(0), dims)
    parser_obj = BeatmapParser(cfg, tokenizer)
    sr = cfg.model.spectrogram.sample_rate
    window_samples = int(8.192 * sr)
    max_tokens = int(cfg.model.add_config.get("classifier_max_tokens", 512))

    def feature_fn(beatmap):
        windows = beatmap_windows_tokens(beatmap, parser_obj, tokenizer,
                                         max_tokens=max_tokens)
        if not windows:
            return None
        if is_token_classifier(params):
            # token-only instrument: no audio branch, no input mismatch
            out = token_classifier_forward(params, dims, np.stack(windows),
                                           pad_id=tokenizer.pad_id)
            return np.asarray(out["features"])
        # classifier features are conditioned on audio too; beatmap-only
        # scoring uses silent audio per window (same for real + generated,
        # so the comparison stays meaningful without the audio files)
        audio = np.zeros((len(windows), window_samples), np.float32)
        out = classifier_forward(params, dims, audio, np.stack(windows))
        return np.asarray(out["features"])

    return feature_fn


def _make_complexity_fn(args, tokenizer):
    """Rhythm-complexity scorer from a trained rcomplexion checkpoint
    (reference rcomplexion/inference.py:20 calc_rhythm_complexity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from ..data.classifier_dataset import RComplexionDataset
    from ..data.parser import BeatmapParser
    from ..models.rcomplexion import RComplexionDims, rhythm_complexity
    from ..train.checkpoints import restore_params

    cfg = _classifier_train_cfg(args)
    dims = RComplexionDims(vocab_size_in=tokenizer.vocab_size_in,
                           vocab_size_out=tokenizer.vocab_size_out,
                           src_seq_len=16,
                           hidden_size=cfg.model.arch.d_model)
    params = restore_params(args.rcomplexion_ckpt)
    parser_obj = BeatmapParser(cfg, tokenizer)
    windower = RComplexionDataset(cfg.data, parser_obj, tokenizer,
                                  metadata=pd.DataFrame(), path=".")
    score = jax.jit(lambda p, w, t: rhythm_complexity(p, dims, w, t))

    def complexity_fn(beatmap):
        rows = list(windower.beatmap_windows(beatmap))
        if not rows:
            return None
        windows = np.stack([r["input_ids"] for r in rows])
        targets = np.asarray([r["label"] for r in rows])
        return float(score(params, jnp.asarray(windows),
                           jnp.asarray(targets)))

    return complexity_fn


if __name__ == "__main__":
    sys.exit(main())
