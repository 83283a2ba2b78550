"""Mapper-classifier training entry point.

(reference: classifier/train.py — PyTorch Lightning trainer replaced by a
jitted optax loop over the mesh.)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="train the mapper classifier")
    parser.add_argument("-cn", "--config-name", default="tiny")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..config import TrainConfig, load_config
    from ..data.classifier_dataset import ClassifierDataset
    from ..data.dataset import batch_iterator, load_mmrs_metadata
    from ..data.parser import BeatmapParser
    from ..models.classifier import (ClassifierDims, classifier_loss,
                                     init_classifier_params,
                                     init_token_classifier_params,
                                     token_classifier_loss)
    from ..parallel.mesh import batch_sharding, build_mesh, replicated
    from ..tokenizer import Tokenizer
    from ..train.optim import build_schedule

    cfg = load_config(TrainConfig, "train", ns.config_name, overrides=ns.overrides)
    from ..parallel.mesh import apply_device  # noqa: PLC0415
    apply_device(cfg.device)
    tokenizer = Tokenizer(cfg)
    if cfg.data.train_dataset_path:
        tokenizer.load_dataset_indices(load_mmrs_metadata(cfg.data.train_dataset_path))
    parser_obj = BeatmapParser(cfg, tokenizer)

    dims = ClassifierDims(
        d_model=cfg.model.arch.d_model, num_heads=cfg.model.arch.num_heads,
        d_ff=cfg.model.arch.d_ff, encoder_layers=cfg.model.arch.encoder_layers,
        decoder_layers=cfg.model.arch.decoder_layers,
        n_mels=cfg.model.spectrogram.n_mels, vocab_size=tokenizer.vocab_size_in,
        num_classes=max(tokenizer.num_mapper_classes + 1, 2))
    # token-only FID instrument (models/classifier.py: the features are
    # computed with silent audio at FID time, so the audio branch only adds
    # train/eval mismatch + cost)
    tokens_only = bool(cfg.model.add_config.get("classifier_tokens_only",
                                                False))
    max_tokens = int(cfg.model.add_config.get("classifier_max_tokens", 512))
    init_fn = init_token_classifier_params if tokens_only else init_classifier_params
    params = init_fn(jax.random.PRNGKey(cfg.seed), dims)
    # warm start (params only, fresh optimizer/schedule): lets a finished
    # run be extended at a lower LR without retraining from scratch
    init_ckpt = str(cfg.model.add_config.get("init_ckpt", "") or "")
    if init_ckpt:
        from ..train.checkpoints import restore_params  # noqa: PLC0415
        params = restore_params(init_ckpt)
        print(f"warm start from {init_ckpt}")

    lr = build_schedule(cfg.optim)
    optimizer = optax.chain(optax.clip_by_global_norm(cfg.optim.gradient_clip),
                            optax.adamw(lr))
    opt_state = optimizer.init(params)
    mesh = build_mesh(-1, 1)

    def step_fn(params, opt_state, batch):
        def loss_fn(p):
            if tokens_only:
                loss, aux = token_classifier_loss(
                    p, dims, batch["tokens"], batch["label"],
                    pad_id=tokenizer.pad_id)
            else:
                loss, aux = classifier_loss(p, dims, batch["audio"],
                                            batch["tokens"], batch["label"])
            return loss, aux
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux["accuracy"]

    step = jax.jit(step_fn, in_shardings=(replicated(mesh), replicated(mesh),
                                          batch_sharding(mesh)),
                   out_shardings=(replicated(mesh), replicated(mesh), None, None))

    from ..data.dataset import load_mmrs_metadata as _load_md  # noqa: PLC0415
    md = _load_md(cfg.data.train_dataset_path)
    # honor the train subset bounds (reference classifier/dataset.py slices
    # mapsets the same way) — without this the classifier would train on
    # the held-out eval sets and contaminate the FID feature space
    set_ids = md.index.get_level_values(0).unique()
    lo = cfg.data.train_dataset_start
    hi = min(cfg.data.train_dataset_end, len(set_ids))
    md_train = md.loc[set_ids[lo:hi]]
    # validation: honor test_dataset_start when it points inside the corpus
    # (clamped past the train slice so train windows never leak into the
    # val score); otherwise the held-out slice starts right after training
    vlo = (cfg.data.test_dataset_start
           if 0 <= cfg.data.test_dataset_start < len(set_ids) else hi)
    vlo = max(vlo, hi)
    vhi = min(cfg.data.test_dataset_end, len(set_ids))
    md_val = md.loc[set_ids[vlo:vhi]] if vhi > vlo else None

    def epochs():
        """ClassifierDataset is one pass over the corpus; cycle fresh
        epochs (each with a fresh window-phase seed) until total_steps."""
        epoch = 0
        while True:
            ds = ClassifierDataset(cfg.data, parser_obj, tokenizer,
                                   metadata=md_train, seed=cfg.seed + epoch,
                                   use_audio=not tokens_only,
                                   max_tokens=max_tokens)
            produced = False
            for batch in batch_iterator(ds, cfg.optim.batch_size):
                produced = True
                yield batch
            if not produced:
                raise RuntimeError(
                    "classifier dataset produced no batches — check "
                    "train_dataset_path / batch_size vs corpus size")
            epoch += 1

    from ..models.classifier import (classifier_forward,  # noqa: PLC0415
                                     token_classifier_forward)

    @jax.jit
    def logits_fn(params, audio, tokens):
        return classifier_forward(params, dims, audio, tokens)["logits"]

    @jax.jit
    def token_logits_fn(params, tokens):
        return token_classifier_forward(params, dims, tokens,
                                        pad_id=tokenizer.pad_id)["logits"]

    def validate(params) -> float:
        """Held-out window top-1 (the FID instrument's quality gate)."""
        if md_val is None:
            return float("nan")
        ds = ClassifierDataset(cfg.data, parser_obj, tokenizer,
                               metadata=md_val, test=True,
                               use_audio=not tokens_only,
                               max_tokens=max_tokens)
        correct = total = 0
        for batch in batch_iterator(ds, cfg.optim.batch_size,
                                    drop_last=False):
            logits = (token_logits_fn(params, batch["tokens"]) if tokens_only
                      else logits_fn(params, batch["audio"], batch["tokens"]))
            pred = np.argmax(np.asarray(logits), axis=-1)
            correct += int((pred == np.asarray(batch["label"])).sum())
            total += len(pred)
        return correct / max(total, 1)

    import numpy as np  # noqa: PLC0415
    from ..train.checkpoints import save_params  # noqa: PLC0415

    best_val = -1.0
    t0 = time.time()
    for i, batch in enumerate(epochs()):
        if i >= cfg.optim.total_steps:
            break
        params, opt_state, loss, acc = step(params, opt_state, batch)
        if (i + 1) % cfg.logging.every_steps == 0:
            print(f"step {i + 1}: loss={float(loss):.4f} acc={float(acc):.4f} "
                  f"({cfg.logging.every_steps / (time.time() - t0):.2f} it/s)",
                  flush=True)
            t0 = time.time()
        if cfg.checkpoint_path and (i + 1) % cfg.checkpoint.every_steps == 0:
            val = validate(params)
            print(f"step {i + 1}: val_top1={val:.4f} (best {best_val:.4f})",
                  flush=True)
            save_params(cfg.checkpoint_path, params)
            if md_val is None or val >= best_val:
                best_val = val
                save_params(str(Path(cfg.checkpoint_path)) + "_best", params)
            t0 = time.time()
    if cfg.checkpoint_path:
        val = validate(params)
        print(f"final: val_top1={val:.4f} (best {best_val:.4f})", flush=True)
        save_params(cfg.checkpoint_path, params)
        if md_val is None or val >= best_val:
            save_params(str(Path(cfg.checkpoint_path)) + "_best", params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
