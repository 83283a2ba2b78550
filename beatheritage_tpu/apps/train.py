"""Training entry point for the seq2seq model.

(reference: osuT5/train.py:31) Usage:

    python -m beatheritage_tpu.apps.train -cn v30 \
        data.train_dataset_path=/data/MMRS checkpoint_path=./ckpt
"""

from __future__ import annotations

import argparse
import sys

import jax


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="train the beatmap generator")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)

    from ..config import TrainConfig, load_config
    from ..data.dataset import (
        MmrsDataset, SharedTrainState, load_mmrs_metadata, load_ors_metadata,
        repeating_batch_iterator)
    from ..data.parser import BeatmapParser
    from ..models import ModelDims, init_params
    from ..tokenizer import Tokenizer
    from ..train.train_loop import Trainer
    from ..train.checkpoints import restore_train_state

    cfg = load_config(TrainConfig, "train", ns.config_name, overrides=ns.overrides)
    from ..parallel.mesh import apply_device
    apply_device(cfg.device)

    # multi-host bootstrap (no-op single-process); must precede backend use
    from ..parallel import initialize_distributed
    topo = initialize_distributed(verbose=True)

    tokenizer = Tokenizer(cfg)
    if cfg.data.train_dataset_path:
        loader = (load_ors_metadata if cfg.data.dataset_type == "ors"
                  else load_mmrs_metadata)
        # resizes the MAPPER/DESCRIPTOR vocab ranges in place
        tokenizer.load_dataset_indices(loader(cfg.data.train_dataset_path))

    parser_obj = BeatmapParser(cfg, tokenizer)
    dims = ModelDims.from_config(cfg, tokenizer)
    from ..models.backbones import resolve_backbone
    try:
        init_fn = resolve_backbone(cfg.model.name).init
    except ValueError:
        init_fn = init_params  # custom arch name: RoPE family
    params = init_fn(jax.random.PRNGKey(cfg.seed), dims)

    shared = SharedTrainState()
    from ..train.logging import MetricsLogger
    logger = MetricsLogger(cfg.logging.log_with, run_name=ns.config_name)

    def on_metrics(step, metrics):
        shared.current_train_step = step
        shared.current_loss = metrics.get("loss", float("inf"))
        logger.log(step, metrics)
        print(f"step {step}: " + " ".join(f"{k}={v:.4g}" for k, v in metrics.items()))

    trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tokenizer,
                      checkpoint_dir=cfg.checkpoint_path or None,
                      log_every=cfg.logging.every_steps, on_metrics=on_metrics)

    if cfg.checkpoint_path:
        restored = restore_train_state(cfg.checkpoint_path, trainer.state)
        if restored is not None:
            # re-place on the mesh: orbax restores single-device arrays,
            # which the train step's explicit in_shardings reject
            from ..train.train_loop import place_state
            trainer.state = place_state(restored, trainer.mesh)
            print(f"resumed from step {int(restored.step)}")

    micro = cfg.optim.batch_size // max(cfg.optim.grad_acc, 1)
    if cfg.dataloader.num_workers > 1:
        from ..data.dataset import multiprocess_batch_iterator
        batches = multiprocess_batch_iterator(
            cfg, tokenizer, micro, num_workers=cfg.dataloader.num_workers,
            seed=cfg.seed, shared=shared)
    else:
        def make_dataset():
            return MmrsDataset(cfg.data, parser_obj, tokenizer, shared=shared)

        batches = repeating_batch_iterator(make_dataset, micro)
    if cfg.optim.grad_acc > 1:
        def accumulate(src):
            import numpy as np  # noqa: PLC0415
            while True:
                group = [next(src) for _ in range(cfg.optim.grad_acc)]
                yield {k: np.stack([g[k] for g in group]) for k in group[0]}
        batches = accumulate(batches)

    trainer.fit(batches, max_steps=cfg.optim.total_steps)
    if cfg.checkpoint_path:
        trainer.save_checkpoint()
    return 0


if __name__ == "__main__":
    sys.exit(main())
