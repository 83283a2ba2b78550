"""rcomplexion training entry point + rhythm-complexity inference.

(reference: rcomplexion/train.py, rcomplexion/inference.py:20)
"""

from __future__ import annotations

import argparse
import sys
import time


def calc_rhythm_complexity(beatmap_path, params, dims, dataset) -> float:
    """Mean OD-lenient next-note-time cross-entropy over a beatmap."""
    import numpy as np
    from ..models.rcomplexion import rhythm_complexity
    from ..osu.beatmap import Beatmap

    bm = Beatmap.from_path(beatmap_path)
    windows, targets = [], []
    for ex in dataset.beatmap_windows(bm):
        windows.append(ex["input_ids"])
        targets.append(ex["label"])
    if not windows:
        return 0.0
    return float(rhythm_complexity(params, dims, np.stack(windows),
                                   np.asarray(targets),
                                   od=bm.overall_difficulty))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="train rcomplexion")
    parser.add_argument("-cn", "--config-name", default="tiny")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)

    import jax
    import optax

    from ..config import TrainConfig, load_config
    from ..data.classifier_dataset import RComplexionDataset
    from ..data.dataset import batch_iterator
    from ..data.parser import BeatmapParser
    from ..models.rcomplexion import (RComplexionDims, init_rcomplexion_params,
                                      rcomplexion_loss)
    from ..tokenizer import Tokenizer
    from ..train.optim import build_schedule

    cfg = load_config(TrainConfig, "train", ns.config_name, overrides=ns.overrides)
    from ..parallel.mesh import apply_device  # noqa: PLC0415
    apply_device(cfg.device)
    tokenizer = Tokenizer(cfg)
    parser_obj = BeatmapParser(cfg, tokenizer)
    dims = RComplexionDims(vocab_size_in=tokenizer.vocab_size_in,
                           vocab_size_out=tokenizer.vocab_size_out,
                           src_seq_len=16,
                           hidden_size=cfg.model.arch.d_model)
    params = init_rcomplexion_params(jax.random.PRNGKey(cfg.seed), dims)
    lr = build_schedule(cfg.optim)
    optimizer = optax.adamw(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            loss, _ = rcomplexion_loss(p, dims, batch["input_ids"], batch["label"])
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def epochs():
        """RComplexionDataset is one pass over the corpus; cycle fresh
        epochs (new seed each) until total_steps — the classifier trainer's
        epoch-cycling fix applied here too."""
        epoch = 0
        while True:
            ds = RComplexionDataset(cfg.data, parser_obj, tokenizer,
                                    seed=cfg.seed + epoch)
            produced = False
            for batch in batch_iterator(ds, cfg.optim.batch_size):
                produced = True
                yield batch
            if not produced:
                raise RuntimeError(
                    "rcomplexion dataset produced no batches — check "
                    "train_dataset_path / batch_size vs corpus size")
            epoch += 1

    t0 = time.time()
    for i, batch in enumerate(epochs()):
        if i >= cfg.optim.total_steps:
            break
        params, opt_state, loss = step(params, opt_state, batch)
        if (i + 1) % cfg.logging.every_steps == 0:
            print(f"step {i + 1}: loss={float(loss):.4f} "
                  f"({cfg.logging.every_steps / (time.time() - t0):.2f} it/s)")
            t0 = time.time()
    if cfg.checkpoint_path:
        from ..train.checkpoints import save_params  # noqa: PLC0415
        save_params(cfg.checkpoint_path, params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
