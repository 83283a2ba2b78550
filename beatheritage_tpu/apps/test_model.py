"""Model evaluation CLI: checkpoint -> per-context accuracy buckets.

(reference: osuT5/test.py:68 — runs the test split through the train-eval
metric stack, bucketing accuracy by context type, with the time-in-window
and timeshift-offset breakdowns.)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="evaluate a trained checkpoint")
    parser.add_argument("-cn", "--config-name", default="tiny")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override
    apply_device_override(ns.overrides)

    import jax
    import jax.numpy as jnp

    from ..config import TrainConfig, load_config
    from ..data.dataset import MmrsDataset, batch_iterator
    from ..data.parser import BeatmapParser
    from ..models import ModelDims, init_params
    from ..models.transformer import forward, rhythm_class_weights, weighted_cross_entropy
    from ..tokenizer import Tokenizer
    from ..train.checkpoints import restore_params
    from ..train.metrics import evaluate_batches

    cfg = load_config(TrainConfig, "train", ns.config_name, overrides=ns.overrides)
    tokenizer = Tokenizer(cfg)
    if cfg.checkpoint_path:
        tokenizer = Tokenizer.from_pretrained(cfg.checkpoint_path)
    parser_obj = BeatmapParser(cfg, tokenizer)
    dims = ModelDims.from_config(cfg, tokenizer)
    if cfg.checkpoint_path:
        params = restore_params(cfg.checkpoint_path)
    else:
        print("WARNING: no checkpoint_path; evaluating random weights")
        params = init_params(jax.random.PRNGKey(cfg.seed), dims)

    class_weights = rhythm_class_weights(dims)

    @jax.jit
    def eval_step(params, batch):
        logits = forward(params, dims, cfg, batch["frames"],
                         batch["decoder_input_ids"],
                         decoder_attention_mask=batch.get("decoder_attention_mask"),
                         difficulty=batch.get("difficulty"),
                         mapper_idx=batch.get("mapper_idx"),
                         song_position=batch.get("song_position"),
                         dtype=jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32)
        loss, _ = weighted_cross_entropy(logits, batch["labels"], class_weights)
        return loss, logits

    dataset = MmrsDataset(cfg.data, parser_obj, tokenizer, test=True)
    micro = max(cfg.optim.batch_size // max(cfg.optim.grad_acc, 1), 1)
    batches = batch_iterator(dataset, micro)
    stats = evaluate_batches(eval_step, params, batches, tokenizer, cfg,
                             max_steps=ns.steps)
    print(json.dumps(stats, indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
