#!/usr/bin/env python
"""Does the trained DiT actually use its class conditioning? (VERDICT r3
item 4: every DiT trained before r4 was effectively unconditioned.)

Paired denoising ablation on held-out maps: noise each position window to
fixed timesteps t (same noise key for both arms), predict with the TRUE
class vector vs the all-UNK (CFG null) vector, and compare the denoising
MSE. A conditioned model denoises better with the true classes;
cond_mse/null_mse ~= 1.0 means the conditioning input is ignored.

Usage:
  python scripts/eval_dit_conditioning.py --ckpt /tmp/synth_dit_xs_ckpt \
      --config synth_xs_v4_cpu --dataset /tmp/synth_mmrs_v4 \
      --start 560 --end 600 --device cpu
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
    ap.add_argument("--config", default="synth_xs_v4_cpu")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="/tmp/synth_mmrs_v4")
    ap.add_argument("--start", type=int, default=560)
    ap.add_argument("--end", type=int, default=600)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--timesteps", type=int, nargs="*", default=[10, 50, 99])
    ap.add_argument("--out", default="/tmp/eval_dit_conditioning.json")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    import jax
    import jax.numpy as jnp

    from beatheritage_tpu.config import DiffusionTrainConfig, load_config
    from beatheritage_tpu.data.dataset import (batch_iterator,
                                               filter_mmrs_metadata,
                                               load_mmrs_metadata)
    from beatheritage_tpu.data.diffusion_dataset import DiffusionDataset
    from beatheritage_tpu.diffusion.sampler import training_losses
    from beatheritage_tpu.diffusion.schedule import DiffusionSchedule
    from beatheritage_tpu.diffusion.tokenizer import DiffusionTokenizer
    from beatheritage_tpu.models.dit import (DiTDims, dit_forward,
                                             init_dit_params,
                                             sinusoidal_embedding)
    from beatheritage_tpu.train.checkpoints import restore_params

    cfg = load_config(DiffusionTrainConfig, "diffusion", args.config,
                      overrides=[f"data.train_dataset_path={args.dataset}"])
    tokenizer = DiffusionTokenizer(cfg)
    md = load_mmrs_metadata(args.dataset)
    tokenizer.load_dataset_indices(md, cfg)
    dims = DiTDims.from_name(cfg.model.model,
                             context_size=cfg.model.context_size,
                             class_size=max(tokenizer.num_tokens, 1))

    tree = restore_params(args.ckpt)
    # sample with EMA weights like the reference (osu_diffusion train.py:32)
    params = tree["ema"] if isinstance(tree, dict) and "ema" in tree else tree

    # the CFG null: every conditioning group at its UNK slot
    y_null = np.zeros(max(tokenizer.num_tokens, 1), np.float32)
    for unk in (tokenizer.style_unk, tokenizer.diff_unk,
                tokenizer.mapper_unk, tokenizer.descriptor_unk,
                tokenizer.cs_unk):
        if unk is not None and 0 <= unk < len(y_null):
            y_null[unk] = 1.0

    schedule = DiffusionSchedule.create(cfg.model.noise_schedule,
                                        cfg.model.diffusion_steps)

    def make_context(batch):
        emb_o = sinusoidal_embedding(batch["o"] * 0.1, 128)
        emb_d = sinusoidal_embedding(batch["d"], 128)
        return jnp.concatenate([emb_o, emb_d, batch["k"]], axis=-1)

    # params MUST be a jit argument: closing over them bakes the full DiT
    # as HLO constants, and the resulting program body exceeds the axon
    # relay's remote_compile request limit (HTTP 413, round-4 queue)
    @jax.jit
    def mse_at(params, batch, y, ts, key):
        c = make_context(batch)
        out = training_losses(
            schedule, lambda x, t: dit_forward(params, dims, x, t, c, y),
            batch["x"], ts, key, l1=False)
        return out["mse"]

    held = filter_mmrs_metadata(md, start=args.start, end=args.end,
                                gamemodes=[0])
    ds = DiffusionDataset(cfg, tokenizer, metadata=held, path=args.dataset,
                          test=True)

    per_t = {t: {"cond": [], "null": []} for t in args.timesteps}
    n = 0
    for i, batch in enumerate(batch_iterator(ds, args.batch)):
        if i >= args.batches:
            break
        y_true = batch["y"]
        y_unk = np.broadcast_to(y_null, y_true.shape).copy()
        for t in args.timesteps:
            ts = np.full(len(y_true), t, np.int32)
            key = jax.random.PRNGKey(1000 * i + t)  # paired noise
            per_t[t]["cond"].append(float(np.mean(np.asarray(
                mse_at(params, batch, y_true, ts, key)))))
            per_t[t]["null"].append(float(np.mean(np.asarray(
                mse_at(params, batch, y_unk, ts, key)))))
        n += len(y_true)

    detail = {}
    ratios = []
    for t in args.timesteps:
        cond = float(np.mean(per_t[t]["cond"]))
        null = float(np.mean(per_t[t]["null"]))
        detail[f"t={t}"] = {"cond_mse": round(cond, 6),
                            "null_mse": round(null, 6),
                            "ratio": round(cond / max(null, 1e-12), 4)}
        ratios.append(cond / max(null, 1e-12))
    payload = {
        "metric": "dit_conditioning_mse_ratio",
        "value": round(float(np.mean(ratios)), 4),
        "unit": "cond/null denoise MSE (<1 = conditioning used)",
        "detail": {"ckpt": args.ckpt, "windows": n,
                   "per_timestep": detail,
                   "sets": [args.start, args.end]},
    }
    Path(args.out).write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
