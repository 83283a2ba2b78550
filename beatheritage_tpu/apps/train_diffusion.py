"""DiT (osu-diffusion) training entry point.

(reference: osu_diffusion/train.py:90) Accelerate-DDP loop replaced by one
jitted pjit step over the mesh; EMA decay .9999 (update_ema:32); timesteps
sampled t ~ U(0, max_diffusion_step) — the refiner regime trained only on
the last slice of the noise schedule (train.py:192).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="train the DiT coordinate refiner")
    parser.add_argument("-cn", "--config-name", default="v1")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ..config import DiffusionTrainConfig, load_config
    from ..data.dataset import repeating_batch_iterator
    from ..data.diffusion_dataset import DiffusionDataset
    from ..diffusion.sampler import training_losses
    from ..diffusion.schedule import DiffusionSchedule
    from ..diffusion.tokenizer import DiffusionTokenizer
    from ..models.dit import (DiTDims, dit_forward, init_dit_params,
                              sinusoidal_embedding)
    from ..parallel.mesh import (apply_device, batch_sharding, build_mesh,
                                 replicated)
    from ..train.optim import build_schedule

    cfg = load_config(DiffusionTrainConfig, "diffusion", ns.config_name,
                      overrides=ns.overrides)
    apply_device(cfg.device)
    tokenizer = DiffusionTokenizer(cfg)
    if cfg.data.train_dataset_path:
        # style/mapper/descriptor conditioning tables from the corpus
        # (reference osu_diffusion trains class-conditional); class_size
        # below depends on these, so load BEFORE building dims
        from ..data.dataset import load_mmrs_metadata  # noqa: PLC0415
        tokenizer.load_dataset_indices(
            load_mmrs_metadata(cfg.data.train_dataset_path), cfg)
    dims = DiTDims.from_name(cfg.model.model,
                             context_size=cfg.model.context_size,
                             class_size=max(tokenizer.num_tokens, 1))
    params = init_dit_params(jax.random.PRNGKey(cfg.seed), dims)
    ema = jax.tree.map(jnp.copy, params)

    schedule = DiffusionSchedule.create(cfg.model.noise_schedule,
                                        cfg.model.diffusion_steps)
    lr = build_schedule(cfg.optim)
    optimizer = optax.chain(optax.clip_by_global_norm(cfg.optim.gradient_clip),
                            optax.adamw(lr, weight_decay=cfg.optim.weight_decay))
    opt_state = optimizer.init(params)
    mesh = build_mesh(-1, 1)
    max_t = cfg.model.max_diffusion_step

    def make_context(batch):
        # (reference data_loading.py: GLIDE sin/cos features of 0.1*time and
        # jump distance + 16 kind flags) — computed ON DEVICE so each batch
        # ships ~100 KB of raw scalars, not the ~9 MB (B, L, 272) embedding
        emb_o = sinusoidal_embedding(batch["o"] * 0.1, 128)
        emb_d = sinusoidal_embedding(batch["d"], 128)
        return jnp.concatenate([emb_o, emb_d, batch["k"]], axis=-1)

    def step_fn(params, opt_state, ema, batch, ts, weights, key):
        def loss_fn(p):
            c = make_context(batch)
            out = training_losses(
                schedule,
                lambda x, t: dit_forward(p, dims, x, t, c, batch["y"]),
                batch["x"], ts, key, l1=cfg.model.l1_loss, weights=weights)
            return out["loss"], out

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, p: 0.9999 * e + 0.0001 * p, ema, params)
        return params, opt_state, ema, aux

    step = jax.jit(step_fn, in_shardings=(replicated(mesh),) * 3
                   + (batch_sharding(mesh), batch_sharding(mesh),
                      batch_sharding(mesh), None),
                   out_shardings=(replicated(mesh),) * 3 + (None,))

    from ..diffusion.timestep_sampler import create_schedule_sampler
    t_sampler = create_schedule_sampler(cfg.model.schedule_sampler, max_t)
    t_rng = np.random.default_rng(cfg.seed)

    from ..train.checkpoints import (latest_state_dir,  # noqa: PLC0415
                                     save_params)
    import orbax.checkpoint as ocp  # noqa: PLC0415

    start_step = 0
    if cfg.checkpoint_path:
        latest = latest_state_dir(cfg.checkpoint_path)
        if latest is not None:
            template = {"step": 0, "params": params, "ema": ema,
                        "opt_state": opt_state}
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(latest, template)
            start_step = int(restored["step"])
            params, ema = restored["params"], restored["ema"]
            opt_state = restored["opt_state"]
            print(f"resumed from {latest} at step {start_step}")

    def save_state(step_num):
        from pathlib import Path  # noqa: PLC0415
        out = Path(cfg.checkpoint_path).resolve()
        out.mkdir(parents=True, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(out / f"state_{step_num}",
                       {"step": step_num, "params": params, "ema": ema,
                        "opt_state": opt_state}, force=True)
        save_params(cfg.checkpoint_path, {"params": params, "ema": ema})

    # one dataset instance across epochs: it caches the parsed point arrays
    # (Beatmap parsing dominates loader cost) and reshuffles per __iter__
    dataset = DiffusionDataset(cfg, tokenizer)
    batches = repeating_batch_iterator(lambda: dataset, cfg.optim.batch_size)
    key = jax.random.PRNGKey(cfg.seed + start_step)
    # SIGTERM = stop-but-keep-the-work (the measurement queue's phase
    # timeout TERMs us; checkpoint instead of losing progress)
    import signal  # noqa: PLC0415
    stop_requested = []
    try:
        signal.signal(signal.SIGTERM, lambda *_: stop_requested.append(1))
    except ValueError:
        pass
    t_start = time.time()
    t0 = time.time()
    for i, batch in enumerate(batches):
        step_num = start_step + i + 1  # 1-based global step
        if step_num > cfg.optim.total_steps:
            break
        if stop_requested or (
                cfg.max_seconds and time.time() - t_start > cfg.max_seconds):
            why = "SIGTERM" if stop_requested else "max_seconds"
            print(f"{why} at step {step_num - 1}; "
                  "checkpointing and exiting", flush=True)
            if cfg.checkpoint_path:
                save_state(step_num - 1)
            break
        key, sub = jax.random.split(key)
        ts, weights = t_sampler.sample(batch["x"].shape[0], t_rng)
        params, opt_state, ema, aux = step(params, opt_state, ema, batch,
                                           ts, weights, sub)
        if t_sampler.needs_losses:  # uniform sampler: skip the device fetch
            t_sampler.update_with_losses(ts, np.asarray(aux["per_sample"]))
        if step_num % cfg.logging.every_steps == 0:
            print(f"step {step_num}: loss={float(aux['loss']):.4f} "
                  f"mse={float(aux['mse']):.4f} vb={float(aux['vb']):.4f} "
                  f"({cfg.logging.every_steps / (time.time() - t0):.2f} it/s)",
                  flush=True)
            t0 = time.time()
        if cfg.checkpoint_path and step_num % cfg.checkpoint.every_steps == 0:
            save_state(step_num)
    if cfg.checkpoint_path:
        save_params(cfg.checkpoint_path, {"params": params, "ema": ema})
        tokenizer.save_pretrained(cfg.checkpoint_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
