"""pjit training step + loop.

TPU-native replacement for the reference's Accelerate DDP loop
(reference: osuT5/osuT5/utils/train_utils.py:322 train, osuT5/train.py:31):
the whole step — forward (mel included), rhythm-weighted CE, backward,
clip, optimizer, EMA — is ONE jitted program. Data parallelism comes from
sharding the batch over the mesh `data` axis; XLA inserts the gradient
all-reduce over ICI (no NCCL-style comm code). Gradient accumulation is a
lax.scan over microbatches inside the same program.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Any, Callable, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import (
    ModelDims,
    forward,
    rhythm_class_weights,
    weighted_cross_entropy,
)
from ..parallel.mesh import batch_sharding, build_mesh, replicated
from .optim import build_optimizer, build_schedule


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


def init_train_state(params, optimizer, ema: bool = True) -> TrainState:
    # copy params: the train step donates its input state buffers, and the
    # caller's original pytree must stay valid
    params = jax.tree.map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def _remat_arg(cfg):
    """False when checkpointing is off; else the configured policy string
    ('dots' saves MXU outputs) or True for save-nothing."""
    if not cfg.gradient_checkpointing:
        return False
    return getattr(cfg, "remat_policy", "") or True


def make_loss_fn(dims: ModelDims, cfg, use_flash: bool = False,
                 dtype=jnp.bfloat16, backbone=None) -> Callable:
    class_weights = rhythm_class_weights(dims)

    def backbone_logits(params, batch):
        """Non-RoPE families (whisper/nwhisper/t5) route through the
        backbone registry; no flash/remat (they are the small legacy
        models)."""
        enc_kw = {}
        if backbone.family == "whisper":
            enc_kw = dict(beatmap_idx=batch.get("beatmap_idx"),
                          difficulty=batch.get("difficulty"),
                          mapper_idx=batch.get("mapper_idx"),
                          song_position=batch.get("song_position"))
        enc = backbone.encode(params, dims, cfg, batch["frames"],
                              dtype=dtype, **enc_kw)
        return backbone.decode_train(params, dims,
                                     batch["decoder_input_ids"], enc,
                                     dtype=dtype)

    loss_chunk = int(getattr(cfg, "loss_chunk_size", 0) or 0)

    def loss_fn(params, batch):
        # gradient checkpointing remats PER LAYER inside the scans (only the
        # layer inputs are stored); checkpointing the whole forward would
        # still save every layer's scan residuals simultaneously — 30+ GB
        # at B=4, T=8192
        rope = backbone is None or backbone.family == "ropewhisper"
        if rope and loss_chunk > 0:
            # chunked loss: never materialize (B, T, V) logits — the two
            # largest train-step buffers at flagship scale (8+ GB at B=32)
            hidden = forward(
                params, dims, cfg, batch["frames"], batch["decoder_input_ids"],
                decoder_attention_mask=batch.get("decoder_attention_mask"),
                beatmap_idx=batch.get("beatmap_idx"),
                difficulty=batch.get("difficulty"),
                mapper_idx=batch.get("mapper_idx"),
                song_position=batch.get("song_position"),
                dtype=dtype, use_flash=use_flash,
                remat=_remat_arg(cfg), return_hidden=True)
            from ..models.transformer import chunked_weighted_cross_entropy
            loss, n_tokens, n_correct = chunked_weighted_cross_entropy(
                hidden, params["lm_head"], batch["labels"], class_weights,
                label_smoothing=dims.label_smoothing,
                sample_weights=batch.get("sample_weights"),
                chunk=loss_chunk)
            return loss, {
                "loss": loss,
                "accuracy": n_correct / jnp.maximum(n_tokens, 1),
                "n_tokens": n_tokens,
            }
        if not rope:
            logits = backbone_logits(params, batch)
        else:
            logits = forward(
                params, dims, cfg, batch["frames"], batch["decoder_input_ids"],
                decoder_attention_mask=batch.get("decoder_attention_mask"),
                beatmap_idx=batch.get("beatmap_idx"),
                difficulty=batch.get("difficulty"),
                mapper_idx=batch.get("mapper_idx"),
                song_position=batch.get("song_position"),
                dtype=dtype, use_flash=use_flash,
                remat=_remat_arg(cfg))
        loss, n_tokens = weighted_cross_entropy(
            logits, batch["labels"], class_weights,
            label_smoothing=dims.label_smoothing,
            sample_weights=batch.get("sample_weights"))
        acc = (jnp.argmax(logits, -1) == batch["labels"]) & (batch["labels"] != -100)
        metrics = {
            "loss": loss,
            "accuracy": acc.sum() / jnp.maximum(n_tokens, 1),
            "n_tokens": n_tokens,
        }
        return loss, metrics

    return loss_fn


def make_train_step(dims: ModelDims, cfg, optimizer, mesh: Mesh, *,
                    grad_acc: int = 1, use_flash: bool = False,
                    dtype=jnp.bfloat16, backbone=None):
    """Build the jitted train step.

    batch arrays have a leading microbatch axis when grad_acc > 1:
    (grad_acc, B_micro, ...); otherwise plain (B, ...).
    """
    loss_fn = make_loss_fn(dims, cfg, use_flash, dtype, backbone=backbone)
    ema_decay = cfg.optim.ema_decay
    post_step = getattr(backbone, "post_step", None)

    def single_grads(params, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        return grads, metrics

    def step_fn(state: TrainState, batch):
        if grad_acc > 1:
            def scan_body(carry, micro):
                g_acc, m_acc = carry
                grads, metrics = single_grads(state.params, micro)
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                m_acc = jax.tree.map(jnp.add, m_acc, metrics)
                return (g_acc, m_acc), None
            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            zeros_m = {"loss": jnp.zeros([]), "accuracy": jnp.zeros([]),
                       "n_tokens": jnp.zeros([], jnp.int32)}
            (grads, metrics), _ = jax.lax.scan(
                scan_body, (zeros_g, zeros_m), batch)
            grads = jax.tree.map(lambda g: g / grad_acc, grads)
            metrics = {k: v / grad_acc for k, v in metrics.items()}
        else:
            grads, metrics = single_grads(state.params, batch)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(jnp.add, state.params, updates)
        if post_step is not None:
            # e.g. NWhisper re-projects NormLinear weights onto the unit
            # sphere after each step (reference register_step_post_hook)
            params = post_step(params)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = jax.tree.map(
                lambda e, p: ema_decay * e + (1 - ema_decay) * p, ema_params, params)
        grad_l2 = optax_global_norm(grads)
        weights_l2 = optax_global_norm(params)
        metrics = dict(metrics, grad_l2=grad_l2, weights_l2=weights_l2)
        return TrainState(state.step + 1, params, opt_state, ema_params), metrics

    if "model" in mesh.shape and mesh.shape["model"] > 1:
        # tensor-parallel: parameters (and their optimizer moments) shard
        # over the model axis per parallel/sharding rules
        from ..parallel.sharding import state_shardings  # noqa: PLC0415

        def make_state_sharding(state):
            return state_shardings(mesh, state)
        state_sharding = None  # resolved per-state below via wrapper
        data_sharding = (NamedSharding(mesh, P(None, "data")) if grad_acc > 1
                         else batch_sharding(mesh))

        compiled = {}

        def wrapper(state, batch):
            key = "jit"
            if key not in compiled:
                ss = make_state_sharding(state)
                compiled[key] = jax.jit(
                    step_fn,
                    in_shardings=(ss, data_sharding),
                    out_shardings=(ss, replicated(mesh)),
                    donate_argnums=(0,))
            return compiled[key](state, batch)

        return wrapper

    state_sharding = replicated(mesh)
    # with accumulation the microbatch axis leads; shard the batch axis
    data_sharding = (NamedSharding(mesh, P(None, "data")) if grad_acc > 1
                     else batch_sharding(mesh))
    return jax.jit(
        step_fn,
        in_shardings=(state_sharding, data_sharding),
        out_shardings=(state_sharding, state_sharding),
        donate_argnums=(0,))


def place_state(state, mesh: Mesh):
    """Device-put a (restored) TrainState onto the shardings make_train_step
    expects. Required before resuming under a mesh: orbax restores committed
    single-device arrays, and jit's explicit in_shardings reject them."""
    if "model" in mesh.shape and mesh.shape["model"] > 1:
        from ..parallel.sharding import state_shardings  # noqa: PLC0415
        ss = state_shardings(mesh, state)
    else:
        rep = replicated(mesh)
        ss = jax.tree.map(lambda _: rep, state)
    return jax.tree.map(jax.device_put, state, ss)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32)))
              for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    return jnp.sqrt(sum(leaves))


def make_eval_step(dims: ModelDims, cfg, use_flash: bool = False,
                   dtype=jnp.bfloat16, backbone=None):
    loss_fn = make_loss_fn(dims, cfg, use_flash, dtype, backbone=backbone)

    @jax.jit
    def eval_step(params, batch):
        _, metrics = loss_fn(params, batch)
        # per-position argmax for external per-class accuracy bucketing
        return metrics

    return eval_step


@dataclasses.dataclass
class Trainer:
    """Minimal training driver: mesh + jitted step + periodic checkpoint/log.

    Replaces the reference's accelerate loop (train_utils.py:322). The data
    iterator yields host numpy batch dicts; device transfer + sharding happen
    at dispatch.
    """

    cfg: Any
    dims: ModelDims
    params: Any
    tokenizer: Any = None
    mesh: Optional[Mesh] = None
    checkpoint_dir: Optional[str] = None
    log_every: int = 10
    on_metrics: Optional[Callable[[int, dict], None]] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = build_mesh(self.cfg.mesh.data, self.cfg.mesh.model)
        schedule = build_schedule(self.cfg.optim)
        self.schedule = schedule
        self.optimizer = build_optimizer(self.cfg.optim, schedule)
        # ema_decay <= 0 disables the EMA copy (1.3 GB at flagship scale;
        # the reference osuT5 declares ema_decay but its train loop never
        # applies it — EMA is real only for the diffusion model)
        self.state = init_train_state(self.params, self.optimizer,
                                      ema=self.cfg.optim.ema_decay > 0)
        # Pallas kernels only compile on TPU (CPU would need interpret mode).
        # Flash training also drops the decoder padding key-mask, which is
        # loss-exact only for tail padding — center_pad_decoder layouts put
        # pads before the content, so they keep the masked XLA path.
        use_flash = (self.cfg.flash_attention
                     and jax.default_backend() == "tpu"
                     and not self.cfg.data.center_pad_decoder)
        from ..models.backbones import resolve_backbone  # noqa: PLC0415
        try:
            self.backbone = resolve_backbone(self.cfg.model.name)
        except ValueError:
            self.backbone = None  # custom arch name: default RoPE family
        self.train_step = make_train_step(
            self.dims, self.cfg, self.optimizer, self.mesh,
            grad_acc=self.cfg.optim.grad_acc,
            use_flash=use_flash,
            dtype=jnp.bfloat16 if self.cfg.precision == "bf16" else jnp.float32,
            backbone=self.backbone)

    def fit(self, batches: Iterator[dict], max_steps: Optional[int] = None) -> dict:
        """Run the loop; returns the last metrics.

        When cfg.profile.do_profile is set, captures a jax.profiler trace
        (Perfetto/XPlane) over the configured wait/warmup/active window,
        mirroring the reference's torch.profiler schedule
        (train_utils.py:381 train_profiling)."""
        last_metrics: dict = {}
        t0 = time.time()
        prof = getattr(self.cfg, "profile", None)
        prof_start = prof.wait + prof.warmup if prof and prof.do_profile else None
        prof_stop = (prof_start + prof.active) if prof_start is not None else None
        # max_steps bounds the GLOBAL step (state.step), not the number of
        # batches this call consumes: a resumed run must stop at the same
        # total_steps as a fresh one (reference osuT5/train.py:97-99 resumes
        # scheduler+step together). One host fetch here; the loop itself
        # compares against the local counter to avoid a per-step device sync.
        start_step = int(self.state.step)
        deadline = getattr(self.cfg, "max_seconds", 0.0) or 0.0
        # SIGTERM = "stop now but keep the work": checkpoint before exiting
        # (the measurement queue TERMs the trainer when its own deadline
        # approaches; without this, up to checkpoint.every_steps of progress
        # would be lost). Only installable from the main thread.
        import signal  # noqa: PLC0415
        stop_requested = []
        try:
            prev_handler = signal.signal(
                signal.SIGTERM, lambda *_: stop_requested.append(1))
        except ValueError:  # not the main thread (e.g. under a test runner)
            prev_handler = None
        t_fit = time.time()
        try:
            for i, batch in enumerate(batches):
                if max_steps is not None and start_step + i >= max_steps:
                    break
                if stop_requested or (deadline and time.time() - t_fit > deadline):
                    why = "SIGTERM" if stop_requested else "max_seconds"
                    print(f"{why} at step {int(self.state.step)}; "
                          "checkpointing and exiting")
                    if self.checkpoint_dir:
                        self.save_checkpoint()
                    break
                if prof_start is not None and i == prof_start:
                    import jax.profiler  # noqa: PLC0415
                    jax.profiler.start_trace("/tmp/bh_profile")
                if prof_stop is not None and i == prof_stop:
                    import jax.profiler  # noqa: PLC0415
                    jax.profiler.stop_trace()
                    print("profiler trace written to /tmp/bh_profile")
                    if prof.early_stop:
                        break
                self.state, metrics = self.train_step(self.state, batch)
                if (i + 1) % self.log_every == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    host["lr"] = float(self.schedule(int(self.state.step)))
                    host["steps_per_sec"] = self.log_every / (time.time() - t0)
                    t0 = time.time()
                    last_metrics = host
                    if self.on_metrics is not None:
                        self.on_metrics(int(self.state.step), host)
                    if self.checkpoint_dir:
                        # liveness marker for babysitters: the float() above
                        # synced the device, so a stale mtime means steps are
                        # genuinely stalled (e.g. a dropped tunnel connection
                        # re-staging for ~45 min), not just unlogged
                        try:
                            d = Path(self.checkpoint_dir)
                            d.mkdir(parents=True, exist_ok=True)
                            (d / ".heartbeat").touch()
                        except OSError:
                            pass
                if (self.checkpoint_dir
                        and int(self.state.step) % self.cfg.checkpoint.every_steps == 0):
                    self.save_checkpoint()
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        return last_metrics

    def save_checkpoint(self):
        from .checkpoints import save_train_state  # noqa: PLC0415
        save_train_state(self.checkpoint_dir, self.state, self.tokenizer)
