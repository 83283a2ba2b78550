"""Checkpoint save/restore via orbax + tokenizer JSON.

TPU-native equivalent of the reference's Accelerate save_state/load_state
(reference: osuT5/osuT5/utils/train_utils.py:43-61, osuT5/train.py:95-99);
the tokenizer rides along as tokenizer.json exactly like the reference's
save_pretrained (tokenizer.py:600).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def resolve_ckpt_dir(directory) -> Path:
    """Resolve a configured checkpoint path against the durable artifact
    mirror.

    Checkpoints train into scratch space (/tmp) which does not survive VM
    restarts; `scripts/mirror_durable.sh` mirrors them into the repo's
    `artifacts/` directory. When the configured path is missing but an
    artifact mirror with the same basename exists, use the mirror — so
    shipped configs (e.g. configs/inference/synth_flagship.yaml
    diff_ckpt=/tmp/synth_dit_b_v4_ckpt) keep working after a scratch wipe.
    Override the mirror root with $BEATHERITAGE_ARTIFACTS."""
    import os  # noqa: PLC0415

    directory = Path(directory)
    if directory.exists():
        return directory
    roots = []
    env_root = os.environ.get("BEATHERITAGE_ARTIFACTS")
    if env_root:
        roots.append(Path(env_root))
    roots.append(Path(__file__).resolve().parents[2] / "artifacts")
    for root in roots:
        candidate = root / directory.name
        if candidate.exists():
            # basename-only match: be loud so a stale mirror from another
            # experiment can't silently stand in for the configured path
            import warnings  # noqa: PLC0415
            warnings.warn(
                f"checkpoint path {directory} is missing; using durable "
                f"artifact mirror {candidate}", stacklevel=2)
            return candidate
    return directory


def save_params(directory, params) -> None:
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory / "params", params, force=True)


def restore_params(directory, dims=None, template=None):
    directory = resolve_ckpt_dir(directory).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if not (directory / "params").exists():
            # durable mirrors may carry only the latest state_N (the full
            # train state); pull just its params subtree. Applies to both
            # the template and template-free branches (a state-only mirror
            # must work for apps/classify.py's template restore too).
            latest = latest_state_dir(directory)
            if latest is not None:
                return _restore_state_params(ckptr, latest)
            raise FileNotFoundError(
                f"no checkpoint at {directory / 'params'}")
        if template is not None:
            return ckptr.restore(directory / "params", template)
        # template-free restore: rebuild an abstract tree from the stored
        # metadata so arrays land on the current default device instead of
        # the device recorded at save time (a CPU-saved checkpoint must
        # restore inside a TPU process and vice versa)
        meta = ckptr.metadata(directory / "params").item_metadata
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta.tree)
        return ckptr.restore(directory / "params", abstract)


def _restore_state_params(ckptr, state_dir: Path):
    """Restore the inference weights from a state_N dir, preserving the
    layout the matching top-level params/ save would have had.

    DiT train states carry EMA weights under 'ema'
    (apps/train_diffusion.py save_state) and their params/ saves are
    {'params', 'ema'} dicts — sampling must see the EMA weights
    (reference: osu_diffusion train.py:32 update_ema). A state-only DiT
    mirror must therefore restore BOTH subtrees, not silently hand back
    the raw non-EMA params."""
    meta = ckptr.metadata(state_dir).item_metadata
    if "ema" in meta.tree:
        return {
            "params": _restore_subtree(ckptr, state_dir, "params"),
            "ema": _restore_subtree(ckptr, state_dir, "ema"),
        }
    return _restore_subtree(ckptr, state_dir, "params")


def _restore_subtree(ckptr, state_dir: Path, key: str):
    """Restore only `state[key]` from a saved train state, skipping the
    other subtrees (opt_state can be 2x the params bytes) via orbax
    PLACEHOLDER partial restore. PLACEHOLDER needs the PyTree handler;
    StandardCheckpointer rejects it."""
    meta = ckptr.metadata(state_dir).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    tree = meta.tree
    if key not in tree:
        raise FileNotFoundError(f"no '{key}' subtree in {state_dir}")
    abstract = {
        k: (jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(
                    m.shape, m.dtype, sharding=sharding), v)
            if k == key else jax.tree.map(lambda _: ocp.PLACEHOLDER, v))
        for k, v in tree.items()
    }
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as tree_ckptr:
        restored = tree_ckptr.restore(
            state_dir, args=ocp.args.PyTreeRestore(item=abstract))
    return restored[key]


def save_train_state(directory, state, tokenizer=None) -> None:
    """Save step/params/opt_state/ema under `directory`, tokenizer alongside."""
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    payload = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory / f"state_{int(state.step)}", payload, force=True)
    save_params(directory, state.params)
    if tokenizer is not None:
        tokenizer.save_pretrained(directory)


def latest_state_dir(directory) -> Optional[Path]:
    directory = Path(directory)
    if not directory.is_dir():
        return None
    candidates = sorted(
        (p for p in directory.iterdir() if p.name.startswith("state_")),
        key=lambda p: int(p.name.split("_")[1]))
    return candidates[-1] if candidates else None


def restore_train_state(directory, template_state) -> Any:
    """Resume from the most recent state_N checkpoint, restoring into the
    structure of `template_state` (reference: osuT5/train.py:97-99)."""
    from .train_loop import TrainState  # noqa: PLC0415
    latest = latest_state_dir(directory)
    if latest is None:
        return None
    payload = {
        "step": template_state.step,
        "params": template_state.params,
        "opt_state": template_state.opt_state,
    }
    if template_state.ema_params is not None:
        payload["ema_params"] = template_state.ema_params
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(latest, payload)
    return TrainState(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored.get("ema_params"),
    )
