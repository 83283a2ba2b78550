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


def save_params(directory, params) -> None:
    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory / "params", params, force=True)


def restore_params(directory, dims=None, template=None):
    directory = Path(directory).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(directory / "params", template)
        # template-free restore: rebuild an abstract tree from the stored
        # metadata so arrays land on the current default device instead of
        # the device recorded at save time (a CPU-saved checkpoint must
        # restore inside a TPU process and vice versa)
        if not (directory / "params").exists():
            raise FileNotFoundError(
                f"no checkpoint at {directory / 'params'}")
        meta = ckptr.metadata(directory / "params").item_metadata
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta.tree)
        return ckptr.restore(directory / "params", abstract)


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
