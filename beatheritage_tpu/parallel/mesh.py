"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL/Accelerate DDP layer
(reference: osuT5/train.py:33-43, SURVEY.md §2.4): one `jax.sharding.Mesh`
with a `data` axis (gradients all-reduce over ICI via pjit) and an optional
`model` axis for tensor-parallel parameter sharding. Multi-host runs
bootstrap with `jax.distributed.initialize` over DCN before mesh creation.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def apply_device(device: str) -> None:
    """Honor cfg.device on hosts whose site hooks force JAX_PLATFORMS.

    The env var is captured as the jax config default at import time, and
    site customization (e.g. a TPU-tunnel register hook) can re-assert a
    device platform even when the caller exported JAX_PLATFORMS=cpu —
    after import, only jax.config wins. ''/'auto'/'tpu' keep the ambient
    default; anything else ('cpu') is forced explicitly. Without this, a
    cfg.device=cpu training app dials the TPU backend, contending with (or
    hanging on) whatever owns the chip."""
    if device and device not in ("auto", "tpu"):
        os.environ["JAX_PLATFORMS"] = device
        jax.config.update("jax_platforms", device)


def build_mesh(data: int = -1, model: int = 1,
               devices=None) -> Mesh:
    """Create a (data, model) mesh. data=-1 means all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model < 1:
        model = 1
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))
