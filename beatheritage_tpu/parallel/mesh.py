"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL/Accelerate DDP layer
(reference: osuT5/train.py:33-43, SURVEY.md §2.4): one `jax.sharding.Mesh`
with a `data` axis (gradients all-reduce over ICI via pjit) and an optional
`model` axis for tensor-parallel parameter sharding. Multi-host runs
bootstrap with `jax.distributed.initialize` over DCN before mesh creation.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
