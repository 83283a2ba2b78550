"""Tensor-parallel parameter sharding rules over the mesh `model` axis.

Megatron-style column/row split per transformer layer: QKV and FF up
projections shard their output features, output/down projections shard
their input features, so each layer needs one all-reduce (inserted by XLA
from the shardings — no hand-written collectives). The 219M flagship fits a
single chip, so TP is optional (SURVEY.md §2.4), but the rules make the
same train step scale to model-parallel meshes unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# weight-name -> which trailing axis to shard ('out' = last, 'in' = second
# to last). Stacked layers add a leading L axis which stays unsharded.
_COLUMN_PARALLEL = {"q", "k", "v", "xq", "xk", "xv", "ff1", "mlp1", "qkv"}
_ROW_PARALLEL = {"o", "xo", "ff2", "mlp2", "proj"}


def _path_names(path) -> list[str]:
    return [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]


def param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter by its tree path."""
    names = _path_names(path)
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    leaf_name = names[-1]
    parent = names[-2] if len(names) >= 2 else ""

    if parent in _COLUMN_PARALLEL:
        if leaf_name == "w":
            return P(*([None] * (leaf.ndim - 1)), "model")
        if leaf_name == "b":
            return P(*([None] * (leaf.ndim - 1)), "model")
    if parent in _ROW_PARALLEL:
        if leaf_name == "w" and leaf.ndim >= 2:
            return P(*([None] * (leaf.ndim - 2)), "model", None)
        return P()  # row-parallel bias stays replicated (added post-reduce)
    if leaf_name == "lm_head" or (names and names[-1] == "lm_head"):
        return P(None, "model") if leaf.ndim == 2 else P()
    if leaf_name == "dec_embed":
        return P(None, "model") if leaf.ndim == 2 else P()
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding pytree for a parameter tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params)


def state_shardings(mesh: Mesh, state: Any):
    """Shardings for a TrainState: params/ema/opt-state leaves follow the
    parameter rule (their tree paths end with the same parameter names);
    scalars stay replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), state)
