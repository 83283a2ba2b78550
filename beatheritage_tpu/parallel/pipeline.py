"""GPipe-style pipeline parallelism over a ``stage`` mesh axis.

The reference trains with data parallelism only (HF Accelerate DDP,
osuT5/train.py:33-43); SURVEY.md §2.4 lists pipeline parallelism as a
possible TPU upgrade ("shard_map stage split"). This module implements that
upgrade the TPU-native way:

- the model's stacked layer parameters (leading ``L`` axis, applied with
  ``lax.scan`` in models/transformer.py) are split over a ``stage`` mesh
  axis with a plain ``PartitionSpec("stage")`` — stage ``s`` holds layers
  ``[s*L/S, (s+1)*L/S)``;
- inside ``shard_map``, microbatches rotate through the stages with
  ``lax.ppermute`` ticks driven by one ``lax.scan`` (the scaling-book
  pipelining recipe). Tick ``t`` has stage ``s`` working microbatch
  ``t - s``; a microbatch entering stage 0 at tick ``m`` leaves the last
  stage at tick ``m + S - 1``;
- backprop needs no hand-written schedule: the transpose of ``ppermute``
  is the reverse permutation and the transpose of ``scan`` runs the ticks
  backwards, so ``jax.grad`` of the pipelined apply IS the 1F1B-shaped
  backward, with each stage's layer gradients produced on the device that
  owns them.

Composition: the microbatch contents stay batch-parallel, so sharding the
per-microbatch batch dimension over a ``data`` axis gives DP x PP on a
``(data, stage)`` mesh with no code changes (tested in
tests/test_pipeline_parallel.py). The 219M flagship fits one chip, so PP
is optional at reference scale — this exists for the scale-out design,
like the tensor-parallel rules in parallel/sharding.py.

Bubble ticks (the ``S - 1`` warm-up/drain slots) run the stage body on
zero/stale activations whose outputs reach no loss term, so autodiff
assigns them zero cotangent; they cost the standard GPipe bubble fraction
``(S-1)/(M+S-1)`` of step time, amortized by raising ``num_microbatches``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level name; experimental path kept for older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _index_mb(tree: Any, m: jnp.ndarray, num_microbatches: int) -> Any:
    """tree of (M, ...) arrays -> the m-th microbatch slice (clipped)."""
    m = jnp.clip(m, 0, num_microbatches - 1)
    return jax.tree_util.tree_map(
        lambda c: lax.dynamic_index_in_dim(c, m, 0, keepdims=False), tree)


def pipeline_apply(block_fn: Callable, local_layers: Any, x_mb: jnp.ndarray,
                   mb_consts: Sequence[Any] = (),
                   shared_consts: Sequence[Any] = (), *,
                   axis: str = "stage") -> jnp.ndarray:
    """Collective pipeline loop. Call inside ``shard_map`` with ``axis``.

    Args:
      block_fn: ``block_fn(layer_params, h, *mb_consts_m, *shared_consts)
        -> h`` applying ONE layer; must preserve ``h``'s shape.
      local_layers: this stage's stacked layer params, leading axis L/S.
      x_mb: (M, mb, ...) microbatched input, replicated across stages.
      mb_consts: pytrees with leading microbatch axis M (e.g. encoder
        hidden states for cross-attention) — indexed per tick by the
        microbatch currently at this stage, never ppermuted.
      shared_consts: pytrees used as-is every tick (e.g. RoPE tables).

    Returns (M, mb, ...) outputs, valid on the LAST stage only (zeros
    elsewhere). Callers either psum-broadcast (``pipelined``) or reduce a
    loss on the last stage and psum the scalar (cheaper at scale).
    """
    s_idx = lax.axis_index(axis)
    n_stages = lax.psum(1, axis)
    num_mb = x_mb.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def apply_stage(h, m):
        consts = _index_mb(tuple(mb_consts), m, num_mb)

        def one(carry, layer):
            return block_fn(layer, carry, *consts, *shared_consts), None

        out, _ = lax.scan(one, h, local_layers)
        return out

    def tick(carry, t):
        state, outputs = carry
        inject = lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, num_mb - 1), 0, keepdims=False)
        h = jnp.where(s_idx == 0, inject, state)
        y = apply_stage(h, t - s_idx)
        out_m = t - (n_stages - 1)
        emit = jnp.logical_and(s_idx == n_stages - 1,
                               jnp.logical_and(out_m >= 0, out_m < num_mb))
        # select-then-write (not lax.cond): both sides share the same
        # device-varying type, and a non-emitting tick writes the slice
        # back unchanged
        idx = jnp.clip(out_m, 0, num_mb - 1)
        cur = lax.dynamic_index_in_dim(outputs, idx, 0, keepdims=False)
        outputs = lax.dynamic_update_index_in_dim(
            outputs, jnp.where(emit, y.astype(outputs.dtype), cur), idx, 0)
        state = lax.ppermute(y, axis, perm)
        return (state, outputs), None

    state0 = jnp.zeros(x_mb.shape[1:], x_mb.dtype)
    outputs0 = jnp.zeros_like(x_mb)
    # the loop makes the carry device-varying over the stage axis (and any
    # axis the input batch is sharded over); mark the (all-zero) initial
    # carry accordingly for jax>=0.8's VMA type system
    pcast = getattr(lax, "pcast", None)
    pvary = (partial(pcast, to="varying") if pcast is not None
             else getattr(lax, "pvary", None))
    if pvary is not None:
        in_vma = getattr(jax.typeof(x_mb), "vma", frozenset())
        want = set(in_vma) | {axis}

        def to_varying(a):
            missing = tuple(want - set(getattr(jax.typeof(a), "vma", ())))
            return pvary(a, missing) if missing else a

        state0 = to_varying(state0)
        outputs0 = to_varying(outputs0)
    (_, outputs), _ = lax.scan(
        tick, (state0, outputs0), jnp.arange(num_mb + n_stages - 1))
    return outputs


def pipelined(mesh: Mesh, block_fn: Callable, *, num_microbatches: int,
              axis: str = "stage",
              batch_axis: str | None = None) -> Callable:
    """Build a jittable pipelined layer-stack apply over ``mesh``.

    Returns ``apply(stacked_layers, x, mb_consts=(), shared_consts=())``
    where ``stacked_layers`` has a leading layer axis divisible by the
    stage count and ``x`` is the global batch (leading axis divisible by
    ``num_microbatches``). ``mb_consts`` are per-example pytrees (leading
    batch axis, microbatched alongside ``x``); ``shared_consts`` are
    batch-independent. With ``batch_axis`` set, per-microbatch batch dims
    are additionally sharded over that mesh axis (DP x PP).
    """
    n_stages = mesh.shape[axis]
    mb_spec = P(None, batch_axis) if batch_axis else P()

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), mb_spec, mb_spec, P()),
             out_specs=mb_spec)
    def run(stage_layers, x_mb, mb_consts, shared_consts):
        outputs = pipeline_apply(block_fn, stage_layers, x_mb,
                                 mb_consts, shared_consts, axis=axis)
        # broadcast the last stage's outputs; zeros elsewhere make psum a
        # copy. Training loops should instead reduce the loss on the last
        # stage and psum the scalar (see tests) — this keeps generic apply
        # semantics simple. The (M, mb, ...) shape is kept through the
        # out_specs so the per-microbatch batch axis reassembles in input
        # order under DP; the caller-facing wrapper flattens it.
        return lax.psum(outputs, axis)

    def apply(stacked_layers, x, mb_consts=(), shared_consts=()):
        n_layers = jax.tree_util.tree_leaves(stacked_layers)[0].shape[0]
        if n_layers % n_stages:
            raise ValueError(
                f"{n_layers} layers not divisible by {n_stages} stages")
        batch = x.shape[0]
        if batch % num_microbatches:
            raise ValueError(
                f"batch {batch} not divisible by {num_microbatches} "
                "microbatches")
        mb = batch // num_microbatches
        if batch_axis and mb % mesh.shape[batch_axis]:
            raise ValueError(
                f"microbatch size {mb} not divisible by mesh axis "
                f"'{batch_axis}' ({mesh.shape[batch_axis]} devices)")

        def to_mb(a):
            return a.reshape((num_microbatches, mb) + a.shape[1:])

        x_mb = to_mb(x)
        consts_mb = jax.tree_util.tree_map(to_mb, tuple(mb_consts))
        out = run(stacked_layers, x_mb, consts_mb, tuple(shared_consts))
        return out.reshape((batch,) + out.shape[2:])

    return apply
