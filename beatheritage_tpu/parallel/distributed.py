"""Multi-host (multi-process) bootstrap for TPU pods and CPU test rigs.

TPU-native replacement for the reference's torchrun/Accelerate process-group
setup (reference: osuT5/train.py:33-43 setup_accelerator + NCCL env wiring):
on TPU pods, `jax.distributed.initialize()` auto-discovers coordinator and
process indices from the TPU metadata environment; elsewhere the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables (or
explicit arguments) drive the GRPC coordination service over DCN. Collectives
inside the mesh then ride ICI within a slice and DCN across slices, planned
entirely by XLA — no NCCL/MPI equivalent is needed.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax

_INITIALIZED = False


@dataclass(frozen=True)
class HostTopology:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int

    @property
    def is_primary(self) -> bool:
        """True on the process that should write checkpoints/logs
        (the reference gates on accelerator.is_main_process)."""
        return self.process_index == 0


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           verbose: bool = False) -> HostTopology:
    """Idempotent multi-process bootstrap; call once at entrypoint start,
    BEFORE any other JAX call touches the backend.

    Single-process runs (no coordinator configured, no pod metadata) skip
    initialization entirely — jax.distributed.initialize is only required
    when several processes must agree on a global device set.
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # only a *multi-host* pod needs the coordination service; a single-entry
    # TPU_WORKER_HOSTNAMES (e.g. a lone chip behind a tunnel) does not
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = (len([h for h in hostnames.split(",") if h]) > 1
              or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ)
    want_init = coordinator_address is not None or on_pod
    if want_init and not _INITIALIZED:
        try:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
            _INITIALIZED = True
        except ValueError as e:
            # pod metadata present but incomplete: run single-process
            print(f"[distributed] skipping multi-host init: {e}")

    topo = HostTopology(process_index=jax.process_index(),
                        process_count=jax.process_count(),
                        local_devices=jax.local_device_count(),
                        global_devices=jax.device_count())
    if verbose:
        print(f"[distributed] process {topo.process_index}/"
              f"{topo.process_count}, {topo.local_devices} local / "
              f"{topo.global_devices} global devices")
    return topo


def shard_host_batch(batch, mesh, spec=None):
    """Turn per-host numpy batches into one globally-sharded jax.Array.

    Each process feeds only its local slice (the data loader shards files by
    process_index); jax.make_array_from_process_local_data assembles the
    logical global array without gathering to any single host — the
    multi-host analogue of device_put(batch, batch_sharding).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: PLC0415
    sharding = NamedSharding(mesh, spec if spec is not None else P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
