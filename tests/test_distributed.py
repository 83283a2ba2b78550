"""Multi-host bootstrap helpers (single-process paths + virtual mesh)."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from beatheritage_tpu.parallel import (
    build_mesh,
    initialize_distributed,
    shard_host_batch,
)


def test_initialize_distributed_single_process_noop(monkeypatch):
    # no coordinator configured and no pod metadata -> no init, just topology
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    topo = initialize_distributed()
    assert topo.process_count == 1
    assert topo.is_primary
    assert topo.local_devices == topo.global_devices == jax.device_count()


def test_shard_host_batch_builds_global_arrays():
    mesh = build_mesh(data=8, model=1)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2),
             "y": np.ones((16,), np.int32)}
    global_batch = shard_host_batch(batch, mesh)
    assert global_batch["x"].shape == (16, 2)
    assert global_batch["x"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(global_batch["x"]), batch["x"])


def test_shard_host_batch_custom_spec():
    mesh = build_mesh(data=8, model=1)
    x = np.zeros((4, 8), np.float32)
    out = shard_host_batch({"x": x}, mesh, spec=P(None, "data"))
    assert out["x"].sharding.spec == P(None, "data")
