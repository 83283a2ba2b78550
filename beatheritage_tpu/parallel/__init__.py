"""Device mesh, multi-host bootstrap, and sharding helpers."""

from .distributed import HostTopology, initialize_distributed, shard_host_batch
from .mesh import batch_sharding, build_mesh, replicated
from .pipeline import pipeline_apply, pipelined

__all__ = ["build_mesh", "batch_sharding", "replicated",
           "HostTopology", "initialize_distributed", "shard_host_batch",
           "pipeline_apply", "pipelined"]
