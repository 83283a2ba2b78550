"""Device mesh and sharding helpers."""

from .mesh import build_mesh, batch_sharding, replicated

__all__ = ["build_mesh", "batch_sharding", "replicated"]
