"""Shared `device=` override handling for app entry points.

Must run BEFORE anything initializes the JAX backend: a site hook can
re-assert a forced JAX_PLATFORMS after import, so only
parallel.mesh.apply_device (which also updates jax.config) reliably pins
the platform. Without this, `device=cpu` apps silently dial the TPU
backend — and hang when the tunnel is down (reference: inference.py:31
prepare_args device auto-select)."""

from __future__ import annotations


def apply_device_override(overrides: list[str]) -> None:
    for o in overrides:
        if o.startswith("device="):
            device = o.split("=", 1)[1].lower()
            if device in ("cpu", "tpu"):
                from ..parallel.mesh import apply_device  # noqa: PLC0415
                apply_device(device)
            break
