"""Shared backend guard for scripts that target the real device.

A dead TPU tunnel makes `jax.devices()` hang (or stall for minutes in
backend-init retries) rather than fail. Scripts call `ensure_backend`
first: it honors an explicit --device override (apply_device beats the
site hook's forced JAX_PLATFORMS) and, for device targets, probes backend
initialization in a SUBPROCESS with a timeout so the main process can exit
with a clear message instead of hanging.
"""

from __future__ import annotations

import os
import subprocess
import sys


def ensure_backend(device: str = "auto", probe_timeout: float = 120.0) -> None:
    """Force `device` if explicit (e.g. cpu), else verify the ambient
    backend actually initializes within `probe_timeout` seconds."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from beatheritage_tpu.parallel.mesh import apply_device

    apply_device(device)
    if device and device not in ("auto", "tpu"):
        return  # explicit host platform: nothing to probe

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True,
            timeout=probe_timeout if probe_timeout > 0 else None,
            env=os.environ.copy())
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"device backend did not initialize within {probe_timeout:.0f}s "
            "(tunnel down?). Pass --device cpu to run on host.") from None
    if probe.returncode != 0:
        tail = (probe.stderr or "")[-400:]
        raise SystemExit(
            "device backend failed to initialize (tunnel down?). Pass "
            f"--device cpu to run on host. Backend said:\n{tail}")
    platform = probe.stdout.strip().splitlines()[-1] if probe.stdout else "?"
    print(f"[backend] {platform} ready", flush=True)
