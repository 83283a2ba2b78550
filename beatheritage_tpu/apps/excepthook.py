"""Friendly excepthook for the app entry points.

Reference parity: excepthook.py (imported by inference.py:1, web-ui.py:1,
mai_mod_ui.py:1) appends a pip hint to ModuleNotFoundError. The TPU-native
version hints at the failure modes THIS stack actually hits instead:
missing optional module, the TPU tunnel backend being unreachable, and
XLA out-of-memory — after printing the original traceback unchanged.
"""

from __future__ import annotations

import sys

_original_excepthook = sys.excepthook


def _hint_for(exc_type, exc_value) -> str | None:
    text = str(exc_value)
    if issubclass(exc_type, ModuleNotFoundError):
        missing = text.split("'")[-2] if "'" in text else text
        return (f"The module '{missing}' was not found. Core dependencies "
                "are jax/flax/optax/orbax (baked into the image); optional "
                "features degrade gracefully — install the module or rerun "
                "with the feature disabled.")
    if "Unable to initialize backend" in text or "Backend 'axon'" in text:
        return ("The TPU backend could not initialize (tunnel relay down?). "
                "Rerun with device=cpu (apps) or JAX_PLATFORMS=cpu + "
                "jax.config.update('jax_platforms','cpu') to use the host, "
                "or wait for the relay and retry.")
    if "RESOURCE_EXHAUSTED" in text or "Out of memory" in text.lower():
        return ("XLA ran out of device memory. Lower the batch size or "
                "sequence length, enable remat (train.remat=true), or use "
                "grad accumulation (optim.grad_acc).")
    return None


def _excepthook(exc_type, exc_value, exc_traceback):
    _original_excepthook(exc_type, exc_value, exc_traceback)
    hint = _hint_for(exc_type, exc_value)
    if hint:
        print(f"\nhint: {hint}", file=sys.stderr)


def install() -> None:
    sys.excepthook = _excepthook


install()
