"""Friendly excepthook (reference: excepthook.py, imported at
inference.py:1 / web-ui.py:1 / mai_mod_ui.py:1): the original traceback is
preserved and an actionable hint is appended for the stack's real failure
modes."""

import subprocess
import sys

import pytest


def _run(body: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c",
         "import beatheritage_tpu.apps.excepthook\n" + body],
        capture_output=True, text=True)
    assert r.returncode != 0
    return r.stderr


def test_module_not_found_hint():
    err = _run("raise ModuleNotFoundError(\"No module named 'wandb'\")")
    assert "Traceback" in err          # original traceback preserved
    assert "hint:" in err and "'wandb'" in err


def test_tpu_backend_hint():
    err = _run("raise RuntimeError(\"Unable to initialize backend 'axon'\")")
    assert "hint:" in err and "JAX_PLATFORMS=cpu" in err


def test_oom_hint():
    err = _run("raise RuntimeError('RESOURCE_EXHAUSTED: Out of memory "
               "allocating 12345 bytes')")
    assert "hint:" in err and "grad_acc" in err


def test_unrelated_errors_unchanged():
    err = _run("raise ValueError('plain error')")
    assert "hint:" not in err
