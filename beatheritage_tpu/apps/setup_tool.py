"""Environment setup and verification tool.

(reference: setup_beatheritage.py:26 BeatHeritageSetup — dependency check,
model download, verification, test-script generation.) Model downloads need
network; this verifies the local environment, builds the native library, and
checks checkpoints in place.
"""

from __future__ import annotations

import argparse
import importlib
import sys
from pathlib import Path

REQUIRED_MODULES = ["jax", "optax", "orbax.checkpoint", "numpy", "scipy", "yaml"]


class BeatHeritageSetup:
    def __init__(self, model_dir: str = "models"):
        self.model_dir = Path(model_dir)
        self.issues: list[str] = []

    def check_dependencies(self) -> bool:
        ok = True
        for mod in REQUIRED_MODULES:
            try:
                importlib.import_module(mod)
                print(f"  [ok] {mod}")
            except ImportError:
                print(f"  [MISSING] {mod}")
                self.issues.append(f"missing module {mod}")
                ok = False
        return ok

    def check_devices(self) -> bool:
        import jax  # noqa: PLC0415
        devices = jax.devices()
        print(f"  [ok] jax {jax.__version__}, devices: {devices}")
        return len(devices) > 0

    def build_native(self) -> bool:
        try:
            from ..native.build import build  # noqa: PLC0415
            path = build(verbose=False)
            print(f"  [ok] native audio library: {path}")
            return True
        except Exception as e:
            print(f"  [warn] native build failed ({e}); python fallback active")
            return False

    def verify_checkpoints(self) -> bool:
        if not self.model_dir.is_dir():
            print(f"  [warn] no model dir at {self.model_dir}; "
                  "inference will use random weights until you place a "
                  "checkpoint (params/ + tokenizer.json)")
            return False
        found = list(self.model_dir.glob("**/tokenizer.json"))
        for f in found:
            print(f"  [ok] checkpoint: {f.parent}")
        return bool(found)

    def smoke_test(self) -> bool:
        """Tiny end-to-end generation (setup_beatheritage.py:219)."""
        import numpy as np  # noqa: PLC0415
        import tempfile  # noqa: PLC0415
        from ..config import InferenceConfig, load_config  # noqa: PLC0415
        from ..data.audio import save_wav  # noqa: PLC0415
        from ..inference.pipeline import generate  # noqa: PLC0415

        args = load_config(InferenceConfig, "inference", "tiny",
                           overrides=["generate_positions=false"])
        with tempfile.TemporaryDirectory() as d:
            wav = Path(d) / "t.wav"
            sr = 16000
            save_wav(wav, 0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr), sr)
            _, path, _ = generate(args, audio_path=str(wav), output_path=d,
                                  verbose=False)
            ok = path is not None and Path(path).is_file()
        print(f"  [{'ok' if ok else 'FAIL'}] end-to-end smoke test")
        return ok

    def setup_all(self, smoke: bool = True) -> bool:
        print("Checking dependencies:")
        ok = self.check_dependencies()
        print("Checking devices:")
        ok &= self.check_devices()
        print("Building native library:")
        self.build_native()
        print("Verifying checkpoints:")
        self.verify_checkpoints()
        if smoke:
            print("Running smoke test:")
            ok &= self.smoke_test()
        print("Setup complete." if ok else f"Setup finished with issues: {self.issues}")
        return ok


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="beatheritage setup/verify")
    parser.add_argument("--model-dir", default="models")
    parser.add_argument("--no-smoke", action="store_true")
    ns = parser.parse_args(argv)
    ok = BeatHeritageSetup(ns.model_dir).setup_all(smoke=not ns.no_smoke)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
