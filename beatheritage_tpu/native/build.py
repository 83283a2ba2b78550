"""Build the native audio library: python -m beatheritage_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True, out: Path | None = None) -> Path:
    src = Path(__file__).parent / "audio_native.cpp"
    out = Path(out) if out is not None else Path(__file__).parent / "libbhaudio.so"
    # Portable baseline for distributed wheels; override for a local tuned
    # build with BH_NATIVE_MARCH=native.
    march = os.environ.get("BH_NATIVE_MARCH", "x86-64-v2")
    cmd = ["g++", "-O3", f"-march={march}", "-shared", "-fPIC",
           "-std=c++17", str(src), "-o", str(out)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    sys.exit(0)
