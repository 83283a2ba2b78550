#!/usr/bin/env python
"""Rehydrate scratch checkpoints from the durable artifacts/ mirrors.

VM restarts wipe /tmp; the repo's artifacts/ directory holds the durable
git-committed mirrors (scripts/mirror_durable.sh). Read paths already fall
back to the mirrors automatically (train/checkpoints.py resolve_ckpt_dir),
but a trainer RESUMING into scratch (e.g. flagship continuation from
state_N) needs a writable copy in the expected /tmp location. This script
copies every mirror to /tmp/<name>, and for state-only mirrors also
materializes the top-level params/ dir so params-only loaders find it.

Usage: python scripts/restore_artifacts.py [--dest /tmp] [--params-only]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="/tmp", help="scratch root")
    ap.add_argument("--params-only", action="store_true",
                    help="skip state_N dirs (restore-for-inference only)")
    args = ap.parse_args()

    artifacts = REPO / "artifacts"
    if not artifacts.is_dir():
        print("no artifacts/ directory; nothing to restore")
        return 0
    dest_root = Path(args.dest)
    for mirror in sorted(p for p in artifacts.iterdir() if p.is_dir()):
        dest = dest_root / mirror.name
        if dest.exists():
            # backfill state_N dirs a params-only restore left out (a
            # trainer resuming from scratch-without-state would silently
            # restart from step 0)
            if not args.params_only:
                for state in sorted(mirror.glob("state_*")):
                    if not (dest / state.name).exists():
                        shutil.copytree(state, dest / state.name)
                        print(f"backfilled {dest / state.name}")
            print(f"skip {dest} (exists)")
        else:
            ignore = (shutil.ignore_patterns("state_*")
                      if args.params_only else None)
            shutil.copytree(mirror, dest, ignore=ignore)
            print(f"restored {mirror.name} -> {dest}")
        if not (dest / "params").exists():
            # state-only mirror: materialize params/ for params-only loaders
            # (restore from the MIRROR — under --params-only the copy has
            # no state_N dirs). Runs for pre-existing dests too: a prior run
            # interrupted between copytree and this step must not leave the
            # dest permanently params-less.
            import os  # noqa: PLC0415
            os.environ.setdefault("JAX_PLATFORMS", "cpu")
            from beatheritage_tpu.train.checkpoints import (  # noqa: PLC0415
                restore_params, save_params)
            params = restore_params(mirror)
            save_params(dest, params)
            print(f"  materialized {dest}/params from the mirror's state_N")
    return 0


if __name__ == "__main__":
    sys.exit(main())
