"""Transcribe the reference's versioned config zoo into our config tree.

The config surface is the public CLI API being matched (SURVEY.md §5
"Config/flag system": versioned snapshots v19..v31 + legacy/), so these
YAMLs are data, not code: every reference train/inference config is copied
with three mechanical adaptations for our loader
(beatheritage_tpu/config/loader.py):

1. `${context_type:x}` Hydra-resolver strings -> plain `x`
2. `${..a.b}` OmegaConf interpolations -> dropped (our schema defaults
   already equal the interpolation targets)
3. a citation header naming the source file

Run from the repo root:  python scripts/import_reference_configs.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REF = Path("/root/reference/configs")
OUT = Path(__file__).resolve().parent.parent / "beatheritage_tpu" / "configs"

CTX = re.compile(r"\$\{context_type:(\w+)\}")
INTERP_LINE = re.compile(r"^\s*[\w.]+:\s*['\"]?\$\{[^}]*\}")


def transcribe(text: str, source: str, legacy: bool = False) -> str:
    out_lines = [f"# Transcribed from the reference config (reference: {source});",
                 "# context_type resolver strings replaced with plain values."]
    for line in text.splitlines():
        if INTERP_LINE.match(line) and "context_type" not in line:
            # OmegaConf cross-interpolation; our schema default matches
            continue
        if legacy:
            # legacy defaults point at the old root train/inference configs;
            # map them onto the current group defaults
            if line.strip() == "- train":
                line = line.replace("- train", "- ../train@: default")
            elif line.strip() == "- inference":
                line = line.replace("- inference", "- ../inference@: default")
            elif line.strip().startswith("- osut5:"):
                # old group name for the train config subtree
                line = line.replace("- osut5:", "- ../legacy@train:")
        out_lines.append(CTX.sub(r"\1", line))
    return "\n".join(out_lines) + "\n"


def import_group(src_group: str, dest_group: str, names: list[str]) -> list[str]:
    done = []
    (OUT / dest_group).mkdir(parents=True, exist_ok=True)
    for name in names:
        src = REF / src_group / f"{name}.yaml"
        if not src.exists():
            print(f"  !! missing {src}", file=sys.stderr)
            continue
        dest = OUT / dest_group / f"{name}.yaml"
        dest.write_text(transcribe(src.read_text(),
                                   f"configs/{src_group}/{name}.yaml",
                                   legacy=src_group == "legacy"))
        done.append(name)
    return done


def main() -> int:
    versions = [f"v{i}" for i in range(19, 32) if i != 24]
    tiny = ([f"tiny_dist{i}" for i in range(2, 23)]
            + ["tiny_dist", "tiny_nodist"])

    skip_existing = {"default", "v30", "v31", "beatheritage_v1", "tiny"}

    train_names = [n for n in versions + tiny + ["base"]
                   if n not in skip_existing]
    inf_names = [n for n in versions + tiny + ["base"]
                 if n not in skip_existing]
    legacy = sorted(p.stem for p in (REF / "legacy").glob("*.yaml"))

    print("train:", import_group("train", "train", train_names))
    print("inference:", import_group("inference", "inference", inf_names))
    print("legacy:", import_group("legacy", "legacy", legacy))
    print("fid:", import_group("fid", "fid", ["beatheritage_v1"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
