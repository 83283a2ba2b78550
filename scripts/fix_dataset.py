"""Repair stale BeatmapFile names in an MMRS metadata.parquet.

(reference: fix_dataset.py:1 — for every metadata row whose BeatmapFile is
missing on disk, scan the mapset folder's .osu files for a matching
BeatmapID and rewrite the column.)

Usage:
    python scripts/fix_dataset.py /datasets/MMRS39389 [--dry-run]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def get_beatmap_id(osu_file: Path) -> int | None:
    try:
        with osu_file.open(encoding="utf-8", errors="ignore") as f:
            for line in f:
                if line.startswith("BeatmapID:"):
                    return int(line.split(":", 1)[1].strip())
    except (OSError, ValueError):
        pass
    return None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", type=Path)
    ap.add_argument("--dry-run", action="store_true",
                    help="report changes without writing the parquet")
    args = ap.parse_args()

    import pandas as pd

    metadata_path = args.dataset / "metadata.parquet"
    df = pd.read_parquet(metadata_path)

    changed = 0
    missing = 0
    for idx, row in df.iterrows():
        folder = args.dataset / "data" / str(row["BeatmapSetFolder"])
        if (folder / row["BeatmapFile"]).exists():
            continue
        for osu_file in folder.glob("*.osu"):
            if get_beatmap_id(osu_file) == row["Id"]:
                if row["BeatmapFile"] != osu_file.name:
                    print(f"row {idx} (Id={row['Id']}): "
                          f"{row['BeatmapFile']!r} -> {osu_file.name!r}")
                    df.at[idx, "BeatmapFile"] = osu_file.name
                    changed += 1
                break
        else:
            missing += 1
            print(f"warning: no .osu with Id {row['Id']} in {folder}")

    print(f"{changed} rows updated, {missing} unresolved")
    if changed and not args.dry_run:
        df.to_parquet(metadata_path)
        print(f"wrote {metadata_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
