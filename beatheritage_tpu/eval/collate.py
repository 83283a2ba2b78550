"""Collate evaluation results into a color-coded HTML comparison table.

(reference: collate_results.py:37) Consumes JSON result files produced by
the FID harness / benchmark runner and renders one row per run with
green-to-red shading per metric column.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

HIGHER_IS_BETTER = {"rhythm_active_f1", "rhythm_passive_f1",
                    "rhythm_active_precision", "rhythm_active_recall",
                    "rhythm_passive_precision", "rhythm_passive_recall",
                    "flow_score", "pattern_diversity", "accuracy"}
LOWER_IS_BETTER = {"fid", "wall_time_s", "mean_wall_time_s"}


def _shade(value: float, lo: float, hi: float, invert: bool) -> str:
    if hi <= lo:
        frac = 0.5
    else:
        frac = (value - lo) / (hi - lo)
    if invert:
        frac = 1 - frac
    r = int(255 * (1 - frac) * 0.8 + 40)
    g = int(255 * frac * 0.8 + 40)
    return f"background-color: rgb({r},{g},60)"


def collate(result_files: list[str]) -> str:
    rows = []
    for file in result_files:
        data = json.loads(Path(file).read_text())
        if isinstance(data, list):
            for entry in data:
                flat = dict(entry)
                flat.update(flat.pop("quality", {}))
                flat["name"] = f"{entry.get('config_name', file)}"
                rows.append(flat)
        else:
            data["name"] = Path(file).stem
            rows.append(data)
    if not rows:
        return "<html><body>No results.</body></html>"

    metrics = sorted({k for row in rows for k, v in row.items()
                      if isinstance(v, (int, float)) and k != "name"})
    ranges = {}
    for m in metrics:
        values = [row[m] for row in rows if isinstance(row.get(m), (int, float))]
        ranges[m] = (min(values), max(values))

    out = ["<html><head><style>table{border-collapse:collapse}"
           "td,th{border:1px solid #444;padding:4px 8px;font-family:monospace}"
           "</style></head><body><table><tr><th>run</th>"]
    out.extend(f"<th>{m}</th>" for m in metrics)
    out.append("</tr>")
    for row in rows:
        out.append(f"<tr><td>{row.get('name', '?')}</td>")
        for m in metrics:
            v = row.get(m)
            if isinstance(v, (int, float)):
                invert = m in LOWER_IS_BETTER
                style = _shade(v, *ranges[m], invert)
                out.append(f'<td style="{style}">{v:.4g}</td>')
            else:
                out.append("<td>-</td>")
        out.append("</tr>")
    out.append("</table></body></html>")
    return "".join(out)


def main(argv=None) -> int:
    files = argv if argv is not None else sys.argv[1:]
    if not files:
        print("usage: python -m beatheritage_tpu.eval.collate result1.json ...")
        return 2
    html = collate(files)
    out = Path("collated_results.html")
    out.write_text(html)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
