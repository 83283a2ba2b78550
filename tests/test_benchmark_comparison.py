"""Model-vs-model benchmark harness (scripts/benchmark_comparison.py,
reference benchmark_comparison.py BenchmarkRunner): quality heuristics on
a real parsed beatmap, JSON/CSV collation, report rendering, and the
--analyze entry path."""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import benchmark_comparison as bc  # noqa: E402

REF_MAP = Path("/root/reference/osu_diffusion/testing/toy_datasets/"
               "kimi_no_bouken.osu")


def test_analyze_quality_on_real_map():
    m = bc.analyze_quality(REF_MAP)
    assert m["object_count"] == 395
    assert 0 < m["avg_spacing"] < 600
    assert m["spacing_variance"] > 0
    # 10-bin histogram entropy is bounded by log(10)
    assert 0 < m["pattern_diversity"] <= np.log(10) + 1e-9
    assert 0 < m["flow_score"] <= 1
    assert 0 < m["difficulty_consistency"] <= 1


def test_analyze_quality_missing_and_degenerate(tmp_path):
    assert bc.analyze_quality(None)["object_count"] == 0
    assert bc.analyze_quality(tmp_path / "nope.osu")["object_count"] == 0
    one = tmp_path / "one.osu"
    one.write_text("osu file format v14\n\n[HitObjects]\n256,192,1000,1,0\n")
    m = bc.analyze_quality(one)
    assert m["object_count"] == 1
    assert m["avg_spacing"] == 0  # no pairs -> all spacing stats stay zero


def _fake_results():
    rng = np.random.default_rng(0)
    out = []
    for model in ("a", "b"):
        for i in range(4):
            out.append({
                "model": model, "audio": f"s{i}.wav", "gamemode": 0,
                "difficulty": 5.5, "generation_time": float(2 + rng.random()),
                "peak_child_rss_mb": 100.0, "success": i != 3 or model == "a",
                "output_files": 1,
                "quality_metrics": {k: float(rng.random())
                                    for k in bc.QUALITY_KEYS},
            })
    return out


def test_save_results_json_and_csv(tmp_path):
    results = _fake_results()
    path = bc.save_results(results, tmp_path, "stamp")
    assert json.loads(path.read_text()) == results
    with open(tmp_path / "benchmark_results_stamp.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(results)
    # quality metrics are flattened into CSV columns
    assert set(bc.QUALITY_KEYS) <= set(rows[0])
    assert rows[0]["model"] == "a"


def test_generate_report_renders_png(tmp_path):
    pytest.importorskip("matplotlib")
    path = bc.generate_report(_fake_results(), tmp_path, "stamp")
    assert path is not None and path.stat().st_size > 10_000


def test_generate_report_empty_results(tmp_path):
    assert bc.generate_report([], tmp_path, "s") is None
    assert bc.generate_report(
        [{"model": "a", "success": False}], tmp_path, "s") is None


def test_analyze_cli_entry(tmp_path, capsys):
    rc = bc.main(["--analyze", str(REF_MAP), "--out", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"object_count": 395.0' in out
    assert list(tmp_path.glob("benchmark_results_*.json"))
