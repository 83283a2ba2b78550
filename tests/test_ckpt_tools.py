"""Tests for scripts/ckpt_tools.py (the reference's checkpoint/log dev
tooling: osu_diffusion/testing/print_ckpt.py + plot_loss.py equivalents)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import ckpt_tools  # noqa: E402


LOG = """\
step 25: loss=1.0373 mse=0.9344 vb=0.1030 (0.20 it/s)
step 50: loss=0.9247 mse=0.8940 vb=0.0306 (0.43 it/s)
not a step line
step 75: loss=0.9496 mse=0.9185 vb=0.0311 (0.37 it/s)
step 100: val_top1=0.1321 (best 0.1283)
step 125: loss=0.8552 mse=0.8218 vb=0.0334 (0.41 it/s)
"""


@pytest.fixture()
def log_file(tmp_path):
    p = tmp_path / "train.log"
    p.write_text(LOG)
    return str(p)


def test_parse_log_metric(log_file):
    steps, vals = ckpt_tools.parse_log(log_file, "loss")
    assert steps == [25, 50, 75, 125]
    assert vals == pytest.approx([1.0373, 0.9247, 0.9496, 0.8552])


def test_parse_log_sparse_val_metric(log_file):
    # val_* metrics only appear at eval steps — gaps are expected
    steps, vals = ckpt_tools.parse_log(log_file, "val_top1")
    assert steps == [100]
    assert vals == pytest.approx([0.1321])


def test_parse_log_missing_metric(log_file):
    steps, vals = ckpt_tools.parse_log(log_file, "nonexistent")
    assert steps == [] and vals == []


def test_flatten_counts_and_paths():
    tree = {"ema": {"w": np.zeros((2, 3), np.float32)},
            "params": {"w": np.zeros((2, 3), np.float32),
                       "b": np.ones((3,), np.float32)}}
    rows = list(ckpt_tools._flatten(tree))
    paths = {r[0] for r in rows}
    assert paths == {"ema.w", "params.w", "params.b"}
    assert sum(r[3] for r in rows) == 6 + 6 + 3


def test_diff_reports_structural_changes(monkeypatch, capsys):
    a = {"w": np.zeros((2, 3), np.float32), "old": np.zeros((1,), np.float32)}
    b = {"w": np.zeros((4, 3), np.float32), "new": np.zeros((1,), np.float32)}
    monkeypatch.setattr(ckpt_tools, "_load_tree",
                        lambda path: a if path == "A" else b)
    ns = type("NS", (), {"a": "A", "b": "B"})()
    assert ckpt_tools.cmd_diff(ns) == 0
    out = capsys.readouterr().out
    assert "- old" in out and "+ new" in out and "~ w" in out


def test_plot_loss_writes_png(log_file, tmp_path):
    out = tmp_path / "loss.png"
    ns = type("NS", (), {"logs": [log_file], "metric": "loss",
                         "smooth": 2, "out": str(out)})()
    assert ckpt_tools.cmd_plot_loss(ns) == 0
    assert out.exists() and out.stat().st_size > 0
