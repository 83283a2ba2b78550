"""Benchmark runner: wall-time, memory, and beatmap quality heuristics.

(reference: benchmark_comparison.py:32 BenchmarkRunner, :125 _analyze_quality)
Runs the in-process pipeline (no subprocess round-trip needed — the model
stays warm between runs) over a test-audio suite, measuring generation
wall-clock plus spacing/diversity/flow heuristics, and writes JSON results.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional

import numpy as np

from ..osu.beatmap import Beatmap


def analyze_quality(osu_path) -> dict:
    """Spacing/diversity/flow heuristics over a generated .osu file."""
    metrics = {
        "object_count": 0, "avg_spacing": 0.0, "spacing_variance": 0.0,
        "pattern_diversity": 0.0, "flow_score": 0.0,
        "difficulty_consistency": 0.0,
    }
    path = Path(osu_path) if osu_path else None
    if path is None or not path.exists():
        return metrics
    bm = Beatmap.from_path(path)
    positions = np.array([[ho.x, ho.y] for ho in bm.hit_objects()], dtype=float)
    metrics["object_count"] = len(positions)
    if len(positions) < 2:
        return metrics

    deltas = np.diff(positions, axis=0)
    distances = np.linalg.norm(deltas, axis=1)
    metrics["avg_spacing"] = float(distances.mean())
    metrics["spacing_variance"] = float(distances.var())

    hist, _ = np.histogram(distances, bins=10)
    hist = hist / max(hist.sum(), 1)
    metrics["pattern_diversity"] = float(-np.sum(hist * np.log(hist + 1e-10)))

    if len(positions) > 2:
        headings = np.arctan2(deltas[:, 1], deltas[:, 0])
        turns = np.diff(headings)
        turns = np.abs((turns + np.pi) % (2 * np.pi) - np.pi)
        metrics["flow_score"] = float(1.0 / (1.0 + np.var(turns) / 100))

    chunk = max(10, len(distances) // 10)
    chunk_vars = [np.var(distances[i:i + chunk])
                  for i in range(0, len(distances), chunk)
                  if len(distances[i:i + chunk]) > 0]
    if chunk_vars:
        metrics["difficulty_consistency"] = float(1.0 / (1.0 + np.var(chunk_vars)))
    return metrics


@dataclasses.dataclass
class BenchmarkResult:
    config_name: str
    audio_path: str
    wall_time_s: float
    osu_path: Optional[str]
    quality: dict
    error: Optional[str] = None


class BenchmarkRunner:
    """Compare inference configs over a test-audio suite."""

    def __init__(self, output_dir="benchmark_results"):
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.results: list[BenchmarkResult] = []

    def run_single(self, config_name: str, audio_path: str,
                   overrides: Optional[list[str]] = None,
                   verbose: bool = False) -> BenchmarkResult:
        from ..config import InferenceConfig, load_config  # noqa: PLC0415
        from ..inference.pipeline import generate  # noqa: PLC0415

        args = load_config(InferenceConfig, "inference", config_name,
                           overrides=list(overrides or []))
        t0 = time.perf_counter()
        try:
            _, osu_path, _ = generate(args, audio_path=audio_path,
                                      output_path=str(self.output_dir),
                                      verbose=verbose)
            elapsed = time.perf_counter() - t0
            result = BenchmarkResult(config_name, audio_path, elapsed,
                                     osu_path, analyze_quality(osu_path))
        except Exception as e:  # record failures, keep the suite going
            result = BenchmarkResult(config_name, audio_path,
                                     time.perf_counter() - t0, None, {}, str(e))
        self.results.append(result)
        return result

    def run_suite(self, config_names: list[str], audio_files: list[str],
                  overrides: Optional[list[str]] = None) -> list[BenchmarkResult]:
        for config_name in config_names:
            for audio in audio_files:
                self.run_single(config_name, audio, overrides)
        return self.results

    def write_report(self) -> str:
        path = self.output_dir / "benchmark_results.json"
        with open(path, "w") as f:
            json.dump([dataclasses.asdict(r) for r in self.results], f, indent=2)
        return str(path)

    def summary(self) -> dict:
        by_config: dict[str, list[BenchmarkResult]] = {}
        for r in self.results:
            by_config.setdefault(r.config_name, []).append(r)
        out = {}
        for name, rs in by_config.items():
            ok = [r for r in rs if r.error is None]
            out[name] = {
                "runs": len(rs),
                "failures": len(rs) - len(ok),
                "mean_wall_time_s": float(np.mean([r.wall_time_s for r in ok])) if ok else None,
                "mean_object_count": float(np.mean([r.quality.get("object_count", 0) for r in ok])) if ok else None,
            }
        return out
