"""Model-vs-model benchmark harness.

(reference: benchmark_comparison.py:32 BenchmarkRunner — runs
``inference.py -cn {beatheritage_v1,v30}`` over a test-audio suite via
subprocess, measures wall-clock + memory, scores the generated beatmaps
with spacing/flow heuristics, and writes JSON/CSV + a matplotlib report.)

TPU-repo differences: each run is still a fresh subprocess (cold-start
fidelity + crash isolation), but memory is the child's peak host RSS —
per-process accelerator HBM is not observable across processes the way
``torch.cuda.memory_allocated`` is (reference benchmark_comparison.py:117);
the quality metrics are computed through the repo's own parser
(``Beatmap.from_path``) with vectorized numpy instead of per-object
Python loops (reference ``_analyze_quality``, benchmark_comparison.py:125).

Usage:
    python scripts/benchmark_comparison.py \
        --configs synth_flagship tiny --audio song1.wav song2.wav \
        --difficulties 3.0 5.5 --out /tmp/benchmark_results
    # score already-generated beatmaps without running inference:
    python scripts/benchmark_comparison.py --analyze out_dir/*.osu
"""

from __future__ import annotations

import argparse
import csv
import json
import resource
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

QUALITY_KEYS = ("object_count", "avg_spacing", "spacing_variance",
                "pattern_diversity", "flow_score", "difficulty_consistency")


def analyze_quality(osu_path: Path | None) -> dict:
    """Reference quality heuristics (benchmark_comparison.py:125-228),
    vectorized: spacing mean/variance, distance-histogram entropy
    (pattern diversity), flow score from turn-angle variance, and
    chunked-variance difficulty consistency."""
    metrics = dict.fromkeys(QUALITY_KEYS, 0.0)
    if osu_path is None or not Path(osu_path).is_file():
        return metrics
    from beatheritage_tpu.osu.beatmap import Beatmap

    bm = Beatmap.from_path(osu_path)
    pts = np.asarray([(o.x, o.y) for o in bm.hit_objects()],
                     np.float64).reshape(-1, 2)
    metrics["object_count"] = float(len(pts))
    if len(pts) < 2:
        return metrics

    deltas = np.diff(pts, axis=0)
    dist = np.hypot(deltas[:, 0], deltas[:, 1])
    metrics["avg_spacing"] = float(dist.mean())
    metrics["spacing_variance"] = float(dist.var())

    hist, _ = np.histogram(dist, bins=10)
    p = hist / max(1, hist.sum())
    metrics["pattern_diversity"] = float(-np.sum(p * np.log(p + 1e-10)))

    if len(pts) > 2:
        headings = np.arctan2(deltas[:, 1], deltas[:, 0])
        turn = np.diff(headings)
        turn = np.abs((turn + np.pi) % (2 * np.pi) - np.pi)
        metrics["flow_score"] = float(1.0 / (1.0 + turn.var() / 100))

    chunk = max(10, len(dist) // 10)
    chunk_vars = [dist[i:i + chunk].var()
                  for i in range(0, len(dist), chunk) if len(dist[i:i + chunk])]
    if chunk_vars:
        metrics["difficulty_consistency"] = float(
            1.0 / (1.0 + np.var(chunk_vars)))
    return metrics


def _child_peak_rss_mb() -> float:
    """Peak RSS over all completed children (monotone high-water mark)."""
    return resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024.0


def run_inference(config: str, audio: str, out_dir: Path, gamemode: int,
                  difficulty: float, device: str | None,
                  extra: list[str]) -> dict:
    """One generation run of the repo CLI in a fresh subprocess
    (reference run_inference, benchmark_comparison.py:41-119)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    cmd = [sys.executable, "-m", "beatheritage_tpu.apps.cli", "-cn", config,
           f"audio_path={audio}", f"output_path={out_dir}",
           f"gamemode={gamemode}", f"difficulty={difficulty}", *extra]
    if device:
        cmd.append(f"device={device}")
    before = {p for p in out_dir.glob("*.osu")}
    rss_before = _child_peak_rss_mb()
    start = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    elapsed = time.perf_counter() - start
    produced = sorted(set(out_dir.glob("*.osu")) - before)
    result = {
        "model": config,
        "audio": Path(audio).name,
        "gamemode": gamemode,
        "difficulty": difficulty,
        "generation_time": round(elapsed, 3),
        "peak_child_rss_mb": round(max(0.0, _child_peak_rss_mb() - rss_before), 1),
        "success": proc.returncode == 0 and bool(produced),
        "output_files": len(produced),
        "quality_metrics": analyze_quality(produced[0] if produced else None),
    }
    if proc.returncode != 0:
        result["error"] = (proc.stdout + proc.stderr)[-2000:]
    return result


def save_results(results: list[dict], out_dir: Path, stamp: str) -> Path:
    """JSON + flat CSV (reference _save_results writes both shapes)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    json_path = out_dir / f"benchmark_results_{stamp}.json"
    json_path.write_text(json.dumps(results, indent=2))
    rows = [{**{k: v for k, v in r.items() if k != "quality_metrics"},
             **r.get("quality_metrics", {})} for r in results]
    if rows:
        fields = list(rows[0])
        with open(out_dir / f"benchmark_results_{stamp}.csv", "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
    return json_path


def generate_report(results: list[dict], out_dir: Path, stamp: str) -> Path | None:
    """Small-multiple boxplot report (reference generate_report,
    benchmark_comparison.py:269): one panel per measure, one axis each,
    fixed two-hue categorical palette, models labeled on the axis."""
    try:
        import matplotlib  # noqa: PLC0415
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError:
        return None
    ok = [r for r in results if r.get("success")]
    if not ok:
        return None
    models = sorted({r["model"] for r in ok})
    palette = ["#4269d0", "#efb118", "#3ca951", "#ff725c"]  # fixed order
    panels = [
        ("generation_time", "Generation time (s)", lambda r: r["generation_time"]),
        ("peak_child_rss_mb", "Peak child RSS (MB)", lambda r: r["peak_child_rss_mb"]),
        ("success", "Success rate", None),  # bar panel
        ("pattern_diversity", "Pattern diversity (entropy)",
         lambda r: r["quality_metrics"]["pattern_diversity"]),
        ("flow_score", "Flow score", lambda r: r["quality_metrics"]["flow_score"]),
        ("difficulty_consistency", "Difficulty consistency",
         lambda r: r["quality_metrics"]["difficulty_consistency"]),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    for ax, (key, title, getter) in zip(axes.flat, panels):
        if getter is None:
            rates = [float(np.mean([r["success"] for r in results
                                    if r["model"] == m])) for m in models]
            bars = ax.bar(models, rates,
                          color=[palette[i % len(palette)]
                                 for i in range(len(models))])
            ax.bar_label(bars, labels=[f"{v:.0%}" for v in rates], padding=2)
            ax.set_ylim(0, 1.05)
        else:
            data = [[getter(r) for r in ok if r["model"] == m] for m in models]
            box = ax.boxplot(data, tick_labels=models, patch_artist=True,
                             medianprops={"color": "#222222"})
            for patch, color in zip(box["boxes"], palette):
                patch.set_facecolor(color)
                patch.set_alpha(0.7)
        ax.set_title(title, fontsize=11)
        ax.spines[["top", "right"]].set_visible(False)
        ax.grid(axis="y", alpha=0.25)
    fig.suptitle("Model comparison", fontsize=13)
    fig.tight_layout()
    path = out_dir / f"benchmark_report_{stamp}.png"
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--configs", nargs="+", default=["synth_flagship"],
                    help="inference config names to compare")
    ap.add_argument("--audio", nargs="*", default=[],
                    help="audio files for the test suite")
    ap.add_argument("--gamemodes", nargs="*", type=int, default=[0])
    ap.add_argument("--difficulties", nargs="*", type=float, default=[5.5])
    ap.add_argument("--device", default=None,
                    help="device override passed to the CLI (e.g. cpu)")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra CLI overrides applied to every run")
    ap.add_argument("--out", default="benchmark_results")
    ap.add_argument("--analyze", nargs="*", default=[],
                    help="score existing .osu files instead of running inference")
    ns = ap.parse_args(argv)

    out_dir = Path(ns.out)
    stamp = time.strftime("%Y%m%d_%H%M%S")

    if ns.analyze:
        results = [{"model": "analyzed", "audio": Path(p).name,
                    "gamemode": -1, "difficulty": -1.0,
                    "generation_time": 0.0, "peak_child_rss_mb": 0.0,
                    "success": True, "output_files": 1,
                    "quality_metrics": analyze_quality(Path(p))}
                   for p in ns.analyze]
        path = save_results(results, out_dir, stamp)
        print(json.dumps(results, indent=2))
        print(f"saved {path}")
        return 0

    if not ns.audio:
        ap.error("--audio is required unless --analyze is used")
    results: list[dict] = []
    total = len(ns.audio) * len(ns.gamemodes) * len(ns.difficulties) \
        * len(ns.configs)
    done = 0
    for audio in ns.audio:
        for gm in ns.gamemodes:
            for diff in ns.difficulties:
                for config in ns.configs:
                    done += 1
                    print(f"[{done}/{total}] {config} on {Path(audio).name} "
                          f"(gm={gm}, diff={diff})", flush=True)
                    run_dir = out_dir / f"{config}_{Path(audio).stem}_{gm}_{diff}"
                    results.append(run_inference(
                        config, audio, run_dir, gm, diff, ns.device, ns.extra))
                    save_results(results, out_dir, stamp)  # incremental
    report = generate_report(results, out_dir, stamp)
    by_model = {m: [r for r in results if r["model"] == m]
                for m in {r["model"] for r in results}}
    for model, rs in sorted(by_model.items()):
        ok = [r for r in rs if r["success"]]
        t = np.mean([r["generation_time"] for r in ok]) if ok else float("nan")
        print(f"{model}: {len(ok)}/{len(rs)} ok, mean {t:.2f}s")
    if report:
        print(f"report: {report}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
