"""Rhythm precision/recall/F1 between real and generated beatmaps.

(reference: calc_fid.py:123-171) Active rhythm = circle/slider-head/hold
starts; passive rhythm additionally includes slider repeats/tails and
spinner ends. Matching uses a 10 ms leniency, vectorized here.
"""

from __future__ import annotations

import numpy as np

from ..osu.beatmap import Beatmap, Circle, HoldNote, Slider, Spinner

LENIENCY_MS = 10


def get_rhythm(beatmap: Beatmap, passive: bool = False) -> set[int]:
    rhythm: set[int] = set()
    for ho in beatmap.hit_objects():
        if isinstance(ho, Circle):
            rhythm.add(int(ho.time + 1e-5))
        elif isinstance(ho, Slider):
            rhythm.add(int(ho.time + 1e-5))
            if passive and ho.repeat > 0:
                span = ho.duration / ho.repeat
                for i in range(ho.repeat):
                    rhythm.add(int(ho.time + span * (i + 1) + 1e-5))
        elif isinstance(ho, Spinner):
            if passive:
                rhythm.add(int(ho.end_time + 1e-5))
        elif isinstance(ho, HoldNote):
            rhythm.add(int(ho.time + 1e-5))
    return rhythm


def rhythm_stats(real_rhythm, generated_rhythm,
                 leniency: int = LENIENCY_MS) -> dict:
    """Counts of matches within `leniency` ms (vectorized over both sets)."""
    real = np.asarray(sorted(real_rhythm), dtype=np.int64)
    gen = np.asarray(sorted(generated_rhythm), dtype=np.int64)
    if len(real) == 0 or len(gen) == 0:
        return {"true_positives": 0, "false_positives": len(gen),
                "false_negatives": len(real)}
    idx = np.searchsorted(gen, real)
    left = np.clip(idx - 1, 0, len(gen) - 1)
    right = np.clip(idx, 0, len(gen) - 1)
    nearest = np.minimum(np.abs(real - gen[left]), np.abs(real - gen[right]))
    tp = int(np.sum(nearest <= leniency))
    fn = len(real) - tp

    idx2 = np.searchsorted(real, gen)
    left2 = np.clip(idx2 - 1, 0, len(real) - 1)
    right2 = np.clip(idx2, 0, len(real) - 1)
    nearest2 = np.minimum(np.abs(gen - real[left2]), np.abs(gen - real[right2]))
    fp = int(np.sum(nearest2 > leniency))
    return {"true_positives": tp, "false_positives": fp, "false_negatives": fn}


def merge_stats(a: dict, b: dict) -> dict:
    return {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}


def calculate_precision(stats: dict) -> float:
    tp, fp = stats["true_positives"], stats["false_positives"]
    return tp / (tp + fp) if tp + fp else 0.0


def calculate_recall(stats: dict) -> float:
    tp, fn = stats["true_positives"], stats["false_negatives"]
    return tp / (tp + fn) if tp + fn else 0.0


def calculate_f1(stats: dict) -> float:
    p, r = calculate_precision(stats), calculate_recall(stats)
    return 2 * p * r / (p + r) if p + r else 0.0
