"""Evaluation: FID over classifier features, rhythm precision/recall, benchmarks."""

from .fid import frechet_distance, feature_statistics
from .rhythm import (
    calculate_f1,
    calculate_precision,
    calculate_recall,
    get_rhythm,
    rhythm_stats,
)

__all__ = [
    "frechet_distance", "feature_statistics", "calculate_f1",
    "calculate_precision", "calculate_recall", "get_rhythm", "rhythm_stats",
]
