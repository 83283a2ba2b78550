"""Pure-Python osu! domain library (no jax/torch dependencies).

Replaces the reference's external `slider` dependency plus its in-repo
geometry (osuT5/osuT5/inference/slider_path.py, path_approximator.py,
timing_points_change.py).
"""

from .beatmap import (
    Beatmap,
    Circle,
    HitObject,
    HoldNote,
    Slider,
    Spinner,
    TimingPoint,
    format_osu_float,
)
from .geometry import (
    SliderPath,
    flatten_arc,
    flatten_bezier,
    flatten_catmull,
    flatten_linear,
)
from .timing import TimingPointsChange, apply_timing_changes, sort_timing_points

__all__ = [
    "Beatmap", "Circle", "HitObject", "HoldNote", "Slider", "Spinner",
    "TimingPoint", "format_osu_float", "SliderPath", "flatten_arc",
    "flatten_bezier", "flatten_catmull", "flatten_linear",
    "TimingPointsChange", "apply_timing_changes", "sort_timing_points",
]
