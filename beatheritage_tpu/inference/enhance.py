"""BeatHeritage V1 enhancement layer: quality control, flow optimization,
pattern variety, difficulty scaling, style preservation.

(reference: beatheritage_postprocessor.py:1-474 — FlowOptimizer,
PatternEnhancer, QualityController, BeatHeritagePostprocessor. NOTE: that
layer is DEAD CODE in the reference: declared in config.py:45 and
configs/inference/beatheritage_v1.yaml:58 but never imported by
inference.py. Here the same surface is implemented and actually wired into
the pipeline behind the `quality_control` / `advanced_features` config
sections, so the config keys the reference ships have a live reader.)

All passes operate on the parsed `Beatmap` (osu/beatmap.py) after the
model + diffusion refiner have produced final positions, and preserve
everything except the adjusted coordinates. Std mode only: the passes move
circles and translate whole sliders; spinners and mania/taiko objects are
never touched. Every pass is deterministic (seeded rng), unlike the
reference's unseeded `np.random.choice`.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..config.schema import InferenceConfig
from ..osu.beatmap import Beatmap, Circle, Slider

PLAYFIELD = (512.0, 384.0)


def _circle_radius(cs: float) -> float:
    """osu!std circle radius in osu!pixels for a circle size."""
    return 54.4 - 4.48 * cs


def _clamp(x: float, y: float) -> tuple[float, float]:
    return (min(max(x, 0.0), PLAYFIELD[0]), min(max(y, 0.0), PLAYFIELD[1]))


def _movable(obj) -> bool:
    return isinstance(obj, (Circle, Slider))


def _move_to(obj, x: float, y: float) -> None:
    """Move a hit object's head to (x, y); sliders translate rigidly so the
    curve shape and pixel length survive."""
    x, y = _clamp(x, y)
    dx, dy = x - obj.x, y - obj.y
    obj.x, obj.y = x, y
    if isinstance(obj, Slider):
        obj.curve_points = [(px + dx, py + dy) for px, py in obj.curve_points]


class MapEnhancer:
    """Config-gated position passes over a generated std beatmap.

    Pass order matches the reference postprocess() chain
    (beatheritage_postprocessor.py:100-121): spacing -> overlaps -> flow ->
    pattern variety -> difficulty scaling -> style preservation.
    """

    def __init__(self, args: InferenceConfig, seed: int = 0):
        self.qc = args.quality_control
        self.adv = args.advanced_features
        self.target_difficulty = args.difficulty
        self.rng = np.random.default_rng(args.seed if args.seed is not None
                                         else seed)

    @property
    def enabled(self) -> bool:
        return (self.qc.enable_auto_correction
                or self.qc.enable_flow_optimization
                or self.adv.enable_pattern_variety
                or self.adv.enable_difficulty_scaling
                or self.adv.enable_style_preservation)

    def enhance_osu(self, osu_text: str) -> str:
        """Full pipeline entry: .osu text in, enhanced .osu text out."""
        if not self.enabled:
            return osu_text
        bm = Beatmap.from_string(osu_text)
        if bm.mode != 0:
            return osu_text
        self.enhance(bm)
        return bm.to_osu()

    def enhance(self, bm: Beatmap) -> Beatmap:
        objs = list(bm.hit_objects())
        radius = _circle_radius(bm.circle_size if bm.circle_size is not None
                                else 4.0)
        if self.qc.enable_auto_correction:
            self._fix_spacing(objs)
            self._fix_overlaps(objs, radius)
        if self.qc.enable_flow_optimization:
            self._optimize_flow(objs)
        if self.adv.enable_pattern_variety:
            self._enhance_patterns(objs)
        if self.adv.enable_difficulty_scaling and self.target_difficulty:
            self._scale_difficulty(objs, bm)
        if self.adv.enable_style_preservation:
            self._preserve_style(objs)
        return bm

    # -- quality control (reference QualityController:360-474) ----------------

    def _fix_spacing(self, objs) -> None:
        """Push successive objects apart to the configured minimum distance
        (reference fix_spacing_issues:366)."""
        min_d = float(self.qc.min_distance_threshold)
        for prev, cur in zip(objs, objs[1:]):
            if not (_movable(prev) and _movable(cur)):
                continue
            dx, dy = cur.x - prev.x, cur.y - prev.y
            d = math.hypot(dx, dy)
            if 1e-6 < d < min_d:
                _move_to(cur, prev.x + dx / d * min_d, prev.y + dy / d * min_d)
            elif d <= 1e-6 and min_d > 0 and cur.time != prev.time:
                _move_to(cur, prev.x + min_d, prev.y)

    def _fix_overlaps(self, objs, radius: float) -> None:
        """Separate object pairs whose stack overlap exceeds the allowed
        ratio, scanning a 10-object horizon like the reference
        (fix_overlaps:395). Deliberate stacks (same position, close in time)
        are an osu idiom and stay."""
        max_overlap = float(self.qc.max_overlap_ratio)
        for i, a in enumerate(objs):
            if not _movable(a):
                continue
            for b in objs[i + 1:i + 10]:
                if not _movable(b):
                    continue
                d = math.hypot(b.x - a.x, b.y - a.y)
                if d <= 1e-6:
                    continue  # exact stack: intentional
                overlap = max(0.0, 2 * radius - d) / (2 * radius)
                if overlap > max_overlap:
                    safe = 2 * radius * (1 - max_overlap)
                    _move_to(b, a.x + (b.x - a.x) / d * safe,
                             a.y + (b.y - a.y) / d * safe)

    # -- flow (reference FlowOptimizer:207-264) -------------------------------

    def _optimize_flow(self, objs) -> None:
        """Smooth turns sharper than 120 deg toward a 90 deg turn, keeping
        the jump distance (reference optimize_flow:213)."""
        for p0, p1, p2 in zip(objs, objs[1:], objs[2:]):
            if not (_movable(p1) and _movable(p2)):
                continue
            a_prev = math.atan2(p1.y - p0.y, p1.x - p0.x)
            a_cur = math.atan2(p2.y - p1.y, p2.x - p1.x)
            diff = math.degrees(a_cur - a_prev)
            diff = (diff + 180.0) % 360.0 - 180.0
            if abs(diff) > 120.0:
                d = math.hypot(p2.x - p1.x, p2.y - p1.y)
                smoothed = a_prev + math.copysign(math.pi / 2, diff)
                _move_to(p2, p1.x + d * math.cos(smoothed),
                         p1.y + d * math.sin(smoothed))

    # -- pattern variety (reference PatternEnhancer:267-356) ------------------

    _PATTERNS = (
        ("triangle", ((0, 0), (100, 0), (50, 86.6))),
        ("square", ((0, 0), (100, 0), (100, 100), (0, 100))),
        ("hexagon", ((50, 0), (93, 25), (93, 75), (50, 100), (7, 75),
                     (7, 25))),
    )

    def _enhance_patterns(self, objs) -> None:
        """Replace the second half of an 8+8 repeated position window with a
        library pattern centered on the section's centroid (reference
        enhance_patterns:273; centering on the centroid instead of a fixed
        off-screen translate — the reference's center+scale pushes objects to
        x in [256, 456], a bug we do not reproduce)."""
        window = 8
        movable = [o for o in objs if _movable(o)]
        i = 0
        while i + 2 * window <= len(movable):
            first = movable[i:i + window]
            second = movable[i + window:i + 2 * window]
            dists = [math.hypot(a.x - b.x, a.y - b.y)
                     for a, b in zip(first, second)]
            if np.mean(dists) < 50.0:
                name, pat = self._PATTERNS[
                    int(self.rng.integers(len(self._PATTERNS)))]
                cx = float(np.mean([o.x for o in second]))
                cy = float(np.mean([o.y for o in second]))
                px = float(np.mean([p[0] for p in pat]))
                py = float(np.mean([p[1] for p in pat]))
                for j, obj in enumerate(second):
                    bx, by = pat[j % len(pat)]
                    _move_to(obj, cx + (bx - px), cy + (by - py))
                i += 2 * window  # don't immediately re-trigger on the edit
            else:
                i += 1

    # -- difficulty scaling (reference _scale_difficulty:143) -----------------

    def _estimate_difficulty(self, objs, bm: Beatmap) -> float:
        spacings = [math.hypot(b.x - a.x, b.y - a.y)
                    for a, b in zip(objs, objs[1:])
                    if _movable(a) and _movable(b)]
        avg_spacing = float(np.mean(spacings)) if spacings else 100.0
        bpm = 180.0
        reds = [tp for tp in bm.timing_points if tp.uninherited]
        if reds:
            bpm = 60000.0 / reds[0].ms_per_beat
        est = (len(objs) / 100.0) * (avg_spacing / 50.0) * (bpm / 180.0)
        return min(max(est, 0.0), 10.0)

    def _scale_difficulty(self, objs, bm: Beatmap) -> None:
        """Scale jump spacing toward the requested star target using the
        reference's coarse objects*spacing*bpm estimate (:143-160)."""
        current = self._estimate_difficulty(objs, bm)
        scale = float(self.target_difficulty) / max(current, 0.1)
        scale = min(max(scale, 0.5), 2.0)  # keep the map recognizable
        if abs(scale - 1.0) < 0.05:
            return
        for prev, cur in zip(objs, objs[1:]):
            if not (_movable(prev) and _movable(cur)):
                continue
            _move_to(cur, prev.x + (cur.x - prev.x) * scale,
                     prev.y + (cur.y - prev.y) * scale)

    # -- style preservation (reference _preserve_style:162) -------------------

    def _preserve_style(self, objs, consistency: float = 0.8) -> None:
        """Blend each jump distance toward the map's average spacing
        (reference _preserve_style:162-199, style_consistency_weight 0.8)."""
        spacings = [math.hypot(b.x - a.x, b.y - a.y)
                    for a, b in zip(objs, objs[1:])
                    if _movable(a) and _movable(b)]
        if not spacings:
            return
        avg = float(np.mean(spacings))
        for prev, cur in zip(objs, objs[1:]):
            if not (_movable(prev) and _movable(cur)):
                continue
            d = math.hypot(cur.x - prev.x, cur.y - prev.y)
            if d <= 1e-6:
                continue
            target = d * (1 - consistency) + avg * consistency
            _move_to(cur, prev.x + (cur.x - prev.x) / d * target,
                     prev.y + (cur.y - prev.y) / d * target)


def enhance_result(result: str, args: InferenceConfig,
                   verbose: bool = False) -> str:
    """Pipeline hook: apply the enhancement chain if any pass is enabled."""
    enhancer = MapEnhancer(args)
    if not enhancer.enabled:
        return result
    out = enhancer.enhance_osu(result)
    if verbose:
        print("Applied BeatHeritage enhancement passes")
    return out
