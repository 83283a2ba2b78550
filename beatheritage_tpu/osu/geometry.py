"""osu!-faithful slider path geometry (host-side, numpy).

Implements the exact curve flattening rules osu! uses (piecewise bezier with
flatness-tolerance subdivision, Catmull-Rom with fixed detail, circular arc
with chord tolerance, linear), so that slider lengths and positions computed
here agree with the game client and with the reference implementation
(reference: osuT5/osuT5/inference/path_approximator.py,
osuT5/osuT5/inference/slider_path.py).

All functions take/return float64 arrays of shape (N, 2).
"""

from __future__ import annotations

import numpy as np

# osu!lazer flattening constants. These are part of the format's semantics:
# changing them changes slider lengths.
BEZIER_TOLERANCE = 0.25
CATMULL_DETAIL = 50
ARC_TOLERANCE = 0.1


def flatten_linear(pts: np.ndarray) -> np.ndarray:
    return np.asarray(pts, dtype=np.float64).copy()


def _de_casteljau_split(cps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a bezier at t=0.5, returning (left, right) control polygons."""
    n = len(cps)
    left = np.empty_like(cps)
    right = np.empty_like(cps)
    mid = cps.astype(np.float64, copy=True)
    for i in range(n):
        left[i] = mid[0]
        right[n - 1 - i] = mid[-1]
        mid = 0.5 * (mid[:-1] + mid[1:])
    return left, right


def _bezier_flat(cps: np.ndarray) -> bool:
    """Second-difference flatness test, matching the osu! tolerance rule."""
    if len(cps) < 3:
        return True
    d = cps[:-2] - 2.0 * cps[1:-1] + cps[2:]
    return bool(np.max(np.einsum("ij,ij->i", d, d)) <= 4.0 * BEZIER_TOLERANCE**2)


def _bezier_emit(cps: np.ndarray, out: list[np.ndarray]) -> None:
    """Emit the flattened piece of a flat-enough bezier segment.

    osu! emits the first control point plus smoothed midpoints of the
    once-subdivided polygon: p_i = (l[2i-1] + 2 l[2i] + l[2i+1]) / 4.
    """
    left, right = _de_casteljau_split(cps)
    l = np.vstack([left, right[1:]])
    out.append(cps[0].copy())
    for i in range(1, len(cps) - 1):
        out.append(0.25 * (l[2 * i - 1] + 2.0 * l[2 * i] + l[2 * i + 1]))


def flatten_bezier(pts: np.ndarray) -> np.ndarray:
    """Adaptively flatten a bezier curve defined by `pts` control points.

    Depth-first subdivision, left piece first, identical output ordering to
    the osu! client algorithm.
    """
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 0:
        return np.empty((0, 2))
    out: list[np.ndarray] = []
    stack = [pts.copy()]
    while stack:
        seg = stack.pop()
        if _bezier_flat(seg):
            _bezier_emit(seg, out)
        else:
            left, right = _de_casteljau_split(seg)
            stack.append(right)
            stack.append(left)
    out.append(pts[-1].copy())
    return np.vstack(out)


def _catmull_eval(v1, v2, v3, v4, t: np.ndarray) -> np.ndarray:
    """Vectorized Catmull-Rom evaluation over a 1-D array of ts -> (T, 2)."""
    t = t[:, None]
    t2 = t * t
    t3 = t2 * t
    return 0.5 * (
        2.0 * v2
        + (v3 - v1) * t
        + (2.0 * v1 - 5.0 * v2 + 4.0 * v3 - v4) * t2
        + (3.0 * v2 - v1 - 3.0 * v3 + v4) * t3
    )


def flatten_catmull(pts: np.ndarray) -> np.ndarray:
    """Catmull-Rom with osu!'s fixed CATMULL_DETAIL sampling.

    osu! emits pairs (t=c/D, t=(c+1)/D) per subinterval, i.e. interior sample
    points are duplicated; we reproduce that exactly since downstream length
    computation is insensitive to zero-length segments but point counts show
    up in the calculated path.
    """
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    # interleaved t grid: c/D, (c+1)/D for c in [0, D)
    c = np.arange(CATMULL_DETAIL, dtype=np.float64)
    ts = np.empty(2 * CATMULL_DETAIL)
    ts[0::2] = c / CATMULL_DETAIL
    ts[1::2] = (c + 1) / CATMULL_DETAIL
    chunks = []
    for i in range(n - 1):
        v1 = pts[i - 1] if i > 0 else pts[i]
        v2 = pts[i]
        v3 = pts[i + 1] if i < n - 1 else 2.0 * v2 - v1
        v4 = pts[i + 2] if i < n - 2 else 2.0 * v3 - v2
        chunks.append(_catmull_eval(v1, v2, v3, v4, ts))
    if not chunks:
        return np.empty((0, 2))
    return np.vstack(chunks)


def flatten_arc(pts: np.ndarray) -> np.ndarray:
    """Circular arc through 3 points, sampled at osu!'s chord tolerance.

    Returns an empty array when the points are degenerate (collinear or
    coincident); callers fall back to bezier, as the game does.
    """
    a, b, c = np.asarray(pts, dtype=np.float64)
    a_sq = float(np.dot(b - c, b - c))
    b_sq = float(np.dot(a - c, a - c))
    c_sq = float(np.dot(a - b, a - b))
    if np.isclose(a_sq, 0) or np.isclose(b_sq, 0) or np.isclose(c_sq, 0):
        return np.empty((0, 2))
    s = a_sq * (b_sq + c_sq - a_sq)
    t = b_sq * (a_sq + c_sq - b_sq)
    u = c_sq * (a_sq + b_sq - c_sq)
    denom = s + t + u
    if np.isclose(denom, 0):
        return np.empty((0, 2))
    centre = (s * a + t * b + u * c) / denom
    da = a - centre
    dc = c - centre
    radius = float(np.linalg.norm(da))

    theta0 = float(np.arctan2(da[1], da[0]))
    theta1 = float(np.arctan2(dc[1], dc[0]))
    while theta1 < theta0:
        theta1 += 2.0 * np.pi
    direction = 1.0
    theta_range = theta1 - theta0
    # Orientation test: if b lies on the other side of chord a->c, go the
    # long way around in the negative direction.
    ortho = np.array([(c - a)[1], -(c - a)[0]])
    if float(np.dot(ortho, b - a)) < 0:
        direction = -1.0
        theta_range = 2.0 * np.pi - theta_range

    if 2.0 * radius <= ARC_TOLERANCE:
        n_points = 2
    else:
        n_points = max(2, int(np.ceil(theta_range / (2.0 * np.arccos(1.0 - ARC_TOLERANCE / radius)))))

    fracs = np.arange(n_points, dtype=np.float64) / (n_points - 1)
    thetas = theta0 + direction * fracs * theta_range
    return centre + radius * np.stack([np.cos(thetas), np.sin(thetas)], axis=1)


class SliderPath:
    """Flattened slider path with cumulative-length queries.

    Mirrors osu!'s SliderPath semantics (reference slider_path.py:26):
    control points are split into spans at duplicated points, each span is
    flattened per `path_type`, and the total length is clamped/stretched to
    `expected_distance` when given.

    path_type: one of "Bezier", "Linear", "PerfectCurve", "Catmull".
    """

    def __init__(self, path_type: str, control_points: np.ndarray,
                 expected_distance: float | None = None):
        self.path_type = path_type
        self.control_points = np.asarray(control_points, dtype=np.float64)
        self.expected_distance = expected_distance
        self.path, self.cum_length = self._build()

    # -- construction ------------------------------------------------------

    def _flatten_span(self, span: np.ndarray) -> np.ndarray:
        if self.path_type == "Linear":
            return flatten_linear(span)
        if self.path_type == "Catmull":
            return flatten_catmull(span)
        if self.path_type == "PerfectCurve":
            if len(self.control_points) == 3 and len(span) == 3:
                arc = flatten_arc(span)
                if len(arc) > 0:
                    return arc
            return flatten_bezier(span)
        return flatten_bezier(span)

    def _build(self) -> tuple[np.ndarray, np.ndarray]:
        cps = self.control_points
        pieces: list[np.ndarray] = []
        start = 0
        for i in range(len(cps)):
            if i == len(cps) - 1 or np.all(cps[i] == cps[i + 1]):
                pieces.append(self._flatten_span(cps[start:i + 1]))
                start = i + 1
        # concatenate, dropping consecutive duplicates (osu! does this
        # incrementally while appending)
        path_pts: list[np.ndarray] = []
        for piece in pieces:
            for p in piece:
                if not path_pts or np.any(path_pts[-1] != p):
                    path_pts.append(p)
        if not path_pts:
            return np.zeros((1, 2)), np.zeros(1)
        path = np.vstack(path_pts)

        seg = np.linalg.norm(np.diff(path, axis=0), axis=1)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        exp = self.expected_distance
        if exp is not None and len(path) > 1:
            if cum[-1] > exp:
                # truncate: find first vertex past the expected distance and
                # pull it back onto the path direction
                idx = int(np.searchsorted(cum, exp, side="left"))
                idx = max(idx, 1)
                prev = path[idx - 1]
                d = cum[idx] - cum[idx - 1]
                if d > 0:
                    w = (exp - cum[idx - 1]) / d
                    new_pt = prev + (path[idx] - prev) * w
                else:
                    new_pt = prev
                path = np.vstack([path[:idx], new_pt])
                cum = np.concatenate([cum[:idx], [exp]])
            elif cum[-1] < exp:
                # stretch the final segment out to the expected distance
                diff = path[-1] - path[-2]
                d = float(np.linalg.norm(diff))
                if d > 0:
                    path = path.copy()
                    path[-1] = path[-1] + diff * (exp - cum[-1]) / d
                    cum = cum.copy()
                    cum[-1] = exp
        return path, cum

    # -- queries -----------------------------------------------------------

    @property
    def distance(self) -> float:
        return float(self.cum_length[-1])

    def position_at(self, progress: float) -> np.ndarray:
        """Position at path progress in [0, 1] (of the clamped length)."""
        d = float(np.clip(progress, 0.0, 1.0)) * self.distance
        return self._at_distance(d)

    def positions_at(self, progress: np.ndarray) -> np.ndarray:
        """Vectorized position_at over an array of progresses -> (N, 2)."""
        d = np.clip(np.asarray(progress, dtype=np.float64), 0.0, 1.0) * self.distance
        idx = np.clip(np.searchsorted(self.cum_length, d, side="left"), 1,
                      len(self.path) - 1)
        d0 = self.cum_length[idx - 1]
        d1 = self.cum_length[idx]
        span = np.where(d1 > d0, d1 - d0, 1.0)
        w = np.where(d1 > d0, (d - d0) / span, 0.0)[:, None]
        return self.path[idx - 1] + (self.path[idx] - self.path[idx - 1]) * w

    def _at_distance(self, d: float) -> np.ndarray:
        if len(self.path) == 1:
            return self.path[0]
        idx = int(np.searchsorted(self.cum_length, d, side="left"))
        if idx <= 0:
            return self.path[0]
        if idx >= len(self.path):
            return self.path[-1]
        d0, d1 = self.cum_length[idx - 1], self.cum_length[idx]
        if np.isclose(d0, d1):
            return self.path[idx - 1]
        w = (d - d0) / (d1 - d0)
        return self.path[idx - 1] + (self.path[idx] - self.path[idx - 1]) * w
