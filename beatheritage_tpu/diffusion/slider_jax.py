"""Pure-JAX slider-end projection for the diffusion refiner.

The reference recomputes slider end positions from the required length
INSIDE the sampling loop via a host callback per step
(osu_diffusion/diffusion_pipeline.py:203-222 denoised_fn + SliderPath).
The axon TPU backend rejects host callbacks, so round 3 fell back to
periodic host projections between scan segments. This module makes the
projection a device computation so it runs on every sampler step inside
the one jitted program.

Key observation: during sampling, positions are continuous floats, so the
span-split-at-duplicated-control-points rule (osu/geometry.py SliderPath)
never triggers — every slider is a single span of its curve type. And
bezier / catmull / linear flattening are all LINEAR in the control points,
so each slider's polyline is `S_mat @ anchors` for a host-precomputed
static sampling matrix (Bernstein basis for bezier, Catmull-Rom basis with
endpoint substitutions, segment interpolation for linear). The perfect
circle is the only nonlinear case and has a closed form on device, with
the quadratic-bezier matrix as the degeneracy fallback (the same fallback
the game and geometry.py use).

Arc lengths come from a K-point polyline; with K=160 the projected end
position matches the exact host SliderPath to sub-pixel error on typical
sliders (pinned by tests/test_slider_jax.py). The FINAL export still uses
the exact host geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PLAYFIELD = np.array([512.0, 384.0])
CATMULL_DETAIL = 50  # osu! constant (geometry.py)


# =============================================================================
# Host-side: per-chunk static tables
# =============================================================================

def _bernstein_matrix(n_pts: int, ts: np.ndarray) -> np.ndarray:
    """(len(ts), n_pts) Bernstein basis of degree n_pts-1."""
    from math import comb
    n = n_pts - 1
    t = ts[:, None]
    i = np.arange(n_pts)[None, :]
    return (np.array([comb(n, k) for k in range(n_pts)])[None, :]
            * t ** i * (1.0 - t) ** (n - i))


def _catmull_matrix(n_pts: int, k_rows: int) -> np.ndarray:
    """(k_rows, n_pts) matrix sampling the Catmull-Rom chain through n_pts
    control points (geometry.py flatten_catmull semantics: v1=v2 at the
    head; v3=2v2-v1, v4=2v3-v2 substitutions at the tail)."""
    n_spans = n_pts - 1
    rows = np.zeros((k_rows, n_pts))
    # distribute rows over spans, endpoints included per span
    per = [k_rows // n_spans + (1 if s < k_rows % n_spans else 0)
           for s in range(n_spans)]
    r = 0
    for i in range(n_spans):
        k_i = max(per[i], 2)
        if r + k_i > k_rows:
            k_i = k_rows - r
        if k_i <= 0:
            break
        ts = np.linspace(0.0, 1.0, k_i)
        # window weights: sample = .5*(2 v2 + (v3-v1) t + (2v1-5v2+4v3-v4) t^2
        #                              + (3v2-v1-3v3+v4) t^3)
        t = ts[:, None]
        w1 = 0.5 * (-t + 2 * t**2 - t**3)
        w2 = 0.5 * (2 - 5 * t**2 + 3 * t**3)
        w3 = 0.5 * (t + 4 * t**2 - 3 * t**3)
        w4 = 0.5 * (-(t**2) + t**3)
        idx = {  # control-point indices with endpoint substitutions
            "v2": i, "v3": i + 1,
        }
        block = np.zeros((k_i, n_pts))
        # v1
        if i > 0:
            block[:, i - 1] += w1[:, 0]
        else:
            block[:, i] += w1[:, 0]  # v1 = v2
        block[:, idx["v2"]] += w2[:, 0]
        if i + 1 <= n_pts - 1:
            block[:, idx["v3"]] += w3[:, 0]
        else:  # v3 = 2 v2 - v1 (never happens: i+1 <= n_pts-1 by range)
            pass
        # v4
        if i + 2 <= n_pts - 1:
            block[:, i + 2] += w4[:, 0]
        else:  # v4 = 2 v3 - v2
            block[:, idx["v3"]] += 2 * w4[:, 0]
            block[:, idx["v2"]] -= w4[:, 0]
        rows[r:r + k_i] = block
        r += k_i
    # any unassigned trailing rows repeat the final point
    if r < k_rows:
        rows[r:, n_pts - 1] = 1.0
    return rows


def _linear_matrix(n_pts: int, k_rows: int) -> np.ndarray:
    """(k_rows, n_pts) matrix sampling the polyline uniformly per segment,
    endpoints included — vertices are sample points, so polyline lengths
    are exact."""
    n_spans = max(n_pts - 1, 1)
    rows = np.zeros((k_rows, n_pts))
    per = [k_rows // n_spans + (1 if s < k_rows % n_spans else 0)
           for s in range(n_spans)]
    r = 0
    for i in range(n_spans):
        k_i = max(per[i], 2)
        if r + k_i > k_rows:
            k_i = k_rows - r
        if k_i <= 0:
            break
        ts = np.linspace(0.0, 1.0, k_i)
        rows[r:r + k_i, i] = 1.0 - ts
        rows[r:r + k_i, min(i + 1, n_pts - 1)] += ts
        r += k_i
    if r < k_rows:
        rows[r:, n_pts - 1] = 1.0
    return rows


@dataclasses.dataclass(frozen=True)
class SliderTableSpec:
    """Static shapes of the projection tables (part of the jit cache key)."""
    max_sliders: int = 32
    max_anchors: int = 16
    samples: int = 160


def build_slider_tables(chunk_sliders, start: int, seq_len: int,
                        spec: SliderTableSpec = SliderTableSpec()) -> dict:
    """Per-chunk padded tables for project_slider_ends. chunk_sliders are
    DiffusionSlider-likes with .seq_indices (absolute), .end_index,
    .curve_type, .length; `start` is the chunk's first sequence index."""
    S, A, K = spec.max_sliders, spec.max_anchors, spec.samples
    tables = {
        "anchor_idx": np.zeros((S, A), np.int32),
        "smat": np.zeros((S, K, A), np.float32),
        "end_idx": np.zeros((S,), np.int32),
        "length": np.zeros((S,), np.float32),
        "valid": np.zeros((S,), bool),
        "is_circle": np.zeros((S,), bool),
    }
    for j, s in enumerate(chunk_sliders[:S]):
        idx = np.asarray(s.seq_indices, np.int64) - start
        if len(idx) > A:  # ultra-dense anchor chains: keep endpoints + evens
            keep = np.linspace(0, len(idx) - 1, A).round().astype(np.int64)
            idx = idx[keep]
        a = len(idx)
        if a < 2:
            continue
        ct = (s.curve_type or "Bezier")
        if ct == "Linear":
            m = _linear_matrix(a, K)
        elif ct == "Catmull":
            m = _catmull_matrix(a, K)
        elif ct == "PerfectCurve" and a == 3:
            m = _bernstein_matrix(a, np.linspace(0, 1, K))
            tables["is_circle"][j] = True
        else:
            m = _bernstein_matrix(a, np.linspace(0, 1, K))
        tables["anchor_idx"][j, :a] = idx
        tables["anchor_idx"][j, a:] = idx[-1]
        tables["smat"][j, :, :a] = m
        tables["end_idx"][j] = int(s.end_index) - start
        tables["length"][j] = float(s.length)
        tables["valid"][j] = True
    # clip indices defensively (a malformed slider must not index OOB)
    tables["anchor_idx"] = np.clip(tables["anchor_idx"], 0, seq_len - 1)
    tables["end_idx"] = np.clip(tables["end_idx"], 0, seq_len - 1)
    return tables


# =============================================================================
# Device-side projection
# =============================================================================

def _arc_polyline(p0, p1, p2, k: int):
    """Circle through (p0, p1, p2) sampled at k points from p0 to p2 the
    short/long way per osu! orientation. Returns (poly (S,k,2), ok (S,))
    where ok=False marks degenerate triples (fallback to the bezier
    matrix polyline)."""
    a_sq = jnp.sum((p1 - p2) ** 2, -1)
    b_sq = jnp.sum((p0 - p2) ** 2, -1)
    c_sq = jnp.sum((p0 - p1) ** 2, -1)
    s = a_sq * (b_sq + c_sq - a_sq)
    t = b_sq * (a_sq + c_sq - b_sq)
    u = c_sq * (a_sq + b_sq - c_sq)
    denom = s + t + u
    ok = (jnp.abs(denom) > 1e-9) & (a_sq > 1e-9) & (b_sq > 1e-9) & (c_sq > 1e-9)
    denom_safe = jnp.where(ok, denom, 1.0)
    centre = (s[..., None] * p0 + t[..., None] * p1 + u[..., None] * p2) / denom_safe[..., None]
    da = p0 - centre
    dc = p2 - centre
    radius = jnp.linalg.norm(da, axis=-1)
    theta0 = jnp.arctan2(da[..., 1], da[..., 0])
    theta1 = jnp.arctan2(dc[..., 1], dc[..., 0])
    theta1 = jnp.where(theta1 < theta0, theta1 + 2 * jnp.pi, theta1)
    theta_range = theta1 - theta0
    chord = p2 - p0
    ortho = jnp.stack([chord[..., 1], -chord[..., 0]], -1)
    flip = jnp.sum(ortho * (p1 - p0), -1) < 0
    direction = jnp.where(flip, -1.0, 1.0)
    theta_range = jnp.where(flip, 2 * jnp.pi - theta_range, theta_range)
    fracs = jnp.arange(k) / (k - 1)
    thetas = theta0[..., None] + direction[..., None] * fracs[None, :] * theta_range[..., None]
    poly = centre[..., None, :] + radius[..., None, None] * jnp.stack(
        [jnp.cos(thetas), jnp.sin(thetas)], -1)
    return poly, ok


def project_slider_ends(x: jnp.ndarray, tables: dict) -> jnp.ndarray:
    """x (N, T, 2) normalized positions in [-1, 1] -> same, with every valid
    slider's end moved to `length` along its current anchor path. Row 0
    defines the geometry and the result broadcasts to all N rows (CFG halves
    share positions), matching the host host_fix_slider_ends."""
    playfield = jnp.asarray(PLAYFIELD, x.dtype)
    pos = (x[0] + 1.0) / 2.0 * playfield                  # (T, 2)
    anchors = pos[tables["anchor_idx"]]                   # (S, A, 2)
    poly = jnp.einsum("ska,sad->skd", tables["smat"], anchors)  # (S, K, 2)
    k = poly.shape[1]
    arc_poly, arc_ok = _arc_polyline(anchors[:, 0], anchors[:, 1],
                                     anchors[:, 2], k)
    use_arc = tables["is_circle"] & arc_ok
    poly = jnp.where(use_arc[:, None, None], arc_poly, poly)

    seg = jnp.linalg.norm(jnp.diff(poly, axis=1), axis=-1)      # (S, K-1)
    cum = jnp.concatenate([jnp.zeros((seg.shape[0], 1), seg.dtype),
                           jnp.cumsum(seg, axis=1)], axis=1)    # (S, K)
    total = cum[:, -1]
    d = jnp.minimum(tables["length"], total)
    idx = jax.vmap(lambda c, dd: jnp.searchsorted(c, dd, side="left"))(cum, d)
    idx = jnp.clip(idx, 1, k - 1)
    d0 = jnp.take_along_axis(cum, (idx - 1)[:, None], 1)[:, 0]
    d1 = jnp.take_along_axis(cum, idx[:, None], 1)[:, 0]
    w = jnp.where(d1 > d0, (d - d0) / jnp.maximum(d1 - d0, 1e-9), 0.0)
    p_lo = jnp.take_along_axis(poly, (idx - 1)[:, None, None], 1)[:, 0]
    p_hi = jnp.take_along_axis(poly, idx[:, None, None], 1)[:, 0]
    end_pos = p_lo + w[:, None] * (p_hi - p_lo)

    cur = pos[tables["end_idx"]]
    apply = tables["valid"] & (total > 1e-9)
    end_pos = jnp.where(apply[:, None], end_pos, cur)
    pos = pos.at[tables["end_idx"]].set(end_pos.astype(pos.dtype))
    fixed = pos / playfield * 2.0 - 1.0
    return jnp.broadcast_to(fixed[None], x.shape).astype(x.dtype)


def empty_tables(seq_len: int,
                 spec: SliderTableSpec = SliderTableSpec()) -> dict:
    """All-invalid tables (no sliders) with the standard static shapes."""
    return build_slider_tables([], 0, seq_len, spec)
