"""Pure-JAX slider-end projection vs the exact host geometry.

The device projection (diffusion/slider_jax.py) replaces the host
SliderPath callback inside the sampler; its projected end positions must
match the exact geometry to sub-pixel error for every curve type.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.diffusion.slider_jax import (
    PLAYFIELD,
    SliderTableSpec,
    build_slider_tables,
    empty_tables,
    project_slider_ends,
)
from beatheritage_tpu.osu.geometry import SliderPath


@dataclasses.dataclass
class FakeSlider:
    seq_indices: np.ndarray
    end_index: int
    curve_type: str
    length: float


def _project_host(anchors: np.ndarray, curve_type: str, length: float):
    path = SliderPath(curve_type, anchors)
    if path.distance == 0:
        return anchors[-1]
    return path.position_at(min(length / path.distance, 1.0))


def _run_case(curve_type, anchors, length, tol_px):
    t = len(anchors) + 1
    pos = np.zeros((t, 2))
    pos[:len(anchors)] = anchors
    pos[-1] = [333.0, 111.0]  # stale end position to be overwritten
    x = (pos / PLAYFIELD * 2 - 1)[None]  # (1, T, 2)

    slider = FakeSlider(np.arange(len(anchors)), t - 1, curve_type, length)
    tables = {k: jnp.asarray(v) for k, v in
              build_slider_tables([slider], 0, t).items()}
    out = np.asarray(project_slider_ends(jnp.asarray(x), tables))
    got = (out[0, -1] + 1) / 2 * PLAYFIELD
    want = _project_host(anchors, curve_type, length)
    err = float(np.linalg.norm(got - want))
    assert err < tol_px, (curve_type, err, got, want)
    # anchors themselves must be untouched
    np.testing.assert_allclose(
        (out[0, :len(anchors)] + 1) / 2 * PLAYFIELD, anchors, atol=1e-3)


def test_linear_projection_exact():
    anchors = np.array([[10.0, 10.0], [110.0, 10.0], [110.0, 210.0]])
    _run_case("Linear", anchors, 150.0, 0.05)


def test_bezier_projection_subpixel():
    anchors = np.array([[50.0, 50.0], [150.0, 300.0], [300.0, 40.0],
                        [420.0, 200.0]])
    _run_case("Bezier", anchors, 260.0, 1.0)


def test_catmull_projection_subpixel():
    anchors = np.array([[60.0, 60.0], [160.0, 220.0], [280.0, 90.0],
                        [400.0, 250.0]])
    _run_case("Catmull", anchors, 240.0, 1.5)


def test_perfect_circle_projection_subpixel():
    anchors = np.array([[100.0, 100.0], [200.0, 180.0], [300.0, 100.0]])
    _run_case("PerfectCurve", anchors, 180.0, 1.0)


def test_degenerate_circle_falls_back_to_bezier():
    # collinear triple: the game falls back to bezier, so must we
    anchors = np.array([[100.0, 100.0], [200.0, 100.0], [300.0, 100.0]])
    _run_case("PerfectCurve", anchors, 120.0, 0.5)


def test_length_longer_than_path_clamps_to_path_end():
    anchors = np.array([[10.0, 10.0], [60.0, 10.0]])
    _run_case("Linear", anchors, 5000.0, 0.05)


def test_empty_tables_are_identity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 2)))
    tables = {k: jnp.asarray(v) for k, v in empty_tables(8).items()}
    out = project_slider_ends(x, tables)
    # row 0 defines the geometry and broadcasts to every row
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(x)[0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(x)[0],
                               atol=1e-6)


def test_many_sliders_batched():
    rng = np.random.default_rng(1)
    t = 64
    pos = rng.uniform(30, 350, (t, 2))
    x = (pos / PLAYFIELD * 2 - 1)[None]
    sliders, wants = [], {}
    for j in range(6):
        i0 = j * 10
        idx = np.arange(i0, i0 + 3)
        anchors = pos[idx]
        length = 80.0 + 20 * j
        sliders.append(FakeSlider(idx, i0 + 4, "Bezier", length))
        wants[i0 + 4] = _project_host(anchors, "Bezier", length)
    tables = {k: jnp.asarray(v) for k, v in
              build_slider_tables(sliders, 0, t).items()}
    out = (np.asarray(project_slider_ends(jnp.asarray(x), tables))[0] + 1) / 2 * PLAYFIELD
    for end_idx, want in wants.items():
        assert np.linalg.norm(out[end_idx] - want) < 1.0
