"""Tests for the pure-Python osu! domain library."""

import numpy as np
import pytest

from beatheritage_tpu.osu import (
    Beatmap,
    Circle,
    HoldNote,
    Slider,
    SliderPath,
    Spinner,
    TimingPoint,
    TimingPointsChange,
    apply_timing_changes,
    flatten_arc,
    flatten_bezier,
)

SAMPLE_OSU = """osu file format v14

[General]
AudioFilename: audio.mp3
AudioLeadIn: 0
PreviewTime: 5000
Mode: 0
StackLeniency: 0.7

[Metadata]
Title:Test Song
Artist:Test Artist
Creator:TestMapper
Version:Insane
BeatmapID:123456
BeatmapSetID:654321

[Difficulty]
HPDrainRate:5
CircleSize:4
OverallDifficulty:8
ApproachRate:9
SliderMultiplier:1.8
SliderTickRate:1

[Events]
0,0,"bg.jpg",0,0

[TimingPoints]
1000,500,4,2,0,60,1,0
3000,-50,4,2,0,60,0,1

[HitObjects]
256,192,1000,5,0,0:0:0:0:
100,100,1500,1,8,0:0:0:0:
200,200,2000,2,0,B|300:200|300:100,1,141.75,0|2,0:0|0:0,0:0:0:0:
256,192,4000,12,4,5000,0:0:0:0:
"""


def test_parse_basic_fields():
    bm = Beatmap.from_string(SAMPLE_OSU)
    assert bm.mode == 0
    assert bm.title == "Test Song"
    assert bm.creator == "TestMapper"
    assert bm.beatmap_id == 123456
    assert bm.circle_size == 4
    assert bm.slider_multiplier == 1.8
    assert len(bm.timing_points) == 2
    assert len(bm.hit_objects()) == 4


def test_hit_object_kinds_and_combo():
    bm = Beatmap.from_string(SAMPLE_OSU)
    objs = bm.hit_objects()
    assert isinstance(objs[0], Circle) and objs[0].new_combo
    assert isinstance(objs[1], Circle) and not objs[1].new_combo
    assert isinstance(objs[2], Slider)
    assert isinstance(objs[3], Spinner) and objs[3].end_time == 5000


def test_timing_point_linkage_and_queries():
    bm = Beatmap.from_string(SAMPLE_OSU)
    red, green = bm.timing_points
    assert red.parent is None and red.bpm == 120
    assert green.parent is red
    assert green.slider_velocity == pytest.approx(2.0)
    assert green.kiai_mode
    assert bm.timing_point_at(500) is red  # before first -> first
    assert bm.timing_point_at(1000) is red
    assert bm.timing_point_at(3500) is green
    assert bm.uninherited_timing_point_at(3500) is red


def test_slider_duration_uses_sv():
    bm = Beatmap.from_string(SAMPLE_OSU)
    slider = bm.hit_objects()[2]
    # length 141.75 px, 1.8 multiplier, SV 1 (green line starts at 3000)
    # beats = 141.75 / 180 = 0.7875, duration = 0.7875 * 500 = 393.75 ms
    assert slider.duration == pytest.approx(393.75)
    assert slider.end_time == pytest.approx(2393.75)


def test_roundtrip_serialize_parse():
    bm = Beatmap.from_string(SAMPLE_OSU)
    text = bm.to_osu()
    bm2 = Beatmap.from_string(text)
    assert bm2.title == bm.title
    assert len(bm2.hit_objects()) == len(bm.hit_objects())
    assert [type(h) for h in bm2.hit_objects()] == [type(h) for h in bm.hit_objects()]
    s1, s2 = bm.hit_objects()[2], bm2.hit_objects()[2]
    assert s2.curve_points == s1.curve_points
    assert s2.length == s1.length
    assert [tp.serialize() for tp in bm2.timing_points] == [tp.serialize() for tp in bm.timing_points]


def test_hold_note_parse_serialize():
    line = "64,192,1000,128,0,2000:0:0:0:0:"
    bm = Beatmap.from_string(
        "osu file format v14\n[General]\nMode: 3\n[TimingPoints]\n0,500,4,2,0,60,1,0\n"
        f"[HitObjects]\n{line}\n")
    ho = bm.hit_objects()[0]
    assert isinstance(ho, HoldNote)
    assert ho.end_time == 2000
    reparsed = Beatmap.from_string(bm.to_osu()).hit_objects()[0]
    assert reparsed.end_time == 2000 and reparsed.x == 64


# -- geometry ----------------------------------------------------------------

def test_bezier_flatten_endpoints_and_monotone_progress():
    cps = np.array([[0, 0], [100, 0], [100, 100]], dtype=float)
    path = flatten_bezier(cps)
    assert np.allclose(path[0], [0, 0])
    assert np.allclose(path[-1], [100, 100])
    assert len(path) > 5  # curved -> subdivided


def test_arc_through_three_points():
    pts = np.array([[0, 0], [50, 50], [100, 0]], dtype=float)
    arc = flatten_arc(pts)
    # all points equidistant from circumcentre (50, 0), radius 50
    centre = np.array([50.0, 0.0])
    radii = np.linalg.norm(arc - centre, axis=1)
    assert np.allclose(radii, 50.0, atol=1e-6)
    assert np.allclose(arc[0], [0, 0]) and np.allclose(arc[-1], [100, 0])


def test_arc_degenerate_collinear_returns_empty():
    pts = np.array([[0, 0], [50, 0], [100, 0]], dtype=float)
    assert len(flatten_arc(pts)) == 0


def test_slider_path_truncates_to_expected_distance():
    path = SliderPath("Linear", np.array([[0, 0], [100, 0]], dtype=float),
                      expected_distance=50)
    assert path.distance == pytest.approx(50)
    assert np.allclose(path.position_at(1.0), [50, 0])


def test_slider_path_stretches_to_expected_distance():
    path = SliderPath("Linear", np.array([[0, 0], [100, 0]], dtype=float),
                      expected_distance=150)
    assert path.distance == pytest.approx(150)
    assert np.allclose(path.position_at(1.0), [150, 0])


def test_slider_path_positions_vectorized_matches_scalar():
    cps = 100 * np.array([[0, 0], [1, 1], [1, -1], [2, 0]], dtype=float)
    path = SliderPath("Bezier", cps)
    ps = np.linspace(0, 1, 17)
    vec = path.positions_at(ps)
    for p, v in zip(ps, vec):
        assert np.allclose(v, path.position_at(float(p)), atol=1e-9)


def test_multibezier_red_anchor_split():
    # duplicated point makes two spans
    cps = np.array([[0, 0], [50, 50], [50, 50], [100, 0]], dtype=float)
    path = SliderPath("Bezier", cps)
    assert path.distance == pytest.approx(2 * np.hypot(50, 50), rel=1e-6)


def test_slider_end_position_repeats():
    s = Slider(x=0, y=0, time=0, curve_type="Linear", curve_points=[(100, 0)],
               repeat=2, length=100, duration=200)
    assert np.allclose(s.end_position, [0, 0])
    s1 = Slider(x=0, y=0, time=0, curve_type="Linear", curve_points=[(100, 0)],
                repeat=1, length=100, duration=100)
    assert np.allclose(s1.end_position, [100, 0])


# -- timing point changes -------------------------------------------------------

def _red(offset, mpb=500.0, **kw):
    return TimingPoint(offset=offset, ms_per_beat=mpb, uninherited=True, **kw)


def test_timing_change_inserts_redline():
    timeline = [_red(0)]
    change = TimingPointsChange(_red(1000, 400), mpb=True, uninherited=True)
    timeline = change.apply(timeline)
    assert len(timeline) == 2
    assert timeline[1].offset == 1000 and timeline[1].ms_per_beat == 400


def test_timing_change_updates_existing_at_same_offset():
    timeline = [_red(0)]
    change = TimingPointsChange(_red(1, 300), mpb=True, uninherited=True, fuzzyness=2)
    timeline = change.apply(timeline)
    assert len(timeline) == 1
    assert timeline[0].ms_per_beat == 300


def test_timing_change_redundant_greenline_omitted():
    red = _red(0)
    timeline = [red]
    # greenline with same effect as previous red -> sv 1.0 => -100
    green = TimingPoint(offset=1000, ms_per_beat=-100, uninherited=False, parent=red)
    change = TimingPointsChange(green, mpb=True)
    out = change.apply(list(timeline))
    greens = [tp for tp in out if tp.parent is not None]
    assert len(greens) == 1 and greens[0].ms_per_beat == -100


def test_apply_changes_sorted():
    timeline = [_red(0)]
    changes = [
        TimingPointsChange(_red(2000, 450), mpb=True, uninherited=True),
        TimingPointsChange(_red(1000, 400), mpb=True, uninherited=True),
    ]
    out = apply_timing_changes(timeline, changes)
    offsets = [tp.offset for tp in out]
    assert offsets == sorted(offsets)
