"""Beatmap -> events parser tests."""

import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.data import BeatmapParser, get_groups, merge_events, update_event_times
from beatheritage_tpu.events import Event, EventType
from beatheritage_tpu.osu import Beatmap
from beatheritage_tpu.tokenizer import Tokenizer

OSU_STD = """osu file format v14
[General]
Mode: 0
[Difficulty]
CircleSize:4
SliderMultiplier:1.4
[TimingPoints]
0,500,4,2,0,60,1,0
[HitObjects]
256,192,1000,5,0,0:0:0:0:
100,100,1500,1,0,0:0:0:0:
200,200,2000,2,0,L|300:200,1,100,0|0,0:0|0:0,0:0:0:0:
"""


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    parser = BeatmapParser(cfg, tok)
    return cfg, tok, parser


def test_parse_sequence_structure(setup):
    _, _, parser = setup
    bm = Beatmap.from_string(OSU_STD)
    events, times = parser.parse(bm)
    assert len(events) == len(times)
    types = [e.type for e in events]
    assert EventType.CIRCLE in types
    assert EventType.SLIDER_HEAD in types
    assert EventType.LAST_ANCHOR in types
    assert EventType.SLIDER_END in types
    assert times == sorted(times)


def test_circle_group_layout_types_first(setup):
    _, _, parser = setup
    bm = Beatmap.from_string(OSU_STD)
    events, times = parser.parse(bm)
    # tiny config: types_first, add_snapping, add_distances, add_positions(POS),
    # add_hitsounds. first circle at t=1000 on a 500mpb grid -> snap 1
    i = next(k for k, e in enumerate(events) if e.type == EventType.CIRCLE)
    assert events[i + 1] == Event(EventType.TIME_SHIFT, 1000)
    assert events[i + 2] == Event(EventType.SNAPPING, 1)
    assert events[i + 3].type == EventType.DISTANCE
    assert events[i + 3].value == 0  # first circle at centre = last_pos
    assert events[i + 4].type == EventType.POS
    assert events[i + 5].type == EventType.NEW_COMBO
    assert events[i + 6].type == EventType.HITSOUND
    assert events[i + 7].type == EventType.VOLUME
    assert events[i + 7].value == 60  # timing point volume inherited


def test_snapping_divisors(setup):
    _, _, parser = setup
    osu = OSU_STD.replace("100,100,1500,1,0,0:0:0:0:\n", "100,100,1250,1,0,0:0:0:0:\n")
    bm = Beatmap.from_string(osu)
    events, _ = parser.parse(bm)
    circles = [k for k, e in enumerate(events) if e.type == EventType.CIRCLE]
    # t=1250 is a half-beat offset -> divisor 2
    snap = events[circles[1] + 2]
    assert snap == Event(EventType.SNAPPING, 2)


def test_slider_linear_red_anchor(setup):
    _, _, parser = setup
    bm = Beatmap.from_string(OSU_STD.replace(
        "200,200,2000,2,0,L|300:200,1,100,0|0,0:0|0:0,0:0:0:0:",
        "200,200,2000,2,0,L|250:200|300:200,1,100,0|0,0:0|0:0,0:0:0:0:"))
    events, _ = parser.parse(bm)
    types = [e.type for e in events]
    assert EventType.RED_ANCHOR in types


def test_slider_end_time_and_position(setup):
    _, _, parser = setup
    bm = Beatmap.from_string(OSU_STD)
    events, times = parser.parse(bm)
    # slider: length 100px, multiplier 1.4 -> 100/140 beats = 357.14ms
    idx = next(k for k, e in enumerate(events) if e.type == EventType.SLIDER_END)
    end_t = events[idx + 1]
    assert end_t.type == EventType.TIME_SHIFT
    assert end_t.value == pytest.approx(2357, abs=1)


def test_parse_kiai_transitions(setup):
    _, _, parser = setup
    osu = OSU_STD.replace("0,500,4,2,0,60,1,0\n", "0,500,4,2,0,60,1,0\n1000,-100,4,2,0,60,0,1\n2000,-100,4,2,0,60,0,0\n")
    bm = Beatmap.from_string(osu)
    events, times = parser.parse_kiai(bm)
    kiais = [e for e in events if e.type == EventType.KIAI]
    assert [k.value for k in kiais] == [1, 0]


def test_parse_timing_markers(setup):
    _, _, parser = setup
    bm = Beatmap.from_string(OSU_STD)
    events, times = parser.parse_timing(bm)
    types = [e.type for e in events if e.type != EventType.TIME_SHIFT]
    # starts with a timing point (add_timing_points=true in tiny), then beats,
    # measure at every 4th
    assert types[0] == EventType.TIMING_POINT
    assert EventType.BEAT in types
    # t=0..~2357+: beats at 0,500,1000,1500,2000 -> 5 markers
    assert len(types) == 5


def test_mania_column_events():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    parser = BeatmapParser(cfg, tok)
    osu = """osu file format v14
[General]
Mode: 3
[Difficulty]
CircleSize:4
[TimingPoints]
0,500,4,2,0,60,1,0
[HitObjects]
64,192,1000,1,0,0:0:0:0:
448,192,1500,128,0,2500:0:0:0:0:
"""
    bm = Beatmap.from_string(osu)
    events, _ = parser.parse(bm)
    cols = [e for e in events if e.type == EventType.MANIA_COLUMN]
    assert [c.value for c in cols] == [0, 3, 3]  # hold emits column at start+end
    types = [e.type for e in events]
    assert EventType.HOLD_NOTE in types and EventType.HOLD_NOTE_END in types


def test_taiko_drumroll_and_scroll_speed():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    parser = BeatmapParser(cfg, tok)
    osu = """osu file format v14
[General]
Mode: 1
[Difficulty]
CircleSize:4
SliderMultiplier:1.4
[TimingPoints]
0,500,4,2,0,60,1,0
[HitObjects]
256,192,1000,1,0,0:0:0:0:
200,200,2000,2,0,L|300:200,1,100,0|0,0:0|0:0,0:0:0:0:
256,192,4000,12,0,5000,0:0:0:0:
"""
    bm = Beatmap.from_string(osu)
    events, _ = parser.parse(bm)
    types = [e.type for e in events]
    assert EventType.DRUMROLL in types and EventType.DRUMROLL_END in types
    assert EventType.DENDEN in types and EventType.DENDEN_END in types
    assert EventType.SCROLL_SPEED in types
    assert EventType.SLIDER_HEAD not in types


def test_update_event_times_interpolates_anchors():
    events = [
        Event(EventType.SLIDER_HEAD), Event(EventType.TIME_SHIFT, 100),
        Event(EventType.DISTANCE, 10), Event(EventType.BEZIER_ANCHOR),
        Event(EventType.DISTANCE, 10), Event(EventType.BEZIER_ANCHOR),
        Event(EventType.DISTANCE, 10), Event(EventType.LAST_ANCHOR),
        Event(EventType.TIME_SHIFT, 400), Event(EventType.DISTANCE, 10),
        Event(EventType.SLIDER_END), Event(EventType.TIME_SHIFT, 500),
        Event(EventType.DISTANCE, 10),
    ]
    times: list[int] = []
    update_event_times(events, times, types_first=True)
    assert len(times) == len(events)
    anchor_times = [times[i] for i, e in enumerate(events) if e.type == EventType.BEZIER_ANCHOR]
    assert anchor_times == [200, 300]


def test_merge_and_groups():
    a = ([Event(EventType.CIRCLE)], [100])
    b = ([Event(EventType.KIAI, 1)], [50])
    merged, times = merge_events(a, b)
    assert times == [50, 100]
    groups, indices = get_groups(merged, event_times=times, types_first=True)
    assert len(groups) == 2
    assert groups[0].event_type == EventType.KIAI and groups[0].time == 50
