"""Timing-inference + event-utils parity against the ACTUAL reference code.

Imports the reference `Postprocessor.generate_timing` / `resnap_events` and
`data_utils.update_event_times` / `get_groups` (read-only import of public
reference code, heavy deps stubbed — the test_tokenizer_golden.py pattern)
and diffs outputs over randomized event streams, including mid-song
BPM-change cases. This goldenizes the most correctness-critical host code:
redline splitting, human BPM rounding, meter fixing, resnapping, and group
assembly. (reference: osuT5/osuT5/inference/postprocessor.py:557-874,
osuT5/osuT5/dataset/data_utils.py:165-421.)
"""

from __future__ import annotations

import dataclasses
import sys
import types
from datetime import timedelta
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFERENCE.is_dir(),
                                reason="reference tree not mounted")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)


@dataclasses.dataclass
class _SliderTimingPoint:
    """Functional stand-in for slider.TimingPoint: positional ctor and the
    attributes the reference timing code reads/writes."""
    offset: timedelta
    ms_per_beat: float
    meter: int = 4
    sample_type: int = 2
    sample_set: int = 0
    volume: int = 100
    parent: object = None
    kiai_mode: bool = False


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, str(REFERENCE))

    class ConfigStore:
        @staticmethod
        def instance():
            class _I:
                def store(self, *a, **k):
                    pass
            return _I()

    class OmegaConf:
        @staticmethod
        def register_new_resolver(*a, **k):
            pass

    _stub("hydra")
    _stub("hydra.core")
    _stub("hydra.core.config_store", ConfigStore=ConfigStore)
    _stub("omegaconf", OmegaConf=OmegaConf, MISSING="???")
    _stub("pydub", AudioSegment=object)
    _stub("config", InferenceConfig=object)
    slider_attrs = {n: type(n, (), {}) for n in (
        "Beatmap", "Circle", "Slider", "Spinner", "HoldNote", "Position",
        "Curve", "Linear", "Catmull", "Perfect", "MultiBezier")}
    slider_attrs["TimingPoint"] = _SliderTimingPoint
    _stub("slider", **slider_attrs)
    _stub("slider.beatmap", **slider_attrs)
    _stub("slider.curve", **slider_attrs)
    _stub("slider.mod", **slider_attrs)
    _stub("slider.timing", **slider_attrs)

    import osuT5.osuT5.dataset.data_utils as ref_du
    import osuT5.osuT5.inference.postprocessor as ref_pp
    return ref_pp, ref_du


@pytest.fixture(scope="module")
def processors(ref_modules):
    ref_pp, _ = ref_modules
    ref = ref_pp.Postprocessor.__new__(ref_pp.Postprocessor)
    ref.offset = 0
    ref.beat_length = 500.0
    ref.timing_leniency = 20
    ref.types_first = True
    ref.has_pos = True
    ref.mania_bpm_normalized_scroll_speed = False
    ref.start_time = None
    ref.end_time = None
    ref.has_sv = True

    from beatheritage_tpu.config import InferenceConfig
    from beatheritage_tpu.inference.postprocessor import Postprocessor

    args = InferenceConfig()
    args.timing_leniency = 20
    args.train.data.types_first = True
    ours = Postprocessor(args)
    assert ours.types_first and ours.timing_leniency == 20
    return ours, ref


def _make_marker_stream(rng, ours_mod, ref_mod, *, n_segments, jitter):
    """Timing-marker event stream from a ground-truth variable-BPM plan.

    Emits [BEAT|MEASURE|TIMING_POINT, TIME_SHIFT] pairs (types_first) with
    integer-ms jitter, mimicking decoded model output over a song whose BPM
    changes at segment boundaries.
    """
    o_ev, r_ev = [], []

    def emit(kind: str, t: int):
        for mod, out in ((ours_mod, o_ev), (ref_mod, r_ev)):
            out.append(mod.Event(mod.EventType[kind], 0))
            out.append(mod.Event(mod.EventType.TIME_SHIFT, int(t)))

    t = float(rng.integers(40, 400))
    for seg in range(n_segments):
        bpm = float(rng.integers(80, 220))
        mpb = 60000.0 / bpm
        n_beats = int(rng.integers(8, 24))
        meter = 4
        for b in range(n_beats):
            jt = int(rng.integers(-jitter, jitter + 1)) if jitter else 0
            if b == 0 and seg > 0:
                emit("TIMING_POINT", round(t) + jt)
            elif b % meter == 0:
                emit("MEASURE", round(t) + jt)
            else:
                emit("BEAT", round(t) + jt)
            t += mpb
    return o_ev, r_ev


def _timing_tuples_ours(timing):
    return [(round(tp.offset), round(tp.ms_per_beat, 6), tp.meter,
             tp.parent is None) for tp in timing]


def _timing_tuples_ref(timing):
    return [(round(tp.offset.total_seconds() * 1000),
             round(tp.ms_per_beat, 6), tp.meter, tp.parent is None)
            for tp in timing]


@pytest.mark.parametrize("seed", range(8))
def test_generate_timing_matches_reference(processors, seed):
    """Redline placement, human BPM rounding, meter fixing, and the
    least-squares redline split must agree with the reference on noisy
    variable-BPM marker streams (reference postprocessor.py:656-830)."""
    ours, ref = processors
    import beatheritage_tpu.events as ours_ev
    import osuT5.osuT5.inference.postprocessor as ref_pp

    rng = np.random.default_rng(seed)
    n_segments = int(rng.integers(1, 4))
    jitter = int(rng.integers(0, 4))
    o_ev, r_ev = _make_marker_stream(rng, ours_ev, ref_pp,
                                     n_segments=n_segments, jitter=jitter)

    got = _timing_tuples_ours(ours.generate_timing(o_ev))
    expect = _timing_tuples_ref(ref.generate_timing(r_ev))
    assert got == expect, f"seed={seed} segments={n_segments} jitter={jitter}"


def test_generate_timing_empty_and_single_marker(processors):
    ours, ref = processors
    import beatheritage_tpu.events as ours_ev
    import osuT5.osuT5.inference.postprocessor as ref_pp

    assert ours.generate_timing([]) == [] and ref.generate_timing([]) == []
    o = [ours_ev.Event(ours_ev.EventType.MEASURE, 0),
         ours_ev.Event(ours_ev.EventType.TIME_SHIFT, 1000)]
    r = [ref_pp.Event(ref_pp.EventType.MEASURE, 0),
         ref_pp.Event(ref_pp.EventType.TIME_SHIFT, 1000)]
    assert _timing_tuples_ours(ours.generate_timing(o)) == \
        _timing_tuples_ref(ref.generate_timing(r))


def _make_timing_pair(spec):
    """Build both sides' timing lists from (offset_ms, mpb, meter) specs."""
    from beatheritage_tpu.osu.beatmap import TimingPoint as OurTP
    ours = [OurTP(offset=float(o), ms_per_beat=mpb, meter=m)
            for o, mpb, m in spec]
    ref = [_SliderTimingPoint(timedelta(milliseconds=o), mpb, m)
           for o, mpb, m in spec]
    return ours, ref


@pytest.mark.parametrize("seed", range(6))
def test_resnap_events_matches_reference(processors, seed):
    """Beat-snapping with ignore-tick divisors and redline boundaries
    (reference postprocessor.py:557-654)."""
    ours, ref = processors
    import beatheritage_tpu.events as ours_ev
    import osuT5.osuT5.inference.postprocessor as ref_pp

    rng = np.random.default_rng(100 + seed)
    spec = [(0, 60000.0 / 180, 4)]
    if seed % 2:
        spec.append((int(rng.integers(4000, 8000)), 60000.0 / 120, 4))

    o_timing, r_timing = _make_timing_pair(spec)
    o_ev, r_ev = [], []
    t = 37
    for _ in range(120):
        divisor = int(rng.choice([0, 1, 2, 4, 6, 8, 12, 16]))
        for mod, out in ((ours_ev, o_ev), (ref_pp, r_ev)):
            out.append(mod.Event(mod.EventType.CIRCLE, 0))
            out.append(mod.Event(mod.EventType.TIME_SHIFT, t))
            if divisor:
                out.append(mod.Event(mod.EventType.SNAPPING, divisor))
        t += int(rng.integers(50, 450))

    got = ours.resnap_events(o_ev, o_timing)
    expect = ref.resnap_events(r_ev, r_timing)
    assert [(e.type.name, e.value) for e in got] == \
        [(e.type.name, e.value) for e in expect]


def _random_object_stream(rng, mod, n_groups, types_first=True):
    """Decoded-style stream of circles/sliders/spinners with distances,
    positions, hitsounds, new combos — the get_groups input shape."""
    E, T = mod.Event, mod.EventType
    ev = []
    t = 200
    for _ in range(n_groups):
        kind = rng.choice(["circle", "slider", "spinner", "beat"])
        def grp(type_name, time=None, tail=()):
            body = []
            if types_first:
                body.append(E(T[type_name], 0))
            body.append(E(T.TIME_SHIFT, int(time if time is not None else t)))
            if not types_first:
                body.append(E(T[type_name], 0))
            body.extend(tail)
            return body
        if kind == "circle":
            tail = [E(T.DISTANCE, int(rng.integers(0, 300))),
                    E(T.HITSOUND, int(rng.integers(0, 30)))]
            if rng.random() < 0.3:
                tail.insert(0, E(T.NEW_COMBO, 0))
            ev += grp("CIRCLE", tail=tail)
        elif kind == "slider":
            ev += grp("SLIDER_HEAD",
                      tail=[E(T.DISTANCE, int(rng.integers(0, 200)))])
            ev += grp("LAST_ANCHOR", time=t + 120,
                      tail=[E(T.DISTANCE, int(rng.integers(10, 80)))])
            ev += grp("SLIDER_END", time=t + 240,
                      tail=[E(T.DISTANCE, int(rng.integers(10, 80)))])
        elif kind == "spinner":
            ev += grp("SPINNER")
            ev += grp("SPINNER_END", time=t + 400)
        else:
            ev += grp("BEAT")
        t += int(rng.integers(100, 600))
    return ev


@pytest.mark.parametrize("types_first", [True, False])
@pytest.mark.parametrize("seed", range(4))
def test_get_groups_matches_reference(ref_modules, seed, types_first):
    """Group assembly parity over randomized decoded streams
    (reference data_utils.py:363-421)."""
    _, ref_du = ref_modules
    import beatheritage_tpu.data.event_utils as ours_du
    import beatheritage_tpu.events as ours_ev

    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 40))
    o_ev = _random_object_stream(np.random.default_rng(seed), ours_ev, n,
                                 types_first)
    r_ev = _random_object_stream(np.random.default_rng(seed), ref_du, n,
                                 types_first)

    o_groups, o_idx = ours_du.get_groups(o_ev, types_first=types_first)
    r_groups, r_idx = ref_du.get_groups(r_ev, types_first=types_first)

    def tup(g):
        et = getattr(g.event_type, "name", None)
        return (et, g.value, g.time, g.distance, g.x, g.y, g.new_combo,
                list(g.hitsounds), list(g.samplesets), list(g.additions),
                list(g.volumes), g.scroll_speed)

    assert [tup(g) for g in o_groups] == [tup(g) for g in r_groups]
    assert o_idx == r_idx


@pytest.mark.parametrize("types_first", [True, False])
@pytest.mark.parametrize("seed", range(4))
def test_update_event_times_matches_reference(ref_modules, seed, types_first):
    """Anchor-time interpolation parity, incremental and from-scratch
    (reference data_utils.py:165-247)."""
    _, ref_du = ref_modules
    import beatheritage_tpu.data.event_utils as ours_du
    import beatheritage_tpu.events as ours_ev

    n = 5 + seed * 7
    o_ev = _random_object_stream(np.random.default_rng(seed), ours_ev, n,
                                 types_first)
    r_ev = _random_object_stream(np.random.default_rng(seed), ref_du, n,
                                 types_first)
    end_time = 60_000.0

    o_times: list[int] = []
    r_times: list[int] = []
    ours_du.update_event_times(o_ev, o_times, end_time, types_first)
    ref_du.update_event_times(r_ev, r_times, end_time, types_first)
    assert o_times == r_times

    # incremental: extend the stream and update again
    o2 = _random_object_stream(np.random.default_rng(seed + 50), ours_ev, 6,
                               types_first)
    r2 = _random_object_stream(np.random.default_rng(seed + 50), ref_du, 6,
                               types_first)
    o_ev += o2
    r_ev += r2
    ours_du.update_event_times(o_ev, o_times, end_time, types_first)
    ref_du.update_event_times(r_ev, r_times, end_time, types_first)
    assert o_times == r_times
