"""MaiMod surprisal pass + suggestion assembly tests."""

import numpy as np
import pytest

from beatheritage_tpu.apps.maimod import (
    Suggestion,
    collect_suggestions,
    format_event_value,
    render_report,
    run_mai_mod,
    timestamp,
)
from beatheritage_tpu.config import InferenceConfig, MaiModConfig, load_config
from beatheritage_tpu.data.audio import save_wav
from beatheritage_tpu.events import ContextType, Event, EventType


def test_format_event_value():
    assert format_event_value(Event(EventType.DISTANCE, 42)) == "42"
    assert format_event_value(Event(EventType.VOLUME, 60)) == "60%"
    assert format_event_value(Event(EventType.SNAPPING, 4)) == "1/4"
    assert format_event_value(Event(EventType.SNAPPING, 0)) == "none"
    assert format_event_value(Event(EventType.TIME_SHIFT, 61234)) == "01:01:234"
    assert format_event_value(Event(EventType.SCROLL_SPEED, 150)) == "x1.50"
    assert timestamp(61234) == "01:01:234"


def test_collect_suggestions_filters_and_categorizes():
    events = [
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1000),
        Event(EventType.SNAPPING, 1), Event(EventType.DISTANCE, 50),
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1500),
        Event(EventType.SNAPPING, 1), Event(EventType.DISTANCE, 80),
    ]
    times = [1000, 1000, 1000, 1000, 1500, 1500, 1500, 1500]
    surprisals = np.zeros(len(events), np.float32)
    expected = np.array(events, dtype=object).copy()
    # high surprisal on the second distance, expecting a different value
    surprisals[7] = 35.0
    expected[7] = Event(EventType.DISTANCE, 120)
    # below threshold: ignored
    surprisals[3] = 5.0
    # time shift within 10 steps of expected: filtered out
    surprisals[5] = 50.0
    expected[5] = Event(EventType.TIME_SHIFT, 1505)

    ctx = {"context_type": ContextType.MAP, "events": events,
           "event_times": times, "surprisals": surprisals,
           "expected_events": expected}
    suggestions = collect_suggestions([ctx], types_first=True)
    assert len(suggestions) == 1
    s = suggestions[0]
    assert s.category == "Compose"
    assert "120" in s.message and "80" in s.message
    report = render_report(suggestions)
    assert "Compose" in report and "osu://edit/00:01:500" in report


def test_render_report_empty():
    assert "No issues" in render_report([])


@pytest.fixture(scope="module")
def wav_and_map(tmp_path_factory):
    root = tmp_path_factory.mktemp("maimod")
    sr = 16000
    audio = (0.1 * np.sin(2 * np.pi * 220 * np.arange(3 * sr) / sr)).astype(np.float32)
    wav = root / "audio.wav"
    save_wav(wav, audio, sr)
    osu = root / "map.osu"
    objects = "\n".join(f"{100 + i * 30},{192},{500 + i * 250},1,0,0:0:0:0:"
                        for i in range(8))
    osu.write_text(f"""osu file format v14
[General]
AudioFilename: audio.wav
Mode: 0
[Metadata]
Title:Test
BeatmapID:1
[Difficulty]
CircleSize:4
SliderMultiplier:1.4
[TimingPoints]
500,250,4,2,0,60,1,0
[HitObjects]
{objects}
""")
    return str(wav), str(osu)


def test_run_mai_mod_end_to_end(wav_and_map):
    wav, osu = wav_and_map
    inf = load_config(InferenceConfig, "inference", "tiny")
    args = MaiModConfig(inference=inf, audio_path=wav, beatmap_path=osu)
    suggestions = run_mai_mod(args, audio_path=wav, beatmap_path=osu,
                              verbose=False)
    # random weights produce high surprisal everywhere: suggestions exist
    # and are well-formed
    assert isinstance(suggestions, list)
    for s in suggestions[:5]:
        assert s.surprisal >= 20.0
        assert s.message
        assert s.time >= 0
