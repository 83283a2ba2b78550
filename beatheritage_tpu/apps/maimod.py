"""MaiMod: AI beatmap modding via teacher-forced surprisal.

(reference: mai_mod.py:76 ai_mod, :23 mod_explanations) Runs the generator in
teacher-forced forward mode over an existing beatmap, converts per-token
relative surprisal into ranked, categorized modding suggestions with
osu://edit timestamp links.
"""

from __future__ import annotations

from . import excepthook  # noqa: F401  (reference: excepthook.py — friendly error hints)

import argparse
import dataclasses
import sys
from pathlib import Path
from typing import Optional

from ..data.event_utils import Group, get_groups
from ..events import ContextType, Event, EventType

SURPRISAL_THRESHOLD = 20.0

POSITION_TYPES = (EventType.DISTANCE, EventType.POS_X, EventType.POS_Y, EventType.POS)
TIMING_MARKS = (EventType.BEAT, EventType.MEASURE, EventType.TIMING_POINT)
ANCHOR_TYPES = (EventType.RED_ANCHOR, EventType.BEZIER_ANCHOR,
                EventType.CATMULL_ANCHOR, EventType.PERFECT_ANCHOR)
HITOBJECT_TYPES = (
    EventType.CIRCLE, EventType.SPINNER, EventType.SPINNER_END,
    EventType.SLIDER_HEAD, *ANCHOR_TYPES, EventType.LAST_ANCHOR,
    EventType.SLIDER_END, EventType.HOLD_NOTE, EventType.HOLD_NOTE_END,
    EventType.DRUMROLL, EventType.DRUMROLL_END, EventType.DENDEN,
    EventType.DENDEN_END)

# (actual event type, model-expected event type) -> (category, message)
EXPLANATIONS = {
    (EventType.DISTANCE, EventType.DISTANCE): ("Compose", "the model expected spacing {expected} instead of {actual}"),
    (EventType.POS_X, EventType.POS_X): ("Compose", "the model expected a different position ({expected} vs {actual})"),
    (EventType.POS_Y, EventType.POS_Y): ("Compose", "the model expected a different position ({expected} vs {actual})"),
    (EventType.POS, EventType.POS): ("Compose", "the model expected a different position ({expected} vs {actual})"),
    (EventType.MANIA_COLUMN, EventType.MANIA_COLUMN): ("Compose", "column {expected} fits better than {actual} here"),
    (EventType.HITSOUND, EventType.HITSOUND): ("Hit Sounds", "hitsound {expected} fits better than {actual} here"),
    (EventType.VOLUME, EventType.VOLUME): ("Hit Sounds", "volume {expected} fits better than {actual}"),
    (EventType.HITSOUND, EventType.NEW_COMBO): ("New Combos", "a new combo likely belongs here"),
    (EventType.NEW_COMBO, EventType.HITSOUND): ("New Combos", "this new combo looks unnecessary"),
    (EventType.HITSOUND, EventType.LAST_ANCHOR): ("Rhythm", "the slider repeats probably should end here"),
    (EventType.HITSOUND, EventType.SLIDER_END): ("Rhythm", "the slider repeats probably should end here"),
    (EventType.SNAPPING, EventType.BEAT): ("Timing", "this object may not be snapped to a beat"),
    (EventType.SNAPPING, EventType.MEASURE): ("Timing", "this object may not be snapped to a beat"),
    (EventType.SNAPPING, EventType.TIMING_POINT): ("Timing", "this object may not be snapped to a beat"),
    (EventType.TIME_SHIFT, EventType.DISTANCE): ("Sliders", "additional slider anchors would fit here"),
    (EventType.DISTANCE, EventType.TIME_SHIFT): ("Sliders", "this looks like it should be the last anchor"),
    (EventType.BEAT, EventType.SNAPPING): ("Timing", "this beat marker looks out of place"),
    (EventType.BEAT, EventType.MEASURE): ("Timing", "a new measure likely starts here"),
    (EventType.BEAT, EventType.TIMING_POINT): ("Timing", "a timing point likely belongs here"),
    (EventType.MEASURE, EventType.SNAPPING): ("Timing", "this measure start looks out of place"),
    (EventType.MEASURE, EventType.BEAT): ("Timing", "this measure start looks out of place"),
    (EventType.MEASURE, EventType.TIMING_POINT): ("Timing", "a timing point likely belongs here"),
    (EventType.TIMING_POINT, EventType.SNAPPING): ("Timing", "this timing point looks unnecessary"),
    (EventType.TIMING_POINT, EventType.BEAT): ("Timing", "this timing point looks unnecessary"),
    (EventType.TIMING_POINT, EventType.MEASURE): ("Timing", "this timing point looks unnecessary"),
}


@dataclasses.dataclass
class Suggestion:
    context_type: ContextType
    time: float
    group: Group
    event: Event
    expected_event: Event
    surprisal: float
    category: str = "Other"
    message: str = ""


def format_event_value(event: Event) -> str:
    """Human-readable event value (reference processor.py:526 process_event)."""
    t = event.type
    if t in (EventType.POS_X, EventType.POS_Y):
        return f"{t.value[4]}:{event.value}"
    if t == EventType.DISTANCE:
        return str(event.value)
    if t == EventType.MANIA_COLUMN:
        return str(event.value + 1)
    if t == EventType.VOLUME:
        return f"{event.value}%"
    if t == EventType.SNAPPING:
        return f"1/{event.value}" if event.value > 0 else "none"
    if t == EventType.TIME_SHIFT:
        v = int(event.value)
        return f"{v // 60000:02}:{(v // 1000) % 60:02}:{v % 1000:03}"
    if t == EventType.SCROLL_SPEED:
        return f"x{event.value / 100:.2f}"
    if t == EventType.HITSOUND:
        names = ["whistle", "finish", "clap"]
        hits = [names[i] for i in range(3) if (event.value >> i) & 1]
        sets_ = ["normal", "soft", "drum"]
        return (f"{sets_[(event.value // 8) % 3]}:{sets_[(event.value // 24) % 3]}"
                f"-{':'.join(hits) if hits else 'none'}")
    return str(event)


def timestamp(t: float) -> str:
    t = int(t)
    return f"{t // 60000:02}:{(t // 1000) % 60:02}:{t % 1000:03}"


def collect_suggestions(out_context_data: list[dict], types_first: bool) -> list[Suggestion]:
    """Filter scored events into ranked suggestions (mai_mod.py:120-215)."""
    suggestions: list[Suggestion] = []
    for context in out_context_data:
        events = context["events"]
        times = context["event_times"]
        groups, group_indices = get_groups(events, event_times=times,
                                           types_first=types_first)
        event_groups = [0] * len(events)
        for gi, indices in enumerate(group_indices):
            for index in indices:
                event_groups[index] = gi

        for i, event in enumerate(events):
            surprisal = float(context["surprisals"][i])
            if surprisal < SURPRISAL_THRESHOLD:
                continue
            expected = context["expected_events"][i]
            if not isinstance(expected, Event):
                continue
            group = groups[event_groups[i]]
            # reference filter rules (mai_mod.py:206-213)
            if group.event_type == EventType.SLIDER_END and event.type in POSITION_TYPES:
                continue
            if (event.type == EventType.TIME_SHIFT
                    and expected.type == EventType.TIME_SHIFT
                    and abs(expected.value - event.value) <= 10):
                continue
            s = Suggestion(context["context_type"], times[i], group, event,
                           expected, surprisal)
            key = (event.type, expected.type)
            if key in EXPLANATIONS:
                s.category, template = EXPLANATIONS[key]
                s.message = template.format(
                    actual=format_event_value(event),
                    expected=format_event_value(expected))
            else:
                s.category = "Other"
                s.message = (f"the model expected {format_event_value(expected)} "
                             f"instead of {format_event_value(event)}")
            suggestions.append(s)
    suggestions.sort(key=lambda s: s.time)
    return suggestions


def suggestions_to_json(suggestions: list[Suggestion]) -> list[dict]:
    """Structured export for the MaiMod web UI (reference mai_mod_ui.py
    renders the same fields: timestamp link, severity, category, message)."""
    return [{
        "time": int(s.time),
        "timestamp": timestamp(s.time),
        "edit_link": f"osu://edit/{timestamp(s.time)}",
        "severity": round(s.surprisal / 10, 1),
        "category": s.category,
        "message": s.message,
        "actual": format_event_value(s.event),
        "expected": format_event_value(s.expected_event),
    } for s in sorted(suggestions, key=lambda s: -s.surprisal)]


def render_report(suggestions: list[Suggestion], raw: bool = False) -> str:
    lines: list[str] = []
    if raw:
        for s in suggestions:
            lines.append(f"{timestamp(s.time)}\t{s.surprisal / 10:.1f}\t"
                         f"{s.category}\t{s.message}")
        return "\n".join(lines)
    by_category: dict[str, list[Suggestion]] = {}
    for s in suggestions:
        by_category.setdefault(s.category, []).append(s)
    for category in sorted(by_category):
        items = by_category[category]
        lines.append(f"== {category} ({len(items)}) ==")
        for s in sorted(items, key=lambda s: -s.surprisal)[:25]:
            lines.append(f"  osu://edit/{timestamp(s.time)}  "
                         f"({s.surprisal / 10:.0f})  {s.message}")
        lines.append("")
    if not suggestions:
        lines.append("No issues found - the model agrees with this beatmap.")
    return "\n".join(lines)


def run_mai_mod(args, *, audio_path=None, beatmap_path=None,
                params=None, tokenizer=None, verbose=True) -> list[Suggestion]:
    """Full MaiMod pass (reference mai_mod.py:76)."""
    from ..inference.pipeline import load_model, load_tokenizer  # noqa: PLC0415
    from ..inference.preprocessor import Preprocessor  # noqa: PLC0415
    from ..inference.processor import Processor, generation_config_from_beatmap  # noqa: PLC0415
    from ..osu.beatmap import Beatmap  # noqa: PLC0415

    i_args = args.inference if hasattr(args, "inference") else args
    audio_path = audio_path or i_args.audio_path
    beatmap_path = beatmap_path or i_args.beatmap_path
    if not Path(audio_path).is_file():
        raise FileNotFoundError(f"Provided audio file path does not exist: {audio_path}")
    if not Path(beatmap_path).is_file():
        raise FileNotFoundError(f"Provided beatmap file path does not exist: {beatmap_path}")

    if tokenizer is None:
        tokenizer = load_tokenizer(i_args)
    if params is None:
        params, _ = load_model(i_args, tokenizer)

    beatmap = Beatmap.from_path(beatmap_path)
    generation_config = generation_config_from_beatmap(beatmap, tokenizer)

    preprocessor = Preprocessor(i_args, parallel=False)
    processor = Processor(i_args, params, tokenizer)
    audio = preprocessor.load(audio_path)
    sequences = preprocessor.segment(audio)
    result = processor.ai_mod(sequences=sequences,
                              generation_config=generation_config,
                              beatmap_path=beatmap_path, verbose=verbose)
    return collect_suggestions(result, i_args.train.data.types_first)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="MaiMod: AI beatmap modding")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override
    apply_device_override(ns.overrides)
    from ..config import MaiModConfig, load_config  # noqa: PLC0415
    # MaiMod composes an inference config (reference configs/mai_mod.yaml)
    from ..config import InferenceConfig  # noqa: PLC0415
    inf = load_config(InferenceConfig, "inference", ns.config_name,
                      overrides=[o for o in ns.overrides
                                 if not o.startswith(("beatmap_path=", "raw_output="))])
    args = MaiModConfig(inference=inf)
    json_path = ""
    for o in ns.overrides:
        if o.startswith("beatmap_path="):
            args.beatmap_path = o.split("=", 1)[1]
            args.inference.beatmap_path = args.beatmap_path
        if o.startswith("audio_path="):
            args.audio_path = o.split("=", 1)[1]
        if o.startswith("raw_output="):
            args.raw_output = o.split("=", 1)[1].lower() == "true"
        if o.startswith("json_path="):
            json_path = o.split("=", 1)[1]
    suggestions = run_mai_mod(args, audio_path=args.audio_path or inf.audio_path,
                              beatmap_path=args.beatmap_path or inf.beatmap_path)
    if json_path:
        import json  # noqa: PLC0415
        Path(json_path).write_text(json.dumps(
            suggestions_to_json(suggestions), indent=1))
        print(f"[maimod] wrote {len(suggestions)} suggestions to {json_path}")
    print(render_report(suggestions, raw=args.raw_output))
    return 0


if __name__ == "__main__":
    sys.exit(main())
