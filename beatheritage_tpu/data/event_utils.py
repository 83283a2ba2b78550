"""Event-list utilities: time propagation, merging, filtering, grouping.

(reference: osuT5/osuT5/dataset/data_utils.py:165-513)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from ..events import (
    Event,
    EventType,
    NON_TIMED_EVENTS,
    TIMED_EVENTS,
    TYPE_EVENTS,
)
from ..osu.beatmap import Beatmap, HoldNote, TimingPoint

MILISECONDS_PER_SECOND = 1000


def update_event_times(events: list[Event], event_times: list[int],
                       end_time: Optional[float] = None,
                       types_first: bool = False) -> None:
    """Extend `event_times` to cover newly appended events.

    Times come from TIME_SHIFT values; anchor events (which carry no time
    token) get times linearly interpolated between their neighbouring timed
    events. Mutates `event_times` in place.
    """
    start_index = len(event_times)
    end_index = len(events)
    if start_index == end_index:
        return

    current_time = 0 if not event_times else event_times[-1]
    for i in range(start_index, end_index):
        if types_first:
            if i + 1 < end_index and events[i + 1].type == EventType.TIME_SHIFT:
                current_time = events[i + 1].value
        elif events[i].type == EventType.TIME_SHIFT:
            current_time = events[i].value
        event_times.append(current_time)

    # interpolate times for anchors: walk towards the group's time token.
    # Precompute, for every position, the nearest TIME_SHIFT in walk
    # direction and how many anchors sit in between — the naive per-anchor
    # rescan is O(run^2) and dominated e2e latency on long generations.
    step = 1 if types_first else -1
    n = len(events)
    fallback_end = end_time if end_time is not None else (
        event_times[-1] if event_times else 0)
    # target_time[i]: time of the nearest TIME_SHIFT from i in step
    # direction (0 / end fallback past the ends);
    # anchors_to_target[i]: NON_TIMED count in [i, that TIME_SHIFT)
    target_time = [0] * n
    anchors_to_target = [0] * n
    scan = range(n - 1, -1, -1) if step == 1 else range(n)
    next_time = fallback_end if step == 1 else 0
    next_anchors = 0
    for j in scan:
        ev = events[j]
        if ev.type == EventType.TIME_SHIFT:
            next_time = event_times[j]
            next_anchors = 0
        elif ev.type in NON_TIMED_EVENTS:
            next_anchors += 1
        target_time[j] = next_time
        anchors_to_target[j] = next_anchors

    if types_first:
        index = range(start_index, end_index)
        current_time = 0 if not event_times else event_times[start_index]
    else:
        index = range(end_index - 1, start_index - 1, -1)
        current_time = fallback_end
    # walk the events once; inside an anchor run each NON_TIMED event steps
    # `current_time` one even fraction closer to the run's destination time
    # (the nearest TIME_SHIFT precomputed above), and attribute events
    # between anchors inherit the running value; a TIMED event ends the run
    in_anchor_run = False
    for i in index:
        etype = events[i].type
        if etype in TIMED_EVENTS:
            in_anchor_run = False
        if etype in NON_TIMED_EVENTS:
            in_anchor_run = True
            dest = target_time[i]
            remaining = anchors_to_target[i]
            current_time = int(
                (current_time - dest) / (remaining + 1) * remaining + dest)
            event_times[i] = current_time
        elif in_anchor_run:
            event_times[i] = current_time
        else:
            current_time = event_times[i]


def merge_events(a: tuple[list[Event], list[int]],
                 b: tuple[list[Event], list[int]]) -> tuple[list[Event], list[int]]:
    """Stable merge of two time-sorted event streams (a wins ties)."""
    events: list[Event] = []
    times: list[int] = []
    i = j = 0
    ev_a, t_a = a
    ev_b, t_b = b
    while i < len(ev_a) and j < len(ev_b):
        if t_a[i] <= t_b[j]:
            events.append(ev_a[i])
            times.append(t_a[i])
            i += 1
        else:
            events.append(ev_b[j])
            times.append(t_b[j])
            j += 1
    events.extend(ev_a[i:])
    events.extend(ev_b[j:])
    times.extend(t_a[i:])
    times.extend(t_b[j:])
    return events, times


def remove_events_of_type(events: list[Event], event_times: list[int],
                          event_types: list[EventType]) -> tuple[list[Event], list[int]]:
    keep = [(e, t) for e, t in zip(events, event_times) if e.type not in event_types]
    return [e for e, _ in keep], [t for _, t in keep]


def events_of_type(events: list[Event], event_times: list[int],
                   event_types: list[EventType]) -> tuple[list[Event], list[int]]:
    keep = [(e, t) for e, t in zip(events, event_times) if e.type in event_types]
    return [e for e, _ in keep], [t for _, t in keep]


def speed_events(events: tuple[list[Event], list[int]],
                 speed: float) -> tuple[list[Event], list[int]]:
    """Re-time an event stream by a speed multiplier (DT augmentation)."""
    for event in events[0]:
        if event.type == EventType.TIME_SHIFT:
            event.value = int(event.value / speed)
    return events[0], [int(t / speed) for t in events[1]]


@dataclasses.dataclass
class Group:
    """One decoded hit-object/timing group reassembled from tokens."""

    event_type: Optional[EventType] = None
    value: Optional[int] = None
    time: int = 0
    distance: Optional[int] = None
    x: Optional[float] = None
    y: Optional[float] = None
    new_combo: bool = False
    hitsounds: list[int] = dataclasses.field(default_factory=list)
    samplesets: list[int] = dataclasses.field(default_factory=list)
    additions: list[int] = dataclasses.field(default_factory=list)
    volumes: list[int] = dataclasses.field(default_factory=list)
    scroll_speed: Optional[float] = None


# scalar Group fields settable straight from one event (value converter per
# field); list-like fields (hitsounds, volumes) are handled separately below
_SCALAR_FIELDS: dict[EventType, tuple[str, Callable[[int], object]]] = {
    EventType.TIME_SHIFT: ("time", int),
    EventType.DISTANCE: ("distance", int),
    EventType.POS_X: ("x", float),
    EventType.POS_Y: ("y", float),
    EventType.SCROLL_SPEED: ("scroll_speed", lambda v: v / 100),
}


def _unpack_hitsound(group: Group, packed: int) -> None:
    """HITSOUND packs hits + 8*(sampleset-1) + 24*(addition-1)
    (see parser._hitsound_value); split back into the three components."""
    group.hitsounds.append((packed % 8) * 2)
    group.samplesets.append((packed // 8) % 3 + 1)
    group.additions.append((packed // 24) % 3 + 1)


def get_groups(events: list[Event], *, event_times: Optional[list[int]] = None,
               types_first: bool = False) -> tuple[list[Group], list[list[int]]]:
    """Reassemble a flat event list into per-object Groups.

    Behavior-pinned to the reference's group assembly
    (reference: osuT5/osuT5/dataset/data_utils.py:363 get_groups) so decoded
    token streams produce identical objects; the dispatch here is
    table-driven rather than an if/elif chain.

    A group = one hit object / timing marker plus its attribute events. With
    ``types_first`` the type token *opens* a group (token order
    [type, attrs...]); otherwise it *closes* one ([attrs..., type]).
    """
    groups: list[Group] = []
    group_indices: list[list[int]] = []
    group = Group()
    indices: list[int] = []

    def close(keep_last_for_next: bool) -> None:
        nonlocal group, indices
        groups.append(group)
        group = Group()
        if keep_last_for_next:
            group_indices.append(indices[:-1])
            indices = indices[-1:]
        else:
            group_indices.append(indices)
            indices = []

    for i, event in enumerate(events):
        indices.append(i)
        scalar = _SCALAR_FIELDS.get(event.type)
        if scalar is not None:
            field, conv = scalar
            setattr(group, field, conv(event.value))
        elif event.type == EventType.NEW_COMBO:
            group.new_combo = True
        elif event.type == EventType.HITSOUND:
            _unpack_hitsound(group, event.value)
        elif event.type == EventType.VOLUME:
            group.volumes.append(event.value)
        elif event.type in TYPE_EVENTS:
            if types_first and group.event_type is not None:
                close(keep_last_for_next=True)  # this token starts the next group
            group.event_type = event.type
            group.value = event.value
            if event_times is not None:
                group.time = event_times[i]
            if not types_first:
                close(keep_last_for_next=False)

    if group.event_type is not None:
        close(keep_last_for_next=False)
    elif indices and group_indices:
        # trailing attribute events belong to the last closed group
        group_indices[-1].extend(indices)

    return groups, group_indices


# -- beatmap statistics (special-token conditioning inputs) -------------------

def get_hold_note_ratio(beatmap: Beatmap) -> Optional[float]:
    notes = beatmap.hit_objects()
    if not notes:
        return None
    return sum(isinstance(n, HoldNote) for n in notes) / len(notes)


def get_scroll_speed_ratio(beatmap: Beatmap) -> Optional[float]:
    """Scroll-speed changes per distinct hit-object time."""
    notes = beatmap.hit_objects()
    if not notes:
        return None
    last_time = -1.0
    num_note_times = 0
    for note in notes:
        if note.time != last_time:
            num_note_times += 1
            last_time = note.time
    last_speed = -1.0
    num_changes = 0
    for tp in beatmap.timing_points:
        if tp.parent is None:
            last_speed = 1.0
        else:
            speed = -100 / tp.ms_per_beat if tp.ms_per_beat else 1.0
            if speed != last_speed and last_speed != -1:
                num_changes += 1
            last_speed = speed
    return num_changes / num_note_times


def get_hitsounded_status(beatmap: Beatmap) -> bool:
    return any(n.hitsound != 0 for n in beatmap.hit_objects())


def get_song_length(samples, sample_rate: int) -> float:
    """Audio length in milliseconds."""
    return len(samples) / sample_rate * MILISECONDS_PER_SECOND


def get_median_mpb(timing_points: list[TimingPoint], last_time: float) -> float:
    """Duration-weighted modal beat length, osu!-stable style
    (reference data_utils.py:482-513)."""
    this_beat_length = 0.0
    bpm_durations: dict[float, int] = {}
    for i in range(len(timing_points) - 1, -1, -1):
        tp = timing_points[i]
        offset = int(tp.offset)
        if tp.parent is None:
            this_beat_length = tp.ms_per_beat
        if this_beat_length == 0 or offset > last_time or (tp.parent is not None and i > 0):
            continue
        duration = int(last_time - (0 if i == 0 else offset))
        bpm_durations[this_beat_length] = bpm_durations.get(this_beat_length, 0) + duration
        last_time = offset
    longest = 0
    median = 0.0
    for mpb, duration in bpm_durations.items():
        if duration > longest:
            longest = duration
            median = mpb
    return median


def get_median_mpb_beatmap(beatmap: Beatmap) -> float:
    last_time = max(
        (ho.end_time if isinstance(ho, HoldNote) else ho.time)
        for ho in beatmap.hit_objects())
    return get_median_mpb(beatmap.timing_points, int(last_time))
