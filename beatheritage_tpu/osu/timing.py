"""osu! timing-point editing semantics.

Insert/overwrite timing points with the editor's rules: red (uninherited) and
green (inherited) lines may coexist at one offset, redundant green lines are
omitted, and field updates apply only to matching kinds.
(reference: osuT5/osuT5/inference/timing_points_change.py:37)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

from .beatmap import TimingPoint


def clone_timing_point(tp: TimingPoint) -> TimingPoint:
    return dataclasses.replace(tp)


def equivalent_effect(a: TimingPoint, b: TimingPoint) -> bool:
    """True when b already produces the same playback effect as a."""
    return (a.ms_per_beat == b.ms_per_beat
            and a.meter == b.meter
            and a.sample_type == b.sample_type
            and a.sample_index == b.sample_index
            and a.volume == b.volume
            and (a.parent is None) == (b.parent is None)
            and a.kiai_mode == b.kiai_mode)


def sort_timing_points(tps: list[TimingPoint]) -> list[TimingPoint]:
    """Sort by offset; at equal offsets red lines come before green lines."""
    return sorted(tps, key=lambda tp: (tp.offset, tp.parent is not None))


@dataclasses.dataclass
class TimingPointsChange:
    """A single requested edit at `point.offset`.

    Boolean flags select which of `point`'s fields to impose on the timeline.
    `uninherited=True` requests a red line, otherwise a green line.
    """

    point: TimingPoint
    mpb: bool = False
    meter: bool = False
    sampleset: bool = False
    index: bool = False
    volume: bool = False
    uninherited: bool = False
    kiai: bool = False
    fuzzyness: float = 2.0  # ms window for "same offset"

    def apply(self, timeline: list[TimingPoint], all_after: bool = False) -> list[TimingPoint]:
        target = self.point
        prev_tp: Optional[TimingPoint] = None
        here: list[TimingPoint] = []
        here_red = False
        here_green = False

        for tp in timeline:
            if tp is None:
                continue
            if tp.offset < target.offset and (prev_tp is None or tp.offset >= prev_tp.offset):
                prev_tp = tp
            if math.isclose(tp.offset, target.offset, abs_tol=self.fuzzyness):
                here.append(tp)
                here_red = here_red or tp.parent is None
                here_green = here_green or tp.parent is not None

        if here:
            prev_tp = here[-1]

        new_tp: Optional[TimingPoint] = None
        if self.uninherited and not here_red:
            # introduce a red line, inheriting cosmetic fields from context
            new_tp = clone_timing_point(target if prev_tp is None else prev_tp)
            new_tp.offset = target.offset
            new_tp.parent = None
            new_tp.uninherited = True
            here.append(new_tp)
        elif not self.uninherited and (not here or (self.mpb and not here_green)):
            # introduce a green line based on the previous point
            if prev_tp is None:
                new_tp = clone_timing_point(target)
                new_tp.parent = target
            else:
                new_tp = clone_timing_point(prev_tp)
                new_tp.offset = target.offset
                new_tp.parent = prev_tp if prev_tp.parent is None else prev_tp.parent
                if prev_tp.parent is None:
                    new_tp.ms_per_beat = -100.0
            new_tp.uninherited = False
            here.append(new_tp)

        for tp in here:
            if self.mpb and (self.uninherited == (tp.parent is None)):
                tp.ms_per_beat = target.ms_per_beat
            if self.meter and self.uninherited and tp.parent is None:
                tp.meter = target.meter
            if self.sampleset:
                tp.sample_type = target.sample_type
            if self.index:
                tp.sample_index = target.sample_index
            if self.volume:
                tp.volume = target.volume
            if self.kiai:
                tp.kiai_mode = target.kiai_mode

        # only keep the new point when it actually changes something
        if new_tp is not None and (prev_tp is None
                                   or not equivalent_effect(new_tp, prev_tp)
                                   or self.uninherited):
            timeline.append(new_tp)

        if all_after:
            for tp in timeline:
                if tp.offset > target.offset:
                    if self.sampleset:
                        tp.sample_type = target.sample_type
                    if self.index:
                        tp.sample_index = target.sample_index
                    if self.volume:
                        tp.volume = target.volume
                    if self.kiai:
                        tp.kiai_mode = target.kiai_mode

        return sort_timing_points(timeline)


def apply_timing_changes(timeline: list[TimingPoint],
                         changes: list[TimingPointsChange],
                         all_after: bool = False) -> list[TimingPoint]:
    for change in sorted(changes, key=lambda c: c.point.offset):
        timeline = change.apply(timeline, all_after)
    return timeline
