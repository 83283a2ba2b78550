"""Beatmap -> event-stream parser.

Produces the exact event sequences the reference emits for a given beatmap
(reference: osuT5/osuT5/dataset/osu_parser.py:17), operating on our own
Beatmap model (float milliseconds) instead of the slider library.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..events import Event, EventType
from ..osu.beatmap import Beatmap, Circle, HoldNote, Slider, Spinner, TimingPoint
from .event_utils import get_median_mpb_beatmap, merge_events, speed_events

EventStream = tuple[list[Event], list[int]]


def _ms(time: float) -> int:
    return int(time + 1e-5)


class BeatmapParser:
    """Stateless parser configured from a TrainConfig's data section."""

    def __init__(self, args, tokenizer) -> None:
        d = args.data
        self.types_first = d.types_first
        self.add_timing = d.add_timing
        self.add_snapping = d.add_snapping
        self.add_timing_points = d.add_timing_points
        self.add_hitsounds = d.add_hitsounds
        self.add_distances = d.add_distances
        self.add_positions = d.add_positions
        self.add_kiai = d.add_kiai
        self.add_sv = d.add_sv
        self.add_mania_sv = d.add_mania_sv
        self.mania_bpm_normalized_scroll_speed = d.mania_bpm_normalized_scroll_speed
        self.position_precision = d.position_precision
        self.position_split_axes = d.position_split_axes
        self.x_min, self.x_max, self.y_min, self.y_max = d.position_range
        if self.add_distances:
            dist_range = tokenizer.event_range[EventType.DISTANCE]
            self.dist_min = dist_range.min_value
            self.dist_max = dist_range.max_value
        self.slider_version = d.slider_version

    # -- top level ------------------------------------------------------------

    def parse(self, beatmap: Beatmap, speed: float = 1.0,
              song_length: Optional[float] = None) -> EventStream:
        """Parse all hit objects (+ optional kiai/sv/timing streams) in time order."""
        events: list[Event] = []
        times: list[int] = []
        last_pos = np.array((256.0, 192.0))

        for ho in beatmap.hit_objects():
            if isinstance(ho, Circle):
                last_pos = self._parse_circle(ho, events, times, last_pos, beatmap)
            elif isinstance(ho, Slider):
                if beatmap.mode == 1:
                    self._parse_drumroll(ho, events, times, beatmap)
                else:
                    last_pos = self._parse_slider(ho, events, times, last_pos, beatmap)
            elif isinstance(ho, Spinner):
                if beatmap.mode == 1:
                    self._parse_denden(ho, events, times, beatmap)
                else:
                    last_pos = self._parse_spinner(ho, events, times, beatmap)
            elif isinstance(ho, HoldNote):
                last_pos = self._parse_hold_note(ho, events, times, beatmap)

        if events:
            pairs = sorted(zip(events, times), key=lambda x: x[1])
            events = [e for e, _ in pairs]
            times = [t for _, t in pairs]
        result: EventStream = (events, times)

        if self.add_mania_sv and beatmap.mode == 3:
            result = merge_events(self.parse_scroll_speeds(beatmap), result)
        if self.add_kiai:
            result = merge_events(self.parse_kiai(beatmap), result)
        if self.add_timing:
            result = merge_events(self.parse_timing(beatmap, song_length=song_length), result)
        if speed != 1.0:
            result = speed_events(result, speed)
        return result

    def parse_scroll_speeds(self, beatmap: Beatmap, speed: float = 1.0) -> EventStream:
        """BPM-normalized scroll-speed change stream (mania SV)."""
        events: list[Event] = []
        times: list[int] = []
        median_mpb = get_median_mpb_beatmap(beatmap)
        mpb = median_mpb
        last_speed = -1.0
        tps = beatmap.timing_points
        for i, tp in enumerate(tps):
            if tp.parent is None:
                mpb = tp.ms_per_beat
                speed_value = 1.0
            else:
                speed_value = -100 / tp.ms_per_beat
            if i == len(tps) - 1 or tps[i + 1].offset > tp.offset:
                normed = (speed_value * median_mpb / mpb
                          if self.mania_bpm_normalized_scroll_speed else speed_value)
                if normed != last_speed or last_speed == -1:
                    self._emit_group(EventType.SCROLL_SPEED_CHANGE, tp.offset, events,
                                     times, beatmap, time_event=True, scroll_speed=normed)
                last_speed = normed
        if speed != 1.0:
            events, times = speed_events((events, times), speed)
        return events, times

    def parse_kiai(self, beatmap: Beatmap, speed: float = 1.0) -> EventStream:
        """Kiai on/off transitions."""
        events: list[Event] = []
        times: list[int] = []
        kiai = False
        for tp in beatmap.timing_points:
            if tp.kiai_mode == kiai:
                continue
            self._emit_group(Event(EventType.KIAI, int(tp.kiai_mode)), tp.offset,
                             events, times, beatmap, time_event=True)
            kiai = tp.kiai_mode
        if speed != 1.0:
            events, times = speed_events((events, times), speed)
        return events, times

    def parse_timing(self, beatmap: Union[Beatmap, list[TimingPoint]],
                     speed: float = 1.0,
                     song_length: Optional[float] = None) -> EventStream:
        """Beat/measure/timing-point marker stream walked from the red lines."""
        timing = beatmap.timing_points if isinstance(beatmap, Beatmap) else beatmap
        assert len(timing) > 0, "No timing points found in beatmap."

        events: list[Event] = []
        times: list[int] = []
        if isinstance(beatmap, Beatmap) and beatmap.hit_objects():
            last_ho = beatmap.hit_objects()[-1]
            last_time = last_ho.end_time + 0.999
        elif song_length is not None:
            last_time = song_length
        else:
            last_time = timing[-1].offset + 10

        red_lines = [tp for tp in timing if tp.bpm]
        for i, tp in enumerate(red_lines):
            next_tp = red_lines[i + 1] if i + 1 < len(red_lines) else None
            next_time = next_tp.offset - 10 if next_tp else last_time
            start_time = tp.offset
            time = start_time
            measure_counter = 0
            while time <= next_time:
                if self.add_timing_points and measure_counter == 0:
                    etype = EventType.TIMING_POINT
                elif measure_counter % tp.meter == 0:
                    etype = EventType.MEASURE
                else:
                    etype = EventType.BEAT
                self._emit_group(etype, time, events, times, beatmap,
                                 time_event=True, add_snap=False)
                measure_counter += 1
                time = int(start_time + measure_counter * tp.ms_per_beat)
        if speed != 1.0:
            events, times = speed_events((events, times), speed)
        return events, times

    # -- timing-point lookups ---------------------------------------------------

    @staticmethod
    def _uninherited_at(time: float, beatmap: Beatmap) -> TimingPoint:
        tp = beatmap.timing_point_at(time)
        return tp if tp.parent is None else tp.parent

    @staticmethod
    def _hitsound_point_at(time: float, beatmap: Beatmap) -> TimingPoint:
        return beatmap.timing_point_at(time + 5)

    def scroll_speed_at(self, time: float, beatmap: Beatmap) -> float:
        tp = beatmap.timing_point_at(time)
        if tp.parent is None or tp.ms_per_beat >= 0 or np.isnan(tp.ms_per_beat):
            return 1.0
        return float(np.clip(-100 / tp.ms_per_beat, 0.01, 10))

    # -- event emission -----------------------------------------------------------

    def _emit_time(self, time: float, beatmap: Beatmap, events: list[Event],
                   times: list[int], add_snap: bool = True) -> None:
        time_ms = _ms(time)
        events.append(Event(EventType.TIME_SHIFT, time_ms))
        times.append(time_ms)
        if not add_snap or not self.add_snapping:
            return
        tp = self._uninherited_at(time, beatmap)
        beats = (time - tp.offset) / tp.ms_per_beat
        snapping = 0
        for i in range(1, 17):
            # <2 ms error to the nearest i-th subdivision counts as snapped
            if abs(beats - round(beats * i) / i) * tp.ms_per_beat < 2:
                snapping = i
                break
        events.append(Event(EventType.SNAPPING, snapping))
        times.append(time_ms)

    def _emit_hitsound(self, ref_time: float, group_time: int, hitsound: int,
                       addition: str, beatmap: Beatmap, events: list[Event],
                       times: list[int]) -> None:
        if not self.add_hitsounds:
            return
        tp = self._hitsound_point_at(ref_time, beatmap)
        tp_sample_set = tp.sample_type if tp.sample_type != 0 else 2  # default soft
        parts = addition.split(":")
        sample_set = int(parts[0]) if parts and parts[0] != "0" else tp_sample_set
        addition_set = int(parts[1]) if len(parts) > 1 and parts[1] != "0" else sample_set
        volume = int(parts[3]) if len(parts) > 3 and parts[3] != "0" else tp.volume
        sample_set = sample_set if 0 < sample_set < 4 else 1
        addition_set = addition_set if 0 < addition_set < 4 else 1
        hitsound = hitsound & 14  # whistle/finish/clap bits only
        volume = int(np.clip(volume, 0, 100))
        # packed value decoded by event_utils.get_groups
        value = hitsound // 2 + 8 * (sample_set - 1) + 24 * (addition_set - 1)
        events.append(Event(EventType.HITSOUND, value))
        events.append(Event(EventType.VOLUME, volume))
        times.append(group_time)
        times.append(group_time)

    def _emit_position(self, pos: np.ndarray, last_pos: np.ndarray, time: float,
                       events: list[Event], times: list[int]) -> np.ndarray:
        time_ms = _ms(time)
        if self.add_distances:
            dist = int(np.clip(np.linalg.norm(pos - last_pos), self.dist_min, self.dist_max))
            events.append(Event(EventType.DISTANCE, dist))
            times.append(time_ms)
        if self.add_positions:
            p = self.position_precision
            px = int(np.clip(pos[0] / p, self.x_min / p, self.x_max / p))
            py = int(np.clip(pos[1] / p, self.y_min / p, self.y_max / p))
            if self.position_split_axes:
                events.append(Event(EventType.POS_X, px))
                events.append(Event(EventType.POS_Y, py))
                times.extend([time_ms, time_ms])
            else:
                width = (self.x_max - self.x_min) / p + 1
                value = int((px - self.x_min / p) + (py - self.y_min / p) * width)
                events.append(Event(EventType.POS, value))
                times.append(time_ms)
        return pos

    def _emit_column(self, pos: np.ndarray, columns: int, time: float,
                     events: list[Event], times: list[int]) -> None:
        column = int(np.clip(pos[0] / 512 * columns, 0, columns - 1))
        events.append(Event(EventType.MANIA_COLUMN, column))
        times.append(_ms(time))

    def _emit_group(self, event: Union[EventType, Event], time: Optional[float],
                    events: list[Event], times: list[int], beatmap: Beatmap, *,
                    time_event: bool = False, add_snap: bool = True,
                    pos: Optional[np.ndarray] = None,
                    last_pos: Optional[np.ndarray] = None,
                    new_combo: bool = False,
                    hitsound_ref_times: Optional[list[float]] = None,
                    hitsounds: Optional[list[int]] = None,
                    additions: Optional[list[str]] = None,
                    scroll_speed: Optional[float] = None) -> Optional[np.ndarray]:
        """Emit one token group: [type] time snap pos combo scroll hitsounds."""
        time_ms = _ms(time) if time is not None else None
        if isinstance(event, EventType):
            event = Event(event)

        if self.types_first:
            events.append(event)
            times.append(time_ms)
        if time_event:
            self._emit_time(time, beatmap, events, times, add_snap)
        if pos is not None:
            if beatmap.mode in (0, 2):
                last_pos = self._emit_position(pos, last_pos, time, events, times)
            elif beatmap.mode == 3:
                self._emit_column(pos, int(beatmap.circle_size), time, events, times)
        if new_combo and beatmap.mode in (0, 2):
            events.append(Event(EventType.NEW_COMBO))
            times.append(time_ms)
        if scroll_speed is not None:
            events.append(Event(EventType.SCROLL_SPEED,
                                round(float(np.clip(scroll_speed, 0.01, 10)) * 100)))
            times.append(time_ms)
        if hitsound_ref_times is not None:
            for i, ref_time in enumerate(hitsound_ref_times):
                self._emit_hitsound(ref_time, time_ms, hitsounds[i], additions[i],
                                    beatmap, events, times)
        if not self.types_first:
            events.append(event)
            times.append(time_ms)
        return last_pos

    # -- per-object parsers ---------------------------------------------------

    def _parse_circle(self, circle: Circle, events, times, last_pos, beatmap) -> np.ndarray:
        return self._emit_group(
            EventType.CIRCLE, circle.time, events, times, beatmap,
            time_event=True, pos=np.array(circle.position), last_pos=last_pos,
            new_combo=circle.new_combo, hitsound_ref_times=[circle.time],
            hitsounds=[circle.hitsound], additions=[circle.addition],
            scroll_speed=(self.scroll_speed_at(circle.time, beatmap)
                          if beatmap.mode == 1 else None))

    def _parse_slider(self, slider: Slider, events, times, last_pos, beatmap) -> np.ndarray:
        control_points = slider.all_points
        if len(control_points) >= 100:
            return last_pos

        last_pos = self._emit_group(
            EventType.SLIDER_HEAD, slider.time, events, times, beatmap,
            time_event=True, pos=np.array(slider.position), last_pos=last_pos,
            new_combo=slider.new_combo, hitsound_ref_times=[slider.time],
            hitsounds=[slider.edge_sounds[0] if slider.edge_sounds else 0],
            additions=[slider.edge_additions[0] if slider.edge_additions else "0:0"],
            scroll_speed=(self.scroll_speed_at(slider.time, beatmap)
                          if self.add_sv else None))

        span_duration = (slider.end_time - slider.time) / slider.repeat
        n = len(control_points)

        def add_anchor(event_type: EventType, i: int, last_pos: np.ndarray) -> np.ndarray:
            anchor_time = (slider.time + i / (n - 1) * span_duration
                           if self.slider_version == 1 else slider.time)
            return self._emit_group(event_type, anchor_time, events, times, beatmap,
                                    pos=control_points[i], last_pos=last_pos)

        curve_type = slider.curve_type
        # osu! falls back to bezier when a perfect curve isn't exactly 3 points
        if curve_type == "PerfectCurve" and n != 3:
            curve_type = "Bezier"
        if curve_type == "Linear":
            for i in range(1, n - 1):
                last_pos = add_anchor(EventType.RED_ANCHOR, i, last_pos)
        elif curve_type == "Catmull":
            for i in range(1, n - 1):
                last_pos = add_anchor(EventType.CATMULL_ANCHOR, i, last_pos)
        elif curve_type == "PerfectCurve":
            for i in range(1, n - 1):
                last_pos = add_anchor(EventType.PERFECT_ANCHOR, i, last_pos)
        else:  # (multi-)bezier: duplicated points mark red anchors
            for i in range(1, n - 1):
                if np.all(control_points[i] == control_points[i + 1]):
                    last_pos = add_anchor(EventType.RED_ANCHOR, i, last_pos)
                elif np.any(control_points[i] != control_points[i - 1]):
                    last_pos = add_anchor(EventType.BEZIER_ANCHOR, i, last_pos)

        if self.slider_version == 2:
            last_pos = self._emit_group(EventType.LAST_ANCHOR, slider.time, events,
                                        times, beatmap, pos=control_points[-1],
                                        last_pos=last_pos)

        # body hitsound at +1ms plus intermediate repeat edges
        repeats = slider.repeat
        last_pos = self._emit_group(
            EventType.LAST_ANCHOR, slider.time + span_duration, events, times, beatmap,
            time_event=True,
            pos=control_points[-1] if self.slider_version == 1 else None,
            last_pos=last_pos,
            hitsound_ref_times=([slider.time + 1]
                                + [slider.time + i * span_duration for i in range(1, repeats)]),
            hitsounds=([slider.hitsound]
                       + [slider.edge_sounds[i] if len(slider.edge_sounds) > i else 0
                          for i in range(1, repeats)]),
            additions=([slider.addition]
                       + [slider.edge_additions[i] if len(slider.edge_additions) > i else "0:0"
                          for i in range(1, repeats)]))

        return self._emit_group(
            EventType.SLIDER_END, slider.end_time, events, times, beatmap,
            time_event=True, pos=slider.path.position_at(1.0), last_pos=last_pos,
            hitsound_ref_times=[slider.end_time],
            hitsounds=[slider.edge_sounds[-1] if slider.edge_sounds else 0],
            additions=[slider.edge_additions[-1] if slider.edge_additions else "0:0"])

    def _parse_spinner(self, spinner: Spinner, events, times, beatmap) -> np.ndarray:
        self._emit_group(EventType.SPINNER, spinner.time, events, times, beatmap,
                         time_event=True)
        self._emit_group(EventType.SPINNER_END, spinner.end_time, events, times,
                         beatmap, time_event=True,
                         hitsound_ref_times=[spinner.end_time],
                         hitsounds=[spinner.hitsound], additions=[spinner.addition])
        return np.array((256.0, 192.0))

    def _parse_hold_note(self, hold: HoldNote, events, times, beatmap) -> np.ndarray:
        pos = np.array(hold.position)
        self._emit_group(EventType.HOLD_NOTE, hold.time, events, times, beatmap,
                         time_event=True, pos=pos, hitsound_ref_times=[hold.time],
                         hitsounds=[hold.hitsound], additions=[hold.addition])
        self._emit_group(EventType.HOLD_NOTE_END, hold.end_time, events, times,
                         beatmap, time_event=True, pos=pos)
        return pos

    def _parse_drumroll(self, slider: Slider, events, times, beatmap) -> None:
        self._emit_group(EventType.DRUMROLL, slider.time, events, times, beatmap,
                         time_event=True, hitsound_ref_times=[slider.time],
                         hitsounds=[slider.hitsound], additions=[slider.addition],
                         scroll_speed=self.scroll_speed_at(slider.time, beatmap))
        self._emit_group(EventType.DRUMROLL_END, slider.end_time, events, times,
                         beatmap, time_event=True)

    def _parse_denden(self, spinner: Spinner, events, times, beatmap) -> None:
        self._emit_group(EventType.DENDEN, spinner.time, events, times, beatmap,
                         time_event=True, hitsound_ref_times=[spinner.time],
                         hitsounds=[spinner.hitsound], additions=[spinner.addition],
                         scroll_speed=self.scroll_speed_at(spinner.time, beatmap))
        self._emit_group(EventType.DENDEN_END, spinner.end_time, events, times,
                         beatmap, time_event=True)
