"""Events -> .osu postprocessing: object reconstruction, timing inference,
SV solving, resnapping, serialization.

Host-side re-design of the reference Postprocessor
(reference: osuT5/osuT5/inference/postprocessor.py:120):

- group assembly + near-perfect-overlap snapping (:910)
- distance->position resolution by sampling circle intersections inside the
  playfield (:84)
- slider reconstruction: slide count from span/total durations, SV/length
  solving with human 1/20 SV quantization (:535), control-point scaling,
  per-node hitsounds/volume green lines (:139-397)
- taiko drumroll zigzag path (:526)
- timing inference from beat/measure/timing-point markers incl. redline
  splitting by least squares and human BPM rounding (:656-834)
- resnap to snap-divisor ticks with ignore-tick sets (:557)
- .osu and .osz output, merge into an existing beatmap (:427)

Output goes through our own Beatmap model instead of a string template.
"""

from __future__ import annotations

import dataclasses
import os
import uuid
import zipfile
from typing import Optional

import numpy as np

from ..data.event_utils import Group, get_groups, get_median_mpb
from ..events import BEAT_TYPES, Event, EventType
from ..osu.beatmap import Beatmap, TimingPoint
from ..osu.geometry import SliderPath
from ..osu.timing import TimingPointsChange, sort_timing_points

OSU_FILE_EXTENSION = ".osu"

CURVE_TYPE_NAMES = {"B": "Bezier", "P": "PerfectCurve", "C": "Catmull", "L": "Linear"}

# snap divisors that contain each other's ticks; when resnapping to divisor d
# we must exclude ticks belonging to these coarser divisors (reference :581)
IGNORE_TICKS = {
    1: [], 4: [2], 6: [2, 3], 8: [4], 9: [3], 10: [2, 5], 12: [4, 6],
    14: [2, 7], 15: [3, 5], 16: [8],
}


@dataclasses.dataclass
class BeatmapConfig:
    """(reference postprocessor.py:26)"""

    audio_filename: str = ""
    preview_time: int = -1
    mode: int = 0
    title: str = ""
    title_unicode: str = ""
    artist: str = ""
    artist_unicode: str = ""
    creator: str = ""
    version: str = ""
    source: str = ""
    tags: str = ""
    hp_drain_rate: float = 5
    circle_size: float = 4
    overall_difficulty: float = 8
    approach_rate: float = 9
    slider_multiplier: float = 1.4
    slider_tick_rate: float = 1
    bpm: float = 120
    offset: int = 0
    background: Optional[str] = None


def beatmap_config_from_beatmap(beatmap: Beatmap) -> BeatmapConfig:
    background = None
    for line in beatmap.events:
        parts = line.split(",")
        if len(parts) >= 3 and parts[0] == "0":
            background = parts[2].strip('"')
            break
    return BeatmapConfig(
        title=beatmap.title, artist=beatmap.artist,
        title_unicode=beatmap.title, artist_unicode=beatmap.artist,
        audio_filename=beatmap.audio_filename,
        hp_drain_rate=beatmap.hp_drain_rate, circle_size=beatmap.circle_size,
        overall_difficulty=beatmap.overall_difficulty,
        approach_rate=beatmap.approach_rate,
        slider_multiplier=beatmap.slider_multiplier,
        slider_tick_rate=beatmap.slider_tick_rate,
        creator=beatmap.creator, version=beatmap.version,
        background=background,
        preview_time=int(beatmap.preview_time),
        bpm=beatmap.bpm_max(),
        offset=int(round(min(tp.offset for tp in beatmap.timing_points)))
        if beatmap.timing_points else 0,
    )


def sample_circle_positions(last_pos, dist, num_samples=500,
                            playfield=(512, 384), rng=None):
    """Points at `dist` from last_pos that stay inside the playfield
    (reference :84 calculate_coordinates)."""
    angles = np.linspace(0, 2 * np.pi, num_samples)
    xs = last_pos[0] + dist * np.cos(angles)
    ys = last_pos[1] + dist * np.sin(angles)
    keep = (xs >= 0) & (xs <= playfield[0]) & (ys >= 0) & (ys <= playfield[1])
    if not np.any(keep):
        far = last_pos[0] + last_pos[1] > (playfield[0] + playfield[1]) / 2
        return np.array([playfield if far else (0.0, 0.0)])
    return np.stack([xs[keep], ys[keep]], axis=1)


def position_to_progress(path: SliderPath, pos: np.ndarray,
                         resolution: int = 512) -> float:
    """Progress in [0,1] whose path position is closest to `pos` (vectorized
    direct search; replaces the reference's scalar gradient descent :104)."""
    ts = np.linspace(0.0, 1.0, resolution)
    pts = path.positions_at(ts)
    d = np.linalg.norm(pts - pos[None, :], axis=1)
    i = int(np.argmin(d))
    # refine around the best coarse sample
    lo, hi = max(ts[i] - 1.0 / resolution, 0.0), min(ts[i] + 1.0 / resolution, 1.0)
    ts2 = np.linspace(lo, hi, 32)
    pts2 = path.positions_at(ts2)
    d2 = np.linalg.norm(pts2 - pos[None, :], axis=1)
    return float(ts2[int(np.argmin(d2))])


class _RedlineIndex:
    """Bisect index over a sorted timing list for resnap lookups.

    Same answers as Postprocessor.timing_point_at/.uninherited_after (which
    stay as the general-purpose linear versions) in O(log n) per query.
    """

    def __init__(self, timing: list[TimingPoint]):
        import bisect  # noqa: PLC0415
        self._bisect = bisect
        self._timing = timing
        self._offsets = [tp.offset for tp in timing]
        self._reds = [tp for tp in timing if tp.parent is None]
        self._red_offsets = [tp.offset for tp in self._reds]

    def redline_at(self, time: float) -> TimingPoint:
        i = self._bisect.bisect_right(self._offsets, time) - 1
        tp = self._timing[max(i, 0)]
        return tp if tp.parent is None else tp.parent

    def redline_after(self, time: float) -> Optional[TimingPoint]:
        i = self._bisect.bisect_right(self._red_offsets, time)
        return self._reds[i] if i < len(self._reds) else None


@dataclasses.dataclass
class Marker:
    time: float
    is_measure: bool
    is_redline: bool
    beats_from_last_marker: float = 1


class Postprocessor:
    def __init__(self, args):
        self.offset = args.offset
        self.beat_length = 60000 / args.bpm
        self.timing_leniency = args.timing_leniency
        self.types_first = args.train.data.types_first
        self.has_pos = args.train.data.add_positions
        self.mania_bpm_normalized_scroll_speed = args.train.data.mania_bpm_normalized_scroll_speed
        self.start_time = args.start_time
        self.end_time = args.end_time
        self.has_sv = args.train.data.add_sv
        self.rng = np.random.default_rng(args.seed if args.seed is not None else 0)

    # -- timing-point editing helpers ------------------------------------------

    @staticmethod
    def timing_point_at(time: float, timing: list[TimingPoint]) -> TimingPoint:
        for tp in reversed(timing):
            if tp.offset <= time:
                return tp
        return timing[0]

    @staticmethod
    def uninherited_after(time: float, timing: list[TimingPoint]) -> Optional[TimingPoint]:
        for tp in timing:
            if tp.offset > time and tp.parent is None:
                return tp
        return None

    @staticmethod
    def set_volume(time: float, volume: int, timing: list[TimingPoint]) -> list[TimingPoint]:
        tp = TimingPoint(offset=time, ms_per_beat=-100, volume=volume, uninherited=False)
        return TimingPointsChange(tp, volume=True).apply(timing, True)

    @staticmethod
    def set_sv(time: float, sv: float, timing: list[TimingPoint]) -> list[TimingPoint]:
        if sv == 0:
            return timing
        tp = TimingPoint(offset=time, ms_per_beat=-100 / sv, uninherited=False)
        return TimingPointsChange(tp, mpb=True).apply(timing, True)

    @staticmethod
    def set_kiai(time: float, kiai: bool, timing: list[TimingPoint]) -> list[TimingPoint]:
        tp = TimingPoint(offset=time, ms_per_beat=-100, kiai_mode=kiai, uninherited=False)
        return TimingPointsChange(tp, kiai=True).apply(timing, True)

    # -- object reconstruction ---------------------------------------------------

    def generate(self, events: list[Event], beatmap_config: BeatmapConfig,
                 timing: Optional[list[TimingPoint]] = None) -> str:
        """Events -> .osu file content."""
        if timing is None:
            timing = [TimingPoint(offset=float(self.offset),
                                  ms_per_beat=self.beat_length, volume=100)]
        timing = [dataclasses.replace(tp) for tp in timing]
        self._relink(timing)

        groups, _ = get_groups(events, types_first=self.types_first)
        self.snap_near_perfect_overlaps(groups)

        last_time = max((g.time for g in groups), default=0)
        median_mpb = get_median_mpb(timing, last_time)

        hit_objects: list[str] = []
        last_x, last_y = 256.0, 192.0
        spinner_start = slider_head = last_anchor = None
        hold_note_start = drumroll_start = denden_start = None
        anchor_info: list[tuple[str, float, float]] = []

        def first(xs, default=0):
            return xs[0] if xs else default

        for group in groups:
            hit_type = group.event_type

            if group.distance is not None and group.x is None and group.y is None:
                candidates = sample_circle_positions((last_x, last_y), group.distance)
                group.x, group.y = candidates[self.rng.integers(len(candidates))]
            if group.x is None or group.y is None:
                group.x, group.y = last_x, last_y
            if hit_type in (EventType.CIRCLE, EventType.SLIDER_HEAD,
                            EventType.BEZIER_ANCHOR, EventType.PERFECT_ANCHOR,
                            EventType.CATMULL_ANCHOR, EventType.RED_ANCHOR,
                            EventType.LAST_ANCHOR, EventType.SLIDER_END):
                last_x, last_y = group.x, group.y
            if beatmap_config.mode == 1:
                group.x, group.y = 256, 192
            if beatmap_config.mode == 3:
                group.y = 192

            if hit_type == EventType.CIRCLE:
                t = int(round(group.time))
                hit_objects.append(
                    f"{int(round(group.x))},{int(round(group.y))},{t},"
                    f"{5 if group.new_combo else 1},{first(group.hitsounds)},"
                    f"{first(group.samplesets)}:{first(group.additions)}:"
                    f"{first(group.volumes) if beatmap_config.mode == 3 else 0}:0:")
                if group.volumes and beatmap_config.mode != 3:
                    timing = self.set_volume(t, group.volumes[0], timing)
                if beatmap_config.mode == 1 and group.scroll_speed is not None:
                    timing = self.set_sv(t, group.scroll_speed, timing)

            elif hit_type == EventType.HOLD_NOTE:
                hold_note_start = group
            elif hit_type == EventType.HOLD_NOTE_END and hold_note_start is not None:
                h = hold_note_start
                t = int(round(h.time))
                hit_objects.append(
                    f"{int(round(h.x))},192,{t},128,{first(h.hitsounds)},"
                    f"{int(round(group.time))}:{first(h.samplesets)}:"
                    f"{first(h.additions)}:"
                    f"{first(h.volumes) if beatmap_config.mode == 3 else 0}:0:")
                if h.volumes and beatmap_config.mode != 3:
                    timing = self.set_volume(t, h.volumes[0], timing)
                hold_note_start = None

            elif hit_type == EventType.DRUMROLL:
                drumroll_start = group
            elif hit_type == EventType.DRUMROLL_END and drumroll_start is not None:
                d = drumroll_start
                start_t = int(round(d.time))
                duration = int(round(group.time)) - start_t
                drumroll_start = None
                if duration < 1:
                    continue
                if d.volumes:
                    timing = self.set_volume(start_t, d.volumes[0], timing)
                if beatmap_config.mode == 1 and d.scroll_speed is not None:
                    timing = self.set_sv(start_t, d.scroll_speed, timing)
                tp = self.timing_point_at(start_t, timing)
                redline = tp if tp.parent is None else tp.parent
                sv = 1.0 if tp.parent is None else -100 / tp.ms_per_beat
                length = sv * duration * 100 / redline.ms_per_beat * beatmap_config.slider_multiplier
                start_pos, *zigzag = self.zigzag_control_points(length)
                cps = "|".join(f"{cp[0]}:{cp[1]}" for cp in zigzag)
                hit_objects.append(
                    f"{start_pos[0]},{start_pos[1]},{start_t},2,{first(d.hitsounds)},"
                    f"L|{cps},1,{length},0:0,0:0|0:0,"
                    f"{first(d.samplesets)}:{first(d.additions)}:0:0:")

            elif hit_type == EventType.DENDEN:
                denden_start = group
            elif hit_type == EventType.DENDEN_END and denden_start is not None:
                d = denden_start
                t = int(round(d.time))
                hit_objects.append(
                    f"256,192,{t},12,{first(d.hitsounds)},{int(round(group.time))},"
                    f"{first(d.samplesets)}:{first(d.additions)}:0:0:")
                if d.volumes:
                    timing = self.set_volume(t, d.volumes[0], timing)
                if beatmap_config.mode == 1 and d.scroll_speed is not None:
                    timing = self.set_sv(t, d.scroll_speed, timing)
                denden_start = None

            elif hit_type == EventType.SPINNER:
                spinner_start = group
            elif hit_type == EventType.SPINNER_END and spinner_start is not None:
                hit_objects.append(
                    f"256,192,{int(round(spinner_start.time))},12,"
                    f"{first(group.hitsounds)},{int(round(group.time))},"
                    f"{first(group.samplesets)}:{first(group.additions)}:0:0:")
                if group.volumes:
                    timing = self.set_volume(int(round(group.time)), group.volumes[0], timing)
                spinner_start = None
                last_x, last_y = 256, 192

            elif hit_type == EventType.SLIDER_HEAD:
                slider_head = group
                last_anchor = None
                anchor_info = []
            elif hit_type == EventType.BEZIER_ANCHOR:
                anchor_info.append(("B", group.x, group.y))
            elif hit_type == EventType.PERFECT_ANCHOR:
                anchor_info.append(("P", group.x, group.y))
            elif hit_type == EventType.CATMULL_ANCHOR:
                anchor_info.append(("C", group.x, group.y))
            elif hit_type == EventType.RED_ANCHOR:
                anchor_info.append(("B", group.x, group.y))
                anchor_info.append(("B", group.x, group.y))
            elif hit_type == EventType.LAST_ANCHOR:
                if last_anchor is None:
                    anchor_info.append(("B", group.x, group.y))
                last_anchor = group
            elif (hit_type == EventType.SLIDER_END and slider_head is not None
                  and last_anchor is not None):
                result = self._finish_slider(slider_head, last_anchor, group,
                                             anchor_info, timing, beatmap_config)
                slider_head = None
                last_anchor = None
                anchor_info = []
                if result is None:
                    continue
                line, timing = result
                hit_objects.append(line)

            elif hit_type == EventType.KIAI:
                timing = self.set_kiai(group.time, bool(group.value), timing)
            elif hit_type == EventType.SCROLL_SPEED_CHANGE and group.scroll_speed is not None:
                if self.mania_bpm_normalized_scroll_speed:
                    tp = self.timing_point_at(group.time, timing)
                    redline = tp if tp.parent is None else tp.parent
                    group.scroll_speed = group.scroll_speed * redline.ms_per_beat / median_mpb
                timing = self.set_sv(group.time, group.scroll_speed, timing)

        # drop green lines preceding the first red line
        if timing:
            first_red = next((tp for tp in timing if tp.parent is None), None)
            if first_red is not None:
                timing = [tp for tp in timing if tp.offset >= first_red.offset]

        return self._serialize(hit_objects, timing, beatmap_config)

    def _finish_slider(self, slider_head: Group, last_anchor: Group, group: Group,
                       anchor_info, timing, beatmap_config):
        slider_start_time = int(round(slider_head.time))
        curve_type = anchor_info[0][0]
        span_duration = last_anchor.time - slider_head.time
        total_duration = group.time - slider_head.time
        if total_duration <= 0 or span_duration <= 0:
            return None
        slides = max(int(round(total_duration / span_duration)), 1)
        span_duration = total_duration / slides
        path = SliderPath(CURVE_TYPE_NAMES[curve_type],
                          np.array([(slider_head.x, slider_head.y)]
                                   + [(cp[1], cp[2]) for cp in anchor_info], dtype=float))
        max_length = path.distance

        tp = self.timing_point_at(slider_start_time, timing)
        redline = tp if tp.parent is None else tp.parent
        last_sv = 1.0 if tp.parent is None else -100 / tp.ms_per_beat

        if not self.has_sv or slider_head.scroll_speed is None:
            if self.has_pos:
                req_length = max_length * position_to_progress(
                    path, np.array((group.x, group.y)))
            else:
                req_length = max_length - np.linalg.norm(
                    np.array((group.x, group.y)) - np.array((last_anchor.x, last_anchor.y)))
            if req_length < 1e-4:
                return None
            sv, length = self.get_human_sv_and_length(
                req_length, span_duration, last_sv, redline,
                slider_head.new_combo, beatmap_config.slider_multiplier)
        else:
            sv = slider_head.scroll_speed
            length = self.calc_length(sv, span_duration, redline,
                                      beatmap_config.slider_multiplier)

        # clamp runaway SV
        if length > max_length * 1.5:
            sv = max_length / 100 / span_duration * redline.ms_per_beat / beatmap_config.slider_multiplier
            sv = round(sv * 20) / 20
            length = self.calc_length(sv, span_duration, redline,
                                      beatmap_config.slider_multiplier)
        # stretch control points when the solved length overshoots the path
        if length > max_length + 1e-4 and max_length > 0:
            scale = length / max_length
            anchor_info = [(c, (x - slider_head.x) * scale + slider_head.x,
                            (y - slider_head.y) * scale + slider_head.y)
                           for c, x, y in anchor_info]
        if sv != last_sv:
            timing = self.set_sv(slider_start_time, sv, timing)

        node_hitsounds = slider_head.hitsounds + last_anchor.hitsounds[1:] + group.hitsounds
        node_samplesets = slider_head.samplesets + last_anchor.samplesets[1:] + group.samplesets
        node_additions = slider_head.additions + last_anchor.additions[1:] + group.additions
        node_volumes = slider_head.volumes + last_anchor.volumes[1:] + group.volumes
        body_hitsound = last_anchor.hitsounds[0] if last_anchor.hitsounds else 0
        body_sampleset = last_anchor.samplesets[0] if last_anchor.samplesets else 0
        body_addition = last_anchor.additions[0] if last_anchor.additions else 0

        cps = "|".join(f"{int(round(x))}:{int(round(y))}" for _, x, y in anchor_info)
        hs = "|".join(map(str, node_hitsounds))
        ss = "|".join(f"{s}:{a}" for s, a in zip(node_samplesets, node_additions))
        line = (f"{int(round(slider_head.x))},{int(round(slider_head.y))},"
                f"{slider_start_time},{6 if slider_head.new_combo else 2},"
                f"{body_hitsound},{curve_type}|{cps},{slides},{length},{hs},{ss},"
                f"{body_sampleset}:{body_addition}:0:0:")

        for i in range(min(slides + 1, len(node_volumes))):
            t = int(round(slider_head.time + span_duration * i))
            timing = self.set_volume(t, node_volumes[i], timing)
            if (last_anchor.volumes and last_anchor.volumes[0] != node_volumes[i]
                    and i < slides and span_duration > 6):
                timing = self.set_volume(t + 6, last_anchor.volumes[0], timing)
        return line, timing

    @staticmethod
    def zigzag_control_points(length: float) -> list[tuple[int, int]]:
        """Back-and-forth linear path covering `length` px (taiko drumrolls)."""
        control_points = [(0, 192)]
        for i in range(int(np.ceil(length / 512))):
            control_points.append((512 if i % 2 == 0 else 0, 192))
        return control_points

    def get_human_sv_and_length(self, req_length, span_duration, last_sv,
                                redline, new_combo, slider_multiplier):
        sv = req_length / 100 / span_duration * redline.ms_per_beat / slider_multiplier
        leniency = 0.05 if new_combo else 0.15
        if abs(sv - last_sv) / last_sv <= leniency:
            sv = last_sv
        else:
            rounded = round(sv * 20) / 20
            if rounded < 0.1:
                rounded = round(sv * 100) / 100
            sv = rounded if rounded > 1e-5 else sv
        return sv, self.calc_length(sv, span_duration, redline, slider_multiplier)

    @staticmethod
    def calc_length(sv, span_duration, redline, slider_multiplier):
        return sv * span_duration * 100 / redline.ms_per_beat * slider_multiplier

    # -- resnap (reference :557) --------------------------------------------------

    def resnap_events(self, events: list[Event],
                      timing: list[TimingPoint]) -> list[Event]:
        timing = sort_timing_points(timing)
        # index the redlines once: per-TIME_SHIFT linear scans over the
        # timing list were O(events x timing_points) and showed up in the
        # e2e latency profile on long generations
        index = _RedlineIndex(timing)
        out = []
        for i, event in enumerate(events):
            if event.type != EventType.TIME_SHIFT:
                out.append(event)
                continue
            time = event.value
            snap_divisor = 0
            if i + 1 < len(events) and events[i + 1].type == EventType.SNAPPING:
                snap_divisor = events[i + 1].value
            if snap_divisor > 0:
                time = int(self.resnap(time, timing, snap_divisor, index=index))
            out.append(Event(EventType.TIME_SHIFT, time))
        return out

    def resnap(self, time: float, timing: list[TimingPoint],
               snap_divisor: int,
               index: Optional["_RedlineIndex"] = None) -> float:
        if not timing:
            return time
        if index is not None:
            before_tp = index.redline_at(time)
            after_tp = index.redline_after(time)
        else:
            before_tp = self.timing_point_at(time, timing)
            before_tp = before_tp if before_tp.parent is None else before_tp.parent
            after_tp = self.uninherited_after(time, timing)
        before_time = round(before_tp.offset)
        after_time = round(after_tp.offset) if after_tp is not None else None
        if after_time is not None and time > before_time + 10 and time >= after_time - 10:
            return after_time

        def local_ticks(divisor: int) -> set[int]:
            ms_per_tick = before_tp.ms_per_beat / divisor
            remainder = (time - before_time) % ms_per_tick
            return {int(time - remainder - ms_per_tick), int(time - remainder),
                    int(time - remainder + ms_per_tick),
                    int(time - remainder + 2 * ms_per_tick)}

        ticks = local_ticks(snap_divisor)
        for ignore in IGNORE_TICKS.get(snap_divisor, [1]):
            ticks -= local_ticks(ignore)
        if not ticks:
            return time
        return min(ticks, key=lambda x: abs(x - time))

    # -- timing inference (reference :656) ----------------------------------------

    def generate_timing(self, events: list[Event]) -> list[TimingPoint]:
        markers: list[Marker] = []
        step = 1 if self.types_first else -1
        for i, event in enumerate(events):
            if (event.type in BEAT_TYPES and 0 <= i + step < len(events)
                    and events[i + step].type == EventType.TIME_SHIFT):
                markers.append(Marker(
                    int(events[i + step].value),
                    event.type == EventType.MEASURE,
                    event.type == EventType.TIMING_POINT,
                    0 if event.type == EventType.TIMING_POINT else 1))
        if not markers:
            return []
        markers.sort(key=lambda m: m.time)

        timing: list[TimingPoint] = []
        for marker in markers:
            if marker.is_redline:
                tp = TimingPoint(offset=float(marker.time), ms_per_beat=1000.0)
                timing = TimingPointsChange(tp, uninherited=True).apply(timing, True)
        if not timing:
            timing = [TimingPoint(offset=float(markers[0].time), ms_per_beat=1000.0)]

        # pass 1: fix measure meters
        counter = 0
        last_measure_time = markers[0].time
        for marker in markers:
            time = marker.time
            if marker.is_redline:
                counter = 0
                last_measure_time = time
                continue
            redline = self._redline_at(time - 1, timing)
            redline_offset = round(redline.offset)
            if redline_offset == time:
                continue
            counter += 1
            if not marker.is_measure:
                continue
            if redline.meter != counter:
                if last_measure_time <= redline_offset:
                    redline.meter = counter
                else:
                    tp = TimingPoint(offset=float(last_measure_time),
                                     ms_per_beat=1000.0, meter=counter)
                    timing = TimingPointsChange(tp, meter=True, uninherited=True).apply(timing, True)
            counter = 0
            last_measure_time = time

        # pass 2: solve BPM per section, splitting redlines where needed
        counter = 0
        last_mpb = 1000.0
        for marker in markers:
            time = marker.time
            redline = self._redline_at(time - 1, timing)
            redline_offset = round(redline.offset)
            beats_from_last_marker = marker.beats_from_last_marker
            if redline_offset == time:
                counter = 0
                continue
            markers_before = [m for m in markers
                              if redline_offset + 1 <= m.time < time] + [marker]
            if beats_from_last_marker == 0:
                if len(markers_before) != 1:
                    counter = 0
                    continue
                beats = (time - redline_offset) / last_mpb
                candidates = [round(beats), 1, 1 / 2, 1 / 4, 1 / 8, 1 / 16]
                marker.beats_from_last_marker = min(candidates,
                                                    key=lambda x: abs(x - beats))

            def section_mpb(ms, offset):
                beats = sum(m.beats_from_last_marker for m in ms)
                return self.get_ms_per_beat(ms[-1].time - offset, beats, 0)

            mpb = section_mpb(markers_before, redline_offset)
            if self.check_ms_per_beat(mpb, markers_before, redline):
                mpb = self.human_round_ms_per_beat(mpb, markers_before, redline)
                redline.ms_per_beat = mpb
            elif len(markers_before) > 1:
                # least-squares split search (reference :770-812)
                def split_loss(ms, offset):
                    m_mpb = section_mpb(ms, offset)
                    loss = 0.0
                    beats = 0.0
                    for m in ms:
                        beats += m.beats_from_last_marker
                        loss += (m.time - (offset + beats * m_mpb)) ** 2
                    return loss / len(ms)

                best_loss = np.inf
                best_split = len(markers_before) - 1
                for i in range(1, len(markers_before)):
                    split = markers_before[i - 1]
                    if not split.is_measure and i != len(markers_before) - 1:
                        continue
                    loss = (split_loss(markers_before[:i], redline_offset)
                            + split_loss(markers_before[i:], split.time))
                    if loss < best_loss:
                        best_loss = loss
                        best_split = i
                if best_split < len(markers_before) - 1:
                    mpb = section_mpb(markers_before[:best_split], redline_offset)
                    mpb = self.human_round_ms_per_beat(
                        mpb, markers_before[:best_split], redline)
                    redline.ms_per_beat = mpb
                last_time = markers_before[best_split - 1].time
                beats_from_split = sum(m.beats_from_last_marker
                                       for m in markers_before[best_split:])
                mpb = self.get_ms_per_beat(time - last_time, beats_from_split,
                                           self.timing_leniency)
                tp = TimingPoint(offset=float(last_time), ms_per_beat=mpb)
                timing = TimingPointsChange(tp, mpb=True, uninherited=True).apply(timing, True)
                counter = 0
                for i in range(len(markers_before) - 2, best_split - 1, -1):
                    if markers_before[i].is_measure:
                        break
                    counter += 1

            last_mpb = mpb
            counter += 1
            redline = self._redline_at(time, timing)
            if round(redline.offset) == time:
                counter = 0
            if marker.is_measure:
                if counter % redline.meter != 0:
                    tp = TimingPoint(offset=float(time),
                                     ms_per_beat=redline.ms_per_beat,
                                     meter=redline.meter)
                    timing = TimingPointsChange(tp, mpb=True, uninherited=True).apply(timing, True)
                counter = 0
        return timing

    def _redline_at(self, time: float, timing: list[TimingPoint]) -> TimingPoint:
        tp = self.timing_point_at(time, timing)
        return tp if tp.parent is None else tp.parent

    def check_ms_per_beat(self, mpb_new, markers, redline) -> bool:
        redline_offset = round(redline.offset)
        beats = 0.0
        for m in markers:
            beats += m.beats_from_last_marker
            if not self.is_snapped(m.time, redline_offset + mpb_new * beats,
                                   self.timing_leniency):
                return False
        return True

    def human_round_ms_per_beat(self, mpb, markers, redline):
        if mpb == 0 or mpb > 60000:
            return mpb
        bpm = 60000 / mpb
        for precision in (1, 2, 10, 100, 1000):
            candidate = 60000 / (round(bpm * precision) / precision)
            if self.check_ms_per_beat(candidate, markers, redline):
                return candidate
        return mpb

    def get_ms_per_beat(self, time_from_redline, beats_from_redline, leniency):
        if beats_from_redline == 0 or time_from_redline == 0:
            return 1000.0
        mpb = time_from_redline / beats_from_redline
        bpm = 60000 / mpb
        if bpm < 1:
            return 1000.0
        for precision in (1, 2, 10, 100, 1000):
            candidate = 60000 / (round(bpm * precision) / precision)
            if self.is_snapped(time_from_redline,
                               candidate * beats_from_redline, leniency):
                return candidate
        return mpb

    @staticmethod
    def is_snapped(time, resnapped_time, leniency):
        return abs(time - resnapped_time) <= leniency

    def snap_near_perfect_overlaps(self, groups: list[Group]) -> None:
        snappable = {EventType.CIRCLE, EventType.SLIDER_HEAD,
                     EventType.RED_ANCHOR, EventType.LAST_ANCHOR,
                     EventType.SLIDER_END}
        space_leniency = 3.8
        time_leniency = 1000
        prev: list[Group] = []
        for group in groups:
            if group.event_type not in snappable or group.x is None or group.y is None:
                continue
            prev = [p for p in prev if abs(group.time - p.time) <= time_leniency]
            for p in prev:
                if np.hypot(group.x - p.x, group.y - p.y) < space_leniency:
                    group.x, group.y = p.x, p.y
                    break
            prev.append(group)

    # -- output ------------------------------------------------------------------

    @staticmethod
    def _relink(timing: list[TimingPoint]) -> None:
        """Re-establish parent links after cloning."""
        last_red = None
        for tp in sort_timing_points(timing):
            if tp.parent is None and tp.uninherited:
                last_red = tp
            elif tp.parent is not None:
                tp.parent = last_red if last_red is not None else tp.parent

    def _serialize(self, hit_objects: list[str], timing: list[TimingPoint],
                   config: BeatmapConfig) -> str:
        bm = Beatmap()
        bm.audio_filename = config.audio_filename
        bm.preview_time = config.preview_time
        bm.mode = config.mode
        bm.title = config.title
        bm.title_unicode = config.title_unicode or config.title
        bm.artist = config.artist
        bm.artist_unicode = config.artist_unicode or config.artist
        bm.creator = config.creator
        bm.version = config.version
        bm.source = config.source
        bm.tags = config.tags
        bm.hp_drain_rate = config.hp_drain_rate
        bm.circle_size = config.circle_size
        bm.overall_difficulty = config.overall_difficulty
        bm.approach_rate = config.approach_rate
        bm.slider_multiplier = config.slider_multiplier
        bm.slider_tick_rate = config.slider_tick_rate
        if config.background:
            bm.events.append(f'0,0,"{config.background}",0,0')
        lines = [bm.to_osu().split("[TimingPoints]")[0].rstrip(), "", "[TimingPoints]"]
        lines.extend(tp.serialize() for tp in sort_timing_points(timing))
        lines.append("")
        lines.append("[HitObjects]")
        lines.extend(hit_objects)
        lines.append("")
        return "\n".join(lines)

    def write_result(self, result: str, output_path: str) -> str:
        os.makedirs(output_path, exist_ok=True)
        osu_path = os.path.join(output_path,
                                f"beatmap{uuid.uuid4().hex}{OSU_FILE_EXTENSION}")
        with open(osu_path, "w", encoding="utf-8-sig") as f:
            f.write(result)
        return osu_path

    def export_osz(self, osu_path: str, audio_path: str, output_path: str) -> str:
        os.makedirs(output_path, exist_ok=True)
        osz_path = os.path.join(output_path, f"beatmap{uuid.uuid4().hex}.osz")
        with zipfile.ZipFile(osz_path, "w") as z:
            z.write(osu_path, os.path.basename(osu_path))
            z.write(audio_path, os.path.basename(audio_path))
        return osz_path

    def add_to_beatmap(self, result: str, beatmap_path: str) -> str:
        """Merge generated objects/timing into an existing beatmap between
        start_time and end_time (reference :427)."""
        result_bm = Beatmap.from_string(result)
        beatmap = Beatmap.from_path(beatmap_path)
        start_time = self.start_time if self.start_time is not None else -8.64e13
        end_time = self.end_time if self.end_time is not None else 8.64e13

        beatmap._hit_objects = [ho for ho in beatmap.hit_objects()
                                if ho.time < start_time or ho.time > end_time]
        beatmap.timing_points = [tp for tp in beatmap.timing_points
                                 if tp.offset < start_time or tp.offset > end_time]
        beatmap._hit_objects.extend(
            ho for ho in result_bm.hit_objects() if start_time <= ho.time <= end_time)
        beatmap.timing_points.extend(
            tp for tp in result_bm.timing_points if start_time <= tp.offset <= end_time)
        beatmap._hit_objects.sort(key=lambda ho: ho.time)
        beatmap.timing_points.sort(key=lambda tp: tp.offset)

        if result_bm.timing_points and beatmap.timing_points:
            result_tp = result_bm.timing_point_at(start_time)
            result_sv = result_tp.ms_per_beat if result_tp.parent is not None else -100
            tp = TimingPoint(offset=result_tp.offset, ms_per_beat=result_sv,
                             volume=result_tp.volume,
                             kiai_mode=result_tp.kiai_mode, uninherited=False)
            beatmap.timing_points = TimingPointsChange(
                tp, mpb=True, volume=True, kiai=True).apply(beatmap.timing_points, False)

            result_red = result_tp if result_tp.parent is None else result_tp.parent
            bm_tp = beatmap.timing_point_at(start_time)
            bm_red = bm_tp if bm_tp.parent is None else bm_tp.parent
            r_counter = ((start_time - result_red.offset) / result_red.ms_per_beat
                         + 1e-4) % result_red.meter
            b_counter = ((start_time - bm_red.offset) / bm_red.ms_per_beat
                         + 1e-4) % bm_red.meter
            if (result_red.meter != bm_red.meter
                    or abs(r_counter - b_counter) > 1e-4
                    or abs(result_red.ms_per_beat - bm_red.ms_per_beat) > 1e-4):
                offset = start_time - r_counter * result_red.ms_per_beat
                tp = TimingPoint(offset=offset, ms_per_beat=result_red.ms_per_beat,
                                 meter=result_red.meter)
                beatmap.timing_points = TimingPointsChange(
                    tp, mpb=True, meter=True, uninherited=True).apply(beatmap.timing_points, False)

        beatmap.write_path(beatmap_path)
        return beatmap_path
