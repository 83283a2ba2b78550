"""Pure-Python .osu beatmap model: parse, query, serialize.

Replaces the reference's external `slider` library dependency (the reference
imports slider.Beatmap/Circle/Slider/Spinner/HoldNote/TimingPoint throughout,
e.g. osuT5/osuT5/dataset/osu_parser.py:8). Times are plain float milliseconds
rather than timedeltas.

Supports the `osu file format v*` text format: General/Editor/Metadata/
Difficulty/Events/TimingPoints/Colours/HitObjects sections, all four gamemodes.
"""

from __future__ import annotations

import dataclasses
import math
from bisect import bisect_right
from pathlib import Path
from typing import Optional, Union

import numpy as np

from .geometry import SliderPath

PLAYFIELD_CENTRE = (256, 192)

# hit-object type bitmask
TYPE_CIRCLE = 1
TYPE_SLIDER = 2
TYPE_NEW_COMBO = 4
TYPE_SPINNER = 8
TYPE_COMBO_SKIP_MASK = 0b1110000
TYPE_HOLD = 128

_CURVE_TYPE_NAMES = {
    "B": "Bezier",
    "L": "Linear",
    "P": "PerfectCurve",
    "C": "Catmull",
}
_CURVE_TYPE_LETTERS = {v: k for k, v in _CURVE_TYPE_NAMES.items()}


@dataclasses.dataclass
class TimingPoint:
    """One [TimingPoints] row.

    For uninherited (red) lines `ms_per_beat` is the beat length in ms and
    `parent` is None. For inherited (green) lines `ms_per_beat` is the raw
    negative value (-100 / SV) and `parent` points at the governing red line.
    """

    offset: float
    ms_per_beat: float
    meter: int = 4
    sample_type: int = 0
    sample_index: int = 0
    volume: int = 100
    uninherited: bool = True
    kiai_mode: bool = False
    omit_first_barline: bool = False
    parent: Optional["TimingPoint"] = None

    @property
    def bpm(self) -> Optional[float]:
        if self.parent is not None or self.ms_per_beat <= 0:
            return None
        return 60000.0 / self.ms_per_beat

    @property
    def effects(self) -> int:
        return (1 if self.kiai_mode else 0) | (8 if self.omit_first_barline else 0)

    @property
    def slider_velocity(self) -> float:
        """SV multiplier encoded by an inherited point (1.0 for red lines)."""
        if self.parent is None or self.ms_per_beat >= 0:
            return 1.0
        return -100.0 / self.ms_per_beat

    def serialize(self) -> str:
        off = format_osu_float(self.offset)
        mpb = format_osu_float(self.ms_per_beat)
        return (f"{off},{mpb},{self.meter},{self.sample_type},"
                f"{self.sample_index},{self.volume},{int(self.uninherited)},{self.effects}")


@dataclasses.dataclass
class HitObject:
    x: float
    y: float
    time: float
    new_combo: bool = False
    combo_skip: int = 0
    hitsound: int = 0
    addition: str = "0:0:0:0:"

    @property
    def position(self) -> tuple[float, float]:
        return (self.x, self.y)

    @property
    def end_time(self) -> float:
        return self.time

    def _type_bits(self, base: int) -> int:
        return base | (TYPE_NEW_COMBO if self.new_combo else 0) | ((self.combo_skip & 7) << 4)


@dataclasses.dataclass
class Circle(HitObject):
    def serialize(self) -> str:
        return (f"{format_osu_float(self.x)},{format_osu_float(self.y)},"
                f"{format_osu_float(self.time)},{self._type_bits(TYPE_CIRCLE)},"
                f"{self.hitsound},{self.addition}")


@dataclasses.dataclass
class Spinner(HitObject):
    end_time_: float = 0.0

    @property
    def end_time(self) -> float:
        return self.end_time_

    def serialize(self) -> str:
        return (f"{format_osu_float(self.x)},{format_osu_float(self.y)},"
                f"{format_osu_float(self.time)},{self._type_bits(TYPE_SPINNER)},"
                f"{self.hitsound},{format_osu_float(self.end_time_)},{self.addition}")


@dataclasses.dataclass
class HoldNote(HitObject):
    end_time_: float = 0.0

    @property
    def end_time(self) -> float:
        return self.end_time_

    def serialize(self) -> str:
        return (f"{format_osu_float(self.x)},{format_osu_float(self.y)},"
                f"{format_osu_float(self.time)},{self._type_bits(TYPE_HOLD)},"
                f"{self.hitsound},{format_osu_float(self.end_time_)}:{self.addition}")


@dataclasses.dataclass
class Slider(HitObject):
    curve_type: str = "Bezier"  # Bezier / Linear / PerfectCurve / Catmull
    curve_points: list[tuple[float, float]] = dataclasses.field(default_factory=list)
    repeat: int = 1  # number of slides
    length: float = 0.0  # pixel length per slide
    edge_sounds: list[int] = dataclasses.field(default_factory=list)
    edge_additions: list[str] = dataclasses.field(default_factory=list)
    duration: float = 0.0  # total duration in ms (all slides), set at parse

    _path: Optional[SliderPath] = dataclasses.field(default=None, repr=False)

    @property
    def end_time(self) -> float:
        return self.time + self.duration

    @property
    def all_points(self) -> np.ndarray:
        """Head position + curve points, i.e. the full control polygon."""
        return np.array([(self.x, self.y)] + list(self.curve_points), dtype=np.float64)

    @property
    def path(self) -> SliderPath:
        if self._path is None:
            self._path = SliderPath(self.curve_type, self.all_points, self.length)
        return self._path

    def position_at_progress(self, progress: float) -> np.ndarray:
        """Position at total progress in [0,1] over all slides (zigzag)."""
        p = progress * self.repeat
        p_mod = p % 2.0
        span = p_mod if p_mod <= 1.0 else 2.0 - p_mod
        return self.path.position_at(span)

    @property
    def end_position(self) -> np.ndarray:
        """Ball position when the slider ends (head for even repeats)."""
        return self.path.position_at(1.0) if self.repeat % 2 == 1 else self.path.position_at(0.0)

    def serialize(self) -> str:
        letter = _CURVE_TYPE_LETTERS[self.curve_type]
        pts = "|".join(f"{int(px) if float(px).is_integer() else px}:"
                       f"{int(py) if float(py).is_integer() else py}"
                       for px, py in self.curve_points)
        parts = [
            format_osu_float(self.x), format_osu_float(self.y),
            format_osu_float(self.time), str(self._type_bits(TYPE_SLIDER)),
            str(self.hitsound), f"{letter}|{pts}", str(self.repeat),
            format_osu_float(self.length),
        ]
        if self.edge_sounds:
            parts.append("|".join(str(s) for s in self.edge_sounds))
            parts.append("|".join(self.edge_additions or ["0:0"] * len(self.edge_sounds)))
            parts.append(self.addition)
        return ",".join(parts)


def format_osu_float(x: float) -> str:
    """Format numbers the way .osu files expect: ints without decimal point."""
    if isinstance(x, float) and x.is_integer():
        return str(int(x))
    if isinstance(x, float):
        return repr(round(x, 12))
    return str(x)


def _parse_value(raw: str):
    raw = raw.strip()
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


class Beatmap:
    """A parsed .osu file.

    Exposes the attribute surface the framework needs (mirroring what the
    reference pulls from slider.Beatmap): mode, circle_size, difficulty
    values, metadata strings, timing_points (with parent links), hit objects
    sorted by time, and timing_point_at queries.
    """

    def __init__(self):
        self.format_version: int = 14
        # [General]
        self.audio_filename: str = ""
        self.audio_lead_in: int = 0
        self.preview_time: int = -1
        self.countdown: int = 1
        self.sample_set: str = "Normal"
        self.stack_leniency: float = 0.7
        self.mode: int = 0
        self.letterbox_in_breaks: int = 0
        self.widescreen_storyboard: int = 0
        # [Editor]
        self.editor: dict = {}
        # [Metadata]
        self.title: str = ""
        self.title_unicode: str = ""
        self.artist: str = ""
        self.artist_unicode: str = ""
        self.creator: str = ""
        self.version: str = ""
        self.source: str = ""
        self.tags: str = ""
        self.beatmap_id: int = 0
        self.beatmap_set_id: int = -1
        # [Difficulty]
        self.hp_drain_rate: float = 5.0
        self.circle_size: float = 5.0
        self.overall_difficulty: float = 5.0
        self.approach_rate: float = 5.0
        self.slider_multiplier: float = 1.4
        self.slider_tick_rate: float = 1.0
        # [Events] — kept as raw lines (backgrounds, breaks, storyboard)
        self.events: list[str] = []
        # [TimingPoints]
        self.timing_points: list[TimingPoint] = []
        # [Colours]
        self.colours: list[str] = []
        # [HitObjects]
        self._hit_objects: list[HitObject] = []

    # -- queries -----------------------------------------------------------

    def hit_objects(self, stacking: bool = False) -> list[HitObject]:
        """Hit objects in time order. Stacking is never applied (the
        reference always calls with stacking=False: osu_parser.py:72)."""
        del stacking
        return self._hit_objects

    def timing_point_at(self, time: float) -> TimingPoint:
        """Last timing point at or before `time` (first one if before all)."""
        tps = self.timing_points
        if not tps:
            raise ValueError("beatmap has no timing points")
        idx = bisect_right([tp.offset for tp in tps], time) - 1
        return tps[max(idx, 0)]

    def uninherited_timing_point_at(self, time: float) -> TimingPoint:
        tp = self.timing_point_at(time)
        return tp if tp.parent is None else tp.parent

    @property
    def uninherited_timing_points(self) -> list[TimingPoint]:
        return [tp for tp in self.timing_points if tp.parent is None]

    def bpm_min(self) -> float:
        bpms = [tp.bpm for tp in self.timing_points if tp.bpm]
        return min(bpms) if bpms else 0.0

    def bpm_max(self) -> float:
        bpms = [tp.bpm for tp in self.timing_points if tp.bpm]
        return max(bpms) if bpms else 0.0

    @property
    def max_combo_time(self) -> float:
        if not self._hit_objects:
            return 0.0
        return max(ho.end_time for ho in self._hit_objects)

    # -- parsing -----------------------------------------------------------

    @classmethod
    def from_path(cls, path: Union[str, Path]) -> "Beatmap":
        with open(path, encoding="utf-8-sig", errors="ignore") as f:
            return cls.from_string(f.read())

    @classmethod
    def from_string(cls, text: str) -> "Beatmap":
        bm = cls()
        section = None
        for raw_line in text.splitlines():
            line = raw_line.strip("﻿").rstrip("\r\n")
            if not line.strip() or line.startswith("//"):
                continue
            if line.startswith("[") and line.rstrip().endswith("]"):
                section = line.strip()[1:-1]
                continue
            if section is None:
                if "osu file format v" in line:
                    try:
                        bm.format_version = int(line.split("v")[-1])
                    except ValueError:
                        pass
                continue
            try:
                bm._parse_line(section, line)
            except (ValueError, IndexError):
                continue  # tolerate malformed rows like the game client does
        bm._link_timing_parents()
        bm._hit_objects.sort(key=lambda h: h.time)
        bm._compute_slider_durations()
        return bm

    def _parse_line(self, section: str, line: str) -> None:
        if section in ("General", "Metadata", "Difficulty", "Editor"):
            if ":" not in line:
                return
            key, _, raw = line.partition(":")
            self._set_kv(section, key.strip(), raw.strip())
        elif section == "Events":
            self.events.append(line)
        elif section == "TimingPoints":
            self.timing_points.append(self._parse_timing_point(line))
        elif section == "Colours":
            self.colours.append(line)
        elif section == "HitObjects":
            ho = self._parse_hit_object(line)
            if ho is not None:
                self._hit_objects.append(ho)

    _GENERAL_KEYS = {
        "AudioFilename": "audio_filename",
        "AudioLeadIn": "audio_lead_in",
        "PreviewTime": "preview_time",
        "Countdown": "countdown",
        "SampleSet": "sample_set",
        "StackLeniency": "stack_leniency",
        "Mode": "mode",
        "LetterboxInBreaks": "letterbox_in_breaks",
        "WidescreenStoryboard": "widescreen_storyboard",
    }
    _METADATA_KEYS = {
        "Title": "title",
        "TitleUnicode": "title_unicode",
        "Artist": "artist",
        "ArtistUnicode": "artist_unicode",
        "Creator": "creator",
        "Version": "version",
        "Source": "source",
        "Tags": "tags",
        "BeatmapID": "beatmap_id",
        "BeatmapSetID": "beatmap_set_id",
    }
    _DIFFICULTY_KEYS = {
        "HPDrainRate": "hp_drain_rate",
        "CircleSize": "circle_size",
        "OverallDifficulty": "overall_difficulty",
        "ApproachRate": "approach_rate",
        "SliderMultiplier": "slider_multiplier",
        "SliderTickRate": "slider_tick_rate",
    }

    def _set_kv(self, section: str, key: str, raw: str) -> None:
        if section == "Editor":
            self.editor[key] = _parse_value(raw)
            return
        table = {"General": self._GENERAL_KEYS, "Metadata": self._METADATA_KEYS,
                 "Difficulty": self._DIFFICULTY_KEYS}[section]
        attr = table.get(key)
        if attr is None:
            return
        current = getattr(self, attr)
        if isinstance(current, str):
            setattr(self, attr, raw)
        elif isinstance(current, float):
            setattr(self, attr, float(raw))
        else:
            setattr(self, attr, int(float(raw)))

    @staticmethod
    def _parse_timing_point(line: str) -> TimingPoint:
        parts = line.split(",")
        offset = float(parts[0])
        mpb = float(parts[1])
        meter = int(float(parts[2])) if len(parts) > 2 else 4
        sample_type = int(float(parts[3])) if len(parts) > 3 else 0
        sample_index = int(float(parts[4])) if len(parts) > 4 else 0
        volume = int(float(parts[5])) if len(parts) > 5 else 100
        uninherited = bool(int(float(parts[6]))) if len(parts) > 6 else mpb >= 0
        effects = int(float(parts[7])) if len(parts) > 7 else 0
        return TimingPoint(
            offset=offset, ms_per_beat=mpb, meter=meter, sample_type=sample_type,
            sample_index=sample_index, volume=volume, uninherited=uninherited,
            kiai_mode=bool(effects & 1), omit_first_barline=bool(effects & 8),
        )

    def _link_timing_parents(self) -> None:
        self.timing_points.sort(key=lambda tp: (tp.offset, not tp.uninherited))
        last_red: Optional[TimingPoint] = None
        for tp in self.timing_points:
            if tp.uninherited and tp.ms_per_beat > 0:
                tp.parent = None
                last_red = tp
            else:
                tp.parent = last_red
        # a beatmap must start with a red line; if the first points are
        # inherited, parent them to the first red line
        first_red = next((tp for tp in self.timing_points if tp.parent is None), None)
        for tp in self.timing_points:
            if tp.parent is None and not (tp.uninherited and tp.ms_per_beat > 0):
                tp.parent = first_red

    def _parse_hit_object(self, line: str) -> Optional[HitObject]:
        parts = line.split(",")
        x = float(parts[0])
        y = float(parts[1])
        time = float(parts[2])
        type_bits = int(parts[3])
        hitsound = int(parts[4])
        new_combo = bool(type_bits & TYPE_NEW_COMBO)
        combo_skip = (type_bits & TYPE_COMBO_SKIP_MASK) >> 4
        common = dict(x=x, y=y, time=time, new_combo=new_combo,
                      combo_skip=combo_skip, hitsound=hitsound)

        if type_bits & TYPE_CIRCLE:
            addition = parts[5] if len(parts) > 5 else "0:0:0:0:"
            return Circle(addition=addition, **common)
        if type_bits & TYPE_SLIDER:
            curve = parts[5]
            letter, _, pts_raw = curve.partition("|")
            curve_type = _CURVE_TYPE_NAMES.get(letter, "Bezier")
            curve_points = []
            if pts_raw:
                for pair in pts_raw.split("|"):
                    px, _, py = pair.partition(":")
                    curve_points.append((float(px), float(py)))
            repeat = int(float(parts[6])) if len(parts) > 6 else 1
            length = float(parts[7]) if len(parts) > 7 else 0.0
            edge_sounds = ([int(float(v)) for v in parts[8].split("|")]
                           if len(parts) > 8 and parts[8] else [])
            edge_additions = (parts[9].split("|") if len(parts) > 9 and parts[9] else [])
            addition = parts[10] if len(parts) > 10 else "0:0:0:0:"
            return Slider(curve_type=curve_type, curve_points=curve_points,
                          repeat=repeat, length=length, edge_sounds=edge_sounds,
                          edge_additions=edge_additions, addition=addition, **common)
        if type_bits & TYPE_SPINNER:
            end_time = float(parts[5]) if len(parts) > 5 else time
            addition = parts[6] if len(parts) > 6 else "0:0:0:0:"
            return Spinner(end_time_=end_time, addition=addition, **common)
        if type_bits & TYPE_HOLD:
            rest = parts[5] if len(parts) > 5 else "0"
            end_raw, _, addition = rest.partition(":")
            end_time = float(end_raw) if end_raw else time
            return HoldNote(end_time_=end_time, addition=addition or "0:0:0:0:", **common)
        return None

    def _compute_slider_durations(self) -> None:
        """Resolve slider end times from SV/timing (the standard osu! rule:
        one slide lasts length / (100 * SliderMultiplier * SV) beats)."""
        for ho in self._hit_objects:
            if not isinstance(ho, Slider):
                continue
            try:
                tp = self.timing_point_at(ho.time)
            except ValueError:
                ho.duration = 0.0
                continue
            red = tp if tp.parent is None else tp.parent
            if red is None or red.ms_per_beat <= 0:
                ho.duration = 0.0
                continue
            sv = tp.slider_velocity
            px_per_beat = self.slider_multiplier * 100.0 * sv
            if px_per_beat <= 0 or math.isnan(px_per_beat):
                ho.duration = 0.0
                continue
            beats = ho.length / px_per_beat
            ho.duration = beats * red.ms_per_beat * ho.repeat

    # -- serialization -----------------------------------------------------

    def to_osu(self) -> str:
        lines = [f"osu file format v{self.format_version}", ""]
        lines.append("[General]")
        lines.append(f"AudioFilename: {self.audio_filename}")
        lines.append(f"AudioLeadIn: {self.audio_lead_in}")
        lines.append(f"PreviewTime: {self.preview_time}")
        lines.append(f"Countdown: {self.countdown}")
        lines.append(f"SampleSet: {self.sample_set}")
        lines.append(f"StackLeniency: {format_osu_float(self.stack_leniency)}")
        lines.append(f"Mode: {self.mode}")
        lines.append(f"LetterboxInBreaks: {self.letterbox_in_breaks}")
        lines.append(f"WidescreenStoryboard: {self.widescreen_storyboard}")
        lines.append("")
        if self.editor:
            lines.append("[Editor]")
            for k, v in self.editor.items():
                lines.append(f"{k}: {v}")
            lines.append("")
        lines.append("[Metadata]")
        lines.append(f"Title:{self.title}")
        lines.append(f"TitleUnicode:{self.title_unicode or self.title}")
        lines.append(f"Artist:{self.artist}")
        lines.append(f"ArtistUnicode:{self.artist_unicode or self.artist}")
        lines.append(f"Creator:{self.creator}")
        lines.append(f"Version:{self.version}")
        lines.append(f"Source:{self.source}")
        lines.append(f"Tags:{self.tags}")
        lines.append(f"BeatmapID:{self.beatmap_id}")
        lines.append(f"BeatmapSetID:{self.beatmap_set_id}")
        lines.append("")
        lines.append("[Difficulty]")
        lines.append(f"HPDrainRate:{format_osu_float(self.hp_drain_rate)}")
        lines.append(f"CircleSize:{format_osu_float(self.circle_size)}")
        lines.append(f"OverallDifficulty:{format_osu_float(self.overall_difficulty)}")
        lines.append(f"ApproachRate:{format_osu_float(self.approach_rate)}")
        lines.append(f"SliderMultiplier:{format_osu_float(self.slider_multiplier)}")
        lines.append(f"SliderTickRate:{format_osu_float(self.slider_tick_rate)}")
        lines.append("")
        lines.append("[Events]")
        lines.extend(self.events)
        lines.append("")
        lines.append("[TimingPoints]")
        lines.extend(tp.serialize() for tp in self.timing_points)
        lines.append("")
        if self.colours:
            lines.append("[Colours]")
            lines.extend(self.colours)
            lines.append("")
        lines.append("[HitObjects]")
        lines.extend(ho.serialize() for ho in self._hit_objects)
        lines.append("")
        return "\n".join(lines)

    def write_path(self, path: Union[str, Path]) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_osu())
