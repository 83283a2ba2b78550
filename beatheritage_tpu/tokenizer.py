"""Fixed-vocabulary event tokenizer.

Vocabulary layout is bit-compatible with the reference so that token streams
and trained checkpoints interoperate (reference: osuT5/osuT5/tokenizer.py:21):

- ids 0/1/2 are PAD/SOS/EOS; per-context SOS/EOS ids follow, allocated in
  the order contexts appear in `data.context_types` (tokenizer.py:71-87)
- output-event ranges are laid out next in a fixed order, then input-only
  ranges (tokenizer.py:97-231)
- time is quantized to 10 ms steps; positions to `position_precision` px
- state round-trips through the same tokenizer.json schema
  (tokenizer.py:640-663), so reference-trained tokenizers load directly.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Union

import numpy as np

from .events import ContextType, Event, EventRange, EventType

MILISECONDS_PER_SECOND = 1000
MILISECONDS_PER_STEP = 10


class Tokenizer:
    def __init__(self, args=None):
        # `args` is a TrainConfig (beatheritage_tpu.config.TrainConfig)
        self._args = args
        self.beatmap_idx: dict[int, int] = {}
        self.num_classes = 0
        self.num_diff_classes = 0
        self.max_difficulty = 0
        self.beatmap_mapper: dict[int, int] = {}
        self.mapper_idx: dict[int, int] = {}
        self.num_mapper_classes = 0
        self.beatmap_descriptors: dict[int, list[int]] = {}
        self.descriptor_idx: dict[str, int] = {}
        self.num_descriptor_classes = 0
        self.num_cs_classes = 0
        self._rebuild_vocab()

    def _rebuild_vocab(self) -> None:
        """(Re)derive the full id layout from config + dataset-derived class
        counts. Called at construction and again by load_dataset_indices —
        ranges sized by dataset statistics (MAPPER, DESCRIPTOR) are zero
        until the metadata is loaded (reference sizes these the same way at
        train time and then pins them via tokenizer.json)."""
        args = self._args
        self.offset = 3
        self.context_sos: dict[ContextType, int] = {}
        self.context_eos: dict[ContextType, int] = {}
        self.event_ranges: list[EventRange] = [
            EventRange(EventType.TIME_SHIFT, -512, 512),
            EventRange(EventType.SNAPPING, 0, 16),
            EventRange(EventType.DISTANCE, 0, 640),
        ]
        self.input_event_ranges: list[EventRange] = []

        if args is not None:
            self._build_from_config(args)

        self.event_ranges = self.event_ranges + [
            EventRange(EventType.NEW_COMBO, 0, 0),
            EventRange(EventType.HITSOUND, 0, 2**3 * 3 * 3),
            EventRange(EventType.VOLUME, 0, 100),
            EventRange(EventType.CIRCLE, 0, 0),
            EventRange(EventType.SPINNER, 0, 0),
            EventRange(EventType.SPINNER_END, 0, 0),
            EventRange(EventType.SLIDER_HEAD, 0, 0),
            EventRange(EventType.BEZIER_ANCHOR, 0, 0),
            EventRange(EventType.PERFECT_ANCHOR, 0, 0),
            EventRange(EventType.CATMULL_ANCHOR, 0, 0),
            EventRange(EventType.RED_ANCHOR, 0, 0),
            EventRange(EventType.LAST_ANCHOR, 0, 0),
            EventRange(EventType.SLIDER_END, 0, 0),
            EventRange(EventType.BEAT, 0, 0),
            EventRange(EventType.MEASURE, 0, 0),
        ]

        if args is not None:
            d = args.data
            if d.add_timing_points:
                self.event_ranges.append(EventRange(EventType.TIMING_POINT, 0, 0))
            if (d.add_kiai_special_token or d.add_kiai
                    or any("kiai" in _ctx_out(c) for c in d.context_types)):
                self.event_ranges.append(EventRange(EventType.KIAI, 0, 1))
            if 3 in d.gamemodes:
                self.event_ranges.append(EventRange(EventType.HOLD_NOTE, 0, 0))
                self.event_ranges.append(EventRange(EventType.HOLD_NOTE_END, 0, 0))
                self.event_ranges.append(EventRange(EventType.SCROLL_SPEED_CHANGE, 0, 0))
            if 1 in d.gamemodes:
                self.event_ranges.append(EventRange(EventType.DRUMROLL, 0, 0))
                self.event_ranges.append(EventRange(EventType.DRUMROLL_END, 0, 0))
                self.event_ranges.append(EventRange(EventType.DENDEN, 0, 0))
                self.event_ranges.append(EventRange(EventType.DENDEN_END, 0, 0))

        self._finalize()

    # -- vocab construction --------------------------------------------------

    def _build_from_config(self, args) -> None:
        d = args.data

        def add_context_type(name: str) -> None:
            ct = ContextType(name) if isinstance(name, str) else name
            if ct not in self.context_sos:
                self.context_sos[ct] = self.offset
                self.offset += 1
                self.context_eos[ct] = self.offset
                self.offset += 1

        for cts in d.context_types:
            if isinstance(cts, (str, ContextType)):
                add_context_type(cts)
            else:
                for name in cts["in"]:
                    add_context_type(name)
                if d.add_out_context_types:
                    for name in cts["out"]:
                        add_context_type(name)

        ms_per_sequence = ((d.src_seq_len - 1) * args.model.spectrogram.hop_length
                           * MILISECONDS_PER_SECOND / args.model.spectrogram.sample_rate)
        max_time_shift = int(ms_per_sequence / MILISECONDS_PER_STEP)
        min_time_shift = (-max_time_shift
                          if d.add_pre_tokens or d.add_pre_tokens_at_step >= 0 else 0)

        self.event_ranges = [
            EventRange(EventType.TIME_SHIFT, min_time_shift, max_time_shift),
            EventRange(EventType.SNAPPING, 0, 16),
        ]
        self.input_event_ranges = []

        if d.add_gamemode_token:
            self.input_event_ranges.append(EventRange(EventType.GAMEMODE, 0, 3))
        if args.model.do_style_embed or d.add_style_token:
            self.num_classes = d.num_classes
            if d.add_style_token:
                self.input_event_ranges.append(EventRange(EventType.STYLE, 0, self.num_classes))
        if d.add_diff_token:
            self.num_diff_classes = d.num_diff_classes
            self.max_difficulty = d.max_diff
            self.input_event_ranges.append(EventRange(EventType.DIFFICULTY, 0, self.num_diff_classes))
        if args.model.do_mapper_embed or d.add_mapper_token:
            if d.add_mapper_token:
                self.input_event_ranges.append(EventRange(EventType.MAPPER, 0, self.num_mapper_classes))
        if d.add_cs_token:
            self.num_cs_classes = d.num_cs_classes
            self.input_event_ranges.append(EventRange(EventType.CS, 0, self.num_cs_classes))
        if d.add_year_token:
            self.input_event_ranges.append(EventRange(EventType.YEAR, 2007, 2077))
        if d.add_hitsounded_token:
            self.input_event_ranges.append(EventRange(EventType.HITSOUNDED, 0, 1))
        if d.add_song_length_token:
            # 10 s resolution, up to 10 minutes
            self.input_event_ranges.append(EventRange(EventType.SONG_LENGTH, 0, 60))
        if d.add_song_position_token:
            # 1% resolution with sentinel under/overflows
            self.input_event_ranges.append(EventRange(EventType.SONG_POSITION, -1, 101))
        if d.add_descriptors:
            self.input_event_ranges.append(EventRange(EventType.DESCRIPTOR, 0, self.num_descriptor_classes))
        if d.add_distances:
            self.event_ranges.append(EventRange(EventType.DISTANCE, 0, 640))
        if d.add_positions:
            p = d.position_precision
            x_min, x_max, y_min, y_max = (v // p for v in d.position_range)
            if d.position_split_axes:
                self.event_ranges.append(EventRange(EventType.POS_X, x_min, x_max))
                self.event_ranges.append(EventRange(EventType.POS_Y, y_min, y_max))
            else:
                x_count = x_max - x_min + 1
                y_count = y_max - y_min + 1
                self.event_ranges.append(EventRange(EventType.POS, 0, x_count * y_count - 1))
        if 3 in d.gamemodes:
            if d.add_keycount_token:
                self.input_event_ranges.append(EventRange(EventType.MANIA_KEYCOUNT, 1, 18))
            if d.add_hold_note_ratio_token:
                self.input_event_ranges.append(EventRange(EventType.HOLD_NOTE_RATIO, -1, 12))
            self.event_ranges.append(EventRange(EventType.MANIA_COLUMN, 0, 17))
        if 1 in d.gamemodes or 3 in d.gamemodes:
            if d.add_scroll_speed_ratio_token:
                self.input_event_ranges.append(EventRange(EventType.SCROLL_SPEED_RATIO, -1, 12))
            self.event_ranges.append(EventRange(EventType.SCROLL_SPEED, 0, 1000))
        if d.add_global_sv_token:
            self.input_event_ranges.append(EventRange(EventType.GLOBAL_SV, 40, 360))

    def _finalize(self) -> None:
        """Assign contiguous id blocks to every range (output then input)."""
        self.event_range: dict[EventType, EventRange] = (
            {er.type: er for er in self.event_ranges}
            | {er.type: er for er in self.input_event_ranges})
        self.event_start: dict[EventType, int] = {}
        self.event_end: dict[EventType, int] = {}
        offset = self.offset
        for er in self.event_ranges + self.input_event_ranges:
            self.event_start[er.type] = offset
            offset += er.max_value - er.min_value + 1
            self.event_end[er.type] = offset
        self.vocab_size_out = self.offset + sum(
            er.max_value - er.min_value + 1 for er in self.event_ranges)
        self.vocab_size_in = self.vocab_size_out + sum(
            er.max_value - er.min_value + 1 for er in self.input_event_ranges)

    # -- core codec ----------------------------------------------------------

    @property
    def pad_id(self) -> int:
        return 0

    @property
    def sos_id(self) -> int:
        return 1

    @property
    def eos_id(self) -> int:
        return 2

    def encode(self, event: Event) -> int:
        er = self.event_range.get(event.type)
        if er is None:
            raise ValueError(f"unknown event type: {event.type}")
        if not er.min_value <= event.value <= er.max_value:
            raise ValueError(
                f"event value {event.value} out of range "
                f"[{er.min_value}, {er.max_value}] for {event.type}")
        return self.event_start[event.type] + event.value - er.min_value

    def decode(self, token_id: int) -> Event:
        for er in self.event_ranges + self.input_event_ranges:
            start = self.event_start[er.type]
            if start <= token_id < self.event_end[er.type]:
                return Event(type=er.type, value=er.min_value + token_id - start)
        raise ValueError(f"id {token_id} is not mapped to any event")

    def event_type_range(self, event_type: EventType) -> tuple[int, int]:
        """Inclusive [first_id, last_id] of an event type's id block."""
        if event_type not in self.event_range:
            raise ValueError(f"unknown event type: {event_type}")
        er = self.event_range[event_type]
        start = self.event_start[event_type]
        return start, start + (er.max_value - er.min_value)

    # -- typed encoders (metadata conditioning) ------------------------------

    def encode_gamemode(self, gamemode: int) -> int:
        return self.encode(Event(EventType.GAMEMODE, gamemode))

    def encode_diff_event(self, diff: float) -> Event:
        value = int(np.clip(int(diff * self.num_diff_classes / self.max_difficulty),
                            0, self.num_diff_classes - 1))
        return Event(EventType.DIFFICULTY, value)

    def encode_diff(self, diff: float) -> int:
        return self.encode(self.encode_diff_event(diff))

    def decode_diff(self, token_id: int) -> float:
        if token_id == self.diff_unk:
            return -1
        start, end = self.event_start[EventType.DIFFICULTY], self.event_end[EventType.DIFFICULTY]
        if not start <= token_id < end:
            raise ValueError(f"token id {token_id} is not a difficulty token")
        return self.decode(token_id).value * self.max_difficulty / self.num_diff_classes

    @property
    def diff_unk(self) -> int:
        return self.encode(Event(EventType.DIFFICULTY, self.num_diff_classes))

    def encode_style_event(self, beatmap_id: int) -> Event:
        idx = self.beatmap_idx.get(beatmap_id, self.num_classes)
        return Event(EventType.STYLE, idx)

    def encode_style(self, beatmap_id: int) -> int:
        return self.encode(self.encode_style_event(beatmap_id))

    def encode_style_idx(self, beatmap_idx: int) -> int:
        return self.encode(Event(EventType.STYLE, beatmap_idx))

    @property
    def style_unk(self) -> int:
        return self.encode(Event(EventType.STYLE, self.num_classes))

    def encode_mapper_event(self, beatmap_id: int) -> Event:
        user_id = self.beatmap_mapper.get(beatmap_id, -1)
        return Event(EventType.MAPPER,
                     self.mapper_idx.get(user_id, self.num_mapper_classes))

    def encode_mapper(self, beatmap_id: int) -> int:
        return self.encode(self.encode_mapper_event(beatmap_id))

    def encode_mapper_id(self, user_id: int) -> int:
        idx = self.mapper_idx.get(user_id, self.num_mapper_classes)
        return self.encode(Event(EventType.MAPPER, idx))

    def get_mapper_idx(self, user_id: int) -> int:
        return self.mapper_idx.get(user_id, self.num_mapper_classes)

    @property
    def mapper_unk(self) -> int:
        return self.encode(Event(EventType.MAPPER, self.num_mapper_classes))

    def encode_cs_event(self, cs: float) -> Event:
        value = int(np.clip(int(cs * (self.num_cs_classes - 1) / 10), 0,
                            self.num_cs_classes - 1))
        return Event(EventType.CS, value)

    def encode_cs(self, cs: float) -> int:
        return self.encode(self.encode_cs_event(cs))

    @property
    def cs_unk(self) -> int:
        return self.encode(Event(EventType.CS, self.num_cs_classes))

    def encode_descriptor_events(self, beatmap_id: int) -> list[Event]:
        idxs = self.beatmap_descriptors.get(beatmap_id, [self.num_descriptor_classes])
        return [Event(EventType.DESCRIPTOR, i) for i in idxs]

    def encode_descriptor(self, beatmap_id: int) -> list[int]:
        return [self.encode(e) for e in self.encode_descriptor_events(beatmap_id)]

    def encode_descriptor_name(self, descriptor: str) -> int:
        idx = self.descriptor_idx.get(descriptor, self.num_descriptor_classes)
        return self.encode_descriptor_idx(idx)

    def encode_descriptor_idx(self, descriptor_idx: int) -> int:
        return self.encode(Event(EventType.DESCRIPTOR, descriptor_idx))

    @property
    def descriptor_unk(self) -> int:
        return self.encode(Event(EventType.DESCRIPTOR, self.num_descriptor_classes))

    def descriptor_name(self, descriptor_idx: int) -> str:
        for name, idx in self.descriptor_idx.items():
            if idx == descriptor_idx:
                return name
        return "unknown"

    @property
    def year_unk(self) -> int:
        return self.encode(Event(EventType.YEAR, 2077))

    def encode_year(self, year: int) -> int:
        return self.encode(Event(EventType.YEAR, year))

    @staticmethod
    def ratio_to_value(ratio: float, resolution: int) -> int:
        value = int(np.clip(round(ratio * resolution), 0, resolution))
        if ratio <= 0:
            value = -1
        elif ratio >= 1:
            value = resolution + 1
        return value

    @property
    def hold_note_ratio_unk(self) -> int:
        return self.encode(Event(EventType.HOLD_NOTE_RATIO, 12))

    def encode_hold_note_ratio(self, ratio: Optional[float]) -> int:
        if ratio is None:
            return self.hold_note_ratio_unk
        return self.encode(Event(EventType.HOLD_NOTE_RATIO, self.ratio_to_value(ratio, 10)))

    @property
    def scroll_speed_ratio_unk(self) -> int:
        return self.encode(Event(EventType.SCROLL_SPEED_RATIO, 12))

    def encode_scroll_speed_ratio(self, ratio: Optional[float]) -> int:
        if ratio is None:
            return self.scroll_speed_ratio_unk
        return self.encode(Event(EventType.SCROLL_SPEED_RATIO, self.ratio_to_value(ratio, 10)))

    def encode_song_length_event(self, song_length_ms: float) -> Event:
        value = int(np.clip(song_length_ms // 10000, 0, 60))
        return Event(EventType.SONG_LENGTH, value)

    def encode_song_length(self, song_length_ms: float) -> int:
        return self.encode(self.encode_song_length_event(song_length_ms))

    def encode_song_position_event(self, song_position_ms: float,
                                   song_length_ms: float) -> Event:
        value = self.ratio_to_value(song_position_ms / song_length_ms, 100)
        return Event(EventType.SONG_POSITION, value)

    def encode_song_position(self, song_position_ms: float, song_length_ms: float) -> int:
        return self.encode(self.encode_song_position_event(
            song_position_ms, song_length_ms))

    def encode_global_sv(self, global_sv: float) -> int:
        return self.encode(Event(EventType.GLOBAL_SV,
                                 round(float(np.clip(global_sv, 0.4, 3.6)) * 100)))

    # -- metadata index loading (training datasets) ---------------------------

    def load_dataset_indices(self, metadata) -> None:
        """Populate beatmap/mapper/descriptor indices from an MMRS metadata
        DataFrame (columns: Id, BeatmapIdx, UserId, OmdbTags).
        (reference: tokenizer.py:494-598)"""
        flat = metadata.reset_index()
        self.beatmap_idx = flat.set_index("Id")["BeatmapIdx"].to_dict()
        self.beatmap_mapper = flat.set_index("Id")["UserId"].to_dict()
        unique_users = metadata["UserId"].unique().tolist()
        self.mapper_idx = {uid: i for i, uid in enumerate(unique_users)}
        self.num_mapper_classes = len(unique_users)
        if "OmdbTags" in metadata:
            tags = metadata["OmdbTags"].explode().dropna().unique()
            for name in tags:
                self.descriptor_idx[name] = len(self.descriptor_idx)
            self.beatmap_descriptors = (
                flat.set_index("Id")["OmdbTags"]
                .apply(lambda x: None if np.count_nonzero(x) == 0
                       else [self.descriptor_idx[y] for y in x])
                .dropna().to_dict())
            self.num_descriptor_classes = len(self.descriptor_idx)
        # MAPPER/DESCRIPTOR ranges are sized by the counts above: rebuild ids
        self._rebuild_vocab()

    # -- persistence (reference tokenizer.json schema) ------------------------

    def state_dict(self) -> dict:
        def er_state(x: EventRange) -> dict:
            return {"type": x.type.value, "min_value": x.min_value, "max_value": x.max_value}

        return {
            "offset": self.offset,
            "context_sos": {k.value: v for k, v in self.context_sos.items()},
            "context_eos": {k.value: v for k, v in self.context_eos.items()},
            "event_ranges": [er_state(er) for er in self.event_ranges],
            "input_event_ranges": [er_state(er) for er in self.input_event_ranges],
            "num_classes": self.num_classes,
            "num_diff_classes": self.num_diff_classes,
            "max_difficulty": self.max_difficulty,
            "event_range": {k.value: er_state(v) for k, v in self.event_range.items()},
            "event_start": {k.value: v for k, v in self.event_start.items()},
            "event_end": {k.value: v for k, v in self.event_end.items()},
            "vocab_size_out": self.vocab_size_out,
            "vocab_size_in": self.vocab_size_in,
            "beatmap_idx": self.beatmap_idx,
            "beatmap_mapper": self.beatmap_mapper,
            "mapper_idx": self.mapper_idx,
            "num_mapper_classes": self.num_mapper_classes,
            "beatmap_descriptors": self.beatmap_descriptors,
            "descriptor_idx": self.descriptor_idx,
            "num_descriptor_classes": self.num_descriptor_classes,
            "num_cs_classes": self.num_cs_classes,
        }

    def load_state_dict(self, state: dict) -> None:
        def load_er(x) -> EventRange:
            return EventRange(EventType(x["type"]), x["min_value"], x["max_value"])

        self.offset = state.get("offset", 3)
        self.context_sos = {ContextType(k): v for k, v in state.get("context_sos", {}).items()}
        self.context_eos = {ContextType(k): v for k, v in state.get("context_eos", {}).items()}
        if "event_ranges" in state:
            self.event_ranges = [load_er(x) for x in state["event_ranges"]]
        if "input_event_ranges" in state:
            self.input_event_ranges = [load_er(x) for x in state["input_event_ranges"]]
        self.num_classes = state["num_classes"]
        self.num_diff_classes = state["num_diff_classes"]
        self.max_difficulty = state["max_difficulty"]
        if "event_range" in state:
            self.event_range = {EventType(k): load_er(v) for k, v in state["event_range"].items()}
        if "event_start" in state:
            self.event_start = {EventType(k): v for k, v in state["event_start"].items()}
        if "event_end" in state:
            self.event_end = {EventType(k): v for k, v in state["event_end"].items()}
        self.vocab_size_out = state["vocab_size_out"]
        self.vocab_size_in = state["vocab_size_in"]
        self.beatmap_idx = {int(k): v for k, v in state.get("beatmap_idx", {}).items()}
        self.beatmap_mapper = {int(k): v for k, v in state.get("beatmap_mapper", {}).items()}
        self.mapper_idx = {int(k): v for k, v in state.get("mapper_idx", {}).items()}
        self.num_mapper_classes = state.get("num_mapper_classes", 0)
        self.beatmap_descriptors = {int(k): v for k, v in state.get("beatmap_descriptors", {}).items()}
        self.descriptor_idx = state.get("descriptor_idx", {})
        self.num_descriptor_classes = state.get("num_descriptor_classes", 0)
        self.num_cs_classes = state.get("num_cs_classes", 0)

    def save_pretrained(self, save_directory: Union[str, os.PathLike]) -> None:
        Path(save_directory).mkdir(parents=True, exist_ok=True)
        with open(Path(save_directory) / "tokenizer.json", "w", encoding="utf-8") as f:
            f.write(json.dumps(self.state_dict(), ensure_ascii=False))

    @classmethod
    def from_pretrained(cls, path: Union[str, os.PathLike]) -> "Tokenizer":
        path = Path(path)
        file = path / "tokenizer.json" if path.is_dir() else path
        with open(file, encoding="utf-8") as f:
            state = json.load(f)
        tok = cls()
        tok.load_state_dict(state)
        return tok


def _ctx_out(c) -> list:
    """Out-context names of one `context_types` entry (str or dict form)."""
    if isinstance(c, dict):
        return [v.value if isinstance(v, ContextType) else v for v in c.get("out", [])]
    return []
