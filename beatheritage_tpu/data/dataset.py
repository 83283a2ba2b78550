"""Training data pipeline: MMRS/ORS corpora -> windowed token sequences.

Host-side re-design of the reference's IterableDatasets
(reference: osuT5/osuT5/dataset/mmrs_dataset.py:30 MmrsDataset,
ors_dataset.py:28 OrsDataset): per-track audio reuse, random context-type
sampling with weights, windowing into (frames, in_context, out_context)
sequences, special-token prefixes with per-token dropout->UNK, decoder
input/label split with pre-tokens and labels_offset, timing-offset / DT /
frame-offset / lookback augmentations, and curriculum switches at step N.

Yields plain numpy dicts matching the train step's batch keys; batching and
prefetch are provided by `batch_iterator`.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import threading
import queue as queue_mod
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from ..events import ContextType, Event, EventType
from ..osu.beatmap import Beatmap
from .audio import load_audio
from .event_utils import (
    get_hitsounded_status,
    get_hold_note_ratio,
    get_scroll_speed_ratio,
    get_song_length,
    remove_events_of_type,
)

MILISECONDS_PER_SECOND = 1000
STEPS_PER_MILLISECOND = 0.1
LABEL_IGNORE_ID = -100


def load_mmrs_metadata(path):
    """metadata.parquet -> DataFrame indexed by (BeatmapSetId, Id)."""
    import pandas as pd  # noqa: PLC0415
    df = pd.read_parquet(Path(path) / "metadata.parquet")
    df["BeatmapIdx"] = df.index
    df.set_index(["BeatmapSetId", "Id"], inplace=True)
    df.sort_index(inplace=True)
    return df


def load_ors_metadata(path):
    """Build an MMRS-shaped DataFrame from the older ORS folder layout
    (per-track metadata.json; reference ors_dataset.py:28)."""
    import pandas as pd  # noqa: PLC0415
    rows = []
    for set_idx, track in enumerate(sorted(Path(path).iterdir())):
        meta_file = track / "metadata.json"
        if not track.is_dir() or not meta_file.is_file():
            continue
        with open(meta_file) as f:
            meta = json.load(f)
        for name, bm in meta.get("Beatmaps", {}).items():
            rows.append({
                "BeatmapSetId": set_idx,
                "Id": bm.get("BeatmapId", -1),
                "BeatmapIdx": bm.get("Index", len(rows)),
                "BeatmapSetFolder": track.name,
                "BeatmapFile": name + ".osu" if not name.endswith(".osu") else name,
                "AudioFile": meta.get("AudioFile", "audio.mp3"),
                "ModeInt": bm.get("Mode", 0),
                "UserId": bm.get("CreatorId", -1),
                "StarRating": [bm.get("StandardStarRating", {}).get("0", 5.0)] * 7,
                "SubmittedDate": meta.get("SubmittedDate"),
                "OmdbTags": [],
            })
    df = pd.DataFrame(rows)
    df.set_index(["BeatmapSetId", "Id"], inplace=True)
    df.sort_index(inplace=True)
    return df


def filter_mmrs_metadata(df, *, start=None, end=None, subset_ids=None,
                         gamemodes=None, min_year=None, max_year=None,
                         min_difficulty=None, max_difficulty=None):
    from datetime import datetime  # noqa: PLC0415
    if start is not None and end is not None:
        labels = df.index.get_level_values(0).unique()
        end = min(end, len(labels))
        df = df.loc[labels[start]:labels[end - 1]]
    if subset_ids is not None:
        df = df.loc[subset_ids]
    if gamemodes is not None:
        df = df[df["ModeInt"].isin(gamemodes)]
    if min_year is not None:
        df = df[df["RankedDate"] >= datetime(min_year, 1, 1)]
    if max_year is not None:
        df = df[df["RankedDate"] < datetime(max_year + 1, 1, 1)]
    if min_difficulty is not None:
        df = df[df["DifficultyRating"] >= min_difficulty]
    if max_difficulty is not None:
        df = df[df["DifficultyRating"] <= max_difficulty]
    return df


@dataclasses.dataclass
class SharedTrainState:
    """Cross-iterator curriculum state (replaces the reference's
    mp.Manager Namespace; model_utils.py:26)."""

    current_train_step: int = 0
    current_loss: float = np.inf


class BeatmapSequenceGenerator:
    """Generates training examples for a slice of the corpus."""

    def __init__(self, metadata, args, path: Path, parser, tokenizer,
                 test: bool, shared: Optional[SharedTrainState] = None,
                 sample_weights: Optional[dict] = None, seed: int = 0):
        self.metadata = metadata
        self.args = args
        self.path = Path(path)
        self.parser = parser
        self.tokenizer = tokenizer
        self.test = test
        self.shared = shared
        self.sample_weights = sample_weights
        self.rng = random.Random(seed)
        self.frame_seq_len = args.src_seq_len - 1
        self.min_pre_token_len = 4
        self.pre_token_len = args.tgt_seq_len // 2
        self.add_pre_tokens = args.add_pre_tokens
        self.add_empty_sequences = args.add_empty_sequences

    # -- curriculum ------------------------------------------------------------

    def maybe_change_dataset(self):
        if self.shared is None:
            return
        step = self.shared.current_train_step
        if 0 <= self.args.add_empty_sequences_at_step <= step:
            self.add_empty_sequences = True
        if 0 <= self.args.add_pre_tokens_at_step <= step:
            self.add_pre_tokens = True

    # -- audio framing -----------------------------------------------------------

    def _get_frames(self, samples: np.ndarray):
        pad = self.args.hop_length - len(samples) % self.args.hop_length
        samples = np.pad(samples, (0, pad))
        frames = samples.reshape(-1, self.args.hop_length)
        frames_per_ms = self.args.sample_rate / self.args.hop_length / MILISECONDS_PER_SECOND
        frame_times = np.arange(len(frames)) / frames_per_ms
        return frames, frame_times

    # -- augmentation knobs ---------------------------------------------------------

    def _get_speed_augment(self) -> float:
        if self.test or self.rng.random() >= self.args.dt_augment_prob:
            return 1.0
        mi, ma = self.args.dt_augment_range
        base = self.rng.random()
        if self.args.dt_augment_sqrt:
            base = base ** 0.5
        return mi + (ma - mi) * base

    def _get_difficulty(self, beatmap_metadata, speed: float = 1.0) -> float:
        star_ratings = beatmap_metadata["StarRating"]
        speeds = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0]
        return float(np.interp(speed, speeds, star_ratings))

    # -- main iteration ----------------------------------------------------------------

    def __iter__(self) -> Iterator[dict]:
        for beatmapset_id in self.metadata.index.get_level_values(0).unique():
            metadata = self.metadata.loc[beatmapset_id]
            if self.args.add_gd_context and len(metadata) <= 1:
                continue
            speed = self._get_speed_augment()
            track_path = self.path / "data" / metadata.iloc[0]["BeatmapSetFolder"]
            audio_path = track_path / metadata.iloc[0]["AudioFile"]
            try:
                audio_samples = load_audio(audio_path, self.args.sample_rate,
                                           speed, self.args.normalize_audio)
            except Exception as e:  # tolerate broken audio, like the reference
                print(f"Failed to load audio file: {audio_path}\n{e}")
                continue
            for i, beatmap_metadata in metadata.iterrows():
                try:
                    yield from self._get_next_beatmap(
                        audio_samples, i, beatmap_metadata, metadata, speed)
                except Exception as e:
                    print(f"Failed to process beatmap {beatmap_metadata.get('BeatmapFile')}: {e}")

    def _get_next_beatmap(self, audio_samples, i, beatmap_metadata,
                          set_metadata, speed: float):
        # pick a context template by weight (mmrs_dataset.py:731-746)
        context_info = {"in": [ContextType.NONE], "out": [ContextType.MAP]}
        if self.args.context_types:
            picked = self.rng.choices(
                self.args.context_types,
                weights=(self.args.context_weights or None))[0]
            context_info = {
                "in": [ContextType(c) if isinstance(c, str) else c
                       for c in picked.get("in", [])],
                "out": [ContextType(c) if isinstance(c, str) else c
                        for c in picked.get("out", [])],
            }
            if ContextType.GD in context_info["in"] and len(set_metadata) <= 1:
                context_info["in"].remove(ContextType.GD)
                if not context_info["in"]:
                    context_info["in"].append(ContextType.NONE)
            if beatmap_metadata["ModeInt"] != 3 and ContextType.SV in context_info["out"]:
                context_info["out"].remove(ContextType.SV)

        beatmap_path = (self.path / "data" / beatmap_metadata["BeatmapSetFolder"]
                        / beatmap_metadata["BeatmapFile"])
        frames, frame_times = self._get_frames(audio_samples)
        osu_beatmap = Beatmap.from_path(beatmap_path)

        def add_special_data(data, bm_meta, beatmap: Beatmap):
            gamemode = bm_meta["ModeInt"]
            data["gamemode"] = gamemode
            data["beatmap_id"] = beatmap.beatmap_id
            data["beatmap_idx"] = bm_meta["BeatmapIdx"]
            data["difficulty"] = self._get_difficulty(bm_meta, speed)
            data["year"] = getattr(bm_meta.get("SubmittedDate"), "year", 2020)
            data["hitsounded"] = get_hitsounded_status(beatmap)
            data["song_length"] = get_song_length(audio_samples, self.args.sample_rate)
            if gamemode in (0, 2):
                data["global_sv"] = beatmap.slider_multiplier
                data["circle_size"] = beatmap.circle_size
            if gamemode == 3:
                data["keycount"] = int(beatmap.circle_size)
                data["hold_note_ratio"] = get_hold_note_ratio(beatmap)
            if gamemode in (1, 3):
                data["scroll_speed_ratio"] = get_scroll_speed_ratio(beatmap)

        def get_context(context: ContextType, identifier, add_type=True):
            data = {"extra": {"context_type": context, "add_type": add_type,
                              "id": f"{identifier}_{context.value}"}}
            if context == ContextType.NONE:
                data["events"], data["event_times"] = [], []
            elif context == ContextType.TIMING:
                data["events"], data["event_times"] = self.parser.parse_timing(osu_beatmap, speed)
            elif context == ContextType.NO_HS:
                ev, et = self.parser.parse(osu_beatmap, speed)
                data["events"], data["event_times"] = remove_events_of_type(
                    ev, et, [EventType.HITSOUND, EventType.VOLUME])
            elif context == ContextType.GD:
                other = set_metadata.drop(i).sample().iloc[0]
                other_path = (self.path / "data" / other["BeatmapSetFolder"]
                              / other["BeatmapFile"])
                other_beatmap = Beatmap.from_path(other_path)
                data["events"], data["event_times"] = self.parser.parse(other_beatmap, speed)
                add_special_data(data["extra"], other, other_beatmap)
            elif context == ContextType.MAP:
                data["events"], data["event_times"] = self.parser.parse(osu_beatmap, speed)
            elif context == ContextType.KIAI:
                data["events"], data["event_times"] = self.parser.parse_kiai(osu_beatmap, speed)
            elif context == ContextType.SV:
                data["events"], data["event_times"] = self.parser.parse_scroll_speeds(osu_beatmap, speed)
            return data

        extra_data = {
            "beatmap_idx": np.int32(
                beatmap_metadata["BeatmapIdx"]
                if self.test or self.rng.random() >= self.args.class_dropout_prob
                else self.tokenizer.num_classes),
            "mapper_idx": np.int32(
                self.tokenizer.get_mapper_idx(beatmap_metadata["UserId"])
                if self.test or self.rng.random() >= self.args.mapper_dropout_prob
                else self.tokenizer.num_mapper_classes),
            "difficulty": np.float32(self._get_difficulty(beatmap_metadata, speed)),
            "special": {},
        }
        add_special_data(extra_data["special"], beatmap_metadata, osu_beatmap)
        if self.sample_weights is not None:
            extra_data["sample_weights"] = np.float32(
                self.sample_weights.get(osu_beatmap.beatmap_id, 1.0))

        out_context = [get_context(c, "out", add_type=self.args.add_out_context_types)
                       for c in context_info["out"]]
        in_context = [get_context(c, "in") for c in context_info["in"]]
        if self.args.add_gd_context:
            in_context.append(get_context(ContextType.GD, "extra_gd", False))

        for sequence in self._create_sequences(frames, frame_times, out_context,
                                               in_context, extra_data):
            self.maybe_change_dataset()
            sequence = self._normalize_time_shifts(sequence, beatmap_path)
            sequence = self._tokenize_sequence(sequence)
            sequence = self._pad_frame_sequence(sequence)
            sequence = self._pad_and_split_token_sequence(sequence)
            if not self.add_empty_sequences and bool(np.all(
                    (sequence["labels"] == self.tokenizer.eos_id)
                    | (sequence["labels"] == LABEL_IGNORE_ID))):
                continue
            yield sequence

    # -- windowing (mmrs_dataset.py:248) ---------------------------------------------

    def _create_sequences(self, frames, frame_times, out_context, in_context,
                          extra_data):
        def get_event_indices(events, event_times):
            if not events:
                return [], []
            start_indices = []
            event_index = 0
            for current_time in frame_times:
                while event_index < len(events) and event_times[event_index] < current_time:
                    event_index += 1
                start_indices.append(event_index)
            end_indices = start_indices[1:] + [start_indices[-1]]
            return start_indices, end_indices

        start_indices, end_indices = {}, {}
        for context in in_context + out_context:
            cid = context["extra"]["id"]
            start_indices[cid], end_indices[cid] = get_event_indices(
                context["events"], context["event_times"])

        sequences = []
        n_frames = len(frames)
        offset = (self.rng.randint(0, min(self.frame_seq_len, 2000))
                  if not self.test and self.rng.random() < self.args.frame_offset_augment_prob
                  else 0)
        gen_start_frame_x = (int(round(self.args.lookback * self.frame_seq_len))
                             if not self.test and self.rng.random() < self.args.lookback_prob
                             else 0)
        gen_end_frame_x = int(round((1 - self.args.lookahead) * self.frame_seq_len))
        last_kiai: dict = {}
        last_sv: dict = {}

        for frame_start_idx in range(offset, n_frames - gen_start_frame_x,
                                     self.frame_seq_len):
            frame_end_idx = min(frame_start_idx + self.frame_seq_len, n_frames)
            gen_start_frame = min(frame_start_idx + gen_start_frame_x, n_frames - 1)
            gen_end_frame = min(frame_start_idx + gen_end_frame_x, n_frames)
            frame_pre_idx = max(frame_start_idx - self.frame_seq_len, 0)

            def slice_events(context, fs, fe):
                if not context["events"]:
                    return []
                cid = context["extra"]["id"]
                return context["events"][start_indices[cid][fs]:end_indices[cid][fe - 1]]

            def slice_context(context, fs, fe):
                cid = context["extra"]["id"]
                result = {"events": slice_events(context, fs, fe)} | context["extra"]
                result["time"] = frame_times[fs]
                result["labels_offset"] = (start_indices[cid][gen_start_frame]
                                           - start_indices[cid][fs]) if context["events"] else 0
                return result

            sequence = {
                "frames": frames[frame_start_idx:frame_end_idx],
                "out_context": [slice_context(c, frame_start_idx, gen_end_frame)
                                for c in out_context],
                "in_context": [slice_context(c, frame_start_idx, frame_end_idx)
                               for c in in_context],
                "song_position": np.array(
                    [frame_start_idx / n_frames, frame_end_idx / n_frames],
                    np.float32),
            } | extra_data
            sequence["special"] = dict(sequence["special"])
            sequence["special"]["time"] = frame_times[frame_start_idx]

            if self.args.add_pre_tokens or self.args.add_pre_tokens_at_step >= 0:
                sequence["pre_events"] = slice_events(
                    out_context[0], frame_pre_idx, frame_start_idx)

            def track_last(sequence_context, store, etype, default, key):
                if sequence_context["id"] in store:
                    sequence_context[key] = store[sequence_context["id"]]
                else:
                    sequence_context[key] = default
                for event in reversed(sequence_context["events"]):
                    if event.type == etype:
                        store[sequence_context["id"]] = event
                        break

            if self.args.add_kiai_special_token:
                kiai_ctx = (ContextType.GD, ContextType.MAP)
                for sc in sequence["in_context"] + sequence["out_context"]:
                    if (sc["context_type"] == ContextType.KIAI
                            or (self.args.add_kiai and sc["context_type"] in kiai_ctx)):
                        track_last(sc, last_kiai, EventType.KIAI,
                                   Event(EventType.KIAI, 0), "last_kiai")
                for sc in sequence["out_context"]:
                    if "last_kiai" in sc:
                        sequence["special"]["last_kiai"] = sc["last_kiai"]
            if self.args.add_sv_special_token:
                sv_ctx = (ContextType.GD, ContextType.MAP)
                for sc in sequence["in_context"] + sequence["out_context"]:
                    if (sc["context_type"] == ContextType.SV
                            or ((self.args.add_sv or self.args.add_mania_sv)
                                and sc["context_type"] in sv_ctx)):
                        track_last(sc, last_sv, EventType.SCROLL_SPEED,
                                   Event(EventType.SCROLL_SPEED, 100), "last_sv")
                for sc in sequence["out_context"]:
                    if "last_sv" in sc:
                        sequence["special"]["last_sv"] = sc["last_sv"]

            sequences.append(sequence)
        return sequences

    # -- normalization / tokenization (mmrs_dataset.py:383-508) ------------------------

    def _normalize_time_shifts(self, sequence, beatmap_path):
        er = self.tokenizer.event_range[EventType.TIME_SHIFT]

        def process(events, start_time):
            out = list(events)
            for i, event in enumerate(out):
                if event.type == EventType.TIME_SHIFT:
                    t = int((event.value - start_time) * STEPS_PER_MILLISECOND)
                    if t < er.min_value or t > er.max_value:
                        t = int(np.clip(t, er.min_value, er.max_value))
                    out[i] = Event(EventType.TIME_SHIFT, t)
            return out

        if "pre_events" in sequence:
            sequence["pre_events"] = process(sequence["pre_events"],
                                             sequence["out_context"][0]["time"])
        for context in sequence["in_context"] + sequence["out_context"]:
            context["events"] = process(context["events"], context["time"])
        return sequence

    def _get_special_tokens(self, context: dict) -> list[int]:
        tok = self.tokenizer
        a = self.args
        st: list[int] = []
        if "beatmap_id" not in context:
            return st
        rnd = self.rng.random

        def keep(prob):
            return self.test or rnd() >= prob

        if a.add_gamemode_token:
            st.append(tok.encode_gamemode(context["gamemode"]))
        if a.add_style_token:
            st.append(tok.encode_style_idx(context["beatmap_idx"])
                      if keep(a.class_dropout_prob) else tok.style_unk)
        if a.add_diff_token:
            st.append(tok.encode_diff(context["difficulty"])
                      if keep(a.diff_dropout_prob) else tok.diff_unk)
        if a.add_mapper_token:
            st.append(tok.encode_mapper(context["beatmap_id"])
                      if keep(a.mapper_dropout_prob) else tok.mapper_unk)
        if a.add_year_token:
            st.append(tok.encode_year(context["year"])
                      if keep(a.year_dropout_prob) else tok.year_unk)
        if a.add_hitsounded_token:
            st.append(tok.encode(Event(EventType.HITSOUNDED, int(context["hitsounded"]))))
        if a.add_song_length_token:
            st.append(tok.encode_song_length(context["song_length"]))
        if a.add_global_sv_token and "global_sv" in context:
            st.append(tok.encode_global_sv(context["global_sv"]))
        if a.add_cs_token and "circle_size" in context:
            st.append(tok.encode_cs(context["circle_size"])
                      if keep(a.cs_dropout_prob) else tok.cs_unk)
        if a.add_keycount_token and "keycount" in context:
            st.append(tok.encode(Event(EventType.MANIA_KEYCOUNT, context["keycount"])))
        if a.add_hold_note_ratio_token and "hold_note_ratio" in context:
            st.append(tok.encode_hold_note_ratio(context["hold_note_ratio"])
                      if keep(a.hold_note_ratio_dropout_prob) else tok.hold_note_ratio_unk)
        if a.add_scroll_speed_ratio_token and "scroll_speed_ratio" in context:
            st.append(tok.encode_scroll_speed_ratio(context["scroll_speed_ratio"])
                      if keep(a.scroll_speed_ratio_dropout_prob) else tok.scroll_speed_ratio_unk)
        if a.add_descriptors:
            st.extend(tok.encode_descriptor(context["beatmap_id"])
                      if keep(a.descriptor_dropout_prob) else [tok.descriptor_unk])
        if a.add_kiai_special_token and "last_kiai" in context:
            st.append(tok.encode(context["last_kiai"]))
        if a.add_sv_special_token and "last_sv" in context:
            st.append(tok.encode(context["last_sv"]))
        if a.add_song_position_token:
            st.append(tok.encode_song_position(context["time"], context["song_length"]))
        return st

    def _tokenize_sequence(self, sequence):
        sequence["special_tokens"] = self._get_special_tokens(sequence["special"])
        for context in sequence["in_context"] + sequence["out_context"]:
            context["tokens"] = np.array(
                [self.tokenizer.encode(e) for e in context["events"]], np.int64)
            context["special_tokens"] = self._get_special_tokens(context)
        if "pre_events" in sequence:
            sequence["pre_tokens"] = np.array(
                [self.tokenizer.encode(e) for e in sequence["pre_events"]], np.int64)
            del sequence["pre_events"]
        return sequence

    def _pad_frame_sequence(self, sequence):
        frames = sequence["frames"].astype(np.float32)
        if frames.shape[0] != self.frame_seq_len:
            padded = np.zeros((self.frame_seq_len, frames.shape[-1]), np.float32)
            n = min(self.frame_seq_len, len(frames))
            padded[:n] = frames[:n]
            frames = padded
        frames = frames.reshape(-1)
        if getattr(self.args, "pcm_int16", False):
            # int16 PCM transfer: mel_from_config converts back on device
            frames = np.clip(np.round(frames * 32768.0),
                             -32768, 32767).astype(np.int16)
        sequence["frames"] = frames
        return sequence

    def _pad_and_split_token_sequence(self, sequence):
        tok = self.tokenizer
        a = self.args
        stl = 1 + len(sequence["special_tokens"])
        for context in sequence["in_context"] + sequence["out_context"]:
            if context["add_type"]:
                stl += 2
            stl += len(context["special_tokens"])

        num_tokens = sum(len(c["tokens"]) for c in sequence["out_context"])
        num_pre_tokens = len(sequence.get("pre_tokens", []))
        if a.max_pre_token_len > 0:
            num_pre_tokens = min(num_pre_tokens, a.max_pre_token_len)
        num_other_tokens = sum(len(c["tokens"]) for c in sequence["in_context"])

        if a.center_pad_decoder:
            n = min(a.tgt_seq_len - self.pre_token_len - 1, num_tokens)
            m = min(self.pre_token_len - stl + 1, num_pre_tokens)
            o = min(self.pre_token_len - m - stl + 1, num_other_tokens)
            si = self.pre_token_len - m - stl + 1 - o
        else:
            n = min(a.tgt_seq_len - stl - min(self.min_pre_token_len, num_pre_tokens),
                    num_tokens)
            m = min(a.tgt_seq_len - stl - n, num_pre_tokens)
            o = min(a.tgt_seq_len - stl - n - m, num_other_tokens)
            si = 0

        input_tokens = np.full(a.tgt_seq_len, tok.pad_id, np.int64)
        label_tokens = np.full(a.tgt_seq_len, LABEL_IGNORE_ID, np.int64)

        def add_special(st, si):
            for t in st:
                input_tokens[si] = t
                si += 1
            return si

        def add_context(context, si, max_tokens, add_labels=False):
            if context["add_type"]:
                input_tokens[si] = tok.context_sos[context["context_type"]]
                if add_labels:
                    label_tokens[si - 1] = tok.context_sos[context["context_type"]]
                si += 1
            start_label_index = si + context["labels_offset"]
            si = add_special(context["special_tokens"], si)
            k = min(len(context["tokens"]), max_tokens)
            input_tokens[si:si + k] = context["tokens"][:k]
            si += k
            max_tokens -= k
            if context["add_type"]:
                input_tokens[si] = tok.context_eos[context["context_type"]]
                si += 1
            if add_labels:
                label_tokens[start_label_index - 1:si - 1] = input_tokens[start_label_index:si]
            return si, max_tokens

        for context in sequence["in_context"]:
            si, o = add_context(context, si, o)
        si = add_special(sequence["special_tokens"], si)
        start_random_index = si
        if m > 0:
            input_tokens[si:si + m] = sequence["pre_tokens"][-m:]
            si += m
        input_tokens[si] = tok.sos_id
        si += 1
        for context in sequence["out_context"]:
            si, n = add_context(context, si, n, True)
        end_index = si
        label_tokens[end_index - 1] = tok.eos_id

        # timing-offset anti-drift augmentation (mmrs_dataset.py:611-630)
        if a.timing_random_offset > 0 or a.timing_random_offset_2 > 0:
            seg = input_tokens[start_random_index:end_index]
            offset = seg.copy()
            if self.rng.random() < a.timing_random_offset_prob and a.timing_random_offset > 0:
                offset = offset + np.random.randint(
                    -a.timing_random_offset, a.timing_random_offset + 1, seg.shape)
            if self.rng.random() < a.timing_random_offset_prob and a.timing_random_offset_2 > 0:
                offset = offset + np.random.randint(
                    -a.timing_random_offset_2, a.timing_random_offset_2 + 1)
            ts_start = tok.event_start[EventType.TIME_SHIFT]
            ts_end = tok.event_end[EventType.TIME_SHIFT]
            is_ts = (seg >= ts_start) & (seg < ts_end)
            input_tokens[start_random_index:end_index] = np.where(
                is_ts, np.clip(offset, ts_start, ts_end - 1), seg)

        out = {
            "frames": sequence["frames"],
            "decoder_input_ids": input_tokens.astype(np.int32),
            "decoder_attention_mask": (input_tokens != tok.pad_id).astype(np.int32),
            "labels": label_tokens.astype(np.int32),
            "beatmap_idx": sequence["beatmap_idx"],
            "mapper_idx": sequence["mapper_idx"],
            "difficulty": sequence["difficulty"],
            "song_position": sequence["song_position"],
        }
        if "sample_weights" in sequence:
            out["sample_weights"] = sequence["sample_weights"]
        return out


class MmrsDataset:
    """Iterable over the MMRS (or ORS-adapted) corpus with track shuffling
    and interleaved sub-iterators (mmrs_dataset.py:111-170)."""

    def __init__(self, args, parser, tokenizer, subset_ids=None, test=False,
                 shared: Optional[SharedTrainState] = None, seed: int = 0):
        self.args = args
        self.parser = parser
        self.tokenizer = tokenizer
        self.test = test
        self.shared = shared
        self.seed = seed
        self.path = Path(args.test_dataset_path if test else args.train_dataset_path)
        self.start = args.test_dataset_start if test else args.train_dataset_start
        self.end = args.test_dataset_end if test else args.train_dataset_end
        self.subset_ids = subset_ids
        if args.dataset_type == "ors":
            self.metadata = load_ors_metadata(self.path)
        else:
            self.metadata = load_mmrs_metadata(self.path)
        self.sample_weights = self._load_sample_weights(args.sample_weights_path)

    @staticmethod
    def _load_sample_weights(path):
        if not path or not Path(path).exists():
            return None
        with open(path) as f:
            weights = {int(line.split(",")[0]): float(np.clip(float(line.split(",")[1]), 0.1, 10))
                       for line in f}
        mean = sum(weights.values()) / len(weights)
        return {k: v / mean for k, v in weights.items()}

    def _filtered(self):
        return filter_mmrs_metadata(
            self.metadata, start=self.start, end=self.end,
            subset_ids=self.subset_ids, gamemodes=self.args.gamemodes,
            min_year=self.args.min_year, max_year=self.args.max_year,
            min_difficulty=self.args.min_difficulty,
            max_difficulty=self.args.max_difficulty)

    def __iter__(self) -> Iterator[dict]:
        metadata = self._filtered()
        if not self.test:
            set_ids = metadata.index.get_level_values(0).unique().to_numpy().copy()
            np.random.shuffle(set_ids)
            metadata = metadata.loc[set_ids]
        if self.args.cycle_length > 1 and not self.test:
            splits = np.array_split(
                metadata.index.get_level_values(0).unique().to_numpy(),
                self.args.cycle_length)
            iterators = [iter(self._generator(metadata.loc[ids], i))
                         for i, ids in enumerate(splits) if len(ids)]
            while iterators:
                for it in list(iterators):
                    try:
                        yield next(it)
                    except StopIteration:
                        iterators.remove(it)
            return
        yield from self._generator(metadata, 0)

    def _generator(self, metadata, seed_offset: int):
        return BeatmapSequenceGenerator(
            metadata, self.args, self.path, self.parser, self.tokenizer,
            self.test, self.shared, self.sample_weights,
            seed=self.seed + seed_offset)


def batch_iterator(dataset, batch_size: int, drop_last: bool = True,
                   prefetch: int = 2) -> Iterator[dict]:
    """Stack examples into numpy batches, prefetching on a thread."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    sentinel = object()

    def producer():
        batch = []
        try:
            for item in dataset:
                batch.append(item)
                if len(batch) == batch_size:
                    q.put({k: np.stack([b[k] for b in batch]) for k in batch[0]})
                    batch = []
            if batch and not drop_last:
                q.put({k: np.stack([b[k] for b in batch]) for k in batch[0]})
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


def repeating_batch_iterator(make_dataset, batch_size: int, **kwargs):
    """Endless epochs for step-based training."""
    while True:
        yield from batch_iterator(make_dataset(), batch_size, **kwargs)


# -- multiprocess loading ----------------------------------------------------------

def _mp_worker(cfg, tokenizer_state, test, seed, worker_id, num_workers,
               step_value, q) -> None:
    """Worker process: rebuild tokenizer/parser/dataset and stream examples.

    Each worker owns a disjoint slice of the mapset ids (the reference shards
    DataLoader workers the same way, model_utils.py:256-269) and loops epochs
    forever with a fresh shuffle seed.
    """
    import os  # noqa: PLC0415
    os.environ["JAX_PLATFORMS"] = "cpu"  # workers never touch the TPU
    from ..tokenizer import Tokenizer  # noqa: PLC0415
    from .parser import BeatmapParser  # noqa: PLC0415

    tokenizer = Tokenizer(cfg)
    tokenizer.load_state_dict(tokenizer_state)
    parser = BeatmapParser(cfg, tokenizer)

    class _SharedView:
        current_loss = np.inf

        @property
        def current_train_step(self):
            return step_value.value

    args = cfg.data
    path = Path(args.test_dataset_path if test else args.train_dataset_path)
    loader = load_ors_metadata if args.dataset_type == "ors" else load_mmrs_metadata
    all_ids = loader(path).index.get_level_values(0).unique().to_numpy()
    start = args.test_dataset_start if test else args.train_dataset_start
    end = min(args.test_dataset_end if test else args.train_dataset_end, len(all_ids))
    all_ids = all_ids[start:end]  # subset_ids is applied on top of start/end
    my_ids = [int(s) for i, s in enumerate(all_ids) if i % num_workers == worker_id]

    epoch = 0
    while True:
        ds = MmrsDataset(args, parser, tokenizer, subset_ids=my_ids, test=test,
                         shared=_SharedView(), seed=seed + worker_id + epoch * 7919)
        np.random.seed(seed + worker_id + epoch * 7919)
        for ex in ds:
            # daemon children survive a SIGKILLed/wedged parent (init adopts
            # them); seen live as orphan workers pinning ~400 MB + 1% CPU
            # each for hours on a 1-core host. Bounded put so a full queue
            # can't mask the orphan check.
            while True:
                if os.getppid() == 1:
                    return
                try:
                    q.put(ex, timeout=5.0)
                    break
                except queue_mod.Full:
                    continue
        epoch += 1
        if test:
            q.put(None)  # epoch sentinel for finite test iteration
            return


def multiprocess_batch_iterator(cfg, tokenizer, batch_size: int,
                                num_workers: int = 8, *, test: bool = False,
                                seed: int = 0,
                                shared: Optional[SharedTrainState] = None,
                                queue_depth: int = 4) -> Iterator[dict]:
    """Endless batches assembled from `num_workers` dataset processes.

    TPU-native equivalent of the reference's DataLoader(num_workers=8): the
    GIL-bound parse/tokenize work (audio slice, .osu parse, event encoding)
    fans out over processes while the parent assembles numpy batches. The
    curriculum step crosses into workers via a shared Value (the reference
    uses an mp.Manager Namespace, model_utils.py:26)."""
    import multiprocessing as mp  # noqa: PLC0415

    ctx = mp.get_context("spawn")
    step_value = ctx.Value("q", 0)
    q = ctx.Queue(maxsize=max(queue_depth * batch_size, 64))
    state = tokenizer.state_dict()
    old_platform = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"  # inherited by spawned children
    procs = []
    try:
        for w in range(num_workers):
            p = ctx.Process(target=_mp_worker,
                            args=(cfg, state, test, seed, w, num_workers,
                                  step_value, q),
                            daemon=True)
            p.start()
            procs.append(p)
    finally:
        if old_platform is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old_platform

    done_workers = 0
    batch: list = []
    try:
        while True:
            if shared is not None:
                step_value.value = shared.current_train_step
            item = q.get()
            if item is None:  # test-mode epoch sentinel
                done_workers += 1
                if done_workers == num_workers:
                    break
                continue
            batch.append(item)
            if len(batch) == batch_size:
                yield {k: np.stack([b[k] for b in batch]) for k in batch[0]}
                batch = []
    finally:
        for p in procs:
            p.terminate()
