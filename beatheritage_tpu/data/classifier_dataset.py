"""Classifier and rcomplexion training datasets.

- Classifier (reference: classifier/libs/dataset + classify.py:39
  ExampleDataset): fixed 8 s windows of (audio, map tokens) labeled with the
  mapper index, for the mapper classifier / FID feature extractor.
- rcomplexion (reference: rcomplexion/libs/dataset): sliding windows of
  rhythm tokens predicting the next note-time token.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Iterator

import numpy as np

from ..events import Event, EventType
from ..osu.beatmap import Beatmap
from .audio import load_audio
from .event_utils import events_of_type

WINDOW_MS = 8192.0
MILISECONDS_PER_STEP = 10


class ClassifierDataset:
    """Yields {audio (n_samples,), tokens (max_tokens,), label ()} windows."""

    def __init__(self, args, parser, tokenizer, metadata=None, path=None,
                 test=False, max_tokens: int = 512, seed: int = 0,
                 use_audio: bool = True):
        from .dataset import load_mmrs_metadata  # noqa: PLC0415
        self.args = args
        self.parser = parser
        self.tokenizer = tokenizer
        self.path = Path(path if path is not None else args.train_dataset_path)
        self.metadata = (metadata if metadata is not None
                         else load_mmrs_metadata(self.path))
        self.test = test
        self.max_tokens = max_tokens
        self.rng = random.Random(seed)
        self.sample_rate = args.sample_rate
        self.window_samples = int(WINDOW_MS / 1000 * self.sample_rate)
        # token-only mode (FID instrument): skip audio IO entirely and span
        # windows over the event range instead of the audio length
        self.use_audio = use_audio

    def __iter__(self) -> Iterator[dict]:
        for beatmapset_id in self.metadata.index.get_level_values(0).unique():
            metadata = self.metadata.loc[beatmapset_id]
            track = self.path / "data" / metadata.iloc[0]["BeatmapSetFolder"]
            audio = None
            if self.use_audio:
                try:
                    audio = load_audio(track / metadata.iloc[0]["AudioFile"],
                                       self.sample_rate)
                except Exception:
                    continue
            # after .loc[beatmapset_id] the remaining index level IS the
            # beatmap Id (MMRS metadata indexes by (BeatmapSetId, Id))
            for beatmap_id, row in metadata.iterrows():
                try:
                    bm = Beatmap.from_path(track / row["BeatmapFile"])
                    events, event_times = self.parser.parse(bm)
                except Exception:
                    continue
                label = self.tokenizer.get_mapper_idx(row["UserId"])
                er = self.tokenizer.event_range[EventType.TIME_SHIFT]
                # random per-epoch phase: without it every epoch yields the
                # exact same window crops and the classifier memorizes them
                # instead of the style (held-out top-1 was chance in r3);
                # eval (test=True) keeps the deterministic grid
                t0 = 0.0 if self.test else self.rng.uniform(0.0, WINDOW_MS)
                # token-only windows include the partial tail, matching
                # eval.harness.beatmap_windows_tokens (the FID feature path)
                end_ms = ((len(audio) / self.sample_rate * 1000 - WINDOW_MS)
                          if audio is not None
                          else (max(event_times) if event_times else -1.0))
                while t0 <= end_ms:
                    if audio is not None:
                        s0 = int(t0 / 1000 * self.sample_rate)
                        window_audio = audio[s0:s0 + self.window_samples]
                    toks = []
                    for ev, t in zip(events, event_times):
                        if not t0 <= t < t0 + WINDOW_MS:
                            continue
                        if ev.type == EventType.TIME_SHIFT:
                            v = int(np.clip((ev.value - t0) / MILISECONDS_PER_STEP,
                                            er.min_value, er.max_value))
                            toks.append(self.tokenizer.encode(
                                Event(EventType.TIME_SHIFT, v)))
                        else:
                            try:
                                toks.append(self.tokenizer.encode(ev))
                            except ValueError:
                                pass
                    if toks:
                        arr = np.full(self.max_tokens, self.tokenizer.pad_id, np.int32)
                        arr[:min(len(toks), self.max_tokens)] = toks[:self.max_tokens]
                        item = {"tokens": arr, "label": np.int32(label),
                                "beatmap_id": np.int64(
                                    row["Id"] if "Id" in row.index
                                    else beatmap_id)}
                        if audio is not None:
                            item["audio"] = window_audio.astype(np.float32)
                        yield item
                    t0 += WINDOW_MS


class RComplexionDataset:
    """Yields {input_ids (L,), label ()} sliding windows of rhythm tokens.

    Rhythm tokens = time shifts of note starts quantized like the seq2seq
    tokenizer; the target is the time token of the next note."""

    def __init__(self, args, parser, tokenizer, metadata=None, path=None,
                 src_seq_len: int = 16, seed: int = 0):
        from .dataset import load_mmrs_metadata  # noqa: PLC0415
        self.args = args
        self.parser = parser
        self.tokenizer = tokenizer
        self.path = Path(path if path is not None else args.train_dataset_path)
        self.metadata = (metadata if metadata is not None
                         else load_mmrs_metadata(self.path))
        self.src_seq_len = src_seq_len
        self.rng = random.Random(seed)

    def beatmap_windows(self, beatmap: Beatmap):
        """Per-beatmap sliding rhythm-token windows (also used at inference
        to score real maps)."""
        events, event_times = self.parser.parse(beatmap)
        type_events, type_times = events_of_type(
            events, event_times,
            [EventType.CIRCLE, EventType.SLIDER_HEAD, EventType.HOLD_NOTE])
        if len(type_times) < self.src_seq_len + 1:
            return
        times = np.asarray(type_times, dtype=np.float64)
        deltas = np.clip(np.diff(times) / MILISECONDS_PER_STEP, 0, 511).astype(np.int64)
        er = self.tokenizer.event_range[EventType.TIME_SHIFT]
        deltas = np.clip(deltas, er.min_value, er.max_value)
        base = self.tokenizer.event_start[EventType.TIME_SHIFT] - er.min_value
        tokens = deltas + base
        for i in range(len(tokens) - self.src_seq_len):
            yield {"input_ids": tokens[i:i + self.src_seq_len].astype(np.int32),
                   "label": np.int32(tokens[i + self.src_seq_len])}

    def __iter__(self) -> Iterator[dict]:
        flat = self.metadata.reset_index()
        for _, row in flat.iterrows():
            path = (self.path / "data" / row["BeatmapSetFolder"]
                    / row["BeatmapFile"])
            try:
                bm = Beatmap.from_path(path)
            except Exception:
                continue
            yield from self.beatmap_windows(bm)
