"""Diffusion (DiT) training dataset: beatmaps -> windowed 20-feature sequences.

(reference: osu_diffusion/utils/data_loading.py) Each hit object contributes
(x, y, time, distance, one-hot of 16 kind indices incl. new-combo variants
and repeat-type buckets); sequences window at seq_len with a stride, with
random flips, distance noise, and double-time augmentation. Feature/context
layout matches the inference pipeline (diffusion/pipeline.py) exactly.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from ..diffusion.pipeline import PLAYFIELD, repeat_type
from ..osu.beatmap import Beatmap, Circle, HoldNote, Slider, Spinner

# kind indices (reference data_loading.py create_datapoint/get_data):
# 0 circle, 1 circle NC, 2 spinner, 3 spinner end, 4 slider head,
# 5 slider head NC, 6 bezier anchor, 7 perfect anchor, 8 catmull anchor,
# 9 red anchor, 10 last anchor, 11..15 slider end by repeat bucket
KIND_CIRCLE = 0
KIND_SPINNER = 2
KIND_SPINNER_END = 3
KIND_SLIDER_HEAD = 4
KIND_ANCHOR = {"Bezier": 6, "PerfectCurve": 7, "Catmull": 8, "Linear": 9}
KIND_RED_ANCHOR = 9
KIND_LAST_ANCHOR = 10
KIND_SLIDER_END = 11
NUM_KINDS = 16


def beatmap_to_points(beatmap: Beatmap, speed: float = 1.0) -> np.ndarray:
    """Beatmap -> (N, 3 + NUM_KINDS) rows of (x, y, time, one-hot kind)."""
    rows: list[np.ndarray] = []

    def add(time, pos, kind):
        row = np.zeros(3 + NUM_KINDS, np.float32)
        row[0] = float(np.clip(pos[0], -256, 768))
        row[1] = float(np.clip(pos[1], -256, 640))
        row[2] = time / speed
        row[3 + kind] = 1.0
        rows.append(row)

    for ho in beatmap.hit_objects():
        if isinstance(ho, (Circle, HoldNote)):
            add(ho.time, ho.position, KIND_CIRCLE + int(getattr(ho, "new_combo", False)))
        elif isinstance(ho, Spinner):
            add(ho.time, (256, 192), KIND_SPINNER)
            add(ho.end_time, (256, 192), KIND_SPINNER_END)
        elif isinstance(ho, Slider):
            add(ho.time, ho.position, KIND_SLIDER_HEAD + int(ho.new_combo))
            cps = ho.all_points
            if len(cps) >= 100:
                continue
            n = len(cps)
            span = ho.duration / max(ho.repeat, 1)
            curve = ho.curve_type
            for i in range(1, n - 1):
                t = ho.time + i / (n - 1) * span
                if curve == "Bezier":
                    if np.all(cps[i] == cps[i + 1]):
                        kind = KIND_RED_ANCHOR
                    elif np.all(cps[i] == cps[i - 1]):
                        continue
                    else:
                        kind = KIND_ANCHOR["Bezier"]
                else:
                    kind = KIND_ANCHOR.get(curve, KIND_ANCHOR["Bezier"])
                add(t, cps[i], kind)
            add(ho.time + span, cps[-1], KIND_LAST_ANCHOR)
            add(ho.end_time, ho.path.position_at(1.0),
                KIND_SLIDER_END + repeat_type(max(ho.repeat, 1)))
    if not rows:
        return np.zeros((0, 3 + NUM_KINDS), np.float32)
    out = np.stack(rows)
    return out[np.argsort(out[:, 2], kind="stable")]


def points_to_example(points: np.ndarray, rng: random.Random,
                      distance_std: float = 0.1, augment: bool = True
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(L, 3+K) points -> (seq_x (L,2) in [-1,1], o (L,) times,
    d (L,) jump distances). Kinds stay in points[:, 3:].

    The (L, 272) sinusoidal context embedding is NOT built here: the train
    step computes it on device (train_diffusion.py make_context) so each
    batch ships ~100 KB of raw scalars instead of ~9 MB of embeddings —
    the embedding is pure elementwise work the TPU does for free, while
    host->device bandwidth is the scarce resource.
    """
    pos = points[:, :2].copy()
    times = points[:, 2]
    if augment:
        if rng.random() < 0.5:  # horizontal flip
            pos[:, 0] = 512 - pos[:, 0]
        if rng.random() < 0.5:  # vertical flip
            pos[:, 1] = 384 - pos[:, 1]
    deltas = np.diff(pos, axis=0, prepend=pos[:1])
    distance = np.linalg.norm(deltas, axis=1)
    if augment and distance_std > 0:
        distance = distance * np.exp(np.random.randn(*distance.shape) * distance_std)
    seq_x = (pos / PLAYFIELD * 2 - 1).astype(np.float32)
    return seq_x, times.astype(np.float32), distance.astype(np.float32)


class DiffusionDataset:
    """Iterates windowed (seq_x, seq_c, class_vector, t-range) examples over
    an MMRS/ORS corpus for DiT training."""

    def __init__(self, args, tokenizer, metadata=None, path=None, test=False,
                 seed: int = 0):
        from .dataset import load_mmrs_metadata  # noqa: PLC0415
        self.args = args
        self.tokenizer = tokenizer  # DiffusionTokenizer
        self.path = Path(path if path is not None else args.data.train_dataset_path)
        self.metadata = (metadata if metadata is not None
                         else load_mmrs_metadata(self.path))
        self.test = test
        self.rng = random.Random(seed)
        self.seq_len = args.data.seq_len
        self.stride = args.data.stride
        # Beatmap.from_path + the slider/anchor walks in beatmap_to_points
        # dominate loader cost; both are augmentation-independent (double-time
        # only rescales the cached time column), so parse each map ONCE and
        # re-augment the cached points every epoch (cheap vectorized numpy).
        self._entries: Optional[list] = None

    def _load_entries(self) -> list:
        flat = self.metadata.reset_index()
        entries = []
        for i in range(len(flat)):
            row = flat.iloc[i]
            beatmap_path = (self.path / "data" / row["BeatmapSetFolder"]
                            / row["BeatmapFile"])
            try:
                bm = Beatmap.from_path(beatmap_path)
            except (OSError, ValueError):
                continue
            points = beatmap_to_points(bm)
            if len(points) < 2:
                continue
            entries.append((row, bm.beatmap_id, bm.circle_size, points))
        return entries

    def class_vector(self, beatmap_meta, beatmap_id: int,
                     circle_size: float) -> np.ndarray:
        tok = self.tokenizer
        v = np.zeros(max(tok.num_tokens, 1), np.float32)
        a = self.args.data

        def keep(prob):
            return self.test or self.rng.random() >= prob

        if tok.num_classes > 0:
            v[tok.encode_style(beatmap_id)
              if keep(a.class_dropout_prob) else tok.style_unk] = 1
        if tok.num_diff_classes > 0:
            sr = beatmap_meta.get("DifficultyRating", 5.0)
            v[tok.encode_diff(float(sr)) if keep(a.diff_dropout_prob)
              else tok.diff_unk] = 1
        if tok.num_mapper_classes > 0:
            v[tok.encode_mapper_id(beatmap_meta.get("UserId", -1))
              if keep(a.mapper_dropout_prob) else tok.mapper_unk] = 1
        if tok.num_descriptor_classes > 0:
            descs = tok.beatmap_descriptors.get(beatmap_id)
            if descs and keep(a.descriptor_dropout_prob):
                for idx in descs:
                    v[tok.encode_descriptor_idx(idx)] = 1
            else:
                v[tok.descriptor_unk] = 1
        if tok.num_cs_classes > 0:
            v[tok.encode_cs(circle_size)
              if keep(a.cs_dropout_prob) else tok.cs_unk] = 1
        return v

    def __iter__(self) -> Iterator[dict]:
        if self._entries is None:
            self._entries = self._load_entries()
        order = list(range(len(self._entries)))
        if not self.test:
            self.rng.shuffle(order)
        for i in order:
            row, beatmap_id, circle_size, points = self._entries[i]
            if not self.test and self.rng.random() < self.args.data.double_time_prob:
                points = points.copy()
                points[:, 2] /= 1.5  # double-time: same as parsing at speed 1.5
            seq_x, times, distance = points_to_example(
                points, self.rng, self.args.data.distance_std,
                augment=not self.test)
            kinds = points[:, 3:].astype(np.float32)
            class_vec = self.class_vector(row, beatmap_id, circle_size)
            for start in range(0, max(len(points) - self.seq_len, 1) + 1,
                               self.stride):
                end = start + self.seq_len
                if end > len(points):
                    if start == 0:
                        # pad short maps to seq_len
                        pad = self.seq_len - len(points)
                        yield {"x": np.pad(seq_x, ((0, pad), (0, 0))),
                               "o": np.pad(times, (0, pad)),
                               "d": np.pad(distance, (0, pad)),
                               "k": np.pad(kinds, ((0, pad), (0, 0))),
                               "y": class_vec}
                    break
                yield {"x": seq_x[start:end], "o": times[start:end],
                       "d": distance[start:end], "k": kinds[start:end],
                       "y": class_vec}
