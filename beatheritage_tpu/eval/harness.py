"""FID / rhythm evaluation harness.

(reference: calc_fid.py:382 main, :194 generate_beatmaps, :268
calculate_metrics) Generates beatmaps for a held-out corpus slice, extracts
classifier features over fixed-length windows for real and generated maps,
and reports FID plus active/passive rhythm precision/recall/F1. The
reference fakes scale with N OS processes each loading the full model stack
(calc_fid.py:398); here a single process batches everything through the
jitted classifier — the device does the parallelism.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from ..osu.beatmap import Beatmap
from .fid import fid_between
from .rhythm import (
    calculate_f1,
    calculate_precision,
    calculate_recall,
    get_rhythm,
    merge_stats,
    rhythm_stats,
)


def beatmap_windows_tokens(beatmap: Beatmap, parser, tokenizer,
                           window_ms: float = 8192.0, max_tokens: int = 512
                           ) -> list[np.ndarray]:
    """Tokenize a beatmap into fixed windows for classifier features
    (reference classifier/classify.py:39 ExampleDataset)."""
    from ..events import EventType  # noqa: PLC0415
    events, event_times = parser.parse(beatmap)
    if not events:
        return []
    windows = []
    t0 = 0.0
    end = max(event_times)
    er = tokenizer.event_range[EventType.TIME_SHIFT]
    while t0 <= end:
        toks = []
        for ev, t in zip(events, event_times):
            if not t0 <= t < t0 + window_ms:
                continue
            if ev.type == EventType.TIME_SHIFT:
                from ..events import Event  # noqa: PLC0415
                v = int(np.clip(int((ev.value - t0) / 10), er.min_value, er.max_value))
                toks.append(tokenizer.encode(Event(EventType.TIME_SHIFT, v)))
            else:
                try:
                    toks.append(tokenizer.encode(ev))
                except ValueError:
                    continue
        if toks:
            arr = np.full(max_tokens, tokenizer.pad_id, np.int32)
            arr[:min(len(toks), max_tokens)] = toks[:max_tokens]
            windows.append(arr)
        t0 += window_ms
    return windows


@dataclasses.dataclass
class FidReport:
    fid: Optional[float]
    active_rhythm: dict
    passive_rhythm: dict
    n_real: int
    n_generated: int
    # mean rhythm complexity (bits/note, trained rcomplexion model); the
    # generated distribution should track the real one
    complexity_real: Optional[float] = None
    complexity_gen: Optional[float] = None

    def as_dict(self) -> dict:
        out = {"fid": self.fid, "n_real": self.n_real,
               "n_generated": self.n_generated}
        for name, stats in (("active", self.active_rhythm),
                            ("passive", self.passive_rhythm)):
            out[f"rhythm_{name}_precision"] = calculate_precision(stats)
            out[f"rhythm_{name}_recall"] = calculate_recall(stats)
            out[f"rhythm_{name}_f1"] = calculate_f1(stats)
        if self.complexity_real is not None or self.complexity_gen is not None:
            out["rhythm_complexity_real"] = self.complexity_real
            out["rhythm_complexity_generated"] = self.complexity_gen
        return out


def evaluate_pairs(real_paths: list, generated_paths: list,
                   feature_fn=None, parser=None, tokenizer=None,
                   complexity_fn=None) -> FidReport:
    """Compare (real, generated) beatmap pairs.

    feature_fn(beatmap) -> (N, D) classifier features, or None to skip FID.
    complexity_fn(beatmap) -> float rhythm complexity (bits/note, trained
    rcomplexion model — reference rcomplexion/inference.py:20), or None;
    generated maps should match the real maps' complexity distribution.
    """
    active = {"true_positives": 0, "false_positives": 0, "false_negatives": 0}
    passive = dict(active)
    real_feats, gen_feats = [], []
    real_cx, gen_cx = [], []
    n_real = n_gen = 0
    for real_path, gen_path in zip(real_paths, generated_paths):
        try:
            real = Beatmap.from_path(real_path)
            gen = Beatmap.from_path(gen_path)
        except (OSError, ValueError):
            continue
        n_real += 1
        n_gen += 1
        active = merge_stats(active, rhythm_stats(get_rhythm(real), get_rhythm(gen)))
        passive = merge_stats(passive, rhythm_stats(
            get_rhythm(real, passive=True), get_rhythm(gen, passive=True)))
        if feature_fn is not None:
            rf = feature_fn(real)
            gf = feature_fn(gen)
            if rf is not None and len(rf):
                real_feats.append(rf)
            if gf is not None and len(gf):
                gen_feats.append(gf)
        if complexity_fn is not None:
            rc = complexity_fn(real)
            gc = complexity_fn(gen)
            if rc is not None:
                real_cx.append(float(rc))
            if gc is not None:
                gen_cx.append(float(gc))

    fid = None
    if real_feats and gen_feats:
        ra = np.concatenate(real_feats)
        ga = np.concatenate(gen_feats)
        if len(ra) > 1 and len(ga) > 1:
            fid = fid_between(ra, ga)
    cx_real = float(np.mean(real_cx)) if real_cx else None
    cx_gen = float(np.mean(gen_cx)) if gen_cx else None
    return FidReport(fid, active, passive, n_real, n_gen,
                     complexity_real=cx_real, complexity_gen=cx_gen)


def check_training_overlap(generated_ids: list[int],
                           training_ids: set[int]) -> list[int]:
    """Beatmap IDs of generated maps that leak from the training set
    (reference calc_fid.py:360)."""
    return [bid for bid in generated_ids if bid in training_ids]
