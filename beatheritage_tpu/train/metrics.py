"""Evaluation metrics: per-token-class accuracies bucketed by context type.

(reference: osuT5/osuT5/utils/train_utils.py:179 eval_model, :270 get_stats,
:302 acc_range, :312 fuzzy_acc_range, log_utils.py:5 Averager) Computed on
host numpy from gathered (preds, labels) — cheap relative to the forward.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..events import ContextType, EventType

LABEL_IGNORE_ID = -100


class Averager:
    """Rolling means over metric dicts (values may be arrays of per-token
    outcomes or scalars)."""

    def __init__(self):
        self.sums: dict[str, float] = {}
        self.counts: dict[str, float] = {}

    def update(self, stats: dict) -> None:
        for k, v in stats.items():
            arr = np.asarray(v, dtype=np.float64)
            if arr.size == 0:
                continue
            self.sums[k] = self.sums.get(k, 0.0) + float(arr.sum())
            self.counts[k] = self.counts.get(k, 0.0) + float(arr.size)

    def average(self) -> dict:
        return {k: self.sums[k] / self.counts[k] for k in self.sums}


def acc_range(preds, labels, start_index, end_index) -> np.ndarray:
    index = (labels >= start_index) & (labels < end_index)
    return (preds[index] == labels[index]).astype(np.float32)


def fuzzy_acc_range(preds, labels, start_index, end_index,
                    fuzzyness: int = 0) -> np.ndarray:
    index = (labels >= start_index) & (labels < end_index)
    p, l = preds[index], labels[index]
    return ((p - fuzzyness <= l) & (l <= p + fuzzyness)).astype(np.float32)


def get_stats(loss, preds, labels, tokenizer, args) -> dict:
    es, ee = tokenizer.event_start, tokenizer.event_end
    stats = {
        "loss": float(loss),
        "timing_acc": acc_range(preds, labels, es[EventType.TIME_SHIFT],
                                ee[EventType.TIME_SHIFT]),
        "fuzzy_timing_acc": fuzzy_acc_range(preds, labels,
                                            es[EventType.TIME_SHIFT],
                                            ee[EventType.TIME_SHIFT], 2),
        "hitsound_acc": acc_range(preds, labels, es[EventType.HITSOUND],
                                  ee[EventType.HITSOUND]),
        "volume_acc": acc_range(preds, labels, es[EventType.VOLUME],
                                ee[EventType.VOLUME]),
        "other_acc": acc_range(preds, labels, ee[EventType.VOLUME],
                               ee[EventType.VOLUME] + tokenizer.vocab_size_out),
    }
    d = args.data
    if d.add_positions:
        if d.position_split_axes:
            stats["position_acc"] = acc_range(preds, labels, es[EventType.POS_X],
                                              ee[EventType.POS_Y])
        else:
            stats["position_acc"] = acc_range(preds, labels, es[EventType.POS],
                                              ee[EventType.POS])
    if d.add_distances:
        stats["spacing_acc"] = acc_range(preds, labels, es[EventType.DISTANCE],
                                         ee[EventType.DISTANCE])
    if 3 in d.gamemodes:
        stats["column_acc"] = acc_range(preds, labels, es[EventType.MANIA_COLUMN],
                                        ee[EventType.MANIA_COLUMN])
    if 1 in d.gamemodes or 3 in d.gamemodes:
        stats["scroll_speed_acc"] = acc_range(preds, labels,
                                              es[EventType.SCROLL_SPEED],
                                              ee[EventType.SCROLL_SPEED])
    return stats


def context_buckets(decoder_input_ids: np.ndarray, tokenizer, args) -> dict:
    """Row masks per context template: a row belongs to a template when its
    prompt contains exactly that template's in-context SOS markers
    (eval_model:222-242)."""
    all_in = set()
    templates = []
    for cts in args.data.context_types:
        ins = ([ContextType(cts)] if isinstance(cts, str)
               else [ContextType(c) if isinstance(c, str) else c
                     for c in cts.get("in", [])])
        templates.append(ins)
        all_in.update(ins)

    buckets = {}
    for ins in templates:
        mask = np.ones(decoder_input_ids.shape[0], dtype=bool)
        for c in ins:
            if c in tokenizer.context_sos:
                mask &= (decoder_input_ids == tokenizer.context_sos[c]).any(axis=1)
        for c in all_in - set(ins):
            if c in tokenizer.context_sos:
                mask &= ~(decoder_input_ids == tokenizer.context_sos[c]).any(axis=1)
        buckets["+".join(c.value for c in ins) or "none"] = mask
    return buckets


def time_in_window_accuracy(preds, labels, tokenizer, bins: int = 100) -> dict:
    """Time-token accuracy bucketed by position within the audio window
    (reference: osuT5/test.py:94-140 time bins)."""
    start = tokenizer.event_start[EventType.TIME_SHIFT]
    end = tokenizer.event_end[EventType.TIME_SHIFT]
    span = max(end - start, 1)
    idx = (labels >= start) & (labels < end)
    l = labels[idx]
    p = preds[idx]
    if len(l) == 0:
        return {}
    bucket = np.minimum(((l - start) * bins) // span, bins - 1)
    out = {}
    for b in np.unique(bucket):
        m = bucket == b
        out[f"time_bin_{int(b):03d}_acc"] = float((p[m] == l[m]).mean())
    return out


def timeshift_offset_histogram(preds, labels, tokenizer,
                               max_offset: int = 3) -> dict:
    """Distribution of prediction offsets (in time tokens) for time-shift
    labels (reference: osuT5/test.py timeshift precision offsets)."""
    start = tokenizer.event_start[EventType.TIME_SHIFT]
    end = tokenizer.event_end[EventType.TIME_SHIFT]
    idx = (labels >= start) & (labels < end) & (preds >= start) & (preds < end)
    if not idx.any():
        return {}
    diff = preds[idx].astype(np.int64) - labels[idx].astype(np.int64)
    total = len(diff)
    out = {}
    for off in range(-max_offset, max_offset + 1):
        out[f"timeshift_offset_{off:+d}"] = float((diff == off).sum() / total)
    out["timeshift_offset_other"] = float((np.abs(diff) > max_offset).sum() / total)
    return out


def evaluate_batches(eval_step, params, batches, tokenizer, args,
                     max_steps: Optional[int] = None) -> dict:
    """Run eval batches through a jitted (loss, logits) step and bucket
    accuracies per context type. eval_step(params, batch) -> (loss, logits)."""
    averager = Averager()
    for i, batch in enumerate(batches):
        if max_steps is not None and i >= max_steps:
            break
        loss, logits = eval_step(params, batch)
        preds = np.argmax(np.asarray(logits), axis=-1)
        labels = np.asarray(batch["labels"])
        averager.update(time_in_window_accuracy(preds, labels, tokenizer))
        averager.update(timeshift_offset_histogram(preds, labels, tokenizer))
        buckets = context_buckets(np.asarray(batch["decoder_input_ids"]),
                                  tokenizer, args)
        any_bucket = False
        for name, mask in buckets.items():
            if not mask.any():
                continue
            any_bucket = True
            stats = get_stats(float(loss), preds[mask], labels[mask],
                              tokenizer, args)
            averager.update({f"{name}/{k}": v for k, v in stats.items()})
        if not any_bucket:
            averager.update(get_stats(float(loss), preds, labels, tokenizer, args))
    return {f"test/{k}": v for k, v in averager.average().items()}
