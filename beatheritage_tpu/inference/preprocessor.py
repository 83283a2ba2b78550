"""Audio -> overlapping window sequences for generation.

(reference: osuT5/osuT5/inference/preprocessor.py:11) Sequential mode strides
by (1 - lookback - lookahead) of a window (90% overlap with the production
defaults 0.5/0.4); parallel mode uses non-overlapping windows. Returns host
numpy; the mel transform runs on device inside the jitted encoder.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.audio import load_audio

MILISECONDS_PER_SECOND = 1000


class Preprocessor:
    def __init__(self, args, parallel: bool = False):
        self.frame_seq_len = args.train.data.src_seq_len - 1
        self.frame_size = args.train.data.hop_length
        self.sample_rate = args.train.data.sample_rate
        self.samples_per_sequence = self.frame_seq_len * self.frame_size
        self.sequence_stride = int(self.samples_per_sequence * (1 - args.lookback - args.lookahead))
        self.parallel = parallel
        if parallel:
            self.sequence_stride = self.samples_per_sequence
        self.miliseconds_per_stride = self.sequence_stride * MILISECONDS_PER_SECOND / self.sample_rate
        self.miliseconds_per_sequence = self.samples_per_sequence * MILISECONDS_PER_SECOND / self.sample_rate
        self.lookback_max_time = args.lookback * self.miliseconds_per_sequence
        self.lookahead_max_time = (1 - args.lookahead) * self.miliseconds_per_sequence
        self.start_time = args.start_time
        self.end_time = args.end_time
        self.normalize_audio = args.train.data.normalize_audio

    def load(self, path: str) -> np.ndarray:
        return load_audio(path, self.sample_rate, normalize=self.normalize_audio)

    def segment(self, samples: np.ndarray, begin_pad: int = 0, end_pad: int = 0
                ) -> tuple[np.ndarray, np.ndarray, float]:
        """Samples -> (windows (N, samples_per_sequence) f32,
        window start times (N,) int32 ms, song length ms)."""
        song_length = len(samples) / self.sample_rate * MILISECONDS_PER_SECOND
        samples = np.pad(samples, (begin_pad, end_pad))

        if len(samples) < self.samples_per_sequence:
            padding = self.samples_per_sequence - len(samples)
        else:
            remainder = (len(samples) - self.samples_per_sequence) % self.sequence_stride
            padding = 0 if remainder == 0 else self.sequence_stride - remainder
        samples = np.pad(samples, (0, padding)).astype(np.float32)

        n_windows = (len(samples) - self.samples_per_sequence) // self.sequence_stride + 1
        idx = (np.arange(n_windows)[:, None] * self.sequence_stride
               + np.arange(self.samples_per_sequence)[None, :])
        windows = samples[idx]
        window_times = (np.arange(n_windows) * self.miliseconds_per_stride).astype(np.int32)

        if self.start_time is not None:
            # drop windows whose generation range ends before start_time
            start_idx = int(np.searchsorted(window_times,
                                            self.start_time - self.lookahead_max_time,
                                            side="right"))
            start_idx = min(start_idx, len(window_times) - 1)
            windows, window_times = windows[start_idx:], window_times[start_idx:]
        if self.end_time is not None:
            end_idx = int(np.searchsorted(window_times,
                                          self.end_time - self.lookback_max_time,
                                          side="left"))
            end_idx = max(end_idx, 1)
            windows, window_times = windows[:end_idx], window_times[:end_idx]

        return windows, window_times, song_length
