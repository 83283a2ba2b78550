"""Super timing generator: slow-but-accurate variable-BPM timing.

(reference: osuT5/osuT5/inference/super_timing_generator.py:15) N
randomly-offset greedy timing passes vote into per-millisecond
beat/measure/timing-point histograms; Gaussian smoothing + peak finding
recover beat locations; local BPM voting + range normalization pick a tempo
per peak; a bidirectional walk from the most prominent peaks lays down the
beat grid; measure/meter repair follows by timing-signature voting.

All model passes run through the parallel-mode Processor (batched windows on
device); the voting/walking stays host-side numpy/scipy.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter1d
from scipy.signal import find_peaks

from ..data.event_utils import get_groups
from ..events import BEAT_TYPES, ContextType, Event, EventType
from .preprocessor import Preprocessor
from .processor import GenerationConfig, Processor

MILISECONDS_PER_SECOND = 1000
MILISECONDS_PER_STEP = 10


class SuperTimingGenerator:
    def __init__(self, args, params, tokenizer):
        self.args = args
        self.preprocessor = Preprocessor(args, parallel=True)
        self.processor = Processor(args, params, tokenizer,
                                   cfg_scale=args.timer_cfg_scale)
        # deterministic (beam/greedy) parallel windows for the voting passes
        self.processor.parallel = True
        self.processor.num_beams = args.timer_num_beams
        self.processor.settings_base = dict(
            self.processor.settings_base,
            do_sample=False, top_p=1.0, top_k=50, temperature=1.0)
        cap = int(getattr(args, "timer_max_len", 0) or 0)
        if cap:
            # timing-only decodes are short; a capped program batches the
            # same windows with an 8x smaller KV cache + prefill
            self.processor.max_len_override = min(cap, self.processor.tgt_seq_len)
            # ...which also affords a much wider window batch: the offset
            # sweep flattens ~iterations x windows rows, and running them
            # 64 at a time instead of 16 cuts the sequential device rounds
            # 4x (the dominant super-timing latency after the r4 batching)
            wide = int(getattr(args, "timer_max_batch_size", 0) or 0)
            if wide > self.processor.max_batch_size:
                self.processor.max_batch_size = wide
        if getattr(args, "warmup_windows", 0):
            # warm AFTER the beam/greedy overrides so the precompiled
            # programs match the timer's actual engine branch
            self.processor.warmup(args.warmup_windows)
        self.bpm_change_threshold = args.timer_bpm_threshold
        self.types_first = args.train.data.types_first
        self.iterations = args.timer_iterations
        self.sample_rate = args.train.model.spectrogram.sample_rate
        frame_seq_len = args.train.data.src_seq_len - 1
        frame_size = args.train.model.spectrogram.hop_length
        self.miliseconds_per_sequence = (frame_seq_len * frame_size
                                         * MILISECONDS_PER_SECOND / self.sample_rate)

    def generate(self, audio: np.ndarray, generation_config: GenerationConfig,
                 verbose: bool = False):
        num_ms = len(audio) * MILISECONDS_PER_SECOND // self.sample_rate
        beats_hist = np.zeros(num_ms, int)
        measures_hist = np.zeros(num_ms, int)
        timing_points_hist = np.zeros(num_ms, int)
        tpbs: list[tuple[int, int]] = []  # (time, ticks-per-beat) votes
        measure_counts: list[tuple[int, int]] = []

        if verbose:
            print("Generating timing")
        # All offset passes are independent: flatten every pass's windows
        # into ONE row stream so the engine runs full max_batch_size batches
        # across passes (generate_many) instead of N under-sized decodes —
        # the reference loops one sequential pass at a time
        # (super_timing_generator.py:41). All passes' window stacks are
        # materialized up front: ~iterations x song-length float32 on host
        # (~0.5 GB worst case for a 5-minute song at 20 passes), a deliberate
        # trade for full device batches.
        rng = np.random.default_rng(self.args.seed if self.args.seed is not None else 0)
        jobs, offsets = [], []
        for _ in range(self.iterations):
            half = int(self.miliseconds_per_sequence // 2)
            audio_offset = int(rng.integers(-half, half))
            begin_pad = max(0, audio_offset * self.sample_rate // MILISECONDS_PER_SECOND)
            begin_remove = max(0, -audio_offset * self.sample_rate // MILISECONDS_PER_SECOND)
            sequences = self.preprocessor.segment(audio[begin_remove:], begin_pad, 0)
            jobs.append({"sequences": sequences,
                         "generation_config": generation_config})
            offsets.append(audio_offset)
        import os
        import time as _time
        profile = bool(os.environ.get("BH_TIMER_PROFILE"))
        t0 = _time.monotonic()
        results = self.processor.generate_many(
            jobs=jobs, in_context=[ContextType.NONE],
            out_context=[ContextType.MAP] if self.args.train.data.add_timing
            else [ContextType.TIMING],
            verbose=verbose)
        t_decode = _time.monotonic() - t0
        t0 = _time.monotonic()
        passes = [(off, result[0][0]) for off, result in zip(offsets, results)]
        out = self._vote_and_walk(passes, num_ms)
        if profile:
            import sys
            n_win = sum(len(j["sequences"][0]) for j in jobs)
            print(f"[timer-profile] decode={t_decode:.2f}s "
                  f"host={_time.monotonic() - t0:.2f}s windows={n_win} "
                  f"passes={self.iterations} "
                  f"max_len={self.processor.max_len_override or self.processor.tgt_seq_len}",
                  file=sys.stderr)
        return out

    def _vote_and_walk(self, passes, num_ms: int):
        """Host-side half of generate(): histogram voting over the decoded
        passes, peak finding, BPM assignment, and the beat walk. Split from
        generate() so the voting logic can be exercised (and regression-
        tested) offline on synthetic pass streams without a model."""
        beats_hist = np.zeros(num_ms, int)
        measures_hist = np.zeros(num_ms, int)
        timing_points_hist = np.zeros(num_ms, int)
        tpbs: list[tuple[int, int]] = []  # (time, ticks-per-beat) votes
        measure_counts: list[tuple[int, int]] = []
        for audio_offset, events in passes:
            self._accumulate_votes(events, audio_offset, num_ms, beats_hist,
                                   measures_hist, timing_points_hist, tpbs,
                                   measure_counts)

        n_passes = max(len(passes), 1)
        beats_hist = gaussian_filter1d(beats_hist.astype(float), 10) / n_passes * 50
        measures_hist = gaussian_filter1d(measures_hist.astype(float), 10) / n_passes * 50
        timing_points_hist = gaussian_filter1d(timing_points_hist.astype(float), 10) / n_passes * 50
        tpbs.sort(key=lambda x: x[0])
        if not tpbs:
            return [], []

        signal = beats_hist + measures_hist + timing_points_hist * 2
        peakind, properties = find_peaks(signal, distance=50, prominence=0.1,
                                         rel_height=1, width=2, wlen=50)
        if len(peakind) == 0:
            return [], []
        prominences = properties["prominences"]

        peak_bpms = self._peak_bpms(peakind, tpbs, 200, self.bpm_change_threshold)
        peak_bpms_defined = ~np.isnan(peak_bpms)
        median_bpm = 60_000 / (np.median(np.array(tpbs)[:, 1]) * MILISECONDS_PER_STEP)
        # fold octave errors into [median/1.5, median*1.5]
        with np.errstate(invalid="ignore", divide="ignore"):
            peak_bpms = peak_bpms / np.ceil(peak_bpms / (median_bpm * 1.5))
            peak_bpms = peak_bpms * np.ceil((median_bpm / 1.5) / peak_bpms)
        peak_bpms = self._fill_missing_bpms(peak_bpms, median_bpm)
        peak_bpms = self._refine_peak_bpms(peakind, peak_bpms)

        beat_times = self._walk_beats(peakind, prominences, peak_bpms,
                                      peak_bpms_defined, num_ms)
        beat_times = self._rescue_orphan_peaks(peakind, prominences,
                                               beat_times)
        beat_types = self._classify_beats(beat_times, beats_hist, measures_hist,
                                          timing_points_hist)
        self._consolidate_redlines(beat_times, beat_types, timing_points_hist)
        self._repair_meter(beat_times, beat_types, measures_hist,
                           timing_points_hist, measure_counts)
        return self._to_events(beat_times, beat_types)

    # -- vote accumulation -------------------------------------------------------

    def _accumulate_votes(self, events, audio_offset, num_ms, beats_hist,
                          measures_hist, timing_points_hist, tpbs,
                          measure_counts):
        groups, _ = get_groups(events, types_first=self.types_first)
        hist_for = {EventType.BEAT: beats_hist,
                    EventType.MEASURE: measures_hist,
                    EventType.TIMING_POINT: timing_points_hist}
        last_beat_time = None
        last_group_type = None
        last_measure_time = None
        measure_counter = None
        for group in groups:
            etype = group.event_type
            if etype not in BEAT_TYPES:
                continue
            time = group.time - audio_offset
            if not 0 <= time < num_ms:
                continue
            hist_for[etype][time] += 1

            # measure bookkeeping: BEAT extends the running count, MEASURE
            # closes and restarts it, TIMING_POINT restarts without closing
            # (an uninherited point resets the bar, it doesn't end one)
            if etype is EventType.BEAT:
                if measure_counter is not None:
                    measure_counter += 1
            else:
                if etype is EventType.MEASURE and measure_counter is not None:
                    measure_counts.append((last_measure_time, measure_counter))
                last_measure_time = time
                measure_counter = 1

            # per-beat period vote, except across a fresh timing point (the
            # gap before a redline is not a beat interval)
            fresh_timing_point = (etype is EventType.TIMING_POINT
                                  and last_group_type is not EventType.TIMING_POINT)
            if (last_beat_time is not None and last_beat_time != time
                    and not fresh_timing_point):
                tpb = (time - last_beat_time) // MILISECONDS_PER_STEP
                if 20 < tpb < 100:
                    tpbs.append((last_beat_time, tpb))
            last_beat_time = time
            last_group_type = etype

    # -- BPM assignment ------------------------------------------------------------

    @staticmethod
    def _peak_bpms(peakind, tpbs, w, thresh):
        out = []
        for peak in peakind:
            nearby = [tpb for time, tpb in tpbs if peak - w < time < peak + w]
            hist, bins = np.histogram(nearby, bins=range(20, 100))
            if hist.sum() > 0 and hist.max() > thresh * hist.sum():
                out.append(60_000 / (bins[np.argmax(hist)] * MILISECONDS_PER_STEP))
            else:
                out.append(np.nan)
        return np.array(out)

    @staticmethod
    def _fill_missing_bpms(peak_bpms, median_bpm):
        """Fill undefined per-peak BPMs from their neighbours, vectorized.

        Behavior-pinned to the reference's in-place nearest fill
        (super_timing_generator.py:147-160), which — because it mutates as
        it scans — degenerates to a forward fill with leading gaps taking
        the first defined value; all-undefined falls back to the median.
        """
        peak_bpms = np.asarray(peak_bpms, dtype=float)
        n = len(peak_bpms)
        defined = np.flatnonzero(~np.isnan(peak_bpms))
        if defined.size == 0:
            return np.full(n, median_bpm)
        src = defined[np.maximum(
            np.searchsorted(defined, np.arange(n), side="right") - 1, 0)]
        return peak_bpms[src]

    @staticmethod
    def _refine_peak_bpms(peakind, peak_bpms, window_ms: float = 1500.0,
                          rel_tol: float = 0.2):
        """Sub-tick BPM refinement from smoothed-histogram peak positions.

        The tpb votes quantize each beat interval to the 10 ms token grid,
        so `_peak_bpms` can only express periods that are multiples of
        10 ms — a true 183 BPM (327.9 ms) snaps to 330 ms = 181.8 BPM, a
        systematic ~1 BPM error that survives into the final redline (the
        set0192 failure in EVAL_TIMING_r04). The histogram PEAK positions,
        however, are sub-10 ms accurate: each voting pass shifts the token
        grid by a random integer-millisecond audio offset, so the smoothed
        vote mass centers on the true beat time. Refit each peak's period
        by least squares over nearby inter-peak gaps, using the coarse
        period only to assign integer beat counts to the gaps.

        Gaps that don't sit within `rel_tol` beats of an integer multiple
        of the coarse period are dropped — this rejects neighbours across a
        tempo change (their gaps don't fit the local grid) and spurious
        non-beat peaks. The refined value is kept only when it stays within
        half a vote tick of the coarse BPM (it is a REFINEMENT, not a
        re-estimate; octave folding already happened upstream)."""
        peakind = np.asarray(peakind, dtype=float)
        refined = np.array(peak_bpms, dtype=float)
        for i, bpm in enumerate(peak_bpms):
            if not np.isfinite(bpm) or bpm <= 0:
                continue
            p0 = 60_000.0 / bpm
            gaps = peakind - peakind[i]
            near = np.flatnonzero((np.abs(gaps) <= window_ms) & (gaps != 0))
            if near.size < 2:
                continue
            k = np.round(gaps[near] / p0)
            ok = (k != 0) & (np.abs(gaps[near] / p0 - k) < rel_tol)
            # a majority of nearby gaps must fit the grid: a p:q rational
            # resonance (e.g. coarse at 2/3 of the true period) passes the
            # per-gap filter only for multiples of q, a minority subset
            # that is self-consistent and would survive any residual check
            if np.count_nonzero(ok) < max(2, near.size / 2):
                continue
            kk, dd = k[ok], gaps[near][ok]
            period = float(np.dot(kk, dd) / np.dot(kk, kk))
            if period <= 0:
                continue
            new_bpm = 60_000.0 / period
            # trust region: 1.5 vote ticks around the coarse period (the
            # tpb-histogram mode itself can sit a full bin away from the
            # true period when jitter splits the vote across two bins)
            if abs(period - p0) < MILISECONDS_PER_STEP * 1.5:
                refined[i] = new_bpm
        return refined

    # -- beat walking -----------------------------------------------------------------

    def _walk_beats(self, peakind, prominences, peak_bpms, peak_bpms_defined,
                    num_ms) -> list[int]:
        peaks = list(zip(peakind, prominences, peak_bpms, peak_bpms_defined))
        beat_times: list[int] = []
        to_process = sorted(peaks, key=lambda x: x[1], reverse=True)
        processed_regions: list[tuple] = []

        def remove_range(t1, t2):
            if t1 > t2:
                t1, t2 = t2, t1
            to_process[:] = [p for p in to_process if not t1 <= p[0] <= t2]

        def loss(peak, time):
            return abs(peak[0] - time) / peak[1]

        def walk(start_time, period_ms, direction):
            time = start_time
            while True:
                previous_time = time
                time += direction * period_ms
                if not 0 <= time < num_ms:
                    remove_range(previous_time, time)
                    break
                nearest = min(peaks, key=lambda x: loss(x, time))
                if loss(nearest, time) < 60:
                    time = nearest[0]
                    period_ms = 60_000 / nearest[2]
                elif loss(nearest, time) < 300 and nearest[3]:
                    # a beat nearby but on a different tempo: stop here
                    time -= direction * period_ms
                    break
                if any(t1 <= time <= t2 for t1, t2 in processed_regions):
                    break
                beat_times.append(int(time))
            m = 200  # guard band against >300 BPM seams
            lo, hi = ((start_time - m, time + m) if direction > 0
                      else (time - m, start_time + m))
            processed_regions.append((lo, hi))
            remove_range(lo, hi)

        while to_process:
            peak = to_process.pop(0)
            beat_times.append(int(peak[0]))
            period = 60_000 / peak[2]
            walk(peak[0], period, 1)
            walk(peak[0], period, -1)
        return sorted(beat_times)

    @staticmethod
    def _rescue_orphan_peaks(peakind, prominences, beat_times) -> list[int]:
        """Re-add strong vote peaks the walk never laid a beat on.

        At a tempo change, BOTH neighbouring section walks stop short
        ("different tempo nearby") and their ±200 ms guard bands can swallow
        the strongest peak of all — the redline itself (seen live in the
        set0192 failure: the true timing-point peak sat un-walked between
        two stopped walks, and classification then promoted smeared
        neighbours to TIMING_POINT). Any peak at least as prominent as the
        local median that is > 60 ms from every walked beat is rescued;
        60 ms keeps rescues off the walked grid up to 300+ BPM."""
        if len(beat_times) == 0 or len(peakind) == 0:
            return beat_times
        bt = np.asarray(sorted(beat_times))
        thresh = float(np.median(prominences))
        out = list(beat_times)
        for t, p in zip(peakind, prominences):
            if p < thresh:
                continue
            j = np.searchsorted(bt, t)
            near = min((abs(int(t) - int(bt[k]))
                        for k in (j - 1, j) if 0 <= k < len(bt)), default=1e9)
            if near > 60:
                out.append(int(t))
        return sorted(out)

    @staticmethod
    def _consolidate_redlines(beat_times, beat_types,
                              timing_points_hist, window_ms: int = 500,
                              w: int = 10) -> None:
        """Collapse clusters of TIMING_POINT labels to the strongest vote.

        The timing-point histogram smears around a true redline (model
        jitter + window-boundary re-emissions), so classification can label
        several consecutive beats TIMING_POINT; each spurious one splits a
        BPM-solving section in the postprocessor and drags the redline BPM
        off the true value. Within any run of TIMING_POINTs closer than
        `window_ms` apart, only the one with the most timing-point vote
        mass keeps the label. Genuinely adjacent redlines further apart
        than `window_ms` (=500 ms, under one beat at <=120 BPM) survive."""
        idx = [i for i, ty in enumerate(beat_types)
               if ty is EventType.TIMING_POINT]
        if len(idx) < 2:
            return
        cluster = [idx[0]]

        def flush(cluster):
            if len(cluster) > 1:
                best = max(cluster, key=lambda i: timing_points_hist[
                    max(beat_times[i] - w, 0):beat_times[i] + w].sum())
                for i in cluster:
                    if i != best:
                        beat_types[i] = EventType.BEAT
        for i in idx[1:]:
            if beat_times[i] - beat_times[cluster[-1]] < window_ms:
                cluster.append(i)
            else:
                flush(cluster)
                cluster = [i]
        flush(cluster)

    # -- classification and meter repair -------------------------------------------------

    @staticmethod
    def _classify_beats(beat_times, beats_hist, measures_hist,
                        timing_points_hist) -> list[EventType]:
        types = []
        w = 10
        for t in beat_times:
            beat = beats_hist[t - w:t + w].sum()
            measure = measures_hist[t - w:t + w].sum()
            timing_point = timing_points_hist[t - w:t + w].sum()
            total = beat + measure + timing_point
            if timing_point > beat and timing_point > measure and total > 1:
                types.append(EventType.TIMING_POINT)
            else:
                types.append(EventType.BEAT)
        return types

    @staticmethod
    def _repair_meter(beat_times, beat_types, measures_hist,
                      timing_points_hist, measure_counts) -> None:
        """Re-label BEAT/MEASURE so measures repeat every voted timing
        signature, anchored where measure/timing-point histogram evidence is
        strongest.

        Behavior-pinned to the reference's meter repair
        (super_timing_generator.py:264-307) — including its quirk of testing
        the *absolute* beat indices ±1..|j|-1 for intervening timing points
        — but with the per-beat histogram evidence precomputed and the
        cooldown state machine expressed as a skip window.
        """
        if not measure_counts:
            return
        signature = int(np.median([sig for _, sig in measure_counts]))
        if signature <= 0:
            return
        w = 10
        n = len(beat_times)
        # static per-beat evidence (histograms never change during repair)
        evidence = np.array([measures_hist[t - w:t + w].sum()
                             + timing_points_hist[t - w:t + w].sum()
                             for t in beat_times], dtype=float)

        def tp_near_list_ends(j: int) -> bool:
            # reference quirk: looks at types[1:|j|] (j>0) / types[-1:-|j|:-1]
            # (j<0) — absolute positions, evaluated live as labels change
            idxs = np.arange(1, abs(j)) * np.sign(j)
            return any(beat_types[x] == EventType.TIMING_POINT for x in idxs)

        def offset_score(i: int, k: int) -> float:
            idxs = i + np.arange(-3, 4) * signature + k
            keep = [(ix, j) for ix, j in zip(idxs, range(-3, 4))
                    if 0 <= ix < n and not tp_near_list_ends(j)]
            if not keep:
                return 0.0
            return float(evidence[[ix for ix, _ in keep]].mean())

        cooldown = 0
        for i, beat_type in enumerate(list(beat_types)):
            if cooldown > 0:  # inside a measure: leave the next beats alone
                cooldown -= 1
                continue
            if cooldown < 0:  # waiting for a better-aligned measure slot
                cooldown += 1
                if cooldown == 0 and beat_type != EventType.TIMING_POINT:
                    beat_types[i] = EventType.MEASURE
                    cooldown = signature - 1
                continue
            if beat_type == EventType.TIMING_POINT:
                continue
            scores = [offset_score(i, k) for k in range(signature)]
            best = int(np.argmax(scores))
            if best == 0:
                beat_types[i] = EventType.MEASURE
                cooldown = signature - 1
            else:
                beat_types[i] = EventType.BEAT
                cooldown = -best

    def _to_events(self, beat_times, beat_types):
        events, event_times = [], []
        for t, bt in zip(beat_times, beat_types):
            if self.types_first:
                events.append(Event(bt))
                events.append(Event(EventType.TIME_SHIFT, t))
            else:
                events.append(Event(EventType.TIME_SHIFT, t))
                events.append(Event(bt))
            event_times.extend([t, t])
        return events, event_times
