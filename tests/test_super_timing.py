"""Super timing generator tests."""

import numpy as np
import pytest

from beatheritage_tpu.config import InferenceConfig, load_config
from beatheritage_tpu.events import Event, EventType
from beatheritage_tpu.inference.super_timing import SuperTimingGenerator
from beatheritage_tpu.inference.processor import GenerationConfig


def test_vote_accumulation_and_walk_logic():
    """Drive the histogram voting + beat walk with synthetic model output
    (no model): constant 120 BPM beats must come back as a clean grid."""
    args = load_config(InferenceConfig, "inference", "tiny", overrides=["seed=0"])
    stg = SuperTimingGenerator.__new__(SuperTimingGenerator)
    stg.args = args
    stg.types_first = True
    stg.bpm_change_threshold = args.timer_bpm_threshold
    stg.iterations = 8
    stg.sample_rate = 16000
    stg.miliseconds_per_sequence = 1000.0

    num_ms = 8000
    beats_hist = np.zeros(num_ms, int)
    measures_hist = np.zeros(num_ms, int)
    tp_hist = np.zeros(num_ms, int)
    tpbs = []
    measure_counts = []
    rng = np.random.default_rng(0)

    # synthesize 8 noisy passes of a 120BPM (500ms) grid starting at 1000ms
    for _ in range(stg.iterations):
        events = []
        for k, t in enumerate(range(1000, 7500, 500)):
            jitter = int(rng.integers(-8, 9))
            etype = (EventType.TIMING_POINT if k == 0
                     else EventType.MEASURE if k % 4 == 0 else EventType.BEAT)
            events.append(Event(etype))
            events.append(Event(EventType.TIME_SHIFT, t + jitter))
        stg._accumulate_votes(events, 0, num_ms, beats_hist, measures_hist,
                              tp_hist, tpbs, measure_counts)

    from scipy.ndimage import gaussian_filter1d
    from scipy.signal import find_peaks
    b = gaussian_filter1d(beats_hist.astype(float), 10) / stg.iterations * 50
    m = gaussian_filter1d(measures_hist.astype(float), 10) / stg.iterations * 50
    tp = gaussian_filter1d(tp_hist.astype(float), 10) / stg.iterations * 50
    signal = b + m + tp * 2
    peakind, props = find_peaks(signal, distance=50, prominence=0.1,
                                rel_height=1, width=2, wlen=50)
    assert len(peakind) >= 10

    tpbs.sort(key=lambda x: x[0])
    peak_bpms = stg._peak_bpms(peakind, tpbs, 200, 0.1)
    median_bpm = 60000 / (np.median(np.array(tpbs)[:, 1]) * 10)
    assert median_bpm == pytest.approx(120, abs=6)
    peak_bpms = stg._fill_missing_bpms(peak_bpms, median_bpm)
    assert np.all(np.isfinite(peak_bpms))

    beat_times = stg._walk_beats(peakind, props["prominences"], peak_bpms,
                                 ~np.isnan(peak_bpms), num_ms)
    assert len(beat_times) >= 12
    diffs = np.diff(sorted(beat_times))
    # the dominant inter-beat interval should be ~500ms
    assert np.median(diffs) == pytest.approx(500, abs=25)


def _make_stg(args, iterations=20):
    stg = SuperTimingGenerator.__new__(SuperTimingGenerator)
    stg.args = args
    stg.types_first = True
    stg.bpm_change_threshold = args.timer_bpm_threshold
    stg.iterations = iterations
    stg.sample_rate = 16000
    stg.miliseconds_per_sequence = 4000.0
    return stg


def _synthetic_passes(sections, num_ms, iterations, seed=0):
    """Simulate model voting passes for a variable-BPM song: beats on the
    GT grid, quantized to the 10 ms token grid in each pass's shifted
    frame, with autocorrelated model jitter, 15% dropped beats, and
    spurious TIMING_POINT emissions at decode-window starts (the model
    re-establishes timing context at each window)."""
    import numpy as np
    gt = []
    for si, (start, bpm) in enumerate(sections):
        end = sections[si + 1][0] if si + 1 < len(sections) else num_ms
        period = 60000.0 / bpm
        t, k = float(start), 0
        while t < end - 1:
            kind = (EventType.TIMING_POINT if k == 0
                    else EventType.MEASURE if k % 4 == 0 else EventType.BEAT)
            gt.append((t, kind))
            t += period
            k += 1
    rng = np.random.default_rng(seed)
    half = 22900 // 2
    passes = []
    for _ in range(iterations):
        off = int(rng.integers(-half, half))
        events, drift, seen = [], 0.0, set()
        for t, kind in gt:
            if rng.random() < 0.15:
                continue
            drift = 0.7 * drift + rng.normal(0, 6.0)
            widx = int((t + off) // half)
            if widx not in seen:
                seen.add(widx)
                if rng.random() < 0.5:
                    kind = EventType.TIMING_POINT
            q = round((t + off + drift) / 10) * 10
            events.append(Event(kind))
            events.append(Event(EventType.TIME_SHIFT, int(q)))
        passes.append((off, events))
    return passes


def test_fractional_bpm_redlines_recovered_exactly():
    """EVAL_TIMING_r04 set0192 regression: integer-BPM redlines whose beat
    periods are NOT multiples of the 10 ms token grid must come back exact.
    The tpb votes alone can't express 183 BPM (327.9 ms -> 330 ms = 181.8),
    and the walk's guard bands used to swallow the tempo-change peak —
    sub-tick peak refinement + orphan-peak rescue + redline consolidation
    recover all three redlines with the right BPM and no spurious splits."""
    args = load_config(InferenceConfig, "inference", "tiny", overrides=["seed=0"])
    stg = _make_stg(args)
    num_ms = 68400
    sections = [(500, 183.0), (25000, 176.0), (48000, 191.0)]
    passes = _synthetic_passes(sections, num_ms, stg.iterations)
    events, _ = stg._vote_and_walk(passes, num_ms)

    from beatheritage_tpu.inference.postprocessor import Postprocessor
    timing = Postprocessor(args).generate_timing(events)
    red = [(tp.offset, 60000.0 / tp.ms_per_beat)
           for tp in timing if tp.uninherited]
    assert len(red) == len(sections)
    for t_gt, bpm_gt in sections:
        t_i, bpm_i = min(red, key=lambda x: abs(x[0] - t_gt))
        assert abs(t_i - t_gt) <= 50
        assert abs(bpm_i - bpm_gt) <= 0.5, (t_gt, bpm_gt, t_i, bpm_i)


def test_refine_peak_bpms_subtick():
    """Least-squares over smoothed-peak positions must beat the 10 ms tpb
    quantization: peaks laid at a 327.87 ms (=183 BPM) grid refine a coarse
    330 ms (=181.8) estimate to within 0.1 BPM."""
    import numpy as np
    period = 60000.0 / 183.0
    peakind = np.round(500 + np.arange(12) * period).astype(int)
    coarse = np.full(len(peakind), 60000.0 / 330.0)
    refined = SuperTimingGenerator._refine_peak_bpms(peakind, coarse)
    assert np.all(np.abs(refined - 183.0) < 0.1)
    # out-of-trust-region garbage is left at the coarse value
    wild = np.full(len(peakind), 120.0)
    kept = SuperTimingGenerator._refine_peak_bpms(peakind, wild)
    assert np.all(kept == 120.0)


def test_rescue_and_consolidation_helpers():
    import numpy as np
    # rescue: a prominent peak far from every walked beat is re-added
    peakind = np.array([1000, 2000, 3000])
    prom = np.array([1.0, 2.0, 1.0])
    walked = [995, 3004]
    out = SuperTimingGenerator._rescue_orphan_peaks(peakind, prom, walked)
    assert 2000 in out and len(out) == 3
    # consolidation: within a 500ms cluster only the strongest vote keeps
    # the TIMING_POINT label
    hist = np.zeros(5000)
    hist[1998:2003] = 5.0
    hist[2300:2302] = 1.0
    times = [1700, 2000, 2300, 4000]
    types = [EventType.TIMING_POINT, EventType.TIMING_POINT,
             EventType.TIMING_POINT, EventType.TIMING_POINT]
    SuperTimingGenerator._consolidate_redlines(times, types, hist)
    assert types == [EventType.BEAT, EventType.TIMING_POINT,
                     EventType.BEAT, EventType.TIMING_POINT]


def test_generate_with_model_smoke(tmp_path):
    """Tiny-model integration: 2 voting iterations over 2s of audio."""
    args = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "timer_iterations=2", "seed=0", "max_batch_size=4",
    ])
    from beatheritage_tpu.inference.pipeline import load_model, load_tokenizer
    tok = load_tokenizer(args)
    params, _ = load_model(args, tok)
    stg = SuperTimingGenerator(args, params, tok)
    sr = 16000
    audio = (0.1 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    events, times = stg.generate(audio, GenerationConfig(), verbose=False)
    # with random weights timing votes may be empty; the contract is a
    # well-formed (events, times) pair
    assert len(events) == len(times) or len(events) == 2 * len(times) // 2
    for e in events:
        assert e.type in (EventType.BEAT, EventType.MEASURE,
                          EventType.TIMING_POINT, EventType.TIME_SHIFT)


def test_timer_max_len_caps_decode_program(tmp_path):
    """timer_max_len < tgt_seq_len must flow into the processor's
    max_len_override (clamped to tgt_seq_len) and the capped program must
    still produce the (events, times) contract end-to-end."""
    args = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "timer_iterations=2", "seed=0", "max_batch_size=4",
        "timer_max_len=64",
    ])
    from beatheritage_tpu.inference.pipeline import load_model, load_tokenizer
    tok = load_tokenizer(args)
    params, _ = load_model(args, tok)
    stg = SuperTimingGenerator(args, params, tok)
    assert stg.processor.max_len_override == 64
    sr = 16000
    audio = (0.1 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)).astype(np.float32)
    events, times = stg.generate(audio, GenerationConfig(), verbose=False)
    assert len(events) == len(times)
    # over-large caps clamp to tgt_seq_len instead of growing the program
    args2 = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "seed=0", "timer_max_len=99999",
    ])
    stg2 = SuperTimingGenerator(args2, params, tok)
    assert stg2.processor.max_len_override == args2.train.data.tgt_seq_len
