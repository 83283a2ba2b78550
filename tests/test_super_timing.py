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
