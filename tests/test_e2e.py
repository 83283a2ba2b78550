"""End-to-end slice tests: audio -> windows -> generate -> .osu."""

import numpy as np
import pytest

from beatheritage_tpu.config import InferenceConfig, load_config
from beatheritage_tpu.data.audio import load_audio, save_wav
from beatheritage_tpu.events import ContextType, Event, EventType
from beatheritage_tpu.inference.pipeline import generate, load_model, load_tokenizer
from beatheritage_tpu.inference.postprocessor import BeatmapConfig, Postprocessor
from beatheritage_tpu.inference.preprocessor import Preprocessor
from beatheritage_tpu.osu import Beatmap, TimingPoint


@pytest.fixture(scope="module")
def args():
    return load_config(InferenceConfig, "inference", "tiny", overrides=[
        "output_path=''", "generate_positions=false",
    ])


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    """4 s of clicks at 120 BPM over a tone."""
    sr = 16000
    t = np.arange(4 * sr) / sr
    audio = 0.1 * np.sin(2 * np.pi * 220 * t)
    for beat in np.arange(0, 4, 0.5):
        i = int(beat * sr)
        audio[i:i + 200] += np.hanning(200) * 0.8
    path = tmp_path_factory.mktemp("audio") / "clicks.wav"
    save_wav(path, audio, sr)
    return str(path)


def test_audio_roundtrip(wav):
    samples = load_audio(wav, 16000)
    assert abs(len(samples) - 4 * 16000) < 4
    assert np.max(np.abs(samples)) == pytest.approx(1.0, abs=1e-3)
    # resample to half rate
    half = load_audio(wav, 8000)
    assert abs(len(half) - 4 * 8000) < 4


def test_preprocessor_windows(args, wav):
    pre = Preprocessor(args, parallel=True)
    samples = pre.load(wav)
    windows, times, song_len = pre.segment(samples)
    assert windows.shape[1] == (args.train.data.src_seq_len - 1) * args.train.data.hop_length
    assert song_len == pytest.approx(4000, abs=10)
    assert times[0] == 0
    # parallel mode: non-overlapping
    if len(times) > 1:
        assert times[1] - times[0] == pytest.approx(pre.miliseconds_per_sequence, abs=1)


def test_preprocessor_sequential_overlap(args, wav):
    pre = Preprocessor(args, parallel=False)
    samples = pre.load(wav)
    windows, times, _ = pre.segment(samples)
    if len(times) > 1:
        stride = times[1] - times[0]
        assert stride == pytest.approx(
            pre.miliseconds_per_sequence * (1 - args.lookback - args.lookahead), abs=1)


def test_postprocessor_basic_objects(args):
    post = Postprocessor(args)
    events = [
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1000),
        Event(EventType.SNAPPING, 1), Event(EventType.POS_X, 100),
        Event(EventType.POS_Y, 100), Event(EventType.NEW_COMBO),
        Event(EventType.SLIDER_HEAD), Event(EventType.TIME_SHIFT, 1500),
        Event(EventType.SNAPPING, 1), Event(EventType.POS_X, 200),
        Event(EventType.POS_Y, 200),
        Event(EventType.BEZIER_ANCHOR), Event(EventType.POS_X, 250),
        Event(EventType.POS_Y, 250),
        Event(EventType.LAST_ANCHOR), Event(EventType.TIME_SHIFT, 2000),
        Event(EventType.POS_X, 300), Event(EventType.POS_Y, 200),
        # LAST_ANCHOR time marks the end of the first span; equal slider-end
        # time means a single slide
        Event(EventType.SLIDER_END), Event(EventType.TIME_SHIFT, 2000),
        Event(EventType.POS_X, 300), Event(EventType.POS_Y, 200),
    ]
    config = BeatmapConfig(title="T", artist="A", creator="C", version="V",
                           audio_filename="a.wav")
    result = post.generate(events, config)
    bm = Beatmap.from_string(result)
    objs = bm.hit_objects()
    assert len(objs) == 2
    assert objs[0].time == 1000 and objs[0].new_combo
    assert objs[1].time == 1500
    from beatheritage_tpu.osu import Slider
    assert isinstance(objs[1], Slider)
    assert objs[1].repeat == 1
    # slider duration should be ~500ms via solved SV
    assert objs[1].duration == pytest.approx(500, rel=0.2)


def test_postprocessor_timing_inference_constant_bpm(args):
    """Beat markers at 500ms intervals must infer a 120 BPM redline."""
    post = Postprocessor(args)
    events = []
    for i, t in enumerate(range(1000, 5001, 500)):
        etype = (EventType.TIMING_POINT if i == 0
                 else EventType.MEASURE if i % 4 == 0 else EventType.BEAT)
        events.append(Event(etype))
        events.append(Event(EventType.TIME_SHIFT, t))
    timing = post.generate_timing(events)
    redlines = [tp for tp in timing if tp.parent is None]
    assert len(redlines) == 1
    assert redlines[0].offset == 1000
    assert redlines[0].ms_per_beat == pytest.approx(500, abs=1)


def test_postprocessor_timing_inference_bpm_change(args):
    """A tempo change mid-way should produce a second redline."""
    post = Postprocessor(args)
    events = []
    times = list(range(1000, 3001, 500)) + list(range(3400, 5001, 400))
    for i, t in enumerate(times):
        etype = EventType.TIMING_POINT if i == 0 else EventType.BEAT
        events.append(Event(etype))
        events.append(Event(EventType.TIME_SHIFT, t))
    timing = post.generate_timing(events)
    redlines = [tp for tp in timing if tp.parent is None]
    assert len(redlines) >= 2
    mpbs = sorted({round(tp.ms_per_beat) for tp in redlines})
    assert 400 in mpbs and 500 in mpbs


def test_resnap(args):
    post = Postprocessor(args)
    timing = [TimingPoint(offset=0.0, ms_per_beat=500.0)]
    events = [Event(EventType.TIME_SHIFT, 1004), Event(EventType.SNAPPING, 1),
              Event(EventType.TIME_SHIFT, 1247), Event(EventType.SNAPPING, 2)]
    out = post.resnap_events(events, timing)
    assert out[0].value == 1000
    assert out[2].value == 1250


def test_full_pipeline_writes_valid_osu(args, wav, tmp_path):
    """The flagship slice: song -> windows -> decode (random weights) ->
    timing inference -> .osu that reparses."""
    result, path, _ = generate(
        args, audio_path=wav, output_path=str(tmp_path), verbose=False)
    assert path is not None
    bm = Beatmap.from_path(path)
    assert bm.timing_points, "generated beatmap must contain timing points"
    # with random weights objects may be few, but the file must parse and
    # carry our metadata
    assert bm.audio_filename == "clicks.wav"
    text = open(path, encoding="utf-8-sig").read()
    assert "[HitObjects]" in text and "[TimingPoints]" in text


def test_data_parallel_windows_matches_single_device(args, wav):
    """Window-DP inference over the 8-device CPU mesh produces the same
    tokens as the unsharded path (same PRNG keys, same math)."""
    import dataclasses
    from beatheritage_tpu.inference.pipeline import (build_configs,
                                                     load_model,
                                                     load_tokenizer)
    from beatheritage_tpu.inference.preprocessor import Preprocessor
    from beatheritage_tpu.inference.processor import Processor

    base = dataclasses.replace(args, parallel=True)
    tok = load_tokenizer(base)
    params, _ = load_model(base, tok)
    gen_cfg, _ = build_configs(base)
    pre = Preprocessor(base, parallel=True)
    audio = pre.load(wav)
    sequences = pre.segment(audio)

    outs = {}
    for dp in (False, True):
        cfg = dataclasses.replace(base, data_parallel_windows=dp)
        proc = Processor(cfg, params, tok, verbose=False)
        assert (proc.mesh is not None) == dp
        events, times = zip(*proc.generate(
            sequences=sequences, generation_config=gen_cfg,
            in_context=cfg.in_context, out_context=cfg.output_type,
            verbose=False))
        outs[dp] = (events, times)

    assert len(outs[False][0]) == len(outs[True][0])
    for (e0, e1) in zip(outs[False][0], outs[True][0]):
        assert [str(e) for e in e0] == [str(e) for e in e1]


def test_window_bucketing_preserves_streams(args, wav, monkeypatch):
    """Padding the window batch to a bucket size (processor._bucket_windows)
    must not change any real row's events: padded rows duplicate row 0 and
    are dropped on return; per-row key derivation keeps sampling exact."""
    import dataclasses
    from beatheritage_tpu.inference import processor as proc_mod
    from beatheritage_tpu.inference.pipeline import (build_configs,
                                                     load_model,
                                                     load_tokenizer)
    from beatheritage_tpu.inference.preprocessor import Preprocessor
    from beatheritage_tpu.inference.processor import Processor

    base = dataclasses.replace(args, parallel=True)
    tok = load_tokenizer(base)
    params, _ = load_model(base, tok)
    gen_cfg, _ = build_configs(base)
    pre = Preprocessor(base, parallel=True)
    windows, starts, song_len = pre.segment(pre.load(wav))
    # force a non-bucket count so padding actually engages (3 -> 4)
    n = 3 if windows.shape[0] >= 3 else windows.shape[0]
    sequences = (windows[:n], starts[:n], song_len)
    assert proc_mod._bucket_windows(3) == 4
    assert proc_mod._bucket_windows(1) == 1
    assert proc_mod._bucket_windows(7) == 8

    outs = {}
    for bucketed in (False, True):
        if not bucketed:
            monkeypatch.setattr(proc_mod, "_bucket_windows", lambda b: b)
        else:
            monkeypatch.undo()
        proc = Processor(base, params, tok, verbose=False)
        events, _ = zip(*proc.generate(
            sequences=sequences, generation_config=gen_cfg,
            in_context=base.in_context, out_context=base.output_type,
            verbose=False))
        outs[bucketed] = events

    for (e0, e1) in zip(outs[False], outs[True]):
        assert [str(e) for e in e0] == [str(e) for e in e1]


def test_parallel_multi_out_context_events_route_to_own_context(args, wav):
    """Parallel mode runs ONE decode for all out-contexts (reference
    processor.py:366 generate_parallel): the stream carries every context
    between its context sos/eos markers, the decode stops only at the
    global EOS (context_type=None), and the split must file each context's
    tokens under ITS context — regression for the bug where the decode
    stopped at the first context's eos (empty maps with timing-only
    events)."""
    import dataclasses
    from beatheritage_tpu.inference.pipeline import build_configs
    from beatheritage_tpu.inference.processor import Processor

    cfg = dataclasses.replace(args, parallel=True)
    tok = load_tokenizer(cfg)
    params, _ = load_model(cfg, tok)
    gen_cfg, _ = build_configs(cfg)
    pre = Preprocessor(cfg, parallel=True)
    sequences = pre.segment(pre.load(wav))

    proc = Processor(cfg, params, tok, verbose=False)
    seen_contexts = []

    def fake_dispatch(frames, wcond, cond_prompt, uncond_prompt,
                      lookback_time, lookahead_time, context_type):
        seen_contexts.append(context_type)
        # continuation only: the first context's sos sits in the PROMPT;
        # the stream closes it, then opens/closes the map context
        toks = [tok.encode(Event(EventType.TIME_SHIFT, 1)),
                tok.encode(Event(EventType.BEAT, 0)),
                tok.context_eos[ContextType.TIMING],
                tok.context_sos[ContextType.MAP],
                tok.encode(Event(EventType.TIME_SHIFT, 1)),
                tok.encode(Event(EventType.SNAPPING, 4)),
                tok.encode(Event(EventType.CIRCLE, 0)),
                tok.context_eos[ContextType.MAP],
                tok.eos_id]
        return [np.asarray(toks, np.int32) for _ in range(len(frames))]

    proc._dispatch = fake_dispatch
    results = proc.generate(
        sequences=sequences, generation_config=gen_cfg,
        in_context=[], out_context=[ContextType.TIMING, ContextType.MAP],
        verbose=False)

    # one decode for the whole window; it may stop at the LAST requested
    # context's eos ([/map] here) — everything after it is unwanted
    assert seen_contexts == [ContextType.MAP] * len(seen_contexts)
    assert len(set(id(c) for c in seen_contexts)) >= 1
    assert len(results) == 2
    timing_events, map_events = results[0][0], results[1][0]
    timing_types = {e.type for e in timing_events}
    map_types = {e.type for e in map_events}
    assert EventType.BEAT in timing_types
    assert EventType.CIRCLE not in timing_types
    assert EventType.CIRCLE in map_types
    assert EventType.BEAT not in map_types


def test_generate_many_matches_per_job_generate(args, wav):
    """generate_many flattens several passes' windows into shared engine
    batches (the super-timing fast path); with greedy decoding each job's
    result must be identical to a standalone generate() call."""
    import dataclasses
    from beatheritage_tpu.inference.pipeline import (build_configs,
                                                     load_model,
                                                     load_tokenizer)
    from beatheritage_tpu.inference.preprocessor import Preprocessor
    from beatheritage_tpu.inference.processor import Processor

    base = dataclasses.replace(args, parallel=True, do_sample=False,
                               num_beams=1, max_batch_size=4)
    tok = load_tokenizer(base)
    params, _ = load_model(base, tok)
    gen_cfg, _ = build_configs(base)
    pre = Preprocessor(base, parallel=True)
    audio = pre.load(wav)
    # two offset passes, like the super-timing sweep
    jobs = [
        {"sequences": pre.segment(audio), "generation_config": gen_cfg},
        {"sequences": pre.segment(audio[8000:], 4000, 0),
         "generation_config": gen_cfg},
    ]

    proc = Processor(base, params, tok, verbose=False)
    batched = proc.generate_many(jobs=jobs, in_context=base.in_context,
                                 out_context=base.output_type, verbose=False)
    for job, got in zip(jobs, batched):
        solo = Processor(base, params, tok, verbose=False).generate(
            sequences=job["sequences"], generation_config=gen_cfg,
            in_context=base.in_context, out_context=base.output_type,
            verbose=False)
        assert len(solo) == len(got)
        for (ev_b, t_b), (ev_s, t_s) in zip(got, solo):
            assert [str(e) for e in ev_b] == [str(e) for e in ev_s]
            assert list(t_b) == list(t_s)


def test_timing_only_early_stop_matches_full_stream(args, wav, monkeypatch):
    """A timing-only request stops decoding at [/timing] instead of running
    the whole kiai+map tail (the super-timing cost fix). The extracted
    timing events must be identical to the full-stream decode: greedy
    logits are unchanged, only the stop token set differs."""
    import dataclasses
    from beatheritage_tpu.inference.pipeline import (build_configs,
                                                     load_model,
                                                     load_tokenizer)
    from beatheritage_tpu.inference.preprocessor import Preprocessor
    from beatheritage_tpu.inference.processor import Processor

    base = dataclasses.replace(args, parallel=True, do_sample=False,
                               num_beams=1)
    tok = load_tokenizer(base)
    params, _ = load_model(base, tok)
    gen_cfg, _ = build_configs(base)
    pre = Preprocessor(base, parallel=True)
    sequences = pre.segment(pre.load(wav))

    outs = {}
    for early_stop in (True, False):
        proc = Processor(base, params, tok, verbose=False)
        if not early_stop:
            monkeypatch.setattr(Processor, "_stop_context",
                                lambda self, out_data: None)
        else:
            monkeypatch.undo()
        stop = proc._stop_context(
            [{"context_type": ContextType.TIMING}])
        assert (stop == ContextType.TIMING) == early_stop
        results = proc.generate(
            sequences=sequences, generation_config=gen_cfg,
            in_context=None, out_context=[ContextType.TIMING],
            verbose=False)
        outs[early_stop] = results[0]

    ev_fast, t_fast = outs[True]
    ev_full, t_full = outs[False]
    assert [str(e) for e in ev_fast] == [str(e) for e in ev_full]
    assert list(t_fast) == list(t_full)


def test_warmup_precompiles_decode_buckets(args, wav, tmp_path):
    """Processor.warmup compiles (without executing) one decode program per
    window-batch bucket x lookback setting, and the subsequent real generate
    reuses the warmed executables: no new .aotx appears and no
    call-convention fallback fires (regression for the fresh-song-length
    compile tail, docs/ROUND_NOTES round 3)."""
    import dataclasses

    from beatheritage_tpu.decode import aot
    from beatheritage_tpu.inference.pipeline import (build_configs,
                                                     load_model,
                                                     load_tokenizer)
    from beatheritage_tpu.inference.preprocessor import Preprocessor
    from beatheritage_tpu.inference.processor import Processor

    base = dataclasses.replace(args, parallel=True,
                               aot_cache_dir=str(tmp_path), warmup_windows=4)
    tok = load_tokenizer(base)
    params, _ = load_model(base, tok)
    proc = Processor(base, params, tok, verbose=False)

    aot._LOADED.clear()
    aot._SIG_MEMO.clear()
    aot._FALLBACKS["count"] = 0
    aot._FALLBACKS.pop("last_reason", None)

    report = proc.warmup(4)
    assert report, "warmup returned no programs"
    assert all(v in ("compiled", "loaded") for v in report.values()), report
    files = set(tmp_path.glob("*.aotx"))
    assert files, "warmup serialized no executables"

    gen_cfg, _ = build_configs(base)
    pre = Preprocessor(base, parallel=True)
    sequences = pre.segment(pre.load(wav))
    results = proc.generate(
        sequences=sequences, generation_config=gen_cfg,
        in_context=base.in_context, out_context=base.output_type,
        verbose=False)
    # content may be empty for a random-weight model (EOS can be the first
    # sample) — the property under test is program reuse, not map quality
    assert len(results) >= 1
    # the real call must land on a warmed program, not compile a new one
    assert set(tmp_path.glob("*.aotx")) == files
    assert "convention" not in aot._FALLBACKS.get("last_reason", "")


def test_warmup_follows_engine_branch(args, tmp_path):
    """warmup mirrors _run_engine's branch selection: a beam/greedy
    processor (the super-timing configuration) warms beam programs, not the
    sampling engine's."""
    import dataclasses

    from beatheritage_tpu.inference.pipeline import load_model, load_tokenizer
    from beatheritage_tpu.inference.processor import Processor

    base = dataclasses.replace(args, parallel=True,
                               aot_cache_dir=str(tmp_path))
    tok = load_tokenizer(base)
    params, _ = load_model(base, tok)
    proc = Processor(base, params, tok, verbose=False, cfg_scale=1.0)
    proc.num_beams = 2
    proc.settings_base = dict(proc.settings_base, do_sample=False,
                              top_p=1.0, top_k=50, temperature=1.0)
    report = proc.warmup(1)
    kinds = {k[0] for k in report}
    assert "beam" in kinds and "decode" not in kinds, report
    assert all(v in ("compiled", "loaded") for v in report.values()), report


@pytest.mark.parametrize("gamemode", [0, 1, 2, 3])
def test_full_pipeline_each_gamemode(args, wav, tmp_path, gamemode):
    """Every gamemode produces a valid .osu with the right Mode header
    (std/taiko/ctb/mania; reference inference.py supports all four)."""
    import dataclasses
    cfg = dataclasses.replace(args, gamemode=gamemode,
                              keycount=4 if gamemode == 3 else None)
    result, path, _ = generate(
        cfg, audio_path=wav, output_path=str(tmp_path / str(gamemode)),
        verbose=False)
    assert path is not None
    bm = Beatmap.from_path(path)
    assert bm.mode == gamemode
    assert bm.timing_points
    if gamemode == 3:
        assert int(bm.circle_size) == 4  # keycount rides circle_size
