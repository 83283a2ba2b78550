"""DiT + diffusion math + refinement pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.config import InferenceConfig, load_config
from beatheritage_tpu.diffusion import (
    DiffusionPipeline,
    DiffusionSchedule,
    DiffusionTokenizer,
    p_sample_loop,
    q_sample,
    repeat_type,
    space_timesteps,
    training_losses,
)
from beatheritage_tpu.events import Event, EventType
from beatheritage_tpu.models.dit import (
    DiTDims,
    banded_attention_mask,
    dit_forward,
    dit_forward_cfg,
    init_dit_params,
)
from beatheritage_tpu.osu import TimingPoint


@pytest.fixture(scope="module")
def dit():
    dims = DiTDims.from_name("DiT-test", context_size=64, class_size=16)
    params = init_dit_params(jax.random.PRNGKey(0), dims)
    return dims, params


def test_dit_shapes_and_zero_init(dit):
    dims, params = dit
    n, t = 2, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (n, t, 2))
    ts = jnp.array([5, 10])
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t, 64))
    y = jax.random.normal(jax.random.PRNGKey(3), (n, 16))
    out = dit_forward(params, dims, x, ts, c, y)
    assert out.shape == (n, t, 4)  # learn_sigma: eps + var
    # zero-initialized final layer => output exactly zero at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dit_cfg_guidance_combines_eps(dit):
    dims, params = dit
    # give final layer nonzero weights so outputs differ
    params = jax.tree.map(lambda x: x + 0.01, params)
    n, t = 4, 8  # 2 cond + 2 uncond
    x = jax.random.normal(jax.random.PRNGKey(1), (n, t, 2))
    ts = jnp.full((n,), 5)
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t, 64))
    y = jax.random.normal(jax.random.PRNGKey(3), (n, 16))
    out = dit_forward_cfg(params, dims, x, ts, c, y, cfg_scale=2.0)
    assert out.shape == (n, t, 4)
    # both halves carry the same guided epsilon
    np.testing.assert_allclose(np.asarray(out[:2, :, :2]),
                               np.asarray(out[2:, :, :2]), atol=1e-5)


def test_banded_mask():
    m = banded_attention_mask(10, 2)
    assert m[0, 2] and not m[0, 3]
    assert m[5, 5] and m[5, 7] and not m[5, 8]


def test_space_timesteps_deciles():
    # reference default: [100,0,...] => 100 steps from the first decile
    steps = space_timesteps(1000, [100, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    assert len(steps) == 100
    assert max(steps) < 100
    steps2 = space_timesteps(1000, [10, 8, 6, 4, 2] + [0] * 95)
    assert len(steps2) == 30
    assert max(steps2) < 50


def test_schedule_quantities_monotone():
    s = DiffusionSchedule.create("squaredcos_cap_v2", 1000)
    assert s.num_steps == 1000
    ac = s.alphas_cumprod
    assert np.all(np.diff(ac) < 0) and ac[0] > 0.99 and ac[-1] < 0.01
    r = DiffusionSchedule.create("squaredcos_cap_v2", 1000,
                                 respacing=[10] + [0] * 9)
    assert r.num_steps == 10
    assert list(r.timestep_map) == sorted(r.timestep_map)


def test_q_sample_interpolates():
    s = DiffusionSchedule.create("linear", 100)
    x0 = jnp.ones((2, 4, 2))
    noise = jnp.zeros((2, 4, 2))
    x_t = q_sample(s, x0, jnp.array([0, 99]), noise)
    assert float(x_t[0, 0, 0]) > 0.99  # t=0: nearly clean
    assert float(x_t[1, 0, 0]) < 0.2   # t=99: mostly destroyed


def test_p_sample_loop_runs_and_bounded(dit):
    dims, params = dit
    s = DiffusionSchedule.create("squaredcos_cap_v2", 100, respacing=[10] + [0] * 9)
    n, t = 2, 8
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t, 64))
    y = jax.random.normal(jax.random.PRNGKey(3), (n, 16))

    def model_fn(x, ts):
        return dit_forward(params, dims, x, ts, c, y)

    noise = jax.random.normal(jax.random.PRNGKey(4), (n, t, 2))
    out = p_sample_loop(s, model_fn, noise, jax.random.PRNGKey(5))
    assert out.shape == noise.shape
    assert np.all(np.isfinite(np.asarray(out)))

    # a single segment spanning every step IS the full loop (the pipeline's
    # segmented slider path relies on this identity)
    from beatheritage_tpu.diffusion.sampler import p_sample_segment
    ts = jnp.arange(s.num_steps - 1, -1, -1)
    seg = p_sample_segment(s, model_fn, noise, jax.random.PRNGKey(5), ts)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(out), rtol=1e-6)

    # composing shorter segments stays a valid sampler: finite, in-range
    x = noise
    t_hi = s.num_steps
    while t_hi > 0:
        t_lo = max(0, t_hi - 4)
        x = p_sample_segment(s, model_fn, x, jax.random.PRNGKey(t_hi),
                             jnp.arange(t_hi - 1, t_lo - 1, -1))
        t_hi = t_lo
    assert np.all(np.isfinite(np.asarray(x)))


def test_training_losses_finite_and_grad(dit):
    dims, params = dit
    s = DiffusionSchedule.create("squaredcos_cap_v2", 100)
    n, t = 2, 8
    c = jax.random.normal(jax.random.PRNGKey(2), (n, t, 64))
    y = jax.random.normal(jax.random.PRNGKey(3), (n, 16))
    x0 = jax.random.uniform(jax.random.PRNGKey(6), (n, t, 2), minval=-1, maxval=1)
    ts = jnp.array([5, 50])

    def loss(params):
        out = training_losses(
            s, lambda x, tt: dit_forward(params, dims, x, tt, c, y),
            x0, ts, jax.random.PRNGKey(7))
        return out["loss"]

    value, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(value))
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm)


def test_repeat_type_buckets():
    assert [repeat_type(r) for r in (1, 2, 3, 4, 5, 6, 7)] == [0, 1, 2, 3, 4, 3, 4]


def test_pipeline_fills_positions():
    args = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "diff_cfg_scale=1.0", "max_seq_len=32", "overlap_buffer=4",
        "timesteps=[4]",
    ])
    # build a small event stream with distances (what the decoder emits
    # before refinement) including a slider
    events = [
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1000),
        Event(EventType.DISTANCE, 50),
        Event(EventType.SLIDER_HEAD), Event(EventType.TIME_SHIFT, 1500),
        Event(EventType.DISTANCE, 80),
        Event(EventType.BEZIER_ANCHOR), Event(EventType.DISTANCE, 40),
        Event(EventType.LAST_ANCHOR), Event(EventType.TIME_SHIFT, 2000),
        Event(EventType.DISTANCE, 40),
        Event(EventType.SLIDER_END), Event(EventType.TIME_SHIFT, 2000),
        Event(EventType.DISTANCE, 10),
    ]
    timing = [TimingPoint(offset=0.0, ms_per_beat=500.0)]
    pipeline = DiffusionPipeline(args)
    out = pipeline.generate(events, __import__(
        "beatheritage_tpu.inference.processor", fromlist=["GenerationConfig"]
    ).GenerationConfig(), timing, verbose=False)
    types = [e.type for e in out]
    assert EventType.DISTANCE not in types
    assert types.count(EventType.POS_X) == 5
    xs = [e.value for e in out if e.type == EventType.POS_X]
    ys = [e.value for e in out if e.type == EventType.POS_Y]
    assert all(-256 <= v <= 768 for v in xs)
    assert all(-256 <= v <= 640 for v in ys)


def test_pipeline_refine_entry_path():
    """refine_entry > 0 enters the reverse chain low (dequantization regime)
    and still produces in-range positions for every object."""
    args = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "diff_cfg_scale=1.0", "max_seq_len=32", "overlap_buffer=4",
        "timesteps=[8]", "refine_entry=2",
    ])
    events = [
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1000),
        Event(EventType.DISTANCE, 50),
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1500),
        Event(EventType.DISTANCE, 80),
    ]
    timing = [TimingPoint(offset=0.0, ms_per_beat=500.0)]
    pipeline = DiffusionPipeline(args)
    assert pipeline.refine_entry == 2
    out = pipeline.generate(events, __import__(
        "beatheritage_tpu.inference.processor", fromlist=["GenerationConfig"]
    ).GenerationConfig(), timing, verbose=False)
    xs = [e.value for e in out if e.type == EventType.POS_X]
    ys = [e.value for e in out if e.type == EventType.POS_Y]
    assert len(xs) == 2 and len(ys) == 2
    assert all(-256 <= v <= 768 for v in xs)
    assert all(-256 <= v <= 640 for v in ys)


def test_load_diffusion_model_with_refine_ckpt(tmp_path):
    """diff_ckpt / diff_refine_ckpt load orbax params; refine gated on
    position_refinement."""
    from beatheritage_tpu.inference.pipeline import load_diffusion_model
    from beatheritage_tpu.models.dit import DiTDims, init_dit_params
    from beatheritage_tpu.train.checkpoints import save_params

    args = load_config(InferenceConfig, "inference", "tiny")
    dims = DiTDims.from_name(args.diffusion.model.model,
                             context_size=args.diffusion.model.context_size,
                             class_size=4)
    for name in ("diff", "refine"):
        save_params(tmp_path / name,
                    init_dit_params(jax.random.PRNGKey(0), dims))
    args.diff_ckpt = str(tmp_path / "diff")
    args.diff_refine_ckpt = str(tmp_path / "refine")

    args.position_refinement = False
    diff_params, refine_params = load_diffusion_model(args)
    assert diff_params is not None and refine_params is None

    args.position_refinement = True
    diff_params, refine_params = load_diffusion_model(args)
    assert diff_params is not None and refine_params is not None

    args.diff_ckpt = ""
    diff_params, _ = load_diffusion_model(args)
    assert diff_params is None


def test_loss_second_moment_resampler():
    from beatheritage_tpu.diffusion.timestep_sampler import (
        LossSecondMomentResampler, create_schedule_sampler)
    rng = np.random.default_rng(0)
    s = LossSecondMomentResampler(num_timesteps=8, history_per_term=3)
    # uniform until every timestep has 3 observations
    ts, w = s.sample(16, rng)
    assert w.tolist() == [1.0] * 16
    for t in range(8):
        s.update_with_losses([t] * 3, [0.1 if t < 4 else 10.0] * 3)
    assert s._warmed_up()
    p = s.weights()
    assert p.sum() == pytest.approx(1.0)
    # high-loss timesteps get sampled far more often
    assert p[4:].sum() > 0.9
    ts, w = s.sample(256, rng)
    assert (np.bincount(ts, minlength=8)[4:].sum()
            > np.bincount(ts, minlength=8)[:4].sum())
    # importance weights undo the bias: E[w * 1{t}] = 1/T per t
    assert w[ts >= 4].mean() < 1.0 < w[ts < 4].mean()
    assert isinstance(create_schedule_sampler("uniform", 8).sample(4, rng)[0][0],
                      np.int32)
    with pytest.raises(ValueError):
        create_schedule_sampler("nope", 8)


def test_unified_sampler_matches_callback_path(monkeypatch):
    """The TPU path (device-side slider projection inside one jitted scan,
    BH_UNIFIED_SAMPLER=1) must produce positions close to the exact-geometry
    host-callback path: same keys, same noise draws — the only divergence is
    the K-point polyline approximation of slider arc length."""
    import os
    args = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "diff_cfg_scale=1.0", "max_seq_len=32", "overlap_buffer=4",
        "timesteps=[4]", "seed=7",
    ])
    events = [
        Event(EventType.CIRCLE), Event(EventType.TIME_SHIFT, 1000),
        Event(EventType.DISTANCE, 50),
        Event(EventType.SLIDER_HEAD), Event(EventType.TIME_SHIFT, 1500),
        Event(EventType.DISTANCE, 80),
        Event(EventType.BEZIER_ANCHOR), Event(EventType.DISTANCE, 40),
        Event(EventType.LAST_ANCHOR), Event(EventType.TIME_SHIFT, 2000),
        Event(EventType.DISTANCE, 40),
        Event(EventType.SLIDER_END), Event(EventType.TIME_SHIFT, 2000),
        Event(EventType.DISTANCE, 10),
    ]
    timing = [TimingPoint(offset=0.0, ms_per_beat=500.0)]
    gen_cfg = __import__(
        "beatheritage_tpu.inference.processor", fromlist=["GenerationConfig"]
    ).GenerationConfig()

    outs = {}
    for unified in (False, True):
        if unified:
            monkeypatch.setenv("BH_UNIFIED_SAMPLER", "1")
        else:
            monkeypatch.delenv("BH_UNIFIED_SAMPLER", raising=False)
        out = DiffusionPipeline(args).generate(events, gen_cfg, timing,
                                               verbose=False)
        outs[unified] = [(e.type, e.value) for e in out
                         if e.type in (EventType.POS_X, EventType.POS_Y)]
    assert len(outs[False]) == len(outs[True])
    for (ta, va), (tb, vb) in zip(outs[False], outs[True]):
        assert ta == tb
        assert abs(va - vb) <= 3, (outs[False], outs[True])


def test_distance_guide_moves_spacing_toward_targets():
    import jax.numpy as jnp

    from beatheritage_tpu.diffusion.guidance import PLAYFIELD, distance_guide

    # three objects 50 px apart on the x axis, targets 100 px
    pos = np.array([[100.0, 192.0], [150.0, 192.0], [200.0, 192.0]])
    x = jnp.asarray((pos / PLAYFIELD * 2 - 1)[None])
    d = jnp.asarray(np.array([-1.0, 100.0, 100.0], np.float32))

    # weight 0: exact identity
    np.testing.assert_array_equal(np.asarray(distance_guide(x, d, 0.0)),
                                  np.asarray(x))

    out = (np.asarray(distance_guide(x, d, 0.2))[0] + 1) / 2 * PLAYFIELD
    sp = np.hypot(*np.diff(out, axis=0).T)
    assert (sp > 50.0 + 5.0).all(), sp  # spacing expanded toward 100

    # sentinel -1 everywhere: no movement at all
    d_off = jnp.asarray(np.array([-1.0, -1.0, -1.0], np.float32))
    np.testing.assert_allclose(np.asarray(distance_guide(x, d_off, 0.2)),
                               np.asarray(x), atol=1e-7)

    # target 0 (stack): pulls the pair together
    d_stack = jnp.asarray(np.array([-1.0, 0.0, -1.0], np.float32))
    out2 = (np.asarray(distance_guide(x, d_stack, 0.2))[0] + 1) / 2 * PLAYFIELD
    assert np.hypot(*(out2[1] - out2[0])) < 50.0


def test_pipeline_distance_guidance_path():
    """distance_consistency > 0 runs through the unified sampler and pulls
    refined spacing toward the event-stream distance targets."""
    common = ["diff_cfg_scale=1.0", "max_seq_len=32", "overlap_buffer=4",
              "timesteps=[6]", "refine_entry=3"]
    events = []
    for i in range(8):
        events += [Event(EventType.CIRCLE),
                   Event(EventType.TIME_SHIFT, 1000 + 250 * i),
                   Event(EventType.DISTANCE, 120)]
    timing = [TimingPoint(offset=0.0, ms_per_beat=500.0)]
    gen_cfg = __import__(
        "beatheritage_tpu.inference.processor", fromlist=["GenerationConfig"]
    ).GenerationConfig()

    def spacing_err(weight):
        args = load_config(InferenceConfig, "inference", "tiny",
                           overrides=common + [
                               f"distance_consistency={weight}", "seed=3"])
        out = DiffusionPipeline(args).generate(events, gen_cfg, timing)
        pos = np.array([[x.value, y.value] for x, y in zip(
            [e for e in out if e.type == EventType.POS_X],
            [e for e in out if e.type == EventType.POS_Y])], np.float64)
        sp = np.hypot(*np.diff(pos, axis=0).T)
        return float(np.abs(sp - 120.0).mean()), pos

    err0, pos0 = spacing_err(0.0)
    err1, pos1 = spacing_err(0.6)
    assert np.isfinite(pos1).all()
    # guidance must reduce the mean absolute spacing error substantially
    # (random-init DiT: the weight-0 output is noise-like)
    assert err1 < err0 * 0.7, (err0, err1)
