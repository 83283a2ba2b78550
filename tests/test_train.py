"""Training runtime tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.models import ModelDims, init_params
from beatheritage_tpu.parallel import build_mesh
from beatheritage_tpu.tokenizer import Tokenizer
from beatheritage_tpu.train import (
    Trainer,
    build_optimizer,
    build_schedule,
    init_train_state,
    make_train_step,
    newton_schulz_orthogonalize,
)


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        "optim.warmup_steps=2", "optim.total_steps=16", "optim.grad_acc=1",
    ])
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(0), dims)
    return cfg, tok, dims, params


def make_batch(cfg, tok, batch=8, tgt=16):
    rng = np.random.default_rng(0)
    n_samples = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
    ids = rng.integers(3, tok.vocab_size_out, (batch, tgt)).astype(np.int32)
    labels = np.roll(ids, -1, axis=1).astype(np.int32)
    labels[:, -1] = -100
    return {
        "frames": rng.standard_normal((batch, n_samples)).astype(np.float32),
        "decoder_input_ids": ids,
        "labels": labels,
        "decoder_attention_mask": np.ones((batch, tgt), np.int32),
    }


def test_mesh_covers_virtual_devices():
    mesh = build_mesh(-1, 1)
    assert mesh.devices.size == len(jax.devices())
    mesh2 = build_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_newton_schulz_orthogonalizes():
    g = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    o = np.asarray(newton_schulz_orthogonalize(g, steps=10), dtype=np.float64)
    gram = o.T @ o
    # singular values should approach 1 (NS5 converges to ~U(0.7,1.3) band)
    sv = np.sqrt(np.linalg.eigvalsh(gram))
    assert np.all(sv > 0.3) and np.all(sv < 1.7)


def test_schedule_shape():
    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        "optim.warmup_steps=10", "optim.total_steps=100",
        "optim.base_lr=1e-2", "optim.final_cosine=1e-5",
    ])
    s = build_schedule(cfg.optim)
    assert float(s(0)) == pytest.approx(5e-3, rel=1e-3)   # warmup starts at 0.5x
    assert float(s(10)) == pytest.approx(1e-2, rel=1e-2)  # peak after warmup
    assert float(s(100)) == pytest.approx(1e-5, rel=0.3)  # decayed


@pytest.mark.parametrize("opt_name", ["adamw", "adamwscale", "muon"])
def test_optimizer_reduces_loss(setup, opt_name):
    cfg, tok, dims, params = setup
    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        f"optim.name={opt_name}", "optim.base_lr=1e-3",
        "optim.warmup_steps=0", "optim.total_steps=100",
    ])
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    opt_state = optimizer.init(params)

    # toy quadratic-free check: run two steps of the real train step and see
    # the loss go down on a repeated batch
    mesh = build_mesh(-1, 1)
    step = make_train_step(dims, cfg, optimizer, mesh, dtype=jnp.float32)
    state = init_train_state(params, optimizer)
    batch = make_batch(cfg, tok)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_step_sharded_over_data_axis(setup):
    """Batch sharded over 8 devices must produce the same loss as replicated
    single-device execution (allreduce correctness)."""
    cfg, tok, dims, params = setup
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    batch = make_batch(cfg, tok, batch=8)

    mesh8 = build_mesh(8, 1)
    step8 = make_train_step(dims, cfg, optimizer, mesh8, dtype=jnp.float32)
    state8 = init_train_state(params, optimizer)
    _, m8 = step8(state8, batch)

    mesh1 = build_mesh(1, 1, devices=jax.devices()[:1])
    step1 = make_train_step(dims, cfg, optimizer, mesh1, dtype=jnp.float32)
    state1 = init_train_state(params, optimizer)
    _, m1 = step1(state1, batch)

    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    assert float(m8["grad_l2"]) == pytest.approx(float(m1["grad_l2"]), rel=1e-3)


def test_grad_accumulation_matches_large_batch(setup):
    cfg, tok, dims, params = setup
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    mesh = build_mesh(-1, 1)

    batch = make_batch(cfg, tok, batch=16)
    step_full = make_train_step(dims, cfg, optimizer, mesh, dtype=jnp.float32)
    _, m_full = step_full(init_train_state(params, optimizer), batch)

    # microbatch size must stay divisible by the data axis (8 devices)
    micro = {k: v.reshape(2, 8, *v.shape[1:]) for k, v in batch.items()}
    step_acc = make_train_step(dims, cfg, optimizer, mesh, grad_acc=2,
                               dtype=jnp.float32)
    _, m_acc = step_acc(init_train_state(params, optimizer), micro)
    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]), rel=1e-3)


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, tok, dims, params = setup
    from beatheritage_tpu.train.checkpoints import (
        restore_train_state, save_params, restore_params, save_train_state)
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    state = init_train_state(params, optimizer)

    save_train_state(tmp_path, state, tok)
    assert (tmp_path / "tokenizer.json").is_file()
    restored = restore_train_state(tmp_path, state)
    assert restored is not None
    chex_assert_trees_equal(restored.params, state.params)

    p2 = restore_params(tmp_path, template=params)
    chex_assert_trees_equal(p2, params)


def test_restore_params_from_state_only_mirror(setup, tmp_path):
    """Durable mirrors may hold only the latest state_N (no top-level
    params/); restore_params must pull the params subtree from it."""
    import shutil
    cfg, tok, dims, params = setup
    from beatheritage_tpu.train.checkpoints import (
        latest_state_dir, restore_params, save_train_state)
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    state = init_train_state(params, optimizer)
    save_train_state(tmp_path, state, tok)
    shutil.rmtree(tmp_path / "params")
    assert latest_state_dir(tmp_path) is not None
    p2 = restore_params(tmp_path)
    chex_assert_trees_equal(p2, params)


def test_restore_params_state_only_mirror_keeps_ema(tmp_path):
    """A state-only DiT mirror (state carries an 'ema' subtree, as
    apps/train_diffusion.py saves) must restore {'params', 'ema'} like the
    matching top-level params/ save would — sampling uses the EMA weights
    (reference: osu_diffusion train.py:32 update_ema), and silently handing
    back raw params would be a quiet quality regression."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from beatheritage_tpu.train.checkpoints import restore_params
    params = {"w": jnp.arange(4.0)}
    ema = {"w": jnp.arange(4.0) * 0.5}
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp_path.resolve() / "state_7",
                   {"step": 7, "params": params, "ema": ema,
                    "opt_state": {"mu": params}}, force=True)
    tree = restore_params(tmp_path)
    assert set(tree) == {"params", "ema"}
    chex_assert_trees_equal(tree["params"], params)
    chex_assert_trees_equal(tree["ema"], ema)
    # the template branch must also survive a state-only mirror
    p2 = restore_params(tmp_path, template={"w": jnp.zeros(4)})
    chex_assert_trees_equal(p2["params"], params)


def test_resolve_ckpt_dir_artifact_fallback(tmp_path, monkeypatch):
    """A missing scratch path (/tmp wiped by a VM restart) resolves to the
    durable mirror artifacts/<basename> when one exists."""
    from beatheritage_tpu.train.checkpoints import resolve_ckpt_dir
    mirror_root = tmp_path / "mirrors"
    (mirror_root / "some_ckpt").mkdir(parents=True)
    monkeypatch.setenv("BEATHERITAGE_ARTIFACTS", str(mirror_root))
    got = resolve_ckpt_dir("/tmp/definitely-not-there/some_ckpt")
    assert got == mirror_root / "some_ckpt"
    # an existing path wins over any mirror
    live = tmp_path / "some_ckpt"
    live.mkdir()
    assert resolve_ckpt_dir(live) == live


def chex_assert_trees_equal(a, b):
    import chex
    chex.assert_trees_all_close(a, b, atol=0)


def test_trainer_fit_runs(setup, tmp_path):
    cfg, tok, dims, params = setup
    trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok,
                      checkpoint_dir=None, log_every=1)
    batch = make_batch(cfg, tok, batch=8)
    metrics = trainer.fit(iter([batch, batch]), max_steps=2)
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    assert int(trainer.state.step) == 2


def test_trainer_fit_max_steps_is_global(setup):
    """max_steps bounds state.step, not batches-consumed: a resumed run
    must stop at the same total as a fresh one (caught live: a run resumed
    from step 6500 with total_steps=8000 kept training past 8000)."""
    cfg, tok, dims, params = setup
    trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok,
                      checkpoint_dir=None, log_every=1)
    batch = make_batch(cfg, tok, batch=8)
    trainer.fit(iter([batch] * 3), max_steps=2)
    assert int(trainer.state.step) == 2
    # "resume": fit again with the same max_steps — already there, no step
    trainer.fit(iter([batch] * 3), max_steps=2)
    assert int(trainer.state.step) == 2
    # raising the budget trains only the remainder
    trainer.fit(iter([batch] * 5), max_steps=3)
    assert int(trainer.state.step) == 3


def test_trainer_fit_max_seconds_deadline(setup, tmp_path):
    """cfg.max_seconds bounds wall-clock: the loop checkpoints and exits
    before consuming the remaining batches (the measurement runbook relies
    on this for clean single-chip deadline exits)."""
    import dataclasses
    cfg, tok, dims, params = setup
    cfg2 = dataclasses.replace(cfg, max_seconds=1e-9)
    trainer = Trainer(cfg=cfg2, dims=dims, params=params, tokenizer=tok,
                      checkpoint_dir=str(tmp_path / "ckpt"), log_every=1)
    batch = make_batch(cfg2, tok, batch=8)
    trainer.fit(iter([batch] * 50), max_steps=50)
    assert int(trainer.state.step) == 0  # deadline hit before step 1
    assert (tmp_path / "ckpt").exists()  # checkpointed on exit


def test_trainer_fit_sigterm_checkpoints_and_exits(setup, tmp_path):
    """SIGTERM mid-fit = stop-but-keep-the-work: checkpoint, exit the loop
    cleanly, and restore the previous signal handler (the measurement queue
    TERMs the trainer at its deadline; before this, TERM killed the process
    losing up to checkpoint.every_steps of progress)."""
    import os
    import signal
    cfg, tok, dims, params = setup
    trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok,
                      checkpoint_dir=str(tmp_path / "ckpt"), log_every=1)
    batch = make_batch(cfg, tok, batch=8)
    prev = signal.getsignal(signal.SIGTERM)

    def batches():
        yield batch  # step 1 trains
        os.kill(os.getpid(), signal.SIGTERM)  # handled at next loop check
        yield batch
        yield batch

    trainer.fit(batches(), max_steps=50)
    assert int(trainer.state.step) == 1  # stopped after the TERM, not at 3
    assert (tmp_path / "ckpt").exists()  # work kept
    assert signal.getsignal(signal.SIGTERM) is prev  # handler restored
    # liveness marker: fit touches .heartbeat each log interval so a
    # babysitter can tell a stalled device call from an unlogged run
    assert (tmp_path / "ckpt" / ".heartbeat").exists()


def test_tensor_parallel_matches_replicated(setup):
    """(data=4, model=2) mesh with Megatron-style param sharding must match
    the replicated single-device loss (TP allreduce correctness)."""
    cfg, tok, dims, params = setup
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    batch = make_batch(cfg, tok, batch=8)

    mesh_tp = build_mesh(4, 2)
    step_tp = make_train_step(dims, cfg, optimizer, mesh_tp, dtype=jnp.float32)
    _, m_tp = step_tp(init_train_state(params, optimizer), batch)

    mesh1 = build_mesh(1, 1, devices=jax.devices()[:1])
    step1 = make_train_step(dims, cfg, optimizer, mesh1, dtype=jnp.float32)
    _, m1 = step1(init_train_state(params, optimizer), batch)

    assert float(m_tp["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)

@pytest.mark.parametrize("shape_out_in", [(16, 64), (64, 16), (32, 32)])
def test_muon_update_matches_reference_torch_step(shape_out_in):
    """Our muon_transform must reproduce the reference torch Muon step
    (reference muon_utils.py:137-173) on rectangular matrices, including the
    max(1, fan_out/fan_in)**0.5 aspect-ratio scale. Reference weights are
    (out, in); ours are (in, out), so grads/updates transpose across."""
    import torch

    from beatheritage_tpu.train.optim import muon_transform

    out_dim, in_dim = shape_out_in
    rng = np.random.default_rng(0)
    g_np = rng.standard_normal((out_dim, in_dim)).astype(np.float32)
    momentum, ns_steps = 0.95, 6

    # -- reference step (first step: momentum buffer starts at zero) --
    g_t = torch.from_numpy(g_np)
    buf = torch.zeros_like(g_t).mul_(momentum).add_(g_t)
    eff = g_t.add(buf, alpha=momentum)  # nesterov
    a, b, c = (3.4445, -4.7750, 2.0315)
    x = eff.bfloat16()
    x = x / (x.norm() + 1e-7)
    t = x.size(0) > x.size(1)
    if t:
        x = x.T
    for _ in range(ns_steps):
        A = x @ x.T
        x = a * x + (b * A + c * A @ A) @ x
    if t:
        x = x.T
    ref_update = -(x.float() * max(1, eff.size(0) / eff.size(1)) ** 0.5).numpy()

    # -- our step on the transposed (in, out) layout --
    params = {"w": jnp.asarray(g_np.T) * 0.0}
    opt = muon_transform(momentum=momentum, nesterov=True, ns_steps=ns_steps)
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.asarray(g_np.T)}, state, params)
    ours = np.asarray(updates["w"], dtype=np.float32).T

    # bf16 NS iterations accumulate rounding differences between torch and XLA
    np.testing.assert_allclose(ours, ref_update, atol=0.08, rtol=0.05)
    # the aspect-ratio scale itself must match exactly in magnitude
    assert np.linalg.norm(ours) == pytest.approx(np.linalg.norm(ref_update), rel=0.05)


import pytest as _pytest


@_pytest.mark.parametrize("family,model_name", [
    ("whisper", "whisper-base"),
    ("nwhisper", "nwhisper-base"),
    ("t5", "t5-small"),
])
def test_train_step_runs_for_every_backbone_family(family, model_name):
    """Every reference backbone family trains through the registry
    (models/backbones.py; reference get_backbone_model swaps families by
    config name, modeling_mapperatorinator.py:19)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.models import ModelDims
    from beatheritage_tpu.models.backbones import resolve_backbone
    from beatheritage_tpu.tokenizer import Tokenizer
    from beatheritage_tpu.train.train_loop import Trainer

    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        f"model.name={model_name}", "optim.grad_acc=1",
        "optim.batch_size=8", "gradient_checkpointing=false",
        "precision=f32"])
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    bb = resolve_backbone(cfg.model.name)
    assert bb.family == family
    params = bb.init(jax.random.PRNGKey(0), dims)

    trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok)
    n = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
    batch = {
        "frames": np.random.default_rng(0).standard_normal((8, n)).astype(np.float32),
        "decoder_input_ids": np.ones((8, 16), np.int32),
        "labels": np.full((8, 16), 5, np.int32),
    }
    state, metrics = trainer.train_step(trainer.state, batch)
    assert np.isfinite(float(metrics["loss"]))
    if family == "nwhisper":
        # post-step hook keeps NormLinear weights unit-norm
        w = np.asarray(state.params["decoder"]["layers"]["q"]["w"][0])
        np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, atol=1e-3)


def test_muon_bf16_momentum_tracks_f32():
    """bf16 momentum storage (optim.muon_momentum_dtype) must track the f32
    trajectory closely: the NS iteration casts to bf16 on entry anyway, so
    only cross-step accumulation rounding differs."""
    import jax
    import jax.numpy as jnp
    from beatheritage_tpu.train.optim import muon_transform

    key = jax.random.PRNGKey(3)
    w = {"w": jax.random.normal(key, (64, 256)) * 0.02}

    def run(momentum_dtype):
        tx = muon_transform(momentum_dtype=momentum_dtype)
        state = tx.init(w)
        params = dict(w)
        for i in range(8):
            g = {"w": jax.random.normal(jax.random.PRNGKey(10 + i),
                                        (64, 256)) * 0.1}
            upd, state = tx.update(g, state)
            params = jax.tree.map(lambda p, u: p + 1e-3 * u, params, upd)
        return params["w"]

    f32 = run(None)
    bf16 = run(jnp.bfloat16)
    # direction agreement: cosine similarity of the total update
    d32, d16 = f32 - w["w"], bf16 - w["w"]
    cos = float(jnp.sum(d32 * d16) /
                (jnp.linalg.norm(d32) * jnp.linalg.norm(d16)))
    assert cos > 0.99


def test_chunked_cross_entropy_matches_unchunked():
    """chunked_weighted_cross_entropy must equal the plain path exactly-ish:
    same loss, counts, and gradients (incl. ragged T % chunk != 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from beatheritage_tpu.models.transformer import (
        chunked_weighted_cross_entropy, weighted_cross_entropy)

    b, t, d, v = 2, 50, 16, 37
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = jax.random.normal(k1, (b, t, d))
    head = jax.random.normal(k2, (d, v)) * 0.3
    labels = jax.random.randint(k3, (b, t), 0, v)
    labels = labels.at[:, -7:].set(-100)  # ignore tail
    cw = jnp.ones(v).at[3:9].set(1.2)
    sw = jnp.asarray([1.0, 0.7])

    def plain(hidden, head):
        logits = (hidden @ head).astype(jnp.float32)
        return weighted_cross_entropy(logits, labels, cw,
                                      label_smoothing=0.1,
                                      sample_weights=sw)[0]

    def chunked(hidden, head):
        return chunked_weighted_cross_entropy(hidden, head, labels, cw,
                                              label_smoothing=0.1,
                                              sample_weights=sw, chunk=16)[0]

    lp, lc = float(plain(hidden, head)), float(chunked(hidden, head))
    np.testing.assert_allclose(lc, lp, rtol=1e-6)

    gp = jax.grad(plain, argnums=(0, 1))(hidden, head)
    gc = jax.grad(chunked, argnums=(0, 1))(hidden, head)
    for a, r, name in zip(gc, gp, ("hidden", "head")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-5,
                                   atol=1e-6, err_msg=name)

    _, n_valid, n_correct = chunked_weighted_cross_entropy(
        hidden, head, labels, cw, label_smoothing=0.1, sample_weights=sw,
        chunk=16)
    logits = (hidden @ head).astype(jnp.float32)
    assert int(n_valid) == int((labels != -100).sum())
    assert int(n_correct) == int(((jnp.argmax(logits, -1) == labels)
                                  & (labels != -100)).sum())


def test_train_step_chunked_loss_matches_plain():
    """Trainer with loss_chunk_size produces the same loss/accuracy metrics
    as the plain path on the tiny config."""
    import jax
    import numpy as np
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.models import ModelDims, init_params
    from beatheritage_tpu.tokenizer import Tokenizer
    from beatheritage_tpu.train.train_loop import Trainer

    metrics_by_mode = {}
    for chunk in (0, 8):
        cfg = load_config(TrainConfig, "train", "tiny", overrides=[
            "optim.grad_acc=1", "optim.batch_size=8",
            "gradient_checkpointing=false", "precision=f32",
            f"loss_chunk_size={chunk}"])
        tok = Tokenizer(cfg)
        dims = ModelDims.from_config(cfg, tok)
        params = init_params(jax.random.PRNGKey(0), dims)
        trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok)
        n = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
        rng = np.random.default_rng(0)
        batch = {
            "frames": rng.standard_normal((8, n)).astype(np.float32),
            "decoder_input_ids": np.ones((8, 20), np.int32),
            "labels": np.full((8, 20), 5, np.int32),
        }
        _, metrics = trainer.train_step(trainer.state, batch)
        metrics_by_mode[chunk] = {k: float(v) for k, v in metrics.items()}

    np.testing.assert_allclose(metrics_by_mode[8]["loss"],
                               metrics_by_mode[0]["loss"], rtol=1e-5)
    np.testing.assert_allclose(metrics_by_mode[8]["accuracy"],
                               metrics_by_mode[0]["accuracy"], rtol=1e-6)


def test_remat_policy_dots_matches_save_nothing():
    """remat_policy='dots' (save MXU outputs) produces the same loss and
    gradient values as the save-nothing default — remat is a memory/compute
    trade, never a numerics change."""
    import jax
    import numpy as np
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.models import ModelDims, init_params
    from beatheritage_tpu.tokenizer import Tokenizer
    from beatheritage_tpu.train.train_loop import Trainer

    metrics_by_policy = {}
    for policy in ("", "dots"):
        cfg = load_config(TrainConfig, "train", "tiny", overrides=[
            "optim.grad_acc=1", "optim.batch_size=8",
            "gradient_checkpointing=true", "precision=f32",
            f"remat_policy={policy}"])
        tok = Tokenizer(cfg)
        dims = ModelDims.from_config(cfg, tok)
        params = init_params(jax.random.PRNGKey(0), dims)
        trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok)
        n = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
        rng = np.random.default_rng(0)
        batch = {
            "frames": rng.standard_normal((8, n)).astype(np.float32),
            "decoder_input_ids": np.ones((8, 20), np.int32),
            "labels": np.full((8, 20), 5, np.int32),
        }
        state, metrics = trainer.train_step(trainer.state, batch)
        metrics_by_policy[policy] = {k: float(v) for k, v in metrics.items()}

    np.testing.assert_allclose(metrics_by_policy["dots"]["loss"],
                               metrics_by_policy[""]["loss"], rtol=1e-6)
    np.testing.assert_allclose(metrics_by_policy["dots"]["grad_l2"],
                               metrics_by_policy[""]["grad_l2"], rtol=1e-4)
