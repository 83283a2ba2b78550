"""Classifier, rcomplexion, and evaluation-harness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.eval import (
    calculate_f1,
    calculate_precision,
    calculate_recall,
    feature_statistics,
    frechet_distance,
    get_rhythm,
    rhythm_stats,
)
from beatheritage_tpu.eval.benchmark import analyze_quality
from beatheritage_tpu.eval.fid import fid_between
from beatheritage_tpu.models.classifier import (
    ClassifierDims,
    classifier_forward,
    classifier_loss,
    init_classifier_params,
)
from beatheritage_tpu.models.rcomplexion import (
    RComplexionDims,
    init_rcomplexion_params,
    rcomplexion_forward,
    rcomplexion_loss,
    rhythm_complexity,
)
from beatheritage_tpu.osu import Beatmap


def test_classifier_forward_and_loss():
    dims = ClassifierDims(d_model=64, num_heads=4, d_ff=128, encoder_layers=2,
                          decoder_layers=2, n_mels=80, vocab_size=100,
                          num_classes=10, proj_size=16)
    params = init_classifier_params(jax.random.PRNGKey(0), dims)
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 16000))
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 100)
    out = classifier_forward(params, dims, audio, ids, dtype=jnp.float32)
    assert out["logits"].shape == (2, 10)
    assert out["features"].shape == (2, 16)

    labels = jnp.array([3, 7])
    loss, aux = classifier_loss(params, dims, audio, ids, labels)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: classifier_loss(p, dims, audio, ids, labels)[0])(params)
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_token_classifier_forward_loss_and_pad_invariance():
    from beatheritage_tpu.models.classifier import (
        init_token_classifier_params, is_token_classifier,
        token_classifier_forward, token_classifier_loss)
    dims = ClassifierDims(d_model=64, num_heads=4, d_ff=128, encoder_layers=2,
                          decoder_layers=0, vocab_size=100,
                          num_classes=10, proj_size=16)
    params = init_token_classifier_params(jax.random.PRNGKey(0), dims)
    assert is_token_classifier(params)
    assert not is_token_classifier(
        init_classifier_params(jax.random.PRNGKey(0), ClassifierDims(
            d_model=64, num_heads=4, d_ff=128, encoder_layers=2,
            decoder_layers=2, vocab_size=100, num_classes=10, proj_size=16)))

    pad = 0
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 24), 1, 100)
    out = token_classifier_forward(params, dims, ids, pad_id=pad,
                                   dtype=jnp.float32)
    assert out["logits"].shape == (2, 10)
    assert out["features"].shape == (2, 16)

    # padding must not change features: masked attention + masked mean-pool
    padded = jnp.concatenate([ids, jnp.full((2, 40), pad, ids.dtype)], axis=1)
    out_p = token_classifier_forward(params, dims, padded, pad_id=pad,
                                     dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_p["features"]),
                               np.asarray(out["features"]), atol=1e-5)

    labels = jnp.array([3, 7])
    loss, aux = token_classifier_loss(params, dims, ids, labels, pad_id=pad)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: token_classifier_loss(
        p, dims, ids, labels, pad_id=pad)[0])(params)
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_rcomplexion_forward_and_complexity():
    dims = RComplexionDims(vocab_size_in=200, vocab_size_out=150,
                           src_seq_len=16, hidden_size=32)
    params = init_rcomplexion_params(jax.random.PRNGKey(0), dims)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 200)
    logits = rcomplexion_forward(params, dims, ids)
    assert logits.shape == (4, 150)
    labels = jnp.array([1, 2, 3, 4])
    loss, _ = rcomplexion_loss(params, dims, ids, labels)
    assert np.isfinite(float(loss))
    c = rhythm_complexity(params, dims, ids, labels, od=8.0)
    assert np.isfinite(float(c)) and float(c) > 0


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    b = rng.standard_normal((500, 8)) + 2.0
    same = fid_between(a, a + rng.standard_normal((500, 8)) * 1e-6)
    diff = fid_between(a, b)
    assert same < 0.01
    assert diff > 10  # means differ by 2 in 8 dims -> d^2 >= 32
    mu, sigma = feature_statistics(a)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-6)


def test_rhythm_stats_matching():
    real = {1000, 2000, 3000}
    gen = {1005, 2500, 3002, 4000}
    stats = rhythm_stats(real, gen)
    assert stats["true_positives"] == 2      # 1005, 3002 within 10ms
    assert stats["false_negatives"] == 1     # 2000 missed
    assert stats["false_positives"] == 2     # 2500, 4000 spurious
    assert calculate_precision(stats) == pytest.approx(0.5)
    assert calculate_recall(stats) == pytest.approx(2 / 3)
    assert calculate_f1(stats) == pytest.approx(2 * 0.5 * (2 / 3) / (0.5 + 2 / 3))


def test_get_rhythm_active_passive():
    osu = """osu file format v14
[General]
Mode: 0
[Difficulty]
SliderMultiplier:1.4
[TimingPoints]
0,500,4,2,0,60,1,0
[HitObjects]
100,100,1000,1,0,0:0:0:0:
200,200,2000,2,0,L|300:200,2,140,0|0|0,0:0|0:0|0:0,0:0:0:0:
256,192,5000,12,0,6000,0:0:0:0:
"""
    bm = Beatmap.from_string(osu)
    active = get_rhythm(bm)
    passive = get_rhythm(bm, passive=True)
    assert 1000 in active and 2000 in active
    assert len(passive) > len(active)  # slider repeats + spinner end
    assert 6000 in passive


def test_analyze_quality(tmp_path):
    osu = """osu file format v14
[General]
Mode: 0
[TimingPoints]
0,500,4,2,0,60,1,0
[HitObjects]
""" + "\n".join(f"{100 + i * 37 % 300},{100 + i * 53 % 200},{1000 + i * 250},1,0,0:0:0:0:"
                for i in range(30))
    p = tmp_path / "m.osu"
    p.write_text(osu)
    q = analyze_quality(p)
    assert q["object_count"] == 30
    assert q["avg_spacing"] > 0
    assert 0 <= q["flow_score"] <= 1
    assert q["pattern_diversity"] > 0
    # missing file -> zeroed metrics
    assert analyze_quality(tmp_path / "none.osu")["object_count"] == 0
