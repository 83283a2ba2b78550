"""Model + ops tests (CPU, virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.models import (
    LABEL_IGNORE_ID,
    ModelDims,
    decode_train,
    encode,
    forward,
    init_params,
    param_count,
    rhythm_class_weights,
    weighted_cross_entropy,
)
from beatheritage_tpu.ops import mel_spectrogram, rope_cos_sin, apply_rope
from beatheritage_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(0), dims)
    return cfg, tok, dims, params


def test_mel_spectrogram_shape_and_fft_parity():
    x = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32)
    m1 = mel_spectrogram(jnp.asarray(x), n_fft=1024, n_mels=80, hop_length=128,
                         f_min=20, f_max=8000, stft="fft", log_scale=True)
    m2 = mel_spectrogram(jnp.asarray(x), n_fft=1024, n_mels=80, hop_length=128,
                         f_min=20, f_max=8000, stft="matmul", log_scale=True)
    assert m1.shape == (2, 16000 // 128 + 1, 80)
    # matmul path accumulates the real DFT in f32; ~0.5% typical deviation
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=5e-2, rtol=3e-2)


def test_mel_pure_tone_lands_in_right_bin():
    sr, f = 16000, 440.0
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    m = np.asarray(mel_spectrogram(jnp.asarray(x), sample_rate=sr, n_fft=1024,
                                   n_mels=80, hop_length=128, f_min=20, f_max=8000))
    from beatheritage_tpu.ops.mel import hz_to_mel, mel_to_hz
    peak_mel_bin = m[0, 20].argmax()
    # invert: mel bin centers
    m_pts = np.linspace(hz_to_mel(20), hz_to_mel(8000), 82)
    centre_hz = mel_to_hz(m_pts[peak_mel_bin + 1])
    assert abs(centre_hz - f) < 100  # within a bin width


def test_rope_rotation_preserves_norm_and_relativity():
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 16))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 8, 16))
    cos, sin = rope_cos_sin(jnp.arange(8), 16)
    q2, k2 = apply_rope(q, k, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q2), axis=-1),
                               np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)
    # relative property: scores depend only on position difference
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q2), np.asarray(k2))
    cos2, sin2 = rope_cos_sin(jnp.arange(2, 10), 16)
    q3, k3 = apply_rope(q, k, cos2, sin2)
    s2 = np.einsum("bhqd,bhkd->bhqk", np.asarray(q3), np.asarray(k3))
    np.testing.assert_allclose(np.diagonal(s, axis1=2, axis2=3),
                               np.diagonal(s2, axis1=2, axis2=3), atol=1e-4)


def test_encoder_shapes(setup):
    cfg, tok, dims, params = setup
    audio = jnp.zeros((2, cfg.data.src_seq_len * cfg.data.hop_length - cfg.data.hop_length))
    enc = encode(params, dims, cfg, audio, dtype=jnp.float32)
    assert enc.shape == (2, cfg.data.src_seq_len // 2, dims.d_model)
    assert not np.any(np.isnan(np.asarray(enc)))


def test_forward_logits_shape_and_grad(setup):
    cfg, tok, dims, params = setup
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, (cfg.data.src_seq_len - 1) * cfg.data.hop_length))
    ids = jnp.ones((2, 16), dtype=jnp.int32)
    logits = forward(params, dims, cfg, audio, ids, dtype=jnp.float32)
    assert logits.shape == (2, 16, tok.vocab_size_out)
    assert logits.dtype == jnp.float32

    labels = jnp.where(jnp.arange(16)[None, :] < 12, ids, LABEL_IGNORE_ID)
    cw = rhythm_class_weights(dims)

    def loss_fn(p):
        lg = forward(p, dims, cfg, audio, ids, dtype=jnp.float32)
        loss, _ = weighted_cross_entropy(lg, labels, cw)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_causal_masking(setup):
    """Future decoder tokens must not influence earlier logits."""
    cfg, tok, dims, params = setup
    enc = jax.random.normal(jax.random.PRNGKey(3), (1, 8, dims.d_model))
    ids1 = jnp.array([[1, 5, 6, 7]], dtype=jnp.int32)
    ids2 = jnp.array([[1, 5, 6, 9]], dtype=jnp.int32)  # differ at last pos
    l1 = decode_train(params, dims, ids1, enc, dtype=jnp.float32)
    l2 = decode_train(params, dims, ids2, enc, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l1[:, :3]), np.asarray(l2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, 3]), np.asarray(l2[:, 3]))


def test_weighted_ce_semantics():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.array([[1, 2, 3, LABEL_IGNORE_ID]])
    cw = jnp.ones(10).at[2].set(3.0)
    loss, n = weighted_cross_entropy(logits, labels, cw)
    # uniform logits: nll = log(10) per token; weights 1,3,1 over 3 valid
    expected = np.log(10) * (1 + 3 + 1) / 3
    assert float(loss) == pytest.approx(expected, rel=1e-5)
    assert int(n) == 3


def test_param_count_reasonable(setup):
    cfg, tok, dims, params = setup
    n = param_count(params)
    assert 100_000 < n < 5_000_000  # tiny model


def test_bf16_forward_finite(setup):
    cfg, tok, dims, params = setup
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, (cfg.data.src_seq_len - 1) * cfg.data.hop_length))
    ids = jnp.ones((1, 8), dtype=jnp.int32)
    logits = forward(params, dims, cfg, audio, ids, dtype=jnp.bfloat16)
    assert np.all(np.isfinite(np.asarray(logits, dtype=np.float32)))


def test_causal_attention_pad_mask_droppable_for_right_padding():
    """The flash training path drops the decoder padding key-mask: with
    right padding + causal masking, outputs at NON-PAD positions are
    identical with or without the key mask (pads only attend pads, and pad
    positions carry -100 labels)."""
    import jax
    import jax.numpy as jnp
    from beatheritage_tpu.ops.attention import dot_product_attention

    b, h, t, d, valid = 2, 2, 16, 8, 11
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, t, d))
    k = jax.random.normal(ks[1], (b, h, t, d))
    v = jax.random.normal(ks[2], (b, h, t, d))
    key_mask = jnp.arange(t) < valid  # right padding
    masked = dot_product_attention(q, k, v, is_causal=True,
                                   mask=key_mask[None, None, None, :])
    unmasked = dot_product_attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(masked[:, :, :valid]),
                               np.asarray(unmasked[:, :, :valid]),
                               atol=1e-6)
    # and pad positions DO differ (which is why labels there must be -100)
    assert not np.allclose(np.asarray(masked[:, :, valid:]),
                           np.asarray(unmasked[:, :, valid:]))

def test_weighted_ce_matches_torch_with_smoothing():
    """weighted_cross_entropy must match the reference's exact loss:
    nn.CrossEntropyLoss(weight, reduction='none', ignore_index=-100,
    label_smoothing) summed / valid-count (modeling_mapperatorinator.py:110-117,
    188-192), including the torch per-class-weighted smoothing term."""
    import torch

    rng = np.random.default_rng(7)
    B, T, V = 2, 6, 11
    logits_np = rng.standard_normal((B, T, V)).astype(np.float32)
    labels_np = rng.integers(0, V, (B, T)).astype(np.int64)
    labels_np[0, -1] = LABEL_IGNORE_ID
    labels_np[1, 0] = LABEL_IGNORE_ID
    cw_np = np.ones(V, np.float32)
    cw_np[3:7] = 1.2  # rhythm_weight-style band
    eps = 0.1

    loss_fn = torch.nn.CrossEntropyLoss(
        weight=torch.from_numpy(cw_np), reduction="none",
        ignore_index=LABEL_IGNORE_ID, label_smoothing=eps)
    unreduced = loss_fn(torch.from_numpy(logits_np).swapaxes(1, -1),
                        torch.from_numpy(labels_np))
    valid = labels_np != LABEL_IGNORE_ID
    ref = float(unreduced.sum() / valid.sum())

    ours, n = weighted_cross_entropy(
        jnp.asarray(logits_np), jnp.asarray(labels_np.astype(np.int32)),
        jnp.asarray(cw_np), label_smoothing=eps)
    assert int(n) == int(valid.sum())
    assert float(ours) == pytest.approx(ref, rel=1e-5)
