"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beatheritage_tpu.ops.attention import dot_product_attention
from beatheritage_tpu.ops.mel import mel_spectrogram
from beatheritage_tpu.ops.pallas.flash_attention import flash_attention
from beatheritage_tpu.ops.pallas.mel import fused_mel_spectrogram


def test_flash_attention_matches_xla():
    b, h, t, d = 2, 4, 128, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, t, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d))
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_attention_causal_matches_xla():
    b, h, t, d = 1, 2, 96, 64
    q = jax.random.normal(jax.random.PRNGKey(3), (b, h, t, d))
    k = jax.random.normal(jax.random.PRNGKey(4), (b, h, t, d))
    v = jax.random.normal(jax.random.PRNGKey(5), (b, h, t, d))
    ref = dot_product_attention(q, k, v, is_causal=True)
    out = flash_attention(q, k, v, is_causal=True, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_attention_ragged_tq():
    """Tq not a multiple of block_q gets padded and trimmed correctly."""
    b, h, tq, tk, d = 1, 2, 50, 64, 64
    q = jax.random.normal(jax.random.PRNGKey(6), (b, h, tq, d))
    k = jax.random.normal(jax.random.PRNGKey(7), (b, h, tk, d))
    v = jax.random.normal(jax.random.PRNGKey(8), (b, h, tk, d))
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=32, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_attention_rejects_masks():
    q = jnp.zeros((1, 1, 8, 64))
    with pytest.raises(NotImplementedError):
        flash_attention(q, q, q, mask=jnp.ones((1, 1, 8, 8), bool), interpret=True)


def test_fused_mel_matches_xla():
    x = np.random.default_rng(0).standard_normal((2, 16000)).astype(np.float32)
    ref = mel_spectrogram(jnp.asarray(x), n_fft=1024, n_mels=80, hop_length=128,
                          f_min=20, f_max=8000, log_scale=True, stft="matmul")
    out = fused_mel_spectrogram(jnp.asarray(x), n_fft=1024, n_mels=80,
                                hop_length=128, f_min=20, f_max=8000,
                                log_scale=True, block_t=64, interpret=True,
                                dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=3e-2)


def test_fused_mel_reflect_pad():
    x = np.random.default_rng(1).standard_normal((1, 4096)).astype(np.float32)
    ref = mel_spectrogram(jnp.asarray(x), n_fft=1024, n_mels=80, hop_length=128,
                          f_min=20, f_max=8000, pad_mode="reflect", stft="fft")
    out = fused_mel_spectrogram(jnp.asarray(x), n_fft=1024, n_mels=80,
                                hop_length=128, f_min=20, f_max=8000,
                                pad_mode="reflect", block_t=32, interpret=True,
                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("is_causal,tq", [(False, 128), (True, 96)])
def test_flash_attention_backward_matches_xla(is_causal, tq):
    """Custom-VJP backward kernel vs XLA autodiff gradients (incl. ragged
    tq exercising the padded rows in dK/dV accumulation)."""
    b, h, d, tk = 2, 2, 64, 128
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (b, h, tq, d))
    k = jax.random.normal(ks[1], (b, h, tk if not is_causal else tq, d))
    v = jax.random.normal(ks[2], k.shape)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, is_causal=is_causal, block_q=32,
                            interpret=True)
        return (o * jnp.cos(o)).sum()  # nonlinear so dO varies per element

    def loss_ref(q, k, v):
        o = dot_product_attention(q, k, v, is_causal=is_causal)
        return (o * jnp.cos(o)).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-3,
                                   rtol=5e-3, err_msg=f"d{name}")


def test_flash_attention_causal_multichunk():
    """tk spanning several K chunks exercises the causal chunk-skip bound
    (query blocks must still see every chunk up to their diagonal)."""
    b, h, t, d = 1, 2, 384, 64  # _pick_chunk(384)=128 -> 3 chunks
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q, k, v = (jax.random.normal(x, (b, h, t, d)) for x in ks)
    ref = dot_product_attention(q, k, v, is_causal=True)
    out = flash_attention(q, k, v, is_causal=True, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)

    def loss(fn):
        return lambda *a: (fn(*a) * jnp.cos(fn(*a))).sum()

    g = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, is_causal=True, block_q=32, interpret=True)),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(lambda q, k, v: dot_product_attention(
        q, k, v, is_causal=True)), argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-3,
                                   rtol=5e-3, err_msg=f"d{name}")


def test_flash_attention_bf16_inputs():
    """bf16 inputs run the kernels' bf16-matmul path (the MXU rate case)."""
    b, h, t, d = 1, 2, 128, 64
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q, k, v = (jax.random.normal(x, (b, h, t, d), jnp.bfloat16) for x in ks)
    ref = dot_product_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                v.astype(jnp.float32), is_causal=True)
    out = flash_attention(q, k, v, is_causal=True, block_q=32, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


class TestFusedLayout:
    """flash_attention_fused: (B, T, H*D) layout, packed-head kernel."""

    @staticmethod
    def _ref(q, k, v, h, is_causal):
        def split(x):
            b, t, hd = x.shape
            return x.reshape(b, t, h, hd // h).transpose(0, 2, 1, 3)
        o = dot_product_attention(split(q), split(k), split(v),
                                  is_causal=is_causal)
        b, _, t, d = o.shape
        return o.transpose(0, 2, 1, 3).reshape(b, t, h * d)

    @pytest.mark.parametrize("is_causal,tq,tk", [
        (False, 128, 128), (True, 96, 96), (False, 50, 64), (True, 384, 384)])
    def test_forward_matches_xla(self, is_causal, tq, tk):
        from beatheritage_tpu.ops.pallas.flash_attention import (
            flash_attention_fused)
        b, h, d = 2, 4, 64
        ks = jax.random.split(jax.random.PRNGKey(tq + tk), 3)
        q = jax.random.normal(ks[0], (b, tq, h * d))
        k = jax.random.normal(ks[1], (b, tk, h * d))
        v = jax.random.normal(ks[2], (b, tk, h * d))
        out = flash_attention_fused(q, k, v, h, is_causal=is_causal,
                                    block_q=32, interpret=True)
        ref = self._ref(q, k, v, h, is_causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)

    @pytest.mark.parametrize("is_causal,t", [(False, 128), (True, 96),
                                             (True, 384)])
    def test_backward_matches_xla(self, is_causal, t):
        from beatheritage_tpu.ops.pallas.flash_attention import (
            flash_attention_fused)
        b, h, d = 2, 4, 64
        ks = jax.random.split(jax.random.PRNGKey(t), 3)
        q, k, v = (jax.random.normal(x, (b, t, h * d)) for x in ks)

        def loss_fused(q, k, v):
            o = flash_attention_fused(q, k, v, h, is_causal=is_causal,
                                      block_q=32, interpret=True)
            return (o * jnp.cos(o)).sum()

        def loss_ref(q, k, v):
            o = self._ref(q, k, v, h, is_causal)
            return (o * jnp.cos(o)).sum()

        g = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, r, name in zip(g, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=5e-3, rtol=5e-3,
                                       err_msg=f"d{name}")

    def test_bf16(self):
        from beatheritage_tpu.ops.pallas.flash_attention import (
            flash_attention_fused)
        b, t, h, d = 1, 128, 4, 64
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q, k, v = (jax.random.normal(x, (b, t, h * d), jnp.bfloat16)
                   for x in ks)
        out = flash_attention_fused(q, k, v, h, is_causal=True, block_q=32,
                                    interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = self._ref(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), h, True)
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_mel_from_config_accepts_int16_pcm():
    """DataConfig.pcm_int16 ships int16 audio; the mel frontend must convert
    on device and match the f32 path within quantization tolerance."""
    from beatheritage_tpu.config.schema import SpectrogramConfig
    from beatheritage_tpu.ops.mel import mel_from_config

    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal((2, 16000)) * 0.2, -1, 1).astype(np.float32)
    xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    cfg = SpectrogramConfig()
    ref = mel_from_config(jnp.asarray(x), cfg)
    out = mel_from_config(jnp.asarray(xi), cfg)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
