"""DiT coordinate refiner (adaLN-Zero diffusion transformer), pure pytrees.

Re-design of the reference's osu-diffusion DiT
(reference: osu_diffusion/utils/models.py:213): input is a sequence of 2D
positions embedded by per-channel sinusoidal features concatenated with a
per-token context vector (models.py:180 FirstLayer), conditioned on timestep
+ class embeddings through 6-way adaLN modulation (models.py:103 DiTBlock),
zero-initialized gates and final layer, learn-sigma output (2*in_channels).
Blocks are stacked and applied with lax.scan; attention supports the banded
mask used for long sequences (diffusion_pipeline.py:146).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, merge_heads, split_heads

DIT_SIZES = {
    # hidden, depth, heads  (reference models.py:384-405)
    "DiT-XL": (1152, 28, 16),
    "DiT-L": (1024, 24, 16),
    "DiT-B": (768, 12, 12),
    "DiT-S": (384, 12, 6),
    # below-reference sizes: XS proves conditioning end-to-end on a
    # 1-core host within hours (not a reference size; reference
    # models.py:384-405 stops at S)
    "DiT-XS": (192, 6, 4),
    "DiT-test": (64, 2, 4),
}


@dataclasses.dataclass(frozen=True)
class DiTDims:
    hidden_size: int
    depth: int
    num_heads: int
    in_channels: int = 2
    context_size: int = 272
    class_size: int = 256
    mlp_ratio: float = 4.0
    learn_sigma: bool = True
    freq_size: int = 128       # per-channel position frequency features
    t_freq_size: int = 256     # timestep frequency features

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @classmethod
    def from_name(cls, name: str, context_size: int = 272,
                  class_size: Optional[int] = None) -> "DiTDims":
        hidden, depth, heads = DIT_SIZES[name]
        return cls(hidden_size=hidden, depth=depth, num_heads=heads,
                   context_size=context_size,
                   class_size=class_size if class_size is not None else context_size)


def sinusoidal_embedding(x: jnp.ndarray, dim: int,
                         max_period: float = 10000.0) -> jnp.ndarray:
    """GLIDE-style sin/cos features of scalars: (...,) -> (..., dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = x[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _xavier(key, d_in, d_out):
    limit = np.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(key, (d_in, d_out), jnp.float32, -limit, limit)


def _dense(key, d_in, d_out, std=None):
    w = (_xavier(key, d_in, d_out) if std is None
         else jax.random.normal(key, (d_in, d_out)) * std)
    return {"w": w, "b": jnp.zeros(d_out)}


def _init_block(key, dims: DiTDims):
    ks = jax.random.split(key, 6)
    h = dims.hidden_size
    mlp_h = int(h * dims.mlp_ratio)
    return {
        "qkv": _dense(ks[0], h, 3 * h),
        "proj": _dense(ks[1], h, h),
        "mlp1": _dense(ks[2], h, mlp_h),
        "mlp2": _dense(ks[3], mlp_h, h),
        # adaLN-Zero: zero-init so each block starts as identity
        "ada": {"w": jnp.zeros((h, 6 * h)), "b": jnp.zeros(6 * h)},
    }


def init_dit_params(key, dims: DiTDims) -> dict:
    ks = jax.random.split(key, 8)
    h = dims.hidden_size
    block_keys = jax.random.split(ks[0], dims.depth)
    return {
        "context_embed": _dense(
            ks[1], dims.in_channels * dims.freq_size + dims.context_size, h, std=0.02),
        "t_mlp1": _dense(ks[2], dims.t_freq_size, h, std=0.02),
        "t_mlp2": _dense(ks[3], h, h, std=0.02),
        "y_mlp1": _dense(ks[4], dims.class_size, h, std=0.02),
        "y_mlp2": _dense(ks[5], h, h, std=0.02),
        "blocks": jax.vmap(lambda k: _init_block(k, dims))(block_keys),
        "final_ada": {"w": jnp.zeros((h, 2 * h)), "b": jnp.zeros(2 * h)},
        "final": {"w": jnp.zeros((h, dims.out_channels)),
                  "b": jnp.zeros(dims.out_channels)},
    }


def _lin(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _ln_noaffine(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def banded_attention_mask(seq_len: int, width: int) -> np.ndarray:
    """(T, T) bool mask: attend within +-width positions
    (reference diffusion_pipeline.py:146-148)."""
    idx = np.arange(seq_len)
    return np.abs(idx[:, None] - idx[None, :]) <= width


def dit_forward(params, dims: DiTDims, x: jnp.ndarray, t: jnp.ndarray,
                c: jnp.ndarray, y: jnp.ndarray, *,
                attn_mask: Optional[jnp.ndarray] = None,
                dtype=jnp.float32) -> jnp.ndarray:
    """x (N, T, C) positions in [0,1]; t (N,) timesteps; c (N, T, E) context;
    y (N, class_size) class vector -> (N, T, out_channels)."""
    n, seq, _ = x.shape
    x_freq = sinusoidal_embedding(x * 512.0, dims.freq_size).reshape(n, seq, -1)
    h = _lin(jnp.concatenate([x_freq.astype(dtype), c.astype(dtype)], axis=-1),
             params["context_embed"])

    t_emb = _lin(jax.nn.silu(_lin(sinusoidal_embedding(t, dims.t_freq_size).astype(dtype),
                                  params["t_mlp1"])), params["t_mlp2"])
    y_emb = _lin(jax.nn.silu(_lin(y.astype(dtype), params["y_mlp1"])), params["y_mlp2"])
    cond = t_emb + y_emb  # (N, D)

    mask4 = None
    if attn_mask is not None:
        mask4 = attn_mask[None, None, :, :]

    def block_fn(h, block):
        ada = jax.nn.silu(cond) @ block["ada"]["w"].astype(dtype) + block["ada"]["b"].astype(dtype)
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(ada, 6, axis=-1)
        mod = _modulate(_ln_noaffine(h), shift_msa, scale_msa)
        qkv = _lin(mod, block["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = dot_product_attention(
            split_heads(q, dims.num_heads), split_heads(k, dims.num_heads),
            split_heads(v, dims.num_heads), mask=mask4)
        h = h + gate_msa[:, None, :] * _lin(merge_heads(attn), block["proj"])
        mod2 = _modulate(_ln_noaffine(h), shift_mlp, scale_mlp)
        mlp = _lin(jax.nn.gelu(_lin(mod2, block["mlp1"]), approximate=True),
                   block["mlp2"])
        h = h + gate_mlp[:, None, :] * mlp
        return h, None

    h, _ = jax.lax.scan(block_fn, h, params["blocks"])
    ada = (jax.nn.silu(cond) @ params["final_ada"]["w"].astype(dtype)
           + params["final_ada"]["b"].astype(dtype))
    shift, scale = jnp.split(ada, 2, axis=-1)
    h = _modulate(_ln_noaffine(h), shift, scale)
    return _lin(h, params["final"]).astype(jnp.float32)


def dit_forward_cfg(params, dims: DiTDims, x, t, c, y, cfg_scale: float, *,
                    attn_mask=None, dtype=jnp.float32) -> jnp.ndarray:
    """Dual-batch CFG: rows [0:N/2] conditional, [N/2:N] unconditional share
    the SAME x (reference models.py:301 forward_with_cfg). Guidance applies
    to the epsilon channels only; variance channels pass through."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = dit_forward(params, dims, combined, t, c, y, attn_mask=attn_mask,
                      dtype=dtype)
    eps, rest = out[..., :dims.in_channels], out[..., dims.in_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps_full = jnp.concatenate([guided, guided], axis=0)
    return jnp.concatenate([eps_full, rest], axis=-1)
