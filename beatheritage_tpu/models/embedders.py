"""Metadata-conditioning embedders (pure pytree params + apply fns).

Replaces the reference's nn.Module embedders
(reference: modeling_mapperatorinator.py:386 LabelEmbedder, :403
DifficultyEmbedder (gaussian RBF basis), :460 MapperStyleEmbedder, :520
SongPositionEmbedder (start/end RBF)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _linear_init(key, d_in, d_out, gain=0.1):
    # xavier-uniform with reduced gain, as the reference uses for cond MLPs
    limit = gain * np.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(key, (d_in, d_out), jnp.float32, -limit, limit)


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b
    return out.astype(x.dtype)


# -- label / style -------------------------------------------------------------

def init_label_embedder(key, num_classes: int, hidden_size: int, std: float = 0.02):
    return {"table": jax.random.normal(key, (num_classes + 1, hidden_size)) * std}


def apply_label_embedder(params, labels: jnp.ndarray) -> jnp.ndarray:
    return params["table"][labels]


# -- difficulty (RBF basis -> 2-layer MLP) ------------------------------------

def init_difficulty_embedder(key, hidden_size: int = 64, num_basis: int = 8):
    k1, k2 = jax.random.split(key)
    return {
        "centers": jnp.linspace(0.0, 1.0, num_basis),
        "widths": jnp.full((num_basis,), 0.1),
        "w1": _linear_init(k1, num_basis, hidden_size),
        "b1": jnp.zeros(hidden_size),
        "ln1_g": jnp.ones(hidden_size), "ln1_b": jnp.zeros(hidden_size),
        "w2": _linear_init(k2, hidden_size, hidden_size),
        "b2": jnp.zeros(hidden_size),
        "ln2_g": jnp.ones(hidden_size), "ln2_b": jnp.zeros(hidden_size),
    }


def _rbf(x: jnp.ndarray, centers: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    d = x[..., None] - centers
    return jnp.exp(-(d * d) / (2.0 * widths * widths))


def apply_difficulty_embedder(params, difficulty: jnp.ndarray,
                              max_difficulty: float = 10.0) -> jnp.ndarray:
    """difficulty (B,) float star rating -> (B, hidden)."""
    basis = _rbf(difficulty / max_difficulty, params["centers"], params["widths"])
    h = basis @ params["w1"] + params["b1"]
    h = layer_norm(h, params["ln1_g"], params["ln1_b"])
    h = jax.nn.relu(h)
    h = h @ params["w2"] + params["b2"]
    return layer_norm(h, params["ln2_g"], params["ln2_b"])


# -- mapper style ---------------------------------------------------------------

def init_mapper_embedder(key, num_mappers: int, embedding_dim: int = 64):
    # row num_mappers (the last) is the unknown-mapper default; the count is
    # recovered from the table shape so the pytree stays all-float (an int
    # leaf would break jax.grad over params)
    return {
        "table": jax.random.normal(key, (num_mappers + 1, embedding_dim)) * 0.02,
        "ln_g": jnp.ones(embedding_dim), "ln_b": jnp.zeros(embedding_dim),
    }


def apply_mapper_embedder(params, mapper_ids: jnp.ndarray) -> jnp.ndarray:
    """mapper_ids (B,) int; -1 selects the default-style row."""
    num = params["table"].shape[0] - 1
    ids = jnp.where(mapper_ids == -1, num, mapper_ids)
    ids = jnp.clip(ids, 0, num)
    emb = params["table"][ids]
    return layer_norm(emb, params["ln_g"], params["ln_b"])


# -- song position (start/end RBF) ---------------------------------------------

def init_song_position_embedder(key, hidden_size: int = 64, num_basis: int = 10):
    k1, k2 = jax.random.split(key)
    return {
        "centers": jnp.linspace(0.0, 1.0, num_basis),
        "widths": jnp.full((num_basis,), 0.1),
        "w1": _linear_init(k1, num_basis * 2, hidden_size * 2),
        "b1": jnp.zeros(hidden_size * 2),
        "ln1_g": jnp.ones(hidden_size * 2), "ln1_b": jnp.zeros(hidden_size * 2),
        "w2": _linear_init(k2, hidden_size * 2, hidden_size),
        "b2": jnp.zeros(hidden_size),
        "ln2_g": jnp.ones(hidden_size), "ln2_b": jnp.zeros(hidden_size),
    }


def apply_song_position_embedder(params, position_range: jnp.ndarray) -> jnp.ndarray:
    """position_range (B, 2): normalized [start, end] of the window -> (B, hidden)."""
    start_b = _rbf(position_range[:, 0], params["centers"], params["widths"])
    end_b = _rbf(position_range[:, 1], params["centers"], params["widths"])
    h = jnp.concatenate([start_b, end_b], axis=-1)
    h = h @ params["w1"] + params["b1"]
    h = layer_norm(h, params["ln1_g"], params["ln1_b"])
    h = jax.nn.relu(h)
    h = h @ params["w2"] + params["b2"]
    return layer_norm(h, params["ln2_g"], params["ln2_b"])
