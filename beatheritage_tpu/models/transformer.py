"""Whisper-style encoder-decoder with RoPE, as pure functions over pytrees.

TPU-native re-design of the reference's Mapperatorinator + RoPEWhisper
backbone (reference: osuT5/osuT5/model/modeling_mapperatorinator.py:42,
custom_transformers/modeling_ropewhisper.py:1115/1277):

- encoder: mel frames (+ broadcast conditioning embeds) -> optional linear
  projection -> conv1(k3) GELU -> conv2(k3, stride 2) GELU -> pre-LN
  transformer layers with rotary self-attention -> final LN
- decoder: external token embedding (input vocab) -> pre-LN layers with
  causal rotary self-attention + cross-attention -> final LN -> lm head
  (output vocab)
- layers are stored stacked (leading layer axis) and applied with lax.scan,
  which keeps compile time flat in depth and XLA fusion-friendly
- incremental decode reuses the same layer weights with a preallocated KV
  cache (see decode.engine)

Weights live in plain nested dicts; bias layout matches Whisper (q/v/out
proj biased, k proj unbiased) to keep PyTorch checkpoint conversion a pure
rename.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention, merge_heads, split_heads
from ..ops.mel import mel_from_config
from ..ops.pallas.flash_attention import flash_attention_fused
from ..ops.rope import apply_rope, rope_cos_sin, rotate_half
from .embedders import (
    apply_difficulty_embedder,
    apply_label_embedder,
    apply_mapper_embedder,
    apply_song_position_embedder,
    init_difficulty_embedder,
    init_label_embedder,
    init_mapper_embedder,
    init_song_position_embedder,
    layer_norm,
)

# torch.nn.RMSNorm's default eps (finfo(float32).eps); the RoPEWhisper
# backbone normalizes with RMSNorm, not LayerNorm (modeling_ropewhisper.py:767)
RMS_EPS = 1.1920928955078125e-07


def _remat_wrap(fn, remat):
    """Apply per-layer gradient checkpointing. remat: False = off, True/'' =
    save-nothing (lowest memory), 'dots' = save MXU outputs and recompute
    only elementwise ops (TrainConfig.remat_policy)."""
    if not remat:
        return fn
    if remat == "dots":
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return jax.checkpoint(fn)


def rms_norm(x, g, eps: float = RMS_EPS):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * g).astype(x.dtype)

LABEL_IGNORE_ID = -100


@dataclasses.dataclass(frozen=True)
class ModelDims:
    """Static model dimensions resolved from (TrainConfig, Tokenizer)."""

    d_model: int
    num_heads: int
    d_ff: int
    encoder_layers: int
    decoder_layers: int
    n_mels: int
    cond_size: int
    cond_dim: int
    vocab_size_in: int
    vocab_size_out: int
    num_classes: int
    num_mappers: int
    rope_theta: float
    max_source_positions: int
    max_target_positions: int
    rope_type: str
    rope_encoder_scaling: float
    rope_decoder_scaling: float
    project_encoder_input: bool
    do_style_embed: bool
    do_difficulty_embed: bool
    do_mapper_embed: bool
    do_song_position_embed: bool
    rhythm_token_start: int
    rhythm_token_end: int
    rhythm_weight: float
    label_smoothing: float

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def encoder_input_dim(self) -> int:
        return self.n_mels + self.cond_size

    @classmethod
    def from_config(cls, cfg, tokenizer) -> "ModelDims":
        from ..events import EventType  # noqa: PLC0415
        a = cfg.model.arch
        return cls(
            d_model=a.d_model, num_heads=a.num_heads, d_ff=a.d_ff,
            encoder_layers=a.encoder_layers, decoder_layers=a.decoder_layers,
            n_mels=cfg.model.spectrogram.n_mels, cond_size=cfg.model.cond_size,
            cond_dim=cfg.model.cond_dim,
            vocab_size_in=tokenizer.vocab_size_in,
            vocab_size_out=tokenizer.vocab_size_out,
            num_classes=tokenizer.num_classes,
            num_mappers=tokenizer.num_mapper_classes,
            rope_theta=a.rope_theta,
            max_source_positions=cfg.data.src_seq_len // 2,
            max_target_positions=cfg.data.tgt_seq_len,
            rope_type=cfg.model.rope_type,
            rope_encoder_scaling=cfg.model.rope_encoder_scaling_factor,
            rope_decoder_scaling=cfg.model.rope_decoder_scaling_factor,
            project_encoder_input=cfg.model.project_encoder_input,
            do_style_embed=cfg.model.do_style_embed,
            do_difficulty_embed=cfg.model.do_difficulty_embed,
            do_mapper_embed=cfg.model.do_mapper_embed,
            do_song_position_embed=cfg.model.do_song_position_embed,
            rhythm_token_start=tokenizer.event_start[EventType.TIME_SHIFT],
            rhythm_token_end=tokenizer.event_end[EventType.TIME_SHIFT],
            rhythm_weight=cfg.data.rhythm_weight,
            label_smoothing=cfg.data.label_smoothing,
        )


# -- initialization -------------------------------------------------------------

def _dense(key, d_in, d_out, std=0.02, bias=True):
    p = {"w": jax.random.normal(key, (d_in, d_out)) * std}
    if bias:
        p["b"] = jnp.zeros(d_out)
    return p


def _ln(d):
    # RMSNorm: gain only (reference RoPEWhisper norms have no bias/centering)
    return {"g": jnp.ones(d)}


def _init_attn(key, d, std, cross=False):
    ks = jax.random.split(key, 4)
    prefix = "x" if cross else ""
    return {
        f"{prefix}q": _dense(ks[0], d, d, std),
        f"{prefix}k": _dense(ks[1], d, d, std, bias=False),
        f"{prefix}v": _dense(ks[2], d, d, std),
        f"{prefix}o": _dense(ks[3], d, d, std),
    }


def _init_encoder_layer(key, dims: ModelDims, std=0.02):
    k_attn, k_ff1, k_ff2 = jax.random.split(key, 3)
    return {
        "ln1": _ln(dims.d_model),
        **_init_attn(k_attn, dims.d_model, std),
        "ln2": _ln(dims.d_model),
        "ff1": _dense(k_ff1, dims.d_model, dims.d_ff, std),
        "ff2": _dense(k_ff2, dims.d_ff, dims.d_model, std),
    }


def _init_decoder_layer(key, dims: ModelDims, std=0.02):
    k_self, k_cross, k_ff1, k_ff2 = jax.random.split(key, 4)
    return {
        "ln1": _ln(dims.d_model),
        **_init_attn(k_self, dims.d_model, std),
        "ln2": _ln(dims.d_model),
        **_init_attn(k_cross, dims.d_model, std, cross=True),
        "ln3": _ln(dims.d_model),
        "ff1": _dense(k_ff1, dims.d_model, dims.d_ff, std),
        "ff2": _dense(k_ff2, dims.d_ff, dims.d_model, std),
    }


def init_params(key, dims: ModelDims, std: float = 0.02) -> dict:
    keys = jax.random.split(key, 12)
    enc_layer_keys = jax.random.split(keys[0], dims.encoder_layers)
    dec_layer_keys = jax.random.split(keys[1], dims.decoder_layers)

    params = {
        "encoder": {
            "conv1": {"w": jax.random.normal(keys[2], (3, dims.d_model if dims.project_encoder_input else dims.encoder_input_dim, dims.d_model)) * std,
                      "b": jnp.zeros(dims.d_model)},
            "conv2": {"w": jax.random.normal(keys[3], (3, dims.d_model, dims.d_model)) * std,
                      "b": jnp.zeros(dims.d_model)},
            "layers": jax.vmap(lambda k: _init_encoder_layer(k, dims, std))(enc_layer_keys),
            "lnf": _ln(dims.d_model),
        },
        "decoder": {
            "layers": jax.vmap(lambda k: _init_decoder_layer(k, dims, std))(dec_layer_keys),
            "lnf": _ln(dims.d_model),
        },
        "dec_embed": jax.random.normal(keys[4], (dims.vocab_size_in, dims.d_model)) * std,
        "lm_head": jax.random.normal(keys[5], (dims.d_model, dims.vocab_size_out)) * std,
        "cond": {},
    }
    if dims.project_encoder_input:
        params["enc_proj"] = _dense(keys[6], dims.encoder_input_dim, dims.d_model, std)
    if dims.do_style_embed:
        params["cond"]["style"] = init_label_embedder(keys[7], dims.num_classes, dims.d_model, std)
    if dims.do_difficulty_embed:
        params["cond"]["difficulty"] = init_difficulty_embedder(keys[8], dims.cond_dim)
    if dims.do_mapper_embed:
        params["cond"]["mapper"] = init_mapper_embedder(keys[9], dims.num_mappers, dims.cond_dim)
    if dims.do_song_position_embed:
        params["cond"]["song_pos"] = init_song_position_embedder(keys[10], dims.cond_dim)
    return params


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
               if hasattr(p, "shape"))


# -- building blocks --------------------------------------------------------------

def _linear(x, p):
    out = x @ p["w"].astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def _conv1d(x, p, stride=1):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + p["b"].astype(x.dtype)


def _rope_fused(x, cos, sin, num_heads):
    """RoPE on the fused (B, T, H*D) layout: per-head rotate-half with the
    (T, D) tables broadcast over heads (minor-dim reshapes are free)."""
    b, t, hd = x.shape
    d = hd // num_heads
    x4 = x.reshape(b, t, num_heads, d)
    rot = x4 * cos[None, :, None, :] + rotate_half(x4) * sin[None, :, None, :]
    return rot.astype(x.dtype).reshape(b, t, hd)


def _self_attention(layer, x, cos, sin, num_heads, *, is_causal, mask=None,
                    use_flash=False):
    qf = _linear(x, layer["q"])
    kf = _linear(x, layer["k"])
    vf = _linear(x, layer["v"])
    if use_flash and mask is None:
        # fused layout: no split/merge transposes, no 64->128 lane padding
        # on the kernel's HBM arrays (ops/pallas/flash_attention.py)
        try:
            out = flash_attention_fused(
                _rope_fused(qf, cos, sin, num_heads),
                _rope_fused(kf, cos, sin, num_heads),
                vf, num_heads, is_causal=is_causal)
            return _linear(out, layer["o"])
        except NotImplementedError:
            pass  # head_dim x heads cannot tile lanes: generic path below
    q, k = apply_rope(split_heads(qf, num_heads), split_heads(kf, num_heads),
                      cos, sin)
    out = dot_product_attention(q, k, split_heads(vf, num_heads),
                                is_causal=is_causal, mask=mask,
                                use_flash=use_flash)
    return _linear(merge_heads(out), layer["o"])


def _ffn(layer, x):
    return _linear(jax.nn.gelu(_linear(x, layer["ff1"]), approximate=False),
                   layer["ff2"])


# -- encoder ---------------------------------------------------------------------

def build_condition_vector(params, dims: ModelDims, batch: int,
                           difficulty=None, mapper_idx=None, song_position=None,
                           dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """Concatenated conditioning embeds (B, cond_size) in declaration order
    (difficulty, mapper, song position), matching the reference's conds list
    (modeling_mapperatorinator.py:149-166). Unknowns default to sentinels."""
    conds = []
    if dims.do_difficulty_embed:
        d = difficulty if difficulty is not None else jnp.full((batch,), -1.0)
        conds.append(apply_difficulty_embedder(params["cond"]["difficulty"], d))
    if dims.do_mapper_embed:
        m = mapper_idx if mapper_idx is not None else jnp.full((batch,), -1, jnp.int32)
        conds.append(apply_mapper_embedder(params["cond"]["mapper"], m))
    if dims.do_song_position_embed:
        sp = song_position if song_position is not None else jnp.zeros((batch, 2))
        conds.append(apply_song_position_embedder(params["cond"]["song_pos"], sp))
    if not conds:
        return None
    return jnp.concatenate(conds, axis=-1).astype(dtype)


def encode(params, dims: ModelDims, cfg, audio: jnp.ndarray, *,
           beatmap_idx=None, difficulty=None, mapper_idx=None,
           song_position=None, dtype=jnp.bfloat16,
           use_flash: bool = False, remat: bool = False) -> jnp.ndarray:
    """Raw audio (B, n_samples) -> encoder hidden states (B, S/2, D)."""
    mel = mel_from_config(audio, cfg.model.spectrogram, dtype=dtype)  # (B,S,M)
    b, s, _ = mel.shape

    feats = [mel]
    if dims.do_style_embed:
        idx = beatmap_idx if beatmap_idx is not None else jnp.full((b,), dims.num_classes, jnp.int32)
        style = apply_label_embedder(params["cond"]["style"], idx).astype(dtype)
        feats.append(jnp.broadcast_to(style[:, None, :], (b, s, style.shape[-1])))
    cond_vec = build_condition_vector(params, dims, b, difficulty, mapper_idx,
                                      song_position, dtype)
    if cond_vec is not None:
        feats.append(jnp.broadcast_to(cond_vec[:, None, :], (b, s, cond_vec.shape[-1])))
    x = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else mel

    if dims.project_encoder_input:
        x = _linear(x, params["enc_proj"])

    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv1"]), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["encoder"]["conv2"], stride=2), approximate=False)

    t_enc = x.shape[1]
    positions = jnp.arange(t_enc)
    cos, sin = rope_cos_sin(
        positions, dims.head_dim, theta=dims.rope_theta, seq_len=t_enc,
        max_position_embeddings=dims.max_source_positions,
        scaling_factor=dims.rope_encoder_scaling, rope_type=dims.rope_type,
        dtype=dtype)

    def layer_fn(h, layer):
        h = h + _self_attention(layer, rms_norm(h, layer["ln1"]["g"]),
                                cos, sin, dims.num_heads, is_causal=False,
                                use_flash=use_flash)
        h = h + _ffn(layer, rms_norm(h, layer["ln2"]["g"]))
        return h, None

    # per-layer remat: store only the 12 layer inputs, recompute the rest in
    # the backward (whole-forward checkpointing still saves every layer's
    # scan residuals simultaneously, which blows HBM at T=8192)
    body = _remat_wrap(layer_fn, remat)
    x, _ = jax.lax.scan(body, x, params["encoder"]["layers"])
    return rms_norm(x, params["encoder"]["lnf"]["g"])


# -- decoder (teacher-forced) -----------------------------------------------------

def decode_train(params, dims: ModelDims, decoder_input_ids: jnp.ndarray,
                 enc_hidden: jnp.ndarray, *,
                 decoder_attention_mask: Optional[jnp.ndarray] = None,
                 encoder_attention_mask: Optional[jnp.ndarray] = None,
                 dtype=jnp.bfloat16, use_flash: bool = False,
                 remat: bool = False, return_hidden: bool = False) -> jnp.ndarray:
    """Teacher-forced decode: token ids (B, T) -> logits (B, T, vocab_out),
    or the pre-head hidden states (B, T, D) with return_hidden (for the
    chunked-loss training path, which applies lm_head per token chunk)."""
    x = params["dec_embed"].astype(dtype)[decoder_input_ids]
    t = x.shape[1]
    cos, sin = rope_cos_sin(
        jnp.arange(t), dims.head_dim, theta=dims.rope_theta, seq_len=t,
        max_position_embeddings=dims.max_target_positions,
        scaling_factor=dims.rope_decoder_scaling, rope_type=dims.rope_type,
        dtype=dtype)

    self_mask = None
    if decoder_attention_mask is not None and not use_flash:
        # With flash attention the padding key-mask is dropped: training
        # batches are right-padded, so under the causal mask real tokens
        # never attend to pad keys — only pad queries do, and their loss is
        # ignored (-100). This keeps the Pallas kernel (which rejects
        # arbitrary masks) usable for the long-sequence training path where
        # XLA's attention backward would materialize (B, H, T, T) scores
        # per layer (154 GB at B=4, T=8192 — far past HBM).
        self_mask = decoder_attention_mask[:, None, None, :].astype(bool)
    cross_mask = None
    if encoder_attention_mask is not None:
        cross_mask = encoder_attention_mask[:, None, None, :].astype(bool)

    enc = enc_hidden.astype(dtype)

    def layer_fn(h, layer):
        h = h + _self_attention(layer, rms_norm(h, layer["ln1"]["g"]),
                                cos, sin, dims.num_heads, is_causal=True,
                                mask=self_mask, use_flash=use_flash)
        hn = rms_norm(h, layer["ln2"]["g"])
        qf = _linear(hn, layer["xq"])
        kf = _linear(enc, layer["xk"])
        vf = _linear(enc, layer["xv"])
        cross = None
        if use_flash and cross_mask is None:
            try:
                cross = _linear(flash_attention_fused(
                    qf, kf, vf, dims.num_heads), layer["xo"])
            except NotImplementedError:
                pass
        if cross is None:
            out4 = dot_product_attention(
                split_heads(qf, dims.num_heads), split_heads(kf, dims.num_heads),
                split_heads(vf, dims.num_heads), mask=cross_mask,
                use_flash=use_flash)
            cross = _linear(merge_heads(out4), layer["xo"])
        h = h + cross
        h = h + _ffn(layer, rms_norm(h, layer["ln3"]["g"]))
        return h, None

    body = _remat_wrap(layer_fn, remat)
    x, _ = jax.lax.scan(body, x, params["decoder"]["layers"])
    x = rms_norm(x, params["decoder"]["lnf"]["g"])
    if return_hidden:
        return x
    return (x @ params["lm_head"].astype(dtype)).astype(jnp.float32)


def decoder_block(dims: ModelDims):
    """One decoder layer as a pipelineable ``block_fn(layer, h, enc, cos,
    sin) -> h`` (plain attention path, no masks) for the GPipe stage split
    in parallel/pipeline.py. Numerically identical to decode_train's scan
    body with use_flash=False and no padding masks."""

    def block(layer, h, enc, cos, sin):
        h = h + _self_attention(layer, rms_norm(h, layer["ln1"]["g"]),
                                cos, sin, dims.num_heads, is_causal=True)
        hn = rms_norm(h, layer["ln2"]["g"])
        out4 = dot_product_attention(
            split_heads(_linear(hn, layer["xq"]), dims.num_heads),
            split_heads(_linear(enc, layer["xk"]), dims.num_heads),
            split_heads(_linear(enc, layer["xv"]), dims.num_heads))
        h = h + _linear(merge_heads(out4), layer["xo"])
        return h + _ffn(layer, rms_norm(h, layer["ln3"]["g"]))

    return block


def forward(params, dims: ModelDims, cfg, audio, decoder_input_ids, *,
            decoder_attention_mask=None, beatmap_idx=None, difficulty=None,
            mapper_idx=None, song_position=None, dtype=jnp.bfloat16,
            use_flash: bool = False, remat: bool = False,
            return_hidden: bool = False) -> jnp.ndarray:
    """Full seq2seq forward: audio + decoder ids -> logits (or pre-head
    hidden states with return_hidden, for the chunked-loss path)."""
    enc = encode(params, dims, cfg, audio, beatmap_idx=beatmap_idx,
                 difficulty=difficulty, mapper_idx=mapper_idx,
                 song_position=song_position, dtype=dtype,
                 use_flash=use_flash, remat=remat)
    return decode_train(params, dims, decoder_input_ids, enc,
                        decoder_attention_mask=decoder_attention_mask,
                        dtype=dtype, use_flash=use_flash, remat=remat,
                        return_hidden=return_hidden)


# -- loss --------------------------------------------------------------------------

def rhythm_class_weights(dims: ModelDims) -> jnp.ndarray:
    w = np.ones(dims.vocab_size_out, dtype=np.float32)
    w[dims.rhythm_token_start:dims.rhythm_token_end] = dims.rhythm_weight
    return jnp.asarray(w)


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: jnp.ndarray,
                           label_smoothing: float = 0.0,
                           sample_weights: Optional[jnp.ndarray] = None
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rhythm-weighted CE with ignore-id masking, matching torch
    nn.CrossEntropyLoss(weight, ignore_index=-100, label_smoothing)
    (reference: modeling_mapperatorinator.py:110-117,188-192).

    Returns (loss, n_valid_tokens). logits (B,T,V) f32, labels (B,T) int.
    """
    loss_sum, n_valid = _wce_sums(logits, labels, class_weights,
                                  label_smoothing, sample_weights)
    # reference divides the weighted sum by the raw count of valid labels
    return loss_sum / jnp.maximum(n_valid, 1), n_valid


def _wce_sums(logits, labels, class_weights, label_smoothing,
              sample_weights):
    """(weighted loss sum, valid-token count) — the chunkable core of
    weighted_cross_entropy."""
    valid = labels != LABEL_IGNORE_ID
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    w_label = class_weights[safe_labels]  # torch weights the NLL by target class
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    loss_tok = w_label * nll
    if label_smoothing > 0.0:
        # torch smooths with the *per-class* weights: (eps/V) * sum_c(-w_c logp_c)
        # (aten cross_entropy_loss_label_smoothing), not the target's weight.
        smooth = -(logp * class_weights).mean(axis=-1)
        loss_tok = (1.0 - label_smoothing) * loss_tok + label_smoothing * smooth
    loss_tok = loss_tok * valid
    if sample_weights is not None:
        loss_tok = loss_tok * sample_weights[:, None]
    return loss_tok.sum(), valid.sum()


def chunked_weighted_cross_entropy(hidden: jnp.ndarray, lm_head: jnp.ndarray,
                                   labels: jnp.ndarray,
                                   class_weights: jnp.ndarray,
                                   label_smoothing: float = 0.0,
                                   sample_weights: Optional[jnp.ndarray] = None,
                                   chunk: int = 512
                                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """weighted_cross_entropy without ever materializing (B, T, V) logits.

    Scans token chunks, projecting through lm_head and reducing the loss per
    chunk under jax.checkpoint (the backward recomputes one chunk's logits
    at a time). At the flagship scale (B=32, T=8192, V=5545) the fused
    logits+CE intermediates were the two largest buffers in the train step
    (5.4 GB f32 + 2.7 GB bf16); chunking caps them at chunk/T of that.
    Numerics match weighted_cross_entropy exactly (same f32 log-softmax,
    same weighted-sum / valid-count division). Returns
    (loss, n_valid_tokens, n_correct) — the argmax-accuracy count comes for
    free inside the chunk, where the caller no longer has logits.
    """
    b, t, d = hidden.shape
    pad = (-t) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=LABEL_IGNORE_ID)
    n_chunks = (t + pad) // chunk
    hid = hidden.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)
    lab = labels.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_fn(carry, xs):
        h, l = xs
        logits = (h @ lm_head.astype(h.dtype)).astype(jnp.float32)
        s, n = _wce_sums(logits, l, class_weights, label_smoothing,
                         sample_weights)
        correct = jnp.sum((jnp.argmax(logits, -1) == l)
                          & (l != LABEL_IGNORE_ID))
        return (carry[0] + s, carry[1] + n,
                carry[2] + correct.astype(jnp.int32)), None

    (loss_sum, n_valid, n_correct), _ = jax.lax.scan(
        chunk_fn, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32),
                   jnp.zeros((), jnp.int32)),
        (hid, lab))
    return loss_sum / jnp.maximum(n_valid, 1), n_valid, n_correct
