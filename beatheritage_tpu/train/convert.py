"""Convert reference PyTorch checkpoints into our parameter pytrees.

The reference loads Mapperatorinator wrappers around any of four backbones
(reference: osuT5/osuT5/model/modeling_mapperatorinator.py:19
get_backbone_model; inference.py:449 load_model):

- ``Tiger14n/ropewhisper-*`` (v30/v31/BeatHeritage-V1) ->
  `convert_reference_state_dict` -> models/transformer.py pytree
- ``openai/whisper-*`` (v19-v26, v28, v29) ->
  `convert_whisper_state_dict` -> models/whisper.py pytree
- ``OliBomby/nwhisper-*`` (v27) ->
  `convert_nwhisper_state_dict` -> models/ngpt.py pytree
- ``google/t5-*`` (legacy) -> `convert_t5_state_dict` -> models/t5.py pytree

Each converter is a pure renaming/transpose pass — the JAX architectures
line up one to one — so reference-trained weights drop into the TPU models
for matched-FID evaluation without retraining. `convert_checkpoint`
auto-detects the backbone from state-dict keys and validates every tensor
shape against the model's init template, raising errors that name the
mismatched tensor (instead of a raw dot_general failure deep in jit).

Layout differences handled here:
- torch Linear weight (out, in) -> ours (in, out): transpose
- torch Conv1d weight (out, in, k) -> ours (k, in, out): transpose(2, 1, 0)
- per-layer modules -> stacked (L, ...) arrays for lax.scan
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

from ..models.transformer import ModelDims


def _t(x) -> np.ndarray:
    """torch tensor/ndarray -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"w": _t(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["b"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Mapping, prefix: str) -> dict:
    # RoPEWhisper norms are RMSNorm: gain only (modeling_ropewhisper.py:767)
    return {"g": _t(sd[f"{prefix}.weight"])}


def _stack(dicts: list[dict]) -> dict:
    """List of per-layer param dicts -> dict of stacked arrays."""
    out = {}
    for key in dicts[0]:
        if isinstance(dicts[0][key], dict):
            out[key] = _stack([d[key] for d in dicts])
        else:
            out[key] = np.stack([d[key] for d in dicts])
    return out


def _encoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
        "q": _linear(sd, f"{p}.self_attn.q_proj"),
        "k": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
        "v": _linear(sd, f"{p}.self_attn.v_proj"),
        "o": _linear(sd, f"{p}.self_attn.out_proj"),
        "ln2": _ln(sd, f"{p}.final_layer_norm"),
        "ff1": _linear(sd, f"{p}.fc1"),
        "ff2": _linear(sd, f"{p}.fc2"),
    }


def _decoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
        "q": _linear(sd, f"{p}.self_attn.q_proj"),
        "k": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
        "v": _linear(sd, f"{p}.self_attn.v_proj"),
        "o": _linear(sd, f"{p}.self_attn.out_proj"),
        "ln2": _ln(sd, f"{p}.encoder_attn_layer_norm"),
        "xq": _linear(sd, f"{p}.encoder_attn.q_proj"),
        "xk": _linear(sd, f"{p}.encoder_attn.k_proj", bias=False),
        "xv": _linear(sd, f"{p}.encoder_attn.v_proj"),
        "xo": _linear(sd, f"{p}.encoder_attn.out_proj"),
        "ln3": _ln(sd, f"{p}.final_layer_norm"),
        "ff1": _linear(sd, f"{p}.fc1"),
        "ff2": _linear(sd, f"{p}.fc2"),
    }


def _mlp_cond(sd: Mapping, prefix: str, seq_name: str) -> dict:
    """RBF-conditioned MLP embedders (difficulty_proj / position_proj are
    Sequential(Linear, LayerNorm, ReLU, Dropout, Linear, LayerNorm))."""
    return {
        "centers": _t(sd[f"{prefix}.basis_centers"]),
        "widths": _t(sd[f"{prefix}.basis_widths"]),
        "w1": _t(sd[f"{prefix}.{seq_name}.0.weight"]).T,
        "b1": _t(sd[f"{prefix}.{seq_name}.0.bias"]),
        "ln1_g": _t(sd[f"{prefix}.{seq_name}.1.weight"]),
        "ln1_b": _t(sd[f"{prefix}.{seq_name}.1.bias"]),
        "w2": _t(sd[f"{prefix}.{seq_name}.4.weight"]).T,
        "b2": _t(sd[f"{prefix}.{seq_name}.4.bias"]),
        "ln2_g": _t(sd[f"{prefix}.{seq_name}.5.weight"]),
        "ln2_b": _t(sd[f"{prefix}.{seq_name}.5.bias"]),
    }


def convert_reference_state_dict(sd: Mapping, dims: ModelDims) -> dict:
    """Reference Mapperatorinator state_dict -> our parameter pytree."""
    enc = "transformer.model.encoder"
    dec = "transformer.model.decoder"
    if f"{enc}.conv1.weight" not in sd and "model.encoder.conv1.weight" in sd:
        enc, dec = "model.encoder", "model.decoder"

    params: dict = {
        "encoder": {
            "conv1": {"w": _t(sd[f"{enc}.conv1.weight"]).transpose(2, 1, 0),
                      "b": _t(sd[f"{enc}.conv1.bias"])},
            "conv2": {"w": _t(sd[f"{enc}.conv2.weight"]).transpose(2, 1, 0),
                      "b": _t(sd[f"{enc}.conv2.bias"])},
            "layers": _stack([_encoder_layer(sd, f"{enc}.layers.{i}")
                              for i in range(dims.encoder_layers)]),
            "lnf": _ln(sd, f"{enc}.layer_norm"),
        },
        "decoder": {
            "layers": _stack([_decoder_layer(sd, f"{dec}.layers.{i}")
                              for i in range(dims.decoder_layers)]),
            "lnf": _ln(sd, f"{dec}.layer_norm"),
        },
        "cond": {},
    }

    if "decoder_embedder.weight" in sd:
        params["dec_embed"] = _t(sd["decoder_embedder.weight"])
    else:
        params["dec_embed"] = _t(sd[f"{dec}.embed_tokens.weight"])

    for head_key in ("transformer.proj_out.weight", "proj_out.weight",
                     "transformer.lm_head.weight", "lm_head.weight"):
        if head_key in sd:
            params["lm_head"] = _t(sd[head_key]).T
            break
    else:
        # tied embeddings: output head shares the decoder embedding
        params["lm_head"] = params["dec_embed"][:dims.vocab_size_out].T

    if "encoder_embedder.weight" in sd:
        params["enc_proj"] = _linear(sd, "encoder_embedder")
    if "style_embedder.embedding_table.weight" in sd:
        params["cond"]["style"] = {"table": _t(sd["style_embedder.embedding_table.weight"])}
    if "difficulty_embedder.basis_centers" in sd:
        params["cond"]["difficulty"] = _mlp_cond(sd, "difficulty_embedder",
                                                 "difficulty_proj")
    if "mapper_embedder.embedding.weight" in sd:
        params["cond"]["mapper"] = {
            "table": _t(sd["mapper_embedder.embedding.weight"]),
            "ln_g": _t(sd["mapper_embedder.layer_norm.weight"]),
            "ln_b": _t(sd["mapper_embedder.layer_norm.bias"]),
        }
    if "song_pos_embedder.basis_centers" in sd:
        params["cond"]["song_pos"] = _mlp_cond(sd, "song_pos_embedder",
                                               "position_proj")
    return params


# -- vanilla Whisper (openai/whisper-*, v19-v29 era) ------------------------------

def _ln_bias(sd: Mapping, prefix: str) -> dict:
    """LayerNorm with weight+bias (vanilla Whisper uses nn.LayerNorm)."""
    return {"g": _t(sd[f"{prefix}.weight"]), "b": _t(sd[f"{prefix}.bias"])}


def _whisper_encoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "ln1": _ln_bias(sd, f"{p}.self_attn_layer_norm"),
        "q": _linear(sd, f"{p}.self_attn.q_proj"),
        "k": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
        "v": _linear(sd, f"{p}.self_attn.v_proj"),
        "o": _linear(sd, f"{p}.self_attn.out_proj"),
        "ln2": _ln_bias(sd, f"{p}.final_layer_norm"),
        "ff1": _linear(sd, f"{p}.fc1"),
        "ff2": _linear(sd, f"{p}.fc2"),
    }


def _whisper_decoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "ln1": _ln_bias(sd, f"{p}.self_attn_layer_norm"),
        "q": _linear(sd, f"{p}.self_attn.q_proj"),
        "k": _linear(sd, f"{p}.self_attn.k_proj", bias=False),
        "v": _linear(sd, f"{p}.self_attn.v_proj"),
        "o": _linear(sd, f"{p}.self_attn.out_proj"),
        "ln2": _ln_bias(sd, f"{p}.encoder_attn_layer_norm"),
        "xq": _linear(sd, f"{p}.encoder_attn.q_proj"),
        "xk": _linear(sd, f"{p}.encoder_attn.k_proj", bias=False),
        "xv": _linear(sd, f"{p}.encoder_attn.v_proj"),
        "xo": _linear(sd, f"{p}.encoder_attn.out_proj"),
        "ln3": _ln_bias(sd, f"{p}.final_layer_norm"),
        "ff1": _linear(sd, f"{p}.fc1"),
        "ff2": _linear(sd, f"{p}.fc2"),
    }


def convert_whisper_state_dict(sd: Mapping, dims: ModelDims) -> dict:
    """openai/whisper-* Mapperatorinator state_dict -> models/whisper.py pytree."""
    enc = "transformer.model.encoder"
    dec = "transformer.model.decoder"
    if f"{enc}.conv1.weight" not in sd and "model.encoder.conv1.weight" in sd:
        enc, dec = "model.encoder", "model.decoder"

    params: dict = {
        "encoder": {
            "conv1": {"w": _t(sd[f"{enc}.conv1.weight"]).transpose(2, 1, 0),
                      "b": _t(sd[f"{enc}.conv1.bias"])},
            "conv2": {"w": _t(sd[f"{enc}.conv2.weight"]).transpose(2, 1, 0),
                      "b": _t(sd[f"{enc}.conv2.bias"])},
            "pos": _t(sd[f"{enc}.embed_positions.weight"]),
            "layers": _stack([_whisper_encoder_layer(sd, f"{enc}.layers.{i}")
                              for i in range(dims.encoder_layers)]),
            "lnf": _ln_bias(sd, f"{enc}.layer_norm"),
        },
        "decoder": {
            "pos": _t(sd[f"{dec}.embed_positions.weight"]),
            "layers": _stack([_whisper_decoder_layer(sd, f"{dec}.layers.{i}")
                              for i in range(dims.decoder_layers)]),
            "lnf": _ln_bias(sd, f"{dec}.layer_norm"),
        },
        "cond": {},
    }

    if "decoder_embedder.weight" in sd:  # wrapper embed_decoder_input
        params["dec_embed"] = _t(sd["decoder_embedder.weight"])
    else:
        params["dec_embed"] = _t(sd[f"{dec}.embed_tokens.weight"])

    for head_key in ("transformer.proj_out.weight", "proj_out.weight"):
        if head_key in sd:
            params["lm_head"] = _t(sd[head_key]).T
            break
    else:  # tied embeddings
        params["lm_head"] = params["dec_embed"][:dims.vocab_size_out].T

    if "encoder_embedder.weight" in sd:
        params["enc_proj"] = _linear(sd, "encoder_embedder")
    _convert_wrapper_conds(sd, params)
    return params


def _convert_wrapper_conds(sd: Mapping, params: dict) -> None:
    """Shared Mapperatorinator conditioning embedders (wrapper level)."""
    if "style_embedder.embedding_table.weight" in sd:
        params["cond"]["style"] = {"table": _t(sd["style_embedder.embedding_table.weight"])}
    if "difficulty_embedder.basis_centers" in sd:
        params["cond"]["difficulty"] = _mlp_cond(sd, "difficulty_embedder",
                                                 "difficulty_proj")
    if "mapper_embedder.embedding.weight" in sd:
        params["cond"]["mapper"] = {
            "table": _t(sd["mapper_embedder.embedding.weight"]),
            "ln_g": _t(sd["mapper_embedder.layer_norm.weight"]),
            "ln_b": _t(sd["mapper_embedder.layer_norm.bias"]),
        }
    if "song_pos_embedder.basis_centers" in sd:
        params["cond"]["song_pos"] = _mlp_cond(sd, "song_pos_embedder",
                                               "position_proj")


# -- NWhisper (OliBomby/nwhisper-*, v27) -------------------------------------------

def _l2norm_np(w: np.ndarray, axis: int) -> np.ndarray:
    n = np.sqrt((w * w).sum(axis=axis, keepdims=True))
    return w / np.maximum(n, 1e-12)


def _norm_linear_w(sd: Mapping, prefix: str, *, norm_dim_in=True,
                   bias=False, transpose=True) -> dict:
    """NormLinear weight: plain (`manual_norm_weights=true`, the production
    nwhisper config) or parametrized (`.parametrizations.weight.original`).
    Either way the effective weight is the l2-normalized one
    (modeling_nwhisper.py:176-218), normalized along the input axis per
    output (norm_dim_in) or the output axis (out_proj/fc2)."""
    for key in (f"{prefix}.linear.weight",
                f"{prefix}.linear.parametrizations.weight.original",
                f"{prefix}.weight"):
        if key in sd:
            w = _t(sd[key])  # torch (out, in)
            break
    else:
        raise KeyError(f"NormLinear weight not found under '{prefix}' "
                       f"(tried .linear.weight / .linear.parametrizations."
                       f"weight.original / .weight)")
    w = _l2norm_np(w, axis=-1 if norm_dim_in else 0)
    out = {"w": w.T if transpose else w}
    if bias:
        bkey = f"{prefix}.linear.bias"
        if bkey in sd:
            out["b"] = _t(sd[bkey])
        else:
            out["b"] = np.zeros(w.shape[0], dtype=np.float32)
    return out


def _norm_embedding_w(sd: Mapping, prefix: str) -> np.ndarray:
    for key in (f"{prefix}.embedding.weight",
                f"{prefix}.embedding.parametrizations.weight.original",
                f"{prefix}.weight"):
        if key in sd:
            return _l2norm_np(_t(sd[key]), axis=-1)
    raise KeyError(f"NormEmbedding weight not found under '{prefix}'")


def _scale_p(sd: Mapping, prefix: str) -> dict:
    return {"s": _t(sd[f"{prefix}.scale"])}


def _nwhisper_attn(sd: Mapping, p: str, prefix: str = "") -> dict:
    return {
        f"{prefix}q": _norm_linear_w(sd, f"{p}.q_proj", bias=True),
        f"{prefix}k": _norm_linear_w(sd, f"{p}.k_proj"),
        f"{prefix}v": _norm_linear_w(sd, f"{p}.v_proj", bias=True),
        f"{prefix}o": _norm_linear_w(sd, f"{p}.out_proj", norm_dim_in=False,
                                     bias=True),
        f"{prefix}sqk": _scale_p(sd, f"{p}.qk_scale"),
    }


def _nwhisper_encoder_layer(sd: Mapping, p: str) -> dict:
    return {
        **_nwhisper_attn(sd, f"{p}.attn_with_residual.fn"),
        "alpha_attn": _scale_p(sd, f"{p}.attn_with_residual.branch_scale"),
        "ff1": _norm_linear_w(sd, f"{p}.ff_with_residual.fn.fc1"),
        "ff2": _norm_linear_w(sd, f"{p}.ff_with_residual.fn.fc2",
                              norm_dim_in=False),
        "alpha_mlp": _scale_p(sd, f"{p}.ff_with_residual.branch_scale"),
    }


def _nwhisper_decoder_layer(sd: Mapping, p: str) -> dict:
    return {
        **_nwhisper_attn(sd, f"{p}.self_attn_with_residual.fn"),
        "alpha_attn": _scale_p(sd, f"{p}.self_attn_with_residual.branch_scale"),
        **_nwhisper_attn(sd, f"{p}.encoder_attn_with_residual.fn", prefix="x"),
        "alpha_cross": _scale_p(sd, f"{p}.encoder_attn_with_residual.branch_scale"),
        "ff1": _norm_linear_w(sd, f"{p}.ff_with_residual.fn.fc1"),
        "ff2": _norm_linear_w(sd, f"{p}.ff_with_residual.fn.fc2",
                              norm_dim_in=False),
        "alpha_mlp": _scale_p(sd, f"{p}.ff_with_residual.branch_scale"),
    }


def convert_nwhisper_state_dict(sd: Mapping, dims: ModelDims) -> dict:
    """OliBomby/nwhisper-* Mapperatorinator state_dict -> models/ngpt.py pytree."""
    enc = "transformer.model.encoder"
    dec = "transformer.model.decoder"
    top = "transformer"
    if f"{enc}.conv1.weight" not in sd and "model.encoder.conv1.weight" in sd:
        enc, dec, top = "model.encoder", "model.decoder", ""
    topdot = f"{top}." if top else ""

    params: dict = {
        "encoder": {
            "conv1": {"w": _t(sd[f"{enc}.conv1.weight"]).transpose(2, 1, 0),
                      "b": _t(sd[f"{enc}.conv1.bias"])},
            "conv2": {"w": _t(sd[f"{enc}.conv2.weight"]).transpose(2, 1, 0),
                      "b": _t(sd[f"{enc}.conv2.bias"])},
            "pos": _t(sd[f"{enc}.embed_positions.weight"]),
            "alpha_pos": _scale_p(sd, f"{enc}.alpha_positions"),
            "layers": _stack([_nwhisper_encoder_layer(sd, f"{enc}.layers.{i}")
                              for i in range(dims.encoder_layers)]),
        },
        "decoder": {
            "pos": _t(sd[f"{dec}.embed_positions.weight"]),
            "alpha_pos": _scale_p(sd, f"{dec}.alpha_positions"),
            "layers": _stack([_nwhisper_decoder_layer(sd, f"{dec}.layers.{i}")
                              for i in range(dims.decoder_layers)]),
        },
        "dec_embed": _norm_embedding_w(sd, f"{dec}.embed_tokens"),
        "lm_head": _norm_linear_w(sd, f"{topdot}proj_out")["w"],
        "sz": _scale_p(sd, f"{topdot}logit_scale"),
        "cond": {},
    }
    if "encoder_embedder.weight" in sd:
        params["enc_proj"] = _linear(sd, "encoder_embedder")
    _convert_wrapper_conds(sd, params)
    return params


# -- nanoT5 (google/t5-*, legacy configs) ------------------------------------------

def _t5_attn(sd: Mapping, p: str, prefix: str = "") -> dict:
    return {
        f"{prefix}q": {"w": _t(sd[f"{p}.q.weight"]).T},
        f"{prefix}k": {"w": _t(sd[f"{p}.k.weight"]).T},
        f"{prefix}v": {"w": _t(sd[f"{p}.v.weight"]).T},
        f"{prefix}o": {"w": _t(sd[f"{p}.o.weight"]).T},
    }


def _t5_encoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "ln1": _ln(sd, f"{p}.layer.0.layer_norm"),
        **_t5_attn(sd, f"{p}.layer.0.SelfAttention"),
        "ln2": _ln(sd, f"{p}.layer.1.layer_norm"),
        "wi0": {"w": _t(sd[f"{p}.layer.1.DenseReluDense.wi_0.weight"]).T},
        "wi1": {"w": _t(sd[f"{p}.layer.1.DenseReluDense.wi_1.weight"]).T},
        "wo": {"w": _t(sd[f"{p}.layer.1.DenseReluDense.wo.weight"]).T},
    }


def _t5_decoder_layer(sd: Mapping, p: str) -> dict:
    return {
        "ln1": _ln(sd, f"{p}.layer.0.layer_norm"),
        **_t5_attn(sd, f"{p}.layer.0.SelfAttention"),
        "ln3": _ln(sd, f"{p}.layer.1.layer_norm"),
        **_t5_attn(sd, f"{p}.layer.1.EncDecAttention", prefix="x"),
        "ln2": _ln(sd, f"{p}.layer.2.layer_norm"),
        "wi0": {"w": _t(sd[f"{p}.layer.2.DenseReluDense.wi_0.weight"]).T},
        "wi1": {"w": _t(sd[f"{p}.layer.2.DenseReluDense.wi_1.weight"]).T},
        "wo": {"w": _t(sd[f"{p}.layer.2.DenseReluDense.wo.weight"]).T},
    }


def convert_t5_state_dict(sd: Mapping, dims: ModelDims) -> dict:
    """google/t5-* (nanoT5 fork) state_dict -> models/t5.py pytree.

    Matches reference custom_transformers/t5.py:472 T5 (relative bias on
    block 0 only, shared across the stack; gated-GELU FF; untied head)."""
    top = "transformer." if "transformer.encoder_embedder.weight" in sd else ""

    def pfx(name):
        return f"{top}{name}"

    params: dict = {
        "enc_proj": _linear(sd, pfx("encoder_embedder")),
        "encoder": {
            "layers": _stack([_t5_encoder_layer(sd, pfx(f"encoder.block.{i}"))
                              for i in range(dims.encoder_layers)]),
            "lnf": _ln(sd, pfx("encoder.final_layer_norm")),
            "rel_bias": _t(sd[pfx(
                "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")]),
        },
        "decoder": {
            "layers": _stack([_t5_decoder_layer(sd, pfx(f"decoder.block.{i}"))
                              for i in range(dims.decoder_layers)]),
            "lnf": _ln(sd, pfx("decoder.final_layer_norm")),
            "rel_bias": _t(sd[pfx(
                "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")]),
        },
        "dec_embed": _t(sd[pfx("decoder_embedder.weight")]),
        "lm_head": _t(sd[pfx("lm_head.weight")]).T,
    }
    return params


# -- dispatch + validation ----------------------------------------------------------

BACKBONE_CONVERTERS = {
    "ropewhisper": convert_reference_state_dict,
    "whisper": convert_whisper_state_dict,
    "nwhisper": convert_nwhisper_state_dict,
    "t5": convert_t5_state_dict,
}


def detect_backbone(sd: Mapping) -> str:
    """Infer the backbone family from state-dict keys (reference
    get_backbone_model name prefixes, modeling_mapperatorinator.py:19)."""
    keys = set(sd)

    def any_end(suffix):
        return any(k.endswith(suffix) for k in keys)

    if any_end("logit_scale.scale") or any_end("alpha_positions.scale"):
        return "nwhisper"
    if any_end("DenseReluDense.wi_0.weight") or any_end("encoder.block.0.layer.0.layer_norm.weight"):
        return "t5"
    # both whisper variants share conv frontends; vanilla has LayerNorm
    # *biases* and encoder position embeddings, RoPEWhisper (RMSNorm) has
    # neither
    if (any_end("encoder.embed_positions.weight")
            or any_end("self_attn_layer_norm.bias")):
        return "whisper"
    if any_end("conv1.weight"):
        return "ropewhisper"
    raise ValueError(
        "cannot detect backbone family from state dict keys; expected "
        "Mapperatorinator weights for one of: ropewhisper (v30/v31/BH-v1), "
        "whisper (v19-v29), nwhisper (v27), t5 (legacy). "
        f"Sample keys: {sorted(keys)[:5]}")


def backbone_from_name(name: str) -> str:
    """Reference config `model.name` -> backbone family
    (modeling_mapperatorinator.py:20-35)."""
    lowered = name.lower()
    if lowered.startswith("google/t5"):
        return "t5"
    if lowered.startswith("olibomby/nwhisper"):
        return "nwhisper"
    if lowered.startswith("tiger14n/ropewhisper"):
        return "ropewhisper"
    if lowered.startswith("openai/whisper"):
        return "whisper"
    raise ValueError(f"unknown backbone model name: {name!r}")


def init_fn_for_backbone(backbone: str):
    if backbone == "ropewhisper":
        from ..models.transformer import init_params
        return init_params
    if backbone == "whisper":
        from ..models.whisper import init_whisper_params
        return init_whisper_params
    if backbone == "nwhisper":
        from ..models.ngpt import init_ngpt_params
        return init_ngpt_params
    if backbone == "t5":
        from ..models.t5 import init_t5_params
        return init_t5_params
    raise ValueError(f"unknown backbone: {backbone!r}")


def validate_converted_params(params: dict, dims: ModelDims,
                              backbone: str) -> None:
    """Compare every converted tensor's shape against the model's init
    template; raise one error naming every mismatched/missing tensor
    (instead of a raw dot_general shape error deep inside jit)."""
    import jax

    init = init_fn_for_backbone(backbone)
    template = jax.eval_shape(lambda: init(jax.random.PRNGKey(0), dims))

    def flatten(tree, prefix=""):
        out = {}
        if isinstance(tree, Mapping):
            for k, v in tree.items():
                out.update(flatten(v, f"{prefix}.{k}" if prefix else str(k)))
        else:
            out[prefix] = tuple(tree.shape) if hasattr(tree, "shape") else None
        return out

    got = flatten(params)
    want = flatten(template)
    problems = []
    for name, shape in sorted(want.items()):
        if name not in got:
            # conditioning embedders are optional wrapper-level extras
            if name.startswith("cond."):
                continue
            problems.append(f"missing tensor {name!r} (expected shape {shape})")
        elif got[name] != shape:
            problems.append(f"shape mismatch for {name!r}: checkpoint has "
                            f"{got[name]}, model expects {shape}")
    for name in sorted(set(got) - set(want)):
        if not name.startswith("cond."):
            problems.append(f"unexpected tensor {name!r} with shape {got[name]}"
                            " (not part of the model)")
    if problems:
        raise ValueError(
            f"converted {backbone} checkpoint does not fit the configured "
            f"model dims (d_model={dims.d_model}, layers="
            f"{dims.encoder_layers}/{dims.decoder_layers}, vocab="
            f"{dims.vocab_size_in}/{dims.vocab_size_out}):\n  "
            + "\n  ".join(problems))


def convert_checkpoint(sd: Mapping, dims: ModelDims,
                       backbone: str | None = None,
                       validate: bool = True) -> tuple[dict, str]:
    """Convert any reference Mapperatorinator state dict; returns
    (params, backbone). Auto-detects the backbone when not given."""
    backbone = backbone or detect_backbone(sd)
    if backbone not in BACKBONE_CONVERTERS:
        raise ValueError(f"unknown backbone {backbone!r}; expected one of "
                         f"{sorted(BACKBONE_CONVERTERS)}")
    try:
        params = BACKBONE_CONVERTERS[backbone](sd, dims)
    except KeyError as e:
        raise KeyError(
            f"state dict is missing tensor {e.args[0]!r} required by the "
            f"{backbone} converter — wrong backbone family or a truncated "
            "checkpoint") from e
    if validate:
        validate_converted_params(params, dims, backbone)
    return params, backbone


def load_reference_checkpoint(path, dims: ModelDims,
                              backbone: str | None = None,
                              validate: bool = True) -> dict:
    """Load pytorch_model.bin / model.safetensors from a reference checkpoint
    directory (inference.py:462-492 layouts) and convert."""
    path = Path(path)
    candidates = ([path] if path.is_file()
                  else [path / "pytorch_model.bin", path / "model.safetensors"])
    for file in candidates:
        if not file.exists():
            continue
        if file.suffix == ".safetensors":
            from safetensors.numpy import load_file  # noqa: PLC0415
            sd = load_file(file)
        else:
            import torch  # noqa: PLC0415
            sd = torch.load(file, map_location="cpu", weights_only=True)
        params, _ = convert_checkpoint(sd, dims, backbone=backbone,
                                       validate=validate)
        return params
    raise FileNotFoundError(f"no checkpoint file found under {path}")


def main(argv=None) -> int:
    """CLI: convert a reference PyTorch checkpoint to an orbax params dir.

    python -m beatheritage_tpu.train.convert --ckpt <dir|file> \
        --config v30 --out /path/to/ckpt_dir [--backbone ropewhisper]
    """
    import argparse  # noqa: PLC0415

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True,
                    help="reference checkpoint dir (pytorch_model.bin / "
                         "model.safetensors) or file")
    ap.add_argument("--config", default="v30",
                    help="train config whose dims match the checkpoint")
    ap.add_argument("--out", required=True, help="orbax output directory")
    ap.add_argument("--backbone", default=None,
                    help="ropewhisper|nwhisper|t5|whisper (auto-detected)")
    ap.add_argument("--no-validate", action="store_true")
    ns = ap.parse_args(argv)

    from ..config import TrainConfig, load_config  # noqa: PLC0415
    from ..models import ModelDims  # noqa: PLC0415
    from ..tokenizer import Tokenizer  # noqa: PLC0415
    from .checkpoints import save_params  # noqa: PLC0415

    cfg = load_config(TrainConfig, "train", ns.config)
    tokenizer = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tokenizer)
    params = load_reference_checkpoint(ns.ckpt, dims, backbone=ns.backbone,
                                       validate=not ns.no_validate)
    save_params(ns.out, params)
    tokenizer.save_pretrained(ns.out)
    print(f"converted {ns.ckpt} -> {ns.out}")
    return 0


if __name__ == "__main__":
    import sys as _sys

    _sys.exit(main())
