"""Convert reference PyTorch checkpoints into our parameter pytrees.

The reference's production models are Mapperatorinator wrappers around a
RoPEWhisper backbone saved as HF/accelerate state dicts
(reference: osuT5/osuT5/model/modeling_mapperatorinator.py:42,
custom_transformers/modeling_ropewhisper.py; inference.py:449 load_model).
This converter is a pure renaming/transpose pass — the architectures line
up one to one (conv frontend, pre-LN rotary enc-dec, rotate-half RoPE,
exact GELU, q/v/out biased + k unbiased attention projections), so
reference-trained weights drop into the TPU model for matched-FID
evaluation without retraining.

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


def load_reference_checkpoint(path, dims: ModelDims) -> dict:
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
        return convert_reference_state_dict(sd, dims)
    raise FileNotFoundError(f"no checkpoint file found under {path}")
