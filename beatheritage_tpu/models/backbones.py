"""Backbone registry: one handle per model family.

The reference swaps HF backbones by config name
(modeling_mapperatorinator.py:19 get_backbone_model: google/t5,
OliBomby/nwhisper, Tiger14n/ropewhisper, openai/whisper); here each family
is a triple of pure functions over pytrees. `resolve_backbone` maps our
model-config names (configs/model/*.yaml) to a family, so training and
teacher-forced inference (MaiMod) work for every family the reference
trains. The incremental decode engine (decode/engine.py) is specialized to
the production RoPE family; other families decode teacher-forced or through
`forward` greedy rollout.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass(frozen=True)
class Backbone:
    family: str
    init: Callable            # (key, dims) -> params
    encode: Callable           # (params, dims, cfg, audio, **cond) -> hidden
    decode_train: Callable     # (params, dims, ids, enc_hidden, ...) -> logits
    # called after each optimizer step (weight re-normalization); None = noop
    post_step: Optional[Callable] = None
    # supports the fused incremental decode engine
    incremental_decode: bool = False


def _ropewhisper() -> Backbone:
    from .transformer import decode_train, encode, init_params
    return Backbone("ropewhisper", init_params, encode, decode_train,
                    incremental_decode=True)


def _whisper() -> Backbone:
    from .whisper import (init_whisper_params, whisper_decode_train,
                          whisper_encode)
    return Backbone("whisper", init_whisper_params, whisper_encode,
                    whisper_decode_train)


def _nwhisper() -> Backbone:
    from .ngpt import (init_ngpt_params, ngpt_decode_train, ngpt_encode,
                       normalize_ngpt_params)
    return Backbone("nwhisper", init_ngpt_params, ngpt_encode,
                    ngpt_decode_train, post_step=normalize_ngpt_params)


def _t5() -> Backbone:
    from .t5 import init_t5_params, t5_decode_train, t5_encode
    return Backbone("t5", init_t5_params, t5_encode, t5_decode_train)


_FAMILIES = {
    "ropewhisper": _ropewhisper,
    "whisper": _whisper,
    "nwhisper": _nwhisper,
    "t5": _t5,
}


def family_from_model_name(name: str) -> str:
    """Model-config `name` -> family. Accepts both our shortened names
    ('ropewhisper-small') and the reference HF ids ('Tiger14n/ropewhisper-small')."""
    n = name.lower().rsplit("/", 1)[-1]
    for family in ("ropewhisper", "nwhisper", "whisper", "t5"):
        if n.startswith(family):
            return family
    raise ValueError(f"cannot resolve backbone family from model name {name!r}")


def resolve_backbone(name_or_family: str) -> Backbone:
    family = (name_or_family if name_or_family in _FAMILIES
              else family_from_model_name(name_or_family))
    return _FAMILIES[family]()
