"""Legacy accelerate-layout checkpoint ingestion (module-rename unpickler).

The reference trainer saves HF-accelerate checkpoint directories whose
tokenizer is a raw pickle — ``custom_checkpoint_0.pkl`` holds
``torch.save(tokenizer.state_dict())``, and that pickle stream references
the event/tokenizer classes by whatever module path the training run used
(several historical layouts exist). The reference loads it with a
module-rename ``pickle.Unpickler`` (reference: routed_pickle.py:5-17) inside
its checkpoint-dir loader (reference: inference.py:462-492).

This is the TPU-repo equivalent: every historical reference module path is
routed to ``beatheritage_tpu.events`` / ``beatheritage_tpu.tokenizer``
(bit-compatible enums and field layouts by design — see
tests/test_tokenizer_golden.py), the unpickled object graph is normalized to
the tokenizer.json schema, and ``load_accelerate_dir`` rebuilds the full
(params, tokenizer) pair from a reference-format directory so a real
reference checkpoint loads end-to-end into a Processor.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Mapping

from ..events import ContextType, EventRange, EventType

# Every module path the reference's pickles have historically used for the
# event/tokenizer classes (reference routed_pickle.py:6-12, plus the current
# in-tree layouts), routed to this package's bit-compatible equivalents.
LOAD_MODULE_MAPPING: dict[str, str] = {
    "osuT5.tokenizer.event": "beatheritage_tpu.events",
    "osuT5.event": "beatheritage_tpu.events",
    "osuT5.osuT5.event": "beatheritage_tpu.events",
    "libs.event": "beatheritage_tpu.events",
    "libs.tokenizer.event": "beatheritage_tpu.events",
    "classifier.libs.tokenizer.event": "beatheritage_tpu.events",
    "rcomplexion.libs.tokenizer.event": "beatheritage_tpu.events",
    "osuT5.tokenizer": "beatheritage_tpu.tokenizer",
    "osuT5.osuT5.tokenizer": "beatheritage_tpu.tokenizer",
    "libs.tokenizer": "beatheritage_tpu.tokenizer",
    "libs.tokenizer.tokenizer": "beatheritage_tpu.tokenizer",
    "classifier.libs.tokenizer.tokenizer": "beatheritage_tpu.tokenizer",
    "rcomplexion.libs.tokenizer.tokenizer": "beatheritage_tpu.tokenizer",
}

# The unpickler only materializes classes from these prefixes. The legit
# content of a tokenizer pickle is enums/dataclasses (routed above), stdlib
# containers, and torch's tensor-rebuild helpers; anything else in the
# stream is unexpected and refused rather than executed.
_ALLOWED_MODULE_PREFIXES = (
    "beatheritage_tpu.",
    "torch",
    "numpy",
    "collections",
    "builtins",
    "copyreg",
    "pathlib",
)


class Unpickler(pickle.Unpickler):
    """Module-rename unpickler (reference routed_pickle.py:5-17), with the
    renames pointed at this package and a module allowlist on top."""

    load_module_mapping: dict[str, str] = LOAD_MODULE_MAPPING

    def find_class(self, mod_name, name):
        mod_name = self.load_module_mapping.get(mod_name, mod_name)
        if not mod_name.startswith(_ALLOWED_MODULE_PREFIXES):
            raise pickle.UnpicklingError(
                f"refusing to unpickle {mod_name}.{name}: not a known "
                "reference checkpoint class")
        return super().find_class(mod_name, name)


# torch.load(..., pickle_module=<module>) uses <module>.Unpickler; expose the
# same surface as the reference's routed_pickle module so this module can be
# passed directly.
load = pickle.load
loads = pickle.loads


def normalize_state(state: Mapping) -> dict:
    """Unpickled tokenizer state -> the tokenizer.json schema.

    The pickle stream yields live enum/dataclass objects (routed to this
    package's classes); ``Tokenizer.load_state_dict`` speaks the JSON form
    (string enum values, EventRange dicts). Handles both, so a state that is
    already JSON-shaped passes through unchanged.
    """
    def key(k):
        return k.value if isinstance(k, (EventType, ContextType)) else k

    def er(x):
        if isinstance(x, EventRange):
            return {"type": x.type.value, "min_value": x.min_value,
                    "max_value": x.max_value}
        return x

    out = dict(state)
    for k in ("event_ranges", "input_event_ranges"):
        if k in out:
            out[k] = [er(x) for x in out[k]]
    for k in ("context_sos", "context_eos", "event_start", "event_end"):
        if k in out:
            out[k] = {key(kk): v for kk, v in out[k].items()}
    if "event_range" in out:
        out["event_range"] = {key(kk): er(v) for kk, v in out["event_range"].items()}
    return out


def load_legacy_tokenizer(pkl_path):
    """Rebuild a Tokenizer from a reference ``custom_checkpoint_0.pkl``
    (torch zipfile serialization of the tokenizer state dict;
    reference inference.py:473-476)."""
    import torch  # noqa: PLC0415

    import beatheritage_tpu.train.routed_pickle as this_module  # noqa: PLC0415
    from ..tokenizer import Tokenizer  # noqa: PLC0415

    state = torch.load(Path(pkl_path), map_location="cpu",
                       pickle_module=this_module, weights_only=False)
    tok = Tokenizer()
    tok.load_state_dict(normalize_state(state))
    return tok


def is_accelerate_layout(path) -> bool:
    """True for the legacy accelerate checkpoint layout the reference's
    loader special-cases (inference.py:474: both files must exist)."""
    path = Path(path)
    return ((path / "pytorch_model.bin").exists()
            and (path / "custom_checkpoint_0.pkl").exists())


def load_accelerate_dir(path, dims=None, cfg=None, backbone: str | None = None,
                        validate: bool = True):
    """(params, tokenizer) from a reference checkpoint directory.

    Mirrors the reference's loader decision (inference.py:462-492): the
    accelerate layout (pytorch_model.bin + custom_checkpoint_0.pkl) takes
    the pickled-tokenizer path; otherwise tokenizer.json via
    ``Tokenizer.from_pretrained``. Weights are converted to this package's
    pytree layout by train/convert.py either way.

    ``dims`` may be omitted if ``cfg`` (a TrainConfig matching the
    checkpoint's architecture) is given — it is derived from the loaded
    tokenizer exactly like the reference derives the model from its config
    + tokenizer (inference.py:481).
    """
    path = Path(path)
    if is_accelerate_layout(path):
        tokenizer = load_legacy_tokenizer(path / "custom_checkpoint_0.pkl")
    else:
        from ..tokenizer import Tokenizer  # noqa: PLC0415
        tokenizer = Tokenizer.from_pretrained(path)
    if dims is None:
        if cfg is None:
            raise ValueError("pass dims or cfg to size the model")
        from ..models import ModelDims  # noqa: PLC0415
        dims = ModelDims.from_config(cfg, tokenizer)
    from .convert import load_reference_checkpoint  # noqa: PLC0415
    params = load_reference_checkpoint(path, dims, backbone=backbone,
                                       validate=validate)
    return params, tokenizer
