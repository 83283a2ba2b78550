"""Model layer: pure-pytree models (Whisper-style enc-dec, DiT, classifier, rcomplexion)."""

from .transformer import (
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

__all__ = [
    "LABEL_IGNORE_ID", "ModelDims", "decode_train", "encode", "forward",
    "init_params", "param_count", "rhythm_class_weights",
    "weighted_cross_entropy",
]
