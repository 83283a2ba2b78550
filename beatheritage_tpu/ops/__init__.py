"""XLA/Pallas compute ops: mel frontend, attention, rotary embeddings, sampling."""

from .attention import dot_product_attention, merge_heads, split_heads
from .mel import mel_filterbank, mel_from_config, mel_spectrogram
from .rope import apply_rope, rope_cos_sin, rotate_half

__all__ = [
    "dot_product_attention", "merge_heads", "split_heads",
    "mel_filterbank", "mel_from_config", "mel_spectrogram",
    "apply_rope", "rope_cos_sin", "rotate_half",
]
