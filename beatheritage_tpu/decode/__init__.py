"""Jitted autoregressive decode engine: KV cache, CFG, constrained sampling."""

from .engine import SamplerSettings, decoder_cached_forward, generate
from .kv_cache import init_self_cache, precompute_cross_kv
from .tables import TokenTables

__all__ = [
    "SamplerSettings", "decoder_cached_forward", "generate",
    "init_self_cache", "precompute_cross_kv", "TokenTables",
]
