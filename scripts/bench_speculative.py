"""Speculative-decode A/B on the real chip (VERDICT r4 item 2: prove or
retire).

Measures the lookup-draft speculative engine (`decode/speculative.py`,
exact-acceptance design: greedy streams bit-identical to the plain engine)
against `engine.generate` at the single-song latency batch (B=6 parallel
windows) and optionally the serving batch. Reports tok/s for both and the
speedup; the shipped preset only turns `speculative_k` on if this records a
win (reference surface being replaced: the per-token HF loop,
osuT5 server.py:97-104).

Usage: python scripts/bench_speculative.py [--windows 6] [--budget 2048]
       [--draft-k 7] [--out BENCH_SPEC_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/beatheritage_tpu/xla_bench"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--draft-k", type=int, default=7)
    ap.add_argument("--config", default="beatheritage_v1")
    ap.add_argument("--out", default="BENCH_SPEC_r05.json")
    ns = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.decode import SamplerSettings, TokenTables
    from beatheritage_tpu.decode.aot import aot_call, default_cache_dir
    from beatheritage_tpu.decode.engine import generate as engine_generate
    from beatheritage_tpu.decode.speculative import generate_speculative
    from beatheritage_tpu.events import ContextType
    from beatheritage_tpu.models import ModelDims, encode, init_params
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", ns.config)
    tokenizer = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tokenizer)
    params = init_params(jax.random.PRNGKey(0), dims)
    tables = TokenTables.from_tokenizer(tokenizer)

    b = ns.windows
    n_samples = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, n_samples)), jnp.float32)
    prompt_len = 64
    prompt = np.full((b, prompt_len), tokenizer.pad_id, np.int32)
    prompt[:, -2] = tokenizer.sos_id
    prompt[:, -1] = tokenizer.context_sos[ContextType.TIMING]
    mask = prompt != tokenizer.pad_id
    max_len = prompt_len + ns.budget

    settings = SamplerSettings(
        temperature=0.85, top_p=0.92, top_k=50, repetition_penalty=1.1,
        timing_temperature=0.1, types_first=cfg.data.types_first,
        do_sample=True)
    eos_mask = jnp.asarray(tables.eos_token_mask())
    enc_fn = jax.jit(lambda p, a: encode(p, dims, cfg, a, dtype=jnp.bfloat16))
    enc_hidden = enc_fn(params, audio)
    aot_dir = default_cache_dir()

    def run_plain(key):
        out = aot_call(engine_generate, aot_dir, params, dims, settings,
                       tables, enc_hidden, jnp.asarray(prompt),
                       jnp.asarray(mask), eos_mask, key, max_len=max_len,
                       dtype=jnp.bfloat16)
        return np.asarray(out["tokens"]), int(out["length"])

    def run_spec(key):
        out = aot_call(generate_speculative, aot_dir, params, dims, settings,
                       tables, enc_hidden, jnp.asarray(prompt),
                       jnp.asarray(mask), eos_mask, key, max_len=max_len,
                       draft_k=ns.draft_k, dtype=jnp.bfloat16)
        return np.asarray(out["tokens"]), int(out["length"])

    results = {}
    for name, fn in (("plain", run_plain), ("speculative", run_spec)):
        fn(jax.random.PRNGKey(0))  # compile + warm
        t0 = time.perf_counter()
        _, length = fn(jax.random.PRNGKey(1))
        dt = time.perf_counter() - t0
        toks = (length - prompt_len) * b
        results[name] = {"seconds": round(dt, 3),
                         "tokens": toks,
                         "tok_s": round(toks / dt, 1)}
        print(name, results[name])

    speedup = results["speculative"]["tok_s"] / results["plain"]["tok_s"]
    record = {
        "metric": "speculative_decode_speedup",
        "value": round(speedup, 3),
        "windows": b, "budget": ns.budget, "draft_k": ns.draft_k,
        "platform": jax.devices()[0].platform,
        "plain": results["plain"], "speculative": results["speculative"],
        "verdict": ("enable" if speedup >= 1.3 else
                    "retire (keep off in presets)"),
    }
    Path(ns.out).write_text(json.dumps(record, indent=1))
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
