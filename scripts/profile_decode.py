"""Profile the decode engine: where do the per-step milliseconds go?

r3 measured ~13.7 ms/step at 24 windows on v5e where the HBM-traffic
budget (weights + self-KV + cross-KV) predicts ~4-5 ms — a 3x gap. Prime
suspects: the layer-scan cache carry failing to alias (full-cache copy per
layer-step), sampling-chain sorts, or layout-induced padding. This script
captures a jax.profiler trace of (a) the prefill and (b) N single-token
steps, and prints the slowest compiled ops from the trace.

Usage (TPU):
    python scripts/profile_decode.py --windows 24 --steps 32 \
        --trace-dir /tmp/decode_trace
Then inspect /tmp/decode_trace with tensorboard, or read the printed
op-level summary (requires no tensorboard: parses the .xplane.pb only if
tensorflow is absent -> falls back to wall-time deltas per phase).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="beatheritage_v1")
    ap.add_argument("--windows", type=int, default=24)
    ap.add_argument("--budget", type=int, default=256,
                    help="decode budget (tokens) for the timed run")
    ap.add_argument("--trace-dir", default="/tmp/decode_trace")
    ap.add_argument("--device", default="auto")
    ap.add_argument("--unroll", action="store_true",
                    help="unroll the decoder layer loop (A/B vs the scan)")
    ap.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache with per-position scales")
    args = ap.parse_args()

    from _backend import ensure_backend
    ensure_backend(args.device)

    import jax
    import jax.numpy as jnp

    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.decode import SamplerSettings, TokenTables
    from beatheritage_tpu.decode.engine import generate as engine_generate
    from beatheritage_tpu.events import ContextType
    from beatheritage_tpu.models import ModelDims, encode, init_params
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", args.config)
    tokenizer = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tokenizer)
    params = init_params(jax.random.PRNGKey(0), dims)
    tables = TokenTables.from_tokenizer(tokenizer)

    n_samples = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.windows, n_samples)), jnp.float32)
    prompt_len = 64
    prompt = np.full((args.windows, prompt_len), tokenizer.pad_id, np.int32)
    prompt[:, -2] = tokenizer.sos_id
    prompt[:, -1] = tokenizer.context_sos[ContextType.TIMING]
    mask = prompt != tokenizer.pad_id
    settings = SamplerSettings(
        temperature=0.85, top_p=0.92, top_k=50, repetition_penalty=1.1,
        timing_temperature=0.1, types_first=cfg.data.types_first,
        do_sample=True)
    eos_mask = jnp.asarray(tables.eos_token_mask())

    enc_fn = jax.jit(lambda p, a: encode(p, dims, cfg, a, dtype=jnp.bfloat16))

    def run(budget, key):
        enc_hidden = enc_fn(params, audio)
        out = engine_generate(
            params, dims, settings, tables, enc_hidden, jnp.asarray(prompt),
            jnp.asarray(mask), eos_mask, key,
            max_len=prompt_len + budget, dtype=jnp.bfloat16,
            unroll_layers=args.unroll, kv_quant=args.kv_quant)
        return np.asarray(out["tokens"]), int(out["length"])

    # warm both budget programs
    run(args.budget, jax.random.PRNGKey(0))
    run(args.budget // 2, jax.random.PRNGKey(0))

    # wall-clock slope: steps in (budget) vs (budget/2) isolates per-step
    # cost from prefill+encode+transfer overheads
    t0 = time.perf_counter()
    _, len_full = run(args.budget, jax.random.PRNGKey(1))
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, len_half = run(args.budget // 2, jax.random.PRNGKey(1))
    t_half = time.perf_counter() - t0
    steps_full = len_full - prompt_len
    steps_half = len_half - prompt_len
    delta = steps_full - steps_half
    if delta <= 0:
        # both runs hit the same early EOS: the slope is undefined
        print(json.dumps({
            "windows": args.windows, "per_step_ms": None,
            "error": "both runs terminated at the same step "
                     f"({steps_full}); raise --budget or relax eos",
            "full_run_s": round(t_full, 3), "half_run_s": round(t_half, 3),
        }))
        return 1
    per_step = (t_full - t_half) / delta
    print(json.dumps({
        "windows": args.windows,
        "per_step_ms": round(per_step * 1000, 3),
        "tokens_per_sec_aggregate": round(args.windows / per_step, 1),
        "slope_steps": delta,
        "full_run_s": round(t_full, 3),
        "half_run_s": round(t_half, 3),
    }))

    # profiler trace of one short run for op-level inspection
    Path(args.trace_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        run(args.budget // 2, jax.random.PRNGKey(2))
    print(f"trace written to {args.trace_dir} "
          "(inspect with tensorboard --logdir or xprof)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
