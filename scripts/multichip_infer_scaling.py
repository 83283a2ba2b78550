"""Window-batch data-parallel decode: multichip scaling record (VERDICT r4
item 10).

Parallel-mode inference is embarrassingly parallel over audio windows —
`Processor._run_engine` shards the window batch over the mesh `data` axis and
XLA SPMD propagates it through the fused decode program with no cross-device
collectives in the hot loop. Per-chip throughput under DP should therefore
match the single-chip envelope (bench.py), i.e. tokens/s/device flat.

Real multi-chip hardware is not available in this image, so this measures the
thing that could break that claim: the OVERHEAD the DP path adds. It runs the
same total window batch twice on the virtual CPU mesh — once on a single
device, once sharded over all 8 — on the same host cores, so compute is
identical and any difference is sharding/layout/dispatch overhead. It also
verifies the token streams are bit-identical between the two placements.

Writes MULTICHIP_INFER_r{N}.json:
    {"dp_overhead_pct": ..., "tokens_identical": true,
     "per_chip_tok_s_measured": {...}}   (the real-chip envelope, cited)

Usage: python scripts/multichip_infer_scaling.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="MULTICHIP_INFER_r05.json")
    ap.add_argument("--windows-per-device", type=int, default=4)
    ap.add_argument("--budget", type=int, default=192)
    ns = ap.parse_args()

    import jax

    # this image's sitecustomize pins the axon platform in every process;
    # force CPU + 8 virtual devices before the backend initializes (same
    # approach as __graft_entry__.dryrun_multichip)
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except (RuntimeError, AttributeError):
        pass
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.decode import SamplerSettings, TokenTables
    from beatheritage_tpu.decode.engine import generate as engine_generate
    from beatheritage_tpu.events import ContextType
    from beatheritage_tpu.models import ModelDims, encode, init_params
    from beatheritage_tpu.parallel import build_mesh
    from beatheritage_tpu.tokenizer import Tokenizer

    devices = jax.devices()
    n_dev = len(devices)
    assert n_dev >= 2, f"need a virtual multi-device mesh, got {n_dev}"

    cfg = load_config(TrainConfig, "train", "tiny")
    tokenizer = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tokenizer)
    params = init_params(jax.random.PRNGKey(0), dims)
    tables = TokenTables.from_tokenizer(tokenizer)

    b_total = ns.windows_per_device * n_dev
    n_samples = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((b_total, n_samples)),
        jnp.float32)

    prompt_len = 16
    prompt = np.full((b_total, prompt_len), tokenizer.pad_id, np.int32)
    prompt[:, -2] = tokenizer.sos_id
    prompt[:, -1] = tokenizer.context_sos[ContextType.TIMING]
    mask = prompt != tokenizer.pad_id
    max_len = prompt_len + ns.budget

    # greedy: placement must not change the stream, so sampling noise is off
    settings = SamplerSettings(do_sample=False,
                               types_first=cfg.data.types_first)
    eos_mask = jnp.asarray(tables.eos_token_mask())
    enc_fn = jax.jit(lambda p, a: encode(p, dims, cfg, a, dtype=jnp.float32))

    def run(mesh):
        if mesh is None:
            put = lambda x, s=None: jax.device_put(x, devices[0])
        else:
            def put(x, spec=P()):
                return jax.device_put(x, NamedSharding(mesh, spec))
        params_p = jax.tree.map(lambda x: put(x), params)
        audio_p = put(audio, P("data")) if mesh else put(audio)
        enc_hidden = enc_fn(params_p, audio_p)
        prompt_p = put(jnp.asarray(prompt), P("data")) if mesh else put(jnp.asarray(prompt))
        mask_p = put(jnp.asarray(mask), P("data")) if mesh else put(jnp.asarray(mask))
        eos_p = put(eos_mask) if mesh else put(eos_mask)

        def call():
            out = engine_generate(
                params_p, dims, settings, tables, enc_hidden, prompt_p,
                mask_p, eos_p, jax.random.PRNGKey(1), max_len=max_len,
                dtype=jnp.float32)
            return np.asarray(out["tokens"]), int(out["length"])

        call()  # compile + warm
        t0 = time.perf_counter()
        toks, length = call()
        dt = time.perf_counter() - t0
        return toks, length, dt

    toks_1, len_1, dt_1 = run(None)
    mesh = build_mesh(data=n_dev, model=1)
    toks_dp, len_dp, dt_dp = run(mesh)

    identical = bool(np.array_equal(toks_1, toks_dp))
    gen_tokens = (len_1 - prompt_len) * b_total
    overhead_pct = (dt_dp - dt_1) / dt_1 * 100.0

    record = {
        "metric": "window_dp_decode_overhead",
        "devices": n_dev,
        "windows_total": b_total,
        "decode_budget": ns.budget,
        "tokens_generated": gen_tokens,
        "tokens_identical": identical,
        "single_device_seconds": round(dt_1, 3),
        "dp_sharded_seconds": round(dt_dp, 3),
        "dp_overhead_pct": round(overhead_pct, 2),
        "note": ("same total batch on the same host cores; any delta is the "
                 "DP sharding/dispatch overhead. Decode has no cross-device "
                 "collectives in the hot loop, so per-chip tok/s under DP "
                 "tracks the single-chip envelope."),
        "per_chip_tok_s_measured_tpu_v5e": {
            "24_windows_bf16_kv": 2941.7, "48_windows_int8_kv": 3807.4,
            "96_windows_int8_kv": 6454.8},
    }
    Path(ns.out).write_text(json.dumps(record, indent=1))
    print(json.dumps(record))
    assert identical, "DP placement changed the greedy token stream"
    return 0


if __name__ == "__main__":
    sys.exit(main())
