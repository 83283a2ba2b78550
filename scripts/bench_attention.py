"""Microbench: Pallas flash attention vs the XLA path, fwd and fwd+bwd.

Run on the real chip:

    python scripts/bench_attention.py            # all sizes
    python scripts/bench_attention.py --seqs 2048 8192

Prints per-(seq, causal) timings and the Pallas/XLA ratio. The training
config that matters is causal tq=tk in {2048, 4096, 8192} at (B=4, H=12,
Dh=64) bf16 — VERDICT.md round-1 flagged the bwd losing 7x to XLA at 2048.

Timing methodology (axon remote device): block_until_ready does not
reliably block through the tunnel and naive fetches transfer whole arrays,
so each measurement chains N data-dependent iterations (outputs feed the
next call's inputs), reduces to a scalar ON DEVICE, fetches only that, and
reports the (N - 1)-iteration slope — the tunnel roundtrip cancels.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _chain_time(step, fetch, state, iters):
    """Seconds for `iters` chained applications of `step`, roundtrip included."""
    t0 = time.perf_counter()
    s = state
    for _ in range(iters):
        s = step(s)
    float(fetch(s))
    return time.perf_counter() - t0


def timed(step, fetch, state, iters=12):
    """Per-iteration seconds by 1-vs-N slope (cancels the fetch roundtrip)."""
    _chain_time(step, fetch, state, 1)  # compile + warm
    t1 = min(_chain_time(step, fetch, state, 1) for _ in range(3))
    tn = min(_chain_time(step, fetch, state, iters) for _ in range(3))
    return max(tn - t1, 1e-9) / (iters - 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, nargs="+", default=[2048, 4096, 8192])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from beatheritage_tpu.ops.attention import dot_product_attention
    from beatheritage_tpu.ops.pallas.flash_attention import flash_attention

    b, h, d = args.batch, args.heads, args.head_dim
    for t in args.seqs:
        ks = jax.random.split(jax.random.PRNGKey(t), 3)
        q, k, v = (jax.random.normal(x, (b, h, t, d), jnp.bfloat16) for x in ks)
        flops_fwd = 4 * b * h * t * t * d  # QK^T + PV
        for causal in (True, False):
            eff = flops_fwd / (2 if causal else 1)

            def fwd_step(fn):
                g = jax.jit(lambda s: fn(s, k, v))
                return lambda s: g(s)

            def bwd_step(fn):
                g = jax.jit(jax.grad(
                    lambda q, k, v: fn(q, k, v).astype(jnp.float32).sum(),
                    argnums=(0, 1, 2)))

                def step(s):
                    dq, dk, dv = g(s[0], s[1], s[2])
                    return (dq.astype(jnp.bfloat16), dk.astype(jnp.bfloat16),
                            dv.astype(jnp.bfloat16))
                return step

            fl = lambda q, k, v, c=causal: flash_attention(q, k, v, is_causal=c)
            xl = lambda q, k, v, c=causal: dot_product_attention(
                q, k, v, is_causal=c)

            fetch1 = lambda s: jnp.sum(s[0, 0, 0, :8].astype(jnp.float32))
            fetch3 = lambda s: jnp.sum(s[0][0, 0, 0, :8].astype(jnp.float32))

            rows = {}
            rows["fwd"] = (timed(fwd_step(fl), fetch1, q, args.iters),
                           timed(fwd_step(xl), fetch1, q, args.iters))
            try:
                rows["bwd"] = (timed(bwd_step(fl), fetch3, (q, k, v), args.iters),
                               timed(bwd_step(xl), fetch3, (q, k, v), args.iters))
            except Exception as e:  # XLA bwd OOMs at long seq — report alone
                rows["bwd"] = (timed(bwd_step(fl), fetch3, (q, k, v), args.iters),
                               None)
                print(f"  (xla bwd failed at T={t}: {type(e).__name__})")
            for name, (p, x) in rows.items():
                mult = 2.5 if name == "bwd" else 1.0  # bwd ~2.5x fwd FLOPs
                tf = eff * mult / p / 1e12
                ratio = f"{p / x:5.2f}x xla" if x else "  (xla n/a)"
                xs = f"{x * 1e3:8.2f}" if x else "     n/a"
                print(f"T={t:5d} causal={int(causal)} {name}: "
                      f"pallas {p * 1e3:8.2f} ms ({tf:5.1f} TF/s)  "
                      f"xla {xs} ms  {ratio}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
