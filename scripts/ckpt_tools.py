#!/usr/bin/env python
"""Checkpoint + training-log inspection tools.

TPU-native equivalents of the reference's dev scripts
(osu_diffusion/testing/print_ckpt.py — dump a checkpoint's state-dict
shapes; osu_diffusion/testing/plot_loss.py — overlay loss curves from
training logs). Those are hardcoded one-offs; this is one CLI that works on
any of our orbax checkpoint dirs (flagship seq2seq, DiT, classifier,
rcomplexion — anything written by train.checkpoints.save_params or the
Trainer's state_N layout).

Subcommands:
    show       walk the param pytree: path, shape, dtype, per-subtree and
               total param counts (print_ckpt.py equivalent)
    diff       structural diff of two checkpoints (added/removed/reshaped)
    plot-loss  parse `step N: k=v ...` trainer log lines and overlay curves
               (plot_loss.py equivalent; any metric key, e.g. loss, mse,
               accuracy, val_top1)

Usage:
    python scripts/ckpt_tools.py show /tmp/synth_dit_xs_ckpt
    python scripts/ckpt_tools.py show /tmp/flagship_ckpt --top ema
    python scripts/ckpt_tools.py diff /tmp/ckpt_a /tmp/ckpt_b
    python scripts/ckpt_tools.py plot-loss /tmp/dit_xs.log /tmp/dit_b.log \
        --metric loss --out /tmp/loss.png
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# `step 2700: loss=0.4619 mse=0.4451 (0.44 it/s)` — any k=v float pairs
_STEP_RE = re.compile(r"^step (\d+): (.*)$")
_KV_RE = re.compile(r"([A-Za-z_][\w/]*)=([-+eE\d.]+)")


def _load_tree(path: str):
    """Restore an orbax params dir without building any model: works on
    save_params layouts (<dir>/params) and Trainer state_N dirs."""
    from beatheritage_tpu.train.checkpoints import restore_params
    p = Path(path)
    if (p / "params").exists():
        return restore_params(p)
    # Trainer layout: pick the newest state_N
    states = sorted(p.glob("state_*"),
                    key=lambda d: int(d.name.split("_")[1]))
    if states:
        return restore_params(states[-1])
    raise FileNotFoundError(f"no orbax checkpoint under {path}")


def _flatten(tree, prefix=""):
    import numpy as np
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten(tree[k], f"{prefix}{k}." if prefix or True
                                else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}.")
    else:
        arr = np.asarray(tree)
        yield prefix.rstrip("."), arr.shape, str(arr.dtype), int(arr.size)


def cmd_show(args) -> int:
    tree = _load_tree(args.ckpt)
    if args.top:
        for k in args.top.split("."):
            tree = tree[k]
    rows = list(_flatten(tree))
    total = 0
    for path, shape, dtype, size in rows:
        total += size
        print(f"{path:<64} {str(shape):<20} {dtype:<10} {size:>12,}")
    print(f"{'TOTAL':<64} {'':<20} {'':<10} {total:>12,}  "
          f"({total / 1e6:.2f} M params)")
    return 0


def cmd_diff(args) -> int:
    a = dict((p, (s, d)) for p, s, d, _ in _flatten(_load_tree(args.a)))
    b = dict((p, (s, d)) for p, s, d, _ in _flatten(_load_tree(args.b)))
    changed = False
    for p in sorted(set(a) | set(b)):
        if p not in b:
            print(f"- {p} {a[p][0]}"); changed = True
        elif p not in a:
            print(f"+ {p} {b[p][0]}"); changed = True
        elif a[p] != b[p]:
            print(f"~ {p} {a[p][0]}/{a[p][1]} -> {b[p][0]}/{b[p][1]}")
            changed = True
    if not changed:
        print("identical structure")
    return 0


def parse_log(path: str, metric: str):
    """(steps, values) for `metric` from a trainer log; val_* metrics are
    only printed at eval steps so gaps are expected."""
    steps, vals = [], []
    with open(path, errors="replace") as fh:
        for line in fh:
            m = _STEP_RE.match(line.strip())
            if not m:
                continue
            kv = dict(_KV_RE.findall(m.group(2)))
            if metric in kv:
                try:
                    steps.append(int(m.group(1)))
                    vals.append(float(kv[metric]))
                except ValueError:
                    steps = steps[:len(vals)]
    return steps, vals


def cmd_plot_loss(args) -> int:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 5))
    for path in args.logs:
        steps, vals = parse_log(path, args.metric)
        if not steps:
            print(f"warning: no `{args.metric}` lines in {path}",
                  file=sys.stderr)
            continue
        if args.smooth > 1:
            import numpy as np
            k = min(args.smooth, len(vals))
            vals = np.convolve(vals, np.ones(k) / k, mode="valid").tolist()
            steps = steps[k - 1:]
        ax.plot(steps, vals, label=Path(path).name)
    ax.set_xlabel("step")
    ax.set_ylabel(args.metric)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(args.out)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("show", help="dump param tree shapes + counts")
    s.add_argument("ckpt")
    s.add_argument("--top", default="",
                   help="descend into a subtree first, e.g. `ema`")
    s.set_defaults(fn=cmd_show)

    s = sub.add_parser("diff", help="structural diff of two checkpoints")
    s.add_argument("a")
    s.add_argument("b")
    s.set_defaults(fn=cmd_diff)

    s = sub.add_parser("plot-loss", help="overlay metric curves from logs")
    s.add_argument("logs", nargs="+")
    s.add_argument("--metric", default="loss")
    s.add_argument("--smooth", type=int, default=1,
                   help="moving-average window (in logged points)")
    s.add_argument("--out", default="/tmp/loss.png")
    s.set_defaults(fn=cmd_plot_loss)

    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
