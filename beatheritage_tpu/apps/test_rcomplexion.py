"""rcomplexion diagnostic: entropy of the next-note-time prediction swept
over input timeshift space, rendered as an image.

(reference: rcomplexion/test.py:29-45 — feeds [TIME_SHIFT(i), CIRCLE]*
repeated to src_seq_len for every timeshift i, and plots per-row
-p*log2(p) of the output distribution. A trained model shows diagonal
banding: predicted times lock to multiples of the input rhythm.)

Usage:
    python -m beatheritage_tpu.apps.test_rcomplexion -cn tiny \
        [model_path=/ckpt] [-o rcomplexion_entropy.png]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="rcomplexion timeshift sweep")
    parser.add_argument("-cn", "--config-name", default="tiny")
    parser.add_argument("-o", "--output", default="rcomplexion_entropy.png")
    parser.add_argument("--model-path", default=None,
                        help="orbax params dir (random init when omitted)")
    parser.add_argument("--src-seq-len", type=int, default=16)
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override
    apply_device_override(ns.overrides)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import TrainConfig, load_config
    from ..events import Event, EventType
    from ..models.rcomplexion import (RComplexionDims, init_rcomplexion_params,
                                      rcomplexion_forward)
    from ..tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", ns.config_name,
                      overrides=ns.overrides)
    tokenizer = Tokenizer(cfg)
    dims = RComplexionDims(vocab_size_in=tokenizer.vocab_size_in,
                           vocab_size_out=tokenizer.vocab_size_out,
                           src_seq_len=ns.src_seq_len)
    if ns.model_path:
        from ..train.checkpoints import restore_params  # noqa: PLC0415
        params = restore_params(ns.model_path)
        print(f"loaded params from {ns.model_path}")
    else:
        params = init_rcomplexion_params(jax.random.PRNGKey(cfg.seed), dims)
        print("no model_path: random init (structure check only)")

    ts_range = next(r for r in tokenizer.event_ranges
                    if r.type == EventType.TIME_SHIFT)
    max_timeshift = ts_range.max_value - max(ts_range.min_value, 0)
    circle = tokenizer.encode(Event(EventType.CIRCLE))

    rows = np.empty((max_timeshift + 1, dims.src_seq_len), np.int32)
    for i in range(max_timeshift + 1):
        ts = tokenizer.encode(Event(EventType.TIME_SHIFT, i))
        rows[i] = np.tile([ts, circle], dims.src_seq_len // 2)

    logits = jax.jit(lambda p, x: rcomplexion_forward(p, dims, x))(
        params, jnp.asarray(rows))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    entropy = -probs * np.log2(np.maximum(probs, 1e-12))

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    plt.figure(figsize=(8, 6))
    plt.imshow(entropy, aspect="auto")
    plt.xlabel("Predicted time token")
    plt.ylabel("Input timeshift")
    plt.colorbar(label="-p log2 p")
    plt.tight_layout()
    plt.savefig(ns.output, dpi=120)
    print(f"wrote {ns.output} ({entropy.shape[0]}x{entropy.shape[1]}, "
          f"mean entropy {entropy.sum(-1).mean():.2f} bits)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
