"""Training-step throughput on the current device (single chip or mesh).

Measures the fused pjit train step (forward+backward+Muon update) for the
flagship config at a realistic micro-batch, reporting steps/s, tokens/s and
a rough model-FLOPs utilisation estimate. Run:
    python scripts/bench_train.py [--batch 8] [--steps 20]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="beatheritage_v1")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--override", action="append", default=[],
                        help="config dotted overrides, e.g. remat_policy=dots")
    parser.add_argument("--device", default="auto",
                        help="cpu forces the host platform past the site "
                             "hook; auto probes the ambient backend")
    ns = parser.parse_args()

    from _backend import ensure_backend
    ensure_backend(ns.device)

    import jax
    import numpy as np

    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.models import ModelDims, init_params
    from beatheritage_tpu.models.transformer import param_count
    from beatheritage_tpu.tokenizer import Tokenizer
    from beatheritage_tpu.train.train_loop import Trainer

    cfg = load_config(TrainConfig, "train", ns.config
                      if ns.config != "beatheritage_v1" else "beatheritage_v1",
                      overrides=ns.override)
    cfg.optim.grad_acc = 1
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(0), dims)
    n_params = param_count(params)

    def run_at_batch(b):
        """Compile + time the step at micro-batch b. Raises on device OOM."""
        cfg.optim.batch_size = b
        trainer = Trainer(cfg=cfg, dims=dims, params=params, tokenizer=tok)
        rng = np.random.RandomState(0)
        src = (cfg.data.src_seq_len - 1) * cfg.data.hop_length
        batch = {
            "frames": rng.randn(b, src).astype(np.float32),
            "decoder_input_ids": rng.randint(
                3, tok.vocab_size_in,
                (b, cfg.data.tgt_seq_len)).astype(np.int32),
            "labels": rng.randint(
                0, tok.vocab_size_out,
                (b, cfg.data.tgt_seq_len)).astype(np.int32),
            "decoder_attention_mask": np.ones(
                (b, cfg.data.tgt_seq_len), np.int32),
        }
        t0 = time.time()
        trainer.state, metrics = trainer.train_step(trainer.state, batch)
        _ = float(metrics["loss"])
        print(f"compile: {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(ns.steps):
            trainer.state, metrics = trainer.train_step(trainer.state, batch)
        _ = float(metrics["loss"])  # sync
        return (time.time() - t0) / ns.steps

    def is_oom(exc) -> bool:
        msg = str(exc)
        return any(m in msg for m in (
            "RESOURCE_EXHAUSTED", "ResourceExhausted", "Out of memory"))

    # OOM ladder: a policy override (e.g. remat_policy=dots) can push the
    # requested batch past the HBM envelope; step down instead of reporting
    # nothing (throughput tok/s stays comparable across batch sizes).
    b = ns.batch
    while True:
        try:
            dt = run_at_batch(b)
            break
        except Exception as exc:  # noqa: BLE001 — XlaRuntimeError lacks a stable type
            if not is_oom(exc) or b <= 4:
                raise
            nxt = max(4, b - 4)
            print(f"batch {b} OOM ({str(exc)[:140]}...); retrying at {nxt}")
            b = nxt
    ns.batch = b

    tokens = ns.batch * cfg.data.tgt_seq_len
    # FLOPs model: matmul params x the positions they actually process
    # (encoder layers see post-conv mel frames, decoder layers see tgt tokens),
    # plus the attention score/value matmuls (4*T^2*d fwd per self-attn layer,
    # 4*S*T*d for cross-attn). Embedding/gather tables contribute no matmuls.
    # fwd = 2*P*N; bwd = 2x fwd; per-layer remat recomputes fwd once more.
    def tree_size(subtree) -> int:
        return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(subtree))

    p = params
    enc_positions = ns.batch * dims.max_source_positions   # post-conv frames
    enc_matmul = tree_size(p.get("encoder", {}))
    if "enc_proj" in p:
        enc_matmul += tree_size(p["enc_proj"])
    if "cond" in p:  # conditioning embedders: MLPs are matmuls, tables are gathers
        enc_matmul += sum(
            int(np.prod(l.shape)) for path, l in
            jax.tree_util.tree_leaves_with_path(p["cond"])
            if not any(getattr(k, "key", None) in ("table", "centers", "widths")
                       for k in path))
    dec_matmul = tree_size(p.get("decoder", {})) + tree_size(p.get("lm_head"))
    embed_like = n_params  # report only: everything not counted above
    embed_like -= enc_matmul + dec_matmul

    fwd = 2 * (enc_matmul * enc_positions + dec_matmul * tokens)
    S, T, d = dims.max_source_positions, cfg.data.tgt_seq_len, dims.d_model
    attn_fwd = ns.batch * (
        dims.encoder_layers * 4 * S * S * d          # encoder self-attn
        + dims.decoder_layers * 4 * T * T * d        # decoder self-attn (causal)
        + dims.decoder_layers * 4 * S * T * d)       # cross-attn
    fwd += attn_fwd
    recompute = 4 if cfg.gradient_checkpointing else 3  # fwd + 2x-fwd bwd (+ remat)
    flops = recompute * fwd
    print(f"params: {n_params / 1e6:.0f}M (enc {enc_matmul / 1e6:.0f}M + dec "
          f"{dec_matmul / 1e6:.0f}M matmul, {embed_like / 1e6:.0f}M tables)  "
          f"batch: {ns.batch}  src: {S}  tgt: {T}")
    print(f"step: {dt * 1e3:.1f} ms  steps/s: {1 / dt:.2f}  "
          f"tokens/s: {tokens / dt:,.0f}")
    suffix = " (incl. remat recompute)" if cfg.gradient_checkpointing else ""
    print(f"~MFU vs 197 TFLOP/s bf16 peak: {flops / dt / 197e12 * 100:.1f}%"
          f"{suffix}  [attn share of fwd: {attn_fwd / fwd * 100:.0f}%]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
