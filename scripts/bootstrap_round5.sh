#!/bin/bash
# Round-5 session bootstrap: rebuild everything a fresh VM needs before
# touching the chip. Run this FIRST in any new session — it is idempotent
# and CPU-only (safe to run while deciding what to do with the TPU).
#
#   bash scripts/bootstrap_round5.sh            # full (corpora + ckpts)
#   bash scripts/bootstrap_round5.sh --no-corpora
#
# After it finishes, the chip priorities (r4 close-out, see ROUND_NOTES
# addendum 11 + VERDICT):
#   1. python bench.py                  -> expect >=0.78 via the warm AOT
#      cache in ~/.cache (survives VM restarts; /tmp does not).
#   2. Flagship deepening (VERDICT #6, resumes from state_16473):
#        python -m beatheritage_tpu.apps.train -cn synth_flagship \
#          optim.total_steps=30000 checkpoint_path=/tmp/flagship_ckpt \
#          max_seconds=<budget>
#      Mirror durably EVERY few thousand steps: scripts/mirror_durable.sh.
#   3. Super-timing BPM voting (VERDICT #4 residual): set0192 misses all 3
#      redlines on dbpm 0.5-1.0 with good offsets — debug the local-BPM
#      vote / human rounding in the beat walk, re-run
#      scripts/eval_timing.py on sets 185-200 of /tmp/synth_mmrs_v3.
#   4. MFU profiling pass (VERDICT #7): 24.5% at batch 28 / tgt 2048;
#      jax.profiler trace of the fused train step, then attack the top op.
set -u
cd "$(dirname "$0")/.."

say() { echo "[r5boot $(date +%H:%M:%S)] $*"; }

# -- corpora (deterministic seeds; ~CPU-bound, nice'd, parallel) ----------
if [ "${1:-}" != "--no-corpora" ]; then
  for spec in "v3 200" "v4 600" "v5 1200"; do
    name=${spec% *}; sets=${spec#* }
    out=/tmp/synth_mmrs_$name
    if [ -d "$out" ]; then
      say "corpus $name exists — skipping"
    else
      say "regenerating $out ($sets sets, seed 0)"
      nice -19 python scripts/make_synth_corpus.py \
        --out "$out" --sets "$sets" > "/tmp/r5boot_corpus_$name.log" 2>&1 &
    fi
  done
  wait
  for name in v3 v4 v5; do
    [ -d "/tmp/synth_mmrs_$name" ] || say "WARNING: corpus $name missing" \
      "(see /tmp/r5boot_corpus_$name.log)"
  done
fi

# -- checkpoints from the durable mirrors (full: trainers need state_N) ---
nice -19 python scripts/restore_artifacts.py

say "bootstrap done. Chip runbook is in the header of this script."
