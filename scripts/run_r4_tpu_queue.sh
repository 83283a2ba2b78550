#!/bin/bash
# Round-4 TPU queue: runs the full post-flagship training + measurement
# chain unattended, back-to-back, so the single chip never idles between
# phases. Waits for the flagship trainer (pidfile) to exit first.
# Every phase is time-bounded, logs to /tmp/r4q_<phase>.log, and a failure
# does not block later phases. Results land as *_r04.json at the repo root.
set -u
cd "$(dirname "$0")/.."

FLAGSHIP_PID_FILE="${FLAGSHIP_PID_FILE:-/tmp/flagship_train.pid}"
FLAGSHIP_CKPT=/tmp/flagship_ckpt
DIT_CKPT=/tmp/synth_dit_b_v4_ckpt
CLF_CKPT=/tmp/synth_classifier_tokens_v5
RC_CKPT=/tmp/synth_rcomplexion_ckpt

say() { echo "[r4q $(date +%H:%M:%S)] $*"; }

# -- 0. wait for the flagship trainer to exit cleanly -----------------------
if [ -f "$FLAGSHIP_PID_FILE" ]; then
  fpid=$(cat "$FLAGSHIP_PID_FILE")
  say "waiting for flagship trainer pid $fpid"
  while kill -0 "$fpid" 2>/dev/null; do sleep 60; done
  say "flagship trainer exited"
fi
ls "$FLAGSHIP_CKPT" 2>/dev/null | tail -3

# durable mirror (survives VM restarts; /tmp does not)
mkdir -p artifacts
say "mirroring flagship checkpoint to artifacts/"
cp -r "$FLAGSHIP_CKPT" artifacts/flagship_ckpt.new 2>/dev/null \
  && rm -rf artifacts/flagship_ckpt \
  && mv artifacts/flagship_ckpt.new artifacts/flagship_ckpt

# -- 1. conditioned DiT-B on the v4 corpus (VERDICT item 2) -----------------
say "phase dit-train"
timeout 6000 python -m beatheritage_tpu.apps.train_diffusion \
  -cn synth_b_v4 checkpoint_path="$DIT_CKPT" max_seconds=5400 \
  > /tmp/r4q_dit_train.log 2>&1
say "dit-train rc=$?"
cp -r "$DIT_CKPT" artifacts/synth_dit_b_v4_ckpt 2>/dev/null

# -- 2. token classifier on the v5 corpus (FID instrument) ------------------
say "phase classifier"
timeout 3600 python -m beatheritage_tpu.apps.train_classifier \
  -cn synth_classifier_tokens device=tpu \
  data.train_dataset_path=/tmp/synth_mmrs_v5 data.train_dataset_end=1120 \
  data.test_dataset_path=/tmp/synth_mmrs_v5 data.test_dataset_start=1120 \
  data.test_dataset_end=1200 \
  optim.total_steps=20000 checkpoint_path="$CLF_CKPT" \
  > /tmp/r4q_classifier.log 2>&1
say "classifier rc=$?"
cp -r "${CLF_CKPT}_best" artifacts/synth_classifier_tokens_v5_best 2>/dev/null

# -- 3. rcomplexion (rhythm-complexity metric) -------------------------------
say "phase rcomplexion"
timeout 1800 python -m beatheritage_tpu.apps.train_rcomplexion -cn synth \
  data.train_dataset_path=/tmp/synth_mmrs_v3 data.train_dataset_end=185 \
  data.test_dataset_path=/tmp/synth_mmrs_v3 \
  optim.total_steps=3000 checkpoint_path="$RC_CKPT" \
  > /tmp/r4q_rcomplexion.log 2>&1
say "rcomplexion rc=$?"
cp -r "$RC_CKPT" artifacts/synth_rcomplexion_ckpt 2>/dev/null

# -- 4. DiT conditioning ablation (is the class vector used?) ---------------
say "phase dit-cond"
timeout 1800 python scripts/eval_dit_conditioning.py \
  --config synth_b_v4 --ckpt "$DIT_CKPT" \
  --dataset /tmp/synth_mmrs_v4 --start 560 --end 600 \
  --out EVAL_DIT_COND_r04.json > /tmp/r4q_dit_cond.log 2>&1
say "dit-cond rc=$?"

# -- 5. e2e latency with the shipped config (VERDICT item 3) ----------------
say "phase e2e"
timeout 5400 python scripts/bench_e2e.py --config synth_flagship \
  --ckpt "$FLAGSHIP_CKPT" --songs 3 --runs 5 --minutes 3 \
  --out /tmp/bench_e2e_r4 > /tmp/r4q_e2e.json 2>/tmp/r4q_e2e.log \
  && cp /tmp/r4q_e2e.json BENCH_E2E_r04.json
say "e2e rc=$?"

# -- 6. super-timing sweep latency (VERDICT item 4) --------------------------
say "phase timing"
timeout 5400 python scripts/eval_timing.py --config synth_flagship \
  --ckpt "$FLAGSHIP_CKPT" --songs 6 \
  --out EVAL_TIMING_r04.json > /tmp/r4q_timing.log 2>&1
say "timing rc=$?"

# -- 7. on-device position rescore with the conditioned refiner -------------
say "phase positions"
timeout 5400 python scripts/eval_positions.py --config synth_flagship \
  --ckpt "$FLAGSHIP_CKPT" --diff-ckpt "$DIT_CKPT" \
  --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 --songs 6 \
  --out EVAL_POS_r04.json > /tmp/r4q_positions.log 2>&1
say "positions rc=$?"

# -- 8. classifier held-out score -------------------------------------------
say "phase clf-eval"
timeout 1800 python scripts/eval_classifier.py \
  --config synth_classifier_tokens --ckpt "${CLF_CKPT}_best" \
  --dataset /tmp/synth_mmrs_v5 --start 1120 --end 1200 \
  --out EVAL_CLASSIFIER_r04.json > /tmp/r4q_clf_eval.log 2>&1
say "clf-eval rc=$?"

say "queue done — run calc_fid/fid_floor/mfu interactively"
