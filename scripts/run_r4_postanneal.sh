#!/bin/bash
# Round-4 tail, part 2: the run_r4_anneal.sh wrapper died with its session
# while the anneal trainer (reparented to init) kept going. This script takes
# over the wrapper's post-anneal duties: wait for the trainer to deadline-exit,
# mirror the annealed checkpoint durably, re-score calc_fid / timing /
# positions against the annealed weights, and commit. Everything TPU-bound is
# dead by HARD_END so the driver's round-end bench gets a clean chip.
set -u
cd "$(dirname "$0")/.."

TRAIN_PID="${TRAIN_PID:?set TRAIN_PID to the running anneal trainer pid}"
HARD_END="${HARD_END:-$(date -d "today 18:40" +%s)}"
CKPT=/tmp/flagship_ckpt
DIT_CKPT=/tmp/synth_dit_b_v4_ckpt
say() { echo "[post $(date +%H:%M:%S)] $*"; }
remaining() { echo $(( HARD_END - $(date +%s) )); }

# -- 1. wait for the trainer (self-exits via max_seconds ~17:57:40) ----------
say "waiting for trainer pid $TRAIN_PID"
while kill -0 "$TRAIN_PID" 2>/dev/null; do
  # the trainer checkpoints + exits on SIGTERM (train_loop.py:325); nudge it
  # if it overruns its own deadline so the eval phases keep their budget
  if [ "$(remaining)" -lt 2100 ]; then
    say "budget critical — SIGTERM trainer for graceful checkpoint-exit"
    kill -TERM "$TRAIN_PID" 2>/dev/null
    sleep 120
    kill -KILL "$TRAIN_PID" 2>/dev/null
    break
  fi
  sleep 20
done
say "trainer exited; last: $(grep -o 'step [0-9]*:.*' /tmp/r4_anneal_train.log | tail -1 | cut -c1-90)"
sleep 5

# -- 2. durable mirror of the annealed weights -------------------------------
latest=$(ls "$CKPT" | grep '^state_' | sort -t_ -k2 -n | tail -1)
stage=/tmp/mirror_stage_flagship_ckpt
rm -rf "$stage"; mkdir -p "$stage"
[ -n "$latest" ] && nice cp -r "$CKPT/$latest" "$stage/"
for f in params tokenizer.json config.yaml; do
  [ -e "$CKPT/$f" ] && nice cp -r "$CKPT/$f" "$stage/" 2>/dev/null
done
say "mirroring $latest durably"
bash scripts/mirror_durable.sh "$stage" flagship_ckpt >> /tmp/r4_post_mirror.log 2>&1
say "mirror rc=$?"

# -- 3. re-score the quality evals against the annealed weights --------------
phase() {  # <name> <est_s> <cmd...>
  local name=$1 est=$2; shift 2
  local rem; rem=$(remaining)
  if [ "$rem" -lt "$est" ]; then say "SKIP $name (${rem}s left)"; return 1; fi
  say "phase $name (${rem}s to hard end)"
  timeout --signal=TERM --kill-after=60 "$rem" "$@" \
    > "/tmp/r4a_${name}.log" 2>&1
  say "$name rc=$?"
}

phase calc_fid 700 \
  python -m beatheritage_tpu.apps.calc_fid -cn synth_flagship \
    inference.model_path="$CKPT" inference.output_path=/tmp/fid_out_r04b
[ -s /tmp/fid_out_r04b/fid_report.json ] \
  && cp /tmp/fid_out_r04b/fid_report.json EVAL_r04.json

# capped-timer run (timer_max_len live): p50 from warm songs
phase timing 700 \
  env BH_TIMER_PROFILE=1 python scripts/eval_timing.py \
    --config synth_flagship \
    --ckpt "$CKPT" --songs 6 --out EVAL_TIMING_r04.json

phase positions 300 \
  python scripts/eval_positions.py --config synth_flagship \
    --ckpt "$CKPT" --diff-ckpt "$DIT_CKPT" \
    --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 --songs 6 \
    --out EVAL_POS_r04.json

# -- 4. commit ----------------------------------------------------------------
git add ./EVAL_r04.json ./EVAL_TIMING_r04.json ./EVAL_POS_r04.json 2>/dev/null
git diff --cached --quiet \
  || git commit -q -m "Re-score fid/timing/positions on the annealed flagship" --no-verify
say "done ($(remaining)s before hard end); no TPU processes remain"
