#!/bin/bash
# Round-4 tail: anneal the flagship, then re-score the quality evals.
#
# Why: the from-scratch flagship retrain targeted total_steps=30000 but the
# session deadline cut it at step 9880 with lr still ~0.0015 (75% of peak) —
# an un-annealed checkpoint. EVAL_r04 rhythm F1 0.269 (vs r3's 0.543 from a
# COMPLETED 8k schedule) and the super-timing hit-rate drop (93%->78%, one
# song's BPM off by 0.5) are both consistent with that. Finishing the cosine
# inside the remaining TPU budget is worth more than the two optional decode
# probes the measurement queue would otherwise spend it on.
#
# Sequence:
#   1. Wait for the r4 queue to finish mfu_dots; stop it before the optional
#      bench_kvq/bench_n32 tail probes (kill by explicit pid + children).
#   2. Resume /tmp/flagship_ckpt (state_9500) with total_steps set so the
#      cosine REACHES its floor within the measured budget (~1.1 steps/s).
#   3. Mirror durably, then re-run calc_fid / eval_timing / eval_positions
#      against the annealed weights, commit the refreshed *_r04.json.
# Everything TPU-bound is dead by HARD_END (default 18:40 UTC) — the driver's
# round-end bench needs a clean chip (r3 postmortem).
set -u
cd "$(dirname "$0")/.."

HARD_END="${HARD_END:-$(date -d "today 18:40" +%s)}"
QPID_FILE=/tmp/r4q.pid
CKPT=/tmp/flagship_ckpt
DIT_CKPT=/tmp/synth_dit_b_v4_ckpt
say() { echo "[anneal $(date +%H:%M:%S)] $*"; }
remaining() { echo $(( HARD_END - $(date +%s) )); }

kill_tree() {  # TERM a pid and its descendants, then KILL stragglers
  local pids="$1" all="" p
  while [ -n "$pids" ]; do
    all="$all $pids"
    pids=$(echo "$pids" | xargs -r -n1 -I{} ps -o pid= --ppid {} | tr -d ' ' | tr '\n' ' ')
    pids=$(echo "$pids" | xargs)
  done
  for p in $all; do kill -TERM "$p" 2>/dev/null; done
  sleep 20
  for p in $all; do kill -KILL "$p" 2>/dev/null; done
}

# -- 1. wait for the queue to pass mfu_dots, then stop it -------------------
if [ -f "$QPID_FILE" ] && kill -0 "$(cat "$QPID_FILE")" 2>/dev/null; then
  qpid=$(cat "$QPID_FILE")
  say "waiting for queue $qpid to finish mfu_dots"
  while kill -0 "$qpid" 2>/dev/null; do
    if grep -q "mfu_dots rc=\|phase bench_kvq\|queue done" /tmp/r4q_main2.log 2>/dev/null; then
      say "queue reached the probe tail — stopping it (pid $qpid)"
      kill_tree "$qpid"
      break
    fi
    # safety: if the queue somehow runs long, reclaim the chip for the anneal
    if [ "$(remaining)" -lt 3000 ]; then
      say "budget critical — stopping queue now"
      kill_tree "$qpid"
      break
    fi
    sleep 30
  done
  say "queue stopped/exited"
fi
sleep 10

# -- 2. anneal: cosine floor reachable within the budget --------------------
# calc_fid ~700s + capped-timer compiles+run ~900s + positions ~300s + slack
EVAL_BUDGET=2700
budget=$(( $(remaining) - EVAL_BUDGET - 240 ))
if [ "$budget" -lt 900 ]; then
  say "no anneal budget left (${budget}s) — skipping straight to evals"
else
  steps=$(( budget ))  # ~1.0 steps/s conservative; real rate ~1.1-1.2
  total=$(( 9500 + steps ))
  say "annealing to total_steps=$total (budget ${budget}s)"
  timeout --signal=TERM --kill-after=120 $(( budget + 180 )) \
    python -m beatheritage_tpu.apps.train -cn synth_flagship \
      checkpoint_path="$CKPT" optim.total_steps="$total" \
      max_seconds="$budget" > /tmp/r4_anneal_train.log 2>&1
  say "anneal rc=$?; last: $(grep -o 'step [0-9]*:.*' /tmp/r4_anneal_train.log | tail -1 | cut -c1-90)"
  # durable mirror (same staging as the queue's mirror_ckpt)
  latest=$(ls "$CKPT" | grep '^state_' | sort -t_ -k2 -n | tail -1)
  stage=/tmp/mirror_stage_flagship_ckpt
  rm -rf "$stage"; mkdir -p "$stage"
  [ -n "$latest" ] && nice cp -r "$CKPT/$latest" "$stage/"
  for f in params tokenizer.json config.yaml; do
    [ -e "$CKPT/$f" ] && nice cp -r "$CKPT/$f" "$stage/" 2>/dev/null
  done
  bash scripts/mirror_durable.sh "$stage" flagship_ckpt
fi

# -- 3. re-score the quality evals against the annealed weights -------------
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

# first capped-timer run (timer_max_len=256): pays ~4-8 min of fresh beam
# compiles on the first song; p50 comes from the warm songs
phase timing 900 \
  env BH_TIMER_PROFILE=1 python scripts/eval_timing.py \
    --config synth_flagship \
    --ckpt "$CKPT" --songs 6 --out EVAL_TIMING_r04.json

phase positions 300 \
  python scripts/eval_positions.py --config synth_flagship \
    --ckpt "$CKPT" --diff-ckpt "$DIT_CKPT" \
    --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 --songs 6 \
    --out EVAL_POS_r04.json

# -- 4. commit --------------------------------------------------------------
git add -A ./*_r04.json ./*_r04*.json 2>/dev/null
git diff --cached --quiet \
  || git commit -q -m "Anneal flagship cosine to completion + re-score fid/timing/positions" --no-verify
say "done ($(remaining)s before hard end); no TPU processes remain"
