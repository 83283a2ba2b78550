#!/bin/bash
# Round-4 TPU queue v2: runs the full post-flagship training + measurement
# chain unattended, back-to-back, so the single chip never idles between
# phases. Waits for the flagship trainer (pidfile) to exit first.
#
# v2 additions over v1:
#   - HARD WALL-CLOCK DEADLINE (DEADLINE_EPOCH): a phase only starts if its
#     expected cost fits before the deadline, and its timeout is clamped to
#     the remaining budget. Nothing TPU-bound may be alive when the driver's
#     round-end bench runs (the r3 official bench died to a wedged claim).
#   - VERDICT-priority ordering: e2e/timing/positions (the headline
#     measurements) run before the auxiliary trainings/evals.
#   - calc_fid + MFU phases appended (previously "run interactively").
# Every phase logs to /tmp/r4q_<phase>.log; a failure does not block later
# phases. Results land as *_r04.json at the repo root.
set -u
cd "$(dirname "$0")/.."

FLAGSHIP_PID_FILE="${FLAGSHIP_PID_FILE:-/tmp/flagship_train.pid}"
FLAGSHIP_CKPT=/tmp/flagship_ckpt
DIT_CKPT=/tmp/synth_dit_b_v4_ckpt
CLF_CKPT=/tmp/synth_classifier_tokens_v5
RC_CKPT=/tmp/synth_rcomplexion_ckpt
# default: 7.5 h from launch; the launcher passes the real round deadline
DEADLINE_EPOCH="${DEADLINE_EPOCH:-$(( $(date +%s) + 27000 ))}"

say() { echo "[r4q $(date +%H:%M:%S)] $*"; }
remaining() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

# phase <name> <expected_s> <cap_s> <cmd...>
# Starts only if expected_s fits before the deadline; clamps timeout to the
# remaining budget so nothing outlives DEADLINE_EPOCH.
phase() {
  local name=$1 est=$2 cap=$3; shift 3
  local rem; rem=$(remaining)
  if [ "$rem" -lt "$est" ]; then
    say "SKIP $name (needs ~${est}s, ${rem}s left)"
    return 1
  fi
  local t=$cap; [ "$rem" -lt "$cap" ] && t=$rem
  say "phase $name (timeout ${t}s, ${rem}s to deadline)"
  timeout --signal=TERM --kill-after=60 "$t" "$@" \
    > "/tmp/r4q_${name}.log" 2>&1
  say "$name rc=$?"
}

# -- 0. wait for the flagship trainer to exit cleanly -----------------------
if [ -f "$FLAGSHIP_PID_FILE" ]; then
  fpid=$(cat "$FLAGSHIP_PID_FILE")
  say "waiting for flagship trainer pid $fpid (deadline $(date -d "@$DEADLINE_EPOCH" +%H:%M:%S))"
  while kill -0 "$fpid" 2>/dev/null; do
    if [ "$(remaining)" -lt 1200 ]; then
      say "deadline imminent — stopping flagship trainer now"
      kill -TERM "$fpid" 2>/dev/null
      sleep 120
    fi
    sleep 60
  done
  say "flagship trainer exited"
fi
ls "$FLAGSHIP_CKPT" 2>/dev/null | tail -3

# durable mirror: only a git COMMIT survives VM restarts (untracked files,
# even in the repo tree, are wiped by the restore — learned twice).
# Stage latest state_N + params + tokenizer, then commit via mirror_durable.
mirror_ckpt() {  # <ckpt_dir> <name>
  local ckpt=$1 name=$2 latest stage
  [ -d "$ckpt" ] || { say "mirror: $ckpt missing"; return 0; }
  # sort by the basename's step number — sorting full paths on -t_ -k2
  # picks a non-numeric field (the path's own underscores) and degrades to
  # lexicographic order (state_5000 > state_29600); bit us on the DiT mirror
  latest=$(ls "$ckpt" 2>/dev/null | grep '^state_' | sort -t_ -k2 -n | tail -1)
  [ -n "$latest" ] && latest="$ckpt/$latest"
  stage=/tmp/mirror_stage_$name
  rm -rf "$stage"; mkdir -p "$stage"
  [ -n "$latest" ] && nice cp -r "$latest" "$stage/"
  for f in params tokenizer.json diffusion_tokenizer.json config.yaml; do
    [ -e "$ckpt/$f" ] && nice cp -r "$ckpt/$f" "$stage/" 2>/dev/null
  done
  bash scripts/mirror_durable.sh "$stage" "$name"
}
say "mirroring flagship checkpoint into git"
mirror_ckpt "$FLAGSHIP_CKPT" flagship_ckpt

# -- 1. conditioned DiT-B on the v4 corpus (VERDICT item 2) -----------------
# needed by e2e (diff_ckpt in synth_flagship) and positions; ~47 min at the
# r3 rate (30k steps @ 10.7 it/s)
phase dit_train 2700 5700 \
  python -m beatheritage_tpu.apps.train_diffusion \
    -cn synth_b_v4 checkpoint_path="$DIT_CKPT" max_seconds=5400
mirror_ckpt "$DIT_CKPT" synth_dit_b_v4_ckpt

# -- 2. e2e latency with the shipped config (VERDICT item 3) ----------------
phase e2e 1800 4500 \
  python scripts/bench_e2e.py --config synth_flagship \
    --ckpt "$FLAGSHIP_CKPT" --songs 3 --runs 5 --minutes 3 \
    --out /tmp/bench_e2e_r4
[ -s /tmp/r4q_e2e.log ] && grep -m1 '"metric"' /tmp/r4q_e2e.log \
  > BENCH_E2E_r04.json 2>/dev/null

# -- 2b. official-metric preview: warms the cross-process AOT cache so the
# driver's round-end bench run is compile-free, and records the number now
# (VERDICT item 1). Cold remote compiles take 10-15 min; warm reruns ~2 min.
phase bench_preview 2400 3600 python bench.py
[ -s /tmp/r4q_bench_preview.log ] && grep -m1 '"metric"' \
  /tmp/r4q_bench_preview.log > BENCH_PREVIEW_r04.json 2>/dev/null

# -- 3. super-timing sweep latency (VERDICT item 4) --------------------------
phase timing 1500 3600 \
  python scripts/eval_timing.py --config synth_flagship \
    --ckpt "$FLAGSHIP_CKPT" --songs 6 --out EVAL_TIMING_r04.json

# -- 4. on-device position rescore with the conditioned refiner -------------
phase positions 1800 4500 \
  python scripts/eval_positions.py --config synth_flagship \
    --ckpt "$FLAGSHIP_CKPT" --diff-ckpt "$DIT_CKPT" \
    --dataset /tmp/synth_mmrs_v3 --start 185 --end 200 --songs 6 \
    --out EVAL_POS_r04.json

# -- 5. token classifier on the v5 corpus (FID instrument) ------------------
phase classifier 1800 3600 \
  python -m beatheritage_tpu.apps.train_classifier \
    -cn synth_classifier_tokens device=tpu \
    data.train_dataset_path=/tmp/synth_mmrs_v5 data.train_dataset_end=1120 \
    data.test_dataset_path=/tmp/synth_mmrs_v5 data.test_dataset_start=1120 \
    data.test_dataset_end=1200 \
    optim.total_steps=8000 checkpoint_path="$CLF_CKPT"
mirror_ckpt "${CLF_CKPT}_best" synth_classifier_tokens_v5_best

# -- 6. rcomplexion (rhythm-complexity metric; calc_fid input) ---------------
phase rcomplexion 900 1800 \
  python -m beatheritage_tpu.apps.train_rcomplexion -cn synth \
    data.train_dataset_path=/tmp/synth_mmrs_v3 data.train_dataset_end=185 \
    data.test_dataset_path=/tmp/synth_mmrs_v3 \
    optim.total_steps=3000 checkpoint_path="$RC_CKPT"
mirror_ckpt "$RC_CKPT" synth_rcomplexion_ckpt

# -- 7. classifier held-out score -------------------------------------------
phase clf_eval 600 1500 \
  python scripts/eval_classifier.py \
    --config synth_classifier_tokens --ckpt "${CLF_CKPT}_best" \
    --dataset /tmp/synth_mmrs_v5 --start 1120 --end 1200 \
    --out EVAL_CLASSIFIER_r04.json

# -- 8. generated-vs-real FID + rhythm with the calibrated instrument -------
phase calc_fid 2400 4200 \
  python -m beatheritage_tpu.apps.calc_fid -cn synth_flagship \
    inference.model_path="$FLAGSHIP_CKPT" \
    inference.output_path=/tmp/fid_out_r04
cp /tmp/fid_out_r04/fid_report.json EVAL_r04.json 2>/dev/null

# -- 8b. matched-sample-size FID floor for the generated dir ----------------
phase fid_floor 600 1500 \
  python scripts/fid_floor.py --config synth_classifier_tokens \
    --ckpt "${CLF_CKPT}_best" --dataset /tmp/synth_mmrs_v5 \
    --gen-dir /tmp/fid_out_r04 --out FID_FLOOR_r04.json

# -- 9. DiT conditioning ablation (is the class vector used?) ---------------
phase dit_cond 900 1800 \
  python scripts/eval_dit_conditioning.py \
    --config synth_b_v4 --ckpt "$DIT_CKPT" \
    --dataset /tmp/synth_mmrs_v4 --start 560 --end 600 \
    --out EVAL_DIT_COND_r04.json

# -- 10. MFU on the flagship train step (VERDICT item 7) --------------------
# A/B the remat policy: default full remat vs 'dots' (save MXU outputs in
# the backward — trades HBM for recompute FLOPs)
phase mfu 900 1800 \
  python scripts/bench_train.py --config synth_flagship --batch 28 --steps 30
phase mfu_dots 900 1800 \
  python scripts/bench_train.py --config synth_flagship --batch 28 --steps 30 \
    --override remat_policy=dots

# -- 10b. decode-throughput probes (only if budget remains): int8 KV cache
# and a 32-window batch — each compiles a fresh program (~12 min remote)
# and, if faster, becomes the new bench.py default (the probe itself warms
# the AOT cache the driver's round-end bench would then hit)
phase bench_kvq 1500 2700 env BENCH_KV_QUANT=1 BENCH_MAX_ATTEMPTS=1 \
  python bench.py
[ -s /tmp/r4q_bench_kvq.log ] && grep -m1 '"metric"' \
  /tmp/r4q_bench_kvq.log > BENCH_PROBE_KVQ_r04.json 2>/dev/null
phase bench_n32 1500 2700 env BENCH_N_WINDOWS=32 BENCH_MAX_ATTEMPTS=1 \
  python bench.py
[ -s /tmp/r4q_bench_n32.log ] && grep -m1 '"metric"' \
  /tmp/r4q_bench_n32.log > BENCH_PROBE_N32_r04.json 2>/dev/null

# -- 11. commit every result JSON (a VM restart wipes uncommitted files) ----
git add -A ./*_r04.json ./*_r04*.json 2>/dev/null
git diff --cached --quiet \
  || git commit -q -m "Round-4 measurement results (unattended queue)" --no-verify

say "queue done ($(remaining)s before deadline); no TPU processes remain"
