#!/bin/bash
# Round-4 measurement runbook: execute the moment the TPU tunnel returns.
# Ordered cheapest-first so partial windows still land records; every step
# is individually time-bounded and failures don't block later steps.
# Usage: bash scripts/run_round4_measurements.sh [phase...]
#   phases: bench e2e timing dit classifier positions fid train-deep mfu
#   (default: bench e2e timing — the official-record trio)
set -u
cd "$(dirname "$0")/.."
PHASES="${*:-bench e2e timing}"
STAMP=$(date +%H%M%S)

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('TPU HEALTHY', float((jnp.ones((256,256))@jnp.ones((256,256))).sum()), jax.devices()[0].platform)
"
}

echo "== probe =="
probe || { echo 'TPU NOT HEALTHY — aborting'; exit 1; }

for phase in $PHASES; do
  echo "== $phase =="
  case "$phase" in
    bench)
      # official metric; AOT cache should make this fast
      timeout 3000 python bench.py | tee "BENCH_PREVIEW_r04.json"
      ;;
    e2e)
      # shipped flagship config exactly as committed (refine_entry=4,
      # bucketing live): warm p50 + fresh-song-length p50
      timeout 5400 python scripts/bench_e2e.py --config synth_flagship \
        --ckpt /tmp/flagship_ckpt --songs 3 --runs 5 --minutes 3 \
        2>/tmp/bench_e2e_r4.log | tee "BENCH_E2E_r04.json"
      ;;
    timing)
      # super-timing sweep: batched passes x timing-only early stop
      timeout 5400 python scripts/eval_timing.py --config synth_flagship \
        --ckpt /tmp/flagship_ckpt --songs 6 \
        --out EVAL_TIMING_r04.json && cat EVAL_TIMING_r04.json
      ;;
    dit)
      # conditioned DiT-B retrain on the v4 corpus (~50 min at r3 rate)
      timeout 7200 python -m beatheritage_tpu.apps.train_diffusion \
        -cn synth_b_v4 checkpoint_path=/tmp/synth_dit_b_v4_ckpt \
        max_seconds=6600
      # does the retrained DiT use the class vector? (<1 = yes)
      timeout 1800 python scripts/eval_dit_conditioning.py \
        --config synth_b_v4 --ckpt /tmp/synth_dit_b_v4_ckpt \
        --dataset /tmp/synth_mmrs_v4 --start 560 --end 600 \
        --out EVAL_DIT_COND_r04.json && cat EVAL_DIT_COND_r04.json
      # spacing-guidance A/B through the real refiner on-device
      timeout 3600 python scripts/refine_ab.py \
        --diff-ckpt /tmp/synth_dit_b_v4_ckpt --dataset /tmp/synth_mmrs_v4 \
        --start 560 --end 600 --maps 6 --weights 0 0.1 0.2 \
        --out REFINE_AB_r04.json && cat REFINE_AB_r04.json
      ;;
    classifier)
      # token-only instrument (models/classifier.py): the FID features are
      # computed with silent audio, so this is the config in actual use;
      # device=tpu overrides the config's 1-core-host pin
      kill "$(cat /tmp/clf_v4_cpu.pid 2>/dev/null)" 2>/dev/null || true
      kill "$(cat /tmp/clf_tokens.pid 2>/dev/null)" 2>/dev/null || true
      timeout 7200 python -m beatheritage_tpu.apps.train_classifier \
        -cn synth_classifier_tokens device=tpu optim.total_steps=20000 \
        checkpoint_path=/tmp/synth_classifier_tokens_tpu
      timeout 1800 python scripts/eval_classifier.py \
        --config synth_classifier_tokens \
        --ckpt /tmp/synth_classifier_tokens_tpu_best \
        --dataset /tmp/synth_mmrs_v4 --start 560 --end 600 \
        --out EVAL_CLASSIFIER_r04.json && cat EVAL_CLASSIFIER_r04.json
      ;;
    positions)
      # on-device rescore incl. slider-end projection + refine_entry=4
      timeout 5400 python scripts/eval_positions.py --config synth_flagship \
        --ckpt /tmp/flagship_ckpt --diff-ckpt /tmp/synth_dit_b_v4_ckpt \
        --dataset /tmp/synth_mmrs_v4 --start 560 --end 600 --songs 6 \
        --out EVAL_POS_r04.json && cat EVAL_POS_r04.json
      ;;
    fid)
      # instrument calibration first: real-vs-real floor with the SAME
      # features — any generated-vs-real FID is read against this
      CLF_CKPT=/tmp/synth_classifier_tokens_tpu_best
      [ -d "$CLF_CKPT" ] || CLF_CKPT=/tmp/synth_classifier_tokens_v5_best
      [ -d "$CLF_CKPT" ] || CLF_CKPT=/tmp/synth_classifier_tokens_best
      # generate fresh outputs first, then calibrate + score everything
      # (floor, matched-N floors, all generated dirs) with one feature pass
      timeout 5400 python -m beatheritage_tpu.apps.calc_fid -cn synth_flagship \
        classifier_ckpt="$CLF_CKPT" \
        classifier_config=synth_classifier_tokens \
        inference.output_path=/tmp/fid_out_r4 \
        dataset_path=/tmp/synth_mmrs_v4 dataset_start=560 dataset_end=600 \
        2>&1 | tail -20
      timeout 3600 python scripts/fid_floor.py \
        --config synth_classifier_tokens --ckpt "$CLF_CKPT" \
        --dataset /tmp/synth_mmrs_v4 \
        --gen-dir /tmp/fid_out_r4 \
        --gen-dir /tmp/eval_positions_out/coarse \
        --gen-dir /tmp/eval_positions_out/refined \
        --out FID_FLOOR_r04.json && cat FID_FLOOR_r04.json
      ;;
    generation)
      # generation-regime DiT (full t range): positions from noise on
      # held-out skeletons + a real ranked map (CPU-capable)
      timeout 7200 python scripts/eval_generation.py --device cpu \
        --diff-ckpt /tmp/synth_dit_xs_gen_ckpt \
        --diffusion-config synth_xs_gen_v5_cpu \
        --dataset /tmp/synth_mmrs_v5 --maps 4 \
        --beatmap /root/reference/osu_diffusion/testing/toy_datasets/kimi_no_bouken.osu \
        --out EVAL_GENERATION_r04_cpu.json && cat EVAL_GENERATION_r04_cpu.json
      ;;
    train-deep)
      # flagship deepening: resumes from the latest state_N automatically
      timeout 28800 python -m beatheritage_tpu.apps.train -cn synth_flagship \
        optim.total_steps=30000 checkpoint_path=/tmp/flagship_ckpt \
        max_seconds=28000
      ;;
    mfu)
      timeout 3600 python scripts/bench_train.py --batch 28 --steps 12 \
        2>&1 | tail -5
      # remat-policy A/B: 'dots' saves MXU outputs in the bwd (more memory,
      # less recompute) — batch 24 leaves headroom for the saved buffers
      timeout 3600 python scripts/bench_train.py --batch 24 --steps 12 \
        --override remat_policy=dots 2>&1 | tail -5
      timeout 3600 python scripts/bench_train.py --batch 24 --steps 12 \
        2>&1 | tail -5
      timeout 1200 python scripts/profile_decode.py --windows 24 \
        --trace-dir "/tmp/decode_trace_$STAMP"
      timeout 1200 python scripts/profile_decode.py --windows 24 --unroll \
        --trace-dir "/tmp/decode_trace_unroll_$STAMP"
      ;;
    *) echo "unknown phase $phase";;
  esac
done
echo "== runbook done =="
