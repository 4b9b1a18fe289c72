#!/bin/bash
# Round-4 chain, part B — reallocated after measuring the real arm cost
# (~105 min/arm at the fixed 1/4-scale protocol, not the planned ~30):
#   1. FID+KID milestone proof at scale (VERDICT #2 — unlanded twice; 50k
#      steps, milestones 3k/12k/25k/50k, 10k images vs 10k-image stats).
#   2. Table-1 seed-2 dwt_dec arm (the "winning" arm of the headline
#      ordering; classical already has seed 2 from part A).
#   3. Seed-2 dwt arm if time allows.
#   4. FNO-128-8m bs=64 intensity datapoint + modelzoo regen.
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): probe-gated legs, resume
# on retry, no timeout-kills mid-op, ONE TPU process at a time.  Stop
# between legs: touch /tmp/r4_stop (bench.py drain guard does this;
# fid_proof.py honors it between milestones).
#
# Usage: bash scripts/run_round4b_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-16500}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r4b_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

D=datasets/ns2d_table1_quarter
CFG=configs/pde_ns2d_table1.yaml
COMMON="data.data_path=$D data.stacked_cache=true train.resume=true"
TUNE="data.device_cache_max_bytes=7200000000 train.max_scan_steps=910"

cat > /tmp/tpu_probe_r4.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r4.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

summary() {
  python scripts/table1_seed_summary.py \
    --base-json docs/table1_ns2d.json --base-label seed1 \
    --arms "classical encoder=runs/t1s2_classical,runs/t1s3_classical" \
           "DWT encoder (Multi-ResNet)=runs/t1s2_dwt,runs/t1s3_dwt" \
           "DWT encoder + 3 extra decoder layers=runs/t1s2_dwt_dec,runs/t1s3_dwt_dec" \
    --out docs/table1_ns2d_seeds.md --json-out docs/table1_ns2d_seeds.json || true
}

run_arm() {  # run_arm <seed> <arm>
  local seed=$1 arm=$2 OV LOG
  case $arm in
    classical) OV="model.dwt_encoder=false model.n_extra_resnet_layers=0";;
    dwt)       OV="model.dwt_encoder=true model.n_extra_resnet_layers=0";;
    dwt_dec)   OV="model.dwt_encoder=true model.n_extra_resnet_layers=3";;
  esac
  LOG=runs/t1s${seed}_$arm
  for attempt in 1 2 3 4; do
    halt; probe || return 1
    if python -m unet_design_tpu.tasks.pde --config $CFG $OV $COMMON $TUNE \
        train.seed=$seed train.logdir=$LOG; then break; fi
    echo "seed $seed $arm attempt $attempt failed; resuming" >&2
    [ $attempt = 4 ] && return 1
    sleep 180
  done
  halt; probe || return 1
  python scripts/eval_pde.py --config $CFG --ckpt best $OV $COMMON $TUNE \
      train.seed=$seed train.logdir=$LOG || return 1
  summary
}

set -x

# ---- Leg 0: wait for part A to drain (bracketed pattern: no self-match)
# and for its stop file to be cleared (so fid_proof's milestone loop,
# which honors /tmp/r4_stop, starts clean)
while pgrep -f '[r]un_round4_tpu' > /dev/null || [ -f /tmp/r4_stop ]; do
  sleep 20
done

# ---- Leg 1: FID+KID milestone proof at scale (VERDICT #2)
halt; probe || exit 1
python scripts/fid_proof.py --milestones 3000,12000,25000,50000 \
    --steps 50000 --images 10000 --dataset-size 10000 \
    --logdir runs/fid_proof_r4 || echo "FID LEG FAILED" >&2
cp runs/fid_proof_r4/fid_proof.json docs/fid_proof.json 2>/dev/null || true
cp runs/fid_proof_r4/fid_proof.json docs/fid_proof_kid.json 2>/dev/null || true

# ---- Leg 2: seed-2 dwt_dec arm (the "winning" arm; ~60-70 min measured)
if [ "$(left)" -gt 4500 ]; then
  run_arm 2 dwt_dec || echo "ARM s2_dwt_dec FAILED" >&2
fi

# ---- Leg 3: seed-2 dwt arm if time allows
if [ "$(left)" -gt 4500 ]; then
  run_arm 2 dwt || echo "ARM s2_dwt FAILED" >&2
fi
summary

# ---- Leg 4: FNO arithmetic-intensity datapoint (VERDICT #6)
if [ "$(left)" -gt 600 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models FNO-128-8m --dtypes bf16 \
      --batch-size 64 --out docs/models_train_step.json \
      || echo "FNO BS64 LEG FAILED" >&2
fi

# ---- Leg 5: regenerate the model-zoo doc (train-step table included now)
python scripts/generate_modelzoo.py || echo "MODELZOO LEG FAILED" >&2

echo R4B_CHAIN_DONE
