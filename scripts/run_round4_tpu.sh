#!/bin/bash
# Round-4 TPU chain.  Priorities (VERDICT r3 "Next round"):
#   #1 Seed-replicated Table-1 NS-2D (seeds 2,3 x 3 arms; datasets/ was
#      wiped with the environment, so the 1/4-scale datagen runs first —
#      seed 42 datagen is deterministic, so seed-1 results in
#      docs/table1_ns2d.json remain the n=1 base).
#   #2 FID+KID milestone proof at scale (50k steps, milestones
#      3k/12k/25k/50k, 10k images vs 10k-image stats, checkpoints kept).
#   #6 FNO-128-8m bs=64 train-step datapoint (arithmetic-intensity check).
#   #5 regenerate docs/modelzoo.md (generator now emits train-step table).
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): every leg is probe-gated;
# training legs retry with resume; nothing is timeout-killed mid-op; ONE TPU
# process at a time.  Stop between legs: touch /tmp/r4_stop (bench.py's
# drain guard does this automatically; fid_proof.py also honors it between
# milestones).
#
# Usage: bash scripts/run_round4_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-21600}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r4_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

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

# ---- Leg 1: NS-2D 1/4-scale datagen (idempotent; required by the arms)
mkdir -p "$D"
for mode in train valid test; do
  n=1300; [ $mode != train ] && n=325
  ls "$D" | grep -q "ns2d_${mode}_.*\.h5$" && continue
  halt; probe || exit 1
  python scripts/generate_data.py navierstokes2d --mode $mode --samples $n \
      --nt 56 --sample-rate 4 --dirname "$D" --seed 42 || exit 1
done

# ---- Leg 2: Table-1 seed-2 arms
for arm in classical dwt dwt_dec; do
  [ "$(left)" -lt 2400 ] && { echo "deadline: skip s2 $arm"; continue; }
  run_arm 2 $arm || echo "ARM s2_${arm} FAILED" >&2
done

# ---- Leg 3: FID+KID milestone proof at scale (VERDICT #2)
if [ "$(left)" -gt 8400 ]; then
  halt; probe || exit 1
  python scripts/fid_proof.py --milestones 3000,12000,25000,50000 \
      --steps 50000 --images 10000 --dataset-size 10000 \
      --logdir runs/fid_proof_r4 || echo "FID LEG FAILED" >&2
  # the scaled curve replaces the stale r2 artifact (kid file too)
  cp runs/fid_proof_r4/fid_proof.json docs/fid_proof.json 2>/dev/null || true
  cp runs/fid_proof_r4/fid_proof.json docs/fid_proof_kid.json 2>/dev/null || true
fi

# ---- Leg 4: Table-1 seed-3 arms
for arm in classical dwt dwt_dec; do
  [ "$(left)" -lt 2400 ] && { echo "deadline: skip s3 $arm"; continue; }
  run_arm 3 $arm || echo "ARM s3_${arm} FAILED" >&2
done
summary

# ---- Leg 5: FNO arithmetic-intensity datapoint (VERDICT #6)
if [ "$(left)" -gt 600 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models FNO-128-8m --dtypes bf16 \
      --batch-size 64 --out docs/models_train_step.json \
      || echo "FNO BS64 LEG FAILED" >&2
fi

# ---- Leg 6: regenerate the model-zoo doc (train-step table included now)
python scripts/generate_modelzoo.py || echo "MODELZOO LEG FAILED" >&2

echo R4_CHAIN_DONE
