#!/bin/bash
# Round-3 TPU chain, reordered for a ~2h session budget.  Priorities:
#   1. Conditioned-PDE end-to-end run (VERDICT #10 — bounded, closes an item).
#   2. fwd+bwd benchmark sweep over the full registry (VERDICT #6 — resumable,
#      incremental writes; every minute adds entries).
#   3. train-step sweep (VERDICT #6b / feeds #7 FNO-MFU analysis).
#   4. NS-2D 1/4-scale datagen + Table-1 seed arms (VERDICT #2 — an
#      investment for follow-on sessions; arms are crash-resumable).
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): every leg is probe-gated;
# training legs retry with train.resume=true; nothing is timeout-killed
# mid-op; ONE TPU process at a time.  Stop between legs: touch /tmp/r3_stop.
#
# Usage: bash scripts/run_round3b_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-5700}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r3_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

D=datasets/ns2d_table1_quarter
CFG=configs/pde_ns2d_table1.yaml
COMMON="data.data_path=$D data.stacked_cache=true train.resume=true"
TUNE="data.device_cache_max_bytes=7200000000 train.max_scan_steps=910"

cat > /tmp/tpu_probe_r3.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r3.py > /dev/null 2>&1; then return 0; fi
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

set -x

# ---- Leg 1: conditioned-PDE end-to-end (datagen idempotent, run resumable)
CD=datasets/ns2d_cond
mkdir -p $CD
i=0
for buo in 0.2 0.35 0.5; do
  i=$((i+1))
  ls $CD | grep -q "ns2d_train_4${i}_${buo}.*\.h5$" || {
    halt; probe || exit 1
    python scripts/generate_data.py navierstokes2d --mode train \
      --samples 64 --nt 56 --sample-rate 1 --dirname $CD \
      --seed 4$i --buoyancy-y $buo || exit 1
  }
  ls $CD | grep -q "ns2d_valid_4${i}_${buo}.*\.h5$" || {
    halt; probe || exit 1
    python scripts/generate_data.py navierstokes2d --mode valid \
      --samples 16 --nt 56 --sample-rate 1 --dirname $CD \
      --seed 4$i --buoyancy-y $buo || exit 1
  }
done
halt; probe || exit 1
python -m unet_design_tpu.tasks.cond_pde \
  --config configs/cond_pde_navierstokes2d.yaml \
  data.data_path=$CD train.epochs=10 train.val_every_epochs=5 \
  train.logdir=runs/cond_pde_ns2d \
  && python scripts/cond_pde_summary.py --run runs/cond_pde_ns2d \
       --detail "Unetmod-64 + scalar buoyancy conditioning; 192 train / 48 valid self-generated 128px trajectories across buoyancy 0.2/0.35/0.5, 10 epochs (reference recipe configs/cond_navierstokes2d.yaml at reduced scale)." \
  || echo "COND LEG FAILED" >&2

# ---- Leg 2: fwd+bwd sweep (resumable, incremental)
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/bwdbench.py --skip-existing \
      --out docs/models_fwd_bwd_time.json || echo "BWD SWEEP FAILED" >&2
fi

# ---- Leg 3: train-step sweep (resumable, incremental)
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models all --dtypes bf16 --skip-existing \
      --out docs/models_train_step.json || echo "TRAIN SWEEP FAILED" >&2
fi

# ---- Leg 4: NS-2D datagen (idempotent; investment for seed arms)
mkdir -p "$D"
for mode in train valid test; do
  n=1300; [ $mode != train ] && n=325
  ls "$D" | grep -q "ns2d_${mode}_.*\.h5$" && continue
  [ "$(left)" -lt 600 ] && { echo "deadline: skip datagen $mode"; continue; }
  halt; probe || exit 1
  python scripts/generate_data.py navierstokes2d --mode $mode --samples $n \
      --nt 56 --sample-rate 4 --dirname "$D" --seed 42 || exit 1
done

# ---- Leg 5: Table-1 seed arms, as many as fit
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

for seed in 2 3; do
  for arm in classical dwt dwt_dec; do
    if [ "$(left)" -lt 2400 ]; then echo "deadline: skip s${seed} $arm"; continue; fi
    run_arm $seed $arm || echo "ARM s${seed}_${arm} FAILED" >&2
  done
done
summary
echo R3B_CHAIN_DONE
