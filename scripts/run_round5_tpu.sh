#!/bin/bash
# Round-5 TPU chain.  Priorities (VERDICT r4 "Next round"):
#   #1 SW-2D seed replication: regenerate datasets/shallowwater2d_2day
#      (wiped with the r3->r4 environment), then seeds 2,3 x 3 arms at the
#      fixed 1/8-scale protocol -> docs/table1_sw2d_L_seeds.md at n>=3,
#      settling the anomalous n=1 rollout ordering.
#   #3 FID curve to its stated protocol: resume runs/fid_proof_r4 from the
#      kept 25k checkpoint to 50k steps, score the new milestone, then
#      --rescore ALL milestones at 50k images (the reference eval count,
#      diff_cifar/config/CIFAR10.txt:22).
#   #2 Third NS-2D seed x 3 arms (opportunistic per-arm: each ~1.5 h; any
#      completed arm immediately improves docs/table1_ns2d_seeds.md).
#   #4 Staged (multi-stage) CIFAR FID/KID milestones (opportunistic).
#   #8 Rebuttal FNO seed 2 (opportunistic tail).
# Ordering note: FID (#3) is placed before the NS-2D arms (#2) because it
# completes a whole verdict item in ~1.5-2 h while the three NS arms
# (~4.5 h) cannot all fit after the SW leg anyway; NS arms are per-arm
# incremental so whatever time remains still lands in the seed table.
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): every leg is probe-gated;
# training legs retry with resume; nothing is timeout-killed mid-op; ONE TPU
# process at a time.  Stop between legs: touch /tmp/r5_stop.
#
# Usage: bash scripts/run_round5_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
rm -f /tmp/r5_stop   # own stop file only (ADVICE r4: stale stop files wedge chains)
DEADLINE=${1:-26000}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r5_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

SWD=datasets/shallowwater2d_2day
SWCFG=configs/pde_shallowwater2d_2day.yaml
SWCOMMON="data.data_path=$SWD data.stacked_cache=true train.resume=true"

NSD=datasets/ns2d_table1_quarter
NSCFG=configs/pde_ns2d_table1.yaml
NSCOMMON="data.data_path=$NSD data.stacked_cache=true train.resume=true"
NSTUNE="data.device_cache_max_bytes=7200000000 train.max_scan_steps=910"

cat > /tmp/tpu_probe_r5.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r5.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

arm_overrides() {
  case $1 in
    classical) echo "model.dwt_encoder=false model.n_extra_resnet_layers=0";;
    dwt)       echo "model.dwt_encoder=true model.n_extra_resnet_layers=0";;
    dwt_dec)   echo "model.dwt_encoder=true model.n_extra_resnet_layers=3";;
  esac
}

sw_summary() {
  python scripts/table1_seed_summary.py \
    --base-json docs/table1_sw2d_L.json --base-label seed0 \
    --arms "classical encoder=runs/sw_s2_classical,runs/sw_s3_classical" \
           "DWT encoder (Multi-ResNet)=runs/sw_s2_dwt,runs/sw_s3_dwt" \
           "DWT encoder + 3 extra decoder layers=runs/sw_s2_dwt_dec,runs/sw_s3_dwt_dec" \
    --title "Shallow-water 2-day encoder ablation, seed-replicated" \
    --detail "1/8-scale fixed protocol (700/175/175 self-generated 96x192 trajectories, 2-day [4::8] cadence), 20-epoch recipe; mean +/- sample std across training seeds" \
    --out docs/table1_sw2d_L_seeds.md --json-out docs/table1_sw2d_L_seeds.json || true
}

ns_summary() {
  python scripts/table1_seed_summary.py \
    --base-json docs/table1_ns2d.json --base-label seed1 \
    --arms "classical encoder=runs/t1s2_classical,runs/t1s3_classical" \
           "DWT encoder (Multi-ResNet)=runs/t1s2_dwt,runs/t1s3_dwt" \
           "DWT encoder + 3 extra decoder layers=runs/t1s2_dwt_dec,runs/t1s3_dwt_dec" \
    --out docs/table1_ns2d_seeds.md --json-out docs/table1_ns2d_seeds.json || true
}

run_pde_arm() {  # run_pde_arm <cfg> <common> <tune> <logdir> <seed> <arm> <summary_fn>
  local cfg=$1 common=$2 tune=$3 LOG=$4 seed=$5 arm=$6 summ=$7 OV
  OV=$(arm_overrides $arm)
  for attempt in 1 2 3 4; do
    halt; probe || return 1
    if python -m unet_design_tpu.tasks.pde --config $cfg $OV $common $tune \
        train.seed=$seed train.logdir=$LOG; then break; fi
    echo "$LOG attempt $attempt failed; resuming" >&2
    [ $attempt = 4 ] && return 1
    sleep 180
  done
  halt; probe || return 1
  python scripts/eval_pde.py --config $cfg --ckpt best $OV $common $tune \
      train.seed=$seed train.logdir=$LOG || return 1
  $summ
}

set -x

# ---- Leg 1: SW-2D 1/8-scale datagen (idempotent; deterministic seed 42
#      fold_in(mode, traj_idx) stream — batch size does not affect content)
mkdir -p "$SWD"
swgen() {  # swgen <mode> <n>
  local have
  have=$(ls "$SWD" 2>/dev/null | grep -c "^$1_seed.*\.npz$")
  [ "$have" -ge "$2" ] && return 0
  halt; probe || return 1
  python scripts/generate_data.py shallowwater --mode $1 --samples $2 \
      --batch-size 8 --dirname "$SWD" --seed 42
}
swgen train 700 || exit 1
swgen valid 175 || exit 1
swgen test 175 || exit 1

# ---- Leg 2: SW-2D arms, seeds 2 and 3 (VERDICT #1)
for seed in 2 3; do
  for arm in classical dwt dwt_dec; do
    [ "$(left)" -lt 1500 ] && { echo "deadline: skip sw s${seed} $arm"; continue; }
    run_pde_arm $SWCFG "$SWCOMMON" "" runs/sw_s${seed}_$arm $seed $arm sw_summary \
      || echo "ARM sw_s${seed}_${arm} FAILED" >&2
  done
done
sw_summary

# ---- Leg 3: FID curve to protocol — 50k steps, then 50k-image rescore
#      of every kept milestone (VERDICT #3)
if [ "$(left)" -gt 5400 ]; then
  halt; probe || exit 1
  python scripts/fid_proof.py --milestones 50000 --steps 50000 --resume \
      --images 10000 --dataset-size 10000 --logdir runs/fid_proof_r4 \
      || echo "FID 50K LEG FAILED" >&2
  cp runs/fid_proof_r4/fid_proof.json docs/fid_proof.json 2>/dev/null || true
  cp runs/fid_proof_r4/fid_proof.json docs/fid_proof_kid.json 2>/dev/null || true
fi
if [ "$(left)" -gt 3600 ]; then
  halt; probe || exit 1
  python scripts/fid_proof.py --rescore --milestones 3000,12000,25000,50000 \
      --images 50000 --dataset-size 10000 --logdir runs/fid_proof_r4 \
      || echo "FID RESCORE LEG FAILED" >&2
  cp runs/fid_proof_r4/fid_proof_rescore_50000.json \
     docs/fid_proof_rescore_50000.json 2>/dev/null || true
fi

# ---- Leg 4: NS-2D seed-3 arms (VERDICT #2; per-arm opportunistic)
for arm in classical dwt dwt_dec; do
  [ "$(left)" -lt 6000 ] && { echo "deadline: skip ns s3 $arm"; continue; }
  run_pde_arm $NSCFG "$NSCOMMON" "$NSTUNE" runs/t1s3_$arm 3 $arm ns_summary \
    || echo "ARM t1s3_${arm} FAILED" >&2
done
ns_summary

# ---- Leg 5: staged CIFAR FID/KID milestones (VERDICT #4; opportunistic).
# 4 stages so the 4-level model reaches full 32px resolution
# (reference flagship: NUM_ITERATIONS_LIST 50000 50000 50000 1500003,
# README.md:203); total 25k steps matches the single-stage 25k point of
# runs/fid_proof_r4 for a matched-total-steps comparison.
if [ "$(left)" -gt 7200 ]; then
  halt; probe || exit 1
  python scripts/fid_proof.py --stages 3000,3000,4000,15000 --images 10000 \
      --dataset-size 10000 --logdir runs/fid_staged_r5 \
      || echo "STAGED FID LEG FAILED" >&2
  cp runs/fid_staged_r5/fid_proof.json docs/fid_staged.json 2>/dev/null || true
fi

# ---- Leg 6: rebuttal FNO seed 2 (VERDICT #8; opportunistic tail)
if [ "$(left)" -gt 4500 ]; then
  FNO="model.name=FNO-128-8m model.hidden_channels=128 train.num_epochs_list=[30]"
  LOG=runs/table1q_fno_s2
  for attempt in 1 2 3 4; do
    halt; probe || exit 1
    if python -m unet_design_tpu.tasks.pde --config $NSCFG $FNO $NSCOMMON \
        $NSTUNE train.seed=2 train.logdir=$LOG; then break; fi
    echo "fno s2 attempt $attempt failed; resuming" >&2
    [ $attempt = 4 ] && break
    sleep 180
  done
  halt; probe || exit 1
  python scripts/eval_pde.py --config $NSCFG --ckpt best $FNO $NSCOMMON \
      $NSTUNE train.seed=2 train.logdir=$LOG \
    && python scripts/rebuttal_summary.py || echo "REBUTTAL LEG FAILED" >&2
fi

echo R5_CHAIN_DONE
