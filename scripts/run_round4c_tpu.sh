#!/bin/bash
# Round-4 chain, part C — opportunistic tail: after part B drains, run the
# seed-2 dwt_dec Table-1 arm if enough wall clock remains (B skips it when
# its FID milestone leg runs long).  Idempotent: if B already ran the arm,
# train() resumes at its final checkpoint and exits immediately.
#
# Usage: bash scripts/run_round4c_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-14400}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r4c_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

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

set -x

# ---- Leg 0: wait for part B to drain
while pgrep -f '[r]un_round4b_tpu' > /dev/null; do sleep 30; done

# ---- Leg 1: seed-2 dwt_dec arm, only with >= 80 min of budget left
if [ "$(left)" -gt 4800 ]; then
  OV="model.dwt_encoder=true model.n_extra_resnet_layers=3"
  LOG=runs/t1s2_dwt_dec
  for attempt in 1 2 3; do
    halt; probe || exit 1
    if python -m unet_design_tpu.tasks.pde --config $CFG $OV $COMMON $TUNE \
        train.seed=2 train.logdir=$LOG; then break; fi
    echo "dwt_dec attempt $attempt failed; resuming" >&2
    [ $attempt = 3 ] && exit 1
    sleep 180
  done
  halt; probe || exit 1
  python scripts/eval_pde.py --config $CFG --ckpt best $OV $COMMON $TUNE \
      train.seed=2 train.logdir=$LOG && summary
else
  echo "deadline: skip dwt_dec"
fi

echo R4C_CHAIN_DONE
