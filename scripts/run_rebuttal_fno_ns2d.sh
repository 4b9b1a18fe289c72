#!/bin/bash
# Rebuttal-table FNO leg: FNO-128-8m on NS-2D (reference README.md:219-221:
# 30 epochs, warmup 5, AdamW 2e-4 / wd 1e-5, bs 8, time_history 4, seed 1).
# The U-Net rows of the rebuttal table are the Table-1 encoder-ablation arms
# (scripts/run_table1_ns2d.sh) on the SAME dataset.
#
# Usage: bash scripts/run_rebuttal_fno_ns2d.sh [DATA_DIR] [LOGDIR]
set -u
cd "$(dirname "$0")/.."
# Defaults match the executed quarter-scale artifact (runs/table1q_fno on
# the Table-1 dataset) and scripts/rebuttal_summary.py's --fno-run default.
D=${1:-datasets/ns2d_table1}
LOG=${2:-runs/table1q_fno}
CFG=configs/pde_ns2d_table1.yaml
# model.hidden_channels must be pinned: the task forwards the config value
# as a registry override, and the table1 base config carries the U-Net's 64
FNO="model.name=FNO-128-8m model.hidden_channels=128 train.num_epochs_list=[30]"
COMMON="data.data_path=$D data.stacked_cache=true train.resume=true"
TUNE="data.device_cache_max_bytes=7200000000 train.max_scan_steps=910"

probe() {
  for i in $(seq 1 40); do
    if timeout 350 python - > /dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
    then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

set -x
for attempt in 1 2 3 4; do
  probe || exit 1
  if python -m unet_design_tpu.tasks.pde --config $CFG $FNO $COMMON $TUNE \
      train.logdir=$LOG; then break; fi
  echo "fno attempt $attempt failed; resuming" >&2
  [ $attempt = 4 ] && exit 1
  sleep 180
done
probe || exit 1
python scripts/eval_pde.py --config $CFG --ckpt best $FNO $COMMON $TUNE \
    train.logdir=$LOG || exit 1
echo FNO_REBUTTAL_DONE
