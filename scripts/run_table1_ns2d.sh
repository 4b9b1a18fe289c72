#!/bin/bash
# Paper Table 1 (NS-2D encoder ablation) end-to-end reproduction driver.
#
# Reference protocol (/root/reference/README.md:149-157): Unetbase-64_G,
# three encoder arms, 5200/1300/1300 trajectories, 50-epoch recipe.
# SCALE divides the trajectory counts (1 = full protocol, 2 = 1/2, 4 = 1/4);
# everything else is held constant across arms.
#
# Usage:  bash scripts/run_table1_ns2d.sh [SCALE] [SUFFIX]
#   SCALE=2 SUFFIX=half  ->  datasets/ns2d_table1_half, runs/table1h_*,
#                            docs/table1_ns2d_half.{md,json}
#
# Robustness notes (see docs/tpu_notes.md and CLAUDE.md):
# - every TPU leg is gated on a cheap probe with retries: a down tunnel
#   blocks backend init ~25 min per un-gated leg;
# - training legs retry with train.resume=true across TPU-worker crashes;
# - train.max_scan_steps bounds single device executions (the axon backend
#   kills over-long calls — observed on the dwt_dec arm at SCALE=2).
set -u
cd "$(dirname "$0")/.."
SCALE=${1:-2}
SUFFIX=${2:-half}
NTRAIN=$((5200 / SCALE)); NEVAL=$((1300 / SCALE))
D=datasets/ns2d_table1_${SUFFIX}
CFG=configs/pde_ns2d_table1.yaml
COMMON="data.data_path=$D data.stacked_cache=true train.resume=true"
TUNE="data.device_cache_max_bytes=7200000000 train.max_scan_steps=910"

probe() {
  for i in $(seq 1 40); do
    # 350s: a cold python + axon-client init through the tunnel can take
    # ~3 min on the 1-core host even when the TPU is healthy (observed
    # 2026-08-19); 180s flapped on a working tunnel.
    if timeout 350 python /tmp/tpu_probe_t1.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}
cat > /tmp/tpu_probe_t1.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF

set -x
mkdir -p "$D"
for mode in train valid test; do
  n=$NTRAIN; [ $mode != train ] && n=$NEVAL
  # datagen is idempotent per (mode, seed, count): skip if the file exists
  ls "$D" | grep -q "ns2d_${mode}_.*\.h5$" && continue
  probe || exit 1
  python scripts/generate_data.py navierstokes2d --mode $mode --samples $n \
      --nt 56 --sample-rate 4 --dirname "$D" --seed 42 || exit 1
done

for arm in classical dwt dwt_dec; do
  case $arm in
    classical) OV="model.dwt_encoder=false model.n_extra_resnet_layers=0";;
    dwt)       OV="model.dwt_encoder=true model.n_extra_resnet_layers=0";;
    dwt_dec)   OV="model.dwt_encoder=true model.n_extra_resnet_layers=3";;
  esac
  LOG=runs/table1${SUFFIX:0:1}_$arm
  for attempt in 1 2 3 4; do
    probe || exit 1
    if python -m unet_design_tpu.tasks.pde --config $CFG $OV $COMMON $TUNE \
        train.logdir=$LOG; then break; fi
    echo "$arm attempt $attempt failed; resuming" >&2
    [ $attempt = 4 ] && exit 1
    sleep 180
  done
  probe || exit 1
  python scripts/eval_pde.py --config $CFG --ckpt best $OV $COMMON $TUNE \
      train.logdir=$LOG || exit 1
done

python scripts/table1_summary.py \
  --title "NS-2D encoder ablation (1/${SCALE} scale)" \
  --out docs/table1_ns2d_${SUFFIX}.md \
  --json-out docs/table1_ns2d_${SUFFIX}.json \
  --arms "classical encoder=runs/table1${SUFFIX:0:1}_classical" \
         "DWT encoder (Multi-ResNet)=runs/table1${SUFFIX:0:1}_dwt" \
         "DWT encoder + 3 extra decoder layers=runs/table1${SUFFIX:0:1}_dwt_dec"
echo NS_TABLE1_DONE
