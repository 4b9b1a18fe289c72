#!/bin/bash
# Round-5c tail chain: rebuttal FNO seed 2 (VERDICT r4 #8).
# Regenerates the wiped NS-2D 1/4-scale dataset (~12 min on-chip), trains
# FNO-128-8m with the reference rebuttal recipe at seed 2, evals on test,
# and merges with the PRESERVED seed-1 metrics (docs/table1_rebuttal.json)
# into an n=2 mean+/-std FNO row.
#
# Drain-safety: pde.train now exits 0 on a bench stop file after
# checkpointing, so "train exited 0" does NOT mean "arm finished" — the
# loop checks the completed epoch count and resumes until epoch 29 exists.
#
# Usage: bash scripts/run_round5c_tpu.sh
set -u
cd "$(dirname "$0")/.."

D=datasets/ns2d_table1_quarter
CFG=configs/pde_ns2d_table1.yaml
FNO="model.name=FNO-128-8m model.hidden_channels=128 train.num_epochs_list=[30]"
COMMON="data.data_path=$D data.stacked_cache=true train.resume=true"
TUNE="data.device_cache_max_bytes=7200000000 train.max_scan_steps=910"
LOG=runs/table1q_fno_s2

cat > /tmp/tpu_probe_r5c.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r5c.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}
halt() { [ -f /tmp/r5_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }
done_epoch() {
  python - <<'EOF'
from unet_design_tpu.train.checkpoint import CheckpointManager
s = CheckpointManager("runs/table1q_fno_s2/ckpt_latest").latest_step()
print(-1 if s is None else s)
EOF
}

set -x

# ---- Leg 1: NS-2D 1/4-scale datagen (idempotent, deterministic seed 42)
mkdir -p "$D"
for mode in train valid test; do
  n=1300; [ $mode != train ] && n=325
  ls "$D" | grep -q "ns2d_${mode}_.*\.h5$" && continue
  halt; probe || exit 1
  python scripts/generate_data.py navierstokes2d --mode $mode --samples $n \
      --nt 56 --sample-rate 4 --dirname "$D" --seed 42 || exit 1
done

# ---- Leg 2: FNO seed-2 train, resuming until all 30 epochs are done
for attempt in 1 2 3 4 5 6; do
  halt; probe || exit 1
  python -m unet_design_tpu.tasks.pde --config $CFG $FNO $COMMON $TUNE \
      train.seed=2 train.logdir=$LOG
  [ "$(done_epoch)" = "29" ] && break
  echo "fno s2 attempt $attempt: epochs incomplete ($(done_epoch)); resuming" >&2
  [ $attempt = 6 ] && exit 1
  sleep 120
done

# ---- Leg 3: eval + n=2 summary
halt; probe || exit 1
python scripts/eval_pde.py --config $CFG --ckpt best $FNO $COMMON $TUNE \
    train.seed=2 train.logdir=$LOG || exit 1
python scripts/rebuttal_summary.py --fno-run $LOG \
    --fno-prev-json docs/table1_rebuttal.json || exit 1
echo R5C_CHAIN_DONE
