#!/bin/bash
# Round-3 continuation TPU chain (fresh session; runs/ and datasets/ were
# wiped with the environment).  Priorities from VERDICT r2:
#   1. FNO train-step MFU attribution (#7) — bounded, closes the item.
#   2. FNO-family train-step refresh post spectral-fusion (the existing
#      entries in docs/models_train_step.json predate ops/spectral.py's
#      fused _mode_mix_ri single-einsum form).
#   3. Complete the train-step sweep over the full registry (#6).
#   4. Regenerate the model-zoo doc.
#   5. Leftover time: NS-2D 1/4-scale datagen (investment for seed arms, #2).
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): every leg is probe-gated;
# nothing is timeout-killed mid-op; ONE TPU process at a time.
# Stop between legs: touch /tmp/r3_stop.
#
# Usage: bash scripts/run_round3d_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-2800}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r3_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

cat > /tmp/tpu_probe_r3d.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r3d.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

set -x

FNOS="FNO-128-8m,FNO-128-16m,FNOs-128-16m,FNOs-128-32m,FNOs-64-32m,FNOs-96-32m"

# ---- Leg 1: FNO MFU attribution (VERDICT #7)
halt; probe || exit 1
python benchmark/ablate_fno.py --out docs/fno_ablation.json \
    || echo "LEG1 FAILED" >&2

# ---- Leg 2: FNO-family train-step refresh (fused mode mix; overwrites)
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models "$FNOS" --dtypes bf16 \
      --out docs/models_train_step.json || echo "LEG2 FAILED" >&2
fi

# ---- Leg 3: complete the train-step sweep (resumable, incremental)
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models all --dtypes bf16 --skip-existing \
      --out docs/models_train_step.json || echo "LEG3 FAILED" >&2
fi

# ---- Leg 4: regenerate the model-zoo doc from the refreshed JSONs
python scripts/generate_modelzoo.py || echo "LEG4 FAILED" >&2

# ---- Leg 5: NS-2D 1/4-scale datagen (idempotent; investment for seed arms)
D=datasets/ns2d_table1_quarter
mkdir -p "$D"
for mode in train valid test; do
  n=1300; [ $mode != train ] && n=325
  ls "$D" | grep -q "ns2d_${mode}_.*\.h5$" && continue
  [ "$(left)" -lt 600 ] && { echo "deadline: skip datagen $mode"; continue; }
  halt; probe || exit 1
  python scripts/generate_data.py navierstokes2d --mode $mode --samples $n \
      --nt 56 --sample-rate 4 --dirname "$D" --seed 42 || exit 1
done

echo R3D_CHAIN_DONE
