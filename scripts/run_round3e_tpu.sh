#!/bin/bash
# Round-3 continuation chain, part 2: rerun the FNO MFU attribution with
# the benchtime scalar-output fix (VERDICT r2 #7), finish the train-step
# sweep (#6), refresh spectral-family fwd / fwd+bwd numbers post
# mode-mix fusion, and regenerate the model zoo.
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): every leg is probe-gated;
# nothing is timeout-killed mid-op; ONE TPU process at a time.
# Stop between legs: touch /tmp/r3_stop.
#
# Usage: bash scripts/run_round3e_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-2400}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r3_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

cat > /tmp/tpu_probe_r3e.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r3e.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

set -x

SPECTRAL="FNO-128-8m,FNO-128-16m,FNOs-128-16m,FNOs-128-32m,FNOs-64-32m,FNOs-96-32m,U-FNet1-16m,U-FNet2-16m,UNO-64"

# ---- Leg 1: FNO MFU attribution rerun (VERDICT #7; benchtime fix landed)
halt; probe || exit 1
python benchmark/ablate_fno.py --out docs/fno_ablation.json \
    || echo "LEG1 FAILED" >&2

# ---- Leg 2: finish the train-step sweep (resumable, incremental)
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models all --dtypes bf16 --skip-existing \
      --out docs/models_train_step.json || echo "LEG2 FAILED" >&2
fi

# ---- Leg 3: spectral-family fwd refresh (post-fusion headline numbers)
if [ "$(left)" -gt 600 ]; then
  halt; probe || exit 1
  python benchmark/fwdbench.py --models "$SPECTRAL" \
      --out docs/models_fwd_time.json || echo "LEG3 FAILED" >&2
fi

# ---- Leg 4: spectral-family fwd+bwd refresh
if [ "$(left)" -gt 600 ]; then
  halt; probe || exit 1
  python benchmark/bwdbench.py --models "$SPECTRAL" \
      --out docs/models_fwd_bwd_time.json || echo "LEG4 FAILED" >&2
fi

# ---- Leg 5: regenerate the model-zoo doc from the refreshed JSONs
python scripts/generate_modelzoo.py || echo "LEG5 FAILED" >&2

echo R3E_CHAIN_DONE
