#!/bin/bash
# Round-3 follow-up TPU chain: refresh spectral-family benchmarks after the
# fused mode-mix (ops/spectral.py::_mode_mix_ri single-einsum form), attribute
# the FNO train-step MFU (VERDICT r2 #7), then invest leftover time in NS-2D
# Table-1 datagen (VERDICT #2/#9).
#
# Robustness rules (docs/tpu_notes.md, CLAUDE.md): every leg is probe-gated;
# nothing is timeout-killed mid-op; ONE TPU process at a time.  The script
# first WAITS for any still-running trainbench from the previous chain.
# Stop between legs: touch /tmp/r3_stop.
#
# Usage: bash scripts/run_round3c_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-4500}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r3_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

cat > /tmp/tpu_probe_r3c.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r3c.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

set -x

# ---- Leg 0: wait for any still-running bench from the previous chain
while pgrep -f '[t]rainbench.py' > /dev/null; do sleep 20; done

FNOS="FNO-128-8m,FNO-128-16m,FNOs-128-16m,FNOs-128-32m,FNOs-64-32m,FNOs-96-32m"
SPECTRAL="$FNOS,U-FNet1-16m,U-FNet1-16m-1x1,U-FNet1-8m,U-FNet1-8m-1x1,U-FNet2-16m,U-FNet2-16m-1x1,U-FNet2-16mc,U-FNet2-8m,U-FNet2-8m-1x1,U-FNet2-8mc,U-FNet2attn-16m,U-FNet2attn-16m-1x1,U-FNet3-16m,U-FNet3-16m-1x1,U-FNet3-8m,U-FNet3-8m-1x1,UNO-128,UNO-64"

# ---- Leg 1: FNO train-step refresh (fused mode mix) — overwrites entries
halt; probe || exit 1
python benchmark/trainbench.py --models "$FNOS" --dtypes bf16 \
    --out docs/models_train_step.json || echo "LEG1 FAILED" >&2

# ---- Leg 2: FNO MFU attribution (VERDICT #7)
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/ablate_fno.py --out docs/fno_ablation.json \
      || echo "LEG2 FAILED" >&2
fi

# ---- Leg 3: spectral-family fwd refresh (headline truncated-DFT numbers)
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

# ---- Leg 6: NS-2D 1/4-scale datagen (idempotent; investment for seed arms)
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

echo R3C_CHAIN_DONE
