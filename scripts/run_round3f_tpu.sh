#!/bin/bash
# Round-3 continuation chain, part 3.  Waits for run_round3e_tpu.sh to
# finish (ONE TPU process at a time), then:
#   1. Fresh small FID milestone proof WITH the new KID curve (runs/ was
#      wiped with the environment; this re-establishes an executed
#      artifact and exercises KID end-to-end on-chip).
#   2. Refresh the one stale pre-fusion fp32 FNO train-step entry.
#   3. Regenerate the model zoo (idempotent).
#
# Usage: bash scripts/run_round3f_tpu.sh [DEADLINE_S]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-3600}
START=$(date +%s)
left() { echo $(( DEADLINE - ( $(date +%s) - START ) )); }
halt() { [ -f /tmp/r3_stop ] && { echo "STOP FILE — exiting"; exit 0; }; return 0; }

cat > /tmp/tpu_probe_r3f.py <<'EOF'
import jax, jax.numpy as jnp
print(float(jnp.ones((8, 8)).sum()), jax.devices())
EOF
probe() {
  for i in $(seq 1 40); do
    if timeout 350 python /tmp/tpu_probe_r3f.py > /dev/null 2>&1; then return 0; fi
    echo "probe failed ($i), retrying in 60s" >&2; sleep 60
  done
  return 1
}

set -x

# ---- Leg 0: wait for the previous chain (bracketed pattern: no self-match)
while pgrep -f '[r]un_round3e_tpu' > /dev/null; do sleep 30; done

# ---- Leg 1: FID+KID milestone proof (synthetic data; pipeline artifact)
halt; probe || exit 1
python scripts/fid_proof.py --milestones 1000,3000 --steps 3000 \
    --images 2048 --dataset-size 4096 --logdir runs/fid_proof_r3 \
    || echo "LEG1 FAILED" >&2
cp runs/fid_proof_r3/fid_proof.json docs/fid_proof_kid.json 2>/dev/null || true

# ---- Leg 2: refresh the stale pre-fusion fp32 FNO entry
if [ "$(left)" -gt 300 ]; then
  halt; probe || exit 1
  python benchmark/trainbench.py --models FNO-128-8m --dtypes fp32 \
      --out docs/models_train_step.json || echo "LEG2 FAILED" >&2
fi

# ---- Leg 3: regenerate the model-zoo doc
python scripts/generate_modelzoo.py || echo "LEG3 FAILED" >&2

echo R3F_CHAIN_DONE
