#!/bin/bash
# Unattended round-2 convergence pipeline (documented ops, see docs/CONVERGENCE.md):
#   1. Stage-1 NUTS from the committed Laplace mass (short; produces a
#      properly-scaled trace for the dense empirical mass).
#   2. tpu_autopilot.py production campaign sized from PARITY.md item 8
#      (diffusion fit: ~260-iteration traversals at depth 9; budget 6-9
#      traversals), gated at R-hat<1.05, resumable, auto-promoted.
# Run detached (setsid nohup) so it survives the operator session.
set -u
cd /root/repo
PY=/opt/venv/bin/python
log() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

for i in $(seq 1 200); do
  if timeout 90 $PY -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
    log "TPU up"; break
  fi
  log "TPU down (probe $i); sleeping 120s"; sleep 120
done

if [ ! -f results/spain2020_nuts_stage1/samples.npz ]; then
  log "stage1: laplace-dense 256x200 depth 8"
  timeout 3600 $PY scripts/nuts_campaign.py --chains 256 --iterations 200 \
      --warmup 50 --depth 8 --mass laplace-dense --segments 4 \
      --bwd-block 512 --out results/spain2020_nuts_stage1
  log "stage1 rc=$?"
fi

TRACE=results/spain2020_nuts_stage1/samples.npz
if [ ! -f "$TRACE" ]; then
  log "stage1 trace missing; falling back to the committed-posterior seed"
  TRACE=results/spain2020_nuts_seed/samples.npz
  if [ ! -f "$TRACE" ]; then
    # (T, B, d) trace view of the committed flat posterior, for --trace/--warm
    $PY - <<'EOF'
import numpy as np, os
z = np.load("results/spain2020/posterior_samples.npz")
s, l = z["samples"], z["logls"]
T = 50
B = s.shape[0] // T
os.makedirs("results/spain2020_nuts_seed", exist_ok=True)
np.savez("results/spain2020_nuts_seed/samples.npz",
         samples=s[: T * B].reshape(T, B, -1), logls=l[: T * B].reshape(T, B),
         names=z["names"])
EOF
  fi
fi

$PY scripts/tpu_autopilot.py --skip-probes --chains 512 --iterations 2400 \
    --warmup 400 --segments 60 --extend-by 1200 --max-iterations 6000 \
    --trace "$TRACE" --out results/spain2020_nuts_r8 --deadline-hours 6.0
log "autopilot rc=$?"
