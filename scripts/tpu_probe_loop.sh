#!/bin/bash
# Probe the axon TPU tunnel every ~10 min; exit 0 the moment it answers.
# Usage: bash scripts/tpu_probe_loop.sh [max_minutes]
# The probe is a full init + 1-element D2H sync (the only true liveness
# test on this backend - see CLAUDE.md: jax.devices() alone can hang).
MAX_MIN=${1:-600}
DEADLINE=$(( $(date +%s) + MAX_MIN * 60 ))
N=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  N=$((N + 1))
  if timeout 90 python -c "
import jax, jax.numpy as jnp, sys
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
sys.path.insert(0, '/root/repo')
from pose_refine_tpu.utils.sync import sync
sync(jnp.ones((4,)))
print('alive')
" 2>/dev/null | grep -q alive; then
    echo "TPU tunnel ALIVE after $N probes ($(date -u +%H:%M:%S))"
    exit 0
  fi
  echo "probe $N: wedged ($(date -u +%H:%M:%S))"
  sleep 600
done
echo "TPU tunnel still wedged after $MAX_MIN minutes"
exit 1
