#!/bin/bash
# Probe the axon relay every 4 min; on first success, run the r4 TPU sweep.
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,4)))))" >/dev/null 2>&1; then
    echo "[$(date -u +%H:%M:%S)] relay UP after $i probes — starting sweep"
    bash scripts/r4_tpu_sweep.sh
    exit $?
  fi
  echo "[$(date -u +%H:%M:%S)] probe $i: relay down"
  sleep 240
done
echo "relay never returned after 200 probes"
exit 1
