#!/bin/bash
# Probe the axon relay every 3 min (150 s per probe — cold handshake runs
# 60-150 s even when healthy); on first success, run the r5 TPU sweep.
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for i in $(seq 1 200); do
  if timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,4)))))" >/dev/null 2>&1; then
    echo "[$(date -u +%H:%M:%S)] relay UP after $i probes — starting sweep"
    ASF_SKIP_PROBE=1 bash scripts/r5b_tpu_sweep.sh
    exit $?
  fi
  echo "[$(date -u +%H:%M:%S)] probe $i: relay down"
  sleep 180
done
echo "relay never returned after 200 probes"
exit 1
