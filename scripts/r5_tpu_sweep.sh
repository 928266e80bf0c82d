#!/bin/bash
# Round-5 TPU evidence sweep — VERDICT r4 next-steps #1/#2/#6.
#
# 1. bench.py          — exercises the new probe-retry loop end-to-end, warms
#                        the headline programs in the persistent cache so the
#                        driver's end-of-round run finishes even if the relay
#                        returns late in its window.
# 2. trainloop_k16     — VGG real loop with the fast_rng vectorized ref path
#                        ACTIVE (it was snapshot-committed AFTER the r4 sweep;
#                        r4 measured 5,139-5,395 clips/s vs 9,046 resident).
# 3. trainloop_epic    — EPIC real loop, same question (r4: 2,296-2,662).
# 4. trainloop_k32     — dispatch-overhead probe: K=32 vs K=16's ~1.7 ms/iter
#                        fixed cost (14.15 loop-resident vs 12.52 device).
#
# Each step bounded by `timeout`, logged under r5_sweep_logs/; failures log
# rc and move on. The whole matrix was CPU-smoked first (ASF_SMOKE=1).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOGS=/root/repo/r5_sweep_logs
mkdir -p "$LOGS"
SUMMARY="$LOGS/summary.txt"
: > "$SUMMARY"

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

run_step() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  note "DONE  $name rc=$rc (${name}.log, $((SECONDS - t0)) s)"
  tail -8 "$LOGS/$name.log" | sed 's/^/    /' | tee -a "$SUMMARY"
  return $rc
}

# ASF_SKIP_PROBE=1: launched by a watcher that JUST probed successfully —
# a redundant back-to-back probe can starve on this 1-core host and
# misread a live relay as down.
if [ "${ASF_SKIP_PROBE:-0}" != "1" ]; then
  if ! timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,4)))))" >/dev/null 2>&1; then
    note "ABORT: relay probe failed — TPU unreachable"
    exit 1
  fi
  note "relay probe OK"
fi

run_step bench 3000 python bench.py

run_step trainloop_k16 5400 env ASF_BENCH_BATCH=128 ASF_BENCH_K=16 python scripts/bench_train_loop.py

run_step trainloop_epic 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_DATASET=epic python scripts/bench_train_loop.py

run_step trainloop_k32 7200 env ASF_BENCH_BATCH=128 ASF_BENCH_K=32 python scripts/bench_train_loop.py

# GRU store-mode real loop with the vectorized window-grid ref path
# (VERDICT #3 "Done": real loop within ~25% of its loop-resident bound).
# Batch 32 x <=4 windows ~= the regular bench's 128 clip-equivalents.
run_step trainloop_gru 5400 env ASF_BENCH_BATCH=32 ASF_BENCH_DATASET=gru python scripts/bench_train_loop.py

note "sweep complete — logs in $LOGS"
