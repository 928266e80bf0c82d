#!/bin/bash
# Round-4 TPU evidence sweep, part 2 — re-run the three steps that died on
# the loop-resident KeyError (fixed in dfaa488: the bench read loader.store,
# attach_store sets loader.device_store).
#
# Usage: bash scripts/r4_tpu_sweep2.sh [wait_pid]
#   With wait_pid, blocks until that process exits first (chain after the
#   part-1 sweep without contending for the single TPU process slot).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOGS=/root/repo/r4_sweep_logs
mkdir -p "$LOGS"
SUMMARY="$LOGS/summary2.txt"
: > "$SUMMARY"

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

if [ -n "${1:-}" ]; then
  note "waiting for pid $1 (part-1 sweep) to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  note "pid $1 gone — starting part 2"
fi

run_step() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  note "DONE  $name rc=$rc (${name}.log, $((SECONDS - t0)) s)"
  tail -4 "$LOGS/$name.log" | sed 's/^/    /' | tee -a "$SUMMARY"
  return $rc
}

if ! timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,4)))))" >/dev/null 2>&1; then
  note "ABORT: relay probe failed — TPU unreachable"
  exit 1
fi
note "relay probe OK"

# Loop-resident number with the device store attached (K=8 default).
run_step trainloop_devstore2 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_DEVSTORE=1 python scripts/bench_train_loop.py

# K=16 control (K=16 store-mode real loop was SLOWER than K=8: 3.0k vs 4.3k).
run_step trainloop_k16_2 5400 env ASF_BENCH_BATCH=128 ASF_BENCH_K=16 python scripts/bench_train_loop.py

# EPIC int16 archive variant with the device store.
run_step trainloop_epic2 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_DATASET=epic python scripts/bench_train_loop.py

note "sweep part 2 complete — logs in $LOGS"
