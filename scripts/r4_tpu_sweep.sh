#!/bin/bash
# Round-4 TPU evidence sweep — fire the moment the axon relay answers.
#
# Runs every measurement queued by VERDICT r3 next-steps #1/#5/#6/#7 in
# priority order, each bounded by `timeout`, each logged under
# r4_sweep_logs/. Steps are independent: a failure logs rc and moves on.
#
# Usage:  bash scripts/r4_tpu_sweep.sh            # full sweep
#         bash scripts/r4_tpu_sweep.sh quick      # steps 1-3 only
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOGS=/root/repo/r4_sweep_logs
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
  tail -3 "$LOGS/$name.log" | sed 's/^/    /' | tee -a "$SUMMARY"
  return $rc
}

# 0. Probe — abort the sweep early if the relay is (still / again) down.
if ! timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,4)))))" >/dev/null 2>&1; then
  note "ABORT: relay probe failed — TPU unreachable"
  exit 1
fi
note "relay probe OK"

# 1. Driver headline (expect ~42,018 clips/s/chip; bench.py has its own watchdog).
run_step bench 3000 python bench.py

# 2. Post-s2d train-step breakdown (expect ~12.2-12.4 ms/step at batch 128).
run_step breakdown 3600 env ASF_BENCH_BATCH=128 python scripts/bench_breakdown.py

# 3. K=16 loop-resident control (K=8 gave 9,058 clips/s).
run_step trainloop_k16 5400 env ASF_BENCH_BATCH=128 ASF_BENCH_K=16 python scripts/bench_train_loop.py

[ "${1:-full}" = quick ] && { note "quick sweep done"; exit 0; }

# 4. Real train loop A/B: device segment store OFF (r3 baseline ~756 clips/s)
#    vs ON (r4 target >=1.5k). Same program cache keys, so step 3 pre-paid compiles.
run_step trainloop_stream 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_DEVSTORE=0 python scripts/bench_train_loop.py
run_step trainloop_devstore 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_DEVSTORE=1 python scripts/bench_train_loop.py

# 5. EPIC int16 archive variant with the device store (region reads + offsets wire).
run_step trainloop_epic 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_DATASET=epic python scripts/bench_train_loop.py

# 6. XProf pass over the backward of the K-scan train dispatch (VERDICT #5).
run_step profile_bwd 3600 env ASF_BENCH_BATCH=128 python scripts/profile_train_bwd.py

# 7. GRU cold-start bound (VERDICT #7): fresh-cache train(cfg) at asf-gru-state
#    geometry with GRU_SINGLE_BUCKET + WARM_COMPILE_ON_START. Target <= 900 s.
run_step gru_coldstart 5400 python scripts/bench_gru_coldstart.py

note "sweep complete — logs in $LOGS"
