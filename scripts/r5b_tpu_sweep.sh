#!/bin/bash
# Round-5 second TPU sweep — the two measurements the first sweep
# (r5_tpu_sweep.sh, r5_sweep_logs/) did not reach:
#
# 1. trainloop_gru  — GRU-chain store-mode real loop with the vectorized
#                     window-grid ref path (VERDICT r4 next-step #3 "done"
#                     criterion: within ~25% of its loop-resident bound).
#                     Cold GRU compile budget ~760 s (PROFILE.md §0c).
# 2. trainloop_long — K=16 VGG real loop at 8,192 clips (64 iters/epoch,
#                     2x the first sweep's 32). If the ~2.8 ms/iter
#                     real-vs-resident gap is per-EPOCH (prefetch fill
#                     bubble + end-of-epoch drain) it halves; if per-ITER
#                     host work, it stays. Decides whether cross-epoch
#                     prefetch is worth building. Warm cache: same compile
#                     keys as the first sweep's trainloop_k16.
#
# Each step bounded by `timeout`, logged under r5_sweep_logs/ (suffix b);
# failures log rc and move on. GRU mode CPU-smoked first (make bench-smoke).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOGS=/root/repo/r5_sweep_logs
mkdir -p "$LOGS"
SUMMARY="$LOGS/summary_b.txt"
: > "$SUMMARY"

note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

run_step() {
  local name="$1" tmo="$2"; shift 2
  note "START $name: $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  note "DONE  $name rc=$rc (${name}.log, $((SECONDS - t0)) s)"
  tail -10 "$LOGS/$name.log" | sed 's/^/    /' | tee -a "$SUMMARY"
  return $rc
}

if [ "${ASF_SKIP_PROBE:-0}" != "1" ]; then
  if ! timeout 150 python -c "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones((4,4)))))" >/dev/null 2>&1; then
    note "ABORT: relay probe failed — TPU unreachable"
    exit 1
  fi
  note "relay probe OK"
fi

run_step trainloop_gru 5400 env ASF_BENCH_BATCH=32 ASF_BENCH_DATASET=gru python scripts/bench_train_loop.py

run_step trainloop_long 3600 env ASF_BENCH_BATCH=128 ASF_BENCH_K=16 ASF_BENCH_CLIPS=8192 python scripts/bench_train_loop.py

note "sweep b complete — logs in $LOGS"
