#!/usr/bin/env bash
# The <10-min default gate: the SAME tests as `pytest tests/` (the
# "not slow" tier), run as N concurrent pytest processes that each
# take every N-th collected item (PYSTORE_TEST_SHARD in
# tests/conftest.py). The suite profile is flat — ~0.5 s/test of
# irreducible Spark-job latency — so single-process time is bounded
# below by test count, while N local[4] sessions on the 32-CPU box
# divide the wall-clock by ~N. Shards are disjoint and exhaustive by
# construction (same collection order in every process), so a green
# fast gate is exactly a green `pytest tests/`.
#
#   bash tools/fast_gate.sh [n_shards]   # default 8
set -u
cd "$(dirname "$0")/.."
N="${1:-${PYSTORE_FAST_GATE_SHARDS:-8}}"
echo "== fast gate: ${N}-way sharded pytest (default tier) =="
start=$(date +%s)
pids=()
for i in $(seq 0 $((N - 1))); do
  PYSTORE_TEST_SHARD="${i}/${N}" python -m pytest tests/ -q \
    -p no:cacheprovider >"/tmp/fast_gate_${i}.log" 2>&1 &
  pids+=("$!")
done
rc=0
for i in $(seq 0 $((N - 1))); do
  if ! wait "${pids[$i]}"; then
    rc=1
    echo "-- shard ${i} FAILED --"
    grep -E "^(FAILED|ERROR)" "/tmp/fast_gate_${i}.log" | head -20
  fi
  tail -n 1 "/tmp/fast_gate_${i}.log" | sed "s/^/shard ${i}: /"
done
echo "== fast gate: $(($(date +%s) - start))s wall, exit ${rc} =="
exit "${rc}"
