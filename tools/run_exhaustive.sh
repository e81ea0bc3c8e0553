#!/bin/bash
# Exhaustive-tier runner, sharded one pytest process per test file.
#
# A single-process exhaustive run (302 tests) segfaults reproducibly after
# ~170 tests on this 1-core box — a cumulative process-lifetime failure
# (the same tests pass in isolation; crashes have hit both the zstandard
# compile-cache write and read paths and, with the cache read-only, the
# LLVM JIT).  Sharding bounds each process well under that horizon and
# limits the blast radius of any crash to one shard.
#
# Usage: bash tools/run_exhaustive.sh [logfile]
set -u
LOG="${1:-results/exhaustive_r03.log}"
: > "$LOG"
overall=0
echo "# exhaustive tier, sharded per file — $(git rev-parse --short HEAD) — $(date -u +%FT%TZ)" >> "$LOG"
for f in tests/test_*.py; do
  echo "=== shard: $f ===" >> "$LOG"
  GENDR_EXHAUSTIVE=1 GENDR_CACHE_READONLY="${GENDR_CACHE_READONLY:-1}" \
    timeout 5400 python -m pytest "$f" -q >> "$LOG" 2>&1
  rc=$?
  echo "=== shard exit: $rc ===" >> "$LOG"
  if [ "$rc" -ne 0 ]; then overall=1; fi
done
echo "=== overall: $overall ===" >> "$LOG"
exit "$overall"
