#!/bin/bash
# End-of-round evidence runner — makes incomplete validation logs
# structurally impossible (VERDICT r4 demand #2).
#
# Runs, in order, against ONE exact commit (refuses a dirty tree):
#   1. the exhaustive CPU tier            -> results/exhaustive_<R>.log
#   2. the standard hardware selfcheck    -> results/selfcheck_<R>.log
#   3. the full 18x10 hardware matrix     -> results/selfcheck_matrix_<R>.log
#
# Each log is written to a .part file first and only renamed into place
# once its terminal marker line ("overall:" / "selfcheck:") is present, so
# a truncated or interrupted run can never masquerade as evidence.  Every
# log is headed by the commit hash it certifies.  This script must be the
# LAST thing run in a round: commit all source first, then run this, then
# commit only the logs it produced.
#
# Usage: bash tools/finalize_round.sh [round-tag]   (default: r05)
set -u
cd "$(dirname "$0")/.."

R="${1:-r05}"

if [ -n "$(git status --porcelain --untracked-files=no)" ]; then
  echo "finalize_round: working tree dirty — commit first; logs certify one commit." >&2
  git status --porcelain --untracked-files=no >&2
  exit 2
fi
HASH=$(git rev-parse --short HEAD)
echo "finalize_round: certifying commit $HASH as $R"

fail=0

finish_log() {  # finish_log <part> <final> <required-marker>
  local part="$1" final="$2" marker="$3"
  if grep -q "$marker" "$part"; then
    mv "$part" "$final"
    echo "finalize_round: $final complete ($(grep "$marker" "$final" | tail -1))"
  else
    mv "$part" "$final.INCOMPLETE"
    echo "finalize_round: $final INCOMPLETE — missing '$marker' (kept as .INCOMPLETE)" >&2
    fail=1
  fi
}

# 1. exhaustive CPU tier (run_exhaustive.sh re-checks the clean tree and
#    writes its own commit-hash header + terminal overall line)
EX_PART="results/exhaustive_${R}.log.part"
bash tools/run_exhaustive.sh "$EX_PART"
ex_rc=$?
finish_log "$EX_PART" "results/exhaustive_${R}.log" "=== overall:"
if [ "$ex_rc" -ne 0 ]; then
  echo "finalize_round: exhaustive tier exit $ex_rc" >&2
  fail=1
fi

# 2. standard hardware selfcheck
SC_PART="results/selfcheck_${R}.log.part"
{
  echo "# tpu_selfcheck — $HASH — $(date -u +%FT%TZ)"
  timeout 5400 python tools/tpu_selfcheck.py 2>&1
  echo "=== exit: $? ==="
} | grep -v WARNING > "$SC_PART"
finish_log "$SC_PART" "results/selfcheck_${R}.log" "^selfcheck:"
grep -q "^selfcheck: PASS" "results/selfcheck_${R}.log" 2>/dev/null || fail=1

# 3. full hardware matrix
MX_PART="results/selfcheck_matrix_${R}.log.part"
{
  echo "# tpu_selfcheck --matrix — $HASH — $(date -u +%FT%TZ)"
  timeout 7200 python tools/tpu_selfcheck.py --matrix 2>&1
  echo "=== exit: $? ==="
} | grep -v WARNING > "$MX_PART"
finish_log "$MX_PART" "results/selfcheck_matrix_${R}.log" "^matrix:"
grep -q "^selfcheck: PASS" "results/selfcheck_matrix_${R}.log" 2>/dev/null || fail=1

if [ "$fail" -eq 0 ]; then
  echo "finalize_round: ALL GREEN at $HASH — commit the three logs now."
else
  echo "finalize_round: FAILURES at $HASH — see logs above." >&2
fi
exit "$fail"
