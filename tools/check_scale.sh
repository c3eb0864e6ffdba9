#!/usr/bin/env bash
# Per-entry BUDGETED oracle compare for intermediate/large scale factors
# (r14, VERDICT r13 #5): at sf0.3+ some DuckDB oracles are minutes-heavy
# (all-pairs / recursive-CTE families), and one runaway oracle must not
# stall the whole pass — run check.py one entry at a time under a wall
# budget and tally PASS / FAIL / ROWS / EMPTY / TIMEOUT.
#
# Usage: tools/check_scale.sh <sfDir> <verifyOutDir> <budget_s> <q1> [q2 ...]
set -uo pipefail
cd "$(dirname "$0")/.."

SF="${1:?usage: check_scale.sh <sfDir> <verifyOutDir> <budget_s> <q...>}"
OUT="${2:?verifyOutDir}"
BUDGET="${3:?per-entry budget seconds}"
shift 3

n_pass=0; n_fail=0; n_rows=0; n_to=0
for q in "$@"; do
  log=$(timeout "$BUDGET" python3 tools/check.py "$SF" "$OUT" "$q" 2>&1)
  rc=$?
  if [ $rc -eq 124 ]; then
    echo "TIMEOUT $q: oracle exceeded ${BUDGET}s"; n_to=$((n_to+1)); continue
  fi
  line=$(echo "$log" | grep -E "^(PASS|FAIL|ROWS|EMPTY)" | head -1)
  case "$line" in
    PASS*)  echo "$line"; n_pass=$((n_pass+1)) ;;
    ROWS*)  echo "$line"; n_rows=$((n_rows+1)) ;;
    EMPTY*) echo "$line (EMPTY is a red flag)"; n_fail=$((n_fail+1)) ;;
    FAIL*)  echo "$line"; echo "$log" | grep -A2 "^FAIL" | head -6; n_fail=$((n_fail+1)) ;;
    *)      echo "FAIL  $q: check.py produced no status (rc=$rc)"; n_fail=$((n_fail+1)) ;;
  esac
done
echo "== scale check: $n_pass pass, $n_fail fail, $n_rows rows-only, $n_to timeout =="
[ "$n_fail" -eq 0 ]
