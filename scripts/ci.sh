#!/bin/sh
# One-command pre-commit gate: every check the repo maintains, cheapest
# first. Usage:  sh scripts/ci.sh [--full]
#   default: oracle type sweep + plan audit + pytest
#   --full : adds the full-registry strict driver-replica sweep (slow)
set -e
cd "$(dirname "$0")/.."

echo "== 1/4 oracle result-type sweep (no Spark, ~12 s) =="
python scripts/preflight.py --types-only

echo "== 2/4 plan-shape audit vs PLAN_BUDGETS.json (~90 s) =="
python scripts/plan_audit.py

echo "== 3/4 pytest =="
python -m pytest tests/ -x -q

if [ "$1" = "--full" ]; then
  echo "== 4/4 full-registry strict driver-replica sweep =="
  python scripts/preflight.py --strict
else
  echo "== 4/4 skipped (pass --full for the strict driver-replica sweep) =="
fi
echo "CI OK"
