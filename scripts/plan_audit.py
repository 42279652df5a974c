#!/usr/bin/env python
"""Plan-shape regression gate: exchange counts per registered query.

Every `groupBy`/`join`/`distinct`/`repartition` is a shuffle; at 100 TB an
accidental extra Exchange IS the performance bug. This audit builds every
registered query's physical plan at a small sf (plans are sf-independent;
training-loop queries run their tiny driver collects) and counts

  * shuffle exchanges  — ``Exchange hashpartitioning/rangepartitioning/...``
  * broadcast exchanges — ``BroadcastExchange``

then compares against the recorded budgets in ``PLAN_BUDGETS.json``.
A query whose SHUFFLE count exceeds its budget fails the audit (exit 1) —
catching, at commit time, the class of regression where an edit silently
adds a shuffle (lost co-partitioning, a broadcast that fell back to
shuffle-hash, a new unnecessary distinct). Budgets are intentionally an
UPPER bound: fewer exchanges than budget just prints an improvement note
(re-record to ratchet down).

Usage:
    python scripts/plan_audit.py             # audit vs PLAN_BUDGETS.json
    python scripts/plan_audit.py --record    # (re)write budgets from current
    python scripts/plan_audit.py name1 name2 # audit specific queries
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from big_data_toolkit_spark.session import build_spark  # noqa: E402

BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_BUDGETS.json",
)

_SHUFFLE_RE = re.compile(r"Exchange (hash|range|rounds?robin|Single)", re.I)
_BROADCAST_RE = re.compile(r"BroadcastExchange")


def plan_counts(df) -> tuple[int, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(_SHUFFLE_RE.findall(plan)), len(_BROADCAST_RE.findall(plan))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    queries = entry.queries()
    items = (
        [(n, queries[n]) for n in args.names] if args.names else queries.items()
    )

    spark = build_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    budgets = {}
    if os.path.exists(BUDGET_PATH):
        budgets = json.load(open(BUDGET_PATH))

    t0 = time.perf_counter()
    current: dict[str, dict[str, int]] = {}
    regressions: dict[str, str] = {}
    improvements: list[str] = []
    errors: dict[str, str] = {}
    for name, fn in items:
        try:
            shuffles, broadcasts = plan_counts(fn(spark, args.sf_dir))
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        current[name] = {"shuffles": shuffles, "broadcasts": broadcasts}
        b = budgets.get(name)
        if b is None:
            continue
        if shuffles > b["shuffles"]:
            regressions[name] = (
                f"shuffles {b['shuffles']} -> {shuffles} "
                f"(broadcasts {b['broadcasts']} -> {broadcasts})"
            )
        elif shuffles < b["shuffles"]:
            improvements.append(
                f"{name}: shuffles {b['shuffles']} -> {shuffles}"
            )
    spark.stop()

    if args.record:
        merged = {**budgets, **current}
        json.dump(
            dict(sorted(merged.items())),
            open(BUDGET_PATH, "w"),
            indent=1,
        )
        print(f"recorded {len(current)} budgets -> {BUDGET_PATH}")

    print(
        json.dumps(
            {
                "audited": len(current),
                "regressions": regressions,
                "improvements": improvements,
                "unbudgeted": [k for k in current if k not in budgets],
                "errors": errors,
                "seconds": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 1 if (regressions or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
