"""Measured scaling curves: wall time per query at sf0.01 vs sf0.1.

The correctness gate proves the plans are right; this records how their
cost actually grows over a 10× data step — the measurable stand-in for
the 100 TB claim. For linear operators the sf0.1/sf0.01 ratio should sit
well BELOW 10 locally (fixed JVM/job overhead dominates the small side);
a ratio much ABOVE 10 is the red flag (super-linear blowup: candidate
explosion, skew, driver bottleneck).

Interleaved trials (A/B/A/B per query) with medians, the repo's r5
drift protocol, so machine noise cannot masquerade as a scaling trend.

Usage:
    python scripts/scaling_curve.py [names...]   # default: headline set
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from big_data_toolkit_spark.session import build_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.01"
SF_LARGE = "/root/testdata/sf0.1"
TRIALS = 3

# One representative per headline family — enough real work at sf0.01
# that the ratio measures compute, not session fixed costs.
HEADLINE = [
    "word_count",            # map + one agg shuffle
    "pmi_pairs",             # pair gen + marginals join
    "inverted_index",        # groupBy(term) + sort_array
    "q1_pricing_summary",    # full-scan aggregate
    "q3_shipping_priority",  # fact-fact join + top-k
    "q13_customer_distribution",  # pre-agg + outer join
    "dedup_exact",           # hash groupBy + join-back
    "dedup_minhash_lsh",     # shingle/banding/verify
    "duplicate_ngram_spans", # stride-1 window rank
    "quality_score",         # map-only feature pass
    "knn_brute_force",       # O(n) scan vs one query vector
    "pagerank_top20",        # 10 iterative shuffles
    "dedup_star_components", # alternating-star rounds (post single-distinct)
    "semantic_dedup",        # Lloyd + cluster-blocked pair join
    "remove_duplicate_spans",  # window rank + in-row excision
]


def main() -> int:
    names = sys.argv[1:] or HEADLINE
    queries = entry.queries()
    spark = build_spark(app_name="scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")

    # warm both paths once (parquet footer caches, codegen)
    for sf in (SF_SMALL, SF_LARGE):
        queries["word_count"](spark, sf).collect()

    out = {}
    for name in names:
        fn = queries[name]
        small, large = [], []
        for _ in range(TRIALS):  # interleaved A/B pairs
            t0 = time.perf_counter()
            fn(spark, SF_SMALL).collect()
            small.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fn(spark, SF_LARGE).collect()
            large.append(time.perf_counter() - t0)
        s, l = statistics.median(small), statistics.median(large)
        out[name] = {
            "sf0.01_s": round(s, 3),
            "sf0.1_s": round(l, 3),
            "ratio": round(l / s, 2),
        }
        print(f"  {name}: {s:.2f}s -> {l:.2f}s  ({l / s:.2f}x on 10x data)")
    spark.stop()
    print(json.dumps(out))
    flagged = {n: v for n, v in out.items() if v["ratio"] > 10}
    if flagged:
        print(f"SUPER-LINEAR: {sorted(flagged)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
