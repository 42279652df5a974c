"""Second-decade scale probe: amplify sf0.1 into /tmp at FACTOR x and
re-time headline queries there.

``scaling_curve.py`` measures the sf0.01 → sf0.1 decade; this script
manufactures the NEXT one (and beyond) by key-remapped amplification of
the sf0.1 tables, so the 100 TB linearity claim gets a second measured
step instead of an extrapolation from a single decade:

* every copy k remaps its keys by +k*KEY_STRIDE (doc_id, vec_id,
  event_id/user_id, and the TPC-H key family consistently across
  customer/orders/lineitem/part/supplier — joins stay valid);
* document TEXT gets a per-copy token suffix (``tok`` → ``tok·xk``) so
  copies share NO vocabulary: the near-dup/shingle structure of each
  copy is isomorphic to the original and there are no cross-copy
  duplicates — dedup-family cost must scale linearly in the factor, and
  any super-linear growth is a genuine blocking failure, not an
  artifact of cloned content;
* copy 0 is byte-identical to the original, so pinned ids
  (QUERY_VEC_ID, CENTROID_IDS) keep resolving;
* region/nation stay unamplified (dims referenced by kept nationkeys).

Usage:
    python scripts/scale_probe.py [factor] [names...]
Emits one JSON line: per-query seconds at sf0.1 vs the amplified dir
and the time ratio vs the data factor. Exits non-zero if any query's
ratio exceeds the factor (super-linear).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from big_data_toolkit_spark.catalog import TABLES, load_table  # noqa: E402
from big_data_toolkit_spark.session import build_spark  # noqa: E402

SF_BASE = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000

# (table -> columns to remap by +k*KEY_STRIDE)
REMAP = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}

HEADLINE = [
    "word_count",
    "quality_score",
    "curated_corpus",
    "dedup_exact",
    "dedup_minhash_lsh",
    "duplicate_ngram_spans",
    "remove_duplicate_spans",
    "shard_pack",
    "inverted_index",
    "event_count_hourly",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "knn_brute_force",
    "kmeans_clusters",
]


def amplify(spark, factor: int, out_dir: str) -> None:
    """Single-pass amplification: explode a copy index per row and remap
    in-row (a ``factor``-way union of plan branches blows plan size and
    heap for nothing — same data, one scan)."""
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        base = load_table(spark, SF_BASE, name)
        if name not in REMAP:  # region / nation: shared dims, keep as-is
            base.write.mode("overwrite").parquet(dst)
            continue
        c = base.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
        )
        for col in REMAP[name]:
            c = c.withColumn(
                col, F.col(col) + F.col("__k").cast("long") * KEY_STRIDE
            )
        if name == "embeddings":
            # Roll each copy's vector by k positions: inner products WITHIN
            # a copy are permutation-invariant (per-copy ANN/near-dup
            # structure is exactly the original), while cross-copy cosines
            # decorrelate — byte-identical copies would hand every vector
            # 31 perfect duplicates and fabricate a quadratic output that
            # says nothing about the engine. Copy 0 stays byte-identical.
            dim = "size(embedding)"
            c = c.withColumn(
                "embedding",
                F.when(F.col("__k") == 0, F.col("embedding")).otherwise(
                    F.expr(
                        f"concat(slice(embedding, __k % {dim} + 1, "
                        f"{dim} - __k % {dim}), "
                        f"slice(embedding, 1, __k % {dim}))"
                    )
                ),
            )
        if name == "documents":
            # disjoint per-copy vocabulary; within-copy structure
            # isomorphic to the original; copy 0 byte-identical. The
            # suffix must be LETTERS-ONLY: the pinned tokenizer splits on
            # non-letter runs, so a digit suffix ("x3") normalizes to the
            # same token for every copy — the first probe run did exactly
            # that and manufactured a 320x near-dup density blowup
            # (2.56M verified pairs vs the linear 8k) that had nothing to
            # do with the engine. Base-26 two-letter suffixes survive
            # tokenization distinct per copy.
            suffix = F.concat(
                F.lit("x"),
                F.char(F.lit(97) + (F.col("__k") / 26).cast("int")),
                F.char(F.lit(97) + F.col("__k") % 26),
            )
            c = c.withColumn(
                "text",
                F.when(F.col("__k") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        "text", F.lit(r"(\S+)"), F.concat(F.lit("$1"), suffix)
                    )
                ),
            )
        c.drop("__k").write.mode("overwrite").parquet(dst)


def timed(fn, spark, sf_dir, trials=2):
    ts = []
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    for _ in range(trials):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--keep"]
    keep = "--keep" in sys.argv  # reuse the amplified dir across batches
    factor = int(argv[0]) if argv else 8
    names = argv[1:] or HEADLINE
    out_dir = f"/tmp/bdts-scale-x{factor}"
    # The suite's sf0.1 workloads fit the 1g local default heap; a 32x
    # corpus does not — size the (not-yet-launched) JVM for the probe.
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
    )
    spark = build_spark(app_name=f"scale-probe-x{factor}")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(out_dir):
        t0 = time.perf_counter()
        amplify(spark, factor, out_dir)
        print(f"amplified x{factor} in {time.perf_counter() - t0:.1f}s "
              f"-> {out_dir}", file=sys.stderr)

    queries = entry.queries()
    out = {}
    for name in names:
        fn = queries[name]
        s = timed(fn, spark, SF_BASE)
        l = timed(fn, spark, out_dir)
        out[name] = {
            "sf0.1_s": round(s, 3),
            f"x{factor}_s": round(l, 3),
            "ratio": round(l / s, 2),
        }
        print(f"  {name}: {s:.2f}s -> {l:.2f}s  "
              f"({l / s:.2f}x on {factor}x data)", file=sys.stderr)
    print(json.dumps({"factor": factor, "queries": out}))
    flagged = {n: v for n, v in out.items() if v["ratio"] > factor}
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)
    if flagged:
        print(f"SUPER-LINEAR: {sorted(flagged)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
