"""Sinks (SURVEY §2.1 S5/S6/S9/S10/S14), Spark-first.

The reference writes text part-files, SequenceFiles between jobs, and a
sorted MapFile for the index. The engine standardizes on Parquet:

* S9/S14 — ``write_table``: overwrite-mode parquet/csv (the reference's
  delete-then-write dance, ``a2/ComputeBigramRelativeFrequencyPairs.scala:
  45-46``, is just ``mode('overwrite')``).
* S5 — iteration intermediates are cached/checkpointed DataFrames, not
  files; when durable intermediates are wanted, ``write_table`` with parquet
  is the SequenceFile replacement.
* S6 — ``write_sorted_bucketed``: range-partitioned + sorted-within-
  partitions parquet, giving MapFile-style point-lookup pruning (tight
  row-group min/max on the sort key).
* S10 — streaming per-window output: ``writeStream.foreachBatch`` writing
  ``{prefix}-{batch_id}`` directories, the reference's ``saveAsTextFiles``
  per-batch layout (``a7/EventCount.scala:72``,
  ``a7/TrendingArrivals.scala:112-135`` batch-stamped paths).
"""

from __future__ import annotations

import math
import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """S9/S14: overwrite-mode write."""
    df.write.mode("overwrite").format(fmt).save(path)


def write_sorted_bucketed(
    df: DataFrame, path: str, key: str, n_files: int = 8
) -> None:
    """S6: key-range-partitioned, key-sorted parquet for point lookups."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_table(
    spark: SparkSession, path: str, target_mb: int = 128
) -> int:
    """Rewrite a parquet directory into ~``target_mb`` files; returns the
    new file count.

    The small-files maintenance op every long-lived 100 TB table needs:
    streaming sinks and fine-grained partitioned writes accrete KB-scale
    files whose per-file open/footer/task overhead eventually dominates
    scans. Sizing is by measured on-disk bytes (not file count), matching
    the 128 MB scan-split/row-group sweet spot. Local-FS implementation
    swaps directories via rename; on HDFS/S3 the same plan runs against the
    FileSystem API or a table format's atomic commit.

    Safety: refuses hive-partitioned layouts (a flat rewrite would demote
    partition directories to ordinary columns and destroy the
    PartitionFilters pruning ``write_partitioned`` establishes), and the
    pre-compaction backup is only deleted after the rewritten copy's row
    count is verified against the original — a crash mid-swap leaves either
    the original or the verified rewrite plus a ``.precompact`` backup,
    never nothing.
    """
    part_dirs = [
        e
        for e in os.listdir(path)
        if "=" in e and os.path.isdir(os.path.join(path, e))
    ]
    if part_dirs:
        raise ValueError(
            f"refusing to compact hive-partitioned layout at {path} "
            f"(found {part_dirs[:3]}...); compact per-partition or rewrite "
            "with write_partitioned to preserve partition pruning"
        )
    df = spark.read.parquet(path)
    n_rows = df.count()
    total = sum(
        os.path.getsize(urllib.parse.urlparse(f).path)
        for f in df.inputFiles()
    )
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + ".compacting"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    rewritten = spark.read.parquet(tmp).count()
    if rewritten != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compaction row-count mismatch at {path}: "
            f"{n_rows} original vs {rewritten} rewritten; original untouched"
        )
    backup = path.rstrip("/") + ".precompact"
    shutil.move(path, backup)
    shutil.move(tmp, path)
    # Re-verify through the final path before dropping the only backup.
    if spark.read.parquet(path).count() != n_rows:
        raise RuntimeError(
            f"post-swap verification failed at {path}; "
            f"backup preserved at {backup}"
        )
    shutil.rmtree(backup)
    return n


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style directory-partitioned layout — the 100 TB scan story.

    Beyond the reference (which re-reads whole inputs every job): laying
    fact tables out as ``path/col=value/`` directories turns equality and
    range predicates on the partition columns into *directory pruning* —
    the scan never opens, lists, or schedules non-matching partitions
    (``PartitionFilters`` in the plan, asserted in tests), which is the
    difference between touching 100 TB and touching one day of it.
    Partition columns should be low-cardinality (date, region); high-
    cardinality layouts explode into small files — that case belongs to
    ``write_sorted_bucketed`` row-group pruning instead.
    """
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def foreach_batch_per_window_sink(prefix: str):
    """S10/S11: foreachBatch fn writing one directory per micro-batch,
    path stamped with the batch id (the reference's ``part-%08d`` naming,
    ``a7/TrendingArrivals.scala:113-114``)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{prefix}-{batch_id:08d}")

    return sink


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer columns'
    low ``bits`` bits — a Column expression, computed entirely JVM-side.

    Bit i of c1 lands at output bit 2i, bit i of c2 at 2i+1, so numeric
    locality in EITHER dimension maps to locality on the single sort key.
    """
    from pyspark.sql import functions as F

    # Column `|` is logical OR; use bitwiseOR (target bits are disjoint).
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def write_zordered(
    df: DataFrame, path: str, c1: str, c2: str, n_files: int = 8, bits: int = 16
) -> None:
    """Z-order-clustered parquet layout for TWO-dimensional pruning.

    ``write_sorted_bucketed`` clusters one key; a 100 TB fact queried by
    boxes in two dimensions (user × time, lat × lon) wants BOTH pruned.
    Sorting by the Morton interleave places rows close in either
    dimension into the same files/row-groups, so parquet min/max stats
    skip most of the table for a 2-d box predicate — the Delta/Iceberg
    OPTIMIZE ZORDER technique as a plain write. The key is a pure bit
    expression (no UDF); the write is one range partition + in-file sort,
    and the key column itself is dropped before writing (queries filter
    on the ORIGINAL columns; the layout, not the schema, carries the
    clustering). Locality is asserted by test: a 2-d box touches
    measurably fewer files than under a one-dimensional layout.
    """
    from pyspark.sql import functions as F

    keyed = df.withColumn("_z", zorder_key(F.col(c1), F.col(c2), bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Hive-style bucketed + sorted table: ``bucketBy(n, key).sortBy(key)``.

    THE 100 TB shuffle killer for recurring joins: two facts bucketed on
    the same key with the same bucket count sort-merge-join with ZERO
    Exchange (and, being sortBy'd, zero per-task Sort) — the join reads
    co-located buckets directly. ``write_sorted_bucketed`` (S6) clusters
    files for row-group pruning but leaves no catalog metadata; this
    registers the bucket spec in the session catalog, which is what lets
    the planner PROVE co-partitioning and drop the exchanges. At scale
    the bucket count is chosen once per subject area (e.g. 4096 on
    orderkey) and every downstream join/aggregation on that key rides it.
    Plan shape is pinned by test: bucketed⋈bucketed must contain no
    shuffle Exchange.

    The pre-write ``repartition(n, key)`` uses the same Murmur3 hash as
    the bucket spec, so each task holds exactly one bucket → ONE file per
    bucket (no small-file fan-out, and the layout needed for Spark to
    exploit the sortBy ordering at read time under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``; the
    default planner still re-sorts per task — bucket-sized in-memory
    runs — but never re-shuffles, which is the expensive part).
    """
    from pyspark.sql import functions as F

    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
