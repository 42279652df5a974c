"""SparkSession bootstrap tuned for both local testing and large clusters.

The reference (devp12345/big-data-toolkit) hand-builds a SparkContext per
program (e.g. ``a6/Q1.scala:44-46``, ``a0/WordCountSimple.java:121-129``) and
hand-codes every physical decision. Here a single session factory enables the
Catalyst/AQE machinery that replaces all of that:

* AQE (adaptive query execution): runtime broadcast-join conversion, skew-join
  splitting, and shuffle-partition coalescing — replaces the reference's
  hard-coded ``collectAsMap``+broadcast (``a6/Q3.scala:49-57``) and custom
  partitioners (``a2/ComputeBigramRelativeFrequencyPairs.scala:24-30``).
* Arrow for the few pandas-UDF paths (sequential SGD, multimodal decode).

At 100 TB the same settings hold: AQE right-sizes reducers from map output
statistics, so ``shuffle.partitions`` here is only the pre-AQE upper bound for
local runs; on a real cluster you would raise the bound
(``spark.sql.shuffle.partitions=2000+``) and let AQE coalesce down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Pre-AQE shuffle-partition bound for local[N] testing. On a 1000-executor
# cluster this would be ~2-4x total cores; AQE coalesces small partitions
# either way, so over-provisioning is cheap and under-provisioning is not.
_LOCAL_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def _ensure_workers_can_import_engine() -> None:
    """Python workers inherit $PYTHONPATH, NOT the driver's sys.path: a
    driver launched from any cwd other than the repo root can plan queries
    fine and then die in the first cloudpickled UDF with
    ``ModuleNotFoundError: big_data_toolkit_spark`` on the worker.  Put the
    repo root on PYTHONPATH before the JVM (and thus any worker) starts."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )


def build_spark(
    app_name: str = "big-data-toolkit-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults applied."""
    _ensure_workers_can_import_engine()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- Adaptive execution: the scale story -------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Shuffle sizing ---------------------------------------------
        .config("spark.sql.shuffle.partitions", _LOCAL_SHUFFLE_PARTITIONS)
        # Target split size for file scans; 128 MB is the classic sweet spot
        # (matches parquet row-group sizing at scale).
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- Python <-> JVM data path ------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- Timestamps: deterministic, TZ-independent semantics ---------
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet filter pushdown is on by default; stated explicitly since
        # the whole design leans on it.
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def get_spark() -> SparkSession:
    """Active session if one exists (driver-provided), else build one."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return build_spark()
