"""Empty-input robustness sweep over the whole driver registry.

Runs every ``__spark_entry__.queries()`` entry against ZERO-ROW copies of
the testdata tables (schemas preserved) and enforces the engine's
empty-input contract:

* a query either returns a DataFrame whose ``collect()`` succeeds
  (normally 0 rows, but constant-emitting queries may emit), or
* raises an EXPLICIT ``ValueError`` naming the precondition it needs
  (seeded centroids, designated index vectors, a non-empty covariance) —

never an opaque ``IndexError`` / ``TypeError`` / numpy shape error. The
r7 review found one such crash (pca_variance); this sweep pins the whole
class for all 150 queries.

Usage:
    python scripts/empty_sweep.py            # sweep, exit 1 on violations
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from big_data_toolkit_spark.session import build_spark  # noqa: E402

SRC = "/root/testdata/sf0.001"


def make_empty_dir(spark, dst: str) -> None:
    for f in sorted(os.listdir(SRC)):
        if f.endswith(".parquet"):
            df = spark.read.parquet(os.path.join(SRC, f))
            df.limit(0).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(dst, f)
            )


def main() -> int:
    spark = build_spark(app_name="empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    dst = tempfile.mkdtemp(prefix="bdts-empty-sf-")
    make_empty_dir(spark, dst)

    t0 = time.perf_counter()
    ok = 0
    explicit: dict[str, str] = {}
    violations: dict[str, str] = {}
    for name, fn in entry.queries().items():
        try:
            fn(spark, dst).collect()
            ok += 1
        except ValueError as ex:
            msg = str(ex)
            # an explicit guard names the operator or the missing input;
            # bare numpy/stdlib ValueErrors ("axis 1 is out of bounds")
            # do not — treat those as contract violations too
            if any(w in msg for w in ("table", "index", "centroid", name.split("_")[0])):
                explicit[name] = msg[:100]
            else:
                violations[name] = f"opaque ValueError: {msg[:150]}"
        except Exception as ex:  # noqa: BLE001
            violations[name] = f"{type(ex).__name__}: {str(ex)[:150]}"
    spark.stop()

    print(
        json.dumps(
            {
                "checked": ok + len(explicit) + len(violations),
                "empty_ok": ok,
                "explicit_valueerror": len(explicit),
                "violations": violations,
                "seconds": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
