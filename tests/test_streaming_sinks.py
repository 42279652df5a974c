from __future__ import annotations

import glob
import os

from big_data_toolkit_spark.sources.writers import foreach_batch_per_window_sink
from big_data_toolkit_spark.streaming import windows


def test_foreach_batch_sink_writes_batch_stamped_dirs(spark, tmp_path):
    """S10/S11/ST8: streaming region counts land in one dir per micro-batch."""
    src = str(tmp_path / "src")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batches = [
        [(f"e{i}", t0 + dt.timedelta(seconds=i), "click") for i in range(4)],
        [(f"f{i}", t0 + dt.timedelta(minutes=90, seconds=i), "purchase") for i in range(3)],
    ]
    for i, batch in enumerate(batches):
        spark.createDataFrame(
            batch, "event_id string, ts timestamp, event_type string"
        ).coalesce(1).write.parquet(os.path.join(src, f"batch_{i:04d}"))

    stream = (
        spark.readStream.schema("event_id string, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "batch_*"))
    )
    prefix = str(tmp_path / "out" / "window")
    q = (
        windows.stream_region_event_count(stream)
        .writeStream.outputMode("update")
        .foreachBatch(foreach_batch_per_window_sink(prefix))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    dirs = sorted(glob.glob(prefix + "-*"))
    assert len(dirs) >= 2  # one dir per micro-batch, batch-id stamped
    total = []
    for d in dirs:
        total.extend(spark.read.parquet(d).collect())
    got = {(r["region"], r["cnt"]) for r in total}
    assert ("citigroup", 4) in got
    assert ("goldman", 3) in got
