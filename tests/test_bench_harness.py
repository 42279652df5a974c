"""Guards on bench.py: the per-round perf evidence must survive one broken
query (round 3 lost its entire bench to a single unhandled failure)."""

from __future__ import annotations

import bench


def test_time_queries_isolates_failures(spark):
    calls = []

    def ok(s, sf_dir):
        calls.append("ok")
        return s.range(5)

    def broken(s, sf_dir):
        raise RuntimeError("synthetic breakage")

    def ok2(s, sf_dir):
        calls.append("ok2")
        return s.range(3)

    timings, errors = bench.time_queries(
        spark, "unused", {"a": ok, "boom": broken, "b": ok2}
    )
    assert set(timings) == {"a", "b"}
    assert all(v >= 0 for v in timings.values())
    assert set(errors) == {"boom"}
    assert "RuntimeError" in errors["boom"]
    # queries after the failure still ran
    assert "ok2" in calls


def test_headline_covers_baseline_subset():
    missing = bench.BASELINE_QUERIES - set(bench.HEADLINE)
    assert not missing, f"baseline queries missing from HEADLINE: {missing}"
