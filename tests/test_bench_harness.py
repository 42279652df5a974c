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


def test_baseline_retrials_medians(spark, monkeypatch):
    """The governing subset numbers are interleaved-trial medians: the
    sweep value is trial 1, retrials append, and one slow outlier trial
    cannot dominate the reported number."""
    monkeypatch.setattr(bench, "BASELINE_QUERIES", frozenset({"a", "b"}))

    def mk(name):
        def fn(s, sf_dir):
            return s.range(2)

        return fn

    headline = {"a": mk("a"), "b": mk("b"), "tail": mk("tail")}
    sweep = {"a": 10.0, "b": 0.2, "tail": 0.3}
    medians, trials = bench.baseline_retrials(
        spark, "unused", headline, sweep, n_trials=3
    )
    assert set(medians) == {"a", "b"}  # tail queries are never retried
    assert len(trials["a"]) == 3 and trials["a"][0] == 10.0
    # real retrials of s.range(2) run in far under 10 s, so the median
    # must have rejected the synthetic 10 s sweep outlier
    assert medians["a"] < 10.0
    assert medians["a"] == sorted(trials["a"])[1]


def test_baseline_retrials_skips_sweep_errors(spark):
    """A query that errored in the sweep has no timing row — retrials
    must not resurrect it (its error row is the evidence)."""

    def fn(s, sf_dir):
        return s.range(1)

    medians, trials = bench.baseline_retrials(
        spark, "unused", {"q1": fn}, {}, n_trials=3
    )
    assert medians == {} and trials == {}
