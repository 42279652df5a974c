"""Engine-vs-oracle fuzzing on GENERATED tables.

The driver gate compares engine and oracle on the fixed testdata; these
tests re-run the same compare over randomized miniature schema dirs, so
the subtle translations (correlated subqueries, tie-breaks under equal
sort keys, RANGE frames over duplicate timestamps, sessionization gap
edges) are exercised on shapes the fixed generator may never emit.

Two generators:
* the TPC-H miniature from ``test_sql_analytics._write_fuzz_sf`` —
  reused for the tie-prone relational shapes (Q15's max-over-view ties,
  Q13's zero bucket, Q22's NOT-EXISTS, ratio windows);
* an events miniature here, tuned for the window/sessionization family:
  timestamps are drawn from a SMALL pool of distinct seconds so exact
  ties — including same-user-same-second — are common, which is exactly
  where RANGE frames, session gap boundaries, and documented tie-break
  orderings diverge if either side gets them wrong.  The twice-red
  ``user_value_moving_avg`` (r6/r7 HUGEINT episode) is a permanent
  member.
"""

from __future__ import annotations

import os
import shutil

import pytest

import __spark_entry__ as entry
from tests.oracle_utils import compare
from tests.test_sql_analytics import _write_fuzz_sf

TPCH_FUZZ = [
    "q15_top_supplier",           # max-over-view: ties on the max
    "q17_small_quantity_revenue",  # correlated scalar avg
    "q13_customer_distribution",   # LEFT OUTER zero bucket
    "dormant_rich_customers",      # Q22: global avg + NOT EXISTS
    "q18_large_volume_customers",  # HAVING over grouped sum
    "q11_important_parts",         # global-scalar fraction threshold
    "q8_market_share",             # ratio-to-report window, ppm ints
]

EVENTS_FUZZ = [
    "user_value_moving_avg",   # RANGE frame over duplicate seconds
    "event_count_sliding",     # width != slide window set
    "user_sessions",           # 30-min gap sessionization
    "session_paths",           # in-session trigrams, (ts, event_id) ties
    "event_funnel",            # ordered stage progression
    "retention_cohorts",       # cohort date bucketing
    "error_bursts",            # gaps-and-islands burst detection
    "daily_activity_full",     # dense calendar incl. empty days
    "dau_wau_stickiness",      # rolling distinct-user windows
    "asof_purchase_attribution",  # as-of backward join, tie at equal ts
]


def _write_events_fuzz(tmpdir: str, seed: int) -> str:
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(1000 + seed)
    out = os.path.join(tmpdir, f"evfuzz{seed}")
    os.makedirs(out, exist_ok=True)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )

    n_ev, n_users = 400, 12
    # a SMALL pool of distinct seconds over ~3 days -> many exact ties,
    # including same-user-same-second rows
    pool = rng.integers(0, 3 * 86400, 120)
    secs = rng.choice(pool, n_ev)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(secs, unit="s")
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(1, n_users + 1, n_ev).astype("int64"),
        "event_type": rng.choice(
            ["signup", "click", "view", "purchase", "error"], n_ev
        ),
        "value": np.round(rng.uniform(0, 300, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(f"{out}/events.parquet")
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", TPCH_FUZZ)
def test_tpch_shapes_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_fuzz_sf(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", EVENTS_FUZZ)
def test_events_family_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_events_fuzz(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)


DOCS_FUZZ_LIGHT = [
    "dedup_exact",
    "span_dedup",
    "duplicate_ngram_spans",
    "remove_duplicate_spans",
    "curated_corpus",
    "quality_score",
    "repetition_score",
]
DOCS_FUZZ_HEAVY = [  # heavier SQL-replica oracles: one seed keeps runtime sane
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "cross_source_leakage",
]
EMB_FUZZ = [
    "knn_brute_force",
    "knn_lsh",
    "knn_ivf",
    "knn_int8",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
]

_VOCAB = (
    "spark table join order sort merge scan hash filter group query row "
    "data slow fast small big key value line batch stream window column "
    "vector customer part agg dup the a"
).split()


def _write_docs_fuzz(tmpdir: str, seed: int) -> str:
    """Documents corpus with PLANTED duplicate structure: verbatim
    copies (exact dedup), one-word-edit near-dups (shingle/MinHash/
    SimHash candidates), a shared 12-word passage stitched into three
    otherwise-different docs (span dedup), and the same text under two
    sources (cross-source leakage)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(2000 + seed)
    out = os.path.join(tmpdir, f"docfuzz{seed}")
    os.makedirs(out, exist_ok=True)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    ):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )

    def doc(n):
        return " ".join(rng.choice(_VOCAB, n))

    texts = [doc(int(rng.integers(15, 60))) for _ in range(40)]
    # exact duplicates of docs 0-4
    texts += [texts[i] for i in range(5)]
    # near-dups of docs 5-9: one word substituted mid-document
    for i in range(5, 10):
        words = texts[i].split()
        words[len(words) // 2] = "edited"
        texts.append(" ".join(words))
    # a shared passage planted into three fresh docs
    passage = doc(12)
    for _ in range(3):
        texts.append(f"{doc(8)} {passage} {doc(8)}")
    langs = rng.choice(["en", "es", "zh", "de"], len(texts))
    sources = [f"src{i % 4}" for i in range(len(texts))]
    # leakage: doc 0's text re-emitted under a DIFFERENT source
    texts.append(texts[0])
    langs = np.append(langs, "en")
    sources.append("srcX")
    pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype="int64"),
        "text": texts,
        "lang": langs,
        "source": sources,
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }).to_parquet(f"{out}/documents.parquet")
    return out


def _write_emb_fuzz(tmpdir: str, seed: int) -> str:
    """Embeddings with planted exact-duplicate vectors (rows 30-34 copy
    0-4) and epsilon near-dups (rows 40-44 perturb 5-9); vec_ids cover
    the pinned QUERY_VEC_ID (0) and CENTROID_IDS (10-25)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3000 + seed)
    out = os.path.join(tmpdir, f"embfuzz{seed}")
    os.makedirs(out, exist_ok=True)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents",
    ):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )

    n, dim = 80, 64
    vecs = np.round(rng.uniform(-1, 1, (n, dim)), 3).astype("float32")
    for i in range(5):
        vecs[30 + i] = vecs[i]                       # exact duplicates
        vecs[40 + i] = vecs[5 + i] + np.float32(0.001)  # near-duplicates
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype="int64")),
        "embedding": pa.array(
            [v.tolist() for v in vecs], type=pa.list_(pa.float32())
        ),
        "label": pa.array(rng.integers(0, 10, n).astype("int32")),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", DOCS_FUZZ_LIGHT)
def test_docs_family_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_docs_fuzz(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)


@pytest.mark.parametrize("name", DOCS_FUZZ_HEAVY)
def test_docs_family_fuzz_vs_oracle_heavy(spark, tmp_path, name):
    sf = _write_docs_fuzz(str(tmp_path), 0)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", EMB_FUZZ)
def test_embeddings_family_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_emb_fuzz(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)


def test_docs_fuzz_plants_are_detected(spark, tmp_path):
    """The planted structure must actually be FOUND (guards the fuzz
    against vacuous agreement): exact dedup groups the verbatim copies,
    the near-dup pairs surface in the jaccard candidates, and the
    leakage query flags the cross-source re-emission."""
    sf = _write_docs_fuzz(str(tmp_path), 0)
    exact = entry.queries()["dedup_exact"](spark, sf).collect()
    import duckdb

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM '{sf}/documents.parquet'"
    ).fetchone()[0]
    con.close()
    # ≥6 planted verbatim copies (5 dups + 1 leak) must collapse
    assert len(exact) <= n_docs - 6
    leak = entry.queries()["cross_source_leakage"](spark, sf).collect()
    assert leak, "planted cross-source duplicate not flagged"


SKEW_FUZZ = [
    "skewed_join_enrich",      # the salted hot-key join itself
    "distinct_users_by_type",  # two-phase distinct under key skew
    "user_value_moving_avg",   # one giant user partition's RANGE frames
    "user_sessions",           # one user's session chain dominates
    "dau_wau_stickiness",      # rolling distincts with a dominant user
    "event_count_hourly",      # hot hours
]


def _write_skew_fuzz(tmpdir: str, seed: int) -> str:
    """Adversarially SKEWED events: one user emits ~80% of all events,
    one event_type covers ~70%, and half of everything lands inside a
    single hot hour — the layouts where salted joins, two-phase
    distincts, and per-key window state either hold or break."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(4000 + seed)
    out = os.path.join(tmpdir, f"skewfuzz{seed}")
    os.makedirs(out, exist_ok=True)
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", f"{out}/{t}.parquet"
        )

    n_ev = 500
    users = np.where(
        rng.uniform(size=n_ev) < 0.8, 7, rng.integers(1, 13, n_ev)
    ).astype("int64")
    types = np.where(
        rng.uniform(size=n_ev) < 0.7,
        "click",
        rng.choice(["signup", "view", "purchase", "error"], n_ev),
    )
    # half the corpus inside ONE hot hour, the rest across 2 days
    hot = rng.uniform(size=n_ev) < 0.5
    secs = np.where(
        hot,
        3600 * 5 + rng.integers(0, 3600, n_ev),
        rng.integers(0, 2 * 86400, n_ev),
    )
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(secs, unit="s")
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": ts.astype("datetime64[us]"),
        "user_id": users,
        "event_type": types,
        "value": np.round(rng.uniform(0, 300, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(f"{out}/events.parquet")
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("name", SKEW_FUZZ)
def test_skewed_events_fuzz_vs_oracle(spark, tmp_path, name, seed):
    sf = _write_skew_fuzz(str(tmp_path), seed)
    compare(entry.queries()[name](spark, sf), entry.oracle_sql()[name], sf)
