"""Hypothesis property tests for the cross-engine scalar kernels.

Every oracle comparison in the suite bottoms out in a handful of pinned
expressions — the md5→32-bit hash bridge, the rolling-hash fold, in-array
pair generation. These fuzz those kernels against independent replicas
(DuckDB for the hash bridge, pure Python for the folds) on adversarial
generated input, where the seeded-random fuzz in test_tokenizer_parity
covers only the tokenizer.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_toolkit_spark.functions.text import adjacent_pairs, tokenize
from big_data_toolkit_spark.operators.curation import _H32_SQL, _hash32
from big_data_toolkit_spark.operators.quality import ROLLING_MOD, ROLLING_MULT

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), max_size=30))
def test_hash32_bridge_parity(spark, ids):
    """Spark's conv(substr(md5)) == DuckDB's ('0x'||substr(md5))::BIGINT —
    the primitive under sampling, MinHash, and shard packing."""
    df = spark.createDataFrame([(i,) for i in ids], "v long")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", _hash32(F.col("v")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v BIGINT)")
    if ids:
        con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = dict(
        con.sql(f"SELECT v, {_H32_SQL.format(col='v')} FROM t").fetchall()
    )
    con.close()
    assert got == want


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=127),
            max_size=60,
        ),
        max_size=20,
    )
)
def test_rolling_hash_matches_python_fold(spark, texts):
    """The in-row F.aggregate rolling hash == the obvious Python loop."""
    rolling = F.expr(
        "aggregate(filter(split(text, ''), c -> c <> ''), 0L, "
        f"(acc, c) -> (acc * {ROLLING_MULT} + ascii(c)) % {ROLLING_MOD})"
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {r["i"]: r["h"] for r in df.select("i", rolling.alias("h")).collect()}
    for i, t in enumerate(texts):
        acc = 0
        for c in t:
            acc = (acc * ROLLING_MULT + ord(c)) % ROLLING_MOD
        assert got[i] == acc, f"divergence on {t!r}"


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            max_size=60,
        ),
        max_size=20,
    )
)
def test_adjacent_pairs_matches_python_zip(spark, texts):
    """In-array bigram formation == zip(tokens, tokens[1:]) over the same
    pinned tokenization."""
    import re

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: [(p["a"], p["b"]) for p in r["p"]]
        for r in df.withColumn("toks", tokenize("text"))
        .select("i", adjacent_pairs(F.col("toks")).alias("p"))
        .collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in re.split("[^a-zA-Z]+", t.lower()) if w != ""]
        assert got[i] == list(zip(toks, toks[1:])), f"divergence on {t!r}"


@_SETTINGS
@given(
    day_counts=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=5),
)
def test_online_anomaly_fold_is_batch_split_invariant(day_counts, cuts):
    """Folding the same per-day counts through ANY batch partitioning (and
    any within-batch day grouping) yields the same moments and the same
    flagged days as the direct online computation — the property that makes
    the stream twin exact rather than approximate."""
    import pandas as pd

    from big_data_toolkit_spark.streaming.anomaly import (
        _fold_day_batches,
    )
    from big_data_toolkit_spark.operators.analytics_ext import (
        ANOMALY_SIGMAS,
        MIN_ANOMALY_DAYS,
    )

    base_day = 18000  # epoch days, any fixed origin
    # direct online rule over the closed prefix (day d judged incl. d)
    expected = []
    n = s = sq = 0
    for i, cnt in enumerate(day_counts[:-1]):  # last day never closes
        n, s, sq = n + 1, s + cnt, sq + cnt * cnt
        d = cnt * n - s
        big_d = n * sq - s * s
        if (
            n >= MIN_ANOMALY_DAYS
            and big_d > 0
            and d > 0
            and d * d > ANOMALY_SIGMAS**2 * big_d
        ):
            expected.append((base_day + i, cnt))

    # build one ts row per event, split at arbitrary (sorted) day cuts
    all_ts = []
    for i, cnt in enumerate(day_counts):
        all_ts.extend([pd.Timestamp((base_day + i) * 86400, unit="s")] * cnt)
    bounds = sorted({0, len(day_counts)} | {c for c in cuts if c < len(day_counts)})
    batches = []
    for lo, hi in zip(bounds, bounds[1:]):
        days = set(range(base_day + lo, base_day + hi))
        part = [t for t in all_ts if t.value // 10**9 // 86400 in days]
        if part:
            batches.append(pd.DataFrame({"ts": pd.Series(part)}))

    state = (0, 0, 0, -1, 0)
    got = []
    for b in batches:
        *state, out = _fold_day_batches(*state, [b])
        got.extend(
            (pd.Timestamp(r["day"]).value // 10**9 // 86400, r["n_events"])
            for r in out
        )
    assert got == expected


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),  # minute offset
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=200), max_size=4),
)
def test_funnel_fold_is_batch_split_invariant(events, cuts):
    """Folding one user's event stream through ANY time-ordered batch
    partitioning yields the same stage entries as a single-batch fold —
    the property that lets the streaming funnel replay deterministically."""
    import pandas as pd

    from big_data_toolkit_spark.streaming.funnel import _fold_funnel

    events = sorted(events)
    base = pd.Timestamp("2021-01-01")
    ts = [base + pd.Timedelta(minutes=m) for m, _ in events]
    types = [t for _, t in events]
    whole = pd.DataFrame({"ts": pd.Series(ts), "event_type": types})

    *_, out_single = _fold_funnel(-1, -1, -1, -1, [whole])

    bounds = sorted({0, 201} | set(cuts))
    state = (-1, -1, -1, -1)
    out_multi = []
    for lo, hi in zip(bounds, bounds[1:]):
        mask = [lo <= m < hi for m, _ in events]
        part = whole[pd.Series(mask).values]
        if len(part):
            *state, out = _fold_funnel(*state, [part])
            out_multi.extend(out)
    assert out_multi == out_single


@_SETTINGS
@given(
    values=st.lists(
        st.floats(
            min_value=0.0,
            max_value=9.99e8,
            allow_nan=False,
            allow_infinity=False,
        ),
        max_size=30,
    )
)
def test_cents_quantization_parity(spark, values):
    """Spark's (CAST(v AS DECIMAL(18,2)) * 100)::BIGINT == DuckDB's — the
    integer-money primitive every exact-sum oracle leans on (BASELINE.md
    decimal-serialization protocol). Fuzzes the double→DECIMAL rounding
    boundary, where HALF_UP vs round-to-even engines would diverge."""
    from big_data_toolkit_spark.operators.relational_ext import _cents

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v double")
    got = {
        r["i"]: r["c"] for r in df.select("i", _cents("v").alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, v DOUBLE)")
    if values:
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", list(enumerate(values))
        )
    want = dict(
        con.sql(
            "SELECT i, CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT) FROM t"
        ).fetchall()
    )
    con.close()
    assert got == want


@_SETTINGS
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=1,
            max_size=8,
        ),
        max_size=15,
    )
)
def test_fixed_point_quantize_parity(spark, vecs):
    """Spark's floor(double(x) * KMEANS_QUANT) over float32 embeddings ==
    DuckDB's floor(x::DOUBLE * Q)::BIGINT — the quantization that makes
    distributed Lloyd sums order-independent and oracle-exact. floor is
    rounding-mode-unambiguous; the float32→double widening must match too."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from big_data_toolkit_spark.operators.similarity import KMEANS_QUANT, _quantize

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType(), False), False),
        ]
    )
    df = spark.createDataFrame(list(enumerate(vecs)), schema)
    got = {
        r["vec_id"]: list(r["qv"]) for r in _quantize(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[])")
    if vecs:
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", list(enumerate(vecs))
        )
    want = dict(
        con.sql(
            "SELECT vec_id, list_transform(embedding, "
            f"x -> floor(x::DOUBLE * {KMEANS_QUANT})::BIGINT) FROM t"
        ).fetchall()
    )
    con.close()
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_codec_roundtrip_property(h, w, seed):
    """decode(encode(px)) == px for ALL shapes — heights ≥ 5 force every
    row filter through the decoder; width 1 stresses the left-neighbour
    edge cases in Sub/Average/Paeth."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    back = codecs.decode_png(codecs.encode_png_rgb8(px))
    assert back.shape == (h, w, 3)
    assert (back == px).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    channels=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_codec_roundtrip_property(n, rate, channels, seed):
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    frames = n * channels
    s = (
        np.random.default_rng(seed).integers(0, 65536, frames) - 32768
    ).astype(np.int16)
    got_rate, got_ch, back = codecs.decode_wav(
        codecs.encode_wav_pcm16(s, rate, n_channels=channels)
    )
    assert (got_rate, got_ch) == (rate, channels)
    assert (back == s).all()


@_SETTINGS
@given(
    passage_len=st.integers(min_value=0, max_value=8),  # + W below
    pad1=st.integers(min_value=0, max_value=6),
    pad2=st.integers(min_value=0, max_value=6),
    tail1=st.integers(min_value=0, max_value=6),
)
def test_remove_duplicate_spans_excises_exactly_the_passage(
    spark, passage_len, pad1, pad2, tail1
):
    """Exact-substring removal property (Lee et al. semantics): for a
    corpus of globally-unique tokens plus ONE shared passage of length
    L >= W appearing in two docs, the first occurrence's doc is untouched
    and the later doc loses EXACTLY the L passage tokens — the stride-1
    windows fully inside the passage union to cover it, and no window
    crossing the boundary is duplicated (its flanks are unique)."""
    import tempfile

    from pyspark.sql import Row

    from big_data_toolkit_spark.operators import dedup

    W = dedup.DUP_NGRAM_W
    L = W + passage_len

    def words(prefix, n):
        return [f"{prefix}x{'abcdefghijklmnopqrstuvwxyz'[i % 26]}{i // 26}".replace(
            "0", "zero").replace("1", "one").replace("2", "two")
            for i in range(n)]

    shared = words("sh", L)
    d1 = words("pa", pad1) + shared + words("ta", tail1)
    d2 = words("pb", pad2) + shared
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(d1)),
            Row(doc_id=2, text=" ".join(d2)),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicate_spans(spark, d).collect()
        }
    assert out[1]["n_tokens_kept"] == len(d1)
    assert out[1]["clean_text"] == " ".join(d1)
    if len(d2) == L:
        # a doc that IS entirely a later-occurrence passage keeps zero
        # tokens and emits no row at all (documented operator edge)
        assert 2 not in out
    else:
        assert out[2]["n_tokens_kept"] == len(d2) - L
        assert out[2]["clean_text"] == " ".join(words("pb", pad2))


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_star_components_union_find_parity(spark, edges):
    """Alternating-star on arbitrary generated pair sets == a pure-Python
    union-find. The fixed-corpus equivalence tests cover realistic graph
    shapes; this fuzzes the rewiring steps on adversarial ones (self
    loops, parallel edges, chains, stars nested in cycles) against the
    textbook algorithm that cannot be wrong the same way."""
    from big_data_toolkit_spark.operators.dedup import star_components

    pairs = [(d1, d2) for d1, d2 in edges if d1 != d2]
    if not pairs:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # component labels must be each component's MINIMUM member: re-root
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}

    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {
        r["doc_id"]: r["component"]
        for r in star_components(spark, df).collect()
    }
    assert got == want


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=50,
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
def test_lpa_matches_python_replica(spark, edges, rounds):
    """Synchronous self-vote LPA over generated graphs == a pure-Python
    replica of the same fixed-round recurrence (most-frequent label among
    closed neighbourhood, ties to the smallest label). Catches any drift
    in the join/argmax formulation independent of the lineitem-derived
    fixture graph."""
    from big_data_toolkit_spark.operators.pagerank import lpa_labels

    pairs = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not pairs:
        return
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            votes: dict[int, int] = {}
            for m in adj[n] | {n}:
                votes[label[m]] = votes.get(label[m], 0) + 1
            nxt[n] = min(
                votes, key=lambda lbl: (-votes[lbl], lbl)
            )
        label = nxt

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r["node"]: r["community"]
        for r in lpa_labels(spark, df, rounds=rounds).collect()
    }
    assert got == label


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_kcore_matches_python_replica(spark, edges):
    """k-core peeling over generated graphs == the textbook Python
    fixpoint: repeatedly delete nodes of degree < k, report surviving
    nodes with their core degree."""
    from big_data_toolkit_spark.operators.pagerank import (
        KCORE_K,
        kcore_subgraph,
    )

    pairs = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not pairs:
        return
    es = set(pairs)
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        nxt = {(a, b) for a, b in es if a in keep and b in keep}
        if nxt == es:
            break
        es = nxt
    want: dict[int, int] = {}
    for a, b in es:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1

    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {
        r["doc_id"]: r["core_deg"]
        for r in kcore_subgraph(spark, "", pairs=df).collect()
    }
    assert got == want


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_triangle_count_matches_python_replica(spark, edges):
    """Degree-oriented wedge counting over generated graphs == brute-force
    triangle/wedge enumeration. Fuzzes the orientation tie-breaks
    ((degree, id) ordering) that the fixed corpus can't stress."""
    from itertools import combinations

    from big_data_toolkit_spark.operators.pagerank import triangle_count

    pairs = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not pairs:
        return
    es = set(pairs)
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # wedges under (degree, id) orientation: pairs of out-neighbours
    deg = {n: len(adj[n]) for n in adj}

    def rank(n):
        return (deg[n], n)

    out = {n: [m for m in adj[n] if rank(m) > rank(n)] for n in adj}
    n_wedges = sum(
        len(v) * (len(v) - 1) // 2 for v in out.values()
    )
    n_triangles = sum(
        1
        for n, vs in out.items()
        for x, y in combinations(sorted(vs), 2)
        if (min(x, y), max(x, y)) in es
    )

    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    row = triangle_count(spark, "", pairs=df).collect()[0]
    assert (row["n_wedges"], row["n_triangles"]) == (n_wedges, n_triangles)


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=40,
    ),
    iters=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_ppr_matches_numpy_on_generated_graphs(spark, edges, iters, data):
    """Personalized PageRank over generated digraphs == the NumPy replica
    (sources drawn from the graph's own nodes). The corpus parity test
    pins one realistic graph; this fuzzes dangling-node layouts, multi
    edges collapsing under distinct, and source sets of varying size."""
    from tests.test_pagerank import _numpy_ppr

    from big_data_toolkit_spark.operators.pagerank import (
        ALPHA,
        personalized_pagerank,
    )

    pairs = sorted({(s, d) for s, d in edges if s != d})
    if not pairs:
        return
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n_src = data.draw(
        st.integers(min_value=1, max_value=min(3, len(nodes)))
    )
    sources = tuple(nodes[:n_src])

    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            spark, df, sources=sources, iters=iters
        ).collect()
    }
    want = _numpy_ppr(pairs, sources, ALPHA, iters)
    assert got.keys() == want.keys()
    for node, val in want.items():
        assert abs(got[node] - val) < 1e-9, (node, got[node], val)


@_SETTINGS
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    rounds=st.integers(min_value=1, max_value=4),
)
def test_bpe_rounds_match_python_replica(spark, words, rounds):
    """Distributed BPE merge rounds over generated word-frequency tables
    == the classic Python algorithm (overlapping pair counts, argmax by
    count then lexical pair, greedy left-to-right merge application).
    Tiny alphabets force the adversarial cases: runs like 'aaaa', merges
    whose output re-participates next round, count ties."""
    from pyspark.sql import functions as F

    from big_data_toolkit_spark.operators.text_analytics import (
        _bpe_train_words,
    )

    # python replica
    vocab = {w: [ch for ch in w] for w, _ in words}
    counts = dict(words)
    want_merges = []
    for step in range(1, rounds + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, c in counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = (
                    pc.get((syms[i], syms[i + 1]), 0) + c
                )
        if not pc:
            break
        (x, y), total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want_merges.append((step, x, y, total))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    wdf = spark.createDataFrame(
        [(w, c) for w, c in words], "word string, cnt long"
    ).withColumn(
        "syms",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ),
    )
    got_words, got_merges = _bpe_train_words(wdf, rounds)
    assert [
        (s, x, y, int(t)) for s, x, y, t in got_merges
    ] == want_merges
    got_vocab = {
        r["word"]: list(r["syms"]) for r in got_words.collect()
    }
    assert got_vocab == vocab


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
    dri=st.sampled_from([0, 0, 1, 3]),
)
def test_jpeg_codec_roundtrip_property(h, w, seed, dri):
    """Arbitrary grayscale content under unit tables (optionally
    restart-interval coded): decode(encode(x)) within the documented
    |err| <= 4 coefficient-rounding bound at EVERY size, including
    non-multiple-of-8 dims."""
    import numpy as np

    from big_data_toolkit_spark.multimodal import codecs

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    back = codecs.decode_jpeg(codecs.encode_jpeg(px, dri=dri))
    assert back.shape == px.shape
    assert np.abs(back.astype(int) - px.astype(int)).max() <= 4


@settings(max_examples=15, deadline=None)
@given(
    n_member=st.integers(min_value=0, max_value=300),
    n_probe=st.integers(min_value=1, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bloom_packed_test_no_false_negatives(spark, n_member, n_probe, seed):
    """The Bloom contract on arbitrary fingerprint sets and the auto-sized
    m: EVERY member tests positive against the packed bitmap (zero false
    negatives — the property the exact output depends on), via the same
    position exprs and packed-byte indexing the operators use."""
    import numpy as np

    from big_data_toolkit_spark.operators import dedup

    rng = np.random.default_rng(seed)
    members = [f"m{seed}-{i}-{rng.integers(1 << 30)}" for i in range(n_member)]
    fp = spark.createDataFrame(
        [(m,) for m in members] or [("placeholder",)], ["content_md5"]
    )
    if not members:
        fp = fp.limit(0)
    m = dedup.bloom_m_for(len(members))
    bloom = dedup.bloom_bitmap_broadcast(spark, fp, m)
    if members:
        rows = fp.select(
            dedup._bloom_position_array("content_md5", m).alias("pos")
        ).collect()
        mat = np.stack([np.asarray(r["pos"], dtype=np.int64) for r in rows])
        hits = dedup._packed_bloom_test(np.asarray(bloom.packed.value), mat)
        assert hits.all(), "false negative — Bloom contract broken"
    else:
        assert not np.asarray(bloom.packed.value).any()


@settings(max_examples=30, deadline=None)
@given(
    buckets=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # hour offset
            st.integers(min_value=1, max_value=5),  # events in that hour
        ),
        min_size=1,
        max_size=30,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=4),
    lead=st.integers(min_value=0, max_value=3),  # leading-gap hours
)
def test_gapfill_fold_is_batch_split_invariant(buckets, cuts, lead):
    """Folding one key's hour-ordered events through ANY time-ordered
    batch partitioning emits the same closed-hour rows, gap rows, and
    carried averages as a single-batch fold — the property that makes
    stream_gapfill_locf equal its batch twin regardless of micro-batch
    boundaries."""
    import pandas as pd

    from big_data_toolkit_spark.streaming.trending import (
        GAPFILL_HOUR,
        _fold_gapfill,
    )

    base = 18000 * 24  # epoch hours
    grid_start = (base - lead) * GAPFILL_HOUR
    hours = sorted({h for h, _ in buckets})
    per_hour = {}
    for h, c in buckets:
        per_hour[h] = per_hour.get(h, 0) + c
    rows = []
    for h in hours:
        for j in range(per_hour[h]):
            rows.append(
                (
                    pd.Timestamp((base + h) * GAPFILL_HOUR, unit="s"),
                    float(j) + 0.25,
                )
            )
    whole = pd.DataFrame(
        {"ts": pd.Series([r[0] for r in rows]),
         "value": [r[1] for r in rows]}
    )

    *_, out_single = _fold_gapfill(-1, 0, 0, [whole], grid_start)

    bounds = sorted({0, 41} | set(cuts))
    state = (-1, 0, 0)
    out_multi = []
    for lo, hi in zip(bounds, bounds[1:]):
        mask = whole["ts"].apply(
            lambda t: lo <= t.value // 10**9 // GAPFILL_HOUR - base < hi
        )
        part = whole[mask.values]
        if len(part):
            *state, out = _fold_gapfill(*state, [part], grid_start)
            out_multi.extend(out)
    assert out_multi == out_single


@settings(max_examples=200, deadline=None)
@given(
    data=st.data(),
    dim=st.integers(min_value=1, max_value=16),
    k=st.integers(min_value=1, max_value=8),
)
def test_ordered_fold_numpy_is_bitwise_ieee(data, dim, k):
    """The r13 Arrow-exact assignment's core claim, fuzzed: a numpy
    per-dimension accumulation (acc += (x−c)²) is BIT-identical to the
    JVM/Python left-to-right fold — same subtract/square/add sequence in
    IEEE float64 — and argmin's first-minimum matches the
    array_position(array_min) tie rule, including manufactured exact
    ties (duplicate centroids)."""
    import numpy as np

    ticks = st.integers(min_value=-(10**6), max_value=10**6)
    rows = data.draw(
        st.lists(
            st.lists(ticks, min_size=dim, max_size=dim),
            min_size=1,
            max_size=8,
        )
    )
    cents = data.draw(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                min_size=dim,
                max_size=dim,
            ),
            min_size=k,
            max_size=k,
        )
    )
    if k >= 2 and data.draw(st.booleans()):
        cents[-1] = list(cents[0])  # exact-tie pressure

    # the literal fold, replicated in Python floats (IEEE float64)
    def fold(q, c):
        acc = 0.0
        for x, y in zip(q, c):
            acc = acc + (float(x) - y) * (float(x) - y)
        return acc

    ref = [
        min(range(k), key=lambda j: (fold(q, cents[j]), j)) for q in rows
    ]
    Q = np.array(rows, dtype=np.float64)
    C = np.array(cents, dtype=np.float64)
    d = np.empty((len(rows), k))
    for j in range(k):
        acc = np.zeros(len(rows))
        for i in range(dim):
            t = Q[:, i] - C[j, i]
            acc += t * t
        d[:, j] = acc
    # distances bitwise equal, argmin first-minimum == (dist, j) min
    for r, q in enumerate(rows):
        for j in range(k):
            assert d[r, j] == fold(q, cents[j]), (r, j)
    assert list(np.argmin(d, axis=1)) == ref
