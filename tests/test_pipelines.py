from __future__ import annotations

import math

import pytest

from big_data_toolkit_spark import pipelines

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "a perfect day for bananafish a perfect storm",
    "a perfect day indeed said the fox",
    "",
    "solo",
    "the quick brown fox sleeps",
]


@pytest.fixture()
def corpus_path(tmp_path):
    p = str(tmp_path / "corpus.txt")
    with open(p, "w") as f:
        f.write("\n".join(CORPUS))
    return p


def test_word_count_text(spark, corpus_path):
    got = {r["word"]: r["cnt"] for r in pipelines.word_count_text(spark, corpus_path).collect()}
    assert got["the"] == 4
    assert got["perfect"] == 3
    assert got["solo"] == 1
    assert "" not in got


def test_perfect_x_text(spark, corpus_path):
    got = {r["word"]: r["cnt"] for r in pipelines.perfect_x_text(spark, corpus_path).collect()}
    # 'day' follows 'perfect' twice (>1 kept); 'storm' once (suppressed)
    assert got == {"day": 2}


def test_bigram_relfreq_text(spark, corpus_path):
    rows = {(r["a"], r["b"]): r for r in
            pipelines.bigram_relative_frequency_text(spark, corpus_path).collect()}
    # 'the' is followed by: quick(2), lazy(1), fox(1) -> rel freq 0.5/0.25/0.25
    assert rows[("the", "quick")]["rel_freq"] == pytest.approx(0.5)
    assert rows[("the", "lazy")]["rel_freq"] == pytest.approx(0.25)
    # single-token and empty lines contributed no pairs
    assert ("solo",) not in {k[:1] for k in rows if rows[k]["a"] == "solo"}


def test_pmi_text_matches_hand_formula(spark, corpus_path):
    rows = pipelines.pmi_text(spark, corpus_path, threshold=2).collect()
    by_pair = {(r["a"], r["b"]): r for r in rows}
    # (perfect, day) co-occur in 2 lines; perfect in 2, day in 2, N=6
    got = by_pair[("perfect", "day")]
    assert got["pair_cnt"] == 2
    assert got["pmi"] == pytest.approx(round(math.log10(2 * 6 / (2 * 2)), 6), abs=1e-6)
    # threshold respected
    assert all(r["pair_cnt"] >= 2 for r in rows)


def test_q1_q2_from_tbl(spark, tmp_path):
    li = tmp_path / "lineitem.tbl"
    li.write_text(
        "1|10|100|1|17.0|100.5|0.04|0.02|N|O|1998-08-23\n"
        "2|20|200|1|36.0|200.5|0.10|0.05|R|F|1998-08-23\n"
        "3|30|300|1|8.0|300.5|0.00|0.00|A|F|1995-01-02\n"
    )
    orders = tmp_path / "orders.tbl"
    orders.write_text(
        "1|101|O|1000.0|1998-08-01|5-LOW|Clerk#000000001\n"
        "2|102|F|2000.0|1998-08-02|1-URGENT|Clerk#000000002\n"
        "3|103|P|3000.0|1995-01-01|3-MEDIUM|Clerk#000000003\n"
    )
    assert pipelines.q1_from_tbl(spark, str(li), "1998-08-23").collect()[0]["cnt"] == 2
    rows = pipelines.q2_from_tbl(spark, str(li), str(orders), "1998-08-23").collect()
    assert [(r["o_clerk"], r["o_orderkey"]) for r in rows] == [
        ("Clerk#000000001", 1),
        ("Clerk#000000002", 2),
    ]


@pytest.fixture()
def spam_files(tmp_path):
    inst = tmp_path / "instances.txt"
    inst.write_text(
        "doc1 spam 1 2 3\n"
        "doc2 ham 4 5\n"
        "doc3 spam 1 5\n"
    )
    m1 = tmp_path / "model1.txt"
    m1.write_text("(1,1.0)\n(2,0.5)\n(3,0.25)\n(4,-1.0)\n(5,-0.5)\n")
    m2 = tmp_path / "model2.txt"
    m2.write_text("(1,0.2)\n(4,-0.2)\n(5,0.3)\n")
    m3 = tmp_path / "model3.txt"
    m3.write_text("(1,-0.1)\n(4,-0.4)\n(5,-0.2)\n")
    return str(inst), [str(m1), str(m2), str(m3)]


def test_apply_spam_classifier(spark, spam_files):
    inst, models = spam_files
    rows = {r["docid"]: r for r in
            pipelines.apply_spam_classifier(spark, inst, models[0]).collect()}
    assert rows["doc1"]["spamminess"] == pytest.approx(1.75)
    assert rows["doc1"]["prediction"] == "spam"
    assert rows["doc2"]["spamminess"] == pytest.approx(-1.5)
    assert rows["doc2"]["prediction"] == "ham"
    assert rows["doc3"]["spamminess"] == pytest.approx(0.5)


def test_ensemble_average_and_vote(spark, spam_files):
    inst, models = spam_files
    avg = {r["docid"]: r for r in
           pipelines.apply_ensemble_spam_classifier(spark, inst, models, "average").collect()}
    # doc2 scores: m1=-1.5, m2=0.1, m3=-0.6 -> avg = -2/3
    assert avg["doc2"]["score"] == pytest.approx(round(-2.0 / 3, 6), abs=1e-6)
    assert avg["doc2"]["prediction"] == "ham"
    vote = {r["docid"]: r for r in
            pipelines.apply_ensemble_spam_classifier(spark, inst, models, "vote").collect()}
    # doc2 votes: -1, +1, -1 -> -1 -> ham
    assert vote["doc2"]["score"] == pytest.approx(-1.0)
    assert vote["doc2"]["prediction"] == "ham"
    with pytest.raises(ValueError):
        pipelines.apply_ensemble_spam_classifier(spark, inst, models, "median")


def test_pagerank_from_adjacency(spark, tmp_path):
    g = tmp_path / "graph.txt"
    g.write_text("1 2 3\n2 3\n3\n4 1\n")
    rows = pipelines.pagerank_from_adjacency(spark, str(g), sources=(1,), iters=5)
    got = {r["node"]: r["rank"] for r in rows.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert abs(sum(got.values()) - 1.0) < 1e-5  # mass conserved
    assert got[1] == max(got.values())  # source holds the teleport mass
