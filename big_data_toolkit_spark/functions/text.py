"""Text scalar functions — the engine's pinned tokenizer and helpers.

The reference tokenizes through bespin's ``Tokenizer`` (imported, not defined
in-repo; used at ``a0/WordCountSimple.java:60``, ``a2/*.scala:63``): lowercase,
split on runs of non-letters, drop empties. That exact behavior is pinned here
as a single JVM-side expression so every text operator (word count, bigrams,
PMI, inverted index, quality scoring) shares it and stays inside whole-stage
codegen — no Python UDF in any text hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned tokenizer regex (bespin parity): split lowercased text on non-letters.
TOKEN_SPLIT_REGEX = "[^a-z]+"

# DuckDB-side equivalent, used by oracle SQL builders.
DUCKDB_TOKENS = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z]+'), w -> w <> '')"
)


def tokenize(col: Column | str) -> Column:
    """lowercase → split on non-letter runs → drop empty strings.

    Returns ``array<string>``; stays entirely in Catalyst expressions.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_REGEX), lambda w: w != F.lit(""))


def adjacent_pairs(tokens: Column) -> Column:
    """All adjacent token pairs as ``array<struct<a,b>>`` — computed in-place.

    Replaces the reference's ``tokens.sliding(2)``
    (``a2/ComputeBigramRelativeFrequencyPairs.scala:65``) without the
    shuffle+sort a window-function formulation (lead over pos) would need:
    pair formation happens inside the row, so the only shuffle in a bigram
    count is the final aggregation.
    """
    # size<2 guard: sequence(0, -1) would count DOWN, so empty/single-token
    # rows (which the reference skips,
    # a2/ComputeBigramRelativeFrequencyPairs.scala:64-70) yield [].
    return F.expr(
        "CASE WHEN size({t}) < 2 THEN array() "
        "ELSE transform(sequence(0, size({t}) - 2), "
        "i -> struct({t}[i] AS a, {t}[i+1] AS b)) END".format(t=_sql(tokens))
    )


def ordered_cooccurrence_pairs(tokens: Column) -> Column:
    """All ordered pairs (x, y), x != y, of an array — in-place generation.

    Replaces the reference's nested pair-emission loops
    (``a2/PairsPMI.scala:84-93``, ``a1/PairsPMI.java:111-119``). With the
    40-token cap applied upstream, each row yields at most 40*39 pairs,
    generated map-side and immediately partial-aggregated — no self-join
    shuffle on doc_id.
    """
    t = _sql(tokens)
    return F.expr(
        f"flatten(transform({t}, x -> "
        f"transform(filter({t}, y -> y != x), y -> struct(x AS a, y AS b))))"
    )


def unordered_cooccurrence_pairs(tokens: Column) -> Column:
    """Each unordered pair once, as (a, b) with a < b — in-place generation.

    Half the rows of ``ordered_cooccurrence_pairs``: symmetric statistics
    (PMI: count(a,b) == count(b,a)) only need one orientation through the
    shuffle; the other is reconstructed by mirroring the (far smaller)
    aggregate. Tokens are distinct within a row, so ``y > x`` emits every
    pair exactly once.
    """
    t = _sql(tokens)
    return F.expr(
        f"flatten(transform({t}, x -> "
        f"transform(filter({t}, y -> y > x), y -> struct(x AS a, y AS b))))"
    )


def _sql(col: Column | str) -> str:
    """Render a simple column reference for use inside F.expr."""
    if isinstance(col, str):
        return col
    # Column's toString is 'name' or "name AS alias" for simple refs; the
    # callers here only pass plain references or names.
    s = col._jc.toString()
    if not s.replace("_", "").isalnum():
        raise ValueError(f"adjacent/pair helpers need a simple column ref, got {s!r}")
    return s
