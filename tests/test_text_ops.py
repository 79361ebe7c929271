"""Laws of the round-15 vectorized BPE apply leg (text.py).

The memoized Python fold (`_bpe_pieces_py`) must count pieces exactly
like the SQL fold chain it replaced (`_q197_seg_spark`) — the oracle
replays that chain in DuckDB, so any divergence is a hash break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.operators.text import (
    _Q197_MERGES,
    _bpe_pieces_py,
    _q197_seg_spark,
)

# adversarial shapes: cascade bait (aaaa), merged-symbol-reuse bait
# (abb with a+b), chain-dependent merges (th then the), single chars,
# symbols that embed each other
_ADVERSARIAL = [
    "aaaa",
    "abb",
    "aab",
    "the",
    "thethe",
    "ththe",
    "a",
    "b",
    "z",
    "and",
    "anand",
    "innin",
    "errrre",
]


def _sql_piece_counts(spark, tokens, merges):
    seg = _q197_seg_spark(merges)
    df = spark.createDataFrame([(t,) for t in tokens], "t string")
    rows = df.select(
        "t",
        F.expr(f"size(split(substring({seg}, 2), '\\\\|'))").alias("n"),
    ).collect()
    return {r.t: r.n for r in rows}


def test_python_fold_matches_sql_fold_fixed_chain(spark, sf_dir):
    corpus_tokens = sorted(
        r.t
        for r in load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.expr("filter(split(lower(text), '[^a-z]+'), t -> t <> '')")
            ).alias("t")
        )
        .distinct()
        .collect()
    )
    tokens = sorted(set(corpus_tokens) | set(_ADVERSARIAL))
    merges = tuple(_Q197_MERGES)
    want = _sql_piece_counts(spark, tokens, list(merges))
    for t in tokens:
        assert _bpe_pieces_py(t, merges) == want[t], t


def test_python_fold_matches_sql_fold_mined_style_chain(spark):
    # a chain whose later merges consume earlier merges' symbols AND
    # whose symbols overlap (a+a -> aa, aa+a -> aaa, aaa+b)
    merges = (("a", "a"), ("aa", "a"), ("aaa", "b"), ("b", "b"))
    tokens = _ADVERSARIAL + ["aaab", "aaaab", "aabb", "bbbb", "abab"]
    want = _sql_piece_counts(spark, tokens, list(merges))
    for t in tokens:
        assert _bpe_pieces_py(t, merges) == want[t], t
