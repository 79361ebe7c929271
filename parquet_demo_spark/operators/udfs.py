"""UDF surface S32 (SURVEY §2B): every Python-extension point, each
hash-checked against its native-function twin.

Hierarchy (fastest first — and the engine's guidance order):

1. Built-in ``pyspark.sql.functions`` — JVM, whole-stage codegen. The
   default; every other module here uses only these.
2. ``pandas_udf`` — Arrow-vectorized Series→Series. ~10-100× faster
   than row UDFs; the floor for custom scalar math.
3. ``applyInPandas`` — grouped-map (UDAF-shaped) pandas per group.
4. ``mapInPandas`` / ``mapInArrow`` — per-partition batch iterators
   (UDTF-shaped, custom scans/decoders — see operators/multimodal.py).
5. Row-at-a-time ``F.udf`` — exists for completeness; deliberately NOT
   used in any query (serde per row). Covered by a unit test only.

Determinism: Python stages do integer/exact arithmetic (or IEEE double
ops identical to the JVM's) so results hash-match the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register


# --- 2. scalar pandas_udf ------------------------------------------------
# (created inside the query: pandas_udf return-type parsing needs an
# active SparkSession, which doesn't exist at module import)


def _disc_revenue_udf():
    @pandas_udf("long")
    def _disc_revenue_e4(price: pd.Series, discount: pd.Series) -> pd.Series:
        # Exact integer space: price is a 2-decimal value, discount a
        # 2-decimal fraction → cents × (100 - pct) is an exact int64 in
        # units of 1e-4. (A double product + ROUND is NOT cross-engine
        # safe: exact .xx5 expansions round differently in Spark vs
        # DuckDB — see functions module docstring.)
        cents = (price * 100).round().astype("int64")
        pct = (discount * 100).round().astype("int64")
        return cents * (100 - pct)

    return _disc_revenue_e4


@register(
    "q56_pandas_udf_twin",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                AS BIGINT) AS revenue_e4,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="S32 pandas_udf (Arrow Series→Series): discounted revenue in "
    "exact integer space (cents × discount-complement), aggregated "
    "JVM-side — hash-equal to the all-native SQL twin.",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    disc_revenue = _disc_revenue_udf()
    return (
        li.withColumn(
            "rev_e4", disc_revenue(F.col("l_extendedprice"), F.col("l_discount"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum("rev_e4").cast("bigint").alias("revenue_e4"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --- 3. grouped-map applyInPandas ---------------------------------------


@register(
    "q57_apply_in_pandas",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty_int,
           CAST(MAX(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS max_price_cents
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="S32 applyInPandas (grouped-map UDAF shape): per-group pandas "
    "aggregation in exact integer space; one shuffle on the group key, "
    "Arrow both ways.",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")

    def agg_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n": [len(pdf)],
                "sum_qty_int": [int(pdf["l_quantity"].astype("int64").sum())],
                # np.floor: same IEEE semantics as FLOOR in both engines
                # (a bare int cast truncates in pandas/Spark but ROUNDS in
                # DuckDB — floor first keeps all three aligned)
                "max_price_cents": [
                    int(np.floor(pdf["l_extendedprice"] * 100).astype("int64").max())
                ],
            }
        )

    out_schema = (
        "l_returnflag string, n bigint, sum_qty_int bigint, max_price_cents bigint"
    )
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(agg_group, out_schema)
        .orderBy("l_returnflag")
    )


# --- 4. mapInPandas ------------------------------------------------------


@register(
    "q58_map_in_pandas",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CAST(len(list_filter(string_split_regex(text, ' +'),
                                         t -> t <> '')) AS BIGINT)) AS BIGINT)
             AS total_ws_tokens
    FROM documents
    """,
    doc="S32 mapInPandas (per-partition batch iterator): whitespace "
    "tokenization in pandas over Arrow batches, aggregated JVM-side; "
    "twin of the in-row split/size path (q48).",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")

    def count_tokens(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_ws": pdf["text"].str.split().map(len),
                }
            )

    tok = docs.mapInPandas(count_tokens, "doc_id bigint, n_ws bigint")
    return tok.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
    )


# --- 1 vs 5: native / row-UDF twins are asserted in tests/test_udfs.py --


# --- 5. mapInArrow -------------------------------------------------------


@register(
    "q108_map_in_arrow",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(n_chars AS BIGINT) * 2) AS BIGINT) AS doubled_chars
    FROM documents
    """,
    doc="S32 mapInArrow: the zero-copy tier of the Python surface — "
    "batches arrive as pyarrow.RecordBatch and are transformed with "
    "pyarrow.compute kernels (C++ SIMD, no pandas materialization, no "
    "per-row Python). The right tier when the transformation is "
    "expressible in Arrow compute; hash-checked against the native "
    "column-expression twin like the rest of the S32 ladder.",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load(spark, sf, "documents").select("doc_id", "n_chars")

    def double_chars(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.multiply(batch.column(1), pa.scalar(2, pa.int64())),
                ],
                names=["doc_id", "doubled"],
            )

    mapped = docs.mapInArrow(double_chars, "doc_id bigint, doubled bigint")
    return mapped.agg(
        F.count("*").alias("n"),
        F.sum("doubled").cast("bigint").alias("doubled_chars"),
    )


# --- 6. Python UDTF (table function) -------------------------------------


@register(
    "q120_udtf_sentences",
    oracle="""
    SELECT doc_id,
           CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(list_sum(list_transform(sents,
                s -> len(list_filter(string_split_regex(s, '\\s+'),
                                     w -> w <> '')))) AS BIGINT)
             AS total_words
    FROM (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '.'),
                                        s -> trim(s)),
                         s -> s <> '') AS sents
      FROM documents WHERE doc_id < 50)
    ORDER BY doc_id
    """,
    doc="S32 Python UDTF (table function): one input row expands to N "
    "sentence rows via a generator class — the LATERAL-join tier of the "
    "Python surface (native > pandas_udf > applyInPandas/mapInPandas > "
    "mapInArrow > UDTF > row UDF). Row-at-a-time Python, so bounded to "
    "50 docs and aggregated back for the oracle check; at scale the "
    "same expansion is the in-row transform q65/q66 already use — the "
    "UDTF exists for logic a lambda genuinely cannot express.",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words bigint")
    class SentenceStats:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for raw in text.split("."):
                sent = raw.strip()
                if sent:
                    yield idx, len(sent.split())
                    idx += 1

    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("sentence_stats", SentenceStats)
    docs.select("doc_id", "text").createOrReplaceTempView("q120_docs")
    per_sentence = spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.n_words
        FROM q120_docs d, LATERAL sentence_stats(d.text) s
        """
    )
    return (
        per_sentence.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .orderBy("doc_id")
    )
