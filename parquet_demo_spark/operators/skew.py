"""Skew-mitigation utilities (SURVEY §4.2 — 100 TB posture).

Two layers of defense against hot keys:

1. AQE skew-join (on in session.py): splits oversized shuffle partitions
   at runtime. The default; costs nothing to enable.
2. Explicit salting (this module) for the cases AQE can't fix — e.g. a
   single key holding >X% of all rows in an aggregation, where no
   partition split helps because the *key itself* is the partition.

``salted_agg_count`` demonstrates the two-phase pattern: explode the hot
key space by a salt, partially aggregate per (key, salt), then merge the
partials — turning one hot reducer into ``n_salts`` balanced ones. The
result is exactly the unsalted aggregate (asserted in tests); only the
shuffle layout changes.

``salted_join`` replicates the small side per salt value (rows × salts)
so a skewed large side spreads its hot key across ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Uniform int salt in [0, n_salts) — random but not key-correlated."""
    return df.withColumn(col_name, (F.rand() * n_salts).cast("int"))


def salted_agg_count(
    df: DataFrame, key: str | Column, n_salts: int = 16
) -> DataFrame:
    """COUNT(*) per key via two-phase salted aggregation.

    Phase 1 groups by (key, salt) — the hot key splits into n_salts
    partials; phase 2 merges partials per key. Identical result to
    ``df.groupBy(key).count()``, balanced shuffle.
    """
    k = F.col(key) if isinstance(key, str) else key
    salted = df.withColumn("_salt", (F.rand() * n_salts).cast("int"))
    partial = salted.groupBy(k.alias("key"), F.col("_salt")).agg(
        F.count("*").alias("_partial")
    )
    return partial.groupBy("key").agg(
        F.sum("_partial").cast("bigint").alias("cnt")
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with the large side salted and the small side
    replicated per salt — each hot key spreads over n_salts tasks.

    Prefer ``F.broadcast(small)`` when the small side fits the broadcast
    threshold (no shuffle at all); salting is for mid-size build sides
    over skewed probe keys.
    """
    salted_large = large.withColumn("_salt", (F.rand() * n_salts).cast("int"))
    salts = large.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    replicated_small = small.crossJoin(salts)
    joined = salted_large.join(
        replicated_small,
        on=[
            salted_large[large_key] == replicated_small[small_key],
            salted_large["_salt"] == replicated_small["_salt"],
        ],
        how="inner",
    )
    return joined.drop("_salt")


@register(
    "q95_salted_agg",
    oracle="""
    SELECT user_id % 20 AS k, COUNT(*) AS cnt
    FROM events GROUP BY k ORDER BY k
    """,
    doc="Two-phase salted aggregation carrying a correctness row: COUNT "
    "per (synthetic hot) key via per-(key, salt) partials merged per "
    "key. The salt is random but the RESULT is exactly the unsalted "
    "aggregate — only the shuffle layout changes, which is the whole "
    "point: a key holding 5% of 100 TB becomes n_salts balanced "
    "reducers instead of one hot one.",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    out = salted_agg_count(
        ev.select((F.col("user_id") % 20).alias("k")), "k", n_salts=8
    )
    return out.select(F.col("key").alias("k"), "cnt").orderBy("k")
