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


def _salt_expr(n_salts: int, salt_cols: list[str]) -> Column:
    """Deterministic uniform salt in [0, n_salts): pmod(hash(cols), n).

    Non-deterministic expressions feeding a shuffle are a correctness
    hazard (SPARK-23207 class): a fetch-failure stage retry re-salts the
    recomputed rows differently, double-counting or dropping them in the
    phase-1 partial. So the salt is ALWAYS derived from row content —
    retries reproduce it bit-for-bit. The old ``rand(seed)`` fallback is
    gone: it was only retry-stable for deterministic scan order, a
    property library callers can't be expected to audit.

    Prefer ``salt_cols`` naming a high-cardinality column (a row id);
    hashing the HOT KEY alone would put every hot row in one salt bucket
    and defeat the balancing. Callers that omit ``salt_cols`` get a hash
    of ALL columns — deterministic and well-spread unless rows are exact
    duplicates (which then share a bucket; pass a row id to avoid).
    """
    if not salt_cols:
        raise ValueError("salt_cols must name at least one column")
    return F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(n_salts))


def _default_salt_cols(df: DataFrame) -> list[str]:
    """All columns F.hash accepts — the omitted-``salt_cols`` default.

    ``hash`` raises DATATYPE_MISMATCH on MapType (maps have no canonical
    entry order), so a dataframe carrying a map column would make the
    convenient hash-everything default error out. Columns whose type
    contains a map anywhere (map, array<map>, struct{...map...}) are
    excluded; if nothing hashable remains the caller must name
    ``salt_cols`` explicitly.
    """
    from pyspark.sql import types as T

    def has_map(dt) -> bool:
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(has_map(f.dataType) for f in dt.fields)
        return False

    cols = [f.name for f in df.schema.fields if not has_map(f.dataType)]
    if not cols:
        raise ValueError(
            "no hashable columns for the default salt (every column "
            "contains a MapType); pass salt_cols explicitly"
        )
    return cols


def with_salt(
    df: DataFrame,
    n_salts: int,
    col_name: str = "_salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Uniform int salt in [0, n_salts) — deterministic, not key-correlated.

    Defaults to hashing every column when ``salt_cols`` is omitted (see
    ``_salt_expr`` for the duplicate-row caveat).
    """
    return df.withColumn(
        col_name, _salt_expr(n_salts, salt_cols or _default_salt_cols(df))
    )


def salted_agg_count(
    df: DataFrame,
    key: str | Column,
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """COUNT(*) per key via two-phase salted aggregation.

    Phase 1 groups by (key, salt) — the hot key splits into n_salts
    partials; phase 2 merges partials per key. Identical result to
    ``df.groupBy(key).count()``, balanced shuffle. Pass ``salt_cols``
    (a unique row-id column) for the best spread; the default hashes all
    columns — still retry-stable, but exact-duplicate rows share a salt.
    """
    k = F.col(key) if isinstance(key, str) else key
    salted = df.withColumn(
        "_salt", _salt_expr(n_salts, salt_cols or _default_salt_cols(df))
    )
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
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Inner equi-join with the large side salted and the small side
    replicated per salt — each hot key spreads over n_salts tasks.

    Prefer ``F.broadcast(small)`` when the small side fits the broadcast
    threshold (no shuffle at all); salting is for mid-size build sides
    over skewed probe keys.
    """
    salted_large = large.withColumn(
        "_salt", _salt_expr(n_salts, salt_cols or _default_salt_cols(large))
    )
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
    "reducers instead of one hot one. The salt is content-derived "
    "(hash of the unique event_id), so stage retries reproduce it.",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    out = salted_agg_count(
        ev.select((F.col("user_id") % 20).alias("k"), "event_id"),
        "k",
        n_salts=8,
        salt_cols=["event_id"],
    )
    return out.select(F.col("key").alias("k"), "cnt").orderBy("k")


# ---------------------------------------------------------------------------
# AQE skew-join: the zero-code-change layer (VERDICT r3 #7)
# ---------------------------------------------------------------------------

# When to use which layer:
#
# - JOIN skew → AQE. OptimizeSkewedJoin splits an oversized shuffle
#   partition into task-sized chunks at runtime (replicating the matching
#   other-side partition), even when ONE key holds the bulk of the rows.
#   No code changes, no result change; needs nothing but the configs.
# - AGGREGATION skew → salting (salted_agg_count above). AQE cannot split
#   a single GROUP BY key's partial aggregate across tasks — the key IS
#   the partition. Two-phase salting is the only rebalance.
# - Streaming / stateful plans → salting. AQE is disabled inside
#   stateful streaming queries, so hot keys there need the explicit salt.
#
# The thresholds below are fixture-scale (KB, not the 256MB production
# default) so the optimization is demonstrable — and CI-assertable
# (tests/test_plans.py::test_aqe_skew_join_applied) — on local data.
# Production keeps the defaults: a partition is "skewed" when it exceeds
# skewedPartitionFactor x median AND skewedPartitionThresholdInBytes.

AQE_SKEW_DEMO_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # no broadcast: force the shuffled join AQE has to repair
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}


def skewed_join_demo(
    spark: SparkSession, n_big: int = 500_000, n_right: int = 200_000
) -> DataFrame:
    """A deliberately key-skewed shuffled join (90% of the big side on
    one key) reduced to a scalar — collect it under
    ``AQE_SKEW_DEMO_CONFS`` and the final adaptive plan shows
    ``SortMergeJoin(skew=true)``: the hot partition was split at
    runtime. The caller owns setting/restoring the confs (they're
    session-wide)."""
    big = spark.range(0, n_big).select(
        F.when(F.col("id") < int(n_big * 0.9), F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, n_right).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") * 2).alias("r")
    )
    return (
        big.join(right, "k")
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
    )
