"""Synthetic data generators (SURVEY §2A R17/R18, build plan step 3).

Re-expresses the reference's generators as `spark.range` + column
expressions — the logical plan IS the generator, so Catalyst codegen
produces rows executor-side in parallel with no driver materialization
(the reference builds NumPy arrays in the driver process:
`examples/generate_big_parquet.py:27-77`,
`examples/generate_parquet_from_ddl.py:109-205`).

Field mixes and cardinality rules mirror the reference exactly:

- wide50 (R17): 12 seq int64, 12 uniform float64, 12 low-card strings
  with card = max(1000, n/1000) (`generate_big_parquet.py:32-37,50-56`),
  6 cyclic timestamps, 4 cyclic dates, 4 alternating bools.
- supplymethod (R18): the 53-column PostgreSQL-DDL schema
  (`generate_parquet_from_ddl.py:26-82`) with per-column string
  cardinalities 5–5000 (`:124-182`); decimals generated at sane scale —
  the reference's int×10¹⁰ quirk (`:90-96`) is documented, not ported.

Deterministic columns use modular formulas (reproducible in any engine);
continuous columns use F.rand/F.randn(seed) — deterministic for a fixed
partitioning, which `.repartition(parts)` pins (SURVEY §4.1 last row).

Chunk control (R4/R5): `rows_per_file` maps to a repartition +
`maxRecordsPerFile`, the distributed analogue of the reference's
100k-row `ParquetWriter.write_table` loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.registry import register

SECONDS_PER_YEAR = 365 * 24 * 3600  # reference: row_id % 1yr seconds


def gen_wide50(spark: SparkSession, num_rows: int, seed: int = 0) -> DataFrame:
    """R17: 50-column wide table (`generate_big_parquet.py:27-77`)."""
    card = max(1000, num_rows // 1000)  # :50-53
    df = spark.range(num_rows).withColumnRenamed("id", "row_id")
    cols = [F.col("row_id")]
    cols += [(F.col("row_id") + k).alias(f"i_{k}") for k in range(12)]
    cols += [F.rand(seed + k).alias(f"f_{k}") for k in range(12)]
    cols += [
        F.concat(F.lit("str_"), (F.col("row_id") % card).cast("string")).alias(
            f"s_{k}"
        )
        for k in range(12)
    ]
    cols += [
        (
            F.lit("2020-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("row_id") % SECONDS_PER_YEAR) + k)
        ).alias(f"ts_{k}")
        for k in range(6)
    ]
    cols += [
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("row_id") % 365).cast("int")).alias(
            f"d_{k}"
        )
        for k in range(4)
    ]
    cols += [
        ((F.col("row_id") % 2) == (k % 2)).alias(f"b_{k}") for k in range(4)
    ]
    return df.select(*cols)


def write_chunked(
    df: DataFrame, path: str, rows_per_file: int = 100_000
) -> None:
    """R4/R5: bounded row groups / files, the Spark way."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )


# --- R18: the 53-column supplymethod table -------------------------------

# (name, kind, param) — kind: str=low-card string, dec=decimal(38,10),
# int=int64, f32=float32, bool, ts=tz-aware µs, tsntz=naive µs.
# Cardinalities follow generate_parquet_from_ddl.py:124-182.
SUPPLYMETHOD_FIELDS: list[tuple[str, str, int]] = [
    ("supplymethod_prodgroup", "str", 50),
    ("supplymethod_splitfactor", "dec", 0),
    ("supplymethod_loadopt", "int", 10),
    ("supplymethod_convenientroundingprofile", "str", 20),
    ("supplymethod_supplymethod", "str", 2000),  # PK part (:129)
    ("supplymethod_yield", "f32", 0),
    ("supplymethod_substdrawqty", "dec", 0),
    ("supplymethod_arrivalprofile", "str", 30),
    ("supplymethod_prodfamily", "str", 40),
    ("supplymethod_localbuildaheadlimit", "int", 100),
    ("supplymethod_eff", "ts", 0),  # PK part, tz-aware (:39)
    ("supplymethod_transmode", "str", 5),  # PK part (:136)
    ("supplymethod_reviewcal", "str", 10),
    ("supplymethod_unitexpeditecost", "dec", 0),
    ("supplymethod_maxfindur", "int", 50),
    ("supplymethod_maxstartdur", "int", 50),
    ("supplymethod_ordersubgroupid", "str", 100),
    ("supplymethod_campaignminqty", "dec", 0),
    ("item", "str", 5000),  # PK part (:144)
    ("supplymethod_delayprob", "f32", 0),
    ("supplymethod_minqty", "dec", 0),
    ("supplymethod_everybucketloadsw", "bool", 0),
    ("supplymethod_campaignpriority", "dec", 0),
    ("supplymethod_ordergroupid", "str", 100),
    ("supplymethod_yieldprofile", "str", 30),
    ("supplymethod_disc", "tsntz", 0),  # naive µs (:54)
    ("supplymethod_loaddur", "int", 30),
    ("location", "str", 1000),  # PK part (:156)
    ("supplymethod_leadtime", "dec", 0),
    ("supplymethod_priority", "dec", 0),
    ("supplymethod_sourcelocation", "str", 1000),  # PK part (:160)
    ("supplymethod_incqty", "dec", 0),
    ("supplymethod_nonewsupplydate", "tsntz", 0),
    ("supplymethod_dyndepsrccost", "f32", 0),
    ("supplymethod_leadtimevariance", "dec", 0),
    ("supplymethod_enabledyndepsw", "bool", 0),
    ("supplymethod_roundingfactor", "f32", 0),
    ("supplymethod_replendur", "int", 30),
    ("supplymethod_unloaddur", "int", 30),
    ("supplymethod_type", "str", 5),
    ("supplymethod_pushpriority", "int", 10),
    ("supplymethod_unitsupplymethodcost", "dec", 0),
    ("supplymethod_shippingprofile", "str", 30),
    ("supplymethod_transcost", "f32", 0),
    ("supplymethod_supplycapacityprofile", "str", 30),
    ("supplymethod_altsrcpenalty", "f32", 0),
    ("supplymethod_pushfactor", "f32", 0),
    ("supplymethod_procurementcalendarid", "str", 20),
    ("supplymethod_leadtimeeffncyprofile", "str", 20),
    ("supplymethod_lastcampaignstartsw", "bool", 0),
    ("supplymethod_bomid", "str", 200),
    ("ip__user_id", "str", 5),
    ("ip__scenario_id", "str", 5),
]

# Composite upsert PK (reference README.md:76)
SUPPLYMETHOD_PK = (
    "supplymethod_supplymethod",
    "supplymethod_eff",
    "supplymethod_transmode",
    "item",
    "location",
    "supplymethod_sourcelocation",
)


def gen_supplymethod(
    spark: SparkSession, num_rows: int, seed: int = 0
) -> DataFrame:
    """R18: 53-column supply-chain table, executor-side generation."""
    df = spark.range(num_rows).withColumnRenamed("id", "row_id")
    rid = F.col("row_id")
    cols = []
    for j, (name, kind, card) in enumerate(SUPPLYMETHOD_FIELDS):
        if kind == "str":
            cols.append(
                F.concat(
                    F.lit(name.split("_")[-1][:4] + "_"),
                    ((rid * (j + 1) + j) % card).cast("string"),
                ).alias(name)
            )
        elif kind == "dec":
            cols.append(
                (F.rand(seed + j) * 10000).cast("decimal(38,10)").alias(name)
            )
        elif kind == "int":
            cols.append(((rid + j) % card).alias(name))
        elif kind == "f32":
            cols.append(F.rand(seed + j).cast("float").alias(name))
        elif kind == "bool":
            cols.append(((rid % 2) == (j % 2)).alias(name))
        elif kind == "ts":
            cols.append(
                (
                    F.lit("2021-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=(rid % SECONDS_PER_YEAR) + j)
                ).alias(name)
            )
        elif kind == "tsntz":
            cols.append(
                (
                    F.lit("2021-01-01 00:00:00").cast("timestamp_ntz")
                    + F.make_interval(secs=(rid % SECONDS_PER_YEAR) + j)
                ).alias(name)
            )
    return df.select(*cols)


# --- declared generator-parity queries (deterministic columns only) ------

_W50_N = 20_000  # card = max(1000, 20000/1000) = 1000


@register(
    "q70_gen_wide50_checksum",
    oracle=f"""
    WITH g AS (
      SELECT range AS row_id FROM range({_W50_N})
    )
    SELECT COUNT(*) AS cnt,
           CAST(SUM(row_id + 0) AS BIGINT) AS sum_i0,
           CAST(SUM(row_id + 11) AS BIGINT) AS sum_i11,
           CAST(COUNT(DISTINCT 'str_' || CAST(row_id % 1000 AS VARCHAR)) AS BIGINT)
             AS n_distinct_s0,
           CAST(MIN(TIMESTAMP '2020-01-01 00:00:00'
                    + ((row_id % {SECONDS_PER_YEAR}) + 0) * INTERVAL '1 second')
                AS TIMESTAMP) AS min_ts0,
           CAST(MAX(TIMESTAMP '2020-01-01 00:00:00'
                    + ((row_id % {SECONDS_PER_YEAR}) + 5) * INTERVAL '1 second')
                AS TIMESTAMP) AS max_ts5,
           MIN(DATE '2020-01-01' + CAST(row_id % 365 AS INTEGER)) AS min_d0,
           MAX(DATE '2020-01-01' + CAST(row_id % 365 AS INTEGER)) AS max_d0,
           CAST(SUM(CASE WHEN row_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_b0
    FROM g
    """,
    doc="R17 generator parity: spark.range-based wide50 generator, "
    "checksummed over its deterministic columns against the same modular "
    "formulas in the oracle (continuous F.rand columns excluded — "
    "engine-specific PRNG).",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    g = gen_wide50(spark, _W50_N, seed=0)
    return g.agg(
        F.count("*").alias("cnt"),
        F.sum("i_0").cast("bigint").alias("sum_i0"),
        F.sum("i_11").cast("bigint").alias("sum_i11"),
        F.countDistinct("s_0").cast("bigint").alias("n_distinct_s0"),
        F.min("ts_0").alias("min_ts0"),
        F.max("ts_5").alias("max_ts5"),
        F.min("d_0").alias("min_d0"),
        F.max("d_0").alias("max_d0"),
        F.sum(F.when(F.col("b_0"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_b0"),
    )


@register(
    "q71_gen_supplymethod_checksum",
    oracle=None,  # PRNG columns are engine-specific; invariants tested in unit tests
    doc="R18 generator smoke: 53-column supplymethod table generated "
    "executor-side; cardinality/PK invariants asserted in "
    "tests/test_generators.py.",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    g = gen_supplymethod(spark, 10_000, seed=42)
    return g.agg(
        F.count("*").alias("cnt"),
        F.countDistinct("supplymethod_transmode").cast("bigint").alias(
            "card_transmode"
        ),
        F.countDistinct("item").cast("bigint").alias("card_item"),
        F.min("supplymethod_eff").alias("min_eff"),
        F.count(F.when(F.col("supplymethod_everybucketloadsw"), 1)).alias(
            "n_true_loadsw"
        ),
    )
