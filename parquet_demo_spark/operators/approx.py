"""Approximate operators S31 (SURVEY §2B): sketch-based cardinality and
quantiles.

HLL/KLL-style sketches are THE 100 TB answer for distinct counts and
percentiles: fixed-size state, one pass, mergeable across partitions —
no shuffle of distinct values. Results are estimator-specific, so these
queries carry no SQL oracle (the driver records a rows-only check);
tests/test_approx.py bounds them against the exact answers (±5%,
SURVEY §2B S31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register


@register(
    "q59_approx_distinct",
    oracle=None,  # estimator-specific; bounded vs exact in tests
    doc="S31 approx_count_distinct (HyperLogLog++, rsd=1%): fixed-size "
    "mergeable sketch per partition — the scale path for q11's exact "
    "count-distinct. Both counts aggregate over ONE distinct() pass: "
    "HLL registers are max-based, so duplicates are no-ops and the "
    "sketch over the distinct set is bit-identical to the raw-row "
    "sketch — while mixing countDistinct + approx in a single agg "
    "triggers Catalyst's Expand rewrite that drags the 2^14-register "
    "HLL buffer through the distinct path (measured 3x slower).",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    # isNotNull keeps countDistinct's null-excluding semantics: after
    # distinct(), count(*) would count a NULL key as one extra customer
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select("o_custkey")
        .distinct()
    )
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_custs"),
        F.count("*").cast("bigint").alias("exact_custs"),
    )


@register(
    "q59b_approx_quantiles",
    oracle=None,
    doc="S31 percentile_approx (KLL-ish sketch) over order totals: "
    "p50/p90/p99 in one mergeable pass. Emitted as three scalar doubles "
    "(not an array column) so the driver's pandas canonicalizer can sort "
    "the result (round-1 q59b ERR was an array-typed output column).",
)
def q59b(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    q = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000)
    return o.agg(
        q.getItem(0).cast("double").alias("p50"),
        q.getItem(1).cast("double").alias("p90"),
        q.getItem(2).cast("double").alias("p99"),
        F.count("*").alias("n"),
    )


# --- q138: heavy hitters — mergeable sketch candidates + exact verify -----


def _mg_candidates(tok: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries (≤ ``capacity`` counters).

    The MG guarantee makes this a SOUND candidate generator: any token
    whose global frequency exceeds N/(capacity+1) must, by pigeonhole,
    exceed N_p/(capacity+1) in at least one partition, and a
    per-partition MG sketch with ``capacity`` counters retains every
    such local heavy hitter. So the union of partition summaries is a
    guaranteed superset of the true heavy hitters — while each
    partition emits at most ``capacity`` rows regardless of how many
    billions of tokens it scanned. Arrow-batched (mapInPandas), state
    carried across batches within the partition.
    """
    import pandas as pd

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf["token"]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < capacity:
                    counters[t] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"token": list(counters.keys())})

    return tok.mapInPandas(mg, "token string")


@register(
    "q138_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'), t -> t <> ''))
             AS token
      FROM documents
    ),
    n AS (SELECT COUNT(*) AS total FROM tok)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok, n
    GROUP BY token, n.total
    HAVING COUNT(*) * 400 >= n.total
    ORDER BY cnt DESC, token
    """,
    doc="Exact heavy hitters (tokens with frequency >= N/400) via the "
    "two-pass sketch-then-verify pattern: pass 1 runs a per-partition "
    "Misra-Gries summary (capacity 400, mapInPandas, <= 400 rows out "
    "per partition no matter the input size) whose union is a PROVEN "
    "superset of the true heavy hitters; pass 2 exact-counts only the "
    "candidate tokens (broadcast semi-join) and applies the integer "
    "threshold. The final answer is exact — hash-checked against a "
    "plain GROUP BY / HAVING oracle — but the full-corpus shuffle of "
    "pass-2 moves only candidate-matched rows, and nothing anywhere "
    "holds more than capacity counters: the 100 TB shape for 'top "
    "boilerplate tokens across the corpus'. The sketch's content is "
    "partition-order-dependent; the verified output is not.",
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.functions import tokens

    docs = load(spark, sf, "documents")
    tok = docs.select(
        F.explode(
            F.filter(tokens("text"), lambda t: t != "")
        ).alias("token")
    )
    total = tok.agg(F.count("*").alias("total"))
    cands = _mg_candidates(tok, 400).distinct()
    return (
        tok.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * 400 >= F.col("total"))
        .select("token", "cnt")
        .orderBy(F.col("cnt").desc(), "token")
    )
