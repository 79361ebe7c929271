"""S31/S32 non-hash checks: approx ops bounded vs exact; UDF variants
equal to their native twins (pandas_udf and row-UDF compute the same
expression; native is what every query module actually uses)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import all_queries

QUERIES = all_queries()


def test_approx_distinct_within_5pct(spark, sf_dir):
    row = QUERIES["q59_approx_distinct"].spark(spark, sf_dir).collect()[0]
    assert abs(row.approx_custs - row.exact_custs) <= 0.05 * row.exact_custs


def test_approx_quantiles_bracketed(spark, sf_dir):
    row = QUERIES["q59b_approx_quantiles"].spark(spark, sf_dir).collect()[0]
    p50, p90, p99 = row.p50, row.p90, row.p99
    exact = load(spark, sf_dir, "orders").approxQuantile(
        "o_totalprice", [0.5, 0.9, 0.99], 0.0
    )
    assert p50 <= p90 <= p99
    for approx, ex in zip((p50, p90, p99), exact):
        assert abs(approx - ex) <= 0.05 * ex


def test_pandas_udf_equals_native(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").limit(1000)

    @pandas_udf("double")
    def py_disc(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    native = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    n_diff = (
        li.withColumn("a", py_disc("l_extendedprice", "l_discount"))
        .withColumn("b", native)
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert n_diff == 0


def test_row_udf_equals_native(spark, sf_dir):
    # S32 completeness: row-at-a-time F.udf — correct but the slow path;
    # no query module uses it (serde per row).
    li = load(spark, sf_dir, "lineitem").limit(200)
    row_udf = udf(lambda p, d: p * (1.0 - d), "double")
    native = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    n_diff = (
        li.withColumn("a", row_udf("l_extendedprice", "l_discount"))
        .withColumn("b", native)
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert n_diff == 0


def test_multimodal_stub_raises():
    from parquet_demo_spark.operators.multimodal import decode_media_stub

    try:
        decode_media_stub(b"bytes", "image")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_q84b_approx_fences_bounded_vs_exact(spark, sf_dir):
    """q84b (sketch fences) must stay within tight bounds of the exact
    q84: identical group keys and row counts, fence drift below 0.5% of
    the fence magnitude, and outlier-count drift below 2% of rows —
    the contract that makes it a safe 100 TB substitute."""
    exact = {
        r.l_returnflag: r
        for r in QUERIES["q84_iqr_outliers"].spark(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: r
        for r in QUERIES["q84b_iqr_outliers_approx"].spark(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        a = approx[k]
        assert a.n_rows == e.n_rows
        assert abs(a.lo_fence - e.lo_fence) <= 0.005 * abs(e.lo_fence) + 1
        assert abs(a.hi_fence - e.hi_fence) <= 0.005 * abs(e.hi_fence) + 1
        assert abs(a.n_outliers - e.n_outliers) <= max(0.02 * e.n_rows, 5)


def test_misra_gries_verified_output_is_partitioning_invariant(spark):
    """q138's law: the MG summaries vary with partitioning, but the
    sketch-then-verify output is exact — identical across partition
    counts and equal to the plain GROUP BY / HAVING answer, on skewed
    synthetic data where most tokens are near the threshold."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_demo_spark.operators.approx import _mg_candidates

    # 40 "hot" tokens at ~200 occurrences, 2000 cold tokens at 1-3
    rows = []
    for h in range(40):
        rows += [f"hot{h:02d}"] * (180 + h)
    for c in range(2000):
        rows += [f"cold{c:04d}"] * (1 + c % 3)
    data = spark.createDataFrame(pd.DataFrame({"token": rows}))
    n = len(rows)
    cap = 400

    def verified(tok):
        total = tok.agg(F.count("*").alias("total"))
        cands = _mg_candidates(tok, cap).distinct()
        return sorted(
            (r.token, r.cnt)
            for r in tok.join(F.broadcast(cands), "token")
            .groupBy("token")
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * cap >= F.col("total"))
            .select("token", "cnt")
            .collect()
        )

    exact = sorted(
        (r.token, r.cnt)
        for r in data.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") * cap >= n)
        .collect()
    )
    assert exact, "fixture must produce at least one heavy hitter"
    for parts in (1, 7, 32):
        got = verified(data.repartition(parts, "token"))
        assert got == exact, f"parts={parts}"
    # adversarial: round-robin partitioning splits every token's mass
    got = verified(data.repartition(13))
    assert got == exact
