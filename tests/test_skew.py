"""Salting utilities: result-equivalence with the unsalted plans
(the layout changes, the answer must not)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.operators.skew import (
    salted_agg_count,
    salted_join,
    with_salt,
)


def test_salted_agg_count_equals_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: r.cnt
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    salted = {r.key: r.cnt for r in salted_agg_count(li, "l_returnflag").collect()}
    assert plain == salted


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        salted_join(orders, cust, "o_custkey", "c_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted((r.c_mktsegment, r["count"]) for r in plain) == sorted(
        (r.c_mktsegment, r["count"]) for r in salted
    )


def test_salt_stable_across_materializations(spark, sf_dir):
    """VERDICT r3 #10: the salt must be identical across two independent
    materializations of the same input (no rand() anywhere — a stage
    retry that rescans the file must reproduce every salt value)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    first = {
        r.event_id: r._salt for r in with_salt(ev, 16).collect()
    }
    second = {
        r.event_id: r._salt
        for r in with_salt(
            load(spark, sf_dir, "events").select("event_id", "user_id"), 16
        ).collect()
    }
    assert first == second
    # and the default (all-columns) spread actually uses all buckets
    assert len(set(first.values())) == 16


def test_salt_requires_columns():
    import pytest

    from parquet_demo_spark.operators.skew import _salt_expr

    with pytest.raises(ValueError):
        _salt_expr(8, [])


def test_default_salt_skips_map_columns(spark):
    """F.hash raises on MapType; the all-columns default must exclude
    map-bearing columns (incl. nested) instead of erroring on any
    dataframe that carries one."""
    import pytest
    from pyspark.sql import functions as F

    from parquet_demo_spark.operators.skew import (
        _default_salt_cols,
        with_salt,
    )

    df = spark.range(8).select(
        F.col("id"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.array(F.create_map(F.lit("x"), F.col("id"))).alias("am"),
        F.struct(F.create_map(F.lit("y"), F.col("id")).alias("im")).alias(
            "sm"
        ),
    )
    assert _default_salt_cols(df) == ["id"]
    out = with_salt(df, 4)  # must not raise
    assert out.filter("_salt < 0 or _salt >= 4").count() == 0
    only_maps = df.select("m")
    with pytest.raises(ValueError, match="salt_cols"):
        _default_salt_cols(only_maps)
