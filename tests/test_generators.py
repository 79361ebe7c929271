"""Generator invariants (SURVEY §5.2.5): seeded determinism, declared
cardinalities, PK non-nullness — property-style checks on R17/R18."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_demo_spark.generators import (
    SUPPLYMETHOD_FIELDS,
    SUPPLYMETHOD_PK,
    gen_supplymethod,
    gen_wide50,
)

N = 10_000


def test_wide50_shape_and_mix(spark):
    df = gen_wide50(spark, N, seed=0)
    names = df.columns
    assert len(names) == 51  # row_id + 50 payload columns
    for prefix, count in [("i_", 12), ("f_", 12), ("s_", 12), ("ts_", 6), ("d_", 4), ("b_", 4)]:
        assert sum(n.startswith(prefix) for n in names) == count
    assert df.count() == N


def test_wide50_string_cardinality_rule(spark):
    # card = max(1000, n/1000)  (generate_big_parquet.py:50-53)
    df = gen_wide50(spark, N, seed=0)
    card = df.agg(F.countDistinct("s_0")).collect()[0][0]
    assert card == 1000


def test_wide50_seeded_determinism(spark):
    a = gen_wide50(spark, 1000, seed=7).agg(F.sum("f_0")).collect()[0][0]
    b = gen_wide50(spark, 1000, seed=7).agg(F.sum("f_0")).collect()[0][0]
    c = gen_wide50(spark, 1000, seed=8).agg(F.sum("f_0")).collect()[0][0]
    assert a == b
    assert a != c


def test_supplymethod_schema_and_pk(spark):
    df = gen_supplymethod(spark, 5000, seed=42)
    assert len(df.columns) == 53
    assert set(SUPPLYMETHOD_PK) <= set(df.columns)
    # PK columns non-null (generate_parquet_from_ddl.py:128-160 flags)
    nulls = df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in SUPPLYMETHOD_PK]
    ).collect()[0]
    assert all(v == 0 for v in nulls)


def test_supplymethod_cardinalities_bounded(spark):
    df = gen_supplymethod(spark, 5000, seed=42)
    declared = {n: c for n, k, c in SUPPLYMETHOD_FIELDS if k == "str"}
    for name in ("supplymethod_transmode", "supplymethod_type", "ip__user_id"):
        card = df.agg(F.countDistinct(name)).collect()[0][0]
        assert card <= declared[name]


def test_supplymethod_decimal_scale(spark):
    df = gen_supplymethod(spark, 100, seed=42)
    t = dict(df.dtypes)["supplymethod_splitfactor"]
    assert t == "decimal(38,10)"
