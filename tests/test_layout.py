"""Physical-layout contracts: partition pruning, bucketed joins, sorted
file ranges — the read-side effects each write layout exists to buy
(layout.py docstrings state the 100 TB rationale for each)."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.io import write_partitioned
from parquet_demo_spark.layout import (
    drop_table,
    file_column_ranges,
    write_bucketed,
    write_range_sorted,
)
from parquet_demo_spark.plans import physical_plan


@contextlib.contextmanager
def _conf(spark, **kv):
    """Temporarily set runtime SQL confs (dots spelled as __)."""
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_partition_pruning(spark, sf_smoke, tmp_path):
    """A filter on the partition column shows up as PartitionFilters —
    directory-level pruning, zero IO for other partition values."""
    ev = load(spark, sf_smoke, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, partition_cols=["event_type"])

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = physical_plan(df)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "event_type" in " ".join(pf), plan
    # the pruned read touches only the matching directory
    files = df.select(F.input_file_name()).distinct().collect()
    assert files and all("event_type=click" in r[0] for r in files)


def test_bucketed_join_has_no_exchange(spark, sf_smoke, tmp_path):
    """Two tables bucketed on the join key join with NO shuffle: the
    bucket layout IS the exchange, paid once at write time."""
    li = load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        li,
        "t_lineitem_b",
        bucket_by=["l_orderkey"],
        n_buckets=8,
        sort_by=["l_orderkey"],
        path=str(tmp_path / "li_b"),
    )
    write_bucketed(
        orders,
        "t_orders_b",
        bucket_by=["o_orderkey"],
        n_buckets=8,
        sort_by=["o_orderkey"],
        path=str(tmp_path / "ord_b"),
    )
    try:
        with _conf(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
            j = spark.table("t_lineitem_b").join(
                spark.table("t_orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = physical_plan(j)
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            # same join without bucketing shuffles both sides
            li_flat = spark.read.parquet(str(tmp_path / "li_b"))
            ord_flat = spark.read.parquet(str(tmp_path / "ord_b"))
            flat_plan = physical_plan(
                li_flat.join(
                    ord_flat,
                    F.col("l_orderkey") == F.col("o_orderkey"),
                )
            )
            assert "Exchange" in flat_plan, flat_plan
            # and the bucketed join returns the same row count
            assert j.count() == li.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
    finally:
        drop_table(spark, "t_lineitem_b")
        drop_table(spark, "t_orders_b")


def test_range_sorted_files_are_disjoint(spark, sf_smoke, tmp_path):
    """Range-sorted output: per-file key ranges don't overlap, so
    footer min/max stats satisfy selective scans from one file."""
    li = load(spark, sf_smoke, "lineitem")
    out = str(tmp_path / "li_sorted")
    write_range_sorted(li, out, sort_by=["l_orderkey"], n_files=4)

    ranges = file_column_ranges(out, "l_orderkey")
    assert len(ranges) >= 2, ranges
    ordered = sorted(ranges)
    for (_, prev_max), (next_min, _) in zip(ordered, ordered[1:]):
        assert prev_max <= next_min, ordered
    # layout change preserved the data
    assert (
        spark.read.parquet(out).count() == li.count()
    )


def test_needle_filter_is_pushed_over_sorted_layout(spark, sf_smoke, tmp_path):
    """A selective key predicate over the sorted layout reaches the scan
    as a pushed filter — combined with the disjoint per-file ranges
    above, the reader's row-group min/max check skips every other file's
    row groups."""
    li = load(spark, sf_smoke, "lineitem")
    out = str(tmp_path / "li_sorted2")
    write_range_sorted(li, out, sort_by=["l_orderkey"], n_files=4)
    target = li.agg(F.min("l_orderkey")).collect()[0][0]

    df = spark.read.parquet(out).filter(F.col("l_orderkey") == target)
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "l_orderkey" in " ".join(pushed), plan
    assert df.count() == li.filter(F.col("l_orderkey") == target).count()


def test_bucketed_aggregation_has_no_exchange(spark, sf_smoke, tmp_path):
    """Grouping by the bucket key aggregates in place — the bucket
    layout satisfies the aggregation's distribution requirement, so a
    100 TB groupBy on a bucketed key costs zero shuffle."""
    li = load(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        li,
        "t_lineitem_agg",
        bucket_by=["l_orderkey"],
        n_buckets=8,
        sort_by=["l_orderkey"],
        path=str(tmp_path / "li_agg"),
    )
    try:
        agg = (
            spark.table("t_lineitem_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("s"))
        )
        plan = physical_plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        drop_table(spark, "t_lineitem_agg")


def _box_hits(path: str, boxes: dict[str, tuple]) -> int:
    """Files whose footer min/max intersects EVERY per-column range —
    exactly the files a conjunctive predicate must open."""
    per_col = {c: file_column_ranges(path, c) for c in boxes}
    cols = list(boxes)
    n_files = len(per_col[cols[0]])
    hits = 0
    for i in range(n_files):
        ok = True
        for c, (lo, hi) in boxes.items():
            fmin, fmax = per_col[c][i]
            if fmax < lo or fmin > hi:
                ok = False
                break
        if ok:
            hits += 1
    return hits


def test_zorder_skips_more_files_than_linear_sort(
    spark, sf_smoke, tmp_path
):
    """The multi-dimensional clustering contract: under a linear
    l_orderkey sort every file spans the full l_partkey range, so a
    predicate on l_partkey alone opens ALL files; the Z-curve gives
    every file a bounded box on both dims (median ~19% extent at 64
    files on the smoke fixture), so the same predicate opens at most
    half — and a 2-D box opens no more than linear does. The margins
    widen with file count: at 100 TB (tens of thousands of files) a
    file's extent shrinks toward the curve-block size while linear
    stays at 100%."""
    from parquet_demo_spark.layout import write_zorder

    # the two highest-cardinality lineitem dims (l_suppkey has ~10
    # distinct values at smoke SF — too coarse to cluster on)
    li = load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    mx = li.agg(
        F.max("l_orderkey").alias("o"), F.max("l_partkey").alias("p")
    ).first()
    n = 64
    lin, zo = str(tmp_path / "linear"), str(tmp_path / "zorder")
    write_range_sorted(li, lin, ["l_orderkey"], n_files=n)
    write_zorder(li, zo, ["l_orderkey", "l_partkey"], n_files=n)

    # rewrites are lossless
    assert (
        spark.read.parquet(zo).count()
        == spark.read.parquet(lin).count()
        == li.count()
    )

    # narrow l_partkey slice, unconstrained l_orderkey: the 1-D layout
    # cannot prune at all, the z-curve opens at most half
    s_slice = {
        "l_partkey": ((55 * mx.p) // 100, (65 * mx.p) // 100),
        "l_orderkey": (0, mx.o),
    }
    lin_slice, zo_slice = _box_hits(lin, s_slice), _box_hits(zo, s_slice)
    assert lin_slice == n
    assert zo_slice <= n // 2, f"z-order opened {zo_slice}/{n}"

    # selective 2-D box: z-order must not lose to linear
    box = {
        "l_orderkey": ((40 * mx.o) // 100, (60 * mx.o) // 100),
        "l_partkey": ((55 * mx.p) // 100, (65 * mx.p) // 100),
    }
    lin_box, zo_box = _box_hits(lin, box), _box_hits(zo, box)
    assert zo_box <= lin_box + 1, (lin_box, zo_box)
    assert zo_box < n


def test_zorder_binary_search_matches_fold_semantics(spark, sf_smoke):
    """The round-15 codegen'd binary-search bucket id must equal the
    original interpreted fold — |{i: v >= cuts[i]}| over the sorted
    (possibly duplicate-valued) approxQuantile cuts — on every row,
    including NULL (bucket 0) and values beyond both ends."""
    from parquet_demo_spark.layout import zorder_key

    li = (
        load(spark, sf_smoke, "lineitem")
        .select("l_orderkey", "l_partkey")
        .limit(5000)
        # exercise the NULL leg too
        .withColumn(
            "l_partkey",
            F.when(F.col("l_orderkey") % 97 == 0, F.lit(None)).otherwise(
                F.col("l_partkey")
            ),
        )
    )
    cols, bits = ["l_orderkey", "l_partkey"], 6
    key = zorder_key(li, cols, bits=bits)

    # reference: the pre-round-15 interpreted fold, inlined verbatim
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    casted = li.select(*[F.col(c).cast("double").alias(c) for c in cols])
    all_cuts = casted.approxQuantile(cols, probs, 1e-3)
    k = len(cols)
    z_ref = F.lit(0).cast("long")
    for i, (c, cuts) in enumerate(zip(cols, all_cuts)):
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        bucket = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, cut: acc
            + F.when(F.col(c).cast("double") >= cut, 1).otherwise(0),
        )
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            z_ref = z_ref.bitwiseOR(
                F.shiftleft(bit.cast("long"), j * k + (k - 1 - i))
            )

    mismatches = (
        li.select(key.alias("z_new"), z_ref.alias("z_old"))
        .filter(F.col("z_new") != F.col("z_old"))
        .count()
    )
    assert mismatches == 0
