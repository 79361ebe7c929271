"""Physical data layout for scale: partitioning, bucketing, sort order.

At 100 TB the dominant costs are (a) scanning bytes you didn't need and
(b) shuffling rows you could have pre-placed. This module owns the three
write-side layouts that attack both, with tests asserting the read-side
effect on the physical plan (tests/test_layout.py):

- **Hive-style partitioned writes** (``io.write_partitioned`` — lives in
  io.py with the other reference-parity writers): a filter on the
  partition column prunes whole directories at planning time —
  ``PartitionFilters`` in the scan, zero bytes read for pruned
  partitions; the pruning contract is asserted here alongside the other
  two layouts.
- **Bucketed tables** (``write_bucketed``): pre-hash rows into N buckets
  on the join/agg key. Two tables bucketed the same way join with NO
  exchange — the 100 TB fact⋈fact join strategy when neither side
  broadcasts. (The reference writes flat files only —
  ``generate_big_parquet.py`` — so this is engine-added capability.)
- **Range-sorted writes** (``write_range_sorted``): range-partition then
  sort within partitions, so every file covers a disjoint key range and
  parquet row-group min/max stats make selective key scans skip
  everything else. This is what makes "needle" queries cheap without an
  index.

All three are thin, explicit wrappers over the DataFrameWriter — the
value is the *contract* each layout guarantees, which the plan tests pin
down so a regression (lost PartitionFilters, bucketing silently off,
overlapping file ranges) fails CI instead of shipping a full-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table for shuffle-free joins.

    Both sides of a join bucketed on the join key with the same
    ``n_buckets`` sort-merge join with no Exchange on either side; a
    ``sort_by`` matching the key also drops the per-task Sort. Bucket
    metadata lives in the session catalog (``saveAsTable`` is required —
    plain ``.parquet(path)`` cannot record bucket spec).

    Pick ``n_buckets`` so one bucket of the *larger* table fits an
    executor's memory at the target scale (e.g. 100 TB / 4096 buckets ≈
    25 GB per bucket pre-compression).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort: disjoint per-file key ranges.

    Every output file covers a non-overlapping ``sort_by`` range, so
    parquet footer min/max statistics let a selective key predicate skip
    all but one file's row groups (verified against footers in
    tests/test_layout.py). The global sort costs one range shuffle at
    write time and pays for itself on every selective read after.
    """
    (
        df.repartitionByRange(n_files, *sort_by)
        .sortWithinPartitions(*sort_by)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 6, relative_error: float = 1e-3
):
    """Morton (Z-curve) interleave of equal-depth rank buckets.

    Multi-dimensional clustering for file skipping (the public design
    behind Delta's OPTIMIZE ZORDER BY / Iceberg's sort-order z-curve):
    a one-dimensional sort clusters only its leading column — every
    file then spans the FULL range of every other column, so footer
    min/max stats prune nothing for predicates on them. Interleaving
    the bit patterns of per-column rank buckets yields a single sort
    key whose contiguous runs are small hyper-rectangles in
    ``cols``-space: every file gets a tight min/max box on EVERY
    z-ordered column, and a conjunctive range predicate skips all
    files whose box misses it.

    Mechanics (all scale-safe):
    - per column, one ``approxQuantile`` pass yields ``2^bits − 1``
      equal-depth cut points (a driver-side array of a few hundred
      doubles — statistics, not data);
    - each row's bucket id is how many cuts it is ≥ — computed as a
      BINARY SEARCH over the sorted cut array compiled into a nested
      CASE WHEN tree: ``bits`` codegen'd comparisons per row instead
      of a ``2^bits``-step interpreted higher-order ``aggregate``
      (Spark does not whole-stage-codegen lambda functions, so the
      fold form evaluated every cut per row in the interpreter —
      measured ~3× slower on the rewrite's scan stage);
    - bucket ids interleave round-robin into one BIGINT: bit ``j`` of
      column ``i`` lands at position ``j·k + (k−1−i)``.

    Equal-depth (not equal-width) buckets make the curve skew-proof:
    a hot key range gets more cells, so files stay balanced.
    Returns the key Column; compose with ``write_range_sorted`` or use
    :func:`write_zorder`.
    """
    from pyspark.sql import functions as F

    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    casted = df.select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    all_cuts = casted.approxQuantile(cols, probs, relative_error)
    k = len(cols)

    def bucket_of(v, cuts: list[float]):
        # bisect_right(cuts, v) == |{i: v >= cuts[i]}| for the sorted
        # (possibly duplicate-valued) cut array — identical ids to the
        # old fold, including NaN (> every cut in Spark's ordering →
        # last bucket); NULL short-circuits to bucket 0 like the old
        # NULL-comparison fold did
        def srch(lo: int, hi: int):
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(
                F.lit(float(cuts[mid])) > v, srch(lo, mid)
            ).otherwise(srch(mid + 1, hi))

        return F.when(v.isNull(), F.lit(0)).otherwise(
            srch(0, len(cuts))
        )

    z = F.lit(0).cast("long")
    for i, (c, cuts) in enumerate(zip(cols, all_cuts)):
        bucket = bucket_of(F.col(c).cast("double"), cuts)
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit.cast("long"), j * k + (k - 1 - i))
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int,
    bits: int = 6,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` clustered on the Z-curve over ``zorder_by``.

    One quantile pass + one range shuffle on the z-key + a local sort —
    the same cost shape as ``write_range_sorted``, but the footer
    min/max boxes it buys are tight on EVERY listed column, not just
    the first (asserted in tests/test_layout.py: a conjunctive box
    predicate intersects strictly fewer files than under a linear
    sort).
    """
    from pyspark.sql import functions as F  # noqa: F401

    key = zorder_key(df, zorder_by, bits=bits)
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) footer statistics for ``column``.

    Reads parquet metadata only (no data pages) — the same information
    the scan's row-group skipping consults.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    return ranges


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop a saved (e.g. bucketed) table from the session catalog."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ---------------------------------------------------------------------------
# q124 — the bucketed fact⋈fact join as a hash-checked registry row
# ---------------------------------------------------------------------------


def _bucket_tag(sf: str) -> str:
    import re as _re

    return _re.sub(r"[^0-9A-Za-z]+", "_", sf.strip("/"))


def _register_q124() -> None:
    from pyspark.sql import functions as F

    from parquet_demo_spark.catalog import load
    from parquet_demo_spark.functions import DEC, dec2
    from parquet_demo_spark.registry import register

    @register(
        "q124_bucketed_join",
        oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        doc="The 100 TB fact⋈fact strategy run end-to-end: both join "
        "sides are rewritten as tables bucketed (and sorted) on the "
        "join key, so the sort-merge join reads co-located buckets with "
        "NO Exchange on either side (SelectedBucketsCount in the scan; "
        "asserted in tests/test_plans.py::test_q124_bucketed_join_no_"
        "shuffle). The merge hint pins SMJ — without it Catalyst would "
        "broadcast the small fixture side, which is the right call at "
        "this SF but not the strategy under test; at 100 TB neither "
        "fact side broadcasts and bucket co-location is what removes "
        "the shuffle. Tables are rebuilt from the fixture every run "
        "(no stale-cache risk across fixture regenerations); the "
        "rebuild cost is the one-time write that pays for itself on "
        "every co-located join after — the lakehouse bucketing trade.",
    )
    def q124(spark, sf):
        return _q124_read(spark, sf, _q124_build(spark, sf))

    def _q124_build(spark, sf):
        """Build phase: the bucketed+sorted table rewrites."""
        from parquet_demo_spark.layout import drop_table, write_bucketed

        tag = _bucket_tag(sf)
        base = f"/tmp/spark_graft_bucketed/{tag}"
        lt, ot = f"bq124_lineitem_{tag}", f"bq124_orders_{tag}"
        li = load(spark, sf, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
        for tbl, df, key, sub in (
            (lt, li, "l_orderkey", "lineitem"),
            (ot, o, "o_orderkey", "orders"),
        ):
            drop_table(spark, tbl)
            write_bucketed(
                df, tbl, [key], 8, sort_by=[key], path=f"{base}/{sub}"
            )
        return lt, ot

    def _q124_read(spark, sf, state):
        """Read phase: the exchange-free co-located sort-merge join."""
        lt, ot = state
        rev = dec2("l_extendedprice") * (F.lit(1).cast(DEC) - dec2("l_discount"))
        j = (
            spark.table(lt)
            .hint("merge")
            .join(
                spark.table(ot),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        return (
            j.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(rev).cast("double").alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )

    from parquet_demo_spark.registry import register_phases

    register_phases("q124_bucketed_join", _q124_build, _q124_read)


_register_q124()


def _register_q136() -> None:
    from pyspark.sql import functions as F

    from parquet_demo_spark.catalog import load
    from parquet_demo_spark.registry import register

    @register(
        "q136_zorder_box_scan",
        oracle="""
        WITH b AS (
          SELECT (4 * MAX(l_partkey)) // 10 AS p_lo,
                 (6 * MAX(l_partkey)) // 10 AS p_hi,
                 (4 * MAX(l_suppkey)) // 10 AS s_lo,
                 (5 * MAX(l_suppkey)) // 10 AS s_hi
          FROM lineitem)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 100, 0) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem, b
        WHERE l_partkey BETWEEN p_lo AND p_hi
          AND l_suppkey BETWEEN s_lo AND s_hi
        """,
        doc="Z-order clustering end-to-end: lineitem is rewritten on "
        "the Morton curve over (l_partkey, l_suppkey) — equal-depth "
        "quantile buckets bit-interleaved into one sort key — then a "
        "conjunctive box predicate (data-derived bounds, SF-invariant "
        "selectivity) scans it back and aggregates. The hash check "
        "proves the clustered rewrite is lossless; the file-skipping "
        "payoff is pinned separately in tests/test_layout.py, where "
        "the same box intersects strictly fewer footer min/max boxes "
        "than under a linear l_partkey sort (a 1-D sort leaves every "
        "file spanning the full l_suppkey range). At 100 TB this is "
        "the difference between a needle-in-two-dimensions query "
        "reading ~sqrt-fraction of files and reading all of them; the "
        "rebuild is the one-time write that pays for itself on every "
        "selective read after, same trade as q124's bucketing.",
    )
    def q136(spark, sf):
        return _q136_read(spark, sf, _q136_build(spark, sf))

    def _q136_build(spark, sf):
        """Build phase: the Z-order clustered rewrite + box bounds."""
        import os
        import tempfile

        from parquet_demo_spark.layout import write_zorder

        li = load(spark, sf, "lineitem").select(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        mx = li.agg(
            F.max("l_partkey").alias("p"), F.max("l_suppkey").alias("s")
        ).first()
        p_lo, p_hi = (4 * mx.p) // 10, (6 * mx.p) // 10
        s_lo, s_hi = (4 * mx.s) // 10, (5 * mx.s) // 10
        path = os.path.join(
            tempfile.gettempdir(),
            "spark_graft_zorder",
            f"{_bucket_tag(sf)}_pid{os.getpid()}",
        )
        write_zorder(li, path, ["l_partkey", "l_suppkey"], n_files=32)
        return path, (p_lo, p_hi, s_lo, s_hi)

    def _q136_read(spark, sf, state):
        """Read phase: the footer-box-pruned conjunctive scan."""
        path, (p_lo, p_hi, s_lo, s_hi) = state
        zli = spark.read.parquet(path)
        return (
            zli.filter(
                F.col("l_partkey").between(p_lo, p_hi)
                & F.col("l_suppkey").between(s_lo, s_hi)
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100,
                        0,
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("revenue_cents"),
            )
        )

    from parquet_demo_spark.registry import register_phases

    register_phases("q136_zorder_box_scan", _q136_build, _q136_read)


_register_q136()
