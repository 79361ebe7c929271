"""Incremental derived-table maintenance over the mutable store.

Two capabilities a 100 TB pipeline needs on top of MERGE + CDC
(sources/merge_store.py):

- **q134 — incremental materialized-view refresh.** A grouped aggregate
  is kept current by applying the CDC feed's signed deltas
  (+post-image, −pre-image) instead of recomputing from the table.
  This is the standard invertible-aggregate view-maintenance algorithm
  (the shape Delta CDF / Flink retraction streams exist to enable):
  refresh cost is O(changed keys), not O(table). The driver hash-checks
  the incrementally-maintained view against a full-recompute SQL oracle
  — the two must be bit-identical.

- **q135 — order-independent streaming upsert ingest.** The reference's
  streaming pipeline is iter_batches → bulk ReplaceOne
  (`examples/ingest_parquet_to_mongo_stream.py:102-181`); here it is
  readStream(maxFilesPerTrigger=1) → foreachBatch →
  ``store.merge(conditional=True)``. The conditional (only-if-newer)
  merge makes the final snapshot a pure function of the input SET —
  independent of file arrival order and idempotent under foreachBatch's
  at-least-once redelivery — so the oracle is a clean global
  last-write-wins window over the events table, with no batch-order
  term in sight.

Both run against a REAL store on disk (fresh per run, per-pid scratch),
so the hash check covers write → commit → CDC/stream → read end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.operators.merge import _scratch_root
from parquet_demo_spark.registry import register, register_phases
from parquet_demo_spark.sources.merge_store import (
    ParquetMergeStore,
    changes_between,
    stream_merge_into_store,
)

_MV_ORACLE = """
    WITH ranked AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY (event_id % 2) DESC, ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
"""


def _mv_agg(df: DataFrame) -> DataFrame:
    """The maintained view: per event_type, (#keys, Σevent_id, Σcents).

    All three aggregates are invertible (sums over integers; the key
    count is a sum of ±1), which is what makes delta-maintenance exact.
    Cents are integers end-to-end so +post −pre leaves no float residue.
    """
    return df.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )


def refresh_incremental(mv: DataFrame, cdc: DataFrame) -> DataFrame:
    """Apply a pre/post CDC feed to the q134 view: MV' = MV ⊎ signed Δ.

    ``cdc`` must carry pre-images (``include_preimages=True``): each
    group's delta is Σ over {insert: +row, update_postimage: +row,
    update_preimage: −row, delete: −row}, so an updated key nets
    (0 keys, Δevent_id, Δcents), an inserted key nets (+1, +event_id,
    +cents), and a deleted key retracts itself (−1, −event_id,
    −cents). Full-outer join handles groups born (or emptied) by the
    delta. Cost: one aggregate over the CDC rows + a join on the
    (tiny) group dimension — never touches the base table.
    """
    sign = F.when(
        F.col("_change_type").isin("update_preimage", "delete"), F.lit(-1)
    ).otherwise(F.lit(1))
    delta = cdc.groupBy("event_type").agg(
        F.sum(sign).cast("bigint").alias("d_keys"),
        F.sum(sign * F.col("event_id")).cast("bigint").alias("d_event_id"),
        F.sum(sign * F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("d_cents"),
    )
    merged = mv.join(delta, "event_type", "full_outer").select(
        "event_type",
        (
            F.coalesce(F.col("n_keys"), F.lit(0))
            + F.coalesce(F.col("d_keys"), F.lit(0))
        )
        .cast("bigint")
        .alias("n_keys"),
        (
            F.coalesce(F.col("sum_event_id"), F.lit(0))
            + F.coalesce(F.col("d_event_id"), F.lit(0))
        )
        .cast("bigint")
        .alias("sum_event_id"),
        (
            F.coalesce(F.col("value_cents"), F.lit(0))
            + F.coalesce(F.col("d_cents"), F.lit(0))
        )
        .cast("bigint")
        .alias("value_cents"),
    )
    # a group whose last key was updated away would net to zero keys;
    # a recompute would not list it, so neither may the maintained view
    return merged.filter(F.col("n_keys") > 0)


@register(
    "q134_incremental_mv_refresh",
    oracle=_MV_ORACLE,
    doc="Incremental materialized-view maintenance, hash-checked "
    "against full recompute: build the store at v0 (even event_ids), "
    "aggregate it into the view, merge the odd batch (v1), then "
    "refresh the view USING ONLY changes_between(v0, v1, "
    "include_preimages=True) — +post −pre per group, O(changed keys). "
    "The oracle recomputes the same aggregate from the final LWW state "
    "from scratch; the hash match proves delta-maintenance is exact, "
    "including the pre-image feed's invertibility. At 100 TB this is "
    "the difference between refreshing a dashboard from the day's "
    "changes and rescanning the corpus.",
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    root = _scratch_root("q134", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    mv0 = _mv_agg(store.read(spark, version=0))
    store.merge(ev.filter(F.col("event_id") % 2 == 1))
    cdc = changes_between(store, spark, 0, 1, include_preimages=True)
    return refresh_incremental(mv0, cdc).orderBy("event_type")


def _q134_build(spark: SparkSession, sf: str):
    """Build phase: both merges + the PINNED v0 view (a materialized
    view IS materialized — pinning it is the production shape)."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q134", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    mv0 = _mv_agg(store.read(spark, version=0)).localCheckpoint()
    store.merge(ev.filter(F.col("event_id") % 2 == 1))
    return store, mv0


def _q134_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the O(Δ) refresh — CDC diff + signed-delta apply."""
    store, mv0 = state
    cdc = changes_between(store, spark, 0, 1, include_preimages=True)
    return refresh_incremental(mv0, cdc).orderBy("event_type")


register_phases("q134_incremental_mv_refresh", _q134_build, _q134_read)


@register(
    "q135_stream_upsert_ingest",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Streaming upsert ingestion end-to-end (R13∘R14): events split "
    "into 4 files, readStream(maxFilesPerTrigger=1) → foreachBatch → "
    "conditional merge (only-if-newer by (ts, event_id)), "
    "trigger=availableNow. Because the merge is conditional, the final "
    "snapshot equals the GLOBAL last-write-wins over all events "
    "regardless of which micro-batch delivered which file — exactly "
    "what the clean window oracle states. The aggregate reads the "
    "committed store back from disk, so the hash covers source "
    "listing, micro-batch sequencing, checkpointing, N versioned "
    "merges, and the snapshot read.",
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    return _q135_read(spark, sf, _q135_build(spark, sf))


def _q135_build(spark: SparkSession, sf: str):
    """Build phase: the four deterministic source files the stream will
    ingest (fixture prep — the ingest itself is the operation)."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q135", sf)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    # four deterministic source files, surfaced as LEAF files (the file
    # stream source lists, it does not recurse); the stream sees them
    # as (at most) four micro-batches in listing order, but conditional
    # merge makes the result order-independent, so nothing depends on
    # which
    import shutil

    for g in range(4):
        d = os.path.join(root, f"split{g}")
        ev.filter(F.col("event_id") % 4 == g).coalesce(1).write.parquet(d)
        part = next(
            f
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet") and f.startswith("part-")
        )
        shutil.move(
            os.path.join(d, part), os.path.join(src, f"batch{g}.parquet")
        )
        shutil.rmtree(d)
    return root, src, ev.schema


def _q135_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the streaming ingest itself — a FRESH
    store + checkpoint per invocation (re-timing a finished stream
    would measure nothing), then the committed-snapshot aggregate."""
    from parquet_demo_spark.operators.merge import _fresh_dir

    root, src, schema = state
    store = ParquetMergeStore(
        _fresh_dir(root, "store"),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    q = stream_merge_into_store(
        spark,
        src,
        schema,
        store,
        _fresh_dir(root, "ckpt"),
        max_files_per_trigger=1,
        conditional=True,
    )
    q.awaitTermination()
    return _mv_agg(store.read(spark)).orderBy("event_type")


register_phases("q135_stream_upsert_ingest", _q135_build, _q135_read)


@register(
    "q139_change_feed_refresh",
    oracle=_MV_ORACLE,
    doc="q134's refresh law served from the STORED change feed: the "
    "second merge runs with write_change_feed=True, so the commit "
    "itself materializes its insert/pre/post rows (Delta CDF design) "
    "from the ranked frame the merge already computed — and the view "
    "refresh reads changes/v1 directly, an O(Δ) read that touches no "
    "data bucket at all. Same full-recompute oracle as q134: the hash "
    "match proves the written feed carries exactly the information "
    "the snapshot diff would reconstruct. At 100 TB this is the "
    "difference that matters most in the CDC story: changes_between "
    "re-reads every REWRITTEN bucket (hash-bucketing scatters even a "
    "small key set across many buckets), while the stored feed costs "
    "what the changes weigh.",
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    root = _scratch_root("q139", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    mv0 = _mv_agg(store.read(spark, version=0))
    store.merge(
        ev.filter(F.col("event_id") % 2 == 1), write_change_feed=True
    )
    feed = store.change_feed(spark, 1)
    return refresh_incremental(mv0, feed).orderBy("event_type")


def _q139_build(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events")
    root = _scratch_root("q139", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    mv0 = _mv_agg(store.read(spark, version=0)).localCheckpoint()
    store.merge(
        ev.filter(F.col("event_id") % 2 == 1), write_change_feed=True
    )
    return store, mv0


def _q139_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: stored-feed read + signed-delta apply — the O(Δ)
    path that touches no data bucket."""
    store, mv0 = state
    feed = store.change_feed(spark, 1)
    return refresh_incremental(mv0, feed).orderBy("event_type")


register_phases("q139_change_feed_refresh", _q139_build, _q139_read)


@register(
    "q159_partitioned_mv_refresh",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    wk0 AS (SELECT MIN(wk) AS w FROM ev),
    ranked AS (
      SELECT wk, user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY wk, user_id, event_type
               ORDER BY (event_id % 2) DESC, ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked, wk0
    WHERE rn = 1 AND wk <> wk0.w
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Retention flowing into DERIVED tables, hash-checked: a "
    "materialized view over the DATE-PARTITIONED store is refreshed "
    "incrementally across a span that includes a partition DROP. The "
    "store merges even event_ids (v0, the view's base), merges the "
    "odd batch (v1, unconditional per-week replace), then "
    "drop_partition(first week) (v2 — one manifest write, zero data "
    "I/O). The refresh applies ONLY changes_between(0, 2, "
    "include_preimages=True): per-partition child diffs for the "
    "merged weeks PLUS the dropped week's snapshot as CDC delete "
    "rows, through q134's signed-delta law (+post −pre). The oracle "
    "recomputes the final aggregate from scratch (global per-week "
    "LWW, dropped week excluded) — the hash match proves a "
    "metadata-only retention drop reaches downstream aggregates "
    "EXACTLY, with no view rebuild and no scan of surviving "
    "partitions beyond their changed buckets. At 100 TB this is "
    "GDPR/retention day-to-day: expire a day, and every derived "
    "table follows from the day's CDC rows. "
    "sources/partitioned_store.py changes_between + "
    "operators/incremental.py refresh_incremental.",
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    return _q159_read(spark, sf, _q159_build(spark, sf))


def _q159_build(spark: SparkSession, sf: str):
    """Build phase: v0 merge + pinned base view, v1 merge, v2 drop."""
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    ev = load(spark, sf, "events").select(
        F.date_trunc("week", F.col("ts"))
        .cast("date")
        .cast("string")
        .alias("wk"),
        "user_id",
        "event_type",
        "event_id",
        "ts",
        "value",
    )
    root = _scratch_root("q159", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))  # v0
    mv0 = _mv_agg(store.read(spark, version=0)).localCheckpoint()
    store.merge(ev.filter(F.col("event_id") % 2 == 1))  # v1
    store.drop_partition(store.partitions()[0])  # v2: retention
    return store, mv0


def _q159_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the O(Δ) refresh across merges AND the drop."""
    store, mv0 = state
    cdc = store.changes_between(spark, 0, 2, include_preimages=True)
    return refresh_incremental(mv0, cdc).orderBy("event_type")


register_phases("q159_partitioned_mv_refresh", _q159_build, _q159_read)


@register(
    "q198_mor_cdc_mv_refresh",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    ranked AS (
      SELECT wk, user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY wk, user_id, event_type
               ORDER BY (event_id % 2) DESC, ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked
    WHERE rn = 1 AND event_id % 7 <> 0
    GROUP BY event_type ORDER BY event_type
    """,
    doc="CDC on merge-on-read children (VERDICT r12 #2), hash-checked "
    "end-to-end: the week-partitioned table is built with "
    "child_store='mor', so every merge is an O(batch) delta-log "
    "append and every DELETE WHERE a tombstone append — no bucket "
    "rewrite anywhere. v0 merges the even event_ids (the view's "
    "base), v1 scatter-merges the odd batch across every partition, "
    "v2 tombstones the survivors with event_id % 7 = 0. The refresh "
    "applies ONLY changes_between(0, 2, include_preimages=True) — "
    "composed from each child's LOG-ENTRY diff (per-PK winner of the "
    "appended dirs + one bucket-pruned probe of the pinned "
    "pre-state, O(Δ), never a base scan) — through q134's "
    "signed-delta law. The oracle recomputes the final aggregate "
    "from scratch (per-week LWW, odd batch winning, tombstoned keys "
    "excluded); the hash match proves the delta log IS a change "
    "feed: the backfill-optimized MOR table now feeds the same "
    "incremental consumers as the COW one (q134/q159/q143). "
    "sources/mor_store.py changes_between + "
    "sources/partitioned_store.py composition.",
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    return _q198_read(spark, sf, _q198_build(spark, sf))


def _q198_build(spark: SparkSession, sf: str):
    """Build phase: v0 merge + pinned base view, v1 scatter merge,
    v2 tombstone delete — all O(batch) MOR delta appends."""
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    ev = load(spark, sf, "events").select(
        F.date_trunc("week", F.col("ts"))
        .cast("date")
        .cast("string")
        .alias("wk"),
        "user_id",
        "event_type",
        "event_id",
        "ts",
        "value",
    )
    root = _scratch_root("q198", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
        child_store="mor",
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))  # v0
    mv0 = _mv_agg(store.read(spark, version=0)).localCheckpoint()
    store.merge(ev.filter(F.col("event_id") % 2 == 1))  # v1
    store.delete_where(spark, F.col("event_id") % 7 == 0)  # v2
    return store, mv0


def _q198_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the O(Δ) refresh from the children's delta logs."""
    store, mv0 = state
    cdc = store.changes_between(spark, 0, 2, include_preimages=True)
    return refresh_incremental(mv0, cdc).orderBy("event_type")


register_phases("q198_mor_cdc_mv_refresh", _q198_build, _q198_read)
