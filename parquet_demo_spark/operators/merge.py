"""MERGE / upsert-into-mutable-store queries (SURVEY §2A R14 end-to-end).

The reference's R14 is "bulk ReplaceOne into Mongo by composite PK"
(`examples/ingest_parquet_to_mongo_bulk.py`, `_bulk.py:108-116,119-209`).
sources/mongo.py maps that to the Spark connector (env-gated: no jar/
mongod in this container); sources/merge_store.py provides the same
mutable-store capability file-backed, so the upsert path executes — and
is hash-checked by the driver — against a REAL mutable store in any
environment.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register, register_phases
from parquet_demo_spark.sources.merge_store import ParquetMergeStore


def _scratch_root(tag: str, sf: str) -> str:
    """Per-process scratch dir for a query's throwaway store.

    Keyed by (tag, sf, pid): the query must exercise a FRESH store
    (same input → same versions → same result) and reruns must not
    accumulate /tmp state, but two processes hitting the same fixture
    concurrently (e.g. bench and verify) must not share a path — one
    would rmtree the store the other is mid-merge/read on.
    """
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_merge",
        f"{tag}_{sf.strip('/').replace('/', '_')}_pid{os.getpid()}",
    )
    if os.path.exists(root):
        shutil.rmtree(root)
    return root


def _fresh_dir(root: str, name: str) -> str:
    """A read-phase scratch path that is FRESH on every invocation:
    the previous run's store/checkpoint under the same name is wiped
    rather than counter-suffixed — repeated reads in one process never
    accumulate full stores, and the path carries no process-global
    state (ADVICE r10: a module-level run counter resets per process
    while its directories persist). The ``<name>_wm`` sibling (the
    admission-watermark side store a maintenance applier derives from
    its store root) is wiped with it — a surviving watermark would
    reject every replayed batch as stale and leave the fresh store
    silently empty."""
    d = os.path.join(root, name)
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(d + "_wm", ignore_errors=True)
    return d


@register(
    "q123_merge_upsert_roundtrip",
    oracle="""
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
    """,
    doc="R14 upsert executed end-to-end against a real mutable store: "
    "events split into two batches (even event_ids, then odd) merged "
    "into a ParquetMergeStore keyed by (user_id, event_type) with "
    "(ts, event_id) last-write-wins inside a batch and unconditional "
    "replace across batches — exactly the reference's ReplaceOne stream "
    "semantics. The returned aggregate reads the store's committed "
    "snapshot back from disk, so the driver's hash check covers the "
    "whole write→commit→read round trip (collapse shuffle, bucket "
    "routing, manifest, atomic pointer swap). The oracle reproduces the "
    "two-batch replace order as (event_id % 2) DESC, ts DESC, "
    "event_id DESC per key.",
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    return _q123_read(spark, sf, _q123_build(spark, sf))


def _q123_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    """Build phase: the two merges committing the store."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q123", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    store.merge(ev.filter(F.col("event_id") % 2 == 1))
    return store


def _q123_read(spark: SparkSession, sf: str, store) -> DataFrame:
    """Read phase: committed-snapshot scan + aggregate."""
    final = store.read(spark)
    return (
        final.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q123_merge_upsert_roundtrip", _q123_build, _q123_read)


@register(
    "q125_cdc_incremental_read",
    oracle="""
    WITH s0 AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 0)
      WHERE rn = 1
    ),
    s1 AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY (event_id % 2) DESC, ts DESC,
                                           event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    )
    SELECT s1.event_type,
           CASE WHEN s0.user_id IS NULL THEN 'insert'
                ELSE 'update_postimage' END AS _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(s1.event_id) AS BIGINT) AS sum_event_id
    FROM s1 LEFT JOIN s0
      ON s1.user_id = s0.user_id AND s1.event_type = s0.event_type
    WHERE s0.user_id IS NULL OR s1.event_id <> s0.event_id
    GROUP BY s1.event_type, _change_type
    ORDER BY s1.event_type, _change_type
    """,
    doc="CDC incremental read, hash-checked: after the two q123-style "
    "merges (even event_ids, then odd), changes_between(v0, v1) must "
    "emit exactly the keys whose surviving row differs between the "
    "snapshots — tagged insert vs update_postimage — and DROP keys in "
    "rewritten buckets whose row was re-written identically (keys with "
    "no odd-batch event). The oracle reconstructs both snapshot states "
    "with windows and diffs them; the engine side reads only the "
    "buckets whose manifest path changed. This is the derived-table "
    "refresh primitive: at 100 TB a consumer re-scores the day's "
    "changes, not the corpus.",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    return _q125_read(spark, sf, _q125_build(spark, sf))


def _q125_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    ev = load(spark, sf, "events")
    root = _scratch_root("q125", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    store.merge(ev.filter(F.col("event_id") % 2 == 1))
    return store


def _q125_read(spark: SparkSession, sf: str, store) -> DataFrame:
    """Read phase: the CDC incremental read itself (changed-bucket
    diff), the path a derived-table refresh exercises."""
    from parquet_demo_spark.sources.merge_store import changes_between

    ch = changes_between(store, spark, 0, 1)
    return (
        ch.groupBy("event_type", "_change_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
        )
        .orderBy("event_type", "_change_type")
    )


register_phases("q125_cdc_incremental_read", _q125_build, _q125_read)


@register(
    "q140_merge_delete_where",
    oracle="""
    WITH collapsed AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    ),
    flagged AS (
      SELECT *, (event_type <> 'error' AND value < 30.0) AS del
      FROM collapsed
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN NOT del THEN 1 ELSE 0 END) AS BIGINT)
             AS n_live,
           CAST(SUM(CASE WHEN NOT del THEN event_id END) AS BIGINT)
             AS sum_live_event_id,
           CAST(SUM(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deleted,
           CAST(SUM(CASE WHEN del THEN event_id END) AS BIGINT)
             AS sum_deleted_event_id
    FROM flagged
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Delta-style DELETE WHERE executed against the real mutable "
    "store, end-to-end: events merged (LWW collapse per "
    "(user_id, event_type)), then `delete(event_type <> 'error' AND "
    "value < 30.0, write_change_feed=True)` rewrites ONLY the buckets "
    "holding a match and records the removed rows as "
    "_change_type='delete' (Delta CDF naming). The result joins the "
    "post-delete snapshot aggregate with the delete feed's aggregate "
    "per event_type, so the driver's hash check covers the predicate "
    "split (NULL-keeps semantics included), the bucket-pruned rewrite, "
    "the commit, AND the stored delete feed in one row set. 'error' "
    "rows are untouched by design — their group exercises the "
    "no-deletes side of the full-outer join. Scale: phase 1 collects "
    "only matching bucket IDs (≤ num_buckets ints); phase 2 rewrites "
    "matching buckets only — a selective delete on a 100 TB store "
    "rewrites the buckets its rows live in, not the table.",
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    return _q140_read(spark, sf, _q140_build(spark, sf))


def _q140_build(spark: SparkSession, sf: str):
    """Build phase: merge + the DELETE WHERE commit (the mutations)."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q140", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev)
    v = store.delete(
        spark,
        "event_type <> 'error' AND value < 30.0",
        write_change_feed=True,
    )
    return store, v


def _q140_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: post-delete snapshot + stored delete feed."""
    store, v = state
    live = (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_live"),
            F.sum("event_id").cast("bigint").alias("sum_live_event_id"),
        )
    )
    deleted = (
        store.change_feed(spark, v)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_deleted"),
            F.sum("event_id").cast("bigint").alias("sum_deleted_event_id"),
        )
    )
    return (
        live.join(deleted, "event_type", "full_outer")
        .select(
            "event_type",
            F.coalesce(F.col("n_live"), F.lit(0)).cast("bigint")
            .alias("n_live"),
            F.col("sum_live_event_id").cast("bigint"),
            F.coalesce(F.col("n_deleted"), F.lit(0)).cast("bigint")
            .alias("n_deleted"),
            F.col("sum_deleted_event_id").cast("bigint"),
        )
        .orderBy("event_type")
    )


register_phases("q140_merge_delete_where", _q140_build, _q140_read)


@register(
    "q141_bloom_point_lookup",
    oracle="""
    WITH collapsed AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           event_type,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents
    FROM collapsed WHERE event_id IN (
      SELECT MIN(event_id) FROM collapsed
      UNION SELECT MAX(event_id) FROM collapsed
      UNION SELECT MIN(event_id) FROM collapsed
        WHERE event_type = 'purchase'
    )
    ORDER BY event_id
    """,
    doc="Point lookups against the mutable store through manifest BLOOM "
    "skipping: the store is keyed (user_id, event_type), so a lookup on "
    "event_id can never bucket-prune by PK hash, and — event_ids being "
    "hash-scattered — every bucket's min/max spans ~the full domain, so "
    "range stats never skip either. Per-bucket blooms (Parquet/Iceberg-"
    "style split-block design, Kirsch-Mitzenmacher double hashing, "
    "16 bits/value, k=5) let read(where={'event_id': (p, p)}) open only "
    "the buckets whose bloom admits p (~1 of 8 here; FPR < 1%). The "
    "probe ids are data-derived (min/max survivor + min 'purchase' "
    "survivor) because the LWW collapse supersedes different ids at "
    "each sf; the oracle derives the same probes from the same "
    "collapse, so the hash check covers bloom build AND "
    "never-wrong-prune with guaranteed non-empty rows. At "
    "100 TB this is the needle-in-haystack path: a point read touches "
    "O(1) bucket dirs, not the table.",
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    return _q141_read(spark, sf, _q141_build(spark, sf))


def _q141_build(spark: SparkSession, sf: str):
    """Build phase: merge (blooms built at write) + probe derivation."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q141", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
        bloom_cols=("event_id",),
    )
    store.merge(ev)
    # deterministic data-derived probes: no fixed id survives the LWW
    # collapse at every sf (later events supersede earlier keys)
    snap = store.read(spark)
    lo, hi, pmin = snap.agg(
        F.min("event_id"),
        F.max("event_id"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("event_id")
            )
        ),
    ).first()
    return store, sorted({lo, hi, pmin})


def _q141_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the bloom-pruned point lookups themselves."""
    store, probes = state
    parts = [store.read(spark, where={"event_id": (p, p)}) for p in probes]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("value_cents"),
    ).orderBy("event_id")


register_phases("q141_bloom_point_lookup", _q141_build, _q141_read)


@register(
    "q142_merge_into_clauses",
    oracle="""
    WITH even AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 0)
      WHERE rn = 1
    ),
    odd AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 1)
      WHERE rn = 1
    ),
    merged AS (
      SELECT
        COALESCE(e.user_id, o.user_id) AS user_id,
        COALESCE(e.event_type, o.event_type) AS event_type,
        CASE
          WHEN e.user_id IS NULL THEN 'insert'
          WHEN o.user_id IS NULL THEN 'keep'
          WHEN o.value < 5 THEN 'delete'
          WHEN o.ts >= e.ts THEN 'update'
          ELSE 'keep'
        END AS action,
        e.event_id AS e_event_id, e.value AS e_value,
        o.event_id AS o_event_id, o.value AS o_value,
        o.event_type AS o_event_type
      FROM even e
      FULL OUTER JOIN odd o
        ON e.user_id = o.user_id AND e.event_type = o.event_type
    ),
    final AS (
      SELECT user_id, event_type,
             CASE WHEN action = 'update' OR action = 'insert'
                  THEN o_event_id ELSE e_event_id END AS event_id,
             CASE WHEN action = 'update' THEN GREATEST(o_value, e_value)
                  WHEN action = 'insert' THEN o_value
                  ELSE e_value END AS value
      FROM merged
      WHERE action <> 'delete'
        AND NOT (action = 'insert' AND o_event_type = 'error')
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM final
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Full MERGE INTO clause semantics executed against the real "
    "mutable store: even-event_id rows seed the table, then the odd "
    "rows merge with ORDERED clauses — WHEN MATCHED AND s.value < 5 "
    "THEN DELETE, WHEN MATCHED AND s.ts >= t.ts THEN UPDATE SET "
    "value = greatest(s.value, t.value) (other columns take the source "
    "row), WHEN NOT MATCHED AND s.event_type <> 'error' THEN INSERT. "
    "First-true-clause-wins, expression SET over s/t aliases, "
    "conditional insert — the Delta MERGE surface (public design), on "
    "the same bucket-pruned rewrite as ReplaceOne merges. The oracle "
    "replays the clause law over the two LWW-collapsed batches with a "
    "full outer join; the returned per-event_type aggregate of the "
    "committed snapshot hash-checks collapse, clause order, SET "
    "expressions, insert gating, bucket routing, and the commit in one "
    "row set. Scale: identical to merge — only buckets the batch "
    "touches rewrite; clause evaluation is a projection on the joined "
    "touched-bucket frame.",
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    return _q142_read(spark, sf, _q142_build(spark, sf))


def _q142_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q142", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    store.merge_into(
        ev.filter(F.col("event_id") % 2 == 1),
        matched=[
            ("delete", "s.value < 5"),
            ("update", "s.ts >= t.ts"),
        ],
        update_set={"value": "greatest(s.value, t.value)"},
        not_matched_insert="s.event_type <> 'error'",
    )
    return store


def _q142_read(spark: SparkSession, sf: str, store) -> DataFrame:
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q142_merge_into_clauses", _q142_build, _q142_read)


@register(
    "q143_store_replication",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY (event_id % 2) DESC, ts DESC, event_id DESC) AS rn
      FROM events
    ),
    final AS (
      SELECT * FROM ranked
      WHERE rn = 1
        AND NOT (event_type <> 'error' AND value < 30.0)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM final
    GROUP BY event_type ORDER BY event_type
    """,
    doc="CDC store replication, consumer side: a source store commits "
    "three feed-bearing versions (merge even event_ids, merge odd — "
    "unconditional replace, so odd beats even per PK — then DELETE "
    "WHERE value < 30 outside 'error'), and replay_change_feed applies "
    "the three feeds IN ORDER to an initially-empty replica: "
    "insert/update_postimage rows as unconditional upserts, delete rows "
    "as keyed deletes. The returned aggregate reads the REPLICA, so the "
    "driver's hash check proves feed completeness (every state change "
    "was captured) and replay fidelity (applying only feeds reproduces "
    "the source snapshot). The oracle computes the source's final state "
    "directly — replace order (event_id % 2) DESC, then the delete "
    "predicate. Scale: replication reads O(delta) feed files per "
    "version, never the source table — shipping a day of changes on a "
    "100 TB store moves the day's delta.",
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    return _q143_read(spark, sf, _q143_build(spark, sf))


_Q143_REPLICA_N = [0]


def _q143_build(spark: SparkSession, sf: str):
    """Build phase: the SOURCE store's three feed-bearing commits."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q143", sf)
    src = ParquetMergeStore(
        os.path.join(root, "src"),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    src.merge(ev.filter(F.col("event_id") % 2 == 0), write_change_feed=True)
    src.merge(ev.filter(F.col("event_id") % 2 == 1), write_change_feed=True)
    src.delete(
        spark,
        "event_type <> 'error' AND value < 30.0",
        write_change_feed=True,
    )
    return root, src


def _q143_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: replicate the stored feeds into a FRESH
    replica (a new dst dir per invocation, so a re-timed run measures
    replication, not a converged no-op re-replay), then read it back."""
    from parquet_demo_spark.sources.merge_store import replay_change_feed

    root, src = state
    _Q143_REPLICA_N[0] += 1
    dst = ParquetMergeStore(
        os.path.join(root, f"dst{_Q143_REPLICA_N[0]}"),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    replay_change_feed(src, dst, spark)
    return (
        dst.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q143_store_replication", _q143_build, _q143_read)


@register(
    "q149_restore_rollback",
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
           CAST(2 AS INTEGER) AS v_final
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Metadata-only RESTORE, hash-checked end-to-end: merge all "
    "events (v0), run a destructive DELETE of every 'click' key (v1), "
    "then restore(0) — an O(1) rollback that re-commits v0's manifest "
    "as v2 without touching data files. The returned aggregate reads "
    "the CURRENT snapshot plus the committed version as v_final, so "
    "the hash check proves three things at once: the delete committed "
    "(v advanced to 2, not 1), the restore rolled the visible state "
    "back to exactly the v0 LWW collapse ('click' keys are present "
    "again), and history stayed linear. The oracle is the plain "
    "single-batch collapse of events with the literal final version. "
    "At 100 TB this is the operational story for a bad merge: revert "
    "in one manifest write, not a table rewrite.",
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    return _q149_read(spark, sf, _q149_build(spark, sf))


def _q149_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    """Build phase: merge, bad delete, metadata-only restore."""
    ev = load(spark, sf, "events")
    root = _scratch_root("q149", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev)  # v0
    store.delete(spark, "event_type = 'click'")  # v1: the bad delete
    store.restore(0)  # v2: metadata-only rollback
    return store


def _q149_read(spark: SparkSession, sf: str, store) -> DataFrame:
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
        )
        .withColumn(
            "v_final", F.lit(int(store.current_version())).cast("int")
        )
        .orderBy("event_type")
    )


register_phases("q149_restore_rollback", _q149_build, _q149_read)


@register(
    "q150_merge_not_matched_by_source",
    oracle="""
    WITH even AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 0)
      WHERE rn = 1
    ),
    odd AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 1)
      WHERE rn = 1
    ),
    merged AS (
      SELECT
        COALESCE(e.user_id, o.user_id) AS user_id,
        COALESCE(e.event_type, o.event_type) AS event_type,
        CASE
          WHEN e.user_id IS NULL THEN 'insert'
          WHEN o.user_id IS NULL AND e.value < 30.0 THEN 'nmbs_delete'
          WHEN o.user_id IS NULL AND e.event_type = 'click'
            THEN 'nmbs_update'
          WHEN o.user_id IS NULL THEN 'keep'
          WHEN o.ts >= e.ts THEN 'update'
          ELSE 'keep'
        END AS action,
        e.event_id AS e_event_id, e.value AS e_value,
        o.event_id AS o_event_id, o.value AS o_value
      FROM even e
      FULL OUTER JOIN odd o
        ON e.user_id = o.user_id AND e.event_type = o.event_type
    ),
    final AS (
      SELECT user_id, event_type,
             CASE WHEN action IN ('update', 'insert')
                  THEN o_event_id ELSE e_event_id END AS event_id,
             CASE WHEN action IN ('update', 'insert') THEN o_value
                  WHEN action = 'nmbs_update' THEN e_value + 1000.0
                  ELSE e_value END AS value
      FROM merged
      WHERE action <> 'nmbs_delete'
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM final
    GROUP BY event_type ORDER BY event_type
    """,
    doc="MERGE INTO with WHEN NOT MATCHED BY SOURCE clauses (Delta / "
    "SQL:2003, VERDICT r6 #2) against the real mutable store: even "
    "event_ids seed the table, the odd batch merges with WHEN MATCHED "
    "AND s.ts >= t.ts THEN UPDATE (whole-row replace), WHEN NOT MATCHED "
    "THEN INSERT, and — the new surface — WHEN NOT MATCHED BY SOURCE "
    "AND t.value < 30 THEN DELETE, WHEN NOT MATCHED BY SOURCE AND "
    "t.event_type = 'click' THEN UPDATE SET value = t.value + 1000 "
    "(first-match-wins, per-clause SET, conditions over the t alias "
    "only — there is no source row). This is the sync-to-source / "
    "soft-expire shape: stored keys the batch no longer carries are "
    "dropped or flagged in the SAME commit as the upserts. The oracle "
    "replays the full clause law over the two LWW-collapsed batches "
    "with a full outer join. Scale: a phase-1 anti-join pre-scan "
    "(delete()'s trick) collects the ≤ num_buckets bucket ids holding "
    "an affected target-only row, so the rewrite stays proportional to "
    "affected rows — expiring 1%% of keys on a 100 TB store rewrites "
    "~1%% of buckets, though the absence check itself necessarily reads "
    "every stored key once. merge_store.py merge_into "
    "not_matched_by_source; unit + property coverage in "
    "tests/test_merge_store.py (dict-model interleavings include the "
    "nmbs op).",
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    return _q142_read(spark, sf, _q150_build(spark, sf))


def _q150_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q150", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    store.merge_into(
        ev.filter(F.col("event_id") % 2 == 1),
        matched=[("update", "s.ts >= t.ts")],
        not_matched_insert=True,
        not_matched_by_source=[
            ("delete", "t.value < 30.0"),
            (
                "update",
                "t.event_type = 'click'",
                {"value": "t.value + 1000.0"},
            ),
        ],
    )
    return store


# read side is q142's per-type snapshot aggregate, shared
register_phases(
    "q150_merge_not_matched_by_source", _q150_build, _q142_read
)


@register(
    "q154_partitioned_store_scoped_read",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    collapsed AS (
      SELECT * FROM (
        SELECT wk, user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev)
      WHERE rn = 1
    ),
    wks AS (SELECT DISTINCT wk FROM ev),
    b AS (
      SELECT (SELECT wk FROM wks ORDER BY wk OFFSET 1 LIMIT 1) AS lo,
             (SELECT wk FROM wks ORDER BY wk OFFSET 2 LIMIT 1) AS hi,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM wks) AS n_total
    )
    SELECT c.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c.event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(c.value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wks, b
             WHERE wk BETWEEN b.lo AND b.hi) AS n_partitions_read,
           (SELECT n_total FROM b) AS n_partitions_total
    FROM collapsed c, b
    WHERE c.wk BETWEEN b.lo AND b.hi
    GROUP BY c.event_type ORDER BY c.event_type
    """,
    doc="Date-partitioned merge store with a partition-scoped read "
    "(VERDICT r6 #3): events merge into a PartitionedParquetMergeStore "
    "keyed (week, user_id, event_type), partitioned by ISO week — each "
    "week owns a child bucketed store under p=<week>/, and a global "
    "versioned manifest maps the table version to every child's "
    "committed version. The query reads ONLY weeks 2-3 of 5 "
    "(data-derived bounds), so partition pruning happens at the "
    "MANIFEST, before any file under the other weeks is even listed — "
    "tests assert the literal files-opened drop; here the hash pins "
    "the scoped snapshot (per-type aggregate of the per-week LWW "
    "collapse) plus n_partitions_read/n_partitions_total. Retention is "
    "drop_partition: one manifest write, no data I/O, CDC delete rows "
    "synthesized on demand (tests/test_partitioned_store.py). Scale: a "
    "day-scoped read or retention drop on a 100 TB events table "
    "touches one partition directory; concurrent ingest to different "
    "days commits different child stores, contending only on the "
    "global pointer CAS. sources/partitioned_store.py.",
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    return _q154_read(spark, sf, _q154_build(spark, sf))


def _q154_build(spark: SparkSession, sf: str):
    """Build phase: partition-routed merge committing all child stores."""
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
    root = _scratch_root("q154", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev)
    return store


def _q154_read(spark: SparkSession, sf: str, store) -> DataFrame:
    """Read phase: the manifest-pruned partition-scoped read."""
    parts = store.partitions()
    lo, hi = parts[1], parts[2]  # weeks 2-3: a proper subset, data-derived
    n_read = len(store._select(store._parts(), (lo, hi)))
    snap = store.read(spark, partitions=(lo, hi))
    return (
        snap.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .withColumn(
            "n_partitions_read", F.lit(int(n_read)).cast("bigint")
        )
        .withColumn(
            "n_partitions_total", F.lit(len(parts)).cast("bigint")
        )
        .orderBy("event_type")
    )


register_phases(
    "q154_partitioned_store_scoped_read", _q154_build, _q154_read
)


@register(
    "q157_stream_partitioned_ingest",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    ranked AS (
      SELECT wk, user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           (SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) FROM ev)
             AS n_partitions
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Streaming ingest into the DATE-PARTITIONED store — the "
    "production events-pipeline shape, composed from two proven "
    "pieces: q135's exactly-once recipe (readStream -> foreachBatch -> "
    "conditional only-if-newer merge, order-independent and "
    "redelivery-idempotent) applied to q154's "
    "PartitionedParquetMergeStore (each micro-batch routes rows to "
    "their week's child store; one global version pins every child per "
    "batch). Events arrive as 4 files split by event_id%4 — every "
    "micro-batch spans every week, so the test hits the multi-"
    "partition routing path, and the conditional merge makes the final "
    "snapshot the global per-week LWW regardless of arrival order, "
    "which is exactly what the clean window oracle states (plus the "
    "live partition count). Scale: this is the 100 TB ingest story — "
    "each micro-batch rewrites only the touched buckets of the touched "
    "weeks, retention stays a metadata drop, and concurrent streams on "
    "different date ranges would contend only on the global pointer. "
    "sources/partitioned_store.py merge(conditional=True) + "
    "merge_store.py stream_merge_into_store.",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    return _q157_read(spark, sf, _q157_build(spark, sf))


def _q157_build(spark: SparkSession, sf: str):
    """Build phase: the four deterministic source files."""
    import glob
    import shutil

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
    root = _scratch_root("q157", sf)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    for g in range(4):
        d = os.path.join(root, f"split{g}")
        ev.filter(F.col("event_id") % 4 == g).coalesce(1).write.parquet(d)
        [part] = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.move(part, os.path.join(src, f"batch{g}.parquet"))
        shutil.rmtree(d)
    return root, src, ev.schema


def _q157_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the partition-routed ingest stream into a
    fresh store, then the full-snapshot aggregate."""
    from parquet_demo_spark.sources.merge_store import (
        stream_merge_into_store,
    )
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    root, src, schema = state
    store = PartitionedParquetMergeStore(
        _fresh_dir(root, "store"),
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
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
    n_parts = len(store.partitions())
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .withColumn("n_partitions", F.lit(n_parts).cast("bigint"))
        .orderBy("event_type")
    )


register_phases(
    "q157_stream_partitioned_ingest", _q157_build, _q157_read
)


@register(
    "q161_merge_schema_evolution",
    oracle="""
    WITH b1 AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 0)
      WHERE rn = 1
    ),
    b2 AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, value,
               'b' || CAST(event_id % 3 AS VARCHAR) AS band,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 2 = 1)
      WHERE rn = 1
    ),
    b3 AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id,
               'b' || CAST(event_id % 3 AS VARCHAR) AS band,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_id % 10 = 3)
      WHERE rn = 1
    ),
    stacked AS (
      SELECT user_id, event_type, event_id, value,
             CAST(NULL AS VARCHAR) AS band, 1 AS prio FROM b1
      UNION ALL
      SELECT user_id, event_type, event_id, value, band, 2 FROM b2
      UNION ALL
      SELECT user_id, event_type, event_id,
             CAST(NULL AS DOUBLE) AS value, band, 3 FROM b3
    ),
    final AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY prio DESC) AS rn2
        FROM stacked)
      WHERE rn2 = 1
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(COUNT(value) AS BIGINT) AS n_valued,
           CAST(COUNT(band) AS BIGINT) AS n_banded,
           CAST(5 AS BIGINT) AS n_cols_v0,
           CAST(6 AS BIGINT) AS n_cols_final
    FROM final GROUP BY event_type ORDER BY event_type
    """,
    doc="MERGE with Delta-style schema evolution, read across the "
    "evolution boundary and hash-checked (VERDICT r7 #4): the even "
    "event_ids seed a 5-column store; the odd batch merges with "
    "allow_schema_evolution=True carrying a NEW band column (stored "
    "rows backfill NULL); a third NARROW batch (event_id%10=3) omits "
    "value entirely — ReplaceOne replaces the whole row, so its "
    "winners' value becomes NULL while the evolved schema stands. The "
    "final snapshot aggregate counts keys, null-skipped value cents, "
    "and how many rows carry each side of the boundary "
    "(n_valued/n_banded), plus the manifest-recorded column counts at "
    "v0 and HEAD — pinning that every version's manifest carries its "
    "own schema. The merge path reads touched buckets with "
    "mergeSchema + typed-null alignment to the manifest schema "
    "(merge_store._read_aligned), which the schema-evolution "
    "model-equivalence property test found was load-bearing: a plain "
    "read could adopt a pre-evolution file schema and silently drop "
    "evolved columns from the rewrite. Scale: evolution is "
    "metadata+touched-buckets only — a new column on a 100 TB table "
    "costs the batch's buckets, never a table rewrite. "
    "sources/merge_store.py merge allow_schema_evolution; "
    "tests/test_merge_store.py test_schema_evolution_model_equivalence.",
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    return _q161_read(spark, sf, _q161_build(spark, sf))


def _q161_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    band = F.concat(
        F.lit("b"), (F.col("event_id") % 3).cast("string")
    ).alias("band")
    root = _scratch_root("q161", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    store.merge(
        ev.filter(F.col("event_id") % 2 == 1).withColumn("band", band),
        allow_schema_evolution=True,
    )
    store.merge(
        ev.filter(F.col("event_id") % 10 == 3).select(
            "user_id", "event_type", "event_id", "ts", band
        ),
        allow_schema_evolution=True,
    )
    return store


def _q161_read(spark: SparkSession, sf: str, store) -> DataFrame:
    n_v0 = len(store._read_manifest(0)["columns"])
    n_final = len(
        store._read_manifest(store.current_version())["columns"]
    )
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
            F.count("value").cast("bigint").alias("n_valued"),
            F.count("band").cast("bigint").alias("n_banded"),
        )
        .withColumn("n_cols_v0", F.lit(n_v0).cast("bigint"))
        .withColumn("n_cols_final", F.lit(n_final).cast("bigint"))
        .orderBy("event_type")
    )


register_phases("q161_merge_schema_evolution", _q161_build, _q161_read)


@register(
    "q162_store_zorder_optimize",
    oracle="""
    WITH collapsed AS (
      SELECT * FROM (
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               l_quantity, l_extendedprice, l_returnflag,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey, l_linenumber
                 ORDER BY l_extendedprice DESC, l_quantity DESC,
                          l_partkey DESC, l_suppkey DESC,
                          l_returnflag DESC) AS rn
        FROM lineitem)
      WHERE rn = 1
    ),
    b AS (
      SELECT CAST(FLOOR(MAX(l_partkey) * 0.2) AS BIGINT) AS lo_p,
             CAST(FLOOR(MAX(l_partkey) * 0.4) AS BIGINT) AS hi_p,
             CAST(FLOOR(MAX(l_suppkey) * 0.2) AS BIGINT) AS lo_s,
             CAST(FLOOR(MAX(l_suppkey) * 0.4) AS BIGINT) AS hi_s
      FROM collapsed
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM collapsed, b
    WHERE l_partkey BETWEEN b.lo_p AND b.hi_p
      AND l_suppkey BETWEEN b.lo_s AND b.hi_s
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="OPTIMIZE ... ZORDER BY inside the mutable store, hash-checked "
    "(VERDICT r7 #5): lineitem merges into a (l_orderkey, l_linenumber)"
    "-keyed store, compact(cluster_by=[l_partkey, l_suppkey]) rewrites "
    "every bucket along the Morton curve (q136's layout machine, now "
    "under the snapshot/CDC contract) splitting each bucket into "
    "tight-boxed files whose per-file min/max the manifest records, "
    "and the query is a 2-D box read (data-derived 20-40% key ranges) "
    "served through the store's file-level pruning — only files whose "
    "box intersects the predicate are opened (the literal files-opened "
    "drop, CDC-silence, and time-travel-across-OPTIMIZE laws are "
    "asserted in tests/test_merge_store.py). Scale: the clustered "
    "rewrite is ONE quantile pass + ONE range-shuffled write job for "
    "the whole table — never a per-bucket job loop — and a 100 TB "
    "store's 2-D scoped scans then skip inside every bucket, which "
    "dir-level stats cannot express. sources/merge_store.py compact "
    "cluster_by.",
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    return _q162_read(spark, sf, _q162_build(spark, sf))


def _q162_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
    )
    root = _scratch_root("q162", sf)
    # the fixture's lineitem is NOT PK-unique on (orderkey, linenumber):
    # the store LWW-collapses on merge, so version_cols must impose a
    # deterministic total order per PK (they cover every non-key column
    # kept — tied rows are value-identical) and the oracle replays the
    # same collapse
    store = ParquetMergeStore(
        root,
        keys=("l_orderkey", "l_linenumber"),
        version_cols=(
            "l_extendedprice",
            "l_quantity",
            "l_partkey",
            "l_suppkey",
            "l_returnflag",
        ),
        num_buckets=4,
    )
    store.merge(li)
    store.compact(
        spark, cluster_by=["l_partkey", "l_suppkey"], files_per_bucket=4
    )
    return store


def _q162_read(spark: SparkSession, sf: str, store) -> DataFrame:
    b = (
        store.read(spark)
        .agg(
            F.floor(F.max("l_partkey") * 0.2).alias("lo_p"),
            F.floor(F.max("l_partkey") * 0.4).alias("hi_p"),
            F.floor(F.max("l_suppkey") * 0.2).alias("lo_s"),
            F.floor(F.max("l_suppkey") * 0.4).alias("hi_s"),
        )
        .collect()[0]
    )
    box = {
        "l_partkey": (int(b["lo_p"]), int(b["hi_p"])),
        "l_suppkey": (int(b["lo_s"]), int(b["hi_s"])),
    }
    snap = store.read(spark, where=box)
    return (
        snap.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("price_cents"),
            F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
            F.countDistinct("l_suppkey").cast("bigint").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


register_phases("q162_store_zorder_optimize", _q162_build, _q162_read)


@register(
    "q163_multicol_partition_scoped_read",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    collapsed AS (
      SELECT * FROM (
        SELECT wk, user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY wk, event_type, user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev)
      WHERE rn = 1
    ),
    wks AS (SELECT DISTINCT wk FROM ev),
    combos AS (SELECT DISTINCT wk, event_type FROM ev),
    b AS (
      SELECT (SELECT wk FROM wks ORDER BY wk OFFSET 1 LIMIT 1) AS lo,
             (SELECT wk FROM wks ORDER BY wk OFFSET 2 LIMIT 1) AS hi,
             (SELECT MIN(event_type) FROM ev) AS et
    )
    SELECT CAST(c.user_id % 10 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(c.event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(c.value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM combos, b
             WHERE wk BETWEEN b.lo AND b.hi AND event_type = b.et)
             AS n_partitions_read,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM combos)
             AS n_partitions_total
    FROM collapsed c, b
    WHERE c.wk BETWEEN b.lo AND b.hi AND c.event_type = b.et
    GROUP BY 1 ORDER BY 1
    """,
    doc="MULTI-COLUMN partitioning with a scoped read pruning on BOTH "
    "columns, hash-checked (VERDICT r7 #6): events merge into a "
    "PartitionedParquetMergeStore partitioned by (week, event_type) — "
    "each composite value owns a child store under p=<wk>|<type>/ — "
    "and the query reads weeks 2-3 x ONE event type (data-derived "
    "bounds) via dict-shaped partitions={wk: (lo, hi), event_type: "
    "(t, t)}: manifest-level selection drops every child whose week OR "
    "type misses, before any file under them is listed. The hash pins "
    "the scoped snapshot (per-user-bucket aggregate of the per-"
    "(wk, type, user) LWW collapse) plus n_partitions_read/total. "
    "Retention on the real key shape is drop_partition((wk, type)) — "
    "one manifest write (tests cover drop/CDC/epoch resurrection for "
    "composite values). Scale: (date, source) is the canonical 100 TB "
    "retention key; a day x source scoped read opens one child "
    "directory, and per-source drops never touch neighboring sources' "
    "files. sources/partitioned_store.py composite partition keys.",
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    return _q163_read(spark, sf, _q163_build(spark, sf))


def _q163_build(spark: SparkSession, sf: str):
    """Build phase: the (week, event_type)-partitioned store."""
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
    root = _scratch_root("q163", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "event_type", "user_id"),
        partition_col=("wk", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev)
    return store


def _q163_read(spark: SparkSession, sf: str, store) -> DataFrame:
    """Read phase: manifest-pruned (week-range x one type) scoped read."""
    parts = store._parts()
    wks = sorted({p.split("|")[0] for p in parts})
    types = sorted({p.split("|")[1] for p in parts})
    scope = {
        "wk": (wks[1], wks[2]),  # weeks 2-3: proper subset, data-derived
        "event_type": (types[0], types[0]),
    }
    n_read = len(store._select(parts, scope))
    snap = store.read(spark, partitions=scope)
    return (
        snap.groupBy(
            (F.col("user_id") % 10).cast("bigint").alias("user_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .withColumn("n_partitions_read", F.lit(int(n_read)).cast("bigint"))
        .withColumn(
            "n_partitions_total", F.lit(len(parts)).cast("bigint")
        )
        .orderBy("user_bucket")
    )


register_phases(
    "q163_multicol_partition_scoped_read", _q163_build, _q163_read
)


@register(
    "q164_partitioned_point_lookup",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    collapsed AS (
      SELECT * FROM (
        SELECT wk, user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY wk, event_type, user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev)
      WHERE rn = 1
    ),
    u AS (SELECT MIN(user_id) AS uid FROM ev)
    SELECT CAST(wk AS VARCHAR) AS wk,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM collapsed, u
    WHERE user_id = u.uid
    GROUP BY wk ORDER BY wk
    """,
    doc="Point lookup through the partitioned store's two-level "
    "pruning, hash-checked (the VERDICT r7 #2 scoped-read variant "
    "with a VALUE predicate rather than a partition range): events "
    "merge into the week-partitioned store with bloom_cols=(user_id,) "
    "and the query is read(where={user_id: (u, u)}) for one "
    "data-derived user — the global manifest's rolled-up per-column "
    "[min, max] gets first refusal on every child, each surviving "
    "child's per-bucket min/max + BLOOM pruning skips the buckets the "
    "user's PK-hash rows can't be in (point lookups consult the "
    "bloom; a hash-scattered column's min/max never prunes), and the "
    "residual filter makes the result exact — the per-week activity "
    "aggregate hashed here. files_read() measures the same composed "
    "pruning (test-asserted at both levels). Scale: this is the "
    "needle-in-100TB shape — a single entity's history read touches "
    "the blooms' few candidate files across 400 date partitions, "
    "never the table. sources/partitioned_store.py read(where=), "
    "merge_store.py _pruned_files.",
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    return _q164_read(spark, sf, _q164_build(spark, sf))


def _q164_build(spark: SparkSession, sf: str):
    """Build phase: the week-partitioned store with user_id blooms."""
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
    root = _scratch_root("q164", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "event_type", "user_id"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
        bloom_cols=("user_id",),
    )
    store.merge(ev)
    return store


def _q164_read(spark: SparkSession, sf: str, store) -> DataFrame:
    """Read phase: the bloom-assisted point lookup."""
    uid = int(
        store.read(spark).agg(F.min("user_id")).collect()[0][0]
    )
    snap = store.read(spark, where={"user_id": (uid, uid)})
    return (
        snap.groupBy(F.col("wk").cast("string").alias("wk"))
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("wk")
    )


register_phases("q164_partitioned_point_lookup", _q164_build, _q164_read)


@register(
    "q165_deletion_vectors",
    oracle="""
    WITH collapsed AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    ),
    final AS (
      SELECT * FROM collapsed
      WHERE value >= 25.0 OR user_id % 5 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM final) AS n_rows_meta
    FROM final GROUP BY event_type ORDER BY event_type
    """,
    doc="DELETION VECTORS — soft deletes without bucket rewrites "
    "(Delta DV, round-8 charter extension), hash-checked end-to-end: "
    "events LWW-merge into the store, DELETE WHERE value < 25 runs "
    "with deletion_vectors=True — the commit re-references every data "
    "dir unchanged and writes only the matching PKs as per-bucket "
    "vectors under dv/v{N} (tests assert the data dirs are "
    "byte-identical) — then a merge of the user_id%5=0 slice REVIVES "
    "those users' deleted PKs and materializes its buckets' vectors "
    "(reads pass through the DV, so deleted rows can't resurrect as "
    "stored rows). The hashed aggregate covers the surviving state "
    "AND n_rows_meta = count_rows(), pinning the footer-minus-DV "
    "count arithmetic. CDC parity, compaction materialization, "
    "restore-with-vectors, and vacuum liveness are test-asserted. "
    "Scale: deleting 100 GDPR rows from a 100 TB table costs 100 PKs "
    "of metadata instead of rewriting multi-GB buckets; the anti-join "
    "readers pay is broadcast-sized until the next natural rewrite "
    "absorbs the vectors. sources/merge_store.py delete "
    "deletion_vectors, tests/test_merge_store.py test_dv_*.",
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    return _q165_read(spark, sf, _q165_build(spark, sf))


def _q165_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q165", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev)
    store.delete(spark, "value < 25.0", deletion_vectors=True)
    # revive the %5 users (merge reads THROUGH the vectors, so other
    # deleted PKs in the touched buckets stay deleted while these
    # re-insert) and materialize the touched buckets' vectors
    store.merge(ev.filter(F.col("user_id") % 5 == 0))
    return store


def _q165_read(spark: SparkSession, sf: str, store) -> DataFrame:
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .withColumn(
            "n_rows_meta", F.lit(int(store.count_rows())).cast("bigint")
        )
        .orderBy("event_type")
    )


register_phases("q165_deletion_vectors", _q165_build, _q165_read)


@register(
    "q168_partitioned_time_travel",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    head_ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    ),
    asof_ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev WHERE event_id % 2 = 0
    )
    SELECT 'asof' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM asof_ranked WHERE rn = 1 GROUP BY event_type
    UNION ALL
    SELECT 'head' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM head_ranked WHERE rn = 1 GROUP BY event_type
    ORDER BY snapshot, event_type
    """,
    doc="Table-level timestampAsOf on the partitioned store, "
    "hash-checked (Delta time travel one level above the children): "
    "commit 1 merges the even-event_id half, a wall-clock instant is "
    "captured, commit 2 merges the rest (upserting colliding PKs by "
    "(ts, event_id) LWW); read(timestamp=t_between) must resolve to "
    "the commit-1 snapshot via the global manifests' committed_at — "
    "no child is opened to decide — while the head read sees the "
    "upserted union. Both snapshots' per-event_type aggregates hash "
    "against LWW oracles over the even subset and the full table. "
    "sources/partitioned_store.py version_at/read(timestamp).",
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    return _q168_read(spark, sf, _q168_build(spark, sf))


def _q168_build(spark: SparkSession, sf: str):
    """Build phase: two timed commits with the instant captured between."""
    import time

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
    root = _scratch_root("q168", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))
    time.sleep(0.05)  # clock resolution fence around the captured instant
    t_between = time.time()
    time.sleep(0.05)
    # conditional: an odd row only overwrites a colliding even PK when
    # NEWER by (ts, event_id) — so head ≡ LWW over the full table, the
    # oracle's head_ranked definition
    store.merge(ev.filter(F.col("event_id") % 2 != 0), conditional=True)
    return store, t_between


def _q168_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the as-of read next to the head read."""
    store, t_between = state

    def _agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_keys"),
                F.sum("event_id").cast("bigint").alias("sum_event_id"),
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("value_cents"),
            )
            .select(
                F.lit(tag).alias("snapshot"),
                "event_type",
                "n_keys",
                "sum_event_id",
                "value_cents",
            )
        )

    asof = _agg(store.read(spark, timestamp=t_between), "asof")
    head = _agg(store.read(spark), "head")
    return asof.unionByName(head).orderBy("snapshot", "event_type")


register_phases("q168_partitioned_time_travel", _q168_build, _q168_read)


def _event_type_agg(df: DataFrame, tag: str) -> DataFrame:
    """Shared per-event_type aggregate for the store-snapshot queries:
    one stable fingerprint (key count, id sum, cents sum) per snapshot
    side, hashable against a DuckDB oracle."""
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            F.lit(tag).alias("snapshot"),
            "event_type",
            "n_keys",
            "sum_event_id",
            "value_cents",
        )
    )


def _week_events(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select(
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


@register(
    "q169_partitioned_restore",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    even_ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev WHERE event_id % 2 = 0
    ),
    full_ranked AS (
      SELECT wk, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT 'head_restored' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM even_ranked WHERE rn = 1 GROUP BY event_type
    UNION ALL
    SELECT 'pre_restore' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM full_ranked
    WHERE rn = 1
      AND wk <> (SELECT MIN(CAST(wk AS VARCHAR)) FROM ev)
    GROUP BY event_type
    ORDER BY snapshot, event_type
    """,
    doc="Table-level RESTORE on the partitioned store, hash-checked "
    "(Delta RESTORE one level above the children): commit 1 merges "
    "the even-event_id half, commit 2 upserts the rest (LWW by "
    "(ts, event_id)), commit 3 drops the oldest week partition, then "
    "restore(0) re-pins the v0 manifest as commit 4 — metadata-only, "
    "undoing the upserts AND resurrecting the dropped partition in "
    "one pointer swap. The head must hash against the even-half LWW "
    "oracle; the pre-restore snapshot (time travel to v2) against "
    "full LWW minus the dropped week. "
    "sources/partitioned_store.py restore().",
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    return _q169_read(spark, sf, _q169_build(spark, sf))


def _q169_build(spark: SparkSession, sf: str):
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    ev = _week_events(spark, sf)
    store = PartitionedParquetMergeStore(
        _scratch_root("q169", sf),
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))  # v0
    store.merge(ev.filter(F.col("event_id") % 2 != 0), conditional=True)
    store.drop_partition(min(store.partitions()))  # v2
    restored = store.restore(0)  # v3: one manifest write
    assert restored == 3 and store.describe_history()[-1][
        "operation"
    ] == "restore"
    return store


def _q169_read(spark: SparkSession, sf: str, store) -> DataFrame:
    head = _event_type_agg(store.read(spark), "head_restored")
    pre = _event_type_agg(store.read(spark, version=2), "pre_restore")
    return head.unionByName(pre).orderBy("snapshot", "event_type")


register_phases("q169_partitioned_restore", _q169_build, _q169_read)


@register(
    "q170_partitioned_clone",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    ranked AS (
      SELECT wk, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT 'clone' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked
    WHERE rn = 1 AND value >= 30.0
      AND wk <> (SELECT MIN(CAST(wk AS VARCHAR)) FROM ev)
    GROUP BY event_type
    UNION ALL
    SELECT 'source' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1 GROUP BY event_type
    ORDER BY snapshot, event_type
    """,
    doc="Table-level SHALLOW CLONE on the partitioned store, "
    "hash-checked: the clone (zero-copy, child stores cloned at their "
    "global pins) is mutated destructively — the oldest week dropped, "
    "low values deleted — while the source must still hash against "
    "the untouched full-LWW oracle (copy-on-write isolation; the "
    "dev-branch-at-100 TB workflow). "
    "sources/partitioned_store.py shallow_clone().",
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    return _q170_read(spark, sf, _q170_build(spark, sf))


def _q170_build(spark: SparkSession, sf: str):
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    ev = _week_events(spark, sf)
    root = _scratch_root("q170", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev)  # v0: full LWW state
    # _scratch_root cleans ROOT on rerun but the clone is a SIBLING dir;
    # clear it too or a second build in the same process hits
    # shallow_clone's "target not empty" guard (re-entrancy: bench and
    # the registry invariants both build twice per process)
    if os.path.exists(root + "_clone"):
        shutil.rmtree(root + "_clone")
    clone = store.shallow_clone(root + "_clone")
    clone.drop_partition(min(clone.partitions()))
    clone.delete_where(spark, "value < 30.0")
    return store, clone


def _q170_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, clone = state
    src = _event_type_agg(store.read(spark), "source")
    cl = _event_type_agg(clone.read(spark), "clone")
    return cl.unionByName(src).orderBy("snapshot", "event_type")


register_phases("q170_partitioned_clone", _q170_build, _q170_read)


@register(
    "q171_partitioned_schema_evolution",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    wm AS (SELECT MAX(wk) AS wmax FROM ev),
    even_w AS (
      SELECT wk, user_id, event_type, event_id, value,
             CAST(NULL AS VARCHAR) AS band, 1 AS prio
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev WHERE event_id % 2 = 0)
      WHERE rn = 1
    ),
    odd_w AS (
      SELECT wk, user_id, event_type, event_id, value,
             'b' || CAST(event_id % 3 AS VARCHAR) AS band, 2 AS prio
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev
        WHERE event_id % 2 = 1 AND wk = (SELECT wmax FROM wm))
      WHERE rn = 1
    ),
    final AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                     ORDER BY prio DESC) AS rn2
        FROM (SELECT * FROM even_w UNION ALL SELECT * FROM odd_w))
      WHERE rn2 = 1
    )
    SELECT 'full' AS snapshot, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(COUNT(band) AS BIGINT) AS n_banded,
           CAST(6 AS BIGINT) AS n_cols_g0,
           CAST(7 AS BIGINT) AS n_cols_head
    FROM final GROUP BY event_type
    UNION ALL
    SELECT 'pre_evolution_weeks', event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(event_id) AS BIGINT),
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT),
           CAST(COUNT(band) AS BIGINT),
           CAST(6 AS BIGINT), CAST(7 AS BIGINT)
    FROM final WHERE wk <> (SELECT wmax FROM wm) GROUP BY event_type
    ORDER BY snapshot, event_type
    """,
    doc="TABLE-level schema evolution on the partitioned store "
    "(VERDICT r8 #3 / next-round #2): the even event_ids seed every "
    "week's child with the 6-column schema; a widening batch (odd "
    "event_ids, new band column) merges with allow_schema_evolution="
    "True into ONLY the newest week — untouched children keep their "
    "narrow physical schema. The whole-table read must align every "
    "child to the global manifest's evolved column set with TYPED "
    "null backfill (partitioned_store._aligned_union — previously a "
    "plain unionByName raised AnalysisException: a successful write "
    "that left the table unreadable), and a read pruned to the "
    "pre-evolution weeks — where NO selected child carries the new "
    "column — backfills its type from the manifest record. Both "
    "snapshots plus the g0/head manifest column counts are "
    "hash-checked. Scale: the evolution costs the batch's one "
    "partition; every other child is untouched metadata. "
    "sources/partitioned_store.py merge/_aligned_union/_columns_at.",
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    return _q171_read(spark, sf, _q171_build(spark, sf))


def _q171_build(spark: SparkSession, sf: str):
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    ev = _week_events(spark, sf)
    root = _scratch_root("q171", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))  # g0: 6 cols
    wmax = max(
        r[0] for r in ev.select(F.max("wk")).collect()
    )
    band = F.concat(
        F.lit("b"), (F.col("event_id") % 3).cast("string")
    ).alias("band")
    store.merge(
        ev.filter(
            (F.col("event_id") % 2 == 1) & (F.col("wk") == wmax)
        ).withColumn("band", band),
        allow_schema_evolution=True,
    )  # g1: 7 cols, ONE touched partition
    return store, wmax


def _q171_agg(df: DataFrame, tag: str) -> DataFrame:
    return (
        df.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
            F.count("band").cast("bigint").alias("n_banded"),
        )
        .withColumn("snapshot", F.lit(tag))
    )


def _q171_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, wmax = state
    n_g0 = len(store._columns_at(0))
    n_head = len(store._columns_at(store.current_version()))
    pre_weeks = [p for p in store.partitions() if p != wmax]
    full = _q171_agg(store.read(spark), "full")
    pre = _q171_agg(
        store.read(spark, partitions=(min(pre_weeks), max(pre_weeks))),
        "pre_evolution_weeks",
    )
    return (
        full.unionByName(pre)
        .withColumn("n_cols_g0", F.lit(n_g0).cast("bigint"))
        .withColumn("n_cols_head", F.lit(n_head).cast("bigint"))
        .select(
            "snapshot", "event_type", "n_keys", "sum_event_id",
            "value_cents", "n_banded", "n_cols_g0", "n_cols_head",
        )
        .orderBy("snapshot", "event_type")
    )


register_phases(
    "q171_partitioned_schema_evolution", _q171_build, _q171_read
)


@register(
    "q172_pk_probe_point_read",
    oracle="""
    WITH lww AS (
      SELECT * FROM (
        SELECT user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
    ),
    probe AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE user_id % 3 = 0
    ),
    surviving AS (
      SELECT l.* FROM lww l
      JOIN probe p
        ON l.user_id = p.user_id AND l.event_type = p.event_type
      WHERE l.user_id % 5 <> 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM surviving GROUP BY event_type ORDER BY event_type
    """,
    doc="PK-probe point read through deletion vectors, hash-checked: "
    "the full events LWW state is merged into a (user_id, event_type)"
    "-keyed store, the user_id%%5 keys are DV-deleted (PK-sized "
    "metadata, no rewrite), and probe(keys_df) — the bucket-pruned "
    "point read that powers streaming-admission watermark lookups — "
    "fetches exactly the user_id%%3 keys' surviving rows: present "
    "keys return their LWW row, DV-deleted keys return nothing, "
    "absent keys are no-ops. Scale: the probe collects its keys' "
    "bucket ids (<= num_buckets ints) and opens ONLY those dirs — a "
    "batch probing a 100 TB store reads its buckets, never the "
    "table (plan evidence in tests/test_dedup_stream.py "
    "test_admission_probe_reads_only_batch_buckets). "
    "sources/merge_store.py probe.",
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    return _q172_read(spark, sf, _q172_build(spark, sf))


def _q172_build(spark: SparkSession, sf: str) -> ParquetMergeStore:
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q172", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev)
    store.delete_keys(
        ev.filter(F.col("user_id") % 5 == 0)
        .select("user_id", "event_type")
        .distinct(),
        deletion_vectors=True,
    )
    return store


def _q172_read(spark: SparkSession, sf: str, store) -> DataFrame:
    probe_keys = (
        load(spark, sf, "events")
        .filter(F.col("user_id") % 3 == 0)
        .select("user_id", "event_type")
        .distinct()
    )
    return (
        store.probe(spark, probe_keys)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q172_pk_probe_point_read", _q172_build, _q172_read)


@register(
    "q174_partitioned_pk_probe",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    lww AS (
      SELECT * FROM (
        SELECT wk, user_id, event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY wk, user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev)
      WHERE rn = 1
    ),
    probe AS (
      SELECT DISTINCT wk, user_id, event_type FROM ev WHERE user_id % 3 = 0
    ),
    surviving AS (
      SELECT l.* FROM lww l
      JOIN probe p ON l.wk = p.wk AND l.user_id = p.user_id
                  AND l.event_type = p.event_type
      WHERE l.value >= 20.0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT wk) AS BIGINT) AS n_weeks,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM surviving GROUP BY event_type ORDER BY event_type
    """,
    doc="TABLE-level PK-probe point read, hash-checked through a "
    "DV-delete: the week-partitioned events store (partition col wk "
    "is a PK column, so every probe key names its partition exactly) "
    "DV-deletes value<20 rows, then probe(keys_df) fetches the "
    "user_id%%3 keys' surviving LWW rows — partition-pruned to the "
    "keys' weeks, bucket-pruned inside each child, DV-deleted keys "
    "absent. The composition a 100 TB lookup actually takes: a "
    "thousand-key batch opens its partitions' buckets, never a table "
    "listing. sources/partitioned_store.py probe.",
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    return _q174_read(spark, sf, _q174_build(spark, sf))


def _q174_build(spark: SparkSession, sf: str):
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    ev = _week_events(spark, sf)
    root = _scratch_root("q174", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev)
    store.delete_where(spark, "value < 20.0", deletion_vectors=True)
    return store


def _q174_read(spark: SparkSession, sf: str, store) -> DataFrame:
    probe_keys = (
        _week_events(spark, sf)
        .filter(F.col("user_id") % 3 == 0)
        .select("wk", "user_id", "event_type")
        .distinct()
    )
    return (
        store.probe(spark, probe_keys)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("wk").cast("bigint").alias("n_weeks"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q174_partitioned_pk_probe", _q174_build, _q174_read)


@register(
    "q177_time_retention",
    oracle="""
    WITH lww_full AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    retained AS (
      SELECT event_type, event_id, value
      FROM lww_full WHERE rn = 1
    ),
    boost_ranked AS (
      SELECT user_id, event_type, event_id, value * 2 AS value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_id % 4 = 0
    ),
    boost AS (
      SELECT user_id, event_type, event_id, value
      FROM boost_ranked WHERE rn = 1
    ),
    head AS (
      SELECT r.event_type,
             COALESCE(b.event_id, r.event_id) AS event_id,
             COALESCE(b.value, r.value) AS value
      FROM (SELECT user_id, event_type, event_id, value
            FROM lww_full WHERE rn = 1) r
      LEFT JOIN boost b USING (user_id, event_type)
    ),
    aggs AS (
      SELECT 'head' AS snapshot, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM head GROUP BY event_type
      UNION ALL
      SELECT 'retained', event_type,
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(event_id) AS BIGINT),
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
      FROM retained GROUP BY event_type
      UNION ALL
      SELECT 'expired', '-', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
    )
    SELECT * FROM aggs ORDER BY snapshot, event_type
    """,
    doc="Time-based snapshot retention, hash-checked end-to-end "
    "(VERDICT r9 #6 — Iceberg expireSnapshots(olderThan)/Delta "
    "retention): v0 merges the even-event_id half, a wall-clock "
    "cutoff is captured, v1 conditionally merges the rest (head "
    "becomes full-table LWW), v2 replace-merges the event_id%4==0 "
    "PKs with doubled values. vacuum(keep_last=1, older_than=cutoff) "
    "must expire exactly v0 (committed before the cutoff, outside "
    "keep_last) while retaining v1 (after the cutoff) and the head: "
    "the checked rows are the head and retained-v1 aggregates (time "
    "travel to every retained version intact) plus an 'expired' row "
    "counting versions whose read now raises the descriptive "
    "vacuumed error up front — the count (exactly 1) and both "
    "snapshots' contents ride the hash. sources/merge_store.py "
    "vacuum(older_than)/read guard.",
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    return _q177_read(spark, sf, _q177_build(spark, sf))


def _q177_build(spark: SparkSession, sf: str):
    import time

    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q177", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    store.merge(ev.filter(F.col("event_id") % 2 == 0))          # v0
    time.sleep(0.05)
    cutoff = time.time()
    time.sleep(0.05)
    store.merge(ev.filter(F.col("event_id") % 2 != 0), conditional=True)  # v1
    store.merge(                                                 # v2
        ev.filter(F.col("event_id") % 4 == 0).withColumn(
            "value", F.col("value") * 2
        )
    )
    store.vacuum(keep_last=1, older_than=cutoff)
    return store


def _q177_read(spark: SparkSession, sf: str, store) -> DataFrame:
    def _agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_keys"),
                F.sum("event_id").cast("bigint").alias("sum_event_id"),
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("value_cents"),
            )
            .select(
                F.lit(tag).alias("snapshot"),
                "event_type",
                "n_keys",
                "sum_event_id",
                "value_cents",
            )
        )

    expired = 0
    for vv in range(3):
        try:
            store.read(spark, version=vv)
        except ValueError:
            expired += 1
    expired_row = spark.createDataFrame(
        [("expired", "-", expired, 0, 0)],
        "snapshot string, event_type string, n_keys bigint, "
        "sum_event_id bigint, value_cents bigint",
    )
    head = _agg(store.read(spark), "head")
    retained = _agg(store.read(spark, version=1), "retained")
    return (
        head.unionByName(retained)
        .unionByName(expired_row)
        .orderBy("snapshot", "event_type")
    )


register_phases("q177_time_retention", _q177_build, _q177_read)


# ---------------------------------------------------------------------------
# q181 — merge-on-read store: delta-log overlay resolved at read time
# ---------------------------------------------------------------------------


@register(
    "q181_merge_on_read",
    oracle="""
    WITH unioned AS (
      -- batch 0 (base COW merge): even event_ids, all upserts
      SELECT user_id, event_type, event_id, ts, value,
             0 AS prio, 'u' AS op
      FROM events WHERE event_id % 2 = 0
      UNION ALL
      -- delta seq0: odd event_ids, all upserts
      SELECT user_id, event_type, event_id, ts, value, 1, 'u'
      FROM events WHERE event_id % 2 <> 0
      UNION ALL
      -- delta seq1: retractions and triple-value upserts (disjoint
      -- row sets — an overlapping row would tie on (ts, event_id)
      -- with two different ops, a nondeterministic winner)
      SELECT user_id, event_type, event_id, ts, NULL, 2, 'd'
      FROM events WHERE user_id % 7 = 0 AND event_id % 10 <> 3
      UNION ALL
      SELECT user_id, event_type, event_id, ts, value * 3, 2, 'u'
      FROM events WHERE event_id % 10 = 3
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY prio DESC, ts DESC, event_id DESC) AS rn
      FROM unioned
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1 AND op = 'u'
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Merge-on-read (Hudi MOR / Iceberg v2 shape): a COW base merge "
    "(even event_ids), then two O(batch) delta-log appends — the odd "
    "rows as upserts, then a batch mixing retractions (user_id%7=0) "
    "with triple-value updates (event_id%10=3) — resolved last-write-"
    "wins AT READ TIME: newest delta action per PK wins over base and "
    "older deltas, within a batch the (ts, event_id) LWW collapse "
    "applies, a winning 'd' removes the key. No bucket is read or "
    "rewritten on the delta path — per-batch maintenance cost is "
    "O(batch) at ANY base size (the copy-on-write applier's cost grows "
    "with bucket size; BASELINE 'MOR vs COW' measures the gap). The "
    "oracle reproduces the resolution as ROW_NUMBER over (batch "
    "priority DESC, ts DESC, event_id DESC) per key, keeping 'u' "
    "winners.",
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    return _q181_read(spark, sf, _q181_build(spark, sf))


def _q181_build(spark: SparkSession, sf: str):
    from parquet_demo_spark.sources.mor_store import MergeOnReadStore

    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    st = MergeOnReadStore(
        _scratch_root("q181", sf),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    st.merge(ev.filter(F.col("event_id") % 2 == 0))          # COW base
    st.commit_delta(ev.filter(F.col("event_id") % 2 != 0))   # delta seq0
    d = (
        ev.filter(
            (F.col("user_id") % 7 == 0) & (F.col("event_id") % 10 != 3)
        )
        .withColumn("value", F.lit(None).cast("double"))
        .withColumn("op", F.lit("d"))
        .unionByName(
            ev.filter(F.col("event_id") % 10 == 3)
            .withColumn("value", F.col("value") * 3)
            .withColumn("op", F.lit("u"))
        )
    )
    st.commit_delta(d, op_col="op")                          # delta seq1
    return st


def _q181_read(spark: SparkSession, sf: str, st) -> DataFrame:
    return (
        st.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q181_merge_on_read", _q181_build, _q181_read)


# ---------------------------------------------------------------------------
# q185 — size-driven bucket provisioning round trip (store.maintain)
# ---------------------------------------------------------------------------


@register(
    "q185_store_maintain",
    oracle="""
    WITH lww AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT 'rebucketed' AS action, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM lww WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Size-driven bucket provisioning, hash-checked end-to-end "
    "(round-11 store.maintain — the policy that drives rebucket once "
    "any bucket exceeds a byte target, keeping buckets ~ table/target "
    "so bounded-key maintenance batches rewrite bounded bytes at any "
    "table size; BASELINE 'Size-driven bucket provisioning' measures "
    "the per-batch flatness at 1x/10x/100x): the events LWW snapshot "
    "merges into a deliberately undersized 2-bucket store, "
    "maintain(target=2 KiB, max_buckets=64) must FIRE (the read "
    "raises if the policy never grew the store — a red driver row, "
    "not a silent no-op), a conditional replay batch then writes "
    "THROUGH the new bucket routing, and the checked rows are the "
    "per-event_type content aggregates — proving the policy's rewrite "
    "is snapshot-preserving and post-policy writes route correctly. "
    "Repeated reads converge (the policy is idempotent once bucket "
    "sizes sit under target or at max_buckets). "
    "sources/merge_store.py maintain/bucket_bytes/rebucket.",
)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    return _q185_read(spark, sf, _q185_build(spark, sf))


def _q185_build(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q185", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=2,  # deliberately undersized: the policy must fire
    )
    store.merge(ev)
    return store, ev


def _q185_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, ev = state
    act = store.maintain(
        spark, target_bucket_bytes=2 << 10, max_buckets=64
    )
    if act["action"] != "rebucket" and store.num_buckets <= 2:
        raise AssertionError(
            f"maintain() never provisioned the store: {act}"
        )
    # a post-policy write must route by the NEW bucket count; the
    # replay slice is content-neutral (conditional: stale rows lose,
    # winning ties re-write identical values), so the oracle stays the
    # plain LWW aggregate
    store.merge(
        ev.filter(F.col("event_id") % 3 == 0), conditional=True
    )
    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            F.lit("rebucketed").alias("action"),
            "event_type",
            "n_keys",
            "sum_event_id",
            "value_cents",
        )
        .orderBy("event_type")
    )


register_phases("q185_store_maintain", _q185_build, _q185_read)


# ---------------------------------------------------------------------------
# q192 — write-audit-publish round trip (Iceberg WAP on the merge store)
# ---------------------------------------------------------------------------


@register(
    "q192_wap_roundtrip",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY (CASE WHEN event_id % 5 = 0 AND event_id % 7 <> 0
                              THEN 1 ELSE 0 END) DESC,
                        ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT 'published' AS action, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Write-audit-publish round trip (the Iceberg WAP pattern, "
    "public): the events LWW snapshot commits to production, then a "
    "candidate batch (event_id%5==0) stages on an AUDIT BRANCH — a "
    "zero-copy shallow clone under _branches/ — with a deliberate "
    "corruption (event_id%7==0 rows negated). The audit expectation "
    "('no negative values') FAILS, the branch is abandoned (production "
    "never saw the bad rows), the cleaned batch re-stages, the audit "
    "passes, and wap_publish FAST-FORWARDS the exact audited files "
    "into production history — metadata-only, no recompute, so "
    "nothing can drift between audit and publish. The read then "
    "internalizes the adopted buckets (compact min_files=1 + vacuum + "
    "wap_abandon) and aggregates the final snapshot, so the driver "
    "hash covers branch isolation, audit gating, fast-forward "
    "adoption, AND the internalize path. Guards raise (red driver "
    "row) if the bad audit ever passes or the good one fails. At "
    "100 TB this is how a pipeline lands a day's partition without "
    "exposing readers to unaudited data; every leg is O(changed "
    "buckets), never a table rewrite. sources/merge_store.py "
    "wap_branch/wap_publish/wap_abandon.",
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    return _q192_read(spark, sf, _q192_build(spark, sf))


def _q192_build(spark: SparkSession, sf: str):
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q192", sf)
    store = ParquetMergeStore(
        root,
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev)
    return store, ev


def _q192_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, ev = state
    candidate = ev.filter(F.col("event_id") % 5 == 0)
    corrupted = candidate.withColumn(
        "value",
        F.when(
            F.col("event_id") % 7 == 0, -F.col("value")
        ).otherwise(F.col("value")),
    )

    def _audit_bad(branch) -> int:
        # the expectation a WAP audit would run as a table check:
        # business rule 'value is never negative'
        return branch.read(spark).filter(F.col("value") < 0).count()

    bad_branch = store.wap_branch("audit")
    bad_branch.merge(corrupted)
    if _audit_bad(bad_branch) == 0:
        raise AssertionError("corrupted batch passed the audit")
    store.wap_abandon(bad_branch)

    good_branch = store.wap_branch("audit")
    good_branch.merge(candidate.filter(F.col("event_id") % 7 != 0))
    if _audit_bad(good_branch) != 0:
        raise AssertionError("clean batch failed the audit")
    store.wap_publish(good_branch)

    # internalize the adopted buckets so the branch dir can drop and
    # reruns in this process can reuse the branch name
    store.compact(spark, min_files=1)
    store.vacuum(keep_last=1)
    store.wap_abandon(good_branch, keep_last=1)  # same retention as vacuum

    return (
        store.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            F.lit("published").alias("action"),
            "event_type",
            "n_keys",
            "sum_event_id",
            "value_cents",
        )
        .orderBy("event_type")
    )


register_phases("q192_wap_roundtrip", _q192_build, _q192_read)


# ---------------------------------------------------------------------------
# q194 — table-level write-audit-publish (WAP across a partitioned table)
# ---------------------------------------------------------------------------


@register(
    "q194_table_wap_roundtrip",
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
               ORDER BY (CASE WHEN event_id % 5 = 0 AND event_id % 7 <> 0
                              THEN 1 ELSE 0 END) DESC,
                        ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT 'published' AS action, CAST(wk AS VARCHAR) AS wk, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1
    GROUP BY wk, event_type ORDER BY wk, event_type
    """,
    doc="TABLE-level write-audit-publish round trip (VERDICT r11 #3): "
    "the week-partitioned events store commits to production, a "
    "multi-week candidate batch (event_id%5==0) stages on a TABLE "
    "audit branch — a global shallow clone under _branches/ whose "
    "touched CHILDREN copy on write — with a deliberate corruption "
    "(event_id%7==0 rows negated). The audit fails, the branch is "
    "abandoned (production and every untouched partition never saw "
    "the bad rows), the cleaned batch re-stages, the audit passes, "
    "and wap_publish adopts the audited snapshot ATOMICALLY across "
    "all touched weeks: each touched branch child is renamed into a "
    "fresh production epoch dir (one syscall per partition, no data "
    "moved) and ONE global commit re-pins them alongside the "
    "untouched weeks' unchanged entries — readers see all weeks' "
    "audited data or none of it, where per-week single-store WAP "
    "would expose a torn intermediate table. Guards raise (red "
    "driver row) if the bad audit passes, the clean one fails, or "
    "the publish leaves any _branches indirection in the head "
    "manifest. At 100 TB this is how a backfill lands hundreds of "
    "date partitions behind one audit gate. "
    "sources/partitioned_store.py wap_branch/wap_publish/wap_abandon.",
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    return _q194_read(spark, sf, _q194_build(spark, sf))


def _q194_build(spark: SparkSession, sf: str):
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
    root = _scratch_root("q194", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
    )
    store.merge(ev)
    return store, ev


def _q194_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, ev = state
    candidate = ev.filter(F.col("event_id") % 5 == 0)
    corrupted = candidate.withColumn(
        "value",
        F.when(
            F.col("event_id") % 7 == 0, -F.col("value")
        ).otherwise(F.col("value")),
    )

    def _audit_bad(branch) -> int:
        return branch.read(spark).filter(F.col("value") < 0).count()

    bad_branch = store.wap_branch("audit")
    bad_branch.merge(corrupted)
    if _audit_bad(bad_branch) == 0:
        raise AssertionError("corrupted batch passed the table audit")
    store.wap_abandon(bad_branch)

    good_branch = store.wap_branch("audit")  # name reusable post-abandon
    good_branch.merge(candidate.filter(F.col("event_id") % 7 != 0))
    if _audit_bad(good_branch) != 0:
        raise AssertionError("clean batch failed the table audit")
    v = store.wap_publish(good_branch)
    # the fast-forward must consume the branch and leave no _branches
    # indirection in the published manifest (the rename design)
    if any(
        "_branches" in e["dir"] for e in store._parts(v).values()
    ):
        raise AssertionError("published manifest references _branches")

    return (
        store.read(spark)
        .groupBy(
            F.col("wk").cast("string").alias("wk"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            F.lit("published").alias("action"),
            "wk",
            "event_type",
            "n_keys",
            "sum_event_id",
            "value_cents",
        )
        .orderBy("wk", "event_type")
    )


register_phases("q194_table_wap_roundtrip", _q194_build, _q194_read)


# ---------------------------------------------------------------------------
# q195 — scatter-write backfill on MOR children (partitioned merge-on-read)
# ---------------------------------------------------------------------------


@register(
    "q195_partitioned_mor_backfill",
    oracle="""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
             user_id, event_type, event_id, ts, value
      FROM events
    ),
    ranked AS (
      -- replace-chain priority: the %4 batch replaced the %3 batch
      -- which replaced the base, and WITHIN a batch only (ts,
      -- event_id) orders — a single priority key, never stacked
      -- membership keys (a row in both batches must not outrank a
      -- newer row of the final batch)
      SELECT wk, user_id, event_type, event_id, ts, value,
             ROW_NUMBER() OVER (
               PARTITION BY wk, user_id, event_type
               ORDER BY (CASE WHEN event_id % 4 = 0 THEN 2
                              WHEN event_id % 3 = 0 THEN 1
                              ELSE 0 END) DESC,
                        ts DESC, event_id DESC) AS rn
      FROM ev
    ),
    final AS (
      SELECT wk, user_id, event_type, event_id,
             CASE WHEN event_id % 4 = 0 THEN value + 2000.0
                  WHEN event_id % 3 = 0 THEN value + 1000.0
                  ELSE value END AS value
      FROM ranked WHERE rn = 1
    )
    SELECT CAST(wk AS VARCHAR) AS wk, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM final
    WHERE event_type <> 'error'
    GROUP BY wk, event_type ORDER BY wk, event_type
    """,
    doc="Scatter-write backfill into a week-partitioned table with "
    "MERGE-ON-READ children (VERDICT r11 #4): the bulk load commits "
    "and compacts into each child's base, then two correction batches "
    "(event_id%3: +1000, event_id%4: +2000 — the second replaces the "
    "first per PK, ReplaceOne chain semantics) land as O(batch) DELTA "
    "APPENDS across every week at once — no bucket read or rewrite at "
    "ANY child size, where copy-on-write children would pay bucket "
    "rewrites per touched child per batch (the write-amplification "
    "trade scripts/backfill_scale_check.py measures). DELETE WHERE "
    "event_type='error' tombstones matching PKs as 'd' deltas; table "
    "compact() folds every child's log into its base and re-pins the "
    "truncation entries; the final read resolves pure base. Global "
    "versions pin child LOG ENTRIES, so snapshot isolation and time "
    "travel hold through the delta lifecycle. The driver hash covers "
    "the append→tombstone→fold→read chain end-to-end. "
    "sources/partitioned_store.py child_store='mor'; "
    "sources/mor_store.py read(version=)/restore.",
)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    return _q195_read(spark, sf, _q195_build(spark, sf))


def _q195_build(spark: SparkSession, sf: str):
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
    root = _scratch_root("q195", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
        child_store="mor",
    )
    store.merge(ev)
    store.compact(spark)  # fold the bulk load into each child's base
    return store, ev


def _q195_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, ev = state
    # two scatter corrections spanning every week — O(batch) appends;
    # re-running the read replays them idempotently (same rows replace
    # the same PKs), so the bench's repeat-read protocol holds
    store.merge(
        ev.filter(F.col("event_id") % 3 == 0).withColumn(
            "value", F.col("value") + 1000.0
        )
    )
    store.merge(
        ev.filter(F.col("event_id") % 4 == 0).withColumn(
            "value", F.col("value") + 2000.0
        )
    )
    store.delete_where(spark, F.col("event_type") == "error")
    store.compact(spark)  # fold: reads below are pure base again
    return (
        store.read(spark)
        .groupBy(
            F.col("wk").cast("string").alias("wk"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("wk", "event_type")
    )


register_phases("q195_partitioned_mor_backfill", _q195_build, _q195_read)


# ---------------------------------------------------------------------------
# q199 — replication through a WAP gate (multi-commit synthesized feed)
# ---------------------------------------------------------------------------


@register(
    "q199_wap_feed_replication",
    oracle="""
    WITH non_click AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY (event_id % 2) DESC, ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type <> 'click'
    ),
    reinserted AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'click' AND event_id % 3 = 0
    ),
    final AS (
      SELECT * FROM non_click WHERE rn = 1
      UNION ALL
      SELECT * FROM reinserted WHERE rn = 1
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM final
    GROUP BY event_type ORDER BY event_type
    """,
    doc="CDC replication THROUGH a write-audit-publish gate (VERDICT "
    "r12 #3): the audit branch lands THREE feed-bearing commits — "
    "merge the odd batch (unconditional replace, odd beats even per "
    "PK), DELETE WHERE event_type='click' (every click key gone), "
    "then re-insert the clicks with event_id%3==0 — and wap_publish "
    "adopts the branch's per-commit feeds as ONE ordered ref list "
    "(metadata-only, no feed rewrite). change_feed(published) serves "
    "the rows tagged _commit_version in branch order, and "
    "replay_change_feed applies each source commit's upserts-then-"
    "deletes phases IN ORDER into an initially base-seeded replica — "
    "the delete-then-REINSERT of the same PKs is exactly the case a "
    "flat concatenated replay gets wrong (the reborn clicks would "
    "come back deleted). The returned aggregate reads the REPLICA, "
    "so the driver hash proves feed synthesis, ordering, and replay "
    "fidelity end-to-end; the oracle recomputes the final state from "
    "scratch. Scale: the publish adopts O(branch commits) refs — no "
    "data moves — and replication reads O(delta) feed files. "
    "sources/merge_store.py wap_publish/change_feed/"
    "replay_change_feed.",
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    return _q199_read(spark, sf, _q199_build(spark, sf))


def _q199_build(spark: SparkSession, sf: str):
    """Build phase: base commit + the audited 3-commit branch +
    metadata-only publish with the synthesized feed ref list."""
    ev = load(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    root = _scratch_root("q199", sf)
    src = ParquetMergeStore(
        os.path.join(root, "src"),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    src.merge(ev.filter(F.col("event_id") % 2 == 0))  # v0, the base
    branch = src.wap_branch("replicate")
    branch.merge(
        ev.filter(F.col("event_id") % 2 == 1), write_change_feed=True
    )
    branch.delete(spark, "event_type = 'click'", write_change_feed=True)
    branch.merge(
        ev.filter(
            (F.col("event_type") == "click")
            & (F.col("event_id") % 3 == 0)
        ),
        write_change_feed=True,
    )
    published = src.wap_publish(branch)  # v1: ordered feed-ref list
    return root, src, published


_Q199_REPLICA_N = [0]


def _q199_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: seed a FRESH replica with the base
    snapshot, replay ONLY the published version's synthesized feed,
    read the replica back."""
    from parquet_demo_spark.sources.merge_store import replay_change_feed

    root, src, published = state
    _Q199_REPLICA_N[0] += 1
    dst = ParquetMergeStore(
        os.path.join(root, f"dst{_Q199_REPLICA_N[0]}"),
        keys=("user_id", "event_type"),
        version_cols=("ts", "event_id"),
        num_buckets=8,
    )
    dst.merge(src.read(spark, version=0))
    replay_change_feed(src, dst, spark, v_from=published, v_to=published)
    return (
        dst.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .orderBy("event_type")
    )


register_phases("q199_wap_feed_replication", _q199_build, _q199_read)


# ---------------------------------------------------------------------------
# q201 — table-level WAP on merge-on-read children (round-14 VERDICT #2)
# ---------------------------------------------------------------------------


@register(
    "q201_mor_table_wap",
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
               ORDER BY (CASE WHEN event_id % 5 = 0 AND event_id % 7 <> 0
                              THEN 1 ELSE 0 END) DESC,
                        ts DESC, event_id DESC) AS rn
      FROM ev
    )
    SELECT 'published' AS action, CAST(wk AS VARCHAR) AS wk, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    GROUP BY wk, event_type ORDER BY wk, event_type
    """,
    doc="TABLE-level write-audit-publish on MERGE-ON-READ children "
    "(round-14 VERDICT #2): q194's audit-gate flow on the "
    "backfill-optimized table q195/q198 made first-class. The "
    "week-partitioned MOR store bulk-loads and compacts; a corrupted "
    "candidate batch stages on a TABLE audit branch — a global clone "
    "whose MOR children are base-shallow-clones + copied live deltas "
    "— fails the audit and is abandoned; the cleaned batch re-stages "
    "as O(batch) DELTA APPENDS in the branch children (no production "
    "bucket ever rewritten pre-publish), an error-row DELETE WHERE "
    "tombstones on the branch too, the audit passes, and wap_publish "
    "adopts everything atomically across all touched weeks. A "
    "post-publish table compact folds the published children's delta "
    "logs into their clone bases (the restore-fencing law applies: "
    "the fold builds on each entry's pinned base). At 100 TB this is "
    "how a scatter backfill lands hundreds of date partitions behind "
    "one audit gate WITHOUT paying copy-on-write amplification twice "
    "— once on the branch and once on publish. "
    "sources/partitioned_store.py wap_branch/wap_publish; "
    "sources/mor_store.py shallow_clone.",
)
def q201(spark: SparkSession, sf: str) -> DataFrame:
    return _q201_read(spark, sf, _q201_build(spark, sf))


def _q201_build(spark: SparkSession, sf: str):
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
    root = _scratch_root("q201", sf)
    store = PartitionedParquetMergeStore(
        root,
        keys=("wk", "user_id", "event_type"),
        partition_col="wk",
        version_cols=("ts", "event_id"),
        num_buckets=4,
        child_store="mor",
    )
    store.merge(ev)
    store.compact(spark)  # children get real bases before branching
    return store, ev


def _q201_read(spark: SparkSession, sf: str, state) -> DataFrame:
    store, ev = state
    candidate = ev.filter(F.col("event_id") % 5 == 0)
    corrupted = candidate.withColumn(
        "value",
        F.when(
            F.col("event_id") % 7 == 0, -F.col("value")
        ).otherwise(F.col("value")),
    )

    def _audit_bad(branch) -> int:
        return (
            branch.read(spark)
            .filter(
                (F.col("value") < 0)
                | (F.col("event_type") == "error")
            )
            .count()
        )

    # replay-aware isolation guard (the bench re-runs the read phase):
    # only a FIRST pass still has error rows to protect — detected
    # from the manifest history (metadata), not a table read
    first_pass = all(
        h["operation"] != "wap_publish"
        for h in store.describe_history()
    )
    bad_branch = store.wap_branch("audit")
    bad_branch.merge(corrupted)
    if bad_branch.read(spark).filter(F.col("value") < 0).count() == 0:
        raise AssertionError("corrupted batch passed the MOR table audit")
    store.wap_abandon(bad_branch)

    good_branch = store.wap_branch("audit")
    good_branch.merge(candidate.filter(F.col("event_id") % 7 != 0))
    good_branch.delete_where(spark, F.col("event_type") == "error")
    if _audit_bad(good_branch) != 0:
        raise AssertionError("clean batch failed the MOR table audit")
    # the gate holds: production still carries the error rows the
    # branch tombstoned (nothing published yet)
    if first_pass and store.read(spark).filter(
        F.col("event_type") == "error"
    ).limit(1).count() == 0:
        raise AssertionError("branch tombstones leaked into production")
    v = store.wap_publish(good_branch)
    if any(
        "_branches" in e["dir"] for e in store._parts(v).values()
    ):
        raise AssertionError("published manifest references _branches")
    # fold the published children's delta logs into their clone bases
    store.compact(spark)

    return (
        store.read(spark)
        .groupBy(
            F.col("wk").cast("string").alias("wk"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("value_cents"),
        )
        .select(
            F.lit("published").alias("action"),
            "wk",
            "event_type",
            "n_keys",
            "sum_event_id",
            "value_cents",
        )
        .orderBy("wk", "event_type")
    )


register_phases("q201_mor_table_wap", _q201_build, _q201_read)
