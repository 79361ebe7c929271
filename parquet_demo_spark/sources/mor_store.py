"""Merge-on-read (MOR) overlay for :class:`ParquetMergeStore`.

The base store's :meth:`~ParquetMergeStore.merge` is copy-on-write:
every batch rewrites each touched bucket, so the per-batch cost of a
high-frequency maintenance stream grows with BUCKET size, not batch
size (measured directly in BASELINE.md's round-10 streaming-applier
tiers: the term-keyed text batch touches all buckets, and its applier
cost rose 1.72× across a 100× index at fixed bucket count). That is
the classic copy-on-write trade: perfect reads, write amplification.

``MergeOnReadStore`` is the other side of the trade, the public
Hudi MOR / Iceberg v2 merge-on-read design re-expressed on the same
primitives:

- :meth:`commit_delta` appends the batch AS IS to a delta log —
  cost O(batch), no bucket read, no bucket rewrite, regardless of
  base size. Rows carry an op ('u' upsert / 'd' delete) and a
  monotonic sequence number.
- :meth:`read` / :meth:`probe` resolve last-write-wins AT READ TIME:
  the newest delta action per PK wins over the base snapshot
  (matching merge()'s unconditional replace-by-PK across commits;
  within one batch the usual version_cols LWW collapse applies).
  Read overhead is O(live delta rows) — bounded by compaction cadence.
- :meth:`compact` folds the resolved deltas into the base (one
  bucket-pruned COW merge + a DV-based key delete) and truncates the
  log — the amortized rewrite, paid once per cadence instead of once
  per batch.

Crash-safety: a delta is committed by an atomic pointer swap
(tmp + os.replace) AFTER its directory is fully written — a crash
mid-write leaves an orphan directory the pointer never references
(cleaned by :meth:`vacuum`). Compaction truncates the pointer LAST;
replaying still-listed deltas over the already-compacted base is
idempotent (the resolved winners equal the base rows, and a delete's
PK is already absent), so a crash between the base commits and the
truncation re-reads correctly and the next compact is a no-op fold.

Single-writer delta log: the pointer swap is not CAS-guarded (the
base store's optimistic-concurrency rebase applies to compaction's
base commits, not to concurrent delta appends) — one maintenance
stream owns a MOR store, which is exactly the streaming-applier
deployment shape.

Reference parity note: the reference repo (alxmancilla/parquet-demo)
has no mutable-store surface at all; this extends the engine's R14
upsert family per the charter, following the public Hudi/Iceberg MOR
designs.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_demo_spark.sources.merge_store import ParquetMergeStore
from parquet_demo_spark.sources.mongo import collapse_for_upsert

_OP = "__op"
_SEQ = "__seq"


class MergeOnReadStore:
    """A :class:`ParquetMergeStore` plus an append-only delta log,
    resolved last-write-wins at read time (Hudi MOR shape)."""

    def __init__(
        self,
        root: str,
        keys: tuple[str, ...],
        version_cols: tuple[str, ...] = (),
        num_buckets: int = 8,
    ) -> None:
        self.root = root
        self.keys = tuple(keys)
        self.version_cols = tuple(version_cols)
        self.num_buckets = int(num_buckets)
        self.base = ParquetMergeStore(
            os.path.join(root, "base"),
            keys=self.keys,
            version_cols=self.version_cols,
            num_buckets=num_buckets,
        )
        self._deltas_root = os.path.join(root, "deltas")
        os.makedirs(self._deltas_root, exist_ok=True)

    # --- delta log pointer (atomic swap, single writer) ---

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_DELTAS.json")

    def _log(self) -> dict:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"seq": -1, "dirs": []}

    def _swap_log(self, log: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_DELTAS.")
        with os.fdopen(fd, "w") as f:
            json.dump(log, f)
        os.replace(tmp, self._pointer_path())

    def delta_count(self) -> int:
        return len(self._log()["dirs"])

    # --- write path ---

    def merge(self, batch: DataFrame, **kwargs) -> int:
        """Copy-on-write fast path: with NO live deltas, a plain base
        merge (bootstrap loads / bulk backfills, where rewrite cost IS
        the work) — ``kwargs`` pass through to the base merge. With
        live deltas it would commit stale state under newer delta
        actions — routed to :meth:`commit_delta` instead (where the
        base merge's options have no meaning: a kwarg there raises
        rather than being silently dropped)."""
        if self._log()["dirs"]:
            if kwargs:
                raise ValueError(
                    "merge options are only available on the copy-on-"
                    f"write bootstrap path; the delta log is live "
                    f"(got {sorted(kwargs)})"
                )
            return self.commit_delta(batch)
        return self.base.merge(batch, **kwargs)

    def commit_delta(self, batch: DataFrame, op_col: str | None = None) -> int:
        """Append one maintenance batch to the delta log: O(batch)
        cost, no bucket read or rewrite at ANY base size.

        ``op_col`` names a column of 'u' (upsert) / 'd' (delete)
        actions; absent, every row is an upsert. A NULL op is
        rejected (the natural ``F.when(cond, 'd')``-without-otherwise
        mistake would otherwise act as a silent phantom delete that
        resurrects after compaction). The batch collapses to one row
        per PK first (version_cols LWW — the op of the surviving row
        is the key's action, matching what a merge of the same batch
        would have done). Delete rows only need the PK and version
        columns populated; other columns ride as NULL.

        The first commit records the table schema (column order +
        simpleString types) in the delta pointer; every later commit
        validates NAMES AND TYPES against it — a type-drifted batch
        fails HERE with a ValueError, never as an unreadable
        mixed-type log discovered by a later read.
        """
        missing = [
            c
            for c in (*self.keys, *self.version_cols)
            if c not in batch.columns
        ]
        if missing:
            raise ValueError(f"delta batch lacks key/version cols {missing}")
        if op_col is not None:
            batch = batch.withColumnRenamed(op_col, _OP)
        else:
            batch = batch.withColumn(_OP, F.lit("u"))
        got = {
            f.name: f.dataType.simpleString()
            for f in batch.schema.fields
            if f.name != _OP
        }
        rec = self._schema_record()
        if rec is not None:
            cols, types = rec
            if set(got) != set(cols):
                raise ValueError(
                    "delta batch schema must match the store's "
                    f"({sorted(set(got) ^ set(cols))} differ)"
                )
            drift = {
                c: (got[c], types[c])
                for c in cols
                if c in types and got[c] != types[c]
            }
            if drift:
                raise ValueError(
                    "delta batch schema must match the store's: column "
                    f"type drift {drift} (a mixed-type log would fail "
                    "on every later read)"
                )
        batch = collapse_for_upsert(batch, self.keys, self.version_cols)
        if op_col is not None:
            # lazy checkpoint: the validation action below materializes
            # the collapsed batch ONCE and the parquet write reuses it —
            # without it the collapse window would run twice per commit
            batch = batch.localCheckpoint(eager=False)
            bad = (
                batch.filter(
                    F.col(_OP).isNull() | ~F.col(_OP).isin("u", "d")
                )
                .limit(1)
                .collect()
            )
            if bad:
                raise ValueError(
                    f"delta op must be 'u' or 'd', got {bad[0][_OP]!r}"
                )
        log = self._log()
        seq = log["seq"] + 1
        # unique suffix: a crashed writer's orphan dir can never
        # collide with the retry (the merge store's artifact-dir law)
        d = tempfile.mkdtemp(dir=self._deltas_root, prefix=f"d{seq:05d}-")
        batch.withColumn(_SEQ, F.lit(seq).cast("bigint")).write.mode(
            "overwrite"
        ).parquet(d)
        if rec is None:
            cols = [c for c in batch.columns if c != _OP]
        self._swap_log(
            {
                "seq": seq,
                "dirs": log["dirs"] + [os.path.basename(d)],
                "columns": list(cols),
                "types": dict(rec[1]) if rec is not None else got,
            }
        )
        return seq

    # --- read path ---

    def _schema_record(self) -> tuple[list[str], dict[str, str]] | None:
        """(column order, name → simpleString type) — the pointer's
        record once any delta has committed (survives compaction, so
        an emptied store stays readable as a typed empty frame); else
        derived from the base (names from its manifest, types from one
        bucket footer, cached per instance); else None."""
        log = self._log()
        if "columns" in log:
            return list(log["columns"]), dict(log["types"])
        cur = self.base.current_version()
        if cur is None:
            return None
        cols = list(self.base._read_manifest(cur)["columns"])
        cached = getattr(self, "_base_types_cache", None)
        if cached is None:
            import pyarrow.parquet as pq

            rel = sorted(set(self.base._bucket_paths(cur).values()))[0]
            d = os.path.join(self.base.root, rel)
            name = next(
                f for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
            sch = pq.ParquetFile(os.path.join(d, name)).schema_arrow
            from pyspark.sql.pandas.types import from_arrow_type

            # prefer_timestamp_ntz: a parquet timestamp with
            # isAdjustedToUTC=false arrives as a tz-less arrow type and
            # reads back in Spark as timestamp_ntz — mapping it to
            # TimestampType here would flag every NTZ batch as drifted
            cached = {
                fname: from_arrow_type(
                    sch.field(fname).type, prefer_timestamp_ntz=True
                ).simpleString()
                for fname in sch.names
            }
            self._base_types_cache = cached
        return cols, {c: cached[c] for c in cols if c in cached}

    def _columns(self) -> list[str] | None:
        """Table column order (see :meth:`_schema_record`)."""
        rec = self._schema_record()
        return None if rec is None else rec[0]

    def has_data(self) -> bool:
        """Store-polymorphic emptiness test (ParquetMergeStore
        contract): True once a base version OR any delta committed."""
        return self._schema_record() is not None

    def table_columns(self) -> list[str] | None:
        """Store-polymorphic column order (ParquetMergeStore
        contract)."""
        return self._columns()

    def _empty_frame(self, spark: SparkSession) -> DataFrame:
        """Typed empty snapshot from the recorded schema — what read()
        returns when every key has been deleted and the log compacted
        away (an initialized-but-empty store must stay readable)."""
        cols, types = self._schema_record()
        return spark.createDataFrame(
            [], ", ".join(f"`{c}` {types[c]}" for c in cols)
        )

    def _delta_frame(self, spark: SparkSession) -> DataFrame | None:
        dirs = self._log()["dirs"]
        if not dirs:
            return None
        return spark.read.parquet(
            *[os.path.join(self._deltas_root, d) for d in dirs]
        )

    def _resolved(self, spark: SparkSession) -> DataFrame | None:
        """Latest delta action per PK: highest __seq wins (PKs are
        unique within a batch after the commit-side collapse, so the
        sequence alone is a total order per key)."""
        dl = self._delta_frame(spark)
        if dl is None:
            return None
        w = Window.partitionBy(*self.keys).orderBy(F.col(_SEQ).desc())
        return (
            dl.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", _SEQ)
        )

    def _overlay(
        self, spark: SparkSession, base_df: DataFrame | None
    ) -> DataFrame:
        latest = self._resolved(spark)
        cols = self._columns()
        if latest is None:
            if base_df is None:
                if self._schema_record() is not None:
                    return self._empty_frame(spark)  # emptied, not unborn
                raise ValueError(f"empty merge-on-read store: {self.root}")
            return base_df
        ups = latest.filter(F.col(_OP) == "u").select(*cols)
        if base_df is None:
            return ups
        keep = base_df.join(
            latest.select(*self.keys), list(self.keys), "left_anti"
        )
        return keep.select(*cols).unionByName(ups)

    def read(self, spark: SparkSession) -> DataFrame:
        """The resolved head snapshot: base rows not superseded by any
        delta action, plus the newest delta upsert per PK. Base cost
        is the usual bucket union; overlay cost is O(live delta rows)
        — bounded by compaction cadence, never by base size."""
        cur = self.base.current_version()
        base_df = self.base.read(spark) if cur is not None else None
        return self._overlay(spark, base_df)

    def probe(self, spark: SparkSession, keys_df: DataFrame) -> DataFrame:
        """Bucket-pruned point read THROUGH the delta overlay: the
        base probe reads only the probe keys' buckets; the delta side
        joins the (small) live log against the key set. Deleted keys
        are absent; superseded base rows never surface."""
        cur = self.base.current_version()
        latest = self._resolved(spark)
        keys = keys_df.select(*self.keys).dropDuplicates()
        base_hits = (
            self.base.probe(spark, keys) if cur is not None else None
        )
        if latest is None:
            if base_hits is None:
                if self._schema_record() is not None:
                    return self._empty_frame(spark)  # emptied, not unborn
                raise ValueError(f"empty merge-on-read store: {self.root}")
            return base_hits
        cols = self._columns()
        latest = latest.join(keys, list(self.keys), "left_semi")
        ups = latest.filter(F.col(_OP) == "u").select(*cols)
        if base_hits is None:
            return ups
        keep = base_hits.join(
            latest.select(*self.keys), list(self.keys), "left_anti"
        )
        return keep.select(*cols).unionByName(ups)

    # --- maintenance ---

    def compact(self, spark: SparkSession) -> None:
        """Fold the delta log into the base: ONE bucket-pruned COW
        merge for the winning upserts + a DV-based key delete for the
        winning deletes (PK-sized metadata, no rewrite), then truncate
        the log. This is the amortized rewrite — paid once per
        cadence, after which reads are pure base again."""
        latest = self._resolved(spark)
        if latest is None:
            return
        cols = self._columns()
        ups = latest.filter(F.col(_OP) == "u").select(*cols)
        dels = latest.filter(F.col(_OP) == "d").select(*self.keys)
        if ups.limit(1).count():
            self.base.merge(ups)
        if self.base.current_version() is not None and dels.limit(1).count():
            self.base.delete_keys(dels, deletion_vectors=True)
        log = self._log()
        folded = list(log["dirs"])
        # truncate LAST: a crash above leaves the log intact and the
        # overlay idempotent over the partially-compacted base. The
        # schema record survives the truncation, so a compact that
        # deleted every key of a base-less store leaves a store that
        # reads as a typed EMPTY frame, not one that raises.
        self._swap_log({**log, "dirs": []})
        for d in folded:
            shutil.rmtree(os.path.join(self._deltas_root, d), True)

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Base-store retention plus orphan-delta cleanup (directories
        a crashed writer left that no pointer ever committed)."""
        removed = self.base.vacuum(keep_last=keep_last)
        live = set(self._log()["dirs"])
        for d in sorted(os.listdir(self._deltas_root)):
            if d not in live:
                shutil.rmtree(os.path.join(self._deltas_root, d), True)
                removed.append(os.path.join("deltas", d))
        return removed


def commit_upserts_and_tombstones(
    store, src: DataFrame, sentinel: str
) -> None:
    """ONE atomic commit of a mixed upsert + tombstone batch — the
    shared commit step of all three maintenance appliers (text q155/
    q182, dedup q166, ANN q160), polymorphic over the store:

    ``src`` carries fresh rows plus tombstone rows whose ``sentinel``
    column is NULL (a real value there is never null — tf >= 1, sig /
    cid non-null). COW: a ``merge_into`` whose matched-delete clause
    drops the NULL-sentinel keys (bucket-pruned rewrite). MOR: the
    same batch as one O(batch) ``commit_delta``, sentinel-NULL rows as
    'd' ops. Keeping the op derivation HERE means a future store
    variant (or a fix to the tombstone law) touches one function, not
    three hand-mirrored appliers."""
    if isinstance(store, MergeOnReadStore):
        store.commit_delta(
            src.withColumn(
                _OP,
                F.when(F.col(sentinel).isNull(), "d").otherwise("u"),
            ),
            op_col=_OP,
        )
    else:
        store.merge_into(
            src,
            matched=[
                ("delete", f"s.{sentinel} IS NULL"),
                ("update", None),
            ],
            not_matched_insert=f"s.{sentinel} IS NOT NULL",
        )
