"""File-backed mutable table with MERGE (replace-by-PK) semantics — R14
run for real, without a mongod.

The reference's only genuinely *mutable* store is Mongo: bulk ReplaceOne
upserts keyed by a composite PK (`examples/ingest_parquet_to_mongo_bulk.py`
`_bulk.py:108-116,119-209`). The connector jar and a live mongod aren't in
this container, so the capability is re-expressed the way lakehouse
formats (Delta/Iceberg/Hudi — public designs) implement MERGE on object
storage:

- **Immutable versioned snapshots + atomic pointer.** Every merge writes
  new parquet under ``data/v{N}/`` and a ``v{N}/manifest.json``, then
  commits by atomically replacing the ``_latest`` pointer file
  (``os.replace`` — POSIX-atomic). Readers resolve the pointer once and
  read a consistent snapshot; a crashed merge leaves only unreferenced
  files, never a corrupt table.
- **Hash-bucketed rewrite.** Rows route to ``pmod(hash(PK), B)`` buckets
  (Spark's stable Murmur3). A merge rewrites ONLY the buckets its
  upserts touch; the new manifest points at fresh dirs for touched
  buckets and re-references prior dirs for the rest. An upsert batch
  touching 1% of keys rewrites ~1% of a 100 TB table, not all of it —
  the same file-pruning story as Delta MERGE on a clustered table.
- **ReplaceOne-faithful combine.** Within an upsert batch, last-write-
  wins by ``version_cols`` (collapse_for_upsert, S24/q24 semantics);
  against the existing snapshot the upsert row replaces the stored row
  unconditionally — exactly Mongo ReplaceOne, where the replacement
  document wins regardless of any version field.

Scale posture: the only shuffle is the PK-window collapse over (touched
current ∪ upserts); the bucket routing is a narrow projection; the write
is partition-parallel parquet. ``B`` sizes the rewrite granularity —
at 100 TB pick B so a bucket ≈ a few GB (e.g. B=65536).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BUCKET = "__bucket"
_FROM_UPSERT = "__from_upsert"


class ParquetMergeStore:
    """Single-writer, lock-free-reader MERGE store over parquet files."""

    def __init__(
        self,
        root: str,
        keys: tuple[str, ...],
        version_cols: tuple[str, ...] = (),
        num_buckets: int = 8,
    ) -> None:
        if not keys:
            raise ValueError("MERGE requires at least one PK column")
        self.root = root
        self.keys = tuple(keys)
        self.version_cols = tuple(version_cols)
        self.num_buckets = int(num_buckets)
        os.makedirs(root, exist_ok=True)

    # -- pointer / manifest plumbing -----------------------------------

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_latest")

    def current_version(self) -> int | None:
        """Committed version, or None for an empty store."""
        try:
            with open(self._pointer) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:05d}", "manifest.json")

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _commit(
        self,
        version: int,
        bucket_paths: dict[int, str],
        columns: list[str],
    ) -> None:
        vdir = os.path.join(self.root, f"v{version:05d}")
        os.makedirs(vdir, exist_ok=True)
        manifest = {
            "version": version,
            "keys": list(self.keys),
            "version_cols": list(self.version_cols),
            "num_buckets": self.num_buckets,
            # the table schema (column names, stable order): bucket dirs
            # from different versions may carry different physical
            # schemas after an evolution — this is the authoritative set
            "columns": columns,
            # JSON keys are strings; normalize on read
            "bucket_paths": {str(k): v for k, v in bucket_paths.items()},
        }
        with open(self._manifest_path(version), "w") as fh:
            json.dump(manifest, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        # the commit point: readers see the new version only after this
        # atomic replace succeeds
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="_latest.")
        with os.fdopen(fd, "w") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._pointer)

    def _bucket_paths(self, version: int) -> dict[int, str]:
        m = self._read_manifest(version)
        return {int(k): v for k, v in m["bucket_paths"].items()}

    # -- read side ------------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """Snapshot read (optionally time-traveled to an older version).

        Returns an empty-schema-less union of every referenced bucket
        dir; raises on an empty store (no schema to synthesize).
        """
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"empty merge store: {self.root}")
        m = self._read_manifest(v)
        paths = sorted(set(self._bucket_paths(v).values()))
        # mergeSchema: after a schema evolution, buckets written before
        # it lack the new columns — union the footers and backfill null,
        # then present the manifest's authoritative column order
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.root, p) for p in paths]
        )
        return df.select(*m["columns"])

    def history(self) -> list[int]:
        vs = []
        for d in os.listdir(self.root):
            if d.startswith("v") and d[1:].isdigit():
                if os.path.exists(self._manifest_path(int(d[1:]))):
                    vs.append(int(d[1:]))
        return sorted(vs)

    # -- write side -----------------------------------------------------

    def _bucket_expr(self):
        return F.pmod(
            F.hash(*[F.col(c) for c in self.keys]), F.lit(self.num_buckets)
        )

    def merge(
        self, upserts: DataFrame, allow_schema_evolution: bool = False
    ) -> int:
        """Replace-by-PK merge; returns the committed version number.

        1. collapse the batch to one row per PK (LWW by version_cols —
           the reference's last-occurrence-wins ReplaceOne stream);
        2. route rows to PK-hash buckets; only those buckets rewrite;
        3. current ∪ upserts for touched buckets, upsert wins per PK
           (unconditional replace — ReplaceOne semantics);
        4. write new bucket dirs, commit manifest + pointer atomically.

        ``allow_schema_evolution`` unions by name with missing columns
        permitted (Delta-style mergeSchema): columns new in the batch
        backfill null on stored rows, columns absent from the batch
        stay null on its rows. Mongo needs no flag here — documents are
        schemaless — so the loose mode is the R14-faithful one; the
        strict default exists because a silently-widening 100 TB table
        is usually a bug, not an intent. Key and version columns must
        always be present.
        """
        from parquet_demo_spark.sources.mongo import collapse_for_upsert

        missing = [
            c
            for c in (*self.keys, *self.version_cols)
            if c not in upserts.columns
        ]
        if missing:
            raise ValueError(f"upsert batch lacks key/version cols {missing}")

        spark = upserts.sparkSession
        batch = collapse_for_upsert(upserts, self.keys, self.version_cols)

        # schema check against the MANIFEST, not incidentally via the
        # union below: a drifting batch whose keys all land in untouched
        # buckets would otherwise slip through and leave heterogeneous
        # bucket schemas behind a strict-mode store
        cur_version = self.current_version()
        if cur_version is None:
            columns = list(batch.columns)
        else:
            stored = self._read_manifest(cur_version)["columns"]
            if set(batch.columns) != set(stored):
                if not allow_schema_evolution:
                    raise ValueError(
                        "schema drift: batch columns "
                        f"{sorted(set(batch.columns) ^ set(stored))} differ "
                        "from the store's; pass allow_schema_evolution=True "
                        "for Delta-style mergeSchema behavior"
                    )
                columns = list(stored) + [
                    c for c in batch.columns if c not in stored
                ]
            else:
                columns = list(stored)

        batch = batch.withColumn(_BUCKET, self._bucket_expr())

        # the touched-bucket set is ≤ num_buckets ints — a driver-side
        # collect of an aggregate, not of data
        touched = sorted(
            r[0] for r in batch.select(_BUCKET).distinct().collect()
        )
        prior = {} if cur_version is None else self._bucket_paths(cur_version)

        existing_touched = [
            os.path.join(self.root, prior[b]) for b in touched if b in prior
        ]
        if existing_touched:
            current = spark.read.parquet(*existing_touched).withColumn(
                _BUCKET, self._bucket_expr()
            )
            combined = batch.withColumn(
                _FROM_UPSERT, F.lit(1)
            ).unionByName(
                current.withColumn(_FROM_UPSERT, F.lit(0)),
                allowMissingColumns=allow_schema_evolution,
            )
            # upsert beats stored row on the same PK, regardless of
            # version order — ReplaceOne is an unconditional replace
            w = Window.partitionBy(*self.keys).orderBy(
                F.col(_FROM_UPSERT).desc()
            )
            combined = (
                combined.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", _FROM_UPSERT)
            )
        else:
            combined = batch

        new_version = 0 if cur_version is None else cur_version + 1
        rel_data = os.path.join("data", f"v{new_version:05d}")
        out_dir = os.path.join(self.root, rel_data)
        # one partition-parallel write; bucket dirs appear as partition
        # subdirectories (__bucket=K) we then reference individually
        combined.write.mode("overwrite").partitionBy(_BUCKET).parquet(out_dir)

        bucket_paths = dict(prior)
        for b in touched:
            bucket_paths[b] = os.path.join(rel_data, f"{_BUCKET}={b}")
        self._commit(new_version, bucket_paths, columns)
        return new_version

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop data dirs unreferenced by the newest ``keep_last``
        manifests; returns removed paths. Old manifests/pointers stay —
        they're metadata-sized."""
        import shutil

        keep_versions = self.history()[-keep_last:]
        live: set[str] = set()
        for v in keep_versions:
            for rel in self._bucket_paths(v).values():
                # a referenced bucket dir keeps its parent data/vN dir
                live.add(rel.split(os.sep + _BUCKET + "=")[0])
        removed = []
        data_root = os.path.join(self.root, "data")
        if os.path.isdir(data_root):
            for d in sorted(os.listdir(data_root)):
                rel = os.path.join("data", d)
                if rel not in live:
                    shutil.rmtree(os.path.join(data_root, d))
                    removed.append(rel)
        return removed


def stream_merge_into_store(
    spark: SparkSession,
    source_dir: str,
    schema,
    store: ParquetMergeStore,
    checkpoint: str,
    max_files_per_trigger: int = 1,
):
    """R13 ∘ R14: streaming ingest into the mutable store.

    The reference's streaming pipeline ends in bulk ReplaceOne
    (`ingest_parquet_to_mongo_stream.py:102-181`); here the same shape is
    readStream → foreachBatch → ``store.merge`` — each micro-batch is one
    atomic store version, so a crash between batches leaves the last
    fully-merged snapshot (and the checkpoint replays the batch that
    didn't commit). Micro-batches execute sequentially, which is exactly
    the store's single-writer contract.
    """

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.merge(batch_df)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def changes_between(
    store: ParquetMergeStore,
    spark: SparkSession,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """CDC-style incremental read: rows whose state at ``v_to`` differs
    from ``v_from`` (inserted or updated keys), plus ``_change_type``.

    The manifests make this cheap: a bucket whose path is IDENTICAL in
    both versions cannot contain a change, so only rewritten buckets are
    scanned — on a 100 TB store an incremental consumer reads the data
    the merges actually touched, not the table. Within those buckets the
    new snapshot is anti-/left-joined to the old on the PK:

    - key absent in old  → ``insert``
    - key present, any non-key column differs → ``update_postimage``
      (the replacement row, Delta CDF naming)
    - unchanged rows are dropped (a rewrite that re-wrote an identical
      row is not a change).

    Deletes can't occur (ReplaceOne has no delete op), so none are
    emitted.
    """
    v_to = store.current_version() if v_to is None else v_to
    if v_to is None or v_from > v_to:
        raise ValueError(f"bad version range: {v_from}..{v_to}")
    old_paths = store._bucket_paths(v_from)
    new_paths = store._bucket_paths(v_to)
    changed = sorted(
        b for b, p in new_paths.items() if old_paths.get(b) != p
    )
    cols = store._read_manifest(v_to)["columns"]
    if not changed:
        return store.read(spark, v_to).select(*cols).limit(0).withColumn(
            "_change_type", F.lit("insert")
        )

    def _read(paths: dict[int, str], buckets: list[int]) -> DataFrame | None:
        present = [
            os.path.join(store.root, paths[b]) for b in buckets if b in paths
        ]
        if not present:
            return None
        return spark.read.option("mergeSchema", "true").parquet(*present)

    new = _read(new_paths, changed)
    old = _read(old_paths, changed)
    keys = list(store.keys)
    if old is None:
        return new.select(*cols).withColumn("_change_type", F.lit("insert"))

    # align evolved schemas: missing columns read as null on either side
    for c in cols:
        if c not in new.columns:
            new = new.withColumn(c, F.lit(None))
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None))
    old_tagged = old.select(
        *[F.col(c).alias(f"__old_{c}") for c in cols]
    )
    cond = [
        F.col(k).eqNullSafe(F.col(f"__old_{k}")) for k in keys
    ]
    joined = new.select(*cols).join(old_tagged, cond, "left")
    non_keys = [c for c in cols if c not in keys]
    row_differs = F.lit(False)
    for c in non_keys:
        row_differs = row_differs | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
    is_insert = F.col(f"__old_{keys[0]}").isNull()
    return (
        joined.withColumn(
            "_change_type",
            F.when(is_insert, F.lit("insert")).otherwise(
                F.lit("update_postimage")
            ),
        )
        .filter(is_insert | row_differs)
        .select(*cols, "_change_type")
    )
