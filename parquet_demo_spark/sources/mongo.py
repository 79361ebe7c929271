"""MongoDB source/sink (SURVEY §2A R10–R14), via mongo-spark-connector.

The reference drives Mongo with pymongo thread pools and hand-rolled
type coercion (`examples/ingest_parquet_to_mongo*.py`); on Spark the
connector writes one partition per task — the thread pool (R12/R13), the
bounded queue (R20), ordered=False batching (R12), and the per-type
converters (R7/R8) all dissolve into partition parallelism and the
connector's own BSON codecs.

Integration-gated (mirrors the reference's optional-dependency guards,
`run_example.py:29-40`): the connector jar is not bundled in this
container, so every entry point degrades to a clear error unless
``SPARK_GRAFT_MONGO_URI`` is set and the jar is on the classpath. The
option-dict builders are pure and unit-tested without a live Mongo.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MONGO_FORMAT = "mongodb"
ENV_URI = "SPARK_GRAFT_MONGO_URI"

# Last-hop writer seam: (batch_df, connector_options) -> None. The default
# is the real connector write; tests inject a ReplaceOne-faithful fake so
# the whole ingest pipeline (read → collapse → options → sink) executes
# without a live mongod or the connector jar.
MongoWriter = Callable[[DataFrame, dict], None]


def connector_write(df: DataFrame, opts: dict) -> None:
    df.write.format(MONGO_FORMAT).mode("append").options(**opts).save()


def mongo_enabled() -> bool:
    return bool(os.environ.get(ENV_URI))


def read_options(
    database: str, collection: str, uri: str | None = None
) -> dict[str, str]:
    """R10: connector read options (replaces fetch_from_mongo's
    find_arrow_all → find_pandas_all → find fallback chain,
    `run_example.py:43-75` — the connector IS the arrow-native path)."""
    return {
        "connection.uri": uri or os.environ.get(ENV_URI, ""),
        "database": database,
        "collection": collection,
    }


def write_options(
    database: str,
    collection: str,
    uri: str | None = None,
    upsert_keys: tuple[str, ...] = (),
    ordered: bool = False,
    write_concern_w: int = 1,
    batch_size: int = 10_000,
) -> dict[str, str]:
    """R11–R14: connector write options.

    - ``ordered=False`` + w=1 mirror the reference's bulk defaults
      (`_bulk.py:140-142`, insert_many(ordered=False) at `:166-168`).
    - ``upsert_keys`` maps R14's ReplaceOne-by-composite-PK
      (`_bulk.py:108-116`) to operationType=replace + idFieldList.
    - ``batch_size`` mirrors `--batch-size` (`_bulk.py:218`).
    """
    opts = {
        "connection.uri": uri or os.environ.get(ENV_URI, ""),
        "database": database,
        "collection": collection,
        "ordered": str(ordered).lower(),
        "writeConcern.w": str(write_concern_w),
        "maxBatchSize": str(batch_size),
    }
    if upsert_keys:
        opts["operationType"] = "replace"
        opts["idFieldList"] = ",".join(upsert_keys)
    return opts


def _require_enabled() -> None:
    if not mongo_enabled():
        raise RuntimeError(
            f"Mongo integration disabled: set {ENV_URI} and provide the "
            "mongo-spark-connector jar (spark.jars.packages="
            "org.mongodb.spark:mongo-spark-connector_2.13:<version>)"
        )


def read_collection(
    spark: SparkSession, database: str, collection: str, limit: int | None = 1000
) -> DataFrame:
    """R10 + R16: Mongo → DataFrame with the reference's `_id` rename
    (`run_example.py:72-75`: `_id` → string `id`) and default limit."""
    _require_enabled()
    df = (
        spark.read.format(MONGO_FORMAT)
        .options(**read_options(database, collection))
        .load()
    )
    if "_id" in df.columns:
        df = df.withColumn("id", F.col("_id").cast("string")).drop("_id")
    if limit is not None:
        df = df.limit(limit)
    return df


def collapse_for_upsert(
    df: DataFrame,
    upsert_keys: tuple[str, ...],
    version_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per PK before a replace-by-key write.

    With ``version_cols`` the survivor is deterministic last-write-wins
    (highest version tuple, S24/q24 semantics — mirrors the reference's
    ReplaceOne stream where the last occurrence wins, `_bulk.py:108-116`);
    without them, dropDuplicates keeps an arbitrary row per key, which is
    exactly as (non)deterministic as the reference's unordered bulk
    writes racing on the same PK.
    """
    if not version_cols:
        return df.dropDuplicates(list(upsert_keys))
    w = Window.partitionBy(*upsert_keys).orderBy(
        *[F.col(c).desc() for c in version_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def write_parquet_to_mongo(
    spark: SparkSession,
    parquet_path: str,
    database: str,
    collection: str,
    upsert_keys: tuple[str, ...] = (),
    version_cols: tuple[str, ...] = (),
    dry_run: bool = False,
    batch_size: int = 10_000,
    writer: MongoWriter | None = None,
) -> int:
    """R11/R12/R14/R15: parquet → Mongo, partition-parallel.

    ``dry_run`` mirrors the reference's `--dry-run` (print ≤5 docs +
    count, no writes: `ingest_parquet_to_mongo.py:83-89`). ``writer``
    swaps the last-hop connector write for a test double.
    """
    df = spark.read.parquet(parquet_path)
    if dry_run:
        df.show(5, truncate=False)
        return df.count()
    if writer is None:
        _require_enabled()
        writer = connector_write
    if upsert_keys:
        df = collapse_for_upsert(df, upsert_keys, version_cols)
    # count once, before the write: counting afterwards would rescan the
    # source (second job) and could disagree with what was written
    n = df.count()
    writer(
        df,
        write_options(
            database, collection, upsert_keys=upsert_keys, batch_size=batch_size
        ),
    )
    return n


def stream_parquet_to_mongo(
    spark: SparkSession,
    source_dir: str,
    schema,
    database: str,
    collection: str,
    checkpoint: str,
    upsert_keys: tuple[str, ...] = (),
    writer: MongoWriter | None = None,
):
    """R13: streaming ingest — readStream → foreachBatch connector write.

    The reference's ThreadPool + as_completed aggregation
    (`_stream.py:130-181`) becomes micro-batch + partition-parallel
    writes; backpressure (R20) is maxFilesPerTrigger instead of a
    bounded queue. ``writer`` swaps the connector for a test double."""
    if writer is None:
        _require_enabled()
        writer = connector_write
    opts = write_options(database, collection, upsert_keys=upsert_keys)

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        writer(batch_df, opts)

    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
