"""SparkSession factory (SURVEY §4.2 — configs, not code).

The reference pins its semantics by hand (naive datetimes are UTC,
``io.py:36-39``; µs timestamps, ``generate_parquet_from_ddl.py:39,54``);
here the same semantics are session configuration:

- ``spark.sql.session.timeZone=UTC`` — naive timestamps are UTC everywhere
  (matches reference ``io.py:36-39`` and the DuckDB oracle's naive µs).
- ``spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`` — the
  reference writes µs timestamps.
- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  at 100 TB this is what turns a static 32-partition plan into a
  right-sized one.
- Arrow exchange on — every Python-side UDF path (pandas_udf,
  applyInPandas, mapInArrow) moves columnar batches, not pickled rows.
- ANSI off — the reference's coercions are permissive (None passthrough,
  lossy unit down-conversion); ANSI-on would turn those into errors.

Scale posture: ``shuffle.partitions`` defaults to the local core count for
tests but reads ``SPARK_GRAFT_CPUS``/``SPARK_SQL_SHUFFLE_PARTITIONS`` so a
real cluster deployment sets partitions ≈ 2-3× total cores; AQE coalesces
down when a stage's output is small, and skew-join splits hot partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))


def get_spark(
    app_name: str = "parquet_demo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession with pinned semantics."""
    cpus = _DEFAULT_CPUS
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- semantics (SURVEY §1.2) ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.ansi.enabled", "false")
        # events.ts is parquet timestamp[ns]; Spark has no ns timestamp —
        # read as long and convert in catalog.load (µs, like the oracle).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- scale posture (SURVEY §4.2) ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Python exchange is Arrow-batched, never row-pickled ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: driver is the only JVM
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
