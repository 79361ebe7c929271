"""N× scale check for write-audit-publish (round-11 WAP surface).

The WAP claim that matters at 100 TB: branch creation and publish are
METADATA-only — their cost tracks the bucket count, never the table
bytes — so the audit gate adds ~constant overhead on top of the
candidate write itself (which is the ordinary COW/MOR merge already
tiered in BASELINE 'MOR vs COW' / 'Size-driven bucket provisioning').

Measures, against the same table tiered 1x/10x/100x:
- ``wap_branch``: shallow-clone open time (one manifest read + write);
- ``audit read``: full count of the branch snapshot (data-sized, shown
  for contrast — a real audit reads the CHANGED slice);
- ``wap_publish``: fast-forward adoption time (one manifest write);
- publish result is asserted equal to the branch's audited rows.

Usage: python scripts/wap_scale_check.py [--copies N]  (default 1)
Run at 1/10/100 and record the rows in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from parquet_demo_spark.session import get_spark  # noqa: E402
from parquet_demo_spark.sources.merge_store import (  # noqa: E402
    ParquetMergeStore,
)

ROWS_BASE = 4_000
N_KEYS = 20
RUNS = 3


def _payload_col():
    parts = [
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f"-{j}")))
        for j in range(32)
    ]
    return F.concat(*parts)


def _build(spark, copies):
    return spark.range(ROWS_BASE * copies).select(
        F.col("id").alias("k"),
        F.lit(1).cast("bigint").alias("v"),
        _payload_col().alias("payload"),
    )


def _batch(spark, stamp):
    return spark.range(N_KEYS).select(
        (F.col("id") * 97).alias("k"),
        F.lit(stamp).cast("bigint").alias("v"),
        _payload_col().alias("payload"),
    )


def table_main(n_parts: int) -> None:
    """TABLE-level WAP at W partitions (round 12, VERDICT r11 #3):
    branch = global shallow clone (W child clones, metadata-only);
    publish = W renames + ONE global commit. Both must track the
    PARTITION COUNT, never the table bytes — run at
    --table-parts {16,64,256} and record the rows in BASELINE.md.
    Rows per partition are tiny by design: this measures the
    metadata path, the data path is the ordinary merge already
    tiered elsewhere."""
    from parquet_demo_spark.sources.partitioned_store import (
        PartitionedParquetMergeStore,
    )

    spark = get_spark()
    root = f"/tmp/spark_graft_wap_table{n_parts}"
    if os.path.exists(root):
        shutil.rmtree(root)
    st = PartitionedParquetMergeStore(
        os.path.join(root, "t"),
        keys=("day", "k"),
        partition_col="day",
        version_cols=("v",),
        num_buckets=2,
    )
    st.merge(
        spark.range(2 * n_parts).select(
            (F.col("id") % n_parts).cast("string").alias("day"),
            F.col("id").alias("k"),
            F.lit(1).cast("bigint").alias("v"),
            F.col("id").cast("string").alias("payload"),
        )
    )
    t_branch, t_publish = [], []
    for i in range(RUNS + 1):  # first is warm-up
        t0 = time.perf_counter()
        br = st.wap_branch(f"audit{i}")
        t1 = time.perf_counter()
        # the candidate touches EVERY partition (the backfill shape)
        br.merge(
            spark.range(n_parts).select(
                F.col("id").cast("string").alias("day"),
                (F.col("id") + 1_000_000).alias("k"),
                F.lit(100 + i).cast("bigint").alias("v"),
                F.lit("fix").alias("payload"),
            )
        )
        n = br.read(spark).count()
        t2 = time.perf_counter()
        st.wap_publish(br)
        t3 = time.perf_counter()
        assert st.read(spark).count() == n
        if i:
            t_branch.append(t1 - t0)
            t_publish.append(t3 - t2)

    def _med(xs):
        return sorted(xs)[len(xs) // 2]

    print(
        f"table parts={n_parts}: wap_branch median {_med(t_branch):.3f}s "
        f"(runs {[f'{t:.3f}' for t in t_branch]})"
    )
    print(
        f"table parts={n_parts}: wap_publish median "
        f"{_med(t_publish):.3f}s "
        f"(runs {[f'{t:.3f}' for t in t_publish]}) "
        f"— {n_parts} renames + 1 global commit, zero data jobs"
    )


def main() -> None:
    if "--table-parts" in sys.argv:
        table_main(
            int(sys.argv[sys.argv.index("--table-parts") + 1])
        )
        return
    copies = 1
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    spark = get_spark()
    df = _build(spark, copies).localCheckpoint()
    print(f"copies={copies} rows={df.count()}")

    root = f"/tmp/spark_graft_wap_scale{copies}"
    if os.path.exists(root):
        shutil.rmtree(root)

    store = ParquetMergeStore(
        os.path.join(root, "store"),
        keys=("k",),
        version_cols=("v",),
        num_buckets=8,
    )
    store.merge(df)

    t_branch, t_audit, t_publish = [], [], []
    for i in range(RUNS + 1):  # first is warm-up
        t0 = time.perf_counter()
        br = store.wap_branch(f"audit{i}")
        t1 = time.perf_counter()
        br.merge(_batch(spark, 100 + i).localCheckpoint())
        t2 = time.perf_counter()
        n = br.read(spark).count()
        t3 = time.perf_counter()
        store.wap_publish(br)
        t4 = time.perf_counter()
        assert store.read(spark).count() == n
        if i:
            t_branch.append(t1 - t0)
            t_audit.append(t3 - t2)
            t_publish.append(t4 - t3)

    def _med(xs):
        return sorted(xs)[len(xs) // 2]

    print(
        f"wap_branch: median {_med(t_branch):.3f}s "
        f"(runs {[f'{t:.3f}' for t in t_branch]})"
    )
    print(
        f"audit full-count read: median {_med(t_audit):.2f}s "
        f"(data-sized, shown for contrast)"
    )
    print(
        f"wap_publish: median {_med(t_publish):.3f}s "
        f"(runs {[f'{t:.3f}' for t in t_publish]})"
    )


if __name__ == "__main__":
    main()
