"""10× scaling check (BASELINE.md §'Scaling check').

Replicates the sf0.1 fixture tables ×10 (key columns offset per copy so
join/group cardinality scales too) into 32-file parquet under /tmp, then
re-runs headline queries warm and prints per-query seconds plus the plan
markers that must survive the scale-up (WindowGroupLimit, TakeOrdered).

Usage: python scripts/scale_check.py [q13 q15 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.plans import physical_plan
from parquet_demo_spark.registry import all_queries
from parquet_demo_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_scale10"
COPIES = 10
FILES = 32

# per-table key columns to offset per copy (keeps keys disjoint so
# group/join cardinality scales with the data, not just row counts)
_OFFSET_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(table: str) -> str:
    out = os.path.join(DST, f"{table}.parquet")
    if os.path.isdir(out):
        return out
    spark = get_spark()
    df = load(spark, SRC, table)
    if table not in _OFFSET_KEYS:
        # dimension tables stay single-copy: replicating region/nation/
        # part/supplier would duplicate keys and change join fan-out,
        # which measures a different (wrong) workload
        df.write.mode("overwrite").parquet(out)
        return out
    span = {
        c: df.agg(F.max(c)).collect()[0][0] + 1
        for c in _OFFSET_KEYS[table]
    }
    copies = [
        df.select(
            *[
                (F.col(c) + i * span[c]).alias(c) if c in span else F.col(c)
                for c in df.columns
            ]
        )
        for i in range(COPIES)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(FILES).write.mode("overwrite").parquet(out)
    return out


# All fixture tables; a query not listed in _NEEDS gets every table so
# any registry query can be scale-checked (dims copy 1×, facts ×10).
_ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_NEEDS = {
    "q13_window_topk_per_group": ["orders"],
    "q15_topk_global": ["lineitem"],
    "q01_scan_count": ["lineitem"],
    "q10_agg_pricing_summary": ["lineitem"],
    "q78_decontaminate": ["documents"],
    "q79_train_split": ["documents"],
    "q84_iqr_outliers": ["lineitem"],
    "q85_label_centroids": ["embeddings"],
    "q88_curation_funnel": ["documents"],
    "q89_label_affinity": ["embeddings"],
}


def main() -> None:
    wanted = sys.argv[1:] or ["q13", "q15"]
    spark = get_spark()
    qs = all_queries()
    os.makedirs(DST, exist_ok=True)
    for name, q in sorted(qs.items()):
        if not any(name.startswith(w) for w in wanted):
            continue
        for t in _NEEDS.get(name, _ALL_TABLES):
            build(t)
        df = q.spark(spark, DST)
        plan = physical_plan(df)
        markers = [
            m
            for m in ("WindowGroupLimit", "TakeOrderedAndProject")
            if m in plan
        ]
        df.count()  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.count()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: best {min(times):.2f}s (runs {[f'{t:.2f}' for t in times]}) "
            f"markers={markers}"
        )


if __name__ == "__main__":
    main()
