"""N× scaling check (BASELINE.md §'Scaling check').

Replicates the sf0.1 fixture tables ×N (key columns offset per copy so
join/group cardinality scales too) into 32-file parquet under /tmp, then
re-runs headline queries warm and prints per-query seconds plus the plan
markers that must survive the scale-up (WindowGroupLimit, TakeOrdered).

Usage: python scripts/scale_check.py [--copies N] [q13 q15 ...]
--copies defaults to 10; --copies 100 is the VERDICT r3 #9 tier that
turns "plans hold at 100×" into a measurement (sampled headline queries
only — build time and disk scale with N).
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
COPIES = 10  # overridden by --copies
DST = f"/tmp/spark_graft_scale{COPIES}"
FILES = 32

# per-table key columns to offset per copy (keeps keys disjoint so
# group/join cardinality scales with the data, not just row counts).
# part/supplier replicate WITH the facts — TPC-H scales them with SF, so
# holding them single-copy would give each p_partkey/s_suppkey 10× the
# lineitem matches (skew, not scale). Only region/nation stay 1× (fixed
# 5/25 rows at every SF).
_OFFSET_KEYS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# FK columns must shift by the span of the KEY DOMAIN they reference
# (computed on the referenced table), not by their own max: copy-i
# lineitem must point at copy-i part/supplier/orders even when the fact
# table references only a subset of the dimension's key range.
_KEY_DOMAIN = {
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "c_custkey": ("customer", "c_custkey"),
    "l_partkey": ("part", "p_partkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    # events.user_id joins customer.c_custkey (q105 stream-static join):
    # offset by the CUSTOMER domain so copy-i events point at copy-i
    # customers, not all copies at copy-0's block
    "user_id": ("customer", "c_custkey"),
}

_SPAN_CACHE: dict[tuple[str, str], int] = {}


def _domain_span(spark, col: str, own_df) -> int:
    dom = _KEY_DOMAIN.get(col)
    if dom is None:
        return own_df.agg(F.max(col)).collect()[0][0] + 1
    if dom not in _SPAN_CACHE:
        ref = load(spark, SRC, dom[0])
        _SPAN_CACHE[dom] = ref.agg(F.max(dom[1])).collect()[0][0] + 1
    return _SPAN_CACHE[dom]


def build(table: str) -> str:
    out = os.path.join(DST, f"{table}.parquet")
    if os.path.isdir(out):
        return out
    spark = get_spark()
    df = load(spark, SRC, table)
    if table not in _OFFSET_KEYS:
        # region/nation stay single-copy: they are fixed-cardinality at
        # every TPC-H SF, so replicating them would change join fan-out
        # and measure a different (wrong) workload
        df.write.mode("overwrite").parquet(out)
        return out
    span = {c: _domain_span(spark, c, df) for c in _OFFSET_KEYS[table]}
    if COPIES <= 32:
        copies = [
            df.select(
                *[
                    (F.col(c) + i * span[c]).alias(c)
                    if c in span
                    else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(COPIES)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
    else:
        # large N: a 1000-branch union is a 1000-leaf plan Catalyst
        # chokes on; one crossJoin with range(N) is a single plan node
        # with the identical result (offset keys by the copy index)
        big = df.crossJoin(
            F.broadcast(
                df.sparkSession.range(COPIES).withColumnRenamed(
                    "id", "__copy"
                )
            )
        ).select(
            *[
                (F.col(c) + F.col("__copy") * span[c]).alias(c)
                if c in span
                else F.col(c)
                for c in df.columns
            ]
        )
    n_files = FILES if COPIES <= 32 else max(FILES, COPIES // 8)
    big.repartition(n_files).write.mode("overwrite").parquet(out)
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
    "q84b_iqr_outliers_approx": ["lineitem"],
    "q31_local_supplier_volume": [
        "lineitem", "orders", "customer", "supplier", "nation", "region",
    ],
    "q76_dedup_clusters_minhash": ["documents"],
    "q85_label_centroids": ["embeddings"],
    "q88_curation_funnel": ["documents"],
    "q89_label_affinity": ["embeddings"],
    "q101_unigram_surprisal": ["documents"],
    "q103_kmeans_lloyd": ["embeddings"],
    "q104_zipf_slope": ["documents"],
    "q116_returned_revenue": ["lineitem", "orders", "customer", "nation"],
    "q118_volume_shipping": ["lineitem", "orders", "customer", "supplier", "nation"],
    "q119_product_profit": ["lineitem", "orders", "part", "supplier", "nation"],
}


def main() -> None:
    global COPIES, DST
    args = sys.argv[1:]
    if "--copies" in args:
        i = args.index("--copies")
        COPIES = int(args[i + 1])
        del args[i : i + 2]
        DST = f"/tmp/spark_graft_scale{COPIES}"
    wanted = args or ["q13", "q15"]
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
        # timed runs REBUILD the query: iterative operators (connected
        # components) do their work at construction time via
        # localCheckpoint, so timing only .count() on a prebuilt frame
        # would measure reading the final checkpoint, not the algorithm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, DST).count()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: median {sorted(times)[1]:.2f}s "
            f"(runs {[f'{t:.2f}' for t in times]}) markers={markers}"
        )


if __name__ == "__main__":
    main()
