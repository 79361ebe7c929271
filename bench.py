#!/usr/bin/env python
"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full plan execution,
no driver-side collect — measures the engine, not result transfer).
Each query runs twice and the best time is reported: the first execution
of a plan shape pays one-time JVM JIT/codegen cost that a long-running
cluster amortizes away; steady-state throughput is the metric that
scales to the 100 TB target.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from parquet_demo_spark.registry import all_queries
    from parquet_demo_spark.session import get_spark

    spark = get_spark(app_name="parquet_demo_spark_bench")

    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = queries[name].spark(spark, sf_dir)
        if df.isStreaming:  # pragma: no cover - streaming twins run batch
            raise ValueError(f"{name}: bench expects batch plans")
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    run("q01_scan_count")  # JVM/codegen warmup, not recorded

    per_query: dict[str, float] = {}
    for name in sorted(queries):
        try:
            per_query[name] = round(min(run(name), run(name)), 3)
        except Exception as exc:  # record failures, don't die mid-bench
            per_query[name] = -1.0
            print(f"# bench FAIL {name}: {exc}", file=sys.stderr)

    total = round(sum(v for v in per_query.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "runs_per_query": 2,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
