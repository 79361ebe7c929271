"""N× scale check for the corpus-mixture family (q173/q175/q176).

The round-9 VERDICT flagged the EXACT mixture prefix (q173/q175) as a
single-task shape: a 4-group window serialized each group's whole
corpus through one task. The round-10 rewrite runs it as the
distributed two-pass prefix scan (operators/distributed.range_prefix).
This script measures the claim: the exact path's wall-clock tracks the
q176 pure-filter path within a small factor as the corpus scales,
instead of diverging by core-count.

Usage: python scripts/mixture_scale_check.py [--copies N]   (default 10)
Run at 1 / 10 / 100 and record exact-vs-filter ratios in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import scale_check as sc  # noqa: E402

from parquet_demo_spark.registry import all_queries  # noqa: E402
from parquet_demo_spark.session import get_spark  # noqa: E402


def _timed(label: str, fn, runs: int = 3) -> float:
    fn()  # warm
    times = sorted(_run(fn) for _ in range(runs))
    med = times[len(times) // 2]
    print(f"{label}: median {med:.2f}s (runs {[f'{t:.2f}' for t in times]})")
    return med


def _run(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    if "--copies" in sys.argv:
        i = sys.argv.index("--copies")
        sc.COPIES = int(sys.argv[i + 1])
    sc.DST = f"/tmp/spark_graft_scale{sc.COPIES}"
    spark = get_spark()
    sc.build("documents")
    print(f"copies={sc.COPIES}")

    q = all_queries()
    rows = {}
    for name in (
        "q176_approx_mixture_nosort",
        "q173_corpus_mixture",
        "q175_epoch_mixture_upsampling",
    ):
        rows[name] = _timed(
            name, lambda n=name: q[n].spark(spark, sc.DST).collect()
        )
    print(
        "exact/filter ratio: "
        f"{rows['q173_corpus_mixture'] / rows['q176_approx_mixture_nosort']:.2f}x"
    )


if __name__ == "__main__":
    main()
