"""1000x scale check for the search / interpolation / as-of group
(VERDICT r6 #8): q144-q148 + q152 claim postings-/grid-/window-bound
costs — this measures them at documents x N and events x N.

Replicates the sf0.1 documents/events tables x N (doc_id / key offsets
per copy, reusing scale_check's builder), then:

- builds the stored inverted index ONCE (the linear, one-shuffle cost a
  deployment pays per corpus rebuild) and reports its wall time;
- times the four index-served searches (AND, phrase, tf-idf, BM25)
  through the STORED index — the claim under test is that query cost is
  bound by the matched terms' postings, not corpus size;
- times q147 (grid interpolation) and q148 (forward as-of), whose
  claims are one-shuffle window plans linear in events.

Usage: python scripts/search_scale_check.py [--copies N]   (default 10)
Prints one line per measurement; run with 10 and 1000 to get the
ratio BASELINE.md records.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scale_check as sc  # noqa: E402  (sibling script, reused builder)

from parquet_demo_spark.catalog import load  # noqa: E402
from parquet_demo_spark.registry import all_queries  # noqa: E402
from parquet_demo_spark.session import get_spark  # noqa: E402


def _timed(label: str, fn, runs: int = 3) -> float:
    fn()  # warm
    times = sorted(t for _ in range(runs) for t in [_once(fn)])
    med = times[len(times) // 2]
    print(f"{label}: median {med:.2f}s (runs {[f'{t:.2f}' for t in times]})")
    return med


def _once(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    copies = 10
    args = sys.argv[1:]
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
    sc.COPIES = copies
    sc.DST = f"/tmp/spark_graft_scale{copies}"
    os.makedirs(sc.DST, exist_ok=True)
    spark = get_spark()

    t0 = time.perf_counter()
    sc.build("documents")
    sc.build("events")
    print(f"fixture x{copies} build/load: {time.perf_counter() - t0:.1f}s")

    from pyspark.sql import functions as F

    from parquet_demo_spark.operators.search import (
        doc_lengths,
        inverted_index,
        search_all_terms,
        search_phrase,
        search_ranked_bm25,
        search_ranked_tfidf,
        write_index,
    )

    docs = load(spark, sc.DST, "documents")
    idx_path = os.path.join(sc.DST, "search_index")
    dl_path = os.path.join(sc.DST, "search_index_dl")
    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
        write_index(inverted_index(docs), idx_path)
        print(f"index build+write x{copies}: {time.perf_counter() - t0:.1f}s")
    if not os.path.exists(os.path.join(dl_path, "_SUCCESS")):
        # stored with the index (Lucene norms-file role) — BM25 must not
        # scan the full postings at query time
        doc_lengths(spark.read.parquet(idx_path)).write.mode(
            "overwrite"
        ).parquet(dl_path)
    n_docs = docs.count()
    idx = spark.read.parquet(idx_path)
    dl = spark.read.parquet(dl_path)

    _timed(
        f"q144_and_search x{copies}",
        lambda: search_all_terms(idx, ["dup", "scan", "merge"])
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .count(),
    )
    _timed(
        f"q145_phrase x{copies}",
        lambda: search_phrase(idx, "key", "value").count(),
    )
    _timed(
        f"q146_tfidf x{copies}",
        lambda: search_ranked_tfidf(
            idx, n_docs, ["dup", "vector", "stream"]
        ).count(),
    )
    _timed(
        f"q152_bm25 x{copies}",
        lambda: search_ranked_bm25(
            idx, n_docs, ["dup", "vector", "stream"], dl=dl
        ).count(),
    )

    qs = all_queries()
    for name in (
        "q147_linear_interpolation",
        "q148_asof_forward_tolerance",
    ):
        _timed(
            f"{name} x{copies}",
            lambda name=name: qs[name].spark(spark, sc.DST).count(),
        )
    # postings-bound evidence: matched postings vs total postings
    matched = idx.filter(
        F.col("term").isin("dup", "scan", "merge", "key", "value",
                           "vector", "stream")
    ).count()
    total = idx.count()
    print(f"postings touched by all queries: {matched:,} of {total:,} "
          f"({100.0 * matched / total:.2f}%)")


if __name__ == "__main__":
    main()
