#!/usr/bin/env python
"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full plan execution,
no driver-side collect — measures the engine, not result transfer).

Methodology (VERDICT r3 #5 — de-noised):
- warmup execution per query (JVM JIT/codegen, one-time costs a
  long-running cluster amortizes), then THREE timed runs;
- per-query value = median of the 3 (robust to one contended outlier —
  the recorded artifact round-3 flagged as ±20% ambient-noisy);
- per-query MAD (median absolute deviation) recorded alongside, so a
  cross-round comparison can tell regression from noise: a delta inside
  ~3×MAD is noise, not a plan change.

Layout tier (VERDICT r3 #6): the sf fixtures are single-row-group files,
capping scan parallelism at one task per table; headline scan-bound
queries are re-run against a 32-file rewrite of the same data
("queries_multifile") so local[32] numbers also reflect the parallel
plan a real multi-file table gets. Set SPARK_GRAFT_BENCH_MULTIFILE=0 to
skip that tier.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# scan-bound headliners ALWAYS re-run at the 32-file layout: table scans
# feed wide aggregations/joins, so single-file vs 32-file changes the
# first stage's task count from 1 to 32. On top of this floor, every
# query whose main-loop median is >= MULTIFILE_THRESHOLD_SEC joins the
# tier dynamically (VERDICT r5 #8) — layout-sensitive regressions should
# be visible wherever scan parallelism actually engages, and a hardcoded
# list would silently rot as queries are added.
MULTIFILE_QUERIES = [
    "q01_scan_count",
    "q10_agg_pricing_summary",
    "q15_topk_global",
    "q31_local_supplier_volume",
    "q84_iqr_outliers",
    "q84b_iqr_outliers_approx",
    "q84c_iqr_outliers_exact_histogram",
    "q116_returned_revenue",
    "q119_product_profit",
]
MULTIFILE_THRESHOLD_SEC = 0.5

# single-row sketch aggregates materialize via collect(): the result
# transfer is one row (free), and collect is undeniable execution —
# BENCH_r05 recorded 0.0s for q59b through the noop sink (a timing-floor
# / lazy-materialization smell on the driver host, VERDICT r5 #6)
COLLECT_QUERIES = {"q59_approx_distinct", "q59b_approx_quantiles"}

# heavy stateful reads (a multi-micro-batch maintenance stream IS the
# operation — ~20s per run in local mode) are timed once instead of
# warmup+3: four full stream runs would dominate the whole bench for
# one row, and stream machinery gains little from JIT warmup
SINGLE_READ_QUERIES = {
    "q155_stream_index_maintenance",
    "q157_stream_partitioned_ingest",
    "q160_ann_stream_maintenance",
    "q166_dedup_stream_maintenance",
    # the read phase IS a multi-commit backfill (2 scatter merges +
    # tombstone delete + fold) — idempotent on re-run but each repeat
    # pays the full store round trip, like the stream reads above
    "q195_partitioned_mor_backfill",
}

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# ambient-contamination canary (VERDICT r15 #3): q02 is a trivial
# projection whose clean-host medians sit at 0.35-0.39 s on this class
# of machine (r13/r14 records); a run whose canary — measured in the
# main loop AND re-measured at the very end — exceeds the band is
# flagged so the recorded artifact self-describes host noise instead
# of reading as a plan regression. Ref overridable for other hosts.
CANARY_QUERY = "q02_projection"
CANARY_CLEAN_SEC = float(os.environ.get("SPARK_GRAFT_CANARY_REF", "0.39"))
CANARY_BAND_FACTOR = 1.5


def _multifile_rewrite(spark, sf_dir: str, files: int = 32) -> str:
    """Rewrite the fixture tables into a ``files``-file layout under
    /tmp (cached per source dir; data identical, physical layout not).

    The cache invalidates on source mtime: the driver regenerates the
    fixtures between rounds in place, and benching a stale rewrite
    would time last round's data."""
    from parquet_demo_spark.catalog import load

    dst = os.path.join(
        "/tmp",
        "spark_graft_benchmf",
        sf_dir.strip("/").replace("/", "_") + f"_x{files}",
    )
    marker = os.path.join(dst, "_READY")
    src_mtime = max(
        (
            os.path.getmtime(os.path.join(sf_dir, f"{t}.parquet"))
            for t in _TABLES
            if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))
        ),
        default=0.0,
    )
    if (
        not os.path.exists(marker)
        or os.path.getmtime(marker) < src_mtime
    ):
        os.makedirs(dst, exist_ok=True)
        for t in _TABLES:
            src = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(src):
                continue
            load(spark, sf_dir, t).repartition(files).write.mode(
                "overwrite"
            ).parquet(os.path.join(dst, f"{t}.parquet"))
        open(marker, "w").close()
    return dst


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from parquet_demo_spark.registry import all_queries
    from parquet_demo_spark.session import get_spark

    spark = get_spark(app_name="parquet_demo_spark_bench")

    queries = all_queries()

    def _materialize(name: str, df) -> None:
        if df.isStreaming:  # pragma: no cover - streaming twins run batch
            raise ValueError(f"{name}: bench expects batch plans")
        if name in COLLECT_QUERIES:
            if not df.collect():  # a sketch agg always yields one row
                raise ValueError(f"{name}: empty result from sketch agg")
        else:
            df.write.mode("overwrite").format("noop").save()

    def run_once(name: str, d: str) -> float:
        t0 = time.perf_counter()
        _materialize(name, queries[name].spark(spark, d))
        return time.perf_counter() - t0

    def run_median(name: str, d: str) -> tuple[float, float]:
        run_once(name, d)  # warmup, not recorded
        times = sorted(run_once(name, d) for _ in range(3))
        med = times[1]
        mad = statistics.median(abs(t - med) for t in times)
        return round(med, 3), round(mad, 3)

    # build/read phase split (VERDICT r6 #1): queries that construct a
    # store/index/layout/ANN structure register a build(spark, sf) ->
    # state and a read(spark, sf, state). The build runs ONCE (timed);
    # the read — the operation a deployment actually re-runs — gets the
    # warmup + 3-median protocol, so a read-path regression is no longer
    # masked by rebuild cost. The recorded headline per-query value is
    # build + read-median (comparable in magnitude to earlier rounds'
    # whole-query timings); the split is recorded alongside.
    def run_phased(name: str, d: str) -> tuple[float, float, float, float]:
        q = queries[name]
        t0 = time.perf_counter()
        state = q.build(spark, d)
        build_s = time.perf_counter() - t0

        def read_once() -> float:
            t0 = time.perf_counter()
            _materialize(name, q.read(spark, d, state))
            return time.perf_counter() - t0

        if name in SINGLE_READ_QUERIES:
            med, mad = read_once(), 0.0
        else:
            read_once()  # warmup, not recorded
            times = sorted(read_once() for _ in range(3))
            med = times[1]
            mad = statistics.median(abs(t - med) for t in times)
        return (
            round(build_s + med, 3),
            round(mad, 3),
            round(build_s, 3),
            round(med, 3),
        )

    run_once("q01_scan_count", sf_dir)  # JVM/codegen warmup, not recorded

    # prepare the 32-file rewrite BEFORE the main loop: the rewrite job
    # leaves the JVM heap churned, which measurably inflated tier
    # timings when it ran immediately before them — the main loop's
    # minutes of steady-state execution are the recovery window
    mf_dir: str | None = None
    if os.environ.get("SPARK_GRAFT_BENCH_MULTIFILE", "1") != "0":
        try:
            mf_dir = _multifile_rewrite(spark, sf_dir)
        except Exception as exc:  # the primary metric must still print
            print(f"# bench multifile rewrite FAIL: {exc}", file=sys.stderr)

    per_query: dict[str, float] = {}
    per_mad: dict[str, float] = {}
    per_build: dict[str, float] = {}
    per_read: dict[str, float] = {}
    for name in sorted(queries):
        try:
            if queries[name].build is not None:
                (
                    per_query[name],
                    per_mad[name],
                    per_build[name],
                    per_read[name],
                ) = run_phased(name, sf_dir)
            else:
                per_query[name], per_mad[name] = run_median(name, sf_dir)
        except Exception as exc:  # record failures, don't die mid-bench
            per_query[name] = -1.0
            print(f"# bench FAIL {name}: {exc}", file=sys.stderr)

    multifile: dict[str, float] = {}
    if mf_dir is not None:
        # streaming twins are excluded: with maxFilesPerTrigger=1 a
        # 32-file layout means 32 micro-batches — that measures trigger
        # machinery, not scan-layout parallelism
        tier = sorted(
            n
            for n in (
                set(MULTIFILE_QUERIES)
                | {
                    n
                    for n, t in per_query.items()
                    if t >= MULTIFILE_THRESHOLD_SEC
                }
            )
            if not re.search(r"stream|stateful", n)
        )
        for name in tier:
            if name not in queries:
                continue
            # per-query isolation: one failure must not abort the rest
            # of the tier (the main loop already records failures this
            # way)
            try:
                if queries[name].build is not None:
                    multifile[name], _, _, _ = run_phased(name, mf_dir)
                else:
                    multifile[name], _ = run_median(name, mf_dir)
            except Exception as exc:
                multifile[name] = -1.0
                print(
                    f"# bench multifile FAIL {name}: {exc}", file=sys.stderr
                )

    total = round(sum(v for v in per_query.values() if v >= 0), 3)

    # end-of-run canary re-measure: the main-loop reading dates from
    # early in the run; a second reading after ~all queries tells
    # whether contamination arrived mid-run
    canary: dict = {
        "query": CANARY_QUERY,
        "sec": per_query.get(CANARY_QUERY),
        "mad": per_mad.get(CANARY_QUERY),
        "clean_ref_sec": CANARY_CLEAN_SEC,
        "band_factor": CANARY_BAND_FACTOR,
    }
    try:
        end_sec, end_mad = run_median(CANARY_QUERY, sf_dir)
        canary["end_sec"], canary["end_mad"] = end_sec, end_mad
    except Exception as exc:
        print(f"# bench canary re-run FAIL: {exc}", file=sys.stderr)
    band = CANARY_CLEAN_SEC * CANARY_BAND_FACTOR
    canary["contaminated"] = any(
        isinstance(canary.get(k), float) and canary[k] > band
        for k in ("sec", "end_sec")
    )

    # ONE compact line, and the LAST line (the driver parses a bounded
    # output tail — VERDICT r15 #2: a truncated tail erased the r14/r15
    # round-over-round comparison)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "mad": per_mad,
                # build/read split for store/index/layout/ANN queries
                # (VERDICT r6 #1): queries[name] = build_s + read-median
                # for these; build once per process, read warmup+3
                "queries_build": per_build,
                "queries_read": per_read,
                "queries_multifile": multifile,
                "canary": canary,
                "runs_per_query": 3,
                "aggregation": "median",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
