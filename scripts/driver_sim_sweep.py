"""Driver-simulation sweep: every registry query vs its DuckDB oracle.

Replicates the external driver's correctness check (CORRECTNESS_r{N}.json)
locally: run each query through the ``__spark_entry__`` contract (the
driver's own vanilla session configs applied by ``_configure``), run the
oracle SQL in DuckDB over the same parquet, canonicalize both results the
way the driver does (columns sorted by name, rows sorted by all columns,
pandas frames), and compare values exactly.

Usage: python scripts/driver_sim_sweep.py [sf_dir] [q43 q78 ...]
Default sf_dir is /root/testdata/sf0.01 (the driver's SF); with no query
names, sweeps the full registry. Exit code 1 if anything mismatches.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    for a in args:
        if os.path.isdir(a):
            sf_dir = a
        elif os.sep in a:
            # a path-looking arg that is NOT a directory is a typo, not a
            # query filter — matching zero queries would print "0/0 green"
            raise SystemExit(f"not a directory: {a}")
        else:
            names.append(a)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim-sweep")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, osql = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    todo = [n for n in qs if not names or any(k in n for k in names)]
    failed: list[str] = []
    for name in todo:
        t0 = time.perf_counter()
        try:
            sdf = _canon(qs[name](spark, sf_dir).toPandas())
            if name not in osql:
                status = f"no_oracle rows={len(sdf)}"
            else:
                ddf = _canon(con.execute(osql[name]).df())
                try:
                    pd.testing.assert_frame_equal(
                        sdf,
                        ddf,
                        check_dtype=False,
                        check_exact=True,
                    )
                    status = f"ok rows={len(sdf)}"
                except AssertionError as e:
                    status = f"MISMATCH: {str(e).splitlines()[-1][:160]}"
                    failed.append(name)
        except Exception as exc:  # keep sweeping; report at the end
            status = f"ERROR: {type(exc).__name__}: {str(exc)[:160]}"
            failed.append(name)
        print(f"{name:34s} {time.perf_counter() - t0:6.2f}s  {status}")

    print(f"\n{len(todo) - len(failed)}/{len(todo)} green")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
