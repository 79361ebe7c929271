"""CLI entry points mirroring the reference's example scripts (R15–R18).

``python -m parquet_demo_spark generate`` ≙ `examples/generate_big_parquet.py`
(flags --rows/--out/--seed, `:80-98`) plus the 53-col supplymethod table
(`generate_parquet_from_ddl.py`) via --table. The reference's
--row-group-size controls parquet row-group size WITHIN one file; with
--single-file this CLI reproduces that layout exactly (one file, N-row
row groups, written via Arrow — driver-bound like the reference's own
single ParquetWriter). The distributed default instead maps the flag to
--rows-per-file (maxRecordsPerFile — one file per N rows): same data,
finer file granularity; downstream scans treat a file set identically
to one multi-row-group file.

``python -m parquet_demo_spark ingest`` ≙
`examples/ingest_parquet_to_mongo_bulk.py` (flags --parquet/--mongo-uri/
--db/--collection/--batch-size/--dry-run/--upsert/--pk-fields,
`:213-227`). --max-workers/--max-queue-size have no Spark meaning (the
scheduler IS the thread pool, maxFilesPerTrigger the bounded queue) and
are accepted-but-ignored for drop-in compatibility.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="parquet_demo_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="generate a wide parquet table")
    g.add_argument("--rows", type=int, default=1_000_000)
    g.add_argument("--out", type=str, default="big.parquet")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument(
        "--rows-per-file",
        "--row-group-size",  # reference-flag alias; see module docstring
        dest="rows_per_file",
        type=int,
        default=100_000,
        help="rows per output parquet FILE (maxRecordsPerFile). NOT an "
        "in-file row-group knob: Spark sizes row groups in bytes "
        "(parquet.block.size); the reference's --row-group-size is "
        "accepted as an alias and produces one file per N rows instead.",
    )
    g.add_argument(
        "--table", choices=["wide50", "supplymethod"], default="wide50"
    )
    g.add_argument(
        "--single-file",
        action="store_true",
        help="write ONE parquet file with row groups of exactly "
        "--row-group-size rows (the reference's physical layout; "
        "driver-bound — collects through Arrow). Default (off) writes "
        "distributed, one file per --rows-per-file rows.",
    )
    g.add_argument("--partitions", type=int, default=None)
    g.add_argument(
        "--dry-run",
        action="store_true",
        help="print 5 rows + count, write nothing (R15)",
    )

    c = sub.add_parser(
        "curate",
        help="run the full curation pipeline over a documents parquet",
    )
    c.add_argument("--input", type=str, required=True)
    c.add_argument("--out", type=str, default=None)
    c.add_argument("--lang", type=str, default="en")
    c.add_argument("--min-chars", type=int, default=100)
    c.add_argument("--max-chars", type=int, default=2000)
    c.add_argument("--min-tokens", type=int, default=20)
    c.add_argument(
        "--dry-run",
        action="store_true",
        help="report per-stage counts, write nothing (R15)",
    )

    i = sub.add_parser("ingest", help="ingest parquet into MongoDB")
    i.add_argument("--parquet", type=str, required=True)
    i.add_argument("--mongo-uri", type=str, default=None)
    i.add_argument("--db", type=str, default="test")
    i.add_argument("--collection", type=str, default="supplymethod")
    i.add_argument("--batch-size", type=int, default=10_000)
    i.add_argument("--dry-run", action="store_true")
    i.add_argument("--upsert", action="store_true")
    i.add_argument(
        "--pk-fields", type=str, default=None, help="comma-separated PK"
    )
    i.add_argument(
        "--version-fields",
        type=str,
        default=None,
        help="comma-separated columns defining last-write-wins order "
        "(deterministic upsert; omit for reference-equivalent arbitrary "
        "survivor)",
    )
    i.add_argument("--max-workers", type=int, default=4)  # compat, unused
    i.add_argument("--max-queue-size", type=int, default=20)  # compat, unused
    return p


def _cmd_generate(args) -> int:
    from parquet_demo_spark.generators import (
        gen_supplymethod,
        gen_wide50,
        write_chunked,
    )
    from parquet_demo_spark.session import get_spark

    spark = get_spark(app_name="parquet_demo_spark_generate")
    t0 = time.time()
    gen = gen_wide50 if args.table == "wide50" else gen_supplymethod
    df = gen(spark, args.rows, seed=args.seed, num_partitions=args.partitions)
    if args.dry_run:
        df.show(5, truncate=False)
        print(f"dry-run: would write {df.count():,} rows to {args.out}")
        return 0
    print(f"Generating {args.rows:,} rows ({args.table}) -> {args.out}")
    if args.single_file:
        from parquet_demo_spark.generators import (
            write_single_file_row_grouped,
        )

        write_single_file_row_grouped(
            df, args.out, row_group_rows=args.rows_per_file
        )
    else:
        write_chunked(df, args.out, rows_per_file=args.rows_per_file)
    print(f"Wrote parquet in {time.time() - t0:.2f}s")
    return 0


def _cmd_ingest(args) -> int:
    from parquet_demo_spark.session import get_spark
    from parquet_demo_spark.sources.mongo import ENV_URI, write_parquet_to_mongo

    if args.mongo_uri:
        os.environ[ENV_URI] = args.mongo_uri
    pk = tuple(args.pk_fields.split(",")) if args.pk_fields else ()
    if args.upsert and not pk:
        print("--upsert requires --pk-fields", file=sys.stderr)
        return 2
    version = (
        tuple(args.version_fields.split(",")) if args.version_fields else ()
    )
    spark = get_spark(app_name="parquet_demo_spark_ingest")
    t0 = time.time()
    n = write_parquet_to_mongo(
        spark,
        args.parquet,
        args.db,
        args.collection,
        upsert_keys=pk if args.upsert else (),
        version_cols=version,
        dry_run=args.dry_run,
        batch_size=args.batch_size,
    )
    verb = "would ingest" if args.dry_run else "ingested"
    print(f"{verb} {n:,} docs in {time.time() - t0:.2f}s")
    return 0


def _cmd_curate(args) -> int:
    import json

    from parquet_demo_spark.curation import curate
    from parquet_demo_spark.session import get_spark

    if not args.dry_run and args.out is None:
        print("curate requires --out unless --dry-run", file=sys.stderr)
        return 2
    spark = get_spark(app_name="parquet_demo_spark_curate")
    t0 = time.time()
    counts = curate(
        spark,
        args.input,
        args.out,
        lang=args.lang,
        min_chars=args.min_chars,
        max_chars=args.max_chars,
        min_tokens=args.min_tokens,
        dry_run=args.dry_run,
    )
    print(json.dumps(counts))
    verb = "dry-run" if args.dry_run else f"wrote {args.out}"
    print(f"curated in {time.time() - t0:.2f}s ({verb})", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.cmd == "generate":
        return _cmd_generate(args)
    if args.cmd == "curate":
        return _cmd_curate(args)
    return _cmd_ingest(args)


if __name__ == "__main__":
    raise SystemExit(main())
