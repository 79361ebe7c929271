"""CLI parity smoke tests (R15): `python -m parquet_demo_spark
generate|ingest` with the reference's flags, run in-process against the
session fixture (get_spark reuses the active session)."""

from __future__ import annotations

import os

import pytest

from parquet_demo_spark.__main__ import main


def test_generate_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "w50.parquet")
    rc = main(
        ["generate", "--rows", "1000", "--out", out, "--row-group-size", "500"]
    )
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() == 1000 and len(df.columns) == 51


def test_generate_supplymethod_table(spark, tmp_path):
    out = str(tmp_path / "sm.parquet")
    rc = main(["generate", "--rows", "200", "--out", out, "--table", "supplymethod"])
    assert rc == 0
    assert len(spark.read.parquet(out).columns) == 53


def test_generate_dry_run_writes_nothing(spark, tmp_path, capsys):
    out = str(tmp_path / "nope.parquet")
    rc = main(["generate", "--rows", "10", "--out", out, "--dry-run"])
    assert rc == 0
    assert not os.path.exists(out)
    assert "dry-run" in capsys.readouterr().out


def test_ingest_dry_run_counts(spark, sf_smoke, capsys):
    rc = main(
        [
            "ingest",
            "--parquet",
            os.path.join(sf_smoke, "region.parquet"),
            "--dry-run",
        ]
    )
    assert rc == 0
    assert "would ingest 5" in capsys.readouterr().out


def test_ingest_upsert_requires_pk(spark, sf_smoke):
    rc = main(
        [
            "ingest",
            "--parquet",
            os.path.join(sf_smoke, "region.parquet"),
            "--upsert",
        ]
    )
    assert rc == 2


def test_ingest_without_mongo_errors_clearly(spark, sf_smoke, monkeypatch):
    from parquet_demo_spark.sources.mongo import ENV_URI

    monkeypatch.delenv(ENV_URI, raising=False)
    with pytest.raises(RuntimeError, match="Mongo integration disabled"):
        main(
            [
                "ingest",
                "--parquet",
                os.path.join(sf_smoke, "region.parquet"),
            ]
        )


def test_generate_single_file_row_groups(spark, tmp_path):
    """VERDICT r3 #4: --single-file reproduces the reference's physical
    layout — ONE parquet file whose row groups hold exactly
    --row-group-size rows (footer-inspected, not inferred)."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "w50_single.parquet")
    rc = main(
        [
            "generate",
            "--rows",
            "1000",
            "--out",
            out,
            "--row-group-size",
            "300",
            "--single-file",
        ]
    )
    assert rc == 0
    assert os.path.isfile(out)  # one file, not a directory of parts
    meta = pq.ParquetFile(out).metadata
    assert meta.num_rows == 1000
    assert meta.num_row_groups == 4  # 300+300+300+100
    assert [meta.row_group(i).num_rows for i in range(4)] == [300, 300, 300, 100]
    # and the data reads back identically through Spark
    assert spark.read.parquet(out).count() == 1000
