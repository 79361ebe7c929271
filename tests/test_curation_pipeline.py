"""End-to-end curation pipeline (curation.py): the composed run of the
per-stage operators the registry verifies in isolation."""

from __future__ import annotations

import pytest

import json
import subprocess
import sys

from parquet_demo_spark.curation import curate


def test_curate_stages_monotonic_and_deterministic(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "curated")
    counts = curate(spark, f"{sf_smoke}/documents.parquet", out)
    funnel = [
        counts["s0_input"],
        counts["s1_lang"],
        counts["s2_len"],
        counts["s3_tok"],
        counts["s4_exact_dedup"],
        counts["s5_neardup_dedup"],
    ]
    assert funnel == sorted(funnel, reverse=True)
    assert counts["s5_neardup_dedup"] > 0

    # split totals partition the survivors
    split_total = sum(v for k, v in counts.items() if k.startswith("s6_"))
    assert split_total == counts["s5_neardup_dedup"]

    # the written layout is hive-partitioned by split and re-reads whole
    back = spark.read.parquet(out)
    assert back.count() == counts["s5_neardup_dedup"]
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "val",
        "test",
    }

    # content-derived decisions: a second run reproduces every count
    counts2 = curate(
        spark, f"{sf_smoke}/documents.parquet", out, dry_run=True
    )
    assert counts2 == counts


@pytest.mark.slow
def test_curate_cli_dry_run(sf_smoke):
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "parquet_demo_spark",
            "curate",
            "--input",
            f"{sf_smoke}/documents.parquet",
            "--dry-run",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    counts = json.loads(proc.stdout.strip().splitlines()[-1])
    assert counts["s0_input"] >= counts["s5_neardup_dedup"] > 0


def test_curate_cli_requires_out_without_dry_run():
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "parquet_demo_spark",
            "curate",
            "--input",
            "/nonexistent.parquet",
        ],
        capture_output=True,
        text=True,
        timeout=60,
    )
    # usage error exits 2 BEFORE booting a SparkSession (fast fail)
    assert proc.returncode == 2
    assert "requires --out" in proc.stderr
