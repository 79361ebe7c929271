"""Mongo connector surface (R10–R14): pure option-builder tests +
integration gating — mirrors the reference's optional-dependency guards
(`run_example.py:29-40`). Live-Mongo paths are env-gated off."""

from __future__ import annotations

import pytest

from parquet_demo_spark.sources import mongo


def test_write_options_bulk_defaults():
    # reference bulk defaults: ordered=False, w=1, batch 10k
    opts = mongo.write_options("db", "coll", uri="mongodb://x")
    assert opts["ordered"] == "false"
    assert opts["writeConcern.w"] == "1"
    assert opts["maxBatchSize"] == "10000"
    assert "operationType" not in opts


def test_write_options_upsert_composite_pk():
    # R14: ReplaceOne-by-PK → replace + idFieldList
    from parquet_demo_spark.generators import SUPPLYMETHOD_PK

    opts = mongo.write_options("db", "coll", uri="u", upsert_keys=SUPPLYMETHOD_PK)
    assert opts["operationType"] == "replace"
    assert opts["idFieldList"].split(",") == list(SUPPLYMETHOD_PK)


def test_read_requires_gate(spark, monkeypatch):
    monkeypatch.delenv(mongo.ENV_URI, raising=False)
    with pytest.raises(RuntimeError, match="Mongo integration disabled"):
        mongo.read_collection(spark, "db", "coll")


def test_dry_run_needs_no_mongo(spark, sf_dir, monkeypatch, capsys):
    # R15: --dry-run prints a sample + count without a live sink
    monkeypatch.delenv(mongo.ENV_URI, raising=False)
    n = mongo.write_parquet_to_mongo(
        spark, f"{sf_dir}/nation.parquet", "db", "coll", dry_run=True
    )
    assert n == 25
    assert "n_name" in capsys.readouterr().out
