"""Strict round-trip tests (SURVEY §5.1/§5.2.1) — the reference's three
unit tests, with the laxness removed: full-microsecond timestamp
equality (the reference only asserts the year, `tests/test_datetime.py:34`,
which hides its `io.py:42` µs bug), decimal(38,10) fidelity, per-type
null handling, and typed schema-inference assertions."""

from __future__ import annotations

from datetime import date, datetime, timezone
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from parquet_demo_spark.io import infer_schema_from_rows, read_table, write_table


@pytest.fixture()
def tmp_parquet(tmp_path):
    return str(tmp_path / "t.parquet")


def test_roundtrip_basic(spark, tmp_parquet):
    # mirror of reference tests/test_io.py:9-26
    rows = [{"id": 1, "name": "Alice"}, {"id": 2, "name": "Bob"}]
    write_table(spark, tmp_parquet, "id bigint, name string", rows)
    out = sorted(read_table(spark, tmp_parquet).collect(), key=lambda r: r.id)
    assert [(r.id, r.name) for r in out] == [(1, "Alice"), (2, "Bob")]


def test_roundtrip_temporal_full_microseconds(spark, tmp_parquet):
    # closes the reference's year-only blind spot (test_datetime.py:34)
    ts = datetime(2023, 1, 2, 3, 4, 5, 123456)
    d = date(2023, 1, 2)
    write_table(
        spark,
        tmp_parquet,
        T.StructType(
            [
                T.StructField("ts", T.TimestampNTZType()),
                T.StructField("d", T.DateType()),
            ]
        ),
        [{"ts": ts, "d": d}],
    )
    row = read_table(spark, tmp_parquet).collect()[0]
    assert row.ts == ts  # exact to the microsecond
    assert row.d == d


def test_roundtrip_decimal_38_10(spark, tmp_parquet):
    vals = [Decimal("1234567890.0123456789"), Decimal("-0.0000000001"), None]
    write_table(
        spark,
        tmp_parquet,
        "v decimal(38,10)",
        [{"v": v} for v in vals],
    )
    out = [r.v for r in read_table(spark, tmp_parquet).collect()]
    assert sorted(out, key=str) == sorted(vals, key=str)


def test_nulls_pass_through_per_type(spark, tmp_parquet):
    # SURVEY §1.2.6: nulls untouched at every coercion site
    write_table(
        spark,
        tmp_parquet,
        "i bigint, f double, s string, ts timestamp_ntz, d date, b boolean",
        [{"i": None, "f": None, "s": None, "ts": None, "d": None, "b": None}],
    )
    row = read_table(spark, tmp_parquet).collect()[0]
    assert all(v is None for v in row)


def test_infer_schema_reference_mapping():
    # run_example.py:93-104 mapping, with type-level assertions the
    # reference lacks (test_infer_schema.py asserts names only)
    rows = [
        {
            "i": 1,
            "f": 1.5,
            "s": "x",
            "ts": datetime(2023, 1, 1, 0, 0, 0),
            "tstz": datetime(2023, 1, 1, tzinfo=timezone.utc),
            "d": date(2023, 1, 1),
            "b": True,
            "dec": Decimal("1.5"),
            "other": {"nested": 1},
        }
    ]
    s = infer_schema_from_rows(rows)
    expect = {
        "i": T.LongType(),
        "f": T.DoubleType(),
        "s": T.StringType(),
        "ts": T.TimestampNTZType(),
        "tstz": T.TimestampType(),
        "d": T.DateType(),
        "b": T.BooleanType(),
        "dec": T.DecimalType(38, 10),
        "other": T.StringType(),
    }
    assert {f.name: f.dataType for f in s.fields} == expect


def test_infer_schema_beyond_first_row():
    # deliberate improvement over run_example.py:86 (first-doc-only)
    rows = [{"a": None}, {"a": 3, "b": 2.5}]
    s = infer_schema_from_rows(rows)
    assert {f.name: f.dataType for f in s.fields} == {
        "a": T.LongType(),
        "b": T.DoubleType(),
    }


def test_infer_schema_empty():
    assert infer_schema_from_rows([]) == T.StructType([])


def test_nested_types_roundtrip(spark, tmp_parquet):
    # Beyond the reference's flat-primitive ceiling (`run_example.py:83`:
    # "Nested structures are not supported here"): arrays, structs, maps
    # and binary round-trip as first-class columns.
    rows = [
        {
            "arr": [1.5, -2.25, None],
            "st": {"a": 7, "b": "x"},
            "mp": {"k1": 1, "k2": 2},
            "bin": b"\x00\x01\xffpayload",
        },
        {"arr": [], "st": {"a": None, "b": None}, "mp": {}, "bin": b""},
    ]
    schema = (
        "arr array<double>, st struct<a bigint, b string>, "
        "mp map<string, bigint>, bin binary"
    )
    write_table(spark, tmp_parquet, schema, rows)
    out = sorted(
        read_table(spark, tmp_parquet).collect(), key=lambda r: len(r.bin)
    )
    assert out[1].arr == [1.5, -2.25, None]
    assert out[1].st.a == 7 and out[1].st.b == "x"
    assert dict(out[1].mp) == {"k1": 1, "k2": 2}
    assert bytes(out[1].bin) == b"\x00\x01\xffpayload"
    assert out[0].arr == [] and dict(out[0].mp) == {}


def test_write_chunked_rows_per_file(spark, tmp_path):
    # R4/R5: maxRecordsPerFile bounds file size like the reference's
    # 100k-row ParquetWriter chunks
    import glob

    from parquet_demo_spark.generators import gen_wide50, write_chunked

    path = str(tmp_path / "chunked")
    write_chunked(gen_wide50(spark, 5000, seed=0).coalesce(1), path, 1000)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 5
