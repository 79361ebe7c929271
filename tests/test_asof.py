"""asof_join direction/tolerance semantics (pandas merge_asof parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from parquet_demo_spark.operators.asof import asof_join

_LEFT = [Row(k=1, t=10, tag="a"), Row(k=1, t=20, tag="b"), Row(k=2, t=5, tag="c")]
_RIGHT = [
    Row(k=1, t=8, v=80),
    Row(k=1, t=10, v=100),  # equal-time row: eligible both directions
    Row(k=1, t=25, v=250),
    Row(k=2, t=30, v=300),
]


def _run(spark, **kw):
    out = asof_join(
        spark.createDataFrame(_LEFT),
        spark.createDataFrame(_RIGHT),
        key="k",
        left_time="t",
        right_time="t",
        value_col="v",
        **kw,
    )
    return {r.tag: r.asof_value for r in out.collect()}


def test_backward_inclusive(spark):
    assert _run(spark) == {"a": 100, "b": 100, "c": None}


def test_forward_inclusive(spark):
    assert _run(spark, direction="forward") == {
        "a": 100,  # equal time matches forward too
        "b": 250,
        "c": 300,
    }


def test_forward_tolerance_nulls_but_keeps_row(spark):
    got = _run(spark, direction="forward", tolerance=F.lit(5))
    # b's next right is at 25 (delta 5, inside); c's at 30 (delta 25, out)
    assert got == {"a": 100, "b": 250, "c": None}


def test_backward_tolerance(spark):
    got = _run(spark, tolerance=F.lit(1))
    # a matches at t=10 (delta 0); b's latest is t=10 (delta 10 → out)
    assert got == {"a": 100, "b": None, "c": None}


def test_matched_time_col_and_bad_direction(spark):
    out = asof_join(
        spark.createDataFrame(_LEFT),
        spark.createDataFrame(_RIGHT),
        key="k",
        left_time="t",
        right_time="t",
        value_col="v",
        direction="forward",
        matched_time_col="mt",
    )
    got = {r.tag: (r.asof_value, r.mt) for r in out.collect()}
    assert got["b"] == (250, 25)
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(_LEFT),
            spark.createDataFrame(_RIGHT),
            key="k",
            left_time="t",
            right_time="t",
            value_col="v",
            direction="sideways",
        )


def test_null_valued_nearest_right_row_yields_null(spark):
    """pandas merge_asof parity: when the NEAREST right row's value is
    NULL, the join returns NULL (and that row's matched time) — it must
    NOT skip to a farther row's value (ADVICE r6: value and matched
    time must come from the same right row, or tolerance checks the
    wrong row)."""
    left = spark.createDataFrame([Row(k=1, t=20, tag="x")])
    right = spark.createDataFrame(
        [Row(k=1, t=5, v=50), Row(k=1, t=18, v=None)]
    )
    out = asof_join(
        left,
        right,
        key="k",
        left_time="t",
        right_time="t",
        value_col="v",
        matched_time_col="mt",
    ).collect()
    assert len(out) == 1
    assert out[0].asof_value is None
    assert out[0].mt == 18  # nearest row's time, not the farther row's


def test_null_valued_nearest_right_row_forward_tolerance(spark):
    """Tolerance must be measured against the NEAREST right row even
    when its value is NULL: here the nearest forward row (t=21, null
    value) is inside tolerance but null-valued, and the farther non-null
    row (t=40) is outside — the result is null, not 400."""
    left = spark.createDataFrame([Row(k=1, t=20, tag="x")])
    right = spark.createDataFrame(
        [Row(k=1, t=21, v=None), Row(k=1, t=40, v=400)]
    )
    out = asof_join(
        left,
        right,
        key="k",
        left_time="t",
        right_time="t",
        value_col="v",
        direction="forward",
        tolerance=F.lit(5),
    ).collect()
    assert out[0].asof_value is None
