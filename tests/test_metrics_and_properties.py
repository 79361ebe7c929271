"""R19 metrics shape + property-based round-trips (SURVEY §5.2.5)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_demo_spark.io import infer_schema_from_rows
from parquet_demo_spark.metrics import RunMetrics, measure


def test_measure_and_summary_shape(spark, sf_smoke):
    df = spark.read.parquet(f"{sf_smoke}/nation.parquet")
    with measure("scan_nation", count_rows=df.count) as m:
        df.write.mode("overwrite").format("noop").save()
        m.batch_secs.extend([0.01, 0.02, 0.03])
    s = m.summary()
    assert s["rows"] == 25
    assert s["wall_sec"] > 0
    assert s["rows_per_sec"] > 0
    # the median/avg/peak trio the reference prints (and _bulk.py crashes on)
    assert s["batch_median_sec"] == 0.02
    assert s["batch_avg_sec"] == 0.02
    assert s["batch_peak_sec"] == 0.03


def test_runmetrics_zero_division_guard():
    assert RunMetrics("x").rows_per_sec == 0.0


# --- property-based: inference total function over arbitrary row dicts ---

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
    st.datetimes(
        min_value=datetime(1970, 1, 1), max_value=datetime(2100, 1, 1)
    ),
)


@given(
    rows=st.lists(
        st.dictionaries(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll",)),
                min_size=1,
                max_size=8,
            ),
            _scalars,
            max_size=5,
        ),
        max_size=8,
    )
)
@settings(max_examples=50, deadline=timedelta(seconds=2), suppress_health_check=[HealthCheck.too_slow])
def test_infer_schema_total_and_stable(rows):
    s = infer_schema_from_rows(rows)
    # total: every key present exactly once, in first-seen order
    keys = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    assert [f.name for f in s.fields] == keys
    # stable: inference is deterministic
    assert infer_schema_from_rows(rows) == s
