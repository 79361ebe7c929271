"""transformWithStateInPandas twin of the q63 stateful profile.

The Spark 4 state API's driver worker speaks a protobuf protocol; this
container ships no google.protobuf descriptors and pip installs are
off-limits, so the parity check SKIPS here (it runs wherever protobuf
exists). The gate itself is asserted so a future environment with
protobuf flips the test on automatically.
"""

from __future__ import annotations

import pytest

from parquet_demo_spark.streaming.stateful import (
    TWS_AVAILABLE,
    user_profile_transform_with_state,
)


@pytest.mark.skipif(
    not TWS_AVAILABLE,
    reason="google.protobuf descriptors absent (container limitation); "
    "transformWithState's driver worker cannot start",
)
def test_transform_with_state_matches_q63(spark, sf_smoke):
    from parquet_demo_spark.registry import all_queries

    baseline = [
        tuple(r)
        for r in all_queries()["q63_stateful_user_profile"]
        .spark(spark, sf_smoke)
        .collect()
    ]
    tws = [
        tuple(r)
        for r in user_profile_transform_with_state(spark, sf_smoke).collect()
    ]
    assert tws == baseline
