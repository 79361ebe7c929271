"""Unit coverage for the hash-min connected-components operator beyond
its oracle-checked registry uses (q64/q76/q113): long-chain convergence,
the iteration-budget guard, and label semantics."""

from __future__ import annotations

import pytest

from parquet_demo_spark.operators.dedup import connected_components


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["v"]: r["label"] for r in connected_components(df, **kw).collect()
    }


def test_path_graph_converges_to_minimum(spark):
    # a 12-vertex path has diameter 11 — well past one propagation hop;
    # hash-min must still label every vertex with the component minimum
    edges = [(i, i + 1) for i in range(11)]
    got = _labels(spark, edges)
    assert got == {v: 0 for v in range(12)}


def test_two_components_stay_separate(spark):
    edges = [(0, 1), (1, 2), (10, 11), (11, 12), (12, 13)]
    got = _labels(spark, edges)
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12], got[13]} == {10}


def test_iteration_budget_raises_not_silently_wrong(spark):
    # exhausting max_iters before fixpoint must raise — returning
    # non-converged labels would silently report too many clusters
    edges = [(i, i + 1) for i in range(20)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            spark.createDataFrame(edges, "a long, b long"), max_iters=3
        )


def test_self_loops_and_duplicate_edges_are_harmless(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _labels(spark, edges)
    assert got[1] == 1 and got[2] == 1
    assert got[3] == 3
