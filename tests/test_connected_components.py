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


def test_matches_union_find_model_both_join_paths(spark):
    """Deterministic pseudo-random graphs vs a union-find model, run
    through BOTH per-iteration join strategies: broadcast frontier
    (default) and the non-broadcast SMJ path (broadcast_frontier_max=0)
    that large graphs take — results must be identical to the model and
    to each other."""

    def union_find(n_edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in n_edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # fully compress, then label every vertex by its component min
        return {v: find(v) for v in parent}

    # LCG-derived edge list: collision-heavy, several components, no RNG
    edges = [((i * 7919 + 13) % 60, (i * 104729 + 7) % 60) for i in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    model = union_find(edges)
    got_bcast = _labels(spark, edges)
    got_smj = _labels(spark, edges, broadcast_frontier_max=0)
    assert got_bcast == model
    assert got_smj == model
