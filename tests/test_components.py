"""Connected components / dedup clustering (operators/components.py)."""

from __future__ import annotations

from bigquery_cross_environment_etl_pipeline_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain plus isolated pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "doc_a long, doc_b long"
    )
    got = _comp_map(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_two_triangles_bridged(spark):
    edges = spark.createDataFrame(
        [(7, 8), (8, 9), (7, 9), (20, 21), (21, 22), (9, 20)],
        "doc_a long, doc_b long",
    )
    got = _comp_map(connected_components(edges))
    assert set(got.values()) == {7}
    assert set(got) == {7, 8, 9, 20, 21, 22}


def test_dedup_clusters_with_singletons(spark):
    pairs = spark.createDataFrame([(2, 5), (5, 9)], "doc_a long, doc_b long")
    ids = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, ids, "doc_id").collect()
    }
    assert got[2] == got[5] == got[9] == 2
    singles = {i: c for i, c in got.items() if i not in (2, 5, 9)}
    assert all(i == c for i, c in singles.items())


def test_long_chain_converges_within_default_budget(spark):
    """Regression: a 120-node chain needs ~O(log n) pointer-jumping
    rounds — plain min-label propagation would silently return
    unconverged labels under any reasonable iteration cap. The chain is
    numbered descending so labels must travel the full diameter."""
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    got = _comp_map(connected_components(edges))
    assert set(got.values()) == {1}
    assert len(got) == n
