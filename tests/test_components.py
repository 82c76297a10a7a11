"""Connected components / dedup clustering (operators/components.py).

Every topology is asserted on BOTH execution paths: the driver-side
union-find (small contracted edge lists) and the distributed
pointer-jumping propagation (forced via ``driver_threshold=0``), which
must agree exactly.
"""

from __future__ import annotations

import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators.components import (
    connected_components,
    dedup_clusters,
)

# driver_threshold values: None -> driver union-find (all test graphs
# are below the default bound); 0 -> forced distributed propagation.
PATHS = pytest.mark.parametrize("thresh", [None, 0], ids=["driver-uf", "distributed"])


def _comp_map(df):
    return {r["node"]: r["comp"] for r in df.collect()}


@PATHS
def test_chain_collapses_to_min(spark, thresh):
    # 1-2-3-4-5 chain plus isolated pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "doc_a long, doc_b long"
    )
    got = _comp_map(connected_components(edges, driver_threshold=thresh))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


@PATHS
def test_two_triangles_bridged(spark, thresh):
    edges = spark.createDataFrame(
        [(7, 8), (8, 9), (7, 9), (20, 21), (21, 22), (9, 20)],
        "doc_a long, doc_b long",
    )
    got = _comp_map(connected_components(edges, driver_threshold=thresh))
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


@PATHS
def test_long_chain_converges_within_default_budget(spark, thresh):
    """Regression: a 120-node chain needs ~O(log n) pointer-jumping
    rounds on the distributed path — plain min-label propagation would
    silently return unconverged labels under any reasonable iteration
    cap. The chain is numbered descending so labels must travel the
    full diameter. The driver union-find must agree exactly."""
    n = 120
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    got = _comp_map(connected_components(edges, driver_threshold=thresh))
    assert set(got.values()) == {1}
    assert len(got) == n


@PATHS
def test_duplicate_and_self_edges(spark, thresh):
    """Redundant pairs (both orientations, repeats, self-loops) must not
    change the labeling on either path."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)], "doc_a long, doc_b long"
    )
    got = _comp_map(connected_components(edges, driver_threshold=thresh))
    assert got == {1: 1, 2: 1, 3: 1}


def test_reliable_checkpoint_path(spark, tmp_path, monkeypatch):
    """With SPARK_GRAFT_RELIABLE_CHECKPOINT set, iterative loops write
    reliable checkpoints (files under the dir) and still converge."""
    import bigquery_cross_environment_etl_pipeline_spark.operators.iterative as it

    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", str(tmp_path / "ckpt"))
    monkeypatch.setattr(it, "_CURRENT_DIR", None)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "doc_a long, doc_b long"
    )
    got = _comp_map(connected_components(edges, driver_threshold=0))
    assert set(got.values()) == {1}
    import glob

    assert glob.glob(str(tmp_path / "ckpt" / "**" / "*"), recursive=True)
