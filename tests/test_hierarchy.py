"""Ancestor-closure doubling (operators/hierarchy.py).

Both execution paths — driver-side walk (small link tables) and
distributed doubling (forced via ``driver_threshold=0``) — must agree
on every topology.
"""

from __future__ import annotations

import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators.hierarchy import (
    ancestor_closure,
)

PATHS = pytest.mark.parametrize(
    "thresh", [None, 0], ids=["driver-walk", "distributed"]
)


@PATHS
def test_chain_closure_complete(spark, thresh):
    # 0 <- 1 <- 2 <- ... <- 9: node i has ancestors i-1 .. 0
    links = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 10)], "node long, parent long"
    )
    got = {
        (r["node"], r["anc"])
        for r in ancestor_closure(links, max_depth=9, driver_threshold=thresh).collect()
    }
    expected = {(i, a) for i in range(1, 10) for a in range(0, i)}
    assert got == expected


@PATHS
def test_binary_tree_closure(spark, thresh):
    # parent(u) = u // 2 over 1..14 — every node's ancestor set is the
    # halving chain to the root
    links = spark.createDataFrame(
        [(u, u // 2) for u in range(1, 15)], "node long, parent long"
    )
    got = {
        (r["node"], r["anc"])
        for r in ancestor_closure(links, max_depth=4, driver_threshold=thresh).collect()
    }
    expected = set()
    for u in range(1, 15):
        a = u // 2
        while True:
            expected.add((u, a))
            if a == 0:
                break
            a //= 2
    assert got == expected


@PATHS
def test_multi_parent_dag_closure(spark, thresh):
    """DAG link tables (a node with >1 parent) must close identically
    on both paths — the driver walk is a BFS over ALL parents, not a
    single-parent dict (round-3 ADVICE: the dict silently dropped all
    but one parent per node).

          0   1
           \\ /
            2    3
             \\  /
              4
    """
    links = spark.createDataFrame(
        [(2, 0), (2, 1), (4, 2), (4, 3)], "node long, parent long"
    )
    got = {
        (r["node"], r["anc"])
        for r in ancestor_closure(links, max_depth=4, driver_threshold=thresh).collect()
    }
    expected = {(2, 0), (2, 1), (4, 2), (4, 3), (4, 0), (4, 1)}
    assert got == expected


def test_driver_gate_bounds_closure_not_links(spark):
    """The driver-path gate must bound links x horizon (the
    materialized closure), not raw link count: a deep chain whose
    link count is under an old-style link gate but whose closure
    exceeds the pair budget must take the distributed path — proven
    here by both paths agreeing at a threshold that forces each."""
    n = 40
    links = spark.createDataFrame(
        [(i, i - 1) for i in range(1, n)], "node long, parent long"
    )
    expected = {(i, a) for i in range(1, n) for a in range(0, i)}
    # horizon for max_depth=n-1=39 is 2^6=64; links=39 -> 39*64=2496
    # pairs. threshold 2496 -> driver path; 2495 -> distributed path.
    for thresh in (2496, 2495):
        got = {
            (r["node"], r["anc"])
            for r in ancestor_closure(
                links, max_depth=n - 1, driver_threshold=thresh
            ).collect()
        }
        assert got == expected, thresh


@PATHS
def test_depth_budget_contract(spark, thresh):
    """max_depth bounds convergence: a depth-8 chain with max_depth=8
    closes fully (rounds = ceil(log2(8)) = 3 -> paths up to 8)."""
    links = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 9)], "node long, parent long"
    )
    got = ancestor_closure(links, max_depth=8, driver_threshold=thresh)
    assert got.count() == sum(range(1, 9))
