"""Ancestor-closure doubling (operators/hierarchy.py)."""

from __future__ import annotations

from bigquery_cross_environment_etl_pipeline_spark.operators.hierarchy import (
    ancestor_closure,
)


def test_chain_closure_complete(spark):
    # 0 <- 1 <- 2 <- ... <- 9: node i has ancestors i-1 .. 0
    links = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 10)], "node long, parent long"
    )
    got = {
        (r["node"], r["anc"]) for r in ancestor_closure(links, max_depth=9).collect()
    }
    expected = {(i, a) for i in range(1, 10) for a in range(0, i)}
    assert got == expected


def test_binary_tree_closure(spark):
    # parent(u) = u // 2 over 1..14 — every node's ancestor set is the
    # halving chain to the root
    links = spark.createDataFrame(
        [(u, u // 2) for u in range(1, 15)], "node long, parent long"
    )
    got = {
        (r["node"], r["anc"])
        for r in ancestor_closure(links, max_depth=4).collect()
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


def test_underestimated_depth_is_the_documented_contract(spark):
    """max_depth bounds convergence: a depth-8 chain with max_depth=8
    closes fully (rounds = ceil(log2(8)) = 3 -> paths up to 8)."""
    links = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 9)], "node long, parent long"
    )
    got = ancestor_closure(links, max_depth=8)
    assert got.count() == sum(range(1, 9))
