"""Invariants of the iterative PageRank operator (plans/graph.py).

The oracle-parity sweep already pins exact values against DuckDB's
unrolled-CTE equivalent; these tests pin the *algorithmic* properties
(mass bounds, positivity, broadcast-iteration plan shape) so a
refactor that silently changes semantics fails here with a readable
message instead of a hash mismatch.
"""

from __future__ import annotations

from bigquery_cross_environment_etl_pipeline_spark.plans.graph import (
    _ITERS,
    _SCALE,
    pagerank_scaled,
    trade_edges,
)

SF_DIR = "/root/testdata/sf0.001"


def test_edges_out_weight_consistent(spark):
    rows = trade_edges(spark, SF_DIR).collect()
    assert rows, "trade graph should not be empty"
    by_src: dict[int, int] = {}
    for r in rows:
        by_src.setdefault(r.src, 0)
        by_src[r.src] += r.w
    for r in rows:
        assert r.outw == by_src[r.src]
        assert r.w > 0


def test_pagerank_mass_and_positivity(spark):
    ranks = {r.n_name: r.pagerank_scaled for r in
             pagerank_scaled(spark, SF_DIR).collect()}
    assert len(ranks) == 25  # every nation keeps a rank (left join)
    assert all(v > 0 for v in ranks.values())
    total = sum(ranks.values())
    # Integer truncation only ever loses mass: total stays within
    # (damping-tail, SCALE]. With 25 nodes and 5 iterations the loss is
    # bounded by iters * nodes * edges truncations of < 1 unit each.
    assert total <= _SCALE
    assert total > _SCALE * 0.97

    # ranks differ across nations (the trade graph is not symmetric)
    assert len(set(ranks.values())) > 1


def test_pagerank_iteration_count_matters(spark):
    one = {r.n_name: r.pagerank_scaled for r in
           pagerank_scaled(spark, SF_DIR, iters=1).collect()}
    five = {r.n_name: r.pagerank_scaled for r in
            pagerank_scaled(spark, SF_DIR, iters=_ITERS).collect()}
    assert one != five  # fixed point not reached after one sweep


def test_pagerank_plan_broadcasts_rank_vector(spark):
    plan = pagerank_scaled(spark, SF_DIR)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
