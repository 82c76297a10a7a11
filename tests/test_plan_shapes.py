"""Physical-plan regression guards for headline queries.

Locks the plan properties the 100 TB story depends on — pushdown at the
scan, exchange budgets, top-k without global sort, no cartesian products
— so a refactor that silently de-optimizes a plan fails here instead of
in a production-scale run. (tools/plan_audit.py reports the same data
as documentation; these are the hard assertions.)
"""

from __future__ import annotations

import pytest

from bigquery_cross_environment_etl_pipeline_spark import queries_catalog

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    q = queries_catalog.spark_queries()[name]
    return q(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_incremental_scan_pushes_window_and_never_shuffles(spark):
    plan = _plan(spark, "incremental_window_scan")
    assert "Exchange" not in plan, "a pure windowed scan must not shuffle"
    assert "PushedFilters: [" in plan and "ts" in plan.split("PushedFilters")[-1], (
        "the half-open window must reach the parquet scan"
    )


def test_topk_uses_heap_not_global_sort(spark):
    for name in ("top10_orders_by_value", "embedding_cosine_topk"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, f"{name} must plan top-k as heaps"


@pytest.mark.parametrize(
    ("name", "max_exchanges"),
    [
        ("grouped_cost_rollup", 1),   # one partial->final agg shuffle
        ("dedup_exact_stats", 1),     # one digest shuffle
        ("revenue_by_nation", 4),     # two fact keys + agg; dims broadcast
        ("sessionization_gap30m", 2), # one per-user shuffle reused + agg
    ],
)
def test_exchange_budget(spark, name, max_exchanges):
    plan = _plan(spark, name)
    n = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n <= max_exchanges, f"{name}: {n} exchanges > budget {max_exchanges}"


def test_no_cartesian_products_anywhere_in_headline_set(spark):
    import bench

    queries = queries_catalog.spark_queries()
    skip = {"etl_checkpoint_roundtrip", "etl_provision_rollback",
            "streaming_windowed_counts", "streaming_session_counts",
            # writes bucketed tables at build time; its join plan is
            # asserted inside the query itself (hash-pinned booleans)
            "bucketed_join_rollup",
            # fragments + compacts a temp parquet copy at build time
            "compaction_file_accounting"}
    for name in bench.BENCH_QUERIES:
        if name in skip:
            continue
        plan = queries[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_banded_neardup_joins_on_band_keys_no_cartesian(spark):
    """The banded-LSH candidate stage must join on (band_idx, band_key)
    equi-keys — never a cartesian/NL product — and the verify stage
    must reference the pair-dot UDF (ArrowEvalPython), i.e. the numpy
    fast path, not an interpreted fold."""
    plan = _plan(spark, "embedding_cosine_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_idx" in plan and "band_key" in plan
    assert "ArrowEvalPython" in plan, "verify dots must run Arrow-batched"


def test_sequence_packing_has_no_single_partition_window(spark):
    """The packing prefix sum must stay partitioned: every window spec
    in the plan carries a partition key (the two-phase bucket id), so
    no stage funnels the corpus through one task."""
    plan = _plan(spark, "corpus_sequence_packing")
    for frag in plan.split("Window ")[1:]:
        spec = frag.split("]")[0]
        assert "_pid" in spec, f"unpartitioned window: {spec[:120]}"


def test_decontamination_broadcasts_eval_side(spark):
    """The eval shingle relation must broadcast — the train corpus is
    probed map-side, never shuffled against the eval set."""
    plan = _plan(spark, "benchmark_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q1_single_exchange_and_pruned_scan(spark):
    """TPC-H Q1 must be scan-bound: one partial->final agg exchange,
    shipdate pushed to the scan, no joins."""
    plan = _plan(spark, "pricing_summary_q1")
    n = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n <= 1, f"Q1 planned {n} exchanges"
    assert "Join" not in plan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[-1]


def test_q6_all_predicates_reach_scan_zero_joins(spark):
    """Q6 is a pure filter-scan-aggregate: date + quantity predicates
    push to parquet; the only exchange is the 1-row final agg gather."""
    plan = _plan(spark, "forecast_revenue_change_q6")
    assert "Join" not in plan
    pushed = plan.split("PushedFilters")[-1]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    n = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n <= 1


def test_q19_disjunction_stays_hash_join(spark):
    """The OR-of-conjunctions must not degrade the equi join: part is
    broadcast, no nested-loop/cartesian, fact never shuffles."""
    plan = _plan(spark, "disjunctive_revenue_q19")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_ngram_fraction_exchange_budget(spark):
    """Linear repetition-scoring dataflow: shingle-hash agg + join back
    + per-doc agg — bounded exchanges, no pair join anywhere."""
    plan = _plan(spark, "corpus_dup_ngram_fraction")
    assert "CartesianProduct" not in plan
    n = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n <= 4, f"dup-ngram planned {n} exchanges"


def test_knn_graph_no_cartesian_partitioned_window(spark):
    """The kNN graph must stay candidate-bounded: band-key equi joins
    (no cartesian/NL product), Arrow-batched verify dots, and a window
    partitioned on the source id — never a single-partition gather."""
    plan = _plan(spark, "embedding_knn_graph")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" in plan
    import re
    for spec in re.findall(r"partitionBy=\[([^\]]*)\]", plan):
        assert spec.strip(), "unpartitioned window in kNN graph"
