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
            "streaming_windowed_counts", "streaming_session_counts"}
    for name in bench.BENCH_QUERIES:
        if name in skip:
            continue
        plan = queries[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
