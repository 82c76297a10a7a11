"""Windowed-extraction invariants (SURVEY.md §5.3): half-open interval
partitioning, count-scan consistency, pushdown of the window predicate."""

from __future__ import annotations

import datetime as dt

import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators.extract import (
    count_in_window,
    window_scan,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_adjacent_windows_partition_the_data(spark, events):
    """[a,m) ∪ [m,b) == [a,b) with no overlap — T3."""
    a, m, b = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 1)
    left = count_in_window(events, "ts", a, m)
    right = count_in_window(events, "ts", m, b)
    full = count_in_window(events, "ts", a, b)
    assert left + right == full == events.count()


def test_window_scan_matches_count(spark, events):
    a, b = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 6)
    df = window_scan(events, "ts", a, b)
    assert df.count() == count_in_window(events, "ts", a, b)
    rows = df.collect()
    assert all(a <= r["ts"] < b for r in rows)


def test_empty_window(spark, events):
    a, b = dt.datetime(2030, 1, 1), dt.datetime(2030, 2, 1)
    assert count_in_window(events, "ts", a, b) == 0


def test_projection_pushdown_in_plan(spark):
    """Column pruning must reach the parquet scan (§4): a 2-column
    projection over lineitem reads 2 columns, not 11."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    plan = (
        li.filter("l_shipdate < timestamp '1996-01-01'")
        .select("l_orderkey", "l_extendedprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "l_quantity" not in plan.split("ReadSchema")[-1]
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[-1]
