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


def test_backfill_windows_partition_the_range(spark, events):
    """N adjacent half-open windows == one range scan: no duplicate, no
    gap, and each window retries independently."""
    import datetime as dt

    from bigquery_cross_environment_etl_pipeline_spark.operators.extract import (
        backfill_scan,
        backfill_windows,
        window_scan,
    )

    start, end = "2024-01-05 00:00:00", "2024-01-25 00:00:00"
    wins = backfill_windows(start, end, 7)
    assert len(wins) == 7
    assert wins[0][0] == dt.datetime(2024, 1, 5)
    assert wins[-1][1] == dt.datetime(2024, 1, 25)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(wins, wins[1:]):
        assert a_hi == b_lo, "adjacent boundaries touch exactly"

    whole = window_scan(events, "ts", start, end)
    union = backfill_scan(events, "ts", wins)
    n_whole = whole.count()
    assert union.count() == n_whole
    assert union.select("event_id").distinct().count() == n_whole
    # every window non-trivial at this data spread, and ids disjoint
    from pyspark.sql import functions as F

    per_win = union.groupBy("_backfill_window").count().collect()
    assert len(per_win) == 7
    assert sum(r["count"] for r in per_win) == n_whole


def test_ts_literal_converts_aware_datetimes_to_utc(spark):
    """An offset-aware datetime must denote the same INSTANT as its
    UTC conversion (round-4 ADVICE fix: strftime alone dropped the
    tzinfo and shifted aware non-UTC inputs by their offset)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bigquery_cross_environment_etl_pipeline_spark.operators.extract import (
        _ts_literal,
    )

    est = dt.timezone(dt.timedelta(hours=-5))
    aware = dt.datetime(2024, 1, 10, 7, 30, 0, tzinfo=est)   # 12:30 UTC
    naive_utc = dt.datetime(2024, 1, 10, 12, 30, 0)
    row = spark.range(1).select(
        F.date_format(_ts_literal(aware), "yyyy-MM-dd HH:mm:ss").alias("a"),
        F.date_format(_ts_literal(naive_utc), "yyyy-MM-dd HH:mm:ss").alias("b"),
    ).first()
    assert row["a"] == row["b"] == "2024-01-10 12:30:00"
