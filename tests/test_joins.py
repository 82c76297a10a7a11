"""AS-OF join semantics on hand-built frames (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

from bigquery_cross_environment_etl_pipeline_spark.operators.joins import asof_join


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_asof_join_picks_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [(1, _t(5), "t1"), (1, _t(10), "t2"), (2, _t(3), "t3")],
        "key long, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, _t(4), 10.0), (1, _t(5), 11.0), (1, _t(9), 12.0), (2, _t(4), 99.0)],
        "key long, qts timestamp, price double",
    )
    out = asof_join(
        trades, quotes, "key", "key", "ts", "qts",
        right_payload=["price", "qts"], how="left",
    )
    got = {r["trade"]: r["price"] for r in out.collect()}
    # t1@day5: quote@day5 (equal ts counts, 11.0 not 10.0)
    # t2@day10: quote@day9 -> 12.0 ; t3@day3: no quote <= day3 -> None
    assert got == {"t1": 11.0, "t2": 12.0, "t3": None}


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, _t(1), "a")], "key long, ts timestamp, v string")
    right = spark.createDataFrame([(1, _t(2), 5.0)], "key long, qts timestamp, price double")
    out = asof_join(
        left, right, "key", "key", "ts", "qts",
        right_payload=["price"], how="inner",
    )
    assert out.count() == 0


def test_asof_join_keys_do_not_leak_across_partitions(spark):
    left = spark.createDataFrame(
        [(1, _t(9), "x"), (2, _t(9), "y")], "key long, ts timestamp, v string"
    )
    right = spark.createDataFrame(
        [(1, _t(1), 1.0)], "key long, qts timestamp, price double"
    )
    out = asof_join(
        left, right, "key", "key", "ts", "qts",
        right_payload=["price"], how="left",
    )
    got = {r["v"]: r["price"] for r in out.collect()}
    assert got == {"x": 1.0, "y": None}
