"""Native session_window (batch mode) must agree with the lag+cumsum
sessionization query — two independent implementations of the same
semantics checking each other."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.plans.analytics import (
    sessionization_gap30m,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


def test_session_window_matches_lag_cumsum(spark):
    events = load_table(spark, SF_SMOKE, "events")
    native = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    got = {r["user_id"]: r["n_sessions"] for r in native.collect()}
    expect = {
        r["user_id"]: r["n_sessions"]
        for r in sessionization_gap30m(spark, SF_SMOKE).collect()
    }
    assert got == expect
