"""Incremental rollup maintenance: merging per-batch partials must equal
a full recompute; compaction controls file counts without data change."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators.rollup import (
    RollupTable,
    aggregate_batch,
    compact,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


def test_incremental_rollup_equals_full_recompute(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    mid = dt.datetime(2024, 1, 15)
    first = events.filter(F.col("ts") < F.lit(mid))
    second = events.filter(F.col("ts") >= F.lit(mid))

    table = RollupTable(spark, str(tmp_path / "rollup"))
    table.update(first)
    table.update(second)
    incremental = {
        (r["bucket"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
            r["avg_value"],
        )
        for r in table.serve().collect()
    }

    full = aggregate_batch(events).withColumn(
        "avg_value", F.col("sum_value").cast("double") / F.col("n_events")
    )
    expected = {
        (r["bucket"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
            r["min_value"],
            r["max_value"],
            r["avg_value"],
        )
        for r in full.collect()
    }
    assert incremental == expected
    assert sum(v[0] for v in incremental.values()) == events.count()


def test_rollup_is_idempotent_under_empty_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    table = RollupTable(spark, str(tmp_path / "rollup"))
    table.update(events)
    before = sorted(map(tuple, table.read().collect()))
    table.update(events.filter(F.lit(False)))  # empty batch
    after = sorted(map(tuple, table.read().collect()))
    assert before == after


def test_compact_reduces_file_count_preserving_data(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "many_files")
    events.repartition(64).write.parquet(path)
    n_before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_before >= 32
    checksum_before = events.agg(F.sum("event_id")).first()[0]

    n_after = compact(spark, path, target_files=4)
    assert n_after <= 8
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("event_id")).first()[0] == checksum_before
