"""Structured Streaming incremental path (T1-T6): AvailableNow backlog
processing, foreachBatch transactional append, windowed aggregation with
watermark."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table
from bigquery_cross_environment_etl_pipeline_spark.streaming import (
    stream_incremental_append,
    stream_windowed_counts,
)
from bigquery_cross_environment_etl_pipeline_spark.streaming.incremental import read_stream

from .conftest import SF_SMOKE


def _events_source_dir(spark, tmp_path):
    """Stage events as a directory source (nanos ts already normalized)."""
    src = str(tmp_path / "src")
    load_table(spark, SF_SMOKE, "events").write.parquet(src)
    return src


def test_stream_incremental_append_exactly_once(spark, tmp_path):
    src = _events_source_dir(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    statuses: list = []

    q = stream_incremental_append(
        read_stream(spark, src, schema), dest, ckpt, status_rows=statuses
    )
    q.awaitTermination(120)
    total = spark.read.parquet(dest).count()
    assert total == 1000
    assert statuses and all(s["status"] == "SUCCESS" for s in statuses)
    assert sum(s["rows"] for s in statuses) == 1000

    # restart with the same checkpoint: backlog already committed -> no dupes
    q2 = stream_incremental_append(
        read_stream(spark, src, schema), dest, ckpt, status_rows=statuses
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(dest).count() == 1000


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    src = _events_source_dir(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    agg = stream_windowed_counts(read_stream(spark, src, schema), window_size="1 day")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = load_table(spark, SF_SMOKE, "events")
    expect = {
        (r["d"], r["event_type"]): r["n"]
        for r in batch.groupBy(
            F.date_trunc("day", "ts").alias("d"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch computation exactly
    assert got, "no windows emitted"
    for k, v in got.items():
        assert expect[k] == v
    shutil.rmtree(str(tmp_path / "src"))
