"""applyInPandasWithState: per-key state must accumulate across multiple
micro-batches and converge to the batch answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table
from bigquery_cross_environment_etl_pipeline_spark.streaming.incremental import read_stream
from bigquery_cross_environment_etl_pipeline_spark.streaming.stateful import (
    stream_user_totals_with_state,
)

from .conftest import SF_SMOKE


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    events = load_table(spark, SF_SMOKE, "events")
    # 4 files -> maxFilesPerTrigger=1 forces 4 micro-batches through state
    events.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = read_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        stream_user_totals_with_state(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len(q.recentProgress)
    assert n_batches >= 2, f"expected multiple micro-batches, got {n_batches}"

    # memory sink in update mode appends one refreshed row per touched
    # key per batch -> the LAST row per user is the converged total
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY rid DESC) rn
          FROM (SELECT *, monotonically_increasing_id() AS rid FROM user_totals)
        ) WHERE rn = 1
        """
    ).collect()
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final}

    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(expect)
    for uid, (n, s) in expect.items():
        gn, gs = got[uid]
        assert gn == n, f"user {uid}: count {gn} != {n}"
        assert abs(gs - s) < 1e-6, f"user {uid}: sum {gs} != {s}"
