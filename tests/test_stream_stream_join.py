"""Stream-stream join with event-time bounds: purchases joined to the
same user's clicks within the preceding 30 minutes — both sides
watermarked so join state is evictable (the unbounded-state trap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table
from bigquery_cross_environment_etl_pipeline_spark.streaming.incremental import read_stream

from .conftest import SF_SMOKE


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    events = load_table(spark, SF_SMOKE, "events")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sides(df):
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        return purchases, clicks

    # streaming: watermark both sides + time-interval join condition
    stream = read_stream(spark, src, schema)
    sp, sc = sides(stream)
    joined = sp.withWatermark("p_ts", "1 hour").join(
        sc.withWatermark("c_ts", "1 hour"),
        F.expr(
            "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 MINUTES AND c_ts <= p_ts"
        ),
    )
    q = (
        joined.select("purchase_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    bp, bc = sides(events)
    expect = {
        (r["purchase_id"], r["click_id"])
        for r in bp.join(
            bc,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select("purchase_id", "click_id")
        .collect()
    }
    assert expect, "fixture should produce at least one pair"
    assert got == expect
