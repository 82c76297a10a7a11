"""Custom Python DataSource (Spark 4 API): the simulated Pub/Sub
subscription — batch backlog replay and streaming tail, feeding the
existing envelope-decode path unchanged."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.sources import pubsub, pubsub_datasource


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    pubsub_datasource.register(spark)


def test_batch_read_is_partitioned_and_complete(spark):
    df = (
        spark.read.format("pubsub_sim")
        .option("numMessages", 500)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4, "each backlog slice is a task"
    assert df.count() == 500
    ids = df.agg(
        F.min("message_id").alias("lo"),
        F.max("message_id").alias("hi"),
        F.count_distinct("message_id").alias("n"),
    ).first()
    assert (ids["lo"], ids["hi"], ids["n"]) == (0, 499, 500)


def test_batch_envelopes_flow_through_decode(spark):
    raw = (
        spark.read.format("pubsub_sim")
        .option("numMessages", 200)
        .load()
        .withColumnRenamed("envelope", "body")
    )
    decoded = pubsub.decode_envelopes(raw)
    assert decoded.filter(~F.col("valid")).count() == 0
    orgs = pubsub.valid_messages(decoded)
    # org_id = message_id % 100 + 1, 200 messages -> each org twice
    per_org = orgs.groupBy("org_id").count().collect()
    assert len(per_org) == 100
    assert all(r["count"] == 2 for r in per_org)


def test_stream_read_tail_in_microbatches(spark, tmp_path):
    import time

    q = (
        spark.readStream.format("pubsub_sim")
        .option("numMessages", 250)
        .option("maxBatchSize", 100)
        .load()
        .writeStream.format("memory")
        .queryName("pubsub_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # the tail drains in ceil(250/100)=3 micro-batches; poll until empty
    # (Python micro-batch sources don't support Trigger.AvailableNow yet)
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            n = spark.sql("SELECT COUNT(*) AS n FROM pubsub_tail").first()["n"]
            if n >= 250:
                break
            time.sleep(1)
        got = spark.sql(
            "SELECT COUNT(*) AS n, COUNT(DISTINCT message_id) AS d FROM pubsub_tail"
        ).first()
    finally:
        q.stop()
    assert (got["n"], got["d"]) == (250, 250), "each id exactly once"
    # publish_time is deterministic from the id
    row = spark.sql(
        "SELECT envelope FROM pubsub_tail WHERE message_id = 42"
    ).first()
    assert pubsub_datasource._envelope(42) == row["envelope"]


def test_pubsub_stream_through_incremental_append(spark, tmp_path):
    """End-to-end: the custom streaming source feeds the T4/T5
    transactional-append protocol — decode + validate on the stream,
    foreachBatch append with idempotent batch ids, every message landing
    exactly once."""
    import time

    from bigquery_cross_environment_etl_pipeline_spark.streaming.incremental import (
        stream_incremental_append,
    )

    dest = str(tmp_path / "dest")
    status: list = []
    stream = (
        spark.readStream.format("pubsub_sim")
        .option("numMessages", 300)
        .option("maxBatchSize", 120)
        .load()
    )
    decoded = pubsub.decode_envelopes(stream.withColumnRenamed("envelope", "body"))
    validated = decoded.filter(F.col("valid")).select(
        "message_id", F.col("payload.org_id").alias("org_id"), "publish_time"
    )
    q = stream_incremental_append(
        validated,
        dest,
        str(tmp_path / "ckpt"),
        status_rows=status,
        available_now=False,
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            try:
                if spark.read.parquet(dest).count() >= 300:
                    break
            except Exception:
                pass  # dest not created until the first non-empty batch
            time.sleep(1)
    finally:
        q.stop()

    landed = spark.read.parquet(dest)
    assert landed.count() == 300
    assert landed.select("message_id").distinct().count() == 300, "exactly once"
    assert landed.select("org_id").distinct().count() == 100
    assert sum(s["rows"] for s in status) == 300
    assert all(s["status"] == "SUCCESS" for s in status)
    # batch ids in the data correspond to recorded epochs
    epochs = {r["_batch_id"] for r in landed.select("_batch_id").distinct().collect()}
    assert epochs <= {s["epoch_id"] for s in status}
