"""Concurrent tenant fan-out + the T7 retry envelope."""

from __future__ import annotations

import base64
import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators.checkpoint import CheckpointLog
from bigquery_cross_environment_etl_pipeline_spark.operators.config import ConfigStore
from bigquery_cross_environment_etl_pipeline_spark.orchestrator import run_jobs_for_messages
from bigquery_cross_environment_etl_pipeline_spark.pipeline import process_etl_job
from bigquery_cross_environment_etl_pipeline_spark.schemas import CONFIG_SCHEMA
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


def _env(payload: dict) -> str:
    return json.dumps(
        {"message": {"data": base64.b64encode(json.dumps(payload).encode()).decode()}}
    )


def test_concurrent_tenant_jobs(spark, tmp_path):
    config = ConfigStore(spark, str(tmp_path / "config"))
    config.write(
        spark.createDataFrame(
            [(i, f"proj-{i}", "b", "t", f"ds{i}", f"tb{i}", "sa") for i in range(1, 5)],
            CONFIG_SCHEMA,
        )
    )
    ckpt = CheckpointLog(spark, str(tmp_path / "ckpt"))
    events = load_table(spark, SF_SMOKE, "events")
    envelopes = spark.createDataFrame(
        [(_env({"org_id": i}),) for i in range(1, 5)], "body string"
    )
    res = run_jobs_for_messages(
        spark,
        envelopes,
        config,
        events,
        "ts",
        str(tmp_path / "dest"),
        ckpt,
        now=dt.datetime(2024, 2, 1),
        max_concurrency=4,
    )
    assert [j.org_id for j in sorted(res.jobs, key=lambda j: j.org_id)] == [1, 2, 3, 4]
    assert all(j.status == "SUCCESS" for j in res.jobs)
    total = events.count()
    for i in range(1, 5):
        assert spark.read.parquet(str(tmp_path / "dest" / f"org_{i}")).count() == total
    # every tenant left a SUCCESS watermark in the shared log
    log = ckpt.latest_per_key().collect()
    assert {r["org_id"] for r in log} == {1, 2, 3, 4}


def test_retry_envelope_recovers_from_transient_failure(spark, tmp_path):
    """T7: a transform failing on the first attempt succeeds on retry;
    the checkpoint log shows the recovery."""
    ckpt = CheckpointLog(spark, str(tmp_path / "ckpt"))
    events = load_table(spark, SF_SMOKE, "events")
    attempts = {"n": 0}

    def flaky(df):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("transient infrastructure blip")
        return df

    res = process_etl_job(
        spark, 1, events, "ts", str(tmp_path / "dest"), ckpt,
        now=dt.datetime(2024, 2, 1), transform=flaky,
    )
    assert res.status == "SUCCESS"
    assert res.attempts == 2
    assert spark.read.parquet(str(tmp_path / "dest")).count() == events.count()


def test_exhausted_retries_record_failed(spark, tmp_path):
    ckpt = CheckpointLog(spark, str(tmp_path / "ckpt"))
    events = load_table(spark, SF_SMOKE, "events")

    def always_broken(df):
        raise RuntimeError("permanently broken transform")

    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        process_etl_job(
            spark, 1, events, "ts", str(tmp_path / "dest"), ckpt,
            now=dt.datetime(2024, 2, 1), transform=always_broken,
        )
    statuses = [r["status"] for r in ckpt.read().collect()]
    assert statuses.count("FAILED") == 1
    assert ckpt.last_success_watermark(1, "default") is None
