"""Entry-point-1 lifecycle end-to-end (SURVEY.md §3.1): envelopes ->
decode/validate -> config fan-out -> per-tenant incremental jobs ->
destination + checkpoint state."""

from __future__ import annotations

import base64
import datetime as dt
import json

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators.checkpoint import CheckpointLog
from bigquery_cross_environment_etl_pipeline_spark.operators.config import ConfigStore
from bigquery_cross_environment_etl_pipeline_spark.orchestrator import run_jobs_for_messages
from bigquery_cross_environment_etl_pipeline_spark.schemas import CONFIG_SCHEMA
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


def _env(payload: dict) -> str:
    return json.dumps(
        {"message": {"data": base64.b64encode(json.dumps(payload).encode()).decode()}}
    )


def test_full_lifecycle_fanout(spark, tmp_path):
    config = ConfigStore(spark, str(tmp_path / "config"))
    config.write(
        spark.createDataFrame(
            [
                (1, "proj-1", "bds", "t", "ds1", "tb1", "sa"),
                (2, "proj-2", "bds", "t", "ds2", "tb2", "sa"),
            ],
            CONFIG_SCHEMA,
        )
    )
    ckpt = CheckpointLog(spark, str(tmp_path / "ckpt"))
    events = load_table(spark, SF_SMOKE, "events")

    envelopes = spark.createDataFrame(
        [
            (_env({"org_id": 1}),),
            (_env({"org_id": 1}),),  # duplicate message -> one job
            (_env({"org_id": 2}),),
            (_env({"org_id": 99}),),  # no config -> unknown org
            (_env({"nope": True}),),  # invalid -> rejected
            ("not json at all",),  # invalid -> rejected
        ],
        "body string",
    )

    res = run_jobs_for_messages(
        spark,
        envelopes,
        config,
        events,
        "ts",
        str(tmp_path / "dest"),
        ckpt,
        now=dt.datetime(2024, 1, 10),
    )
    assert res.rejected_messages == 2
    assert res.unknown_orgs == [99]
    assert [j.org_id for j in res.jobs] == [1, 2]
    assert all(j.status == "SUCCESS" for j in res.jobs)

    expected = events.filter(F.col("ts") < F.lit(dt.datetime(2024, 1, 10))).count()
    for org in (1, 2):
        got = spark.read.parquet(str(tmp_path / "dest" / f"org_{org}")).count()
        assert got == expected

    # second trigger: incremental — only the delta flows
    res2 = run_jobs_for_messages(
        spark,
        spark.createDataFrame([(_env({"org_id": 1}),)], "body string"),
        config,
        events,
        "ts",
        str(tmp_path / "dest"),
        ckpt,
        now=dt.datetime(2024, 2, 1),
    )
    assert res2.jobs[0].rows_loaded == events.count() - expected
    assert spark.read.parquet(str(tmp_path / "dest" / "org_1")).count() == events.count()
