"""Pub/Sub envelope decode + validation (S5/U2): good, malformed-base64,
and missing-org_id messages (FIXTURES.md B5)."""

from __future__ import annotations

import base64
import json

from bigquery_cross_environment_etl_pipeline_spark.sources.pubsub import (
    decode_envelopes,
    rejected_messages,
    valid_messages,
)


def _env(payload: dict) -> str:
    data = base64.b64encode(json.dumps(payload).encode()).decode()
    return json.dumps({"message": {"data": data}})


def test_decode_and_validate(spark):
    good = _env({"org_id": 7, "project_id": "p1"})
    extended = _env(
        {"org_id": 8, "project_id": "p2", "dataset_id": "d", "table_id": "t",
         "target_date": "2024-01-01"}
    )
    missing_org = _env({"project_id": "p3"})
    bad_b64 = json.dumps({"message": {"data": "!!!not-base64!!!"}})
    no_message = json.dumps({"nope": 1})

    df = spark.createDataFrame(
        [(good,), (extended,), (missing_org,), (bad_b64,), (no_message,)],
        "body string",
    )
    decoded = decode_envelopes(df)
    ok = valid_messages(decoded).collect()
    assert sorted(r["org_id"] for r in ok) == [7, 8]
    ext = [r for r in ok if r["org_id"] == 8][0]
    assert ext["dataset_id"] == "d" and ext["target_date"] == "2024-01-01"
    assert rejected_messages(decoded).count() == 3
