"""Nested billing-export schema round-trip (FIXTURES.md B1): the full
21-field struct/array<struct> schema survives parquet write/read and is
queryable through nested paths."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.schemas import BILLING_EXPORT_SCHEMA


def _row(i: int):
    return (
        f"acct-{i % 3}",
        (f"svc{i % 2}", f"service {i % 2}"),
        (f"sku{i}", "sku desc"),
        dt.datetime(2024, 1, 1 + i % 28),
        dt.datetime(2024, 1, 1 + i % 28, 1),
        (
            f"proj-{i % 3}",
            str(1000 + i),
            f"project {i % 3}",
            [("env", "prod")],
            "1/2/3",
            [("organizations/1", "root"), (f"folders/{i}", f"folder {i}")],
        ),
        [("team", str(i % 4))],
        [("managed-by", "etl")],
        ("us", "US", "us-central1", "us-central1-a"),
        [("costcenter", str(i), i % 2 == 0, "ns")],
        None,
        "Seller",
        dt.datetime(2024, 1, 1 + i % 28, 2),
        float(i) * 1.5,
        "USD",
        1.0,
        (2.0, "hours", 2.0, "hours"),
        [("credit", -0.5, "full", "c1", "CUD")] if i % 2 == 0 else [],
        ("202401", "partner"),
        "regular",
        (None, None, None, None),
        float(i) * 1.6,
    )


def test_billing_schema_roundtrip(spark, tmp_path):
    rows = [_row(i) for i in range(100)]
    df = spark.createDataFrame(rows, BILLING_EXPORT_SCHEMA)
    path = str(tmp_path / "billing")
    df.write.parquet(path)
    back = spark.read.parquet(path)

    assert back.schema == BILLING_EXPORT_SCHEMA
    assert back.count() == 100

    # nested access at depth 3 (project.ancestors[].display_name)
    depth3 = back.select(
        F.explode("project.ancestors").alias("anc")
    ).filter(F.col("anc.display_name") == "root")
    assert depth3.count() == 100

    # grouped agg over nested paths
    agg = {
        r["sid"]: r["total"]
        for r in back.groupBy(F.col("service.id").alias("sid"))
        .agg(F.round(F.sum("cost"), 2).alias("total"))
        .collect()
    }
    assert set(agg) == {"svc0", "svc1"}
    # credits array survives with typed fields
    cred = back.select(F.explode("credits").alias("c")).select("c.type").distinct()
    assert [r["type"] for r in cred.collect()] == ["CUD"]
