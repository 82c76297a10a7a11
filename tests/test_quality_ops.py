"""Data-quality operators: profiling exactness, rule-split accounting,
stratified sample fractions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators.quality import (
    check_rules,
    profile,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x int, y string"
    )
    stats = {r["column"]: r for r in profile(df).collect()}
    assert stats["x"]["n_rows"] == 4
    assert stats["x"]["n_nulls"] == 1
    assert stats["x"]["n_distinct"] == 3
    assert stats["y"]["n_nulls"] == 1
    assert stats["y"]["n_distinct"] == 2
    assert stats["y"]["min_str"] == "a" and stats["y"]["max_str"] == "b"


def test_check_rules_split_and_accounting(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, -1.0)], "k int, v double"
    )
    valid, violations = check_rules(
        df, {"k_present": F.col("k").isNotNull(), "v_nonneg": F.col("v") >= 0}
    )
    assert valid.count() == 1
    viol = {
        tuple(r["violated_rules"]) for r in violations.collect()
    }
    assert ("v_nonneg",) in viol and ("k_present",) in viol
    assert valid.count() + violations.count() == 4


def test_check_rules_null_outcome_is_violation(spark):
    """A rule must evaluate TRUE to pass: a NULL outcome (v >= 0 on a
    NULL v) is a violation, not a silent pass (round-5 edge-replay
    finding — ~NULL fell through the violation tagging before)."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, None)], "k int, v double"
    )
    valid, violations = check_rules(
        df, {"k_present": F.col("k").isNotNull(), "v_nonneg": F.col("v") >= 0}
    )
    assert [r["k"] for r in valid.collect()] == [1]
    viol = {r["k"]: tuple(r["violated_rules"]) for r in violations.collect()}
    assert viol[2] == ("v_nonneg",)
    assert viol[None] == ("k_present", "v_nonneg")


def test_check_rules_requires_rules(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        check_rules(df, {})


def test_stratified_sample_fractions(spark):
    events = load_table(spark, SF_SMOKE, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 1.0, "signup": 1.0, "error": 0.0}
    sampled = events.sampleBy("event_type", fractions, seed=42)
    got = {
        r["event_type"]: r["n"]
        for r in sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "error" not in got
    assert got["purchase"] == base["purchase"]  # fraction 1.0 keeps all
    assert got["signup"] == base["signup"]
    assert 0.25 * base["click"] < got.get("click", 0) < 0.75 * base["click"]
    assert got.get("view", 0) < 0.3 * base["view"]
    # deterministic under a fixed seed
    again = events.sampleBy("event_type", fractions, seed=42).count()
    assert again == sampled.count()
