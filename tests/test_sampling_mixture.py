"""Structural invariants for the round-8 sampling/mixture operators.

Oracle parity proves engine agreement; these pin the properties the
operators exist FOR: exact per-stratum sample size, displacement-only
incremental consistency, and temperature flattening actually
up-weighting small sources."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _bottomk(spark, rows, k=5):
    from bigquery_cross_environment_etl_pipeline_spark.operators import text

    df = spark.createDataFrame(rows, "event_id long, event_type string")
    h = text.hash48(F.concat(F.lit("res-"), F.col("event_id").cast("string")))
    from pyspark.sql import Window as W

    win = W.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        df.filter(F.col("event_id").isNotNull())
        .select("event_id", "event_type", F.row_number().over(win).alias("r"))
        .filter(F.col("r") <= k)
    )


def test_bottomk_emits_exactly_min_k_per_stratum(spark):
    rows = [(i, "big") for i in range(1, 21)] + [(100, "small"), (101, "small")]
    out = _bottomk(spark, rows).groupBy("event_type").count().collect()
    sizes = {r["event_type"]: r["count"] for r in out}
    assert sizes == {"big": 5, "small": 2}


def test_bottomk_growth_only_displaces(spark):
    """Adding rows to a stratum can only displace current members,
    never reshuffle the survivors — the incremental-maintenance
    property (new member iff its hash beats the current max)."""
    base = [(i, "t") for i in range(1, 30)]
    before = {r["event_id"] for r in _bottomk(spark, base).collect()}
    after = {
        r["event_id"] for r in _bottomk(spark, base + [(999, "t")]).collect()
    }
    # survivors of the old sample stay unless 999 displaced exactly one
    assert len(after) == 5
    assert len(before - after) in (0, 1)
    assert (before - after == set()) == (999 not in after)


def test_mixture_temperature_flattens_toward_small_sources(spark):
    """alpha=1/2 gives a small source MORE than its proportional share
    and a big source LESS — the point of temperature reweighting; the
    integer Q20 pipeline must preserve that ordering."""
    docs = spark.createDataFrame(
        [(1, "big", " ".join(["w"] * 900)), (2, "small", " ".join(["w"] * 100))],
        "doc_id long, source string, text string",
    )
    from bigquery_cross_environment_etl_pipeline_spark.operators import text

    per = docs.groupBy("source").agg(
        F.sum(text.token_count("text")).cast("bigint").alias("n")
    )
    rows = {r["source"]: r["n"] for r in per.collect()}
    assert rows == {"big": 900, "small": 100}
    w = {s: math.floor(math.sqrt(n) * (1 << 20)) for s, n in rows.items()}
    denom = sum(w.values())
    budget = 1_000_000
    share = {s: budget * w[s] // denom for s in w}
    # proportional would be 900k/100k; sqrt flattening moves both
    # toward the middle
    assert share["big"] < 900_000
    assert share["small"] > 100_000
    # and the small source needs upsampling to hit its target
    assert share["small"] > rows["small"]
