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


def test_mixture_temperature_flattens_toward_small_sources(spark, tmp_path):
    """alpha=1/2 gives a small source MORE than its proportional share
    and a big source LESS — the point of temperature reweighting.
    Driven through the REGISTERED plan (a temp documents.parquet fed
    to the query), so a regression anywhere in the Spark expression
    chain — Q-scale constant, DIV vs /, the upsampled comparison —
    fails here, not only at oracle-parity time."""
    # corpus larger than the 1M-token budget, 9:1 across sources, so
    # the big source is NOT upsampled while the flattened small one is
    chunk = " ".join(["w"] * 100_000)
    rows = [(i, "big", chunk) for i in range(9)] + [(9, "small", chunk)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")

    from bigquery_cross_environment_etl_pipeline_spark.plans.llm import (
        mixture_temperature_targets,
    )

    out = {
        r["source"]: r
        for r in mixture_temperature_targets(spark, sf_dir).collect()
    }
    assert out["big"]["n_tokens"] == 900_000
    assert out["small"]["n_tokens"] == 100_000
    # the plan's weights must equal the reference Q20 arithmetic
    for s, n in (("big", 900_000), ("small", 100_000)):
        assert out[s]["weight_q20"] == math.floor(math.sqrt(n) * (1 << 20))
    # proportional would be 900k/100k; sqrt flattening moves both
    # toward the middle (3:1 instead of 9:1), and only the small
    # source needs upsampling
    assert out["big"]["target_tokens"] == 750_000
    assert out["small"]["target_tokens"] == 249_999
    assert out["small"]["upsampled"] is True
    assert out["big"]["upsampled"] is False
    # the split exhausts the budget up to integer-division remainder
    total = out["big"]["target_tokens"] + out["small"]["target_tokens"]
    assert 999_998 <= total <= 1_000_000
