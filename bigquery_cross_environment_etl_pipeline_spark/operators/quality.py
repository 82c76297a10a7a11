"""Data-quality profiling and validation.

The reference only aspires to this ("Data Quality: Implement data
validation checks", reference README.md:349); here it is a real
operator: one aggregation pass produces per-column completeness and
range stats, and a declarative rule check splits a frame into
valid/violations with per-rule accounting (the generalization of the
load verdict's row predicate, operators/load.py).

Scale notes: the profile is ONE grouped-less aggregate — every metric
is a partial-aggregatable expression, so 100 TB profiles in a single
scan with a scalar shuffle. Rule checks are pure filters (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str) per column — exact counts (the approximate form
    would swap approx_count_distinct)."""
    cols = columns or df.columns
    parts = []
    for c in cols:
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_nulls"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c).cast("string")).alias("min_str"),
                F.max(F.col(c).cast("string")).alias("max_str"),
            ).alias(c)
        )
    wide = df.agg(*parts)
    stacked = wide.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("p")
    )
    return stacked.select("p.*")


def check_rules(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Declarative validation: ``rules`` maps rule-name -> boolean
    Column. Returns (valid_rows, violations) where violations carry a
    ``violated_rules`` array naming every failed rule."""
    if not rules:
        raise ValueError("at least one rule required")
    names = sorted(rules)
    flags = F.array(
        *[F.when(~rules[n], F.lit(n)).otherwise(F.lit(None)) for n in names]
    )
    tagged = df.withColumn(
        "violated_rules", F.filter(flags, lambda x: x.isNotNull())
    )
    valid = tagged.filter(F.size("violated_rules") == 0).drop("violated_rules")
    violations = tagged.filter(F.size("violated_rules") > 0)
    return valid, violations
