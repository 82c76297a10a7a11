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
    ``violated_rules`` array naming every failed rule.

    A rule passes only when it evaluates TRUE: a NULL outcome (e.g.
    ``value >= 0`` on a NULL value) is a VIOLATION, not a pass —
    before round 5's edge replay, ``~NULL = NULL`` fell through the
    violation tagging and NULL-valued rows silently validated."""
    if not rules:
        raise ValueError("at least one rule required")
    names = sorted(rules)
    flags = F.array(
        *[
            F.when(~F.coalesce(rules[n], F.lit(False)), F.lit(n)).otherwise(
                F.lit(None)
            )
            for n in names
        ]
    )
    tagged = df.withColumn(
        "violated_rules", F.filter(flags, lambda x: x.isNotNull())
    )
    valid = tagged.filter(F.size("violated_rules") == 0).drop("violated_rules")
    violations = tagged.filter(F.size("violated_rules") > 0)
    return valid, violations


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Reconciliation diff of two snapshots of the same logical table —
    the post-load validation step an ETL runs between source and
    destination (or between yesterday's and today's load): per key,
    classify as ``added`` (only in ``b``), ``removed`` (only in ``a``),
    ``changed`` (both, differing fingerprint) or ``unchanged``.

    Rows are reduced to a 16-byte md5 fingerprint of the compared
    columns BEFORE the join, so the full-outer join shuffles
    (key, digest) pairs — never the row bodies. At 100 TB both sides
    shuffle once on the key (or zero times if both snapshots are
    bucketed by it); the fingerprint comparison is the same
    content-digest trick exact dedup uses (operators/dedup.py).

    The encoding is COLLISION-SAFE for nulls and delimiters: each
    value is length-prefixed (``len:value``) and NULL gets a distinct
    marker — a plain ``concat_ws`` silently skips NULL columns and
    cannot tell ``('a|b','c')`` from ``('a','b|c')``, so a diff built
    on it classifies genuinely restated rows as unchanged.
    """

    def fingerprint(df: DataFrame, side: str) -> DataFrame:
        parts = []
        for c in compare_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.coalesce(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s),
                    F.lit("␀null"),
                )
            )
        fp = F.md5(F.concat(*parts))
        return df.select(*keys, fp.alias(f"_fp_{side}"))

    joined = fingerprint(a, "a").join(fingerprint(b, "b"), keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_fp_a").isNull(), "added")
        .when(F.col("_fp_b").isNull(), "removed")
        .when(F.col("_fp_a") != F.col("_fp_b"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )
