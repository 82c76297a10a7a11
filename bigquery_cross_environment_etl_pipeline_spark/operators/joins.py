"""Join operators beyond plain equi-joins (north-star extensions).

Spark has no native AS-OF join (point-in-time lookup: for each left row,
the latest right row with ``right_ts <= left_ts`` on the same key).
Options, in preference order (pyspark guide "Common OLAP patterns"):

1. **union + last(ignorenulls) window** (implemented here) — tag both
   streams, union, and per key take the running "last seen right
   payload" ordered by time. ONE shuffle on the join key, no Python,
   state bounded by a single sort partition; at 100 TB this is a plain
   repartition+sort, the same cost as any sort-merge join.
2. ``applyInPandas`` + ``pd.merge_asof`` per key group — simpler but
   crosses the Arrow boundary and skews on hot keys.
3. Bucketize the time axis + equi-join on (key, bucket) + filter — for
   bounded-staleness variants.

Determinism: when several right rows share (key, ts), the winner is the
last in ``tie_cols`` order — callers should pre-dedupe or pass tie
columns; the test oracle pre-dedupes to one row per (key, ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right[right_ts] <= left[left_ts]`` and matching key (NULLs when no
    such row and ``how='left'``; inner drops them).

    Output: all left columns + ``right_payload`` columns.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    left_cols = left.columns
    right_types = dict(right.dtypes)

    lu = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),  # left sorts AFTER right at equal ts
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right_types[c]).alias(c) for c in right_payload],
    )
    ru = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
        *[F.col(c) for c in right_payload],
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = lu.unionByName(ru).select(
        "_src",
        *[F.col(c) for c in left_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_payload],
    )
    out = filled.filter(F.col("_src") == 1).drop("_src")
    if how == "inner":
        out = out.filter(F.col(right_payload[0]).isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list,
    range_cond,
) -> DataFrame:
    """Equi + range join: equality keys narrow the shuffle, the range
    predicate filters within co-partitioned groups. Without the equality
    component Spark would fall back to a nested-loop join — callers must
    provide at least one equi key for scale."""
    cond = None
    for c in on:
        term = c if not isinstance(c, str) else (left[c] == right[c])
        cond = term if cond is None else cond & term
    return left.join(right, cond & range_cond)
