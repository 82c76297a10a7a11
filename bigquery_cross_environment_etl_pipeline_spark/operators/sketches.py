"""Count-Min frequency sketch — deterministic, mergeable, exact-oracle.

The mergeable-summary family alongside the existing distinct/quantile
sketches (``distinct_users_bitmap``'s exact bitmaps,
``histogram_quantile_sketch``'s additive histograms,
``approx_distinct_and_quantiles``'s HLL/t-digest invariants): Count-Min
answers POINT FREQUENCY queries ("how often does this token occur?")
from a fixed O(depth x width) grid of counters, the summary a
vocabulary/tokenizer pipeline consults before materializing exact
counts for a 100 TB corpus.

Design (Cormode & Muthukrishnan 2005):

- cell(j, item) = hash_j(item) mod width for j in [0, depth);
  every occurrence increments its ``depth`` cells.
- estimate(item) = MIN over j of cell(j, item) — an OVERESTIMATE,
  never an under-estimate (each cell holds the item's true count plus
  non-negative collision mass). ``overestimate >= 0`` is therefore a
  structural invariant and rides every estimate this module emits.
- Partial sketches MERGE BY CELL-WISE ADDITION: building over the
  union of two corpora equals summing the two grids. In Spark this is
  literally the map-side-combined ``groupBy(depth, cell).count()`` —
  the shuffle carries at most depth*width rows per partition at ANY
  data size, the same contract as histogram_quantile_sketch.

Determinism: the hash family is the repo's 48-bit md5 hash
(operators/text.hash48) over a per-depth salt, so both engines build
bit-identical grids and the DuckDB oracle replays the sketch EXACTLY —
an "approximate" operator with an exact oracle, like _ivf_oracle /
_ann_lsh_oracle (the estimate is approximate w.r.t. the truth, but the
computation is a pure deterministic function of the data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash48

CM_DEPTH = 4
CM_WIDTH = 256


def cm_cell(item: Column, depth_idx: int, width: int = CM_WIDTH) -> Column:
    """The (salted-hash mod width) counter index of ``item`` at one
    depth — 'cm{j}:' salts give the depth rows independent hash
    functions from the single md5 family."""
    return hash48(F.concat(F.lit(f"cm{depth_idx}:"), item)) % F.lit(width)


def countmin_sketch(
    occurrences: DataFrame,
    item_col: str = "token",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the sketch grid from an occurrence stream (one row per
    occurrence, NOT per distinct item): returns (depth, cell, cnt)
    with at most depth*width rows.

    The explode fans each occurrence into its ``depth`` cells, and the
    groupBy count is map-side combinable — partial grids from every
    partition merge by addition, which is the Count-Min merge
    operation itself. Nothing item-sized survives the shuffle."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                cm_cell(F.col(item_col), j, width).alias("cell"),
            )
            for j in range(depth)
        ]
    )
    return (
        occurrences.select(F.explode(cells).alias("_c"))
        .select("_c.depth", "_c.cell")
        .groupBy("depth", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str = "token",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``items`` (any extra columns are
    carried through): MIN over the item's depth cells.

    The sketch side is at most depth*width rows — broadcast it, so the
    probe is a map-side join however large the item list is.

    The join is LEFT with an absent cell counting as 0 (ADVICE r8): a
    grid cell no occurrence ever hashed into simply has no (depth,
    cell) row, and an inner join would DROP that cell from the MIN —
    an out-of-vocabulary probe would read an inflated positive
    estimate from its surviving collision cells (or vanish entirely
    when all its cells are empty) instead of the correct Count-Min
    answer 0 (estimate = true count 0 + empty-cell collision mass 0).
    In-corpus probes are unaffected: every cell they hashed into holds
    at least their own occurrences."""
    carry = [c for c in items.columns if c != item_col]
    probes = items.select(
        item_col,
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        cm_cell(F.col(item_col), j, width).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(item_col, *carry, "_c.depth", "_c.cell")
    return (
        probes.join(F.broadcast(sketch), ["depth", "cell"], "left")
        .groupBy(item_col, *carry)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )
