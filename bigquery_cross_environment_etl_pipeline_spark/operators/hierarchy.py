"""Recursive-hierarchy closure — the RECURSIVE CTE surface Spark lacks.

BigQuery/DuckDB express ancestor walks with ``WITH RECURSIVE``; Spark
has no recursive operator, so the engine provides the standard
DataFrame equivalent: ancestor-link DOUBLING. Round k joins the closure
to itself, extending every known (node, ancestor) link through the
ancestor's own links — path lengths 1..2^k after k rounds, so a
hierarchy of depth d closes in ceil(log2(d)) + 1 joins.

Scale notes: materializing a closure is O(nodes × depth) rows — the
right tool for BOUNDED-depth hierarchies (org charts, category trees,
folder structures: depth ≲ 20 even at billions of nodes), where each
doubling round is one self-join shuffle on the link key and the row
count stays ~depth × nodes. For unbounded general graphs use the
label-propagation machinery (operators/components.py) instead of a
closure. Each round ``localCheckpoint``s to keep plan depth constant
(same iterative-lineage discipline as components/pagerank/kmeans).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterative import iter_checkpoint


def ancestor_closure(links: DataFrame, max_depth: int) -> DataFrame:
    """All (node, ancestor) pairs reachable through ``links`` (columns
    ``node``, ``parent``; proper ancestors only — no self-pairs).

    ``max_depth`` bounds the hierarchy depth; the closure converges in
    ``ceil(log2(max_depth)) + 1`` doubling rounds regardless of node
    count.
    """
    cl = iter_checkpoint(
        links.select(F.col("node"), F.col("parent").alias("anc"))
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_depth))))
    for _ in range(rounds):
        extended = (
            cl.alias("x")
            .join(cl.alias("y"), F.col("x.anc") == F.col("y.node"))
            .select(F.col("x.node").alias("node"), F.col("y.anc").alias("anc"))
        )
        cl = iter_checkpoint(cl.union(extended).distinct())
    return cl
