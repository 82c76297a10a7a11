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
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterative import iter_checkpoint

#: Link-count bound under which the closure is walked on the driver
#: (same hybrid design as components.DRIVER_UF_MAX_EDGES): an org/
#: category hierarchy's LINK table is one row per node — tiny relative
#: to the facts that join against the closure — so the walk is usually
#: driver-cheap; past the bound the distributed doubling runs unchanged.
DRIVER_CLOSURE_MAX_LINKS = int(
    os.environ.get("SPARK_GRAFT_CLOSURE_DRIVER_LINKS", "1000000")
)


def ancestor_closure(
    links: DataFrame, max_depth: int, driver_threshold: int | None = None
) -> DataFrame:
    """All (node, ancestor) pairs reachable through ``links`` (columns
    ``node``, ``parent``; proper ancestors only — no self-pairs).

    ``max_depth`` bounds the hierarchy depth; the distributed path
    converges in ``ceil(log2(max_depth)) + 1`` doubling rounds
    regardless of node count. Below ``driver_threshold`` links the
    closure is walked on the driver instead (bounded collect — the
    parent map is one int pair per node) and returned as one
    DataFrame; both paths produce the identical pair set.
    """
    if driver_threshold is None:
        driver_threshold = DRIVER_CLOSURE_MAX_LINKS
    base = iter_checkpoint(
        links.select(F.col("node"), F.col("parent").alias("anc"))
    )
    rounds = max(1, math.ceil(math.log2(max(2, max_depth))))
    # both paths close paths up to the SAME horizon (2^rounds), so an
    # underestimated max_depth truncates identically instead of the
    # result silently depending on which path the data size selects
    horizon = 2 ** rounds
    if base.count() <= driver_threshold:
        parent = {r["node"]: r["anc"] for r in base.collect()}
        pairs = set()
        for n in parent:
            a = parent[n]
            hops = 1
            while True:
                pairs.add((n, a))
                if a not in parent or hops >= horizon:
                    break
                a = parent[a]
                hops += 1
        spark = base.sparkSession
        from pyspark.sql.types import StructField, StructType

        t = base.schema["node"].dataType
        schema = StructType(
            [StructField("node", t, False), StructField("anc", t, False)]
        )
        return spark.createDataFrame(sorted(pairs), schema)
    cl = base
    for _ in range(rounds):
        extended = (
            cl.alias("x")
            .join(cl.alias("y"), F.col("x.anc") == F.col("y.node"))
            .select(F.col("x.node").alias("node"), F.col("y.anc").alias("anc"))
        )
        cl = iter_checkpoint(cl.union(extended).distinct())
    return cl
