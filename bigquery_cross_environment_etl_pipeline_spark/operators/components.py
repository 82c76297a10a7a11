"""Connected components over near-duplicate pair edges.

The dedup finisher: MinHash/SimHash/Jaccard stages emit PAIRS; turning
pairs into dedup groups (one keeper per cluster) is a connected-
components problem. Implemented as iterative min-label propagation on
DataFrames — each iteration is one join + grouped min (all distributed),
the driver only checks the convergence counter.

Scale notes: this is the alternating large-star/small-star family's
simple cousin; iterations are O(diameter) and near-dup clusters are
shallow (stars/cliques), so 3-5 rounds converge in practice. Each round
shuffles O(edges) on node id. ``localCheckpoint`` truncates the
exponentially-growing lineage between rounds (the classic iterative-
DataFrame pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 10,
) -> DataFrame:
    """(node, component) — component = min node id reachable via edges.

    ``edges`` is an undirected pair list; isolated nodes absent from it
    simply never appear (callers union them in if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # initial label: min(self, min neighbor)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
    )
    for _ in range(max_iter):
        # propagate: my new label = min(my label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Assign every document a cluster id (= keeper id): documents in a
    near-dup component share its min doc id; singletons keep their own."""
    comp = connected_components(pairs)
    return (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
    )
