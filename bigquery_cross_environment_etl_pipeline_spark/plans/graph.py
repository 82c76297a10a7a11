"""Iterative graph analytics over the trade network (engine extension).

The reference has no iterative operators (its only loop is the retry
envelope, ``core/services/billing_etl.py:144``), but a scale-out engine
needs the *pattern*: a driver-side fixed-point loop over DataFrames where
the heavy lifting (edge aggregation from the fact table) is distributed
and the per-iteration state (one row per graph node) is broadcast.

PageRank here runs in scaled-integer arithmetic so the result is
bit-exact and order-independent — every contribution is
``(85 * rank * w) DIV (100 * out_w)`` on integers, which both Spark
(``DIV`` on DECIMAL, truncating) and DuckDB (``//`` on HUGEINT) compute
identically for non-negative operands.  No floating point appears until
never: the published rank stays a scaled BIGINT.

Scale notes (100 TB): the only data-sized work is the one-pass edge
aggregation (lineitem ⋈ orders ⋈ customer, lineitem ⋈ supplier) — two
shuffle joins on the fact table's own keys followed by a 625-row-max
aggregate.  The 5 iterations touch just the 25-node rank vector, which
is broadcast to the (tiny, cached) edge relation; iteration cost is
independent of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.iterative import iter_checkpoint
from pyspark.sql import Window as W

from ..queries_catalog import register
from ..sources.registry import load_table

# Total rank mass, in integer micro-units (1e12 ≈ 12 significant digits).
_SCALE = 1_000_000_000_000
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as a ratio
_ITERS = 5

# (85 * rank * w) can exceed int64 at large scale factors (w ~ rows per
# nation pair), so the product is computed in DECIMAL(38,0) and reduced
# back to BIGINT by the integral division.
_CONTRIB = (
    "(CAST(85 AS DECIMAL(20,0)) * CAST(rank AS DECIMAL(20,0))"
    " * CAST(w AS DECIMAL(20,0)))"
    " DIV (CAST(100 AS DECIMAL(20,0)) * CAST(outw AS DECIMAL(20,0)))"
)


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge list of the nation trade graph: customer-nation -> supplier-
    nation, weighted by lineitem count.  Fact-table joins are left to
    AQE (customer/supplier scale with SF, so no forced broadcast); the
    output is at most |nation|^2 = 625 rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("outw", F.sum("w").over(W.partitionBy("src")))
    )


def pagerank_scaled(
    spark: SparkSession, sf_dir: str, iters: int = _ITERS
) -> DataFrame:
    """Fixed-iteration PageRank in scaled-integer arithmetic.

    rank_{k+1}(j) = base + sum_i (85 * rank_k(i) * w_ij) DIV (100 * out_i)
    with base = (SCALE * 15) DIV (100 * N).  The rank vector is one row
    per nation; each iteration broadcasts it against the cached edge
    relation.  Driver-side scalars only touch the 25-row nation dim.
    """
    nation = load_table(spark, sf_dir, "nation")
    n_nodes = nation.count()  # fixed-size dimension (25 rows at every SF)
    base = (_SCALE * 15) // (100 * n_nodes)

    edges = trade_edges(spark, sf_dir).cache()
    nodes = nation.select(F.col("n_nationkey").alias("nationkey"))
    ranks = nodes.withColumn("rank", F.lit(_SCALE // n_nodes).cast("long"))

    for _ in range(iters):
        contrib = (
            edges.join(F.broadcast(ranks), edges.src == ranks.nationkey)
            .select(F.col("dst").alias("nationkey"), F.expr(_CONTRIB).alias("c"))
            .groupBy("nationkey")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contrib, "nationkey", "left").select(
            "nationkey",
            (F.lit(base) + F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("rank"),
        )
        # truncate lineage each iteration (as kmeans_refine does,
        # operators/similarity.py): keeps plan depth constant so the
        # loop scales to arbitrary iteration counts. Eager + tiny
        # (one row per nation), so the materialization is free.
        ranks = iter_checkpoint(ranks)

    return ranks.join(
        F.broadcast(nation), ranks.nationkey == nation.n_nationkey
    ).select("n_name", F.col("rank").alias("pagerank_scaled"))


def _oracle() -> str:
    """Unrolled-iteration DuckDB equivalent (no recursive CTE needed for
    a fixed iteration count); HUGEINT keeps the integer products exact."""
    head = """
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS HUGEINT) AS w
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      GROUP BY 1, 2
    ),
    edgeo AS (
      SELECT src, dst, w, SUM(w) OVER (PARTITION BY src) AS outw FROM edges
    ),
    nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM nation),
    r0 AS (
      SELECT n_nationkey AS nationkey,
             1000000000000::HUGEINT // (SELECT n FROM nn) AS rank
      FROM nation
    )"""
    step = """,
    r{next} AS (
      SELECT n.nationkey,
             (1000000000000::HUGEINT * 15) // (100::HUGEINT * (SELECT n FROM nn))
             + COALESCE((
                 SELECT SUM((85::HUGEINT * r.rank * e.w)
                            // (100::HUGEINT * e.outw))
                 FROM edgeo e JOIN r{cur} r ON e.src = r.nationkey
                 WHERE e.dst = n.nationkey), 0::HUGEINT) AS rank
      FROM r{cur} n
    )"""
    tail = f"""
    SELECT n_name, CAST(r.rank AS BIGINT) AS pagerank_scaled
    FROM r{_ITERS} r JOIN nation ON r.nationkey = n_nationkey
    """
    return (
        head
        + "".join(step.format(cur=k, next=k + 1) for k in range(_ITERS))
        + tail
    )


@register("nation_trade_pagerank", oracle=_oracle())
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the customer-nation -> supplier-nation
    trade graph: 5 damped iterations, scaled-integer exact.  Extension
    beyond the reference (which has no iterative dataflow; its schema's
    org/project routing is the graph-shaped part, SURVEY.md §2.12)."""
    return pagerank_scaled(spark, sf_dir)


# --- triangle counting ------------------------------------------------------
_TRI_EDGES_SQL = """
    WITH e0 AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ), e AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0 WHERE src <> dst
    ), t AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
"""


@register(
    "nation_trade_triangles",
    oracle=_TRI_EDGES_SQL
    + """
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (
      SELECT a AS k FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    ) x JOIN nation ON x.k = nation.n_nationkey
    GROUP BY n_name
    """,
)
def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the undirected nation trade graph — the
    clustering-structure primitive beside PageRank. Canonical
    vertex-ordered edge-list form: every triangle (a < b < c)
    materializes exactly once from two self-joins of the oriented edge
    list, then each member nation is credited.

    Scale notes: the data-sized work is the SAME one-pass fact
    aggregation PageRank uses (edges ≤ |nation|² rows); the self-joins
    touch only the contracted edge list. On a graph whose edge list
    itself is huge, the standard refinement is degree-ordering the
    orientation (low-degree → high-degree) so each wedge list stays
    bounded — the orientation column swap is the only change."""
    edges0 = trade_edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    e = (
        edges0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        # the wedge join and the closing join both re-read this tiny
        # (≤625-row) relation — materialize once, broadcast both sides
        .transform(iter_checkpoint)
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e1.b") == F.col("e2.a"))
        .join(
            F.broadcast(e3),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"), F.col("e2.b").alias("c"))
    )
    members = (
        tri.select(F.col("a").alias("k"))
        .unionAll(tri.select(F.col("b").alias("k")))
        .unionAll(tri.select(F.col("c").alias("k")))
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        members.join(F.broadcast(nation), members.k == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


# --- single-source shortest paths (Bellman-Ford relaxation) -----------------
_SSSP_ITERS = 6
_SSSP_SOURCE = 0


def _sssp_oracle(iters: int = _SSSP_ITERS, source: int = _SSSP_SOURCE) -> str:
    """Unrolled min-plus relaxation in DuckDB — one tiny CTE per
    iteration (the pagerank-oracle pattern; a recursive CTE would
    enumerate paths combinatorially on this dense graph). The NULL
    handling is an explicit CASE, identical on both engines, so no
    engine-specific least/NULL semantics are in play."""
    head = f"""
    WITH edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             GREATEST(1::BIGINT, 1000000::BIGINT // CAST(COUNT(*) AS BIGINT))
               AS cost
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      GROUP BY 1, 2
    ),
    d0 AS (
      SELECT n_nationkey AS k,
             CASE WHEN n_nationkey = {source}
                  THEN 0::BIGINT END AS d
      FROM nation
    )"""
    step = """,
    d{next} AS (
      SELECT n.k,
             CASE WHEN n.d IS NULL THEN m.c
                  WHEN m.c IS NULL THEN n.d
                  WHEN m.c < n.d THEN m.c
                  ELSE n.d END AS d
      FROM d{cur} n LEFT JOIN (
        SELECT e.dst AS k, MIN(p.d + e.cost) AS c
        FROM edges e JOIN d{cur} p ON e.src = p.k
        WHERE p.d IS NOT NULL
        GROUP BY e.dst
      ) m ON n.k = m.k
    )"""
    tail = f"""
    SELECT n_name, d.d AS dist
    FROM d{iters} d JOIN nation ON d.k = n_nationkey
    WHERE d.d IS NOT NULL
    """
    return (
        head
        + "".join(step.format(cur=k, next=k + 1) for k in range(iters))
        + tail
    )


@register("nation_trade_shortest_paths", oracle=_sssp_oracle())
def nation_trade_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths over the weighted trade graph —
    Bellman-Ford as distributed min-plus relaxation, the third
    iterative-graph primitive beside PageRank and triangles. Edge cost
    is integer ``GREATEST(1, 1000000 DIV w)`` (stronger trade = cheaper
    hop), so every relaxation is exact integer math with a
    deterministic fixed point; ``_SSSP_ITERS`` bounded iterations cover
    the graph's diameter with margin, and BOTH engines run exactly that
    many relaxations, so parity holds even pre-convergence.

    Scale notes: identical shape to pagerank_scaled — the data-sized
    work is the one-pass fact-table edge aggregation; each iteration
    broadcasts the |V|-row distance vector against the cached edge
    relation and costs O(|E|) independent of corpus size, with
    iter_checkpoint keeping plan depth constant. On a huge graph the
    same loop runs with the distance vector as a shuffled (not
    broadcast) relation — only the join hint changes."""
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        trade_edges(spark, sf_dir)
        .select(
            "src",
            "dst",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("CAST(1000000 AS BIGINT) DIV w"),
            ).alias("cost"),
        )
        .cache()
    )
    nodes = nation.select(F.col("n_nationkey").alias("k"))
    dist = nodes.withColumn(
        "d",
        F.when(F.col("k") == _SSSP_SOURCE, F.lit(0).cast("long")),
    )
    for _ in range(_SSSP_ITERS):
        reach = dist.filter(F.col("d").isNotNull()).select(
            F.col("k").alias("_src"), F.col("d").alias("_d")
        )
        relax = (
            edges.join(F.broadcast(reach), edges.src == F.col("_src"))
            .select(
                F.col("dst").alias("k"),
                (F.col("_d") + F.col("cost")).alias("cand"),
            )
            .groupBy("k")
            .agg(F.min("cand").alias("c"))
        )
        dist = (
            dist.join(relax, "k", "left")
            .select(
                "k",
                F.when(F.col("d").isNull(), F.col("c"))
                .when(F.col("c").isNull(), F.col("d"))
                .when(F.col("c") < F.col("d"), F.col("c"))
                .otherwise(F.col("d"))
                .alias("d"),
            )
            .transform(iter_checkpoint)
        )
    return (
        dist.filter(F.col("d").isNotNull())
        .join(F.broadcast(nation), dist.k == nation.n_nationkey)
        .select("n_name", F.col("d").alias("dist"))
    )
