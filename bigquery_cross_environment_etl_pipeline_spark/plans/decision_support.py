"""Decision-support analytics (TPC-H Q7/Q21/Q22 shapes) + native LISTAGG.

The reference's destination schema is a star built for exactly this kind
of rollup (SURVEY.md §2.4 'the engine's generalized surface'); these
queries exercise the join/agg planner shapes the earlier catalog entries
don't: a two-armed dimension join with an inequality filter between the
arms (Q7), a semi-join *and* a correlated anti-join against the same
fact table (Q21), and a scalar-aggregate threshold with an anti-join
(Q22).  All money math is DECIMAL-exact per the catalog conventions.

Scale notes (100 TB): Q7/Q21 shuffle the fact table on its own join
keys once (orderkey / suppkey); nation is broadcast.  Q21's l2/l3
predicates are self-joins on l_orderkey — co-partitioned with the l1
shuffle, so AQE plans them without an extra exchange of the big side.
Q22's scalar threshold is a one-row aggregate cross-joined (broadcast)
to customer, and the NOT EXISTS is a left-anti shuffle join on custkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..queries_catalog import register
from ..sources.registry import load_table, register_all


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


def _dec2(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# --- TPC-H Q7 shape: bilateral trade volume ---------------------------------
@register(
    "bilateral_trade_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analog: revenue shipped between distinct nation pairs per year.
    Two independent dimension arms (customer-side and supplier-side
    nation) hang off one fact scan; the cross-arm inequality filter runs
    after both broadcasts.  Generalizes the multi-tenant routing join J1
    (SURVEY.md §2.3) to a two-sided flow."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    cn = F.broadcast(nation.select(F.col("n_nationkey").alias("cnk"),
                                   F.col("n_name").alias("cust_nation")))
    sn = F.broadcast(nation.select(F.col("n_nationkey").alias("snk"),
                                   F.col("n_name").alias("supp_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, cust.c_nationkey == F.col("cnk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("snk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))), 2)
            .cast("double")
            .alias("revenue")
        )
    )


# --- TPC-H Q21 shape: semi + anti join on the same fact ---------------------
@register(
    "slow_suppliers_multi_anti",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o   ON l1.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
)
def slow_suppliers_multi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analog: suppliers who were the last to ship in a multi-
    supplier finished order, 90+ days after it was placed.  One fact
    scan feeds a semi-join (another supplier exists) and a correlated
    anti-join (nobody shipped later) against itself — the heavy-duty
    generalization of the existence checks J2 (SURVEY.md §2.3).  All
    three lineitem sides shuffle on l_orderkey, so the exchanges reuse
    one co-partitioning."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    l1 = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.k3)
            & (F.col("l_suppkey") != l3.s3)
            & (l3.d3 > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- TPC-H Q22 shape: scalar-aggregate threshold + anti join ----------------
@register(
    "idle_customer_balance",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(18,4))
            * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4)))
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog: per-segment count/balance of above-average-balance
    customers with no orders.  The global average is compared by cross-
    multiplication (bal * n > total) so the threshold stays DECIMAL-
    exact — no engine-specific decimal-division rounding.  The one-row
    aggregate is broadcast; the no-orders predicate is a left-anti
    join (J2's anti-join form, SURVEY.md §2.3)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    stats = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal")).alias("tot"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        cust.join(F.broadcast(stats))
        .filter(_dec("c_acctbal") * F.col("cnt") > F.col("tot"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


# --- TPC-H Q8 shape: conditional-aggregate market share ---------------------
@register(
    "regional_market_share",
    oracle="""
    SELECT EXTRACT(year FROM l.l_shipdate) AS l_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS mkt_share,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
             AS total_revenue
    FROM lineitem l
    JOIN part p     ON l.l_partkey  = p.p_partkey AND p.p_type = 'ECONOMY'
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def regional_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analog: NATION_5's share of ECONOMY-part revenue sold to ASIA
    customers, per ship year.  Conditional aggregation (CASE inside SUM)
    on DECIMAL keeps both the numerator and denominator exact; the share
    itself is one IEEE division of the two exact sums, so it is bitwise
    reproducible.  Exercises the widest join tree in the catalog: fact ⋈
    part ⋈ orders ⋈ customer ⋈ nation ⋈ region (+ supplier arm)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = F.broadcast(
        nation.join(
            region.filter(F.col("r_name") == "ASIA"),
            nation.n_regionkey == region.r_regionkey,
        ).select(F.col("n_nationkey").alias("cnk"))
    )
    sn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("snk"),
                      F.col("n_name").alias("supp_nation"))
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(asia_nations, cust.c_nationkey == F.col("cnk"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, supp.s_nationkey == F.col("snk"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", disc_price).otherwise(zero)
    )
    den = F.sum(disc_price)
    return joined.groupBy(
        F.year("l_shipdate").cast("bigint").alias("l_year")
    ).agg(
        (num.cast("double") / den.cast("double")).alias("mkt_share"),
        F.round(den, 2).cast("double").alias("total_revenue"),
    )


# --- LATERAL correlated subquery join ---------------------------------------
@register(
    "lateral_top_customer_per_nation",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 1
    ) t
    """,
)
def lateral_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (Spark 3.2+ lateral join): richest
    customer per nation, written the way an analyst ports it from a
    warehouse.  Catalyst decorrelates the per-row ORDER BY ... LIMIT 1
    into a ranked join rather than a nested loop — the declarative
    sibling of the window-function form in top3_orders_per_customer."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 1
        ) t
        """
    )


# --- native ordered LISTAGG --------------------------------------------------
@register(
    "nation_segments_listagg",
    oracle="""
    SELECT n.n_name,
           string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment)
             AS segments
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def nation_segments_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native SQL LISTAGG ... WITHIN GROUP (Spark 4) — the deterministic
    ordered string aggregate, complementing the collect_set/array_join
    shape of user_event_types_csv (F8 string surface, SURVEY.md §2.8)."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               listagg(DISTINCT c_mktsegment, ',')
                 WITHIN GROUP (ORDER BY c_mktsegment) AS segments
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


# --- TPC-H Q17 shape: correlated-average threshold ---------------------------
@register(
    "small_order_revenue_q17",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qsum,
             CAST(COUNT(*) AS BIGINT) AS qcnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE), 2) AS DOUBLE) AS small_order_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pa.qcnt < pa.qsum
    GROUP BY p.p_brand
    """,
)
def small_order_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analog: revenue from order lines smaller than 20% of their
    part's average quantity — the correlated-scalar-subquery shape.
    Catalyst decorrelates it into what this plan writes explicitly: one
    per-part aggregate joined back to the fact (fact shuffles once on
    its own partkey — the aggregate reuses the same exchange). The
    threshold comparison is DIVISION-FREE algebra
    (5·q·cnt < Σq  ⇔  q < 0.2·avg, all operands positive), so both
    engines compare exact DECIMALs — no division-rounding drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    pa = li.groupBy("l_partkey").agg(
        F.sum(qdec).alias("qsum"), F.count(F.lit(1)).alias("qcnt")
    )
    small = (
        li.join(pa, "l_partkey")
        .filter(qdec * 5 * F.col("qcnt") < F.col("qsum"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return small.groupBy("p_brand").agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
        )
        .cast("double")
        .alias("small_order_revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- TPC-H Q15 shape: argmax against a scalar aggregate ----------------------
@register(
    "top_supplier_revenue_q15",
    oracle="""
    WITH sr AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1995-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_name, s.s_nationkey,
           CAST(round(CAST(sr.rev AS DOUBLE), 2) AS DOUBLE) AS total_revenue
    FROM sr JOIN supplier s ON sr.l_suppkey = s.s_suppkey
    WHERE sr.rev = (SELECT max(rev) FROM sr)
    """,
)
def top_supplier_revenue_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 analog: the supplier(s) with maximum quarterly revenue — the
    view-plus-scalar-subquery shape. Naively joining the view against
    its own ``max()`` makes Spark compute the aggregation twice (TWO
    fact scans — verified in the plan); expressing the scalar as a
    whole-relation window max over the already-aggregated (supplier-
    sized) view keeps the fact scan single. Revenue in exact DECIMAL
    end to end, so the `rev = max(rev)` equality — notoriously flaky in
    float — is exact in both engines; ties all surface."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    sr = (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(price * disc).alias("rev"))
    )
    # window over the AGGREGATED relation (one row per supplier): the
    # single-partition gather touches |suppliers| rows, not the fact
    best = sr.withColumn("mx", F.max("rev").over(W.partitionBy()))
    return (
        best.filter(F.col("rev") == F.col("mx"))
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "s_name",
            "s_nationkey",
            F.round(F.col("rev").cast("double"), 2).cast("double").alias("total_revenue"),
        )
    )


# --- TPC-H Q2 shape: per-group argmin with attribution -----------------------
@register(
    "cheapest_line_supplier_q2",
    oracle="""
    SELECT p_partkey, p_name, s_name, best_price
    FROM (
      SELECT l.l_partkey AS p_partkey, p.p_name, s.s_name,
             CAST(round(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             AS DOUBLE), 2) AS DOUBLE) AS best_price,
             row_number() OVER (
               PARTITION BY l.l_partkey
               ORDER BY CAST(l.l_extendedprice AS DECIMAL(18,2)),
                        l.l_suppkey, l.l_orderkey, l.l_linenumber
             ) AS rn
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE p.p_size <= 10 AND l.l_extendedprice IS NOT NULL
    ) WHERE rn = 1
    """,
)
def cheapest_line_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: for each small part, the supplier offering its
    cheapest order line — per-group argmin WITH attribution (the shape
    naive SQL writes as a correlated `= (SELECT min ...)`, which
    double-scans; the window rank scans once). Deterministic total
    tie-break (price, suppkey, orderkey, linenumber); price compared in
    DECIMAL. The p_size predicate pushes into the part scan and prunes
    the fact join via the join key. Pricing contract (edge-replay
    finding): only PRICED lines compete — a NULL price would rank
    first under Spark's NULLS FIRST and last under DuckDB's NULLS
    LAST."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    pdec = F.col("l_extendedprice").cast("decimal(18,2)")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            pdec.alias("_price"),
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
        )
    )
    w = W.partitionBy("p_partkey").orderBy(
        "_price", "l_suppkey", "l_orderkey", "l_linenumber"
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round(F.col("_price").cast("double"), 2).cast("double").alias("best_price"),
        )
    )


# --- TPC-H Q9 shape: multi-dim profit rollup ---------------------------------
@register(
    "nation_year_profit_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(round(CAST(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(3,1))
           ) AS DOUBLE), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%a%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def nation_year_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: profit (revenue minus a retail-price-proxied supply
    cost — the dataset carries no partsupp) by supplier nation and
    order year, over a five-table join with a part-name predicate. The
    fact shuffles on its own keys (orderkey, then partkey/suppkey
    broadcast); all money math in DECIMAL with one final rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
        * F.lit(0.1).cast("decimal(3,1)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(F.sum(price * disc - cost).cast("double"), 2)
            .cast("double")
            .alias("profit")
        )
    )


# --- TPC-H Q13 shape: distribution of counts ---------------------------------
@register(
    "customer_order_distribution_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority NOT LIKE '1%'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def customer_order_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 analog: the distribution of per-customer order counts,
    INCLUDING zero-order customers — the left-join-then-double-
    aggregate shape (a plain GROUP BY on orders silently drops the
    zero bucket). First aggregate keyed on the customer (one fact
    shuffle), second on the tiny count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("1%")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- TPC-H Q16 shape: distinct-supplier counts over a derived bridge ---------
@register(
    "part_supplier_variety_q16",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type,
           CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT s.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply s JOIN part p ON s.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def part_supplier_variety_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: how many distinct suppliers ship each qualifying
    (brand, type, size) — with the supply bridge DERIVED from the fact
    (the dataset carries no partsupp): a DISTINCT projection is itself
    the bridge table, and at 100 TB it is the thing you materialize
    once and bucket by partkey. IN-list and <> predicates push into the
    part scan; count(DISTINCT) expands group keys (Spark's expand
    operator), never a second fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20)
    )
    supply = li.select("l_partkey", "l_suppkey").distinct()
    return (
        supply.join(F.broadcast(part), supply.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --- TPC-H Q20 shape: nested semi-join on aggregated thresholds --------------
@register(
    "excess_shippers_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, SUM(q) AS total_q FROM shipped GROUP BY l_partkey
    ),
    heavy AS (
      SELECT s.l_suppkey
      FROM shipped s
      JOIN part_total t ON s.l_partkey = t.l_partkey
      JOIN part p ON s.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'small%' AND s.q * 8 > t.total_q
      GROUP BY s.l_suppkey
    )
    SELECT sup.s_name, sup.s_nationkey
    FROM supplier sup JOIN heavy h ON sup.s_suppkey = h.l_suppkey
    """,
)
def excess_shippers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: suppliers who shipped more than an eighth of some
    qualifying part's total volume (the share threshold is a parameter) — the nested-aggregate semi-join
    shape (threshold computed from one aggregation level, applied at
    another). The comparison is division-free (8·q > total) in exact
    DECIMAL; both aggregate levels reuse the same partkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(qdec).alias("q"))
    # qualify parts BEFORE the totals aggregation (round 11, guide
    # §2.3): the broadcast part filter only restricts PARTKEYS, so
    # per-part totals over the qualifying subset are identical to
    # filtering after — but the second exchange now carries only
    # qualifying parts' rows instead of the whole shipped relation
    qualifying = shipped.join(
        F.broadcast(part), shipped.l_partkey == part.p_partkey
    ).select("l_partkey", "l_suppkey", "q")
    part_total = qualifying.groupBy("l_partkey").agg(
        F.sum("q").alias("total_q")
    )
    heavy = (
        qualifying.join(part_total, "l_partkey")
        .filter(F.col("q") * 8 > F.col("total_q"))
        .select("l_suppkey")
        .distinct()
    )
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_name", "s_nationkey"
    )


# --- TPC-H Q1: the pricing summary report -----------------------------------
@register(
    "pricing_summary_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1, the canonical columnar-scan + wide-aggregate workload:
    one lineitem pass, eight aggregates per (returnflag, linestatus).
    Every sum runs in exact DECIMAL (order-independent, hash-stable);
    each average is ONE IEEE division of two exact operands — the only
    float op — so both engines produce bitwise-identical doubles. At
    100 TB this plan is scan-bound by design: map-side partial
    aggregation collapses each partition to ~6 rows before the
    exchange, and only the 2 projected date-filtered columns' pages
    leave the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = _dec2("l_quantity")
    price = _dec2("l_extendedprice")
    disc = _dec2("l_discount")
    tax = _dec2("l_tax")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), 2)
        .cast("double")
        .alias("sum_charge"),
        (F.sum(qty).cast("double") / n.cast("double")).alias("avg_qty"),
        (F.sum(price).cast("double") / n.cast("double")).alias("avg_price"),
        (F.sum(disc).cast("double") / n.cast("double")).alias("avg_disc"),
        n.alias("count_order"),
    )


# --- TPC-H Q6: the forecast revenue-change filter-scan -----------------------
@register(
    "forecast_revenue_change_q6",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter-scan-aggregate, zero joins — the query
    whose entire cost is how little you read. All three predicates
    (shipdate range, discount band, quantity cap) push to the parquet
    scan as min/max + value filters; the discount band compares exact
    DECIMAL(18,2) (a raw-double BETWEEN on 0.05/0.07 is representation-
    dependent). One global aggregate: partial sums map-side, a 1-row
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec2("l_discount")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (disc >= F.lit("0.05").cast("decimal(18,2)"))
        & (disc <= F.lit("0.07").cast("decimal(18,2)"))
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.round(F.sum(_dec2("l_extendedprice") * disc), 2)
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- TPC-H Q11 shape: group share of a global aggregate ----------------------
@register(
    "important_part_revenue_q11",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(ROUND(rev, 2) AS DOUBLE) AS part_revenue
    FROM pr
    WHERE CAST(rev AS DOUBLE) >
          1.3 * (CAST((SELECT SUM(rev) FROM pr) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM pr) AS DOUBLE))
    """,
)
def important_part_revenue_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape on the trimmed schema (no partsupp table): parts whose
    revenue exceeds 1.3x the MEAN part revenue — the group-vs-global-
    aggregate threshold, self-normalizing so the selectivity holds at
    every scale factor. The global total and part count are a second
    aggregation of the ALREADY-GROUPED relation (|parts| rows, not the
    fact), attached as a broadcast 1-row cross join. The threshold is
    compared in DOUBLE (rev > 1.3 * total/n, identical single IEEE
    ops on both engines): the earlier division-free DECIMAL product
    rev*n*10 hits Spark's precision-38 cap at large scale factors
    (decimal(28,2) * bigint rounds or overflows under ANSI) while
    DuckDB's HUGEINT-backed decimals stay exact — a latent parity
    break. The fact shuffles once on partkey; everything downstream
    reuses it."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec2("l_extendedprice") * (F.lit(1) - _dec2("l_discount"))
    pr = li.groupBy("l_partkey").agg(F.sum(rev).alias("rev"))
    total = pr.agg(
        F.sum("rev").alias("total_rev"), F.count(F.lit(1)).alias("n_parts")
    )
    threshold = F.lit(1.3) * (
        F.col("total_rev").cast("double") / F.col("n_parts").cast("double")
    )
    return (
        pr.crossJoin(F.broadcast(total))
        .filter(F.col("rev").cast("double") > threshold)
        .select(
            "l_partkey",
            F.round(F.col("rev"), 2).cast("double").alias("part_revenue"),
        )
    )


# --- TPC-H Q19 shape: disjunctive multi-branch predicate ---------------------
@register(
    "disjunctive_revenue_q19",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under a three-branch OR of conjunctive
    (brand, size, quantity) predicates — the disjunction-handling
    test. Catalyst extracts the common l_partkey equi-key so the join
    stays a hash join (never a nested-loop over the OR), pushes the
    branch-local part predicates below the broadcast, and evaluates
    the residual disjunction post-join. part is broadcast; the fact
    never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")

    def branch(brand: str, size_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (qty >= q_lo)
            & (qty <= q_hi)
        )

    return joined.filter(
        branch("Brand#1", 15, 1, 11)
        | branch("Brand#2", 25, 10, 20)
        | branch("Brand#3", 35, 20, 30)
    ).agg(
        F.round(
            F.sum(_dec2("l_extendedprice") * (F.lit(1) - _dec2("l_discount"))), 2
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
