#!/usr/bin/env python
"""Regenerate PLANS.md: a physical-plan audit of every catalog query.

For each query: join strategies, exchange count, parquet pushdown, and
flags for anti-patterns (cartesian products, nested-loop joins on
non-trivial inputs). Run per round after plan-affecting changes:

    python tools/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: queries whose scale-relevant plan facts are computed INSIDE the
#: query and hash-pinned by its oracle (stronger than this offline
#: audit): listed, not audited
IN_RESULT_PLAN_FACTS = {
    # SMJ + zero-Exchange booleans ride the result (zero-shuffle
    # co-located bucketed join); eager warehouse writes at build time
    "bucketed_join_rollup",
    # file counts + range disjointness + byte fidelity ride the result;
    # eager fragment/compact cycle at build time
    "compaction_file_accounting",
}

#: queries whose oracles pin STATE-MACHINE contracts (VALUES booleans
#: over O(rows-written) temp stores), not plan facts — their data
#: paths are point ops on KB-sized state, so there is no data-sized
#: plan to audit; labeled honestly rather than claiming plan coverage
STATE_CONTRACT_ONLY = {
    "etl_protocol_edge_cases",
    "etl_provision_rollback",
}

#: stateful / streaming / store-writing queries can't be dry-planned
#: whole, but their DATA-PATH STAGE (the DataFrame transformation the
#: micro-batch executes / the extract feeding the store write) can:
#: each entry builds that stage over the same inputs the query uses
#: (VERDICT r6 item 4). withWatermark is a no-op on batch frames, so
#: the streaming transformations plan with their real join/agg shapes;
#: the one batch substitution is dropDuplicates for the state-backed
#: within-watermark dedup (same key-hash exchange shape).
def _data_path_builders():
    import datetime as dt

    from pyspark.sql import functions as F

    from bigquery_cross_environment_etl_pipeline_spark.operators.extract import (
        extract_incremental,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )
    from bigquery_cross_environment_etl_pipeline_spark.streaming.incremental import (
        stream_session_counts,
        stream_static_enrich_counts,
        stream_stream_interval_join,
        stream_windowed_counts,
    )

    def events(spark, sf_dir):
        return load_table(spark, sf_dir, "events")

    def etl_extract(spark, sf_dir):
        batch, _, _ = extract_incremental(
            events(spark, sf_dir), "ts", None, dt.datetime(2024, 1, 15)
        )
        return batch

    def windowed(spark, sf_dir):
        return stream_windowed_counts(events(spark, sf_dir), window_size="1 day")

    def topk(spark, sf_dir):
        from pyspark.sql import Window as W

        counts = windowed(spark, sf_dir)
        w = W.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
        return counts.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= 3
        )

    def sessions(spark, sf_dir):
        return stream_session_counts(
            events(spark, sf_dir).filter(F.col("user_id") < 20)
        )

    def dedup_counts(spark, sf_dir):
        ev = events(spark, sf_dir).filter(F.col("user_id") < 50)
        return (
            ev.union(ev)
            .dropDuplicates(["event_id"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_unique"))
        )

    def late_replay(spark, sf_dir):
        ev = events(spark, sf_dir).filter(
            (F.col("user_id") < 30) & F.col("ts").isNotNull()
        )
        return (
            ev.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    def enrich(spark, sf_dir):
        dim = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        return stream_static_enrich_counts(
            events(spark, sf_dir),
            dim,
            join_key_stream="user_id",
            join_key_dim="c_custkey",
            group_col="c_mktsegment",
        )

    def _sides(spark, sf_dir):
        ev = events(spark, sf_dir).filter(
            F.col("ts") > F.lit("1970-01-01 00:00:00").cast("timestamp")
        )
        cols = ["user_id", "ts", "event_id"]
        return (
            ev.filter(F.col("event_type") == "click").select(cols),
            ev.filter(F.col("event_type") == "purchase").select(cols),
        )

    def interval_join(spark, sf_dir):
        l, r = _sides(spark, sf_dir)
        return stream_stream_interval_join(l, r, key="user_id", interval="1 hour")

    def left_outer(spark, sf_dir):
        l, r = _sides(spark, sf_dir)
        return stream_stream_interval_join(
            l, r, key="user_id", interval="1 hour", how="left_outer"
        )

    return {
        "etl_checkpoint_roundtrip": etl_extract,
        "streaming_windowed_counts": windowed,
        "streaming_topk_trending": topk,
        "streaming_session_counts": sessions,
        "streaming_dedup_unique_counts": dedup_counts,
        "late_data_watermark_replay": late_replay,
        "streaming_enrich_static_join": enrich,
        "streaming_interval_join_pairs": interval_join,
        "streaming_left_outer_join_nulls": left_outer,
    }

#: BNLJ allowance above the default 1 — ONLY for queries whose extra
#: nested-loop sides are each a broadcast SINGLE-ROW constant (linear,
#: not quadratic).  hybrid_rrf_fusion composes two such arms: the
#: 1-row query vector (dense cosine) and the 1-row corpus-stats
#: relation (BM25) — both map-side constants by construction.
BNLJ_BUDGET = {"hybrid_rrf_fusion": 2}


def main() -> None:
    from bigquery_cross_environment_etl_pipeline_spark import queries_catalog
    from bigquery_cross_environment_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    queries = queries_catalog.spark_queries()
    oracles = queries_catalog.oracle_queries()

    lines = [
        "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)",
        "",
        f"Scale factor dir: `{SF_DIR}`, local mode. Regenerate after any",
        "plan-affecting change. Columns: BHJ=BroadcastHashJoin,",
        "SMJ=SortMergeJoin, BNLJ=BroadcastNestedLoopJoin (only acceptable",
        "for broadcast-1-row cross joins), Exch=Exchange count,",
        "Pushdown=non-trivial PushedFilters on a parquet scan.",
        "",
        "| query | oracle | BHJ | SMJ | BNLJ | Exch | Pushdown | flags |",
        "|---|---|---|---|---|---|---|---|",
    ]
    flagged = []
    data_path = _data_path_builders()
    for name in sorted(queries):
        if name in IN_RESULT_PLAN_FACTS:
            lines.append(f"| {name} | {'✓' if name in oracles else 'rows-only'} "
                         f"| — | — | — | — | — | plan facts hash-pinned in-result |")
            continue
        if name in STATE_CONTRACT_ONLY:
            lines.append(f"| {name} | {'✓' if name in oracles else 'rows-only'} "
                         f"| — | — | — | — | — | state contracts pinned in-result; "
                         f"no data-sized plan |")
            continue
        stage = name in data_path
        fn = data_path.get(name, queries.get(name))
        plan = (
            fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        bnlj = plan.count("BroadcastNestedLoopJoin")
        exch = plan.count("Exchange")
        cart = plan.count("CartesianProduct")
        pushed = bool(
            re.search(r"PushedFilters: \[[^\]]*(GreaterThan|LessThan|EqualTo|IsNotNull|In\()", plan)
        )
        flags = []
        if cart:
            flags.append(f"CARTESIAN x{cart}")
        if bnlj > BNLJ_BUDGET.get(name, 1):
            flags.append(f"BNLJ x{bnlj}")
        if flags:
            flagged.append(name)
        if stage:
            flags.append("data-path stage")
        lines.append(
            f"| {name} | {'✓' if name in oracles else 'rows-only'} "
            f"| {bhj} | {smj} | {bnlj} | {exch} | {'✓' if pushed else '–'} "
            f"| {', '.join(flags) or '–'} |"
        )

    lines += [
        "",
        f"Flagged queries: {flagged or 'none'}.",
        "",
        "Rows tagged `data-path stage` audit the transformation the",
        "stateful/streaming query's micro-batches execute (watermarks are",
        "no-ops on batch frames, so join/agg shapes are the real ones; the",
        "state-backed within-watermark dedup is audited as dropDuplicates,",
        "the same key-hash exchange shape). Rows tagged `plan facts",
        "hash-pinned in-result` compute their scale-relevant plan",
        "assertions inside the query, verified by the oracle hash. Rows",
        "tagged `state contracts pinned in-result` pin state-machine",
        "behavior, not plan shape — their data paths are point ops over",
        "KB-sized stores, so there is no data-sized plan to audit.",
        "",
        "BNLJ appearing with count 1 corresponds to a crossJoin against a",
        "broadcast 1-row query vector (ANN/top-k) — linear, not quadratic.",
        "The IVF variants show BNLJ x3: corpus x broadcast centroid table",
        "(<= n_centroids rows) for assignment, centroids x 1-row query for",
        "probing, candidates x 1-row query for scoring — every",
        "nested-loop side is a broadcast constant, so all three are",
        "linear scans, not quadratic blowups.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; flagged={flagged}")
    spark.stop()


if __name__ == "__main__":
    main()
