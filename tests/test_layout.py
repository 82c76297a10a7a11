"""Z-order layout: files must stay clustered in BOTH interleaved
dimensions (a predicate on either column overlaps only a fraction of
file bounding boxes), while a single-key sorted layout clusters one
dimension only. Also: the layout never changes query answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators.layout import (
    file_bounding_boxes,
    write_zordered,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE

N_FILES = 16


def _touched(boxes, col, lo, hi) -> int:
    """Files whose [min, max] range intersects [lo, hi] — the footer
    pruning decision."""
    return boxes.filter(
        (F.col(f"max_{col}") >= lo) & (F.col(f"min_{col}") <= hi)
    ).count()


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")

    zpath = str(tmp_path / "zorder")
    write_zordered(events, zpath, ["user_id", "ts"], num_files=N_FILES)

    upath = str(tmp_path / "usersort")
    (
        events.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(upath)
    )

    zbox = file_bounding_boxes(spark, zpath, ["user_id", "ts"]).cache()
    ubox = file_bounding_boxes(spark, upath, ["user_id", "ts"]).cache()
    n_z, n_u = zbox.count(), ubox.count()
    assert n_z >= 8 and n_u >= 8, "need enough files for pruning to mean anything"

    # ~6% box on each dimension
    users = events.agg(F.min("user_id"), F.max("user_id")).first()
    u_lo = users[0]
    u_hi = users[0] + max(1, (users[1] - users[0]) // N_FILES)
    ts = events.agg(
        F.min(F.col("ts").cast("timestamp_ntz")), F.max(F.col("ts").cast("timestamp_ntz"))
    ).first()
    import datetime as dt

    span = ts[1] - ts[0]
    t_lo = ts[0] + span / 2
    t_hi = t_lo + span / N_FILES
    t_lo_e, t_hi_e = (
        (t - dt.datetime(1970, 1, 1)).total_seconds() for t in (t_lo, t_hi)
    )

    # single-key layout: perfect on its sort key, blind on the other —
    # a ts predicate overlaps every file
    assert _touched(ubox, "user_id", u_lo, u_hi) <= max(2, n_u // 4)
    assert _touched(ubox, "ts", t_lo_e, t_hi_e) == n_u

    # z-order: BOTH single-dimension predicates prune
    z_user = _touched(zbox, "user_id", u_lo, u_hi)
    z_ts = _touched(zbox, "ts", t_lo_e, t_hi_e)
    assert z_user < n_z, f"user predicate touched all {n_z} z-ordered files"
    assert z_ts < n_z, f"ts predicate touched all {n_z} z-ordered files"
    # and the 2-D box touches fewer files than either 1-D slab
    z_box = zbox.filter(
        (F.col("max_user_id") >= u_lo)
        & (F.col("min_user_id") <= u_hi)
        & (F.col("max_ts") >= t_lo_e)
        & (F.col("min_ts") <= t_hi_e)
    ).count()
    assert z_box <= min(z_user, z_ts)


def test_zorder_layout_preserves_answers(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    zpath = str(tmp_path / "zorder")
    write_zordered(events, zpath, ["user_id", "ts"], num_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    want = {r["event_id"] for r in events.filter(F.col("user_id") < 10).collect()}
    got = {r["event_id"] for r in back.filter(F.col("user_id") < 10).collect()}
    assert got == want


def test_zorder_key_tolerates_empty_and_all_null_input(spark, tmp_path):
    """Empty or all-null inputs produce None min/max bounds; the key
    must degrade to rank 0 instead of raising TypeError (round-2
    advice), and the write must still succeed."""
    from bigquery_cross_environment_etl_pipeline_spark.operators.layout import zorder_key

    empty = spark.createDataFrame([], "a double, b double")
    assert empty.withColumn("_z", zorder_key(empty, ["a", "b"])).count() == 0

    nulls = spark.createDataFrame([(None, None)] * 5, "a double, b double")
    keyed = nulls.withColumn("_z", zorder_key(nulls, ["a", "b"])).collect()
    assert [r["_z"] for r in keyed] == [0] * 5
    write_zordered(nulls, str(tmp_path / "nulls"), ["a", "b"], num_files=2)
    assert spark.read.parquet(str(tmp_path / "nulls")).count() == 5


def test_write_zordered_restores_session_conf(spark, tmp_path):
    """write_zordered forces the stats-bearing timestamp encoding for
    its own write but must not leak it into the session (round-2
    advice)."""
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try:
        df = load_table(spark, SF_SMOKE, "events").limit(50)
        write_zordered(df, str(tmp_path / "zo"), ["user_id", "value"], num_files=2)
        assert spark.conf.get(key) == "INT96"
    finally:
        spark.conf.set(key, prev)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    from bigquery_cross_environment_etl_pipeline_spark.operators.layout import (
        compact,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    frag = str(tmp_path / "frag")
    events.repartition(40).write.parquet(frag)  # simulate per-trigger files
    dest = str(tmp_path / "compact")
    before, after = compact(spark, frag, dest, target_files=4, sort_cols=["ts"])
    assert before >= 40 and after == 4
    assert spark.read.parquet(dest).count() == events.count()
    # range clustering preserved: per-file ts ranges must not all overlap
    import pyarrow.parquet as pq

    bounds = []
    for f in spark.read.parquet(dest).inputFiles():
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        stats = md.row_group(0).column(cols["ts"]).statistics
        bounds.append((stats.min, stats.max))
    bounds.sort()
    overlaps = sum(
        1 for (a, b), (c, d) in zip(bounds, bounds[1:]) if c < b
    )
    assert overlaps == 0, f"range clustering lost: {bounds}"


def test_bucketed_join_plans_zero_exchange(spark):
    """Two tables bucketed on the same key/count must sort-merge join
    with ZERO exchanges — the co-located join that makes repeated
    fact-fact joins shuffle-free at scale."""
    from bigquery_cross_environment_etl_pipeline_spark.operators.layout import (
        write_bucketed,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )
    from .conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 4)
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 4)
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # results identical to the unbucketed join
            assert joined.count() == (
                orders.join(li, orders.o_orderkey == li.l_orderkey).count()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_append_keeps_colocation(spark):
    """mode='append' ingest into a bucketed table must preserve the
    zero-exchange join property — the bucket function is stable, so
    appended files land in the right buckets."""
    from bigquery_cross_environment_etl_pipeline_spark.operators.layout import (
        write_bucketed,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )
    from .conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    half_a = orders.filter(orders.o_orderkey % 2 == 0)
    half_b = orders.filter(orders.o_orderkey % 2 == 1)
    write_bucketed(half_a, "t_orders_app", ["o_orderkey"], 4)
    write_bucketed(half_b, "t_orders_app", ["o_orderkey"], 4, mode="append")
    write_bucketed(li, "t_li_app", ["l_orderkey"], 4)
    try:
        a = spark.table("t_orders_app")
        b = spark.table("t_li_app")
        assert a.count() == orders.count()
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == orders.join(
                li, orders.o_orderkey == li.l_orderkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_app")
        spark.sql("DROP TABLE IF EXISTS t_li_app")
