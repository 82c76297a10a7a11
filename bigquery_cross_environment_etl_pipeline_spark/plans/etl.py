"""Reference-semantics queries (SURVEY.md §2.1-2.3, 2.6, 2.8-2.9).

Each query is the Spark-first form of one reference operator, bound to
the driver tables per FIXTURES.md §A (``events.ts`` plays
``export_time``; ``customer`` plays the tenant-config relation;
``orders`` plays the checkpoint log for the argmax read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.extract import count_in_window, window_scan
from ..queries_catalog import (
    TS_FMT_DUCK,
    TS_FMT_SPARK,
    WINDOW_END,
    WINDOW_START,
    register,
)
from ..sources.registry import load_table
from ..localrel import local_df

_WINDOW_PRED = (
    f"ts >= TIMESTAMP '{WINDOW_START}' AND ts < TIMESTAMP '{WINDOW_END}'"
)


# --- S1/P4: incremental half-open window scan ------------------------------
@register(
    "incremental_window_scan",
    oracle=f"""
    SELECT event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_str,
           user_id, event_type, value, props
    FROM events WHERE {_WINDOW_PRED}
    """,
)
def incremental_window_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: SELECT * restricted to [start, end) — the reference's extract
    (billing_etl.py:270-298) as one pushed-down filter, no pagination."""
    events = load_table(spark, sf_dir, "events")
    return window_scan(events, "ts", WINDOW_START, WINDOW_END).select(
        "event_id",
        F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


# --- S2/A1: counting scan ---------------------------------------------------
@register(
    "window_count_scan",
    oracle=f"SELECT COUNT(*) AS n_rows FROM events WHERE {_WINDOW_PRED}",
)
def window_count_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: COUNT(*) with the interval predicate (billing_etl.py:251-268)."""
    events = load_table(spark, sf_dir, "events")
    return (
        window_scan(events, "ts", WINDOW_START, WINDOW_END)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- A2/T2: watermark = max(ts) of the extracted batch ----------------------
@register(
    "watermark_max_ts",
    oracle=f"""
    SELECT strftime(max(ts), '{TS_FMT_DUCK}') AS watermark
    FROM events WHERE {_WINDOW_PRED}
    """,
)
def watermark_max_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: data-driven watermark advance (billing_etl.py:160-168)."""
    events = load_table(spark, sf_dir, "events")
    return (
        window_scan(events, "ts", WINDOW_START, WINDOW_END)
        .agg(F.date_format(F.max("ts"), TS_FMT_SPARK).alias("watermark"))
    )


# --- F3/T1: epoch default for missing watermark ------------------------------
@register(
    "watermark_epoch_default",
    oracle=f"""
    SELECT user_id,
           strftime(coalesce(max(CASE WHEN event_type = 'purchase' THEN ts END),
                             TIMESTAMP '1970-01-01 00:00:00'),
                    '{TS_FMT_DUCK}') AS watermark
    FROM events GROUP BY user_id
    """,
)
def watermark_epoch_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1+F3: per-tenant latest-success read with epoch fallback
    (billing_etl.py:135-139) — users without purchases get the epoch."""
    events = load_table(spark, sf_dir, "events")
    latest = F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return events.groupBy("user_id").agg(
        F.date_format(
            F.coalesce(latest, F.lit("1970-01-01 00:00:00").cast("timestamp")),
            TS_FMT_SPARK,
        ).alias("watermark")
    )


# --- S4/A3/O1: latest-success argmax (per key, via window) -------------------
@register(
    "checkpoint_latest_success",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '{TS_FMT_DUCK}') AS latest_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders WHERE o_orderstatus = 'F'
    ) WHERE rn = 1
    """,
)
def checkpoint_latest_success(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 generalized: ORDER BY .. DESC LIMIT 1 per key
    (billing_etl_db.py:46-51) as ONE window pass over all tenants instead
    of a point query per tenant."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", TS_FMT_SPARK).alias("latest_date"),
        )
    )


# --- S3/P2/P5: config point lookup -------------------------------------------
@register(
    "config_point_lookup",
    oracle="""
    SELECT c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
)
def config_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: projection + equality predicate (billing_etl_db.py:63-89)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(F.col("c_custkey") == 42).select(
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


# --- J1: broadcast lookup join ------------------------------------------------
@register(
    "broadcast_lookup_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def broadcast_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the multi-tenant fan-out as a broadcast hash join
    (billing_etl.py:65-66) — the dimension side ships to every executor,
    the fact side never shuffles. No forced hint: customer scales with
    SF, so the broadcast decision belongs to size-based planning + AQE
    (BHJ at this scale, graceful SMJ once the dim outgrows the
    threshold) — a pinned F.broadcast would OOM the driver at 100x."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )


# --- J2: existence checks as semi/anti joins ----------------------------------
@register(
    "existence_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def existence_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 'does the destination exist?' probe as a left-anti join
    (billing_etl.py:225-248 / dataset_utils.py:236-247)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "existence_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def existence_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 dual: existence as a left-semi join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --- S5/U2/F5: pub/sub envelope decode ----------------------------------------
@register(
    "pubsub_decode_roundtrip",
    oracle="""
    SELECT user_id AS org_id, COUNT(*) AS n_messages
    FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    """,
)
def pubsub_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: build ``{"message":{"data": base64(json)}}`` envelopes from
    events, decode them through the ingestion pipeline (main.py:21-31),
    and aggregate the validated payloads. Decode is lossless, so the
    oracle aggregates the source directly — minus NULL org ids, which
    U2 payload validation REJECTS (to_json omits null fields, so the
    envelope carries no org_id and valid_messages drops it; the
    edge-replay's NULL-user event proved this path end to end)."""
    from ..sources.pubsub import decode_envelopes, valid_messages

    events = load_table(spark, sf_dir, "events")
    envelopes = events.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.base64(
                        F.to_json(F.struct(F.col("user_id").alias("org_id"))).cast(
                            "binary"
                        )
                    ).alias("data")
                ).alias("message")
            )
        ).alias("body")
    )
    decoded = valid_messages(decode_envelopes(envelopes))
    return decoded.groupBy("org_id").agg(F.count(F.lit(1)).alias("n_messages"))


# --- S5 via the custom Python DataSource ----------------------------------------
@register(
    "pubsub_source_decode",
    oracle=f"""
    SELECT i AS message_id,
           CAST(i % 100 + 1 AS BIGINT) AS org_id,
           strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(i),
                    '{TS_FMT_DUCK}') AS publish_time_str
    FROM range(0, 300) t(i)
    """,
)
def pubsub_source_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 end-to-end through the custom Python DataSource: read 300
    deterministic Pub/Sub envelopes from ``format("pubsub_sim")``
    (sources/pubsub_datasource.py — partitioned backlog replay), decode
    and validate them with the standard expression pipeline, and emit
    (message_id, org_id, publish_time). The oracle regenerates the same
    messages arithmetically — proving the source's envelopes round-trip
    the reference's frame format (main.py:18-31) losslessly."""
    from ..sources import pubsub_datasource
    from ..sources.pubsub import decode_envelopes

    pubsub_datasource.register(spark)
    # same UTC pin load_table applies: the driver's session may run on a
    # TZ-shifted host, and publish_time renders through the session TZ
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.read.format("pubsub_sim")
        .option("numMessages", 300)
        .option("numPartitions", 4)
        .load()
    )
    decoded = decode_envelopes(raw.withColumnRenamed("envelope", "body"))
    return decoded.filter(F.col("valid")).select(
        "message_id",
        F.col("payload.org_id").cast("bigint").alias("org_id"),
        F.date_format("publish_time", TS_FMT_SPARK).alias("publish_time_str"),
    )


# --- A4/A5: partial-failure verdict accounting ---------------------------------
@register(
    "load_verdict_accounting",
    oracle="""
    SELECT user_id,
           COUNT(*) AS total_rows,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
             AS failed_rows,
           CASE
             WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 0
               THEN 'SUCCESS'
             WHEN SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) < COUNT(*)
               THEN 'PARTIAL_SUCCESS'
             ELSE 'FAILED'
           END AS status
    FROM events GROUP BY user_id
    """,
)
def load_verdict_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: the SUCCESS / PARTIAL_SUCCESS / FAILED verdict from per-row
    failure counts (billing_etl.py:312-334), one aggregate pass."""
    events = load_table(spark, sf_dir, "events")
    failed = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    total = F.count(F.lit(1))
    return events.groupBy("user_id").agg(
        total.alias("total_rows"),
        failed.cast("bigint").alias("failed_rows"),
        F.when(failed == 0, "SUCCESS")
        .when(failed < total, "PARTIAL_SUCCESS")
        .otherwise("FAILED")
        .alias("status"),
    )


# --- F6/F7: identifier assembly / name mangling ---------------------------------
@register(
    "scalar_name_mangling",
    oracle="""
    SELECT c_custkey,
           'org_' || CAST(c_custkey AS VARCHAR) || '_standard_export' AS dataset_name,
           'org_' || CAST(c_custkey AS VARCHAR) || '_standard_export_table' AS table_name,
           concat_ws('.', 'pulse-project',
                     'org_' || CAST(c_custkey AS VARCHAR) || '_standard_export',
                     'org_' || CAST(c_custkey AS VARCHAR) || '_standard_export_table')
             AS fq_table_id
    FROM customer
    """,
)
def scalar_name_mangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6+F7: org_{id}_standard_export[_table] + project.dataset.table
    (dataset_utils.py:127,141,344-348) as engine-side string functions."""
    from ..functions.scalar import fully_qualified_table_id, org_dataset_name, org_table_name

    customer = load_table(spark, sf_dir, "customer")
    ds = org_dataset_name(F.col("c_custkey"))
    tb = org_table_name(F.col("c_custkey"))
    return customer.select(
        "c_custkey",
        ds.alias("dataset_name"),
        tb.alias("table_name"),
        fully_qualified_table_id("pulse-project", ds, tb).alias("fq_table_id"),
    )


# --- F2: ISO-8601 formatting at the JSON boundary --------------------------------
@register(
    "iso_json_boundary",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso
    FROM events WHERE event_type = 'signup'
    """,
)
def iso_json_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/P6: timestamp -> ISO-8601 string, applied only at the sink edge
    (billing_etl.py:35-40)."""
    from ..functions.scalar import iso_format

    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "signup").select(
        "event_id", iso_format("ts").alias("ts_iso")
    )


# --- F8: JSON record serialization ------------------------------------------------
@register(
    "json_serialize_records",
    oracle="""
    SELECT event_id,
           '{"event_id":' || CAST(event_id AS VARCHAR)
             || CASE WHEN event_type IS NULL THEN '}'
                     ELSE ',"event_type":"' || event_type || '"}' END
             AS payload_json
    FROM events WHERE user_id < 10
    """,
)
def json_serialize_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: record -> JSON text (return_type.py:19-28) via to_json(struct).
    NULL contract (edge-replay finding): to_json OMITS null fields, so
    the oracle's string build must drop the event_type member rather
    than nulling the whole payload."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("user_id") < 10).select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("payload_json"),
    )


# --- O2: deterministic pagination (offset/limit with total order) -----------------
@register(
    "paginated_scan_page3",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events ORDER BY event_id LIMIT 100 OFFSET 200
    """,
)
def paginated_scan_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: the reference's LIMIT/OFFSET pagination (billing_etl.py:276-283)
    — exposed for API parity but with a total ORDER BY so pages are
    deterministic (the reference's unordered paging is a flaw we do not
    inherit, SURVEY.md §7.4.3)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy("event_id")
        .select("event_id", "user_id", "event_type")
        .offset(200)
        .limit(100)
    )


# --- O2 at scale: keyset pagination (seek, don't skip) -----------------------
@register(
    "keyset_pagination_page",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events WHERE event_id > 299
    ORDER BY event_id LIMIT 100
    """,
)
def keyset_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYSET pagination — the scale-correct counterpart of
    paginated_scan_page3's LIMIT/OFFSET form: the client passes the
    last key it saw and the page is ``key > last ORDER BY key LIMIT
    n``. OFFSET must materialize-and-discard every earlier row (page
    1000 costs 1000 pages of work, and the discard grows per page),
    while the seek predicate pushes to the parquet scan (min/max
    prunes whole files) and TakeOrderedAndProject heaps deliver
    exactly one page of work per page — O(page), flat at any depth."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_id") > 299)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
        .limit(100)
    )


# --- parallel backfill planning + accounting (round 4) -----------------------
@register(
    "backfill_window_accounting",
    oracle="""
    SELECT CAST(floor(CAST(epoch_us(ts - TIMESTAMP '2024-01-01 00:00:00')
                           AS BIGINT) / 324000000000) AS BIGINT) AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
      AND ts <  TIMESTAMP '2024-01-31 00:00:00'
    GROUP BY 1
    """,
)
def backfill_window_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel historical backfill, externally verified end to end:
    ``backfill_windows`` splits the 30-day range into 8 half-open
    windows (each an independent extract/load/checkpoint unit — a
    failed window retries alone), ``backfill_scan`` runs them as ONE
    declarative union plan, and the per-window row accounting proves
    the windows partition the range exactly: the oracle reassigns
    every event arithmetically (floor of the microsecond offset over
    the 3.75-day step) and must agree row for row."""
    from ..operators.extract import backfill_scan, backfill_windows

    events = load_table(spark, sf_dir, "events")
    windows = backfill_windows("2024-01-01", "2024-01-31", 8)
    scanned = backfill_scan(events, "ts", windows)
    return (
        scanned.groupBy(F.col("_backfill_window").cast("bigint").alias("window_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- custom Python DataSource SINK: two-phase commit + verdict (round 5) -----
@register(
    "verdict_sink_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS sum_total,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderkey < 500) AS manifest_rows
    FROM orders WHERE o_orderkey < 500
    GROUP BY o_orderstatus
    """,
)
def verdict_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python DataSource WRITER driven end to end
    (sources/verdict_sink.py — the reference's batched-load-plus-
    verdict sink, S8/S10, as a first-class
    ``df.write.format("jsonl_verdict")`` target with a two-phase
    commit: tasks stage uniquely-named JSONL parts, the driver
    publishes ONE manifest, and readers list manifests — never the
    directory). The query writes a deterministic orders slice through
    the sink, reads it back MANIFEST-GATED, and returns the per-status
    load accounting plus the manifest's committed-row total; the
    oracle computes the same accounting from the source parquet, so
    the hash matches only if the write -> commit -> manifest -> read
    cycle is lossless (doubles survive bitwise via shortest-round-trip
    JSON rendering) and the verdict total is exact. Partition count
    (file count) never appears in the output, so the result is
    layout-independent."""
    import tempfile

    from ..sources.verdict_sink import (
        JsonlVerdictDataSource,
        committed_manifests,
        read_committed,
    )

    spark.dataSource.register(JsonlVerdictDataSource)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    schema = "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    with tempfile.TemporaryDirectory(prefix="verdict_sink_") as tmp:
        orders.write.format("jsonl_verdict").option("path", tmp).mode(
            "append"
        ).save()
        manifest_rows = sum(
            m["total_rows"] for m in committed_manifests(tmp)
        )
        back = read_committed(spark, tmp, schema)
        rows = (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
                .cast("double")
                .alias("sum_total"),
            )
            .withColumn("manifest_rows", F.lit(manifest_rows).cast("bigint"))
            .collect()
        )
    return local_df(
        spark,
        rows,
        "o_orderstatus string, n_orders bigint, sum_total double,"
        " manifest_rows bigint",
    )
