"""Nested-schema queries (FIXTURES.md B1): the reference's core data
model is a 21-field billing row with struct / array<struct> nesting to
depth 3 (reference core/utility/dataset_utils.py:250-332). These queries
build nested billing rows FROM the flat driver tables with column
expressions, then compute through the nested shapes (field access,
array explode, higher-order array ops) back to flat results — so the
DuckDB oracle can verify the round-trip losslessly on the same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import epoch_seconds
from ..queries_catalog import register
from ..sources.registry import load_table
from ..localrel import local_df


def _billing_rows(events: DataFrame) -> DataFrame:
    """events -> nested billing-export shape (deterministic):
    service/sku structs, labels array<struct<key,value>>, usage struct,
    credits array<struct>, invoice struct — the B1 schema populated from
    flat columns."""
    return events.select(
        F.col("event_id").alias("row_id"),
        F.concat(F.lit("acct-"), (F.col("user_id") % 5).cast("string")).alias(
            "billing_account_id"
        ),
        F.struct(
            F.col("event_type").alias("id"),
            F.concat(F.lit("svc-"), F.col("event_type")).alias("description"),
        ).alias("service"),
        F.struct(
            (F.col("event_id") % 7).cast("string").alias("id"),
            F.lit("sku-desc").alias("description"),
        ).alias("sku"),
        F.col("ts").alias("export_time"),
        F.col("value").alias("cost"),
        F.array(
            F.struct(F.lit("env").alias("key"), F.lit("prod").alias("value")),
            F.struct(
                F.lit("team").alias("key"),
                (F.col("user_id") % 3).cast("string").alias("value"),
            ),
        ).alias("labels"),
        F.struct(
            F.col("value").alias("amount"),
            F.lit("hours").alias("unit"),
        ).alias("usage"),
        F.when(
            F.col("event_type") == "purchase",
            F.array(
                F.struct(
                    F.lit("cud").alias("name"),
                    (-F.col("value") / 10).alias("amount"),
                )
            ),
        )
        .otherwise(F.array().cast("array<struct<name:string,amount:double>>"))
        .alias("credits"),
        F.struct(
            F.date_format("ts", "yyyyMM").alias("month"),
        ).alias("invoice"),
    )


@register(
    "nested_cost_by_service_month",
    oracle="""
    SELECT 'svc-' || event_type AS service_desc,
           strftime(ts, '%Y%m') AS invoice_month,
           COUNT(*) AS n,
           CAST(ROUND(SUM((CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,4)) END)), 2) AS DOUBLE) AS total_cost
    FROM events
    GROUP BY service_desc, invoice_month
    """,
)
def nested_cost_by_service_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped rollup over NESTED field paths (service.description x
    invoice.month — the cost-by-service/month query the billing schema
    exists for). Nested access compiles to the same columnar reads as
    flat columns; the oracle computes the flat equivalent."""
    billing = _billing_rows(load_table(spark, sf_dir, "events"))
    return billing.groupBy(
        F.col("service.description").alias("service_desc"),
        F.col("invoice.month").alias("invoice_month"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("cost").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_cost"),
    )


@register(
    "nested_label_explode",
    oracle="""
    SELECT 'team' AS label_key,
           CAST(user_id % 3 AS VARCHAR) AS label_value,
           COUNT(*) AS n
    FROM events GROUP BY label_value
    """,
)
def nested_label_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEATED-record handling: explode the labels array<struct> and
    aggregate by label value (the 'cost by label' pattern)."""
    billing = _billing_rows(load_table(spark, sf_dir, "events"))
    return (
        billing.select(F.explode("labels").alias("label"))
        .filter(F.col("label.key") == "team")
        .groupBy(
            F.col("label.key").alias("label_key"),
            F.col("label.value").alias("label_value"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "nested_credits_net_cost",
    oracle="""
    SELECT user_id % 5 AS acct_bucket,
           CAST(ROUND(SUM((CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,4)) END))
                      + SUM(CASE WHEN event_type = 'purchase'
                                 THEN (CASE WHEN isfinite(value)
                                            THEN CAST(-value / 10 AS DECIMAL(18,4)) END)
                                 ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
             AS net_cost
    FROM events
    GROUP BY acct_bucket
    """,
)
def nested_credits_net_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array op over nested records: net cost = cost +
    sum(credits[].amount) via F.aggregate on the credits array, grouped
    by account — the credits-adjustment query (billing credits
    dataset_utils.py:313-319). Credit amounts are summed in decimal to
    stay oracle-exact."""
    billing = _billing_rows(load_table(spark, sf_dir, "events"))
    # accumulator must keep a fixed decimal type across fold steps
    # (decimal addition widens precision, so cast back each iteration)
    credit_sum = F.aggregate(
        "credits",
        F.lit(0).cast("decimal(38,4)"),
        lambda acc, c: (acc + c["amount"].cast("decimal(18,4)")).cast("decimal(38,4)"),
    )
    acct = F.substring("billing_account_id", 6, 10).cast("bigint")
    return (
        billing.select(
            acct.alias("acct_bucket"),
            F.col("cost").cast("decimal(18,4)").alias("cost_dec"),
            credit_sum.alias("credit_dec"),
        )
        .groupBy("acct_bucket")
        .agg(
            F.round(F.sum("cost_dec") + F.sum("credit_dec"), 2)
            .cast("double")
            .alias("net_cost")
        )
    )


# --- window frame / calendar batch ---------------------------------------------


@register(
    "moving_1h_value_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM((CASE WHEN isfinite(value) THEN CAST(value AS DECIMAL(18,4)) END)) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_1h_sum
    FROM events WHERE user_id < 10
    """,
)
def moving_1h_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per-user moving 1-hour sum over event time —
    the time-decayed rollup shape (decimal-exact)."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch_seconds("ts"))
        .rangeBetween(-3600, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("moving_1h_sum"),
    )


@register(
    "events_by_hour",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           COUNT(*) AS n
    FROM events GROUP BY hour_bucket
    """,
)
def events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar truncation rollup (hour grain)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_bucket"
        )
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "regexp_extract_leading_word",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
    FROM documents
    """,
)
def regexp_extract_leading_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: anchored capture-group extraction + match
    counting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "^([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0))
        .cast("bigint")
        .alias("n_numbers"),
    )


@register(
    "window_partition_invariant",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-15') AS left_n,
      (SELECT COUNT(*) FROM events
        WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-02-01') AS right_n,
      (SELECT COUNT(*) FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01') AS full_n
    """,
)
def window_partition_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property fixture (SURVEY.md §5.3): adjacent half-open windows
    partition the stream — left + right == full, checked as data."""
    from ..operators.extract import count_in_window

    events = load_table(spark, sf_dir, "events")
    ln = count_in_window(events, "ts", "2024-01-01", "2024-01-15")
    rn = count_in_window(events, "ts", "2024-01-15", "2024-02-01")
    fn = count_in_window(events, "ts", "2024-01-01", "2024-02-01")
    assert ln + rn == fn, "half-open windows must partition the stream"
    return local_df(
        spark, [(ln, rn, fn)], "left_n long, right_n long, full_n long"
    )


# --- MAP-typed columns: build, look up, filter ------------------------------------------
@register(
    "event_type_count_map",
    oracle="""
    SELECT user_id,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN event_type = 'click' THEN cnt ELSE 0 END) AS BIGINT)
             AS n_clicks,
           CAST(SUM(CASE WHEN event_type = 'error' THEN cnt ELSE 0 END) AS BIGINT)
             AS n_errors,
           CAST(COUNT(DISTINCT CASE WHEN cnt >= 10 THEN event_type END) AS BIGINT)
             AS n_heavy_types
    FROM (SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events WHERE event_type IS NOT NULL
          GROUP BY user_id, event_type) t
    GROUP BY user_id
    """,
)
def event_type_count_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: per-user type->count maps built with
    ``map_from_entries``, probed with ``element_at`` (NULL-safe via
    coalesce), thinned with ``map_filter`` — the repeated key/value
    records of the billing schema (labels, tags) as a first-class map.
    Scalar projections keep the oracle exact (map literals never cross
    the engine comparison). Map contract (edge-replay finding): NULL
    is not a legal map key (Spark raises NULL_MAP_KEY), so NULL-type
    events are excluded identically on both engines."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return as_map.select(
        "user_id",
        F.size("type_counts").cast("bigint").alias("n_types"),
        F.coalesce(F.element_at("type_counts", F.lit("click")), F.lit(0))
        .cast("bigint")
        .alias("n_clicks"),
        F.coalesce(F.element_at("type_counts", F.lit("error")), F.lit(0))
        .cast("bigint")
        .alias("n_errors"),
        F.size(F.map_filter("type_counts", lambda _, v: v >= 10))
        .cast("bigint")
        .alias("n_heavy_types"),
    )


# --- ordinal-preserving flatten (posexplode) --------------------------------------------
@register(
    "token_first_positions",
    oracle="""
    SELECT doc_id, t.p[1] AS token,
           CAST(MIN(t.p[2]) AS BIGINT) AS first_pos,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS arr
          FROM documents WHERE doc_id < 50),
         UNNEST(list_zip(arr, range(0, len(arr)))) AS t(p)
    GROUP BY doc_id, token
    """,
)
def token_first_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-preserving flatten: ``posexplode`` keeps each token's
    array position through the explode, giving first-occurrence offsets
    per (doc, token) — the building block for positional features
    (proximity, lead paragraphs). The oracle emulates ordinality with
    list_zip(arr, range(len)); positions are 0-based in both."""
    from ..operators import text

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    pos_tok = docs.select(
        "doc_id", F.posexplode(text.tokens("text")).alias("pos", "token")
    )
    return pos_tok.groupBy("doc_id", "token").agg(
        F.min("pos").cast("bigint").alias("first_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
    )
