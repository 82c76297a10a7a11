"""Named query catalog: the SURVEY.md §2 operator inventory materialized
as (spark_query, oracle_sql) pairs over the driver test tables.

Conventions that keep the driver's hash-compare honest:
- every computed column is aliased identically in Spark and SQL;
- timestamp outputs are rendered as strings with explicit 6-digit
  fractional seconds on BOTH sides (dodges tz/precision drift);
- money aggregates are computed in DECIMAL (exact in both engines,
  independent of summation order), then rounded and cast to double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.registry import load_table

# Incremental window used by the flagship / extract queries (events span
# 2024-01-01 .. 2024-01-31 at every sf — TESTDATA.md).
WINDOW_START = "2024-01-10 00:00:00"
WINDOW_END = "2024-01-20 00:00:00"

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _fmt_ts(col: str, alias: str) -> F.Column:
    return F.date_format(col, TS_FMT_SPARK).alias(alias)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental extract: events in [watermark, now) — S1/P4."""
    from .operators.extract import window_scan

    events = load_table(spark, sf_dir, "events")
    return window_scan(events, "ts", WINDOW_START, WINDOW_END)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

_SPARK: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLE: dict[str, str] = {}

#: Driver-checked-set curation: the correctness driver verifies the
#: FIRST ~50 registered queries (dict insertion order), so this list
#: pins the §2-critical ETL surface, every LLM-data-pipeline operator
#: family, and all round-3 code changes into the checked window.
#: Everything not listed keeps registration order after these.
#:
#: Round-4 rotation (per round-3 VERDICT item 2): every round-3
#: `_SECONDARY` oracle-bearing query that had never seen a driver
#: CORRECTNESS row is pinned into the window, paid for by evicting
#: entries that were hash-green in round 3 AND whose operator family
#: remains covered by a stayed twin (watermark_epoch_default ~
#: watermark_max_ts, existence_anti_join ~ existence_semi_join,
#: scalar_name_mangling/json_serialize_records ~ iso_json_boundary,
#: paginated_scan_page3 ~ checkpoint_latest_success ORDER/LIMIT,
#: doc_rolling_hash ~ doc_fingerprints' family, token_topk ~
#: tfidf_style_weights tokenization, text_langid_ngram ~
#: text_quality_scores family, deterministic_mixture_sample ~
#: corpus_token_budget_curation sampling, embedding_batch_topk ~
#: embedding_cosine_topk, dedup_simhash_near_pairs/_cluster_keep_best
#: ~ the minhash chain). Evicted entries stay registered and
#: pytest-parity-checked (tests/test_oracle_parity.py); each already
#: holds a green hash row in CORRECTNESS_r03.json. Goal: every
#: oracle-bearing query is driver-green at least once across rounds.
_PRIORITY = [
    # §2 ETL surface: scans, watermark, checkpoint, config, joins,
    # pubsub decode, load accounting, pagination, SQL passthrough,
    # upsert, transform hook, protocol round-trip, retry, status
    "incremental_window_scan",
    "window_count_scan",
    "watermark_max_ts",
    "checkpoint_latest_success",
    "config_point_lookup",
    "broadcast_lookup_join",
    "existence_semi_join",
    "pubsub_decode_roundtrip",
    "load_verdict_accounting",
    "iso_json_boundary",
    "sql_passthrough_rollup",
    "merge_upsert_config",
    "pandas_udf_transform_hook",
    "etl_checkpoint_roundtrip",
    "etl_retry_envelope",
    "config_update_values",
    "step_status_progression",
    "load_observed_metrics",
    "load_time_travel_counts",
    "retention_purge_accounting",
    "schema_evolution_union",
    # analytics extensions
    "sessionization_gap30m",
    "range_join_events_5min",
    "asof_join_latest_order",
    "pricing_summary_q1",
    "etl_provision_rollback",
    "streaming_windowed_counts",
    "streaming_cdc_upsert_snapshot",
    "cdc_apply_changes_snapshot",
    "hierarchy_subtree_rollup",
    "udtf_ngram_explode",
    "pandas_udaf_grouped_cents",
    # LLM-data-pipeline ops: dedup, similarity/ANN, text, multimodal
    "dedup_exact_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_clusters",
    "dedup_lsh_jaccard_verified",
    "dedup_incremental_new_batch",
    "dedup_levenshtein_verified",
    "corpus_dup_ngram_fraction",
    "embedding_cosine_topk",
    "embedding_cosine_neardup",
    "embedding_cosine_clusters",
    "embedding_pq_codes",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "tfidf_style_weights",
    "text_quality_scores",
    "text_repetition_quality",
    "multimodal_features_arrow",
    "corpus_token_budget_curation",
]

#: Positions 51+: queries outside the driver-checked window — either
#: already hash-green in a prior round's CORRECTNESS record (the
#: round-4 evictions, listed last) or declared-approximate /
#: non-SQL-expressible. All stay green in the local sf0.01 parity
#: gate; if the driver's cap is looser they are the first to benefit;
#: either way their order is deterministic for the bench and docs.
_SECONDARY = [
    # round-4 new queries not yet in the window — the round-5 rotation
    # should pin THIS head block into _PRIORITY (evicting round-4
    # hash-green twins), exactly as round 4 pinned the round-3 set.
    # All are pytest-parity-verified and individually sf0.01
    # hash-checked this round.
    "forecast_revenue_change_q6",
    "important_part_revenue_q11",
    "disjunctive_revenue_q19",
    "vocab_oov_rate",
    "embedding_knn_graph",
    "deterministic_split_assignment",
    "corpus_source_report",
    "corpus_span_dedup",
    "streaming_topk_trending",
    "contrastive_negative_samples",
    "incremental_agg_maintenance",
    "backfill_window_accounting",
    "multimodal_payload_dedup",
    "daily_count_anomaly_zscore",
    "keyset_pagination_page",
    "ann_topk_pq_adc",
    "streaming_stateful_user_totals",
    "embedding_label_centroids",
    "embedding_quantize_int8",
    "funnel_signup_click_purchase",
    "attribution_last_touch",
    "snapshot_diff_accounting",
    "histogram_quantile_sketch",
    "text_pii_redaction",
    "multimodal_resize_plumbing",
    "multimodal_frame_sample",
    "nation_trade_triangles",
    "retention_cohorts",
    "quality_weighted_sample",
    "small_order_revenue_q17",
    "top_supplier_revenue_q15",
    "cheapest_line_supplier_q2",
    "nation_year_profit_q9",
    "customer_order_distribution_q13",
    "part_supplier_variety_q16",
    "excess_shippers_q20",
    # round-4 evictions: hash-green in CORRECTNESS_r03.json, families
    # still covered in-window by a stayed twin
    "watermark_epoch_default",
    "existence_anti_join",
    "scalar_name_mangling",
    "json_serialize_records",
    "paginated_scan_page3",
    "dedup_cluster_keep_best",
    "dedup_simhash_near_pairs",
    "embedding_batch_topk",
    "text_token_counts",
    "text_langid_ngram",
    "text_safety_flags",
    "doc_fingerprints",
    "doc_rolling_hash",
    "token_topk",
    "deterministic_mixture_sample",
    "moving_1h_value_sum",
    "array_functions_user_types",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY + _SECONDARY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _SPARK[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _ordered(_SPARK)


def oracle_queries() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLE)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .plans import (  # noqa: F401
        analytics,
        decision_support,
        etl,
        extended,
        graph,
        llm,
        nested,
    )

    _LOADED = True
