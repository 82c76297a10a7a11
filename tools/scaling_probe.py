#!/usr/bin/env python
"""Measure per-query scaling across the driver's scale factors and
rewrite the measured-scaling section of SCALE.md.

For each probed query: min-of-2 wall time at sf0.001 / sf0.01 / sf0.1
(noop sink — full plan executes, no driver transfer), plus the
t(sf0.1)/t(sf0.01) growth ratio. Input volume grows 10x between those
two points, so for scan-bound plans the ratio should sit well under 10
(fixed per-job overhead amortizes); a ratio trending toward 100 would
flag an accidentally quadratic operator. Run on an idle box — timings
taken while tests run concurrently are garbage.

    python tools/scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]

#: representative slice of the headline set: scans, shuffle joins,
#: windows, every LLM-op family, and the iterative/composite extremes
PROBE_QUERIES = [
    "incremental_window_scan",
    "grouped_cost_rollup",
    "revenue_by_nation",
    "sessionization_gap30m",
    "range_join_events_5min",
    "dedup_exact_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_verify_blocked",
    "dedup_lsh_jaccard_verified",
    "embedding_cosine_neardup",
    "embedding_cosine_clusters",
    "embedding_batch_topk",
    "ann_topk_ivf_probe",
    "text_langid",
    "corpus_token_budget_curation",
    "nation_trade_pagerank",
    "cdc_apply_changes_snapshot",
    "funnel_signup_click_purchase",
    "embedding_label_centroids",
    "embedding_quantize_int8",
    "nation_trade_triangles",
    "multimodal_frame_sample",
    "dedup_incremental_new_batch",
    "embedding_pq_codes",
    "snapshot_diff_accounting",
    "attribution_last_touch",
    "retention_cohorts",
    "histogram_quantile_sketch",
    "hierarchy_subtree_rollup",
    "nation_year_profit_q9",
    "small_order_revenue_q17",
    # round-4 additions
    "pricing_summary_q1",
    "forecast_revenue_change_q6",
    "disjunctive_revenue_q19",
    "corpus_dup_ngram_fraction",
    "vocab_oov_rate",
    "embedding_knn_graph",
    "deterministic_split_assignment",
    "corpus_source_report",
    "corpus_span_dedup",
    "contrastive_negative_samples",
    "incremental_agg_maintenance",
    "backfill_window_accounting",
    "multimodal_payload_dedup",
    # round-5 additions: composed IVF-PQ serving, SSSP relaxation,
    # sparse + hybrid retrieval, delta-join maintenance
    "ann_topk_ivfpq",
    "nation_trade_shortest_paths",
    "bm25_topk_retrieval",
    "bm25_topk_from_index",
    "bm25_incremental_index_topk",
    "hybrid_rrf_fusion",
    "incremental_join_maintenance",
    # round-6 additions: the data-layout accounting queries (the
    # bucketed write itself is probed too — write cost must scale
    # linearly for the layout to be worth pre-paying)
    "bucketed_join_rollup",
    "zorder_locality_accounting",
    # batch 4: quality canary + production hybrid serve + compaction
    # (the fragment->compact write cost must itself scale linearly)
    "ann_recall_at_k",
    "hybrid_rrf_fusion_ivfpq",
    "compaction_file_accounting",
    # round-7 additions: the LSH-quality canary (its exact-truth arm is
    # doc-freq-quadratic by design — the probe MEASURES how fast the
    # canary price grows so the sampled-stratum cutover point at scale
    # is a number, not a guess) and the JDBC connector round-trip
    # (write + ranged-read cost must scale linearly with the slice)
    "dedup_recall_precision",
    "jdbc_roundtrip_rollup",
    # round-8 additions: the two new quality canaries (banding sweep's
    # r=1 superset join and the simhash truth arm — both priced like
    # dedup_recall_precision), the Count-Min grid (shuffle must stay
    # flat at depth*width), sequence packing (two-phase prefix sum),
    # the cluster-aware split (components on top of banding), and the
    # JL projection (scan-bound: ratio should track input size)
    "dedup_band_sweep",
    "simhash_recall_precision",
    "heavy_hitters_countmin",
    "corpus_sequence_packing",
    "leakage_safe_split_assignment",
    "embedding_projection_distortion",
    # round-10 additions (VERDICT r9 item 4): the r9 codec/tokenizer
    # newcomers get measured ratios like the dedup/ANN families —
    # decode queries are zero-exchange Arrow maps so the ratio should
    # track document count (~linear); BPE training is ONE corpus-sized
    # word count + vocab-sized merge rounds, so its ratio should sit
    # well UNDER the decode queries' (the vocab grows sublinearly);
    # decontamination is a broadcast semi-join (corpus-scan-bound)
    "multimodal_png_decode",
    "multimodal_gif_decode",
    "multimodal_wav_decode",
    "multimodal_resize_decode",
    "bpe_train_merges",
    "bpe_token_counts",
    "benchmark_decontamination",
    "text_nfc_normalization",
    # round-10 newcomers: the JPEG pixel and coefficient paths (same
    # zero-exchange Arrow-map shape as the PNG/GIF decodes)
    "multimodal_jpeg_decode",
    "multimodal_jpeg_coefficients",
    "multimodal_jpeg_progressive",
    "multimodal_jpeg12_decode",
    "multimodal_jpeg_lossless_decode",
]

BEGIN = "<!-- scaling-probe:begin -->"
END = "<!-- scaling-probe:end -->"


def main() -> None:
    from bigquery_cross_environment_etl_pipeline_spark import queries_catalog
    from bigquery_cross_environment_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scaling-probe")
    queries = queries_catalog.spark_queries()
    spark.read.parquet(os.path.join(SF_DIRS[0][1], "region.parquet")).count()

    results: dict[str, dict[str, float]] = {}
    for name in PROBE_QUERIES:
        fn = queries[name]
        results[name] = {}
        for sf, sf_dir in SF_DIRS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name][sf] = best
        print(name, {k: round(v, 3) for k, v in results[name].items()})

    lines = [
        BEGIN,
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | t(0.1)/t(0.01) at 10x data |",
        "|---|---|---|---|---|",
    ]
    for name, ts in results.items():
        ratio = ts["0.1"] / ts["0.01"] if ts["0.01"] else float("nan")
        lines.append(
            f"| `{name}` | {ts['0.001']:.3f} | {ts['0.01']:.3f} "
            f"| {ts['0.1']:.3f} | {ratio:.1f}x |"
        )
    lines += ["", END]
    block = "\n".join(lines)

    scale_md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md")
    text = open(scale_md).read()
    if BEGIN in text and END in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        text = head + block + tail
    else:
        text += (
            "\n## Measured scaling (auto-generated by tools/scaling_probe.py)\n"
            "\nLocal-mode wall time, min of 2 runs, noop sink. The 10x-data\n"
            "growth ratio is the scale smell test: scan/shuffle-bound plans\n"
            "stay well under 10x (fixed overhead amortizes); anything nearing\n"
            "100x is accidentally quadratic.\n\n" + block + "\n"
        )
    open(scale_md, "w").write(text)
    print(f"wrote {scale_md}")
    spark.stop()


if __name__ == "__main__":
    main()
