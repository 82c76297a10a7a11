#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the noop sink (full plan runs,
no driver-side result transfer skewing the numbers).

Round 11: every pass also records a CPU-time channel (process-tree
utime+stime from /proc plus per-stage executorCpuTime from the
AppStatusStore) — co-tenant load inflates wall clock but barely moves
CPU, so cpu_queries/cpu_sec in BENCH_DETAIL.json is the signal the
round-over-round regression comparison trusts, judged against the
committed BENCH_CPU_REF.json (minted with --write-cpu-ref; valid even
from a loaded box).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# module scope (stdlib, always present): an import failure inside the
# _spin_parallel try block would make its except tuple itself raise
# NameError on BrokenExecutor instead of falling back (ADVICE r6)
from concurrent.futures import BrokenExecutor, ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: ETL semantics + heavy analytics + LLM ops
BENCH_QUERIES = [
    "incremental_window_scan",
    "window_count_scan",
    "checkpoint_latest_success",
    "broadcast_lookup_join",
    "grouped_cost_rollup",
    "revenue_by_nation",
    "top10_orders_by_value",
    "window_running_total",
    "sessionization_gap30m",
    "pivot_event_counts",
    "dedup_exact_stats",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_fingerprints",
    # dedup_ngram_jaccard_pairs dropped in round 3: demoted to an
    # exact-verify utility (fixed-cardinality blocking is quadratic at
    # scale); dedup_lsh_jaccard_verified is the headline composition
    "dedup_lsh_jaccard_verified",
    "dedup_incremental_new_batch",
    "dedup_levenshtein_verified",
    "embedding_cosine_topk",
    "embedding_cosine_neardup",
    "ann_topk_ivf_probe",
    "ann_batch_topk_ivf",
    "embedding_batch_topk",
    "embedding_cosine_clusters",
    "resampled_hourly_forward_fill",
    "deterministic_mixture_sample",
    "text_quality_scores",
    "text_safety_flags",
    "text_langid",
    "multimodal_features",
    "asof_join_latest_order",
    "range_join_events_5min",
    "cdc_apply_changes_snapshot",
    "funnel_signup_click_purchase",
    "snapshot_diff_accounting",
    "attribution_last_touch",
    "histogram_quantile_sketch",
    "hierarchy_subtree_rollup",
    "retention_cohorts",
    "quality_weighted_sample",
    "embedding_label_centroids",
    "embedding_quantize_int8",
    "embedding_pq_codes",
    "ann_topk_pq_adc",
    "ann_topk_ivfpq",
    "json_props_extract",
    "token_topk",
    "bm25_topk_retrieval",
    "bm25_topk_from_index",
    "bm25_incremental_index_topk",
    "hybrid_rrf_fusion",
    "grouped_median_applyinpandas",
    "shipping_priority_top10",
    "returned_item_customers",
    "corpus_token_budget_curation",
    "discounted_revenue_window",
    "promo_revenue_ratio",
    "large_volume_customers",
    "order_value_distribution_ranks",
    "text_repetition_quality",
    "text_pii_redaction",
    "grouped_median_builtin",
    "nation_trade_pagerank",
    "nation_trade_shortest_paths",
    "nation_trade_triangles",
    "bilateral_trade_volume",
    "slow_suppliers_multi_anti",
    "small_order_revenue_q17",
    "top_supplier_revenue_q15",
    "cheapest_line_supplier_q2",
    "nation_year_profit_q9",
    "customer_order_distribution_q13",
    "part_supplier_variety_q16",
    "excess_shippers_q20",
    "regional_market_share",
    "bigram_topk",
    # round-4 additions: TPC-H completion + corpus repetition scoring
    "pricing_summary_q1",
    "forecast_revenue_change_q6",
    "important_part_revenue_q11",
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
    "verdict_sink_roundtrip",
    "multimodal_payload_dedup",
    "daily_count_anomaly_zscore",
    "keyset_pagination_page",
    # round-5 addition: within-doc chunking with overlap
    "doc_chunk_overlap",
    # round-6 additions: driver-visible data-layout queries
    "bucketed_join_rollup",
    "zorder_locality_accounting",
    # round-6 batch 4: ANN serving quality, production hybrid fusion,
    # compaction maintenance accounting
    "ann_recall_at_k",
    "hybrid_rrf_fusion_ivfpq",
    "compaction_file_accounting",
    # round-7 additions: measured LSH banding quality (recall/precision
    # vs the inverted-index exact-Jaccard ground truth) and the real
    # JDBC connector round-trip (embedded Derby, partitioned read)
    "dedup_recall_precision",
    "jdbc_roundtrip_rollup",
    "multimodal_image_decode",
    # round-8 additions: GPT-style sequence packing (two-phase
    # distributed prefix sum — the round-8 root-caused fix made it
    # externally verifiable), measured simhash blocking quality, and
    # the IVF recall-vs-nprobe tuning curve
    "corpus_sequence_packing",
    "simhash_recall_precision",
    "ann_recall_nprobe_sweep",
    # round-8 additions, second batch: the LSH banding tuning curve,
    # the Count-Min frequency sketch with measured overestimate, and
    # the cluster-aware (leakage-safe) split
    "dedup_band_sweep",
    "heavy_hitters_countmin",
    "leakage_safe_split_assignment",
    # round-8 additions, third batch: temperature mixture targets,
    # exact-k stratified sampling, JL projection distortion
    "mixture_temperature_targets",
    "bottomk_sample_per_type",
    "embedding_projection_distortion",
    # round-8 additions, fourth batch: ORC sink/source round-trip
    # (streaming_full_outer_join_nulls stays unbenched like the other
    # multi-batch streaming replays — their wall time is dominated by
    # micro-batch scheduling, not data-path work)
    "orc_roundtrip_rollup",
    # round-9 additions: real PNG decode (stdlib zlib + numpy
    # unfiltering, all five scanline filters, every 8-bit color type,
    # both progressive modes) and benchmark decontamination (n-gram
    # overlap vs a held-out slice, broadcast-semi-join shape)
    "multimodal_png_decode",
    "benchmark_decontamination",
    # round-9 additions, second batch: GIF decode (pure-Python LZW +
    # 4-pass row interlace + palette) and WAV PCM audio decode (RIFF
    # chunk walker) — the audio modality's first real decoder
    "multimodal_gif_decode",
    "multimodal_wav_decode",
    # round-9 additions, third batch: real end-to-end image resize
    # (decode -> nearest-neighbor -> PNG re-encode -> re-decode)
    "multimodal_resize_decode",
    # round-9 additions, fourth batch: distributed BPE tokenizer
    # training (vocab-sized merge rounds, one argmax row per round)
    # and corpus-scale application (chained column-level replaces)
    "bpe_train_merges",
    "bpe_token_counts",
    # round-9 additions, fifth batch: Unicode NFC normalization (the
    # pre-hash hygiene step; one of the few legitimately-UDF ops —
    # Spark has no JVM builtin for Unicode normalization)
    "text_nfc_normalization",
    # round-10 additions: baseline JPEG — the pixel path (Huffman +
    # dequant + einsum IDCT + JFIF color over gray/4:4:4/4:2:0 with
    # restart markers) and the AC entropy-layer path (zigzag-weighted
    # coefficient checksum)
    "multimodal_jpeg_decode",
    "multimodal_jpeg_coefficients",
    # round-10, second wave: progressive (SOF2) JPEG — the Annex G
    # scan-script state machine end to end
    "multimodal_jpeg_progressive",
    # round-10, third wave: 12-bit extended precision (uint16 output,
    # extended Huffman categories, both entropy layouts)
    "multimodal_jpeg12_decode",
    # round-10, fourth wave: lossless (SOF3) prediction process —
    # all seven Annex H predictors across the corpus
    "multimodal_jpeg_lossless_decode",
    # round-11 additions: ARITHMETIC-coded JPEG (SOF9 + SOF10) — the
    # Annex D QM coder with the Annex F statistical models, pixel
    # path and AC coefficient-checksum path
    "multimodal_jpeg_arithmetic",
    "multimodal_jpeg_arithmetic_coefficients",
]


#: committed quiet-machine reference for the calibration spin (median
#: of repeated runs on an idle local[32] host — re-measure and commit
#: whenever the hardware changes). Re-minted round 12: the r8-era
#: 0.75/0.78 pair was measured on a faster host class — this box
#: spins 0.86-1.04 (median 0.92 single / 0.96 mt over 15+7 samples)
#: while PROVABLY idle (loadavg 0 running, /proc/stat steal delta 0,
#: vmstat 100% idle), so every pass since r8 read "loaded" and
#: --write-quiet was permanently refused. The emitted load_factor =
#: measured/quiet lets the driver/judge normalize ambient-load noise
#: out of round-over-round comparisons instead of inferring it from
#: cross-file query ratios (VERDICT r5 item 5); loaded=true flags a
#: pass whose numbers should be read as inflated.
CALIBRATION_QUIET_SEC = 0.92
#: committed quiet median for the PARALLEL spin — barely above the
#: single-core value on an unloaded 32-core box; diverges from it
#: exactly when co-tenant load eats cores without slowing any single
#: thread (the failure mode the round-6 single-spin probe missed:
#: load_factor 1.0 while every 32-thread query ran ~1.1x). Like
#: CALIBRATION_QUIET_SEC this pair (quiet value + worker count) is
#: HOST-PINNED: on a different box re-measure and re-commit both
#: (workers scale as cpu_count/4 so a smaller host doesn't flag an
#: idle machine as loaded by oversubscribing itself).
CALIBRATION_MT_QUIET_SEC = 0.96
CALIBRATION_MT_WORKERS = max(1, min(8, (os.cpu_count() or 8) // 4))
CALIBRATION_LOADED_FACTOR = 1.2


#: load-outlier re-timing (VERDICT r8 item 2): the r8 external record
#: carries a 49.92s pricing_summary_q1 — 60x its quiet time — purely
#: from sustained co-tenant load that min-of-2 cannot absorb. Defense:
#: compare every query's best pass against the COMMITTED quiet-host
#: reference (BENCH_QUIET.json, written by `bench.py --write-quiet` on
#: an idle box and committed) and re-time, with bounded extra passes,
#: any query whose best is > RETIME_RATIO x its quiet time (load may
#: subside mid-run) or whose two passes split by > RETIME_RATIO
#: (transient spike — one confirming pass). Queries still inflated
#: after the retry budget are ANNOTATED per-query in the artifact,
#: attributed by the calibration evidence: `loaded_queries` when the
#: pass measured loaded ("this number is load, not code"), or
#: `regression_candidates` when the pass measured QUIET (a 4x on an
#: idle host is a real regression and must never wear a load label).
RETIME_RATIO = 3.0
RETIME_MAX_EXTRA = 3
QUIET_REF_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_QUIET.json"
)


def load_quiet_reference(path: str = QUIET_REF_PATH) -> dict[str, float]:
    """Per-query quiet-pass seconds from the committed reference;
    empty when absent (first run on a new host) — re-timing then
    falls back to the pass-split trigger alone. Only references
    matching the CURRENT sf directory apply: comparing an sf0.01 run
    against committed sf0.1 times would flag everything or nothing."""
    try:
        with open(path) as fh:
            d = json.load(fh)
        if d.get("sf_dir") != SF_DIR:
            return {}
        return {
            k: float(v)
            for k, v in d.get("queries", {}).items()
            if isinstance(v, (int, float)) and v > 0
        }
    except (OSError, ValueError):
        return {}


def needs_retime(passes: list[float], quiet_ref: float | None) -> bool:
    """True while a query's timing is not yet credible: best pass
    still > RETIME_RATIO x the committed quiet time (sustained load —
    keep retrying within budget), or the initial two passes split by
    > RETIME_RATIO with no confirming third pass yet (transient
    spike). Sub-100ms quiet references are below the scheduler-noise
    floor — a 3x there is milliseconds, not a load artifact — so the
    ratio trigger only arms above it."""
    best = min(passes)
    if quiet_ref is not None and quiet_ref >= 0.1 and best > RETIME_RATIO * quiet_ref:
        return True
    return len(passes) == 2 and max(passes) > RETIME_RATIO * best


# ---------------------------------------------------------------------------
# CPU-time channel (VERDICT r10 item 1): two consecutive rounds the
# committed wall-clock number was noise-dominated by co-tenant load,
# and the quiet-window hunter proved a quiet pass may never come.
# CPU time barely moves with co-tenant load, so it is the channel the
# round-over-round regression comparison trusts. Two meters:
#   - cpu_sec: utime+stime of the WHOLE PROCESS TREE rooted at this
#     driver (JVM + pyspark daemon/workers + driver python) read from
#     /proc — covers the Python codec stages executorCpuTime cannot
#     see. Linux-only; degrades to absent elsewhere.
#   - jvm_cpu_sec: per-stage executorCpuTime from the AppStatusStore,
#     summed over the stages each pass submitted (stage-id floor per
#     pass, so retained-stage eviction of OLD stages can never make a
#     delta negative). JVM task CPU only — the whole-stage-codegen
#     view of the same pass.
# ---------------------------------------------------------------------------

#: CPU ratio above which a query is flagged against the committed CPU
#: reference. Tighter than RETIME_RATIO on purpose: CPU needs no load
#: headroom — 1.5x the reference CPU is a real plan/code change, not
#: a busy box (frequency scaling + SMT contention stay well under it).
CPU_REGRESSION_RATIO = 1.5
CPU_REF_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_CPU_REF.json"
)


def proc_tree_cpu_by_class() -> tuple[float, float] | None:
    """(total, worker_python) CPU seconds of this process and every
    live descendant — utime+stime plus reaped-children cutime/cstime
    for the total. ``worker_python`` is the CPU of python processes
    UNDER the JVM (pyspark daemons + workers): the share the
    executorCpuTime meter cannot see, measured directly so the
    regression detector's Python channel is actual Python work, never
    the JVM's own GC/JIT remainder (round-11 refinement). Since round
    12 (ADVICE r11) the worker channel also counts cutime/cstime for
    those processes: a worker that EXITS between snapshots migrates
    its CPU into the daemon's reaped-children counters, which used to
    leave the total but silently vanish from worker_python —
    negative/undercounted per-pass deltas that could mint a
    systematically low reference. (The daemon's children are only
    workers, so its cutime is worker CPU by construction.) None when
    /proc is unavailable (non-Linux) — the channel then degrades to
    absent rather than lying."""
    try:
        tick = os.sysconf("SC_CLK_TCK")
        stats: dict[int, tuple[int, int, str]] = {}
        children: dict[int, list[int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as fh:
                    # comm (field 2) may contain spaces/parens — split
                    # on the LAST ')' per proc(5)
                    raw = fh.read()
                comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
                rest = raw.rsplit(")", 1)[1].split()
            except (OSError, IndexError):
                continue  # raced a process exit
            pid = int(d)
            ppid = int(rest[1])
            # fields 14-17 (utime stime cutime cstime), 0-indexed from
            # field 3 => rest[11:15]; own = utime+stime only (live)
            own = int(rest[11]) + int(rest[12])
            full = own + int(rest[13]) + int(rest[14])
            stats[pid] = (full, own, comm)
            children.setdefault(ppid, []).append(pid)
        total = 0
        worker_py = 0
        stack: list[tuple[int, bool]] = [(os.getpid(), False)]
        seen: set[int] = set()
        while stack:
            p, under_jvm = stack.pop()
            if p in seen:
                continue
            seen.add(p)
            full, own, comm = stats.get(p, (0, 0, "?"))
            total += full
            is_jvm = comm == "java"
            if under_jvm and not is_jvm:
                worker_py += full
            for c in children.get(p, []):
                stack.append((c, under_jvm or is_jvm))
        return total / tick, worker_py / tick
    except (OSError, ValueError, AttributeError):
        return None


def proc_tree_cpu_sec() -> float | None:
    """Back-compat scalar view of ``proc_tree_cpu_by_class``."""
    both = proc_tree_cpu_by_class()
    return None if both is None else both[0]


class JvmCpuMeter:
    """Per-pass executor CPU from Spark's AppStatusStore, read over
    py4j (local mode: same JVM). ``mark()`` records the current max
    stage id; ``read()`` sums executorCpuTime over stages submitted
    since the mark, draining the listener bus first so asynchronous
    metric aggregation cannot undercount a just-finished pass. Any
    py4j surface change degrades the meter to None results — the
    bench must never die on a metrics probe."""

    def __init__(self, spark) -> None:
        try:
            sc = spark.sparkContext
            self._store = sc._jsc.sc().statusStore()
            self._bus = sc._jsc.sc().listenerBus()
            self._jvm = sc._jvm
            self._gw = sc._gateway
            self._stages()  # probe the 5-arg stageList signature now
            self._ok = True
        except Exception:  # noqa: BLE001 — probe, not control flow
            self._ok = False
        self._floor = -1

    def _stages(self):
        empty = self._jvm.java.util.ArrayList()
        quantiles = self._gw.new_array(self._jvm.double, 0)
        return self._store.stageList(
            empty, False, False, quantiles, self._jvm.java.util.ArrayList()
        )

    def mark(self) -> None:
        if not self._ok:
            return
        try:
            self._bus.waitUntilEmpty()
            stages = self._stages()
            self._floor = max(
                [stages.apply(i).stageId() for i in range(stages.size())],
                default=-1,
            )
        except Exception:  # noqa: BLE001
            self._ok = False

    def read(self) -> float | None:
        """CPU seconds of all stages with id > the last mark()."""
        if not self._ok:
            return None
        try:
            self._bus.waitUntilEmpty()
            stages = self._stages()
            ns = sum(
                stages.apply(i).executorCpuTime()
                for i in range(stages.size())
                if stages.apply(i).stageId() > self._floor
            )
            return ns / 1e9
        except Exception:  # noqa: BLE001
            self._ok = False
            return None


#: per-channel floors for arming the regression detector. Below them a
#: channel is scheduler/GC-noise-dominated — measured round 11: between
#: two back-to-back clean passes, sub-0.5s executorCpuTime references
#: moved ~1.5x and the WHOLE-TREE CPU of sub-2s pure-JVM queries moved
#: +/-1.5s (non-task GC/JIT attribution depends on what ran before),
#: while worker-python CPU and >=0.5s executor CPU stayed flat.
CPU_JVM_REF_FLOOR = 0.5
CPU_WORKER_REF_FLOOR = 0.5
CPU_TREE_REF_FLOOR = 2.0  # legacy-ref fallback only


def load_cpu_reference(path: str = CPU_REF_PATH) -> tuple[
    dict[str, float], dict[str, float], dict[str, float]
]:
    """Committed per-query (process-tree CPU, JVM executor CPU,
    worker-python CPU) for the current sf dir; empty when absent or for
    a different scale. Unlike the wall-clock quiet reference, this CAN
    be minted on a loaded box (--write-cpu-ref): load-robustness is the
    whole point of the channel."""
    try:
        with open(path) as fh:
            d = json.load(fh)
        if d.get("sf_dir") != SF_DIR:
            return {}, {}, {}

        def clean(key: str) -> dict[str, float]:
            return {
                k: float(v)
                for k, v in d.get(key, {}).items()
                if isinstance(v, (int, float)) and v > 0
            }

        return (
            clean("cpu_queries"),
            clean("jvm_cpu_queries"),
            clean("py_cpu_queries"),
        )
    except (OSError, ValueError):
        return {}, {}, {}


def cpu_regressions(
    cpu_timings: dict[str, float],
    cpu_ref: dict[str, float],
    jvm_cpu_timings: dict[str, float] | None = None,
    jvm_cpu_ref: dict[str, float] | None = None,
    py_cpu_timings: dict[str, float] | None = None,
    py_cpu_ref: dict[str, float] | None = None,
) -> dict[str, float]:
    """Queries whose measured CPU exceeds CPU_REGRESSION_RATIO x the
    committed reference on a channel that is STABLE for that query —
    never relabeled as load (task/worker CPU barely moves with load),
    so these are regression candidates unconditionally.

    Two direct channels (round-11 refinement — the original single
    process-tree ratio false-flagged small queries whose non-task
    GC/JIT share wobbled between clean passes):
      - JVM channel: per-stage executorCpuTime (task work only);
      - Python channel: worker-python CPU measured directly from the
        process tree (pyspark daemons/workers under the JVM) — actual
        Python work, never the JVM's own remainder.
    Each arms above its noise floor. When the committed reference
    predates the per-class split (no py_cpu_queries), the detector
    falls back to the whole-tree ratio with a conservative 2 s floor."""
    jvm_cpu_timings = jvm_cpu_timings or {}
    jvm_cpu_ref = jvm_cpu_ref or {}
    py_cpu_timings = py_cpu_timings or {}
    py_cpu_ref = py_cpu_ref or {}
    out = {}
    names = set(cpu_ref) | set(jvm_cpu_ref) | set(py_cpu_ref)
    for name in names:
        ratios = []
        jvm_got, jvm_ref = jvm_cpu_timings.get(name), jvm_cpu_ref.get(name)
        if (
            isinstance(jvm_got, (int, float))
            and isinstance(jvm_ref, (int, float))
            and jvm_ref >= CPU_JVM_REF_FLOOR
            and jvm_got > CPU_REGRESSION_RATIO * jvm_ref
        ):
            ratios.append(jvm_got / jvm_ref)
        py_got, py_ref = py_cpu_timings.get(name), py_cpu_ref.get(name)
        if (
            isinstance(py_got, (int, float))
            and isinstance(py_ref, (int, float))
            and py_ref >= CPU_WORKER_REF_FLOOR
            and py_got > CPU_REGRESSION_RATIO * py_ref
        ):
            ratios.append(py_got / py_ref)
        if not py_cpu_ref and not jvm_cpu_ref:
            got, ref = cpu_timings.get(name), cpu_ref.get(name)
            if (
                isinstance(got, (int, float))
                and isinstance(ref, (int, float))
                and ref >= CPU_TREE_REF_FLOOR
                and got > CPU_REGRESSION_RATIO * ref
            ):
                ratios.append(got / ref)
        if ratios:
            out[name] = round(max(ratios), 2)
    return out


def _spin_once(n: int = 10_000_000) -> float:
    """One fixed-work single-core spin: deterministic integer loop, no
    allocation growth — its wall time moves only with CPU contention/
    frequency, never with code or data changes in this repo."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc += i * i & 1023
    _ = acc
    return time.perf_counter() - t0


def calibrate(samples: int = 3) -> dict:
    """Median-of-N spin time + ratio to the committed quiet value.
    Median (not min) on purpose: the point is to MEASURE the load the
    query timings actually experienced, not to dodge it."""
    if samples < 1:
        raise ValueError("calibrate needs samples >= 1")
    times = sorted(_spin_once() for _ in range(samples))
    mid = len(times) // 2
    # true median: mean of the middle pair for even N (times[N//2]
    # alone would report the WORSE of the pair as 'the median')
    med = (
        times[mid]
        if len(times) % 2
        else (times[mid - 1] + times[mid]) / 2.0
    )
    factor = round(med / CALIBRATION_QUIET_SEC, 3)
    mt, mt_degraded = _spin_parallel(CALIBRATION_MT_WORKERS)
    mt_factor = round(mt / CALIBRATION_MT_QUIET_SEC, 3)
    return {
        "spin_sec": round(med, 4),
        "quiet_sec": CALIBRATION_QUIET_SEC,
        "load_factor": factor,
        "spin_mt_sec": round(mt, 4),
        "load_factor_mt": mt_factor,
        # effective worker count rides along so a host whose cpu_count
        # scaled workers below the 8 the quiet reference was measured
        # with is VISIBLE in the artifact, not silently authoritative
        "mt_workers": CALIBRATION_MT_WORKERS,
        # true when the pool fell back to a single-core spin: the
        # load_factor_mt is then NOT a multi-core measurement and a
        # loaded multi-core box could read as quiet (ADVICE r6)
        "mt_degraded": mt_degraded,
        "loaded": max(factor, mt_factor) > CALIBRATION_LOADED_FACTOR,
    }


def _spin_parallel(
    workers: int = CALIBRATION_MT_WORKERS,
) -> tuple[float, bool]:
    """Median wall time of ``workers`` SIMULTANEOUS fixed-work spins in
    separate processes (the GIL makes threads useless for this), plus a
    degraded flag. A single-core spin cannot see multi-core contention —
    a co-tenant saturating half the box leaves one thread at full speed
    while every local[32] query stage runs degraded; the parallel spin
    inflates in exactly that situation. Falls back to (single-core
    time, degraded=True) if the process pool is unavailable — the flag
    rides into the calibration dict so the fallback is never mistaken
    for a genuine multi-core measurement."""
    try:
        with ProcessPoolExecutor(workers) as ex:
            times = sorted(
                f.result()
                for f in [ex.submit(_spin_once) for _ in range(workers)]
            )
    except (OSError, ImportError, BrokenExecutor):
        # pool unavailable (ImportError: platforms without sem_open
        # raise it at POOL CONSTRUCTION, not at module import) OR a
        # worker died mid-spin (seccomp'd fork, OOM kill surface as
        # BrokenProcessPool, not OSError) — a missing probe must
        # degrade, never kill the whole bench pass
        return _spin_once(), True
    mid = len(times) // 2
    med = (
        times[mid]
        if len(times) % 2
        else (times[mid - 1] + times[mid]) / 2.0
    )
    return med, False


def main() -> None:
    from bigquery_cross_environment_etl_pipeline_spark import queries_catalog
    from bigquery_cross_environment_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = queries_catalog.spark_queries()

    # JVM/codegen warmup on a tiny table
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    # two passes per query, report the min: the first pass pays one-time
    # whole-stage-codegen compilation that a long-running cluster
    # amortizes away; the min reflects steady-state throughput.
    # fault-isolated: one broken query must never zero the whole round's
    # bench signal — record its error and keep timing the rest.
    cal_before = calibrate()
    quiet_ref = load_quiet_reference()
    cpu_ref, jvm_cpu_ref, py_cpu_ref = load_cpu_reference()
    jvm_meter = JvmCpuMeter(spark)
    timings: dict[str, object] = {}
    cpu_timings: dict[str, float] = {}
    jvm_cpu_timings: dict[str, float] = {}
    py_cpu_timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    retimed: dict[str, int] = {}
    loaded_queries: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = queries.get(name)
        if fn is None:
            errors[name] = "not registered"
            continue

        cpu_passes: list[float] = []
        jvm_cpu_passes: list[float] = []
        py_cpu_passes: list[float] = []

        def run_once(
            fn=fn, cpu=cpu_passes, jvm_cpu=jvm_cpu_passes, py_cpu=py_cpu_passes
        ) -> float:
            jvm_meter.mark()
            c0 = proc_tree_cpu_by_class()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            c1 = proc_tree_cpu_by_class()
            if c0 is not None and c1 is not None:
                # clamp at 0: process churn between snapshots can
                # still produce a slightly negative delta (ADVICE
                # r11), and a negative "min of passes" would poison
                # the committed reference
                cpu.append(max(0.0, c1[0] - c0[0]))
                py_cpu.append(max(0.0, c1[1] - c0[1]))
            j = jvm_meter.read()
            if j is not None:
                jvm_cpu.append(j)
            return wall

        try:
            passes = [run_once(), run_once()]
            ref = quiet_ref.get(name)
            while len(passes) - 2 < RETIME_MAX_EXTRA and needs_retime(passes, ref):
                passes.append(run_once())
            best = min(passes)
            timings[name] = round(best, 4)
            # min across passes, like wall: the first pass carries
            # one-time codegen-compile CPU a cluster amortizes away
            if cpu_passes:
                cpu_timings[name] = round(min(cpu_passes), 4)
            if jvm_cpu_passes:
                jvm_cpu_timings[name] = round(min(jvm_cpu_passes), 4)
            if py_cpu_passes:
                py_cpu_timings[name] = round(min(py_cpu_passes), 4)
            if len(passes) > 2:
                retimed[name] = len(passes)
            if ref is not None and ref >= 0.1 and best > RETIME_RATIO * ref:
                # still inflated after the retry budget — record the
                # ratio; whether it reads as "load" or "regression
                # candidate" is decided AFTER the pass, from the
                # calibration probes (a 4x on a measured-quiet host is
                # a real regression and must never be relabeled load)
                loaded_queries[name] = round(best / ref, 2)
        except Exception as exc:  # noqa: BLE001 — isolate per query
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    cal_after = calibrate()
    # the pass's load = the WORSE of the two probes (load arriving
    # mid-run must not be averaged away) — judged on whichever factor
    # is worse, single- or multi-core, like the loaded flag itself
    cal = max(
        cal_before,
        cal_after,
        key=lambda c: max(c["load_factor"], c["load_factor_mt"]),
    )
    # attribute persistent outliers using the calibration evidence:
    # on a pass that measured loaded they read as co-tenant load; on a
    # measured-QUIET pass a >3x-over-quiet query is a genuine
    # regression candidate and must not be masked by a load label
    if cal["loaded"]:
        regression_candidates: dict[str, float] = {}
    else:
        regression_candidates, loaded_queries = loaded_queries, {}
    line, detail = compose_output(
        timings,
        errors,
        SF_DIR,
        cal,
        retimed=retimed,
        loaded_queries=loaded_queries,
        regression_candidates=regression_candidates,
        cpu_timings=cpu_timings,
        jvm_cpu_timings=jvm_cpu_timings,
        py_cpu_timings=py_cpu_timings,
        cpu_regression_candidates=cpu_regressions(
            cpu_timings,
            cpu_ref,
            jvm_cpu_timings,
            jvm_cpu_ref,
            py_cpu_timings,
            py_cpu_ref,
        ),
    )
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    if "--write-cpu-ref" in sys.argv:
        # the CPU reference may be minted on a LOADED box — that is
        # the channel's point — but never from a pass with errors,
        # so a broken query can't freeze a hole into the baseline
        if errors:
            print(
                f"refusing --write-cpu-ref: {len(errors)} queries errored",
                file=sys.stderr,
            )
        else:
            with open(CPU_REF_PATH, "w") as fh:
                json.dump(
                    {
                        "sf_dir": SF_DIR,
                        "calibration": cal,
                        "cpu_queries": cpu_timings,
                        "jvm_cpu_queries": jvm_cpu_timings,
                        "py_cpu_queries": py_cpu_timings,
                    },
                    fh,
                    indent=1,
                )
    if "--write-quiet" in sys.argv:
        # refresh the committed quiet reference — ONLY meaningful from
        # an idle host; refuse when the pass itself measured loaded,
        # so a loaded run can never become the baseline future runs
        # are judged against
        if cal["loaded"]:
            print(
                "refusing --write-quiet: this pass measured loaded "
                f"(load_factor {cal['load_factor']}/{cal['load_factor_mt']})",
                file=sys.stderr,
            )
        else:
            with open(QUIET_REF_PATH, "w") as fh:
                json.dump(
                    {"sf_dir": SF_DIR, "calibration": cal, "queries": timings},
                    fh,
                    indent=1,
                )
    print(json.dumps(detail), file=sys.stderr)
    print(line)
    spark.stop()


#: hard budget for the final stdout line — the driver's tail capture is
#: ~2000 chars; round 3 shipped parsed=null because a 68-query inline
#: map overflowed it. Enforced in compose_output AND unit-tested
#: (tests/test_bench_output.py) so the regression class stays dead.
LINE_BUDGET = 1500


def compose_output(
    timings: dict,
    errors: dict,
    sf_dir: str,
    calibration: dict | None = None,
    retimed: dict | None = None,
    loaded_queries: dict | None = None,
    regression_candidates: dict | None = None,
    cpu_timings: dict | None = None,
    jvm_cpu_timings: dict | None = None,
    py_cpu_timings: dict | None = None,
    cpu_regression_candidates: dict | None = None,
) -> tuple[str, dict]:
    """(compact stdout line, full detail dict). The line carries
    totals + the 10 slowest queries (2 dp); the full per-query map
    goes to the detail sidecar/stderr. If the line would exceed
    LINE_BUDGET the query map is dropped entirely rather than ever
    overflowing the driver's capture window. ``retimed`` (query ->
    total pass count) and ``loaded_queries`` (query -> best/quiet
    ratio for queries STILL inflated after the retry budget) ride the
    detail sidecar, and loaded_queries also rides the line (small by
    construction — non-empty only under sustained co-tenant load)."""
    total = round(sum(t for t in timings.values() if isinstance(t, (int, float))), 4)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    detail = {
        "metric": "headline_query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        detail["errors"] = errors
    if calibration is not None:
        detail["calibration"] = calibration
    if retimed:
        detail["retimed_passes"] = retimed
    if loaded_queries:
        detail["loaded_queries"] = loaded_queries
    if regression_candidates:
        detail["regression_candidates"] = regression_candidates
    if cpu_timings:
        # the load-robust channel the round-over-round comparison
        # trusts: whole-process-tree CPU (covers Python codec stages)
        # and its JVM-only executorCpuTime companion
        detail["cpu_queries"] = cpu_timings
        detail["cpu_sec"] = round(sum(cpu_timings.values()), 2)
    if jvm_cpu_timings:
        detail["jvm_cpu_queries"] = jvm_cpu_timings
        detail["jvm_cpu_sec"] = round(sum(jvm_cpu_timings.values()), 2)
    if py_cpu_timings:
        # worker-python CPU measured per process class — the detector's
        # Python channel (actual Python work, never JVM GC/JIT noise)
        detail["py_cpu_queries"] = py_cpu_timings
        detail["py_cpu_sec"] = round(sum(py_cpu_timings.values()), 2)
    if cpu_regression_candidates:
        detail["cpu_regression_candidates"] = cpu_regression_candidates
    slowest = dict(
        sorted(
            ((k, round(v, 2)) for k, v in timings.items() if isinstance(v, (int, float))),
            key=lambda kv: -kv[1],
        )[:10]
    )
    payload = {
        "metric": "headline_query_suite_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "detail": "BENCH_DETAIL.json",
    }
    if calibration is not None:
        payload["calibration"] = calibration
    if cpu_timings:
        payload["cpu_sec"] = round(sum(cpu_timings.values()), 2)
    if jvm_cpu_timings:
        payload["jvm_cpu_sec"] = round(sum(jvm_cpu_timings.values()), 2)
    if cpu_regression_candidates:
        payload["cpu_regression_candidates"] = dict(
            sorted(cpu_regression_candidates.items(), key=lambda kv: -kv[1])[:5]
        )
        payload["n_cpu_regression_candidates"] = len(cpu_regression_candidates)
    if loaded_queries:
        payload["loaded_queries"] = dict(
            sorted(loaded_queries.items(), key=lambda kv: -kv[1])[:5]
        )
        payload["n_loaded"] = len(loaded_queries)
    if regression_candidates:
        payload["regression_candidates"] = dict(
            sorted(regression_candidates.items(), key=lambda kv: -kv[1])[:5]
        )
        payload["n_regression_candidates"] = len(regression_candidates)
    line = json.dumps(payload)
    if len(line) > LINE_BUDGET:  # drop the maps rather than overflow
        payload["queries"] = {}
        payload.pop("loaded_queries", None)
        payload.pop("regression_candidates", None)
        payload.pop("cpu_regression_candidates", None)
        line = json.dumps(payload)
    return line, detail


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — always emit the JSON line
        print(
            json.dumps(
                {
                    "metric": "headline_query_suite_total",
                    "value": None,
                    "unit": "sec",
                    "queries": {},
                    "error": f"{type(exc).__name__}: {exc}"[:500],
                }
            )
        )
        sys.exit(1)
