"""The bench CLI's final stdout line must ALWAYS stay under the
driver's tail-capture window (round-3 BENCH parsed=null lesson) and
parse as the documented shape, no matter how many queries exist."""

from __future__ import annotations

import json

import bench


def _mk(n_queries: int, n_errors: int = 0):
    timings = {f"some_quite_long_query_name_number_{i:04d}": 1.2345 for i in range(n_queries)}
    errors = {f"broken_query_{i}": "Boom: " + "x" * 400 for i in range(n_errors)}
    return timings, errors


def test_line_fits_budget_at_every_scale():
    for n in (0, 10, 82, 200, 1000):
        line, detail = bench.compose_output(*_mk(n), "/root/testdata/sf0.1")
        assert len(line) <= bench.LINE_BUDGET, (n, len(line))
        d = json.loads(line)
        assert d["metric"] == "headline_query_suite_total"
        assert d["unit"] == "sec"
        assert d["n_queries"] == n and d["n_errors"] == 0
        assert d["sf"] == 0.1
        assert len(detail["queries"]) == n


def test_errors_never_leak_into_the_line():
    line, detail = bench.compose_output(*_mk(82, n_errors=30), "/root/testdata/sf0.01")
    assert len(line) <= bench.LINE_BUDGET
    d = json.loads(line)
    assert d["n_errors"] == 30
    assert "Boom" not in line, "error text belongs in the sidecar only"
    assert len(detail["errors"]) == 30


def test_total_is_sum_of_timings():
    timings = {"a": 1.5, "b": 2.25}
    line, detail = bench.compose_output(timings, {}, "/root/testdata/sf0.001")
    d = json.loads(line)
    assert d["value"] == 3.75 == detail["value"]
    assert d["queries"] == {"b": 2.25, "a": 1.5}


def test_calibration_field_rides_the_line():
    """The calibration probe (VERDICT r5 item 5) must appear in BOTH
    the stdout line and the detail sidecar, with the load flag derived
    from the committed quiet reference — and must never push the line
    over the tail-capture budget."""
    cal = bench.calibrate(samples=1)
    assert cal["spin_sec"] > 0
    assert cal["quiet_sec"] == bench.CALIBRATION_QUIET_SEC
    # loaded is judged on the WORSE of the single- and multi-core
    # factors (ADVICE r6: an mt-only load must not read as quiet);
    # asserting only the single-core factor raced real background load
    assert cal["loaded"] == (
        max(cal["load_factor"], cal["load_factor_mt"])
        > bench.CALIBRATION_LOADED_FACTOR
    )
    line, detail = bench.compose_output(
        *_mk(200), "/root/testdata/sf0.1", cal
    )
    assert len(line) <= bench.LINE_BUDGET
    d = json.loads(line)
    assert d["calibration"] == cal == detail["calibration"]


def test_calibration_includes_the_parallel_spin():
    """The MULTI-CORE probe (round-6 addition): co-tenant load can eat
    cores without slowing any single thread, so the calibration must
    carry a parallel spin beside the single-core one, and the loaded
    flag must consider BOTH factors."""
    cal = bench.calibrate(samples=1)
    assert cal["spin_mt_sec"] > 0
    assert cal["load_factor_mt"] == round(
        cal["spin_mt_sec"] / bench.CALIBRATION_MT_QUIET_SEC, 3
    )
    assert cal["loaded"] == (
        max(cal["load_factor"], cal["load_factor_mt"])
        > bench.CALIBRATION_LOADED_FACTOR
    )


def test_bench_list_is_registered():
    """Every BENCH_QUERIES name must exist in the registry — a rename
    that forgets bench.py should fail here, not as a silent
    'not registered' error entry in the round record."""
    from bigquery_cross_environment_etl_pipeline_spark import queries_catalog

    q = queries_catalog.spark_queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, missing


def test_needs_retime_triggers():
    """Load-outlier re-timing (VERDICT r8 item 2): a best pass > 3x
    the committed quiet reference keeps re-timing; a >3x two-pass
    split earns exactly one confirming pass; sub-100ms references are
    below the noise floor and never arm the ratio trigger."""
    # sustained load vs quiet ref: keeps triggering until best drops
    assert bench.needs_retime([49.9, 50.1], quiet_ref=0.45)
    assert bench.needs_retime([49.9, 50.1, 48.7], quiet_ref=0.45)
    assert not bench.needs_retime([49.9, 50.1, 1.2], quiet_ref=0.45)
    # transient spike: one confirming pass, then stop
    assert bench.needs_retime([10.0, 1.0], quiet_ref=None)
    assert not bench.needs_retime([10.0, 1.0, 1.1], quiet_ref=None)
    # agreeing passes, no ref: credible as-is
    assert not bench.needs_retime([1.0, 1.1], quiet_ref=None)
    # noise floor: 3x of an 0.05s query is milliseconds, not load
    assert not bench.needs_retime([0.3, 0.31], quiet_ref=0.05)


def test_quiet_reference_is_sf_scoped(tmp_path):
    """A committed sf0.1 reference must not judge an sf0.01 run."""
    import json as _json

    p = tmp_path / "BENCH_QUIET.json"
    p.write_text(
        _json.dumps({"sf_dir": "/root/testdata/sf0.0417", "queries": {"q": 1.5}})
    )
    assert bench.load_quiet_reference(str(p)) == {}
    p.write_text(
        _json.dumps({"sf_dir": bench.SF_DIR, "queries": {"q": 1.5, "bad": "x"}})
    )
    assert bench.load_quiet_reference(str(p)) == {"q": 1.5}
    assert bench.load_quiet_reference(str(tmp_path / "missing.json")) == {}


def test_loaded_queries_annotation_rides_line_and_detail():
    """Queries still inflated after the retry budget must be visible
    in BOTH the stdout line (top-5) and the sidecar (all), and the
    line must still fit the budget even with many annotations."""
    timings, errors = _mk(120)
    loaded = {f"some_quite_long_query_name_number_{i:04d}": 60.0 - i for i in range(30)}
    retimed = {k: 5 for k in loaded}
    line, detail = bench.compose_output(
        timings, errors, "/root/testdata/sf0.1",
        retimed=retimed, loaded_queries=loaded,
    )
    assert len(line) <= bench.LINE_BUDGET
    d = json.loads(line)
    assert d["n_loaded"] == 30
    assert len(d.get("loaded_queries", {})) <= 5
    assert detail["loaded_queries"] == loaded
    assert detail["retimed_passes"] == retimed
    # quiet pass: no annotation keys at all
    line2, detail2 = bench.compose_output(timings, errors, "/root/testdata/sf0.1")
    assert "loaded_queries" not in detail2 and "retimed_passes" not in detail2
    assert "n_loaded" not in json.loads(line2)


def test_quiet_pass_outliers_are_regression_candidates_not_load():
    """Attribution (review finding, round 9): a >3x-over-quiet query
    on a pass whose calibration measured QUIET is a genuine
    regression candidate — compose_output must carry it under
    `regression_candidates`, never under the load label that tells
    future readers to ignore it."""
    timings, errors = _mk(10)
    cands = {"q_regressed": 4.2}
    line, detail = bench.compose_output(
        timings, errors, "/root/testdata/sf0.1",
        regression_candidates=cands,
    )
    d = json.loads(line)
    assert detail["regression_candidates"] == cands
    assert d["regression_candidates"] == {"q_regressed": 4.2}
    assert d["n_regression_candidates"] == 1
    assert "loaded_queries" not in detail and "n_loaded" not in d


# ---------------------------------------------------------------------------
# round-11 CPU-time channel
# ---------------------------------------------------------------------------


def test_cpu_channel_rides_detail_and_line_within_budget():
    timings, errors = _mk(200)
    cpu = {k: 0.9 for k in timings}
    jvm = {k: 0.5 for k in timings}
    regress = {k: 2.1 for k in list(timings)[:40]}
    line, detail = bench.compose_output(
        timings, errors, "/root/testdata/sf0.1",
        cpu_timings=cpu, jvm_cpu_timings=jvm,
        cpu_regression_candidates=regress,
    )
    assert len(line) <= bench.LINE_BUDGET
    payload = json.loads(line)
    assert payload["cpu_sec"] == round(sum(cpu.values()), 2)
    assert payload["jvm_cpu_sec"] == round(sum(jvm.values()), 2)
    assert detail["cpu_queries"] == cpu
    assert detail["jvm_cpu_queries"] == jvm
    assert detail["cpu_regression_candidates"] == regress
    # the line carries at most 5 candidates + the full count
    if "cpu_regression_candidates" in payload:
        assert len(payload["cpu_regression_candidates"]) <= 5
        assert payload["n_cpu_regression_candidates"] == 40


def test_cpu_regressions_flags_only_real_ratios():
    ref = {"a": 2.0, "b": 1.0, "tiny": 0.05, "gone": 3.0}
    got = {"a": 3.5, "b": 1.2, "tiny": 5.0}
    out = bench.cpu_regressions(got, ref)
    # a: 1.75x > 1.5 -> flagged; b: 1.2x -> clean; tiny: below the
    # 100ms noise floor -> never arms; gone: unmeasured -> skipped
    assert out == {"a": 1.75}


def test_proc_tree_cpu_monotonic_and_positive():
    c0 = bench.proc_tree_cpu_sec()
    if c0 is None:  # non-Linux degrade path
        return
    acc = 0
    for i in range(2_000_000):
        acc += i * i & 1023
    _ = acc
    c1 = bench.proc_tree_cpu_sec()
    assert c1 >= c0 > 0


def test_cpu_reference_ignores_other_scale(tmp_path):
    p = tmp_path / "ref.json"
    p.write_text(json.dumps({"sf_dir": "/root/testdata/sf0.1",
                             "cpu_queries": {"a": 1.0},
                             "jvm_cpu_queries": {"a": 0.4},
                             "py_cpu_queries": {"a": 0.5}}))
    want = (
        ({"a": 1.0}, {"a": 0.4}, {"a": 0.5})
        if bench.SF_DIR == "/root/testdata/sf0.1"
        else ({}, {}, {})
    )
    assert bench.load_cpu_reference(str(p)) == want


def test_cpu_regressions_two_channel_detector():
    # JVM channel: armed at >=0.5s ref; Python channel: worker CPU
    # measured directly; whole-tree never arms when class refs exist
    jvm_ref = {"jq": 2.0, "tiny_jvm": 0.2, "both": 1.0}
    jvm_got = {"jq": 3.5, "tiny_jvm": 2.0, "both": 1.1}
    py_ref = {"pq": 4.0, "tiny_py": 0.3, "both": 3.0}
    py_got = {"pq": 7.0, "tiny_py": 3.0, "both": 5.1}
    tree_ref = {"jq": 9.0, "pq": 9.0, "both": 9.0, "tree_only": 9.0}
    tree_got = {"jq": 1.0, "pq": 1.0, "both": 1.0, "tree_only": 90.0}
    out = bench.cpu_regressions(
        tree_got, tree_ref, jvm_got, jvm_ref, py_got, py_ref
    )
    # jq: jvm 1.75x flags; pq: py 1.75x flags; both: py 1.7x flags;
    # tiny_*: below channel floors never arm; tree_only: the tree
    # fallback is OFF when per-class references exist
    assert out == {"jq": 1.75, "pq": 1.75, "both": 1.7}
    # legacy reference (no per-class maps): tree fallback with 2s floor
    legacy = bench.cpu_regressions({"a": 3.5, "b": 5.0}, {"a": 2.0, "b": 1.0})
    assert legacy == {"a": 1.75}


def test_jvm_cpu_meter_measures_real_stages(spark):
    """The AppStatusStore probe must survive this Spark version's py4j
    surface and attribute nonzero CPU to a real job (or degrade to
    None cleanly, never raise)."""
    meter = bench.JvmCpuMeter(spark)
    meter.mark()
    spark.range(2_000_000).selectExpr("sum(id % 97) as s").collect()
    got = meter.read()
    assert got is None or got > 0
    # a mark() directly followed by read() sees (approximately) no new
    # stages — the floor logic isolates per-pass attribution
    meter.mark()
    idle = meter.read()
    assert idle is None or idle == 0.0
