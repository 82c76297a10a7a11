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
