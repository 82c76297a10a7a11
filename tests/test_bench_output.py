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
