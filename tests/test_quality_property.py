"""Property-based checks: snapshot_diff classification and the
histogram-sketch error bound."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigquery_cross_environment_etl_pipeline_spark.operators.quality import (
    snapshot_diff,
)

# payloads deliberately include NULLs, empty strings, and
# delimiter-bearing values — the collision cases a naive
# concat_ws fingerprint misclassifies as unchanged
PAYLOADS = [None, "", "a", "b", "a|b", "b|c", "a:b", "1:a", "3:abc"]

snap = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # key
        st.sampled_from(PAYLOADS),
        st.sampled_from(PAYLOADS),
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(max_examples=25, deadline=None)
@given(snap, snap)
def test_snapshot_diff_matches_set_semantics(spark, a_rows, b_rows):
    a_map = {k: (v1, v2) for k, v1, v2 in a_rows}
    b_map = {k: (v1, v2) for k, v1, v2 in b_rows}
    schema = "k int, v1 string, v2 string"
    a = spark.createDataFrame(a_rows or [(None, None, None)], schema).filter(
        "k IS NOT NULL"
    )
    b = spark.createDataFrame(b_rows or [(None, None, None)], schema).filter(
        "k IS NOT NULL"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(
            a, b, keys=["k"], compare_cols=["v1", "v2"]
        ).collect()
    }
    want = {}
    for k in set(a_map) | set(b_map):
        if k not in a_map:
            want[k] = "added"
        elif k not in b_map:
            want[k] = "removed"
        elif a_map[k] != b_map[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


def test_snapshot_diff_null_and_delimiter_collisions(spark):
    """The documented collision cases: NULL shifting between columns
    and delimiter-straddling values MUST classify as changed."""
    a = spark.createDataFrame(
        [(1, "x", None), (2, "a|b", "c"), (3, "1:a", "bc")],
        "k int, v1 string, v2 string",
    )
    b = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b|c"), (3, "1", "a3:bc")],
        "k int, v1 string, v2 string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(a, b, keys=["k"], compare_cols=["v1", "v2"]).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "changed"}


def test_histogram_quantile_within_bucket_width(spark):
    """The sketch's quantile estimate (bucket lower edge) must sit
    within one bucket width below the exact quantile — the documented
    error bound."""
    from bigquery_cross_environment_etl_pipeline_spark.plans.extended import (
        histogram_quantile_sketch,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    est = {
        r["event_type"]: (r["p50_bucket"], r["p95_bucket"], r["p99_bucket"])
        for r in histogram_quantile_sketch(spark, sf).collect()
    }
    events = load_table(spark, sf, "events")
    import numpy as np

    rows = events.select("event_type", "value").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for etype, vals in by_type.items():
        arr = np.sort(np.array(vals))
        for q, bucket in zip((0.5, 0.95, 0.99), est[etype]):
            exact = arr[min(len(arr) - 1, int(np.ceil(q * len(arr))) - 1)]
            assert bucket <= exact < bucket + 1 + 1e-9, (etype, q, bucket, exact)
