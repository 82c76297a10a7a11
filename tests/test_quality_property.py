"""Property-based checks: snapshot_diff classification and the
histogram-sketch error bound."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigquery_cross_environment_etl_pipeline_spark.operators.quality import (
    snapshot_diff,
)

snap = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),  # key
        st.integers(min_value=0, max_value=3),  # payload
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(max_examples=20, deadline=None)
@given(snap, snap)
def test_snapshot_diff_matches_set_semantics(spark, a_rows, b_rows):
    a_map, b_map = dict(a_rows), dict(b_rows)
    a = spark.createDataFrame(a_rows or [(None, None)], "k int, v int").filter(
        "k IS NOT NULL"
    )
    b = spark.createDataFrame(b_rows or [(None, None)], "k int, v int").filter(
        "k IS NOT NULL"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(a, b, keys=["k"], compare_cols=["v"]).collect()
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
