"""Property-based check of the CDC collapse (operators/upsert.py).

For ANY keyed change stream with ops and a total sequence order,
``apply_changes`` must equal the pandas reference: per key take the
row with the lexicographically largest (seq, row_idx), drop it if its
op is the delete marker.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from bigquery_cross_environment_etl_pipeline_spark.operators.upsert import (
    apply_changes,
    collapse_changes,
)

change_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.integers(min_value=0, max_value=9),  # seq (ties likely)
        st.sampled_from(["U", "U", "U", "D"]),  # op, deletes ~25%
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
)


def _reference(rows):
    pdf = pd.DataFrame(rows, columns=["k", "seq", "op", "v"])
    pdf["idx"] = range(len(pdf))  # unique tiebreaker
    last = pdf.sort_values(["k", "seq", "idx"]).groupby("k").tail(1)
    kept = last[last["op"] != "D"]
    return {
        int(r.k): (int(r.seq), int(r.idx), r.op, float(r.v))
        for r in kept.itertuples()
    }


@settings(max_examples=25, deadline=None)
@given(change_rows)
def test_apply_changes_matches_pandas_reference(spark, rows):
    with_idx = [(k, s, op, v, i) for i, (k, s, op, v) in enumerate(rows)]
    df = spark.createDataFrame(
        with_idx, "k long, seq long, op string, v double, idx long"
    )
    got = {
        int(r["k"]): (int(r["seq"]), int(r["idx"]), r["op"], float(r["v"]))
        for r in apply_changes(
            df, keys=["k"], sequence_cols=["seq", "idx"]
        ).collect()
    }
    assert got == _reference(rows)


@settings(max_examples=10, deadline=None)
@given(change_rows)
def test_collapse_keeps_tombstones(spark, rows):
    """collapse_changes must keep exactly one row per key (deletes
    included) — the merge-state invariant streaming CDC rests on."""
    with_idx = [(k, s, op, v, i) for i, (k, s, op, v) in enumerate(rows)]
    df = spark.createDataFrame(
        with_idx, "k long, seq long, op string, v double, idx long"
    )
    collapsed = collapse_changes(df, ["k"], ["seq", "idx"]).collect()
    keys = [r["k"] for r in collapsed]
    assert sorted(set(keys)) == sorted(keys)  # one row per key
    assert set(keys) == {k for k, *_ in rows}  # no key lost
