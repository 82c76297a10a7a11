"""Property-based check: asof_join must agree with pandas.merge_asof on
arbitrary generated frames (hypothesis drives the shapes)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigquery_cross_environment_etl_pipeline_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)

# (key, minute-offset) pairs; right side gets distinct (key, ts) rows
left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=25
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=25
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(
        {
            "key": [k for k, _ in left],
            "ts": [BASE + dt.timedelta(minutes=m) for _, m in left],
            "lid": range(len(left)),
        }
    )
    # one right row per (key, ts): merge_asof ties are otherwise ambiguous
    rpdf = (
        pd.DataFrame(
            {
                "key": [k for k, _ in right],
                "rts": [BASE + dt.timedelta(minutes=m) for _, m in right],
            }
        )
        .drop_duplicates(["key", "rts"])
        .reset_index(drop=True)
    )
    rpdf["rid"] = rpdf.index.astype("int64")

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            ldf, rdf, "key", "key", "ts", "rts", right_payload=["rid"], how="left"
        ).collect()
    }

    expect_df = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]),
        rpdf.sort_values("rts"),
        left_on="ts",
        right_on="rts",
        by="key",
        direction="backward",
    )
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in expect_df.itertuples()
    }
    assert got == expect
