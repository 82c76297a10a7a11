"""jl_project structural checks: the Spark fold equals the numpy
matmul with the same sign matrix, and the sign matrix is balanced
enough to be a real projection (not degenerate)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators import similarity


def test_jl_signs_shape_and_balance():
    rows = similarity.jl_signs()
    assert len(rows) == similarity.JL_OUT
    assert all(len(r) == similarity.DIM for r in rows)
    flat = [s for r in rows for s in r]
    assert set(flat) == {1.0, -1.0}
    # md5 parity should be roughly balanced; a heavily lopsided matrix
    # would make the projection near-rank-deficient
    pos = sum(1 for s in flat if s > 0)
    assert 0.35 < pos / len(flat) < 0.65
    # rows must be distinct (distinct hash salts -> distinct rows)
    assert len({tuple(r) for r in rows}) == similarity.JL_OUT


def test_jl_project_matches_numpy_matmul(spark):
    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(5, similarity.DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["p"]
        for r in df.select(
            "vec_id", similarity.jl_project("embedding").alias("p")
        ).collect()
    }
    signs = np.array(similarity.jl_signs())
    for i in range(5):
        expect = signs @ vecs[i].astype(np.float64)
        got = np.array(out[i])
        # strict left fold vs np.dot may differ in the last ulps only
        np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)
