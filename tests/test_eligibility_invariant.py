"""Continuously verify the '100% eligible driver data' assumption.

The 17 embedding-family queries load through the shared
vector-eligibility contract (similarity.embedding_eligible /
eligible_emb_pred) but were deliberately NOT force-windowed when the
contract landed in round 6, on the claim that every driver-scale
embeddings table is 100% eligible — so outputs are bit-identical to
the rows prior greens attest. This test turns that comment into a
checked invariant (ADVICE r6 item 5): if a future fixture refresh
plants ineligible vectors in the DRIVER data (not just the edge
fixture), the assumption breaks loudly here instead of shipping
changed behavior on stale green evidence.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators.similarity import (
    embedding_eligible,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", [d for d in _SF_DIRS if os.path.isdir(d)])
def test_driver_embeddings_are_fully_eligible(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(embedding_eligible("embedding").cast("int")).alias("eligible"),
    ).first()
    assert counts["total"] > 0, sf_dir
    assert counts["eligible"] == counts["total"], (
        f"{sf_dir}: {counts['total'] - counts['eligible']} ineligible vectors — "
        "the 17 vector queries' un-forced eligibility hardening no longer "
        "matches prior green evidence; force-window them this round"
    )
