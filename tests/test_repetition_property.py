"""Property test: text_repetition_quality equals a plain-Python
Counter model on arbitrary generated documents (whitespace-noisy).

Tokenization semantics (matched by Spark AND the DuckDB oracle): TRIM
strips ASCII spaces only, then split on \\s+ — so a doc ending in a
tab/newline yields one empty-string token at the edge. The model below
reproduces exactly that; documents in the driver tables are
single-space-separated so the edge case never fires there."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigquery_cross_environment_etl_pipeline_spark import queries_catalog

words = st.text(alphabet="abxyz0_", min_size=1, max_size=6)
whitespace = st.sampled_from([" ", "  ", "\t", " \n "])


@st.composite
def documents(draw):
    ws = draw(st.lists(words, min_size=1, max_size=30))
    seps = [draw(whitespace) for _ in range(len(ws) - 1)]
    body = ws[0] + "".join(s + w for s, w in zip(seps, ws[1:]))
    pad = draw(whitespace) if draw(st.booleans()) else ""
    return pad + body + (draw(whitespace) if draw(st.booleans()) else "")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(documents(), min_size=1, max_size=8))
def test_repetition_metrics_match_counter_model(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, text string"
    )
    fn = queries_catalog.spark_queries()["text_repetition_quality"]

    # the catalog entry loads the documents table; apply the same
    # operator body to the generated frame instead
    from pyspark.sql import functions as F

    from bigquery_cross_environment_etl_pipeline_spark.operators import text

    counts = (
        df.select("doc_id", F.explode(text.tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {
        r["doc_id"]: r
        for r in counts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").cast("bigint").alias("top_token_count"),
        )
        .collect()
    }
    assert fn is not None  # catalog entry exists alongside the operator form
    for i, d in enumerate(docs):
        toks = re.split(r"\s+", d.strip(" "))
        c = Counter(toks)
        assert got[i]["n_tokens"] == len(toks), d
        assert got[i]["n_distinct"] == len(c), d
        assert got[i]["top_token_count"] == max(c.values()), d
