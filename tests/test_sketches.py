"""Count-Min sketch invariants + leakage-safe split structure.

The oracle parity suite proves both engines compute the same numbers;
these tests pin the STRUCTURAL properties those numbers rely on —
mergeability (the 100 TB contract: partial grids sum), the
never-underestimates guarantee, and the no-cluster-spans-splits
leakage invariant — on data constructed to actually exercise them
(forced collisions, forced near-dup pairs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import sketches


def _occ(spark, toks):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def test_countmin_never_underestimates_and_is_exact_sans_collisions(spark):
    occ = _occ(spark, ["a"] * 5 + ["b"] * 3 + ["c"])
    sk = sketches.countmin_sketch(occ)
    items = occ.distinct()
    est = {
        r["token"]: r["est_n"]
        for r in sketches.countmin_estimate(sk, items).collect()
    }
    exact = {"a": 5, "b": 3, "c": 1}
    for t, n in exact.items():
        assert est[t] >= n  # structural: min-of-cells >= true count
    # 3 tokens in a 4x256 grid: no collisions, estimates are exact
    assert est == exact


def test_countmin_grid_is_bounded_and_cells_conserve_mass(spark):
    occ = _occ(spark, [f"t{i}" for i in range(300)] * 2)
    sk = sketches.countmin_sketch(occ).collect()
    assert len(sk) <= sketches.CM_DEPTH * sketches.CM_WIDTH
    # every occurrence lands in exactly one cell per depth
    per_depth = {}
    for r in sk:
        per_depth[r["depth"]] = per_depth.get(r["depth"], 0) + r["cnt"]
    assert per_depth == {j: 600 for j in range(sketches.CM_DEPTH)}


def test_countmin_partial_sketches_merge_by_addition(spark):
    """The merge contract: sketch(A union B) == cell-wise sum of
    sketch(A) and sketch(B) — what makes the groupBy map-side
    combinable and partial grids from different corpora unionable."""
    a = _occ(spark, ["x"] * 4 + ["y"])
    b = _occ(spark, ["y"] * 2 + ["z"])
    merged = {
        (r["depth"], r["cell"]): r["cnt"]
        for r in sketches.countmin_sketch(a.union(b)).collect()
    }
    summed: dict[tuple[int, int], int] = {}
    for part in (a, b):
        for r in sketches.countmin_sketch(part).collect():
            k = (r["depth"], r["cell"])
            summed[k] = summed.get(k, 0) + r["cnt"]
    assert merged == summed


def test_countmin_forced_collision_overestimates(spark):
    """With width=1 every token shares every cell, so each estimate
    must equal the TOTAL occurrence count — the collision mass the
    overestimate column measures, made total."""
    occ = _occ(spark, ["a"] * 7 + ["b"] * 2)
    sk = sketches.countmin_sketch(occ, width=1)
    est = {
        r["token"]: r["est_n"]
        for r in sketches.countmin_estimate(sk, occ.distinct(), width=1).collect()
    }
    assert est == {"a": 9, "b": 9}


def test_countmin_estimate_carries_extra_columns(spark):
    occ = _occ(spark, ["a", "a", "b"])
    sk = sketches.countmin_sketch(occ)
    items = spark.createDataFrame(
        [("a", 2), ("b", 1)], "token string, exact_n long"
    )
    rows = {
        (r["token"], r["exact_n"]): r["est_n"]
        for r in sketches.countmin_estimate(sk, items).collect()
    }
    assert rows == {("a", 2): 2, ("b", 1): 1}


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Two clusters of forced near-duplicates + singletons. Shingle-
    identical texts minhash identically, so each group is one LSH
    cluster regardless of banding."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    other = "one two three four five six seven eight"
    rows = [
        (1, base),
        (2, base),
        (3, base),
        (10, other),
        (11, other),
        (20, "lonely single document with plenty of words here"),
        (21, "another quite different text that stands alone fine"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_leakage_invariant_no_cluster_spans_splits(spark, near_dup_docs):
    """The structural guarantee the query exists for: after cluster-
    aware assignment, every cluster's docs share one split — near-dups
    can never straddle train/test."""
    from bigquery_cross_environment_etl_pipeline_spark.operators import (
        dedup,
        text,
    )
    from bigquery_cross_environment_etl_pipeline_spark.operators.components import (
        dedup_clusters,
    )

    sigs = dedup.minhash_signatures(near_dup_docs)
    pairs = dedup.lsh_candidate_pairs(sigs).filter(
        F.col("est_similarity") >= 0.5
    )
    clusters = dedup_clusters(pairs, near_dup_docs.select("doc_id"), "doc_id")
    # sanity: the forced dup groups actually clustered
    by_doc = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert by_doc[1] == by_doc[2] == by_doc[3]
    assert by_doc[10] == by_doc[11]
    assert by_doc[20] != by_doc[21]

    bucket = (
        text.hash48(
            F.concat(F.lit("split-"), F.col("cluster_id").cast("string"))
        )
        % 10000
    )
    split = (
        F.when(bucket < 9000, "train")
        .when(bucket < 9500, "val")
        .otherwise("test")
    )
    spans = (
        clusters.select("cluster_id", split.alias("split"))
        .groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0


def test_band_sweep_candidate_sets_are_nested(spark, near_dup_docs):
    """More bands (fewer rows per band) is strictly more permissive:
    the (2,4) candidates are a subset of (4,2), which is a subset of
    (8,1) — the property that lets the sweep enumerate once at r=1."""
    from bigquery_cross_environment_etl_pipeline_spark.operators import dedup

    sigs = dedup.minhash_signatures(near_dup_docs)
    sets = {}
    for nb in (2, 4, 8):
        sets[nb] = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.lsh_candidate_pairs(sigs, n_bands=nb).collect()
        }
    assert sets[2] <= sets[4] <= sets[8]
    assert sets[8]  # the forced dups band-match somewhere


def test_countmin_out_of_vocabulary_probe_estimates_zero(spark):
    """ADVICE r8: an item absent from the corpus hashes into cells
    that may not exist as sketch rows — the estimate must be the
    Count-Min answer for an unseen item (its true count 0 plus the
    collision mass of its cells, which is 0 when all four cells are
    empty), never an inflated positive read from only the surviving
    cells, and the probe row must never vanish."""
    from bigquery_cross_environment_etl_pipeline_spark.operators import sketches

    occ = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 2, "token string"
    )
    grid = sketches.countmin_sketch(occ).cache()
    probes = spark.createDataFrame(
        [("alpha",), ("definitely-not-in-corpus-xyzzy",)], "token string"
    )
    est = {
        r["token"]: r["est_n"]
        for r in sketches.countmin_estimate(grid, probes).collect()
    }
    assert est["alpha"] >= 5  # overestimate-only invariant
    assert est["definitely-not-in-corpus-xyzzy"] == 0
