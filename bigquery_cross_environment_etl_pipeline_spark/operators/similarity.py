"""Similarity search over embedding columns (north-star).

Two paths:
- **Brute-force cosine top-k** — the exact baseline. The dot product is
  an unrolled sum of per-dimension products (generated expression, pure
  codegen — no UDF, no Python). Top-k is ``orderBy().limit(k)`` which
  Spark plans as TakeOrderedAndProject: per-partition heaps + driver
  merge, O(n) not O(n log n), no full sort shuffle even at 10^9 vectors.
- **LSH-bucketed ANN** (random hyperplanes) — the scale path: vectors
  hash to sign-pattern buckets; only same-bucket pairs are scored. The
  hyperplanes are derived deterministically from hash48, so results are
  reproducible run-to-run (required for the test oracle and for
  re-running a 100 TB job idempotently).
- **Banded-LSH near-dup pairs** (``cosine_neardup_pairs_lsh``) — the
  all-pairs analog of MinHash LSH banding: n_bands independent
  sign-pattern keys per vector, same-band-key self-join for candidates,
  exact cosine verify. Bucket count is a tunable parameter (grows with
  corpus size), unlike attribute blocking whose fixed cardinality turns
  quadratic. The hot loops (band keys, pair dots) run as Arrow-batched
  numpy folds that reproduce the Catalyst/DuckDB left-fold chain
  bitwise (tests/test_llm_ops.py asserts equality).

The unrolled-sum form is chosen over ``F.aggregate``/``zip_with`` folds
because a fixed left-associated chain produces bitwise-identical doubles
in any engine that evaluates IEEE ops in order — that is what lets the
DuckDB oracle hash-match the Spark result exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .iterative import iter_checkpoint

DIM = 64

#: Bump on ANY semantic change to index construction (assignment
#: tie-break, centroid math, seeding): persisted-index cache keys carry
#: this alongside the dataset fingerprint, so an index built by older
#: code is never served to oracles/probes that assume the new
#: semantics. v2 = round-4 struct-max assignment + fixed-point Lloyd
#: means (v1 was max_by + float avg); v3 = empty-cell fallback fix in
#: kmeans_refine (null-mean check instead of the never-firing array
#: coalesce); v4 = the shared vector-eligibility contract (NULL /
#: non-finite / zero-norm vectors excluded before index build).
IVF_BUILD_VERSION = 4


def embedding_eligible(vec_col: str = "embedding") -> Column:
    """The ONE vector-eligibility predicate every cosine/centroid/PQ
    consumer shares: the vector is non-NULL, every element is non-NULL
    and finite, and at least one element is nonzero (norm > 0, given
    all-finite). A vector failing any of these has no defined cosine to
    anything — a zero norm divides by zero, a NaN/inf element poisons
    every dot product it enters, and the two engines disagree on what
    the poison evaluates to (Spark ANSI raises, DuckDB yields inf/NaN
    it then refuses to cast). Excluding them identically on BOTH
    engines (``eligible_emb_pred`` is the SQL mirror) is the only
    hash-stable semantics. Pure column expressions — the filter runs
    inside the scan stage at IO speed."""
    v = F.col(vec_col)
    bad = F.exists(
        v, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    return v.isNotNull() & ~bad & F.exists(v, lambda x: x != F.lit(0.0))


def eligible_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """``df`` restricted to vectors eligible for similarity math — see
    ``embedding_eligible``. Apply at the embeddings load of every
    vector-math query (and before every index build), never halfway
    through a pipeline, so candidates/verify/serve stages all see the
    same corpus."""
    return df.filter(embedding_eligible(vec_col))


def eligible_emb_pred(col: str = "embedding") -> str:
    """DuckDB mirror of ``embedding_eligible`` for oracle SQL, over the
    (possibly qualified) list column ``col``. list_filter drops
    non-TRUE lambda results, so the NULL-element arm is explicit."""
    return (
        f"({col} IS NOT NULL"
        f" AND len(list_filter({col}, x -> x IS NULL OR NOT isfinite(x))) = 0"
        f" AND len(list_filter({col}, x -> x <> 0)) > 0)"
    )


def dot_expr(a: str | Column, b: str | Column, dim: int = DIM) -> Column:
    """Dot product of two array<float> columns as a sequential left fold
    (``aggregate(zip_with(a, b, *), 0.0, +)``).

    The fold accumulates strictly left-to-right, so it is bitwise
    identical to an unrolled ``t1 + t2 + ...`` chain (``0.0 + t1 == t1``
    in IEEE) — which is what the DuckDB oracle executes — while staying
    far under janino's 64 KB codegen limit that the unrolled form blows
    through at dim=64.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def cosine_expr(a: str, b: str, dim: int = DIM) -> Column:
    return dot_expr(a, b, dim) / (
        F.sqrt(dot_expr(a, a, dim)) * F.sqrt(dot_expr(b, b, dim))
    )


def norm_expr(vec: str, dim: int = DIM) -> Column:
    return F.sqrt(dot_expr(vec, vec, dim))


JL_OUT = 16  # random-projection output dimensionality (DIM -> JL_OUT)


def jl_signs(dim_out: int = JL_OUT, dim_in: int = DIM) -> list[list[float]]:
    """The ±1 Johnson-Lindenstrauss projection matrix, derived from md5
    parity (Achlioptas 2003's database-friendly sign matrix) — a
    deterministic literal table, identical in every engine, every run.
    No 1/sqrt(dim_out) scaling: cosine is scale-invariant, and leaving
    the rows unscaled keeps each component a pure ±sum of inputs."""
    return [
        [
            1.0
            if int(hashlib.md5(f"jl-{j}-{i}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1.0
            for i in range(dim_in)
        ]
        for j in range(dim_out)
    ]


def jl_project(vec_col: str | Column, dim_out: int = JL_OUT) -> Column:
    """Project an array<float> embedding to ``dim_out`` dims with the
    deterministic sign matrix: component j is the strict left fold of
    (element * sign) products — bitwise identical to the unrolled
    ``t1 + t2 + ...`` chain the DuckDB oracle executes (the dot_expr
    discipline). dim_out folds of DIM terms stay far under the codegen
    limit; the projection is a pure column expression riding the scan."""
    # single-parse SQL form (round 12): the Column version built
    # dim_out x DIM literal sign cells through individual py4j calls
    # (~1,024 round trips at 16x64, ~0.3 s per construction); the SQL
    # text parses once and resolves to the same strict-left-fold
    # expressions (0.0D seed, CAST(x AS DOUBLE) * sign products,
    # acc + v accumulation)
    if isinstance(vec_col, str):
        comps_sql = ", ".join(
            "aggregate(zip_with({c}, array({signs}), (x, s) ->"
            " CAST(x AS DOUBLE) * s), 0.0D, (acc, v) -> acc + v)".format(
                c=vec_col,
                signs=", ".join(
                    "1.0D" if s > 0 else "-1.0D" for s in row
                ),
            )
            for row in jl_signs(dim_out)
        )
        return F.expr(f"array({comps_sql})")
    c = vec_col
    comps = []
    for row in jl_signs(dim_out):
        sarr = F.array(*[F.lit(s) for s in row])
        prods = F.zip_with(c, sarr, lambda x, s: x.cast("double") * s)
        comps.append(F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v))
    return F.array(*comps)


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Exact top-k neighbors of one stored vector by cosine.

    Norms are precomputed per VECTOR (one pass over the corpus), so the
    per-candidate work is one dot product + one multiply — not three dot
    products. `sqrt(dot(v,v))` then multiply is arithmetic-identical to
    the inline form, so oracle parity is preserved bitwise. The 1-row
    query side is broadcast; the corpus scans once.
    """
    with_norm = embeddings.select(
        F.col(id_col), F.col(vec_col), norm_expr(vec_col, dim).alias("_nrm")
    )
    q = with_norm.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), F.col("_nrm").alias("_qnrm")
    )
    joined = with_norm.filter(F.col(id_col) != query_id).crossJoin(F.broadcast(q))
    cos = dot_expr(vec_col, "_qvec", dim) / (F.col("_nrm") * F.col("_qnrm"))
    return (
        joined.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking buckets —
    an exact-verify UTILITY for provably-bounded blocks, not the scale
    path.

    Blocking on a data attribute has fixed cardinality: at 100 TB each
    block holds billions of vectors and within-block all-pairs is
    quadratic (the repo's own scaling probe measured 5.6x wall-time at
    10x data). Use ``cosine_neardup_pairs_lsh`` for candidate
    generation whose bucket count is a tunable parameter instead.
    """
    # Norms once per vector BEFORE the pair join (repartition on the
    # block key doubles as the exchange that materializes them and
    # co-partitions pair generation).
    e = embeddings.select(
        F.col(id_col), F.col(block_col), F.col(vec_col),
        norm_expr(vec_col, dim).alias("_nrm"),
    ).repartition(F.col(block_col))
    a = e.select(
        F.col(id_col).alias("vec_a"),
        F.col(block_col).alias("block"),
        F.col(vec_col).alias("va"),
        F.col("_nrm").alias("na"),
    )
    b = e.select(
        F.col(id_col).alias("vec_b"),
        F.col(block_col).alias("block"),
        F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    cos = dot_expr("va", "vb", dim) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (a.block == b.block) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") > threshold)
    )


# --- IVF ANN (inverted-file index: the other scale path) --------------------


def _assign_to_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """(vec_id, _cid) argmax-cosine assignment: broadcast the centroid
    table, one corpus pass, struct-max aggregation — shuffle volume
    O(n), never O(n^2).

    The argmax is ``max(struct(_sim, -_cid))`` rather than ``max_by``:
    max_by picks an ARBITRARY winner on tied similarities (possible
    when a vector equals a centroid, or on duplicate vectors), while
    the struct max deterministically takes the LOWEST centroid id —
    which is what lets the DuckDB oracle replay the assignment exactly
    (row_number ORDER BY sim DESC, cid ASC)."""
    with_norm = embeddings.withColumn("_nrm", norm_expr(vec_col, dim))
    scored = with_norm.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", dot_expr(vec_col, "_cvec", dim) / (F.col("_nrm") * F.col("_cnrm"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_sim").alias("s"), (-F.col("_cid")).alias("nc")
                )
            ).alias("_m")
        )
        .select(F.col(id_col), (-F.col("_m.nc")).alias("_cid"))
    )


def kmeans_refine(
    embeddings: DataFrame,
    centroids: DataFrame,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Lloyd refinement of IVF centroids, pure DataFrame ops (the
    dataflow shape of k-means||'s final Lloyd phase).

    Each iteration is two stages: (1) assignment — broadcast centroids,
    one corpus pass, struct-max argmax (deterministic lowest-id
    tie-break); (2) update — element-wise mean of each cluster's
    members as ``dim`` independent aggregates, which Spark
    partial-aggregates map-side, so the shuffle carries
    #partitions x #centroids rows regardless of corpus size. A centroid
    that loses all members keeps its previous position (coalesce), so
    the index never silently shrinks.

    The mean is computed in Q.40 FIXED POINT (``floor(x * 2^40)``
    summed as DECIMAL, two exact-operand divisions), NOT ``avg`` over
    doubles: float summation is order-dependent, so an ``avg``-based
    refinement produces a (slightly) different index on every
    partitioning — breaking idempotent 100 TB index rebuilds and any
    cross-run comparison. The floor runs on DECIMAL(38,6) (a BIGINT
    floor would silently clamp any |component| >= 2^23), so components
    are exact up to ~10^19 and cell sums to ~10^26 members; the 2^-40
    quantization (~1e-12) is far below float32 input precision. With
    this, the whole refinement is deterministic given deterministic
    seeds: no RNG, no reassociation.
    """
    scale = float(1 << 40)
    for _ in range(n_iters):
        assigned = _assign_to_centroids(embeddings, centroids, id_col, vec_col, dim)
        members = embeddings.join(assigned, id_col)
        means = members.groupBy("_cid").agg(
            *[
                (
                    (
                        F.sum(
                            F.floor(
                                (F.col(vec_col)[i].cast("double") * scale)
                                .cast("decimal(38,6)")
                            )
                        ).cast("double")
                        / F.count(F.lit(1)).cast("double")
                    )
                    / F.lit(scale)
                ).alias(f"_m{i}")
                for i in range(dim)
            ]
        )
        new_vec = F.array(*[F.col(f"_m{i}") for i in range(dim)])
        # Empty-cell fallback must test a MEAN COLUMN, not the array:
        # F.array(null, null, ...) is itself non-null, so
        # coalesce(new_vec, old) would happily install an all-null
        # centroid when a cell loses every member (caught in round 4 —
        # the coalesce form shipped untested because the demo corpus
        # never empties a cell). _m0 is null exactly when the left
        # join found no member row.
        refreshed = (
            centroids.select("_cid", F.col("_cvec").alias("_old"))
            .join(means, "_cid", "left")
            .select(
                "_cid",
                F.when(F.col("_m0").isNull(), F.col("_old").cast("array<double>"))
                .otherwise(new_vec)
                .alias("_cvec"),
            )
            .withColumn("_cnrm", norm_expr("_cvec", dim))
        )
        # Materialize each iteration: Lloyd is inherently iterative and
        # re-deriving N rounds lazily would replay the whole lineage.
        centroids = iter_checkpoint(refreshed)
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> tuple[DataFrame, DataFrame]:
    """Build a deterministic IVF index: seed centroids = the
    ``n_centroids`` lowest-id vectors (reproducible), optionally refined
    with ``refine_iters`` Lloyd iterations (``kmeans_refine``), then
    every vector is assigned to its max-cosine centroid.

    Returns (assigned, centroids): ``assigned`` adds a ``_cid`` column.
    At 100 TB ``_cid`` becomes the partition column so a query touches
    nprobe partitions.
    """
    centroids = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cvec"),
            norm_expr(vec_col, dim).alias("_cnrm"),
        )
    )
    if refine_iters > 0:
        centroids = kmeans_refine(
            embeddings, centroids, refine_iters, id_col, vec_col, dim
        )
    assigned = _assign_to_centroids(embeddings, centroids, id_col, vec_col, dim)
    return (
        embeddings.join(assigned, id_col),
        centroids,
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """IVF approximate top-k: score only vectors assigned to the
    ``nprobe`` centroids nearest the query — corpus scanned once for
    assignment (amortized across queries when the index is persisted),
    then ~nprobe/n_centroids of the data is distance-scored."""
    assigned, centroids = ivf_assign(
        embeddings, n_centroids, refine_iters, id_col, vec_col, dim
    )
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), norm_expr(vec_col, dim).alias("_qnrm")
    )
    probe_cids = (
        centroids.crossJoin(F.broadcast(q))
        .withColumn(
            "_sim", dot_expr("_cvec", "_qvec", dim) / (F.col("_cnrm") * F.col("_qnrm"))
        )
        .orderBy(F.desc("_sim"), F.asc("_cid"))
        .limit(nprobe)
        .select("_cid")
    )
    cand = assigned.join(F.broadcast(probe_cids), "_cid").filter(
        F.col(id_col) != query_id
    )
    cos = dot_expr(vec_col, "_qvec", dim) / (
        norm_expr(vec_col, dim) * F.col("_qnrm")
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_index_persist(
    spark,
    embeddings: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> None:
    """Materialize the IVF index on disk: assignments partitioned by
    ``_cid`` (so a probe's centroid filter becomes partition pruning at
    the scan — test_scale_ops.py proves the pruning) plus the tiny
    centroid table. Build cost is the one corpus pass that
    ``ivf_assign`` already does; paying it once per dataset instead of
    per query is the difference between an index and a scan."""
    assigned, centroids = ivf_assign(
        embeddings, n_centroids, refine_iters, id_col, vec_col, dim
    )
    assigned.write.mode("overwrite").partitionBy("_cid").parquet(
        index_path + "/assigned"
    )
    centroids.write.mode("overwrite").parquet(index_path + "/centroids")


def _rank_probe_cids(
    cent_rows, query_vec: list[float], qnrm: float, nprobe: int
) -> list[int]:
    """Driver-side centroid ranking shared by EVERY IVF probe path
    (single-query, batch, and IVF-PQ): rank cells by (cosine, -cid)
    descending — highest cosine first, LOWEST cid on ties — and keep
    the top ``nprobe``. The tie-break and the left-to-right float sum
    are load-bearing: the stage-replay oracles replay them verbatim,
    so any change here is a semantic index change (bump
    IVF_BUILD_VERSION and the oracles together). Bounded work:
    n_centroids rows, serving-constant-sized.

    Zero-norm guard: a zero-norm centroid has no defined cosine to any
    query, so it is EXCLUDED from ranking (mirrored as ``cnrm > 0`` in
    the ``probe`` CTE of plans/extended._ivf_single_query_ctes); a
    zero-norm QUERY is rejected loudly — previously both cases raised
    ZeroDivisionError here while DuckDB's division by zero yields NULL
    (ranked last under ORDER BY ... DESC), a one-sided failure. No
    IVF_BUILD_VERSION bump: ranking is unchanged wherever it
    previously completed."""
    if qnrm == 0:
        raise ValueError(
            "zero-norm query vector has no defined cosine ranking"
        )
    scored = sorted(
        (
            (
                sum(float(a) * float(b) for a, b in zip(r["_cvec"], query_vec))
                / (r["_cnrm"] * qnrm),
                -r["_cid"],
            )
            for r in cent_rows
            if r["_cnrm"] > 0
        ),
        reverse=True,
    )
    return [int(-c) for _, c in scored[:nprobe]]


def ann_topk_ivf_probe(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Probe-only IVF top-k against a persisted index: rank centroids
    driver-side (bounded: <= n_centroids rows), then scan ONLY the
    ``nprobe`` matching ``_cid=`` partitions with a literal IN-filter —
    static partition pruning, no corpus pass, no index rebuild. This is
    the steady-state per-query cost an ANN serving path actually pays.
    """
    import math

    qnrm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cents = spark.read.parquet(index_path + "/centroids").collect()
    probe_cids = _rank_probe_cids(cents, query_vec, qnrm, nprobe)

    index = spark.read.parquet(index_path + "/assigned").filter(
        F.col("_cid").isin(probe_cids)
    )
    if exclude_id is not None:
        index = index.filter(F.col(id_col) != exclude_id)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = dot_expr(F.col(vec_col), qcol, dim) / (
        norm_expr(vec_col, dim) * F.lit(qnrm)
    )
    return (
        index.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_index_append(
    spark,
    new_embeddings: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> None:
    """Incremental index maintenance: assign ONLY the new vectors
    against the EXISTING centroids and append them to the partitioned
    assignment store — no full-corpus rebuild. Cost is one pass over
    the delta (broadcast centroids, max_by argmax), so nightly ingest
    adds O(delta) work regardless of index size. Centroids drift as the
    distribution shifts; rebuild (``ivf_index_persist``) on a cadence,
    exactly like any IVF serving system.

    Any PQ-codes sidecar (``ivfpq_codes_persist``) is INVALIDATED by
    the append — its ``_SUCCESS`` marker is removed BEFORE the append
    writes — because the sidecar encodes only the vectors present at
    its build time; a stale sidecar would silently exclude every
    appended vector from IVF-PQ probes. Invalidate-first ordering
    (round-5 review finding): a crash after the append but before the
    invalidation would leave a valid-looking stale sidecar, while a
    crash after invalidating but before appending merely forces one
    redundant rebuild. The next ``ann_topk_ivfpq`` serve re-encodes
    (mode("overwrite"), so the stale files are replaced atomically at
    the Spark-commit level).

    The index's OWN staleness marker (``centroids/_SUCCESS`` — the
    existence check plans/extended._ivf_index uses) follows the same
    invalidate-first discipline (round-6, mirroring the
    ``bm25_index_append`` fix): it is removed before the append and
    restored only after the append commits, so a crash mid-append
    leaves the index marked stale — the next reader rebuilds instead
    of serving a partially-ingested delta (whose re-ingest would
    violate the NEW-ids contract and double the replayed vectors).
    An append likewise REFUSES a stale/torn index (marker already
    absent): appending on top of a torn assignment store would
    restore the marker without restoring the lost vectors — rebuild
    with ``ivf_index_persist`` first."""
    import glob as _glob
    import os as _os

    stale_marker = f"{index_path}/centroids/_SUCCESS"
    if not _os.path.exists(stale_marker):
        raise ValueError(
            f"IVF index at {index_path} is stale or torn "
            "(centroids/_SUCCESS missing) — rebuild with "
            "ivf_index_persist before appending"
        )
    for marker in _glob.glob(f"{index_path}/pq_v*/_SUCCESS"):
        _os.remove(marker)
    _os.remove(stale_marker)
    centroids = spark.read.parquet(index_path + "/centroids")
    assigned = _assign_to_centroids(new_embeddings, centroids, id_col, vec_col, dim)
    (
        new_embeddings.join(assigned, id_col)
        .write.mode("append")
        .partitionBy("_cid")
        .parquet(index_path + "/assigned")
    )
    with open(stale_marker, "wb"):
        pass


def ann_batch_topk_ivf_probe(
    spark,
    index_path: str,
    query_vecs: dict[int, list[float]],
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Batched probe against a persisted IVF index: one pruned scan
    serves the whole query set.

    Centroid ranking happens driver-side per query (bounded:
    |queries| x n_centroids, both serving-batch-sized constants), the
    scan reads only the UNION of all probed ``_cid=`` partitions via a
    literal IN-filter, and the (qid, _cid) probe table joined broadcast
    restricts each query to its own cells before scoring. Per-query
    top-k is a row_number window on qid — the shuffle carries only the
    scored candidates of probed cells, not the corpus.
    """
    import math

    cents = spark.read.parquet(index_path + "/centroids").collect()
    probe_pairs: list[tuple[int, int]] = []
    qrows = []
    for qid, vec in query_vecs.items():
        v = [float(x) for x in vec]
        qnrm = math.sqrt(sum(x * x for x in v))
        probe_pairs += [
            (qid, cid) for cid in _rank_probe_cids(cents, v, qnrm, nprobe)
        ]
        qrows.append((qid, v, qnrm))

    all_cids = sorted({cid for _, cid in probe_pairs})
    index = spark.read.parquet(index_path + "/assigned").filter(
        F.col("_cid").isin(all_cids)
    )
    from ..localrel import local_df

    pairs_df = local_df(spark, probe_pairs, "qid long, _cid long")
    qdf = local_df(spark, qrows, "qid long, _qvec array<double>, _qnrm double")
    cand = index.join(F.broadcast(pairs_df), "_cid").join(F.broadcast(qdf), "qid")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col("qid"))
    cos = dot_expr(vec_col, "_qvec", dim) / (
        norm_expr(vec_col, dim) * F.col("_qnrm")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.select("qid", F.col(id_col), cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


# --- LSH-bucketed ANN (scale path) -----------------------------------------


def _hyperplane(seed: int, j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: components in [-1, 1)
    derived from md5 — reproducible across runs/engines/languages."""
    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"hp-{seed}-{j}-{i}".encode()).hexdigest()[:12], 16)
        out.append(h / float(2**47) - 1.0)
    return out


def lsh_bucket_expr(
    vec_col: str,
    n_planes: int = 8,
    dim: int = DIM,
    seed: int = 42,
    plane_offset: int = 0,
) -> Column:
    """Sign-pattern bucket id: bit j = (vec . hyperplane_{offset+j}) >= 0.

    ``plane_offset`` selects a disjoint run of hyperplanes from the same
    deterministic family, so banded callers get independent hash
    functions per band without a second seed dimension.
    """
    # single-parse SQL form (round 12): the Column version shipped
    # n_planes x dim hyperplane literals through individual py4j calls
    # (512 round trips at 8x64). repr(float) is the shortest
    # round-trip form, and SQL double literals parse to the identical
    # IEEE value, so the folds are bitwise-unchanged.
    def _plane_sql(j: int) -> str:
        comps = ", ".join(
            repr(p) + "D" for p in _hyperplane(seed, plane_offset + j, dim)
        )
        return (
            f"aggregate(zip_with({vec_col}, array({comps}), (x, y) ->"
            " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D,"
            " (acc, v) -> acc + v)"
        )

    bucket = F.expr(
        " + ".join(
            f"(CASE WHEN ({_plane_sql(j)}) >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
    )
    return bucket.cast("int")


def _fold_dot_udf(dim: int = DIM):
    """Arrow-batched pair dot product with EXACT left-fold semantics.

    ``acc = acc + A[:, i] * B[:, i]`` iterated over i evaluates, per
    row, the identical left-associated IEEE-double chain
    ``((0 + t1) + t2) + ...`` that ``dot_expr``'s Catalyst fold and the
    DuckDB oracle's unrolled sum execute — numpy vectorizes ACROSS rows,
    never across the fold, so no reassociation happens and the result
    is bitwise-equal (asserted in tests/test_llm_ops.py). ~50x faster
    than the interpreted Catalyst fold, which is the hot loop of the
    banded verify stage.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def fold_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(A.shape[0], dtype=np.float64)
        for i in range(dim):
            acc = acc + A[:, i] * B[:, i]
        return pd.Series(acc)

    return fold_dot


def _band_keys_udf(n_bands: int, n_planes: int, dim: int, seed: int):
    """Arrow-batched sign-pattern band keys (array<int>, one per band).

    Plane dots accumulate with the same left-fold trick as
    ``_fold_dot_udf`` (outer-product accumulation over the dim axis:
    ``acc[:, k] += V[:, i] * P[k, i]`` sequentially in i), so every
    sign — and therefore every bucket id — matches
    ``lsh_bucket_expr``'s Catalyst fold and the SQL oracle bitwise
    (equality asserted in tests/test_llm_ops.py).
    """
    from pyspark.sql.functions import pandas_udf

    P = np.array(
        [_hyperplane(seed, j, dim) for j in range(n_bands * n_planes)],
        dtype=np.float64,
    )  # (n_bands * n_planes, dim)
    weights = np.array([1 << j for j in range(n_planes)], dtype=np.int64)

    @pandas_udf("array<int>")
    def band_keys(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        acc = np.zeros((V.shape[0], P.shape[0]), dtype=np.float64)
        for i in range(dim):
            acc = acc + V[:, i : i + 1] * P[None, :, i]
        bits = (acc >= 0).reshape(V.shape[0], n_bands, n_planes)
        keys = (bits * weights[None, None, :]).sum(axis=2).astype(np.int32)
        return pd.Series(list(keys))

    return band_keys


#: banded near-dup defaults: 8 bands x 8 planes = 64 hyperplanes total.
#: Candidate fraction ~ n_bands * 2^-n_planes of all pairs (measured
#: 3.6% on the driver corpus vs ~10% for label blocking); recall per
#: band for a pair at angle theta is (1 - theta/pi)^n_planes, so true
#: near-dups (cos >= 0.9) collide with >99% probability across 8 bands
#: while orthogonal pairs almost never do. Unlike blocking on a data
#: attribute, bucket count (2^n_planes x n_bands) is a PARAMETER —
#: scale it with corpus size to keep per-bucket membership bounded.
N_EMB_BANDS = 8
N_EMB_PLANES = 8


def embedding_lsh_candidates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_EMB_BANDS,
    n_planes: int = N_EMB_PLANES,
    dim: int = DIM,
    seed: int = 42,
) -> DataFrame:
    """Banded hyperplane-LSH candidate pairs (vec_a, vec_b), distinct.

    The embedding analog of MinHash LSH banding
    (``dedup.lsh_candidate_pairs``): each vector gets ``n_bands``
    sign-pattern keys over disjoint hyperplane runs; vectors sharing any
    band key become a candidate pair via a self-equi-join on
    (band_idx, band_key). Shuffle volume is O(vectors x n_bands x 8 B)
    — the raw vectors never move in the candidate stage, and there is
    no all-pairs product anywhere.
    """
    # All n_bands * n_planes plane-dots per vector happen in ONE
    # Arrow-batched numpy pass (see _band_keys_udf) with the exact
    # left-fold arithmetic of the SQL oracle — ~50x faster than the
    # interpreted Catalyst fold, light enough that no explicit
    # repartition/materialization is worth its job overhead: the plan
    # stays fully declarative (input partitioning governs parallelism
    # at scale; the self-join's identical key subtrees shuffle-reuse).
    keys = _band_keys_udf(n_bands, n_planes, dim, seed)
    exploded = embeddings.select(
        F.col(id_col), keys(F.col(vec_col)).alias("_bks")
    ).select(
        F.col(id_col),
        F.posexplode("_bks").alias("band_idx", "band_key"),
    )
    a = exploded.select(
        F.col(id_col).alias("vec_a"), "band_idx", "band_key"
    )
    b = exploded.select(
        F.col(id_col).alias("vec_b"), "band_idx", "band_key"
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


def cosine_neardup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_EMB_BANDS,
    n_planes: int = N_EMB_PLANES,
    dim: int = DIM,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs: banded-LSH candidate generation + exact
    cosine VERIFY — the scale-safe replacement for fixed-cardinality
    label blocking (``cosine_neardup_pairs``).

    Two stages, mirroring ``dedup.verified_jaccard_pairs``:
    (1) ``embedding_lsh_candidates`` emits only same-band-key pairs —
    candidate volume tracks true similarity structure and the tunable
    bucket count, not block sizes; (2) each candidate is scored with one
    exact dot product (norms precomputed per vector, not per pair) and
    filtered on ``threshold``.

    Recall tradeoff (documented, by design): a pair at angle theta
    survives some band with p = 1 - (1 - (1-theta/pi)^n_planes)^n_bands.
    For true near-duplicates (cos >= 0.9) that is >99%; at the loose
    demo threshold 0.3 (theta ~ 72 deg) it is ~15% — LSH is a
    near-duplicate detector, not a general similarity join. The oracle
    replays the identical candidate generation, so the result set is
    exactly reproducible.
    """
    cands = embedding_lsh_candidates(
        embeddings, id_col, vec_col, n_bands, n_planes, dim, seed
    )
    fold_dot = _fold_dot_udf(dim)
    # Norms computed once per VECTOR (one numpy pass), never per pair;
    # sqrt is correctly-rounded in IEEE 754, so numpy/JVM/DuckDB agree
    # bitwise on the norm too. The verify stage joins this table for
    # both pair sides — identical subtrees, so the exchange is reused
    # rather than recomputed.
    e = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(fold_dot(F.col(vec_col), F.col(vec_col))).alias("_nrm"),
    )
    a = e.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = e.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    cos = fold_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        cands.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") > threshold)
    )


def knn_graph_lsh(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int = N_EMB_BANDS,
    n_planes: int = N_EMB_PLANES,
    dim: int = DIM,
    seed: int = 42,
) -> DataFrame:
    """Approximate kNN GRAPH: top-``k`` cosine neighbors for EVERY
    vector, candidates restricted to banded-LSH collisions — the
    all-vectors generalization of the single-query probe, and the
    input structure semantic clustering / diversity curation builds on
    at corpus scale.

    Dataflow: one banded candidate stage (same O(vectors × n_bands)
    shuffle as ``cosine_neardup_pairs_lsh`` — no all-pairs product),
    symmetrized to directed edges, one exact Arrow-batched dot per
    candidate edge (norms once per vector), then a per-source
    ``row_number`` window that keeps k edges. The window partitions on
    the source id, so the shuffle carries only candidate edges —
    bounded by band collisions, not |V|². Vectors with zero collisions
    have no edges (isolated nodes), mirrored by the oracle.
    Deterministic end to end (md5 hyperplanes, fold-chain floats,
    cosine-then-id tie-break) -> exactly verifiable.

    Zero-norm vectors are excluded from BOTH edge endpoints at the
    scoring joins: dot/(na*nb) with a zero norm is NaN, and Spark
    ranks NaN above every double in the row_number ordering, so a
    single zero vector would otherwise surface as every collision
    partner's top neighbor. The exclusion filters the norm relation
    the verify joins already compute (``_nrm > 0`` — no extra pass),
    exactly the oracle's join-time guard in ``_knn_graph_oracle``.
    """
    from pyspark.sql import Window as W

    cands = embedding_lsh_candidates(
        embeddings, id_col, vec_col, n_bands, n_planes, dim, seed
    )
    sym = cands.union(
        cands.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
    )
    fold_dot = _fold_dot_udf(dim)
    e = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(fold_dot(F.col(vec_col), F.col(vec_col))).alias("_nrm"),
    ).filter(F.col("_nrm") > 0)
    a = e.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = e.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    cos = fold_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    scored = (
        sym.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            F.col("vec_a").alias("src"),
            F.col("vec_b").alias("dst"),
            cos.alias("cosine"),
        )
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ann_topk_lsh(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    With n_planes sign bits the corpus shrinks ~2^n_planes-fold before
    any distance math; recall is tunable by n_planes (fewer planes =
    bigger bucket = higher recall). At 100 TB the bucket id would be a
    partition column so a query touches one partition.
    """
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_expr(vec_col, n_planes, dim))
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), F.col("_bucket").alias("_qbucket")
    )
    cand = bucketed.crossJoin(F.broadcast(q)).filter(
        (F.col("_bucket") == F.col("_qbucket")) & (F.col(id_col) != query_id)
    )
    cos = cosine_expr(vec_col, "_qvec", dim)
    return (
        cand.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --- product quantization (PQ) ---------------------------------------------

PQ_M = 8  #: subspaces (DIM/PQ_M dims each)
PQ_K = 16  #: centroids per subspace


def pq_encode(
    embeddings: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    dim: int = DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encoder: the vector split into ``PQ_M``
    subspaces, each mapped to the id of its nearest sub-centroid —
    64 floats (256 B) become 8 nibble-sized codes, the 32× compression
    IVF-PQ serving layers run at billion-vector scale.

    ``centroid_rows`` is the (tiny) codebook: (cid, full-dim vector)
    pairs whose per-subspace slices are the sub-centroids — sampled
    data points here (deterministic k-means init; a Lloyd-refined
    codebook drops in unchanged).

    Hot path: an Arrow-batched numpy encoder with EXACT left-fold
    semantics — ``acc = acc + t*t`` iterates the dim axis sequentially,
    so per row it evaluates the identical left-associated IEEE chain as
    ``pq_encode_expr``'s Catalyst folds and the SQL oracle, and
    ``np.argmin``'s first-minimum matches the ascending-id tie-break
    (bitwise equality asserted in tests/test_llm_ops.py; the same
    discipline as ``_fold_dot_udf``). Zero shuffles; the codebook ships
    in the UDF closure.
    """
    from pyspark.sql.functions import pandas_udf

    sub_d = dim // PQ_M
    ordered = sorted(centroid_rows)
    book = np.array([v for _, v in ordered], dtype=np.float64)  # (K, dim)
    # argmin yields POSITIONS in the sorted codebook; codes must carry
    # the actual centroid IDS (ascending id order makes first-minimum =
    # smallest id, matching pq_encode_expr's CASE tie-break even for
    # non-contiguous or re-keyed codebooks)
    cids = np.array([cid for cid, _ in ordered], dtype=np.int64)

    @pandas_udf("string")
    def codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        V = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        n = V.shape[0]
        out = np.empty((n, PQ_M), dtype=np.int64)
        for s in range(PQ_M):
            acc = np.zeros((n, book.shape[0]), dtype=np.float64)
            for i in range(s * sub_d, (s + 1) * sub_d):
                t = V[:, i : i + 1] - book[None, :, i]
                acc = acc + t * t
            out[:, s] = cids[np.argmin(acc, axis=1)]
        return pd.Series([",".join(map(str, row)) for row in out])

    return embeddings.select(id_col, codes(F.col(vec_col)).alias("pq_code"))


def pq_encode_expr(
    embeddings: DataFrame,
    centroid_rows: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    dim: int = DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Pure-column-expression PQ encoder — the oracle-shaped reference
    implementation the numpy hot path is equality-tested against: per
    subspace a zip_with/aggregate fold per centroid distance, ``least``
    for the minimum, first-match-wins CASE for the ascending-id
    tie-break."""
    sub_d = dim // PQ_M
    code_cols = []
    for s in range(PQ_M):
        sub_e = F.slice(F.col(vec_col), s * sub_d + 1, sub_d)
        dists = []
        for cid, vec in sorted(centroid_rows):
            sub_c = F.array(
                *[F.lit(float(v)) for v in vec[s * sub_d : (s + 1) * sub_d]]
            )
            diffs = F.zip_with(
                sub_e,
                sub_c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            )
            dists.append(
                (cid, F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))
            )
        m = F.least(*[d for _, d in dists])
        code = F.lit(None).cast("int")
        for cid, d in reversed(dists):
            code = F.when(d == m, cid).otherwise(code)
        code_cols.append(code.cast("string"))
    return embeddings.select(
        id_col, F.concat_ws(",", *code_cols).alias("pq_code")
    )


#: Version tag of the persisted PQ-codes sidecar layout/semantics —
#: part of its on-disk directory name so a semantic change to encoding
#: invalidates old sidecars (same discipline as IVF_BUILD_VERSION).
PQ_STORE_VERSION = 1


def ivfpq_codes_persist(
    spark,
    index_path: str,
    centroid_rows: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM,
) -> str:
    """Materialize the PQ-codes SIDECAR of a persisted IVF index: every
    assigned vector's 8-id code, partitioned by ``_cid`` exactly like
    the raw assignments — so an IVF-PQ probe scans only the pruned
    cells AND only the 8-byte codes instead of 256-byte vectors (the
    32x IO reduction composed with the nprobe/n_centroids pruning).
    Build cost is one encoding pass over the already-persisted index;
    returns the sidecar path (``<index>/pq_v{PQ_STORE_VERSION}``).
    """
    pq_path = f"{index_path}/pq_v{PQ_STORE_VERSION}"
    assigned = spark.read.parquet(index_path + "/assigned")
    codes = pq_encode(assigned, centroid_rows, vec_col, dim, id_col)
    (
        assigned.select(id_col, "_cid")
        .join(codes, id_col)
        .write.mode("overwrite")
        .partitionBy("_cid")
        .parquet(pq_path)
    )
    return pq_path


def ann_topk_ivfpq_probe(
    spark,
    index_path: str,
    query_vec: list[float],
    centroid_rows: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    dim: int = DIM,
) -> DataFrame:
    """IVF-PQ ADC serving — the canonical billion-vector stack (FAISS
    IVFPQ): rank IVF centroids driver-side (bounded: <= n_centroids
    rows), scan ONLY the PQ-codes sidecar of the ``nprobe`` pruned
    ``_cid=`` partitions (static partition pruning + 32x narrower IO
    than raw vectors), and score each candidate as M integer lookups
    into the query's (M x K) ADC table — no float math against raw
    vectors anywhere in the serving path. Requires the sidecar from
    ``ivfpq_codes_persist``. Codebook centroid ids must be the
    contiguous 0..K-1 range (they are: the codebook is the PQ_K
    lowest-id data vectors), matching the LUT's positional indexing.
    """
    import math

    sub_d = dim // PQ_M
    qnrm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cents = spark.read.parquet(index_path + "/centroids").collect()
    probe_cids = _rank_probe_cids(cents, query_vec, qnrm, nprobe)

    # (M x K) ADC table: left-fold subspace squared-L2, driver-side —
    # the identical IEEE chain as pq_encode / the SQL oracle
    table = []
    for s in range(PQ_M):
        row = []
        for _, vec in sorted(centroid_rows):
            acc = 0.0
            for i in range(s * sub_d, (s + 1) * sub_d):
                t = float(query_vec[i]) - float(vec[i])
                acc = acc + t * t
            row.append(acc)
        table.append(row)

    pq_path = f"{index_path}/pq_v{PQ_STORE_VERSION}"
    codes = spark.read.parquet(pq_path).filter(F.col("_cid").isin(probe_cids))
    if exclude_id is not None:
        codes = codes.filter(F.col(id_col) != exclude_id)
    codes_arr = codes.select(
        id_col,
        F.transform(F.split("pq_code", ","), lambda x: x.cast("int")).alias(
            "_codes"
        ),
    )
    dist = F.lit(0.0)
    for s in range(PQ_M):
        lut = F.array(*[F.lit(v) for v in table[s]])
        dist = dist + F.element_at(lut, F.element_at("_codes", s + 1) + 1)
    return (
        codes_arr.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )
