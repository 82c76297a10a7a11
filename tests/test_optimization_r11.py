"""Round-11 optimization internals: LocalRelation constant tables,
the worker-side zipimport invalidation fix, the daemon preload module,
and the JPEG all-zero-AC entropy fast paths (bit-identical streams)."""

from __future__ import annotations

import hashlib
import os
import zipfile

import numpy as np
import pytest

from bigquery_cross_environment_etl_pipeline_spark import workerenv
from bigquery_cross_environment_etl_pipeline_spark.localrel import local_df
from bigquery_cross_environment_etl_pipeline_spark.operators import jpeg


# --- localrel.local_df -------------------------------------------------------


def test_local_df_matches_stock_path_with_nulls_and_arrays(spark):
    rows = [
        (1, None, "a", [1.0, 2.0], True),
        (None, 2.5, None, None, None),
        (3, 0.0, "", [], False),
    ]
    schema = (
        "k bigint, x double, s string, v array<double>, f boolean"
    )
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.schema == want.schema
    assert sorted(map(repr, got.collect())) == sorted(map(repr, want.collect()))
    # the point of the helper: a JVM-local relation, not a Python-RDD scan
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan, plan


def test_local_df_timestamp_schema_falls_back(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 2, 3, 4, 5))]
    schema = "k bigint, ts timestamp"
    got = local_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert [r["ts"] for r in got.collect()] == [r["ts"] for r in want.collect()]


def test_local_df_empty(spark):
    got = local_df(spark, [], "k bigint, s string")
    assert got.count() == 0
    assert got.columns == ["k", "s"]


# --- workerenv zipimport patch ----------------------------------------------


def _make_zip(path: str, names: list[str]) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for n in names:
            z.writestr(f"{n}.py", f"VALUE = {n!r}\n")


def test_zip_invalidation_skips_unchanged_and_sees_changes(tmp_path):
    import zipimport

    workerenv.ensure_fast_zip_invalidation()
    workerenv.ensure_fast_zip_invalidation()  # idempotent

    p = str(tmp_path / "mods.zip")
    _make_zip(p, ["m_one"])
    imp = zipimport.zipimporter(p)
    assert imp.find_spec("m_one") is not None

    reads = []
    orig_read = zipimport._read_directory

    def counting_read(archive):
        reads.append(archive)
        return orig_read(archive)

    zipimport._read_directory = counting_read
    try:
        imp.invalidate_caches()
        first = len(reads)
        imp.invalidate_caches()
        imp.invalidate_caches()
        # unchanged archive: no further directory re-reads
        assert len(reads) == first
        # a CHANGED archive must still invalidate (mtime bumps)
        _make_zip(p, ["m_one", "m_two"])
        os.utime(p, (os.path.getmtime(p) + 5,) * 2)
        imp.invalidate_caches()
        assert len(reads) > first
        assert imp.find_spec("m_two") is not None
    finally:
        zipimport._read_directory = orig_read


def test_daemon_prefork_module_preloads():
    from bigquery_cross_environment_etl_pipeline_spark import daemonprefork

    daemonprefork._preload()  # must never raise, even if optionals vanish


# --- JPEG all-zero-AC fast paths ----------------------------------------------
# The fast paths must be BIT-IDENTICAL to the general run-length walk.
# Golden digests pinned from the pre-optimization implementation (verified
# equal on random AND constant content before the fast paths landed).

GOLDEN_CONST = "3d2d5c19e91c3fa2e0afbb7d1875371d"


def _const_streams() -> bytes:
    out = bytearray()
    for i in range(12):
        w, h = 9 + i % 18, 8 + i % 13
        val = (37 * i) % 256
        gray = np.full((h, w), val, dtype=np.uint8)
        out += jpeg.encode_jpeg(gray, restart_interval=i % 3)
        out += jpeg.encode_jpeg_progressive(gray, restart_interval=i % 3)
        rgb = np.full((h, w, 3), val, dtype=np.uint8)
        out += jpeg.encode_jpeg(rgb, subsampling="4:2:0" if i % 2 else "4:4:4")
        out += jpeg.encode_jpeg_progressive(rgb)
    return bytes(out)


def test_constant_block_streams_match_golden_and_roundtrip():
    data = _const_streams()
    assert hashlib.md5(data).hexdigest() == GOLDEN_CONST
    # spot roundtrip: the decoder agrees with the constant pixels
    img = np.full((10, 11), 200, dtype=np.uint8)
    assert np.array_equal(jpeg.decode_jpeg(jpeg.encode_jpeg(img)), img)


def test_mixed_zero_and_nonzero_ac_blocks_coefficient_exact():
    # one stream holding BOTH all-zero-AC blocks (fast path) and dense
    # AC blocks (run-length walk): the entropy layer must reproduce the
    # chosen coefficients exactly through sequential AND progressive
    rng = np.random.RandomState(11)
    blocks = np.zeros((2, 3, 8, 8), dtype=np.int64)
    blocks[0, 0, 0, 0] = 816  # DC-only (fast path)
    blocks[1, 1] = rng.randint(-40, 40, size=(8, 8))  # dense AC
    blocks[0, 2, 0, 0] = -24  # DC-only again after a dense block
    seq = jpeg.encode_jpeg_from_coeffs([blocks], 24, 16)
    _, comps = jpeg.decode_jpeg_coefficients(seq)
    assert np.array_equal(comps[0], blocks)
    prog = jpeg.encode_jpeg_progressive_from_coeffs([blocks], 24, 16)
    _, comps_p = jpeg.decode_jpeg_coefficients(prog)
    assert np.array_equal(comps_p[0], blocks)


# --- FLAC vectorized rice sweep -----------------------------------------------


def test_best_rice_matches_scalar_reference():
    from bigquery_cross_environment_etl_pipeline_spark.operators import flac

    rng = np.random.RandomState(5)
    cases = [
        [],
        [0],
        [0] * 40,
        list(rng.randint(-5, 5, size=17)),
        list(rng.randint(-(2**15), 2**15, size=64)),
        list(rng.randint(-(2**30), 2**30, size=33)),  # 32-bit-depth scale
    ]
    for resid in cases:
        resid = [int(v) for v in resid]
        want = (0, flac._rice_cost(resid, 0))
        for p in range(1, 15):
            c = flac._rice_cost(resid, p)
            if c < want[1]:
                want = (p, c)
        if not resid:
            want = (0, 0)
        assert flac._best_rice(resid) == want, resid
