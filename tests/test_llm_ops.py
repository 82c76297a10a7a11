"""LLM-pipeline operator semantics beyond the oracle gate: dedup recall
on planted duplicates, ANN recall vs brute force, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def docs_with_dups(spark):
    """documents + planted exact and near duplicates."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    exact = docs.filter(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = docs.filter(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"),
        "lang", "source", "n_chars",
    )
    return docs.unionByName(exact).unionByName(near)


def test_exact_dedup_finds_planted_dup(spark, docs_with_dups):
    stats = dedup.exact_dedup_stats(docs_with_dups)
    dup = stats.filter(F.col("n_copies") > 1).collect()
    assert len(dup) == 1
    assert dup[0]["keeper_id"] == 3 and dup[0]["n_copies"] == 2


def test_minhash_lsh_finds_planted_near_dup(spark, docs_with_dups):
    sigs = dedup.minhash_signatures(docs_with_dups)
    pairs = dedup.lsh_candidate_pairs(sigs)
    hits = {
        (r["doc_a"], r["doc_b"]): r["est_similarity"] for r in pairs.collect()
    }
    assert hits.get((3, 100003)) == 1.0, "exact dup must hash identically"
    assert (5, 200005) in hits, "near dup must share at least one band"
    assert hits[(5, 200005)] >= 0.5


def test_contentless_docs_are_not_minhash_eligible(spark):
    """Docs with no shingles (< SHINGLE_N words: NULL / empty /
    whitespace / too-short text) must NOT pair — two sentinel
    signatures band-matched as a perfect 1.0 pair before round 5's
    edge replay caught it. They stay singletons; real dups still pair."""
    docs = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "one two"),
            (5, "the quick brown fox jumps over the lazy dog tonight"),
            (6, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs)
    pairs = dedup.lsh_candidate_pairs(sigs)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert got == {(5, 6)}, f"only the real dup may pair, got {got}"
    # the verify stage tolerates contentless docs in its input too
    cands = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    verified = dedup.verified_jaccard_pairs(docs, cands, threshold=0.5)
    assert [(r["doc_a"], r["doc_b"]) for r in verified.collect()] == [(5, 6)]


def test_ngram_jaccard_scores_planted_near_dup(spark, docs_with_dups):
    pairs = dedup.ngram_jaccard_verify_blocked(docs_with_dups, threshold=0.5)
    hits = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert hits.get((3, 100003)) == 1.0
    assert 0.8 < hits.get((5, 200005), 0.0) < 1.0


def test_simhash_near_pairs_find_planted_near_dup(spark, docs_with_dups):
    fps = dedup.simhash_fingerprints(docs_with_dups)
    by_id = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert by_id[3] == by_id[100003], "identical text -> identical simhash"
    pairs = dedup.simhash_near_pairs(fps, max_hamming=3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (3, 100003) in got


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    exact = set(
        r["vec_id"] for r in similarity.cosine_topk(emb, query_id=0, k=10).collect()
    )
    approx = similarity.ann_topk_lsh(emb, query_id=0, k=10, n_planes=2)
    got = set(r["vec_id"] for r in approx.collect())
    # 2 hyperplanes -> ~1/4 of the corpus scanned; require nontrivial recall
    assert len(got) == 10
    assert len(exact & got) >= 2, f"LSH recall too low: {exact & got}"
    # every approx neighbor must carry a correct cosine (subset of exact math)
    brute = {
        r["vec_id"]: r["cosine"]
        for r in similarity.cosine_topk(emb, query_id=0, k=10**6).collect()
    }
    for r in approx.collect():
        assert abs(brute[r["vec_id"]] - r["cosine"]) < 1e-12


def test_band_keys_udf_matches_catalyst_fold_bitwise(spark):
    """The Arrow/numpy fast path must reproduce the Catalyst fold's
    sign decisions EXACTLY — numpy accumulates per dim index, never
    reassociating, so every plane dot is the same left-fold chain. Any
    mismatch here would silently break oracle parity of the banded
    near-dup queries."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n_bands, n_planes = 4, 8  # 32 planes is plenty for sign coverage
    udf = similarity._band_keys_udf(n_bands, n_planes, similarity.DIM, 42)
    got = {
        r["vec_id"]: list(r["bks"])
        for r in emb.select(
            "vec_id", udf(F.col("embedding")).alias("bks")
        ).collect()
    }
    want = {
        r["vec_id"]: [r[f"bk{b}"] for b in range(n_bands)]
        for r in emb.select(
            "vec_id",
            *[
                similarity.lsh_bucket_expr(
                    "embedding", n_planes, similarity.DIM, 42,
                    plane_offset=b * n_planes,
                ).alias(f"bk{b}")
                for b in range(n_bands)
            ],
        ).collect()
    }
    assert got == want


def test_fold_dot_udf_matches_catalyst_fold_bitwise(spark):
    """Pair-dot fast path vs dot_expr: bitwise-equal doubles (not
    approximate) — the property the verify stage's oracle parity
    rests on."""
    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    pairs = emb.select(
        "vec_id", F.col("embedding").alias("_a")
    ).crossJoin(
        emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_b"))
    ).filter(F.col("vec_id") < F.col("vec_b")).limit(5000)
    udf = similarity._fold_dot_udf(similarity.DIM)
    rows = pairs.select(
        udf(F.col("_a"), F.col("_b")).alias("fast"),
        similarity.dot_expr("_a", "_b").alias("fold"),
    ).collect()
    assert rows and all(r["fast"] == r["fold"] for r in rows)


def test_lsh_neardup_finds_planted_near_dup(spark):
    """A planted exact duplicate must collide in EVERY band and survive
    the cosine verify at a high threshold; a slightly-perturbed copy
    must still collide in some band (near-dup recall)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    dup = emb.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    near = emb.filter(F.col("vec_id") == 9).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * 1.001).cast("float")
        ).alias("embedding"),
        "label",
    )
    aug = emb.unionByName(dup).unionByName(near)
    pairs = similarity.cosine_neardup_pairs_lsh(aug, threshold=0.9)
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in pairs.collect()}
    assert got.get((7, 100007), 0.0) > 0.999, "exact dup must be found"
    assert got.get((9, 200009), 0.0) > 0.999, "scaled copy must be found"


def test_knn_graph_excludes_zero_norm_vectors(spark):
    """A planted all-zero embedding yields NaN cosines, and Spark ranks
    NaN above every double — without the norm>0 guard the zero vector
    would surface as every collision partner's top neighbor. It must
    appear at NEITHER endpoint, and no NaN edge may enter the graph
    (round-4 ADVICE, similarity.py knn_graph_lsh)."""
    import math

    emb = load_table(spark, SF_SMOKE, "embeddings")
    zero = emb.limit(1).select(
        F.lit(999999).cast("bigint").alias("vec_id"),
        F.transform("embedding", lambda x: F.lit(0.0).cast("float")).alias(
            "embedding"
        ),
        "label",
    )
    g = similarity.knn_graph_lsh(emb.unionByName(zero), k=3).collect()
    assert g, "graph must be non-empty on real vectors"
    for r in g:
        assert r["src"] != 999999 and r["dst"] != 999999
        assert not math.isnan(r["cosine"])


def test_multimodal_feature_plumbing(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    assets = multimodal.synthesize_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    feats = multimodal.extract_features(assets).collect()
    assert len(feats) == 50
    by_id = {r["asset_id"]: r for r in feats}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    import hashlib

    for i, row in by_id.items():
        assert row["n_bytes"] == len(src[i].encode())
        assert row["feature_hash"] == int(
            hashlib.md5(src[i].encode()).hexdigest()[:12], 16
        )


def test_multimodal_arrow_path_matches_pandas_path(spark):
    """mapInArrow featurizer must be bit-identical to the mapInPandas
    one (same hash, same lengths) — the zero-copy path changes the
    transport, never the answer."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    assets = multimodal.synthesize_assets(docs)
    via_pandas = sorted(map(tuple, multimodal.extract_features(assets).collect()))
    via_arrow = sorted(map(tuple, multimodal.extract_features_arrow(assets).collect()))
    assert via_pandas == via_arrow


def test_multimodal_decode_entropy_codecs_still_gated():
    """The codec gate keeps narrowing round over round (r7: compressed
    formats; r9: PNG/GIF real; r10: baseline JPEG real). What REMAINS
    gated: WebP (NotImplementedError), and non-baseline JPEG coding
    processes (gated inside decode_jpeg — see test_jpeg.py). A JPEG
    SOI followed by garbage is now CORRUPTION (ValueError), not a
    capability gate."""
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)  # bad APP0
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8)
    # PNG and GIF signatures now route to the REAL decoders, whose
    # hostile paths are loud (here: nothing valid after the signature)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        multimodal.decode_image(b"GIF89a" + b"\x00" * 16)


def _formula_pixels(d: int, w: int, h: int, ch: int):
    """The shared deterministic pixel formula (same as the PPM/PNG
    oracle queries): pixel(x,y,c) = (d + 3x + 7y + 11c) mod 256."""
    import numpy as np

    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(ch).reshape(1, 1, ch)
    return ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)


def test_png_roundtrip_all_filters_and_color_types():
    """encode_png('cycle') assigns scanline y filter y%5, so any
    height >= 5 exercises None/Sub/Up/Average/Paeth; the decode must
    reproduce the exact pixels for gray (1ch), gray+alpha (2ch), RGB
    and RGBA — in BOTH progressive modes (Adam7 filters each pass as
    an independent sub-image, a different byte layout entirely)."""
    import numpy as np

    for d, ch in ((3, 1), (4, 2), (5, 3), (6, 4)):
        px = _formula_pixels(d, 9, 7, ch)
        if ch == 1:
            px = px[:, :, 0]
        for policy in ("cycle", "none"):
            for interlace in (False, True):
                arr = multimodal.decode_image(
                    multimodal.encode_png(px, policy, interlace=interlace)
                )
                assert arr.shape == px.shape, (ch, policy, interlace)
                assert np.array_equal(arr, px), (ch, policy, interlace)


def test_png_adam7_empty_pass_sizes():
    """Images small or narrow enough that some Adam7 passes are EMPTY
    (zero rows or columns) must round-trip — empty passes contribute
    no bytes, not even filter bytes."""
    import numpy as np

    rng = np.random.RandomState(11)
    for shape in ((1, 1), (2, 3), (3, 1, 3), (1, 16, 3), (8, 8), (5, 5, 4)):
        a = rng.randint(0, 256, size=shape, dtype=np.uint8)
        d = multimodal.decode_png(multimodal.encode_png(a, interlace=True))
        assert d.shape == a.shape and np.array_equal(d, a), shape


def test_png_16bit_roundtrip():
    """Depth-16 PNG is real: big-endian sample pairs, filters over
    bytes at bpp=2*ch distance, uint16 arrays out (never a lossy
    downcast) — every color type, both progressive modes."""
    import numpy as np

    rng = np.random.RandomState(21)
    for shape in ((7, 9), (6, 5, 3), (4, 11, 4), (8, 8, 2)):
        a = rng.randint(0, 65536, size=shape).astype(np.uint16)
        for il in (False, True):
            d = multimodal.decode_png(multimodal.encode_png(a, "cycle", interlace=il))
            assert d.dtype == np.uint16 and d.shape == a.shape
            assert np.array_equal(d, a), (shape, il)
    with pytest.raises(ValueError, match="spec-invalid"):
        multimodal.encode_png(
            np.zeros((3, 3), np.uint16), palette=np.zeros((4, 3), np.uint8)
        )


def test_png_subbyte_roundtrip():
    """Depths 1/2/4 (gray and palette) are real: MSB-first bit
    packing with zero-padded final bytes, filters over the packed
    bytes at distance 1, raw (unrescaled) sample values out — odd
    widths exercise the padding trim, both progressive modes."""
    import numpy as np

    rng = np.random.RandomState(31)
    for d in (1, 2, 4):
        for shape in ((7, 9), (5, 17), (12, 3)):
            a = rng.randint(0, 1 << d, size=shape).astype(np.uint8)
            for il in (False, True):
                out = multimodal.decode_png(
                    multimodal.encode_png(a, "cycle", interlace=il, depth=d)
                )
                assert out.shape == a.shape and np.array_equal(out, a)
        pal = rng.randint(0, 256, size=(1 << d, 3), dtype=np.uint8)
        idx = rng.randint(0, 1 << d, size=(9, 7)).astype(np.uint8)
        out = multimodal.decode_png(
            multimodal.encode_png(idx, "cycle", palette=pal, depth=d)
        )
        assert np.array_equal(out, pal[idx])
    with pytest.raises(ValueError, match="range"):
        multimodal.encode_png(np.array([[5]], dtype=np.uint8), depth=2)


def test_png_palette_roundtrip_and_hostile():
    """Color type 3: indices resolve through PLTE to HxWx3; an
    out-of-range index, a missing PLTE, and palette transparency
    (tRNS) each refuse loudly instead of misreading."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, size=(17, 3), dtype=np.uint8)
    idx = rng.randint(0, 17, size=(9, 7)).astype(np.uint8)
    for interlace in (False, True):
        d = multimodal.decode_png(
            multimodal.encode_png(idx, "cycle", interlace=interlace, palette=pal)
        )
        assert d.shape == (9, 7, 3) and np.array_equal(d, pal[idx]), interlace

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t: bytes, d: bytes) -> bytes:
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    raw = b"".join(b"\x00" + bytes([5, 6, 7]) for _ in range(2))
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
    idat = chunk(b"IDAT", zlib.compress(raw))
    end = chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="out of range"):
        multimodal.decode_png(sig + ihdr + chunk(b"PLTE", bytes(9)) + idat + end)
    with pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_png(sig + ihdr + idat + end)
    with pytest.raises(NotImplementedError, match="tRNS"):
        multimodal.decode_png(
            sig + ihdr + chunk(b"PLTE", bytes(24)) + chunk(b"tRNS", b"\x00") + idat + end
        )
    # review finding (round 9): tRNS is ALSO valid on gray/RGB PNGs
    # (one transparent value) — it must refuse there too, not decode
    # with transparency silently rendered opaque
    rgb_ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
    rgb_raw = b"".join(b"\x00" + bytes(9) for _ in range(2))
    with pytest.raises(NotImplementedError, match="tRNS"):
        multimodal.decode_png(
            sig + rgb_ihdr + chunk(b"tRNS", bytes(6))
            + chunk(b"IDAT", zlib.compress(rgb_raw)) + end
        )


def test_gif_roundtrip_lzw_interlace_and_hostile():
    """GIF 87a/89a decode is REAL (round 9): pure-Python LZW with
    dictionary growth, width escalation, and 12-bit cap resets, plus
    the 4-pass row interlace and palette resolution. Round-trips
    cover small palettes, a full 256-color table, a 1x1 frame, and a
    low-entropy 64x64 that forces LZW width escalation; hostile
    payloads (truncations at several depths, bad magic) refuse
    loudly, transparency gates, and non-image extensions are skipped."""
    import numpy as np

    rng = np.random.RandomState(9)
    for p_colors, shape, il in (
        (4, (7, 9), False),
        (17, (12, 8), True),
        (256, (20, 20), False),
        (3, (1, 1), False),
        (2, (64, 64), True),
    ):
        pal = rng.randint(0, 256, size=(p_colors, 3), dtype=np.uint8)
        idx = rng.randint(0, p_colors, size=shape).astype(np.uint8)
        out = multimodal.decode_image(multimodal.encode_gif(idx, pal, interlace=il))
        assert out.shape == shape + (3,) and np.array_equal(out, pal[idx])

    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(5, 6)).astype(np.uint8)
    g = multimodal.encode_gif(idx, pal)
    for cut in (3, 12, len(g) // 2, len(g) - 2):
        with pytest.raises(ValueError):
            multimodal.decode_gif(g[:cut])
    with pytest.raises(ValueError):
        multimodal.decode_gif(b"NOTGIF" + bytes(20))
    desc_at = g.index(b"\x2c")
    with pytest.raises(NotImplementedError, match="transparency"):
        multimodal.decode_gif(
            g[:desc_at] + b"\x21\xf9\x04\x01\x00\x00\x00\x00" + g[desc_at:]
        )
    # review finding (round 9): a stream truncated right after the GCE
    # size byte must raise the documented ValueError, not IndexError
    with pytest.raises(ValueError):
        multimodal.decode_gif(g[:desc_at] + b"\x21\xf9\x04")
    # comment extension and an OPAQUE graphic-control extension must
    # be skipped, not tripped over
    for ext in (b"\x21\xfe\x05hello\x00", b"\x21\xf9\x04\x00\x00\x00\x00\x00"):
        out = multimodal.decode_gif(g[:desc_at] + ext + g[desc_at:])
        assert np.array_equal(out, pal[idx])


def test_lzw_dictionary_cap_reset_roundtrip():
    """A 60k-symbol low-entropy stream overflows the 12-bit LZW
    dictionary — the encoder must emit a clear-code reset and the
    decoder must follow it; a width-escalation off-by-one fails this
    within the first few hundred symbols."""
    import numpy as np

    rng = np.random.RandomState(2)
    for n, hi in ((1000, 4), (20000, 2), (60000, 7), (8000, 255)):
        seq = rng.randint(0, hi, size=n).tolist()
        mcs = max(2, (hi - 1).bit_length() if hi > 1 else 2)
        assert multimodal._lzw_decode(
            multimodal._lzw_encode(seq, mcs), mcs, n
        ) == seq, (n, hi)


def test_lzw_end_code_width_escalation_regression():
    """Review finding (round 9): when the decoder's dictionary add for
    the encoder's FINAL flushed code lands exactly on 2^width, the
    decoder reads END at width+1 — the encoder must mirror that
    escalation or ~0.5% of streams lose their END code. Pins the two
    fuzz-found failing cases plus a seeded sweep."""
    import numpy as np

    seq = [0, 3, 3, 2, 0, 0, 2, 1, 3, 1, 2]
    assert multimodal._lzw_decode(multimodal._lzw_encode(seq, 2), 2, len(seq)) == seq

    rng = np.random.RandomState(123)
    pal2 = rng.randint(0, 256, size=(2, 3), dtype=np.uint8)
    idx = rng.randint(0, 2, size=(1, 19)).astype(np.uint8)
    out = multimodal.decode_gif(multimodal.encode_gif(idx, pal2))
    assert np.array_equal(out, pal2[idx])

    for _ in range(500):
        hi = int(rng.randint(2, 17))
        n = int(rng.randint(1, 120))
        s = rng.randint(0, hi, size=n).tolist()
        mcs = max(2, int(hi - 1).bit_length() if hi > 1 else 2)
        assert multimodal._lzw_decode(multimodal._lzw_encode(s, mcs), mcs, n) == s


def test_wav_roundtrip_and_hostile():
    """RIFF/WAVE PCM decode is REAL (round 9): 16-bit signed and
    8-bit unsigned (recentered), chunk-walking past metadata chunks.
    Hostile payloads — bad magic, non-PCM format, truncated data,
    missing data chunk — refuse loudly; the encoder refuses values
    that would silently clip."""
    import struct

    import numpy as np

    rng = np.random.RandomState(5)
    for ch in (1, 2, 4):
        a = rng.randint(-32768, 32768, size=(101, ch)).astype(np.int32)
        rate, d = multimodal.decode_wav(multimodal.encode_wav(a, 8000 + ch))
        assert rate == 8000 + ch and d.shape == a.shape and np.array_equal(d, a)

    good = multimodal.encode_wav(np.arange(-20, 20, dtype=np.int32), 44100)
    with pytest.raises(ValueError):
        multimodal.decode_wav(good[:-5])  # truncated data chunk
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFX" + bytes(20))
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # MP3-in-WAV
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + bytes(4)
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    nodata = b"WAVE" + b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFF" + struct.pack("<I", len(nodata)) + nodata)
    with pytest.raises(ValueError):  # refuse silent clipping
        multimodal.encode_wav(np.array([40000]), 8000)
    # a metadata LIST chunk between fmt and data must be walked past
    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    samples = struct.pack("<4h", 1, -2, 3, -4)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt16
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
        + b"data" + struct.pack("<I", 8) + samples
    )
    rate, d = multimodal.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000 and d[:, 0].tolist() == [1, -2, 3, -4]


def test_decode_audio_features_stage(spark):
    """The WAV mapInPandas stage: real parse, exact integer facts,
    NULL/undecodable payloads -> NULL facts without killing the
    batch."""
    import numpy as np

    a = np.arange(-50, 50, dtype=np.int32).reshape(50, 2)
    assets = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_wav(a, 16000))),
            (2, bytearray(b"RIFF garbage")),
            (3, None),
        ],
        "asset_id long, payload binary",
    )
    rows = {
        r["asset_id"]: r
        for r in multimodal.decode_audio_features(assets).collect()
    }
    assert rows[1]["sample_rate"] == 16000
    assert rows[1]["n_channels"] == 2 and rows[1]["n_frames"] == 50
    assert rows[1]["amp_sum"] == int(a.sum())
    assert rows[2]["sample_rate"] is None and rows[3]["amp_sum"] is None


def test_resize_images_real_stage(spark):
    """The REAL resize stage: decode -> nearest-neighbor -> PNG
    re-encode, with exact index arithmetic (out(Y,X) = in((Y*h)//th,
    (X*w)//tw)) verified against a numpy reference, and the
    NULL/undecodable one-bad-asset contract."""
    import numpy as np

    rng = np.random.RandomState(4)
    src = rng.randint(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_png(src))),
            (2, bytearray(b"\xff\xd8\xff\xe0 jpeg")),  # gated codec
            (3, None),
        ],
        "asset_id long, payload binary",
    )
    rows = {
        r["asset_id"]: r
        for r in multimodal.resize_images_real(assets, 4, 5).collect()
    }
    out = multimodal.decode_png(bytes(rows[1]["payload"]))
    yi = (np.arange(5) * 6) // 5
    xi = (np.arange(4) * 9) // 4
    assert np.array_equal(out, src[yi][:, xi])
    assert rows[1]["n_bytes_out"] == len(bytes(rows[1]["payload"]))
    assert rows[2]["payload"] is None and rows[3]["n_bytes_out"] is None


def test_png_hostile_payloads_raise_loudly():
    """The planted hostile-input battery (VERDICT r8 item 1): a
    truncated IDAT, a bad filter byte, a short inflated stream, and
    the declared gates (interlace / 16-bit / palette) must each raise
    the documented exception class — never a silent misread."""
    import struct
    import zlib

    good = multimodal.encode_png(_formula_pixels(1, 4, 3, 3))
    with pytest.raises(ValueError):  # chunk framing truncated
        multimodal.decode_png(good[:-10])

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    def png(w=4, h=3, depth=8, color=2, interlace=0, raw=None):
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
        if raw is None:
            raw = b"".join(b"\x00" + bytes(w * ch) for _ in range(h))
        return (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="filter byte"):
        multimodal.decode_png(
            png(raw=b"".join(b"\x09" + bytes(12) for _ in range(3)))
        )
    with pytest.raises(ValueError, match="truncated or dims lie"):
        multimodal.decode_png(png(raw=b"\x00" * 34))  # expects 39 bytes
    with pytest.raises(ValueError, match="inflate failed"):
        multimodal.decode_png(
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", b"\x00not-zlib")
            + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError):
        # Adam7 is REAL since the follow-up pass; a non-interlaced
        # byte layout under an interlace=1 header is now a LENGTH
        # mismatch (the passes consume different byte counts), never
        # a silent misread
        multimodal.decode_png(png(interlace=1))
    with pytest.raises(ValueError):
        # 16-bit is REAL since the follow-up pass; an 8-bit-sized
        # stream under a depth-16 header is now a LENGTH mismatch
        multimodal.decode_png(png(depth=16))
    with pytest.raises(ValueError):
        # spec-invalid depth/color combination = corruption (every
        # spec-VALID combination is implemented)
        multimodal.decode_png(png(depth=4, color=2))


def _ppm_bytes(d: int, w: int, h: int, header: bytes | None = None):
    """(P6 payload bytes, expected HxWx3 pixel array)."""
    import numpy as np

    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(3).reshape(1, 1, 3)
    px = ((d + 3 * x + 7 * y + 11 * c) % 256).astype(np.uint8)
    head = header if header is not None else b"P6\n%d %d\n255\n" % (w, h)
    return head + px.tobytes(), px


def test_decode_ppm_with_header_comments():
    """Netpbm headers allow '#' comments anywhere between tokens — the
    parser must skip them and land the raster offset exactly."""
    import numpy as np

    payload, px = _ppm_bytes(
        42, 5, 4, header=b"P6\n# made by a tool\n5 # width\n4\n# c\n255\n"
    )
    arr = multimodal.decode_image(payload)
    assert arr.shape == (4, 5, 3)
    assert np.array_equal(arr, px)


def test_decode_pgm_grayscale():
    import numpy as np

    raster = np.arange(12, dtype=np.uint8).reshape(3, 4)
    arr = multimodal.decode_image(b"P5\n4 3\n255\n" + raster.tobytes())
    assert arr.shape == (3, 4)
    assert np.array_equal(arr, raster)


def test_decode_bmp_matches_ppm_pixels():
    """Uncompressed 24-bit BMP (bottom-up rows, BGR, 4-byte row
    padding) must decode to the same RGB array as the PPM twin — two
    independent container formats, one pixel truth."""
    import struct

    import numpy as np

    w, h = 5, 4  # w*3 = 15 -> 1 pad byte per row: exercises the stride
    _, px = _ppm_bytes(7, w, h)
    stride = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR
        raster += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    )
    arr = multimodal.decode_image(bytes(header + raster))
    assert arr.shape == (h, w, 3)
    assert np.array_equal(arr, px)


def test_decode_ppm_comment_after_maxval_and_flush_hash():
    """The two header-grammar traps: a comment trailing the maxval
    ('255 # c\\n') and a '#' flush against the digits ('255# c\\n') —
    the exact-raster-length disambiguation must land the raster offset
    on the pixels, not inside the comment."""
    import numpy as np

    _, px = _ppm_bytes(11, 3, 2)
    for head in (b"P6\n3 2\n255 # maxval comment\n", b"P6\n3 2\n255# c\n"):
        arr = multimodal.decode_image(head + px.tobytes())
        assert np.array_equal(arr, px), head


def test_decode_is_writable_and_loud_on_malformed():
    import numpy as np
    import pytest as _pytest

    payload, px = _ppm_bytes(5, 4, 3)
    arr = multimodal.decode_image(payload)
    arr[0, 0, 0] = 7  # must be a writable copy, not a payload view
    with _pytest.raises(ValueError):
        multimodal.decode_image(b"P6\n4 4\n255\n" + b"12345")  # truncated
    with _pytest.raises(NotImplementedError):
        # OS/2 BITMAPCOREHEADER (DIB size 12) is gated, not misparsed
        import struct

        core = b"BM" + struct.pack("<IHHI", 26, 0, 0, 26) + struct.pack(
            "<IHHHH", 12, 4, 4, 1, 24
        )
        multimodal.decode_image(core + b"\x00" * 64)


def test_decode_stage_isolates_bad_payloads(spark):
    """A malformed or codec-gated payload yields NULL facts for ITS
    row; the rest of the Arrow batch decodes normally."""
    p_ok, px = _ppm_bytes(4, 3, 3)
    assets = spark.createDataFrame(
        [
            (1, bytearray(p_ok)),
            (2, bytearray(b"P6\n9 9\n255\nshort")),  # truncated raster
            (3, bytearray(b"\xff\xd8\xff\xe0 jpeg")),  # gated codec
        ],
        "asset_id long, payload binary",
    )
    rows = {
        r["asset_id"]: r
        for r in multimodal.decode_image_features(assets).collect()
    }
    assert rows[1]["pixel_sum"] == int(px.astype("int64").sum())
    assert rows[2]["width"] is None and rows[3]["width"] is None


def test_decode_image_features_stage(spark):
    """The mapInPandas decode stage: real parse, exact integer facts,
    NULL payload -> NULL facts without killing the batch."""
    import numpy as np

    p1, px1 = _ppm_bytes(3, 4, 3)
    p2, px2 = _ppm_bytes(9, 6, 2)
    assets = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2)), (3, None)],
        "asset_id long, payload binary",
    )
    rows = {
        r["asset_id"]: r
        for r in multimodal.decode_image_features(assets).collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (4, 3)
    assert rows[1]["pixel_sum"] == int(px1.astype("int64").sum())
    assert rows[2]["pixel_sum"] == int(px2.astype("int64").sum())
    assert rows[3]["width"] is None and rows[3]["pixel_sum"] is None


def test_frame_sample_plan(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    assets = multimodal.synthesize_assets(docs)
    plan = multimodal.frame_sample_plan(assets, every_ms=1000)
    rows = plan.collect()
    assert rows, "video assets must produce frame rows"
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)


def test_multimodal_resize_stage_plumbing(spark):
    """Resize stage: image-only rows cross the Arrow boundary, output
    payloads are capped at the stub's byte budget, metadata rides
    alongside the binary column."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    assets = multimodal.synthesize_assets(docs)
    resized = multimodal.resize_images(assets, target_w=32, target_h=32)
    rows = resized.collect()
    n_images = assets.filter("modality = 'image'").count()
    assert len(rows) == n_images and rows
    budget = 32 * 32 // 64
    src = {r["asset_id"]: r["payload"] for r in assets.collect()}
    for r in rows:
        assert r["modality"] == "image"
        assert (r["target_w"], r["target_h"]) == (32, 32)
        assert r["n_bytes_out"] == len(r["payload"]) <= budget
        assert bytes(r["payload"]) == bytes(src[r["asset_id"]])[:budget]


def test_contamination_flags_planted_copy(spark):
    """A train doc that verbatim-copies an eval doc must surface with a
    large distinct-shingle overlap; eval docs themselves never appear."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    planted = ev.limit(1).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    train = docs.filter(F.col("doc_id") % 97 != 0).unionByName(planted)
    out = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in dedup.contamination_counts(train, ev).collect()
    }
    [planted_id] = [r["doc_id"] for r in planted.collect()]
    src_id = planted_id - 500000
    src_shingles = ev.filter(F.col("doc_id") == src_id).select(
        F.size(F.array_distinct(dedup.shingles("text"))).alias("n")
    ).first()["n"]
    assert out.get(planted_id) == src_shingles, "verbatim copy fully overlaps"
    assert all(k % 97 != 0 or k >= 500000 for k in out), "eval docs never flagged"


def test_pq_codes_pick_the_nearest_subcentroid(spark):
    """PQ invariant: per (vector, subspace) the emitted code's
    sub-centroid is at minimal squared-L2 distance among the whole
    codebook (ties to the smallest id), verified in numpy; plus ADC
    sanity: approximate neighbors via code lookup tables overlap the
    exact Euclidean top-10."""
    import numpy as np

    from bigquery_cross_environment_etl_pipeline_spark.operators import similarity
    from bigquery_cross_environment_etl_pipeline_spark.plans.llm import (
        embedding_pq_codes,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    codes = {
        int(r["vec_id"]): [int(c) for c in r["pq_code"].split(",")]
        for r in embedding_pq_codes(spark, sf).collect()
    }
    M, K = similarity.PQ_M, similarity.PQ_K
    sub_d = similarity.DIM // M
    book = np.stack([vecs[c] for c in range(K)])  # (K, DIM)

    for vid in list(vecs)[:50]:
        v = vecs[vid]
        for s in range(M):
            sub = v[s * sub_d : (s + 1) * sub_d]
            cands = book[:, s * sub_d : (s + 1) * sub_d]
            d = ((cands - sub) ** 2).sum(axis=1)
            chosen = codes[vid][s]
            assert d[chosen] <= d.min() + 1e-12, (vid, s)

    # ADC: distance(query, x) ~ sum_s dist(query_sub_s, centroid[code_s])
    qids = sorted(vecs)[:5]
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    hits = 0
    for qid in qids:
        qv = vecs[qid]
        table = np.stack(
            [
                ((book[:, s * sub_d : (s + 1) * sub_d]
                  - qv[s * sub_d : (s + 1) * sub_d]) ** 2).sum(axis=1)
                for s in range(M)
            ]
        )  # (M, K)
        adc = {
            i: sum(table[s][codes[i][s]] for s in range(M))
            for i in ids
            if i != qid
        }
        approx10 = set(sorted(adc, key=lambda i: (adc[i], i))[:10])
        exact = ((mat - qv) ** 2).sum(axis=1)
        order = sorted(
            (i for i in ids if i != qid),
            key=lambda i: (exact[ids.index(i)], i),
        )
        exact10 = set(order[:10])
        hits += len(approx10 & exact10)
    assert hits >= 10, f"ADC recall too low: {hits}/50"


def test_pq_numpy_path_bitwise_equals_expression_path(spark):
    """The Arrow/numpy PQ encoder must emit the identical codes as the
    Catalyst-fold reference implementation (same left-fold IEEE chains,
    same ascending-id tie-break)."""
    from pyspark.sql import functions as F

    from bigquery_cross_environment_etl_pipeline_spark.operators import similarity
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < similarity.PQ_K).collect()
    ]
    fast = {
        r["vec_id"]: r["pq_code"]
        for r in similarity.pq_encode(emb, cents).collect()
    }
    ref = {
        r["vec_id"]: r["pq_code"]
        for r in similarity.pq_encode_expr(emb, cents).collect()
    }
    assert fast == ref

    # regression: a NON-CONTIGUOUS codebook (ids not 0..K-1) must still
    # agree — codes carry centroid IDS, not argmin positions
    nc = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(
            (F.col("vec_id") >= 10) & (F.col("vec_id") < 10 + similarity.PQ_K)
        ).collect()
    ]
    sample = emb.limit(30)
    fast_nc = {
        r["vec_id"]: r["pq_code"] for r in similarity.pq_encode(sample, nc).collect()
    }
    ref_nc = {
        r["vec_id"]: r["pq_code"]
        for r in similarity.pq_encode_expr(sample, nc).collect()
    }
    assert fast_nc == ref_nc


def test_adc_query_overlaps_exact_euclidean(spark):
    """Query-level ADC: 10 rows, ascending distance, nontrivial overlap
    with the exact Euclidean top-10 for the same query vector."""
    import numpy as np

    from bigquery_cross_environment_etl_pipeline_spark.plans.llm import (
        ann_topk_pq_adc,
    )
    from bigquery_cross_environment_etl_pipeline_spark.sources.registry import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = ann_topk_pq_adc(spark, sf).collect()
    assert len(rows) == 10
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)

    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf, "embeddings").collect()
    }
    q = vecs[7]
    exact = sorted(
        (i for i in vecs if i != 7),
        key=lambda i: (((vecs[i] - q) ** 2).sum(), i),
    )[:10]
    overlap = {r["vec_id"] for r in rows} & set(exact)
    assert len(overlap) >= 2, f"ADC overlap too low: {overlap}"


def test_dup_ngram_fraction_flags_planted_duplicate(spark, docs_with_dups):
    """A doc duplicated verbatim must score dup_fraction == 1.0 on both
    copies; the near-dup copy scores high but below 1.0 on the longer
    side (its appended tail adds fresh shingles)."""
    scored = dedup.dup_ngram_doc_fraction(docs_with_dups)
    frac = {r["doc_id"]: r["dup_fraction"] for r in scored.collect()}
    assert frac[3] == 1.0 and frac[100003] == 1.0
    assert frac[5] == 1.0          # every shingle of 5 recurs in 200005
    assert 0.8 < frac[200005] < 1.0
    # a doc-count-invariant: fractions are within [0, 1] everywhere
    assert all(0.0 <= v <= 1.0 for v in frac.values())


def test_span_dedup_masks_planted_duplicate_and_keeps_unique(spark, docs_with_dups):
    """A doc duplicated verbatim must be fully masked on BOTH copies
    (cleaned text empty); the near-dup's appended tail must survive;
    a doc with no cross-doc spans must pass through byte-identical."""
    from pyspark.sql import functions as F

    unique_text = "qav1 qav2 qav3 qav4 qav5 qav6 qav7"
    docs = docs_with_dups.unionByName(
        spark.createDataFrame(
            [(300000, unique_text, "en", "src0", len(unique_text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    out = {
        r["doc_id"]: r for r in dedup.duplicated_span_mask(docs).collect()
    }
    assert out[3]["n_masked"] == out[3]["n_tokens"]
    assert out[3]["cleaned_text"] == "" == out[100003]["cleaned_text"]
    # near-dup: everything shared is masked, the fresh tail remains
    tail = out[200005]["cleaned_text"]
    assert 0 < out[200005]["n_masked"] < out[200005]["n_tokens"]
    assert "token" in tail  # from " extra tail token"
    # a doc with a unique vocabulary passes through byte-identical
    assert out[300000]["n_masked"] == 0
    assert out[300000]["cleaned_text"] == unique_text


def test_span_dedup_invariants_on_random_corpus(spark):
    """Structural invariants on a seeded random corpus: token
    accounting must balance (n_masked = n_tokens - |cleaned tokens|),
    masks stay within bounds, and any 3-gram shared by two docs is
    masked in BOTH."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.duplicated_span_mask(docs).collect()}
    texts = dict(rows)
    # cross-doc shared shingles, computed independently in Python
    def sh3(t):
        w = t.split()
        return {tuple(w[i:i + 3]) for i in range(len(w) - 2)}

    owners = {}
    for i, t in texts.items():
        for s in sh3(t):
            owners.setdefault(s, set()).add(i)
    shared = {s for s, o in owners.items() if len(o) > 1}
    for i, t in texts.items():
        r = out[i]
        n_clean = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert r["n_tokens"] == len(t.split())
        assert r["n_masked"] == r["n_tokens"] - n_clean
        assert 0 <= r["n_masked"] <= r["n_tokens"]
        doc_shared = sh3(t) & shared
        if doc_shared:
            assert r["n_masked"] >= 3, (i, doc_shared)
        else:
            assert r["n_masked"] == 0 and r["cleaned_text"] == t


def test_bm25_index_serves_identical_to_inline(spark, tmp_path):
    """The persisted inverted index must change the COST, not the
    answer: bucketed postings prune at the scan, and the served top-k
    equals the inline (tokenize-per-query) scorer row for row."""
    from bigquery_cross_environment_etl_pipeline_spark.operators import retrieval
    from bigquery_cross_environment_etl_pipeline_spark.plans.llm import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
        bm25_topk_retrieval,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "bm25")
    retrieval.bm25_index_persist(spark, docs, path)

    # postings probe prunes to the query terms' hash buckets
    buckets = [
        int(r["_tb"])
        for r in spark.createDataFrame(
            [(t,) for t in _BM25_TERMS], "token string"
        )
        .select(retrieval._token_bucket(F.col("token")).alias("_tb"))
        .distinct()
        .collect()
    ]
    probe = spark.read.parquet(path + "/postings").filter(
        F.col("_tb").isin(buckets)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert (
        "PartitionFilters: [" in plan
        and "_tb" in plan.split("PartitionFilters")[-1]
    ), "term probe must prune postings partitions"

    served = retrieval.bm25_topk_from_index(
        spark, path, _BM25_TERMS, k=_BM25_TOPK, k1=_BM25_K1, b=_BM25_B
    ).collect()
    inline = bm25_topk_retrieval(spark, SF_SMOKE).collect()
    assert [(r["doc_id"], r["bm25"]) for r in served] == [
        (r["doc_id"], r["bm25"]) for r in inline
    ]
    assert len(served) == _BM25_TOPK


def test_bm25_append_crash_leaves_index_stale(spark, tmp_path, monkeypatch):
    """Invalidate-first (round-5 ADVICE item 3): bm25_index_append's
    three on-disk steps are not atomic, so the staleness marker callers
    check (stats/_SUCCESS) must be REMOVED before the first write and
    only restored by the final stats refold — a crash mid-append then
    forces a rebuild instead of serving postings inconsistent with
    doclen/stats."""
    import os

    from bigquery_cross_environment_etl_pipeline_spark.operators import retrieval

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "bm25_crash")
    retrieval.bm25_index_persist(
        spark, docs.filter(F.col("doc_id") % 5 != 0), path
    )
    marker = path + "/stats/_SUCCESS"
    assert os.path.exists(marker)

    def boom(*a, **k):
        raise RuntimeError("simulated mid-append crash")

    monkeypatch.setattr(retrieval, "_tokenize_postings", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        retrieval.bm25_index_append(
            spark, docs.filter(F.col("doc_id") % 5 == 0), path
        )
    assert not os.path.exists(marker), (
        "torn append must leave the index marked stale"
    )
    monkeypatch.undo()
    # appending onto a torn index must REFUSE (it would restore the
    # marker without restoring lost postings) — recovery is a rebuild
    with pytest.raises(ValueError, match="stale or torn"):
        retrieval.bm25_index_append(
            spark, docs.filter(F.col("doc_id") % 5 == 0), path
        )
    retrieval.bm25_index_persist(
        spark, docs.filter(F.col("doc_id") % 5 != 0), path
    )
    retrieval.bm25_index_append(
        spark, docs.filter(F.col("doc_id") % 5 == 0), path
    )
    assert os.path.exists(marker), "successful append restores the marker"


def test_bm25_index_append_equals_full_build(spark, tmp_path):
    """Incremental maintenance must be invisible to serving: an index
    built on 80% of the corpus then appended with the rest must serve
    the SAME top-k, postings, doclen, and stats as a from-scratch
    build over the full corpus (delta ids are new, so postings stay
    unique and df = COUNT(*) stays exact; stats are refolded from the
    merged doclen)."""
    from bigquery_cross_environment_etl_pipeline_spark.operators import retrieval
    from bigquery_cross_environment_etl_pipeline_spark.plans.llm import (
        _BM25_B,
        _BM25_K1,
        _BM25_TOPK,
    )

    terms = ("join", "filter", "sort")
    docs = load_table(spark, SF_SMOKE, "documents")
    full_path = str(tmp_path / "bm25_full")
    incr_path = str(tmp_path / "bm25_incr")
    retrieval.bm25_index_persist(spark, docs, full_path)
    retrieval.bm25_index_persist(
        spark, docs.filter(F.col("doc_id") % 5 != 0), incr_path
    )
    retrieval.bm25_index_append(
        spark, docs.filter(F.col("doc_id") % 5 == 0), incr_path
    )

    # relation-level equivalence: postings, doclen, stats
    for rel in ["postings", "doclen", "stats"]:
        a = sorted(
            map(tuple, spark.read.parquet(f"{full_path}/{rel}").collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(f"{incr_path}/{rel}").collect())
        )
        assert a == b, f"{rel} diverged after append"

    # serving-level equivalence, bitwise
    served_full = retrieval.bm25_topk_from_index(
        spark, full_path, terms, k=_BM25_TOPK, k1=_BM25_K1, b=_BM25_B
    ).collect()
    served_incr = retrieval.bm25_topk_from_index(
        spark, incr_path, terms, k=_BM25_TOPK, k1=_BM25_K1, b=_BM25_B
    ).collect()
    assert [(r["doc_id"], r["bm25"]) for r in served_incr] == [
        (r["doc_id"], r["bm25"]) for r in served_full
    ]


def test_inverted_exact_jaccard_matches_verify_stage(spark, docs_with_dups):
    """The inverted-index exact-Jaccard ground truth (round-7, feeds
    dedup_recall_precision) must agree pairwise with the established
    array-intersect verify stage when that stage is handed EVERY pair —
    two independent implementations of the same hashed-shingle Jaccard.
    Also pins completeness on the planted duplicates: the exact copy
    scores 1.0 and the near copy scores high."""
    docs = docs_with_dups
    ids = docs.select("doc_id")
    all_pairs = (
        ids.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(ids.select(F.col("doc_id").alias("doc_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    via_verify = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.verified_jaccard_pairs(
            docs, all_pairs, threshold=0.0
        ).collect()
    }
    via_inverted = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.exact_jaccard_pairs_inverted(docs).collect()
    }
    assert via_inverted == via_verify
    assert via_inverted[(3, 100003)] == 1.0
    assert via_inverted[(5, 200005)] > 0.8


def test_exact_jaccard_refuses_overflowing_threshold(docs_with_dups):
    """ADVICE r7: a non-terminating decimal threshold (1/3 ->
    denominator 10^16) would overflow the int64 size-compatibility
    cross-multiplication for docs beyond ~900 shingles. The guard
    must refuse it loudly at call time, before any job runs."""
    with pytest.raises(ValueError, match="not a short decimal"):
        dedup.exact_jaccard_pairs_inverted(
            docs_with_dups, min_jaccard=1 / 3
        )


def test_nfc_normalization_collapses_decomposed_text(spark):
    """NFC hygiene (round 9): decomposed e+U+0301 and composed U+00E9
    are byte-different but the same text — after normalization their
    content hashes agree, so dedup keyed on the normalized hash
    collapses them; NULL passes through."""
    from bigquery_cross_environment_etl_pipeline_spark.operators.text import (
        hash48,
        nfc_normalize,
    )
    import pyspark.sql.functions as F

    composed = "café latte"
    decomposed = "café latte"
    assert composed != decomposed  # byte-different inputs
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None)], "id long, text string"
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id", nfc_normalize("text").alias("n"), hash48(nfc_normalize("text")).alias("h")
        ).collect()
    }
    assert rows[1]["n"] == rows[2]["n"] == composed
    assert rows[1]["h"] == rows[2]["h"]
    assert rows[3]["n"] is None and rows[3]["h"] is None
