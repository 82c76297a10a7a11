"""Baseline JPEG codec tests (operators/jpeg.py, round 10).

Three layers of evidence, mirroring the PNG/GIF test strategy:

1. **Exact round trips** for the constructions the driver oracles use
   (block-constant pixels; chosen coefficient lattices) — these must be
   BIT-exact, that is the whole design.
2. **Independent naive reference**: the vectorized einsum IDCT and the
   entropy decoder are checked against a from-the-definition
   quadruple-loop IDCT and direct coefficient comparison on random
   images — catches vectorization/transpose bugs the self round-trip
   can't see (an encoder and decoder sharing one wrong transform would
   still round-trip).
3. **Hostile payloads**: every declared ValueError /
   NotImplementedError class is pinned — truncated streams, invalid
   Huffman codes, AC overruns, wrong restart markers, undefined
   tables, non-baseline SOFs, 12-bit precision, CMYK.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import jpeg, multimodal


def _const_gray(seed: int, w: int, h: int):
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    return ((3 * seed + 5 * bx[None, :] + 11 * by[:, None]) % 256).astype(np.uint8)


def _const_rgb(seed: int, w: int, h: int, bs: int):
    bx = np.arange(w) // bs
    by = np.arange(h) // bs
    c = np.arange(3)
    return (
        (3 * seed + 5 * bx[None, :, None] + 11 * by[:, None, None] + 17 * c) % 256
    ).astype(np.uint8)


def _expected_color_roundtrip(px):
    """The deterministic YCbCr round trip the decoder promises (and
    the DuckDB oracle states): forward transform with floor(x+0.5),
    inverse with floor(x+0.5) and clipping."""
    ycc = jpeg.rgb_to_ycbcr(px).astype(np.float64)
    return jpeg._ycbcr_to_rgb(ycc[..., 0], ycc[..., 1], ycc[..., 2])


# ---------------------------------------------------------------------------
# 1. exact round trips
# ---------------------------------------------------------------------------


def test_gray_block_constant_roundtrip_exact():
    for seed, w, h, rst in [(0, 8, 8, 0), (1, 17, 23, 2), (2, 40, 9, 1), (3, 31, 26, 5)]:
        px = _const_gray(seed, w, h)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, restart_interval=rst))
        assert out.dtype == np.uint8 and out.shape == (h, w)
        assert np.array_equal(out, px)


@pytest.mark.parametrize("sub,bs", [("4:4:4", 8), ("4:2:2", 16), ("4:2:0", 16)])
def test_color_block_constant_roundtrip_exact(sub, bs):
    for seed, w, h, rst in [(0, 16, 16, 0), (5, 33, 18, 2), (9, 47, 41, 3)]:
        px = _const_rgb(seed, w, h, bs)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling=sub, restart_interval=rst))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, _expected_color_roundtrip(px))


def test_coefficient_lattice_roundtrip_exact():
    """The driver's AC-path construction: nonzeros on a mod-29 lattice
    (zero-runs up to 28 force ZRL), signed values in [-9, 9]."""
    for seed in range(8):
        nbx, nby = 1 + seed % 5, 1 + seed % 4
        blocks = np.zeros((nby, nbx, 8, 8), dtype=np.int64)
        for b in range(nbx * nby):
            for i in range(64):
                if (7 * i + b + seed) % 29 == 0:
                    r, c = jpeg.ZIGZAG[i]
                    blocks[b // nbx, b % nbx, r, c] = ((seed + b + i) % 19) - 9
        payload = jpeg.encode_jpeg_from_coeffs(
            [blocks], 8 * nbx, 8 * nby, restart_interval=3 if seed % 2 else 0
        )
        meta, comps = jpeg.decode_jpeg_coefficients(payload)
        assert meta["width"] == 8 * nbx and meta["height"] == 8 * nby
        assert np.array_equal(comps[0], blocks)


def test_coefficient_extremes_and_zrl_chains():
    """Category edges: DC at the +/-1023 AC limit after dequant, a
    63-zero run (two ZRLs + run prefix), and a lone last-position AC."""
    blocks = np.zeros((1, 3, 8, 8), dtype=np.int64)
    blocks[0, 0, 0, 0] = 1016  # max DC our pixel path produces (8*127)
    r, c = jpeg.ZIGZAG[63]
    blocks[0, 0, r, c] = -1  # 62 zeros between: ZRL x3 + run 14
    blocks[0, 1, 0, 0] = -1016  # large negative DC swing (diff -2032)
    r2, c2 = jpeg.ZIGZAG[1]
    blocks[0, 2, r2, c2] = 1023  # max AC category 10
    payload = jpeg.encode_jpeg_from_coeffs([blocks], 24, 8)
    _, comps = jpeg.decode_jpeg_coefficients(payload)
    assert np.array_equal(comps[0], blocks)


def test_dequantization_scales_coefficients():
    """A non-unit qtable must multiply into the dequantized output —
    pins that DQT entries are read in ZIGZAG order."""
    q = [1 + (i % 4) for i in range(64)]
    blocks = np.zeros((1, 1, 8, 8), dtype=np.int64)
    for i in (0, 5, 17, 63):
        r, c = jpeg.ZIGZAG[i]
        blocks[0, 0, r, c] = 7
    payload = jpeg.encode_jpeg_from_coeffs([blocks], 8, 8, qtables=[q])
    _, comps = jpeg.decode_jpeg_coefficients(payload)
    expected = np.zeros((8, 8), dtype=np.int64)
    for i in (0, 5, 17, 63):
        r, c = jpeg.ZIGZAG[i]
        expected[r, c] = 7 * q[i]
    assert np.array_equal(comps[0][0, 0], expected)


def test_lossy_roundtrip_bounded_error_random_pixels():
    """With unit tables the only loss is DCT float rounding: random
    uint8 images must round-trip within +/-1 per sample."""
    rng = np.random.default_rng(7)
    for shape, sub in [((24, 32), None), ((21, 19), None), ((16, 24, 3), "4:4:4")]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        payload = (
            jpeg.encode_jpeg(px)
            if sub is None
            else jpeg.encode_jpeg(px, subsampling=sub)
        )
        out = jpeg.decode_jpeg(payload)
        if sub is None:
            assert np.abs(out.astype(int) - px.astype(int)).max() <= 1
        else:
            # color adds two rounded affine transforms: still tightly bounded
            assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


# ---------------------------------------------------------------------------
# progressive (SOF2): Annex G Huffman procedures
# ---------------------------------------------------------------------------


def test_progressive_coefficients_equal_input_blocks():
    """The six-phase scan script (DC first/refine, split-band AC
    first/refine with EOBn runs) must reconstruct the exact blocks —
    sparse (EOB-heavy), dense large-magnitude (correction-bit-heavy),
    and all-zero-tail (long EOBRUN) shapes, with and without
    restarts."""
    rng = np.random.default_rng(5)
    for trial in range(6):
        nbx, nby = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        blocks = rng.integers(-40, 41, (nby, nbx, 8, 8)).astype(np.int64)
        blocks[rng.random((nby, nbx, 8, 8)) < 0.85] = 0
        p = jpeg.encode_jpeg_progressive_from_coeffs(
            [blocks], 8 * nbx, 8 * nby, restart_interval=trial % 3
        )
        meta, comps = jpeg.decode_jpeg_coefficients(p)
        assert meta["progressive"] is True
        assert np.array_equal(comps[0], blocks)
    dense = rng.integers(-1000, 1001, (2, 3, 8, 8)).astype(np.int64)
    _, comps = jpeg.decode_jpeg_coefficients(
        jpeg.encode_jpeg_progressive_from_coeffs([dense], 24, 16)
    )
    assert np.array_equal(comps[0], dense)
    sparse = np.zeros((4, 8, 8, 8), dtype=np.int64)
    sparse[3, 7, 0, 0] = 5
    sparse[3, 7, 1, 1] = -3
    _, comps = jpeg.decode_jpeg_coefficients(
        jpeg.encode_jpeg_progressive_from_coeffs([sparse], 64, 32)
    )
    assert np.array_equal(comps[0], sparse)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_progressive_pixels_equal_sequential(sub):
    """Progressive and sequential encodings of the same image carry
    identical coefficients, so decoded pixels must be bit-identical —
    across color modes, odd dimensions, and restart intervals."""
    rng = np.random.default_rng(17)
    for trial in range(3):
        w, h = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(px, subsampling=sub))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(
                px, subsampling=sub, restart_interval=(trial % 2) * 2
            )
        )
        assert np.array_equal(seq, prog)


def test_progressive_block_constant_exactness():
    """The driver-query construction through the progressive path:
    block-constant pixels round-trip bit-exactly."""
    px = _const_gray(6, 23, 18)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(px, restart_interval=3))
    assert np.array_equal(out, px)
    rgb = _const_rgb(7, 33, 21, 16)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(rgb, subsampling="4:2:0"))
    assert np.array_equal(out, _expected_color_roundtrip(rgb))


def test_progressive_scan_script_violations_rejected():
    """Scan-script structural rules: AC before DC, multi-component AC
    scans, and inverted spectral bands are corruption."""
    blocks = np.zeros((1, 1, 8, 8), dtype=np.int64)
    good = jpeg.encode_jpeg_progressive_from_coeffs([blocks], 8, 8)
    # find the FIRST SOS (the interleaved DC scan) and relabel its
    # band to [1, 5]: an AC scan arriving before any DC scan
    at = good.find(b"\xff\xda")
    mutated = bytearray(good)
    seglen = struct.unpack_from(">H", mutated, at + 2)[0]
    mutated[at + 2 + seglen - 3] = 1  # Ss
    mutated[at + 2 + seglen - 2] = 5  # Se
    with pytest.raises(ValueError, match="AC scan before|single-component"):
        jpeg.decode_jpeg_coefficients(bytes(mutated))
    # inverted band
    mutated = bytearray(good)
    mutated[at + 2 + seglen - 3] = 6
    mutated[at + 2 + seglen - 2] = 5
    with pytest.raises(ValueError, match="invalid spectral band|single-component"):
        jpeg.decode_jpeg_coefficients(bytes(mutated))


def test_progressive_missing_dc_scan_rejected():
    """Incomplete progressive streams are never decodable-to-zeros:
    EOI before any scan raises, and a DC REFINEMENT scan arriving
    without a prior DC first pass raises."""
    blocks = np.zeros((1, 1, 8, 8), dtype=np.int64)
    good = jpeg.encode_jpeg_progressive_from_coeffs([blocks], 8, 8)
    at = good.find(b"\xff\xda")  # truncate before the first scan
    with pytest.raises(ValueError, match="EOI before SOS"):
        jpeg.decode_jpeg_coefficients(good[:at] + b"\xff\xd9")
    # relabel the first scan (DC first, Ah=0 Al=1) as a refinement
    mutated = bytearray(good)
    seglen = struct.unpack_from(">H", mutated, at + 2)[0]
    mutated[at + 2 + seglen - 1] = 0x10  # Ah=1, Al=0
    with pytest.raises(ValueError, match="DC refinement before"):
        jpeg.decode_jpeg_coefficients(bytes(mutated))


# ---------------------------------------------------------------------------
# lossless (SOF3): Annex H prediction process
# ---------------------------------------------------------------------------


def test_lossless_roundtrip_all_predictors():
    """Lossless means ANY content round-trips exactly — random pixels,
    every predictor, degenerate 1x1/1xN shapes, restart resets."""
    rng = np.random.default_rng(23)
    for sel in range(1, 8):
        for shape in [(1, 1), (1, 17), (13, 1), (24, 31)]:
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            p = jpeg.encode_jpeg_lossless(px, predictor=sel, restart_interval=5)
            out = jpeg.decode_jpeg(p)
            assert out.dtype == np.uint8
            assert np.array_equal(out, px), (sel, shape)


def test_lossless_extreme_gradients_hit_category_nine():
    """Predictor 4 (Ra+Rb-Rc) on a checkerboard of 0/255 produces the
    +/-510 corner differences — category 9, the worst case the 8-bit
    table must carry."""
    px = np.indices((16, 16)).sum(axis=0) % 2 * 255
    px = px.astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(px, predictor=4))
    assert np.array_equal(out, px)


def test_lossless_gates_and_corruption():
    px = np.arange(108, dtype=np.uint8).reshape(12, 9)
    p = jpeg.encode_jpeg_lossless(px)
    at = p.find(b"\xff\xda")
    # invalid predictor selector (Ss = 0)
    mut = bytearray(p)
    mut[at + 7] = 0
    with pytest.raises(ValueError, match="predictor 0 invalid"):
        jpeg.decode_jpeg(bytes(mut))
    # nonzero point transform: declared gate
    mut = bytearray(p)
    mut[at + 9] = 0x01
    with pytest.raises(NotImplementedError, match="point transform"):
        jpeg.decode_jpeg(bytes(mut))
    # truncated entropy data
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(p[: len(p) // 2])
    # the coefficient parser refuses SOF3 (no DCT layer exists)
    with pytest.raises(NotImplementedError, match="no DCT coefficient layer"):
        jpeg.decode_jpeg_coefficients(p)
    # decode_image dispatches lossless like every other JPEG
    from bigquery_cross_environment_etl_pipeline_spark.operators import multimodal

    assert np.array_equal(multimodal.decode_image(p), px)


# ---------------------------------------------------------------------------
# 2. independent naive reference
# ---------------------------------------------------------------------------


def _naive_idct_block(F):
    """T.81 A.3.3 from the definition: quadruple loop, no numpy
    transform machinery shared with the implementation under test."""
    import math

    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * F[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4
    return out


def test_vectorized_idct_matches_naive_definition():
    rng = np.random.default_rng(11)
    blocks = rng.integers(-512, 512, (2, 3, 8, 8)).astype(np.int64)
    fast = jpeg._idct_blocks(blocks)
    for by in range(2):
        for bx in range(3):
            naive = _naive_idct_block(blocks[by, bx].astype(np.float64))
            assert np.allclose(fast[by, bx], naive, atol=1e-9)


def test_decoded_pixels_match_naive_pipeline_gray():
    """Full-path cross-check on a random gray image: entropy-decode
    coefficients, push them through the NAIVE IDCT + the documented
    rounding, compare to decode_jpeg's output exactly."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    payload = jpeg.encode_jpeg(px)
    meta, comps = jpeg.decode_jpeg_coefficients(payload)
    by, bx = comps[0].shape[:2]
    plane = np.zeros((by * 8, bx * 8))
    for y in range(by):
        for x in range(bx):
            plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = _naive_idct_block(
                comps[0][y, x].astype(np.float64)
            )
    expected = np.clip(np.floor(plane + 128.0 + 0.5), 0, 255)[
        : meta["height"], : meta["width"]
    ].astype(np.uint8)
    assert np.array_equal(jpeg.decode_jpeg(payload), expected)


def test_annex_k_tables_are_canonically_valid():
    """BITS/HUFFVAL consistency + prefix-freeness of the built codes."""
    for bits, vals in [
        (jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
        (jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
        (jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
        (jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS),
    ]:
        codes = jpeg._canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        seen = set()
        for code, ln in codes.values():
            bitstr = format(code, f"0{ln}b")
            for p in range(1, len(bitstr)):
                assert bitstr[:p] not in seen  # no codeword prefixes another
            seen.add(bitstr)


def test_zigzag_is_the_standard_order():
    # spot-pin the well-known prefix and the involution property
    assert jpeg.ZIGZAG[:8] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    ]
    assert jpeg.ZIGZAG[63] == (7, 7)
    assert len(set(jpeg.ZIGZAG)) == 64


# ---------------------------------------------------------------------------
# 3. hostile payloads
# ---------------------------------------------------------------------------


def _valid_gray() -> bytes:
    return jpeg.encode_jpeg(_const_gray(1, 16, 16))


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x00\x01\x02\x03")


def test_truncated_entropy_stream():
    payload = _valid_gray()
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(payload[: len(payload) // 2])


def test_truncated_segment_length():
    # SOI + APP0 claiming more bytes than exist
    with pytest.raises(ValueError, match="overruns|truncated"):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xe0\xff\xff" + b"\x00" * 4)


def test_non_huffman_processes_are_gated_not_misread():
    base = _valid_gray()
    # SOF9/SOF10 (arithmetic) decode for real since round 11
    # (tests/test_jpeg_arith.py); the remaining genuinely-different
    # coding processes stay loudly gated
    for marker in (0xCB, 0xCD, 0xCE, 0xCF):  # arith-lossless/differential
        mutated = bytearray(base)
        idx = mutated.find(b"\xff\xc0")
        mutated[idx + 1] = marker
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bytes(mutated))
    # SOF2 and SOF3 themselves decode since round 10 — but a
    # SEQUENTIAL scan script relabeled as either is structural
    # corruption (a full-band interleaved scan is illegal under SOF2;
    # a DCT-style SOS under SOF3 carries predictor selector 0), not a
    # silent misread
    for marker in (0xC2, 0xC3):
        mutated = bytearray(base)
        idx = mutated.find(b"\xff\xc0")
        mutated[idx + 1] = marker
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(bytes(mutated))


def test_12bit_grayscale_roundtrips_and_color_gated():
    """Round 10, third wave: 12-bit grayscale (extended precision)
    decodes for real — uint16 samples, 2048 level shift, extended
    Huffman categories (DC through 15, AC sizes through 14). 12-bit
    COLOR stays gated (non-JFIF: there is no standard 12-bit color
    transform); spec-invalid precisions are corruption."""
    bx = np.arange(21) // 8
    by = np.arange(13) // 8
    px = ((7 + 501 * bx[None, :] + 1103 * by[:, None]) % 4096).astype(np.uint16)
    for enc in (jpeg.encode_jpeg, jpeg.encode_jpeg_progressive):
        out = jpeg.decode_jpeg(enc(px, restart_interval=2))
        assert out.dtype == np.uint16
        assert np.array_equal(out, px)
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 4096, (16, 24), dtype=np.uint16)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(noisy))
    assert np.abs(out.astype(int) - noisy.astype(int)).max() <= 1
    with pytest.raises(NotImplementedError, match="12-bit"):
        jpeg.encode_jpeg(rng.integers(0, 4096, (8, 8, 3), dtype=np.uint16))
    base = bytearray(_valid_gray())
    idx = base.find(b"\xff\xc0")
    base[idx + 4] = 10  # spec-invalid precision
    with pytest.raises(ValueError, match="spec-invalid"):
        jpeg.decode_jpeg(bytes(base))


def test_cmyk_gated():
    # hand-build an SOF0 with 4 components behind a minimal header
    sof = struct.pack(">BHHB", 8, 8, 8, 4) + bytes(
        (1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0)
    )
    payload = (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">H", len(sof) + 2)
        + sof
    )
    with pytest.raises(NotImplementedError, match="CMYK"):
        jpeg.decode_jpeg(payload)


def test_zero_dimensions_rejected():
    sof = struct.pack(">BHHB", 8, 0, 8, 1) + bytes((1, 0x11, 0))
    payload = b"\xff\xd8\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    with pytest.raises(ValueError, match="positive"):
        jpeg.decode_jpeg(payload)


def test_undefined_quant_table_rejected():
    base = bytearray(_valid_gray())
    idx = base.find(b"\xff\xc0")
    base[idx + 12] = 3  # component quant-table selector -> undefined id 3
    with pytest.raises(ValueError, match="undefined DQT"):
        jpeg.decode_jpeg(bytes(base))


def test_wrong_restart_marker_rejected():
    payload = bytearray(jpeg.encode_jpeg(_const_gray(2, 32, 32), restart_interval=2))
    # find the first RST0 (0xFFD0) in the entropy data and break it
    idx = payload.find(b"\xff\xd0", payload.find(b"\xff\xda"))
    assert idx > 0, "restart marker expected in fixture"
    payload[idx + 1] = 0xD5
    with pytest.raises(ValueError, match="RST"):
        jpeg.decode_jpeg(bytes(payload))


def test_eoi_before_sos_rejected():
    with pytest.raises(ValueError, match="EOI"):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xd9")


def test_truncated_segment_bodies_raise_valueerror_not_structerror():
    """Round-10 review finding: empty/short SOF, DRI, and SOS bodies
    must raise ValueError (the per-asset catch class), never
    struct.error (which would kill the whole Arrow batch)."""
    for payload in [
        b"\xff\xd8\xff\xc0\x00\x02",              # SOF0, empty body
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",      # SOF0, short body
        b"\xff\xd8\xff\xdd\x00\x02",              # DRI, empty body
        b"\xff\xd8\xff\xdd\x00\x03\x01",          # DRI, 1-byte body
        b"\xff\xd8\xff\xda\x00\x02",              # SOS, empty body (no SOF)
    ]:
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(payload)
    # SOF claiming 3 components but carrying bytes for only 1
    sof = struct.pack(">BHHB", 8, 8, 8, 3) + bytes((1, 0x11, 0))
    payload = b"\xff\xd8\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    with pytest.raises(ValueError, match="component list truncated"):
        jpeg.decode_jpeg(payload)


def test_saturated_chroma_stays_exact():
    """Round-10 review finding: pure-blue pixels push cb past 255
    before clamping; the encoder now clamps YCbCr into the sample
    range so the block-constant exactness contract holds at the
    chroma extremes too."""
    for rgb in [(0, 0, 255), (255, 0, 0), (255, 255, 255), (0, 0, 0)]:
        px = np.tile(np.array(rgb, dtype=np.uint8), (8, 8, 1))
        ycc = jpeg.rgb_to_ycbcr(px)
        assert int(ycc.max()) <= 255 and int(ycc.min()) >= 0
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(px))
        assert np.array_equal(out, _expected_color_roundtrip(px))


def test_ac_overrun_rejected():
    """63 leading zeros followed by a run that walks past position 63
    must raise, not wrap."""
    # craft entropy data via the encoder's own writer against a legit header
    blocks = np.zeros((1, 1, 8, 8), dtype=np.int64)
    payload = bytearray(jpeg.encode_jpeg_from_coeffs([blocks], 8, 8))
    # locate entropy start (right after SOS segment) and splice in a
    # hand-built stream: DC cat 0, then ZRL x4 (64 zeros -> overrun)
    sos_at = payload.find(b"\xff\xda")
    seglen = struct.unpack_from(">H", payload, sos_at + 2)[0]
    entropy_at = sos_at + 2 + seglen
    dc = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    ac = jpeg._canonical_codes(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    wtr = jpeg._BitWriter()
    wtr.write(dc[0][0], dc[0][1])  # DC category 0 (diff = 0)
    for _ in range(4):
        wtr.write(ac[0xF0][0], ac[0xF0][1])
    wtr.flush()
    evil = payload[:entropy_at] + wtr.out + b"\xff\xd9"
    with pytest.raises(ValueError, match="overruns the block|invalid Huffman"):
        jpeg.decode_jpeg_coefficients(bytes(evil))


def test_stuffed_ff_bytes_roundtrip():
    """Force an entropy byte equal to 0xFF so the writer stuffs 0x00
    and the reader unstuffs it (found by seed search: this DC sequence
    provably emits a stuffed byte); verify exactness through it."""
    blocks = np.zeros((1, 6, 8, 8), dtype=np.int64)
    blocks[0, :, 0, 0] = [633, -842, -652, -535, -648, 612]
    payload = jpeg.encode_jpeg_from_coeffs([blocks], 48, 8)
    assert b"\xff\x00" in payload[payload.find(b"\xff\xda") + 2 :]
    _, comps = jpeg.decode_jpeg_coefficients(payload)
    assert np.array_equal(comps[0], blocks)


# ---------------------------------------------------------------------------
# integration with the multimodal layer
# ---------------------------------------------------------------------------


def test_decode_image_dispatches_jpeg():
    px = _const_gray(4, 24, 16)
    out = multimodal.decode_image(jpeg.encode_jpeg(px))
    assert np.array_equal(out, px)


def test_decode_image_features_null_facts_on_progressive(spark):
    """A gated (progressive) payload inside a batch yields NULL facts
    for that asset only — the one-bad-asset contract."""
    good = jpeg.encode_jpeg(_const_gray(3, 16, 16))
    bad = bytearray(good)
    idx = bad.find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    df = spark.createDataFrame(
        [(1, bytes(good)), (2, bytes(bad))], "asset_id bigint, payload binary"
    )
    rows = {r["asset_id"]: r for r in multimodal.decode_image_features(df).collect()}
    assert rows[1]["pixel_sum"] == int(_const_gray(3, 16, 16).sum())
    assert rows[2]["pixel_sum"] is None and rows[2]["width"] is None


# ---------------------------------------------------------------------------
# round-11 conformance fixes (ADVICE r10)
# ---------------------------------------------------------------------------


def test_12bit_declares_sof1_and_carries_no_jfif():
    """T.81 B.2.2: baseline (SOF0) is 8-bit only — 12-bit sequential
    must be SOF1 (extended); and JFIF mandates 8-bit samples, so
    12-bit streams must not carry the APP0 segment."""
    blocks = (np.arange(64, dtype=np.int64) - 32).reshape(1, 1, 8, 8)
    p12 = jpeg.encode_jpeg_from_coeffs([blocks], 8, 8, precision=12)
    assert b"\xff\xc1" in p12 and b"\xff\xc0" not in p12
    assert b"JFIF" not in p12 and b"\xff\xe0" not in p12
    meta, comps = jpeg.decode_jpeg_coefficients(p12)
    assert meta["precision"] == 12
    assert np.array_equal(comps[0], blocks)
    # 8-bit streams keep SOF0 + JFIF
    p8 = jpeg.encode_jpeg_from_coeffs([blocks], 8, 8)
    assert b"\xff\xc0" in p8 and b"JFIF" in p8


def _ref_lossless_diffs(px, sel, dri):
    """Independent H.1.1 reference, transcribed from the spec text in
    this test (NOT imported from the module): 2^(P-1) at the start of
    the scan and of each restart interval; Ra for the remainder of the
    interval's first line; Rb at the start of other lines; the
    selected predictor elsewhere."""
    h, w = px.shape
    diffs = []
    seg_start = seg_row = k = 0
    for y in range(h):
        for x in range(w):
            if dri and k and k % dri == 0:
                seg_start, seg_row = k, y
            if k == seg_start:
                pred = 128
            elif y == seg_row:
                pred = int(px[y, x - 1])
            elif x == 0:
                pred = int(px[y - 1, 0])
            else:
                ra, rb, rc = int(px[y, x - 1]), int(px[y - 1, x]), int(px[y - 1, x - 1])
                pred = {
                    1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                    5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                    7: (ra + rb) >> 1,
                }[sel]
            diffs.append(int(px[y, x]) - pred)
            k += 1
    return diffs


def _entropy_diffs(payload, n, dri):
    """Extract the Huffman-coded differences from a lossless stream
    using the module's reader primitives (decode-side plumbing only —
    the prediction logic under test is not involved)."""
    at = payload.find(b"\xff\xda")
    seglen = struct.unpack_from(">H", payload, at + 2)[0]
    rdr = jpeg._BitReader(payload, at + 2 + seglen)
    table = jpeg._decode_map(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    diffs, rst = [], 0
    for k in range(n):
        if dri and k and k % dri == 0:
            rdr.restart(rst)
            rst += 1
        t = rdr.huffman(table)
        diffs.append(jpeg._extend(rdr.receive(t), t))
    return diffs


def test_lossless_restart_first_line_uses_ra():
    """ADVICE r10: after an RSTn the REMAINDER OF THAT SAMPLE LINE
    must use one-dimensional (Ra) prediction per H.1.1 — not the
    selected predictor. The encoder's emitted differences are pinned
    against an in-test spec transcription, for every predictor and a
    restart interval that lands mid-line."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    for sel in range(1, 8):
        for dri in (3, 5, 7, 10):
            p = jpeg.encode_jpeg_lossless(px, predictor=sel, restart_interval=dri)
            got = _entropy_diffs(p, px.size, dri)
            assert got == _ref_lossless_diffs(px, sel, dri), (sel, dri)
            assert np.array_equal(jpeg.decode_jpeg(p), px), (sel, dri)


def test_lossless_category16_rejected_not_misread():
    """Table H.2: SSSS=16 carries NO appended bits (diff=32768); at
    8-bit precision it is unreachable and must be rejected loudly —
    the old code read 16 bits and desynchronized."""
    # DHT with a single 1-bit code '0' -> value 16
    dht = jpeg._seg(0xC4, jpeg._dht_payload(0, 0, [1] + [0] * 15, [16]))
    sof = jpeg._seg(0xC3, struct.pack(">BHHB", 8, 1, 1, 1) + bytes((1, 0x11, 0)))
    sos = jpeg._sos_segment([(1, 0, 0)], 1, 0, 0, 0)
    payload = b"\xff\xd8" + sof + dht + sos + b"\x7f" + b"\xff\xd9"
    with pytest.raises(ValueError, match="category 16"):
        jpeg.decode_jpeg(payload)


def test_progressive_zrl_band_overrun_rejected():
    """A ZRL in a progressive AC-first scan whose 16-zero run overruns
    [Ss, Se] is structural corruption and must raise, matching the
    sequential decoder's strictness (it used to be silently
    tolerated)."""
    dqt = jpeg._seg(0xDB, bytes([0]) + bytes(jpeg.UNIT_QTABLE))
    sof = jpeg._seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
    # DC table: code '0' -> 0 (diff category 0); AC table: '0' -> 0xF0 (ZRL)
    dht_dc = jpeg._seg(0xC4, jpeg._dht_payload(0, 0, [1] + [0] * 15, [0]))
    dht_ac = jpeg._seg(0xC4, jpeg._dht_payload(1, 0, [1] + [0] * 15, [0xF0]))
    sos_dc = jpeg._sos_segment([(1, 0, 0)], 0, 0, 0, 0) + b"\x7f"
    # AC first scan over band [1, 10]: a single ZRL puts k at 17 > 11
    sos_ac = jpeg._sos_segment([(1, 0, 0)], 1, 10, 0, 0) + b"\x7f"
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos_dc + sos_ac + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="overruns the spectral band"):
        jpeg.decode_jpeg_coefficients(payload)


def test_fill_bytes_before_markers_tolerated():
    """B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    Streams padded this way must decode to identical pixels in the
    sequential, progressive, and lossless paths."""

    def pad_markers(p):
        out = bytearray(p[:2])  # SOI itself is the magic; never padded
        i = 2
        # insert one fill byte before every marker OUTSIDE entropy data
        # (safe here: pad only the head, before the first SOS)
        first_sos = p.find(b"\xff\xda")
        while i < first_sos:
            if p[i] == 0xFF and p[i + 1] not in (0x00, 0xFF):
                out += b"\xff"
            out.append(p[i])
            i += 1
        return bytes(out) + p[first_sos:]

    px = _const_gray(7, 24, 16)
    for enc in (
        jpeg.encode_jpeg,
        jpeg.encode_jpeg_progressive,
        jpeg.encode_jpeg_lossless,
    ):
        p = pad_markers(enc(px))
        assert np.array_equal(jpeg.decode_jpeg(p), px)
