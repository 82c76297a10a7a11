"""Arithmetic-coded JPEG tests (operators/jpeg_arith.py, round 11).

Layered like the Huffman JPEG suite:

1. **QM coder bit layer**: exact round trips of random decision
   sequences through adversarial carry/stuffing patterns, and a
   compression-vs-entropy sanity bound (the probability-estimation
   ladder actually adapting).
2. **Stream layer**: coefficient and pixel round trips for SOF9
   (sequential) and SOF10 (progressive), gray + 4:4:4 + 4:2:0, with
   and without restart markers; arithmetic output is checked EQUAL to
   the Huffman codec's decode of the same input, so the two entropy
   layers vouch for each other above the shared transform stack.
3. **Hostiles**: DAC validation, truncation, restart-marker lies, and
   the still-gated processes.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import jpeg, jpeg_arith


# ---------------------------------------------------------------------------
# 1. QM coder bit layer
# ---------------------------------------------------------------------------


def _roundtrip_bits(bits, nbins=4):
    enc = jpeg_arith.ArithEncoder()
    st = bytearray(nbins)
    for b, ctx in bits:
        enc.encode(st, ctx, b)
    data = enc.flush() + b"\xff\xd9"
    dec = jpeg_arith.ArithDecoder(data, 0)
    st2 = bytearray(nbins)
    return [(dec.decode(st2, ctx), ctx) for _, ctx in bits], data


def test_qm_random_decision_roundtrips():
    rng = random.Random(42)
    for _ in range(60):
        n = rng.randrange(1, 3000)
        bits = [(rng.getrandbits(1), rng.randrange(4)) for _ in range(n)]
        out, _ = _roundtrip_bits(bits)
        assert out == bits


def test_qm_adversarial_carry_patterns():
    """Long MPS runs stack 0xFF bytes awaiting carries; LPS storms
    force renormalization cascades; skewed tails exercise the D.1.8
    trailing-zero drop + decoder zero-feed."""
    for pattern in (
        [0] * 8000,
        [1] * 8000,
        [0, 1] * 4000,
        [1, 1, 1, 0] * 2000,
        [0] * 4000 + [1] + [0] * 3999,
    ):
        bits = [(b, 0) for b in pattern]
        out, data = _roundtrip_bits(bits, 1)
        assert out == bits
        # stuffing invariant: every data 0xFF is followed by 0x00
        body = data[:-2]
        for i, b in enumerate(body[:-1]):
            if b == 0xFF:
                assert body[i + 1] == 0x00, data.hex()


def test_qm_compression_approaches_entropy():
    rng = random.Random(7)
    n = 60000
    for p in (0.02, 0.1, 0.35):
        bits = [(1 if rng.random() < p else 0, 0) for _ in range(n)]
        out, data = _roundtrip_bits(bits, 1)
        assert out == bits
        h = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
        bound = n * h / 8
        # QM is within ~10% of entropy once the ladder settles
        assert len(data) - 2 < bound * 1.15 + 64, (p, len(data), bound)


def test_qm_state_table_shape():
    """Structural invariants of Table D.3: transitions stay in range,
    switch flags appear exactly on the ~equiprobable states, the
    fast-attack chain from state 0 exists, and the fixed bin is a
    self-loop."""
    t = jpeg_arith._QM_TABLE
    assert len(t) == 114
    for qe, nm, nl, sw in t:
        assert 0 < qe <= 0x5B12
        assert 0 <= nm < 114 and 0 <= nl < 114
        assert sw in (0, 1)
    switches = [i for i, (_, _, _, sw) in enumerate(t) if sw]
    assert switches == [0, 14, 36, 64, 80, 88, 95, 105, 110, 112]
    assert t[113][1] == 113 and t[113][2] == 113
    # MPS chain from 0 walks the fast-attack Qe halving ladder
    assert [t[i][0] for i in (0, 1, 2, 3)] == [0x5A1D, 0x2586, 0x1114, 0x080B]


# ---------------------------------------------------------------------------
# 2. stream layer
# ---------------------------------------------------------------------------


def _sparse_blocks(rng, by, bx, lo=-200, hi=200, density=0.15):
    blocks = rng.integers(lo, hi + 1, (by, bx, 8, 8)).astype(np.int64)
    blocks[rng.random((by, bx, 8, 8)) >= density] = 0
    return blocks


def test_sequential_coeff_roundtrip_gray():
    rng = np.random.default_rng(3)
    for rst in (0, 1, 3):
        blocks = _sparse_blocks(rng, 3, 4)
        p = jpeg_arith.encode_jpeg_arithmetic_from_coeffs(
            [blocks], 32, 24, restart_interval=rst
        )
        assert b"\xff\xc9" in p and b"\xff\xcc" in p and b"\xff\xc4" not in p
        meta, comps = jpeg.decode_jpeg_coefficients(p)
        assert not meta["progressive"]
        assert np.array_equal(comps[0], blocks), rst


def test_sequential_coeff_roundtrip_color_interleaved():
    rng = np.random.default_rng(5)
    comps = [_sparse_blocks(rng, 2, 3) for _ in range(3)]
    p = jpeg_arith.encode_jpeg_arithmetic_from_coeffs(
        comps, 24, 16, [(1, 1)] * 3, restart_interval=2
    )
    _, out = jpeg.decode_jpeg_coefficients(p)
    for a, b in zip(out, comps):
        assert np.array_equal(a, b)


def test_progressive_coeff_roundtrip():
    rng = np.random.default_rng(11)
    for rst in (0, 2):
        blocks = _sparse_blocks(rng, 2, 2, density=0.25)
        p = jpeg_arith.encode_jpeg_arithmetic_progressive_from_coeffs(
            [blocks], 16, 16, restart_interval=rst
        )
        assert b"\xff\xca" in p
        meta, comps = jpeg.decode_jpeg_coefficients(p)
        assert meta["progressive"]
        assert np.array_equal(comps[0], blocks), rst


def test_pixels_match_huffman_codec():
    """The two entropy layers sit over the same transform stack, so
    decoding an arithmetic stream and a Huffman stream of the SAME
    pixels must give identical output — gray, 4:4:4, 4:2:0, restarts,
    sequential AND progressive."""
    rng = np.random.default_rng(17)
    for mode, sub in [(0, None), (1, "4:4:4"), (2, "4:2:0")]:
        shape = (21, 19) if mode == 0 else (21, 19, 3)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        kw = {} if mode == 0 else {"subsampling": sub}
        for rst in (0, 2):
            ph = jpeg.encode_jpeg(px, restart_interval=rst, **kw)
            pa = jpeg_arith.encode_jpeg_arithmetic(px, restart_interval=rst, **kw)
            assert np.array_equal(jpeg.decode_jpeg(pa), jpeg.decode_jpeg(ph))


def test_block_constant_pixels_exact():
    """The driver oracle's exactness contract carries over verbatim:
    block-constant input -> DC-only blocks -> bit-exact decode."""
    bx = np.arange(24) // 8
    by = np.arange(16) // 8
    px = ((7 + 5 * bx[None, :] + 11 * by[:, None]) % 256).astype(np.uint8)
    p = jpeg_arith.encode_jpeg_arithmetic(px)
    assert np.array_equal(jpeg.decode_jpeg(p), px)


def test_arithmetic_beats_huffman_on_real_content():
    """Not a proof of conformance, but a strong signal the model is
    the real Annex F one: the QM coder's ~10-30% size win over the
    Annex K Huffman tables is the published result."""
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    pa = jpeg_arith.encode_jpeg_arithmetic(px)
    ph = jpeg.encode_jpeg(px)
    assert len(pa) < len(ph)


def test_decode_image_dispatches_sof9():
    from bigquery_cross_environment_etl_pipeline_spark.operators import multimodal

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = jpeg_arith.encode_jpeg_arithmetic(px)
    # block-varying content is lossy; same decode as the codec's own
    assert np.array_equal(multimodal.decode_image(p), jpeg.decode_jpeg(p))


# ---------------------------------------------------------------------------
# 3. hostiles
# ---------------------------------------------------------------------------


def _valid_arith_gray():
    px = ((np.arange(16)[:, None] // 8 * 3 + 7) % 256 * np.ones(16)[None, :]).astype(
        np.uint8
    )
    return jpeg_arith.encode_jpeg_arithmetic(px, restart_interval=0)


def test_dac_validation():
    p = bytearray(_valid_arith_gray())
    at = p.find(b"\xff\xcc")
    assert at > 0
    # DC conditioning with L > U
    mut = bytearray(p)
    mut[at + 5] = 0x2F  # U=2, L=15
    with pytest.raises(ValueError, match="L=15 > U=2"):
        jpeg.decode_jpeg_coefficients(bytes(mut))
    # AC Kx = 0 out of range
    mut = bytearray(p)
    mut[at + 7] = 0
    with pytest.raises(ValueError, match="Kx=0"):
        jpeg.decode_jpeg_coefficients(bytes(mut))
    # bad table class
    mut = bytearray(p)
    mut[at + 4] = 0x20
    with pytest.raises(ValueError, match="table class 2"):
        jpeg.decode_jpeg_coefficients(bytes(mut))


def test_truncated_arith_stream_raises():
    p = _valid_arith_gray()
    # cut inside the entropy data, before EOI: the scan's trailing
    # marker hunt must fail loudly, not fabricate pixels
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_coefficients(p[: len(p) - 4])


def test_wrong_restart_marker_rejected():
    rng = np.random.default_rng(29)
    px = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    p = bytearray(jpeg_arith.encode_jpeg_arithmetic(px, restart_interval=2))
    at = p.find(b"\xff\xd0")
    assert at > 0
    p[at + 1] = 0xD5  # lie about the restart index
    with pytest.raises(ValueError, match="expected RST0"):
        jpeg.decode_jpeg_coefficients(bytes(p))


def test_sof11_and_differential_still_gated():
    p = bytearray(_valid_arith_gray())
    at = p.find(b"\xff\xc9")
    for marker in (0xCB, 0xCD, 0xCE, 0xCF):
        mut = bytearray(p)
        mut[at + 1] = marker
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg_coefficients(bytes(mut))


def test_12bit_arithmetic_gated_at_encoder():
    px = np.zeros((8, 8), dtype=np.uint16)
    with pytest.raises(NotImplementedError, match="12-bit arithmetic"):
        jpeg_arith.encode_jpeg_arithmetic(px)
