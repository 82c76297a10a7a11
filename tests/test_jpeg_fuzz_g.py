"""Annex-G-specific JPEG hostiles (VERDICT r10 item 6): progressive
scan-script attacks, truncation sweeps, restart lies, DNL/height
mismatches, and precision-bound violations. Every case must raise
ValueError/NotImplementedError loudly — no silent misreads.

These complement tests/test_codec_fuzz.py (PNG/GIF/WAV) and the
structural hostiles already in tests/test_jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import jpeg


def _gray(w=24, h=24, seed=3):
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    return ((3 * seed + 5 * bx[None, :] + 11 * by[:, None]) % 256).astype(np.uint8)


def _sos_positions(p: bytes) -> list[int]:
    out, i = [], 2
    while True:
        i = p.find(b"\xff\xda", i)
        if i < 0:
            return out
        out.append(i)
        i += 2


# ---------------------------------------------------------------------------
# truncation sweeps — mid-scan, EOBn boundaries included
# ---------------------------------------------------------------------------


def test_progressive_truncation_sweep_never_silent():
    """Cut a progressive stream at every 7th byte position inside the
    scan region: every cut must raise (missing scans, dead entropy
    readers, absent EOI), never fabricate coefficients. Block-constant
    content makes the AC scans almost pure EOBn runs, so many cuts
    land exactly on end-of-band boundaries — the r10 ask."""
    p = jpeg.encode_jpeg_progressive(_gray())
    first_sos = _sos_positions(p)[0]
    for cut in range(first_sos + 3, len(p) - 1, 7):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg_coefficients(p[:cut])


def test_sequential_truncation_sweep_never_silent():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    p = jpeg.encode_jpeg(px)
    first_sos = _sos_positions(p)[0]
    for cut in range(first_sos + 3, len(p) - 1, 5):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg_coefficients(p[:cut])


# ---------------------------------------------------------------------------
# successive-approximation scan-script attacks
# ---------------------------------------------------------------------------


def _patch_sos_approx(p: bytes, sos_index: int, a_byte: int) -> bytes:
    """Overwrite the Ah/Al byte of the sos_index-th SOS header."""
    at = _sos_positions(p)[sos_index]
    seglen = struct.unpack_from(">H", p, at + 2)[0]
    mut = bytearray(p)
    mut[at + 2 + seglen - 1] = a_byte
    return bytes(mut)


def test_refinement_skipping_a_bit_plane_rejected():
    """The six-phase script's DC refinement carries Ah=1, Al=0; a
    stream claiming Ah=2 (skipping plane 1) must be rejected, not
    OR'd into the wrong bit."""
    p = jpeg.encode_jpeg_progressive(_gray())
    # scan 3 (0-indexed) is the DC refinement in the six-phase script
    mut = _patch_sos_approx(p, 3, 0x21)  # Ah=2, Al=1
    with pytest.raises(ValueError, match="skips a bit plane"):
        jpeg.decode_jpeg_coefficients(mut)


def test_refinement_not_reducing_one_bit_rejected():
    p = jpeg.encode_jpeg_progressive(_gray())
    mut = _patch_sos_approx(p, 3, 0x11)  # Ah=1, Al=1: no reduction
    with pytest.raises(ValueError, match="reduce the point transform"):
        jpeg.decode_jpeg_coefficients(mut)


def test_overlapping_first_scans_rejected():
    """Shift the second AC first scan's band start from 6 to 5: zigzag
    coefficient 5 would be first-scanned twice."""
    p = jpeg.encode_jpeg_progressive(_gray())
    at = _sos_positions(p)[2]  # AC first scan over [6, 63]
    seglen = struct.unpack_from(">H", p, at + 2)[0]
    mut = bytearray(p)
    assert mut[at + 2 + seglen - 3] == 6  # Ss
    mut[at + 2 + seglen - 3] = 5
    with pytest.raises(ValueError, match="first-scanned twice"):
        jpeg.decode_jpeg_coefficients(bytes(mut))


def test_refinement_of_never_scanned_band_rejected():
    """Hand-built script: DC first, then an AC REFINEMENT with no AC
    first scan ever having covered the band."""
    dqt = jpeg._seg(0xDB, bytes([0]) + bytes(jpeg.UNIT_QTABLE))
    sof = jpeg._seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
    dht_dc = jpeg._seg(0xC4, jpeg._dht_payload(0, 0, [1] + [0] * 15, [0]))
    dht_ac = jpeg._seg(0xC4, jpeg._dht_payload(1, 0, [1] + [0] * 15, [0]))
    sos_dc = jpeg._sos_segment([(1, 0, 0)], 0, 0, 0, 0) + b"\x7f"
    sos_ref = jpeg._sos_segment([(1, 0, 0)], 1, 10, 1, 0) + b"\x7f"
    payload = (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos_dc + sos_ref + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="never-first-scanned"):
        jpeg.decode_jpeg_coefficients(payload)


def test_valid_scripts_still_pass_the_bookkeeping():
    """The bookkeeping must not reject legal scripts: the standard
    six-phase script AND the single-scan-relabeled corner cases from
    the existing suite keep decoding."""
    px = _gray()
    for enc in (jpeg.encode_jpeg, jpeg.encode_jpeg_progressive):
        assert np.array_equal(jpeg.decode_jpeg(enc(px)), px)


# ---------------------------------------------------------------------------
# restart lies (progressive path)
# ---------------------------------------------------------------------------


def test_progressive_wrong_restart_index_rejected():
    p = bytearray(jpeg.encode_jpeg_progressive(_gray(40, 40), restart_interval=2))
    at = p.find(b"\xff\xd0")
    assert at > 0
    p[at + 1] = 0xD4
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_coefficients(bytes(p))


def test_missing_restart_marker_rejected():
    """DRI declares an interval but the encoder (here: a mutator)
    removed the marker — the decoder must not free-run across the
    boundary."""
    p = bytearray(jpeg.encode_jpeg(_gray(40, 40), restart_interval=2))
    at = p.find(b"\xff\xd0")
    assert at > 0
    del p[at : at + 2]
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_coefficients(bytes(p))


# ---------------------------------------------------------------------------
# DNL / declared-height mismatches
# ---------------------------------------------------------------------------


def test_overdeclared_height_exhausts_entropy_loudly():
    """SOF claims 4x the real height: the scan runs out of entropy
    data and must raise, never zero-fill the missing MCU rows."""
    p = bytearray(jpeg.encode_jpeg(_gray(16, 16)))
    at = p.find(b"\xff\xc0")
    h = struct.unpack_from(">H", p, at + 5)[0]
    struct.pack_into(">H", p, at + 5, h * 4)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_coefficients(bytes(p))


def test_dnl_segment_is_a_loud_gate():
    """Height-0 frames resolved by a DNL (0xDC) segment are a
    declared unsupported corner: both the zero height and the DNL
    marker itself refuse loudly."""
    p = bytearray(jpeg.encode_jpeg(_gray(16, 16)))
    at = p.find(b"\xff\xc0")
    struct.pack_into(">H", p, at + 5, 0)  # height 0 -> DNL territory
    with pytest.raises(ValueError, match="dimensions must be positive"):
        jpeg.decode_jpeg_coefficients(bytes(p))
    # a stray DNL segment in an otherwise-valid stream: loud, not skipped
    q = bytearray(jpeg.encode_jpeg(_gray(16, 16)))
    sos = q.find(b"\xff\xda")
    dnl = jpeg._seg(0xDC, struct.pack(">H", 16))
    q[sos:sos] = dnl
    with pytest.raises(ValueError, match="0xFFDC"):
        jpeg.decode_jpeg_coefficients(bytes(q))


# ---------------------------------------------------------------------------
# precision-bound violations (12-bit content relabeled 8-bit)
# ---------------------------------------------------------------------------


def test_12bit_stream_relabeled_8bit_rejected():
    """A 12-bit stream's entropy data codes DC categories beyond 11;
    relabeling the SOF as 8-bit must fail on the Table F.1 bound, not
    silently mis-scale samples."""
    px = np.full((8, 8), 4000, dtype=np.uint16)  # DC 15616 -> category 14
    p = bytearray(jpeg.encode_jpeg(px))
    at = p.find(b"\xff\xc1")
    assert at > 0
    p[at + 1] = 0xC0  # SOF1 -> SOF0
    p[at + 4] = 8  # precision byte
    with pytest.raises(ValueError, match="exceeds the precision's bound"):
        jpeg.decode_jpeg_coefficients(bytes(p))


def test_8bit_oversized_ac_size_rejected():
    """An 8-bit DHT carrying an AC symbol with size 11 (legal only at
    12-bit) must be refused when the scan actually emits it."""
    blocks = np.zeros((1, 1, 8, 8), dtype=np.int64)
    blocks[0, 0, 0, 1] = 1500  # AC magnitude -> size 11
    with pytest.raises(ValueError):
        # the 8-bit Annex K table cannot express size 11; the encoder
        # itself refuses — which IS the loud path
        jpeg.encode_jpeg_from_coeffs([blocks], 8, 8)
