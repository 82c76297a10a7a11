"""FLAC codec tests (operators/flac.py, round 11).

Same three-layer strategy as the JPEG suites: exact round trips
(lossless — ANY content must survive), hand-built streams for decode
paths the encoder never emits (LPC subframes, rice escapes, rice2
method, wasted bits), and hostile payloads pinning every declared
error class (CRC lies, MD5 lies, truncation, reserved code points).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import flac


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------


def test_roundtrip_random_all_depths_and_modes():
    rng = np.random.default_rng(3)
    for trial in range(16):
        n = int(rng.integers(1, 700))
        ch = int(rng.integers(1, 3))
        bits = (8, 16, 24)[trial % 3]
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        s = rng.integers(lo, hi + 1, (n, ch))
        mode = ("auto", "indep", "left", "right", "mid")[trial % 5]
        if ch != 2:
            mode = "auto"
        bsz = (16, 192, 4096, 100)[trial % 4]
        p = flac.encode_flac(
            s, 8000 + trial, bits=bits, blocksize=bsz, stereo_mode=mode
        )
        rate, out = flac.decode_flac(p)
        assert rate == 8000 + trial
        assert np.array_equal(out, s), (trial, mode, bits)


def test_roundtrip_predictable_content_compresses():
    """Linear/smooth content lands in the fixed predictors and must
    both round-trip exactly and beat raw PCM by a wide margin."""
    i = np.arange(5000)
    s = (1000 * np.sin(i / 50)).astype(np.int64).reshape(-1, 1)
    p = flac.encode_flac(s, 44100)
    assert len(p) < 2 * 5000 / 4
    rate, out = flac.decode_flac(p)
    assert np.array_equal(out, s)


def test_roundtrip_constant_and_multichannel():
    s = np.full((333, 4), -17)
    p = flac.encode_flac(s, 48000)
    _, out = flac.decode_flac(p)
    assert np.array_equal(out, s)


def test_frame_number_coded_number_boundaries():
    """Many short frames push the frame number through the multi-byte
    UTF-8-style coded-number encoder."""
    rng = np.random.default_rng(5)
    s = rng.integers(-100, 100, (16 * 200, 1))
    p = flac.encode_flac(s, 32000, blocksize=16)  # 200 frames
    _, out = flac.decode_flac(p)
    assert np.array_equal(out, s)


# ---------------------------------------------------------------------------
# hand-built streams: decode paths the encoder never writes
# ---------------------------------------------------------------------------


def _handmade_stream(subframe_bits, samples, bits=16, rate=8000):
    """Assemble fLaC + STREAMINFO + ONE mono frame whose subframe body
    is supplied by the caller (a _BitsW-filling function)."""
    n = len(samples)
    body = flac._BitsW()
    body.write(n, 16)
    body.write(n, 16)
    body.write(0, 24)
    body.write(0, 24)
    body.write(rate, 20)
    body.write(0, 3)  # 1 channel
    body.write(bits - 1, 5)
    body.write(n, 36)
    arr = np.asarray(samples, dtype=np.int64)[:, None]
    info = bytes(body.out) + hashlib.md5(flac._pcm_bytes(arr, bits)).digest()
    out = bytearray(b"fLaC") + bytes((0x80, 0, 0, len(info))) + info

    w = flac._BitsW()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)  # blocksize: 16-bit at end of header
    w.write(13, 4)  # rate: 16-bit Hz
    w.write(0, 4)  # 1 channel, independent
    w.write(flac._DEPTH_CODES[bits], 3)
    w.write(0, 1)
    flac._write_coded_number(w, 0)
    w.write(n - 1, 16)
    w.write(rate, 16)
    w.align()
    header = bytes(w.out)
    header += bytes([flac.crc8(header)])
    sub = flac._BitsW()
    subframe_bits(sub)
    sub.align()
    frame = header + bytes(sub.out)
    frame += struct.pack(">H", flac.crc16(frame))
    return bytes(out + frame)


def test_lpc_subframe_decodes():
    """Order-2 LPC with coefficients [2, -1] at shift 0 is the fixed-2
    predictor spelled as LPC — residuals computed here from the spec
    formula, decoded by the generic LPC path."""
    sig = [10, 13, 19, 22, 31, 29, 40, 44, 38, 50]
    order, coefs, shift, prec = 2, [2, -1], 0, 5

    def body(w):
        w.write(0, 1)
        w.write(0x20 | (order - 1), 6)  # LPC order 2
        w.write(0, 1)  # no wasted bits
        for v in sig[:order]:
            w.write_signed(v, 16)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        w.write(0, 2)  # rice method 0
        w.write(0, 4)  # partition order 0
        w.write(3, 4)  # rice param
        for i in range(order, len(sig)):
            pred = (coefs[0] * sig[i - 1] + coefs[1] * sig[i - 2]) >> shift
            r = sig[i] - pred
            zz = (r << 1) if r >= 0 else ((-r << 1) - 1)
            w.unary(zz >> 3)
            w.write(zz & 7, 3)

    rate, out = flac.decode_flac(_handmade_stream(body, sig))
    assert rate == 8000
    assert out[:, 0].tolist() == sig


def test_rice2_method_and_escape_partition_decode():
    """Residual method 1 (5-bit params) with an ESCAPED partition
    (raw 7-bit residuals) — spec-legal, never written by our
    encoder."""
    sig = [5, 5, 9, 1, -3, 60, -60, 17]

    def body(w):
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0 (residual = signal)
        w.write(0, 1)
        w.write(1, 2)  # rice2
        w.write(0, 4)  # partition order 0
        w.write(31, 5)  # escape
        w.write(7, 5)  # 7 raw bits per residual
        for v in sig:
            w.write_signed(v, 7)

    _, out = flac.decode_flac(_handmade_stream(body, sig))
    assert out[:, 0].tolist() == sig


def test_wasted_bits_decode():
    """A subframe declaring 2 wasted bits codes sample >> 2 and the
    decoder restores the shift."""
    sig = [4 * v for v in (3, -5, 12, 0, 7, -1)]

    def body(w):
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(1, 1)  # wasted-bits flag
        w.unary(1)  # unary 1 -> wasted = 2
        for v in sig:
            w.write_signed(v >> 2, 14)

    _, out = flac.decode_flac(_handmade_stream(body, sig))
    assert out[:, 0].tolist() == sig


# ---------------------------------------------------------------------------
# hostiles
# ---------------------------------------------------------------------------


def _valid():
    rng = np.random.default_rng(11)
    return flac.encode_flac(rng.integers(-3000, 3000, (300, 2)), 22050)


def test_not_flac():
    with pytest.raises(ValueError, match="fLaC"):
        flac.decode_flac(b"RIFFxxxx")


def test_header_crc8_lie_detected():
    p = bytearray(_valid())
    # frame starts right after the 4+4+34 byte metadata
    frame = 4 + 4 + 34
    assert p[frame] == 0xFF
    p[frame + 4] ^= 0x01  # flip a header bit -> CRC-8 must catch it
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(p))


def test_frame_crc16_lie_detected():
    p = bytearray(_valid())
    p[-1] ^= 0xFF  # last byte of the final frame's CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        flac.decode_flac(bytes(p))


def test_md5_signature_lie_detected():
    p = bytearray(_valid())
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34
    p[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        flac.decode_flac(bytes(p))


def test_truncation_sweep_never_silent():
    p = _valid()
    for cut in range(4, len(p) - 1, 11):
        with pytest.raises((ValueError, NotImplementedError)):
            flac.decode_flac(p[:cut])


def test_reserved_code_points_rejected():
    sig = [1, 2, 3, 4]

    def reserved_subframe(w):
        w.write(0, 1)
        w.write(2, 6)  # reserved subframe type
        w.write(0, 1)

    with pytest.raises(ValueError, match="reserved FLAC subframe"):
        flac.decode_flac(_handmade_stream(reserved_subframe, sig))

    def bad_method(w):
        w.write(0, 1)
        w.write(8, 6)
        w.write(0, 1)
        w.write(2, 2)  # reserved residual method

    with pytest.raises(ValueError, match="residual method"):
        flac.decode_flac(_handmade_stream(bad_method, sig))


def test_depth_gates():
    # a stream whose STREAMINFO declares 12-bit samples: loud gate
    p = _handmade_stream(lambda w: None, [1, 2], bits=12)
    with pytest.raises(NotImplementedError, match="12-bit"):
        flac.decode_flac(p)
    with pytest.raises(NotImplementedError):
        flac.encode_flac(np.zeros((4, 1), dtype=np.int64), 8000, bits=12)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="range"):
        flac.encode_flac(np.full((4, 1), 40000), 8000, bits=16)
    with pytest.raises(ValueError, match="blocksize"):
        flac.encode_flac(np.zeros((4, 1), dtype=np.int64), 8000, blocksize=8)
    with pytest.raises(ValueError, match="20 bits"):
        flac.encode_flac(np.zeros((4, 1), dtype=np.int64), 1 << 21)
