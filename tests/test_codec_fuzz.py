"""Depth-path fuzz battery for the round-9/10 codec additions
(VERDICT r9 item 6 + regression pins for the ADVICE r9 fixes).

Each case targets a SPECIFIC misread a lazy parser would make
silently: truncated Adam7 pass boundaries, a palette index exactly
equal to the PLTE length, LZW code-width overflow at table-full, WAV
chunk-length lies, and the new bounded-inflate / strict-chunk-walk
behaviors. Every expectation is a LOUD documented error class — the
one-bad-asset isolation layer (decode_image_features) depends on these
raising instead of returning garbage arrays."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bigquery_cross_environment_etl_pipeline_spark.operators import multimodal


# ---------------------------------------------------------------------------
# PNG: Adam7 + palette depth paths, bounded inflate
# ---------------------------------------------------------------------------


def _rechunk_idat(payload: bytes, new_raw: bytes) -> bytes:
    """Rebuild a single-IDAT PNG around a replacement (pre-compression)
    raw stream — keeps the header, swaps the pixel data."""
    out = bytearray()
    out += payload[:8]
    pos = 8
    wrote = False
    while pos < len(payload):
        (n,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        chunk = payload[pos : pos + 12 + n]
        pos += 12 + n
        if typ == b"IDAT":
            if not wrote:
                data = zlib.compress(new_raw)
                out += struct.pack(">I", len(data)) + b"IDAT" + data
                out += struct.pack(">I", zlib.crc32(b"IDAT" + data))
                wrote = True
            continue
        out += chunk
    return bytes(out)


def _interlaced_png(w: int = 9, h: int = 9) -> tuple[bytes, bytes]:
    """(payload, raw_stream): a valid Adam7 grayscale PNG plus its
    exact pre-compression byte stream for surgical truncation."""
    px = (np.arange(w * h, dtype=np.uint8) % 251).reshape(h, w)
    payload = multimodal.encode_png(px, "none", interlace=True)
    # reconstruct the raw stream the encoder compressed
    idat = b""
    pos = 8
    while pos < len(payload):
        (n,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + n]
        pos += 12 + n
    return payload, zlib.decompress(idat)


def test_adam7_truncated_at_each_pass_boundary():
    """Cut the raw stream exactly AT every pass boundary (and one byte
    inside): a de-interlacer that zero-fills missing passes instead of
    raising would return a plausible-looking half image."""
    payload, raw = _interlaced_png(9, 9)
    # recompute the pass sizes the same way the decoder does
    w = h = 9
    cuts = []
    pos = 0
    for x0, y0, dx, dy in multimodal._ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        pos += ph * (1 + pw)
        cuts.append(pos)
    assert cuts[-1] == len(raw)
    for cut in cuts[:-1]:  # a cut at the FINAL boundary is the valid file
        for off in (0, -1):
            bad = _rechunk_idat(payload, raw[: cut + off])
            with pytest.raises(ValueError):
                multimodal.decode_png(bad)


def test_adam7_padded_stream_rejected():
    payload, raw = _interlaced_png(9, 9)
    bad = _rechunk_idat(payload, raw + b"\x00")
    with pytest.raises(ValueError, match="IDAT truncated or padded|inflates beyond"):
        multimodal.decode_png(bad)


def test_palette_index_equal_to_plte_length_rejected():
    """Off-by-one depth path: PLTE has P entries; index P must raise,
    index P-1 must decode (both at sub-byte depth 4 and at depth 8)."""
    pal = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.uint8)  # P = 3
    for depth in (4, 8):
        ok = np.full((4, 4), 2, dtype=np.uint8)
        out = multimodal.decode_png(
            multimodal.encode_png(ok, "none", palette=pal, depth=depth)
        )
        assert np.array_equal(out, np.broadcast_to(pal[2], (4, 4, 3)))
        # encoder refuses index == P, so splice the payload: encode
        # with a 4-entry palette then truncate PLTE to 3 entries
        pal4 = np.vstack([pal, [[10, 11, 12]]]).astype(np.uint8)
        bad_img = np.full((4, 4), 3, dtype=np.uint8)
        payload = multimodal.encode_png(bad_img, "none", palette=pal4, depth=depth)
        out = bytearray()
        out += payload[:8]
        pos = 8
        while pos < len(payload):
            (n,) = struct.unpack_from(">I", payload, pos)
            typ = payload[pos + 4 : pos + 8]
            chunk = payload[pos : pos + 12 + n]
            pos += 12 + n
            if typ == b"PLTE":
                data = chunk[8 : 8 + 9]  # keep 3 entries
                out += struct.pack(">I", 9) + b"PLTE" + data
                out += struct.pack(">I", zlib.crc32(b"PLTE" + data))
            else:
                out += chunk
        with pytest.raises(ValueError, match="palette index"):
            multimodal.decode_png(bytes(out))


def test_png_truncated_adler_trailer_rejected():
    """Round-10 review regression: a zlib stream whose DATA is
    complete but whose adler32 trailer is cut off must still raise —
    the bounded decompressor checks stream END (dec.eof), not just
    overflow, preserving the integrity check the unbounded path had."""
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = multimodal.encode_png(px, "none")
    idat = b""
    pos = 8
    while pos < len(payload):
        (n,) = struct.unpack_from(">I", payload, pos)
        if payload[pos + 4 : pos + 8] == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + n]
        pos += 12 + n
    # rebuild with the original compressed bytes minus the trailer
    out = bytearray()
    out += payload[:8]
    pos = 8
    while pos < len(payload):
        (n,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        chunk = payload[pos : pos + 12 + n]
        pos += 12 + n
        if typ == b"IDAT":
            data = idat[:-4]
            out += struct.pack(">I", len(data)) + b"IDAT" + data
            out += struct.pack(">I", zlib.crc32(b"IDAT" + data))
        else:
            out += chunk
    with pytest.raises(ValueError, match="truncated|inflate failed"):
        multimodal.decode_png(bytes(out))


def test_png_inflate_beyond_declared_dimensions_rejected():
    """ADVICE r9 regression: an IDAT stream that inflates to MORE than
    the declared dimensions imply must be rejected by the bounded
    decompressor — never allocated in full."""
    px = np.zeros((4, 4), dtype=np.uint8)
    payload = multimodal.encode_png(px, "none")
    # legit raw stream is 4*(1+4)=20 bytes; substitute a 1 MiB stream
    bad = _rechunk_idat(payload, b"\x00" * (1 << 20))
    with pytest.raises(ValueError, match="inflates beyond"):
        multimodal.decode_png(bad)


# ---------------------------------------------------------------------------
# GIF: LZW code-width overflow at table-full
# ---------------------------------------------------------------------------


def _gif_with_lzw(indices, w, h, p, min_code_size, lzw_bytes) -> bytes:
    """Assemble a minimal GIF87a around hand-built LZW data."""
    pal = bytes(3 * p) if p >= 2 else bytes(6)
    depth = max((p - 1).bit_length(), 1)
    header = b"GIF87a" + struct.pack("<HH", w, h)
    header += bytes([0x80 | (depth - 1)]) + b"\x00\x00"
    header += pal + bytes(3 * ((1 << depth) - p)) if p else pal
    img = b"," + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    img += bytes([min_code_size])
    # sub-blocks
    body = b""
    i = 0
    while i < len(lzw_bytes):
        blk = lzw_bytes[i : i + 255]
        body += bytes([len(blk)]) + blk
        i += 255
    return header + img + body + b"\x00" + b";"


def test_lzw_width_sync_at_table_full_roundtrip():
    """The r9 review finding, pinned as a fuzz case: a low-entropy
    image large enough to fill the dictionary to the 12-bit cap (and
    trigger CLEAR + width resets) must round-trip exactly."""
    rng = np.random.default_rng(3)
    # 128x128 with long runs: thousands of dictionary entries
    base = np.repeat(rng.integers(0, 4, (128, 16)), 8, axis=1).astype(np.uint8)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    payload = multimodal.encode_gif(base, pal)
    out = multimodal.decode_gif(payload)
    assert np.array_equal(out, pal[base])


def test_lzw_code_beyond_table_rejected():
    """A code more than one past the current table end is corruption
    (only <next free slot> is legal as the KwKwK case); a decoder that
    clamps instead of raising fabricates pixels."""
    # min_code_size 2: clear=4, end=5, first dynamic code=6.
    # Emit: CLEAR(4), then code 7 (two past the table) — invalid.
    # widths: after clear, width=3
    bits = []
    for code, width in [(4, 3), (7, 3)]:
        bits += [(code >> i) & 1 for i in range(width)]  # LSB-first
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        by.append(b)
    payload = _gif_with_lzw(None, 2, 2, 4, 2, bytes(by))
    with pytest.raises(ValueError, match="not a root"):
        multimodal.decode_gif(payload)
    # mid-stream variant: CLEAR, root 0 (table next-free is now 6),
    # then code 7 — one PAST the only-legal KwKwK slot 6
    bits = []
    for code, width in [(4, 3), (0, 3), (7, 3)]:
        bits += [(code >> i) & 1 for i in range(width)]
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        by.append(b)
    payload = _gif_with_lzw(None, 2, 2, 4, 2, bytes(by))
    with pytest.raises(ValueError):
        multimodal.decode_gif(payload)


def test_gif_declared_pixels_exceed_data_rejected():
    """Declared 4x4 but LZW yields fewer pixels: must raise, not pad."""
    idx = np.zeros((2, 2), dtype=np.uint8)
    pal = np.arange(6, dtype=np.uint8).reshape(2, 3)
    small = multimodal.encode_gif(idx, pal)
    # lie about the dimensions in both the screen and image descriptors
    mutated = bytearray(small)
    struct.pack_into("<HH", mutated, 6, 4, 4)
    at = mutated.find(b",")
    struct.pack_into("<HHHH", mutated, at + 1, 0, 0, 4, 4)
    with pytest.raises(ValueError):
        multimodal.decode_gif(bytes(mutated))


# ---------------------------------------------------------------------------
# WAV: chunk-length lies + the ADVICE r9 strict-walk regressions
# ---------------------------------------------------------------------------


def _wav() -> bytes:
    samples = (np.arange(8, dtype=np.int32) - 4).reshape(4, 2)
    return multimodal.encode_wav(samples, 8000)


def test_wav_chunk_length_lie_overrunning_riff_rejected():
    payload = bytearray(_wav())
    at = payload.find(b"data")
    struct.pack_into("<I", payload, at + 4, 10_000)  # claims 10 kB
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(bytes(payload))


def test_wav_dangling_partial_chunk_header_rejected():
    """ADVICE r9 regression: 1-7 trailing bytes that cannot be a chunk
    header raise; a missing FINAL pad byte stays tolerated."""
    good = _wav()
    with pytest.raises(ValueError, match="trailing bytes"):
        multimodal.decode_wav(good + b"JU")
    # odd-sized trailing chunk with its pad byte omitted: tolerated
    odd_chunk = b"fake" + struct.pack("<I", 3) + b"xyz"  # no pad
    rate, arr = multimodal.decode_wav(_patch_riff_size(good + odd_chunk))
    assert rate == 8000 and arr.shape == (4, 2)


def _patch_riff_size(payload: bytes) -> bytes:
    out = bytearray(payload)
    struct.pack_into("<I", out, 4, len(payload) - 8)
    return bytes(out)


def test_wav_duplicate_fmt_and_data_rejected():
    good = _wav()
    fmt_at = good.find(b"fmt ")
    (fmt_n,) = struct.unpack_from("<I", good, fmt_at + 4)
    fmt_chunk = good[fmt_at : fmt_at + 8 + fmt_n]
    with pytest.raises(ValueError, match="duplicate fmt"):
        multimodal.decode_wav(_patch_riff_size(good + fmt_chunk))
    data_at = good.find(b"data")
    (data_n,) = struct.unpack_from("<I", good, data_at + 4)
    data_chunk = good[data_at : data_at + 8 + data_n + (data_n & 1)]
    with pytest.raises(ValueError, match="duplicate data"):
        multimodal.decode_wav(_patch_riff_size(good + data_chunk))


def test_wav_zero_rate_and_block_align_lies_rejected():
    payload = bytearray(_wav())
    at = payload.find(b"fmt ")
    struct.pack_into("<I", payload, at + 8 + 4, 0)  # sample rate = 0
    with pytest.raises(ValueError, match="zero"):
        multimodal.decode_wav(bytes(payload))
    payload = bytearray(_wav())
    struct.pack_into("<H", payload, at + 8 + 12, 7)  # block align lie
    with pytest.raises(ValueError, match="alignment"):
        multimodal.decode_wav(bytes(payload))


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law (round 11)
# ---------------------------------------------------------------------------


def test_g711_known_reference_points():
    """Pinned against the published G.711 extreme/zero code points:
    mu-law 0xFF/0x7F are the two zeros, 0x00/0x80 the +/-32124
    extremes; A-law 0x55/0xD5 are -/+8 (the quietest), 0x2A/0xAA the
    -/+32256 extremes."""

    def one(code, law):
        p = multimodal.encode_wav_g711(np.array([code]), 8000, law)
        _, s = multimodal.decode_wav(p)
        return int(s[0, 0])

    assert one(0xFF, "mu") == 0 and one(0x7F, "mu") == 0
    assert one(0x00, "mu") == -32124 and one(0x80, "mu") == 32124
    assert one(0x55, "a") == -8 and one(0xD5, "a") == 8
    assert one(0x2A, "a") == -32256 and one(0xAA, "a") == 32256


def test_g711_full_code_sweep_symmetry():
    """All 256 code points decode; each law's positive and negative
    halves mirror exactly (both laws are sign-magnitude codes)."""
    for law, sign_set_positive in (("mu", False), ("a", True)):
        p = multimodal.encode_wav_g711(np.arange(256).reshape(-1, 1), 8000, law)
        _, s = multimodal.decode_wav(p)
        vals = s[:, 0]
        if law == "mu":
            # mu-law: codes 0x00-0x7F negative half, 0x80-0xFF positive
            assert np.array_equal(-vals[:128], vals[128:])
        else:
            # A-law: toggling the sign bit (0x80) flips the sign
            flipped = np.arange(256) ^ 0x80
            assert np.array_equal(-vals, vals[flipped])


def test_g711_structural_lies_rejected():
    p = bytearray(multimodal.encode_wav_g711(np.zeros(10, dtype=int), 8000, "mu"))
    # declared bit depth must be 8 for G.711
    at = p.find(b"fmt ")
    mut = bytearray(p)
    mut[at + 8 + 14] = 16
    with pytest.raises(ValueError, match="must be 8-bit"):
        multimodal.decode_wav(bytes(mut))
    # other compressed formats stay gated
    mut = bytearray(p)
    mut[at + 8] = 2  # MS ADPCM
    with pytest.raises(NotImplementedError, match="ADPCM"):
        multimodal.decode_wav(bytes(mut))


def test_g711_encoder_validation():
    with pytest.raises(ValueError, match="bytes"):
        multimodal.encode_wav_g711(np.array([300]), 8000, "mu")
    with pytest.raises(ValueError, match="unknown G.711 law"):
        multimodal.encode_wav_g711(np.array([1]), 8000, "ulaw")
