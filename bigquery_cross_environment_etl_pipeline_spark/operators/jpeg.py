r"""Baseline JPEG (ITU-T T.81) codec in pure stdlib + numpy.

Round 10 closes the last closable codec gate (VERDICT r9 item 1): the
claim "JPEG needs an image library" was only ever true of a LIBRARY'S
speed, not of the format — baseline sequential JFIF is Huffman coding
(a dictionary-free prefix code, same discipline as round 9's LZW) +
dequantization + an 8x8 inverse DCT (one numpy einsum) + an affine
YCbCr->RGB transform. All four are implemented here from the public
spec, the same way ``decode_png`` implements DEFLATE-over-filters via
stdlib zlib + numpy:

- **Entropy layer**: canonical Huffman tables are read FROM THE FILE's
  DHT segments (never assumed), decoded bit-by-bit with 0xFF00 byte
  unstuffing and RSTn restart-marker resynchronization; DC coefficients
  are differentially predicted per component, AC coefficients
  run-length decoded in zigzag order with EOB/ZRL semantics.
- **Transform layer**: dequantize (per-table, read from DQT), then the
  orthonormal 8x8 IDCT as ``M.T @ F @ M`` vectorized over all blocks
  of a component in one einsum; level-shift +128; round half-up
  (``floor(x+0.5)`` — chosen over banker's rounding because the DuckDB
  oracle can state it exactly as ``FLOOR(x+0.5)``); clip to [0,255].
- **Color layer**: chroma planes upsample by sample replication to the
  luma grid, then the JFIF YCbCr->RGB affine transform with the same
  deterministic rounding. 3-component scans are treated as YCbCr per
  JFIF; grayscale returns the Y plane directly.

The encoder (``encode_jpeg`` over pixels, ``encode_jpeg_from_coeffs``
over chosen quantized coefficients) writes spec-complete baseline
streams — SOI/APP0/DQT/SOF0/DHT/DRI/SOS/EOI with the public Annex K
Huffman tables — so round-trip tests and the arithmetic driver oracles
never need an external library or fixture file.

Exactness contract the driver queries exploit: a block whose samples
are CONSTANT has one nonzero coefficient (the DC, ``8*(v-128)``, an
exact integer), so with unit quantization tables the decode is
bit-exact END TO END — float IDCT of a DC-only block multiplies an
integer by powers of two — and the DuckDB oracle can recompute every
decoded pixel arithmetically, including the YCbCr round-trip, without
ever seeing a JPEG byte. The AC/zigzag/run-length path is pinned by a
second query over ``encode_jpeg_from_coeffs`` payloads whose
dequantized-coefficient checksum is an integer formula.

PROGRESSIVE (SOF2) decodes for real too (round 10, second wave): the
full Annex G Huffman procedures — interleaved/per-component DC scans
with successive approximation (first pass point-transformed by Al,
refinement bits OR'd into two's-complement magnitudes),
single-component AC scans over spectral bands [Ss, Se] with EOBn
end-of-band runs, and the G.1.2.3 refinement walk where correction
bits for previously-nonzero coefficients interleave with newly-born
+/-1 coefficients. ``encode_jpeg_progressive`` emits a six-phase scan
script (DC first -> split-band AC firsts -> DC refine -> AC refines)
whose decoded coefficients are bit-identical to the sequential
encoding's, so every exactness argument carries over.

Beyond baseline (all implemented here or in sibling modules, rounds
10-11): PROGRESSIVE SOF2 (Annex G scan scripts, below), 12-bit
extended precision (SOF1), LOSSLESS SOF3 (Annex H prediction, all
seven predictors), and ARITHMETIC coding SOF9/SOF10 (the Annex D QM
coder + Annex F statistical models, ``operators/jpeg_arith.py``).

Declared gates that REMAIN (and why): hierarchical/differential
processes (SOF5-7/13-15 — the multi-frame pyramid protocol),
arithmetic LOSSLESS (SOF11), 12-bit COLOR (non-JFIF: no standard
12-bit color transform), and CMYK/Adobe 4-component color — each
raises ``NotImplementedError`` loudly. WebP and all video codecs stay
library-bound (VP8 is a genuinely different arithmetic coder).

Reference parity note: the reference pipeline
(pulse_billing_etl_service) moves media-free billing rows and has no
codec surface; this module is north-star training-data-pipeline
capability (multimodal ingest at 100 TB), per the build brief.

Scale: both codec directions run inside Arrow ``mapInPandas`` stages —
embarrassingly parallel, zero shuffle, payloads decode where they are
read. Per-asset cost is bounded by the declared dimensions BEFORE any
allocation (the same hostile-payload discipline ADVICE r9 asked of
PNG/GIF).
"""

from __future__ import annotations

import functools
import struct

# ---------------------------------------------------------------------------
# tables (public: ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    """Zigzag scan order, generated (not transcribed — no typo risk):
    index i -> (row, col) of the i-th coefficient in an 8x8 block."""
    order = []
    r = c = 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag()

#: Annex K.3 "typical" Huffman tables as (bits[1..16], values) — the
#: encoder writes these into DHT; the decoder always reads tables from
#: the file, so these constants are never load-bearing for decode.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: unit quantization table — the "exactness" default the driver
#: queries use: DC-only blocks round-trip bit-exactly (see module doc)
UNIT_QTABLE = [1] * 64


def _ext12_tables() -> tuple[tuple[list[int], list[int]], tuple[list[int], list[int]]]:
    """Huffman tables for 12-bit precision. Annex K's tables stop at
    DC category 11 / AC size 10, but 12-bit samples level-shift around
    2048, putting DC differences up to +/-32760 (category 15) and AC
    magnitudes up to size 14 (T.81 tables F.1/F.2). As with the
    progressive table, a fixed canonical layout is spec-valid — the
    decoder always reads DHT."""
    dc_bits = [0] * 16
    dc_bits[4] = 16  # categories 0..15 at length 5 (space 32)
    dc_vals = list(range(16))
    ac_vals = [0x00, 0xF0]
    ac_vals += [r << 4 | s for r in range(16) for s in range(1, 15)]
    ac_bits = [0] * 16
    ac_bits[7] = 100  # 226 symbols at lengths 8/9 (100 + 126 <= space)
    ac_bits[8] = 126
    return (dc_bits, dc_vals), (ac_bits, ac_vals)


(DC12_BITS, DC12_VALS), (AC12_BITS, AC12_VALS) = _ext12_tables()


# ---------------------------------------------------------------------------
# canonical Huffman codes
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction of
    T.81 Annex C (codes assigned in value order, length-major)."""
    if len(bits) != 16 or sum(bits) != len(vals):
        raise ValueError("Huffman BITS/HUFFVAL length mismatch")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("Huffman table overflows its code space")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _DecodeTable:
    """Huffman decode table with an 8-bit-prefix fast path: ``fast``
    maps every byte whose leading bits form a code of length <= 8 to
    (symbol, length); longer codes fall back to the (length, code)
    walk. Same decoded symbols either way — the fast path exists
    because the per-bit walk dominates the pure-Python decode cost."""

    __slots__ = ("fast", "slow")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        codes = _canonical_codes(bits, vals)
        self.slow = {(ln, c): s for s, (c, ln) in codes.items()}
        self.fast: list = [None] * 256
        for s, (c, ln) in codes.items():
            if ln <= 8:
                base = c << (8 - ln)
                for i in range(1 << (8 - ln)):
                    self.fast[base | i] = (s, ln)


def _decode_map(bits: list[int], vals: list[int]) -> _DecodeTable:
    """Build the decode table the bit-reader consumes.

    Memoized on the raw (BITS, HUFFVAL) bytes: decoders in a corpus
    query rebuild the identical Annex-K tables for every asset (the
    DHT segments are read from each stream, but their content repeats),
    and table construction measured ~30 % of small-image decode CPU.
    The table is immutable after construction, so sharing is safe."""
    return _decode_map_cached(bytes(bits), bytes(vals))


@functools.lru_cache(maxsize=256)
def _decode_map_cached(bits: bytes, vals: bytes) -> _DecodeTable:
    return _DecodeTable(list(bits), list(vals))


# ---------------------------------------------------------------------------
# bit-level IO (entropy-coded segment framing)
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (an emitted
    0xFF is followed by 0x00) and 1-padding on flush (F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)

    def restart(self, idx: int) -> None:
        """Flush to a byte boundary and emit RST(idx % 8)."""
        self.flush()
        self.out += bytes((0xFF, 0xD0 + (idx & 7)))


class _BitReader:
    """MSB-first reader over the entropy-coded segment: unstuffs
    0xFF00, stops (loudly) at any real marker, resynchronizes at RSTn
    when the MCU loop calls ``restart``. Bits buffer in an unbounded
    int accumulator; ``_fill_soft`` pre-buffers without raising so the
    Huffman fast path can peek a whole byte."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fetch(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream ends mid-marker")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal 0xFF
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data "
                    "(truncated scan or wrong dimensions)"
                )
        self._acc = (self._acc << 8) | b
        self._n += 8

    def _fill_soft(self, need: int) -> None:
        """Buffer up to ``need`` bits, stopping SILENTLY at stream end
        or a marker — consumers that then run short raise through the
        strict ``_fetch`` path with the precise error."""
        data, pos, n = self.data, self.pos, self._n
        end = len(data)
        acc = self._acc
        while n < need and pos < end:
            b = data[pos]
            if b == 0xFF:
                if pos + 1 >= end or data[pos + 1] != 0x00:
                    break  # marker (or truncation): strict path reports
                pos += 2
            else:
                pos += 1
            acc = (acc << 8) | b
            n += 8
        self.data, self.pos, self._n, self._acc = data, pos, n, acc

    def read_bit(self) -> int:
        if self._n == 0:
            self._fetch()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        if self._n < n:
            self._fill_soft(n)
            while self._n < n:
                self._fetch()  # raises the precise truncation error
        self._n -= n
        return (self._acc >> self._n) & ((1 << n) - 1)

    def huffman(self, table: _DecodeTable) -> int:
        if self._n < 8:
            self._fill_soft(16)
        if self._n >= 8:
            hit = table.fast[(self._acc >> (self._n - 8)) & 0xFF]
            if hit is not None:
                self._n -= hit[1]
                return hit[0]
        slow = table.slow
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = slow.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG entropy stream")

    def restart(self, idx: int) -> None:
        """Byte-align and consume the expected RST(idx % 8) marker."""
        if self._n >= 8:
            # _fill_soft may have buffered whole bytes past the MCU
            # boundary — return them to the stream before aligning
            # (careful: buffered bytes may have been STUFFED 0xFF00
            # pairs, so walk back through the raw stream instead of
            # arithmetic on pos)
            give_back = self._n // 8
            for _ in range(give_back):
                self.pos -= 1
                if (
                    self.data[self.pos] == 0x00
                    and self.pos > 0
                    and self.data[self.pos - 1] == 0xFF
                ):
                    self.pos -= 1
            self._n -= give_back * 8
        self._acc = 0
        self._n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG stream truncated at restart boundary")
        m0, m1 = self.data[self.pos], self.data[self.pos + 1]
        if m0 != 0xFF or m1 != 0xD0 + (idx & 7):
            raise ValueError(
                f"expected RST{idx & 7} at restart boundary, "
                f"found 0x{m0:02X}{m1:02X}"
            )
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude code to its signed
    value (high bit clear means negative)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Magnitude category (bit length of |v|); the code bits for a
    negative value are ``v + 2^t - 1`` (one's-complement-style)."""
    return abs(v).bit_length()


class _Cat1024:
    """Lazy int64 lookup of ``_category`` for |v| <= 1023 (the 8-bit
    lossless worst case is ±510), built on first index so module
    import stays numpy-free."""

    _table = None

    def __getitem__(self, idx):
        if _Cat1024._table is None:
            import numpy as np

            _Cat1024._table = np.array(
                [v.bit_length() for v in range(1024)], dtype=np.int64
            )
        return _Cat1024._table[idx]


_CAT1024 = _Cat1024()


# ---------------------------------------------------------------------------
# DCT (orthonormal, vectorized over blocks)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _dct_matrix():
    """M[u, x] = c_u/2 * cos((2x+1) u pi / 16) with c_0 = 1/sqrt(2):
    forward DCT of a block f is M @ f @ M.T, inverse is M.T @ F @ M.
    For a DC-only block the inverse multiplies an integer by exact
    powers of two — the bit-exactness the driver oracle leans on.
    Cached (it was rebuilt per image); callers never mutate it."""
    import numpy as np

    x = np.arange(8)
    u = np.arange(8).reshape(8, 1)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] = 0.5 / np.sqrt(2.0)
    m.setflags(write=False)
    return m


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes((0xFF, marker)) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)


def _encode_block(
    wtr: _BitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one block's 64 zigzag-ordered quantized
    coefficients; returns the new DC predictor."""
    diff = zz[0] - pred
    t = _category(diff)
    if t not in dc_codes:
        raise ValueError(
            f"DC difference {diff} exceeds the table's categories"
        )
    code, ln = dc_codes[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    if not any(zz[1:]):
        # all-zero AC: the run-length loop below would count 63 zeros
        # and emit exactly one EOB — emit it directly (bit-identical;
        # C-speed any() instead of 63 interpreted iterations)
        code, ln = ac_codes[0x00]
        wtr.write(code, ln)
        return zz[0]
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL: sixteen zeros
            wtr.write(code, ln)
            run -= 16
        s = _category(v)
        if (run << 4 | s) not in ac_codes:
            raise ValueError(f"AC coefficient {v} exceeds the table's categories")
        code, ln = ac_codes[run << 4 | s]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        wtr.write(code, ln)
    return zz[0]


def _validate_and_headers(
    comps,
    width,
    height,
    sampling,
    qtables,
    restart_interval,
    sof_marker,
    progressive_ac: bool = False,
    precision: int = 8,
    arithmetic: bool = False,
):
    """Shared frame setup for the sequential and progressive writers:
    validates grids, returns (header bytes, int64 arrays, sampling,
    qtables)."""
    import numpy as np

    n = len(comps)
    if n not in (1, 3):
        raise ValueError("JPEG encoding supports 1 or 3 components")
    if sampling is None:
        sampling = [(1, 1)] * n
    if qtables is None:
        qtables = [UNIT_QTABLE] * min(n, 2)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    arrs = [np.asarray(c, dtype=np.int64) for c in comps]
    for i, ((sh, sv), a) in enumerate(zip(sampling, arrs)):
        cw = -(-width * sh // hmax)   # ceil(width * sh / hmax)
        chh = -(-height * sv // vmax)
        bx = -(-cw // 8)
        by = -(-chh // 8)
        if n > 1:
            # interleaved scans pad each component's grid to whole MCUs
            bx = -(-bx // sh) * sh
            by = -(-by // sv) * sv
        if a.shape != (by, bx, 8, 8):
            raise ValueError(
                f"component {i} block grid {a.shape[:2]} != expected ({by}, {bx})"
            )
    if precision not in (8, 12):
        raise ValueError(f"JPEG precision {precision} invalid (8 or 12)")
    if precision == 12 and n != 1:
        raise NotImplementedError(
            "12-bit color JPEG is non-JFIF (no 12-bit color transform here)"
        )
    out = bytearray(b"\xff\xd8")  # SOI
    if precision == 8:
        # JFIF mandates 8-bit samples (JFIF 1.02 §"JPEG interchange
        # format requirements"), so 12-bit streams carry no APP0
        out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(min(n, 2)):
        out += _seg(0xDB, bytes([tid]) + bytes(qtables[tid]))
    sof = struct.pack(">BHHB", precision, height, width, n)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes((i + 1, sh << 4 | sv, min(i, 1)))
    out += _seg(sof_marker, sof)
    if arithmetic:
        # DAC conditioning tables instead of DHT (B.2.4.3): Annex F
        # defaults, stated explicitly so the parser path is exercised
        from .jpeg_arith import DEFAULT_AC_KX, DEFAULT_DC_L, DEFAULT_DC_U

        dac = bytes((0x00, DEFAULT_DC_U << 4 | DEFAULT_DC_L))
        dac += bytes((0x10, DEFAULT_AC_KX))
        if n == 3:
            dac += bytes((0x01, DEFAULT_DC_U << 4 | DEFAULT_DC_L))
            dac += bytes((0x11, DEFAULT_AC_KX))
        out += _seg(0xCC, dac)
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        return out, arrs, sampling, qtables
    if precision == 12:
        dc_l = (DC12_BITS, DC12_VALS)
        ac_l = (PROG_AC_BITS, PROG_AC_VALS) if progressive_ac else (
            AC12_BITS, AC12_VALS
        )
    else:
        dc_l = (DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l = (PROG_AC_BITS, PROG_AC_VALS) if progressive_ac else (
            AC_LUMA_BITS, AC_LUMA_VALS
        )
    ac_c = (PROG_AC_BITS, PROG_AC_VALS) if progressive_ac else (
        AC_CHROMA_BITS, AC_CHROMA_VALS
    )
    out += _seg(0xC4, _dht_payload(0, 0, *dc_l))
    out += _seg(0xC4, _dht_payload(1, 0, *ac_l))
    if n == 3:
        out += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_payload(1, 1, *ac_c))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out, arrs, sampling, qtables


def _sos_segment(scan_comps, ss: int, se: int, ah: int, al: int) -> bytes:
    """SOS header: (component id, dc/ac table selectors) per scan
    component plus the spectral/approximation parameters."""
    sos = bytes([len(scan_comps)])
    for cid, dcid, acid in scan_comps:
        sos += bytes((cid, dcid << 4 | acid))
    return _seg(0xDA, sos + bytes((ss, se, ah << 4 | al)))


def encode_jpeg_from_coeffs(
    comps: "list[object]",
    width: int,
    height: int,
    sampling: "list[tuple[int, int]] | None" = None,
    qtables: "list[list[int]] | None" = None,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Write a baseline JFIF stream from CHOSEN quantized coefficients.

    ``comps`` is a list (1 = grayscale, 3 = YCbCr) of int arrays shaped
    (blocks_y, blocks_x, 8, 8) in natural (row, col) order; ``sampling``
    gives (h, v) factors per component (default all (1,1) — i.e. 4:4:4
    for color); ``qtables`` maps component -> 64 zigzag-ordered entries
    (component 0 uses table 0, components 1/2 share table 1). The block
    grids must cover ceil over the sampled dimensions exactly — this is
    the low-level entry the coefficient-checksum driver query and the
    round-trip tests build on, so it validates rather than pads."""
    # T.81 B.2.2 restricts baseline (SOF0) to 8-bit precision; 12-bit
    # sequential is the EXTENDED process and must declare SOF1 (the
    # decoder treats 0xC0/0xC1 identically, external decoders do not)
    out, arrs, sampling, qtables = _validate_and_headers(
        comps, width, height, sampling, qtables, restart_interval,
        0xC1 if precision == 12 else 0xC0,
        precision=precision,
    )
    n = len(arrs)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    out += _sos_segment(
        [(i + 1, min(i, 1), min(i, 1)) for i in range(n)], 0, 63, 0, 0
    )

    if precision == 12:
        dc_codes = [DC12_CODES]
        ac_codes = [AC12_CODES]
    else:
        dc_codes = [DC_LUMA_CODES]
        ac_codes = [AC_LUMA_CODES]
    if n == 3:
        dc_codes.append(DC_CHROMA_CODES)
        ac_codes.append(AC_CHROMA_CODES)
    wtr = _BitWriter()
    preds = [0] * n
    rst = 0
    # pre-reorder every block into zigzag order in one numpy fancy
    # index per component (the per-block python gather was the hot
    # spot), then .tolist() hands the entropy loop plain ints
    zz_all = [
        a.reshape(a.shape[0], a.shape[1], 64)[:, :, _ZZFLAT].tolist()
        for a in arrs
    ]
    if n == 1:
        by, bx = arrs[0].shape[:2]
        mcus = [(y, x) for y in range(by) for x in range(bx)]

        def write_mcu(pos):
            y, x = pos
            preds[0] = _encode_block(
                wtr, zz_all[0][y][x], preds[0], dc_codes[0], ac_codes[0]
            )

    else:
        mx = -(-width // (8 * hmax))
        my = -(-height // (8 * vmax))
        mcus = [(y, x) for y in range(my) for x in range(mx)]

        def write_mcu(pos):
            my_, mx_ = pos
            for i, (sh, sv) in enumerate(sampling):
                t = min(i, 1)
                for v in range(sv):
                    for hh in range(sh):
                        preds[i] = _encode_block(
                            wtr,
                            zz_all[i][my_ * sv + v][mx_ * sh + hh],
                            preds[i],
                            dc_codes[t],
                            ac_codes[t],
                        )

    for k, pos in enumerate(mcus):
        if restart_interval and k and k % restart_interval == 0:
            wtr.restart(rst)
            rst += 1
            preds[:] = [0] * n
        write_mcu(pos)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def rgb_to_ycbcr(arr: "object") -> "object":
    """JFIF forward color transform with the deterministic half-up
    rounding (``floor(x+0.5)``) the oracle states as FLOOR(x+0.5) —
    evaluation order of the terms matches the SQL left-to-right so the
    float64 results are bit-identical across engines."""
    import numpy as np

    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    # clamp into the 8-bit sample range: saturated chroma rounds to
    # 256 (pure blue: cb = floor(255.5 + 0.5)) and an out-of-range
    # sample would break the block-constant exactness contract — the
    # decoder clips its planes to 255, so the encoder must too
    # (round-10 review finding)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.int64)


def _ycbcr_to_rgb(y, cb, cr):
    """Inverse JFIF transform over float64 planes; same rounding and
    term-order contract as ``rgb_to_ycbcr``."""
    import numpy as np

    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _pad_replicate(plane, h_mult: int, w_mult: int):
    """Edge-replicate a plane up to multiples of (h_mult, w_mult) —
    the spec-recommended block fill that keeps constant regions
    constant (the exactness contract)."""
    import numpy as np

    h, w = plane.shape
    ph = -(-h // h_mult) * h_mult
    pw = -(-w // w_mult) * w_mult
    if ph == h and pw == w:
        return plane
    out = np.empty((ph, pw), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _blockify(plane):
    """(H, W) -> (H/8, W/8, 8, 8) view-reshape (H, W multiples of 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _quantize_blocks(blocks, qtable64):
    """Forward DCT + quantization (round half away from zero, T.81's
    convention) over an (by, bx, 8, 8) float block stack."""
    import numpy as np

    m = _dct_matrix()
    f = np.einsum("ux,yvxw,tw->yvut", m, blocks, m)
    q = np.asarray(qtable64, dtype=np.float64).reshape(8, 8)
    scaled = f / q
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)


SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _pixels_to_coeffs(
    arr: "object",
    qtable_luma: "list[int] | None",
    qtable_chroma: "list[int] | None",
    subsampling: str,
):
    """Shared pixel pipeline for the sequential and progressive
    encoders: color transform, chroma subsampling, padding, DCT,
    quantization. Returns (comps, w, h, sampling, qtables)."""
    import numpy as np

    a = np.asarray(arr)
    if a.dtype == np.uint8:
        precision = 8
    elif a.dtype == np.uint16:
        # uint16 gray encodes as 12-bit extended precision (the PNG
        # uint16 contract's JPEG analog); values must fit 12 bits
        precision = 12
        if a.size and int(a.max()) > 4095:
            raise ValueError("12-bit JPEG samples must be < 4096")
    else:
        raise ValueError("encode_jpeg takes uint8 (or uint16 gray) samples")
    if subsampling not in SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    qz_l = list(qtable_luma or UNIT_QTABLE)
    qz_c = list(qtable_chroma or qz_l)
    if len(qz_l) != 64 or len(qz_c) != 64 or min(qz_l + qz_c) < 1:
        raise ValueError("quantization tables need 64 entries >= 1")
    # zigzag-ordered DQT entries -> natural-order 64-vector
    nat_l = [0] * 64
    nat_c = [0] * 64
    for i, (r, c) in enumerate(ZIGZAG):
        nat_l[r * 8 + c] = qz_l[i]
        nat_c[r * 8 + c] = qz_c[i]
    if a.ndim == 2:
        h, w = a.shape
        shift = float(1 << (precision - 1))
        plane = _pad_replicate(a, 8, 8).astype(np.float64) - shift
        blocks = _quantize_blocks(_blockify(plane), nat_l)
        return [blocks], w, h, [(1, 1)], [qz_l], precision
    if precision == 12:
        raise NotImplementedError(
            "12-bit color JPEG is non-JFIF (no 12-bit color transform here)"
        )
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_jpeg takes HxW gray or HxWx3 RGB")
    h, w = a.shape[:2]
    sh, sv = SUBSAMPLING[subsampling]
    ycc = rgb_to_ycbcr(a)
    y = ycc[..., 0]
    chroma = []
    for ci in (1, 2):
        p = ycc[..., ci]
        if (sh, sv) != (1, 1):
            p = _pad_replicate(p, sv, sh)
            # box mean with half-up rounding, integer-exact
            s = p.reshape(p.shape[0] // sv, sv, p.shape[1] // sh, sh).sum(
                axis=(1, 3)
            )
            p = (s + sv * sh // 2) // (sv * sh)
        chroma.append(p)
    comps = []
    for i, p in enumerate([y] + chroma):
        mult = 8 * (sv if i == 0 else 1), 8 * (sh if i == 0 else 1)
        padded = _pad_replicate(p, mult[0], mult[1]).astype(np.float64) - 128.0
        comps.append(_quantize_blocks(_blockify(padded), nat_l if i == 0 else nat_c))
    return comps, w, h, [(sh, sv), (1, 1), (1, 1)], [qz_l, qz_c], 8


def encode_jpeg(
    arr: "object",
    qtable_luma: "list[int] | None" = None,
    qtable_chroma: "list[int] | None" = None,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels — HxW grayscale or HxWx3 RGB — as baseline
    JFIF. Quantization tables are zigzag-ordered 64-entry lists
    (default: unit tables, the exactness configuration); chroma
    subsampling is box-mean with half-up rounding over edge-replicated
    even dimensions. The natural-order qtable the DCT stage needs is
    derived from the zigzag order, so the DQT bytes and the math can
    never disagree."""
    comps, w, h, sampling, qts, precision = _pixels_to_coeffs(
        arr, qtable_luma, qtable_chroma, subsampling
    )
    return encode_jpeg_from_coeffs(
        comps, w, h, sampling, qts, restart_interval, precision
    )


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G, Huffman procedures)
# ---------------------------------------------------------------------------


def _prog_ac_table() -> tuple[list[int], list[int]]:
    """AC Huffman table for progressive scans. The Annex K tables are
    SEQUENTIAL tables: their only zero-size symbols are EOB (0x00) and
    ZRL (0xF0), but progressive end-of-band runs need EOBn symbols
    0x10..0xE0 too. Real encoders optimize custom tables per scan; for
    a deterministic reference codec a FIXED canonical table covering
    every legal progressive symbol (16 EOBn/ZRL + 160 run/size) at
    lengths 8/9 is simpler and spec-valid — the decoder reads whatever
    DHT says, so optimality is irrelevant to correctness."""
    vals = [r << 4 for r in range(16)]  # EOB0..EOB14, ZRL
    # sizes through 14 so the same table serves 12-bit progressive
    vals += [r << 4 | s for r in range(16) for s in range(1, 15)]
    bits = [0] * 16
    bits[7] = 100  # 100 codes of length 8
    bits[8] = 140  # 140 codes of length 9 (fits: (256-100)*2 = 312)
    return bits, vals


PROG_AC_BITS, PROG_AC_VALS = _prog_ac_table()

#: encoder-side symbol -> (code, length) maps, built ONCE — the
#: tables are fixed constants, and rebuilding them per encoded asset
#: inside the Arrow stage was measurable waste (round-10 review)
DC_LUMA_CODES = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
DC_CHROMA_CODES = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
AC_LUMA_CODES = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
AC_CHROMA_CODES = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
DC12_CODES = _canonical_codes(DC12_BITS, DC12_VALS)
AC12_CODES = _canonical_codes(AC12_BITS, AC12_VALS)
PROG_AC_CODES = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)


class _ProgState:
    """Per-scan EOB-run accumulator with the buffered correction bits
    that must follow the eventual EOBn code (jcphuff's EOBRUN/BE)."""

    __slots__ = ("eobrun", "be_bits")

    def __init__(self) -> None:
        self.eobrun = 0
        self.be_bits: list[int] = []


def _flush_eobrun(wtr: _BitWriter, ac_codes, st: _ProgState) -> None:
    if st.eobrun:
        r = st.eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(st.eobrun - (1 << r), r)
        for b in st.be_bits:
            wtr.write(b, 1)
        st.eobrun = 0
        st.be_bits = []


def _emit_ac_first(wtr, ac_codes, zz, ss, se, al, st: _ProgState) -> None:
    """AC first pass over the band [ss, se]: point transform toward
    zero by ``al``, run-length code the survivors, fold all-zero bands
    into the scan-wide EOB run."""
    band = zz[ss : se + 1]
    if not any(band):
        # all-zero band: every point-transformed value is zero too —
        # same EOB-run accounting, skipping the 63-shift list build
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, st)
        return
    vals = [(v >> al) if v >= 0 else -((-v) >> al) for v in band]
    if not any(vals):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, st)
        return
    _flush_eobrun(wtr, ac_codes, st)
    r = 0
    trailing = 0
    for t in vals:
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            r -= 16
        s = _category(t)
        if (r << 4 | s) not in ac_codes:
            raise ValueError(f"AC coefficient {t} exceeds the table's categories")
        code, ln = ac_codes[r << 4 | s]
        wtr.write(code, ln)
        wtr.write(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r:
        st.eobrun += 1  # trailing zeros join the next EOB run
        if st.eobrun == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, st)


def _emit_ac_refine(wtr, ac_codes, zz, ss, se, al, st: _ProgState) -> None:
    """AC refinement over the band (T.81 G.1.2.3 / figure G.7):
    correction bits for coefficients nonzero in earlier passes buffer
    until the next emitted code; newly-nonzero coefficients emit
    (run, 1) + sign; ZRLs fold into the EOB run when nothing new
    follows them."""
    band = zz[ss : se + 1]
    if not any(band):
        # all-zero band: the walk below would find no history and no
        # newly-nonzero coefficients — one EOB-run increment, no
        # buffered correction bits (bit-identical fast path)
        st.eobrun += 1
        if st.eobrun == 0x7FFF or len(st.be_bits) > 930:
            _flush_eobrun(wtr, ac_codes, st)
        return
    absv = [abs(v) >> al for v in band]
    eob_last = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_last = i
    r = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_last:
            _flush_eobrun(wtr, ac_codes, st)
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            r -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:  # history coefficient: buffer its next magnitude bit
            br.append(t & 1)
            continue
        _flush_eobrun(wtr, ac_codes, st)
        code, ln = ac_codes[r << 4 | 1]
        wtr.write(code, ln)
        wtr.write(1 if band[i] >= 0 else 0, 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        r = 0
    if r or br:
        st.eobrun += 1
        st.be_bits.extend(br)
        if st.eobrun == 0x7FFF or len(st.be_bits) > 930:
            _flush_eobrun(wtr, ac_codes, st)


def encode_jpeg_progressive_from_coeffs(
    comps: "list[object]",
    width: int,
    height: int,
    sampling: "list[tuple[int, int]] | None" = None,
    qtables: "list[list[int]] | None" = None,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Write a PROGRESSIVE (SOF2) JFIF stream from chosen quantized
    coefficients, using the canonical six-phase scan script that
    exercises every Annex G Huffman procedure:

    1. DC first pass, all components interleaved (Ah=0, Al=1);
    2. per component, AC first passes over the split spectral bands
       [1, 5] and [6, 63] at Al=1 (EOBn runs, ZRL, magnitudes);
    3. DC refinement, interleaved (one raw bit per block);
    4. per component, AC refinements of both bands down to Al=0
       (correction bits + newly-born +/-1 coefficients).

    Decoding the result MUST produce bit-identical coefficients to the
    sequential encoding of the same blocks — the round-trip contract
    tests and the driver query pin."""
    out, arrs, sampling, qtables = _validate_and_headers(
        comps, width, height, sampling, qtables, restart_interval, 0xC2,
        progressive_ac=True, precision=precision,
    )
    n = len(arrs)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    dc_codes = [DC12_CODES if precision == 12 else DC_LUMA_CODES]
    ac_codes = [PROG_AC_CODES]
    if n == 3:
        dc_codes.append(DC_CHROMA_CODES)
        ac_codes.append(PROG_AC_CODES)
    flats = [a.reshape(a.shape[0], a.shape[1], 64) for a in arrs]
    zz_all = [f[:, :, _ZZFLAT].tolist() for f in flats]

    def zz_of(ci: int, by: int, bx: int) -> list[int]:
        return zz_all[ci][by][bx]

    def dc_units():
        """Interleaved MCU walk (same order as the sequential scan)."""
        if n == 1:
            by, bx = arrs[0].shape[:2]
            return [[(0, y, x)] for y in range(by) for x in range(bx)]
        mx = -(-width // (8 * hmax))
        my = -(-height // (8 * vmax))
        return [
            [
                (ci, y * sv + v, x * sh + hh)
                for ci, (sh, sv) in enumerate(sampling)
                for v in range(sv)
                for hh in range(sh)
            ]
            for y in range(my)
            for x in range(mx)
        ]

    def ac_units(ci: int):
        """Non-interleaved walk over the component's SAMPLED grid."""
        sh, sv = sampling[ci]
        if n == 1:
            nbx, nby = -(-width // 8), -(-height // 8)
        else:
            cw = -(-width * sh // hmax)
            chh = -(-height * sv // vmax)
            nbx, nby = -(-cw // 8), -(-chh // 8)
        return [[(ci, y, x)] for y in range(nby) for x in range(nbx)]

    def emit_scan(scan_comps, units, ss, se, ah, al, block_fn):
        nonlocal out
        out += _sos_segment(scan_comps, ss, se, ah, al)
        wtr = _BitWriter()
        st = _ProgState()
        preds = [0] * n
        rst = 0
        for u, unit in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                _flush_eobrun(wtr, ac_codes[min(unit[0][0], 1)], st)
                wtr.restart(rst)
                rst += 1
                preds[:] = [0] * n
            for ci, by, bx in unit:
                block_fn(wtr, st, preds, ci, by, bx)
        _flush_eobrun(
            wtr, ac_codes[min(units[0][0][0], 1)] if units else ac_codes[0], st
        )
        wtr.flush()
        out += wtr.out

    al_dc, al_ac = 1, 1

    def dc_first(wtr, st, preds, ci, by, bx):
        dc_pt = int(flats[ci][by, bx, 0]) >> al_dc  # arithmetic shift (G.1.2.1)
        diff = dc_pt - preds[ci]
        preds[ci] = dc_pt
        t = _category(diff)
        if t not in dc_codes[min(ci, 1)]:
            raise ValueError(
                f"DC difference {diff} exceeds the table's categories"
            )
        code, ln = dc_codes[min(ci, 1)][t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)

    def dc_refine(wtr, st, preds, ci, by, bx):
        wtr.write((int(flats[ci][by, bx, 0]) >> 0) & 1, 1)

    def ac_scan(ss, se, ah, al):
        def fn(wtr, st, preds, ci, by, bx):
            zz = zz_of(ci, by, bx)
            if ah == 0:
                _emit_ac_first(wtr, ac_codes[min(ci, 1)], zz, ss, se, al, st)
            else:
                _emit_ac_refine(wtr, ac_codes[min(ci, 1)], zz, ss, se, al, st)

        return fn

    all_comps = [(i + 1, min(i, 1), min(i, 1)) for i in range(n)]
    emit_scan(all_comps, dc_units(), 0, 0, 0, al_dc, dc_first)
    for ci in range(n):
        sel = [(ci + 1, min(ci, 1), min(ci, 1))]
        emit_scan(sel, ac_units(ci), 1, 5, 0, al_ac, ac_scan(1, 5, 0, al_ac))
        emit_scan(sel, ac_units(ci), 6, 63, 0, al_ac, ac_scan(6, 63, 0, al_ac))
    emit_scan(all_comps, dc_units(), 0, 0, al_dc, 0, dc_refine)
    for ci in range(n):
        sel = [(ci + 1, min(ci, 1), min(ci, 1))]
        emit_scan(sel, ac_units(ci), 1, 5, 1, 0, ac_scan(1, 5, 1, 0))
        emit_scan(sel, ac_units(ci), 6, 63, 1, 0, ac_scan(6, 63, 1, 0))
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(
    arr: "object",
    qtable_luma: "list[int] | None" = None,
    qtable_chroma: "list[int] | None" = None,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels as progressive JFIF — the same pixel
    pipeline as ``encode_jpeg`` (color transform, subsampling, DCT,
    quantization) emitted through the six-phase progressive scan
    script. Decoded coefficients are bit-identical to the sequential
    encoding's, so every baseline exactness argument (block-constant
    DC-only round trips) carries over unchanged."""
    comps, w, h, sampling, qts, precision = _pixels_to_coeffs(
        arr, qtable_luma, qtable_chroma, subsampling
    )
    return encode_jpeg_progressive_from_coeffs(
        comps, w, h, sampling, qts, restart_interval, precision
    )


# ---------------------------------------------------------------------------
# lossless JPEG (T.81 Annex H, process 14: Huffman-coded prediction)
# ---------------------------------------------------------------------------

#: Annex H.1 predictors: selection value -> f(Ra=left, Rb=above,
#: Rc=upper-left). Shifts are arithmetic per the spec.
_LOSSLESS_PREDICTORS = {
    1: lambda ra, rb, rc: ra,
    2: lambda ra, rb, rc: rb,
    3: lambda ra, rb, rc: rc,
    4: lambda ra, rb, rc: ra + rb - rc,
    5: lambda ra, rb, rc: ra + ((rb - rc) >> 1),
    6: lambda ra, rb, rc: rb + ((ra - rc) >> 1),
    7: lambda ra, rb, rc: (ra + rb) >> 1,
}


def _lossless_prediction(img, x: int, y: int, sel: int, seg_row: int) -> int:
    """H.1.1 prediction with restart semantics: the first line of the
    scan AND of each restart interval (``seg_row`` is the sample row
    where the current interval began) uses Ra — the one-dimensional
    horizontal predictor — regardless of the selected predictor; the
    first sample of every other line uses Rb; interior samples use
    the selection. The interval's very FIRST sample (predicted by
    2^(P-1)) is handled by the caller, which knows the flat sample
    index."""
    if y == seg_row:
        return int(img[y][x - 1])
    if x == 0:
        return int(img[y - 1][0])
    return _LOSSLESS_PREDICTORS[sel](
        int(img[y][x - 1]), int(img[y - 1][x]), int(img[y - 1][x - 1])
    )


def encode_jpeg_lossless(
    arr: "object", predictor: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode uint8 grayscale as LOSSLESS JPEG (SOF3): each sample's
    difference from its Annex H prediction is Huffman-coded with the
    DC category machinery — no DCT, no quantization, bit-exact by
    construction. With 8-bit samples the worst-case difference
    (predictor 4 at the corners) is +/-510, category 9, inside the
    Annex K DC table — so the standard table serves. Restart
    intervals count samples (the lossless MCU) and reset the
    prediction context to the start-of-image state."""
    import numpy as np

    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("encode_jpeg_lossless takes uint8 grayscale")
    if predictor not in _LOSSLESS_PREDICTORS:
        raise ValueError(f"lossless predictor {predictor} invalid (1-7)")
    h, w = a.shape
    if h == 0 or w == 0:
        raise ValueError("JPEG dimensions must be positive")
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes((1, 0x11, 0))
    out += _seg(0xC3, sof)
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    # SOS: Ss carries the predictor selection, Se=0, Ah=0, Al=0
    out += _sos_segment([(1, 0, 0)], predictor, 0, 0, 0)
    wtr = _BitWriter()
    # H.1.1 restart semantics (ADVICE r10): the interval's first
    # sample predicts 2^(P-1); the REMAINDER OF THAT SAMPLE LINE uses
    # Ra (one-dimensional prediction), exactly like the first line of
    # the scan; later lines in the interval resume Rb-at-line-start +
    # the selected predictor — symmetric with decode_jpeg_lossless.
    #
    # Round 12 (VERDICT r11 item 6): predictions are pure functions of
    # the SOURCE samples (lossless encode has no reconstruction
    # feedback), so the whole prediction/difference/category layer
    # vectorizes; byte-equality with the per-sample reference loop is
    # pinned across every predictor x restart combination in
    # tests/test_optimization_r12.py. Only the Huffman bit emission
    # stays sequential. Gated on sample count: numpy's fixed setup
    # (~0.1 ms) loses to the scalar loop below ~256 samples (measured
    # crossover), wins ~1.17x above it — thumbnails take the loop,
    # real frames take the vector path.
    n = h * w
    if n >= 256:
        ai = a.astype(np.int64)
        ra = np.zeros_like(ai)
        ra[:, 1:] = ai[:, :-1]
        rb = np.zeros_like(ai)
        rb[1:, :] = ai[:-1, :]
        rc = np.zeros_like(ai)
        rc[1:, 1:] = ai[:-1, :-1]
        pred = _LOSSLESS_PREDICTORS[predictor](ra, rb, rc)
        if h > 1:
            pred[1:, 0] = ai[:-1, 0]  # line starts predict Rb
        pred[0, :] = ra[0, :]  # the scan's first line predicts Ra
        pred_flat = pred.reshape(-1)
        a_flat = ai.reshape(-1)
        step = restart_interval if restart_interval else n
        for k0 in range(0, n, step):
            # each interval's first sample predicts 128; the rest of
            # that sample LINE (bounded by the interval end) predicts
            # Ra
            pred_flat[k0] = 128
            end = min((k0 // w + 1) * w, k0 + step)
            if end > k0 + 1:
                pred_flat[k0 + 1 : end] = a_flat[k0 : end - 1]
        diffs = (a_flat - pred_flat).tolist()
        cats = _CAT1024[np.abs(a_flat - pred_flat)].tolist()
        rst = 0
        write = wtr.write
        for k in range(n):
            if restart_interval and k and k % restart_interval == 0:
                wtr.restart(rst)
                rst += 1
            t = cats[k]
            code, ln = DC_LUMA_CODES[t]
            write(code, ln)
            if t:
                diff = diffs[k]
                write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    else:
        img = a.tolist()
        k = 0
        rst = 0
        seg_start = 0
        seg_row = 0
        for y in range(h):
            for x in range(w):
                if restart_interval and k and k % restart_interval == 0:
                    wtr.restart(rst)
                    rst += 1
                    seg_start = k
                    seg_row = y
                pred = (
                    128 if k == seg_start
                    else _lossless_prediction(img, x, y, predictor, seg_row)
                )
                diff = img[y][x] - pred
                t = _category(diff)
                code, ln = DC_LUMA_CODES[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                k += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_lossless(payload: bytes) -> "object":
    """Decode a LOSSLESS (SOF3) grayscale JPEG to a uint8 array —
    bit-exact by definition. Structural corruption raises ValueError;
    multi-component lossless, 16-bit samples, and nonzero point
    transforms raise NotImplementedError (each a declared gate, not a
    parsing gap)."""
    import numpy as np

    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    dc_maps: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    scan = None
    while True:
        if pos + 2 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # B.1.1.2: optional 0xFF fill before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            raise ValueError("EOI before SOS (no image data)")
        if pos + 2 > len(data):
            raise ValueError("JPEG segment length truncated")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("JPEG segment overruns payload")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xC4:
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("DHT header truncated")
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                if i + 17 + nvals > len(body):
                    raise ValueError("DHT values truncated")
                if cls == 0:
                    dc_maps[tid] = _decode_map(bits, list(body[i + 17 : i + 17 + nvals]))
                i += 17 + nvals
        elif marker == 0xC3:
            if len(body) < 6:
                raise ValueError("SOF segment truncated")
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit lossless JPEG not supported (8-bit only)"
                )
            if ncomp != 1:
                raise NotImplementedError(
                    "multi-component lossless JPEG not supported"
                )
            if w == 0 or h == 0:
                raise ValueError("JPEG dimensions must be positive")
            sof = {"w": w, "h": h}
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("DRI segment truncated")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before SOF")
            if len(body) < 6:
                raise ValueError("SOS header truncated")
            ns = body[0]
            if ns != 1:
                raise NotImplementedError(
                    "multi-component lossless JPEG not supported"
                )
            sel, se, a = body[3], body[4], body[5]
            if not (1 <= sel <= 7):
                raise ValueError(f"lossless predictor {sel} invalid")
            if a & 15:
                raise NotImplementedError(
                    "lossless point transform (Al > 0) not supported"
                )
            scan = {"dc": body[2] >> 4, "sel": sel}
            del se
            break
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE or marker == 0xDB:
            continue  # metadata; DQT is legal-but-unused in lossless
        else:
            raise ValueError(f"unsupported JPEG marker 0xFF{marker:02X}")
    dc_map = dc_maps.get(scan["dc"])
    if dc_map is None:
        raise ValueError("scan references undefined Huffman table")
    w, h = sof["w"], sof["h"]
    sel = scan["sel"]
    rdr = _BitReader(data, pos)
    img = [[0] * w for _ in range(h)]
    k = 0
    rst = 0
    seg_start = 0
    seg_row = 0
    for y in range(h):
        row = img[y]
        for x in range(w):
            if restart_interval and k and k % restart_interval == 0:
                rdr.restart(rst)
                rst += 1
                seg_start = k
                seg_row = y
            t = rdr.huffman(dc_map)
            if t > 16:
                raise ValueError("invalid lossless difference category")
            if t == 16:
                # Table H.2: SSSS=16 means diff=32768 with NO appended
                # bits — only reachable at 16-bit precision, which this
                # decoder gates; reading 16 bits here (the old bug)
                # would silently desynchronize the stream
                raise ValueError(
                    "lossless difference category 16 invalid at 8-bit "
                    "precision"
                )
            diff = _extend(rdr.receive(t), t)
            pred = (
                128 if k == seg_start
                else _lossless_prediction(img, x, y, sel, seg_row)
            )
            val = pred + diff
            if not (0 <= val <= 255):
                raise ValueError(
                    f"lossless reconstruction {val} outside the 8-bit range "
                    "(corrupt differences)"
                )
            row[x] = val
            k += 1
    import numpy as np

    return np.asarray(img, dtype=np.uint8)


def _first_sof_marker(data: bytes) -> int | None:
    """Cheap marker walk to the first SOFn — lets decode_jpeg route
    lossless streams to the prediction decoder before the coefficient
    parser rejects them."""
    pos = 2
    sofs = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:  # B.1.1.2: optional 0xFF fill before a marker
            pos += 1
            continue
        if marker in sofs:
            return marker
        if marker == 0xD9 or marker == 0xDA:
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        if seglen < 2:
            return None
        pos += 2 + seglen
    return None


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

#: SOF markers this decoder rejects, with the reason (each is a
#: genuinely different coding process, not a parsing gap). SOF0/SOF1
#: decode as sequential; SOF2 decodes as progressive (round 10 —
#: spectral selection + successive approximation are Huffman-layer
#: features, not library-bound entropy coding).
_SOF_GATES = {
    # SOF3 has no coefficient layer at all — decode_jpeg routes it to
    # decode_jpeg_lossless; reaching THIS parser with it is a caller
    # asking for DCT coefficients that do not exist
    0xC3: "lossless JPEG (SOF3) has no DCT coefficient layer and",
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    # SOF9/SOF10 (arithmetic sequential/progressive) decode for real
    # since round 11 — operators/jpeg_arith.py
    0xCB: "arithmetic lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}

#: zigzag index -> flat natural index, precomputed for the hot loops
_ZZFLAT = [r * 8 + c for r, c in ZIGZAG]


def _decode_block_sequential(
    rdr, dc_map, ac_map, block, pred: int, max_dc: int = 15, max_ac: int = 14
) -> int:
    """One full sequential block (Ss=0..63, no approximation), writing
    QUANTIZED coefficients; returns the new DC predictor. ``max_dc``/
    ``max_ac`` are the Table F.1 category/size bounds for the frame's
    precision (11/10 at 8-bit, 15/14 at 12-bit) — a stream whose DHT
    maps to larger sizes is corrupt for that precision, and reading
    the oversized field would desynchronize the scan."""
    t = rdr.huffman(dc_map)
    if t > max_dc:
        raise ValueError(
            f"DC category {t} exceeds the precision's bound {max_dc}"
        )
    pred += _extend(rdr.receive(t), t)
    block[0] = pred
    k = 1
    while k < 64:
        rs = rdr.huffman(ac_map)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if rs == 0x00:  # EOB
                return pred
            if rs == 0xF0:  # ZRL: sixteen zeros, a nonzero MUST follow
                k += 16
                if k > 63:
                    raise ValueError("AC run overruns the block")
                continue
            raise ValueError(f"invalid AC symbol 0x{rs:02X}")
        if s > max_ac:
            raise ValueError(
                f"AC size {s} exceeds the precision's bound {max_ac}"
            )
        k += r
        if k > 63:
            raise ValueError("AC run overruns the block")
        block[_ZZFLAT[k]] = _extend(rdr.receive(s), s)
        k += 1
    return pred


def _decode_ac_first(
    rdr, ac_map, block, ss, se, al, eobrun: int, max_ac: int = 14
) -> int:
    """Progressive AC first pass (T.81 G.1.2.2): run-length decode of
    the spectral band [ss, se] at precision ``al``, with EOBn
    end-of-band runs spanning blocks. Returns the remaining eobrun.
    ``max_ac`` is the Table F.1 size bound for the frame precision."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rdr.huffman(ac_map)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros within the band
                k += 16
                if k > se + 1:
                    # match the sequential decoder's strictness: a ZRL
                    # run that overruns [ss, se] is corrupt, not EOB
                    raise ValueError("AC run overruns the spectral band")
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rdr.receive(r)
            return eobrun
        if s > max_ac:
            raise ValueError(
                f"AC size {s} exceeds the precision's bound {max_ac}"
            )
        k += r
        if k > se:
            raise ValueError("AC run overruns the spectral band")
        block[_ZZFLAT[k]] = _extend(rdr.receive(s), s) << al
        k += 1
    return 0


def _decode_ac_refine(rdr, ac_map, block, ss, se, al, eobrun: int) -> int:
    """Progressive AC refinement (T.81 G.1.2.3): walk the band reading
    correction bits for already-nonzero coefficients and +/-1 births
    for newly nonzero ones; EOBn runs still carry correction bits for
    the skipped blocks' nonzero history. Returns the remaining
    eobrun."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(idx: int) -> None:
        cur = block[idx]
        if rdr.read_bit() and (cur & p1) == 0:
            block[idx] = cur + (p1 if cur >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.huffman(ac_map)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of end-of-band blocks
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.receive(r)
                    break
                # r == 15 (ZRL): skip 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "AC refinement can only introduce magnitude-1 "
                        "coefficients"
                    )
                val = p1 if rdr.read_bit() else m1
            while k <= se:
                idx = _ZZFLAT[k]
                if block[idx] != 0:
                    correct(idx)
                else:
                    if r == 0:
                        if val:
                            block[idx] = val
                        k += 1
                        break
                    r -= 1
                k += 1
            else:
                if val:
                    raise ValueError(
                        "AC refinement run overruns the spectral band"
                    )
    if eobrun > 0:
        while k <= se:
            idx = _ZZFLAT[k]
            if block[idx] != 0:
                correct(idx)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg_coefficients(payload: bytes):
    """Parse a sequential (SOF0/SOF1) or PROGRESSIVE (SOF2) JFIF stream
    down to its DEQUANTIZED coefficient blocks — the integer layer the
    coefficient-checksum oracles pin. Returns ``(meta, comps)`` where
    ``meta`` has width/height/sampling/n_components/progressive and
    ``comps`` is a list of (blocks_y, blocks_x, 8, 8) int64 arrays in
    natural order.

    Sequential streams may split components across scans
    (non-interleaved baseline is spec-legal); progressive streams run
    the full scan-script state machine — interleaved or per-component
    DC scans with successive approximation (first pass shifted by Al,
    refinement bits OR'd in, two's-complement-correct for negative
    DCs), per-component AC scans over spectral bands [Ss, Se] with
    EOBn end-of-band runs, ZRL, and the G.1.2.3 refinement walk where
    correction bits interleave with newly-born +/-1 coefficients.
    Restart intervals apply per scan (DC predictors and EOB runs
    reset).

    All tables (DQT, DHT) are read from the file. Structural
    corruption — bad marker framing, truncated segments, missing
    SOF/SOS, undefined table references, invalid Huffman codes,
    coefficient overrun, wrong restart markers, AC-before-DC scans,
    components never scanned — raises ValueError; the coding processes
    in ``_SOF_GATES`` plus 12-bit precision and 4-component (CMYK)
    color raise NotImplementedError, the decode_png error-class
    contract."""
    import numpy as np

    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: tid -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: tid -> Kx
    sof = None
    progressive = False
    arith = False
    restart_interval = 0
    arrs: list = []
    dc_seen: list = []
    approx: list = []  # per component: zigzag index -> current Al
    any_scan = False
    _units_cache: dict = {}  # per-payload: scan component tuple -> units

    def run_scan(body: bytes, start: int) -> int:
        """Decode one scan's entropy data; returns the stream position
        of the next marker."""
        comps = sof["comps"]
        n = len(comps)
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        w, h = sof["w"], sof["h"]
        ns = body[0]
        if len(body) != 1 + 2 * ns + 3:
            raise ValueError("SOS header length inconsistent")
        by_id = {c["id"]: i for i, c in enumerate(comps)}
        scomps = []
        for i in range(ns):
            cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
            if cs not in by_id:
                raise ValueError(f"scan references unknown component {cs}")
            scomps.append((by_id[cs], tabs >> 4, tabs & 15))
        ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
        ah, al = a >> 4, a & 15
        # Table F.1 entropy bounds for the frame precision: DC
        # category <= 11 / AC size <= 10 at 8-bit, 15/14 at 12-bit
        max_dc = 11 if sof["precision"] == 8 else 15
        max_ac = 10 if sof["precision"] == 8 else 14
        if progressive:
            if ss > se or se > 63 or (ss == 0 and se != 0):
                raise ValueError(f"invalid spectral band [{ss}, {se}]")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scans must be single-component")
            if ss > 0 and not all(dc_seen[ci] for ci, _, _ in scomps):
                raise ValueError("AC scan before the component's first DC scan")
            if ss == 0 and ah > 0 and not all(
                dc_seen[ci] for ci, _, _ in scomps
            ):
                raise ValueError(
                    "DC refinement before the component's first DC scan"
                )
            # successive-approximation bookkeeping (G.1.1.1.2, round
            # 11): a first scan may not revisit a coefficient; a
            # refinement must pick up at the previous scan's Al and
            # reduce the point transform by exactly one bit — a scan
            # script that skips a bit plane or double-first-scans a
            # band would otherwise decode to silently wrong magnitudes
            band = (0,) if ss == 0 else range(ss, se + 1)
            for ci, _, _ in scomps:
                for k in band:
                    cur = approx[ci][k]
                    if ah == 0:
                        if cur is not None:
                            raise ValueError(
                                f"coefficient {k} of component "
                                f"{comps[ci]['id']} first-scanned twice "
                                "(overlapping spectral bands)"
                            )
                    else:
                        if cur is None:
                            raise ValueError(
                                f"refinement of never-first-scanned "
                                f"coefficient {k} (component "
                                f"{comps[ci]['id']})"
                            )
                        if ah != cur:
                            raise ValueError(
                                f"successive approximation skips a bit "
                                f"plane: scan has Ah={ah}, coefficient "
                                f"{k} is at Al={cur}"
                            )
                        if al != ah - 1:
                            raise ValueError(
                                f"refinement must reduce the point "
                                f"transform by one bit (Ah={ah}, Al={al})"
                            )
                    approx[ci][k] = al
        else:
            if (ss, se, ah, al) != (0, 63, 0, 0):
                raise ValueError(
                    "sequential scan must cover the full 0-63 band with no "
                    "approximation"
                )
        rdr = _BitReader(data, start)
        preds = [0] * n
        eobrun = 0
        interleaved = ns > 1

        # per-scan decode units: (component, block_y, block_x) triples
        # grouped into MCUs (restart intervals count MCUs). The list
        # depends only on which components the scan covers (the frame
        # grid is fixed after SOF), and a progressive scan script
        # re-covers the same component sets many times — cached per
        # component tuple (round 12: the rebuild was ~10% of
        # progressive decode)
        units_key = tuple(ci for ci, _, _ in scomps)
        units = _units_cache.get(units_key)
        if units is None:
            if interleaved:
                mx = -(-w // (8 * hmax))
                my = -(-h // (8 * vmax))
                units = [
                    [
                        (ci, y * comps[ci]["v"] + v, x * comps[ci]["h"] + hh)
                        for ci, _, _ in scomps
                        for v in range(comps[ci]["v"])
                        for hh in range(comps[ci]["h"])
                    ]
                    for y in range(my)
                    for x in range(mx)
                ]
            else:
                ci = scomps[0][0]
                c = comps[ci]
                if n == 1:
                    nbx, nby = -(-w // 8), -(-h // 8)
                else:
                    # non-interleaved grid covers the component's
                    # SAMPLED dimensions, NOT the MCU-padded grid
                    cw = -(-w * c["h"] // hmax)
                    chh = -(-h * c["v"] // vmax)
                    nbx, nby = -(-cw // 8), -(-chh // 8)
                units = [
                    [(ci, y, x)] for y in range(nby) for x in range(nbx)
                ]
            _units_cache[units_key] = units

        tabs_for = {ci: (dcid, acid) for ci, dcid, acid in scomps}
        if arith:
            # SOF9/SOF10: the QM entropy layer (jpeg_arith) replaces
            # the Huffman bit reader; every structural check above —
            # grids, scan-script validation, component bookkeeping —
            # is shared with the Huffman path
            from . import jpeg_arith

            if progressive:
                ret = jpeg_arith.decode_progressive_scan(
                    data, start, units, arrs, tabs_for, restart_interval,
                    dc_cond, ac_cond, n, _ZZFLAT, ss, se, ah, al,
                )
            else:
                ret = jpeg_arith.decode_sequential_scan(
                    data, start, units, arrs, tabs_for, restart_interval,
                    dc_cond, ac_cond, n, _ZZFLAT,
                )
            if ss == 0 and (ah == 0 or not progressive):
                for ci, _, _ in scomps:
                    dc_seen[ci] = True
            return ret
        rst = 0
        for u, unit in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                rdr.restart(rst)
                rst += 1
                preds[:] = [0] * n
                eobrun = 0
            for ci, by_, bx_ in unit:
                dcid, acid = tabs_for[ci]
                block = arrs[ci][by_][bx_]
                if not progressive:
                    dc_map = dc_maps.get(dcid)
                    ac_map = ac_maps.get(acid)
                    if dc_map is None or ac_map is None:
                        raise ValueError(
                            "scan references undefined Huffman table"
                        )
                    preds[ci] = _decode_block_sequential(
                        rdr, dc_map, ac_map, block, preds[ci],
                        max_dc, max_ac,
                    )
                elif ss == 0:  # progressive DC scan
                    if ah == 0:  # first pass
                        dc_map = dc_maps.get(dcid)
                        if dc_map is None:
                            raise ValueError(
                                "scan references undefined Huffman table"
                            )
                        t = rdr.huffman(dc_map)
                        if t > max_dc:
                            raise ValueError(
                                f"DC category {t} exceeds the "
                                f"precision's bound {max_dc}"
                            )
                        preds[ci] += _extend(rdr.receive(t), t)
                        block[0] = preds[ci] << al
                    else:  # refinement: one raw bit per block
                        if rdr.read_bit():
                            block[0] = block[0] | (1 << al)
                else:  # progressive AC scan
                    ac_map = ac_maps.get(acid)
                    if ac_map is None:
                        raise ValueError(
                            "scan references undefined Huffman table"
                        )
                    if ah == 0:
                        eobrun = _decode_ac_first(
                            rdr, ac_map, block, ss, se, al, eobrun, max_ac
                        )
                    else:
                        eobrun = _decode_ac_refine(
                            rdr, ac_map, block, ss, se, al, eobrun
                        )
        if ss == 0 and (ah == 0 or not progressive):
            # only a FIRST DC pass establishes the component's history;
            # refinements require one (checked above)
            for ci, _, _ in scomps:
                dc_seen[ci] = True
        return rdr.pos

    while True:
        if pos + 2 > len(data):
            raise ValueError("JPEG truncated before EOI")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}, got 0x{data[pos]:02X}")
        marker = data[pos + 1]
        if marker == 0xFF:  # B.1.1.2: optional 0xFF fill before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD8:
            raise ValueError("unexpected second SOI")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no segment
        if marker == 0xD9:
            if not any_scan:
                raise ValueError("EOI before SOS (no image data)")
            break
        if pos + 2 > len(data):
            raise ValueError("JPEG segment length truncated")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("JPEG segment overruns payload")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT: one or more tables per segment
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq not in (0, 1):
                    raise ValueError(f"DQT precision {pq} invalid")
                nbytes = 64 * (2 if pq else 1)
                if i + nbytes > len(body):
                    raise ValueError("DQT table truncated")
                if pq:
                    vals = list(struct.unpack_from(">64H", body, i))
                else:
                    vals = list(body[i : i + 64])
                qtables[tq] = vals
                i += nbytes
        elif marker == 0xC4:  # DHT: one or more tables per segment
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("DHT header truncated")
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                if i + 17 + nvals > len(body):
                    raise ValueError("DHT values truncated")
                vals = list(body[i + 17 : i + 17 + nvals])
                (dc_maps if cls == 0 else ac_maps)[tid] = _decode_map(bits, vals)
                i += 17 + nvals
        elif marker == 0xCC:  # DAC: arithmetic conditioning tables
            i = 0
            while i < len(body):
                if i + 2 > len(body):
                    raise ValueError("DAC segment truncated")
                tc, tb = body[i] >> 4, body[i] & 15
                cs = body[i + 1]
                i += 2
                if tb > 3:
                    raise ValueError(f"DAC table id {tb} invalid")
                if tc == 0:
                    low, up = cs & 15, cs >> 4
                    if low > up:
                        raise ValueError(
                            f"DAC DC conditioning L={low} > U={up}"
                        )
                    dc_cond[tb] = (low, up)
                elif tc == 1:
                    if not (1 <= cs <= 63):
                        raise ValueError(f"DAC AC Kx={cs} outside 1..63")
                    ac_cond[tb] = cs
                else:
                    raise ValueError(f"DAC table class {tc} invalid")
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            if sof is not None:
                raise ValueError("multiple SOF segments")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            if len(body) < 6:
                raise ValueError("SOF segment truncated")
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("SOF component list truncated")
            if precision not in (8, 12):
                raise ValueError(
                    f"JPEG precision {precision} is spec-invalid (8 or 12)"
                )
            if precision == 12 and ncomp != 1:
                raise NotImplementedError(
                    "12-bit COLOR JPEG is non-JFIF (no standard 12-bit "
                    "color transform); grayscale 12-bit decodes"
                )
            if ncomp == 4:
                raise NotImplementedError(
                    "4-component (CMYK/Adobe) JPEG requires an image library"
                )
            if ncomp not in (1, 3):
                raise ValueError(f"JPEG with {ncomp} components unsupported")
            if w == 0 or h == 0:
                raise ValueError("JPEG dimensions must be positive")
            comps_meta = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                sh, sv = samp >> 4, samp & 15
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"sampling factors {sh}x{sv} invalid")
                comps_meta.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            sof = {"w": w, "h": h, "comps": comps_meta, "precision": precision}
            hmax = max(c["h"] for c in comps_meta)
            vmax = max(c["v"] for c in comps_meta)
            for c in comps_meta:
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError(
                        f"fractional chroma sampling {c['h']}x{c['v']} vs "
                        f"{hmax}x{vmax} requires an image library"
                    )
                if ncomp > 1:
                    bx = -(-w // (8 * hmax)) * c["h"]
                    by = -(-h // (8 * vmax)) * c["v"]
                else:
                    bx, by = -(-w // 8), -(-h // 8)
                # blocks live as flat Python list[64] (natural order)
                # during entropy decoding — per-coefficient list access
                # is ~5x cheaper than numpy scalar .flat indexing on
                # the per-symbol hot loops (round 12); one bulk
                # np.asarray after the last scan restores the
                # (by, bx, 8, 8) int64 contract bit-for-bit
                arrs.append(
                    [[[0] * 64 for _ in range(bx)] for _ in range(by)]
                )
                dc_seen.append(False)
                approx.append([None] * 64)
        elif marker in _SOF_GATES:
            raise NotImplementedError(
                f"{_SOF_GATES[marker]} requires an image library"
            )
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("DRI segment truncated")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("SOS header truncated")
            pos = run_scan(body, pos)
            any_scan = True
        elif 0xE0 <= marker <= 0xEF or marker == 0xFE:
            continue  # APPn / COM metadata
        else:
            raise ValueError(f"unsupported JPEG marker 0xFF{marker:02X}")

    comps = sof["comps"]
    for ci, c in enumerate(comps):
        if c["tq"] not in qtables:
            raise ValueError(f"component references undefined DQT {c['tq']}")
        if not dc_seen[ci]:
            raise ValueError(
                f"component {c['id']} never received a DC scan — the "
                "stream is incomplete, not decodable-to-zeros"
            )
    # materialize the scan-time list-of-lists store into the numpy
    # contract, then dequantize once, after all scans: DQT entries
    # are zigzag-ordered, so scatter them to natural order first
    for ci, c in enumerate(comps):
        a = np.asarray(arrs[ci], dtype=np.int64)
        arrs[ci] = a.reshape(a.shape[0], a.shape[1], 8, 8)
        qnat = np.ones((8, 8), dtype=np.int64)
        for i, flat in enumerate(_ZZFLAT):
            qnat.flat[flat] = qtables[c["tq"]][i]
        arrs[ci] *= qnat
    meta = {
        "width": sof["w"],
        "height": sof["h"],
        "n_components": len(comps),
        "sampling": [(c["h"], c["v"]) for c in comps],
        "progressive": progressive,
        "precision": sof["precision"],
    }
    return meta, arrs


def _idct_blocks(blocks):
    """Inverse DCT over an (by, bx, 8, 8) coefficient stack; returns
    float64 spatial blocks (pre level-shift).

    DC-only stacks (every nonzero sits at zigzag 0 — the common case
    for flat content, and ~all blocks of the block-constant bench
    corpus) take a vectorized outer-product path that is BIT-IDENTICAL
    to the einsum, not merely close (round 12): c_einsum accumulates
    the 64 per-element terms ``(m[u,x]*B[u,t])*m[t,w]`` in (u,t)
    C-order, every zero coefficient contributes an exact ±0.0 whose
    addition preserves the accumulator bit pattern, and (0,0) is the
    FIRST term — so the whole sum collapses to the single product
    chain ``(m[0,x]*dc)*m[0,w]``, which the broadcasted elementwise
    form reproduces multiplication-for-multiplication (IEEE ``a*b``
    is commutative bitwise; no re-association happens). Asserted
    exhaustively against the einsum in tests/test_optimization_r12.py
    over random DC values including every sign/magnitude class.
    Mixed stacks keep the einsum."""
    import numpy as np

    m = _dct_matrix()
    # all nonzeros are DCs <=> total nonzero count equals the nonzero
    # count of the DC plane alone
    if np.count_nonzero(blocks) == np.count_nonzero(blocks[..., 0, 0]):
        dc = blocks[..., 0, 0].astype(np.float64)
        a = m[0] * dc[..., None]  # (by, bx, 8): m[0,x]*dc
        return a[..., :, None] * m[0]  # (by, bx, 8, 8): (m[0,x]*dc)*m[0,w]
    return np.einsum("ux,yvut,tw->yvxw", m, blocks.astype(np.float64), m)


def decode_jpeg(payload: bytes) -> "object":
    """Decode a JPEG to pixels — HxW uint8 for grayscale (uint16 for
    12-bit), HxWx3 RGB uint8 for YCbCr color; sequential, progressive,
    and LOSSLESS (SOF3, routed to ``decode_jpeg_lossless``) processes.
    DCT processes per plane: dequantized coefficients -> vectorized
    IDCT -> level shift -> floor(x+0.5) -> clip; chroma planes
    upsample by sample replication; the JFIF inverse color transform
    runs on the ROUNDED integer planes (the deterministic semantics
    the arithmetic oracle states in SQL). Error classes follow
    ``decode_jpeg_coefficients``."""
    import numpy as np

    if _first_sof_marker(bytes(payload)) == 0xC3:
        return decode_jpeg_lossless(payload)
    meta, coeff = decode_jpeg_coefficients(payload)
    w, h = meta["width"], meta["height"]
    hmax = max(sh for sh, _ in meta["sampling"])
    vmax = max(sv for _, sv in meta["sampling"])
    precision = meta["precision"]
    shift = float(1 << (precision - 1))
    vmax_sample = (1 << precision) - 1
    planes = []
    for (sh, sv), blocks in zip(meta["sampling"], coeff):
        spatial = _idct_blocks(blocks)
        by, bx = blocks.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(np.floor(plane + shift + 0.5), 0, vmax_sample)
        if (sh, sv) != (hmax, vmax):
            plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        planes.append(plane[:h, :w])
    if meta["n_components"] == 1:
        # 12-bit returns uint16 — the PNG depth-16 never-downcast contract
        return planes[0].astype(np.uint16 if precision == 12 else np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
