r"""FLAC codec (RFC 9639 / the public xiph.org format spec) in pure
stdlib + numpy.

Round 11 closes the compressed-audio gate the WAV work left declared
(plans/llm.py `multimodal_wav_decode`: "Non-PCM encodings remain the
gate"): FLAC is rice-coded linear prediction — no DSP library in
sight, the same "it's just entropy coding + integer math" discipline
as the LZW/Huffman/QM waves. Implemented here:

**Decoder** (`decode_flac`): the full frame layer —
- stream marker + metadata walk (STREAMINFO parsed, every other
  block type skipped by length, last-block flag honored);
- frame headers: sync, blocking strategy, all blocksize/sample-rate/
  sample-size code points (incl. the end-of-header 8/16-bit escapes),
  channel assignment (independent, left/side, right/side, mid/side),
  the UTF-8-style coded frame/sample number, and the header CRC-8
  (polynomial 0x07) VERIFIED;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (QLP precision + shift + signed coefficients), wasted-bits unary
  prefix, the +1 bit depth of difference channels;
- residual: both rice methods (4- and 5-bit parameters), partition
  orders 0-15, and the escape-to-raw-bits code point;
- stereo decorrelation and the frame CRC-16 (polynomial 0x8005)
  VERIFIED. Structural corruption raises ValueError; the spec's
  reserved code points raise ValueError (they cannot be misread);
  bit depths other than 8/16/24 raise NotImplementedError.

**Encoder** (`encode_flac`): spec-valid streams for the round-trip
tests and driver oracles — STREAMINFO with the REAL MD5 signature
(RFC 9639 §8.2: MD5 of the interleaved little-endian PCM, which the
decoder re-verifies: a reconstruction bug cannot hide), fixed-size
frames, per-frame choice among constant / verbatim / fixed orders
0-2 by residual cost, rice parameter fitted per frame, and all three
stereo decorrelation modes selectable. The encoder exists so tests
and oracles never need fixture files; compression quality is not the
point, VALIDITY is.

Exactness contract: FLAC is lossless, so (like lossless JPEG) driver
queries need no construction tricks — any deterministic PCM lattice
round-trips bit-exactly and the DuckDB oracle states the amplitude
sum arithmetically.

Reference parity note: the reference pipeline
(pulse_billing_etl_service) has no codec surface; this module is
north-star training-data-pipeline capability (audio ingest at
100 TB), same as jpeg.py / jpeg_arith.py.

Scale: decode runs inside the same Arrow ``mapInPandas`` stage as
WAV (`multimodal.decode_audio_features` dispatches on the stream
magic) — embarrassingly parallel, zero shuffle.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.2/§9.3) — table-free, the streams are small
# ---------------------------------------------------------------------------


def crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, byte stream — no marker stuffing in FLAC)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            take = min(n, 8 - self.bit)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (8 - self.bit - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self, limit: int = 1 << 20) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > limit:
                raise ValueError("FLAC unary run exceeds sane bounds")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitsW:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        self._acc = (self._acc << n) | (v & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


# ---------------------------------------------------------------------------
# coded numbers / header code tables
# ---------------------------------------------------------------------------


def _read_coded_number(bits: _Bits) -> int:
    """The UTF-8-style frame/sample number (RFC 9639 §9.1.5: up to 7
    bytes, 36-bit payload)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("invalid FLAC coded number prefix")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(w: _BitsW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    # minimal multi-byte form
    payload_bits = v.bit_length()
    for n in range(1, 7):
        if payload_bits <= 6 * n + (6 - n):
            break
    parts = []
    for _ in range(n):
        parts.append(v & 0x3F)
        v >>= 6
    lead = ((0xFF << (7 - n)) & 0xFF) | v
    w.write(lead, 8)
    for p in reversed(parts):
        w.write(0x80 | p, 8)


_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_RATE_BY_CODE = {v: k for k, v in _RATE_CODES.items()}

_DEPTH_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_DEPTH_BY_CODE = {v: k for k, v in _DEPTH_CODES.items()}

#: fixed predictor residual formulas, order -> coefficient vector on
#: the previous `order` samples (RFC 9639 §9.2.2)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_flac(payload: bytes):
    """Decode a FLAC stream to ``(sample_rate, samples)`` where
    ``samples`` is an int32 array shaped (n_frames, n_channels) —
    the same surface as ``multimodal.decode_wav``. Both CRCs and the
    STREAMINFO MD5 signature are verified (an all-zero MD5 means
    "unknown" per spec and skips the check). Structural corruption
    and reserved code points raise ValueError; unsupported bit
    depths raise NotImplementedError."""
    import numpy as np

    data = bytes(payload)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    info = None
    last = False
    while not last:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        pos += 4
        if pos + blen > len(data):
            raise ValueError("FLAC metadata block overruns payload")
        if btype == 0:
            if blen != 34:
                raise ValueError("STREAMINFO must be 34 bytes")
            b = _Bits(data, pos)
            info = {
                "min_bs": b.read(16),
                "max_bs": b.read(16),
                "min_fs": b.read(24),
                "max_fs": b.read(24),
                "rate": b.read(20),
                "channels": b.read(3) + 1,
                "bits": b.read(5) + 1,
                "total": b.read(36),
                "md5": data[pos + 18 : pos + 34],
            }
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += blen
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    if info["rate"] == 0:
        raise ValueError("STREAMINFO sample rate must be positive")
    if info["bits"] not in (8, 16, 24):
        raise NotImplementedError(
            f"{info['bits']}-bit FLAC not supported (8/16/24)"
        )

    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(data):
        pos = _decode_frame(data, pos, info, chans)
    n = len(chans[0])
    if any(len(c) != n for c in chans):
        raise ValueError("FLAC channels decoded to different lengths")
    if info["total"] and n != info["total"]:
        raise ValueError(
            f"decoded {n} samples, STREAMINFO declares {info['total']}"
        )
    samples = np.array(chans, dtype=np.int64).T.copy()
    lo, hi = -(1 << (info["bits"] - 1)), (1 << (info["bits"] - 1)) - 1
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError("FLAC sample outside the declared bit depth")
    if info["md5"] != b"\x00" * 16:
        md5 = hashlib.md5(_pcm_bytes(samples, info["bits"])).digest()
        if md5 != info["md5"]:
            raise ValueError("FLAC MD5 signature mismatch (corrupt stream)")
    return info["rate"], samples.astype(np.int32)


def _pcm_bytes(samples, bits: int) -> bytes:
    """Interleaved little-endian PCM, the MD5 input per RFC 9639."""
    import numpy as np

    flat = samples.reshape(-1)
    if bits == 8:
        return flat.astype(np.int8).tobytes()
    if bits == 16:
        return flat.astype("<i2").tobytes()
    b = flat.astype("<i4").tobytes()
    return b"".join(b[i : i + 3] for i in range(0, len(b), 4))


def _decode_frame(data: bytes, pos: int, info, chans) -> int:
    bits = _Bits(data, pos)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"bad FLAC frame sync 0x{sync:04X} at byte {pos}")
    if bits.read(1):
        raise ValueError("reserved bit set in FLAC frame header")
    bits.read(1)  # blocking strategy (both are legal)
    bs_code = bits.read(4)
    rate_code = bits.read(4)
    ch_code = bits.read(4)
    depth_code = bits.read(3)
    if bits.read(1):
        raise ValueError("reserved bit set in FLAC frame header")
    _read_coded_number(bits)
    if bs_code == 0:
        raise ValueError("reserved FLAC blocksize code 0")
    if bs_code == 1:
        blocksize = 192
    elif 2 <= bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if rate_code == 0:
        rate = info["rate"]
    elif rate_code in _RATE_BY_CODE:
        rate = _RATE_BY_CODE[rate_code]
    elif rate_code == 12:
        rate = bits.read(8) * 1000
    elif rate_code == 13:
        rate = bits.read(16)
    elif rate_code == 14:
        rate = bits.read(16) * 10
    else:
        raise ValueError("invalid FLAC sample-rate code 15")
    if rate != info["rate"]:
        raise ValueError("frame sample rate disagrees with STREAMINFO")
    if depth_code == 0:
        depth = info["bits"]
    elif depth_code in _DEPTH_BY_CODE:
        depth = _DEPTH_BY_CODE[depth_code]
    else:
        raise ValueError(f"reserved FLAC sample-size code {depth_code}")
    if depth != info["bits"]:
        raise ValueError("frame bit depth disagrees with STREAMINFO")
    if ch_code <= 7:
        nch = ch_code + 1
        mode = "indep"
    elif ch_code in (8, 9, 10):
        nch = 2
        mode = ("left", "right", "mid")[ch_code - 8]
    else:
        raise ValueError(f"reserved FLAC channel assignment {ch_code}")
    if nch != info["channels"]:
        raise ValueError("frame channel count disagrees with STREAMINFO")
    header_end = bits.byte + (1 if bits.bit else 0)
    if crc8(data[pos : header_end]) != data[header_end]:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    bits = _Bits(data, header_end + 1)

    sub = []
    for c in range(nch):
        extra = 1 if (
            (mode == "left" and c == 1)
            or (mode == "right" and c == 0)
            or (mode == "mid" and c == 1)
        ) else 0
        sub.append(_decode_subframe(bits, blocksize, depth + extra))
    bits.align()
    crc_pos = bits.byte
    if crc_pos + 2 > len(data):
        raise ValueError("FLAC frame footer truncated")
    (want,) = struct.unpack_from(">H", data, crc_pos)
    if crc16(data[pos:crc_pos]) != want:
        raise ValueError("FLAC frame CRC-16 mismatch")

    if mode == "indep":
        for c in range(nch):
            chans[c].extend(sub[c])
    elif mode == "left":
        for left, side in zip(sub[0], sub[1]):
            chans[0].append(left)
            chans[1].append(left - side)
    elif mode == "right":
        for side, right in zip(sub[0], sub[1]):
            chans[0].append(side + right)
            chans[1].append(right)
    else:  # mid/side
        for mid, side in zip(sub[0], sub[1]):
            m2 = (mid << 1) | (side & 1)
            chans[0].append((m2 + side) >> 1)
            chans[1].append((m2 - side) >> 1)
    return crc_pos + 2


def _decode_subframe(bits: _Bits, blocksize: int, depth: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        depth -= wasted
        if depth <= 0:
            raise ValueError("FLAC wasted bits exceed the sample depth")
    if stype == 0:  # CONSTANT
        v = bits.read_signed(depth)
        out = [v] * blocksize
    elif stype == 1:  # VERBATIM
        out = [bits.read_signed(depth) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = [bits.read_signed(depth) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, r in enumerate(resid):
            pred = sum(
                c * out[order + i - j - 1] for j, c in enumerate(coefs)
            )
            out.append(pred + r)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        out = [bits.read_signed(depth) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC QLP precision code 15")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        for i, r in enumerate(resid):
            pred = sum(
                c * out[order + i - j - 1] for j, c in enumerate(coefs)
            ) >> shift
            out.append(pred + r)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide the blocksize")
    out: list[int] = []
    for p in range(nparts):
        count = blocksize >> porder
        if p == 0:
            count -= order
            if count < 0:
                raise ValueError(
                    "FLAC predictor order exceeds the first partition"
                )
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend(0 for _ in range(count))
            else:
                out.extend(bits.read_signed(raw) for _ in range(count))
        else:
            for _ in range(count):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_flac(
    samples: "object",
    sample_rate: int,
    bits: int = 16,
    blocksize: int = 4096,
    stereo_mode: str = "auto",
) -> bytes:
    """Encode PCM to a spec-valid FLAC stream. ``samples`` is an int
    array shaped (n, channels) (or (n,) for mono); per frame each
    (sub)channel picks the cheapest of constant / verbatim / fixed
    orders 0-2 with a fitted rice parameter. ``stereo_mode``:
    "auto" (cost-pick per frame among independent/left/right/mid for
    2-channel input), or one of "indep"/"left"/"right"/"mid"."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[0] == 0 or not (1 <= a.shape[1] <= 8):
        raise ValueError("encode_flac takes (n, 1..8 channel) samples")
    if bits not in (8, 16, 24):
        raise NotImplementedError(f"{bits}-bit FLAC encoding unsupported")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if a.min() < lo or a.max() > hi:
        raise ValueError(f"samples exceed {bits}-bit range")
    if not (1 <= sample_rate < (1 << 20)):
        raise ValueError("sample rate must fit STREAMINFO's 20 bits")
    if not (16 <= blocksize <= 65535):
        raise ValueError("blocksize outside 16..65535")
    n, nch = a.shape
    if nch != 2 and stereo_mode not in ("auto", "indep"):
        raise ValueError("stereo decorrelation needs 2 channels")

    out = bytearray(b"fLaC")
    body = _BitsW()
    body.write(blocksize, 16)
    body.write(blocksize, 16)
    body.write(0, 24)
    body.write(0, 24)
    body.write(sample_rate, 20)
    body.write(nch - 1, 3)
    body.write(bits - 1, 5)
    body.write(n, 36)
    info_bits = bytes(body.out) + hashlib.md5(_pcm_bytes(a, bits)).digest()
    out += bytes((0x80, 0, 0, len(info_bits))) + info_bits

    frame_no = 0
    for start in range(0, n, blocksize):
        block = a[start : start + blocksize]
        out += _encode_frame(
            block, frame_no, sample_rate, nch, bits, blocksize, stereo_mode
        )
        frame_no += 1
    return bytes(out)


def _rice_cost(resid: list[int], param: int) -> int:
    return sum((((v << 1) ^ (v >> 63)) >> param) + 1 + param for v in resid)


def _best_rice(resid: list[int]) -> tuple[int, int]:
    """Cheapest 4-bit rice parameter for ``resid`` with its bit cost.

    Vectorized cost sweep (round 11): the scalar form re-walked the
    residual list 15 times per subframe plan and was the encoder's
    hottest path. The zigzag map and the per-parameter sums are exact
    int64 arithmetic (|residual| < 2^34 even for 32-bit audio, block
    sums < 2^50), and the ascending scan with a strict ``<`` keeps the
    identical lowest-parameter tie-break — parameter choice, cost, and
    therefore the emitted stream are unchanged (`_rice_cost` remains
    the scalar reference; equality asserted in tests/test_flac.py)."""
    import numpy as np

    if not len(resid):
        return 0, 0
    z = np.asarray(resid, dtype=np.int64)
    zz = (z << 1) ^ (z >> 63)
    n = int(zz.shape[0])
    best_p, best_c = 0, int(zz.sum()) + n
    for p in range(1, 15):
        c = int((zz >> p).sum()) + n * (1 + p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _plan_subframe(sig: list[int], depth: int):
    """Pick constant / fixed order 0-2 / verbatim for one channel;
    returns (kind, order, param, resid, cost_bits). The residual for
    fixed order k is the k-th forward difference; cost counts warmup
    samples + residual header + fitted rice bits against the verbatim
    baseline."""
    if all(v == sig[0] for v in sig):
        return ("constant", 0, 0, [], depth)
    best = ("verbatim", 0, 0, [], depth * len(sig))
    series = list(sig)
    for order in range(0, 3):
        if len(sig) <= order:
            break
        if order:
            series = [b - c for b, c in zip(series[1:], series[:-1])]
        p, cost = _best_rice(series)
        cost_total = depth * order + 2 + 4 + 4 + cost
        if cost_total < best[4]:
            best = ("fixed", order, p, list(series), cost_total)
    return best


def _encode_subframe(w: _BitsW, sig: list[int], depth: int) -> None:
    kind, order, param, resid, _ = _plan_subframe(sig, depth)
    w.write(0, 1)  # padding
    if kind == "constant":
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(sig[0], depth)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in sig:
            w.write_signed(v, depth)
        return
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    for v in sig[:order]:
        w.write_signed(v, depth)
    # residual: method 0 (4-bit rice), partition order 0
    w.write(0, 2)
    w.write(0, 4)
    w.write(param, 4)
    for v in resid:
        zz = (v << 1) if v >= 0 else ((-v << 1) - 1)
        w.unary(zz >> param)
        if param:
            w.write(zz & ((1 << param) - 1), param)


def _fixed_resid(sig: list[int], order: int) -> list[int]:
    series = list(sig)
    for _ in range(order):
        series = [b - c for b, c in zip(series[1:], series[:-1])]
    return series


def _encode_frame(
    block, frame_no: int, rate: int, nch: int, depth: int,
    declared_bs: int, stereo_mode: str,
) -> bytes:
    bs = block.shape[0]
    w = _BitsW()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed blocksize strategy (frame number coded)
    if bs == declared_bs and bs == 192:
        bs_code, bs_extra = 1, None
    elif bs == declared_bs and bs in (576, 1152, 2304, 4608):
        bs_code, bs_extra = 2 + (576, 1152, 2304, 4608).index(bs), None
    elif bs == declared_bs and bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
        bs_code = 8 + (256, 512, 1024, 2048, 4096, 8192, 16384, 32768).index(bs)
        bs_extra = None
    elif bs <= 256:
        bs_code, bs_extra = 6, bs - 1
    else:
        bs_code, bs_extra = 7, bs - 1
    w.write(bs_code, 4)
    if rate in _RATE_CODES:
        rate_code, rate_extra = _RATE_CODES[rate], None
    elif rate % 1000 == 0 and rate // 1000 < 256:
        rate_code, rate_extra = 12, rate // 1000
    elif rate < 65536:
        rate_code, rate_extra = 13, rate
    else:
        rate_code, rate_extra = 14, rate // 10
    w.write(rate_code, 4)

    cols = [list(map(int, block[:, c])) for c in range(nch)]
    mode = "indep"
    if nch == 2 and stereo_mode != "indep":
        left, right = cols
        side = [x - y for x, y in zip(left, right)]
        mid = [(x + y) >> 1 for x, y in zip(left, right)]
        if stereo_mode == "auto":
            # cheap cost proxy: summed |second difference| per form
            def cost(sig):
                return sum(abs(v) for v in _fixed_resid(sig, min(2, len(sig) - 1)))

            options = {
                "indep": cost(left) + cost(right),
                "left": cost(left) + cost(side),
                "right": cost(side) + cost(right),
                "mid": cost(mid) + cost(side),
            }
            mode = min(options, key=lambda k: (options[k], k))
        else:
            mode = stereo_mode
        if mode == "left":
            cols = [left, side]
        elif mode == "right":
            cols = [side, right]
        elif mode == "mid":
            cols = [mid, side]
    ch_code = {"indep": nch - 1, "left": 8, "right": 9, "mid": 10}[mode]
    w.write(ch_code, 4)
    w.write(_DEPTH_CODES[depth], 3)
    w.write(0, 1)
    _write_coded_number(w, frame_no)
    if bs_extra is not None:
        w.write(bs_extra, 8 if bs_code == 6 else 16)
    if rate_extra is not None:
        w.write(rate_extra, 8 if rate_code == 12 else 16)
    w.align()
    header = bytes(w.out)
    header += bytes([crc8(header)])

    body = _BitsW()
    for c, sig in enumerate(cols):
        extra = 1 if (
            (mode == "left" and c == 1)
            or (mode == "right" and c == 0)
            or (mode == "mid" and c == 1)
        ) else 0
        _encode_subframe(body, sig, depth + extra)
    body.align()
    frame = header + bytes(body.out)
    return frame + struct.pack(">H", crc16(frame))
