"""Multimodal column plumbing (north-star).

Images/audio/video are opaque ``binary`` payload columns with typed
metadata (schemas.MULTIMODAL_ASSET_SCHEMA). The Spark-side plumbing —
schema, partitioning, Arrow batch shape, UDF signatures — is real and
tested. Since round 7 the pixel decode itself is REAL for uncompressed
formats (``decode_image`` parses binary PPM/PGM and 24-bit BMP with
pure numpy, verified against an arithmetic oracle by the
``multimodal_image_decode`` query); since round 9 it is also real for
PNG — every 8-bit color type (gray/RGB/palette/gray+alpha/RGBA) in
both progressive modes (non-interlaced and Adam7) via stdlib ``zlib``
inflate + numpy unfiltering of all four scanline filters, verified by
the ``multimodal_png_decode`` query. Only codecs whose *entropy
coding* genuinely needs a library (JPEG/GIF/WebP/audio/video) remain
the declared capability gate. ``extract_features`` keeps the deterministic
hash featurizer so its oracle stays engine-reproducible.

Scale notes: payloads ride through ``mapInPandas`` as Arrow record
batches — the decode stage is embarrassingly parallel and IO-bound, so
the right partitioning is by input file (no shuffle at all); metadata-
only transformations (filtering by mime/size, sampling) stay pure
column ops and never deserialize the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Build a deterministic multimodal asset table from ``documents``
    (payload = utf-8 bytes of the text standing in for media bytes)."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
    )


#: extension -> (modality, mime) for file-based asset ingest
_EXT_MODALITY = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
}


def ingest_binary_assets(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest media files as opaque binary assets via Spark's built-in
    ``binaryFile`` source — the real-world on-ramp for image/audio/video
    at scale: each file becomes one row (path, modificationTime, length,
    content) with NO decode, read in parallel across executors, one
    task per file group. Modality/mime derive from the extension;
    ``asset_id`` is the 48-bit path hash (stable across re-runs, so
    downstream dedup/joins key on it deterministically).

    The ``length`` metadata column comes from the file system, so
    size-based filtering (e.g. skip >100 MB payloads) can prune BEFORE
    content is materialized — push such filters on ``n_bytes`` here,
    not after a decode stage."""
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality = F.lit(None).cast("string")
    mime = F.lit("application/octet-stream")
    for e, (m, mt) in sorted(_EXT_MODALITY.items()):
        modality = F.when(ext == e, m).otherwise(modality)
        mime = F.when(ext == e, mt).otherwise(mime)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.conv(F.substring(F.md5(F.col("path")), 1, 12), 16, 10)
            .cast("bigint")
            .alias("asset_id"),
            modality.alias("modality"),
            F.col("content").alias("payload"),
            mime.alias("mime_type"),
            F.col("path").alias("source_path"),
            F.col("length").cast("bigint").alias("n_bytes"),
        )
    )


def _ppm_header(payload: bytes, ch: int) -> tuple[int, int, int, int]:
    """Parse a binary netpbm header: (width, height, maxval, raster
    offset). Tokens are decimal runs separated by whitespace and/or
    '#'-to-newline comments ('#' may sit flush against a digit — it
    terminates the token). The raster delimiter is genuinely ambiguous
    when a comment trails the maxval (the raster is arbitrary binary,
    so 'space then #' could be either a header comment or pixel
    bytes); the EXACT raster length w*h*ch is the disambiguator —
    well-formed writers emit exactly that many bytes, so the candidate
    offset (strict single-whitespace vs comment-skipping) leaving
    exactly the raster is chosen, falling back to whichever leaves
    enough bytes, and raising (never silently misreading) when neither
    does."""
    L = len(payload)
    tokens: list[int] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < L:
            b = payload[i : i + 1]
            if b.isspace():
                i += 1
            elif b == b"#":
                while i < L and payload[i] != 0x0A:
                    i += 1
            else:
                break
        j = i
        while j < L and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed netpbm header")
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    need = w * h * ch
    strict = i + 1 if i < L and payload[i : i + 1].isspace() else None
    # lenient candidate ONLY when a comment trails the maxval (after an
    # optional whitespace run): each comment's terminating newline is
    # the delimiter, and nothing beyond it is consumed — the raster is
    # arbitrary binary, so eating "whitespace-valued" pixel bytes here
    # would silently shift the offset
    lenient = None
    k = i
    while k < L and payload[k : k + 1].isspace():
        k += 1
    while k < L and payload[k : k + 1] == b"#":
        while k < L and payload[k] != 0x0A:
            k += 1
        k += 1  # past the comment's newline — a valid delimiter
        lenient = k
    for cand in (strict, lenient):
        if cand is not None and L - cand == need:
            return w, h, maxval, cand
    for cand in (strict, lenient):
        if cand is not None and L - cand >= need:
            return w, h, maxval, cand
    raise ValueError("netpbm raster truncated")


#: DIB header sizes sharing BITMAPINFOHEADER's field layout for
#: everything this decoder reads (V2/V3/V4/V5 are supersets)
_BMP_INFO_SIZES = {40, 52, 56, 108, 124}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: IHDR color type -> bytes per pixel at bit depth 8 (palette pixels
#: are 1-byte indices into PLTE, resolved after unfiltering)
_PNG_COLOR_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid (spec §8.2): (x_start, y_start, x_step, y_step).
#: Each pass is an independently-filtered sub-image; empty passes
#: (zero rows or columns at this size) contribute NO bytes at all.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; raises ValueError on a
    structurally truncated stream. CRCs are NOT verified — the zlib
    inflate and exact-raster-length checks downstream catch real
    corruption, and skipping the CRC pass keeps the hot decode loop
    one linear scan."""
    import struct

    L, i = len(payload), 8
    while i < L:
        if i + 8 > L:
            raise ValueError("PNG chunk header truncated")
        (n,) = struct.unpack_from(">I", payload, i)
        typ = payload[i + 4 : i + 8]
        if i + 8 + n + 4 > L:
            raise ValueError(f"PNG chunk {typ!r} truncated")
        yield typ, payload[i + 8 : i + 8 + n]
        i += 12 + n
        if typ == b"IEND":
            return
    raise ValueError("PNG stream ended without IEND")


def _png_unfilter(raw: bytes, h: int, w: int, ch: int) -> "object":
    """Reverse the four PNG scanline filters (spec §9: None/Sub/Up/
    Average/Paeth) over the inflated byte stream — returns an (h,
    w*ch) uint8 array. Sub is vectorized as a per-lane cumsum (mod
    256 distributes over the running sum); Up is a whole-row add;
    Average/Paeth carry a true left-to-right data dependence, so they
    walk pixels — each step still vectorized across the ch channel
    bytes. A filter byte outside 0..4 raises (never silently treated
    as None: that is exactly the misread class _ppm_header designs
    out)."""
    import numpy as np

    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG inflated stream is {len(raw)} bytes, expected "
            f"{h * (1 + stride)} (IDAT truncated or dims lie)"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    zeros = np.zeros(ch, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:
            rec = row
        elif ft == 1:
            rec = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride)
        elif ft == 2:
            rec = row + prev
        elif ft in (3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                a = rec[(x - 1) * ch : x * ch] % 256 if x else zeros
                b = prev[sl]
                if ft == 3:
                    rec[sl] = row[sl] + (a + b) // 2
                else:
                    c = prev[(x - 1) * ch : x * ch] if x else zeros
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    rec[sl] = row[sl] + pred
        else:
            raise ValueError(f"bad PNG filter byte {ft} on scanline {y}")
        out[y] = (rec % 256).astype(np.uint8)
    return out


def _adam7_unfilter(raw: bytes, h: int, w: int, ch: int) -> "object":
    """De-interlace an Adam7 stream: unfilter each pass's sub-image
    independently (filters reference only bytes within their own
    pass) and scatter it into the full image on the pass's stride
    grid. Trailing/partial-pass truncation raises loudly."""
    import numpy as np

    out = np.empty((h, w, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        n = ph * (1 + pw * ch)
        sub = _png_unfilter(raw[pos : pos + n], ph, pw, ch).reshape(ph, pw, ch)
        out[y0::dy, x0::dx] = sub
        pos += n
    if pos != len(raw):
        raise ValueError(
            f"Adam7 stream is {len(raw)} bytes, passes consume {pos} "
            "(IDAT truncated or padded)"
        )
    return out


def decode_png(payload: bytes) -> "object":
    """Pure numpy + stdlib-zlib PNG decode for 8-bit PNGs of EVERY
    color type — grayscale / RGB / palette / gray+alpha / RGBA (0/2/
    3/4/6) — in both progressive modes (non-interlaced and Adam7).
    IHDR is parsed, IDAT chunks are concatenated and inflated (PNG's
    DEFLATE layer IS stdlib zlib — no image library involved), the
    four scanline filters are reversed in numpy, Adam7 passes are
    de-interlaced onto their stride grids, and palette indices are
    resolved through PLTE. Sub-byte and 16-bit depths raise
    NotImplementedError (the decode contract is uint8 arrays), as
    does palette transparency (tRNS — silently dropping alpha would
    be a misread); structural corruption (truncated IDAT, bad filter
    byte, short chunks, out-of-range palette index) raises ValueError
    loudly.

    Returns HxW uint8 for grayscale, HxWxC for multi-channel images
    (palette resolves to HxWx3) — always a fresh writable array."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = plte = trns = None
    idat = []
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat.append(data)
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG IHDR missing or malformed")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG compression/filter method {comp}/{filt} invalid")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    if depth != 8 or color not in _PNG_COLOR_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {color} not supported "
            "(8-bit samples only — the decode contract is uint8)"
        )
    if color == 3:
        if plte is None or not plte or len(plte) % 3:
            raise ValueError("palette PNG with missing/malformed PLTE")
        if trns is not None:
            raise NotImplementedError(
                "palette transparency (tRNS) not supported — dropping "
                "alpha silently would be a misread"
            )
    if w <= 0 or h <= 0:
        raise ValueError("PNG dimensions must be positive")
    if not idat:
        raise ValueError("PNG has no IDAT chunk")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as ex:
        raise ValueError(f"PNG IDAT inflate failed: {ex}") from ex
    ch = _PNG_COLOR_CHANNELS[color]
    if interlace:
        arr = _adam7_unfilter(raw, h, w, ch)
    else:
        arr = _png_unfilter(raw, h, w, ch).reshape(h, w, ch)
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError(
                f"palette index {int(idx.max())} out of range "
                f"(PLTE has {pal.shape[0]} entries)"
            )
        return pal[idx].copy()
    return arr[:, :, 0].copy() if ch == 1 else arr.copy()


def _filter_scanlines(img: "object", policy: str) -> list[bytes]:
    """Filter one (sub-)image's scanlines per the spec: row y under
    ``policy='cycle'`` gets filter y%5 (deliberately exercising ALL
    FIVE filters so a round-trip proves every unfilter branch);
    ``'none'`` emits filter 0 everywhere. Filtering operates on raw
    values (recon == raw for a lossless codec), one numpy shot per
    row."""
    import numpy as np

    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int64)
    zeros_row = np.zeros(w * ch, dtype=np.int64)
    lines = []
    for y in range(h):
        raw = flat[y]
        prev = flat[y - 1] if y else zeros_row
        left = np.concatenate([np.zeros(ch, dtype=np.int64), raw[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        ft = (y % 5) if policy == "cycle" else 0
        if ft == 0:
            f = raw
        elif ft == 1:
            f = raw - left
        elif ft == 2:
            f = raw - prev
        elif ft == 3:
            f = raw - (left + prev) // 2
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            f = raw - pred
        lines.append(bytes([ft]) + (f % 256).astype(np.uint8).tobytes())
    return lines


def encode_png(
    arr: "object",
    filter_policy: str = "cycle",
    interlace: bool = False,
    palette: "object | None" = None,
) -> bytes:
    """Encode a uint8 numpy array as an 8-bit PNG. Input is HxW gray
    or HxWxC for C in 2/3/4 — or, with ``palette`` (a (P,3) uint8
    color table, P <= 256), an HxW array of palette INDICES written
    as color type 3 with a PLTE chunk. ``interlace=True`` writes
    Adam7: each of the seven passes is extracted on its stride grid
    and filtered as an independent sub-image (empty passes emit no
    bytes), exactly the layout ``_adam7_unfilter`` reverses. See
    ``_filter_scanlines`` for the filter policy."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        if a.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3 or len(pal) > 256:
            raise ValueError("palette encode needs HxW indices and a (P<=256,3) table")
        if int(a.max()) >= len(pal):
            raise ValueError("palette index out of range")
        color = 3
        a = a[:, :, None]
    else:
        if a.ndim == 2:
            a = a[:, :, None]
        color = {1: 0, 2: 4, 3: 2, 4: 6}[a.shape[2]]
    h, w = a.shape[:2]
    if interlace:
        lines = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines.extend(_filter_scanlines(sub, filter_policy))
    else:
        lines = _filter_scanlines(a, filter_policy)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", pal.tobytes())
    return out + chunk(b"IDAT", zlib.compress(b"".join(lines))) + chunk(b"IEND", b"")


def decode_image(payload: bytes) -> object:
    """Decode an image payload to a uint8 numpy array — HxWxC for
    multi-channel (C in 2/3/4), HxW for grayscale; always a fresh
    WRITABLE array (never a read-only view over the payload buffer).
    REAL (pure-numpy) for binary PPM (P6, RGB), binary PGM (P5,
    grayscale), uncompressed 24-bit bottom-up BMP with a
    BITMAPINFOHEADER-family DIB header, and — since round 9 — 8-bit
    PNG of every color type in both progressive modes via stdlib
    zlib + numpy unfiltering (``decode_png``). Codecs whose entropy
    coding genuinely needs a library (JPEG/GIF/WebP/...) remain the
    declared capability gate — wire
    ``PIL.Image.open(io.BytesIO(payload))`` there on a real cluster.
    Malformed payloads raise ValueError loudly — silent misreads are
    designed out (see ``_ppm_header``).

    Round 7: previously the WHOLE function was the gate; round 9
    narrowed it to entropy-coded formats only."""
    import numpy as np

    magic = bytes(payload[:2])
    if magic in (b"P6", b"P5"):
        ch = 3 if magic == b"P6" else 1
        w, h, maxval, off = _ppm_header(payload, ch)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm not supported")
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
        arr = raster.reshape(h, w, ch).copy()  # writable, detached
        return arr[:, :, 0] if ch == 1 else arr
    if magic == b"BM":
        import struct

        if len(payload) < 34:
            raise ValueError("BMP header truncated")
        dib = struct.unpack_from("<I", payload, 14)[0]
        if dib not in _BMP_INFO_SIZES:
            raise NotImplementedError(
                f"BMP DIB header size {dib} (e.g. OS/2 BITMAPCOREHEADER) "
                "is not supported without an image library"
            )
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bits = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bits != 24 or comp != 0 or h <= 0 or w <= 0:
            raise NotImplementedError(
                "only uncompressed 24-bit bottom-up BMP is supported "
                "without an image library"
            )
        stride = (w * 3 + 3) // 4 * 4  # rows padded to 4 bytes
        if len(payload) < off + stride * h:
            raise ValueError("BMP raster truncated")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up -> top-down
        return bgr[:, :, ::-1].copy()  # BGR -> RGB
    if bytes(payload[:8]) == _PNG_SIG:
        return decode_png(bytes(payload))
    raise NotImplementedError(
        "entropy-coded image formats (JPEG/GIF/WebP) require an image "
        "library not present in this container; wire "
        "PIL.Image.open(io.BytesIO(payload)) here"
    )


DECODE_SCHEMA = (
    "asset_id bigint, width int, height int, n_channels int, pixel_sum bigint"
)


def decode_image_features(assets: DataFrame) -> DataFrame:
    """REAL decode stage over ``mapInPandas``: each ``payload`` is
    parsed by ``decode_image`` (pure numpy for uncompressed formats)
    and reduced to exact-integer facts — dimensions, channel count,
    and the uint8 pixel sum (order-independent, so it hash-compares
    bitwise against an arithmetic oracle). Input contract: columns
    ``asset_id`` and ``payload``. NULL and UNDECODABLE payloads
    (malformed bytes, gated codecs) produce NULL facts rather than
    killing the Arrow batch — one bad asset must not take the other
    thousands in its batch down with it (the extract_features
    contract); a curation filter on ``width IS NULL`` isolates them
    downstream. The decode is embarrassingly parallel: payloads never
    shuffle, each batch decodes where it was read."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            width, height, nch, psum = [], [], [], []
            for b in pdf["payload"]:
                arr = None
                if b is not None:
                    try:
                        arr = decode_image(bytes(b))
                    except (ValueError, NotImplementedError, IndexError):
                        arr = None  # undecodable -> NULL facts
                if arr is None:
                    width.append(None); height.append(None)
                    nch.append(None); psum.append(None)
                    continue
                h, w = arr.shape[:2]
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                width.append(w); height.append(h); nch.append(ch)
                # sum with an int64 accumulator, no 8x int64 copy of
                # the pixel buffer
                psum.append(int(arr.sum(dtype="int64")))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "n_channels": pd.array(nch, dtype="Int32"),
                    "pixel_sum": pd.array(psum, dtype="Int64"),
                }
            )

    return assets.mapInPandas(run, DECODE_SCHEMA)


FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, feature_hash bigint"
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Featurize payloads via mapInPandas (Arrow-batched).

    The stub feature is deterministic (payload length + 48-bit content
    hash) so tests can assert exact values; a real featurizer returns an
    embedding array in the same batch shape. A NULL payload featurizes
    to NULL features (edge-replay finding: ``len(None)`` crashed the
    whole Arrow batch — one bad asset must not kill the pipeline).
    """
    import hashlib

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    "feature_hash": pd.array(
                        [
                            None
                            if b is None
                            else int(
                                hashlib.md5(bytes(b)).hexdigest()[:12], 16
                            )
                            for b in payloads
                        ],
                        dtype="Int64",
                    ),
                }
            )

    return assets.mapInPandas(featurize, FEATURE_SCHEMA)


def extract_features_arrow(assets: DataFrame) -> DataFrame:
    """Same featurization via ``mapInArrow`` — the zero-copy path for
    binary-heavy columns: payload bytes stay in the Arrow buffers
    (``binary_length`` is a vectorized kernel over offsets; the hash
    reads each value's buffer view) instead of being copied into pandas
    Python objects per row. For multi-MB media payloads the
    pandas-conversion copy is the dominant cost — this variant removes
    it. Output is bit-identical to ``extract_features``."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    def featurize(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            payload = batch.column(batch.schema.get_field_index("payload"))
            # NULL payload -> NULL hash (pc.binary_length already
            # propagates the null natively)
            hashes = pa.array(
                (
                    int(
                        hashlib.md5(v.as_buffer().to_pybytes()).hexdigest()[:12],
                        16,
                    )
                    if v.is_valid
                    else None
                    for v in payload
                ),
                type=pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("asset_id")),
                    batch.column(batch.schema.get_field_index("modality")),
                    pc.cast(pc.binary_length(payload), pa.int64()),
                    hashes,
                ],
                names=["asset_id", "modality", "n_bytes", "feature_hash"],
            )

    return assets.mapInArrow(featurize, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id bigint, modality string, target_w int, target_h int, "
    "payload binary, n_bytes_out bigint"
)


def resize_images(assets: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stage for image payloads via mapInPandas — the Arrow
    plumbing (binary in, binary out, metadata columns alongside) is
    real; the pixel work is the deterministic STUB (no image libs in
    this container): output payload = the first ``target_w * target_h
    // 64`` bytes of the input, standing in for a real
    ``PIL.Image.resize`` whose output would flow through the identical
    batch shape. Image-only rows are filtered BEFORE the UDF, so
    non-image payloads never cross the Arrow boundary."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = max(target_w * target_h // 64, 1)
        for pdf in batches:
            out = pdf["payload"].map(lambda b: bytes(b)[:n_out])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": out,
                    "n_bytes_out": out.map(len).astype("int64"),
                }
            )

    return (
        assets.filter(F.col("modality") == "image")
        .mapInPandas(do_resize, RESIZE_SCHEMA)
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode (asset_id, frame_ts) rows for
    a downstream decoder — pure column ops; the decode itself is the
    stubbed stage."""
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn("duration_ms", F.length("payload").cast("bigint") * 10)
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
