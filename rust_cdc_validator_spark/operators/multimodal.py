"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The codec libraries (PIL/librosa/ffmpeg) are NOT available in this
container, so COMPRESSED media decoding is stubbed — either raising
NotImplementedError (``strict=True``) or producing deterministic fake
features (default, for tests). Formats whose compression lives in the
stdlib need no codec: :func:`decode_image_pixels` is a REAL pure-numpy
decoder for BMP (24/32-bit BI_RGB), PPM/PGM (binary P6/P5), 8/16-bit
PNG including palette+tRNS and Adam7 interlacing (zlib IDAT inflate +
per-pass scanline unfilter), GIF 87a/89a first frames (real LZW,
de-interlace, transparency — r12), and baseline TIFF (both byte orders,
strips, PackBits RLE — r12); :func:`image_channel_stats` feeds real per-channel
pixel statistics through the same Arrow-batched path. JPEG's Huffman/DCT
entropy coder is the remaining honest raise. Everything Spark-side is real and
scale-correct: schemas, batch iteration, partition sizing, and the UDF
signatures match what a production decode stage needs. Swap
``_decode_stub`` for a codec-backed decoder and nothing else changes.

Batch shape: mapInPandas receives an iterator of Arrow record batches
(spark.sql.execution.arrow.maxRecordsPerBatch rows each); heavy media work
should re-chunk by byte size, which ``media_features`` demonstrates.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, kind: str, strict: bool) -> list[float]:
    """Deterministic fake feature vector (8 floats from sha256 bytes).

    A real implementation decodes the media (PIL image resize → CNN embed,
    audio resample → spectrogram, video frame-sample) — gated off here
    because the decode libs aren't installed.
    """
    if strict:
        raise NotImplementedError(
            f"media decode for kind={kind!r} requires image/audio libs "
            "not present in this environment"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:8]]


def media_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Extract per-media features via Arrow-batched mapInPandas.

    Input must conform to MEDIA_SCHEMA (extra columns pass through untouched
    is NOT supported — project first). Output: FEATURE_SCHEMA.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, strict)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "content_sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.select([f.name for f in MEDIA_SCHEMA.fields]).mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def binary_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Cheap metadata pass over any binary column — pure built-ins, no UDF:
    byte length + sha2 digest, the triage step before expensive decode."""
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("content_sha256"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling: one output row per (media_id, frame_ts).

    Pure relational expansion (sequence + explode) — the decode of each
    sampled frame is the stubbed stage. Demonstrates how a 100 TB video
    corpus fans out to frame work items without driver involvement.
    """
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

# JPEG start-of-frame markers that carry dimensions (C4/C8/CC are
# DHT/JPG/DAC — length-bearing but not frames)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _parse_image_header(b: bytes | None):
    """(format, width, height) from raw bytes — pure stdlib, NO decode
    libs: container headers (PNG IHDR, GIF logical screen, BMP info
    header, JPEG SOF marker walk) carry dimensions in the first bytes.
    Unknown/corrupt bytes → (None, None, None); a recognized container
    with a truncated/corrupt dimension block → (format, None, None)."""
    import struct

    if not b:
        return (None, None, None)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h)
        return ("png", None, None)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h)
        return ("gif", None, None)
    if b[:2] == b"BM":
        if len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down rows
        return ("bmp", None, None)
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        try:
            arr_dims = _tiff_dims(b)
        except ValueError:
            return ("tiff", None, None)
        return ("tiff", arr_dims[0], arr_dims[1])
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 3 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > len(b):
                break
            (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker in _JPEG_SOF:
                if i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", w, h)
                break
            if seglen < 2:
                break  # corrupt length: bail rather than loop
            i += 2 + seglen
        return ("jpeg", None, None)
    return (None, None, None)


def image_meta(df: DataFrame, id_col: str = "media_id", bin_col: str = "payload") -> DataFrame:
    """REAL (non-stub) image metadata extraction: container format and
    pixel dimensions parsed from the binary header bytes — the
    resolution/format gate every multimodal ingest runs before paying for
    decode (drop icons, flag corrupt files, route by container). Pure
    stdlib header parsing inside an Arrow-batched ``mapInPandas``; the
    payload column never leaves the executor and only (id, format, w, h)
    rows come back. PNG/GIF/BMP/JPEG; anything else → NULL format.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_image_header(p) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        gen, schema=IMAGE_META_SCHEMA
    )


def _png_paeth(a: int, up: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4) — byte-exact reference form."""
    p = a + up - c
    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return up
    return c


def _decode_png(b: bytes):
    """Pure stdlib+numpy PNG decode: chunk walk, zlib-inflated IDAT,
    per-scanline unfilter (types 0-4). Supports ALL non-interlaced 8-bit
    color types — gray (1ch), gray+alpha (2), RGB (3), RGBA (4), and
    palette (r12: indices unfilter as a 1-channel raster, then map
    through PLTE, with tRNS alpha → RGBA when present), at 8- or 16-bit
    depth, interlaced (Adam7, r12: per-pass unfilter + grid scatter) or
    not; sub-byte depths raise NotImplementedError.
    Filters None/Sub/Up are vectorized (Sub is a wrap-around prefix sum
    per byte lane); Average/Paeth fall back to the spec's sequential
    form — correctness over speed for the feature-extraction thumbnails
    this path serves."""
    import struct
    import zlib

    import numpy as np

    pos, ihdr, idat, plte, trns = 8, None, [], None, None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("missing PNG IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if w <= 0 or h <= 0:
        raise ValueError("degenerate PNG dimensions")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    # color type 3 (palette): the raster is ONE index byte per pixel,
    # unfiltered like any other 1-channel image, then mapped through PLTE
    # (+ tRNS alpha when present) after the unfilter pass below
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"sub-byte depth invalid for PNG color type {ctype}")
    if ctype == 3:
        if depth == 16:
            raise ValueError("palette PNG cannot be 16-bit")
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG without a valid PLTE chunk")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if not idat:
        raise ValueError("missing PNG IDAT")
    # the spec's filter unit in BYTES (sub-byte depths filter with a
    # 1-byte left offset, §9.2); per-row stride rounds up to whole bytes
    bpp = max(1, channels * depth // 8)

    def _stride(pw: int) -> int:
        return (pw * channels * depth + 7) // 8

    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:  # Adam7: (x0, y0, xstep, ystep) per pass, empty passes skipped
        passes = [
            (x0, y0, xs, ys, -(-(w - x0) // xs), -(-(h - y0) // ys))
            for x0, y0, xs, ys in (
                (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
            )
            if x0 < w and y0 < h
        ]
        passes = [p for p in passes if p[4] > 0 and p[5] > 0]
    need = sum(ph * (_stride(pw) + 1) for *_xy, pw, ph in passes)
    # Decompression is CAPPED at the declared raster size: a crafted
    # IDAT (zlib bomb) can otherwise inflate a few KiB to gigabytes and
    # OOM the executor before the length check ever runs. A conformant
    # stream inflates to exactly `need` bytes, so anything left
    # unconsumed after the cap is a spec violation, not data we ignore.
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), need)
        if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
            raise ValueError("PNG IDAT inflates past the declared raster size")
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT stream") from exc
    if len(raw) < need:
        raise ValueError("truncated PNG raster")
    def _unfilter_pass(raw_slice, ph, pw):
        """Unfilter one pass and expand to (ph, pw, channel-bytes):
        sub-byte depths unpack bit-packed samples (MSB-first, trailing
        pad bits dropped per row) to one byte per sample."""
        flat = _png_unfilter_raster(raw_slice, ph, _stride(pw), bpp)
        if depth >= 8:
            return flat.reshape(ph, pw, bpp)
        bits = np.unpackbits(flat, axis=1)
        samples = bits.reshape(ph, -1, depth)
        vals = np.zeros((ph, samples.shape[1]), dtype=np.uint8)
        for k in range(depth):
            vals = (vals << 1) | samples[:, :, k]
        return vals[:, : pw * channels].reshape(ph, pw, channels)

    if interlace == 0:
        raster = _unfilter_pass(raw, h, w)
    else:
        # each pass is an independent sub-image (its own scanline
        # filtering); unfilter then scatter into the full raster grid
        raster = np.zeros((h, w, max(bpp, channels)), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys, pw, ph in passes:
            span = ph * (_stride(pw) + 1)
            raster[y0::ys, x0::xs] = _unfilter_pass(
                raw[off : off + span], ph, pw
            )
            off += span
    if depth == 16:  # big-endian sample pairs -> uint16 channels
        raster = (
            raster[:, :, 0::2].astype(np.uint16) << 8
        ) | raster[:, :, 1::2]
    if ctype != 3:
        return raster
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = raster.reshape(h, w)
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("PNG palette index out of range")
    rgb = pal[idx]
    if trns is None:
        return rgb
    alpha_tab = np.full(pal.shape[0], 255, dtype=np.uint8)
    alpha_tab[: min(len(trns), pal.shape[0])] = np.frombuffer(
        trns[: pal.shape[0]], dtype=np.uint8
    )
    return np.dstack([rgb, alpha_tab[idx]])


def _png_unfilter_raster(raw, h, stride, bpp):
    """Unfilter one PNG (sub-)raster: ``raw`` is h scanlines of
    (1 filter byte + ``stride`` data bytes), ``bpp`` the spec's filter
    unit in bytes (= max(1, channels·depth/8) — sub-byte depths filter
    with a 1-byte left offset per spec §9.2); returns (h, stride) uint8.
    Shared by the non-interlaced path and each Adam7 pass (every pass
    filters independently per spec §8.2). None/Sub/Up vectorized (Sub is
    a wrap-around prefix sum per byte lane); Average/Paeth runs go
    through the anti-diagonal wavefront helper."""
    import numpy as np

    rows = np.frombuffer(
        raw, dtype=np.uint8, count=h * (stride + 1)
    ).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    bad = ftypes[ftypes > 4]
    if bad.size:
        raise ValueError(f"invalid PNG filter type {int(bad[0])}")
    data = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    y = 0
    while y < h:
        f = int(ftypes[y])
        if f >= 3:
            # Average/Paeth: maximal run of consecutive rows, one
            # anti-diagonal wavefront (vectorized; see helper)
            y2 = y + 1
            while y2 < h and ftypes[y2] >= 3:
                y2 += 1
            _png_unfilter_avg_paeth_run(
                data[y:y2], ftypes[y:y2], out, y, stride // bpp, bpp
            )
            y = y2
            continue
        row = data[y].copy()
        if f == 1:  # Sub: wrap-around prefix sum per byte lane
            for lane in range(bpp):
                np.add.accumulate(
                    row[lane::bpp], dtype=np.uint8, out=row[lane::bpp]
                )
        elif f == 2:  # Up
            row += out[y - 1] if y > 0 else 0
        out[y] = row
        y += 1
    return out


def _png_unfilter_avg_paeth_run(filt, ftypes, out, y0, w, channels):
    """Reconstruct a run of consecutive Average/Paeth scanlines by
    ANTI-DIAGONAL WAVEFRONT instead of the spec's per-byte recurrence.

    Both filters depend on left (same row), up (previous row), and —
    Paeth — upleft: for the pixel grid (run-row r, pixel x) every
    dependency of (r, x) lies on an EARLIER anti-diagonal (r + x - 1 or
    r + x - 2), so all pixels with equal r + x reconstruct together in
    one vectorized numpy step, channel lanes included. A run of R rows
    costs R + w - 1 numpy steps instead of R·w·channels Python-int
    iterations — the r11 sequential form made filter-3/4-heavy PNGs
    ~2 orders of magnitude slower than filter-0/2 ones (measured ~40x
    on 256x256 RGB Paeth; see BENCH_NOTES r12). Exact integer
    arithmetic throughout: byte-identical to the spec recurrence
    (pinned by the roundtrip tests' per-filter planted images).

    ``rec`` carries one sentinel row (the previously reconstructed
    scanline, or zeros at the image top) and one sentinel column
    (left/upleft = 0 at x = 0, per spec)."""
    import numpy as np

    R = filt.shape[0]
    rec = np.zeros((R + 1, w + 1, channels), dtype=np.int32)
    if y0 > 0:
        rec[0, 1:] = out[y0 - 1].reshape(w, channels)
    fl = np.zeros((R + 1, w + 1, channels), dtype=np.int32)
    fl[1:, 1:] = filt.reshape(R, w, channels)
    is_avg = ftypes == 3
    any_avg = bool(is_avg.any())
    any_paeth = not bool(is_avg.all())
    for d in range(R + w - 1):
        rs = np.arange(max(1, d - w + 2), min(R, d + 1) + 1)
        xs = d - (rs - 1) + 1
        left = rec[rs, xs - 1]
        up = rec[rs - 1, xs]
        if any_paeth:
            ul = rec[rs - 1, xs - 1]
            p = left + up - ul
            pa = np.abs(p - left)
            pb = np.abs(p - up)
            pc = np.abs(p - ul)
            paeth = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
            )
        if not any_avg:
            pred = paeth
        elif not any_paeth:
            pred = (left + up) >> 1
        else:
            pred = np.where(is_avg[rs - 1][:, None], (left + up) >> 1, paeth)
        rec[rs, xs] = (fl[rs, xs] + pred) & 0xFF
    out[y0:y0 + R] = rec[1:, 1:].reshape(R, w * channels).astype(np.uint8)


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW decode (GIF89a spec appendix F), pure stdlib:
    LSB-first variable-width codes (min_code_size+1 … 12 bits), CLEAR
    resets the table, END terminates. Output is CAPPED at ``max_pixels``
    — a crafted stream (LZW bomb) cannot inflate past the image
    descriptor's declared size, the same guard as the PNG IDAT cap."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base: list[bytes | None] = [bytes([i]) for i in range(clear)] + [None, None]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    buf = bitcount = pos = 0
    n = len(data)
    while True:
        while bitcount < code_size:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream (no END code)")
            buf |= data[pos] << bitcount
            bitcount += 8
            pos += 1
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        bitcount -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("GIF LZW inflates past the declared image size")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif(b: bytes):
    """Pure stdlib+numpy GIF decode (87a/89a) of the FIRST image frame:
    logical screen descriptor, global/local color tables, extension-block
    walk (capturing GCE transparency), real LZW decompression
    (:func:`_gif_lzw_decode`), 4-pass de-interlace, palette lookup —
    RGB, or RGBA when the frame declares a transparent index. Returns
    the first frame's region (animations: later frames are composition
    state the feature-extraction path does not need — documented, not
    silently merged). Corrupt/truncated streams raise ValueError."""
    import struct

    import numpy as np

    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 << (packed & 0x07)
        if pos + 3 * ncol > len(b):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(b, np.uint8, 3 * ncol, pos).reshape(ncol, 3)
        pos += 3 * ncol
    transparent = None
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos + 1]
            pos += 2
            if label == 0xF9 and pos < len(b) and b[pos] >= 4:
                if b[pos + 1] & 0x01:
                    transparent = b[pos + 4]
            while True:
                if pos >= len(b):
                    raise ValueError("truncated GIF extension sub-blocks")
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
        elif blk == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise ValueError("truncated GIF image descriptor")
            _left, _top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", b[pos + 1 : pos + 10]
            )
            pos += 10
            if iw == 0 or ih == 0:
                raise ValueError("degenerate GIF frame dimensions")
            pal = gct
            if ipacked & 0x80:
                ncol = 2 << (ipacked & 0x07)
                if pos + 3 * ncol > len(b):
                    raise ValueError("truncated GIF local color table")
                pal = np.frombuffer(b, np.uint8, 3 * ncol, pos).reshape(ncol, 3)
                pos += 3 * ncol
            if pal is None:
                raise ValueError("GIF frame without any color table")
            if pos >= len(b):
                raise ValueError("truncated GIF image data")
            mcs = b[pos]
            pos += 1
            chunks = []
            while True:
                if pos >= len(b):
                    raise ValueError("truncated GIF data sub-blocks")
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > len(b):
                    raise ValueError("truncated GIF data sub-block")
                chunks.append(b[pos : pos + sz])
                pos += sz
            idx_bytes = _gif_lzw_decode(b"".join(chunks), mcs, iw * ih)
            if len(idx_bytes) < iw * ih:
                raise ValueError("GIF LZW stream ends before the raster")
            idx = np.frombuffer(bytes(idx_bytes), np.uint8, iw * ih).reshape(
                ih, iw
            )
            if ipacked & 0x40:  # 4-pass interlace: rows are stored
                order = np.concatenate(
                    [np.arange(start, ih, step) for start, step in _GIF_INTERLACE_PASSES]
                )
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise ValueError("GIF palette index out of range")
            rgb = pal[idx]
            if transparent is not None and transparent < pal.shape[0]:
                alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                return np.dstack([rgb, alpha])
            return rgb
        elif blk == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
    raise ValueError("GIF contains no image data")


def _packbits_decode(data: bytes, expect: int) -> bytearray:
    """Apple PackBits RLE (TIFF compression 32773): n in 0..127 copies
    n+1 literal bytes, n in -127..-1 repeats the next byte 1-n times,
    -128 is a no-op. Bounded by ``expect`` so a crafted run can't
    inflate past the declared strip size."""
    out = bytearray()
    i = 0
    n_data = len(data)
    while i < n_data and len(out) < expect:
        n = data[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            if i + n + 1 > n_data:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= n_data:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) < expect:
        raise ValueError("PackBits strip shorter than declared raster")
    return out[:expect]


def _decode_tiff(b: bytes):
    """REAL baseline-TIFF decode, pure stdlib+numpy (TIFF 6.0 §2-§9):
    both byte orders, first-IFD walk, 8-bit grayscale (photometric 0/1)
    and RGB(A) (photometric 2, samples-per-pixel 3/4, contiguous planar
    config), strip-organized, compression 1 (none) or 32773 (PackBits —
    real RLE). Returns (h, w, c) uint8. Tiled layouts, palette color,
    16-bit samples, planar=2, and LZW/JPEG/Deflate compression raise
    NotImplementedError; corrupt structures raise ValueError."""
    import struct

    import numpy as np

    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("unrecognized image container")
    (ifd_off,) = struct.unpack(e + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack(e + "H", b[ifd_off : ifd_off + 2])
    type_width = {1: 1, 3: 2, 4: 4}
    type_fmt = {1: "B", 3: "H", 4: "I"}

    def read_tag(pos: int):
        tag, typ, cnt = struct.unpack(e + "HHI", b[pos : pos + 8])
        if typ not in type_width:
            return tag, None  # RATIONAL/ASCII etc — not needed here
        total = type_width[typ] * cnt
        if total <= 4:
            raw = b[pos + 8 : pos + 8 + total]
        else:
            (off,) = struct.unpack(e + "I", b[pos + 8 : pos + 12])
            if off + total > len(b):
                raise ValueError("TIFF tag value past end of file")
            raw = b[off : off + total]
        return tag, list(struct.unpack(e + type_fmt[typ] * cnt, raw))

    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        pos = ifd_off + 2 + 12 * k
        if pos + 12 > len(b):
            raise ValueError("truncated TIFF IFD entry")
        tag, vals = read_tag(pos)
        if vals is not None:
            tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from exc
    if w <= 0 or h <= 0:
        raise ValueError("degenerate TIFF dimensions")
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1])
    rows_per_strip = tags.get(278, [h])[0] or h
    planar = tags.get(284, [1])[0]
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    if planar != 1:
        raise NotImplementedError("planar TIFF (284=2) not supported")
    if photo == 3:
        raise NotImplementedError("palette TIFF not supported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if any(bv != 8 for bv in bits) or (photo == 2 and spp not in (3, 4)):
        raise NotImplementedError(
            "only 8-bit grayscale/RGB(A) TIFF is supported"
        )
    if photo in (0, 1) and spp != 1:
        raise NotImplementedError("extra-sample grayscale TIFF not supported")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} requires codec libs not present in "
            "this environment"
        )
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts length mismatch")
    row_bytes = w * spp
    raster = bytearray()
    remaining = h
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise ValueError("TIFF strip past end of file")
        strip_rows = min(rows_per_strip, remaining)
        expect = strip_rows * row_bytes
        chunk = b[off : off + cnt]
        if comp == 32773:
            raster += _packbits_decode(chunk, expect)
        else:
            if len(chunk) < expect:
                raise ValueError("truncated TIFF strip")
            raster += chunk[:expect]
        remaining -= strip_rows
    if remaining > 0:
        raise ValueError("TIFF strips cover fewer rows than declared")
    arr = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, spp)
    if photo == 0:  # WhiteIsZero: invert so 0 stays black like everywhere
        arr = 255 - arr
    return arr


def decode_image_pixels(b: bytes | None):
    """REAL pixel decode, pure stdlib+numpy — no codec libraries: BMP
    with BITMAPINFOHEADER, 24/32-bit BI_RGB (row stride padded to 4
    bytes, bottom-up unless height is negative, BGR(A) byte order),
    binary PPM/PGM (P6/P5, maxval ≤ 255, '#' comments), non-interlaced
    8-bit PNG (gray / gray+alpha / RGB / RGBA / palette+tRNS — stdlib
    ``zlib`` inflates IDAT, scanline filters 0-4 unfiltered per spec),
    GIF 87a/89a first frames (r12: REAL LZW decompression,
    variable-width LSB-first codes with clear/end handling, 4-pass
    de-interlace, GCE transparency → RGBA), and baseline TIFF (II/MM
    byte orders, 8-bit gray incl. WhiteIsZero and RGB(A), strip layout,
    compression 1/32773 with real PackBits RLE). Returns an (h, w, c)
    uint8 array in RGB(A)(/gray) channel order.

    JPEG (Huffman/DCT) RAISES NotImplementedError — the honest boundary:
    its entropy coder isn't in the stdlib. 16-bit / interlaced PNGs
    raise NotImplementedError likewise. Corrupt/truncated recognized
    containers raise ValueError; unrecognized bytes raise ValueError too
    (callers that want triage instead of exceptions use
    :func:`image_meta` / :func:`image_channel_stats`)."""
    import struct

    import numpy as np

    if not b:
        raise ValueError("empty payload")
    fmt, _, _ = _parse_image_header(b)
    if fmt == "png":
        return _decode_png(b)
    if fmt == "gif":
        return _decode_gif(b)
    if fmt == "tiff":
        return _decode_tiff(b)
    if fmt == "jpeg":
        raise NotImplementedError(
            "jpeg pixel decode requires codec libs not present in this "
            "environment (header metadata is available via image_meta)"
        )
    if b[:2] == b"BM":
        if len(b) < 34:
            raise ValueError("truncated BMP header")
        (data_off,) = struct.unpack("<I", b[10:14])
        w, h_raw = struct.unpack("<ii", b[18:26])
        (bpp,) = struct.unpack("<H", b[28:30])
        (compression,) = struct.unpack("<I", b[30:34])
        if compression != 0:
            raise NotImplementedError(
                f"compressed BMP (BI_ code {compression}) not supported"
            )
        if bpp not in (24, 32):
            raise NotImplementedError(f"{bpp}-bit BMP not supported")
        if w <= 0 or h_raw == 0:
            raise ValueError("degenerate BMP dimensions")
        h = abs(h_raw)
        bypp = bpp // 8
        stride = ((w * bypp + 3) // 4) * 4
        need = data_off + stride * h
        if len(b) < need:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)
        if h_raw > 0:
            rows = rows[::-1]  # bottom-up storage
        # BGR(A) -> RGB; the alpha/padding byte of 32-bit rows is dropped
        return np.ascontiguousarray(rows[:, :, 2::-1])
    if b[:2] in (b"P5", b"P6"):
        # token scanner: magic, width, height, maxval — whitespace
        # separated, '#' comments run to end of line
        pos, tokens = 2, []
        while len(tokens) < 3 and pos < len(b):
            c = b[pos : pos + 1]
            if c == b"#":
                nl = b.find(b"\n", pos)
                pos = len(b) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(b) and not b[end : end + 1].isspace():
                    end += 1
                tokens.append(b[pos:end])
                pos = end
        if len(tokens) < 3 or pos >= len(b):
            raise ValueError("truncated PNM header")
        pos += 1  # exactly one whitespace byte separates maxval and raster
        try:
            w, h, maxval = (int(t) for t in tokens)
        except ValueError as exc:
            raise ValueError("malformed PNM header") from exc
        if w <= 0 or h <= 0:
            raise ValueError("degenerate PNM dimensions")
        if maxval > 255:
            raise NotImplementedError("16-bit PNM not supported")
        c = 3 if b[:2] == b"P6" else 1
        need = w * h * c
        if len(b) - pos < need:
            raise ValueError("truncated PNM raster")
        return np.frombuffer(b, dtype=np.uint8, count=need, offset=pos).reshape(
            h, w, c
        )
    raise ValueError("unrecognized image container")


CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channel_mean", T.ArrayType(T.DoubleType()), True),
        T.StructField("channel_std", T.ArrayType(T.DoubleType()), True),
    ]
)


def image_channel_stats(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """REAL per-image channel statistics for every payload
    :func:`decode_image_pixels` can decode — (format, width, height,
    per-channel mean and population std over the actual pixels). Formats
    the environment can't decode (compressed containers, corrupt bytes)
    return their header-parsed format with NULL stats — triage semantics,
    so one bad file never kills a 100 TB ingest pass.

    Same scale shape as :func:`media_features`: Arrow-batched
    ``mapInPandas``, payload bytes never leave the executor, output is
    (id, format, dims, 2c doubles) per image; the pixel math is
    vectorized numpy per batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, means, stds = [], [], [], [], []
            for p in pdf[bin_col]:
                fmt, w, h = _parse_image_header(p)
                # PNM carries no magic _parse_image_header knows; name it
                if fmt is None and p and p[:2] in (b"P5", b"P6"):
                    fmt = "pnm"
                try:
                    px = decode_image_pixels(p)
                except (NotImplementedError, ValueError):
                    px = None
                if px is None:
                    ws.append(w)
                    hs.append(h)
                    means.append(None)
                    stds.append(None)
                else:
                    hs.append(px.shape[0])
                    ws.append(px.shape[1])
                    flat = px.reshape(-1, px.shape[2]).astype("float64")
                    means.append([float(x) for x in flat.mean(axis=0)])
                    stds.append([float(x) for x in flat.std(axis=0)])
                fmts.append(fmt)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channel_mean": means,
                    "channel_std": stds,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        gen, schema=CHANNEL_STATS_SCHEMA
    )


_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _ima_adpcm_decode_block(data, pred, index, n_nibbles):
    """One channel's nibble stream for one IMA ADPCM block (IMA 4:1
    spec / Microsoft WAVE_FORMAT_IMA_ADPCM): low nibble first, the
    canonical (2·delta+1)·step>>3 difference via the shift-add form.
    Sequential by definition (the predictor is the recurrence state) —
    per-payload Python, the same thumbnail-scale contract as the PNG
    Average/Paeth inner decode. Returns (samples, pred, index) so the
    stereo group interleave can carry channel state across groups."""
    out = []
    for i in range(n_nibbles):
        byte = data[i >> 1]
        nib = (byte & 0x0F) if i % 2 == 0 else (byte >> 4)
        step = _IMA_STEP_TABLE[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IMA_INDEX_TABLE[nib]))
        out.append(pred)
    return out, pred, index


def _decode_ima_adpcm(data: bytes, n_channels: int, block_align: int):
    """IMA ADPCM (WAV format tag 0x11) → int16 (n_frames, n_channels):
    per block and channel, a 4-byte header (int16 predictor = the first
    output sample, step index, reserved) followed by nibble data — mono
    blocks run contiguously, stereo interleaves 4-byte groups
    (8 nibbles) per channel. A short final block decodes the frames its
    bytes actually carry."""
    import struct

    import numpy as np

    header = 4 * n_channels
    if block_align <= header or (block_align - header) % (4 * n_channels):
        raise ValueError("invalid IMA ADPCM block alignment")
    frames_per_block = (block_align - header) * 2 // n_channels + 1
    chans = [[] for _ in range(n_channels)]
    pos = 0
    while pos + header <= len(data):
        block = data[pos : pos + block_align]
        pos += block_align
        preds, idxs = [], []
        for c in range(n_channels):
            pred, index, _rsv = struct.unpack(
                "<hBB", block[4 * c : 4 * c + 4]
            )
            if index > 88:
                raise ValueError("IMA ADPCM step index out of range")
            preds.append(pred)
            idxs.append(index)
            chans[c].append(pred)  # the header predictor IS sample 0
        body = block[header:]
        group_frames = 8  # one 4-byte group per channel = 8 nibbles
        n_body_frames = min(
            frames_per_block - 1, len(body) * 2 // n_channels
        )
        if n_channels == 1:
            vals, _, _ = _ima_adpcm_decode_block(
                body, preds[0], idxs[0], n_body_frames
            )
            chans[0].extend(vals)
        else:
            done = 0
            off = 0
            states = list(zip(preds, idxs))
            while done < n_body_frames and off + 4 * n_channels <= len(body):
                take = min(group_frames, n_body_frames - done)
                for c in range(n_channels):
                    seg = body[off + 4 * c : off + 4 * c + 4]
                    pred, index = states[c]
                    vals, pred, index = _ima_adpcm_decode_block(
                        seg, pred, index, take
                    )
                    chans[c].extend(vals)
                    states[c] = (pred, index)
                off += 4 * n_channels
                done += take
        if pos > len(data):
            break
    if not chans[0]:
        raise ValueError("empty IMA ADPCM stream")
    n = min(len(c) for c in chans)
    return np.stack([np.array(c[:n], dtype=np.int16) for c in chans], axis=1)


def decode_wav_pcm(b: bytes | None):
    """REAL audio decode for WAV — pure numpy, no codec libraries:
    RIFF/WAVE container, PCM (format 1), IEEE float (format 3), or IMA
    ADPCM (format 0x11 — r12: real block-structured 4-bit decode, mono
    and stereo group interleave), 8/16/32-bit integer or 32/64-bit
    float samples, chunk walker tolerant of extra chunks (LIST, fact,
    ...) and odd-length chunk padding. Returns (samples, sample_rate)
    with ``samples`` a float64 (n_frames, n_channels) array normalized
    to [-1, 1] for integer encodings.

    G.711 companded telephony codecs (format 6 = A-law, 7 = µ-law) are
    REAL decodes too — the expansion is a closed-form 256-entry table
    built from the CCITT segment arithmetic, no codec libs. Remaining
    compressed codecs inside WAV (MS-ADPCM, MP3-in-RIFF) RAISE
    NotImplementedError — the honest boundary; corrupt/truncated
    containers raise ValueError."""
    import struct

    import numpy as np

    if not b or len(b) < 12:
        raise ValueError("truncated RIFF header")
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("unrecognized audio container")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated WAV data chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if n_channels < 1:
        raise ValueError("degenerate WAV channel count")
    if audio_format == 0x11:  # IMA ADPCM — real block decode (r12)
        if bits != 4:
            raise ValueError(f"IMA ADPCM declares {bits}-bit samples")
        raw16 = _decode_ima_adpcm(data, n_channels, block_align)
        return raw16.astype("float64") / 32768.0, int(sample_rate)
    if audio_format in (6, 7):  # G.711 A-law / µ-law — table expand (r12)
        if bits not in (0, 8):
            raise ValueError(f"G.711 declares {bits}-bit samples")
        n = len(data) // n_channels
        if n == 0:
            raise ValueError("empty WAV data chunk")
        table = _alaw_table() if audio_format == 6 else _ulaw_table()
        lin = table[
            np.frombuffer(data, dtype=np.uint8, count=n * n_channels)
        ].reshape(n, n_channels)
        return lin.astype("float64") / 32768.0, int(sample_rate)
    if audio_format == 1:
        dtype = {8: np.uint8, 16: np.int16, 32: np.int32}.get(bits)
        if dtype is None:
            raise NotImplementedError(f"{bits}-bit PCM not supported")
    elif audio_format == 3:
        dtype = {32: np.float32, 64: np.float64}.get(bits)
        if dtype is None:
            raise NotImplementedError(f"{bits}-bit float WAV not supported")
    else:
        raise NotImplementedError(
            f"WAV format code {audio_format} requires codec libs not "
            "present in this environment"
        )
    width = bits // 8
    n = len(data) // (width * n_channels)
    if n == 0:
        raise ValueError("empty WAV data chunk")
    raw = np.frombuffer(
        data, dtype=dtype, count=n * n_channels
    ).reshape(n, n_channels)
    if audio_format == 1:
        if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
            samples = (raw.astype("float64") - 128.0) / 128.0
        else:
            samples = raw.astype("float64") / float(2 ** (bits - 1))
    else:
        samples = raw.astype("float64")
    return samples, int(sample_rate)


def _ulaw_table():
    """256-entry µ-law → linear int16 expansion (CCITT G.711
    ulaw2linear): invert, split sign/segment/mantissa, rebuild
    ((m·8 + 0x84) << seg) − 0x84 with the sign restored. Matches the
    classic reference decoder (and CPython's audioop) bit-for-bit."""
    import numpy as np

    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t = t << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_table():
    """256-entry A-law → linear int16 expansion (CCITT G.711
    alaw2linear): XOR 0x55, then the segment ladder — segment 0 is
    linear (step 16, offset 8), segment s ≥ 1 shifts (m·16 + 0x108) left
    by s − 1. Matches the classic reference decoder bit-for-bit."""
    import numpy as np

    a = np.arange(256, dtype=np.int32) ^ 0x55
    m = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(
        seg == 0,
        m + 8,
        np.where(seg == 1, m + 0x108, (m + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _read_float80(b: bytes) -> float:
    """IEEE 754 extended-precision (80-bit, big-endian) → float — the
    sample-rate encoding AIFF's COMM chunk uses (Apple IFF-85 spec).
    Pure integer arithmetic: value = mantissa · 2^(exp − 16383 − 63)."""
    import struct

    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite extended float")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_au(b: bytes | None):
    """REAL audio decode for Sun/NeXT .au (big-endian '.snd' header):
    µ-law (enc 1), linear PCM int8/16/24/32 BE (enc 2-5), IEEE float
    32/64 BE (enc 6-7), and A-law (enc 27) — the complete
    stdlib-decodable set. Returns (samples, sample_rate), samples
    float64 (n_frames, n_channels) in [-1, 1] for integer encodings.
    Unknown encodings (G.721/G.723 ADPCM, ...) raise
    NotImplementedError; corrupt/truncated payloads raise ValueError."""
    import struct

    import numpy as np

    if not b or len(b) < 24:
        raise ValueError("truncated AU header")
    if b[:4] != b".snd":
        raise ValueError("unrecognized audio container")
    off, size, enc, rate, nch = struct.unpack(">IIIII", b[4:24])
    if nch < 1 or rate < 1 or off < 24:
        raise ValueError("degenerate AU header")
    data = b[off:] if size == 0xFFFFFFFF else b[off : off + size]
    if size != 0xFFFFFFFF and len(data) < size:
        raise ValueError("truncated AU data")
    if enc in (1, 27):
        n = len(data) // nch
        if n == 0:
            raise ValueError("empty AU data")
        table = _ulaw_table() if enc == 1 else _alaw_table()
        lin = table[
            np.frombuffer(data, dtype=np.uint8, count=n * nch)
        ].reshape(n, nch)
        return lin.astype("float64") / 32768.0, int(rate)
    if enc == 4:  # int24 BE: widen to int32 via byte assembly
        n = len(data) // (3 * nch)
        if n == 0:
            raise ValueError("empty AU data")
        raw = np.frombuffer(data, dtype=np.uint8, count=n * nch * 3)
        raw = raw.reshape(-1, 3).astype(np.int32)
        v = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return (
            v.reshape(n, nch).astype("float64") / float(1 << 23),
            int(rate),
        )
    spec = {
        2: (">i1", 1 << 7),
        3: (">i2", 1 << 15),
        5: (">i4", 1 << 31),
        6: (">f4", None),
        7: (">f8", None),
    }.get(enc)
    if spec is None:
        raise NotImplementedError(
            f"AU encoding {enc} requires codec libs not present in this "
            "environment"
        )
    dt, scale = spec
    width = np.dtype(dt).itemsize
    n = len(data) // (width * nch)
    if n == 0:
        raise ValueError("empty AU data")
    raw = np.frombuffer(data, dtype=dt, count=n * nch).reshape(n, nch)
    if scale is None:
        return raw.astype("float64"), int(rate)
    return raw.astype("float64") / float(scale), int(rate)


def decode_aiff(b: bytes | None):
    """REAL audio decode for AIFF (big-endian IFF-85 FORM/AIFF): COMM
    chunk (channels, frames, bit depth, 80-bit extended-float sample
    rate — parsed with integer arithmetic, no struct 'e' support
    needed) + SSND chunk (offset/blocksize prelude), PCM int8/16/24/32
    big-endian. Returns (samples, sample_rate) like the WAV/AU paths.
    AIFC compressed variants raise NotImplementedError; corrupt or
    truncated containers raise ValueError."""
    import struct

    import numpy as np

    if not b or len(b) < 12:
        raise ValueError("truncated IFF header")
    if b[:4] != b"FORM" or b[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("unrecognized audio container")
    if b[8:12] == b"AIFC":
        raise NotImplementedError(
            "AIFC compressed audio requires codec libs not present in "
            "this environment"
        )
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack(">I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            if len(body) < 18:
                raise ValueError("truncated COMM chunk")
            nch, nframes, bits = struct.unpack(">hIh", body[:8])
            rate = _read_float80(body[8:18])
            comm = (nch, nframes, bits, rate)
        elif cid == b"SSND":
            if len(body) < 8 or len(body) < size:
                raise ValueError("truncated SSND chunk")
            (off,) = struct.unpack(">I", body[:4])
            ssnd = body[8 + off :]
        pos += 8 + size + (size & 1)  # IFF chunks pad to even offsets
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    nch, nframes, bits, rate = comm
    if nch < 1 or rate <= 0:
        raise ValueError("degenerate AIFF COMM")
    if bits == 24:
        n = len(ssnd) // (3 * nch)
        n = min(n, nframes) if nframes else n
        if n == 0:
            raise ValueError("empty AIFF sound data")
        raw = np.frombuffer(ssnd, dtype=np.uint8, count=n * nch * 3)
        raw = raw.reshape(-1, 3).astype(np.int32)
        v = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return (
            v.reshape(n, nch).astype("float64") / float(1 << 23),
            int(round(rate)),
        )
    dt = {8: ">i1", 16: ">i2", 32: ">i4"}.get(bits)
    if dt is None:
        raise NotImplementedError(f"{bits}-bit AIFF not supported")
    width = np.dtype(dt).itemsize
    n = len(ssnd) // (width * nch)
    n = min(n, nframes) if nframes else n
    if n == 0:
        raise ValueError("empty AIFF sound data")
    raw = np.frombuffer(ssnd, dtype=dt, count=n * nch).reshape(n, nch)
    return (
        raw.astype("float64") / float(1 << (bits - 1)),
        int(round(rate)),
    )


def decode_audio(b: bytes | None):
    """Container dispatch over every REAL audio decoder here: RIFF/WAVE
    → :func:`decode_wav_pcm` (PCM, float, IMA ADPCM, G.711), '.snd' →
    :func:`decode_au`, FORM/AIFF → :func:`decode_aiff`. Same
    (samples, sample_rate) contract and the same honest boundaries —
    unknown containers raise ValueError so triage callers
    (:func:`audio_stats`) can NULL them."""
    if not b or len(b) < 4:
        raise ValueError("empty payload")
    if b[:4] == b"RIFF":
        return decode_wav_pcm(b)
    if b[:4] == b".snd":
        return decode_au(b)
    if b[:4] == b"FORM":
        return decode_aiff(b)
    raise ValueError("unrecognized audio container")


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
    ]
)


def audio_stats(
    df: DataFrame, id_col: str = "media_id", bin_col: str = "payload"
) -> DataFrame:
    """REAL per-clip audio statistics for every payload
    :func:`decode_audio` can decode (WAV/PCM-float-ADPCM-G.711, Sun AU,
    AIFF) — sample rate, channel/frame
    counts, duration, RMS level, absolute peak, and zero-crossing rate
    (the crudest pitch/noisiness proxy) over the channel-mean signal.
    Undecodable payloads (compressed codecs, corrupt bytes, non-WAV)
    return NULL stats — the image path's triage semantics, so one bad
    clip never kills an ingest pass.

    Scale shape: Arrow-batched ``mapInPandas``; payload bytes never
    leave the executor; the signal math is vectorized numpy per batch;
    output is a fixed 8-column row per clip."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs, ncs, nfs, durs, rmss, peaks, zcrs = (
                [], [], [], [], [], [], [],
            )
            for p in pdf[bin_col]:
                try:
                    samples, sr = decode_audio(p)
                except (NotImplementedError, ValueError):
                    for acc in (srs, ncs, nfs, durs, rmss, peaks, zcrs):
                        acc.append(None)
                    continue
                mono = samples.mean(axis=1)
                srs.append(sr)
                ncs.append(samples.shape[1])
                nfs.append(samples.shape[0])
                durs.append(1000.0 * samples.shape[0] / sr)
                rmss.append(float(np.sqrt(np.mean(mono * mono))))
                peaks.append(float(np.max(np.abs(samples))))
                zcrs.append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if len(mono) > 1
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "sample_rate": pd.array(srs, dtype="Int32"),
                    "n_channels": pd.array(ncs, dtype="Int32"),
                    "n_frames": pd.array(nfs, dtype="Int64"),
                    "duration_ms": pd.array(durs, dtype="float64"),
                    "rms": pd.array(rmss, dtype="float64"),
                    "peak": pd.array(peaks, dtype="float64"),
                    "zero_crossing_rate": pd.array(zcrs, dtype="float64"),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        gen, schema=AUDIO_STATS_SCHEMA
    )


def _tiff_dims(b: bytes):
    """(width, height) from a TIFF first IFD — the header-parse sibling
    of :func:`_decode_tiff` for :func:`image_meta` triage (dimensions
    only, no strip reads). Raises ValueError on corrupt structure."""
    import struct

    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    e = "<" if b[:4] == b"II*\x00" else ">"
    (ifd_off,) = struct.unpack(e + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack(e + "H", b[ifd_off : ifd_off + 2])
    w = h = None
    for k in range(n_entries):
        pos = ifd_off + 2 + 12 * k
        if pos + 12 > len(b):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(e + "HHI", b[pos : pos + 8])
        if tag not in (256, 257) or typ not in (3, 4) or cnt != 1:
            continue
        val = struct.unpack(
            e + ("H" if typ == 3 else "I"),
            b[pos + 8 : pos + 8 + (2 if typ == 3 else 4)],
        )[0]
        if tag == 256:
            w = val
        else:
            h = val
    if w is None or h is None:
        raise ValueError("TIFF IFD missing dimensions")
    return (w, h)
