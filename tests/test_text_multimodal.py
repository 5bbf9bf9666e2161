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
