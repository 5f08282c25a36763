"""Multimodal binary-column plumbing: schema, mapInPandas batching, determinism.
The decode step itself is stubbed (no codec libs here) — strict mode marks the seam."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pdf_extract_sys_spark.functions.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_media_features,
    media_from_corpus,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img-1", "image", b"\x89PNG fake bytes"),
        ("vid-2", "video", b"\x00\x00ftyp fake"),
        ("aud-3", "audio", b"RIFF fake"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_schema_and_determinism(spark, media_df):
    out = extract_media_features(media_df).collect()
    assert len(out) == 3
    by_ref = {r["media_ref"]: r for r in out}
    img = by_ref["img-1"]
    assert img["n_bytes"] == len(b"\x89PNG fake bytes")
    assert img["content_sha1"] == hashlib.sha1(b"\x89PNG fake bytes").hexdigest()
    assert len(img["feature"]) == FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in img["feature"])
    # deterministic across runs
    again = {r["media_ref"]: r["feature"] for r in extract_media_features(media_df).collect()}
    assert again == {k: v["feature"] for k, v in by_ref.items()}


def test_magic_byte_sniffing(spark):
    import struct

    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00")
    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640))
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16))
    pdf = b"%PDF-1.7\nfake"
    unknown = b"FAKEBYTES:whatever"
    rows = [
        ("png-1", "image", png),
        ("jpg-1", "image", jpeg),
        ("gif-1", "image", gif),
        ("wav-1", "audio", wav),
        ("pdf-1", "image", pdf),
        ("unk-1", "image", unknown),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in extract_media_features(df).collect()}
    assert (out["png-1"]["sniffed_format"], out["png-1"]["width"], out["png-1"]["height"]) == ("png", 640, 480)
    assert (out["jpg-1"]["sniffed_format"], out["jpg-1"]["width"], out["jpg-1"]["height"]) == ("jpeg", 640, 480)
    assert (out["gif-1"]["sniffed_format"], out["gif-1"]["width"], out["gif-1"]["height"]) == ("gif", 320, 200)
    assert (out["wav-1"]["sniffed_format"], out["wav-1"]["sample_rate"], out["wav-1"]["channels"]) == ("wav", 44100, 2)
    assert out["wav-1"]["sniffed_kind"] == "audio"
    assert (out["pdf-1"]["sniffed_format"], out["pdf-1"]["sniffed_kind"]) == ("pdf", "document")
    assert out["unk-1"]["sniffed_format"] is None and out["unk-1"]["decode_ok"] is False
    assert all(out[k]["decode_ok"] for k in ("png-1", "jpg-1", "gif-1", "wav-1", "pdf-1"))


def test_corrupt_header_dims_degrade_not_crash(spark):
    """A PNG declaring width >= 2^31 is garbage, not a reason to abort the job:
    the oversized field degrades to NULL, the blob still sniffs as png."""
    import struct

    evil_png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", 0x80000000, 480) + b"\x08\x02\x00\x00\x00")
    df = spark.createDataFrame([("evil-1", "image", evil_png)], MEDIA_SCHEMA)
    out = extract_media_features(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["sniffed_format"] == "png" and r["width"] is None and r["height"] == 480


def test_strict_mode_marks_decode_seam(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_media_features(media_df, strict=True).collect()


def test_no_per_row_python(spark, media_df):
    from pdf_extract_sys_spark.pipeline import assert_no_per_row_python

    assert_no_per_row_python(extract_media_features(media_df))


def test_media_from_corpus(spark):
    from pdf_extract_sys_spark.pipeline import extract_corpus
    from pdf_extract_sys_spark.schema import CORPUS_SCHEMA

    docs = [
        {
            "doc_id": "m1",
            "spans": [
                {"kind": "media", "text": None, "media_ref": "img-9", "offset": 0},
                {"kind": "media", "text": None, "media_ref": "vid-7", "offset": 1},
            ],
        }
    ]
    sdf = spark.createDataFrame(docs, CORPUS_SCHEMA)
    out = extract_corpus(sdf)
    media = media_from_corpus(out)
    feats = extract_media_features(media).collect()
    kinds = {r["media_ref"]: r["media_kind"] for r in feats}
    assert kinds == {"img-9": "image", "vid-7": "video"}
