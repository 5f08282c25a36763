"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
`mapInPandas` signature, partition-size control — and so is container-format
SNIFFING: magic-byte detection plus header-level dimension/audio parsing for
PNG / JPEG / GIF / BMP / WAV / MP4 / WEBP / PDF, implemented from the public
format specs with no codec libraries. Pixel/sample DECODE is REAL for
uncompressed BI_RGB BMP pixel arrays, PCM WAV samples (struct+numpy), and —
round 5 — BASELINE JPEG via the pure-numpy T.81 codec in `jpeg.py` (Huffman
entropy decode, dequant, vectorized IDCT, chroma upsampling, YCbCr→RGB);
these produce real statistical features (`real_decode=True`). For the
remaining codec-bound formats (progressive JPEG, PNG zlib prediction
pipelines beyond the PDF filters, MP4/OGG/FLAC codecs) the decode step stays
a clearly-marked stub: by default a deterministic fake featureizer;
`strict=True` raises NotImplementedError exactly where a real decoder
(PIL / torchaudio / pyav) would plug in.

Design for 100 TB: media bytes stay in a `binary` column and never leave the JVM
except through Arrow batches into the vectorized featureizer; per-batch size is
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` (bytes-heavy tables
should set it low, e.g. 64). Feature extraction is embarrassingly parallel — no
shuffle anywhere. Sniffing touches only the first ~few hundred bytes per blob.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jpeg import decode_baseline_jpeg

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha1", T.StringType(), False),
        # container-level sniffing (real, from file headers)
        T.StructField("sniffed_format", T.StringType(), True),  # png|jpeg|gif|... or NULL
        T.StructField("sniffed_kind", T.StringType(), True),  # image|audio|video|document
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),  # 16-dim
        T.StructField("decode_ok", T.BooleanType(), False),
        # True iff `feature` came from REAL decoded pixels/samples (BMP/WAV —
        # the codec-free formats); False means the deterministic stand-in
        T.StructField("real_decode", T.BooleanType(), False),
    ]
)

FEATURE_DIM = 16

_NONE_META = (None, None, None, None, None, None)
_I32_MAX = (1 << 31) - 1


def _i32(v):
    """Header ints are unsigned on disk; a declared dim/rate beyond int32 is
    garbage from a corrupt blob — degrade that FIELD to None instead of letting
    an Int32 cast abort the whole job later."""
    return int(v) if v is not None and 0 <= int(v) <= _I32_MAX else None


def sniff_media(b: bytes) -> tuple[str | None, str | None, int | None, int | None, int | None, int | None]:
    """(format, kind, width, height, sample_rate, channels) from container headers
    only — public format specs, no codec libraries. Unknown → all None."""
    fmt, kind, w, h, sr, ch = _sniff_media_raw(b)
    return fmt, kind, _i32(w), _i32(h), _i32(sr), _i32(ch)


def _sniff_media_raw(b: bytes):
    try:
        if b.startswith(b"\x89PNG\r\n\x1a\n") and len(b) >= 24:
            # IHDR is the first chunk: width/height big-endian uint32 at 16..23
            w, h = struct.unpack(">II", b[16:24])
            return "png", "image", w, h, None, None
        if b.startswith(b"\xff\xd8\xff"):
            # walk JPEG segments to the first SOFn frame header
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if marker in (0xDA, 0xD9):
                    # SOS/EOI: past here is entropy-coded data where stuffed
                    # 0xFF pairs would read as markers with garbage seglens —
                    # a spurious SOFn there reports garbage dimensions
                    break
                seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                              0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    if i + 9 <= len(b):
                        h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                        return "jpeg", "image", w, h, None, None
                    break
                i += 2 + seglen
            return "jpeg", "image", None, None, None, None
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", "image", w, h, None, None
        if b.startswith(b"BM") and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return "bmp", "image", w, abs(h), None, None
        if b.startswith(b"RIFF") and b[8:12] == b"WEBP":
            return "webp", "image", None, None, None, None
        if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            # find the fmt chunk: channels uint16 @+2, sample rate uint32 @+4
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 16 <= len(b):
                    ch, sr = struct.unpack("<HI", b[i + 10 : i + 16])
                    return "wav", "audio", None, None, sr, ch
                i += 8 + clen + (clen & 1)
            return "wav", "audio", None, None, None, None
        if len(b) >= 12 and b[4:8] == b"ftyp":
            brand = b[8:12]
            kind = "audio" if brand in (b"M4A ", b"M4B ") else "video"
            return "mp4", kind, None, None, None, None
        if b.startswith(b"ID3") or (len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
            return "mp3", "audio", None, None, None, None
        if b.startswith(b"OggS"):
            return "ogg", "audio", None, None, None, None
        if b.startswith(b"fLaC"):
            return "flac", "audio", None, None, None, None
        if b.startswith(b"%PDF-"):
            return "pdf", "document", None, None, None, None
        if b.startswith(b"\x1a\x45\xdf\xa3"):  # EBML (mkv/webm)
            return "mkv", "video", None, None, None, None
    except (struct.error, IndexError):
        return _NONE_META
    return _NONE_META


def _decode_bmp(b: bytes) -> np.ndarray | None:
    """REAL pixel decode for uncompressed BI_RGB BMP (8/24/32 bpp) — needs only
    struct+numpy, no codec library (public BITMAPINFOHEADER layout). 8-bpp
    images resolve their MANDATORY BGRA color table (it sits between the header
    and the pixel data, codec-free — r3 ADVICE: raw palette indices are not
    intensities) to per-pixel BGR channels. Returns channel values normalized
    to [0,1] in row-major top-down order, or None if the blob isn't a
    decodable BMP variant."""
    try:
        if not b.startswith(b"BM") or len(b) < 54:
            return None
        data_off = struct.unpack_from("<I", b, 10)[0]
        hdr_size = struct.unpack_from("<I", b, 14)[0]
        if hdr_size < 40:  # BITMAPCOREHEADER et al.: out of scope
            return None
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        compression = struct.unpack_from("<I", b, 30)[0]
        if compression != 0 or bpp not in (8, 24, 32) or w <= 0 or w > 1 << 20:
            return None
        top_down = h < 0
        h = abs(h)
        if h == 0 or h > 1 << 20:
            return None
        stride = ((bpp * w + 31) // 32) * 4
        need = data_off + stride * h
        if need > len(b):
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = raw.reshape(h, stride)[:, : (bpp // 8) * w]
        if not top_down:
            rows = rows[::-1]
        if bpp == 8:
            clr_used = struct.unpack_from("<I", b, 46)[0]
            n_pal = clr_used if 0 < clr_used <= 256 else 256
            pal_off = 14 + hdr_size
            if pal_off + 4 * n_pal > data_off or pal_off + 4 * n_pal > len(b):
                return None  # palette missing/truncated: not decodable as real
            pal = np.frombuffer(b, dtype=np.uint8, count=4 * n_pal, offset=pal_off)
            pal = pal.reshape(n_pal, 4)[:, :3]  # BGRA quads → BGR
            idx = np.ascontiguousarray(rows)
            if idx.max(initial=0) >= n_pal:
                return None  # index beyond the color table: corrupt blob
            return pal[idx].astype(np.float32).ravel() / 255.0
        return np.ascontiguousarray(rows).astype(np.float32).ravel() / 255.0
    except (struct.error, ValueError):
        return None


def _decode_wav(b: bytes) -> np.ndarray | None:
    """REAL sample decode for PCM WAV (8/16-bit, format tag 1) — struct+numpy
    only. Returns samples normalized to [-1,1], or None for non-PCM/compressed
    WAV."""
    try:
        if not (b.startswith(b"RIFF") and b[8:12] == b"WAVE"):
            return None
        fmt_tag = bits = None
        data = None
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = struct.unpack_from("<I", b, i + 4)[0]
            if cid == b"fmt " and i + 8 + 16 <= len(b):
                fmt_tag, _ch, _sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", b, i + 8)
            elif cid == b"data":
                data = b[i + 8 : i + 8 + clen]
            i += 8 + clen + (clen & 1)
        if fmt_tag != 1 or data is None or not len(data):
            return None
        if bits == 16:
            return np.frombuffer(data[: len(data) & ~1], dtype="<i2").astype(np.float32) / 32768.0
        if bits == 8:
            return (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        return None
    except (struct.error, ValueError):
        return None


def _real_feature(vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """16-dim feature from REAL decoded values: [mean, std, min, max] rescaled
    to [0,1] over the domain [lo,hi], then a 12-bin density histogram."""
    span = hi - lo
    stats = (np.array([vals.mean(), vals.std(), vals.min(), vals.max()]) - lo) / span
    hist, _ = np.histogram(vals, bins=FEATURE_DIM - 4, range=(lo, hi))
    hist = hist.astype(np.float64) / max(len(vals), 1)
    return np.clip(np.concatenate([stats, hist]), 0.0, 1.0).astype(np.float32)


def _fake_decode_features(content: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for the pixel/sample decode→feature step (REAL
    decode goes here: e.g. PIL.Image.open for images, resample+spectrogram for
    audio, frame-sample for video). Produces a 16-dim float feature from the
    byte content so the full Spark plumbing — batching, schema, ordering — is
    exercised end-to-end."""
    feats = []
    shas = []
    for b in content:  # byte-blob granularity (one iteration per media object)
        h = hashlib.sha1(bytes(b)).digest()
        shas.append(hashlib.sha1(bytes(b)).hexdigest())
        v = np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0
        feats.append(v)
    return pd.DataFrame({"content_sha1": shas, "feature": feats})


def extract_media_features(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURE_SCHEMA via vectorized mapInPandas.

    Container sniffing (format/kind/dims/audio params) is real and always runs;
    `decode_ok` is True iff the magic bytes identified a known container.
    BMP pixel arrays, PCM WAV samples, and BASELINE JPEG pixels are REALLY
    decoded (struct/numpy; T.81 codec in jpeg.py) and featureized from actual
    values (`real_decode=True`); other formats get the deterministic stand-in.
    strict=True raises NotImplementedError at the pixel/sample decode step for
    the remaining codec-bound formats — the marked seam where a real codec
    stack plugs in.
    """

    def featureize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            meta = pd.DataFrame(
                (sniff_media(bytes(b)) for b in pdf["content"]),
                columns=["sniffed_format", "sniffed_kind", "width", "height",
                         "sample_rate", "channels"],
            )
            fake = _fake_decode_features(pdf["content"])
            feats, real = [], []
            for blob, fmt, fake_f in zip(pdf["content"], meta["sniffed_format"], fake["feature"]):
                vals = dom = None
                if fmt == "bmp":
                    vals, dom = _decode_bmp(bytes(blob)), (0.0, 1.0)
                elif fmt == "wav":
                    vals, dom = _decode_wav(bytes(blob)), (-1.0, 1.0)
                elif fmt == "jpeg":
                    px = decode_baseline_jpeg(bytes(blob))
                    if px is not None:
                        vals = px.astype(np.float32).ravel() / 255.0
                    dom = (0.0, 1.0)
                if vals is not None and len(vals):
                    feats.append(_real_feature(vals, *dom))
                    real.append(True)
                else:
                    if strict:
                        raise NotImplementedError(
                            f"real media decode for format={fmt!r} requires an "
                            "image/audio codec stack (PIL/pyav/torchaudio) not "
                            "present in this environment (BMP pixel arrays, PCM "
                            "WAV, and baseline JPEG decode codec-free here)"
                        )
                    feats.append(fake_f)
                    real.append(False)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"].to_numpy(),
                    "media_kind": pdf["media_kind"].to_numpy(),
                    "n_bytes": pdf["content"].map(len).astype(np.int64).to_numpy(),
                    "content_sha1": fake["content_sha1"].to_numpy(),
                    "sniffed_format": meta["sniffed_format"].to_numpy(),
                    "sniffed_kind": meta["sniffed_kind"].to_numpy(),
                    "width": meta["width"].astype("Int32").to_numpy(na_value=None, dtype=object),
                    "height": meta["height"].astype("Int32").to_numpy(na_value=None, dtype=object),
                    "sample_rate": meta["sample_rate"].astype("Int32").to_numpy(na_value=None, dtype=object),
                    "channels": meta["channels"].astype("Int32").to_numpy(na_value=None, dtype=object),
                    "feature": [list(f) for f in feats],
                    "decode_ok": meta["sniffed_format"].notna().to_numpy(),
                    "real_decode": np.array(real, dtype=bool),
                }
            )

    return media.mapInPandas(featureize, FEATURE_SCHEMA)


def media_from_corpus(extracted: DataFrame) -> DataFrame:
    """Derive a media table from extraction output: every kind='media' span becomes
    a row; content is synthesized deterministically from the ref (the corpus model
    stores refs, not bytes — at ingest this would join a blob store)."""
    m = (
        extracted.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    return m.select(
        "media_ref",
        F.when(F.col("media_ref").startswith("vid"), "video")
        .when(F.col("media_ref").startswith("aud"), "audio")
        .otherwise("image")
        .alias("media_kind"),
        F.encode(F.concat(F.lit("FAKEBYTES:"), F.col("media_ref")), "utf-8").alias("content"),
    )
