"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
`mapInPandas` signature, partition-size control — while the codec step is a
clearly-marked stub (no image/audio libraries in this container): by default a
deterministic fake featureizer; `strict=True` raises NotImplementedError exactly
where a real decoder (PIL / torchaudio / pyav) would plug in.

Design for 100 TB: media bytes stay in a `binary` column and never leave the JVM
except through Arrow batches into the vectorized featureizer; per-batch size is
bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` (bytes-heavy tables
should set it low, e.g. 64). Feature extraction is embarrassingly parallel — no
shuffle anywhere.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        T.StructField("feature", T.ArrayType(T.FloatType()), False),  # 16-dim
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(content: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for decode→feature-extract (REAL decode goes here:
    e.g. PIL.Image.open for images, resample+spectrogram for audio, frame-sample
    for video). Produces a 16-dim float feature from the byte content so the full
    Spark plumbing — batching, schema, ordering — is exercised end-to-end."""
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

    strict=True raises NotImplementedError at the decode step — the marked seam
    where a real codec stack plugs in.
    """

    def featureize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if strict:
                raise NotImplementedError(
                    "real media decode requires an image/audio codec stack "
                    "(PIL/pyav/torchaudio) not present in this environment"
                )
            fx = _fake_decode_features(pdf["content"])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": pdf["content"].map(len).astype(np.int64),
                    "content_sha1": fx["content_sha1"],
                    "feature": fx["feature"].map(list),
                    "decode_ok": True,
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
