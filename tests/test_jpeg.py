"""Pure-numpy baseline JPEG codec (functions/jpeg.py, public ITU-T T.81).

The reference never decodes JPEG itself (pdfium/tesseract do, main.py:161,653);
this suite pins the from-scratch codec: exactness on DC-only images, bounded
quantization error elsewhere, the restart/stuffing machinery, and safe None
degradation on truncated/out-of-scope data.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_extract_sys_spark.functions.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def _flat_blocks(values: list[int]) -> np.ndarray:
    img = np.empty((16, 16), np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = values
    return img


def test_flat_blocks_roundtrip_exact():
    """DC-only spectrum + flat q=8 divides 8*(v-128) exactly → bit-exact."""
    for vals in ([0, 85, 170, 255], [1, 2, 3, 4], [128] * 4, [17, 233, 90, 140]):
        img = _flat_blocks(vals)
        out = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert out is not None and np.array_equal(out, img)


def test_gradient_gray_non_multiple_of_8_dims():
    x, y = np.linspace(0, 255, 17), np.linspace(0, 255, 24)
    img = np.clip(np.add.outer(y * 0.5, x * 0.5), 0, 255).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == (24, 17)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_color_444_noise_bounded_error():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert out.shape == (16, 16, 3)
    # flat q=8: error bounded by quantization + color transform rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24


def test_color_420_subsampling():
    r = np.clip(np.add.outer(np.linspace(0, 200, 24), np.linspace(0, 55, 32)), 0, 255)
    g = np.full((24, 32), 128.0)
    b = np.clip(np.add.outer(np.linspace(255, 0, 24), np.zeros(32)), 0, 255)
    img = np.stack([r, g, b], -1).astype(np.uint8)
    blob = encode_baseline_jpeg(img, subsampling=(2, 2))
    out = decode_baseline_jpeg(blob)
    assert out.shape == (24, 32, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_restart_intervals_reset_predictors():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    blob = encode_baseline_jpeg(img, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + n]) in blob for n in range(8))
    out = decode_baseline_jpeg(blob)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 16


def test_byte_stuffing_survives_roundtrip():
    """Level-255 flat image drives big positive coefficients → 0xFF bytes in
    the entropy stream → stuffed 0xFF00 pairs the decoder must unstuff."""
    img = np.full((32, 32), 255, np.uint8)
    blob = encode_baseline_jpeg(img)
    out = decode_baseline_jpeg(blob)
    assert np.array_equal(out, img)


def test_truncated_and_garbage_degrade_to_none():
    img = _flat_blocks([10, 60, 110, 160])
    blob = encode_baseline_jpeg(img)
    assert decode_baseline_jpeg(blob[: len(blob) // 2]) is None
    assert decode_baseline_jpeg(b"not a jpeg at all") is None
    assert decode_baseline_jpeg(b"\xff\xd8\xff\xd9") is None  # empty JPEG


def test_progressive_sof2_out_of_scope_returns_none():
    blob = bytearray(encode_baseline_jpeg(_flat_blocks([1, 2, 3, 4])))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # relabel the frame progressive
    assert decode_baseline_jpeg(bytes(blob)) is None


def test_multimodal_jpeg_real_decode(spark):
    """extract_media_features flags jpeg rows real_decode=True with features
    from actual pixels (a flat image has std ~0 — the stand-in hash never
    does)."""
    from pdf_extract_sys_spark.functions.multimodal import extract_media_features

    blob = encode_baseline_jpeg(np.full((16, 16), 200, np.uint8))
    media = spark.createDataFrame(
        [("m1", "image", bytearray(blob))],
        "media_ref string, media_kind string, content binary",
    )
    row = extract_media_features(media).collect()[0]
    assert row["sniffed_format"] == "jpeg" and row["real_decode"]
    assert row["width"] == 16 and row["height"] == 16
    mean, std = row["feature"][0], row["feature"][1]
    assert abs(mean - 200 / 255) < 1e-3 and std < 1e-3


def test_decoder_rejects_mismatched_dht_counts():
    blob = bytearray(encode_baseline_jpeg(_flat_blocks([9, 9, 9, 9])))
    i = blob.find(b"\xff\xc4")
    blob[i + 5] = 250  # corrupt a BITS count beyond the value bytes
    assert decode_baseline_jpeg(bytes(blob)) is None


def test_adversarial_sof_dimensions_capped():
    """Review regression: a corrupt SOF declaring 65535x65535 must return None
    via the 16 MP cap, not attempt a ~32 GiB coefficient allocation."""
    blob = bytearray(encode_baseline_jpeg(_flat_blocks([5, 6, 7, 8])))
    i = blob.find(b"\xff\xc0")
    blob[i + 5 : i + 9] = b"\xff\xff\xff\xff"  # H = W = 65535
    assert decode_baseline_jpeg(bytes(blob)) is None
