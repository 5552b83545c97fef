"""Round-9 additions: progressive JPEG (SOF2) decode + encoder twin.

The load-bearing invariant: a progressive stream transmits exactly the
same quantized coefficients as the baseline encoding of the same
planes, only re-ordered across scans — so jpeg_decode(progressive)
must equal jpeg_decode(baseline) BIT FOR BIT on every input, which is
a far stronger check than any tolerance band."""

from __future__ import annotations

import numpy as np
import pytest


def _rand_gray(rng, lo=4, hi=48):
    h, w = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_progressive_gray_matches_baseline_bitwise():
    from tada_spark.functions.jpeg import (
        encode_jpeg_gray, encode_jpeg_progressive, jpeg_decode)

    rng = np.random.default_rng(901)
    for _ in range(10):
        img = _rand_gray(rng)
        base = jpeg_decode(encode_jpeg_gray(img))
        prog = jpeg_decode(encode_jpeg_progressive(img))
        assert np.array_equal(prog, base)


def test_progressive_color420_matches_baseline_bitwise():
    from tada_spark.functions.jpeg import (
        encode_jpeg_color420, encode_jpeg_progressive, jpeg_decode)

    rng = np.random.default_rng(902)
    for _ in range(8):
        y = _rand_gray(rng, 5, 50)
        h, w = y.shape
        ch, cw = (h + 1) // 2, (w + 1) // 2
        cb = rng.integers(0, 256, size=(ch, cw), dtype=np.uint8)
        cr = rng.integers(0, 256, size=(ch, cw), dtype=np.uint8)
        base = jpeg_decode(encode_jpeg_color420(y, cb, cr))
        prog = jpeg_decode(encode_jpeg_progressive(y, cb, cr))
        assert np.array_equal(prog, base)


def test_progressive_band_splits_and_edges():
    """Every spectral split point re-orders the scans differently but
    must reconstruct the same image; 1x1 and dense-gradient images
    exercise the EOB-only and ZRL/correction-bit extremes."""
    from tada_spark.functions.jpeg import (
        encode_jpeg_gray, encode_jpeg_progressive, jpeg_decode)

    rng = np.random.default_rng(903)
    img = _rand_gray(rng, 15, 30)
    base = jpeg_decode(encode_jpeg_gray(img))
    for bs in (2, 10, 33, 63):
        assert np.array_equal(
            jpeg_decode(encode_jpeg_progressive(img, band_split=bs)), base)
    one = rng.integers(0, 256, size=(1, 1), dtype=np.uint8)
    assert np.array_equal(jpeg_decode(encode_jpeg_progressive(one)),
                          jpeg_decode(encode_jpeg_gray(one)))
    gy, gx = np.mgrid[0:37, 0:41]
    grad = ((gy * 5 + gx * 3) % 256).astype(np.uint8)
    assert np.array_equal(jpeg_decode(encode_jpeg_progressive(grad)),
                          jpeg_decode(encode_jpeg_gray(grad)))


def test_progressive_flat_blocks_roundtrip_exactly():
    """Flat 8x8 blocks with QTABLE_FLAT8 are exactly invertible through
    the lossy pipeline (the jpeg_decode_real discipline) — progressive
    transport must preserve that exactness."""
    from tada_spark.functions.jpeg import encode_jpeg_progressive, jpeg_decode

    vals = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20 + 5
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    assert np.array_equal(jpeg_decode(encode_jpeg_progressive(img)), img)


def test_progressive_error_paths():
    from tada_spark.functions.jpeg import (
        encode_jpeg_progressive, jpeg_decode)

    img = np.full((8, 8), 77, dtype=np.uint8)
    whole = encode_jpeg_progressive(img)
    # cut inside the first scan's entropy data
    sos = whole.find(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(whole[:sos + 9])
    # SOF2 with no scan at all
    eoi_less = whole[:whole.find(b"\xff\xda")] + b"\xff\xd9"
    with pytest.raises(ValueError, match="EOI before SOS"):
        jpeg_decode(eoi_less)


def test_progressive_through_image_features_adapter(spark):
    """The mapInPandas adapter decodes progressive payloads exactly
    like baseline ones — same schema, same values, no dropped rows."""
    import pandas as pd

    from tada_spark.functions import multimodal
    from tada_spark.functions.jpeg import (
        encode_jpeg_gray, encode_jpeg_progressive, jpeg_image_decoder)

    rng = np.random.default_rng(904)
    rows = []
    for mid in range(6):
        img = _rand_gray(rng, 9, 25)
        enc = encode_jpeg_progressive(img) if mid % 2 else encode_jpeg_gray(img)
        rows.append((mid, enc, img.shape))
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows],
                      "payload": [bytearray(r[1]) for r in rows]}))
    out = {
        r["media_id"]: (r["width"], r["height"])
        for r in multimodal.image_features(
            df, decoder=jpeg_image_decoder).collect()
    }
    assert len(out) == 6
    for mid, _enc, (h, w) in rows:
        assert out[mid] == (w, h)
