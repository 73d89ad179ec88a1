"""Real (dependency-free) image decode through the multimodal
plumbing: uncompressed BMP and binary PPM payloads flow through
image_features without the fake codec, and the extracted luma matches
a direct numpy computation on the source pixels."""

from __future__ import annotations

import numpy as np
import pytest

from gate_spark.operators import multimodal as mm


def _gradient(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _luma(rgb):
    return (rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).astype(
        np.uint8
    )


def test_bmp_ppm_round_trip_decode():
    rgb = _gradient(13, 7, 0)  # odd width exercises BMP row padding
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(rgb)), _luma(rgb))
    assert np.array_equal(mm.decode_pnm(mm.encode_ppm(rgb)), _luma(rgb))
    # PGM (grayscale) path
    g = _luma(rgb)
    pgm = b"P5\n# a comment\n7 13\n255\n" + g.tobytes()
    assert np.array_equal(mm.decode_pnm(pgm), g)


def test_image_features_real_codec(spark):
    rows = []
    truth = {}
    for i in range(6):
        rgb = _gradient(9, 11, i)
        payload = mm.encode_bmp(rgb) if i % 2 == 0 else mm.encode_ppm(rgb)
        rows.append((f"m{i}", "image", payload, None, 11, 9, None))
        truth[f"m{i}"] = float(_luma(rgb).mean())
    rows.append(("m-null", "image", None, None, None, None, None))
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in mm.image_features(df).collect()}
    assert len(feats) == 7
    for mid, want in truth.items():
        # mean_luma is a float32 column: float32-quantized truth
        assert feats[mid]["mean_luma"] == pytest.approx(want, abs=1e-4)
        assert feats[mid]["n_bytes"] > 0
        assert len(feats[mid]["embedding"]) == 16
    assert feats["m-null"]["mean_luma"] is None

    summ = {r["kind"]: r for r in mm.media_summary(df).collect()}
    assert summ["image"]["n"] == 7 and summ["image"]["null_payloads"] == 1


def test_unknown_format_requires_fake(spark):
    df = spark.createDataFrame(
        [("x", "image", b"\x89PNG....", None, None, None, None)],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        mm.image_features(df).collect()
    out = mm.image_features(df, fake=True).collect()
    assert out[0]["mean_luma"] is not None
