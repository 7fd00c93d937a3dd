"""Pure-python PNG/BMP codec (ext/imagecodec.py): real encode/decode
round-trips, filter coverage, and the auto_decode dispatch in multimodal."""

import numpy as np
import pytest

from assignment_etl_spark.ext.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    sniff,
)


def _pixels(w, h, ch=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_roundtrip_rgb_all_filters():
    # ≥5 rows so cycle_filters exercises None/Sub/Up/Average/Paeth
    px = _pixels(11, 9)
    back = decode_png(encode_png(px, cycle_filters=True))
    assert back.shape == (9, 11, 3)
    assert np.array_equal(back, px)


def test_png_roundtrip_no_filters():
    px = _pixels(4, 3)
    assert np.array_equal(decode_png(encode_png(px, cycle_filters=False)), px)


def test_png_roundtrip_gray_and_rgba():
    gray = _pixels(7, 6, ch=1, seed=1)
    assert np.array_equal(decode_png(encode_png(gray)), gray)
    rgba = _pixels(5, 8, ch=4, seed=2)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_bmp_roundtrip_with_padding():
    # w=5 → row_bytes=15, pad=1: exercises 4-byte row alignment
    px = _pixels(5, 4, seed=3)
    payload = encode_bmp(px)
    assert np.array_equal(decode_bmp(payload), px)
    # w=4 → no padding
    px = _pixels(4, 4, seed=4)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_sniff_and_decode_image_sums():
    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[:, :, 0] = 10  # sum_r = 60
    px[:, :, 1] = 20  # sum_g = 120
    px[:, :, 2] = 30  # sum_b = 180
    for payload in (encode_png(px), encode_bmp(px)):
        w, h, sums = decode_image(payload)
        assert (w, h) == (3, 2)
        assert sums.tolist() == [60.0, 120.0, 180.0]
    assert sniff(b"garbage") is None
    with pytest.raises(ValueError):
        decode_image(b"garbage")


def test_gray_sums_padded():
    gray = np.full((4, 4, 1), 7, dtype=np.uint8)
    w, h, sums = decode_image(encode_png(gray))
    assert sums.tolist() == [112.0, 0.0, 0.0]


def test_auto_decode_dispatch(spark):
    """extract_features defaults to auto_decode: PNG payloads get REAL
    width/height, non-image payloads keep the fake-decoder behavior."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.multimodal import extract_features, fake_decode

    px = _pixels(13, 6, seed=5)
    png = bytes(encode_png(px))
    raw = b"not an image payload"
    df = spark.createDataFrame(
        [(1, "image", "image/png", png, {}), (2, "image", "application/octet-stream", raw, {})],
        "media_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    feats = {r.media_id: r for r in extract_features(df).collect()}
    assert (feats[1].width, feats[1].height) == (13, 6)
    exp = px.reshape(-1, 3).sum(axis=0)
    assert [int(v) for v in feats[1].feature] == [int(v) for v in exp]
    fw, fh, _ = fake_decode(raw)
    assert (feats[2].width, feats[2].height) == (fw, fh)


def test_roundtrip_property():
    """Property: decode(encode(x)) == x for arbitrary sizes, channel
    counts, and pixel contents (both containers, all PNG filters)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 24),
        ch=st.sampled_from([1, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(w, h, ch, seed):
        px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)
        if ch == 3:
            assert np.array_equal(decode_bmp(encode_bmp(px)), px)

    check()


def test_bmp_top_down_rows():
    """Negative height BMP = top-down row order; decoder must not flip."""
    import struct

    px = _pixels(3, 2, seed=9)
    payload = bytearray(encode_bmp(px))
    # rewrite height to -2 and body in top-down order
    h = 2
    struct.pack_into("<i", payload, 22, -h)
    row_bytes = 3 * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    body = bytearray()
    for y in range(h):  # top-down
        body += px[y, :, ::-1].tobytes() + b"\x00" * pad
    payload[14 + 40 :] = body
    assert np.array_equal(decode_bmp(bytes(payload)), px)


def test_resize_nn_grid():
    import numpy as np

    from assignment_etl_spark.ext.multimodal import resize_nn

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    small = resize_nn(px, 2, 3)
    assert small.shape == (3, 2, 3)
    # floor mapping: rows 0,2,4 and cols 0,2
    assert (small == px[[0, 2, 4]][:, [0, 2]]).all()
    # upscale repeats samples, never interpolates
    big = resize_nn(px, 8, 6)
    assert big.shape == (6, 8, 3)
    assert (big[:, 0] == big[:, 1]).all()


def test_resize_images_real_and_fallback(spark):
    import numpy as np
    import pandas as pd

    from assignment_etl_spark.ext.imagecodec import encode_png
    from assignment_etl_spark.ext.multimodal import MEDIA_SCHEMA, resize_images

    px = np.zeros((6, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 9  # constant red plane
    rows = [
        {"media_id": 1, "kind": "image", "mime": "image/png",
         "payload": encode_png(px), "meta": {}},
        {"media_id": 2, "kind": "image", "mime": "image/jpeg",
         "payload": b"\xff\xd8notapng", "meta": {}},
    ]
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(media, out_w=3, out_h=2).collect()}
    r1 = out[1]
    assert (r1.src_width, r1.src_height, r1.width, r1.height) == (6, 6, 3, 2)
    assert r1.feature == [9.0 * 6, 0.0, 0.0]  # 3x2 resized, constant channel
    # non-decodable format: fake dims, NULL feature, row kept
    assert out[2].feature is None and out[2].width == 3
