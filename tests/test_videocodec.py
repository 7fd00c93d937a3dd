"""Pure-python Y4M codec (ext/videocodec.py): encode/decode round-trips,
header/frame-marker robustness, and the Spark-side video featurizer."""

import numpy as np
import pytest

from assignment_etl_spark.ext.videocodec import (
    decode_video,
    decode_y4m,
    encode_y4m,
    sniff_y4m,
)


def _frames(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
        )
        for _ in range(n)
    ]


def test_y4m_roundtrip():
    frames = _frames(3, 8, 6)
    w, h, fps, back = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (w, h, fps) == (8, 6, (30, 1))
    assert len(back) == 3
    for (y, u, v), (y2, u2, v2) in zip(frames, back):
        assert np.array_equal(y, y2)
        assert np.array_equal(u, u2)
        assert np.array_equal(v, v2)


def test_y4m_frame_params_tolerated():
    frames = _frames(2, 4, 4, seed=1)
    payload = encode_y4m(frames)
    # inject per-frame params after the first FRAME marker
    idx = payload.index(b"FRAME\n")
    spliced = payload[:idx] + b"FRAME Ip\n" + payload[idx + 6 :]
    _, _, _, back = decode_y4m(spliced)
    assert len(back) == 2
    assert np.array_equal(back[0][0], frames[0][0])


def test_y4m_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF....")
    assert not sniff_y4m(b"RIFF....")
    frames = _frames(1, 4, 4)
    truncated = encode_y4m(frames)[:-3]
    with pytest.raises(ValueError):
        decode_y4m(truncated)
    with pytest.raises(ValueError):
        encode_y4m(_frames(1, 5, 4))  # odd width


def test_decode_video_exact_sums():
    y = np.full((2, 4), 10, dtype=np.uint8)
    u = np.full((1, 2), 20, dtype=np.uint8)
    v = np.full((1, 2), 30, dtype=np.uint8)
    w, h, n, feat = decode_video(encode_y4m([(y, u, v), (y, u, v)]))
    assert (w, h, n) == (4, 2, 2)
    assert feat.tolist() == [160.0, 80.0, 120.0]


def test_extract_video_features_spark(spark):
    from assignment_etl_spark.ext.multimodal import extract_video_features

    rows = []
    for i in range(4):
        frames = _frames(1 + i, 6, 4, seed=i)
        rows.append((i, "video", "video/x-y4m", bytearray(encode_y4m(frames)), {}))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    got = {r.media_id: r for r in extract_video_features(media).collect()}
    for i in range(4):
        frames = _frames(1 + i, 6, 4, seed=i)
        assert got[i].n_frames == 1 + i
        assert (got[i].width, got[i].height) == (6, 4)
        assert got[i].feature[0] == float(
            sum(int(y.sum(dtype=np.int64)) for y, _, _ in frames)
        )


def test_extract_video_features_fake_fallback(spark):
    from assignment_etl_spark.ext.multimodal import extract_video_features

    media = spark.createDataFrame(
        [(9, "video", "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42"), {})],
        "media_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    r = extract_video_features(media).first()
    assert 1 <= r.n_frames <= 30
    assert len(r.feature) == 3
