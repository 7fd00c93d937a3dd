"""Pure-python WAV codec (ext/audiocodec.py): real encode/decode
round-trips, chunk-walk robustness, and the Spark-side audio featurizer."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.audiocodec import (
    decode_audio,
    decode_wav,
    encode_wav,
    sniff_wav,
)


def _samples(n, ch=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)


def test_wav_roundtrip_stereo():
    s = _samples(333, ch=2)
    rate, back = decode_wav(encode_wav(s, sample_rate=22050))
    assert rate == 22050
    assert np.array_equal(back, s)


def test_wav_roundtrip_mono_and_odd_length():
    # mono with odd data-chunk byte count exercises the RIFF pad byte
    s = _samples(101, ch=1, seed=1)
    payload = encode_wav(s, sample_rate=8000)
    rate, back = decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(back, s)


def test_wav_skips_unknown_chunks():
    s = _samples(50, ch=1, seed=2)
    payload = encode_wav(s)
    # splice a LIST chunk (odd length → padded) between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    rate, back = decode_wav(spliced)
    assert np.array_equal(back, s)


def test_wav_rejects_non_pcm_and_non_riff():
    s = _samples(10, ch=1)
    payload = bytearray(encode_wav(s))
    payload[20] = 3  # audio format 3 = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(payload))
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + bytes(40))
    assert not sniff_wav(b"OggS" + bytes(40))


def test_decode_audio_exact_sums():
    s = np.array([[100, -7], [200, -7], [-50, 14]], dtype=np.int16)
    rate, channels, n, feat = decode_audio(encode_wav(s, sample_rate=16000))
    assert (rate, channels, n) == (16000, 2, 3)
    assert feat.tolist() == [250.0, 0.0, 350.0, 28.0]


def test_decode_audio_mono_pads_features():
    s = np.array([5, -3, 10], dtype=np.int16)
    _, channels, n, feat = decode_audio(encode_wav(s))
    assert (channels, n) == (1, 3)
    assert feat.tolist() == [12.0, 0.0, 18.0, 0.0]


def test_extract_audio_features_spark(spark):
    from assignment_etl_spark.ext.multimodal import extract_audio_features

    rows = []
    for i in range(6):
        ch = 1 + i % 2
        s = _samples(60 + i, ch=ch, seed=i)
        rows.append((i, "audio", "audio/wav", bytearray(encode_wav(s, sample_rate=8000 * (1 + i % 2))), {}))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, payload binary, meta map<string,string>"
    )
    feats = extract_audio_features(media).orderBy("media_id").collect()
    assert len(feats) == 6
    for i, r in enumerate(feats):
        s = _samples(60 + i, ch=1 + i % 2, seed=i).astype(np.int64)
        assert r.sample_rate == 8000 * (1 + i % 2)
        assert r.channels == 1 + i % 2
        assert r.n_samples == 60 + i
        assert r.feature[0] == float(s[:, 0].sum())
        assert r.feature[2] == float(np.abs(s[:, 0]).sum())


def test_extract_audio_features_fake_fallback(spark):
    from assignment_etl_spark.ext.multimodal import extract_audio_features

    media = spark.createDataFrame(
        [(1, "audio", "audio/mpeg", bytearray(b"ID3\x03not-a-wav"), {})],
        "media_id long, kind string, mime string, payload binary, meta map<string,string>",
    )
    r = extract_audio_features(media).first()
    assert r.sample_rate in (8000, 16000, 24000)
    assert r.channels in (1, 2)
    assert len(r.feature) == 4


def test_downsample_audio_decimation(spark):
    import numpy as np
    import pandas as pd

    from assignment_etl_spark.ext.audiocodec import encode_wav
    from assignment_etl_spark.ext.multimodal import MEDIA_SCHEMA, downsample_audio

    s = np.arange(20, dtype=np.int16).reshape(10, 2)  # 10 frames, stereo
    rows = [
        {"media_id": 1, "kind": "audio", "mime": "audio/wav",
         "payload": encode_wav(s, sample_rate=9000), "meta": {}},
        {"media_id": 2, "kind": "audio", "mime": "audio/mp3",
         "payload": b"ID3 not a wav", "meta": {}},
    ]
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    out = {r.media_id: r for r in downsample_audio(media, factor=3).collect()}
    r1 = out[1]
    assert (r1.src_rate, r1.out_rate) == (9000, 3000)
    assert (r1.src_samples, r1.out_samples) == (10, 4)  # frames 0,3,6,9
    # kept frames' channel sums: ch0 = 0+6+12+18, ch1 = 1+7+13+19
    assert r1.feature == [36.0, 40.0]
    assert out[2].feature is None  # non-WAV: metadata only, row kept
