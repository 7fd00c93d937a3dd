"""Multimodal column plumbing: byte-stride frame sampling and
payload-volume-aware repartitioning (plan-side only, no job at plan time)."""

import hashlib

import pytest
from pyspark.sql import DataFrame

from assignment_etl_spark.ext.multimodal import (
    DEFAULT_FRAME_BYTES,
    frame_sample,
    repartition_for_media,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        # 10 full 256-byte frames
        (0, "video", "video/fake", bytes(range(256)) * 10, {}),
        # 3 frames + a 100-byte tail frame (ceil → 4 frames)
        (1, "video", "video/fake", b"\x01" * (256 * 3 + 100), {}),
        # per-row frame size override via meta: 50-byte frames, 6 of them
        (2, "video", "video/fake", b"\x02" * 300, {"frame_bytes": "50"}),
        # empty payload → zero frames
        (3, "video", "video/fake", b"", {}),
        (4, "video", "video/fake", None, {}),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, meta map<string,string>",
    )


def test_frame_sample_stride_and_tail(media_df):
    out = frame_sample(media_df, every_n=3).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)

    # media 0: 10 frames, stride 3 → indices 0,3,6,9
    idx0 = sorted(r.frame_index for r in by_media[0])
    assert idx0 == [0, 3, 6, 9]
    assert all(r.n_frames_total == 10 for r in by_media[0])
    assert all(len(bytes(r.frame_bytes)) == DEFAULT_FRAME_BYTES for r in by_media[0])

    # media 1: ceil((3*256+100)/256)=4 frames → indices 0,3; index 3 is the
    # 100-byte tail
    idx1 = {r.frame_index: r for r in by_media[1]}
    assert sorted(idx1) == [0, 3]
    assert all(r.n_frames_total == 4 for r in by_media[1])
    assert len(bytes(idx1[3].frame_bytes)) == 100

    # media 2: meta overrides frame size to 50 → 6 frames, indices 0,3
    idx2 = {r.frame_index for r in by_media[2]}
    assert idx2 == {0, 3}
    assert all(len(bytes(r.frame_bytes)) == 50 for r in by_media[2])

    # empty / null payloads emit nothing
    assert 3 not in by_media and 4 not in by_media

    # content hash matches the sliced bytes
    for r in out:
        assert r.frame_sha256 == hashlib.sha256(bytes(r.frame_bytes)).hexdigest()


def test_frame_sample_every_1_reconstructs_payload(media_df):
    out = frame_sample(media_df.filter("media_id = 1"), every_n=1).collect()
    chunks = [bytes(r.frame_bytes) for r in sorted(out, key=lambda r: r.frame_index)]
    assert b"".join(chunks) == b"\x01" * (256 * 3 + 100)


def test_frame_sample_rejects_bad_stride(media_df):
    with pytest.raises(ValueError):
        frame_sample(media_df, every_n=0)


def test_repartition_for_media_launches_no_job(media_df, monkeypatch):
    """Plan-time sizing must never execute the plan: agg/first/collect are
    poisoned and the call must still succeed via plan stats or hints."""

    def boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("plan-time job launched")

    monkeypatch.setattr(DataFrame, "agg", boom)
    monkeypatch.setattr(DataFrame, "first", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)

    # explicit partitions hint
    out = repartition_for_media(media_df, num_partitions=4)
    assert out.rdd.getNumPartitions() == 4

    # explicit byte stats → ceil(1 GiB / 128 MiB) = 8
    out = repartition_for_media(media_df, total_payload_bytes=1 << 30)
    assert out.rdd.getNumPartitions() == 8

    # no hints: Catalyst plan statistics (driver-side metadata only).
    # LocalRelation stats are the unknown sentinel → input returned as-is.
    out = repartition_for_media(media_df)
    assert out.rdd.getNumPartitions() >= 1


def test_repartition_for_media_uses_parquet_stats(spark, monkeypatch):
    """Against a real parquet scan, plan stats are known and drive the
    partition count without any job."""

    def boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("plan-time job launched")

    monkeypatch.setattr(DataFrame, "agg", boom)
    monkeypatch.setattr(DataFrame, "first", boom)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = repartition_for_media(docs, target_bytes_per_task=4096)
    assert out.rdd.getNumPartitions() > 1
