"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The Spark-side machinery — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested. The default decoder (``auto_decode``)
REALLY parses PNG and BMP payloads via the pure-python codec in
``ext.imagecodec`` (magic sniff, chunk walk, zlib inflate, all five PNG
scanline filters); formats needing out-of-container libraries (JPEG,
video) fall back to the clearly-marked DETERMINISTIC_FAKE_DECODER. Swap
in PIL/ffmpeg decoders by passing a real decode_fn; nothing else changes.

Scale notes: binary payloads ride the same parquet row groups as their
metadata; ``repartition_for_media`` targets ~128 MB of payload per task so
decode tasks are balanced regardless of file skew — sized from plan
statistics or caller-supplied stats, never by running a job at plan time.
``frame_sample`` is a real byte-stride frame sampler (one Arrow crossing,
no shuffle). Real codecs: PNG/BMP (``ext.imagecodec``) and WAV PCM
(``ext.audiocodec``, via ``extract_audio_features``); only formats that
need out-of-container libraries (JPEG, MP3, video codecs) remain a
documented deterministic fake, swappable via ``decode_fn``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """DETERMINISTIC_FAKE_DECODER: stands in for PIL/ffmpeg on formats the
    pure-python codec can't parse (JPEG, video). Derives a fake
    (width, height) and an 8-dim feature vector purely from the payload hash
    so tests are reproducible. Replace with a real codec in production."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feat = np.frombuffer(digest[:32], dtype=np.uint8).reshape(4, 8).mean(axis=0)
    return width, height, (feat / 255.0).astype(np.float32)


def auto_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Default decoder: REAL parse for PNG/BMP payloads (magic-sniffed,
    ``ext.imagecodec`` — chunk walk, zlib inflate, filter reversal),
    deterministic fake for everything else. Feature = exact per-channel
    pixel sums for real decodes (float32-exact below 2^24 per channel)."""
    from assignment_etl_spark.ext.imagecodec import decode_image, sniff

    if sniff(payload) is not None:
        w, h, sums = decode_image(payload)
        return w, h, sums.astype(np.float32)
    return fake_decode(payload)


def extract_features(
    media: DataFrame,
    *,
    decode_fn: Callable[[bytes], tuple[int, int, np.ndarray]] = auto_decode,
    batch_rows_hint: int = 64,
) -> DataFrame:
    """Decode + featurize every media row via Arrow-batched mapInPandas."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                w, h, feat = decode_fn(payload)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": int(w),
                        "height": int(h),
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        # [sum(ch0), sum(ch1), sum(|ch0|), sum(|ch1|)] — exact int sums
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def auto_decode_audio(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Default audio decoder: REAL parse for WAV payloads (magic-sniffed,
    ``ext.audiocodec`` — chunk walk, PCM validation, interleave demux),
    deterministic fake for everything else (MP3/FLAC need out-of-container
    libraries). The fake derives (rate, channels, n, feature) from the
    payload hash so tests stay reproducible."""
    import hashlib as _hl

    from assignment_etl_spark.ext.audiocodec import decode_audio, sniff_wav

    if sniff_wav(payload):
        return decode_audio(payload)
    digest = _hl.sha256(payload).digest()
    rate = 8000 * (1 + digest[0] % 3)
    channels = 1 + digest[1] % 2
    n = 64 + digest[2]
    feat = np.frombuffer(digest[:4], dtype=np.uint8).astype(np.float64)
    return rate, channels, n, feat


def extract_audio_features(
    media: DataFrame,
    *,
    decode_fn: Callable[[bytes], tuple[int, int, int, np.ndarray]] = auto_decode_audio,
) -> DataFrame:
    """Decode + featurize audio rows via Arrow-batched mapInPandas — the
    audio twin of :func:`extract_features` (same one-crossing, no-shuffle
    shape; run after ``repartition_for_media`` for byte-balanced tasks)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                rate, channels, n, feat = decode_fn(payload)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "sample_rate": int(rate),
                        "channels": int(channels),
                        "n_samples": int(n),
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(process, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        # [sum_y, sum_u, sum_v] — exact plane sums across frames
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def auto_decode_video(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Default video decoder: REAL parse for Y4M payloads (magic-sniffed,
    ``ext.videocodec`` — header tag walk, FRAME scan, 4:2:0 plane
    slicing), deterministic fake for compressed codecs (H.264/VP9 need
    out-of-container libraries)."""
    import hashlib as _hl

    from assignment_etl_spark.ext.videocodec import decode_video, sniff_y4m

    if sniff_y4m(payload):
        return decode_video(payload)
    digest = _hl.sha256(payload).digest()
    w = 16 + digest[0] % 64
    h = 16 + digest[1] % 64
    n_frames = 1 + digest[2] % 30
    feat = np.frombuffer(digest[:3], dtype=np.uint8).astype(np.float64)
    return w, h, n_frames, feat


def extract_video_features(
    media: DataFrame,
    *,
    decode_fn: Callable[[bytes], tuple[int, int, int, np.ndarray]] = auto_decode_video,
) -> DataFrame:
    """Decode + featurize video rows via Arrow-batched mapInPandas — the
    video member of the extract_features family (one crossing, no
    shuffle; byte-balance tasks with ``repartition_for_media``)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                w, h, n_frames, feat = decode_fn(payload)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "width": int(w),
                        "height": int(h),
                        "n_frames": int(n_frames),
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(process, schema=VIDEO_FEATURE_SCHEMA)


def repartition_for_media(
    media: DataFrame,
    *,
    target_bytes_per_task: int = 128 * 1024 * 1024,
    total_payload_bytes: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Balance decode tasks by payload volume, not row count.

    Purely plan-side: no Spark job is launched here. The partition count
    comes from (in priority order) an explicit ``num_partitions`` hint, an
    explicit ``total_payload_bytes`` (e.g. from store/catalog stats), or
    Catalyst's own plan-statistics ``sizeInBytes`` estimate — all
    driver-side metadata. Earlier versions ran ``agg(sum(length)).first()``
    at plan-construction time, which fires a full scan per call; at 100 TB
    that is a second pass over the data before the real one.
    """
    if num_partitions is None:
        if total_payload_bytes is None:
            # Catalyst statistics from the optimized plan: for parquet scans
            # this is file-footer metadata, never a job. Long.MaxValue-ish
            # values are Catalyst's "unknown" sentinel (e.g. LocalRelation
            # with binary columns) — keep the existing partitioning then.
            # Note sizeInBytes estimates FULL row width (all columns), not
            # just the media payload — an over-estimate that errs toward
            # more, smaller decode tasks, which is the safe direction.
            # The probe goes through private JVM internals (the probed
            # facade in internals.py), absent under Spark Connect — fall
            # back to the unknown-sentinel path (keep existing
            # partitioning) when unavailable.
            try:
                from assignment_etl_spark import internals

                total_payload_bytes = internals.plan_size_bytes(
                    internals.optimized_plan(media)
                )
            except Exception:
                return media
            if total_payload_bytes >= (1 << 62):
                return media
        num_partitions = max(1, -(-total_payload_bytes // target_bytes_per_task))
    return media.repartition(num_partitions)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames_total", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)

DEFAULT_FRAME_BYTES = 256


def frame_sample(
    media: DataFrame, *, every_n: int = 30, frame_bytes: int = DEFAULT_FRAME_BYTES
) -> DataFrame:
    """Sample every ``every_n``-th frame from video payloads.

    Pure-Python byte-stride sampler: the payload is treated as a container
    of fixed-size frames (``meta['frame_bytes']`` per row when present,
    else ``frame_bytes``) and every ``every_n``-th frame is emitted with
    its index and content hash. This is the real keyframe-sampling shape a
    production pipeline uses — swap the slicing for an ffmpeg demux when a
    codec is available; schema, batching, and partitioning are unchanged.

    Scale: one Arrow crossing, output ~1/every_n of the input payload
    volume, no shuffle; run after ``repartition_for_media`` so decode tasks
    are balanced by bytes.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                meta = row["meta"] or {}
                fb = int(meta.get("frame_bytes", frame_bytes))
                n_total = max(0, -(-len(payload) // fb))  # ceil; tail = short frame
                for i in range(0, n_total, every_n):
                    chunk = payload[i * fb : (i + 1) * fb]
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "kind": row["kind"],
                            "frame_index": i,
                            "n_frames_total": n_total,
                            "frame_bytes": chunk,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        # exact per-channel int sums of the RESIZED pixels
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def resize_nn(px: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resize with the floor mapping
    src_index = floor(dst_index · src_size / out_size) — pure integer
    arithmetic, so any engine (or SQL oracle) replays the exact sample
    grid. The standard cheap resize for thumbnailing/feature prep."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


def resize_images(
    media: DataFrame, *, out_w: int, out_h: int
) -> DataFrame:
    """Decode (real PNG/BMP codec) → nearest-neighbor resize → exact
    per-channel pixel sums of the RESIZED image, Arrow-batched. Rows the
    pure-python codec cannot parse fall back to the deterministic fake
    decoder's dimensions with a NULL feature (reported, not dropped —
    the caller filters or routes them to a production codec). Same
    per-row-amortized-over-large-blobs mapInPandas shape as
    extract_features."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from assignment_etl_spark.ext.imagecodec import (
            decode_bmp,
            decode_png,
            sniff,
        )

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                fmt = sniff(payload)
                px = None
                # a sniffable-but-unparseable payload (16-bit/interlaced
                # PNG, truncated IDAT, ...) must take the SAME fallback as
                # an unknown format — one bad file cannot abort the job
                try:
                    if fmt == "png":
                        px = decode_png(payload)
                    elif fmt == "bmp":
                        px = decode_bmp(payload)
                except Exception:  # noqa: BLE001 — corrupt-input quarantine
                    px = None
                if px is None:
                    w, h, _ = fake_decode(payload)
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "kind": row["kind"],
                            "src_width": int(w),
                            "src_height": int(h),
                            "width": out_w,
                            "height": out_h,
                            "feature": None,
                        }
                    )
                    continue
                small = resize_nn(px, out_w, out_h)
                sums = small.reshape(-1, small.shape[-1]).astype(np.int64).sum(axis=0)
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "src_width": int(px.shape[1]),
                        "src_height": int(px.shape[0]),
                        "width": out_w,
                        "height": out_h,
                        "feature": [float(s) for s in sums],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media.mapInPandas(process, schema=RESIZE_SCHEMA)


DOWNSAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("src_rate", T.IntegerType()),
        T.StructField("out_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("src_samples", T.LongType()),
        T.StructField("out_samples", T.LongType()),
        # [sum(ch0), sum(ch1)] exact int sums of the DECIMATED signal
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def downsample_audio(media: DataFrame, *, factor: int) -> DataFrame:
    """Integer-factor audio decimation (keep every ``factor``-th frame,
    starting at 0 — the exact sample grid any engine replays; real
    resampling would low-pass first, which needs a filter kernel — this
    is the thumbnail-grade decimation matching ``resize_nn``'s role for
    images). Real WAV decode; non-WAV rows fall back to the fake
    decoder's metadata with a NULL feature, and sniffable-but-
    unparseable WAVs (float PCM, 24-bit, truncated) quarantine with
    zeroed metadata + NULL feature instead of aborting. Output rate is
    src_rate // factor. Arrow-batched, one crossing, no shuffle."""
    if factor < 1:
        raise ValueError("factor must be >= 1")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from assignment_etl_spark.ext.audiocodec import decode_wav, sniff_wav

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                decoded = None
                # sniff only checks RIFF/WAVE magic; float-PCM or 24-bit
                # WAVs parse-fail inside decode_wav and must take the
                # metadata fallback, not abort the task
                if sniff_wav(payload):
                    try:
                        decoded = decode_wav(payload)
                    except Exception:  # noqa: BLE001 — corrupt-input quarantine
                        decoded = None
                if decoded is not None:
                    rate, s = decoded
                    small = s[::factor]
                    sums = small.astype(np.int64).sum(axis=0)
                    feat = [float(x) for x in sums[:2]]
                    feat += [0.0] * (2 - len(feat))
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "kind": row["kind"],
                            "src_rate": int(rate),
                            "out_rate": int(rate) // factor,
                            "channels": int(s.shape[1]),
                            "src_samples": int(s.shape[0]),
                            "out_samples": int(small.shape[0]),
                            "feature": feat,
                        }
                    )
                else:
                    if sniff_wav(payload):
                        # unparseable WAV: no trustworthy metadata either
                        rate, channels, n = 0, 0, 0
                    else:
                        rate, channels, n, _ = auto_decode_audio(payload)
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "kind": row["kind"],
                            "src_rate": int(rate),
                            "out_rate": int(rate) // factor,
                            "channels": int(channels),
                            "src_samples": int(n),
                            "out_samples": (int(n) + factor - 1) // factor,
                            "feature": None,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in DOWNSAMPLE_SCHEMA.fields]
            )

    return media.mapInPandas(process, schema=DOWNSAMPLE_SCHEMA)
