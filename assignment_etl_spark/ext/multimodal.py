"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The Spark-side machinery — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested; the *codec* step is stubbed behind
``decode_fn`` hooks because media libraries aren't in this container
(clearly marked: DETERMINISTIC_FAKE_DECODER). Swap in PIL/ffmpeg decoders by
passing a real decode_fn; nothing else changes.

Scale notes: binary payloads ride the same parquet row groups as their
metadata; ``repartition_for_media`` targets ~128 MB of payload per task so
decode tasks are balanced regardless of file skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
    """DETERMINISTIC_FAKE_DECODER: stands in for PIL/ffmpeg. Derives a fake
    (width, height) and an 8-dim feature vector purely from the payload hash
    so tests are reproducible. Replace with a real codec in production."""
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    feat = np.frombuffer(digest[:32], dtype=np.uint8).reshape(4, 8).mean(axis=0)
    return width, height, (feat / 255.0).astype(np.float32)


def extract_features(
    media: DataFrame,
    *,
    decode_fn: Callable[[bytes], tuple[int, int, np.ndarray]] = fake_decode,
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


def repartition_for_media(
    media: DataFrame, *, target_bytes_per_task: int = 128 * 1024 * 1024
) -> DataFrame:
    """Balance decode tasks by payload volume, not row count."""
    total = media.agg(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / target_bytes_per_task))
    return media.repartition(n)


def frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling placeholder: real implementation needs ffmpeg.

    Raises NotImplementedError at execution time by contract — the plumbing
    (signature, schema) is what the engine defines."""

    def _no_codec(batches):
        raise NotImplementedError(
            "video frame sampling requires ffmpeg; not available in this environment"
        )
        yield  # pragma: no cover

    return media.mapInPandas(_no_codec, schema=MEDIA_SCHEMA)
