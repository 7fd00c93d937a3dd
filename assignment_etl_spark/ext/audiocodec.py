"""Pure-python audio codec: real WAV (RIFF / 16-bit PCM) decode — and
encode, for synthesizing test corpora — with no dependencies.

This closes the audio modality the same way ``ext.imagecodec`` closed
images: payloads carrying the RIFF/WAVE magic are *actually parsed* —
chunk walk (fmt / data, unknown chunks skipped with odd-size padding),
format validation (PCM, 16-bit), interleaved little-endian sample
de-multiplexing into per-channel arrays. Formats needing out-of-container
libraries (MP3, FLAC, Ogg) still fall back to the deterministic fake in
``ext.multimodal``, so the plumbing keeps working everywhere.

Decoded output is exact integer math (sample counts, per-channel sample
sums and absolute sums — int16 sums stay far below 2^53, so float64
carries them exactly), which is what makes the decode ORACLE-CHECKABLE:
a corpus generated from a closed-form sample formula can be verified by
an independent SQL engine computing the same sums analytically, proving
the decoder truly inverts the encoder — header layout, interleaving and
byte order included.

Reference parity note: the reference repo has no media path at all; this
module is part of the training-data-pipeline surface (multimodal columns)
required beyond reference scope.

Scale: decode runs inside Arrow-batched ``mapInPandas`` (one crossing,
no shuffle); per-row Python cost is amortized over multi-KB payloads,
the sanctioned pattern for media decode.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"

MAX_FEATURE_CHANNELS = 2  # feature vectors are padded to this many channels


def sniff_wav(payload: bytes) -> bool:
    return payload[:4] == RIFF_MAGIC and payload[8:12] == WAVE_MAGIC


# ---------------------------------------------------------------- encode


def encode_wav(samples: np.ndarray, *, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as a 16-bit PCM WAV
    (interleaved little-endian samples, standard fmt + data chunks)."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    body = s.astype("<i2").tobytes()  # row-major == interleaved
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) % 2 else b"")
    )
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + WAVE_MAGIC + chunks


# ---------------------------------------------------------------- decode


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV → (sample_rate, (n, channels) int16 array). Supports PCM
    (audio format 1), 16-bit; walks chunks, skipping unknown ones with
    RIFF's odd-size pad byte."""
    if not sniff_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length % 2)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_format, channels, sample_rate, _rate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise ValueError(f"unsupported WAV format {audio_format} (want PCM)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (want 16)")
        elif ctype == b"data":
            data = body
    if sample_rate is None or channels is None or data is None:
        raise ValueError("missing fmt or data chunk")
    usable = len(data) - len(data) % (2 * channels)
    flat = np.frombuffer(data[:usable], dtype="<i2")
    return sample_rate, flat.reshape(-1, channels)


def decode_audio(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real decode for WAV payloads → (sample_rate, channels, n_samples,
    feature vector).

    The feature vector is [sum(ch0), sum(ch1), sum(|ch0|), sum(|ch1|)]
    as float64 — exact integer sums (int16 × realistic clip lengths stay
    far below 2^53), padded with 0 for mono so the shape is
    channel-count-stable. Exact sums, not float means: bit-comparable
    across engines, the same contract as ``imagecodec.decode_image``.
    """
    sample_rate, s = decode_wav(payload)
    n, channels = s.shape
    wide = s.astype(np.int64)
    sums = wide.sum(axis=0)[:MAX_FEATURE_CHANNELS]
    abs_sums = np.abs(wide).sum(axis=0)[:MAX_FEATURE_CHANNELS]
    feat = np.zeros(2 * MAX_FEATURE_CHANNELS, dtype=np.float64)
    feat[: len(sums)] = sums
    feat[MAX_FEATURE_CHANNELS : MAX_FEATURE_CHANNELS + len(abs_sums)] = abs_sums
    return sample_rate, channels, n, feat
