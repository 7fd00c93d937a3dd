"""Pure-python video codec: real Y4M (YUV4MPEG2) decode — and encode,
for synthesizing test corpora — with no dependencies.

Y4M is the uncompressed interchange format ffmpeg and the reference
codecs speak: a text header (``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C420``)
followed by ``FRAME\\n`` markers, each carrying planar 4:2:0 YUV — a
w×h luma plane then two (w/2)×(h/2) chroma planes. This module actually
parses it: header tag walk, frame marker scan (with optional per-frame
parameters), plane slicing. Compressed codecs (H.264, VP9) need
out-of-container libraries and still fall back to the deterministic
fake in ``ext.multimodal``.

With this, all three modalities carry REAL default codecs: PNG/BMP
(``ext.imagecodec``), WAV PCM (``ext.audiocodec``), Y4M video (here) —
and the same oracle pattern certifies each: exact integer plane sums,
recomputable analytically by an independent SQL engine from a
closed-form generation formula, prove decode inverts encode
byte-for-byte.

Scale: decode runs inside Arrow-batched ``mapInPandas`` (one crossing,
no shuffle), amortized over multi-KB payloads; pair with
``frame_sample`` / ``repartition_for_media`` for byte-balanced tasks.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2"
FRAME_MAGIC = b"FRAME"


def sniff_y4m(payload: bytes) -> bool:
    return payload[:9] == Y4M_MAGIC


# ---------------------------------------------------------------- encode


def encode_y4m(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    *,
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Encode [(y, u, v), ...] uint8 planes as C420 Y4M. y is (h, w); u
    and v are (h/2, w/2); all frames must share dimensions."""
    if not frames:
        raise ValueError("encode_y4m needs at least one frame")
    h, w = frames[0][0].shape
    if w % 2 or h % 2:
        raise ValueError("C420 needs even dimensions")
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420\n".encode()
    )
    for y, u, v in frames:
        if y.shape != (h, w) or u.shape != (h // 2, w // 2) or v.shape != (h // 2, w // 2):
            raise ValueError("inconsistent plane shapes")
        out += b"FRAME\n"
        out += np.asarray(y, dtype=np.uint8).tobytes()
        out += np.asarray(u, dtype=np.uint8).tobytes()
        out += np.asarray(v, dtype=np.uint8).tobytes()
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_y4m(
    payload: bytes,
) -> tuple[int, int, tuple[int, int], list[tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Y4M → (width, height, fps, [(y, u, v), ...]). Supports C420
    (the default when no C tag is present); per-frame parameters after
    ``FRAME`` are tolerated and ignored."""
    if not sniff_y4m(payload):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps = (25, 1)
    for tag in payload[9:nl].split():
        t, val = tag[:1], tag[1:]
        if t == b"W":
            width = int(val)
        elif t == b"H":
            height = int(val)
        elif t == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif t == b"C" and not val.startswith(b"420"):
            raise ValueError(f"unsupported chroma subsampling {val!r}")
    if width is None or height is None:
        raise ValueError("missing W/H header tags")
    y_len = width * height
    c_len = (width // 2) * (height // 2)
    frame_len = y_len + 2 * c_len
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != FRAME_MAGIC:
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # skip optional frame params
        raw = payload[pos : pos + frame_len]
        if len(raw) < frame_len:
            raise ValueError("truncated frame")
        y = np.frombuffer(raw[:y_len], dtype=np.uint8).reshape(height, width)
        u = np.frombuffer(raw[y_len : y_len + c_len], dtype=np.uint8).reshape(
            height // 2, width // 2
        )
        v = np.frombuffer(raw[y_len + c_len :], dtype=np.uint8).reshape(
            height // 2, width // 2
        )
        frames.append((y, u, v))
        pos += frame_len
    return width, height, fps, frames


def decode_video(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real decode for Y4M payloads → (width, height, n_frames,
    feature). Feature = exact per-plane pixel sums across all frames
    [sum_y, sum_u, sum_v] as float64 (integer-exact below 2^53) — the
    same cross-engine-comparable contract as the image/audio codecs."""
    w, h, _fps, frames = decode_y4m(payload)
    sums = np.zeros(3, dtype=np.int64)
    for y, u, v in frames:
        sums[0] += int(y.sum(dtype=np.int64))
        sums[1] += int(u.sum(dtype=np.int64))
        sums[2] += int(v.sum(dtype=np.int64))
    return w, h, len(frames), sums.astype(np.float64)
