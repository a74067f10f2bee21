"""Pure-stdlib "motion PNG" (MPNG) video container.

No video codec (H.264/VP9/AV1) ships in this container's stdlib, so real
video DECODE of arbitrary mp4 bytes is impossible here — but the Spark-side
video operators (frame sampling, feature extraction) should still run on
REAL frame bytes, not NULL stubs.  MPNG is the minimal deterministic
container that makes that true end-to-end: a fixed-rate sequence of
independently-decodable baseline PNG frames behind a seekable index, i.e.
the same role MJPEG plays in real pipelines.

Layout (all integers big-endian uint32):

    b"MPNG" | n_frames | frame_interval_ms | len_0 | ... | len_{n-1}
    | frame_0 bytes | ... | frame_{n-1} bytes

The up-front length table makes frame extraction an O(1)-per-frame byte
slice — `index_mpng` never touches pixel data, mirroring how a production
sampler seeks an mp4's sample table (`stbl`) without decoding.  Frames
decode with functions/minipng.py (or any PNG decoder).

A real codec (PyAV/ffmpeg) drops into operators/multimodal.py's
`_video_frames` beside this parser without any pipeline change; MPNG keeps
the plumbing — schemas, explode shapes, Arrow batch contracts, feature
tower — honest and testable until then.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"MPNG"
_HEADER = struct.Struct(">4sII")


def encode_mpng(frames: list[bytes], frame_interval_ms: int) -> bytes:
    """Pack already-encoded PNG frame bytes into one MPNG payload."""
    if not frames:
        raise ValueError("MPNG needs at least one frame")
    if frame_interval_ms <= 0:
        raise ValueError("frame_interval_ms must be positive")
    head = _HEADER.pack(MAGIC, len(frames), frame_interval_ms)
    lens = struct.pack(f">{len(frames)}I", *(len(f) for f in frames))
    return head + lens + b"".join(frames)


def index_mpng(data: bytes) -> tuple[int, list[tuple[int, int]]] | None:
    """Parse the MPNG index WITHOUT touching frame bytes.

    Returns (frame_interval_ms, [(offset, length), ...]) or None when the
    payload is not MPNG / is truncated (undecodable media is surfaced as
    None, never an exception — same contract as minipng.decode_png's
    callers in operators/multimodal.py)."""
    if data is None or len(data) < _HEADER.size or data[:4] != MAGIC:
        return None
    _, n, interval = _HEADER.unpack_from(data, 0)
    if n == 0 or interval <= 0:
        return None
    table_end = _HEADER.size + 4 * n
    if len(data) < table_end:
        return None
    lens = struct.unpack_from(f">{n}I", data, _HEADER.size)
    offsets, pos = [], table_end
    for ln in lens:
        offsets.append((pos, ln))
        pos += ln
    if pos > len(data):
        return None  # truncated frame section
    return interval, offsets


def frame_at(data: bytes, idx: tuple[int, list[tuple[int, int]]], ts_ms: int) -> bytes:
    """The frame covering timestamp ts_ms (fixed-rate: frame i covers
    [i*interval, (i+1)*interval))."""
    interval, offsets = idx
    i = min(ts_ms // interval, len(offsets) - 1)
    off, ln = offsets[int(i)]
    return data[off : off + ln]


def video_features(frame_pixels: list[np.ndarray], n_bins: int = 8) -> np.ndarray:
    """Temporal descriptor over DECODED frame pixels: per-channel mean/std
    of the first, middle, and last frame, an n_bins luma histogram averaged
    over frames, and mean |frame-to-frame| pixel delta (motion energy).
    Deterministic, codec-independent — the video analog of
    miniwav.audio_features / multimodal._image_feature."""
    if not frame_pixels:
        return np.zeros(3 * 6 + n_bins + 1, dtype=np.float64)
    keys = [frame_pixels[0], frame_pixels[len(frame_pixels) // 2], frame_pixels[-1]]
    stats: list[float] = []
    for px in keys:
        f = px.astype(np.float64) / 255.0
        ch_mean = f.mean(axis=(0, 1))
        ch_std = f.std(axis=(0, 1))
        stats.extend(np.resize(ch_mean, 3))
        stats.extend(np.resize(ch_std, 3))
    hist = np.zeros(n_bins, dtype=np.float64)
    for px in frame_pixels:
        luma = px.astype(np.float64).mean(axis=2).ravel() / 255.0
        h, _ = np.histogram(luma, bins=n_bins, range=(0.0, 1.0))
        hist += h / max(luma.size, 1)
    hist /= len(frame_pixels)
    if len(frame_pixels) > 1:
        deltas = [
            np.abs(
                b.astype(np.float64) - a.astype(np.float64)
            ).mean()
            / 255.0
            for a, b in zip(frame_pixels, frame_pixels[1:])
            if a.shape == b.shape
        ]
        motion = float(np.mean(deltas)) if deltas else 0.0
    else:
        motion = 0.0
    return np.array(stats + hist.tolist() + [motion], dtype=np.float64)
