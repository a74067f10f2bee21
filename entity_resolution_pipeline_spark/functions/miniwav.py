"""Pure-stdlib WAV (RIFF PCM) decode/encode + deterministic audio features.

The audio sibling of `minipng.py`: the container ships no audio libraries,
but PCM WAV needs none — the stdlib `wave` module parses the RIFF framing
and numpy vectorizes the sample conversion.  This makes the multimodal
audio path REAL (decode actual bytes, featurize actual samples) instead of
a content-hash stand-in; a production pipeline swaps `audio_features` for
an audio tower — the Spark plumbing around it is identical.

Supported: 8-bit unsigned, 16/24/32-bit signed little-endian PCM, any
channel count/rate.  Anything else (compressed WAV, truncated RIFF,
non-WAV bytes) raises ValueError — callers map that to the stand-in path,
never a task abort.

No reference counterpart (the reference has no multimodal surface at all);
this extends the engine per the training-data-pipeline brief.
"""

from __future__ import annotations

import io
import wave

import numpy as np

__all__ = ["decode_wav", "encode_wav", "audio_features"]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, n_channels) float64 samples in [-1, 1],
    framerate).  Vectorized: one frombuffer + one scale per call."""
    try:
        with wave.open(io.BytesIO(data)) as w:
            nch, sw, rate, nframes = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(nframes)
    except (wave.Error, EOFError, OSError) as e:
        raise ValueError(f"not a decodable PCM WAV: {e}") from e
    if nch < 1 or rate < 1 or sw not in (1, 2, 3, 4):
        raise ValueError(f"unsupported WAV layout: ch={nch} sw={sw} rate={rate}")
    usable = len(raw) - len(raw) % (sw * nch)
    raw = raw[:usable]
    if sw == 1:  # unsigned 8-bit
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit: assemble three LE bytes into a signed int
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v & 0x800000) << 1  # sign-extend bit 23
        x = v.astype(np.float64) / 8388608.0
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int, sampwidth: int = 2) -> bytes:
    """(n, ch) float samples in [-1, 1] → PCM WAV bytes (16-bit default).
    Used by the synthetic media generator and codec-roundtrip tests."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if s.shape[0] == 1 and s.ndim == 2 and samples.ndim == 1:
        s = s.T
    s = np.clip(s, -1.0, 1.0)
    if sampwidth == 2:
        pcm = np.round(s * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 1:
        pcm = (np.round(s * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("encode supports sampwidth 1 or 2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(pcm)
    return buf.getvalue()


def audio_features(samples: np.ndarray, rate: int, n_bands: int = 8) -> np.ndarray:
    """REAL decoded-sample descriptor, the audio analog of
    `multimodal._image_feature`: per-channel RMS + zero-crossing rate,
    global mean/std, duration, and `n_bands` relative spectral-band
    energies of the mono mix (rfft magnitude, equal-width bands).
    Deterministic and a pure function of the samples."""
    s = np.atleast_2d(samples)
    if s.shape[0] == 1 and samples.ndim == 1:
        s = s.T
    n, nch = s.shape
    stats: list[float] = [float(n) / float(rate)]  # duration (s)
    for ch in range(nch):
        x = s[:, ch]
        stats.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
        stats.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0)
    mono = s.mean(axis=1)
    stats += [float(mono.mean()) if n else 0.0, float(mono.std()) if n else 0.0]
    if n >= 2:
        mag = np.abs(np.fft.rfft(mono))
        total = float(mag.sum())
        for band in np.array_split(mag, n_bands):
            stats.append(float(band.sum()) / total if total > 0 else 0.0)
    else:
        stats += [0.0] * n_bands
    return np.array(stats, dtype=np.float64)
