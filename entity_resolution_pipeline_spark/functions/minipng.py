"""Minimal pure-stdlib PNG codec (zlib + struct) for the multimodal decode
path.

The sandbox ships no image libraries, but PNG's baseline profile is fully
decodable with stdlib zlib: parse IHDR/IDAT/IEND chunks, inflate, undo the
five scanline filters (None/Sub/Up/Average/Paeth), and reshape to an
(h, w, c) uint8 array.  Supported: 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced — i.e. everything this
engine's own encoder emits plus the common baseline files a corpus pipeline
meets.  Unsupported profiles (16-bit, palette, Adam7) raise ValueError with
the offending parameter named.

This makes `multimodal.resize_images` / `extract_media_features` REAL
end-to-end (decode → pixels → feature/resize) rather than a stub, while
Pillow — when present — still takes precedence for the exotic profiles.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 1|2|3|4) → PNG bytes (filter 0, one IDAT).
    Deterministic: fixed zlib level, no ancillary chunks."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise ValueError(f"encode_png: unsupported channel count {c}")
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §9) → (h, w, c) uint8."""
    stride = w * c
    out = np.empty((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(c, stride):
                line[i] = (int(line[i]) + int(line[i - c])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"decode_png: unknown filter type {ftype}")
        out[y] = line
        prev = line
    return out.reshape(h, w, c)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8 array.  Baseline profile only (see module
    doc); malformed or unsupported input raises ValueError."""
    if not data.startswith(_SIGNATURE):
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos = len(_SIGNATURE)
    w = h = None
    ctype = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"decode_png: unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"decode_png: unsupported color type {ctype}")
            if interlace:
                raise ValueError("decode_png: Adam7 interlacing unsupported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("decode_png: missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    c = _CHANNELS[ctype]
    if len(raw) != h * (w * c + 1):
        raise ValueError("decode_png: unexpected decompressed size")
    return _unfilter(raw, h, w, c)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index arithmetic — deterministic and
    library-free; a production tower would use area/bilinear)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]
