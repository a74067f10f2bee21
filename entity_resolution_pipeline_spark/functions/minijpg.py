"""Minimal pure-stdlib/numpy baseline-JPEG codec for the multimodal decode
path (the JFIF sibling of functions/minipng.py).

Real web corpora are JPEG-heavy, and the sandbox ships no image library, so
the image tower needs a stdlib decode path for the format it will actually
meet.  Baseline sequential JPEG is decodable with nothing but bit twiddling
plus a numpy IDCT:

  decode_jpeg: SOI/APPn/COM/DQT/DHT/DRI/SOF0|SOF1/SOS parsing, Huffman
  entropy decode (tables read from the file's own DHT segments — files
  encoded with the standard Annex-K tables or libjpeg-optimized tables both
  work), restart-marker handling, dequant + inverse zigzag, vectorized
  8x8 IDCT over all blocks per component, chroma upsampling for any
  (h,v) sampling factors in {1,2} (4:4:4, 4:2:2, 4:2:0), YCbCr -> RGB.
  Unsupported profiles raise ValueError naming the parameter: progressive
  (SOF2), arithmetic coding (SOF9+), 12-bit precision, >2 sampling factors.

  encode_jpeg: the fixture-side inverse (quality-scaled Annex-K quant
  tables, FDCT, run-length + Huffman coding).  It emits VALID but simple
  Huffman tables — every DC size symbol at 4 bits, every AC (run,size)
  symbol at 8 bits (Kraft sums 12/16 and 162/256, and the all-ones code
  stays unused as the spec requires) — declared in DHT, so any conformant
  decoder reads them; compression is a little worse than the standard
  tables, which is irrelevant for fixtures.

Like minipng, this makes `multimodal.extract_media_features` /
`resize_images` REAL end-to-end for JPEG inputs; Pillow — when present —
still takes precedence.  JPEG is lossy: round-trip tests assert bounded
error, not bit equality.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- shared tables

# Annex K.1/K.2 quantization tables (luminance, chrominance), row-major.
_QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_QUANT_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    """(64,) linear indices of the zigzag scan (generated, not transcribed)."""
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        for r in rng:
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8-point DCT-II basis: F = A @ f @ A.T ; f = A.T @ F @ A
_A = np.array(
    [
        [
            0.5
            * (np.sqrt(0.5) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """JPEG Annex C code assignment: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


# encoder-side Huffman: all DC symbols (sizes 0..11) at 4 bits, all AC
# (run,size) symbols + EOB + ZRL at 8 bits — valid canonical tables
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_table(bits: list[int], values: list[int]) -> dict:
    """{symbol: (length, code)} from the same canonical assignment."""
    return {
        sym: (length, code)
        for (length, code), sym in _canonical_codes(bits, values).items()
    }


# ------------------------------------------------------------------ decoding


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.bit == 0:
            if d[self.pos] == 0xFF:
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    pass  # stuffed FF — consume the 00 when advancing
                else:
                    raise ValueError(
                        f"decode_jpeg: marker 0x{nxt:02X} inside entropy data"
                    )
        byte = self.data[self.pos]
        v = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if byte == 0xFF:
                self.pos += 1  # skip the stuffed 0x00
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        if self.bit:
            self.bit = 0
            if self.data[self.pos] == 0xFF:
                self.pos += 1  # stuffed pair never ends a segment mid-RST
            self.pos += 1
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("decode_jpeg: expected restart marker")
        self.pos += 2

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("decode_jpeg: invalid Huffman code")

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = 0
        for _ in range(size):
            v = (v << 1) | self.read_bit()
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, c) uint8 array (c=1 grayscale, c=3 RGB).
    Baseline sequential only (see module doc); malformed or unsupported
    input raises ValueError."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("decode_jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = (
                        np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    )
                    i += 128
                qt[tq] = tbl[_UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _canonical_codes(
                    bits, vals
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"decode_jpeg: unsupported precision {prec}")
            comps = []
            for k in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * k)
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"decode_jpeg: unsupported sampling {hi}x{vi}"
                    )
                comps.append(dict(cid=cid, h=hi, v=vi, tq=tq))
            frame = dict(h=h, w=w, comps=comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"decode_jpeg: unsupported frame type SOF marker 0x{marker:02X}"
                " (progressive/arithmetic)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            ns = body[0]
            scan = []
            for k in range(ns):
                cs, tdta = body[1 + 2 * k], body[2 + 2 * k]
                comp = next(c for c in frame["comps"] if c["cid"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("decode_jpeg: no SOS segment")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # block-grid width
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0
    rdr = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if ri and m and m % ri == 0:
            rdr.align_restart()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for comp, td, ta in scan:
            dct = huff_dc[td]
            act = huff_ac[ta]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    size = rdr.huff(dct)
                    comp["pred"] += rdr.receive_extend(size)
                    blk[0] = comp["pred"]
                    k = 1
                    while k < 64:
                        rs = rdr.huff(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("decode_jpeg: AC index overrun")
                        blk[k] = rdr.receive_extend(s)
                        k += 1
                    row = my * comp["v"] + by
                    col = mx * comp["h"] + bx
                    comp["coef"][row * comp["bw"] + col] = blk
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        coef = c["coef"][:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        coef *= q[None, :, :]
        # vectorized IDCT over every block: f = A.T @ F @ A
        px = np.einsum("ux,nuv,vy->nxy", _A, coef, _A) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full-resolution grid, crop to (h, w)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    if len(planes) != 3:
        raise ValueError(f"decode_jpeg: {len(planes)}-component scan")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


# ------------------------------------------------------------------ encoding


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def restart(self, idx: int) -> None:
        """Byte-align (1-padding) and emit RST(idx % 8) raw — markers are
        never byte-stuffed."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.out)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUM, _QUANT_CHR):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _size_of(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(wtr, blk_zz, pred, dc_tbl, ac_tbl):
    diff = int(blk_zz[0]) - pred
    size = _size_of(diff)
    length, code = dc_tbl[size]
    wtr.write(code, length)
    if size:
        wtr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    nz = np.nonzero(blk_zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(blk_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tbl[0xF0]
            wtr.write(code, length)
            run -= 16
        size = _size_of(v)
        length, code = ac_tbl[(run << 4) | size]
        wtr.write(code, length)
        wtr.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = ac_tbl[0x00]
        wtr.write(code, length)
    return int(blk_zz[0])


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (nby, nbx, 64) zigzagged
    quantized coefficients."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coef = np.einsum("ux,nmxy,vy->nmuv", _A, blocks, _A)
    qd = np.round(coef / q[None, None, :, :]).astype(np.int32)
    return qd.reshape(hh // 8, ww // 8, 64)[:, :, _ZIGZAG]


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) | (h, w, 1) grayscale or (h, w, 3) RGB → baseline JPEG
    bytes.  subsample: False/"444" = no chroma subsampling, True/"420" =
    4:2:0 (2x2 Y blocks per MCU), "422" = 4:2:2 (horizontal only).
    restart_interval>0 emits a DRI segment and RSTn markers every that
    many MCUs (resetting DC predictors), exactly as real encoders do for
    error resilience.  Deterministic; see module doc for the Huffman
    tables."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qy, qc = _quality_tables(quality)
    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [y, cb, cr]
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        ysamp = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[mode]
        samp = [ysamp, (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def pad_to(p, th, tw):
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge")

    coefs = []
    for p, (hi, vi) in zip(planes, samp):
        if (hi, vi) != (hmax, vmax):
            # box-average downsample by the sampling ratio
            fy, fx = vmax // vi, hmax // hi
            p = pad_to(p, -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx)
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        th, tw = mcuy * vi * 8, mcux * hi * 8
        q = qy if len(coefs) == 0 else qc
        coefs.append(_fdct_quant(pad_to(p, th, tw), q))

    dc_enc = _encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _encode_table(_ENC_AC_BITS, _ENC_AC_VALS)
    wtr = _BitWriter()
    preds = [0] * len(planes)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.restart(m // restart_interval - 1)
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    blk = coefs[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _encode_block(wtr, blk, preds[ci], dc_enc, ac_enc)
    payload = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qy.reshape(64)[_ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc.reshape(64)[_ZIGZAG].tolist()))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += struct.pack(
            ">BBB", ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1
        )
    out += seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    if not gray:
        dht += bytes([0x01]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        dht += bytes([0x11]) + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += payload
    out += b"\xff\xd9"
    return bytes(out)
