"""Minimal pure-stdlib/numpy baseline-JPEG codec for the multimodal decode
path (the JFIF sibling of functions/minipng.py).

Real web corpora are JPEG-heavy, and the sandbox ships no image library, so
the image tower needs a stdlib decode path for the format it will actually
meet.  Baseline sequential JPEG is decodable with nothing but bit twiddling
plus a numpy IDCT:

  decode_jpeg: SOI/APPn/COM/DQT/DHT/DRI/SOF0|SOF1|SOF2/SOS parsing, Huffman
  entropy decode (tables read from the file's own DHT segments — files
  encoded with the standard Annex-K tables or libjpeg-optimized tables both
  work), restart-marker handling, dequant + inverse zigzag, vectorized
  8x8 IDCT over all blocks per component, chroma upsampling for any
  (h,v) sampling factors in {1,2} (4:4:4, 4:2:2, 4:2:0), YCbCr -> RGB.
  PROGRESSIVE (SOF2) decodes fully (T.81 Annex G): multi-scan coefficient
  accumulation — interleaved/non-interleaved DC first + DC refinement
  scans, per-component spectral-selection AC scans with EOB-run decoding,
  and successive-approximation AC refinement (correction bits, ZRL over
  zero-history runs) — a meaningful share of real web JPEGs is
  progressive, so the image tower must not stand-in for them.
  Unsupported profiles raise ValueError naming the parameter: arithmetic
  coding (SOF9+), hierarchical/lossless, 12-bit precision, >2 sampling
  factors.

  encode_jpeg_progressive: the fixture-side progressive encoder (same
  FDCT/quant front end) emitting a libjpeg-shaped scan script — DC first
  at Al=1 then DC refinement, per-component AC spectral bands at Al=2,
  then two AC refinement passes — so every progressive decode branch
  round-trips against the same quantized coefficients the baseline
  encoder produces (tests assert the decoded pixels are IDENTICAL to the
  baseline round-trip's, since both recover the same coefficients).

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

    def receive(self, size: int) -> int:
        """`size` raw bits, MSB-first, unsigned."""
        v = 0
        for _ in range(size):
            v = (v << 1) | self.read_bit()
        return v

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = self.receive(size)
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v

    def next_marker_pos(self) -> int:
        """Scan forward from the current byte to the next real marker
        (skipping stuffed FF00 pairs and RSTn) — where the following
        segment starts after a completed progressive scan."""
        p = self.pos
        d = self.data
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00 and not (
                0xD0 <= d[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return len(d)


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
        if marker == 0xD9:  # EOI: end of a progressive stream, or truncated
            if frame is not None and frame.get("progressive"):
                if not frame.get("n_scans"):
                    # SOF2 then EOI with zero completed scans: reconstructing
                    # empty coefficient grids would fabricate an all-gray
                    # image; the contract maps undecodable payloads to the
                    # caller's stand-in path instead (ADVICE r5 #2)
                    raise ValueError(
                        "decode_jpeg: progressive stream with no scans"
                    )
                return _reconstruct(frame, qt)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
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
            frame = dict(
                h=h, w=w, comps=comps, progressive=marker == 0xC2, n_scans=0
            )
            if frame["progressive"]:
                # coefficients accumulate across scans: allocate the
                # MCU-padded block grids up front
                _init_block_grids(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"decode_jpeg: unsupported frame type SOF marker 0x{marker:02X}"
                " (arithmetic/hierarchical/lossless)"
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
            if frame["progressive"]:
                ss, se, ahal = body[1 + 2 * ns: 4 + 2 * ns]
                pos = _progressive_scan(
                    data, pos + seglen, frame, scan, huff_dc, huff_ac,
                    restart_interval, ss, se, ahal >> 4, ahal & 0xF,
                )
                frame["n_scans"] += 1
                continue  # more scans (or EOI) follow
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    if frame is not None and frame.get("progressive"):
        if not frame.get("n_scans"):
            raise ValueError("decode_jpeg: progressive stream with no scans")
        return _reconstruct(frame, qt)  # stream ended without explicit EOI
    raise ValueError("decode_jpeg: no SOS segment")


def _init_block_grids(frame) -> None:
    """Allocate per-component MCU-padded coefficient grids (+ the
    non-interleaved sub-grid dims progressive AC scans walk)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]  # block-grid width (MCU-padded)
        c["bh"] = mcuy * c["v"]
        # T.81 A.2.2: non-interleaved scans cover only ceil(comp-size/8)
        # blocks, not the MCU-padded grid
        pw = -(-(w * c["h"]) // hmax)
        ph = -(-(h * c["v"]) // vmax)
        c["cw"] = -(-pw // 8)
        c["ch"] = -(-ph // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["pred"] = 0


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    comps = frame["comps"]
    _init_block_grids(frame)
    mcux, mcuy = frame["mcux"], frame["mcuy"]
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
    return _reconstruct(frame, qt)


def _reconstruct(frame, qt):
    """Accumulated coefficient grids → pixels: dequant, inverse zigzag,
    vectorized IDCT, upsample, crop, color convert.  Shared by the
    baseline single-scan path and the progressive multi-scan path."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
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


# ------------------------------------------------ progressive (SOF2) decoding


def _progressive_scan(
    data, pos, frame, scan, huff_dc, huff_ac, ri, ss, se, ah, al
):
    """Decode ONE progressive scan into the frame's coefficient grids
    (T.81 Annex G.2); returns the stream position of the next marker.

    DC scans (ss == 0) may be interleaved over MCUs or single-component;
    AC scans are always single-component and walk the component's OWN
    ceil-size block sub-grid (cw × ch), not the MCU-padded grid.  The
    restart interval counts MCUs for interleaved scans and blocks for
    non-interleaved ones; restarts reset DC predictors and the EOB run.
    """
    rdr = _BitReader(data, pos)
    st = {"eobrun": 0}
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("decode_jpeg: DC scan with Se != 0")
        interleaved = len(scan) > 1
        for comp, _, _ in scan:
            comp["pred"] = 0
        if interleaved:
            mcux, mcuy = frame["mcux"], frame["mcuy"]
            n_mcu = mcux * mcuy
            for m in range(n_mcu):
                if ri and m and m % ri == 0:
                    rdr.align_restart()
                    for comp, _, _ in scan:
                        comp["pred"] = 0
                my, mx = divmod(m, mcux)
                for comp, td, _ in scan:
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            row = my * comp["v"] + by
                            col = mx * comp["h"] + bx
                            blk = comp["coef"][row * comp["bw"] + col]
                            _dc_unit(rdr, huff_dc, td, comp, blk, ah, al)
        else:
            comp, td, _ = scan[0]
            for i in range(comp["ch"] * comp["cw"]):
                if ri and i and i % ri == 0:
                    rdr.align_restart()
                    comp["pred"] = 0
                row, col = divmod(i, comp["cw"])
                blk = comp["coef"][row * comp["bw"] + col]
                _dc_unit(rdr, huff_dc, td, comp, blk, ah, al)
    else:  # AC scan: always non-interleaved
        if len(scan) != 1:
            raise ValueError("decode_jpeg: interleaved AC progressive scan")
        comp, _, ta = scan[0]
        act = huff_ac[ta]
        for i in range(comp["ch"] * comp["cw"]):
            if ri and i and i % ri == 0:
                rdr.align_restart()
                st["eobrun"] = 0
            row, col = divmod(i, comp["cw"])
            blk = comp["coef"][row * comp["bw"] + col]
            if ah == 0:
                _ac_first(rdr, act, blk, ss, se, al, st)
            else:
                _ac_refine(rdr, act, blk, ss, se, al, st)
    return rdr.next_marker_pos()


def _dc_unit(rdr, huff_dc, td, comp, blk, ah, al):
    if ah == 0:  # first scan: Huffman-coded diff, scaled by the point transform
        size = rdr.huff(huff_dc[td])
        comp["pred"] += rdr.receive_extend(size)
        blk[0] = comp["pred"] << al
    else:  # refinement: one raw bit per block
        if rdr.read_bit():
            blk[0] |= 1 << al


def _ac_first(rdr, act, blk, ss, se, al, st):
    """AC first scan (Ah = 0): band [ss..se] values at precision Al, with
    EOB-run coding across blocks."""
    if st["eobrun"] > 0:
        st["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rdr.huff(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            er = (1 << r) - 1
            if r:
                er += rdr.receive(r)
            st["eobrun"] = er  # this block is done; er MORE blocks empty
            return
        k += r
        if k > se:
            raise ValueError("decode_jpeg: AC band overrun")
        blk[k] = rdr.receive_extend(s) << al
        k += 1


def _ac_refine(rdr, act, blk, ss, se, al, st):
    """AC refinement scan (Ah = Al + 1): correction bits for
    already-nonzero coefficients, ±1<<Al insertions for newly-significant
    ones, ZRL runs counted over zero-HISTORY positions only (G.1.2.3)."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if st["eobrun"] == 0:
        while k <= se:
            rs = rdr.huff(act)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    er = 1 << r
                    if r:
                        er += rdr.receive(r)
                    st["eobrun"] = er
                    break  # tail of this block handled below
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("decode_jpeg: refine size != 1")
                newval = p1 if rdr.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if rdr.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if st["eobrun"] > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0:
                if rdr.read_bit() and (v & p1) == 0:
                    blk[k] = v + (p1 if v > 0 else m1)
            k += 1
        st["eobrun"] -= 1


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


def _prep_coefs(arr, quality, subsample):
    """Shared encoder front end: color convert, subsample, FDCT, quantize.
    Returns (gray, h, w, samp, coefs, qy, qc) with coefs[ci] of shape
    (nby, nbx, 64) zigzagged int32 on the MCU-padded grid."""
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
    return gray, h, w, samp, coefs, qy, qc


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
    gray, h, w, samp, coefs, qy, qc = _prep_coefs(arr, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    dc_enc = _encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _encode_table(_ENC_AC_BITS, _ENC_AC_VALS)
    wtr = _BitWriter()
    preds = [0] * len(coefs)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.restart(m // restart_interval - 1)
            preds = [0] * len(coefs)
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


# -------------------------------------------------------- progressive encoder

# AC table for progressive scans: the baseline symbols plus the EOBn
# symbols (n<<4, n = 1..14) progressive EOB-run coding needs.  176 symbols,
# all at 8 bits (Kraft 176/256, all-ones code unused).
_ENC_AC_VALS_PROG = (
    [0x00, 0xF0]
    + [(r << 4) for r in range(1, 15)]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_ENC_AC_BITS_PROG = [
    0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_VALS_PROG), 0, 0, 0, 0, 0, 0, 0, 0,
]

_MAX_EOBRUN = 0x7FFF  # EOB14 ceiling: 2^14 + (2^14 - 1)


def _flush_eobrun(wtr, ac_tbl, st) -> None:
    """Emit the pending EOBn symbol (+ its extension bits) and any buffered
    refinement correction bits that ride with it."""
    if st["eobrun"]:
        n = st["eobrun"].bit_length() - 1
        length, code = ac_tbl[n << 4]
        wtr.write(code, length)
        if n:
            wtr.write(st["eobrun"] - (1 << n), n)
        st["eobrun"] = 0
    for b in st["pend"]:
        wtr.write(b, 1)
    st["pend"] = []


def _enc_ac_first(wtr, ac_tbl, blk, ss, se, al, st) -> None:
    """One block of an AC first scan (Ah=0): magnitudes |v|>>Al in the band,
    run/size coding with EOB-run accumulation across blocks."""
    mags = [(abs(int(blk[k])) >> al) for k in range(ss, se + 1)]
    last = -1
    for i, m in enumerate(mags):
        if m:
            last = i
    if last < 0:
        st["eobrun"] += 1
        if st["eobrun"] == _MAX_EOBRUN:
            _flush_eobrun(wtr, ac_tbl, st)
        return
    _flush_eobrun(wtr, ac_tbl, st)
    r = 0
    for i in range(last + 1):
        m = mags[i]
        if m == 0:
            r += 1
            continue
        while r > 15:
            length, code = ac_tbl[0xF0]
            wtr.write(code, length)
            r -= 16
        s = m.bit_length()
        length, code = ac_tbl[(r << 4) | s]
        wtr.write(code, length)
        v = m if int(blk[ss + i]) > 0 else -m
        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if last < se - ss:
        st["eobrun"] += 1
        if st["eobrun"] == _MAX_EOBRUN:
            _flush_eobrun(wtr, ac_tbl, st)


def _enc_ac_refine(wtr, ac_tbl, blk, ss, se, al, st) -> None:
    """One block of an AC refinement scan (Ah = Al+1): correction bits for
    already-significant coefficients, run/1 insertions for newly-significant
    ones, ZRL over zero-history runs inside the EOB window (G.1.2.3)."""
    mags = [(abs(int(blk[k])) >> al) for k in range(ss, se + 1)]
    eob = -1
    for i, m in enumerate(mags):
        if m == 1:
            eob = i
    r = 0
    br: list[int] = []
    for i in range(se - ss + 1):
        t = mags[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            _flush_eobrun(wtr, ac_tbl, st)
            length, code = ac_tbl[0xF0]
            wtr.write(code, length)
            r -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _flush_eobrun(wtr, ac_tbl, st)
        length, code = ac_tbl[(r << 4) | 1]
        wtr.write(code, length)
        wtr.write(1 if int(blk[ss + i]) > 0 else 0, 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st["eobrun"] += 1
        st["pend"].extend(br)
        if st["eobrun"] == _MAX_EOBRUN:
            _flush_eobrun(wtr, ac_tbl, st)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 grayscale / RGB array → PROGRESSIVE (SOF2) JPEG bytes.

    Same FDCT/quant front end as `encode_jpeg`, so the quantized
    coefficients — and therefore the decoded pixels — are IDENTICAL to the
    baseline encoding's; only the entropy layer differs.  Scan script
    (libjpeg-shaped, exercising every Annex-G decode branch):

      1. DC, interleaved, Ah=0 Al=1
      2. DC refinement, Ah=1 Al=0 (raw bits)
      per component: AC 1-5 @ Al=2, AC 6-63 @ Al=2,
                     AC 1-63 refine Al=2→1, AC 1-63 refine Al=1→0

    `restart_interval` > 0 emits DRI + RSTn in every scan (MCU units for
    the DC scans, block units for the AC scans), resetting DC predictors
    and flushing/resetting the EOB run as the spec requires."""
    gray, h, w, samp, coefs, qy, qc = _prep_coefs(arr, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ncomp = 1 if gray else 3
    # non-interleaved AC sub-grids (match the decoder's ceil-size walk)
    sub = []
    for hi, vi in samp:
        pw = -(-(w * hi) // hmax)
        ph = -(-(h * vi) // vmax)
        sub.append((-(-ph // 8), -(-pw // 8)))

    dc_enc = _encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _encode_table(_ENC_AC_BITS_PROG, _ENC_AC_VALS_PROG)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_header(comp_ids: list[int], tds: list[int], tas: list[int],
                   ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qy.reshape(64)[_ZIGZAG].tolist()))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc.reshape(64)[_ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1)
    out += seg(0xC2, sof)
    dht = bytes([0x00]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
    dht += bytes([0x10]) + bytes(_ENC_AC_BITS_PROG) + bytes(_ENC_AC_VALS_PROG)
    if not gray:
        dht += bytes([0x01]) + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        dht += bytes([0x11]) + bytes(_ENC_AC_BITS_PROG) + bytes(
            _ENC_AC_VALS_PROG
        )
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    # --- scan 1: DC first, interleaved, Al=1
    out += sos_header(
        list(range(1, ncomp + 1)), [0 if ci == 0 else 1 for ci in range(ncomp)],
        [0] * ncomp, 0, 0, 0, 1,
    )
    wtr = _BitWriter()
    preds = [0] * ncomp
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.restart(m // restart_interval - 1)
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    t = int(coefs[ci][my * vi + by, mx * hi + bx][0]) >> 1
                    diff = t - preds[ci]
                    preds[ci] = t
                    size = _size_of(diff)
                    length, code = dc_enc[size]
                    wtr.write(code, length)
                    if size:
                        wtr.write(
                            diff if diff > 0 else diff + (1 << size) - 1, size
                        )
    out += wtr.flush()

    # --- scan 2: DC refinement, Al=0 (one raw bit per block)
    out += sos_header(
        list(range(1, ncomp + 1)), [0] * ncomp, [0] * ncomp, 0, 0, 1, 0
    )
    wtr = _BitWriter()
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.restart(m // restart_interval - 1)
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    wtr.write(
                        int(coefs[ci][my * vi + by, mx * hi + bx][0]) & 1, 1
                    )
    out += wtr.flush()

    # --- per-component AC scans
    for ci in range(ncomp):
        ta = 0 if ci == 0 else 1
        ch, cw = sub[ci]
        for ss, se, ah, al in (
            (1, 5, 0, 2),
            (6, 63, 0, 2),
            (1, 63, 2, 1),
            (1, 63, 1, 0),
        ):
            out += sos_header([ci + 1], [0], [ta], ss, se, ah, al)
            wtr = _BitWriter()
            st = {"eobrun": 0, "pend": []}
            for i in range(ch * cw):
                if restart_interval and i and i % restart_interval == 0:
                    _flush_eobrun(wtr, ac_enc, st)
                    wtr.restart(i // restart_interval - 1)
                row, col = divmod(i, cw)
                blk = coefs[ci][row, col]
                if ah == 0:
                    _enc_ac_first(wtr, ac_enc, blk, ss, se, al, st)
                else:
                    _enc_ac_refine(wtr, ac_enc, blk, ss, se, al, st)
            _flush_eobrun(wtr, ac_enc, st)
            out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)
