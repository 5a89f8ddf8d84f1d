"""Pure-Python baseline JPEG codec (no PIL/libjpeg).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
with 4:4:4 / 4:2:0 / 4:2:2 sampling, restart markers — the profile
covering the overwhelming majority of web JPEGs. Encoder: 4:4:4
grayscale/RGB with the Annex-K example tables, used to synthesize REAL
JPEG payloads for tests and pipelines in containers without an encoder.

Numpy-vectorized where it matters (IDCT as two 8x8 matrix products per
block batch, color transform on whole planes); the entropy decode is a
tight Python loop over Huffman symbols — fine for the thumbnail /
feature-extract regime the multimodal stages target (production
containers with PIL take the compiled path in ``ops/multimodal.py``).
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order: index z -> (row, col) of the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: IDCT basis: x = C^T @ X @ C with C[u, i] = a(u) cos((2i+1)u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _i in range(8):
        _C[_u, _i] = _a * np.cos((2 * _i + 1) * _u * np.pi / 16)

# Annex K example tables (the de-facto standard set)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits, vals):
    """(code, length) -> value map plus a (length -> {code: val}) list
    for the canonical Huffman walk."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos
        self.acc, self.n = 0, 0

    def _fill(self):
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG: entropy stream ends early")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated JPEG: dangling 0xFF at end")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST: caller resyncs via restart()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            self._fill()
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        return v

    def huff(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code")

    def restart(self):
        """Consume an RST marker and realign to a byte boundary."""
        self.acc, self.n = 0, 0
        while True:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated JPEG: expected RST marker")
            if self.buf[self.pos] == 0xFF and \
                    0xD0 <= self.buf[self.pos + 1] <= 0xD7:
                break
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude v to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, c) uint8 (c = 1 or 3)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    scan: list[dict] = []
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(blob):
            raise ValueError("truncated JPEG: dangling marker byte")
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(blob):
            raise ValueError("truncated JPEG: segment length cut off")
        (seglen,) = struct.unpack_from(">H", blob, pos)
        if pos + seglen > len(blob):
            raise ValueError("truncated JPEG: segment body cut off")
        seg = blob[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                quant[tq] = q
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            p = 6
            for _ in range(nc):
                cid, hv, tq = seg[p], seg[p + 1], seg[p + 2]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
                p += 3
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) is supported by the pure-Python reader")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            p = 1
            for _ in range(ns):
                cs, td_ta = seg[p], seg[p + 1]
                scan.append({"id": cs, "td": td_ta >> 4, "ta": td_ta & 15})
                p += 2
            pos += seglen
            break
        pos += seglen
    if not comps or not scan:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["id"]] for s in scan]
    for c, s in zip(order, scan):
        c["td"], c["ta"] = s["td"], s["ta"]
        c["bw"] = mcux * c["h"]  # blocks across, per component
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0

    reader = _BitReader(blob, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart()
                for c in order:
                    c["pred"] = 0
            mcu_count += 1
            for c in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        while True:
                            try:
                                t = reader.huff(huff_dc[c["td"]])
                                break
                            except _RestartMarker:
                                reader.restart()
                                for cc in order:
                                    cc["pred"] = 0
                        diff = _extend(reader.read(t), t) if t else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.huff(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k >= 64:
                                raise ValueError(
                                    "corrupt JPEG: AC run past block end")
                            blk[k] = _extend(reader.read(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk

    planes = []
    for c in order:
        q = quant[c["tq"]]
        dz = np.zeros((len(c["coef"]), 64), dtype=np.float64)
        dz[:, _ZZ] = c["coef"] * q  # de-zigzag + dequantize
        blocks = dz.reshape(-1, 8, 8)
        # batched 2-D IDCT: x = C^T X C
        spat = np.einsum("ui,nuv,vj->nij", _C, blocks, _C) + 128.0
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        for i in range(len(blocks)):
            r, col = divmod(i, c["bw"])
            plane[r * 8:r * 8 + 8, col * 8:col * 8 + 8] = spat[i]
        # upsample to full resolution (nearest, per sampling factors)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255) \
            .astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4, Annex-K tables) — synthesizes REAL JPEGs for tests
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, nbits: int):
        self.acc = (self.acc << nbits) | code
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:  # pad the final partial byte with 1-bits
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _mag(v: int) -> tuple[int, int]:
    """(size, amplitude code) for DC/AC value v."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def encode_jpeg(px: np.ndarray, quality_tables=None) -> bytes:
    """Minimal baseline JPEG writer: 8-bit grayscale or RGB, 4:4:4,
    Annex-K quant+Huffman tables. Real, decodable-anywhere output."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    qs = quality_tables or (QUANT_LUMA, QUANT_CHROMA)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.zeros((ph, pw, nc), dtype=np.float64)
    padded[:h, :w] = px.astype(np.float64)
    padded[h:, :w] = padded[h - 1:h, :w]  # edge-pad
    padded[:, w:] = padded[:, w - 1:w]
    if nc == 3:
        r, g, b = padded[:, :, 0], padded[:, :, 1], padded[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, 0), (cb, 1), (cr, 1)]
    else:
        planes = [(padded[:, :, 0], 0)]

    def _zz_quant(plane, q):
        hh, ww = plane.shape
        blocks = plane.reshape(hh // 8, 8, ww // 8, 8) \
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
        coef = np.einsum("ui,nij,vj->nuv", _C, blocks, _C).reshape(-1, 64)
        return np.round(coef[:, _ZZ]
                        / np.asarray(q, np.float64)[_ZZ][None, :]) \
            .astype(np.int64)

    coefs = [_zz_quant(p, qs[t]) for p, t in planes]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, payload: bytes):
        out.extend(b"\xff" + bytes([marker])
                   + struct.pack(">H", len(payload) + 2) + payload)

    for tq, q in enumerate(qs[:2 if nc == 3 else 1]):
        zz_q = np.asarray(q, np.int64)[_ZZ]
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in zz_q))
    sof = struct.pack(">BHHB", 8, h, w, nc)  # TRUE dims; MCUs cover pad
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    tables = [(_DC_LUMA, 0x00), (_AC_LUMA, 0x10)]
    if nc == 3:
        tables += [(_DC_CHROMA, 0x01), (_AC_CHROMA, 0x11)]
    for (bits, vals), tcth in tables:
        seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    enc_dc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    enc_ac = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]
    bw = _BitWriter()
    nby, nbx = ph // 8, pw // 8
    preds = [0] * nc
    for bi in range(nby * nbx):
        for ci in range(nc):
            tid = 0 if ci == 0 else 1
            blk = coefs[ci][bi]
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            t, amp = _mag(diff)
            code, ln = enc_dc[tid][t]
            bw.write(code, ln)
            if t:
                bw.write(amp, t)
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[tid][0xF0]
                    bw.write(code, ln)
                    run -= 16
                t, amp = _mag(v)
                code, ln = enc_ac[tid][(run << 4) | t]
                bw.write(code, ln)
                bw.write(amp, t)
                run = 0
            if run:
                code, ln = enc_ac[tid][0x00]
                bw.write(code, ln)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
