"""Baseline JPEG codec, pure numpy + stdlib (VERDICT r04 #3).

JPEG is what a Common-Crawl media column actually holds, so the
`decode_media` kernel decodes it in-container: baseline sequential DCT
(SOF0), Huffman entropy coding, 8-bit precision, grayscale or YCbCr with
any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers,
16-bit DQT entries. Out-of-subset variants raise NotImplementedError by
NAME (progressive SOF2, arithmetic coding, 12-bit precision, >2 sampling
factors) — never silently wrong pixels.

Shape of the work: marker/Huffman parsing is per-symbol Python (entropy
decoding is inherently sequential), but everything O(pixels) is
vectorized — dequantization, the 2-D IDCT (one einsum over ALL blocks of
a component against the orthonormal DCT-II matrix), chroma upsampling
(np.repeat), and the YCbCr<->RGB conversions. Throughput is decode-kernel
scale (~1-2 MB/s of coefficients): fine for gate-scale corpora and
feature extraction; swap in PIL/libjpeg-turbo through
``extract_features(kernel=...)`` for production image volumes — the seam
and this codec share the (payload, meta) -> pixels contract.

The encoder twin exists so tests can pin the decoder bit-exactly:
`decode_jpeg(encode_jpeg(px))` must equal the spatial-domain reference
computation (forward DCT -> quantize -> dequantize -> IDCT in the same
arithmetic) — the entropy layer must be lossless, the only information
loss the quantizer's. Tables follow ITU-T T.81 Annex K; the decoder reads
tables from the stream (DQT/DHT), never assumes these.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: index = scan position, value = natural position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K quantization tables (natural order, row-major)
Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (BITS[1..16] code counts, HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: coeff = C @ block @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(length, code) pairs in symbol order for a canonical Huffman spec."""
    out = []
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code))
            code += 1
        code <<= 1
    return out


def _decode_table(bits, vals) -> dict[tuple[int, int], int]:
    return {lc: v for lc, v in zip(_canonical_codes(bits), vals)}


def _encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    return {v: lc for lc, v in zip(_canonical_codes(bits), vals)}


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs 0xFF00, stops at any
    other marker, realigns across RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None  # marker that ended the segment

    def _next_byte(self) -> int | None:
        d = self.data
        while self.pos < len(d):
            b = d[self.pos]
            self.pos += 1
            if b != 0xFF:
                return b
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            self.marker = nxt
            self.pos += 1
            return None
        self.marker = 0xD9
        return None

    def read_bit(self) -> int:
        if self.n == 0:
            b = self._next_byte()
            if b is None:
                raise ValueError("JPEG scan truncated inside a block")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker boundary: drop pad bits, expect the
        marker either already seen or next in the stream."""
        self.n = 0
        if self.marker is None:
            d = self.data
            if not (
                self.pos + 1 < len(d)
                and d[self.pos] == 0xFF
                and 0xD0 <= d[self.pos + 1] <= 0xD7
            ):
                raise ValueError("expected JPEG restart marker")
            self.pos += 2
        else:
            if not 0xD0 <= self.marker <= 0xD7:
                raise ValueError("expected JPEG restart marker")
            self.marker = None


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (H, W, C) uint8 (C = 3 RGB or 1 grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG (8-bit only)")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 15
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hi}x{vi} (1..2 only)"
                    )
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} (baseline SOF0/1 only)"
            )
        elif marker == 0xCC:
            raise NotImplementedError("arithmetic-coded JPEG (DAC)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cs] = (tt >> 4, tt & 15)
            return _decode_scan(
                payload, pos, frame, sel, qtables, htables, restart_interval
            )
        # APPn / COM / anything else: skipped
    raise ValueError("JPEG ended without an SOS scan")


def _decode_scan(data, pos, frame, sel, qtables, htables, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]          # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.int64)
        c["dc_t"], c["ac_t"] = sel[c["id"]]
        c["pred"] = 0
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_tbl = htables[(0, c["dc_t"])]
                ac_tbl = htables[(1, c["ac_t"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(r, dc_tbl)
                        diff = _extend(r.read_bits(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 0
                        while k < 63:
                            rs = _huff_decode(r, ac_tbl)
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr + 1
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[ZIGZAG[k]] = _extend(r.read_bits(ss), ss)
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = blk.reshape(8, 8)
            mcu_count += 1
    planes = []
    for c in comps:
        q = qtables[c["tq"]].reshape(8, 8)
        deq = c["coef"] * q                           # vectorized dequant
        px = np.einsum("ij,njk,kl->nil", _C.T, deq.astype(np.float64), _C)
        px = np.clip(np.round(px) + 128.0, 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, None]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-compatible quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (Q_LUMA, Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _encode_block(bw, blk, pred, dc_map, ac_map):
    zz = blk.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    length, code = dc_map[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_map[0xF0]
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        length, code = ac_map[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        length, code = ac_map[0x00]
        bw.write(code, length)
    return int(zz[0])


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (multiple of 8) -> quantized coefficient blocks
    (nby, nbx, 8, 8) int64: level shift, orthonormal DCT, round(x / q)."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,nmjk,kl->nmil", _C, blocks, _C.T)
    return np.round(coef / q.reshape(8, 8)).astype(np.int64)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return tuple(
        np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    )


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, C]) uint8 -> baseline JPEG bytes. C = 1 (grayscale) or 3
    (RGB). ``subsample``: False/'444' = no subsampling, True/'420' =
    2x2 box-averaged chroma, '422' = horizontal-only 2x1 (exercises the
    decoder's asymmetric-factor path). Annex K tables at libjpeg
    ``quality`` scaling. ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (predictors reset, bitstream
    byte-realigned)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ql, qc = quality_tables(quality)
    if ch == 1:
        planes = [px[:, :, 0]]
        factors = [(1, 1)]
        qsel = [0]
    elif ch == 3:
        y, cb, cr = _rgb_to_ycbcr(px)
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode not in ("444", "420", "422"):
            raise ValueError(f"unknown subsample mode {subsample!r}")

        def box(p, fy, fx):
            p = _pad_to(p, fy, fx).astype(np.float64)
            q = (
                p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx)
                .mean(axis=(1, 3))
            )
            return np.clip(np.round(q), 0, 255).astype(np.uint8)

        if mode == "420":
            planes = [y, box(cb, 2, 2), box(cr, 2, 2)]
            factors = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":  # horizontal-only chroma decimation
            planes = [y, box(cb, 1, 2), box(cr, 1, 2)]
            factors = [(2, 1), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    else:
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtabs = [ql, qc]
    coefs = []
    for plane, (hi, vi), tq in zip(planes, factors, qsel):
        padded = _pad_to(plane, mcuy * vi * 8, mcux * hi * 8)
        padded = padded[: mcuy * vi * 8, : mcux * hi * 8]
        coefs.append(_forward_blocks(padded, qtabs[tq]))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HBB", 1, 1, 0) + b"\x00\x00"
    for tq in sorted(set(qsel)):
        # DQT stores scan order: value at scan slot i = natural[ZIGZAG[i]]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in qtabs[tq][ZIGZAG]
        )
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, ((hi, vi), tq) in enumerate(zip(factors, qsel)):
        sof += bytes([i + 1, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    huff_specs = [
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ]
    if len(planes) > 1:
        huff_specs += [
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, th, bits, vals in huff_specs:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        tt = 0 if i == 0 else 0x11
        sos += bytes([i + 1, tt])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_maps = [_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_maps = [_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)]
    if len(planes) > 1:
        dc_maps.append(_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_maps.append(_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS))
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes(
                    [0xFF, 0xD0 + ((mcu_count // restart_interval) - 1) % 8]
                )
                bw = _BitWriter()
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (hi, vi) in enumerate(factors):
                hsel = 0 if ci == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        blk = coefs[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_block(
                            bw, blk, preds[ci],
                            dc_maps[hsel], ac_maps[hsel],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
