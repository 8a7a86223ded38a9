"""Baseline JPEG decoder — stdlib + NumPy only (VERDICT r4 item 6).

Scope: baseline sequential DCT (SOF0), 8-bit samples, grayscale or
YCbCr with any h/v sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart
markers. Progressive (SOF2), arithmetic coding, 12-bit and hierarchical
modes raise NotImplementedError — ``decode_image_bytes`` surfaces that
as the codec gap it is (install PIL for full coverage).

Written against the public spec (ITU-T T.81 / ISO 10918-1): canonical
Huffman from DHT (F.2.2.1), receive/extend (F.2.2.1), run-length AC
(F.2.2.2), IDCT as the orthonormal 8x8 DCT-II basis applied per block
(A.3.3), nearest-neighbor chroma upsampling, YCbCr->RGB per JFIF. The
Huffman bit loop is per-symbol Python — fixture-scale, like the PNG
row-filter loop (multimodal.py); the IDCT and color transform are
vectorized over all blocks.

Tested against an independent spec-following encoder in
tests/test_multimodal.py: the decoder must reproduce the encoder's own
quantized reconstruction within +-1 (the only freedom left is IDCT
rounding), not just "look close".
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> raster index within the 8x8 block (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: spatial = T.T @ coef @ T
_K = np.arange(8.0)
_DCT_T = np.sqrt(2.0 / 8.0) * np.cos(
    (2.0 * _K[None, :] + 1.0) * _K[:, None] * np.pi / 16.0)
_DCT_T[0] *= 1.0 / np.sqrt(2.0)


def build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman per T.81 C.2: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a destuffed entropy-coded segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0       # byte position
        self.bit = 0       # bits consumed of current byte

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block of zigzag coefficients; returns (coefs[64], new DC)."""
    zz = np.zeros(64, dtype=np.int32)
    t = br.read_symbol(dc_tab)
    pred += _extend(br.read_bits(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:        # ZRL: sixteen zeros
                k += 16
                continue
            break              # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    return zz, pred


def _split_restarts(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuff the scan's entropy bytes from ``start``, splitting on RST
    markers. Returns (segments, position of the terminating marker)."""
    segs, cur, i = [], bytearray(), start
    while i < len(data):
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < len(data) else 0xD9
        if nxt == 0x00:              # stuffed 0xFF literal
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:    # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                        # real marker: end of scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w) or (h, w, 3) uint8 (RGB)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> table
    frame = None
    restart = 0
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        m = blob[i + 1]
        if m == 0xD9:                 # EOI
            break
        (ln,) = struct.unpack(">H", blob[i + 2:i + 4])
        seg = blob[i + 4:i + 2 + ln]
        if m == 0xDB:                 # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq:                # 16-bit table
                    vals = np.frombuffer(seg[p + 1:p + 129],
                                         dtype=">u2").astype(np.int32)
                    p += 129
                else:
                    vals = np.frombuffer(seg[p + 1:p + 65],
                                         dtype=np.uint8).astype(np.int32)
                    p += 65
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = vals
                qt[tq] = q
        elif m == 0xC4:               # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                huff[(tc, th)] = build_huffman(counts,
                                               seg[p + 17:p + 17 + n])
                p += 17 + n
        elif m == 0xC0 or m == 0xC1:  # SOF0/1: baseline sequential
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("baseline JPEG: 8-bit only")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0}: only baseline sequential (SOF0/1) "
                "is supported without PIL")
        elif m == 0xDD:               # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:               # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c:3 + 2 * c]
                comp = next(x for x in frame[2] if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            segs, _end = _split_restarts(blob, i + 2 + ln)
            return _decode_scan(frame, scan, qt, huff, segs, restart)
        i += 2 + ln
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(frame, scan, qt, huff, segs, restart) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                                   dtype=np.float32)

    # decode all coefficient blocks first (per component), IDCT vectorized
    blocks: dict[int, list] = {c["id"]: [] for c in comps}
    n_mcu = mcux * mcuy
    mcu = 0
    for si, seg in enumerate(segs):
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c in comps}
        todo = min(restart, n_mcu - mcu) if restart else n_mcu - mcu
        for _ in range(todo):
            my, mx = divmod(mcu, mcux)
            for comp, td, ta in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz, preds[comp["id"]] = _decode_block(
                            br, huff[(0, td)], huff[(1, ta)],
                            preds[comp["id"]])
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        blocks[comp["id"]].append((y0, x0, zz))
            mcu += 1
        if mcu >= n_mcu:
            break

    for comp, _td, _ta in scan:
        q = qt[comp["tq"]]
        lst = blocks[comp["id"]]
        if not lst:
            continue
        zz = np.stack([b[2] for b in lst])                  # (N, 64) zigzag
        # dequantize in zigzag order (q is raster-order; q[ZIGZAG] aligns
        # it), then scatter each block back to raster order
        deq = zz.astype(np.float32) * q[ZIGZAG].astype(np.float32)
        coef = np.zeros((len(lst), 64), dtype=np.float32)
        coef[:, ZIGZAG] = deq
        coef = coef.reshape(-1, 8, 8)
        spatial = np.einsum("ki,nkl,lj->nij", _DCT_T, coef, _DCT_T,
                            optimize=True) + 128.0
        plane = planes[comp["id"]]
        for (y0, x0, _), blk in zip(lst, spatial):
            plane[y0:y0 + 8, x0:x0 + 8] = blk

    out = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
