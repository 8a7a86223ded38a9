"""JPEG decoder — stdlib + NumPy only (VERDICT r4 item 6).

Scope: baseline/extended sequential DCT (SOF0/SOF1) AND progressive DCT
(SOF2) with Huffman coding, 8-bit samples, grayscale or YCbCr with any
h/v sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers.
Arithmetic coding, 12-bit, lossless and hierarchical modes raise
NotImplementedError — ``decode_image_bytes`` surfaces that as the codec
gap it is (install PIL for full coverage).

Written against the public spec (ITU-T T.81 / ISO 10918-1): canonical
Huffman from DHT (F.2.2.1), receive/extend (F.2.2.1), run-length AC
(F.2.2.2), progressive spectral-selection + successive-approximation
scans incl. EOB runs and AC refinement (G.1.2/G.2), IDCT as the
orthonormal 8x8 DCT-II basis applied per block (A.3.3),
nearest-neighbor chroma upsampling, YCbCr->RGB per JFIF. All scans
accumulate into per-component coefficient planes; dequantize + IDCT run
once at the end, so sequential and progressive share one reconstruction
path. The Huffman bit loop is per-symbol Python — fixture-scale, like
the PNG row-filter loop (multimodal.py); the IDCT and color transform
are vectorized over all blocks.

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
    """Decode a sequential or progressive JPEG to (h, w) or (h, w, 3)
    uint8 (RGB)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> table
    frame = None
    progressive = False
    coefs = None
    geom = None
    restart = 0
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes —
        # skip them so the padding byte isn't misread as a marker code
        while i + 1 < len(blob) and blob[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(blob):
            break
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
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: 8-bit samples only")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0}: only sequential (SOF0/1) and "
                "progressive (SOF2) Huffman modes are supported without PIL")
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
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                coefs, geom = _alloc_coefs(frame)
            segs, end = _split_restarts(blob, i + 2 + ln)
            _decode_scan(scan, coefs, geom, huff, segs, restart,
                         progressive, ss, se, ahal >> 4, ahal & 0x0F)
            i = end
            continue
        i += 2 + ln
    if coefs is None:
        raise ValueError("JPEG has no SOS scan")
    return _reconstruct(frame, coefs, geom, qt)


def _alloc_coefs(frame):
    """Per-component zigzag coefficient planes, padded to the interleaved
    MCU grid; ``dims`` records each component's own (non-padded) block
    grid — the data-unit order of non-interleaved scans (T.81 A.2.2)."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs, dims = {}, {}
    for c in comps:
        coefs[c["id"]] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                                  dtype=np.int32)
        cw = -(-w * c["h"] // hmax)      # component samples (A.1.1)
        ch = -(-h * c["v"] // vmax)
        dims[c["id"]] = (-(-cw // 8), -(-ch // 8))
    return coefs, {"mcux": mcux, "mcuy": mcuy,
                   "hmax": hmax, "vmax": vmax, "dims": dims}


def _ac_first(br, blk, ac_tab, ss, se, al, eobrun):
    """Progressive AC first scan for one block (T.81 G.2.2): run-length
    coded coefficients at precision ``al`` with EOB runs spanning
    blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:          # ZRL: sixteen zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run past end of band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, blk, ac_tab, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.1.2.3): one more
    magnitude bit. Zero-history runs carry newly-significant +-2^al
    values; every nonzero-history coefficient passed over (including the
    whole band during an EOB run) reads a correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:       # EOBn: run of r extension bits
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                newval = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:           # correction bits through the EOB run
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(scan, coefs, geom, huff, segs, restart,
                 progressive, ss, se, ah, al) -> None:
    """Accumulate one scan's data units into the coefficient planes.
    Sequential scans are the progressive special case ss=0/se=63/ah=al=0
    with DC+AC in one pass; restart intervals reset DC predictions and
    the EOB run (unit = MCU when interleaved, block otherwise)."""
    mcux = geom["mcux"]
    interleaved = len(scan) > 1
    if interleaved:
        units = mcux * geom["mcuy"]
    else:
        bw_c, bh_c = geom["dims"][scan[0][0]["id"]]
        units = bw_c * bh_c
    unit = 0
    for seg in segs:
        br = _BitReader(seg)
        preds = {c["id"]: 0 for c, _, _ in scan}
        eobrun = 0
        todo = min(restart, units - unit) if restart else units - unit
        for _ in range(todo):
            if interleaved:
                my, mx = divmod(unit, mcux)
                blks = [(comp, td, ta,
                         coefs[comp["id"]][my * comp["v"] + by,
                                           mx * comp["h"] + bx])
                        for comp, td, ta in scan
                        for by in range(comp["v"])
                        for bx in range(comp["h"])]
            else:
                comp, td, ta = scan[0]
                by, bx = divmod(unit, geom["dims"][comp["id"]][0])
                blks = [(comp, td, ta, coefs[comp["id"]][by, bx])]
            for comp, td, ta, blk in blks:
                if not progressive:
                    zz, preds[comp["id"]] = _decode_block(
                        br, huff[(0, td)], huff[(1, ta)],
                        preds[comp["id"]])
                    blk[:] = zz
                elif ss == 0 and ah == 0:     # DC first
                    t = br.read_symbol(huff[(0, td)])
                    preds[comp["id"]] += _extend(br.read_bits(t), t)
                    blk[0] = preds[comp["id"]] << al
                elif ss == 0:                 # DC refinement: one raw bit
                    blk[0] |= br.read_bit() << al
                elif ah == 0:                 # AC first
                    eobrun = _ac_first(br, blk, huff[(1, ta)],
                                       ss, se, al, eobrun)
                else:                         # AC refinement
                    eobrun = _ac_refine(br, blk, huff[(1, ta)],
                                        ss, se, al, eobrun)
            unit += 1
        if unit >= units:
            break


def _reconstruct(frame, coefs, geom, qt) -> np.ndarray:
    """Dequantize + IDCT every component plane once, upsample chroma,
    color-transform. Shared by sequential and progressive paths."""
    h, w, comps = frame
    hmax, vmax = geom["hmax"], geom["vmax"]
    out = []
    for c in comps:
        zz = coefs[c["id"]]                                 # (bh, bw, 64)
        bh, bw = zz.shape[:2]
        q = qt[c["tq"]]
        # dequantize in zigzag order (q is raster-order; q[ZIGZAG] aligns
        # it), then scatter each block back to raster order
        deq = zz.reshape(-1, 64).astype(np.float32) \
            * q[ZIGZAG].astype(np.float32)
        coef = np.zeros((bh * bw, 64), dtype=np.float32)
        coef[:, ZIGZAG] = deq
        spatial = np.einsum("ki,nkl,lj->nij", _DCT_T,
                            coef.reshape(-1, 8, 8), _DCT_T,
                            optimize=True) + 128.0
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
