"""GIF decoder — stdlib + NumPy only.

Scope: GIF87a/GIF89a, global and local color tables, interlaced images,
and the first frame of animated files (later frames and disposal
compositing are out of scope for feature extraction). The LZW variant
is GIF's own (spec appendix F): LSB-first bit packing (the opposite of
PDF/TIFF LZW), per-image minimum code size, Clear and End-of-Information
codes, width growth WITHOUT early change, table capped at 4096 entries
until the encoder emits a Clear. Transparency is ignored (the decoder
returns opaque RGB; the downstream feature kernels don't use alpha).

Written against the public spec (GIF89a specification, CompuServe 1990 /
W3C copy). Tested in tests/test_multimodal.py against an independent
spec-following writer — palette formats are lossless, so the roundtrip
must be byte-EXACT, not approximate.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class _LsbBitReader:
    """LSB-first bit reader (GIF packs codes little-endian within bytes,
    unlike the MSB-first JPEG/PDF streams)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW (spec appendix F): emits exactly ``n_pixels`` palette
    indices (a conforming stream's EOI may follow padding bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _LsbBitReader(data)
    out = bytearray()
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == eoi:
            break
        if code == clear:
            del table[clear + 2:]
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear invalid")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code beyond table")
        out.extend(entry)
        prev = entry
        # no early change: widen only once the table has filled the
        # current width (and never past 12 bits)
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Reorder the four interlace passes (spec appendix E) back to
    sequential rows."""
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = list(range(0, h, 8)) + list(range(4, h, 8)) \
        + list(range(2, h, 4)) + list(range(1, h, 2))
    out[rows] = idx
    return out


def _read_color_table(blob: bytes, pos: int, size_field: int
                      ) -> tuple[np.ndarray, int]:
    n = 2 << size_field                       # 2^(field+1) entries
    table = np.frombuffer(blob, dtype=np.uint8, count=3 * n,
                          offset=pos).reshape(n, 3).copy()
    return table, pos + 3 * n


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode the first image of a GIF to (h, w, 3) uint8 RGB on the
    logical screen (background-filled where the image doesn't cover)."""
    if blob[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(blob, pos, packed & 0x07)
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:                         # trailer
            break
        if b == 0x21:                         # extension: skip sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", blob[pos + 1:
                                                               pos + 10])
        pos += 10
        lct = None
        if ipacked & 0x80:
            lct, pos = _read_color_table(blob, pos, ipacked & 0x07)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF image without a color table")
        min_code_size = blob[pos]
        pos += 1
        lzw = bytearray()                     # join the data sub-blocks
        while blob[pos]:
            n = blob[pos]
            lzw += blob[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(_lzw_decode_gif(bytes(lzw), min_code_size,
                                            w * h), dtype=np.uint8)
        idx = idx.reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        rgb = palette[idx]
        if (left, top, w, h) == (0, 0, sw, sh):
            return rgb
        canvas_pal = gct if gct is not None else palette
        canvas = np.broadcast_to(canvas_pal[min(bg, len(canvas_pal) - 1)],
                                 (sh, sw, 3)).copy()
        canvas[top:top + h, left:left + w] = rgb
        return canvas
    raise ValueError("GIF has no image data")
