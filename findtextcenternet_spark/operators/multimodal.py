"""Multimodal binary columns: decode / feature-extract / resize / frame-sample.

Model: media travels as an opaque ``binary`` column plus typed metadata
(mirrors the pages table's ``html: binary`` and the reference's raster input,
process_ocr_base.py:58-65). All Spark plumbing — schemas, Arrow batch
shapes, partitioning, UDF signatures — is real and tested; only the
*codec* is swapped: the sandbox has no PIL/ffmpeg, so real decoding sits
behind an import guard and a deterministic synthetic codec stands in
(same header-parse → ndarray → feature dataflow a real codec would have).

Media fixture format (corpus-generated): ``MM01`` magic + 16-byte header
(kind u8, width u32, height u32, n_frames u16, reserved) + payload bytes
whose values are a pure function of (width, height, frame, pixel index).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"MM01"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2
_HDR = struct.Struct("<BIIHx")  # kind, width, height, n_frames

FEATURE_DIM = 16


def encode_media(kind: int, width: int, height: int, n_frames: int = 1,
                 seed: int = 0) -> bytes:
    """Deterministic synthetic media blob (fixture generator)."""
    n = min(width * height, 4096)  # payload is a sample, not full raster
    idx = np.arange(n, dtype=np.uint64)
    payload = ((idx * 2654435761 + seed * 40503 + width * 7 + height * 13)
               % 251).astype(np.uint8)
    return MAGIC + _HDR.pack(kind, width, height, n_frames) + payload.tobytes()


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int
                  ) -> np.ndarray:
    """Reverse the five PNG row filters (RFC 2083 §6): raw is the
    inflated stream, rows of 1 filter byte + ``stride`` pixel bytes."""
    raw = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, dtype=np.int32)
        if ft == 0:                         # None
            out[y] = row
        elif ft == 2:                       # Up
            out[y] = (row + prev) & 0xFF
        elif ft in (1, 3, 4):               # Sub / Average / Paeth:
            # left-neighbor recurrence — sequential in x by definition
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"PNG filter type {ft}")
    return out


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid (RFC 2083 §2.6): (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_row_bytes(w: int, depth: int, ch: int) -> int:
    return (w * ch * depth + 7) // 8


def _png_bpp(depth: int, ch: int) -> int:
    """Filter delta in BYTES (RFC 2083 §6.2): whole bytes per pixel,
    floor-1 for packed sub-byte depths."""
    return max(1, (depth * ch) // 8)


def _png_samples(sub: np.ndarray, pw: int, ph: int, depth: int,
                 ch: int, ctype: int) -> np.ndarray:
    """Unfiltered row bytes (ph, stride) → uint8 samples (ph, pw, ch).
    16-bit samples downsample to their high byte (the standard 16→8
    reduction); 1/2/4-bit packed samples (gray or palette index,
    MSB-first per the spec) unpack bitwise — gray expands to the full
    0-255 range, palette indices stay raw for the PLTE lookup."""
    if depth == 8:
        return sub.reshape(ph, pw, ch)
    if depth == 16:
        return np.ascontiguousarray(sub.reshape(ph, pw, ch, 2)[..., 0])
    bits = np.unpackbits(sub, axis=1)[:, :pw * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    v = (bits.reshape(ph, pw, depth) * weights).sum(axis=2)
    if ctype == 0:
        v = v * 255 // ((1 << depth) - 1)
    return v.astype(np.uint8)[:, :, None]


def _png_deinterlace(raw: np.ndarray, w: int, h: int, depth: int,
                     ch: int, ctype: int) -> np.ndarray:
    """Adam7: the inflated stream is seven independently-filtered reduced
    images; unfilter each and scatter it onto its pass grid."""
    img = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:      # pass empty at this image size
            continue
        stride = _png_row_bytes(pw, depth, ch)
        n = ph * (1 + stride)
        sub = _png_unfilter(raw[pos:pos + n], ph, stride,
                            _png_bpp(depth, ch))
        img[y0::ys, x0::xs] = _png_samples(sub, pw, ph, depth, ch, ctype)
        pos += n
    if pos != len(raw):
        raise ValueError("PNG interlaced data length mismatch")
    return img


def decode_png(blob: bytes) -> np.ndarray:
    """Baseline PNG decode, stdlib zlib + NumPy only: every legal bit
    depth (1/2/4-bit gray+palette, 8-bit, 16-bit — 16-bit reduces to
    its high byte), all five row filters, gray/RGB/palette/alpha color
    types, both non-interlaced and Adam7-interlaced streams.
    Returns an (h, w, channels) uint8 array."""
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, plte, hdr = 8, [], None, None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth not in (1, 2, 4, 8, 16) or interlace not in (0, 1) \
            or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"baseline PNG decoder: depth={depth} colortype={ctype} "
            f"interlace={interlace} unsupported")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError("PNG: sub-byte depth is only legal for "
                         "grayscale/palette (RFC 2083 §4.1.1)")
    if depth == 16 and ctype == 3:
        raise ValueError("PNG: 16-bit palette is not legal")
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    img = (_png_deinterlace(raw, w, h, depth, ch, ctype) if interlace
           else _png_samples(
               _png_unfilter(raw, h, _png_row_bytes(w, depth, ch),
                             _png_bpp(depth, ch)),
               w, h, depth, ch, ctype))
    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def decode_bmp(blob: bytes) -> np.ndarray:
    """Baseline BMP decode: uncompressed BI_RGB 8/24/32-bit, bottom-up or
    top-down. Returns (h, w, channels) uint8 (BGR order as stored)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", blob[10:14])
    w, h = struct.unpack("<ii", blob[18:26])
    (bpp,) = struct.unpack("<H", blob[28:30])
    (comp,) = struct.unpack("<I", blob[30:34])
    if comp != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"baseline BMP decoder: compression={comp} bpp={bpp} "
            "unsupported (BI_RGB 8/24/32 only)")
    top_down, h = h < 0, abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(blob[off:off + stride * h], dtype=np.uint8)
    img = rows.reshape(h, stride)[:, :w * ch].reshape(h, w, ch)
    return img if top_down else img[::-1].copy()


def _pnm_header(blob: bytes) -> tuple[int, int, int, int]:
    """Parse width/height/maxval after the P5/P6 magic, skipping
    whitespace runs and '#' comments BETWEEN tokens only, then consume
    exactly ONE whitespace byte after maxval (netpbm spec): a naive
    whitespace split would eat leading payload bytes that happen to be
    0x09/0x0A/0x0D/0x20 (ADVICE r4). Returns (w, h, maxval, payload_off).
    """
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(blob):
            c = blob[pos:pos + 1]
            if c == b"#":  # comment runs to end of line
                nl = blob.find(b"\n", pos)
                pos = len(blob) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(blob) and blob[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("bad PNM header")
        vals.append(int(blob[start:pos]))
    if pos >= len(blob) or not blob[pos:pos + 1].isspace():
        raise ValueError("bad PNM header: no separator after maxval")
    return vals[0], vals[1], vals[2], pos + 1


def decode_pnm(blob: bytes) -> np.ndarray:
    """Baseline binary PGM (P5) / PPM (P6) decode."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM")
    w, h, maxval, off = _pnm_header(blob)
    if maxval > 255:
        raise NotImplementedError("baseline PNM decoder: 8-bit only")
    ch = 3 if blob[:2] == b"P6" else 1
    data = blob[off:off + w * h * ch]
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, ch)


def decode_image_bytes(blob: bytes) -> np.ndarray:
    """Real-bytes image decode: PIL when installed, else the stdlib
    baseline decoders above (PNG/BMP/PNM). Raises NotImplementedError
    only for genuinely exotic codecs (JPEG/WEBP/... without PIL)."""
    try:  # full codec coverage when available
        import io

        import PIL.Image
        return np.asarray(PIL.Image.open(io.BytesIO(blob)))
    except ImportError:
        pass
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(blob)
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] in (b"P5", b"P6"):
        return decode_pnm(blob)
    if blob[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif
        return decode_gif(blob)
    raise NotImplementedError(
        "no codec for this format: bundled decoders cover PNG (all "
        "depths, incl. Adam7), BMP (BI_RGB), binary PNM, GIF, and "
        "sequential + "
        "progressive Huffman JPEG; install PIL for arithmetic/lossless "
        "JPEG, WEBP, TIFF")


def _decode(blob: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Parse header + payload: the MM01 fixture format fast-path, else the
    real-bytes image decoders (decode_image_bytes). Payload is the flat
    uint8 pixel/sample stream either way — everything downstream
    (histogram features, meta, resize planning) is codec-agnostic."""
    if blob[:4] != MAGIC:
        img = decode_image_bytes(bytes(blob))
        h, w = img.shape[:2]
        return KIND_IMAGE, w, h, 1, img.reshape(-1)
    kind, w, h, nf = _HDR.unpack(blob[4:4 + _HDR.size])
    payload = np.frombuffer(blob[4 + _HDR.size:], dtype=np.uint8)
    return kind, w, h, nf, payload


MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])


def with_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Decode header → typed metadata columns. mapInPandas so one Arrow
    batch decodes many blobs without per-row Python dispatch."""
    cols = [f.name for f in MEDIA_META_SCHEMA.fields]

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_decode(bytes(b))[:4] + (len(b),) for b in pdf[blob_col]]
            out = pd.DataFrame(metas, columns=cols[1:])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(decode_batches, MEDIA_META_SCHEMA)


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def extract_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Feature extraction: payload → fixed-dim float vector (here: 16-bin
    normalized byte histogram; a real model slots into the same batch
    kernel). Vectorized over the whole Arrow batch."""

    def feat_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[blob_col]:
                payload = _decode(bytes(b))[4]
                hist, _ = np.histogram(payload, bins=FEATURE_DIM,
                                       range=(0, 256))
                v = hist.astype(np.float32)
                nrm = float(np.linalg.norm(v))
                feats.append((v / nrm if nrm else v).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].values,
                                "feature": feats})

    return df.mapInPandas(feat_batches, FEATURES_SCHEMA)


def resize_meta(df: DataFrame, max_side: int,
                blob_col: str = "blob") -> DataFrame:
    """Resize planning is pure column math (aspect-preserving fit to
    max_side) — JVM-side; only the pixel resample itself would enter the
    batch UDF with a real codec."""
    m = with_media_meta(df, blob_col)
    scale = F.least(F.lit(1.0),
                    F.lit(float(max_side))
                    / F.greatest(F.col("width"), F.col("height")))
    return m.select(
        "media_id", "width", "height",
        F.round(scale, 6).alias("scale"),
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1))
        .alias("out_w"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1))
        .alias("out_h"))


def sample_frames(df: DataFrame, every_n: int,
                  blob_col: str = "blob") -> DataFrame:
    """Frame sampling: metadata fan-out via native sequence+explode — the
    per-frame decode then runs batch-vectorized on the exploded rows (one
    shuffle-free narrow stage)."""
    m = with_media_meta(df, blob_col).filter(F.col("kind") == KIND_VIDEO)
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (m.select("media_id", "n_frames",
                     F.explode(frames).alias("frame_idx")))
