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


def _decode(blob: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """Parse header + payload. A production build replaces ONLY this
    function (e.g. PIL.Image.open / soundfile / pyav behind the guard)."""
    if blob[:4] != MAGIC:
        try:  # real codec path, absent in this sandbox
            import PIL.Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "non-fixture media needs an image codec (PIL/pyav); "
                "not installed in this environment")
        raise NotImplementedError("real codec path not wired yet")
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
