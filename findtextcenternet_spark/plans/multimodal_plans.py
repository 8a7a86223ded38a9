"""Multimodal queries()/oracle entries.

Fixture media blobs are generated deterministically from ``embeddings.vec_id``
(kind/width/height/n_frames are pure functions of vec_id), encoded to binary
in Spark, then pushed through the REAL decode path (mapInPandas header
parse). The DuckDB oracle derives the same metadata straight from vec_id —
so a pass proves the encode → binary column → Arrow batch → decode roundtrip
preserved every field, not merely that two copies of one formula agree.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..operators import multimodal as mm
from .relational import _t, register


def _media_df(spark, sf_dir):
    ids = _t(spark, sf_dir, "embeddings").select("vec_id")

    def enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for i in pdf["vec_id"]:
                i = int(i)
                kind = i % 3
                nf = 1 if kind != mm.KIND_VIDEO else 10 + i % 13
                blobs.append(mm.encode_media(
                    kind, 64 + 8 * (i % 7), 48 + 16 * (i % 5), nf, seed=i))
            yield pd.DataFrame({"media_id": pdf["vec_id"].values,
                                "blob": blobs})

    return ids.mapInPandas(enc, "media_id long, blob binary")


@register("mm_media_meta", """
SELECT vec_id AS media_id,
       CAST(vec_id % 3 AS INTEGER) AS kind,
       CAST(64 + 8 * (vec_id % 7) AS INTEGER) AS width,
       CAST(48 + 16 * (vec_id % 5) AS INTEGER) AS height,
       CAST(CASE WHEN vec_id % 3 = 2 THEN 10 + vec_id % 13 ELSE 1 END
            AS INTEGER) AS n_frames
FROM embeddings
""")
def mm_media_meta(spark, sf_dir):
    """Binary media column → typed metadata via the batch decode UDF."""
    return (mm.with_media_meta(_media_df(spark, sf_dir))
            .select("media_id", "kind", "width", "height", "n_frames"))


@register("mm_frame_sample", """
SELECT e.vec_id AS media_id, CAST(f.frame_idx AS INTEGER) AS frame_idx
FROM embeddings e,
     LATERAL (SELECT unnest(range(0, CAST(10 + e.vec_id % 13 AS BIGINT), 4))
              AS frame_idx) f
WHERE e.vec_id % 3 = 2
""")
def mm_frame_sample(spark, sf_dir):
    """Video frame sampling: metadata fan-out (sequence + explode), one
    narrow stage; the per-frame decode runs on the exploded rows."""
    return (mm.sample_frames(_media_df(spark, sf_dir), every_n=4)
            .select("media_id", F.col("frame_idx").cast("int")
                    .alias("frame_idx")))


@register("mm_feature_extract", None)  # payload math is Python-side only
def mm_feature_extract(spark, sf_dir):
    """Feature extraction over binary payloads (normalized byte histogram
    standing in for a model embedding); rows-only check — the deterministic
    value/partition-invariance gate lives in tests/test_multimodal.py."""
    feats = mm.extract_features(_media_df(spark, sf_dir))
    return feats.select("media_id", F.size("feature").alias("dim"))
