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


@register("mm_feature_extract", """
WITH m AS (
  SELECT vec_id AS media_id,
         64 + 8 * (vec_id % 7) AS w,
         48 + 16 * (vec_id % 5) AS h,
         LEAST((64 + 8 * (vec_id % 7)) * (48 + 16 * (vec_id % 5)), 4096)
           AS n
  FROM embeddings),
p AS (
  SELECT m.media_id,
         CAST(FLOOR(((g.i * 2654435761 + m.media_id * 40503
                      + m.w * 7 + m.h * 13) % 251) / 16.0) AS INTEGER)
           AS bin
  FROM m, LATERAL (SELECT unnest(range(0, m.n)) AS i) g),
c AS (SELECT media_id, bin, count(*) AS cnt FROM p GROUP BY media_id, bin),
bins AS (SELECT CAST(unnest(range(0, 16)) AS INTEGER) AS bin)
SELECT m.media_id, b.bin, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
FROM m CROSS JOIN bins b
LEFT JOIN c ON c.media_id = m.media_id AND c.bin = b.bin
""")
def mm_feature_extract(spark, sf_dir):
    """Feature extraction over binary payloads (normalized 16-bin byte
    histogram standing in for a model embedding), hash-checked END TO END:
    the unit-norm float32 feature is inverted back to exact integer bin
    counts (count_i = v_i·n/Σv with n = payload length, error ≪ 0.5, so
    round() is exact) and DuckDB recomputes the same counts from the
    closed-form payload generator — a pass proves encode → binary column →
    Arrow batch → histogram → normalize preserved every bin. Retires the
    last rows-only entry (VERDICT r2 item 8)."""
    from pyspark.sql.window import Window as W

    feats = mm.extract_features(_media_df(spark, sf_dir))
    n = F.least((64 + 8 * (F.col("media_id") % 7))
                * (48 + 16 * (F.col("media_id") % 5)), F.lit(4096))
    ex = feats.select("media_id", n.alias("n"),
                      F.posexplode("feature").alias("bin", "fv"))
    tot = W.partitionBy("media_id")
    cnt = F.round(F.col("fv") * F.col("n") / F.sum("fv").over(tot))
    return ex.select("media_id",
                     F.col("bin").cast("int").alias("bin"),
                     cnt.cast("long").alias("cnt"))
