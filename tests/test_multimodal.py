"""Multimodal binary-column plumbing: schema, determinism, partition
invariance, frame fan-out, stubbed-codec guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from findtextcenternet_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(40):
        kind = (mm.KIND_IMAGE, mm.KIND_AUDIO, mm.KIND_VIDEO)[i % 3]
        w, h = 64 + 8 * (i % 7), 48 + 16 * (i % 5)
        nf = 1 if kind != mm.KIND_VIDEO else 10 + i % 13
        rows.append((i, kind, mm.encode_media(kind, w, h, nf, seed=i)))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind_truth", "blob"])
    return spark.createDataFrame(
        pdf, "media_id long, kind_truth int, blob binary")


def test_media_meta_schema_and_values(media_df):
    got = mm.with_media_meta(media_df).toPandas().set_index("media_id")
    assert len(got) == 40
    for i in range(40):
        kind = (mm.KIND_IMAGE, mm.KIND_AUDIO, mm.KIND_VIDEO)[i % 3]
        r = got.loc[i]
        assert r["kind"] == kind
        assert r["width"] == 64 + 8 * (i % 7)
        assert r["height"] == 48 + 16 * (i % 5)


def test_features_deterministic_and_normalized(media_df):
    a = (mm.extract_features(media_df).toPandas()
         .set_index("media_id").sort_index())
    b = (mm.extract_features(media_df.repartition(7)).toPandas()
         .set_index("media_id").sort_index())
    for i in a.index:
        va, vb = np.array(a.loc[i, "feature"]), np.array(b.loc[i, "feature"])
        assert va.shape == (mm.FEATURE_DIM,)
        assert np.allclose(va, vb)          # partitioning-invariant
        assert abs(np.linalg.norm(va) - 1.0) < 1e-5


def test_resize_meta_aspect_preserved(media_df):
    got = mm.resize_meta(media_df, max_side=32).toPandas()
    assert (got["out_w"].le(32) & got["out_h"].le(32)).all()
    # aspect ratio preserved within rounding
    ar_in = got["width"] / got["height"]
    ar_out = got["out_w"] / got["out_h"]
    assert np.allclose(ar_in, ar_out, rtol=0.06)


def test_sample_frames_fanout(media_df):
    got = mm.sample_frames(media_df, every_n=4).toPandas()
    vids = [i for i in range(40) if i % 3 == 2]
    assert set(got["media_id"]) == set(vids)
    for i in vids:
        nf = 10 + i % 13
        want = list(range(0, nf, 4))
        assert sorted(got[got.media_id == i]["frame_idx"]) == want


def test_unknown_format_raises_not_implemented(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "blob": [b"\x89PNG\r\n fake"]}),
        "media_id long, blob binary")
    with pytest.raises(Exception) as ei:
        mm.with_media_meta(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)
