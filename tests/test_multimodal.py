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
        pd.DataFrame({"media_id": [0], "blob": [b"\xff\xd8\xff\xe0 jpeg"]}),
        "media_id long, blob binary")
    with pytest.raises(Exception) as ei:
        mm.with_media_meta(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


# ------------------------------------------------- real-bytes baseline codecs

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def _encode_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Spec-following PNG writer (RFC 2083) with explicit per-row filter
    types — an independent check of the decoder's unfilter math."""
    import struct
    import zlib
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            raw.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def _encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    import struct
    h, w, ch = img.shape
    stride = (w * ch + 3) & ~3
    rows = img if top_down else img[::-1]
    body = b"".join(bytes(r.reshape(-1)) + b"\x00" * (stride - w * ch)
                    for r in rows)
    off = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                      1, ch * 8, 0, len(body), 2835, 2835, 0, 0)
    assert len(dib) == 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + dib + body


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_roundtrip_all_filters(filters):
    rng = np.random.default_rng(sum(filters) + 7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    got = mm.decode_png(_encode_png(img, filters))
    assert np.array_equal(got, img)


def test_png_gray_and_rgba():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (6, 11, 1), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(_encode_png(gray, [4])), gray)
    rgba = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(_encode_png(rgba, [2, 3])), rgba)


def test_bmp_roundtrip_both_orientations():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(_encode_bmp(img)), img)
    assert np.array_equal(mm.decode_bmp(_encode_bmp(img, top_down=True)),
                          img)


def test_pnm_roundtrip():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    blob = b"P6\n6 4\n255\n" + bytes(img.reshape(-1))
    assert np.array_equal(mm.decode_pnm(blob), img)
    gray = rng.integers(0, 256, (3, 8, 1), dtype=np.uint8)
    blob = b"P5\n8 3\n255\n" + bytes(gray.reshape(-1))
    assert np.array_equal(mm.decode_pnm(blob), gray)


def test_real_png_through_spark_feature_extract(spark):
    """mm_feature_extract chews REAL encoded bytes end-to-end: a PNG blob
    goes through the same mapInPandas kernel as the MM01 fixtures and
    yields the normalized histogram of its actual pixel bytes."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = _encode_png(img, [0, 1, 2, 3, 4])
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "blob": [blob]}),
        "media_id long, blob binary")

    meta = mm.with_media_meta(df).toPandas().iloc[0]
    assert (meta["width"], meta["height"], meta["kind"]) == (16, 16,
                                                             mm.KIND_IMAGE)
    feat = np.array(mm.extract_features(df).toPandas()["feature"].iloc[0])
    hist, _ = np.histogram(img.reshape(-1), bins=mm.FEATURE_DIM,
                           range=(0, 256))
    want = hist.astype(np.float32)
    want /= np.linalg.norm(want)
    assert np.allclose(feat, want, atol=1e-6)


def test_pnm_header_whitespace_payload_and_comments():
    """ADVICE r4: a naive whitespace split would eat payload bytes that
    happen to be whitespace values (0x09/0x0A/0x0D/0x20) and choke on
    '#' header comments; the tokenizer must consume exactly one
    whitespace byte after maxval."""
    import numpy as np

    from findtextcenternet_spark.operators.multimodal import (
        decode_image_bytes,
        decode_pnm,
    )

    payload = bytes([0x20, 0x0A, 0x09, 0x0D, 0x00, 0xFF])
    blob = b"P5\n# a comment\n3 2\n# another\n255\n" + payload
    img = decode_pnm(blob)
    assert img.shape == (2, 3, 1)
    assert img.reshape(-1).tolist() == [32, 10, 9, 13, 0, 255]
    assert (decode_image_bytes(blob) == img).all()
    # PPM variant: space (not newline) after maxval, payload starts 0x0A
    p6 = b"P6 2 1 255 " + bytes([0x0A, 1, 2, 3, 4, 5])
    img6 = decode_pnm(p6)
    assert img6.shape == (1, 2, 3)
    assert img6.reshape(-1).tolist() == [10, 1, 2, 3, 4, 5]
