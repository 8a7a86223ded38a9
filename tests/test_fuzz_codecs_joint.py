"""Joint codec fuzz (VERDICT r5 item 8): PDF filter chains × PNG bit
depth × sequential/progressive JPEG swept as ONE cross-product — each
dimension was fuzzed separately in r5; a joint draw catches coupling
bugs (shared zlib/predictor/bit-packing helpers regressing one codec
while a change targets another) and proves the decode seams hold under
arbitrary combinations, not just the per-codec happy paths."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from findtextcenternet_spark.corpus import flat_text, make_text
from findtextcenternet_spark.operators import multimodal as mm
from findtextcenternet_spark.operators.jpeg import decode_jpeg
from findtextcenternet_spark.operators.pdf import (
    _ENCODERS,
    extract_pdf_text,
    render_pdf,
)
from test_multimodal import (
    _encode_jpeg,
    _encode_jpeg_progressive,
    _encode_png,
    _smooth_test_image,
)

_FILTER_NAMES = sorted(_ENCODERS)

# (depth, kind): every legal PNG shape the decoder claims
_PNG_SHAPES = [(1, "gray"), (2, "gray"), (4, "gray"),
               (1, "palette"), (2, "palette"), (4, "palette"),
               (8, "gray"), (8, "rgb"), (8, "palette"),
               (16, "gray"), (16, "rgb")]


def _check_pdf(seed: int, chain: list[str], hex_frac: float) -> None:
    rng = np.random.default_rng(seed)
    lang = ("en", "ja")[seed % 2]
    paras = make_text(rng, lang, 2, lang == "ja")
    pdf = render_pdf(paras, rng, filters=chain, hex_frac=hex_frac,
                     indirect_length=bool(seed % 3 == 0))
    assert extract_pdf_text(pdf) == flat_text(paras), chain


def _check_png(seed: int, depth: int, kind: str, interlace: bool,
               filters: list[int]) -> None:
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(4, 14)), int(rng.integers(4, 14))
    if kind == "palette":
        n = 1 << depth
        palette = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (h, w, 1), dtype=np.uint8)
        got = mm.decode_png(_encode_png(idx, filters, depth=depth,
                                        interlace=interlace,
                                        palette=palette))
        assert np.array_equal(got, palette[idx[:, :, 0]]), (depth, kind)
    elif depth in (1, 2, 4):
        vals = rng.integers(0, 1 << depth, (h, w, 1), dtype=np.uint8)
        got = mm.decode_png(_encode_png(vals, filters, depth=depth,
                                        interlace=interlace))
        want = (vals.astype(np.uint16) * 255 // ((1 << depth) - 1)) \
            .astype(np.uint8)
        assert np.array_equal(got, want), (depth, kind)
    else:
        ch = 3 if kind == "rgb" else 1
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        got = mm.decode_png(_encode_png(img, filters, depth=depth,
                                        interlace=interlace))
        assert np.array_equal(got, img), (depth, kind)


def _check_jpeg(seed: int, progressive: bool, subsampling) -> None:
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(17, 41)), int(rng.integers(17, 41))
    channels = 3 if seed % 2 else 1
    img = _smooth_test_image(h, w, channels, seed=seed)
    if progressive:
        if channels == 1:           # progressive writer needs 3 channels
            img = np.repeat(img[:, :, None], 3, axis=2)
        blob, recon = _encode_jpeg_progressive(img, subsampling=subsampling)
    else:
        blob, recon = _encode_jpeg(img, subsampling=subsampling)
    got = decode_jpeg(blob)
    assert got.shape == recon.shape
    assert int(np.abs(got.astype(int) - recon.astype(int)).max()) <= 1


@settings(max_examples=150, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    chain=st.lists(st.sampled_from(_FILTER_NAMES), min_size=1, max_size=3),
    hex_frac=st.sampled_from([0.0, 0.5, 1.0]),
    png_shape=st.sampled_from(_PNG_SHAPES),
    interlace=st.booleans(),
    png_filters=st.lists(st.sampled_from([0, 1, 2, 3, 4]),
                         min_size=1, max_size=5),
    progressive=st.booleans(),
    subsampling=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
)
def test_joint_codec_cross_product(seed, chain, hex_frac, png_shape,
                                   interlace, png_filters, progressive,
                                   subsampling):
    depth, kind = png_shape
    _check_pdf(seed, chain, hex_frac)
    _check_png(seed, depth, kind, interlace, png_filters)
    _check_jpeg(seed, progressive, subsampling)
