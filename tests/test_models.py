"""Real-model path (operators/models.py + model_registry): tensor-shape,
fp16-transport, and end-to-end gates with tiny random weights — proves the
Arrow batch geometry and per-worker model singleton work before trained
weights exist (VERDICT r2 'what's missing' item 1)."""

import json
import time

import numpy as np
import pytest

from findtextcenternet_spark.config import FEATURE_DIM, MODULOS
from findtextcenternet_spark.operators import models as M
from findtextcenternet_spark.operators.model_registry import (
    get_detector_model,
    get_residue_heads,
)


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("weights") / "tiny.npz")
    M.save_tiny_random_weights(p, seed=11)
    return p


def test_detector_output_contract(weights):
    """forward_tiles honors the CenterNetDetector contract: 10 heatmap
    channels (keymap + 3x3-NMS'd peak + sizes + line + sep + 4 codes)
    float32 and 100 fp16 feature channels at 1/4 resolution
    (models/detector.py:203-230)."""
    det = M.load_detector(weights)
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 256, (2, 768, 768, 3), dtype=np.uint8)
    t0 = time.time()
    heat, feats = det.forward_tiles(tiles)
    # generous bound: only guards against an accidentally-huge forward
    # body; the suite may share the box with 32-core bench runs
    assert time.time() - t0 < 60.0, "tiny forward must be fast"
    assert heat.shape == (2, 10, 192, 192) and heat.dtype == np.float32
    assert feats.shape == (2, 100, 192, 192) and feats.dtype == np.float16
    # channel 1 is the NMS'd keymap: equal to keymap at local maxima,
    # -inf elsewhere
    key, peak = heat[:, 0], heat[:, 1]
    finite = np.isfinite(peak)
    assert np.allclose(peak[finite], key[finite])
    assert finite.sum() < finite.size  # some cells suppressed


def test_residue_heads_contract(weights):
    """Three softmax heads -> top-3 ids/probs per modulus
    (models/transformer.py:274-360): ids valid residues, probs sorted
    descending, rows consistent through the fp16 transport."""
    heads = get_residue_heads(weights)
    rng = np.random.default_rng(1)
    tokens = rng.normal(0, 3, (7, FEATURE_DIM + 6)).astype(np.float32)
    ids, probs = heads(tokens, np.ones(7, bool), 0)
    assert ids.shape == (7, len(MODULOS), 3)
    assert probs.shape == (7, len(MODULOS), 3)
    for mi, m in enumerate(MODULOS):
        assert (0 <= ids[:, mi]).all() and (ids[:, mi] < m).all()
    assert (np.diff(probs, axis=2) <= 1e-12).all(), "top-3 must be sorted"
    # fp16 transport determinism: quantizing the input first changes
    # nothing (the head itself casts through fp16,
    # test_image3_torch.py:397)
    ids2, probs2 = heads(tokens.astype(np.float16).astype(np.float32),
                         np.ones(7, bool), 0)
    assert (ids == ids2).all() and np.allclose(probs, probs2)


def test_real_detect_page_shapes(weights):
    """detect_page with a real model runs rasterize -> tile -> forward ->
    interior-merge -> NMS and returns the standard box/run frames."""
    from findtextcenternet_spark.operators.detect import detect_page

    det = M.load_detector(weights)
    layout = {"page_w": 900, "page_h": 1200, "vertical": 0,
              "glyphs": [{"cx": 100 + 40 * k, "cy": 200, "w": 32, "h": 32,
                          "cp": 0x3042 + k, "vertical": 0, "ruby": 0,
                          "rubybase": 0, "space": 0, "emphasis": 0}
                         for k in range(5)],
              "seps": [{"x1": 450, "x2": 450, "y1": 100, "y2": 1100,
                        "v": 1.0}],
              "textlines": []}
    boxes, runs = detect_page(layout, det)
    assert list(boxes.columns) == ["box_id", "p", "cx", "cy", "w", "h",
                                   "code1", "code2", "code4", "code8",
                                   "feature"]
    for _, b in boxes.iterrows():
        f = np.frombuffer(b["feature"], dtype=np.float32)
        assert f.shape == (FEATURE_DIM,)
        # features came through fp16: exact fp16 values survive the
        # float32 packing
        assert np.array_equal(f, f.astype(np.float16).astype(np.float32))
    assert set(runs.columns) == {"channel", "y", "x1", "x2", "v"}


def test_registry_backend_selection(weights):
    """No path -> surrogate dict; a weights path -> real model object;
    per-path singletons."""
    assert get_detector_model()["kind"] == "surrogate"
    real = get_detector_model(weights)
    assert real.kind in ("real-numpy", "real-torch")
    assert get_detector_model(weights) is real  # lru singleton
    assert get_residue_heads() is None
    assert get_residue_heads(weights).kind == "real-numpy"


def test_real_path_end_to_end_fused_equals_staged(spark, weights):
    """Both raster legs run the real model end-to-end (weights path
    threaded through the kernel closures to every Python worker) and stay
    byte-identical to each other AND to the golden runner with the same
    weights — the plug point is exercised, not just constructed."""
    from findtextcenternet_spark.corpus import generate_pages
    from findtextcenternet_spark.golden import extract_page_golden
    from findtextcenternet_spark.pipeline import (
        extract_documents,
        pages_from_pandas,
    )

    pdf = generate_pages(24)
    pages = pages_from_pandas(spark, pdf).repartition(4, "url")
    fused = (extract_documents(pages, weights_path=weights).toPandas()
             .sort_values("url").reset_index(drop=True))
    staged = (extract_documents(pages, staged=True, weights_path=weights)
              .toPandas().sort_values("url").reset_index(drop=True))
    assert len(fused) == len(staged) == len(pdf)
    assert fused.error.isna().all(), fused[fused.error.notna()].head()
    import pandas as pd

    pd.testing.assert_frame_equal(
        fused[["url", "text", "aozora", "noruby", "path"]],
        staged[["url", "text", "aozora", "noruby", "path"]],
    )
    golden = {r.url: extract_page_golden(r.url, bytes(r.html), weights)
              for r in pdf.itertuples()}
    for r in fused.itertuples():
        assert r.text == golden[r.url]["text"], r.url


@pytest.mark.skipif(M.torch is None, reason="torch not installed")
def test_torch_matches_numpy(weights):
    npz = np.load(weights)
    a = M.NumpyDetector(npz)
    b = M.TorchDetector(npz)
    tiles = np.random.default_rng(3).integers(
        0, 256, (1, 768, 768, 3), dtype=np.uint8)
    ha, fa = a.forward_tiles(tiles)
    hb, fb = b.forward_tiles(tiles)
    fin = np.isfinite(ha) & np.isfinite(hb)
    assert np.allclose(ha[fin], hb[fin], atol=1e-4)
    assert np.allclose(fa.astype(np.float32), fb.astype(np.float32),
                       atol=1e-2)
