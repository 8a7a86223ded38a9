"""Decode batch-geometry knob for the staged (GPU-shaped) raster leg
(VERDICT r3 item 8): ``rebatch_windows`` must give the model-facing
kernel batches bounded by windows AND total tokens regardless of the
Arrow batch sizes Spark happens to deliver."""

import numpy as np
import pandas as pd

from findtextcenternet_spark.config import FEATURE_DIM
from findtextcenternet_spark.pipeline import _window_tokens, rebatch_windows

ENC = FEATURE_DIM + 6


def _win(url, wid, n_tokens):
    tok = (np.zeros((n_tokens, ENC), dtype=np.float32).tobytes()
           if n_tokens else None)
    meta = (np.zeros((n_tokens, 9), dtype=np.float64).tobytes()
            if n_tokens else None)
    return {"url": url, "win_id": wid, "keep_back": 0,
            "tokens": tok, "meta": meta, "error": None}


def _frames(spec):
    """spec: list of lists of token counts — one pandas frame per list."""
    out = []
    for fi, counts in enumerate(spec):
        out.append(pd.DataFrame([_win(f"u{fi}", wi, c)
                                 for wi, c in enumerate(counts)]))
    return out


def _geometry(batches):
    return [(len(b), sum(_window_tokens(t) for t in b["tokens"]))
            for b in batches]


def test_identity_when_unbounded():
    frames = _frames([[5, 5], [3]])
    got = list(rebatch_windows(iter(frames), None, None))
    assert len(got) == 2
    pd.testing.assert_frame_equal(got[0], frames[0])


def test_split_by_max_windows():
    frames = _frames([[1] * 10])
    got = _geometry(rebatch_windows(iter(frames), 4, None))
    assert got == [(4, 4), (4, 4), (2, 2)]


def test_merge_small_arrow_batches():
    """Token-heavy pages force Spark into tiny Arrow batches; the model
    batch must merge them back up to the budget."""
    frames = _frames([[2]] * 7)  # seven 1-row Arrow batches
    got = _geometry(rebatch_windows(iter(frames), 3, None))
    assert got == [(3, 6), (3, 6), (1, 2)]


def test_split_by_token_budget():
    frames = _frames([[100, 100, 100, 100]])
    got = _geometry(rebatch_windows(iter(frames), None, 250))
    assert got == [(2, 200), (2, 200)]


def test_single_oversized_window_ships_alone():
    frames = _frames([[500, 10, 10]])
    got = _geometry(rebatch_windows(iter(frames), None, 100))
    assert got == [(1, 500), (2, 20)]


def test_rows_preserved_exactly():
    frames = _frames([[3, 7, 0, 2], [5], [1, 1, 1]])
    got = list(rebatch_windows(iter(frames), 2, 8))
    merged = pd.concat(got, ignore_index=True)
    orig = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(
        merged.sort_values(["url", "win_id"]).reset_index(drop=True),
        orig.sort_values(["url", "win_id"]).reset_index(drop=True))
    for b in got:
        assert len(b) <= 2


def test_staged_leg_parity_under_forced_geometry(spark):
    """The staged pipeline with a tiny forced Arrow batch size AND a tiny
    model-batch budget still matches the fused leg byte-for-byte."""
    from findtextcenternet_spark.corpus import generate_pages
    from findtextcenternet_spark.pipeline import (
        extract_documents,
        pages_from_pandas,
    )

    pdf = generate_pages(16, raster_frac=1.0, pdf_frac=0.0)
    pages = pages_from_pandas(spark, pdf).repartition(4, "url")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                         None)
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        from findtextcenternet_spark.pipeline import (
            extract_raster_path,
            spread_pages,
        )
        spread = spread_pages(pages, 4)
        staged = (extract_raster_path(spread, 4, staged=True,
                                      decode_batch_windows=3,
                                      decode_batch_tokens=64)
                  .toPandas().sort_values("url").reset_index(drop=True))
    finally:
        if old is not None:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old)
        else:
            spark.conf.unset(
                "spark.sql.execution.arrow.maxRecordsPerBatch")
    fused = (extract_documents(pages).toPandas()
             .sort_values("url").reset_index(drop=True))
    assert staged.error.isna().all()
    pd.testing.assert_frame_equal(
        staged[["url", "text", "aozora", "noruby"]],
        fused[["url", "text", "aozora", "noruby"]])
