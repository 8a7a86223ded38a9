"""Group/decode stage tests (FIXTURES.md §6: window segmentation,
reading order)."""

import numpy as np
import pandas as pd

from findtextcenternet_spark.config import MAX_ENCODERLEN
from findtextcenternet_spark.corpus import generate_pages, make_layout
from findtextcenternet_spark.golden import extract_raster_page
from findtextcenternet_spark.operators.decode import (
    FEATURE_DIM,
    TK_NL,
    TK_RBASE,
    TK_RUBY,
    TK_SPACE,
    expand_window,
    segment_windows,
    tokenize_page,
)
from findtextcenternet_spark.operators.detect import detect_page, parse_layout
from findtextcenternet_spark.operators.group import group_page


def _page_tokens(row):
    layout = parse_layout(bytes(row.html))
    boxes, runs = detect_page(layout)
    ordered = group_page(boxes, runs)
    return tokenize_page(ordered)


def test_reading_order_horizontal_blocks():
    paras = [["first line one", "first line two"], ["second block"]]
    layout = make_layout(paras, vertical=False)
    boxes, runs = detect_page(layout)
    ordered = group_page(boxes, runs)
    # blocks numbered top-to-bottom, lines in order, subidx dense
    assert ordered["block"].tolist() == sorted(ordered["block"].tolist())
    for (_, _), grp in ordered.groupby(["block", "idx"]):
        assert grp["subidx"].tolist() == list(range(len(grp)))
        # within a horizontal line, non-ruby boxes are x-sorted
        assert grp["cx"].is_monotonic_increasing


def test_reading_order_vertical_columns_right_to_left():
    paras = [["あいうえお", "かきくけこ", "さしすせそ"]]
    layout = make_layout(paras, vertical=True)
    boxes, runs = detect_page(layout)
    ordered = group_page(boxes, runs)
    # columns ordered right → left: mean cx decreasing with idx
    means = ordered.groupby("idx")["cx"].mean()
    assert means.is_monotonic_decreasing
    # within a column, top → bottom
    for _, grp in ordered.groupby("idx"):
        assert grp["cy"].is_monotonic_increasing


def test_window_budget_and_splice_property():
    pdf = generate_pages(300)
    rast = pdf[pdf.lang.str.startswith("raster:")]
    checked = 0
    for row in rast.itertuples():
        tokens, meta = _page_tokens(row)
        if tokens.shape[0] == 0:
            continue
        wins = segment_windows(tokens)
        # coverage: windows tile the stream
        assert wins[0][0] == 0
        assert wins[-1][1] == tokens.shape[0]
        for (s0, e0, _), (s1, e1, _) in zip(wins, wins[1:]):
            assert s1 <= e0 and e1 > e0  # overlap, monotone progress
        for s, e, _ in wins:
            assert e - s <= MAX_ENCODERLEN - 3
        # splice property: windowed decode == whole-stream decode
        whole, _ = expand_window(tokens, meta)
        spliced = "".join(
            expand_window(tokens[s:e], meta[s:e])[0][kb:] for s, e, kb in wins)
        assert spliced == whole, row.url
        checked += 1
    assert checked >= 10


def test_long_stream_multi_window():
    # force > 400 tokens: a very long single-block page
    line = "word " * 30
    paras = [[line.strip()] * 6 for _ in range(4)]
    layout = make_layout(paras, vertical=False)
    boxes, runs = detect_page(layout)
    ordered = group_page(boxes, runs)
    tokens, meta = tokenize_page(ordered)
    assert tokens.shape[0] > MAX_ENCODERLEN
    wins = segment_windows(tokens)
    assert len(wins) >= 2
    whole, _ = expand_window(tokens, meta)
    spliced = "".join(
        expand_window(tokens[s:e], meta[s:e])[0][kb:] for s, e, kb in wins)
    assert spliced == whole


def test_expand_ruby_markers_balanced():
    pdf = generate_pages(200)
    rast = pdf[pdf.lang == "raster:ja"]
    assert len(rast) >= 1
    for row in rast.itertuples():
        rec = extract_raster_page(bytes(row.html))
        t = rec["text"]
        assert t.count("￹") == t.count("￺") == t.count("￻")


def test_tokenize_break_tokens():
    ordered = pd.DataFrame({
        "box_id": [0, 1, 2],
        "p": [0.9] * 3,
        "cx": [10.0, 20.0, 10.0], "cy": [10.0, 10.0, 50.0],
        "w": [8.0] * 3, "h": [8.0] * 3,
        "feature": [[0.5] * FEATURE_DIM] * 3,
        "block": [0, 0, 1], "idx": [0, 0, 0], "subidx": [0, 1, 0],
        "subtype": [0, 8, 0],
    })
    tokens, meta = tokenize_page(ordered)
    # block change emits two break tokens (block + line-idx reset)
    nl = tokens[:, FEATURE_DIM + TK_NL] > 0
    assert nl.tolist() == [False, False, True, True, False]
    assert (meta[nl, 0] == -1).all()
    assert tokens[1, FEATURE_DIM + TK_SPACE] == 5.0
