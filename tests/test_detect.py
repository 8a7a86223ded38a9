"""Detect-stage tests (FIXTURES.md §6: NMS table; peak recovery)."""

import numpy as np

from findtextcenternet_spark.corpus import generate_pages, make_layout
from findtextcenternet_spark.operators.detect import (
    detect_page,
    greedy_nms,
    maxpool3x3,
    parse_layout,
    tile_origins,
)


def test_tile_origins_cover():
    for n in (100, 192, 193, 400, 1000):
        tiles = tile_origins(n)
        covered = np.zeros(n, dtype=bool)
        for o in tiles:
            covered[o:o + 192] = True
        assert covered.all()
        assert tiles == sorted(tiles)


def test_maxpool3x3():
    p = np.zeros((5, 5), dtype=np.float32)
    p[2, 2] = 1.0
    out = maxpool3x3(p)
    assert out[1, 1] == out[2, 3] == 1.0
    assert out[0, 0] == 0.0
    assert (p >= out).sum() == 25 - 8  # only the 8 ring cells lose


def test_greedy_nms_rules():
    # identical boxes: second dropped (IoU=1 > 0.5)
    boxes = np.array([
        [0.9, 100, 100, 40, 40],
        [0.8, 100, 100, 40, 40],
        [0.7, 300, 300, 40, 40],
    ], dtype=np.float64)
    keep = greedy_nms(boxes)
    assert keep.tolist() == [True, False, True]

    # small box fully inside an accepted big one: intersection = own area
    # > 0.75*own → dropped
    boxes = np.array([
        [0.9, 100, 100, 80, 80],
        [0.8, 100, 100, 20, 20],
    ], dtype=np.float64)
    assert greedy_nms(boxes).tolist() == [True, False]

    # two accepted neighbours each overlap < thresholds but their union
    # fills > 0.5 of the third box → fill rule drops it
    boxes = np.array([
        [0.9, 90, 100, 40, 40],
        [0.8, 130, 100, 40, 40],
        [0.7, 110, 100, 44, 40],
    ], dtype=np.float64)
    keep = greedy_nms(boxes)
    assert keep.tolist() == [True, True, False]

    # disjoint boxes all kept
    boxes = np.array([
        [0.9, 0, 0, 10, 10],
        [0.8, 100, 0, 10, 10],
        [0.7, 0, 100, 10, 10],
    ], dtype=np.float64)
    assert greedy_nms(boxes).all()


def test_detect_recovers_every_glyph():
    pdf = generate_pages(80)
    rast = pdf[pdf.lang.str.startswith("raster:")]
    assert len(rast) > 5
    for row in rast.itertuples():
        layout = parse_layout(bytes(row.html))
        boxes, runs = detect_page(layout)
        # every REAL glyph recovered; low-contrast decoys are P6-dropped
        real = [g for g in layout["glyphs"]
                if g.get("contrast", 1.0) >= 0.5]
        assert len(boxes) == len(real), row.url
        got = set(zip(boxes.cx.astype(int), boxes.cy.astype(int)))
        want = {(int(g["cx"]), int(g["cy"])) for g in real}
        assert got == want
        assert (runs["channel"] == "line").sum() > 0


def test_multi_tile_page_consistent():
    # a wide layout spanning several tiles still recovers all glyphs
    paras = [["abcdefghij klmnop qrstuv wxyzab cdefgh ijklmn opqrst uvwxyz"
              " abcdef ghijkl mnopqr stuvwx yzabcd"] * 2]
    layout = make_layout(paras, vertical=False)
    assert layout["page_w"] > 768  # multi-tile in x
    boxes, _ = detect_page(layout)
    assert len(boxes) == len(layout["glyphs"])


def test_tiled_merge_equals_direct():
    """The production direct page render must match the real-model tile
    geometry (interior-masked overlap-max merge) cell for cell."""
    import numpy as np

    from findtextcenternet_spark.corpus import RASTER_MARKER, generate_pages
    from findtextcenternet_spark.operators.detect import (
        parse_layout,
        render_page_heatmaps,
        render_page_heatmaps_tiled,
    )

    pdf = generate_pages(150)
    layouts = [parse_layout(bytes(h)) for h in pdf.html
               if bytes(h).startswith(RASTER_MARKER)]
    assert len(layouts) >= 10
    for layout in layouts:
        direct = render_page_heatmaps(layout)
        tiled = render_page_heatmaps_tiled(layout)
        assert np.array_equal(direct, tiled)
