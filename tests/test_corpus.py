"""Corpus generator invariants (FIXTURES.md §1-2).

Regression for the round-1 bug where generate_pages_range dropped
raster_frac/pdf_frac, silently writing the default 0.2/0.1 mix — which
mislabeled the scaling bench's "all-raster" corpus.
"""

import pyarrow.parquet as pq

from findtextcenternet_spark.corpus import (
    RASTER_MARKER,
    generate_pages,
    generate_pages_range,
    write_pages_parquet,
)


def test_write_pages_parquet_respects_fracs(tmp_path):
    p = str(tmp_path / "pages")
    write_pages_parquet(p, 60, raster_frac=1.0, pdf_frac=0.0, n_files=3)
    t = pq.read_table(p).to_pandas()
    assert len(t) == 60
    assert all(bytes(h).startswith(RASTER_MARKER) for h in t["html"]), (
        "raster_frac=1.0 must yield only raster pages")


def test_generate_pages_range_matches_full(tmp_path):
    a = generate_pages(20, raster_frac=0.5, pdf_frac=0.2).iloc[10:].reset_index(drop=True)
    b = generate_pages_range(10, 20, raster_frac=0.5, pdf_frac=0.2)
    assert a.equals(b)
