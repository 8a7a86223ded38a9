"""Capstone: the whole crawl-native loop through every I/O surface.

landing WARCs → CDX index (walk once) → manifest-pruned, mime-filtered
range fetch → lineage extraction (resumable) → WET publication → WET
read-back. Each leg is unit-tested elsewhere; this asserts the
SEAMS — byte-identical text per url end to end (the north rule's
per-row invariant), junk records never fetched, resume a no-op."""

import pandas as pd

from findtextcenternet_spark.corpus import generate_pages
from findtextcenternet_spark.golden import extract_page_golden
from findtextcenternet_spark.lineage import run_extract
from findtextcenternet_spark.sources.cdx import (
    build_cdx,
    fetch_cdx_records,
    read_cdxj,
    write_cdxj,
)
from findtextcenternet_spark.sources.warc import (
    read_wet,
    write_warc,
    write_wet,
)


def test_crawl_loop_end_to_end(spark, tmp_path):
    corpus = generate_pages(60)
    rows = corpus.to_dict("records")
    for i, r in enumerate(rows):          # a crawl is mostly not html
        if i % 3:
            r["mime"] = ("image/jpeg", "text/css")[i % 2]
    land = tmp_path / "landing"
    land.mkdir()
    (land / "seg0.warc.gz").write_bytes(write_warc(rows[:30]))
    (land / "seg1.warc.gz").write_bytes(write_warc(rows[30:]))

    # 1. index the segment once, publish sorted shards
    idx_dir = tmp_path / "cdx"
    write_cdxj(build_cdx(spark, str(land)), str(idx_dir),
               num_shards=2).collect()

    # 2. prune by mime, range-fetch only the html records
    idx = read_cdxj(spark, str(idx_dir))
    html_rows = [r for i, r in enumerate(rows) if not i % 3]
    picked = idx.filter("mime = 'text/html'")
    assert picked.count() == len(html_rows)
    pages = fetch_cdx_records(spark, picked)

    # 3. resumable lineage extraction
    out = tmp_path / "out"
    s1 = run_extract(pages.drop("error"), str(out), run_id="r1")
    assert s1["n_docs"] == len(html_rows)
    docs = spark.read.parquet(str(out / "docs")).filter("error is null")
    got = {r["url"]: r["text"] for r in docs.collect()}
    want = {r["url"]: extract_page_golden(r["url"], bytes(r["html"]))["text"]
            for r in html_rows}
    assert got == want                    # byte-identical text per url

    # 3b. resume over the same fetch is a no-op
    s2 = run_extract(pages.drop("error"), str(out), run_id="r2")
    assert s2["n_docs"] == 0

    # 4. publish WET, read back, still byte-identical
    wet_dir = tmp_path / "wet"
    write_wet(docs.repartition(2, "url"), str(wet_dir)).collect()
    back = read_wet(spark, str(wet_dir)).toPandas()
    assert back["error"].isna().all()
    assert {u: t for u, t in zip(back["url"], back["text"])} == want
