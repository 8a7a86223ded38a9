"""fsutil scheme dispatch: plain open vs pyarrow.fs, proven equivalent
through file:// URIs (pyarrow's LocalFileSystem is the same code path an
object-store URI takes)."""

import pandas as pd
import pytest

from findtextcenternet_spark.corpus import generate_pages
from findtextcenternet_spark.sources.fsutil import list_files, open_binary
from findtextcenternet_spark.sources.warc import write_warc


def test_open_binary_all_forms(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(bytes(range(256)) * 4)
    for form in (str(p), f"file:{p}", f"file://{p}"):
        with open_binary(form) as f:
            assert f.read(4) == b"\x00\x01\x02\x03", form
            f.seek(300)
            assert f.read(2) == bytes([44, 45]), form   # ranged read


def test_list_files_local_and_uri(tmp_path):
    for n in ("a.warc.gz", "b.warc", "c.warc.gz.inprogress", "d.txt"):
        (tmp_path / n).write_bytes(b"x")
    want = [str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc")]
    assert list_files(str(tmp_path)) == want
    assert list_files(str(tmp_path / "*.warc*")) == \
        [str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc")]
    # pyarrow branch: same files, URIs preserved for downstream opens
    got = list_files(f"file://{tmp_path}")
    assert [g.rsplit("/", 1)[1] for g in got] == ["a.warc.gz", "b.warc"]
    assert all(g.startswith("file://") for g in got)
    # single-file URI
    assert list_files(f"file://{tmp_path}/a.warc.gz") == \
        [f"file://{tmp_path}/a.warc.gz"]


def test_datasource_and_fetch_through_uri(spark, tmp_path):
    """The executor-side pyarrow branch under Spark: the native warc
    source planned from a file:// URI, and a CDX fetch whose filenames
    are file:// URIs, both match the plain-path results."""
    from pyspark.sql import functions as F

    from findtextcenternet_spark.sources.cdx import (
        build_cdx, fetch_cdx_records)
    from findtextcenternet_spark.sources.warc_datasource import (
        register_warc_datasource)

    rows = generate_pages(12).to_dict("records")
    (tmp_path / "u.warc.gz").write_bytes(write_warc(rows))
    register_warc_datasource(spark)

    plain = spark.read.format("warc").load(str(tmp_path)).toPandas()
    via_uri = spark.read.format("warc").load(f"file://{tmp_path}") \
        .toPandas()
    assert sorted(via_uri["url"]) == sorted(plain["url"]) \
        and len(plain) == 12

    cdx = build_cdx(spark, str(tmp_path / "u.warc.gz"))
    # rewrite binaryFile's file:/x filenames to full file:// URIs so the
    # fetch kernel takes the pyarrow branch
    uri_cdx = cdx.withColumn(
        "filename", F.regexp_replace("filename", "^file:/", "file:///"))
    pages = fetch_cdx_records(spark, uri_cdx).toPandas()
    assert pages["error"].isna().all()
    assert {u: bytes(h) for u, h in zip(pages["url"], pages["html"])} \
        == {r["url"]: bytes(r["html"]) for r in rows}
