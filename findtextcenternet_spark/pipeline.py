"""End-to-end Spark extraction pipeline (SURVEY.md §3.1 lifecycle).

    pages ──┬─ html path:   pandas_udf extract_html            (narrow)
            ├─ pdf path:    pandas_udf extract_pdf             (narrow)
            └─ raster path: mapInPandas(detect)                (narrow)
                            → applyInPandas(url)(group+window) (shuffle 1)
                            → mapInPandas(decode)              (narrow)
                            → applyInPandas(url)(assemble)     (shuffle 2)
            → unionByName → extracted docs

Shuffle budget: one input spread (``spread_pages``, hash on url — shared
by all three legs via exchange/stage reuse) plus two grouped-stage
repartitions in the raster leg whose hash partitioning the following
groupBy reuses. Every other stage is narrow / Arrow-batched; decode
batches windows across pages, so a page with many windows never serializes
a stage. Skew: urls are unique, so hashing on the full url is the perfect
case of salted domain repartition (tests/test_skew.py). Poison pills:
``extract_documents_robust`` diverts structurally invalid pages to a
quarantine frame instead of failing tasks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import FEATURE_DIM
from .corpus import RASTER_MARKER
from .functions.html_extract import extract_main_text_series
from .functions.ruby import decode_ruby_col
from .operators.assemble import assemble_page
from .operators.decode import expand_window, segment_windows, tokenize_page
from .operators.detect import detect_page, parse_layout
from .operators.group import group_page

# ---------------------------------------------------------------- schemas

DETECT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("kind", T.StringType()),          # 'box' | 'run'
    T.StructField("box_id", T.LongType()),
    T.StructField("p", T.DoubleType()),
    T.StructField("cx", T.DoubleType()),
    T.StructField("cy", T.DoubleType()),
    T.StructField("w", T.DoubleType()),
    T.StructField("h", T.DoubleType()),
    T.StructField("code1", T.DoubleType()),
    T.StructField("code2", T.DoubleType()),
    T.StructField("code4", T.DoubleType()),
    T.StructField("code8", T.DoubleType()),
    T.StructField("feature", T.BinaryType()),   # 100 packed float32
    T.StructField("channel", T.StringType()),        # runs only
    T.StructField("ry", T.LongType()),
    T.StructField("rx1", T.LongType()),
    T.StructField("rx2", T.LongType()),
    T.StructField("rv", T.DoubleType()),             # run cell value
])

# tokens/meta/tok_of travel as packed little-endian buffers, one binary
# cell per window: (n,106) float32, (n,9) float64, (m,) int64. Arrow moves
# them as a single memcpy per cell; list<list<float>> would box every
# element in Python on both sides of every exchange.
WINDOW_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("win_id", T.LongType()),
    T.StructField("keep_back", T.LongType()),
    T.StructField("tokens", T.BinaryType()),
    T.StructField("meta", T.BinaryType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("win_id", T.LongType()),
    T.StructField("keep_back", T.LongType()),
    T.StructField("pred", T.StringType()),
    T.StructField("tok_of", T.BinaryType()),
    T.StructField("meta", T.BinaryType()),
])

SPAN_TYPE = T.StructType([
    T.StructField("cx", T.DoubleType()), T.StructField("cy", T.DoubleType()),
    T.StructField("w", T.DoubleType()), T.StructField("h", T.DoubleType()),
    T.StructField("ch", T.StringType()),
    T.StructField("blockidx", T.IntegerType()),
    T.StructField("lineidx", T.IntegerType()),
    T.StructField("subidx", T.IntegerType()),
    T.StructField("ruby", T.IntegerType()),
    T.StructField("rubybase", T.IntegerType()),
    T.StructField("emphasis", T.IntegerType()),
    T.StructField("vertical", T.IntegerType()),
])
LINE_TYPE = T.StructType([
    T.StructField("x1", T.DoubleType()), T.StructField("y1", T.DoubleType()),
    T.StructField("x2", T.DoubleType()), T.StructField("y2", T.DoubleType()),
    T.StructField("blockidx", T.IntegerType()),
    T.StructField("lineidx", T.IntegerType()),
    T.StructField("text", T.StringType()),
])
BLOCK_TYPE = T.StructType([
    T.StructField("x1", T.DoubleType()), T.StructField("y1", T.DoubleType()),
    T.StructField("x2", T.DoubleType()), T.StructField("y2", T.DoubleType()),
    T.StructField("blockidx", T.IntegerType()),
    T.StructField("text", T.StringType()),
])

DOC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("aozora", T.StringType()),
    T.StructField("noruby", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    T.StructField("lines", T.ArrayType(LINE_TYPE)),
    T.StructField("blocks", T.ArrayType(BLOCK_TYPE)),
    T.StructField("path", T.StringType()),
])

# ---------------------------------------------------------------- stages


def _detect_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one page per input row → box + run rows."""
    from .operators.model_registry import get_detector_model

    get_detector_model()  # per-worker singleton; loads once, reused by
    # every task this worker runs (real weights slot in here)
    for pdf in it:
        out = []
        for url, html in zip(pdf["url"], pdf["html"]):
            layout = parse_layout(bytes(html))
            boxes, runs = detect_page(layout)
            if not boxes.empty:
                b = boxes.copy()
                b.insert(0, "url", url)
                b.insert(1, "kind", "box")
                b["channel"] = None
                b["ry"] = -1
                b["rx1"] = -1
                b["rx2"] = -1
                b["rv"] = 0.0
                out.append(b)
            if not runs.empty:
                r = pd.DataFrame({
                    "url": url, "kind": "run",
                    "box_id": -1, "p": 0.0, "cx": 0.0, "cy": 0.0,
                    "w": 0.0, "h": 0.0, "code1": 0.0, "code2": 0.0,
                    "code4": 0.0, "code8": 0.0,
                    "feature": None,
                    "channel": runs["channel"],
                    "ry": runs["y"].astype("int64"),
                    "rx1": runs["x1"].astype("int64"),
                    "rx2": runs["x2"].astype("int64"),
                    "rv": runs["v"].astype("float64"),
                })
                out.append(r)
        if out:
            yield pd.concat(out, ignore_index=True)[
                [f.name for f in DETECT_SCHEMA.fields]]


def _group_and_window(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas(url) kernel: group boxes into reading order, tokenize,
    segment into decode windows."""
    url = key[0]
    boxes = pdf[pdf["kind"] == "box"][
        ["box_id", "p", "cx", "cy", "w", "h",
         "code1", "code2", "code4", "code8", "feature"]
    ].sort_values("box_id").reset_index(drop=True)
    runs = pd.DataFrame({
        "channel": pdf.loc[pdf["kind"] == "run", "channel"],
        "y": pdf.loc[pdf["kind"] == "run", "ry"],
        "x1": pdf.loc[pdf["kind"] == "run", "rx1"],
        "x2": pdf.loc[pdf["kind"] == "run", "rx2"],
        "v": pdf.loc[pdf["kind"] == "run", "rv"],
    }).sort_values(["channel", "y", "x1"]).reset_index(drop=True)

    ordered = group_page(boxes, runs)
    tokens, meta = tokenize_page(ordered)
    rows = []
    for wi, (start, end, keep_back) in enumerate(segment_windows(tokens)):
        rows.append((url, wi, keep_back,
                     np.ascontiguousarray(tokens[start:end],
                                          dtype=np.float32).tobytes(),
                     np.ascontiguousarray(meta[start:end],
                                          dtype=np.float64).tobytes()))
    return pd.DataFrame(rows, columns=["url", "win_id", "keep_back",
                                       "tokens", "meta"])


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: mask-predict decode, batched across pages."""
    enc_dim = FEATURE_DIM + 6
    for pdf in it:
        preds, toks = [], []
        for tokens, meta in zip(pdf["tokens"], pdf["meta"]):
            tok = np.frombuffer(tokens, dtype=np.float32).reshape(-1, enc_dim)
            mt = np.frombuffer(meta, dtype=np.float64).reshape(-1, 9)
            pred, tok_of = expand_window(tok, mt)
            preds.append(pred)
            toks.append(np.ascontiguousarray(tok_of,
                                             dtype=np.int64).tobytes())
        yield pd.DataFrame({
            "url": pdf["url"], "win_id": pdf["win_id"],
            "keep_back": pdf["keep_back"], "pred": preds, "tok_of": toks,
            "meta": pdf["meta"],
        })


def _assemble_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    url = key[0]
    pdf = pdf.sort_values("win_id")
    windows = [
        {"pred": r.pred, "tok_of": np.frombuffer(r.tok_of, dtype=np.int64),
         "meta": np.frombuffer(r.meta, dtype=np.float64).reshape(-1, 9),
         "keep_back": int(r.keep_back)}
        for r in pdf.itertuples()
    ]
    rec = assemble_page(windows)
    return pd.DataFrame([{
        "url": url, "text": rec["text"], "aozora": rec["aozora"],
        "noruby": rec["noruby"], "spans": rec["spans"],
        "lines": rec["lines"], "blocks": rec["blocks"], "path": "raster",
    }])


# ---------------------------------------------------------------- pipeline


@F.pandas_udf(T.StringType())
def extract_html_udf(html: pd.Series) -> pd.Series:
    return extract_main_text_series(html)


@F.pandas_udf(T.StringType())
def extract_pdf_udf(blob: pd.Series) -> pd.Series:
    from .operators.pdf import extract_pdf_series

    return extract_pdf_series(blob)


def is_raster_col():
    # binary prefix probe — JVM-side, no decoded copy of the page
    return F.startswith(F.col("html"), F.lit(RASTER_MARKER))


def is_pdf_col():
    return F.startswith(F.col("html"), F.lit(b"%PDF-"))


def extract_pdf_path(pages: DataFrame) -> DataFrame:
    """The PDF leg: text-layer parse, one vectorized UDF, fully narrow
    (operators/pdf.py; north rule 'PDF/layout parse')."""
    txt = extract_pdf_udf(F.col("html"))
    return (
        pages.filter(is_pdf_col())
        .select("url", txt.alias("text"))
        .select(
            "url", "text",
            decode_ruby_col(F.col("text"), "aozora").alias("aozora"),
            decode_ruby_col(F.col("text"), "noruby").alias("noruby"),
            F.array().cast(T.ArrayType(SPAN_TYPE)).alias("spans"),
            F.array().cast(T.ArrayType(LINE_TYPE)).alias("lines"),
            F.array().cast(T.ArrayType(BLOCK_TYPE)).alias("blocks"),
            F.lit("pdf").alias("path"),
        )
    )


def extract_html_path(pages: DataFrame) -> DataFrame:
    """The pure-HTML leg: one vectorized UDF, fully narrow."""
    txt = extract_html_udf(F.col("html"))
    return (
        pages.filter(~is_raster_col() & ~is_pdf_col())
        .select(
            "url",
            txt.alias("text"),
        )
        .select(
            "url", "text",
            decode_ruby_col(F.col("text"), "aozora").alias("aozora"),
            decode_ruby_col(F.col("text"), "noruby").alias("noruby"),
            F.array().cast(T.ArrayType(SPAN_TYPE)).alias("spans"),
            F.array().cast(T.ArrayType(LINE_TYPE)).alias("lines"),
            F.array().cast(T.ArrayType(BLOCK_TYPE)).alias("blocks"),
            F.lit("html").alias("path"),
        )
    )


def _parallelism(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    # 4 tasks per core: measured best at local[32] on 100k docs (2 waves
    # leave cores idle in each stage's straggler tail; 8 waves over-pay
    # per-task overhead)
    return df.sparkSession.sparkContext.defaultParallelism * 4


def extract_raster_path(pages: DataFrame,
                        num_partitions: int | None = None) -> DataFrame:
    """The raster leg: detect → group/window → decode → assemble.

    Each grouped stage is fed by an EXPLICIT ``repartition(n, url)``: the
    groupBy reuses that exchange (hash partitioning on the grouping key
    already satisfies the required clustering, so no second shuffle), and a
    user-specified partition count is exempt from AQE partition coalescing.
    That matters because these stages are Python-CPU-bound, not
    shuffle-byte-bound — AQE's 64 MB advisory target would coalesce them to
    a handful of partitions and serialize the NumPy kernels (measured 2.3×
    slowdown at local[32]).
    """
    n = _parallelism(pages, num_partitions)
    raster = pages.filter(is_raster_col()).select("url", "html")
    detected = raster.mapInPandas(_detect_batches, DETECT_SCHEMA)
    windows = (detected.repartition(n, F.col("url"))
               .groupBy("url").applyInPandas(_group_and_window,
                                             WINDOW_SCHEMA))
    decoded = windows.mapInPandas(_decode_batches, DECODED_SCHEMA)
    return (decoded.repartition(n, F.col("url"))
            .groupBy("url").applyInPandas(_assemble_group, DOC_SCHEMA))


def spread_pages(pages: DataFrame, num_partitions: int | None = None,
                 ) -> DataFrame:
    """Hash-repartition the input on ``url`` before the compute legs.

    Two jobs at once (SURVEY.md §4 "what needs explicit engineering"):
      * parallelism floor — a corpus written as few giant files (or one
        bench file) would otherwise run the whole UDF pipeline on a handful
        of cores; scan splits can't cross parquet row groups;
      * skew spread — url is unique, so hashing on it is the degenerate
        (perfect) case of salted-repartition by domain: a hot host's pages
        scatter uniformly instead of landing in one task.

    Both downstream legs reuse the single exchange (Catalyst ReuseExchange),
    so this adds exactly one shuffle of the raw pages.
    """
    if num_partitions is None:
        sc = pages.sparkSession.sparkContext
        num_partitions = sc.defaultParallelism * 4
    if num_partitions <= 0:
        return pages
    return pages.repartition(num_partitions, F.col("url"))


def extract_documents(pages: DataFrame,
                      num_partitions: int | None = None) -> DataFrame:
    """Full extraction: all legs, one output table."""
    pages = spread_pages(pages, num_partitions)
    return (extract_html_path(pages)
            .unionByName(extract_pdf_path(pages))
            .unionByName(extract_raster_path(pages, num_partitions)))


VALIDATED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("error", T.StringType()),
])


def _validate_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Cheap structural probe per page — the full parse each leg will do,
    run under try/except so a poisoned page becomes a quarantine row
    instead of a task (and with 4 retries, job) failure."""
    from .operators.pdf import PDF_MAGIC, extract_pdf_text

    for pdf in it:
        oks, errs = [], []
        for html in pdf["html"]:
            b = bytes(html)
            try:
                if b.startswith(RASTER_MARKER):
                    layout = parse_layout(b)
                    # required keys; glyph records must be well-formed
                    _ = (layout["page_w"], layout["page_h"],
                         layout["glyphs"], layout["textlines"])
                    for g in layout["glyphs"][:4096]:
                        _ = (g["cx"], g["cy"], g["w"], g["h"], g["cp"])
                elif b.startswith(PDF_MAGIC):
                    extract_pdf_text(b)
                else:
                    b.decode("utf-8", errors="strict")
                oks.append(True)
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, never fail
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:500])
        yield pd.DataFrame({"url": pdf["url"], "ok": oks, "error": errs})


def validate_pages(pages: DataFrame) -> DataFrame:
    """(url, ok, error) verdict per page; narrow, Arrow-batched."""
    return pages.select("url", "html").mapInPandas(_validate_batches,
                                                   VALIDATED_SCHEMA)


def extract_documents_robust(pages: DataFrame,
                             num_partitions: int | None = None,
                             ) -> tuple[DataFrame, DataFrame]:
    """Poison-pill-safe extraction for unbounded corpora.

    Returns (docs, quarantine): pages failing the structural probe are
    diverted to the quarantine frame (url + error) and the pipeline runs
    only on validated pages — one malformed document out of 10^12 must
    cost one quarantine row, not a job."""
    pages = spread_pages(pages, num_partitions)
    verdict = validate_pages(pages)
    good = pages.join(verdict.filter(F.col("ok")).select("url"),
                      "url", "left_semi")
    quarantine = verdict.filter(~F.col("ok")).select("url", "error")
    docs = (extract_html_path(good)
            .unionByName(extract_pdf_path(good))
            .unionByName(extract_raster_path(good, num_partitions)))
    return docs, quarantine


def pages_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    return spark.createDataFrame(pdf, schema=schema)
