"""Single-process golden reference pipeline.

Runs the exact same NumPy kernels as the Spark stages, sequentially per
page, with no Spark involved. The driver contract (BASELINE.md) is that the
distributed pipeline's per-url extracted text is byte-identical to this
reference at every parallelism level.
"""

from __future__ import annotations

import pandas as pd

from .corpus import RASTER_MARKER
from .functions.html_extract import decode_page_bytes, extract_main_text
from .functions.ruby import decode_ruby
from .operators.assemble import assemble_page
from .operators.decode import expand_window, segment_windows, tokenize_page
from .operators.detect import detect_page, parse_layout
from .operators.group import group_page
from .operators.pdf import PDF_MAGIC, extract_pdf_text


def extract_raster_page(html: bytes, weights_path: str | None = None) -> dict:
    """detect → group → tokenize → window → decode → assemble, one page.
    ``weights_path`` selects the real-model forward path (models.py);
    default is the deterministic surrogate."""
    from .operators.model_registry import get_detector_model, get_residue_heads

    model = get_detector_model(weights_path)
    head = get_residue_heads(weights_path)
    layout = parse_layout(html)
    boxes, runs = detect_page(layout, model)
    ordered = group_page(boxes, runs)
    tokens, meta = tokenize_page(ordered)
    windows = []
    for start, end, keep_back in segment_windows(tokens):
        pred, tok_of = expand_window(tokens[start:end], meta[start:end], head)
        windows.append({"pred": pred, "tok_of": tok_of,
                        "meta": meta[start:end], "keep_back": keep_back})
    return assemble_page(windows)


def extract_page_golden(url: str, html: bytes,
                        weights_path: str | None = None) -> dict:
    """Dispatch on content kind; returns the extracted-document record."""
    if html.startswith(RASTER_MARKER):
        rec = extract_raster_page(html, weights_path)
        rec["path"] = "raster"
    elif html.startswith(PDF_MAGIC):
        text = extract_pdf_text(html)
        rec = {"text": text,
               "aozora": decode_ruby(text, "aozora"),
               "noruby": decode_ruby(text, "noruby"),
               "spans": [], "lines": [], "blocks": [],
               "path": "pdf"}
    else:
        text = extract_main_text(decode_page_bytes(html))
        rec = {"text": text,
               "aozora": decode_ruby(text, "aozora"),
               "noruby": decode_ruby(text, "noruby"),
               "spans": [], "lines": [], "blocks": [],
               "path": "html"}
    rec["url"] = url
    return rec


def extract_corpus_golden(pages: pd.DataFrame) -> pd.DataFrame:
    recs = [extract_page_golden(r.url, r.html) for r in pages.itertuples()]
    return pd.DataFrame(recs)
