"""PDF text-layer extraction: parser unit properties + pipeline routing."""

import numpy as np
import pytest

from findtextcenternet_spark.corpus import flat_text, make_text
from findtextcenternet_spark.operators.pdf import (
    extract_pdf_text,
    render_pdf,
)


def test_roundtrip_all_langs():
    rng = np.random.default_rng(11)
    for trial in range(80):
        lang = ["en", "fr", "de", "ja", "ko"][trial % 5]
        paras = make_text(rng, lang, int(rng.integers(1, 5)), lang == "ja")
        pdf = render_pdf(paras, rng)
        assert pdf.startswith(b"%PDF-1.4")
        assert extract_pdf_text(pdf) == flat_text(paras)


def test_escapes_and_operators():
    rng = np.random.default_rng(3)
    paras = [["parens (x) and \\ backslash", "tab\tand newline kept out"],
             ["second block"]]
    pdf = render_pdf(paras, rng)
    assert extract_pdf_text(pdf) == flat_text(paras)


def test_guards():
    with pytest.raises(ValueError):
        extract_pdf_text(b"not a pdf")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(b"%PDF-1.4\n/Filter /FlateDecode\nstream\nendstream")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(b"%PDF-1.4\n/Encrypt 1 0 R\n")


def test_pipeline_routes_pdf(spark):
    from findtextcenternet_spark.corpus import generate_pages
    from findtextcenternet_spark.golden import extract_corpus_golden
    from findtextcenternet_spark.pipeline import (
        extract_documents,
        pages_from_pandas,
    )
    pdf = generate_pages(150)
    assert pdf["lang"].str.startswith("pdf:").any(), "corpus must emit pdfs"
    got = (extract_documents(pages_from_pandas(spark, pdf))
           .select("url", "text", "path").toPandas().set_index("url"))
    want = extract_corpus_golden(pdf).set_index("url")
    assert len(got) == 150
    n_pdf = (got["path"] == "pdf").sum()
    assert n_pdf > 0
    for url in want.index:
        assert got.loc[url, "text"] == want.loc[url, "text"], url
        assert got.loc[url, "path"] == want.loc[url, "path"], url
