"""HTML main-content extraction tests (reference: get_aozora.py:49-101)."""

import pandas as pd

from findtextcenternet_spark.corpus import generate_pages
from findtextcenternet_spark.functions.html_extract import (
    extract_main_text,
    extract_main_text_series,
    gaiji_codepoint,
    gaiji_key,
)


def test_boilerplate_stripped():
    html = ('<html><body><div class="header">NAV</div>'
            '<div class="main_text">hello world</div>'
            '<div class="footer">FOOT</div></body></html>')
    assert extract_main_text(html) == "hello world"


def test_nested_divs():
    html = ('<div class="main_text">a<div class="inner">b</div>c</div>'
            '<div>outside</div>')
    assert extract_main_text(html) == "abc"


def test_ruby_normalized():
    html = ('<div class="main_text"><ruby><rb>漢</rb><rp>（</rp>'
            '<rt>かん</rt><rp>）</rp></ruby>字</div>')
    assert extract_main_text(html) == "￹漢￺かん￻字"


def test_notes_stripped_and_tags_removed():
    html = ('<div class="main_text">x<span class="notes">［＃note］</span>'
            '<br>y<em>z</em></div>')
    assert extract_main_text(html) == "xyz"


def test_gaiji_roundtrip():
    for cp in (0x4E00, 0x4E01, 0x4F60, 0x5B57):
        assert gaiji_codepoint(gaiji_key(cp)) == cp


def test_gaiji_replaced():
    key = gaiji_key(0x4F60)
    html = (f'<div class="main_text">a<img src="../g/{key}.png" '
            f'class="gaiji">b</div>')
    assert extract_main_text(html) == "a" + chr(0x4F60) + "b"


def test_kurikaeshi():
    html = '<div class="main_text">く／＼と／″＼</div>'
    assert extract_main_text(html) == "く〳〵と〴〵"


def test_no_main_div_yields_empty():
    assert extract_main_text("<html><body>nope</body></html>") == ""


def test_series_kernel_matches_scalar_on_corpus():
    pdf = generate_pages(60)
    html_docs = pdf[~pdf.lang.str.startswith("raster:")
                & ~pdf.lang.str.startswith("pdf:")]
    got = extract_main_text_series(html_docs.html)
    want = pd.Series(
        [extract_main_text(b.decode()) for b in html_docs.html],
        index=html_docs.index)
    assert (got == want).all()
    assert (got == html_docs.text).all()
