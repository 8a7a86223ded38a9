"""End-to-end golden parity: corpus ground truth == golden reference
(BASELINE.md correctness baseline)."""

from findtextcenternet_spark.corpus import generate_pages
from findtextcenternet_spark.functions.ruby import decode_ruby
from findtextcenternet_spark.golden import extract_page_golden


def test_golden_matches_corpus_ground_truth():
    pdf = generate_pages(250)
    for row in pdf.itertuples():
        rec = extract_page_golden(row.url, bytes(row.html))
        if row.lang.startswith("raster:"):
            assert rec["text"] == row.text, row.url
            assert rec["aozora"] == decode_ruby(row.text, "aozora")
            assert rec["noruby"] == decode_ruby(row.text, "noruby")
            # span chars concatenate to the noruby text minus whitespace
            span_chars = "".join(s["ch"] for s in rec["spans"])
            flat = rec["noruby"].replace("\n", "").replace(" ", "")
            flat = flat.replace("　", "")
            ruby_chars = "".join(
                s["ch"] for s in rec["spans"] if not s["ruby"])
            assert ruby_chars == flat
        else:
            assert rec["text"] == row.text, row.url
            assert rec["spans"] == []


def test_generator_determinism():
    a = generate_pages(40)
    b = generate_pages(40)
    assert a.equals(b)
