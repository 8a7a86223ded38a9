"""Ruby markup codec tests (FIXTURES.md §6: ruby regex roundtrip)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from findtextcenternet_spark.functions.ruby import decode_ruby, encode_rubyhtml

_plain = st.text(
    alphabet=st.characters(blacklist_characters="￹￺￻<>《》｜"),
    min_size=1, max_size=8)


@st.composite
def ruby_text(draw):
    parts = []
    for _ in range(draw(st.integers(0, 4))):
        if draw(st.booleans()):
            parts.append(draw(_plain))
        else:
            parts.append("￹" + draw(_plain) + "￺" + draw(_plain) + "￻")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(ruby_text())
def test_html_roundtrip(t):
    assert encode_rubyhtml(decode_ruby(t, "html")) == t


def test_aozora_form():
    assert decode_ruby("￹漢字￺かんじ￻です") == "｜漢字《かんじ》です"


def test_noruby_form():
    assert decode_ruby("￹漢字￺かんじ￻です", "noruby") == "漢字です"
