"""CRT factorization unit tests (FIXTURES.md §6: CRT roundtrip)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from findtextcenternet_spark.config import MAX_CODEPOINT, MODULOS
from findtextcenternet_spark.functions.crt import (
    codes_to_text,
    decode_codepoints,
    encode_residues,
    valid_codepoint_mask,
)


def _reference_crt(b0: int, b1: int, b2: int) -> int:
    """Independent scalar CRT (Gauss form) to cross-check Garner."""
    m = MODULOS
    M = m[0] * m[1] * m[2]
    x = 0
    for bi, mi in zip((b0, b1, b2), m):
        Mi = M // mi
        x += bi * Mi * pow(Mi, mi - 2, mi)
    return x % M


def test_roundtrip_sample_codepoints():
    cps = np.array([0x20, 0x41, 0x3042, 0x4E00, 0xAC00, 0x1F600,
                    MAX_CODEPOINT, 1, 2, 3], dtype=np.int64)
    r = encode_residues(cps)
    back = decode_codepoints(*r)
    np.testing.assert_array_equal(back, cps)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=MODULOS[0] * MODULOS[1] * MODULOS[2] - 1))
def test_matches_independent_crt(x):
    r = encode_residues(np.array([x]))
    got = int(decode_codepoints(*r)[0])
    assert got == x
    assert got == _reference_crt(int(r[0][0]), int(r[1][0]), int(r[2][0]))


def test_valid_mask_rejects_surrogates_and_overflow():
    cps = np.array([0xD800, 0xDFFF, MAX_CODEPOINT + 1, 0, 0x41], dtype=np.int64)
    np.testing.assert_array_equal(
        valid_codepoint_mask(cps), [False, False, False, False, True])


def test_codes_to_text_replaces_invalid():
    assert codes_to_text(np.array([0x41, 0xD800, 0x42])) == "A�B"
