"""Chinese-Remainder-Theorem codepoint factorization (SURVEY.md F2).

The reference decoder does not emit codepoints directly: it emits three
softmax heads over residues modulo (1091, 1093, 1097) and reconstructs the
codepoint by CRT (reference: util_func.py:92-126 ``calc_predid``, with
Fermat-inverse ``pow(m, p-2, p)``; moduli util_func.py:5).

This module is a brand-new vectorized NumPy implementation (Garner's
mixed-radix algorithm) — int64 array math end-to-end so the decode UDF can
reconstruct tens of thousands of candidates per Arrow batch with no Python
loop over rows.
"""

from __future__ import annotations

import numpy as np

from ..config import MAX_CODEPOINT, MODULOS

# Precomputed Fermat inverses inv(m_j) mod m_k for j < k (moduli are prime).
_INV = {
    (j, k): pow(MODULOS[j], MODULOS[k] - 2, MODULOS[k])
    for k in range(len(MODULOS))
    for j in range(k)
}
_M_PROD = int(np.prod(np.array(MODULOS, dtype=np.int64)))


def encode_residues(codes: np.ndarray) -> tuple[np.ndarray, ...]:
    """codepoint array -> tuple of residue arrays (one per modulus)."""
    codes = np.asarray(codes, dtype=np.int64)
    return tuple(codes % m for m in MODULOS)


def decode_codepoints(*residues: np.ndarray) -> np.ndarray:
    """Vectorized CRT reconstruction: residue arrays -> codepoint array.

    Garner's algorithm in mixed radix; identical result to the reference's
    ``calc_predid`` for every residue combination (property-tested).
    """
    assert len(residues) == len(MODULOS)
    b = [np.asarray(r, dtype=np.int64) for r in residues]
    t: list[np.ndarray] = []
    for k in range(len(MODULOS)):
        u = np.zeros_like(b[k])
        for j in range(k):
            w = t[j].copy()
            for i in range(j):
                w = (w * MODULOS[i]) % (_M_PROD)
            u = u + w
        tk = (b[k] - u) % MODULOS[k]
        for j in range(k):
            tk = (tk * _INV[(j, k)]) % MODULOS[k]
        t.append(tk % MODULOS[k])
    x = np.zeros_like(b[0])
    radix = 1
    for k, tk in enumerate(t):
        x = x + tk * radix
        radix *= MODULOS[k]
    return x % _M_PROD


def valid_codepoint_mask(codes: np.ndarray) -> np.ndarray:
    """True where the reconstructed code is a representable codepoint.

    Mirrors the reference's guards: codes > 0x3FFFF and UTF-16 surrogates
    map to U+FFFD (process_ocr_base.py:236-247).
    """
    codes = np.asarray(codes, dtype=np.int64)
    return (
        (codes > 0)
        & (codes <= MAX_CODEPOINT)
        & ~((codes >= 0xD800) & (codes <= 0xDFFF))
    )


def codes_to_text(codes: np.ndarray) -> str:
    """int64 codepoints -> str, invalid codes become U+FFFD."""
    codes = np.asarray(codes, dtype=np.int64)
    ok = valid_codepoint_mask(codes)
    out = np.where(ok, codes, 0xFFFD)
    return "".join(map(chr, out.tolist()))
