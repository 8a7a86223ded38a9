"""PDF text-layer extraction (north rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics").

A real-but-minimal parser for the uncompressed PDF 1.4 subset the fixture
generator emits: objects, a page tree, and content streams whose text is
drawn with BT/ET blocks, Tf/Td/TD/T* positioning and Tj/TJ show operators.
Text assembly follows the layout: shows on one baseline concatenate, a Td/TD
with a negative y-move (or T*) starts a new line, and a gap of more than one
leading starts a new paragraph — the same geometry→reading-order rule the
raster leg's grouping applies.

FlateDecode content streams (the overwhelmingly common real-world case —
nearly every produced PDF compresses its streams) inflate via stdlib zlib
before the same BT/ET parse; stream bytes are sliced by the dict's
``/Length`` when present (a byte-exact slice — compressed data may contain
the literal bytes ``endstream``), falling back to the delimiter scan.
Scope guard: encrypted PDFs and non-Flate filters (DCT/LZW/ASCII85/CID
fonts) raise NotImplementedError; the Spark plumbing (binary column in,
text out through the same vectorized UDF surface) is identical either way.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

PDF_MAGIC = b"%PDF-"

_STREAM_START_RE = re.compile(rb"stream\r?\n")
# direct /Length only — an indirect reference ("/Length 6 0 R") falls
# back to the endstream delimiter scan
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_FILTER_NAME_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/(\w+)")
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.S)
# operators we execute: Tf (font+size), Td/TD (move), T* (next line),
# TL (leading), Tj / TJ (show)
_OP_RE = re.compile(
    rb"(?:/(?P<font>\w+)\s+(?P<size>[\d.]+)\s+Tf)"
    rb"|(?:(?P<tx>-?[\d.]+)\s+(?P<ty>-?[\d.]+)\s+(?P<mv>Td|TD))"
    rb"|(?P<tstar>T\*)"
    rb"|(?:(?P<lead>-?[\d.]+)\s+TL)"
    rb"|(?:\((?P<tj>(?:[^()\\]|\\.)*)\)\s*Tj)"
    rb"|(?:\[(?P<tja>.*?)\]\s*TJ)", re.S)
_TJA_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

_ESCAPES = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
            b"(": "(", b")": ")", b"\\": "\\"}


def _decode_pdf_string(raw: bytes) -> str:
    """PDF literal string → text. Octal and symbolic escapes; fixture
    strings are UTF-8 inside the literal (fixture-only simplification; real
    PDFs need font encoding tables — out of scope, guarded)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\":
            nxt = raw[i + 1:i + 2]
            if nxt.isdigit():
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8))
                i = j
                continue
            if nxt in _ESCAPES:
                out.extend(_ESCAPES[nxt].encode("utf-8"))
                i += 2
                continue
            i += 1
            continue
        out.extend(c)
        i += 1
    return out.decode("utf-8", errors="replace")


def _iter_streams(blob: bytes):
    """Yield decoded content-stream bytes. The governing dict is the
    nearest ``<< ... >>`` ending before the ``stream`` keyword (content
    stream dicts are flat: /Length and optionally /Filter); its /Length
    slices the data byte-exactly, else the ``endstream`` scan bounds it.
    /FlateDecode inflates via zlib (corrupt deflate data raises — the
    caller's quarantine path); any other named filter is out of scope.

    Positional scan, not finditer: the keyword bytes ``stream\\n`` can
    occur INSIDE compressed payloads (and inside ``endstream``), so each
    stream's data must be consumed before searching for the next."""
    pos = 0
    while True:
        m = _STREAM_START_RE.search(blob, pos)
        if m is None:
            return
        if blob[max(0, m.start() - 3):m.start()] == b"end":
            pos = m.end()  # matched the tail of 'endstream'
            continue
        head = blob[max(0, m.start() - 1024):m.start()]
        d0 = head.rfind(b"<<")
        dct = head[d0:] if d0 >= 0 else b""
        lm = _LENGTH_RE.search(dct)
        if lm:
            end = m.end() + int(lm.group(1))
            data = blob[m.end():end]
        else:
            end = blob.find(b"endstream", m.end())
            if end < 0:
                end = len(blob)
            data = blob[m.end():end].rstrip(b"\r\n")
        pos = end
        fm = _FILTER_NAME_RE.search(dct)
        if fm is not None:
            if fm.group(1) != b"FlateDecode":
                raise NotImplementedError(
                    f"unsupported stream filter /{fm.group(1).decode()} "
                    "(FlateDecode only)")
            data = zlib.decompress(data)
        yield data


def extract_pdf_text(blob: bytes) -> str:
    """Binary PDF → flat text (lines joined by \\n, paragraphs by \\n\\n)."""
    if not blob.startswith(PDF_MAGIC):
        raise ValueError("not a PDF")
    if b"/Encrypt" in blob:
        raise NotImplementedError("encrypted PDFs are out of scope")

    paras: list[list[str]] = []
    lines: list[str] = []
    cur: list[str] = []
    for stream in _iter_streams(blob):
        for block in _TEXT_BLOCK_RE.findall(stream):
            leading = 14.0
            for m in _OP_RE.finditer(block):
                if m.group("lead"):
                    leading = float(m.group("lead"))
                elif m.group("mv"):
                    ty = float(m.group("ty"))
                    if m.group("mv") == b"TD":
                        leading = -ty if ty < 0 else leading
                    if ty < 0:
                        if cur:
                            lines.append("".join(cur))
                            cur = []
                        # bigger drop than one leading = paragraph break
                        if -ty > 1.5 * leading and lines:
                            paras.append(lines)
                            lines = []
                elif m.group("tstar"):
                    if cur:
                        lines.append("".join(cur))
                        cur = []
                elif m.group("tj") is not None:
                    cur.append(_decode_pdf_string(m.group("tj")))
                elif m.group("tja") is not None:
                    for s in _TJA_STR_RE.findall(m.group("tja")):
                        cur.append(_decode_pdf_string(s[1:-1]))
            if cur:
                lines.append("".join(cur))
                cur = []
    if lines:
        paras.append(lines)
    return "\n\n".join("\n".join(ls) for ls in paras)


def extract_pdf_series(blobs: pd.Series) -> pd.Series:
    return pd.Series([extract_pdf_text(bytes(b)) for b in blobs],
                     index=blobs.index, dtype="object")


# --- fixture generator (inverse of the parser) -----------------------------

def _encode_pdf_string(s: str) -> bytes:
    out = bytearray()
    for b in s.encode("utf-8"):
        if b in (0x28, 0x29, 0x5C):  # ( ) \
            out.extend(b"\\" + bytes([b]))
        elif b < 0x20:
            out.extend(("\\%03o" % b).encode())
        else:
            out.append(b)
    return bytes(out)


def render_pdf(paras: list[list[str]], rng: np.random.Generator,
               compress: bool | None = None) -> bytes:
    """Golden paragraphs → a valid single-page PDF whose text layer
    extracts back to exactly flat_text(paras). ``compress=None`` draws
    from rng: half the fixtures FlateDecode their content stream (the
    real-world-dominant shape), half stay uncompressed."""
    ops = [b"BT", b"/F1 10 Tf", b"14 TL", b"72 770 Td"]
    first = True
    for lines in paras:
        if not first:
            ops.append(b"0 -28 Td")  # 2x leading => paragraph break
        first = False
        for i, ln in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            body = _encode_pdf_string(ln)
            if rng.random() < 0.3 and len(ln) > 4:
                # split across a TJ array to exercise that operator
                half = len(ln) // 2
                ops.append(b"[" + b"(" + _encode_pdf_string(ln[:half])
                           + b") -20 (" + _encode_pdf_string(ln[half:])
                           + b")] TJ")
            else:
                ops.append(b"(" + body + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    if compress is None:
        compress = bool(rng.random() < 0.5)
    if compress:
        content = zlib.compress(content)
        stream_dict = (b"<< /Length " + str(len(content)).encode()
                       + b" /Filter /FlateDecode >>")
    else:
        stream_dict = b"<< /Length " + str(len(content)).encode() + b" >>"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_dict + b"\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out.extend(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_at = len(out)
    out.extend(b"xref\n0 " + str(len(objs) + 1).encode() + b"\n")
    out.extend(b"0000000000 65535 f \n")
    for off in offsets:
        out.extend(f"{off:010d} 00000 n \n".encode())
    out.extend(b"trailer\n<< /Size " + str(len(objs) + 1).encode()
               + b" /Root 1 0 R >>\nstartxref\n"
               + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)
