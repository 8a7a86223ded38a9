"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-2).

Generates the ``pages`` input table mandated by BASELINE.json `input_hint`:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Two document kinds:

* **html** (~80%): a full HTML page — boilerplate header/nav/footer around a
  ``<div class="main_text">`` body containing paragraphs, ``<ruby>`` runs,
  single-line ``<span class="notes">`` asides, and gaiji ``<img …/d-dd-dd.png>``
  tokens — exactly the structures the reference's Aozora scraper handles
  (reference: make_traindata/render_font/get_aozora.py:49-101).
  ``text`` holds the golden main-content extraction.

* **raster** (~20%): the ``html`` column carries a marker comment plus a JSON
  layout record (page dims, per-glyph boxes/codepoints/flags, separator
  strokes, textline polylines) standing in for rendered pixels — the shape of
  the reference train shards (make_traindata/make_traindata1.py:56-64:
  position.npy + code_list.npy). ``text`` holds the golden decoded text with
  ruby as U+FFF9/FFFA/FFFB, lines joined by ``\\n`` within a block and
  ``\\n\\n`` between blocks (the flat-text layout the reference assembler
  produces, process_ocr_base.py:135-149,463).

Everything is a pure function of ``(seed, doc_id)`` — per-doc PCG64 streams —
so any subset, ordering, or partitioning regenerates identical bytes.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import numpy as np
import pandas as pd

from .config import CORPUS_SEED, LANGS
from .functions.html_extract import gaiji_key

RASTER_MARKER = b"<!--content_type:layout-->"

# --- tiny deterministic vocabularies -------------------------------------

_LATIN_WORDS = {
    "en": ("the quick brown fox jumps over lazy dog while rain falls on "
           "green hills and rivers flow toward distant mountains under "
           "clear skies every morning people walk through quiet streets").split(),
    "fr": ("le renard brun saute par dessus le chien pendant que la pluie "
           "tombe sur les collines vertes et les rivieres coulent vers les "
           "montagnes lointaines sous un ciel clair chaque matin").split(),
    "de": ("der schnelle braune fuchs springt uber den faulen hund wahrend "
           "regen auf grune hugel fallt und flusse zu fernen bergen unter "
           "klarem himmel fliessen jeden morgen gehen leute durch strassen").split(),
    "it": ("la volpe marrone salta sopra il cane pigro mentre la pioggia "
           "cade sulle colline verdi e i fiumi scorrono verso montagne "
           "lontane sotto cieli sereni ogni mattina la gente cammina").split(),
}

# Hiragana block for ja body/ruby text, a kanji slice for bases.
_HIRAGANA = [chr(c) for c in range(0x3042, 0x3094)]
_KANJI = [chr(c) for c in range(0x4E00, 0x4E00 + 512)]
_HANGUL = [chr(0xAC00 + 211 * i) for i in range(52)]


def _ja_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(2, 5))
    return "".join(rng.choice(_HIRAGANA) for _ in range(n))


def _ja_ruby_run(rng: np.random.Generator) -> str:
    """U+FFF9 base(kanji) U+FFFA ruby(hiragana) U+FFFB."""
    nb = int(rng.integers(1, 3))
    base = "".join(rng.choice(_KANJI) for _ in range(nb))
    ruby = "".join(rng.choice(_HIRAGANA) for _ in range(nb + 1))
    return "￹" + base + "￺" + ruby + "￻"


def _ko_word(rng: np.random.Generator) -> str:
    n = int(rng.integers(1, 4))
    return "".join(rng.choice(_HANGUL) for _ in range(n))


def make_text(rng: np.random.Generator, lang: str, n_paras: int,
              with_ruby: bool) -> list[list[str]]:
    """Return paragraphs as lists of lines of golden text.

    Spaces only precede ASCII tokens (latin langs use ' ', ja uses no
    spaces, ko uses ' ') so the raster decode space-reinsertion rule
    (ASCII glyph → ' ', other → '　') round-trips exactly.
    """
    paras: list[list[str]] = []
    for _ in range(n_paras):
        lines: list[str] = []
        for _ in range(int(rng.integers(1, 4))):
            if lang == "ja":
                parts = []
                prev_ruby = False
                for _ in range(int(rng.integers(3, 7))):
                    # never two adjacent ruby runs: the glyph-flag stream
                    # cannot distinguish them (same ambiguity in the
                    # reference subtype bitfield, line_detect.h:8)
                    if with_ruby and not prev_ruby and rng.random() < 0.25:
                        parts.append(_ja_ruby_run(rng))
                        prev_ruby = True
                    else:
                        parts.append(_ja_word(rng))
                        prev_ruby = False
                lines.append("".join(parts) + "。")
            elif lang == "ko":
                words = [_ko_word(rng) for _ in range(int(rng.integers(3, 7)))]
                lines.append(" ".join(words))
            else:
                words = list(rng.choice(_LATIN_WORDS[lang],
                                        size=int(rng.integers(4, 9))))
                lines.append(" ".join(words))
        paras.append(lines)
    return paras


def flat_text(paras: list[list[str]]) -> str:
    return "\n\n".join("\n".join(lines) for lines in paras)


# --- HTML rendering (inverse of functions/html_extract.py) ----------------

def render_html(rng: np.random.Generator, paras: list[list[str]],
                lang: str, url: str) -> bytes:
    """Golden text -> full HTML page. Extraction inverts this exactly."""
    body_lines: list[str] = []
    for lines in paras:
        html_lines = []
        for ln in lines:
            h = ln
            # ruby markers -> <ruby> markup (get_aozora.py:93 inverse)
            h = h.replace("￹", "<ruby><rb>").replace(
                "￺", "</rb><rp>（</rp><rt>").replace(
                "￻", "</rt><rp>）</rp></ruby>")
            # some kanji become gaiji <img> tokens (get_aozora.py:95-98 inverse)
            if lang == "ja" and rng.random() < 0.3:
                chars = list(h)
                kanji_pos = [i for i, c in enumerate(chars)
                             if 0x4E00 <= ord(c) < 0x4E00 + 512]
                if kanji_pos:
                    i = int(rng.choice(kanji_pos))
                    key = gaiji_key(ord(chars[i]))
                    chars[i] = (f'<img src="../../../gaiji/{key.split("-")[0]}'
                                f'/{key}.png" alt="gaiji" class="gaiji">')
                    h = "".join(chars)
            # a single-line note aside, stripped at extraction (get_aozora.py:99)
            if rng.random() < 0.2:
                h += '<span class="notes">［＃注記テスト］</span>'
            html_lines.append(h)
        body_lines.append("<p>" + "<br>".join(html_lines) + "</p>")
    main = "\n".join(body_lines)
    nav = "".join(f'<a href="/p/{int(rng.integers(0, 99))}">link</a>'
                  for _ in range(4))
    doc = (
        "<!DOCTYPE html>\n<html>\n<head>"
        f"<title>doc {url}</title><meta charset=\"utf-8\"></head>\n"
        f"<body>\n<div class=\"header\"><h1>site header</h1>{nav}</div>\n"
        "<div class=\"jisage_1\" style=\"margin-left: 1em\">\n"
        '<div class="main_text">\n'
        f"{main}\n"
        "</div>\n</div>\n"
        '<div class="footer">copyright boilerplate — not content</div>\n'
        "</body>\n</html>\n"
    )
    return doc.encode("utf-8")


def html_golden_text(paras: list[list[str]]) -> str:
    """What extract_main_text yields for render_html output.

    The main div's source is ``\\n{main}\\n`` with paragraphs on separate
    source lines; tag stripping removes <p>/<br> so the lines of one
    paragraph concatenate, and paragraphs stay separated by the source
    newlines."""
    body = ["".join(lines) for lines in paras]
    return "\n" + "\n".join(body) + "\n"


# --- raster layout rendering ----------------------------------------------

GLYPH_H = 32.0          # body glyph height, px
RUBY_H = 16.0           # ruby glyph height
LINE_STEP = 64.0        # baseline-to-baseline distance inside a block
BLOCK_GAP = 160.0       # extra gap between blocks (>> LINE_STEP for grouping)
MARGIN = 48.0


def _glyph_w(ch: str, ruby: bool) -> float:
    if ruby:
        return RUBY_H
    return 16.0 if ord(ch) < 0x80 else GLYPH_H


def _snap(v: float) -> float:
    """Snap to the heatmap grid (4 px) so peak cells are exact."""
    return float(int(round(v / 4.0)) * 4.0)


def make_layout(paras: list[list[str]], vertical: bool) -> dict:
    """Golden text -> layout record (glyphs + seps + textlines).

    Horizontal pages: lines run left→right, blocks stack top→bottom.
    Vertical pages: lines are columns top→bottom, ordered right→left
    (single block). Spaces set the space flag on the next glyph and
    emit no glyph; ruby glyphs sit beside their base run.
    """
    glyphs: list[dict] = []
    textlines: list[dict] = []
    seps: list[dict] = []
    line_id = 0
    max_extent = 0.0

    if not vertical:
        y = MARGIN + GLYPH_H / 2
        for bi, lines in enumerate(paras):
            if bi > 0:
                sep_y = _snap(y - GLYPH_H / 2 - BLOCK_GAP / 2 - LINE_STEP / 2)
                y += 0  # sep drawn in the gap added after previous block
                seps.append({"x1": MARGIN, "y1": sep_y,
                             "x2": MARGIN + 600.0, "y2": sep_y, "v": 1.0})
            for ln in lines:
                x = MARGIN
                pending_space = False
                state = 0  # 0 plain, 1 in base run, 2 in ruby run
                base_start_x = 0.0
                run_base: list[dict] = []
                for ch in ln:
                    if ch in (" ", "　"):
                        pending_space = True
                        x += 16.0 if ch == " " else GLYPH_H
                        continue
                    if ch == "￹":
                        state = 1
                        base_start_x = x
                        run_base = []
                        continue
                    if ch == "￺":
                        state = 2
                        continue
                    if ch == "￻":
                        state = 0
                        run_base = []
                        continue
                    if state == 2:
                        # ruby glyph above the current base run
                        rw = RUBY_H
                        rx = base_start_x + len(run_base) * RUBY_H
                        run_base.append({})
                        glyphs.append({
                            "cx": _snap(rx + rw / 2),
                            "cy": _snap(y - GLYPH_H / 2 - RUBY_H / 2),
                            "w": rw, "h": RUBY_H, "cp": ord(ch),
                            "vertical": 0, "ruby": 1, "rubybase": 0,
                            "space": 0, "emphasis": 0, "line_id": line_id,
                        })
                        continue
                    w = _glyph_w(ch, ruby=False)
                    glyphs.append({
                        "cx": _snap(x + w / 2), "cy": _snap(y),
                        "w": w, "h": GLYPH_H, "cp": ord(ch),
                        "vertical": 0, "ruby": 0,
                        "rubybase": 1 if state == 1 else 0,
                        "space": 1 if pending_space else 0,
                        "emphasis": 0, "line_id": line_id,
                    })
                    pending_space = False
                    x += w
                textlines.append({"line_id": line_id, "vertical": 0,
                                  "x1": MARGIN, "y1": _snap(y),
                                  "x2": _snap(max(x, MARGIN + 8)), "y2": _snap(y)})
                max_extent = max(max_extent, x)
                line_id += 1
                y += LINE_STEP
            y += BLOCK_GAP
        page_w = int(max(768, _snap(max_extent + MARGIN)))
        page_h = int(max(768, _snap(y - LINE_STEP - BLOCK_GAP + MARGIN)))
    else:
        # vertical: single block; columns right→left
        all_lines = [ln for lines in paras for ln in lines]
        n_cols = len(all_lines)
        x = MARGIN + (n_cols - 1) * LINE_STEP + GLYPH_H / 2
        max_y = 0.0
        for ln in all_lines:
            y = MARGIN
            state = 0
            base_start_y = 0.0
            run_count = 0
            pending_space = False
            for ch in ln:
                if ch in (" ", "　"):
                    pending_space = True
                    y += 16.0 if ch == " " else GLYPH_H
                    continue
                if ch == "￹":
                    state = 1
                    base_start_y = y
                    run_count = 0
                    continue
                if ch == "￺":
                    state = 2
                    continue
                if ch == "￻":
                    state = 0
                    continue
                if state == 2:
                    ry = base_start_y + run_count * RUBY_H
                    run_count += 1
                    glyphs.append({
                        "cx": _snap(x + GLYPH_H / 2 + RUBY_H / 2),
                        "cy": _snap(ry + RUBY_H / 2),
                        "w": RUBY_H, "h": RUBY_H, "cp": ord(ch),
                        "vertical": 1, "ruby": 1, "rubybase": 0,
                        "space": 0, "emphasis": 0, "line_id": line_id,
                    })
                    continue
                h = GLYPH_H
                glyphs.append({
                    "cx": _snap(x), "cy": _snap(y + h / 2),
                    "w": GLYPH_H, "h": h, "cp": ord(ch),
                    "vertical": 1, "ruby": 0,
                    "rubybase": 1 if state == 1 else 0,
                    "space": 1 if pending_space else 0,
                    "emphasis": 0, "line_id": line_id,
                })
                pending_space = False
                y += h
            textlines.append({"line_id": line_id, "vertical": 1,
                              "x1": _snap(x), "y1": MARGIN,
                              "x2": _snap(x), "y2": _snap(max(y, MARGIN + 8))})
            max_y = max(max_y, y)
            line_id += 1
            x -= LINE_STEP
        page_w = int(max(768, _snap(MARGIN + n_cols * LINE_STEP + MARGIN)))
        page_h = int(max(768, _snap(max_y + MARGIN)))

    return {"page_w": page_w, "page_h": page_h, "vertical": int(vertical),
            "glyphs": glyphs, "seps": seps, "textlines": textlines}


def raster_golden_text(paras: list[list[str]], vertical: bool) -> str:
    if vertical:
        # single block: all lines joined by '\n'
        return "\n".join(ln for lines in paras for ln in lines)
    return flat_text(paras)


# --- page assembly ---------------------------------------------------------

_DOMAIN_WEIGHTS = 1.0 / np.arange(1, 51)
_DOMAIN_WEIGHTS /= _DOMAIN_WEIGHTS.sum()


def make_page(doc_id: int, seed: int = CORPUS_SEED,
              raster_frac: float = 0.2, pdf_frac: float = 0.1) -> dict:
    """Generate one page row, a pure function of (seed, doc_id).

    ``raster_frac``/``pdf_frac`` shift the kind mix (defaults mirror a web
    corpus: mostly HTML). raster_frac=1.0 gives the compute-representative
    corpus used for the scaling measurement's upper row — with a real CNN
    every page costs detect-level compute, which the cheap surrogate only
    approximates when every page takes the raster path."""
    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + doc_id))
    domain = int(rng.choice(50, p=_DOMAIN_WEIGHTS))
    url = f"https://site{domain:02d}.example.org/doc/{doc_id}"
    ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(doc_id) * 37 % 31_536_000)
    lang = LANGS[int(rng.integers(0, len(LANGS)))]
    roll = rng.random()
    is_raster = roll < raster_frac
    is_pdf = raster_frac <= roll < raster_frac + pdf_frac

    if is_raster:
        vertical = lang == "ja" and rng.random() < 0.4
        n_paras = 1 if vertical else int(rng.integers(1, 4))
        paras = make_text(rng, lang, n_paras, with_ruby=(lang == "ja"))
        layout = make_layout(paras, vertical)
        html = RASTER_MARKER + json.dumps(layout, ensure_ascii=False,
                                          separators=(",", ":")).encode("utf-8")
        text = raster_golden_text(paras, vertical)
        kind = "raster:"
    elif is_pdf:
        from .operators.pdf import render_pdf

        n_paras = int(rng.integers(1, 5))
        paras = make_text(rng, lang, n_paras, with_ruby=(lang == "ja"))
        html = render_pdf(paras, rng)
        text = flat_text(paras)
        kind = "pdf:"
    else:
        n_paras = int(rng.integers(1, 5))
        paras = make_text(rng, lang, n_paras, with_ruby=(lang == "ja"))
        html = render_html(rng, paras, lang, url)
        text = html_golden_text(paras)
        kind = ""

    return {"url": url, "warc_ts": ts, "html": html, "text": text,
            "lang": kind + lang}


def generate_pages(n_docs: int, seed: int = CORPUS_SEED,
                   raster_frac: float = 0.2,
                   pdf_frac: float = 0.1) -> pd.DataFrame:
    rows = [make_page(i, seed, raster_frac, pdf_frac) for i in range(n_docs)]
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def write_pages_parquet(path: str, n_docs: int, seed: int = CORPUS_SEED,
                        n_files: int | None = None,
                        raster_frac: float = 0.2,
                        pdf_frac: float = 0.1) -> None:
    """Write the pages table as a DIRECTORY of part files (driver-side
    helper, no Spark). Many files is the realistic corpus layout — a
    single-file fixture serializes the scan + first shuffle and corrupts
    every scaling measurement downstream of it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if n_files is None:
        n_files = max(8, min(64, n_docs // 1500))
    schema = pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ])
    os.makedirs(path, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    for i, lo in enumerate(range(0, n_docs, per)):
        pdf = generate_pages_range(lo, min(lo + per, n_docs), seed,
                                   raster_frac, pdf_frac)
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            os.path.join(path, f"part-{i:05d}.parquet"))


def generate_pages_range(lo: int, hi: int, seed: int = CORPUS_SEED,
                         raster_frac: float = 0.2,
                         pdf_frac: float = 0.1) -> pd.DataFrame:
    rows = [make_page(i, seed, raster_frac, pdf_frac) for i in range(lo, hi)]
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df
