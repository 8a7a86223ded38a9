"""URL canonicalization + PII scrub column expressions.

Shared by the oracle-checked registry ops (plans/training_data.py —
``url_canonical_dedup`` / ``pii_scrub``) and the crawl-to-corpus
flagship stages (crawl.py), so the demo query and the pipeline stage
are provably the same rule. Everything here is a pure Column expression
(row-local, zero shuffles, whole-stage-codegen-able); patterns are
engine-portable (Java regex on Spark, RE2 on the DuckDB oracle): plain
character classes and bounded repeats, no lookaround, no ``\\b``.

The Python-side twin of the canonical key is sources/cdx.surt_key,
which additionally SURT-reverses the host for index range locality —
that form sorts index shards; this form dedups corpus rows.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"


def canonical_url_col(url) -> Column:
    """Canonical key for a crawl URL: strip the fragment, drop utm_*
    tracking params (keeping real ones, in order), lowercase scheme and
    host (path case is meaningful and kept). Re-captures of one page
    that differ only in tracking noise collapse to one key."""
    url = F.col(url) if isinstance(url, str) else url
    f = F.substring_index(url, "#", 1)
    base = F.substring_index(f, "?", 1)
    # substring_index(f,'?',-1) returns the WHOLE string when '?' is
    # absent — guard with instr so a query-less URL gets q = ''
    q = F.when(F.instr(f, "?") > 0,
               F.substring_index(f, "?", -1)).otherwise(F.lit(""))
    rest = F.substring_index(base, "://", -1)
    host = F.substring_index(rest, "/", 1)
    kq = F.array_join(
        F.filter(F.split(q, "&"),
                 lambda x: (x != F.lit(""))
                 & ~x.startswith(F.lit("utm_"))), "&")
    return F.concat(
        F.lower(F.substring_index(base, "://", 1)), F.lit("://"),
        F.lower(host),
        rest.substr(F.length(host) + 1, F.length(rest)),
        F.when(kq != "", F.concat(F.lit("?"), kq)).otherwise(F.lit("")))


def scrub_pii_col(text) -> Column:
    """Redact emails then IPv4s to placeholder tokens (emails first, so
    an address-like host part inside an email is covered by <EMAIL>
    rather than split across both placeholders)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>")


def pii_count_col(text, pattern: str) -> Column:
    """Occurrence count of one PII pattern — the audit-log side."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))
