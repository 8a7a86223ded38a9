from .jobs import (  # noqa: F401
    stream_dedup_exact,
    stream_extract_html,
    stream_extract_warc,
    stream_index_warc,
    stream_quality_windows,
    stream_sessionize,
    stream_welford_by_lang,
)
