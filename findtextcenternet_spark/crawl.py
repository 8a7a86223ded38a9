"""Crawl → corpus: the end-to-end flagship a real user runs first.

Chains the layers that exist separately into ONE pipeline (VERDICT r5
item 2): CDX-indexed selective fetch (only the addressed archive bytes
move) → resumable lineage-tracked extraction → URL-canonical collapse
(tracking-noise re-captures of one page) → paragraph-grain
boilerplate drop → Gopher-style quality gate (word floor + repetition
ceiling, rejects tagged with a reason) → near-dup transitive cluster
dedup (MinHash LSH → Jaccard verify → connected components, one
canonical keeper per cluster) → per-host cap (deterministic md5-of-url
draw) → PII scrub (emails/IPv4s → placeholders, counted) → WET shards
(the format Common Crawl publishes extracted text in).

Reference analogue: the repo's own training-data harvest loop
(train_data3/make_data.py and get_aozora.py — fetch, extract, save) is
the single-machine form of exactly this flow; it has no index, no dedup
and no resume, which is what corpus scale adds here.

Scale shape, stage by stage at 100 TB:
* index fetch moves ~0.01-1% of archive bytes (range GETs), banded so a
  hot archive never becomes a straggler (sources/cdx.py);
* extraction is the ONE-exchange mapInPandas kernel with lineage resume
  (lineage.run_extract) — a re-invocation extracts only missing urls;
* dedup shuffles md5 fingerprints and band keys, never document text,
  and the cluster step is O(log n) rounds (operators/cc.py);
* the WET sink writes one shard per partition with no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .lineage import run_extract
from .operators.cc import connected_components
from .plans.training_data import (
    drop_repeated_paragraphs,
    lsh_verified_pairs_df,
)


def near_dup_clusters(docs: DataFrame, id_col: str = "url",
                      text_col: str = "text",
                      threshold: float = 0.5) -> DataFrame:
    """(id, text, ...) → ``(url, keeper, cluster_size)`` — one row per
    doc that belongs to a transitive near-dup cluster, keeper = the
    cluster's lexicographic-min id. Ids are used directly as graph node
    labels (no hash-to-long step, no collision risk)."""
    ids = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(text_col).alias("text"))
    pairs = lsh_verified_pairs_df(ids, threshold=threshold)
    return (connected_components(pairs)
            .select(F.col("doc_id").alias(id_col),
                    F.col("cluster_keeper").alias("keeper"),
                    "cluster_size"))


def near_dup_filter(docs: DataFrame, id_col: str = "url",
                    text_col: str = "text", threshold: float = 0.5,
                    keep_best: bool = False
                    ) -> tuple[DataFrame, DataFrame]:
    """(kept_docs, clusters): drop every cluster member except its
    keeper; docs outside any cluster pass through untouched. The drop
    set is an anti-join on the id — text never shuffles twice.

    ``keep_best=True`` keeps the cluster member with the MOST tokens
    (tie → min id) instead of the min-id member: the full article
    survives, the truncated syndication copy is dropped
    (plans.training_data.keep_best_per_cluster, the `dedup_keep_best`
    registry op)."""
    clusters = near_dup_clusters(docs, id_col, text_col, threshold)
    if keep_best:
        from .plans.training_data import keep_best_per_cluster

        lab = clusters.select(id_col,
                              F.col("keeper").alias("cluster_keeper"))
        decision = keep_best_per_cluster(
            docs.select(F.col(id_col), F.col(text_col).alias("text")),
            lab, id_col=id_col, include_singletons=False)
        # re-key the cluster report on the quality keeper so the summary
        # counts describe the doc that actually survives
        clusters = (decision
                    .join(clusters.select(id_col, "cluster_size"), id_col)
                    .select(id_col, F.col("best_doc").alias("keeper"),
                            "cluster_size"))
    losers = (clusters.filter(F.col(id_col) != F.col("keeper"))
              .select(id_col))
    return docs.join(losers, id_col, "left_anti"), clusters


# Scripts written without word separators (kana, unified ideographs and
# compat forms, hangul syllables): for these, characters stand in for
# words in the quality floor — a whitespace split would count a whole
# Japanese paragraph as one "word" and gate perfectly good pages.
_CJK_CLASS = ("\u3040-\u30FF\u3400-\u4DBF\u4E00-\u9FFF"
              "\uF900-\uFAFF\uAC00-\uD7A3")


def effective_word_count(text_col) -> "F.Column":
    """Script-aware word count: whitespace-delimited tokens (any
    whitespace incl. the ideographic space U+3000) plus one word per
    CJK character. CJK runs also count once as a token — at the floor's
    5-word granularity the overlap is immaterial, and the estimate only
    needs to be conservative in the KEEP direction."""
    toks = F.filter(F.split(text_col, "[\\s　]+"),
                    lambda t: t != F.lit(""))
    cjk = F.length(F.regexp_replace(
        text_col, f"[^{_CJK_CLASS}]", ""))
    return F.size(toks) + cjk


def quality_gate_filter(docs: DataFrame, id_col: str = "url",
                        text_col: str = "text", min_words: int = 5,
                        max_top_bigram_frac: float = 0.2
                        ) -> tuple[DataFrame, DataFrame]:
    """(kept_docs, rejected): Gopher-style quality gate over any
    (id, text) frame — drop docs below a word-count floor or above a
    repetition ceiling (fraction of characters in the most frequent word
    bigram, :func:`repetition_stats_df`). The word floor is a row-local
    predicate and script-aware (:func:`effective_word_count`, so
    spaceless CJK pages are measured by characters, not whitespace);
    the repetition side joins only (id, frac) metadata back, so document
    text crosses the wire once at most (and the rejected frame carries
    a ``reason`` for auditability)."""
    from .plans.training_data import repetition_stats_df

    too_short = effective_word_count(F.col(text_col)) < min_words
    rep = repetition_stats_df(docs.filter(~too_short), id_col=id_col,
                              text_col=text_col)
    too_repetitive = (rep.filter(F.col("top_bigram_frac")
                                 > max_top_bigram_frac)
                      .select(id_col))
    short = (docs.filter(too_short)
             .select(id_col, F.lit("too_short").alias("reason")))
    repet = too_repetitive.select(
        id_col, F.lit("too_repetitive").alias("reason"))
    kept = (docs.filter(~too_short)
            .join(too_repetitive, id_col, "left_anti"))
    return kept, short.unionByName(repet)


def apply_quality_gate(docs: DataFrame, id_col: str = "url",
                       text_col: str = "text", min_words: int = 5,
                       max_top_bigram_frac: float = 0.2) -> DataFrame:
    """Schema-preserving form of :func:`quality_gate_filter`: rejected
    docs come back with ``error = 'quality:<reason>'`` instead of being
    dropped — the pipeline's quarantine idiom (pipeline.DOC_SCHEMA), so
    the gate composes with any sink that already routes error rows,
    including the streaming foreachBatch path where a dropped row would
    silently vanish from the effectively-once output."""
    clean = docs.filter(F.col("error").isNull())
    errs = docs.filter(F.col("error").isNotNull())
    kept, rejected = quality_gate_filter(
        clean, id_col=id_col, text_col=text_col, min_words=min_words,
        max_top_bigram_frac=max_top_bigram_frac)
    marked = (clean.drop("error")
              .join(rejected, id_col)
              .withColumn("error", F.concat(F.lit("quality:"),
                                            F.col("reason")))
              .drop("reason"))
    return (kept.unionByName(marked.select(*kept.columns))
            .unionByName(errs))


def url_canon_filter(docs: DataFrame, id_col: str = "url"
                     ) -> tuple[DataFrame, DataFrame]:
    """(kept_docs, collapsed): collapse re-captures of the same
    canonical URL (fragment/utm_*-noise variants of one page,
    functions/urlnorm.canonical_url_col) to the lexicographic-min id.
    Scale shape like host_cap_filter: the min-per-key agg runs over
    PROJECTED (id, canon) metadata only — one 16-byte-row shuffle —
    and survivors semi-join back; text never enters the exchange."""
    from .functions.urlnorm import canonical_url_col

    meta = docs.select(F.col(id_col),
                       canonical_url_col(F.col(id_col)).alias("_canon"))
    keep = (meta.groupBy("_canon")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col))
    collapsed = meta.join(keep, id_col, "left_anti").select(id_col)
    return docs.join(keep, id_col, "left_semi"), collapsed


def pii_scrub_docs(docs: DataFrame, text_col: str = "text"
                   ) -> tuple[DataFrame, DataFrame]:
    """(scrubbed_docs, audit): redact emails/IPv4s in the text column
    (functions/urlnorm.scrub_pii_col, schema unchanged); ``audit`` is a
    one-row (n_redactions) frame aggregated from the pre-scrub text for
    the summary. Pure row-local map — zero shuffles at any corpus
    size (the audit agg is a map-side partial sum)."""
    from .functions.urlnorm import (
        EMAIL_RE,
        IPV4_RE,
        pii_count_col,
        scrub_pii_col,
    )

    audit = docs.agg(F.sum(
        pii_count_col(F.col(text_col), EMAIL_RE)
        + pii_count_col(F.col(text_col), IPV4_RE)
    ).alias("n_redactions"))
    return docs.withColumn(text_col,
                           scrub_pii_col(F.col(text_col))), audit


def host_cap_filter(docs: DataFrame, cap: int, id_col: str = "url",
                    ) -> DataFrame:
    """Keep at most ``cap`` docs per host, drawn by md5-of-id order
    (deterministic, rerunnable — no rand()): the guard against one viral
    or boilerplate-heavy site dominating the corpus mix. Host =
    parse_url(url, 'HOST'); scheme-less or unparseable ids fall back to
    the id itself (each its own singleton "host", never dropped by the
    cap). Scale shape: the window runs over PROJECTED (id, host)
    metadata only — document text never enters the window sort's
    exchange — and the surviving ids semi-join back (broadcast when they
    fit). One host-partitioned window, no global sort; a hot host is
    one big partition of 16-byte rows, not of documents."""
    from pyspark.sql.window import Window

    host = F.coalesce(F.expr(f"parse_url({id_col}, 'HOST')"),
                      F.col(id_col))
    w = Window.partitionBy("_host").orderBy(
        F.md5(F.encode(F.col(id_col).cast("string"), "utf-8")))
    keep = (docs.select(F.col(id_col), host.alias("_host"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .select(id_col))
    return docs.join(keep, id_col, "left_semi")


def crawl_to_corpus(spark: SparkSession, input_path: str, out_dir: str, *,
                    input_format: str = "warc",
                    wet_dir: str | None = None,
                    cdx_mime: str | None = None,
                    cdx_prefix: str | None = None,
                    cdx_diff_old: str | None = None,
                    near_dedup: bool = True,
                    near_dedup_keep_best: bool = False,
                    para_dedup_max: int | None = None,
                    quality_gate: bool = False,
                    host_cap: int | None = None,
                    url_canon: bool = False,
                    pii_scrub: bool = False,
                    num_partitions: int | None = None,
                    run_id: str | None = None,
                    store=None) -> dict:
    """One invocation from crawl archives (or a CDX index) to a deduped
    WET corpus. Returns a summary dict.

    ``input_format='warc'``: full archive walk. ``'cdx'``: index-driven —
    prune by mime/prefix, collapse re-captures to the newest entry per
    payload digest, then range-fetch only the selected records.

    Extraction goes through ``lineage.run_extract`` (same OUT_DIR →
    resume; poison pages → quarantine). Dedup then runs over the WHOLE
    extracted store (not just this run's docs), so an incremental crawl
    re-dedups against everything already extracted — exactly what a
    rolling training-data pipeline needs.
    """
    if input_format == "warc":
        from .sources.warc import read_warc

        pages = read_warc(spark, input_path).drop("error")
    elif input_format == "cdx":
        from .sources.cdx import (
            fetch_cdx_records,
            latest_unique_captures,
            read_cdxj,
        )

        idx = read_cdxj(spark, input_path)
        if cdx_mime:
            idx = idx.filter(F.col("mime") == cdx_mime)
        if cdx_prefix:
            idx = idx.filter(F.col("urlkey").startswith(cdx_prefix))
        if cdx_diff_old:
            # incremental re-crawl: judge THIS index against the previous
            # snapshot and fetch only urls whose content is new or
            # changed — unchanged bytes never leave the archive (resume
            # dedups at the extraction grain; this saves the FETCH)
            from .sources.cdx import diff_cdx_snapshots

            changed = (diff_cdx_snapshots(read_cdxj(spark, cdx_diff_old),
                                          idx)
                       .filter(F.col("status").isin("new", "changed"))
                       .select("urlkey"))
            idx = idx.join(changed, "urlkey", "left_semi")
        idx = latest_unique_captures(idx)
        pages = fetch_cdx_records(spark, idx).drop("error")
    else:
        pages = spark.read.parquet(input_path)

    from .lineage import ParquetDirStore

    store = store or ParquetDirStore(spark, out_dir)
    summary = run_extract(pages, out_dir, run_id=run_id,
                          num_partitions=num_partitions, store=store)
    summary = {**summary, "near_dup_clustered": 0, "near_dup_dropped": 0,
               "paragraphs_dropped": 0, "quality_rejected": 0,
               "host_capped": 0, "url_collapsed": 0, "pii_redactions": 0}

    # an input filter can legitimately select NOTHING (e.g. a mime with
    # no captures) — an empty store has no post-passes to run
    if not store.docs_nonempty():
        summary["wet_shards"] = summary["wet_records"] = 0
        return summary

    # corpus-wide post-passes read the WHOLE committed store through the
    # storage seam (snapshot read on a catalog, dir read on parquet)
    docs = (store.read_docs()
            .filter(F.col("error").isNull())
            .select("url", "text"))

    if url_canon:
        # FIRST post-pass: collapse tracking-noise re-captures of one
        # page before any content pass spends work on them
        docs, collapsed = url_canon_filter(docs)
        summary["url_collapsed"] = collapsed.count()

    if para_dedup_max is not None:
        cleaned = drop_repeated_paragraphs(docs, id_col="url",
                                           max_count=para_dedup_max)
        docs = (cleaned.filter(F.col("clean_text").isNotNull())
                .select("url", F.col("clean_text").alias("text")))
        # pin the cleaned frame: the n_dropped agg, the LSH/cluster pass
        # and the WET write would otherwise each re-run the corpus-wide
        # paragraph pass — three full passes over the store
        docs = docs.persist()
        summary["paragraphs_dropped"] = int(
            cleaned.agg(F.sum("n_dropped")).collect()[0][0] or 0)
    else:
        docs = docs.persist()
    pins = [docs]

    try:
        if quality_gate:
            # gate AFTER the boilerplate drop (repetition is measured on
            # the text that would actually be trained on)
            docs, rejected = quality_gate_filter(docs)
            summary["quality_rejected"] = rejected.count()

        if near_dedup:
            docs, clusters = near_dup_filter(
                docs, keep_best=near_dedup_keep_best)
            stats = clusters.agg(
                F.count("*").alias("n"),
                F.sum((F.col("url") != F.col("keeper")).cast("long"))
                .alias("drop")).collect()[0]
            summary["near_dup_clustered"] = int(stats["n"])
            summary["near_dup_dropped"] = int(stats["drop"] or 0)

        if host_cap is not None:
            # pin: the before/after counts and the WET write would each
            # re-run the upstream gate+dedup chain otherwise
            docs = docs.persist()
            pins.append(docs)
            before = docs.count()
            docs = host_cap_filter(docs, host_cap)
            summary["host_capped"] = before - docs.count()

        if pii_scrub:
            # LAST content pass, right before the sink: redaction must
            # not perturb the dedup fingerprints computed upstream
            docs, audit = pii_scrub_docs(docs)
            summary["pii_redactions"] = int(
                audit.collect()[0]["n_redactions"] or 0)

        if wet_dir is not None:
            from .sources.warc import write_wet

            manifest = write_wet(docs, wet_dir).collect()
            summary["wet_shards"] = len(manifest)
            summary["wet_records"] = sum(r.n_records for r in manifest)
        else:
            summary["corpus_docs"] = docs.count()
    finally:
        for p in pins:
            p.unpersist()
    return summary
