"""Curated driver-facing registry: every operator, ≤50 entries.

The driver's CORRECTNESS artifact records at most 50 ``queries()`` entries
per round; the full registry has 88. For two rounds the overflow (the
dedup/ANN/LLM-data ops and the pipeline entries) silently missed the hard
gate (VERDICT r2 'next round' item 1). This module folds near-duplicate
relational demos into merged entries — each merged query UNIONs its legs
into a common generic schema ``(part, k1..kK string, v1..vV double)`` with
the leg name as the ``part`` tag, and its oracle UNION ALLs the legs' SQL
with identical casts — so every leg's full row set stays hash-checked
while the entry count drops to exactly 50 (46 here + 4 pipeline entries
added by ``__spark_entry__``).

Casting discipline (both engines must render values identically):
keys/ints/booleans → string ('true'/'false' in Spark and DuckDB alike;
int → decimal digits alike); floats → double, already rounded by the leg
queries. Doubles are NEVER cast to string (formatting differs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from .registry_core import SparkQuery

# per-leg output column spec: ("col", "s"|"d") — "s" cast to string (keys,
# ints, booleans), "d" cast to double (floats, counts)
LEGS: dict[str, list[tuple[str, str]]] = {
    "p4_threshold_filter": [("l_orderkey", "s"), ("l_linenumber", "s"),
                            ("l_quantity", "d")],
    "t1_threshold_scan": [("l_returnflag", "s"), ("l_orderkey", "s"),
                          ("l_linenumber", "s"), ("rnk", "d")],
    "p8_flag_threshold": [("l_returnflag", "s"), ("n_ruby", "d"),
                          ("n_space", "d"), ("n", "d")],
    "p9_min_chain_filter": [("o_orderkey", "s"), ("o_custkey", "s")],
    "a1_overlap_max": [("user_id", "s"), ("event_type", "s"),
                       ("max_value", "d")],
    "a2_neighborhood_max": [("event_id", "s"), ("user_id", "s"),
                            ("nbr_max", "d")],
    "a3_median": [("l_returnflag", "s"), ("med_price", "d"),
                  ("th_hist", "d")],
    "a15_welford_stats": [("event_type", "s"), ("mean_v", "d"),
                          ("std_v", "d"), ("n", "d")],
    "a4_chain_extrema": [("chain", "s"), ("max_w", "d"), ("max_h", "d"),
                         ("n_boxes", "d")],
    "a8_block_bbox": [("block", "s"), ("x1", "d"), ("x2", "d"),
                      ("y1", "d"), ("y2", "d"), ("n", "d")],
    "a5_weighted_endpoint_mean": [("l_orderkey", "s"), ("anchor", "d")],
    "a7_mean_gap": [("l_suppkey", "s"), ("mean_gap", "d")],
    "a9_orientation_vote": [("o_custkey", "s"), ("vote", "d")],
    "a14_dense_rank": [("c_custkey", "s"), ("c_nationkey", "s"),
                       ("rnk", "d")],
    "w4_peak_ranking": [("l_orderkey", "s"), ("l_linenumber", "s"),
                        ("peak_score", "d")],
    "t2_topk_per_group": [("o_custkey", "s"), ("o_orderkey", "s"),
                          ("price", "d")],
    "w6_lag_gap_check": [("user_id", "s"), ("event_id", "s"), ("dv", "d")],
    "j6_asof_next_line": [("o_custkey", "s"), ("o_orderkey", "s"),
                          ("next_order", "s"), ("wait_s", "d")],
    "j1_range_join": [("bucket", "s"), ("n", "d"), ("sum_price", "d")],
    "j5_distance_join": [("probe_id", "s"), ("n_near", "d")],
    "u1_union_dedup": [("custkey", "s")],
    "u2_anti_join": [("c_custkey", "s"), ("c_nationkey", "s")],
    "u3_union_all": [("src", "s"), ("n", "d")],
    "f2_crt_reconstruct": [("x", "s"), ("b0", "s"), ("b1", "s"),
                           ("b2", "s"), ("recon", "s")],
    "f3_codepoint_guard": [("cp", "s"), ("cp_safe", "s")],
    "f4_ruby_decode": [("doc_id", "s"), ("aozora", "s")],
    "f5_ruby_html_encode": [("doc_id", "s"), ("html_ruby", "s")],
    "f7_space_normalize": [("doc_id", "s"), ("norm_text", "s")],
    "f9_utf32_codepoints": [("doc_id", "s"), ("cp_head", "s")],
    "f6_whitespace_classify": [("doc_id", "s"), ("n_ascii_space", "d"),
                               ("n_other_space", "d")],
    "f8_script_class": [("doc_id", "s"), ("has_ascii", "s"),
                        ("has_cjk", "s"), ("has_hangul", "s")],
    "dedup_lsh_verified": [("doc_a", "s"), ("doc_b", "s"),
                           ("jaccard", "d")],
    "dedup_clusters": [("doc_id", "s"), ("cluster_keeper", "s"),
                       ("cluster_size", "d")],
    "dedup_keep_best": [("doc_id", "s"), ("cluster_keeper", "s"),
                        ("best_doc", "s"), ("keep", "s")],
    "dedup_exact": [("fp", "s"), ("keeper", "s"), ("n_dups", "d")],
    "dedup_paragraph": [("doc_id", "s"), ("clean_text", "s"),
                        ("n_dropped", "d")],
    "curation_filter": [("doc_id", "s"), ("lang", "s"), ("n_chars", "d")],
    "ngram_frequent": [("gram", "s"), ("n", "d")],
    "decontaminate_ngram": [("doc_id", "s"), ("n_chars", "d")],
    "stratified_sample_by_lang": [("doc_id", "s"), ("lang", "s")],
    "gopher_repetition": [("doc_id", "s"), ("top_bigram_frac", "d"),
                          ("dup_bigram_frac", "d")],
    "domain_stats": [("source", "s"), ("n_docs", "d"), ("n_tokens", "d"),
                     ("avg_chars", "d")],
    "domain_cap": [("doc_id", "s"), ("source", "s")],
    "window_dedup": [("doc_id", "s"), ("n_shared_windows", "d")],
    "pack_sequences": [("source", "s"), ("bin", "s"), ("n_docs", "d"),
                       ("bin_tokens", "d")],
    "tfidf_top_terms": [("doc_id", "s"), ("term", "s"), ("score", "d")],
    "lang_mix_weights": [("lang", "s"), ("n_docs", "d"), ("n_tokens", "d"),
                         ("token_share", "d"), ("resample_weight", "d")],
    "curation_e2e": [("source", "s"), ("bin", "s"), ("n_docs", "d"),
                     ("bin_tokens", "d")],
    "pii_scrub": [("doc_id", "s"), ("n_emails", "d"), ("n_ipv4", "d"),
                  ("scrub_tail", "s")],
    "kmv_distinct_tokens": [("source", "s"), ("n_exact", "d"),
                            ("kmv_est", "d")],
    "url_canonical_dedup": [("canon_url", "s"), ("n", "d"),
                            ("first_doc", "s")],
    "a10_rollup_bbox": [("o_custkey", "s"), ("o_orderkey", "s"),
                        ("x1", "d"), ("x2", "d"), ("n", "d")],
    "a12_cluster_prune": [("event_id", "s"), ("user_id", "s")],
    "link_host_graph": [("src_host", "s"), ("dst_host", "s"),
                        ("n_links", "d")],
    "host_degree": [("host", "s"), ("out_deg", "d"), ("n_out", "d"),
                    ("in_deg", "d"), ("n_in", "d")],
    "host_pagerank": [("host", "s"), ("pagerank", "d")],
    "host_hits": [("host", "s"), ("hub", "d"), ("auth", "d")],
    "host_anchor_terms": [("dst_host", "s"), ("term", "s"),
                          ("n", "d"), ("rk", "d")],
    "dsir_weights": [("doc_id", "s"), ("n_tokens", "d"),
                     ("dsir_logw", "d")],
    "doc_fingerprint": [("doc_id", "s"), ("fp", "s"), ("n_bytes", "d")],
    # rhash is a full-range int64 — a double cast would lose precision
    # above 2^53, so it rides as a string
    "doc_rolling_hash": [("doc_id", "s"), ("rhash", "s")],
}

# merged entry name → leg names (each leg keeps full-row hash coverage)
MERGES: list[tuple[str, list[str]]] = [
    ("p4_t1_threshold_rank", ["p4_threshold_filter", "t1_threshold_scan"]),
    ("p8_p9_flag_chain_filters", ["p8_flag_threshold",
                                  "p9_min_chain_filter"]),
    ("a1_a2_neighborhood_max", ["a1_overlap_max", "a2_neighborhood_max"]),
    ("a3_a15_group_stats", ["a3_median", "a15_welford_stats"]),
    ("a4_a8_extrema_bbox", ["a4_chain_extrema", "a8_block_bbox"]),
    ("a5_a7_endpoint_gap", ["a5_weighted_endpoint_mean", "a7_mean_gap"]),
    ("a9_a14_vote_rank", ["a9_orientation_vote", "a14_dense_rank"]),
    ("w4_t2_peak_topk", ["w4_peak_ranking", "t2_topk_per_group"]),
    ("w6_j6_lag_asof", ["w6_lag_gap_check", "j6_asof_next_line"]),
    ("j1_j5_spatial_joins", ["j1_range_join", "j5_distance_join"]),
    ("u1_u2_u3_set_ops", ["u1_union_dedup", "u2_anti_join",
                          "u3_union_all"]),
    ("f2_f3_codepoint_math", ["f2_crt_reconstruct", "f3_codepoint_guard"]),
    # r6: f6/f8 folded in here to free one driver slot for the crawl
    # pipeline entry (each leg keeps its full-row hash coverage)
    ("f4_f9_text_charclass", ["f4_ruby_decode", "f5_ruby_html_encode",
                              "f7_space_normalize", "f9_utf32_codepoints",
                              "f6_whitespace_classify", "f8_script_class"]),
    # r6: the near-dup finish line — LSH-verified pairs + their transitive
    # clusters; and exact dedup + paragraph-grain dedup
    ("dedup_pairs_clusters", ["dedup_lsh_verified", "dedup_clusters",
                              # r6: quality-aware keeper selection — the
                              # corpus-level keep/drop decision table
                              "dedup_keep_best"]),
    # r6: window_dedup rides with the other whole/part-doc dedup grains
    # (exact, paragraph, cross-doc 8-word windows)
    ("dedup_exact_paragraph", ["dedup_exact", "dedup_paragraph",
                               "window_dedup"]),
    # r6: the corpus-curation set (C4-style gate, frequent n-grams,
    # benchmark decontamination, stratified sampling, Gopher repetition
    # gate, per-domain stats + cap, sequence packing, tf-idf top terms,
    # data-mix weights) and the two fingerprint demos, folded so the
    # window stays at 50
    ("corpus_curation_ops", ["curation_filter", "ngram_frequent",
                             "decontaminate_ngram",
                             "stratified_sample_by_lang",
                             "gopher_repetition", "domain_stats",
                             "domain_cap", "pack_sequences",
                             "tfidf_top_terms", "lang_mix_weights",
                             "curation_e2e",
                             # r6: PII redaction, crawl URL
                             # canonicalization and the KMV cardinality
                             # sketch ride in the same slot
                             "pii_scrub", "url_canonical_dedup",
                             "kmv_distinct_tokens",
                             # r6: DSIR importance-resampling weights —
                             # data selection is a curation op
                             "dsir_weights"]),
    ("doc_fingerprints", ["doc_fingerprint", "doc_rolling_hash"]),
    # r6: two rollup/prune relational demos fold into one slot to make
    # room for the webgraph entry below (window stays at 46+4)
    ("a10_a12_rollup_prune", ["a10_rollup_bbox", "a12_cluster_prune"]),
    # r6: host-graph layer — weighted edge derivation, fan-in/out
    # degrees, the 5-round PageRank power iteration, and HITS
    # hub/authority scores
    ("webgraph_ops", ["link_host_graph", "host_degree",
                      "host_pagerank", "host_hits",
                      # r6: anchor-text top terms per target host
                      "host_anchor_terms"]),
]


def _shape(leg_names: list[str]) -> tuple[int, int]:
    max_s = max(sum(1 for _, k in LEGS[n] if k == "s") for n in leg_names)
    max_d = max(sum(1 for _, k in LEGS[n] if k == "d") for n in leg_names)
    return max_s, max_d


def _mk_spark_fn(leg_names: list[str], base) -> SparkQuery:
    max_s, max_d = _shape(leg_names)

    def fn(spark, sf_dir):
        frames = []
        for leg in leg_names:
            df = base[leg][0](spark, sf_dir)
            spec = LEGS[leg]
            s_cols = [c for c, k in spec if k == "s"]
            d_cols = [c for c, k in spec if k == "d"]
            sel = [F.lit(leg).alias("part")]
            for i in range(max_s):
                col = (F.col(s_cols[i]).cast("string") if i < len(s_cols)
                       else F.lit(None).cast("string"))
                sel.append(col.alias(f"k{i + 1}"))
            for i in range(max_d):
                col = (F.col(d_cols[i]).cast("double") if i < len(d_cols)
                       else F.lit(None).cast("double"))
                sel.append(col.alias(f"v{i + 1}"))
            frames.append(df.select(*sel))
        return reduce(lambda a, b: a.unionByName(b), frames)

    return fn


def _mk_sql(leg_names: list[str], base) -> str:
    max_s, max_d = _shape(leg_names)
    parts = []
    for leg in leg_names:
        sql = base[leg][1]
        spec = LEGS[leg]
        s_cols = [c for c, k in spec if k == "s"]
        d_cols = [c for c, k in spec if k == "d"]
        sel = [f"'{leg}' AS part"]
        for i in range(max_s):
            expr = (f"CAST({s_cols[i]} AS VARCHAR)" if i < len(s_cols)
                    else "CAST(NULL AS VARCHAR)")
            sel.append(f"{expr} AS k{i + 1}")
        for i in range(max_d):
            expr = (f"CAST({d_cols[i]} AS DOUBLE)" if i < len(d_cols)
                    else "CAST(NULL AS DOUBLE)")
            sel.append(f"{expr} AS v{i + 1}")
        parts.append(f"SELECT {', '.join(sel)} FROM (\n{sql}\n)")
    return "\nUNION ALL\n".join(parts)


def curated_registry():
    """Full operator coverage in 46 entries (+4 pipeline = the driver's
    50-row window): merged relational demos + standalone relational +
    multimodal + training-data ops."""
    from . import full_registry

    base = full_registry()
    absorbed = {leg for _, legs in MERGES for leg in legs}
    out = {}
    for name, legs in MERGES:
        out[name] = (_mk_spark_fn(legs, base), _mk_sql(legs, base))
    for name, entry in base.items():
        if name not in absorbed:
            out[name] = entry
    return out
