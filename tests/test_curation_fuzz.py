"""Adversarial-text parity fuzz for the corpus-curation ops.

The sf0.01 oracle corpus is well-formed prose; these ops' engine-parity
risk lives in the edges — empty strings, consecutive/leading spaces
(split(' ') emits empty tokens in BOTH engines, but only if both are fed
the same), unicode, single-word and repeated-word docs. This test writes
a seeded adversarial documents table, runs every curation-family Spark
query against its own DuckDB oracle SQL on that table, and requires the
same canonicalized row multiset — the check_oracle.py compare, off the
happy-path corpus."""

import duckdb
import numpy as np
import pandas as pd
import pytest

# every oracle-checked registry entry whose SQL reads ONLY the documents
# table (tests/test_curation_fuzz.py asserts this list is exhaustive)
OPS = [
    "curation_e2e", "curation_filter", "decontaminate_ngram",
    "dedup_clusters", "dedup_exact", "dedup_keep_best",
    "dedup_lsh_verified",
    "dedup_minhash_lsh", "dedup_minhash_signature", "dedup_ngram_jaccard",
    "dedup_paragraph", "dedup_simhash", "doc_fingerprint",
    "doc_rolling_hash", "domain_cap", "domain_stats", "dsir_weights",
    "host_anchor_terms",
    "host_degree", "host_hits", "host_pagerank", "link_host_graph",
    "f4_ruby_decode",
    "f5_ruby_html_encode", "f6_whitespace_classify", "f7_space_normalize",
    "f8_script_class", "f9_utf32_codepoints", "gopher_repetition",
    "kmv_distinct_tokens", "lang_id", "lang_mix_weights",
    "ngram_frequent", "pack_sequences",
    "pii_scrub", "quality_score", "stratified_sample_by_lang",
    "tfidf_top_terms", "token_count_bpe", "token_count_total",
    "url_canonical_dedup", "window_dedup",
]


def test_ops_list_is_exhaustive():
    """OPS must track the registry: every oracle-checked entry reading
    only the documents table is fuzzed here."""
    import re

    from findtextcenternet_spark.plans import full_registry

    others = ("region nation customer supplier part orders lineitem "
              "events embeddings").split()
    expect = sorted(
        name for name, (_fn, sql) in full_registry().items()
        if sql and "documents" in sql
        and not any(re.search(rf"\b{t}\b", sql) for t in others))
    assert sorted(OPS) == expect


def _adversarial_docs(seed: int = 7, n: int = 120) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = ["the", "data", "spark", "Ünïcøde", "文字", "a", "--", "x1",
             "spark", "the"]
    rows = []
    for i in range(n):
        kind = i % 8
        if kind == 0:
            text = ""
        elif kind == 1:
            text = "solo"
        elif kind == 2:
            text = "double  space   run"          # empty tokens
        elif kind == 3:
            text = " leading and trailing "        # edge empties
        elif kind == 4:
            text = " ".join(["rep"] * int(rng.integers(2, 40)))
        elif kind == 5:
            text = " ".join(rng.choice(vocab, int(rng.integers(4, 60))))
        elif kind == 6:                            # near-dup pair fodder
            text = "shared shingle body " * 9 + f"tail{i % 3}"
        else:
            text = " ".join(rng.choice(vocab, 25)) + "\n\n" + \
                " ".join(rng.choice(vocab, 25))
        rows.append((i, text, ["en", "fr", "zh"][i % 3],
                     f"s{i % 4}", len(text)))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzzdocs")
    pdf = _adversarial_docs()
    spark.createDataFrame(pdf).repartition(3).write.parquet(
        str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", OPS)
def test_curation_parity_on_adversarial_texts(spark, fuzz_dir, name):
    import sys
    sys.path.insert(0, "scripts")
    from check_oracle import canon

    from findtextcenternet_spark.plans import full_registry

    fn, sql = full_registry()[name]
    got = canon(fn(spark, fuzz_dir).toPandas())
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{fuzz_dir}/documents.parquet/*.parquet'")
    want = canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, atol=1e-6)


def test_pii_scrub_semantics(spark, fuzz_dir):
    """The scrub replaces every planted email/IP with its placeholder
    (counts agree with what was planted) and never touches clean docs."""
    from findtextcenternet_spark.plans import full_registry

    fn, _ = full_registry()["pii_scrub"]
    got = fn(spark, fuzz_dir).toPandas().set_index("doc_id")
    for doc_id, row in got.iterrows():
        if doc_id % 3 == 0:
            assert row["n_emails"] == 1 and row["n_ipv4"] == 0
            assert "<EMAIL>" in row["scrub_tail"]
            assert "@" not in row["scrub_tail"]
        elif doc_id % 3 == 1:
            assert row["n_ipv4"] == 1 and row["n_emails"] == 0
            assert "<IP>" in row["scrub_tail"]
        else:
            assert row["n_emails"] == 0 and row["n_ipv4"] == 0
            assert "<EMAIL>" not in row["scrub_tail"]
            assert "<IP>" not in row["scrub_tail"]


def test_url_canonical_semantics(spark, fuzz_dir):
    """Canonicalization rules, pinned: scheme+host lowercased, path case
    kept, fragment stripped, utm_* dropped, real params kept (so docs
    differing only in tracking noise collapse; docs with different id=
    params do not)."""
    from findtextcenternet_spark.plans import full_registry

    fn, _ = full_registry()["url_canonical_dedup"]
    got = fn(spark, fuzz_dir).toPandas()
    urls = list(got["canon_url"])
    assert all(u.startswith("https://www.") for u in urls)
    assert all("#" not in u and "utm_" not in u for u in urls)
    # path case preserved (host lowered, path untouched)
    assert all("/P/" in u for u in urls)
    # even doc_ids keep their real id= param; odd ones have no query
    assert any("?id=" in u for u in urls)
    # the same (source, path, id) triple collapses multiple docs
    assert (got["n"] > 1).any()
    # every doc is accounted for exactly once
    assert int(got["n"].sum()) == 120


def test_kmv_estimate_accuracy(spark, tmp_path):
    """KMV sanity on a corpus with known cardinality: the estimate for a
    group with ≥ k distinct tokens lands within the sketch's standard
    error envelope (~1/sqrt(k-2) ≈ 13% at k=64; assert 3σ), and a group
    below k reports the exact count."""
    import os

    rng = np.random.default_rng(11)
    rows = []
    # group "big": 5000 distinct tokens; group "small": 20 distinct
    for i in range(200):
        toks = [f"tok{v}" for v in rng.integers(0, 5000, 60)]
        rows.append((i, " ".join(toks), "en", "big", 0))
    for i in range(200, 240):
        toks = [f"t{v}" for v in rng.integers(0, 20, 30)]
        rows.append((i, " ".join(toks), "en", "small", 0))
    d = str(tmp_path / "docs")
    os.makedirs(d)
    pd.DataFrame(rows, columns=[
        "doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
        os.path.join(d, "documents.parquet"))

    from findtextcenternet_spark.plans import full_registry

    fn, _ = full_registry()["kmv_distinct_tokens"]
    got = fn(spark, d).toPandas().set_index("source")
    small = got.loc["small"]
    assert small["kmv_est"] == small["n_exact"] <= 20
    big = got.loc["big"]
    rel = abs(big["kmv_est"] - big["n_exact"]) / big["n_exact"]
    assert rel < 3 / (64 - 2) ** 0.5, (big["kmv_est"], big["n_exact"])
