#!/usr/bin/env python
"""Bench harness (driver contract): headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "bench_total_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "docs_per_sec": <extraction throughput, the BASELINE.json north metric>,
   "extract_docs": N, "extract_sec": S}

The extraction corpus is the deterministic synthetic pages table
(findtextcenternet_spark.corpus, pure function of (seed, doc_id)); it is
materialized to parquet once under .bench_cache/ and reused so repeated
runs measure the pipeline, not the generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",     # classic multi-agg groupBy, one shuffle
    "a14_dense_rank",         # partitioned window
    "j6_asof_next_line",      # as-of lead window join
    "sessionize",             # gap sessionization (lag + running sum)
    "dedup_exact",            # hash-groupBy dedup
    "dedup_minhash_lsh",      # shingle→minhash→band→bucket
    "dedup_simhash",          # bitwise fingerprint
    "dedup_clusters",         # LSH pairs → connected components (r6)
    "dedup_paragraph",        # corpus-wide boilerplate drop (r6)
    "ann_cosine_topk",        # brute-force cosine top-k
    "ann_lsh_buckets",        # hyperplane LSH bucketing
    "lang_id",                # n-gram/stopword language ID
    "quality_score",          # text quality stats
    "token_count_total",      # corpus token counting
    "pii_scrub",              # email/IPv4 redaction, row-local (r6)
    "url_canonical_dedup",    # canonical-URL collapse, one groupBy (r6)
    "host_pagerank",          # 5-round power iteration on host graph (r6)
    "dsir_weights",           # importance-resampling doc weights (r6)
]


def _bench_pages_parquet(n_docs: int) -> str:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    from findtextcenternet_spark.corpus import (
        CORPUS_VERSION,
        write_pages_parquet,
    )
    path = os.path.join(cache, f"pages_v{CORPUS_VERSION}_{n_docs}.parquet")
    if not os.path.exists(path):
        write_pages_parquet(path, n_docs)
    return path


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1)
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))

    from findtextcenternet_spark.plans import full_registry
    from findtextcenternet_spark.pipeline import extract_documents
    from findtextcenternet_spark.sources.session import get_spark

    pages_path = _bench_pages_parquet(n_docs)
    spark = get_spark(app="bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = full_registry()
    timings: dict[str, float] = {}

    # warm the JVM/Python-worker pools so q1 doesn't pay session startup
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # interleaved reps (round-robin over the whole list, like the scaling
    # harness) so slow-host periods hit every query equally; per-query
    # MEDIAN is reported — r1→r2 showed ~20% whole-section drift at n=2
    # that medians-of-3 make distinguishable from a real regression
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            fn, _sql = reg[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
    import statistics

    for name in HEADLINE:
        timings[name] = round(statistics.median(samples[name]), 3)

    pages = spark.read.parquet(pages_path)
    # first pass warms codegen/worker pool/page cache; the second measures
    # steady-state throughput (the regime of a long-running corpus job)
    extract_documents(pages).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    extract_documents(pages).write.format("noop").mode("overwrite").save()
    extract_sec = time.time() - t0
    timings["extract_pipeline"] = round(extract_sec, 3)

    # single-node reference point: the golden single-process implementation
    # (same kernels, no Spark) on a 600-doc slice — the "reference
    # throughput" our distributed pipeline must beat (BASELINE.md: the
    # reference repo publishes no numbers, so its faithful single-process
    # re-implementation is the stand-in)
    import pandas as pd

    from findtextcenternet_spark.corpus import generate_pages
    from findtextcenternet_spark.golden import extract_corpus_golden
    gpdf = generate_pages(600)
    t0 = time.time()
    extract_corpus_golden(gpdf)
    golden_dps = round(600 / (time.time() - t0), 2)

    total = round(sum(timings.values()), 3)
    rec = {
        "metric": "bench_total_sec", "value": total, "unit": "sec",
        "queries": timings, "sf": sf,
        "docs_per_sec": round(n_docs / extract_sec, 2),
        "extract_docs": n_docs, "extract_sec": round(extract_sec, 3),
        "golden_single_process_docs_per_sec": golden_dps,
        "speedup_vs_single_node": round(n_docs / extract_sec / golden_dps, 2),
    }
    # latest two-parallelism scaling measurement, if one has been recorded
    # (scripts/scaling_bench.py; see BENCH.md for the protocol).
    # COMPACTED to the decision numbers only: the r4 driver tail-window
    # truncated the full record mid-JSON ("parsed": null) — raw per-rep
    # arrays/controls stay in .bench_cache/scaling.json and BENCH.md.
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".bench_cache", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            full = json.load(f)
        compact = {}
        for tag in ("headline", "raster", "mixed"):
            leg = full.get(tag)
            if not isinstance(leg, dict):
                continue
            compact[tag] = {
                "cores": f"{leg['n_cores']}->{leg['n4_cores']}",
                "eff": leg["scaling_efficiency"],
                "eff_best": leg.get("eff_best"),
                "dps_n": leg["docs_per_sec_n"],
                "dps_4n": leg["docs_per_sec_4n"],
                "parity": leg.get("parity_identical"),
            }
        ctrl = full.get("control")
        if isinstance(ctrl, dict):
            compact["control_eff"] = {
                tag: c.get("efficiency") for tag, c in ctrl.items()
                if isinstance(c, dict)}
        rec["scaling"] = compact
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
