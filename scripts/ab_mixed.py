"""Paired same-window A/B: Spark unified pipeline vs the multiprocessing
control on the mixed web-shape corpus (VERDICT r4 item 2).

Why paired: this KVM guest's steal windows swing throughput ~2x across
minutes (measured: the identical unified plan ran 992 and 1973 docs/s in
two sessions 10 minutes apart), so unpaired numbers from different
windows — the basis of the r4 "Spark 1464 vs mp 1805-1958" gap claim —
mostly compare weather, not engines. Here each pair runs both engines
back-to-back on the SAME input within the same window, alternating order
across pairs to cancel residual drift, and the per-pair RATIO is the
statistic: noise that scales both engines equally cancels.

    python scripts/ab_mixed.py [cores] [n_docs] [pairs]

Prints one JSON line: per-pair docs/s for both engines, per-pair
spark/mp ratios, and the median ratio. Spark ahead = ratio > 1.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mp_run(rows, nproc: int, path: str) -> tuple[float, float]:
    """One warmed pool, two timed runs: (kernel-only docs/s over hot RAM
    rows, end-to-end docs/s including the parquet read + chunk split).

    Both matter: kernel-only is the box's pure-compute ceiling (what
    mp_control.py has always measured); end-to-end is the same JOB the
    Spark pipeline times (cold rows off disk every rep) — comparing
    Spark's scan+shuffle+extract against a control that got its input
    preloaded for free would bake a ~7% handicap into every ratio."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    from scripts.mp_control import work

    chunks = [rows[i::nproc] for i in range(nproc)]
    with mp.get_context("spawn").Pool(nproc) as p:
        p.map(work, [c[:5] for c in chunks])  # warm imports
        t0 = time.time()
        p.map(work, chunks)
        kernel = len(rows) / (time.time() - t0)
        t0 = time.time()
        tbl = pq.read_table(path).to_pandas()
        rows2 = [(r.url, bytes(r.html)) for r in tbl.itertuples()]
        p.map(work, [rows2[i::nproc] for i in range(nproc)])
        e2e = len(rows2) / (time.time() - t0)
        return kernel, e2e


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from scripts.mp_control import corpus_path

    path = corpus_path("mixed", n_docs)

    import pyarrow.parquet as pq

    tbl = pq.read_table(path).to_pandas()
    rows = [(r.url, bytes(r.html)) for r in tbl.itertuples()]

    from findtextcenternet_spark.pipeline import extract_documents
    from findtextcenternet_spark.sources.session import get_spark

    spark = get_spark(app="ab-mixed", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)
    docs = extract_documents(pages)

    def spark_run() -> float:
        t0 = time.time()
        docs.write.format("noop").mode("overwrite").save()
        return len(rows) / (time.time() - t0)

    spark_run()  # warm: spawn/reuse the Python workers once

    sp, mp_k, mp_e, rat_k, rat_e = [], [], [], [], []
    for i in range(pairs):
        if i % 2 == 0:  # alternate order to cancel in-window drift
            k, e = mp_run(rows, cores, path)
            s = spark_run()
        else:
            s = spark_run()
            k, e = mp_run(rows, cores, path)
        sp.append(round(s, 1))
        mp_k.append(round(k, 1))
        mp_e.append(round(e, 1))
        rat_k.append(round(s / k, 3))
        rat_e.append(round(s / e, 3))
        print(f"pair {i}: spark {s:7.1f}  mp-kernel {k:7.1f}  "
              f"mp-e2e {e:7.1f}  ratio(k) {s / k:.3f}  ratio(e2e) "
              f"{s / e:.3f}", flush=True)
    spark.stop()
    print(json.dumps({
        "cores": cores, "docs": len(rows), "pairs": pairs,
        "spark_docs_per_sec": sp, "mp_kernel_docs_per_sec": mp_k,
        "mp_e2e_docs_per_sec": mp_e,
        "ratio_vs_kernel": rat_k, "ratio_vs_e2e": rat_e,
        "median_ratio_vs_kernel": round(statistics.median(rat_k), 3),
        "median_ratio_vs_e2e": round(statistics.median(rat_e), 3),
        "median_spark": round(statistics.median(sp), 1),
        "median_mp_kernel": round(statistics.median(mp_k), 1),
        "median_mp_e2e": round(statistics.median(mp_e), 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
