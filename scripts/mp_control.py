"""Spark-free scaling control: the golden single-process kernels in a
multiprocessing pool at N workers — isolates the box's parallel-scaling
behavior (KVM scheduling, shared caches) from anything Spark adds.

    python scripts/mp_control.py [pages.parquet] [workers ...]
"""

from __future__ import annotations

import os
import sys
import time
import multiprocessing as mp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(chunk):
    from findtextcenternet_spark.golden import extract_page_golden
    for url, html in chunk:
        extract_page_golden(url, html)
    return len(chunk)


def run(rows, nproc: int, docs: int) -> float:
    sub = rows[:docs]
    chunks = [sub[i::nproc] for i in range(nproc)]
    with mp.get_context("spawn").Pool(nproc) as p:
        p.map(work, [c[:5] for c in chunks])  # warm imports
        t0 = time.time()
        p.map(work, chunks)
        dt = time.time() - t0
    return docs / dt


def main() -> int:
    import pyarrow.parquet as pq

    pages = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.bench_cache/pages_raster_v2_9000.parquet"
    workers = [int(w) for w in sys.argv[2:]] or [1, 2, 8]
    t = pq.read_table(pages).to_pandas()
    rows = [(r.url, bytes(r.html)) for r in t.itertuples()]
    for nproc in workers:
        docs = min(len(rows), 320 * nproc)
        dps = run(rows, nproc, docs)
        print(f"{nproc} procs: {dps:.1f} docs/s  ({dps / nproc:.2f}/core)",
              flush=True)
    return 0


if __name__ == "__main__":
    main()
