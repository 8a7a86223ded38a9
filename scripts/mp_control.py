"""Spark-free scaling control: the golden single-process kernels in a
multiprocessing pool at N workers — isolates the box's parallel-scaling
behavior (KVM scheduling, shared caches) from anything Spark adds.

    python scripts/mp_control.py [raster|mixed|<pages.parquet>] [workers ...]

``raster`` (default) is the compute-representative all-raster corpus;
``mixed`` is the web-shape corpus (70% HTML / 10% PDF / 20% raster) —
the control target for the mixed scaling row (the golden dispatcher
handles every page kind, so the pool measures the box's own ceiling on
the exact same workload shape). Either keyword builds its corpus under
.bench_cache/ on first use. Prints one JSON line at the end with
per-level docs/s so scaling_bench can embed the control numbers.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def corpus_path(tag: str, n_docs: int | None = None) -> str:
    """Resolve/build the control corpus for a mode keyword."""
    from findtextcenternet_spark.corpus import (
        CORPUS_VERSION,
        write_pages_parquet,
    )
    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    fracs = {"raster": (1.0, 0.0), "mixed": (0.2, 0.1)}[tag]
    n = n_docs or {"raster": 9000, "mixed": 20000}[tag]
    path = os.path.join(cache, f"pages_{tag}_v{CORPUS_VERSION}_{n}.parquet")
    if not os.path.exists(path):
        write_pages_parquet(path, n, raster_frac=fracs[0], pdf_frac=fracs[1])
    return path


def measure(pages: str, workers: list[int],
            docs_per_worker: int = 320) -> dict:
    import pyarrow.parquet as pq
    t = pq.read_table(pages).to_pandas()
    rows = [(r.url, bytes(r.html)) for r in t.itertuples()]
    out = {}
    for nproc in workers:
        docs = min(len(rows), docs_per_worker * nproc)
        dps = run(rows, nproc, docs)
        out[nproc] = round(dps, 1)
        print(f"{nproc} procs: {dps:.1f} docs/s  ({dps / nproc:.2f}/core)",
              flush=True)
    return out


def main() -> int:
    arg = sys.argv[1] if len(sys.argv) > 1 else "raster"
    pages = corpus_path(arg) if arg in ("raster", "mixed") else arg
    workers = [int(w) for w in sys.argv[2:]] or [1, 2, 8]
    out = measure(pages, workers)
    ws = sorted(out)
    rec = {"pages": os.path.basename(pages), "docs_per_sec": out}
    if len(ws) >= 2:
        lo, hi = ws[-2], ws[-1]
        rec["efficiency"] = round(out[hi] / (out[lo] * hi / lo), 3)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    main()
