"""Per-leg profile of the mixed-corpus extraction (VERDICT r3 item 1/2).

Times each extraction leg separately (and the union) on the mixed-shape
corpus at a given parallelism, with and without per-leg coalesce, to
locate the fixed per-stage overhead that dominates cheap HTML/PDF pages.

    python scripts/profile_legs.py [cores] [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(tag, df, reps=3):
    df.write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    print(f"{tag:42s} {min(ts):7.2f}s  reps={[round(t, 2) for t in ts]}",
          flush=True)
    return min(ts)


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    from findtextcenternet_spark.corpus import (
        CORPUS_VERSION,
        write_pages_parquet,
    )
    from findtextcenternet_spark.pipeline import (
        extract_documents,
        extract_html_path,
        extract_pdf_path,
        extract_raster_path,
        spread_pages,
    )
    from findtextcenternet_spark.sources.session import get_spark

    cache = os.path.join(REPO, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"pages_mixed_v{CORPUS_VERSION}_{n_docs}.parquet")
    if not os.path.exists(path):
        write_pages_parquet(path, n_docs, raster_frac=0.2, pdf_frac=0.1)

    spark = get_spark(app="profile-legs", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)
    print(f"cores={cores} docs={n_docs} "
          f"kinds: raster~{int(n_docs*0.2)} pdf~{int(n_docs*0.1)} "
          f"html~{int(n_docs*0.7)}", flush=True)

    spread = spread_pages(pages)
    timed("spread only (count)", spread.select("url"))
    timed("html leg @4xcores", extract_html_path(spread))
    timed("pdf leg @4xcores", extract_pdf_path(spread))
    timed("raster leg @4xcores", extract_raster_path(spread))
    for n in (cores, cores // 2, 8):
        timed(f"html leg coalesce({n})",
              extract_html_path(spread.coalesce(n)))
    for n in (cores, 8):
        timed(f"pdf leg coalesce({n})",
              extract_pdf_path(spread.coalesce(n)))
    timed("full pipeline (current)", extract_documents(pages))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
