"""One scaling-bench run: full extraction pipeline at a given parallelism.

Launched via spark-submit --py-files (BASELINE.md measurement protocol):

    spark-submit --master local[N] --py-files pkg.zip \
        scripts/scaling_job.py N <pages.parquet> <out.json>

Prints/writes one JSON record: {"cores": N, "docs": D, "wall_sec": S,
"docs_per_sec": D/S, "rows": R, "parity_hash": H}. ``parity_hash`` is the
order-insensitive bit_xor of xxhash64(url, text) over the output — two runs
at different parallelism must produce the identical value (byte-identical
text per url, the north-rule invariant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_run(extract_documents, pages) -> float:
    t0 = time.time()
    extract_documents(pages).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    out_path = sys.argv[3]
    n_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from findtextcenternet_spark.pipeline import extract_documents
    from findtextcenternet_spark.sources.session import get_spark

    spark = get_spark(app=f"scaling-local{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(pages_path)
    docs = pages.count()

    # warm: one full untimed pass (JVM codegen JIT, Python UDF worker pool,
    # OS page cache) — the metric is steady-state throughput of a
    # long-running corpus job, not cold-start
    extract_documents(pages).write.format("noop").mode("overwrite").save()

    reps = [_timed_run(extract_documents, pages) for _ in range(n_reps)]
    wall = min(reps)

    parity = (extract_documents(pages)
              .select(F.expr("xxhash64(url, text)").alias("h"))
              .agg(F.expr("bit_xor(h)").alias("hx"),
                   F.count("*").alias("n")).collect()[0])

    rec = {"cores": cores, "docs": docs, "wall_sec": round(wall, 2),
           "docs_per_sec": round(docs / wall, 2),
           "wall_reps": [round(r, 2) for r in reps],
           "rows": parity["n"], "parity_hash": int(parity["hx"])}
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
