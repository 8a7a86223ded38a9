#!/usr/bin/env python
"""Per-query isolation bench (round 7 optimization work).

`bench.py` is FROZEN for driver measurement; this harness exists for the
optimization loop (spark_optimization_guide.md §1): time one registry query
at a time against the noop sink, label the jobs, and capture
`.explain("formatted")` so plan changes are diffable.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain plans/r07 --suffix before] [query ...]

With no query names, runs the bench.py HEADLINE list. Prints one JSON line
{"queries": {name: [sec, ...]}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>_<suffix>.txt explains")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from bench import HEADLINE
    from findtextcenternet_spark.plans import full_registry
    from findtextcenternet_spark.sources.session import get_spark

    names = args.queries or list(HEADLINE)
    spark = get_spark(app="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    reg = full_registry()

    # warm the session (JVM, python workers, page cache) like bench.py does
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            fn, _ = reg[name]
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for name in names:
            fn, _ = reg[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": samples, "sf_dir": args.sf}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
