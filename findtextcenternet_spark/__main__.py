"""CLI driver — the engine's analogue of the reference's ``run_ocr.py IMG``
(reference: run_ocr.py:5-39 backend dispatch + glob loop).

    spark-submit --py-files pkg.zip -m findtextcenternet_spark ...   # or
    python -m findtextcenternet_spark INPUT_PARQUET OUT_DIR
        [--master local[32]] [--partitions N] [--run-id ID] [--streaming]

Batch mode runs one resumable lineage-tracked extraction pass (re-invoking
with the same OUT_DIR extracts only not-yet-done urls). --streaming tails
INPUT_PARQUET as a file-source stream with checkpointed, idempotent
(effectively-once) output instead.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="findtextcenternet_spark")
    ap.add_argument("input", help="pages parquet (file, dir, or glob)")
    ap.add_argument("out_dir", help="output root (docs/ + _lineage/)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--streaming", action="store_true")
    args = ap.parse_args(argv)

    from .sources.session import get_spark

    spark = get_spark(app="findtextcenternet-extract", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.streaming:
        from .streaming import stream_extract_html

        q = stream_extract_html(
            spark, args.input,
            out_dir=os.path.join(args.out_dir, "docs"),
            checkpoint_dir=os.path.join(args.out_dir, "_checkpoint"),
            include_raster=True)
        q.awaitTermination()
        print(json.dumps({"mode": "streaming", "out": args.out_dir}))
        return 0

    from .lineage import run_extract

    pages = spark.read.parquet(args.input)
    summary = run_extract(pages, args.out_dir, run_id=args.run_id,
                          num_partitions=args.partitions)
    print(json.dumps({"mode": "batch", **summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
