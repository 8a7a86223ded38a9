"""Per-partition lineage + idempotent resume (SURVEY.md §7 Stage 5).

The reference's resumability is byte-range resume in its shard downloader
(downloader_src/main.cpp:50-71). At corpus scale the equivalent contract is:

* every completed run appends its docs to the output table plus one lineage
  row per output partition (partition id, doc count, bytes, run id, wall);
* a restarted job anti-joins the input against already-extracted urls and
  processes only the remainder — append-only output means a crash between
  append and commit re-extracts at most one run's remainder, never
  duplicates within a committed run.

On Iceberg the same code path uses snapshot reads for `_done_urls` and an
atomic append; parquet directories stand in here (the sandbox has no
catalog), with identical dataflow.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_documents


def _dir_nonempty(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def extracted_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Urls already settled in the output — extracted OR quarantined (a
    poison page is quarantined exactly once per output directory, never
    re-validated on every resume)."""
    docs_dir = os.path.join(out_dir, "docs")
    if not _dir_nonempty(docs_dir):
        return None
    return spark.read.parquet(docs_dir).select("url")


def run_extract(pages: DataFrame, out_dir: str,
                run_id: str | None = None,
                num_partitions: int | None = None) -> dict:
    """One resumable extraction run — single pass, no full-output rescans.

    Anti-joins pages already present in ``out_dir/docs`` (resume), runs
    the extraction pipeline (poison pills become in-pass error rows, never
    task failures), and appends the combined frame ONCE, partitioned by
    run_id — so the per-run read-backs below prune to this run's partition
    instead of scanning everything ever written (the 100 TB killer).
    Error rows stay in the docs table (filter ``error IS NULL`` for clean
    docs) and are mirrored to ``_quarantine`` for ops; one lineage row per
    output partition goes to ``_lineage``.
    """
    spark = pages.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    docs_dir = os.path.join(out_dir, "docs")
    lineage_dir = os.path.join(out_dir, "_lineage")
    quarantine_dir = os.path.join(out_dir, "_quarantine")

    done = extracted_urls(spark, out_dir)
    todo = pages if done is None else pages.join(done, "url", "left_anti")

    t0 = time.time()
    combined = extract_documents(todo, num_partitions)
    out = (combined
           .withColumn("part_id", F.spark_partition_id())
           .withColumn("run_id", F.lit(run_id)))
    out.write.mode("append").partitionBy("run_id").parquet(docs_dir)
    wall = time.time() - t0

    # read back THIS run only — partition pruning on run_id
    this_run = (spark.read.parquet(docs_dir)
                .filter(F.col("run_id") == run_id))
    quarantine = this_run.filter(F.col("error").isNotNull())
    n_quarantined = quarantine.count()
    if n_quarantined:
        (quarantine.select("url", "error", "run_id")
         .write.mode("append").parquet(quarantine_dir))

    good = this_run.filter(F.col("error").isNull())
    lineage = (good.groupBy("part_id")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(F.length("text")).alias("text_bytes"),
                    F.sum(F.when(F.col("path") == "raster", 1).otherwise(0))
                    .alias("n_raster"))
               .withColumn("run_id", F.lit(run_id))
               .withColumn("wall_sec", F.lit(round(wall, 3)))
               .withColumn("committed_at", F.current_timestamp()))
    lineage.write.mode("append").parquet(lineage_dir)
    lin_rows = (spark.read.parquet(lineage_dir)
                .filter(F.col("run_id") == run_id)
                .agg(F.sum("n_docs")).collect())
    n_docs = int(lin_rows[0][0] or 0)
    return {"run_id": run_id, "n_docs": n_docs,
            "n_quarantined": n_quarantined, "wall_sec": round(wall, 3),
            "docs_dir": docs_dir, "lineage_dir": lineage_dir,
            "quarantine_dir": quarantine_dir}


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_lineage"))
