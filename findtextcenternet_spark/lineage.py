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

from .pipeline import extract_documents_robust


def _dir_nonempty(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path))


def extracted_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    docs_dir = os.path.join(out_dir, "docs")
    if not _dir_nonempty(docs_dir):
        return None
    return spark.read.parquet(docs_dir).select("url")


def run_extract(pages: DataFrame, out_dir: str,
                run_id: str | None = None,
                num_partitions: int | None = None) -> dict:
    """One resumable extraction run.

    Anti-joins pages already present in ``out_dir/docs`` (resume), extracts
    the remainder poison-pill-safely (structurally invalid pages land in
    ``out_dir/_quarantine`` with their error, never fail the job), appends
    docs (tagged with run_id + output partition id) and one lineage row per
    partition to ``out_dir/_lineage``. Returns the run summary dict.
    """
    spark = pages.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    docs_dir = os.path.join(out_dir, "docs")
    lineage_dir = os.path.join(out_dir, "_lineage")
    quarantine_dir = os.path.join(out_dir, "_quarantine")

    done = extracted_urls(spark, out_dir)
    todo = pages if done is None else pages.join(done, "url", "left_anti")

    t0 = time.time()
    docs, quarantine = extract_documents_robust(todo, num_partitions)
    out = (docs
           .withColumn("run_id", F.lit(run_id))
           .withColumn("part_id", F.spark_partition_id()))
    out.write.mode("append").parquet(docs_dir)
    n_quarantined = quarantine.count()
    if n_quarantined:
        (quarantine.withColumn("run_id", F.lit(run_id))
         .write.mode("append").parquet(quarantine_dir))
    wall = time.time() - t0

    this_run = (spark.read.parquet(docs_dir)
                .filter(F.col("run_id") == run_id))
    lineage = (this_run.groupBy("part_id")
               .agg(F.count("*").alias("n_docs"),
                    F.sum(F.length("text")).alias("text_bytes"),
                    F.sum(F.when(F.col("path") == "raster", 1).otherwise(0))
                    .alias("n_raster"))
               .withColumn("run_id", F.lit(run_id))
               .withColumn("wall_sec", F.lit(round(wall, 3)))
               .withColumn("committed_at", F.current_timestamp()))
    lineage.write.mode("append").parquet(lineage_dir)

    n_docs = this_run.count()
    return {"run_id": run_id, "n_docs": n_docs,
            "n_quarantined": n_quarantined, "wall_sec": round(wall, 3),
            "docs_dir": docs_dir, "lineage_dir": lineage_dir,
            "quarantine_dir": quarantine_dir}


def lineage_table(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_lineage"))
