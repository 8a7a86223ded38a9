"""Per-partition lineage + idempotent resume (SURVEY.md §7 Stage 5).

The reference's resumability is byte-range resume in its shard downloader
(downloader_src/main.cpp:50-71). At corpus scale the equivalent contract is:

* every completed run appends its docs to the output table plus one lineage
  row per output partition (partition id, doc count, bytes, run id, wall);
* every run also appends its settled urls to the compact ``_done_urls``
  side table (url + run_id only, url-hash-clustered files);
* a restarted job anti-joins the input against that side table and
  processes only the remainder — resume cost is O(done-set strings), not
  a scan over everything ever written — append-only output means a crash
  between append and commit re-extracts at most one run's remainder,
  never duplicates within a committed run.

On Iceberg the same code path uses snapshot reads for `_done_urls` (a
bucket(url)-partitioned table) and an atomic append; parquet directories
stand in here (the sandbox has no catalog), with identical dataflow.
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


# done-set file clustering: files are url-hash-clustered so a resume
# anti-join shuffles evenly; on Iceberg this is a bucket(url) partition
# spec and the read is a snapshot scan
DONE_BUCKETS = 64


def _assert_docs_layout_consistent(docs_dir: str) -> None:
    """Refuse to resume into a docs dir mixing the pre-run_id-partition
    layout (flat parquet files, run_id as a data column) with the
    partitioned layout (run_id=... subdirectories): spark.read.parquet
    over the mix fails or silently mis-resolves run_id."""
    entries = os.listdir(docs_dir)
    has_partition_dirs = any(e.startswith("run_id=") for e in entries)
    has_flat_files = any(e.endswith(".parquet") for e in entries)
    if has_partition_dirs and has_flat_files:
        raise ValueError(
            f"{docs_dir} mixes a legacy unpartitioned docs layout with "
            "run_id=... partition directories; regenerate the output "
            "directory (or migrate the flat files into run_id= partitions) "
            "before resuming")


def extracted_urls(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Urls already settled in the output — extracted OR quarantined (a
    poison page is quarantined exactly once per output directory, never
    re-validated on every resume).

    Reads the compact ``_done_urls`` side table (url + run_id only) that
    every run appends — O(done-set string column), never a scan over the
    full docs table. Output dirs written before the side table existed
    fall back to a url-only column-pruned docs scan."""
    done_dir = os.path.join(out_dir, "_done_urls")
    if _dir_nonempty(done_dir):
        return spark.read.parquet(done_dir).select("url")
    docs_dir = os.path.join(out_dir, "docs")
    if not _dir_nonempty(docs_dir):
        return None
    _assert_docs_layout_consistent(docs_dir)
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
    done_dir = os.path.join(out_dir, "_done_urls")

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

    # append this run's settled urls (docs AND quarantine rows) to the
    # compact done-set side table: resume then reads O(done-set), one
    # string column, instead of the url column of everything ever written
    (this_run.select("url")
     .withColumn("run_id", F.lit(run_id))
     .repartition(DONE_BUCKETS, "url")
     .write.mode("append").parquet(done_dir))
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
