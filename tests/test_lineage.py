"""Resume + lineage contract (north rule: per-partition lineage, resume from
committed output)."""

from pyspark.sql import functions as F

from findtextcenternet_spark.corpus import generate_pages
from findtextcenternet_spark.lineage import lineage_table, run_extract
from findtextcenternet_spark.pipeline import pages_from_pandas


def test_resume_is_idempotent_and_complete(spark, tmp_path):
    out_dir = str(tmp_path / "extracted")
    all_pages = pages_from_pandas(spark, generate_pages(100))

    # run 1 "crashes" after only 60 pages were in the input snapshot
    r1 = run_extract(all_pages.limit(60), out_dir, run_id="run1",
                     num_partitions=4)
    assert r1["n_docs"] == 60

    # run 2 resumes over the full input: extracts ONLY the remaining 40
    r2 = run_extract(all_pages, out_dir, run_id="run2", num_partitions=4)
    assert r2["n_docs"] == 40

    docs = spark.read.parquet(out_dir + "/docs")
    assert docs.count() == 100
    assert docs.select("url").distinct().count() == 100

    # run 3: nothing left to do, nothing duplicated
    r3 = run_extract(all_pages, out_dir, run_id="run3", num_partitions=4)
    assert r3["n_docs"] == 0
    assert spark.read.parquet(out_dir + "/docs").count() == 100


def test_lineage_rows_cover_all_docs(spark, tmp_path):
    out_dir = str(tmp_path / "extracted2")
    pages = pages_from_pandas(spark, generate_pages(80))
    run_extract(pages.limit(30), out_dir, run_id="a", num_partitions=4)
    run_extract(pages, out_dir, run_id="b", num_partitions=4)

    lin = lineage_table(spark, out_dir)
    per_run = {r["run_id"]: r["n"] for r in
               lin.groupBy("run_id").agg(F.sum("n_docs").alias("n")).collect()}
    assert per_run == {"a": 30, "b": 50}
    # lineage doc counts reconcile exactly with the docs table
    docs = spark.read.parquet(out_dir + "/docs")
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    # every lineage row carries wall time and a commit timestamp
    assert lin.filter(F.col("wall_sec") <= 0).count() == 0
    assert lin.filter(F.col("committed_at").isNull()).count() == 0
