"""Skew handling: the corpus has a 1/rank domain distribution (the hottest
host owns ~20-30% of pages); hashing on the unique url must spread it
uniformly across partitions regardless."""

from pyspark.sql import functions as F

from findtextcenternet_spark.corpus import generate_pages
from findtextcenternet_spark.pipeline import pages_from_pandas, spread_pages


def test_corpus_is_domain_skewed(spark):
    pdf = generate_pages(2000)
    top = (pdf["url"].str.extract(r"https://(site\d+)")[0]
           .value_counts(normalize=True).iloc[0])
    assert top > 0.15, "fixture lost its domain skew"


def test_spread_pages_balances_hot_domains(spark):
    pages = pages_from_pandas(spark, generate_pages(2000))
    n_parts = 16
    spread = spread_pages(pages, n_parts)
    counts = (spread.withColumn("pid", F.spark_partition_id())
              .groupBy("pid").count().toPandas())
    assert len(counts) == n_parts
    mean = counts["count"].mean()
    # uniform hashing: no partition more than 40% above the mean even
    # though one domain owns >15% of all rows
    assert counts["count"].max() <= 1.4 * mean
    # and the hot domain itself is spread across (nearly) all partitions
    hot = (spread.filter(F.col("url").startswith("https://site00"))
           .withColumn("pid", F.spark_partition_id())
           .select("pid").distinct().count())
    assert hot >= n_parts - 2
