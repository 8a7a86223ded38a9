"""SQL-expressible operator demos (SURVEY.md §2, Stage 1 of the build plan).

Every entry pairs an idiomatic-DataFrame Spark query with an ANSI-SQL DuckDB
oracle over the shared parquet tables (TESTDATA.md: region nation customer
supplier part orders lineitem events documents embeddings). Naming follows
the SURVEY operator ids so coverage is line-checkable.

Float discipline: every floating aggregate is rounded in BOTH engines (the
driver hash-compares values, and summation order differs between engines).
Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import MODULOS
from .registry_core import SparkQuery, register, registry  # noqa: F401
# register/registry live in registry_core (the ONE central dict); re-export
# kept so `from .relational import register` in sibling modules still works


# Tables whose scans feed heavy PER-ROW compute (md5/minhash/regex/array
# transforms over document text or embedding vectors). Their sf fixtures
# are single parquet files with ONE row group, so the scan plans as ONE
# task regardless of cores — the "unsplittable input" skew of the
# optimization guide (§2.5), which serializes the whole map stage.
_SPREAD_TABLES = {"documents", "embeddings"}


def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan whose file layout under-parallelizes
    the session (guide §2.5: repartition immediately after an unsplittable
    read). Conditional on the ACTUAL scan split count, so at cluster scale
    — where inputs arrive as many splittable files and the scan already
    yields >= defaultParallelism tasks — no shuffle is ever added; the
    exchange only exists when the alternative is idle cores, and it moves
    just the (small, by construction) under-split input once."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _SPREAD_TABLES:
        df = spread_input(df)
    return df


def _t_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Plain scan without the input spread — for queries whose per-row
    map work is trivial (a handful of md5s per doc) and whose cost is
    iterative round-trip latency, where the extra exchange and the extra
    tasks per tiny stage cost more than the idle cores do (measured:
    host_pagerank 2.3 s → 4.3 s WITH the spread at sf1.0)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =======================================================================
# Projections / filters (P4, P5, P8, P9)
# =======================================================================

@register("p4_threshold_filter", """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity >= 45.0
""")
def p4_threshold_filter(spark, sf_dir):
    """P4 cutoff filter (process_ocr_base.py:521-523): pushed to the scan."""
    return (_t(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") >= 45.0)
            .select("l_orderkey", "l_linenumber", "l_quantity"))


@register("p5_size_decode", """
SELECT l_orderkey, l_linenumber,
       round(exp(l_discount * 10 - 3) * 1024, 4) AS size_px
FROM lineitem WHERE exp(l_discount * 10 - 3) * 1024 > 60.0
""")
def p5_size_decode(spark, sf_dir):
    """P5 log-size decode w = exp(x-3)*1024 (process_ocr_base.py:524-529)."""
    size = F.exp(F.col("l_discount") * 10 - 3) * 1024
    return (_t(spark, sf_dir, "lineitem")
            .filter(size > 60.0)
            .select("l_orderkey", "l_linenumber",
                    F.round(size, 4).alias("size_px")))


@register("p8_flag_threshold", """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_ruby,
       CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_space,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""")
def p8_flag_threshold(spark, sf_dir):
    """P8 flag thresholding (main.cpp:132-147): boolean columns from floats."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
                 .cast("long").alias("n_ruby"),
                 F.sum(F.when(F.col("l_tax") > 0.04, 1).otherwise(0))
                 .cast("long").alias("n_space"),
                 F.count("*").alias("n")))


@register("p9_min_chain_filter", """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 4)
""")
def p9_min_chain_filter(spark, sf_dir):
    """P9 degenerate-chain filter (search_loop.cpp:71-79): groups with >=k
    members, semi-joined back."""
    li = _t(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").count().filter(F.col("count") >= 4)
    return (_t(spark, sf_dir, "orders")
            .join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
            .select("o_orderkey", "o_custkey"))


# =======================================================================
# Aggregations (A1, A3, A4, A5, A7, A8, A9, A14, A15-analog)
# =======================================================================

@register("a1_overlap_max", """
SELECT user_id, event_type, round(max(value), 4) AS max_value
FROM events GROUP BY user_id, event_type
""")
def a1_overlap_max(spark, sf_dir):
    """A1 tile overlap-max merge (process_ocr_base.py:480-516) as the
    relational groupBy-max it is."""
    return (_t(spark, sf_dir, "events")
            .groupBy("user_id", "event_type")
            .agg(F.round(F.max("value"), 4).alias("max_value")))


@register("a3_median", """
SELECT l_returnflag,
       round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS med_price,
       round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) / 5.0, 4) AS th_hist
FROM lineitem GROUP BY l_returnflag
""")
def a3_median(spark, sf_dir):
    """A3 global median threshold th = median/5 (process_ocr_base.py:557)."""
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
                 .alias("med_price"),
                 F.round(F.expr("percentile(l_extendedprice, 0.5)") / 5.0, 4)
                 .alias("th_hist")))


@register("a4_chain_extrema", """
SELECT l_suppkey AS chain,
       round(max(l_quantity), 4) AS max_w,
       round(max(l_extendedprice), 4) AS max_h,
       count(*) AS n_boxes
FROM lineitem GROUP BY l_suppkey
""")
def a4_chain_extrema(spark, sf_dir):
    """A4 per-chain extrema (search_loop.cpp:594-605)."""
    return (_t(spark, sf_dir, "lineitem")
            .groupBy(F.col("l_suppkey").alias("chain"))
            .agg(F.round(F.max("l_quantity"), 4).alias("max_w"),
                 F.round(F.max("l_extendedprice"), 4).alias("max_h"),
                 F.count("*").alias("n_boxes")))


@register("a5_weighted_endpoint_mean", """
WITH t AS (
  SELECT l_orderkey, l_extendedprice,
         rank() OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber, l_extendedprice) AS rn
  FROM lineitem)
SELECT l_orderkey,
       round(sum(l_extendedprice / rn) / sum(1.0 / rn), 4) AS anchor
FROM t GROUP BY l_orderkey
""")
def a5_weighted_endpoint_mean(spark, sf_dir):
    """A5 positional-decay weighted mean Σv·w/Σw, w=1/(i+1)
    (search_loop.cpp:128-176). rank() over a value-complete ordering keeps
    the weights deterministic under duplicate sort keys."""
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber",
                                                 "l_extendedprice")
    t = (_t(spark, sf_dir, "lineitem")
         .withColumn("rn", F.rank().over(w)))
    return (t.groupBy("l_orderkey")
            .agg(F.round(F.sum(F.col("l_extendedprice") / F.col("rn"))
                         / F.sum(F.lit(1.0) / F.col("rn")), 4)
                 .alias("anchor")))


@register("a7_mean_gap", """
WITH t AS (
  SELECT l_suppkey,
         epoch(l_shipdate) -
         lag(epoch(l_shipdate)) OVER (PARTITION BY l_suppkey
                                      ORDER BY l_shipdate, l_orderkey,
                                               l_linenumber) AS gap
  FROM lineitem)
SELECT l_suppkey, round(avg(CASE WHEN gap > 0 THEN gap END), 4) AS mean_gap
FROM t WHERE gap IS NOT NULL GROUP BY l_suppkey
""")
def a7_mean_gap(spark, sf_dir):
    """A7 mean positive inter-box gap via lag window
    (search_loop.cpp:621-632)."""
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey",
                                                "l_linenumber")
    ep = F.unix_timestamp("l_shipdate")
    t = (_t(spark, sf_dir, "lineitem")
         .withColumn("gap", ep - F.lag(ep).over(w))
         .filter(F.col("gap").isNotNull()))
    return (t.groupBy("l_suppkey")
            .agg(F.round(F.avg(F.when(F.col("gap") > 0, F.col("gap"))), 4)
                 .alias("mean_gap")))


@register("a8_block_bbox", """
SELECT o_orderkey AS block,
       round(min(l_quantity), 4) AS x1, round(max(l_quantity), 4) AS x2,
       round(min(l_extendedprice), 4) AS y1,
       round(max(l_extendedprice), 4) AS y2,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey
""")
def a8_block_bbox(spark, sf_dir):
    """A8 block bbox + stats (make_block.cpp:1518-1540)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("o_orderkey").alias("block"))
            .agg(F.round(F.min("l_quantity"), 4).alias("x1"),
                 F.round(F.max("l_quantity"), 4).alias("x2"),
                 F.round(F.min("l_extendedprice"), 4).alias("y1"),
                 F.round(F.max("l_extendedprice"), 4).alias("y2"),
                 F.count("*").alias("n")))


@register("a9_orientation_vote", """
SELECT o_custkey,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
                      ELSE -o_totalprice END), 2) AS vote
FROM orders GROUP BY o_custkey
""")
def a9_orientation_vote(spark, sf_dir):
    """A9 signed-area orientation vote (make_block.cpp:1543-1553)."""
    return (_t(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.round(F.sum(F.when(F.col("o_orderstatus") == "F",
                                      F.col("o_totalprice"))
                               .otherwise(-F.col("o_totalprice"))), 2)
                 .alias("vote")))


@register("a14_dense_rank", """
SELECT c_custkey, c_nationkey,
       dense_rank() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
FROM customer
""")
def a14_dense_rank(spark, sf_dir):
    """A14 dense renumbering (after_search.cpp:62-79)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"),
                                                  "c_custkey")
    return (_t(spark, sf_dir, "customer")
            .select("c_custkey", "c_nationkey",
                    F.dense_rank().over(w).alias("rnk")))


@register("a15_welford_stats", """
SELECT event_type,
       round(avg(value), 4) AS mean_v,
       round(stddev_samp(value), 4) AS std_v,
       count(*) AS n
FROM events GROUP BY event_type
""")
def a15_welford_stats(spark, sf_dir):
    """A15 running Welford statistics (loss_func.py:47-67) as the native
    streaming-safe mean/stddev aggregate."""
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.round(F.avg("value"), 4).alias("mean_v"),
                 F.round(F.stddev_samp("value"), 4).alias("std_v"),
                 F.count("*").alias("n")))


# =======================================================================
# Windows / ordering / top-k (W3, W4, W6, T2, T4)
# =======================================================================

def scalable_global_rank(df: DataFrame, *order_cols) -> DataFrame:
    """Global row-number WITHOUT the single-partition window.

    ``rank() OVER (ORDER BY ...)`` moves the whole table to one partition —
    a non-starter at 100 TB. Instead: range-repartition on the sort keys
    (same machinery as a distributed sort), row_number within each range
    partition, then add per-partition offsets (tiny driver-side cumulative
    sum, broadcast back). Requires a tie-free total order.
    Adds column ``read_order``.
    """
    # explicit partition count: a bare repartitionByRange is AQE-coalescible
    # and re-sampled on recompute, so the offset map collected below could
    # disagree with the second execution's partitioning. localCheckpoint
    # (not .cache()) pins it: a cached frame is best-effort — under memory
    # pressure the second job would re-run repartitionByRange, whose
    # boundary RE-SAMPLING can disagree with the collected offsets and
    # produce wrong/duplicate ranks; checkpoint blocks are materialized
    # once and reclaimed by the ContextCleaner when the frame drops
    n = max(2, df.sparkSession.sparkContext.defaultParallelism)
    ranged = df.repartitionByRange(n, *order_cols)
    ranged = (ranged.withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = {r["_pid"]: r["n"] for r in
              ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = F.broadcast(spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (ranged.join(off_df, "_pid")
            .withColumn("read_order",
                        (F.row_number().over(w) + F.col("_off")).cast("long"))
            .drop("_pid", "_off"))


@register("w3_reading_order", """
SELECT p_partkey, p_size,
       CAST(rank() OVER (ORDER BY p_size DESC, p_partkey) AS BIGINT)
         AS read_order
FROM part
""")
def w3_reading_order(spark, sf_dir):
    """W3 block reading order as a global multi-key rank
    (make_block.cpp:1633-1694), computed with the scalable two-phase
    range-partition + offset scheme instead of a single-partition window.
    The (p_size, p_partkey) order is tie-free so rank == row_number."""
    df = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
    return scalable_global_rank(df, F.desc("p_size"), F.col("p_partkey"))


@register("w4_peak_ranking", """
WITH t AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC,
                                     l_linenumber) AS rn
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 4) AS peak_score
FROM t WHERE rn = 1
""")
def w4_peak_ranking(spark, sf_dir):
    """W4 descending peak-score scan: the top peak per page
    (process_ocr_base.py:519)."""
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"),
                                                 "l_linenumber")
    return (_t(spark, sf_dir, "lineitem")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_orderkey", "l_linenumber",
                    F.round("l_extendedprice", 4).alias("peak_score")))


@register("t2_topk_per_group", """
WITH t AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
FROM t WHERE rn <= 3
""")
def t2_topk_per_group(spark, sf_dir):
    """T2 top-k mask (models/detector.py:270-281): top-3 per group."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                "o_orderkey")
    return (_t(spark, sf_dir, "orders")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("price")))


@register("t4_neighborhood_peak", """
WITH t AS (
  SELECT event_id, user_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS nmax
  FROM events)
SELECT event_id, user_id, round(value, 4) AS value
FROM t WHERE value >= nmax
""")
def t4_neighborhood_peak(spark, sf_dir):
    """T4 3×3 max-pool keypoint NMS, 1-D relational demo: rows that are
    their own neighborhood max (models/detector.py:289-296)."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-1, 1))
    return (_t(spark, sf_dir, "events")
            .withColumn("nmax", F.max("value").over(w))
            .filter(F.col("value") >= F.col("nmax"))
            .select("event_id", "user_id",
                    F.round("value", 4).alias("value")))


@register("w6_lag_gap_check", """
WITH t AS (
  SELECT user_id, event_id, value,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts NULLS FIRST, event_id) AS prev_value
  FROM events)
SELECT user_id, event_id, round(value - prev_value, 4) AS dv
FROM t WHERE prev_value IS NOT NULL AND abs(value - prev_value) > 150.0
""")
def w6_lag_gap_check(spark, sf_dir):
    """W6 lag/lead pairwise checks (space_check.cpp:40-73)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (_t(spark, sf_dir, "events")
            .withColumn("prev_value", F.lag("value").over(w))
            .filter(F.col("prev_value").isNotNull()
                    & (F.abs(F.col("value") - F.col("prev_value")) > 150.0))
            .select("user_id", "event_id",
                    F.round(F.col("value") - F.col("prev_value"), 4)
                    .alias("dv")))


# =======================================================================
# Joins (J1, J5, J6) & set ops (U1, U2, U3)
# =======================================================================

@register("j1_range_join", """
SELECT r.r_regionkey AS bucket, count(*) AS n,
       round(sum(p.p_retailprice), 2) AS sum_price
FROM part p JOIN region r
  ON p.p_retailprice >= r.r_regionkey * 400.0
 AND p.p_retailprice <  (r.r_regionkey + 1) * 400.0
GROUP BY r.r_regionkey
""")
def j1_range_join(spark, sf_dir):
    """J1 box↔line-segment spatial join, relational skeleton: value BETWEEN
    interval bounds against a small broadcast dimension
    (hough_linefind.cpp:13-121)."""
    p = _t(spark, sf_dir, "part")
    r = _t(spark, sf_dir, "region")
    cond = ((p.p_retailprice >= r.r_regionkey * 400.0)
            & (p.p_retailprice < (r.r_regionkey + 1) * 400.0))
    return (p.join(F.broadcast(r), cond)
            .groupBy(F.col("r_regionkey").alias("bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("p_retailprice"), 2).alias("sum_price")))


@register("j5_distance_join", """
SELECT q.event_id AS probe_id, count(*) AS n_near
FROM events e JOIN (SELECT event_id, value FROM events WHERE event_id < 50) q
  ON abs(e.value - q.value) < 0.5 AND e.event_id <> q.event_id
GROUP BY q.event_id
""")
def j5_distance_join(spark, sf_dir):
    """J5 peak↔truth distance match (make_traindata3.py:102-115): broadcast
    distance join of a small probe set against the full table."""
    e = _t(spark, sf_dir, "events")
    q = (e.filter(F.col("event_id") < 50)
         .select(F.col("event_id").alias("probe_id"),
                 F.col("value").alias("qvalue")))
    return (e.join(F.broadcast(q),
                   (F.abs(e.value - F.col("qvalue")) < 0.5)
                   & (e.event_id != F.col("probe_id")))
            .groupBy("probe_id")
            .agg(F.count("*").alias("n_near")))


@register("j6_asof_next_line", """
WITH t AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_order,
         CAST(epoch(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey))
         - epoch(o_orderdate) AS BIGINT) AS wait_s
  FROM orders)
SELECT o_custkey, o_orderkey, next_order, wait_s
FROM t WHERE next_order IS NOT NULL
""")
def j6_asof_next_line(spark, sf_dir):
    """J6 line→next-line as-of edge (make_block.cpp:21-204): next row of the
    same partition along the sort axis."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ep = F.unix_timestamp("o_orderdate")
    return (_t(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_orderdate",
                    F.lead("o_orderkey").over(w).alias("next_order"),
                    (F.lead(ep).over(w) - ep).alias("wait_s"))
            .filter(F.col("next_order").isNotNull())
            .drop("o_orderdate"))


@register("u1_union_dedup", """
SELECT DISTINCT custkey FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
  UNION ALL
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
""")
def u1_union_dedup(spark, sf_dir):
    """U1 concat + dedup (process_merge, search_loop.cpp:562-573)."""
    a = (_t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
         .select(F.col("o_custkey").alias("custkey")))
    b = (_t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
         .select(F.col("c_custkey").alias("custkey")))
    return a.unionByName(b).dropDuplicates()


@register("u2_anti_join", """
SELECT c_custkey, c_nationkey FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
""")
def u2_anti_join(spark, sf_dir):
    """U2 unbound set difference (fix_unbined, search_loop.cpp:915-930):
    customers with no six-figure order (non-empty on the test data, so the
    oracle check exercises actual rows, not just an empty frame)."""
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 100000))
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_nationkey"))


@register("u3_union_all", """
SELECT src, count(*) AS n FROM (
  SELECT 'events' AS src FROM events
  UNION ALL SELECT 'orders' AS src FROM orders)
GROUP BY src
""")
def u3_union_all(spark, sf_dir):
    """U3 multi-source union (data_transformer.py:283-431)."""
    a = _t(spark, sf_dir, "events").select(F.lit("events").alias("src"))
    b = _t(spark, sf_dir, "orders").select(F.lit("orders").alias("src"))
    return a.unionByName(b).groupBy("src").agg(F.count("*").alias("n"))


# =======================================================================
# Scalar functions (F2, F4, F7) & classic agg (TPC-H Q1 shape)
# =======================================================================

_INV_01 = pow(MODULOS[0], MODULOS[1] - 2, MODULOS[1])
_INV_02 = pow(MODULOS[0], MODULOS[2] - 2, MODULOS[2])
_INV_12 = pow(MODULOS[1], MODULOS[2] - 2, MODULOS[2])


def _crt_sql(x: str) -> str:
    """Garner CRT reconstruction as pure integer SQL (both dialects)."""
    m0, m1, m2 = MODULOS
    return f"""
WITH r AS (
  SELECT {x} AS x, {x} % {m0} AS b0, {x} % {m1} AS b1, {x} % {m2} AS b2
  FROM lineitem GROUP BY {x}),
g AS (
  SELECT x, b0, b1, b2,
         ((b1 - b0) % {m1} + {m1}) * {_INV_01} % {m1} AS t1
  FROM r),
h AS (
  SELECT x, b0, b1, b2, t1,
         ((((b2 - (b0 + t1 * {m0})) % {m2}) + {m2}) * {_INV_02} % {m2})
           * {_INV_12} % {m2} AS t2
  FROM g)
SELECT x, b0, b1, b2,
       (b0 + t1 * {m0} + t2 * {m0} * {m1}) AS recon
FROM h
"""


@register("f2_crt_reconstruct", _crt_sql("l_orderkey"))
def f2_crt_reconstruct(spark, sf_dir):
    """F2 CRT codepoint factorization (util_func.py:92-126) as integer SQL:
    residues mod (1091,1093,1097) reconstruct the key exactly for keys below
    the moduli product."""
    m0, m1, m2 = MODULOS
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("x")).distinct())
    b0 = F.col("x") % m0
    b1 = F.col("x") % m1
    b2 = F.col("x") % m2
    t1 = ((b1 - b0) % m1 + m1) * _INV_01 % m1
    t2 = ((((b2 - (b0 + t1 * m0)) % m2) + m2) * _INV_02 % m2) * _INV_12 % m2
    return li.select("x", b0.alias("b0"), b1.alias("b1"), b2.alias("b2"),
                     (b0 + t1 * m0 + t2 * m0 * m1).alias("recon"))


@register("f4_ruby_decode", """
SELECT doc_id,
       regexp_replace(
         chr(65513) || split_part(text, ' ', 1) || chr(65514) || 'yomi' || chr(65515),
         chr(65513) || '(.*?)' || chr(65514) || '(.*?)' || chr(65515),
         '｜\\1《\\2》', 'g') AS aozora
FROM documents
""")
def f4_ruby_decode(spark, sf_dir):
    """F4 ruby markup decode (util_func.py:128-135) as a JVM-side
    regexp_replace over a constructed interlinear annotation."""
    from ..functions.ruby import decode_ruby_col

    marked = F.concat(F.lit("￹"), F.split(F.col("text"), " ").getItem(0),
                      F.lit("￺yomi￻"))
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", decode_ruby_col(marked, "aozora").alias("aozora")))


@register("f7_space_normalize", """
SELECT doc_id,
       regexp_replace(replace(text, ' ', '   '), '  +', ' ', 'g') AS norm_text
FROM documents
""")
def f7_space_normalize(spark, sf_dir):
    """F7 whitespace collapse (data_transformer.py:424-426): blow spaces up,
    then normalize back down JVM-side."""
    blown = F.replace(F.col("text"), F.lit(" "), F.lit("   "))
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.regexp_replace(blown, "  +", " ").alias("norm_text")))


@register("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the classic multi-agg groupBy (headline relational
    benchmark query; partial aggregation + single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.count("*").alias("count_order")))


@register("sessionize", """
WITH t AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id, event_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
  FROM t)
SELECT user_id, sess_id, count(*) AS n_events
FROM s GROUP BY user_id, sess_id
""")
def sessionize(spark, sf_dir):
    """Sessionization (streaming-analog batch form): 30-min gap splits via
    lag + running sum (SURVEY §2.9; session_window in streaming)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    t = (_t(spark, sf_dir, "events")
         .withColumn("new_sess",
                     F.when((ep - F.lag(ep).over(w) > 1800)
                            | F.lag(ep).over(w).isNull(), 1).otherwise(0)))
    t = t.withColumn("sess_id", F.sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    return (t.groupBy("user_id", "sess_id")
            .agg(F.count("*").alias("n_events")))


# =======================================================================
# Second coverage wave: P6, P7, A2, A10, A11, A12, T1, J2, F3, F5, F6,
# F8, F9, F11 (SURVEY.md §2)
# =======================================================================

@register("p6_contrast_filter", """
WITH th AS (
  SELECT l_returnflag AS flag,
         CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) / 5.0 AS th
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_orderkey, l.l_linenumber, round(l.l_extendedprice, 4) AS score
FROM lineitem l JOIN th ON l.l_returnflag = th.flag
WHERE l.l_extendedprice >= th.th
""")
def p6_contrast_filter(spark, sf_dir):
    """P6 contrast filter (process_ocr_base.py:543-575): two-pass
    median-threshold — aggregate median/5 per group, broadcast it back,
    keep rows above. The broadcast join is the scale idiom: the threshold
    side is tiny by construction."""
    li = _t(spark, sf_dir, "lineitem")
    th = (li.groupBy(F.col("l_returnflag").alias("flag"))
          .agg((F.expr("percentile(l_extendedprice, 0.5)") / 5.0).alias("th")))
    return (li.join(F.broadcast(th), li.l_returnflag == th.flag)
            .filter(F.col("l_extendedprice") >= F.col("th"))
            .select("l_orderkey", "l_linenumber",
                    F.round("l_extendedprice", 4).alias("score")))


@register("p7_separator_antijoin", """
WITH sep AS (
  SELECT DISTINCT CAST(floor(value / 10) AS BIGINT) AS cell
  FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id
FROM events e
WHERE e.event_type = 'view'
  AND NOT EXISTS (SELECT 1 FROM sep
                  WHERE sep.cell = CAST(floor(e.value / 10) AS BIGINT))
""")
def p7_separator_antijoin(spark, sf_dir):
    """P7 separator-mask filter (process_ocr_base.py:611-620): drop boxes
    whose center cell is occupied by a separator — a left-anti join of box
    cells against the (small, broadcastable) separator-cell set. The
    oracle is NOT EXISTS, not NOT IN: a NULL cell (NULL value) matches no
    separator and is KEPT — anti-join semantics on both engines (NOT IN
    would silently drop every row once sep contains a NULL, and drops
    NULL-cell rows always)."""
    e = _t(spark, sf_dir, "events")
    cell = F.floor(F.col("value") / 10).cast("long")
    sep = (e.filter(F.col("event_type") == "click")
           .select(cell.alias("cell")).distinct())
    boxes = (e.filter(F.col("event_type") == "view")
             .withColumn("cell", cell))
    return (boxes.join(F.broadcast(sep), "cell", "left_anti")
            .select("event_id", "user_id"))


@register("a2_neighborhood_max", """
SELECT a.event_id, a.user_id,
       round(max(b.value), 4) AS nbr_max
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND abs(CAST(floor(a.value) AS BIGINT) - CAST(floor(b.value) AS BIGINT)) <= 1
GROUP BY a.event_id, a.user_id
""")
def a2_neighborhood_max(spark, sf_dir):
    """A2 3×3 neighborhood code max (process_ocr_base.py:631-648),
    relational demo: self-join on |cell difference| ≤ 1 within a partition
    key, max over the neighborhood."""
    e = _t(spark, sf_dir, "events")
    a = e.select("event_id", "user_id", F.floor("value").cast("long").alias("cell"))
    b = e.select(F.col("user_id").alias("b_user"),
                 F.floor("value").cast("long").alias("b_cell"),
                 F.col("value").alias("b_value"))
    return (a.join(b, (a.user_id == b.b_user)
                   & (F.abs(a.cell - b.b_cell) <= 1))
            .groupBy("event_id", "user_id")
            .agg(F.round(F.max("b_value"), 4).alias("nbr_max")))


@register("a10_rollup_bbox", """
SELECT o_custkey, o_orderkey,
       round(min(l_quantity), 4) AS x1, round(max(l_quantity), 4) AS x2,
       count(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY ROLLUP (o_custkey, o_orderkey)
""")
def a10_rollup_bbox(spark, sf_dir):
    """A10 line→block bbox accumulation (process_ocr_base.py:348-448): the
    two-level (line, block) running extents as a ROLLUP — per-order bbox,
    per-customer bbox, and the grand total in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .rollup("o_custkey", "o_orderkey")
            .agg(F.round(F.min("l_quantity"), 4).alias("x1"),
                 F.round(F.max("l_quantity"), 4).alias("x2"),
                 F.count("*").alias("n")))


@register("a11_connected_components", """
WITH runs AS (
  SELECT s_suppkey, s_nationkey,
         CASE WHEN lag(s_nationkey) OVER (ORDER BY s_suppkey) = s_nationkey
              THEN 0 ELSE 1 END AS brk
  FROM supplier),
lbl AS (
  SELECT s_suppkey, s_nationkey,
         sum(brk) OVER (ORDER BY s_suppkey ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs)
SELECT CAST(min(s_suppkey) AS BIGINT) AS component, count(*) AS n_nodes,
       CAST(s_nationkey AS BIGINT) AS nation
FROM lbl GROUP BY run_id, s_nationkey
""")
def a11_connected_components(spark, sf_dir):
    """A11 connected components (prepare.cpp:6-66) as iterative min-label
    propagation over an edge list — the distributed CC idiom (join labels
    across edges, take min, repeat to fixpoint; O(log n) rounds on chains
    thanks to label doubling via both edge directions).

    Graph: supplier nodes, an edge between consecutive suppkeys of the same
    nation — so components are maximal consecutive same-nation runs, which
    the oracle computes in closed form (window run detection). The Spark
    side runs the actual iterative algorithm; the oracle is independent.
    """
    s = (_t(spark, sf_dir, "supplier")
         .select(F.col("s_suppkey").alias("node"),
                 F.col("s_nationkey").alias("nation")))
    nxt = s.select((F.col("node") + 1).alias("node"),
                   F.col("nation").alias("nation2"),
                   F.col("node").alias("src"))
    edges = (s.join(nxt, ["node"])
             .filter(F.col("nation") == F.col("nation2"))
             .select(F.col("src").alias("a"), F.col("node").alias("b")))
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).cache()
    labels = s.select("node", "nation", F.col("node").alias("label"))
    for rnd in range(32):  # ≥ log2(max run length) rounds; fixpoint-checked
        prop = (labels.join(edges, labels.node == edges.a)
                .groupBy(F.col("b").alias("node"))
                .agg(F.min("label").alias("nbr_label")))
        new = (labels.join(prop, "node", "left")
               .select("node", "nation",
                       F.least("label", F.coalesce("nbr_label", "label"))
                       .alias("label"),
                       (F.col("label") !=
                        F.least("label", F.coalesce("nbr_label", "label")))
                       .alias("_chg")))
        # localCheckpoint truncates lineage each round — 32 rounds of
        # stacked joins would otherwise grow the plan without bound;
        # superseded checkpoint blocks are reclaimed by the ContextCleaner
        # once the old frame's reference drops
        new = new.localCheckpoint(eager=True)
        # convergence flag rides the same pass (no labels-vs-labels join);
        # check every 2 rounds — label doubling converges fast and each
        # count pays one (cheap, checkpoint-backed) job
        if rnd % 2 == 1 or rnd == 31:
            if new.filter(F.col("_chg")).count() == 0:
                labels = new.drop("_chg")
                break
        labels = new.drop("_chg")
    edges.unpersist()
    return (labels.groupBy("label", "nation")
            .agg(F.count("*").alias("n_nodes"))
            .select(F.col("label").cast("long").alias("component"),
                    "n_nodes", F.col("nation").cast("long").alias("nation")))


@register("a12_cluster_prune", """
WITH comp AS (
  SELECT user_id, round(sum(value), 4) AS weight
  FROM events GROUP BY user_id HAVING sum(value) >= 4000)
SELECT e.event_id, e.user_id
FROM events e JOIN comp USING (user_id)
""")
def a12_cluster_prune(spark, sf_dir):
    """A12 cluster weight prune (prepare.cpp:114-133): sum component
    weight, erase light components, semi-join survivors back."""
    e = _t(spark, sf_dir, "events")
    keep = (e.groupBy("user_id").agg(F.sum("value").alias("wt"))
            .filter(F.col("wt") >= 4000).select("user_id"))
    return (e.join(keep, "user_id", "left_semi")
            .select("event_id", "user_id"))


@register("t1_threshold_scan", """
WITH t AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey,
                                     l_linenumber) AS rnk
  FROM lineitem)
SELECT l_returnflag, l_orderkey, l_linenumber, rnk
FROM t WHERE l_extendedprice >= 90000.0
""")
def t1_threshold_scan(spark, sf_dir):
    """T1 desc-sorted peak scan with cutoff (process_ocr_base.py:519-523):
    rank within partition in descending score order, keep above threshold —
    the vectorized form needs no early exit."""
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
    return (_t(spark, sf_dir, "lineitem")
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("l_extendedprice") >= 90000.0)
            .select("l_returnflag", "l_orderkey", "l_linenumber", "rnk"))


@register("j2_interval_overlap", """
WITH iv AS (
  SELECT o_custkey, o_orderkey, epoch(o_orderdate) AS lo,
         epoch(o_orderdate) + 604800 AS hi
  FROM orders)
SELECT a.o_custkey, a.o_orderkey AS chain_a, b.o_orderkey AS chain_b
FROM iv a JOIN iv b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.lo <= b.hi AND b.lo <= a.hi
""")
def j2_interval_overlap(spark, sf_dir):
    """J2 chain–chain merge candidates (search_loop.cpp:576-891), relational
    skeleton: equi-key self-join + interval-overlap predicate (the fixpoint
    merge itself is page-local NumPy in the pipeline). The equi-key keeps
    the join from going quadratic; at scale the interval predicate rides on
    the custkey shuffle."""
    o = _t(spark, sf_dir, "orders")
    lo = F.unix_timestamp("o_orderdate")
    iv = o.select("o_custkey", "o_orderkey", lo.alias("lo"),
                  (lo + 604800).alias("hi"))
    a, b = iv.alias("a"), iv.alias("b")
    return (a.join(b, (F.col("a.o_custkey") == F.col("b.o_custkey"))
                   & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
                   & (F.col("a.lo") <= F.col("b.hi"))
                   & (F.col("b.lo") <= F.col("a.hi")))
            .select(F.col("a.o_custkey").alias("o_custkey"),
                    F.col("a.o_orderkey").alias("chain_a"),
                    F.col("b.o_orderkey").alias("chain_b")))


@register("f3_codepoint_guard", """
WITH cp AS (SELECT DISTINCT l_orderkey % 300000 AS cp FROM lineitem)
SELECT cp,
       CASE WHEN cp BETWEEN 55296 AND 57343 THEN 65533
            WHEN cp > 262143 THEN 65533
            ELSE cp END AS cp_safe
FROM cp
""")
def f3_codepoint_guard(spark, sf_dir):
    """F3 codepoint guard (process_ocr_base.py:236-247): surrogates
    U+D800–DFFF and codes > 0x3FFFF map to U+FFFD."""
    cp = (_t(spark, sf_dir, "lineitem")
          .select((F.col("l_orderkey") % 300000).alias("cp")).distinct())
    return cp.select(
        "cp",
        F.when((F.col("cp") >= 0xD800) & (F.col("cp") <= 0xDFFF), 0xFFFD)
        .when(F.col("cp") > 0x3FFFF, 0xFFFD)
        .otherwise(F.col("cp")).alias("cp_safe"))


@register("f5_ruby_html_encode", """
SELECT doc_id,
       regexp_replace(
         chr(65513) || split_part(text, ' ', 1) || chr(65514) || 'yomi' || chr(65515),
         chr(65513) || '(.*?)' || chr(65514) || '(.*?)' || chr(65515),
         '<ruby>\\1<rt>\\2</rt></ruby>', 'g') AS html_ruby
FROM documents
""")
def f5_ruby_html_encode(spark, sf_dir):
    """F5 ruby → HTML encode (util_func.py:137-139)."""
    marked = F.concat(F.lit("￹"),
                      F.split(F.col("text"), " ").getItem(0),
                      F.lit("￺yomi￻"))
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.regexp_replace(
                        marked, "￹(.*?)￺(.*?)￻",
                        "<ruby>$1<rt>$2</rt></ruby>").alias("html_ruby")))


@register("f6_whitespace_classify", """
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_ascii_space,
       CAST(len(regexp_extract_all(text, '[\\t\\n\\x{00a0}\\x{3000}]')) AS BIGINT) AS n_other_space
FROM documents
""")
def f6_whitespace_classify(spark, sf_dir):
    """F6 whitespace classification (process_ocr_base.py:11-37): counts per
    whitespace class, pure string arithmetic + regexp_count."""
    t = F.col("text")
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    (F.length(t) - F.length(F.replace(t, F.lit(" "))))
                    .cast("long").alias("n_ascii_space"),
                    F.regexp_count(t, F.lit("[\\t\\n\\u00a0\\u3000]"))
                    .cast("long").alias("n_other_space")))


@register("f8_script_class", """
SELECT doc_id,
       regexp_matches(text, '[A-Za-z]') AS has_ascii,
       regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk,
       regexp_matches(text, '[\\x{ac00}-\\x{d7af}]') AS has_hangul
FROM documents
""")
def f8_script_class(spark, sf_dir):
    """F8 script class tests (data_transformer.py:53-57): ASCII / CJK /
    Hangul presence via rlike."""
    t = F.col("text")
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    t.rlike("[A-Za-z]").alias("has_ascii"),
                    t.rlike("[\\u4e00-\\u9fff]").alias("has_cjk"),
                    t.rlike("[\\uac00-\\ud7af]").alias("has_hangul")))


@register("f9_utf32_codepoints", """
SELECT doc_id,
       array_to_string([ascii(c) for c in
                        string_split_regex(substr(text, 1, 8), '')], ',')
         AS cp_head
FROM documents
""")
def f9_utf32_codepoints(spark, sf_dir):
    """F9 UTF-32 encode (data_transformer.py:672-683): text → codepoint
    array (first 8 chars), serialized for engine-identical comparison."""
    return (_t(spark, sf_dir, "documents")
            .select("doc_id",
                    F.concat_ws(",", F.expr(
                        "transform(split(substring(text, 1, 8), ''), "
                        "c -> cast(ascii(c) as string))")).alias("cp_head")))


@register("f11_histogram", """
SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
            WHEN l_extendedprice >= 105000.0 THEN 17
            ELSE 1 + CAST(floor((l_extendedprice - 900.0)
                                / ((105000.0 - 900.0) / 16)) AS BIGINT) END
         AS bucket,
       count(*) AS n
FROM lineitem GROUP BY 1
""")
def f11_histogram(spark, sf_dir):
    """F11 histogram (util_func.py:23-80): fixed-width binning + count —
    the relational form of the 256-bin color histogram."""
    return (_t(spark, sf_dir, "lineitem")
            .select(F.width_bucket("l_extendedprice", F.lit(900.0),
                                   F.lit(105000.0), F.lit(16)).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n")))


@register("a6_ema_scan", """
WITH t AS (
  SELECT l_orderkey, l_quantity,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity, l_extendedprice)
           AS rn
  FROM lineitem),
w AS (
  SELECT l_orderkey, rn,
         sum((CASE WHEN rn = 1 THEN l_quantity
                   ELSE 0.75 * l_quantity END)
             * power(0.25, -(rn - 1)))
           OVER (PARTITION BY l_orderkey ORDER BY rn
                 ROWS UNBOUNDED PRECEDING) AS s
  FROM t)
SELECT l_orderkey, rn, round(s * power(0.25, rn - 1), 6) AS ema
FROM w
""")
def a6_ema_scan(spark, sf_dir):
    """A6 EMA fold a_n = 0.25·a_{n-1} + 0.75·x_n (search_loop.cpp:607-619)
    in closed form: a_n = 0.25^{n-1}x_1 + Σ_{j≥2} 0.75·0.25^{n-j}x_j,
    evaluated as a running sum of pre-weighted terms rescaled by 0.25^{rn-1}
    — one partition-local window, no recursion. Over l_quantity (small
    integers) with quarter-power weights every intermediate is an exact
    binary fraction, so Spark and DuckDB agree bit-for-bit (arbitrary
    doubles hit 1-ulp cross-engine rounding at the round() knife edge)."""
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber",
                                                 "l_quantity",
                                                 "l_extendedprice")
    t = (_t(spark, sf_dir, "lineitem")
         .withColumn("rn", F.row_number().over(w)))
    term = (F.when(F.col("rn") == 1, F.col("l_quantity"))
            .otherwise(0.75 * F.col("l_quantity"))
            * F.pow(F.lit(0.25), -F.col("rn") + 1))
    run = Window.partitionBy("l_orderkey").orderBy("rn") \
        .rowsBetween(Window.unboundedPreceding, 0)
    ema = F.sum(term).over(run) * F.pow(F.lit(0.25), F.col("rn") - 1)
    return t.select("l_orderkey", "rn", F.round(ema, 6).alias("ema"))
