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

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import MODULOS

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, sql)
        return fn
    return deco


def registry() -> dict[str, tuple[SparkQuery, str | None]]:
    return dict(_REGISTRY)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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

@register("w3_reading_order", """
SELECT p_partkey, p_size,
       rank() OVER (ORDER BY p_size DESC, p_partkey) AS read_order
FROM part
""")
def w3_reading_order(spark, sf_dir):
    """W3 block reading order as a global multi-key rank
    (make_block.cpp:1633-1694)."""
    w = Window.orderBy(F.desc("p_size"), "p_partkey")
    return (_t(spark, sf_dir, "part")
            .select("p_partkey", "p_size",
                    F.rank().over(w).alias("read_order")))


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
         max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
                          ORDER BY ts, event_id) AS prev_value
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
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""")
def u2_anti_join(spark, sf_dir):
    """U2 unbound set difference (fix_unbined, search_loop.cpp:915-930)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
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
                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id, event_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
