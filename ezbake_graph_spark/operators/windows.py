"""Window, sort, and top-k operators (SURVEY.md §2E, §2F).

Determinism: every window/orderBy carries a unique tie-break key
(SURVEY §5.3 rule 4). Running float sums use the exact micro-unit
pattern — window frames are summed in different orders by Spark
(sequential) and DuckDB (segment tree), so raw double frames drift.

Scale: a window over ``partitionBy(k)`` is one keyed shuffle + one
sort per partition; global sorts (F1) are range-partitioned; top-k
(F3) plans as TakeOrderedAndProject — per-partition heads only, no
full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import SCALE, money_sum_expr, sql_money_sum
from ezbake_graph_spark.registry import register

_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


# Spark twin of _RANK_SQL minus the presentational ORDER BY (output is
# customer-proportional — no global sort); SQL-text per tables.ensure_views.
_RANK_SPARK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("win_rank_topn", oracle=_RANK_SQL, tags=("E1", "bench"))
def win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (E1): top-3 orders per customer."""
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_RANK_SPARK)


_LAG_SQL = """
SELECT event_id, user_id, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       round(value - lag(value) OVER w, 6) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


@register("win_lag_lead", oracle=_LAG_SQL, tags=("E2",))
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset window functions (E2): lag/lead with unique tie-break."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        )
        .orderBy("event_id")
    )


_RUNNING_SQL = f"""
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 1000000 AS running_value,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM events
ORDER BY event_id
"""


# Spark twin of _RUNNING_SQL minus the trailing global sort
# (presentation-only; hash is order-insensitive; sorting full output
# is an anti-pattern at scale). SQL-text per tables.ensure_views.
_RUNNING_SPARK = """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) / 1000000 AS running_value,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM events
"""


@register("win_running_sum", oracle=_RUNNING_SQL, tags=("E3", "bench"))
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total frame (E3), exact micro-unit accumulation."""
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_RUNNING_SPARK)


_SLIDING_SQL = """
SELECT event_id, user_id,
       (CAST(sum(CAST(round(value * 1000000) AS BIGINT))
             OVER w AS DOUBLE) / count(*) OVER w) / 1000000 AS sliding_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


@register("win_sliding_avg", oracle=_SLIDING_SQL, tags=("E4",))
def win_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame (E4): 4-row moving average, exact micro-units."""
    ev = tables.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    micro = F.round(F.col("value") * SCALE).cast("long")
    avg = (F.sum(micro).over(w).cast("double") / F.count(F.lit(1)).over(w)) / SCALE
    return (
        ev.select("event_id", "user_id", avg.alias("sliding_avg"))
        .orderBy("event_id")
    )


_DISTRIBUTION_SQL = """
SELECT c_custkey, c_nationkey,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       ntile(4) OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


@register("win_distribution", oracle=_DISTRIBUTION_SQL, tags=("E5",))
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (E5).

    Deliberately NOT rounded: pr/cd are exact integer ratios and both
    engines produce the identical IEEE double for (rank-1)/(n-1), so
    raw values hash-match — whereas round(x, 6) DIVERGES on exact
    halfway rationals (e.g. 41/640 = 0.0640625: Spark rounds the
    shortest decimal repr via BigDecimal → 0.064063, DuckDB rounds the
    binary double → 0.064062). §5.3 rule 2 applies to *accumulated*
    floats, not exact rationals."""
    c = tables.load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_custkey")
    )


_TOPK_GROUP_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 2
ORDER BY p_brand, rn
"""


@register("win_topk_per_group", oracle=_TOPK_GROUP_SQL, tags=("E6",))
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (E6): rank filter over a keyed window."""
    p = tables.load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


_SORT_SQL = """
SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber
FROM lineitem
ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 1000
"""


@register("sort_multikey", oracle=_SORT_SQL, tags=("F1", "F2"))
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort + limit (F1/F2). The full key list is a
    total order, so the LIMIT prefix is deterministic. Spark plans
    orderBy+limit as TakeOrderedAndProject (no full global sort)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(1000)
    )


_Q3_SQL = f"""
SELECT o_orderkey, o_orderdate,
       {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# Spark-dialect twin of _Q3_SQL: explicit BROADCAST hints reproduce the
# F.broadcast() plan (fused BHJ + left-semi pipeline over lineitem,
# closing TakeOrderedAndProject). SQL-text form per the measured
# client-build rationale in tables.ensure_views (45-61 ms DataFrame
# build vs 11 ms SQL parse at HEAD).
_Q3_SPARK = f"""
SELECT /*+ BROADCAST(o), BROADCAST(c) */ o_orderkey, o_orderdate,
       {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN (SELECT o_orderkey, o_orderdate, o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') o
  ON l_orderkey = o_orderkey
LEFT SEMI JOIN (SELECT c_custkey FROM customer
                WHERE c_mktsegment = 'BUILDING') c
  ON o_custkey = c_custkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@register("topk_revenue_q3", oracle=_Q3_SQL, tags=("F3", "bench"))
def topk_revenue_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style top-k by revenue (F3). Revenue is the exact
    micro-unit sum, so the top-10 cut is identical in both engines;
    o_orderkey breaks ties deterministically.

    Fact-never-shuffled with a DEPTH-1 broadcast chain: orders and the
    segment-filtered customer keys broadcast independently (built
    concurrently by the driver) and lineitem streams through one fused
    BHJ + semi-join pipeline into the partial agg, closing with
    TakeOrderedAndProject (ORDER BY + LIMIT in the text). At 100 TB
    the date-filtered orders side is the broadcast-budget gate; AQE
    demotes that one join to SMJ when it outgrows it."""
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_Q3_SPARK)


_FIRST_LAST_SQL = """
SELECT event_id, user_id,
       first_value(value) OVER w AS first_val,
       last_value(value) OVER w AS last_val,
       nth_value(value, 3) OVER w AS third_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY event_id
LIMIT 1000
"""


@register("win_first_last", oracle=_FIRST_LAST_SQL, tags=("E-extra",))
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over a running frame per user (E-family
    completion). Raw stored doubles pass through unaggregated — no
    rounding needed. The (ts, event_id) order key is unique, so every
    frame content is deterministic."""
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.first("value").over(w).alias("first_val"),
            F.last("value").over(w).alias("last_val"),
            F.nth_value("value", 3).over(w).alias("third_val"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


_RANGE_TIME_SQL = f"""
SELECT event_id,
       (CAST(sum(CAST(round(value * {SCALE}) AS BIGINT)) OVER w AS DOUBLE)
        / count(*) OVER w) / {SCALE} AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
LIMIT 2000
"""


@register("win_range_time", oracle=_RANGE_TIME_SQL, tags=("E4b",))
def win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user trailing-1h average (E4's
    range variant with a real time axis). The frame is defined by
    timestamp distance, not row count, so peers with equal ts are
    included on both engines identically. The average is an exact
    micro-unit window sum / count — DuckDB evaluates window sums with
    a segment tree (pairwise order) while Spark slides sequentially,
    so raw DOUBLE window sums drift in the last ulp; integer sums
    don't."""
    from pyspark.sql import Window

    ev = tables.load(spark, sf_dir, "events")
    # RANGE frame over a timestamp column: Spark needs a numeric order
    # key for rangeBetween — seconds would truncate, so use µs.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600 * 1_000_000, 0)
    )
    micro = F.round(F.col("value") * SCALE).cast("long")
    return (
        ev.select(
            "event_id",
            (
                (F.sum(micro).over(w).cast("double") / F.count(F.lit(1)).over(w))
                / SCALE
            ).alias("avg_1h"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


_ROLLING_MEDIAN_SQL = """
SELECT event_id,
       quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.5)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 1000000
         AS med_7
FROM events
ORDER BY event_id
LIMIT 2000
"""


@register("win_rolling_median", oracle=_ROLLING_MEDIAN_SQL, tags=("E4c", "M87"))
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (E4c): per-user trailing-7-row median of the
    event value — the robust-statistics smoother (median absolute
    filters shrug off the outliers that wreck rolling means). Planned
    as one keyed shuffle + per-partition sort, then a WindowExec whose
    aggregate is ``percentile`` over the frame. Exactness: the frame
    holds integer micro-units, and a median of integers is either an
    element or the midpoint of two (x.5 micro) — exact in double either
    way, and Spark's ``percentile`` and DuckDB's ``quantile_cont`` use
    the same (n-1)*p linear interpolation, so no rounding is needed.
    At 100 TB a rank-based window over a frame is O(frame log frame)
    per row in both engines; the per-user keyed shuffle is the only
    data movement."""
    ev = tables.load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    micro = F.round(F.col("value") * SCALE).cast("long")
    return (
        ev.select(
            "event_id",
            (F.expr(
                f"percentile(CAST(round(value * {SCALE}) AS BIGINT), 0.5)"
            ).over(w) / SCALE).alias("med_7"),
        )
        .orderBy("event_id")
        .limit(2000)
    )
