"""Aggregation operators (SURVEY.md §2D).

All hash aggregates: Spark plans these as partial (map-side combine) +
final HashAggregate around one keyed shuffle — exactly the shape that
scales to 100 TB. Float sums use the exact micro-unit pattern from
``determinism.py`` so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import (
    SCALE,
    bounded_sort,
    money_avg_expr,
    money_sum_expr,
    sql_money_avg,
    sql_money_sum,
)
from ezbake_graph_spark.registry import register

_Q1_CUTOFF = "2000-12-01 00:00:00"

_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_money_sum("l_quantity")} AS sum_qty,
  {sql_money_sum("l_extendedprice")} AS sum_base_price,
  {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  {sql_money_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {sql_money_avg("l_quantity")} AS avg_qty,
  {sql_money_avg("l_extendedprice")} AS avg_price,
  {sql_money_avg("l_discount")} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# Spark-dialect twin of _Q1_SQL (identical text here — the micro-unit
# money pattern is dialect-portable), parsed JVM-side in ONE call. The
# DataFrame-API build of this 10-aggregate query cost 96-130 ms of
# Python/Py4J chatter PER CALL (measured round 8: one JVM round trip
# per Column op) — pure client overhead repeated on every invocation,
# vs 20 ms for the SQL text. Same logical plan either way.
_Q1_SPARK = _Q1_SQL.replace("ORDER BY l_returnflag, l_linestatus", "")


@register("agg_pricing_q1", oracle=_Q1_SQL, tags=("D1", "bench"))
def agg_pricing_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (D1) — the flagship query.

    Single keyed shuffle; partial aggregation happens map-side. The
    shipdate filter is pushed into the parquet scan (PushedFilters).
    SQL-text form over the session views (see tables.ensure_views);
    the closing sort is bounded_sort, outside the SQL text, because a
    SQL ORDER BY would plan the RangePartitioning exchange this
    group-bounded (≤6 rows) result does not need.
    """
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_Q1_SPARK).transform(
        bounded_sort, "l_returnflag", "l_linestatus"
    )


_COUNT_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# Spark twin of _COUNT_DISTINCT_SQL minus the presentational ORDER BY
# (bounded_sort outside the text); SQL-text form per tables.ensure_views.
# TWO-LEVEL reaggregation instead of count(DISTINCT ...): the same two
# keyed shuffles, but without the Expand operator that duplicates every
# map-side row once per aggregate — measured 0.197 s -> 0.151 s warm at
# sf0.1 (VERDICT r8 #7), and at 100 TB the halved map-side volume is
# the difference that matters. Results are identical (sum of per-user
# counts == count(*); count of (type, user) groups == count distinct).
_COUNT_DISTINCT_SPARK = """
SELECT event_type,
       count(*) AS n_users,
       sum(cnt) AS n_events
FROM (
  SELECT event_type, user_id, count(*) AS cnt
  FROM events
  GROUP BY event_type, user_id
)
GROUP BY event_type
"""


@register("agg_count_distinct", oracle=_COUNT_DISTINCT_SQL, tags=("D2", "bench"))
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) (D2) via skew-safe two-level reagg."""
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_COUNT_DISTINCT_SPARK).transform(bounded_sort, "event_type")


@register("agg_approx_distinct", oracle=None, tags=("D3", "rows-only"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approx count-distinct (D3). Sketches differ across engines →
    rows-only check (SURVEY §5.3 rule 5). At 100 TB this replaces D2:
    constant-size state instead of an expand shuffle."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


_ROLLUP_SQL = f"""
SELECT r_name, n_name,
       count(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


# Spark-dialect twin of _ROLLUP_SQL: explicit BROADCAST hints replace
# the F.broadcast() wrappers (same BroadcastHashJoin plan), and the
# closing sort stays outside the text as bounded_sort (≤31 group rows).
_ROLLUP_SPARK = f"""
SELECT /*+ BROADCAST(nation), BROADCAST(region) */ r_name, n_name,
       count(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


@register("agg_rollup", oracle=_ROLLUP_SQL, tags=("D4", "bench"))
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-granularity aggregate (D4); dims broadcast.

    SQL-text form (see tables.ensure_views for the measured
    client-side build-cost rationale); one Expand + hash aggregate,
    single keyed shuffle, identical to the previous DataFrame build.
    """
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_ROLLUP_SPARK).transform(
        bounded_sort,
        F.col("r_name").asc_nulls_first(),
        F.col("n_name").asc_nulls_first(),
    )


_CUBE_SQL = f"""
SELECT c_mktsegment, r_name,
       count(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE(c_mktsegment, r_name)
ORDER BY c_mktsegment NULLS FIRST, r_name NULLS FIRST
"""


@register("agg_cube", oracle=_CUBE_SQL, tags=("D4", "M57"))
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE multi-dimensional aggregate (D4): all four grouping sets of
    (segment, region) in one pass. Like ``agg_rollup`` this plans as a
    single Expand + hash aggregate — one shuffle with map-side partial
    aggregation for every granularity, instead of four scans."""
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.cube("c_mktsegment", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum_expr(F.col("c_acctbal")).alias("sum_acctbal"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("r_name").asc_nulls_first(),
        )
    )


_FILTERED_SQL = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
       {sql_money_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END")} AS open_value
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_filtered", oracle=_FILTERED_SQL, tags=("D5",))
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (D5): count_if / conditional sums."""
    o = tables.load(spark, sf_dir, "orders")
    open_price = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(
        F.lit(0.0)
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            money_sum_expr(open_price).alias("open_value"),
        )
        .orderBy("o_orderpriority")
    )


_COLLECT_SQL = """
SELECT n_regionkey AS regionkey,
       array_to_string(list_sort(list(n_name)), '|') AS nations
FROM nation
GROUP BY n_regionkey
ORDER BY regionkey
"""


@register("agg_collect", oracle=_COLLECT_SQL, tags=("D6",))
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg (D6). Canonically sorted then stringified so the
    order-insensitive hash can't flake on array representation."""
    n = tables.load(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias("nations")
        )
        .orderBy("regionkey")
    )


_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_percentile", oracle=_PERCENTILE_SQL, tags=("D7",))
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (D7). Deterministic given the
    identical input multiset (sort-based, no summation drift)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


_MOMENTS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_discount), 6) AS corr_qty_disc
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_moments", oracle=_MOMENTS_SQL, tags=("D8",))
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments (D8). Computed over small-magnitude columns
    (quantity, discount) so cross-engine numeric drift stays orders of
    magnitude under the 6-dp rounding grid (SURVEY §5.3)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
        )
        .orderBy("l_returnflag")
    )


_DISTINCT_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_orderstatus, o_orderpriority
"""


@register("agg_distinct_rows", oracle=_DISTINCT_SQL, tags=("D9",))
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (D9) — planned as a keyed hash aggregate."""
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_SQL = f"""
SELECT CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY hour_of_day
ORDER BY hour_of_day
"""


@register("agg_pivot", oracle=_PIVOT_SQL, tags=("D-extra",))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): event counts per hour-of-day x type.
    The pivot value list is explicit, so no extra distinct-values pass
    runs and the output schema is static — the form that scales."""
    ev = tables.load(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.hour("ts").alias("hour_of_day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "hour_of_day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    ).orderBy("hour_of_day")


_HIST_BUCKET = 10_000.0

_HISTOGRAM_SQL = f"""
SELECT CAST(floor(l_extendedprice / {_HIST_BUCKET}) AS BIGINT) AS bucket,
       count(*) AS n_items,
       {sql_money_sum("l_extendedprice")} AS sum_price
FROM lineitem
GROUP BY bucket
ORDER BY bucket
"""


@register("agg_histogram", oracle=_HISTOGRAM_SQL, tags=("D-extra",))
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: one keyed aggregate over the bucketed
    value — the distributed histogram shape (bucket id is the shuffle
    key; bucket count, not row count, bounds the result)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_extendedprice") / _HIST_BUCKET).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum_expr(F.col("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("bucket")
    )


@register("agg_approx_percentile", oracle=None, tags=("D-extra", "rows-only"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (KLL-style sketch): mergeable, constant
    memory — the scale path where exact percentile (D7) would need a
    full sort. Accuracy vs exact is asserted in tests."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", 0.5, 10_000).alias("p50_approx"),
            F.approx_percentile("l_extendedprice", 0.95, 10_000).alias("p95_approx"),
        )
        .orderBy("l_returnflag")
    )


_SALTED_SQL = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_N_SALTS = 16


@register("agg_salted_two_phase", oracle=_SALTED_SQL, tags=("D-extra", "skew"))
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation — the hot-key skew pattern made
    explicit. Phase 1 groups by (key, salt) so a key with 10% of all
    rows spreads over ``_N_SALTS`` reducers; phase 2 merges the salted
    partials (one row per key x salt — tiny). Result is identical to
    the direct aggregate (the oracle IS the direct aggregate).
    o_orderpriority has only 5 distinct values — exactly the
    low-cardinality/high-volume shape where an unsalted shuffle would
    send each key to one reducer. Spark's partial aggregation already
    combines map-side, so salting matters when the *reduce* state per
    key is big (collect_list, distinct sets); the pattern is the same.
    """
    o = tables.load(spark, sf_dir, "orders")
    micro = F.round(F.col("o_totalprice") * SCALE).cast("long")
    salted = (
        o.withColumn("salt", F.pmod(F.col("o_orderkey"), F.lit(_N_SALTS)))
        .groupBy("o_orderpriority", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(micro).alias("pmicro"),
        )
    )
    return (
        salted.groupBy("o_orderpriority")
        .agg(
            F.sum("pn").alias("n_orders"),
            (F.sum("pmicro").cast("double") / SCALE).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


_MODE_SQL = """
WITH counts AS (
  SELECT l_returnflag, l_quantity, count(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_quantity
), ranked AS (
  SELECT l_returnflag, l_quantity, n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_quantity) AS rn
  FROM counts
)
SELECT l_returnflag, l_quantity AS mode_quantity, n AS n_rows
FROM ranked WHERE rn = 1 ORDER BY l_returnflag
"""


@register("agg_mode", oracle=_MODE_SQL, tags=("D-extra",))
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a deterministic
    smallest-value tie-break. Built-in mode()/any tie behavior is
    engine-specific, so the portable form is count + rank — two keyed
    shuffles, both map-side combinable; the window partitions by the
    same key as the first groupBy so AQE keeps it co-partitioned."""
    from pyspark.sql import Window

    li = tables.load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("n").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_GROUPING_SETS_SQL = f"""
SELECT c_mktsegment, r_name,
       count(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((c_mktsegment), (r_name))
ORDER BY c_mktsegment NULLS FIRST, r_name NULLS FIRST
"""


@register("agg_grouping_sets", oracle=_GROUPING_SETS_SQL, tags=("D-extra",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent group-bys ((segment),
    (region)) answered in one pass over the join. Spark plans this as
    a single Expand + partial/final HashAggregate around ONE shuffle,
    vs two full scans for separate queries — the same dimension-table
    broadcast star as agg_cube, but with only the requested sets, not
    the full power set (at 100 TB CUBE over k columns is 2^k sets;
    GROUPING SETS keeps the Expand factor at exactly what's asked)."""
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.groupingSets(
            [["c_mktsegment"], ["r_name"]], "c_mktsegment", "r_name"
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum_expr(F.col("c_acctbal")).alias("sum_acctbal"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("r_name").asc_nulls_first(),
        )
    )


_UNPIVOT_SQL = f"""
WITH a AS (
  SELECT l_returnflag,
         {sql_money_sum("l_quantity")} AS sum_qty,
         {sql_money_sum("l_extendedprice")} AS sum_price,
         {sql_money_sum("l_discount")} AS sum_disc,
         {sql_money_sum("l_tax")} AS sum_tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
UNION ALL
SELECT l_returnflag, 'sum_price', sum_price FROM a
UNION ALL
SELECT l_returnflag, 'sum_disc', sum_disc FROM a
UNION ALL
SELECT l_returnflag, 'sum_tax', sum_tax FROM a
ORDER BY l_returnflag, measure
"""


@register("agg_unpivot", oracle=_UNPIVOT_SQL, tags=("D-extra",))
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide → long), the inverse of agg_pivot: four
    per-flag measure columns become (measure, value) rows. Spark's
    ``unpivot`` is a zero-shuffle Expand over the already-aggregated
    (tiny) frame — the aggregation before the melt is the scale move,
    never melt-then-aggregate (which would 4x the shuffled bytes)."""
    li = tables.load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        money_sum_expr(F.col("l_quantity")).alias("sum_qty"),
        money_sum_expr(F.col("l_extendedprice")).alias("sum_price"),
        money_sum_expr(F.col("l_discount")).alias("sum_disc"),
        money_sum_expr(F.col("l_tax")).alias("sum_tax"),
    )
    return wide.unpivot(
        "l_returnflag",
        ["sum_qty", "sum_price", "sum_disc", "sum_tax"],
        "measure",
        "value",
    ).orderBy("l_returnflag", "measure")


@register("agg_sketch_merge", oracle=None, tags=("D-extra", "rows-only", "M81"))
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable-sketch rollup — THE 100 TB distinct-count
    pattern: build one HLL sketch per partition scope (here per order
    status), then union-merge sketches into the global estimate
    without ever re-touching the raw data. Sketches are small (~KB),
    associative, and mergeable, so a daily/per-partition sketch table
    answers any cross-scope distinct question with a KB-sized merge —
    re-scanning 100 TB for each ad-hoc distinct query is the
    anti-pattern this replaces. Rows-only by design (sketch estimates
    are engine-specific; SURVEY §5.3 rule 5); the merged estimate is
    invariant-tested against the exact distinct in
    tests/test_aggregates.py."""
    o = tables.load(spark, sf_dir, "orders")
    per_scope = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    merged = per_scope.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct_customers"),
        F.sum("n_orders").alias("n_orders"),
    )
    return merged


_BOOL_SQL = """
SELECT o_orderstatus,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS n_urgent
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("agg_bool", oracle=_BOOL_SQL, tags=("D-extra", "M102"))
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (D-extra): ``bool_and`` / ``bool_or`` — the
    data-quality assertion primitives ("every row in this partition
    satisfies the invariant") that short-circuit map-side: a partial
    FALSE (for every) kills the AND without seeing more rows. One keyed
    shuffle of 1-bit partials."""
    o = tables.load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        )
        .orderBy("o_orderstatus")
    )


_WAVG_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       (CAST(sum(CAST(l_quantity AS BIGINT)
                 * CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
        / sum(CAST(l_quantity AS BIGINT))) / 1000000 AS wavg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_weighted_avg", oracle=_WAVG_SQL, tags=("D-extra", "M110"))
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (D-extra): quantity-weighted mean price per
    return flag — Σ(w·x)/Σw with integer weights times micro-unit
    values, so both sums are exact and the final two IEEE divisions are
    bit-identical (a raw DOUBLE Σ(w·x) drifts with summation order at
    data scale, same failure mode as plain money sums). Headroom note:
    w·x_micro ≈ 5e12/row caps the exact window around ~1e6 rows/group
    in one BIGINT; beyond that, pre-aggregate per partition or drop one
    scale digit (SCALE=1e5) — same plan, one keyed shuffle with
    map-side partials."""
    li = tables.load(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("long")
    xm = F.round(F.col("l_extendedprice") * 1_000_000).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(w).alias("total_qty"),
            ((F.sum(w * xm).cast("double") / F.sum(w)) / 1_000_000).alias(
                "wavg_price"
            ),
        )
        .orderBy("l_returnflag")
    )


_STRINGAGG_SQL = """
SELECT c_nationkey,
       count(*) AS n_customers,
       string_agg(c_name, ',' ORDER BY c_name) AS names
FROM customer
WHERE c_custkey < 300
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("agg_string_agg", oracle=_STRINGAGG_SQL, tags=("D-extra", "M116"))
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (D-extra, Spark 4 ``listagg``):
    concatenate group members in an explicit WITHIN GROUP order — the
    report/export shape (and the one aggregate where determinism rule 4
    is unavoidable: without the ORDER BY, concatenation order is
    partition-dependent and the hash flakes). DuckDB's string_agg with
    ORDER BY is the exact equivalent. Map-side partials still apply
    (Spark buffers per-group elements, sorts at merge)."""
    c = tables.load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").alias(
                "names"
            ),
        )
        .orderBy("c_nationkey")
    )


_ENTROPY_SQL = """
WITH c AS (
  SELECT source, lang, count(*) AS n
  FROM documents GROUP BY source, lang
), t AS (
  SELECT source, sum(n) AS total FROM c GROUP BY source
)
SELECT c.source,
       CAST(t.total AS BIGINT) AS n_docs,
       round(log2(CAST(t.total AS DOUBLE))
             - sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))
               / CAST(t.total AS DOUBLE), 6) AS lang_entropy_bits
FROM c JOIN t USING (source)
GROUP BY c.source, t.total
ORDER BY c.source
"""


@register("agg_entropy", oracle=_ENTROPY_SQL, tags=("D-extra", "M117"))
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the lang distribution per source (D-extra) —
    the mixture-diversity diagnostic a pretraining-corpus curator runs
    before setting sampling weights.

    Determinism: H = log2(N) - sum(n_i*log2(n_i))/N over exact integer
    counts. Each n*log2(n) term is the identical libm double in both
    engines; the cross-category sum spans <=6 well-scaled terms, so
    round6 absorbs association drift (SURVEY 5.3 rule 2). Two keyed
    aggs over (source, lang) then source — both map-side combinable;
    at 100 TB the category table is tiny and the join broadcasts."""
    d = tables.load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("total"))
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source", "total")
        .agg(
            F.round(
                F.log2(F.col("total").cast("double"))
                - F.sum(F.col("n").cast("double") * F.log2(F.col("n").cast("double")))
                / F.col("total").cast("double"),
                6,
            ).alias("lang_entropy_bits")
        )
        .select(
            "source",
            F.col("total").cast("long").alias("n_docs"),
            "lang_entropy_bits",
        )
        .orderBy("source")
    )


_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag AS flag,
         CAST(l_quantity AS HUGEINT) AS q,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS p
  FROM lineitem
), s AS (
  SELECT flag, count(*) AS n,
         sum(q) AS sx, sum(p) AS sy,
         sum(q * q) AS sxx, sum(p * p) AS syy, sum(q * p) AS sxy
  FROM m GROUP BY flag
)
SELECT flag, CAST(n AS BIGINT) AS n_rows,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0),
             6) AS qty_price_corr,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE), 0) / 100.0,
             6) AS qty_price_covar
FROM s
ORDER BY flag
"""


@register("agg_corr_exact", oracle=_CORR_SQL, tags=("D-extra", "M118"))
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance of (quantity, price) per
    returnflag (D-extra) from EXACT integer moment sums.

    Built-in ``corr``/``covar_samp`` accumulate doubles in partition
    order — un-hashable across engines (determinism.py regime 2). Here
    the five moments are summed as DECIMAL(38,0)/HUGEINT over integer-
    valued inputs (quantity is integral, price is 2dp cents — both
    measured), so every sum is exact and order-free; sum(p*p) at sf0.1
    reaches ~6e19, past BIGINT, hence the 128-bit accumulators. The
    final corr/covar expressions are a handful of identical IEEE ops on
    identically-rounded doubles. One keyed shuffle of 5 integer
    partials per flag — the same map-side-combine shape at any scale."""
    li = tables.load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(38,0)")
    p = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    s = (
        li.select(F.col("l_returnflag").alias("flag"), q.alias("q"), p.alias("p"))
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("sx"),
            F.sum("p").alias("sy"),
            F.sum(F.col("q") * F.col("q")).alias("sxx"),
            F.sum(F.col("p") * F.col("p")).alias("syy"),
            F.sum(F.col("q") * F.col("p")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_num = nd * sxy - sx * sy
    # Zero-variance guard: a constant series makes the Pearson
    # denominator 0 — Spark under ANSI (4.x default) raises
    # DIVIDE_BY_ZERO while DuckDB's IEEE division yields NaN/inf.
    # Both sides agree on NULL instead (when() here, NULLIF in the
    # oracle). Same for covar's n*(n-1) at n==1.
    corr_den = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    cov_den = nd * (nd - F.lit(1.0))
    return s.select(
        "flag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            F.when(corr_den != 0, cov_num / corr_den), 6
        ).alias("qty_price_corr"),
        F.round(F.when(cov_den != 0, cov_num / cov_den) / F.lit(100.0), 6).alias(
            "qty_price_covar"
        ),
    ).orderBy("flag")


_PROFILE_SQL = """
SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
       count(l_quantity) AS n_notnull,
       count(DISTINCT l_quantity) AS n_distinct,
       min(l_quantity) AS min_val, max(l_quantity) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(l_extendedprice),
       count(DISTINCT l_extendedprice),
       min(l_extendedprice), max(l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(l_discount),
       count(DISTINCT l_discount), min(l_discount), max(l_discount)
FROM lineitem
UNION ALL
SELECT 'l_tax', count(*), count(l_tax), count(DISTINCT l_tax),
       min(l_tax), max(l_tax)
FROM lineitem
ORDER BY col_name
"""


@register("agg_data_profile", oracle=_PROFILE_SQL, tags=("D-extra", "M125"))
def agg_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (D-extra): null rate, cardinality, and range
    per numeric column in ONE scan — the data-quality report every
    ingest pipeline runs before accepting a drop.

    Spark-first shape: unpivot the four columns with ``stack`` (a
    map-side generator, so the table is read once, not four times like
    the oracle's UNION ALL), then one keyed agg over ≤4 groups.
    min/max of doubles are exact value picks (no accumulation) and the
    counts are integers — no float-parity question. At 100 TB this is
    a single pass with 4-way fan-out and constant agg state; contrast
    the naive per-column loop that rescans the table per column."""
    li = tables.load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    stack_expr = "stack({n}, {args}) AS (col_name, val)".format(
        n=len(cols), args=", ".join(f"'{c}', {c}" for c in cols)
    )
    return (
        li.select(F.expr(stack_expr))
        .groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("val").alias("n_notnull"),
            F.countDistinct("val").alias("n_distinct"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("col_name")
    )


_GINI_SQL = """
WITH spend AS (
  SELECT c.c_nationkey AS nation,
         c.c_custkey,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, c.c_custkey
), ranked AS (
  SELECT nation, cents,
         row_number() OVER (PARTITION BY nation
                            ORDER BY cents, c_custkey) AS i,
         count(*) OVER (PARTITION BY nation) AS n,
         sum(cents) OVER (PARTITION BY nation) AS total
  FROM spend
)
SELECT nation,
       CAST(n AS BIGINT) AS n_customers,
       -- 128-bit numerator: sum(i*cents) ~ n^2/2 * avg_cents passes
       -- 2^63 near 1e9 customers/nation (the sample_neyman_allocation
       -- overflow class, hardened here proactively); HUGEINT mirrors
       -- Spark's decimal(38,0) and both round the same exact integer
       CAST((2 * sum(CAST(i AS HUGEINT) * cents)
             - (CAST(n AS HUGEINT) + 1) * total) AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
FROM ranked
GROUP BY nation, n, total
ORDER BY nation
"""


@register("agg_gini", oracle=_GINI_SQL, tags=("D-extra", "M134"))
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation (D-extra): the
    inequality/concentration metric — G = (2·Σi·x_(i) − (n+1)·Σx) /
    (n·Σx) over ascending-sorted spend. Skew diagnosis in one number:
    G→1 means a few whales dominate a nation's revenue (and that
    nation's key will hot-spot a revenue shuffle).

    All-integer construction: spend in exact cents, rank i from a
    deterministic (cents, custkey) order, numerator and denominator
    exact BIGINTs, ONE closing IEEE division — bit-identical without
    rounding. Plan: join + keyed agg (per-customer totals), then
    per-nation windows; the window partitions by nation so no global
    sort, and nothing exceeds customers-per-nation in state."""
    from pyspark.sql import Window

    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"), "c_custkey")
        .agg(F.sum(cents).alias("cents"))
    )
    wr = Window.partitionBy("nation").orderBy("cents", "c_custkey")
    wn = Window.partitionBy("nation")
    ranked = spend.select(
        "nation",
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.sum("cents").over(wn).alias("total"),
    )
    # 128-bit numerator (see the oracle comment): decimal(38,0) keeps
    # sum(i*cents) exact past the ~1e9-customers-per-nation point where
    # long arithmetic would overflow
    dec = "decimal(38,0)"
    return (
        ranked.groupBy("nation", "n", "total")
        .agg(
            F.sum(F.col("i").cast(dec) * F.col("cents").cast(dec)).alias("s_ix")
        )
        .select(
            "nation",
            F.col("n").cast("long").alias("n_customers"),
            (
                (
                    2 * F.col("s_ix")
                    - (F.col("n").cast(dec) + 1) * F.col("total").cast(dec)
                ).cast("double")
                / (F.col("n").cast("double") * F.col("total").cast("double"))
            ).alias("gini"),
        )
        .orderBy("nation")
    )


_QUANTILE_BINS_SQL = """
WITH t AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, CAST(count(*) AS BIGINT) AS n,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM t GROUP BY decile ORDER BY decile
"""


@register("agg_quantile_bins", oracle=_QUANTILE_BINS_SQL, tags=("ext", "feature"))
def agg_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of o_totalprice — the feature
    discretization step (quantile bucketizer) with per-bin counts and
    edges. The ntile ORDER BY carries the unique o_orderkey tie-break
    so bin membership at boundary ties is deterministic cross-engine;
    lo/hi are raw column values (no float arithmetic).

    Scale note: a single-partition global ntile is the exact form at
    committed scales; past ``distorder.WINDOW_GATE_ROWS`` the decile
    comes from the distributed global-order kernel (quantile-bucketed
    local windows + triangular offsets, SCALE.md §24) — bit-identical
    bucket assignment, no single-partition exchange. This key pins
    the semantics both forms target."""
    from pyspark.sql import Window

    from ezbake_graph_spark.operators import distorder

    o = tables.load(spark, sf_dir, "orders")
    if distorder.use_distributed_window(spark, sf_dir, "orders"):
        t = distorder.attach_global_order(
            o.select("o_totalprice", "o_orderkey"),
            "o_totalprice",
            [F.col("o_totalprice"), F.col("o_orderkey")],
            ntile=("decile", 10),
        ).select("o_totalprice", "decile")
    else:
        w = Window.orderBy("o_totalprice", "o_orderkey")
        t = o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
    return (
        t.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


_CONCENTRATION_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, cents,
         ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM spend
), tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM spend)
SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS cents,
       CAST((CAST(sum(cents) AS HUGEINT) * 1000000) // total AS BIGINT)
         AS share_micro
FROM ranked, tot GROUP BY decile, total ORDER BY decile
"""


@register("agg_revenue_concentration", oracle=_CONCENTRATION_SQL, tags=("ext", "feature"))
def agg_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/concentration curve of customer revenue: customers ranked
    by total spend into spend deciles, each decile's revenue share in
    exact micro-units — the 80/20 audit (top decile holds 17% on the
    uniform TPC-H-ish fixture; a real book is far more skewed, which is
    exactly what this measures). The analysis behind hot-key decisions:
    a heavy top decile is the salting / broadcast-side trigger.

    All-integer math end to end: money quantized to cents before ANY
    sum (exact BIGINT), shares one integer floor-division per decile —
    hash-identical cross-engine with no rounding step. The share
    multiply widens to 128-bit first (ADVICE r7): in BIGINT, cents*1e6
    overflows past ~9.2e12 cents (~$92B per decile) and raises under
    ANSI mode — plausible at the 100 TB posture this docstring claims.
    Spark widens via DECIMAL(38,0) (`div` stays exact integral);
    DuckDB via HUGEINT (its DECIMAL `//` degrades to DOUBLE and
    rounds, off-by-one vs exact floor — measured). Plan: one keyed
    agg (map-side combined), a 10-bucket ntile over the CUSTOMER
    table (dimension-sized, not fact-sized — the single-partition
    window holds n_customers rows, never order rows), one broadcast
    1-row total, one 10-group agg. Past the size gate
    (``distorder.WINDOW_GATE_ROWS``) the ntile switches to the
    distributed global-order kernel — quantile-bucketed local windows
    + triangular offsets, no single-partition exchange, bit-identical
    decile assignment (equivalence + plan pinned by
    tests/test_plans.py::test_distributed_global_order_plans)."""
    from pyspark.sql import Window

    from ezbake_graph_spark.operators import distorder

    o = tables.load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    if distorder.use_distributed_window(spark, sf_dir, "customer"):
        ranked = distorder.attach_global_order(
            spend,
            "cents",
            [F.col("cents").desc(), F.col("o_custkey")],
            desc=True,
            ntile=("decile", 10),
        ).select("o_custkey", "cents", "decile")
    else:
        w = Window.orderBy(F.col("cents").desc(), "o_custkey")
        ranked = spend.select(
            "o_custkey", "cents", F.ntile(10).over(w).alias("decile")
        )
    tot = spend.agg(F.sum("cents").cast("long").alias("total"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("decile", "total")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            "decile",
            "n_customers",
            "cents",
            F.expr(
                "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000) div total AS BIGINT)"
            ).alias("share_micro"),
        )
        .orderBy("decile")
    )


_HLL_M = 64  # registers (b = 6 bucket bits)
_HLL_ALPHA = 0.709  # standard alpha for m = 64
_HLL_WBITS = 54  # payload bits left after the bucket split (60 - 6)


def _hll_sql() -> str:
    whens = " ".join(
        f"WHEN w >= {1 << (_HLL_WBITS - k)} THEN {k}"
        for k in range(1, _HLL_WBITS + 1)
    )
    return f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS u
  FROM events
),
split AS (
  SELECT event_type, u % {_HLL_M} AS bucket, u // {_HLL_M} AS w FROM h
),
rho AS (
  SELECT event_type, bucket,
         CASE {whens} ELSE {_HLL_WBITS + 1} END AS r
  FROM split
),
regs AS (
  SELECT event_type, bucket, CAST(max(r) AS BIGINT) AS reg
  FROM rho GROUP BY event_type, bucket
),
per_type AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_buckets_used,
         CAST({_HLL_M} - count(*) AS BIGINT) AS v_zeros,
         CAST(({_HLL_M} - count(*)) * {1 << (_HLL_WBITS + 1)}
              + sum(CASE WHEN reg > {_HLL_WBITS + 1} THEN 1
                         ELSE {1 << (_HLL_WBITS + 1)} // (1 << reg) END)
              AS BIGINT) AS denom_int
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT p.event_type, p.n_buckets_used, p.v_zeros, p.denom_int, e.n_exact,
       round(CASE WHEN p.v_zeros > 0
                   AND {_HLL_ALPHA} * {_HLL_M * _HLL_M}
                       * {float(1 << (_HLL_WBITS + 1))} / p.denom_int
                       < {2.5 * _HLL_M}
                  THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / p.v_zeros)
                  ELSE {_HLL_ALPHA} * {_HLL_M * _HLL_M}
                       * {float(1 << (_HLL_WBITS + 1))} / p.denom_int
             END, 6) AS hll_estimate
FROM per_type p JOIN exact e ON e.event_type = p.event_type
ORDER BY p.event_type
"""


@register("agg_hll_registers", oracle=_hll_sql(), tags=("D-extra", "ext", "bench2"))
def agg_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type with EXACT
    cross-engine registers — the value-hash-oracled twin of
    ``agg_approx_distinct`` (D3, rows-only because engine-native HLL
    sketches differ). Here the sketch itself is pinned: the 64-bit-ish
    hash is md5 (both engines bit-identical), the bucket split and
    leading-zero rank are integer arithmetic on a 60-bit prefix, and
    the harmonic-mean denominator ``sum(2^-reg)`` is carried as the
    exact BIGINT ``sum(2^(55-reg))`` (every term a dyadic integer, no
    float-order hazard — a raw double sum of 64 such terms rounds
    differently per accumulation order). The only floats are the final
    alpha*m^2/denom estimate and the small-range ``m*ln(m/V)``
    correction, reported round6 next to the exact count so the row
    carries its own error readout.

    Scale shape: the register table is the WHOLE state — m=64 BIGINTs
    per group, built by one (type, bucket) keyed agg with map-side
    partial max; registers from disjoint partitions/days merge by MAX
    (the mergeability test pins this), which is why this replaces the
    exact distinct's expand shuffle at 100 TB. The DISTINCT
    pre-projection here only dedups the hash inputs (semantics, not
    state)."""
    ev = tables.load(spark, sf_dir, "events")
    u = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = ev.select("event_type", u.alias("u")).distinct()
    split = h.select(
        "event_type",
        (F.col("u") % _HLL_M).alias("bucket"),
        # exact integral division, NOT double division: u/64 via float
        # loses low bits at the 60-bit md5-prefix magnitude and can
        # flip a register rank at a 2^j boundary vs the oracle's
        # exact u // 64
        F.expr(f"u div {_HLL_M}").alias("w"),
    )
    r = F.lit(_HLL_WBITS + 1)
    for k in range(_HLL_WBITS, 0, -1):
        r = F.when(F.col("w") >= (1 << (_HLL_WBITS - k)), k).otherwise(r)
    regs = (
        split.select("event_type", "bucket", r.alias("r"))
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("reg"))
    )
    top = 1 << (_HLL_WBITS + 1)
    per_type = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_zeros"),
        (
            (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(top)
            + F.sum(
                # 2^(55-reg) as an exact BIGINT shift — a double 2^-reg
                # sum would round order-dependently once terms span
                # more than the 53-bit mantissa
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT),"
                    f" CAST({_HLL_WBITS + 1} - reg AS INT))"
                )
            )
        ).cast("long").alias("denom_int"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    raw = (
        F.lit(_HLL_ALPHA)
        * F.lit(_HLL_M * _HLL_M)
        * F.lit(float(top))
        / F.col("denom_int")
    )
    small = F.lit(float(_HLL_M)) * F.log(
        F.lit(float(_HLL_M)) / F.col("v_zeros")
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "n_buckets_used",
            "v_zeros",
            "denom_int",
            "n_exact",
            F.round(
                F.when(
                    (F.col("v_zeros") > 0) & (raw < 2.5 * _HLL_M), small
                ).otherwise(raw),
                6,
            ).alias("hll_estimate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Differentially-private count release (M220)

_DP_EPS = 0.5  # epsilon; Laplace scale b = sensitivity/eps = 2.0

_DP_SQL = f"""
WITH cnt AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderpriority
),
u AS (
  SELECT o_orderpriority, n,
         (('0x' || substr(md5('dp:' || o_orderpriority), 1, 8))::BIGINT
          + 0.5) / 4294967296.0 AS u01
  FROM cnt
),
noise AS (
  SELECT o_orderpriority, n,
         round(-(1.0 / {_DP_EPS})
               * CASE WHEN u01 >= 0.5 THEN 1.0 ELSE -1.0 END
               * ln(1.0 - 2.0 * abs(u01 - 0.5)), 6) AS noise
  FROM u
)
SELECT o_orderpriority, n, CAST({_DP_EPS} AS DOUBLE) AS epsilon, noise,
       round(n + noise, 6) AS noisy_n
FROM noise
ORDER BY o_orderpriority
"""


@register("agg_dp_counts", oracle=_DP_SQL, tags=("D-extra", "dp"))
def agg_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release: per-group counts plus
    Laplace(sensitivity/epsilon) noise via the inverse CDF
    ``-b * sign(u - 1/2) * ln(1 - 2|u - 1/2|)`` over a unit uniform,
    epsilon = 0.5, sensitivity 1 (each orders ROW contributes once per
    group — event-level DP; user-level DP would first bound each
    customer's contribution with a per-user clamp).

    The uniform here is an md5 hash of the group key — which makes
    this a PARITY HARNESS for the mechanism's plumbing (inverse-CDF
    transform, sensitivity/epsilon accounting, post-processing), NOT a
    private release: deterministic noise that anyone can recompute
    from the group name provides zero privacy. Production swaps the
    one ``u01`` expression for a secure RNG draw; everything else —
    and the cross-engine oracle pinning it — stays. ln() on identical
    doubles agrees to 1 ulp across engines and the fixture magnitudes
    sit far from round6 boundaries (same regime as BM25's ln-IDF).

    Scale shape: one keyed count + map-side noise arithmetic."""
    o = tables.load(spark, sf_dir, "orders")
    cnt = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    u01 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("o_orderpriority"))), 1, 8),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = F.round(
        F.lit(-1.0 / _DP_EPS)
        * F.when(u01 >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - 2.0 * F.abs(u01 - 0.5)),
        6,
    )
    return (
        cnt.select(
            "o_orderpriority",
            "n",
            F.lit(_DP_EPS).cast("double").alias("epsilon"),
            noise.alias("noise"),
        )
        .select(
            "o_orderpriority",
            "n",
            "epsilon",
            "noise",
            F.round(F.col("n") + F.col("noise"), 6).alias("noisy_n"),
        )
        .orderBy("o_orderpriority")
    )
