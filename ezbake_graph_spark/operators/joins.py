"""Join operators (SURVEY.md §2C).

Scale notes baked into each plan:

- Dimension tables (region/nation/supplier/customer/part) are always
  broadcast — no shuffle of the fact side on dim joins (C1, C10).
- Large×large equi-joins (C2) shuffle both sides on the join key and
  sort-merge; AQE converts to broadcast when a side turns out small.
- The as-of join (C8) is implemented as union + single partitioned
  sort + running ``last_value`` — one shuffle on the key, no join
  blow-up; this is the 100 TB-safe formulation (a naive join+filter
  is quadratic per key).
- The interval join (C9) is an equi-join on the entity key with a
  range residual — keyed shuffle, never a cross join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import (
    bounded_sort,
    money_sum_expr,
    sql_money_sum,
)
from ezbake_graph_spark.registry import register

_BROADCAST_SQL = f"""
SELECT n_name,
       count(*) AS n_items,
       {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


@register("join_broadcast", oracle=_BROADCAST_SQL, tags=("C1",))
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join (C1): fact × two broadcast dims, zero
    fact-side shuffle before the aggregate."""
    li = tables.load(spark, sf_dir, "lineitem")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum_expr(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
        .orderBy("n_name")
    )


_SORTMERGE_SQL = f"""
SELECT o_orderstatus,
       count(*) AS n_lines,
       {sql_money_sum("l_quantity")} AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("join_sortmerge", oracle=_SORTMERGE_SQL, tags=("C2",))
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge join (C2): large×large, explicit merge hint so the
    plan keeps the SMJ shape it would have at 100 TB."""
    o = tables.load(spark, sf_dir, "orders").hint("merge")
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum_expr(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy("o_orderstatus")
    )


_OUTER_SQL = """
SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment
ORDER BY c_custkey
"""


@register("join_outer", oracle=_OUTER_SQL, tags=("C3",))
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (C3): count(o_orderkey) ignores the null rows
    of customers with no orders."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


_SEMI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey
"""


@register("join_semi", oracle=_SEMI_SQL, tags=("C4",))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (C4): existence filter, no row multiplication."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_ANTI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey
"""


@register("join_anti", oracle=_ANTI_SQL, tags=("C5",))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (C5): non-existence filter."""
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


_CROSS_SQL = """
SELECT r1.r_name AS region_a, r2.r_name AS region_b
FROM region r1 CROSS JOIN region r2
ORDER BY region_a, region_b
"""


@register("join_cross", oracle=_CROSS_SQL, tags=("C6",))
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (C6) — only ever on tiny inputs; anything
    larger must go through a keyed or blocked formulation (K6)."""
    r1 = tables.load(spark, sf_dir, "region").select(F.col("r_name").alias("region_a"))
    r2 = tables.load(spark, sf_dir, "region").select(F.col("r_name").alias("region_b"))
    return r1.crossJoin(r2).orderBy("region_a", "region_b")


_THETA_SQL = """
SELECT p_brand, count(*) AS n_pairs
FROM part p JOIN supplier s ON s.s_acctbal > p.p_retailprice
GROUP BY p_brand
ORDER BY p_brand
"""


@register("join_theta", oracle=_THETA_SQL, tags=("C7",))
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join (C7): planned as BroadcastNestedLoop with
    the small side broadcast. At scale a non-equi join must have one
    broadcastable side or be rewritten as a range-bucketed equi-join."""
    p = tables.load(spark, sf_dir, "part")
    s = tables.load(spark, sf_dir, "supplier")
    return (
        p.join(F.broadcast(s), s.s_acctbal > p.p_retailprice)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("p_brand")
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
), purch AS (
  SELECT event_id, user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
       c.ts AS last_click_ts, c.click_value AS last_click_value
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


@register("join_asof", oracle=_ASOF_SQL, tags=("C8",))
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (C8): each purchase ↔ the latest click at-or-before
    it, per user.

    Spark-first formulation: tag both sides, union, one sort per
    user-partition, then running ``last(..., ignorenulls)``. One keyed
    shuffle, linear in input — no per-key quadratic join. Clicks are
    pre-deduplicated per (user, ts) with max(value) so ties are
    deterministic (same rule as the DuckDB ASOF oracle).
    """
    ev = tables.load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "click_value",
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("kind") == 0, F.col("ts"))
    click_val = F.when(F.col("kind") == 0, F.col("click_value"))
    return (
        clicks.unionByName(purch)
        .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .withColumn("last_click_value", F.last(click_val, ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "purchase_value",
            "last_click_ts",
            "last_click_value",
        )
        .orderBy("event_id")
    )


_INTERVAL_SQL = """
SELECT o1.o_orderkey AS orderkey, count(*) AS n_overlapping
FROM orders o1 JOIN orders o2
  ON o1.o_custkey = o2.o_custkey
 AND o1.o_orderkey <> o2.o_orderkey
 AND o2.o_orderdate < o1.o_orderdate + INTERVAL 30 DAY
 AND o1.o_orderdate < o2.o_orderdate + INTERVAL 30 DAY
GROUP BY o1.o_orderkey
ORDER BY orderkey
"""


@register("join_interval", oracle=_INTERVAL_SQL, tags=("C9",))
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (C9): equi-join on the entity key with a
    time-range residual predicate — a keyed shuffle, so it scales with
    per-key density, not table size squared."""
    o = tables.load(spark, sf_dir, "orders")
    o1 = o.select(
        F.col("o_custkey").alias("ck1"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = o.select(
        F.col("o_custkey").alias("ck2"),
        F.col("o_orderkey").alias("ok2"),
        F.col("o_orderdate").alias("d2"),
    )
    month = F.expr("INTERVAL 30 DAYS")
    joined = o1.join(
        o2,
        (F.col("ck1") == F.col("ck2"))
        & (F.col("orderkey") != F.col("ok2"))
        & (F.col("d2") < F.col("d1") + month)
        & (F.col("d1") < F.col("d2") + month),
    )
    return (
        joined.groupBy("orderkey")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
        .orderBy("orderkey")
    )


_STAR_SQL = f"""
SELECT n_name,
       {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY n_name
"""


@register("join_star_q5", oracle=_STAR_SQL, tags=("C10", "bench"))
def join_star_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table star join (C10).

    Star-join shape: the fact table (lineitem) is NEVER shuffled or
    broadcast — every dimension side broadcasts and lineitem streams
    through a single WholeStageCodegen pipeline of fused broadcast hash
    joins straight into the partial aggregate. Latency levers
    (measured at sf0.1, min-of-9 warm: 0.43 s → 0.29 s over rounds 4-5,
    then another ~23% this round from the customer_geo shape):

    - the dims broadcast INDEPENDENTLY (depth-1 chain, the driver
      builds all broadcasts concurrently) — a pre-joined `co` relation
      was a 2-deep SEQUENTIAL broadcast chain on the latency path.
    - BOTH snowflake arms are session-cached flattened dims
      (``tables.customer_geo`` / slim supplier): the region predicate
      lands on the CUSTOMER side, so the customer broadcast carries
      only that region's customers (~1/5th) and n_name rides along —
      non-ASIA fact rows drop one join earlier and the supplier arm
      shrinks to the slim (s_suppkey, s_nationkey) projection.
    - the closing sort is `coalesce(1).sortWithinPartitions` — the
      result is dimension-bounded (≤25 nations), and a plain orderBy
      would plan a RangePartitioning exchange whose sampling pass is
      an extra sequential job.

    At 100 TB the same plan holds as long as the filtered dim sides
    fit the broadcast budget; otherwise AQE demotes just that one join
    to SMJ (and the 1-partition closing sort still holds — it sorts
    group-count rows, not data rows).

    SQL-text form over the session views (incl. the cached
    ``customer_geo`` flat dim — see tables.ensure_views): the 6-table
    DataFrame build cost 85-104 ms of Python/Py4J chatter per call at
    HEAD vs 14 ms for the one-call SQL parse; identical plan.
    """
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_STAR_SPARK).transform(bounded_sort, "n_name")


# Spark-dialect twin of _STAR_SQL over the flattened customer_geo dim;
# BROADCAST hints reproduce the F.broadcast() depth-1 chain.
_STAR_SPARK = f"""
SELECT /*+ BROADCAST(o), BROADCAST(cg), BROADCAST(s) */ n_name,
       {sql_money_sum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN (SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') o
  ON l_orderkey = o_orderkey
JOIN (SELECT c_custkey, c_nationkey, n_name FROM customer_geo
      WHERE r_name = 'ASIA') cg
  ON o_custkey = c_custkey
JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
GROUP BY n_name
"""


_BUCKETED_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

_BUCKETS = 8


def bucketed_join_frames(spark: SparkSession, sf_dir: str):
    """Write orders/customer as bucketed+sorted tables (once per
    session and scale factor), read them back through the catalog, and
    return the co-located join — a SortMergeJoin with NO Exchange and
    no per-partition Sort beyond the bucket sort (asserted in
    tests/test_joins_bucketed.py).

    This is the 100 TB join strategy made concrete: pre-bucketing both
    fact tables on the join key at ingest converts every subsequent
    join on that key into a zero-shuffle merge. The bucketed copies
    live under /tmp and are rebuilt per session (the in-memory catalog
    does not outlive the process).
    """
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_cust = f"ezgs_b_orders_{tag}", f"ezgs_b_customer_{tag}"
    catalog = spark.catalog
    if not catalog.tableExists(t_orders) or not catalog.tableExists(t_cust):
        o = tables.load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        c = tables.load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        for name, df, key in ((t_orders, o, "o_custkey"), (t_cust, c, "c_custkey")):
            (
                df.write.bucketBy(_BUCKETS, key)
                .sortBy(key)
                .option("path", f"/tmp/ezgs_bucketed/{name}")
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
    bo, bc = spark.table(t_orders), spark.table(t_cust)
    # merge hint: keep SMJ even when one side fits the broadcast budget,
    # so the bucketing (not a broadcast) is what elides the shuffle
    return bo.join(bc.hint("merge"), bo.o_custkey == bc.c_custkey)


@register("join_bucketed_colocated", oracle=_BUCKETED_SQL, tags=("C-extra", "bucketing"))
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join: zero-shuffle SortMergeJoin over
    pre-bucketed tables; only the small post-join aggregate shuffles."""
    j = bucketed_join_frames(spark, sf_dir)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum_expr(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


_SHJ_SQL = """
SELECT o_orderstatus, count(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_totalprice > 200000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("join_shuffle_hash_hint", oracle=_SHJ_SQL, tags=("C-extra",))
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: force a shuffled hash join via hint.

    Sort-merge is Spark's default for large equi-joins; when one side
    is much smaller after filtering but still over the broadcast
    budget, hashing that side avoids both sorts. The hint is the
    user-facing control surface (planner picks SHJ; asserted in
    tests/test_plans.py)."""
    o = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .hint("shuffle_hash")
    )
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("o_orderstatus")
    )


_RANGE_BUCKET_SQL = """
WITH purchases AS (
  SELECT event_id AS p_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id AS c_id, ts AS c_ts FROM events WHERE event_type = 'click'
)
SELECT p.p_id, count(*) AS n_clicks_1h
FROM purchases p JOIN clicks c
  ON c.c_ts >= p.p_ts AND c.c_ts < p.p_ts + INTERVAL 1 HOUR
GROUP BY p.p_id
ORDER BY p_id
"""

_HOUR_US = 3_600 * 1_000_000


@register("join_range_bucketed", oracle=_RANGE_BUCKET_SQL, tags=("C9b",))
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key: any click within 1 h after any
    purchase) via time-bucketing — the scale path where the naive plan
    is a broadcast-nested-loop over the cross product. Each purchase
    interval [p_ts, p_ts+1h) spans at most two hour buckets, so
    exploding purchases to those buckets and equi-joining clicks on
    their bucket turns the O(n·m) loop into a keyed shuffle with
    per-bucket candidate lists; the exact range predicate then refines
    candidates. Work is linear in true matches + bucket co-residents.
    At 100 TB the bucket is also the storage partition key, so the
    probe is partition-local."""
    ev = tables.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.unix_micros("ts").alias("p_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.unix_micros("ts").alias("c_us")
    )
    p_b = p.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("p_us") / _HOUR_US).cast("long"),
                (F.col("p_us") / _HOUR_US).cast("long") + 1,
            )
        ),
    )
    c_b = c.withColumn("bucket", (F.col("c_us") / _HOUR_US).cast("long"))
    return (
        p_b.join(c_b, "bucket")
        .filter(
            (F.col("c_us") >= F.col("p_us"))
            & (F.col("c_us") < F.col("p_us") + _HOUR_US)
        )
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
        .orderBy("p_id")
    )


_SALTED_JOIN_SQL = f"""
SELECT c_mktsegment AS segment,
       count(*) AS n_events,
       {sql_money_sum("e.value")} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
"""

_N_SALTS = 8


@register("join_salted_skew", oracle=_SALTED_JOIN_SQL, tags=("ext", "M65"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-and-replicate join for skewed keys: the fact side appends a
    deterministic salt (event_id mod 8), the dim side is replicated
    once per salt value, and the join key becomes (custkey, salt) — a
    single hot key now spreads across 8 shuffle partitions instead of
    stalling one reducer. events.user_id is exactly such a key space
    (1 500 users × ~67 events each at sf0.1; a production clickstream
    has power-law users at millions of events).

    The result is identical to the unsalted join — the oracle IS the
    plain join — so the rewrite is proven semantics-preserving. At
    100 TB prefer AQE skew-join splitting first; explicit salting is
    the fallback when skew is known ahead of time (it also composes
    with the exact micro-unit aggregation here, which AQE's runtime
    split cannot change). Dim replication is a map-side explode of a
    broadcast table — no extra shuffle.
    """
    ev = tables.load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_N_SALTS)).cast("int")
    )
    cust = (
        tables.load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        ev.join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum_expr(F.col("value")).alias("sum_value"),
        )
        .orderBy("segment")
    )


_BLOOM_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       {sql_money_sum("value")} AS sum_value
FROM events
WHERE user_id IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY 1 ORDER BY 1
"""

_N_BUCKETS = 1 << 16


@register("join_bloom_pruned", oracle=_BLOOM_SQL, tags=("ext", "M66"))
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter pattern: semi-join events to urgent-order
    customers through an approximate membership pre-filter, then an
    exact semi-join of the survivors.

    The pre-filter is the distinct set of hash buckets
    (xxhash64(key) mod 2^16) of the build side — a bounded-size
    broadcast no matter how many build keys exist (the same role a
    bloom filter plays in Spark's own runtime row-level filtering;
    one hash function keeps it SQL-expressible). False positives pass
    the bucket check and are removed by the exact join, so the result
    is EXACTLY the plain semi-join — which is what the oracle asserts.
    At 100 TB the win is that the probe side drops most rows map-side
    BEFORE the shuffle/join; the exact join then runs on a fraction of
    the data. Locally both stages are broadcast joins; the plan shape
    (map-side filter → exact join) is what scales.
    """
    ev = tables.load(spark, sf_dir, "events")
    urgent = (
        tables.load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("build_key"))
        .distinct()
    )
    buckets = urgent.select(
        F.pmod(F.xxhash64("build_key"), F.lit(_N_BUCKETS)).alias("bucket")
    ).distinct()
    pre = ev.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64("user_id"), F.lit(_N_BUCKETS)) == F.col("bucket"),
        "left_semi",
    )
    exact = pre.join(
        F.broadcast(urgent), pre.user_id == urgent.build_key, "left_semi"
    )
    return (
        exact.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum_expr(F.col("value")).alias("sum_value"),
        )
        .orderBy("event_type")
    )


_NULL_SAFE_SQL = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation
  ON nullif(c_nationkey, 5) IS NOT DISTINCT FROM nullif(n_nationkey, 5)
GROUP BY n_name
ORDER BY n_name
"""


@register("join_null_safe", oracle=_NULL_SAFE_SQL, tags=("C-extra",))
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing, the semantics entity-
    resolution pipelines need when a join key is legitimately absent.
    The fixture has no NULL keys, so both sides nullify key 5 — the
    null-safe join must reunite exactly those rows (a plain equi-join
    would silently drop them, failing the count for nation 5).

    Scale: Spark treats <=> as an equi-join condition (EqualNullSafe
    is a sargable key, coalescing NULL into the hash), so this plans
    as a broadcast-hash join, NOT a cartesian + filter — same cost as
    the plain equi-join."""
    c = tables.load(spark, sf_dir, "customer").withColumn(
        "ck", F.expr("nullif(c_nationkey, 5)")
    )
    n = tables.load(spark, sf_dir, "nation").withColumn(
        "nk", F.expr("nullif(n_nationkey, 5)")
    )
    return (
        c.join(F.broadcast(n), c["ck"].eqNullSafe(n["nk"]))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


_ASOF_FWD_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
), purch AS (
  SELECT event_id, user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
       c.ts AS next_click_ts, c.click_value AS next_click_value
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY p.event_id
"""


@register("join_asof_forward", oracle=_ASOF_FWD_SQL, tags=("C8b", "M84"))
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (C8b): each purchase ↔ the EARLIEST click
    at-or-after it, per user — the look-ahead direction (next
    treatment after exposure, next error after deploy). Mirror of C8:
    tagged union, one sort per user partition, running
    ``first(..., ignorenulls)`` over the FOLLOWING frame. At equal ts
    the purchase sorts before the click so an exactly-simultaneous
    click qualifies, matching the oracle's ``p.ts <= c.ts``. Same
    single-keyed-shuffle linear shape as C8."""
    ev = tables.load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "ts",
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "click_value",
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("kind") == 1, F.col("ts"))
    click_val = F.when(F.col("kind") == 1, F.col("click_value"))
    return (
        clicks.unionByName(purch)
        .withColumn("next_click_ts", F.first(click_ts, ignorenulls=True).over(w))
        .withColumn("next_click_value", F.first(click_val, ignorenulls=True).over(w))
        .filter(F.col("kind") == 0)
        .select(
            "event_id",
            "user_id",
            "ts",
            "purchase_value",
            "next_click_ts",
            "next_click_value",
        )
        .orderBy("event_id")
    )


_ASOF_NEAREST_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
), purch AS (
  SELECT event_id, user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
         c.ts AS b_ts, c.click_value AS b_val
  FROM purch p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts
), f AS (
  SELECT p.event_id, c.ts AS f_ts, c.click_value AS f_val
  FROM purch p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts < c.ts
)
SELECT b.event_id, b.user_id, b.ts, b.purchase_value,
       CASE WHEN f.f_ts IS NULL THEN b.b_ts
            WHEN b.b_ts IS NULL THEN f.f_ts
            WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                 <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_ts
            ELSE f.f_ts END AS nearest_click_ts,
       CASE WHEN f.f_ts IS NULL THEN b.b_val
            WHEN b.b_ts IS NULL THEN f.f_val
            WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                 <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_val
            ELSE f.f_val END AS nearest_click_value
FROM b JOIN f USING (event_id)
ORDER BY b.event_id
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_SQL, tags=("C8c", "M124"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (C8c): each purchase ↔ the click closest in
    time in EITHER direction, per user — sensor-alignment semantics
    (match each reading to the nearest calibration, not the last one).
    Completes the as-of family: C8 backward, M84 forward, this nearest.

    One tagged union + ONE sort per user partition computes both
    directions: a running ``last`` over the preceding frame (backward,
    equal-ts clicks qualify) and a running ``first`` over the strictly-
    following frame (forward, equal-ts excluded so the simultaneous
    click isn't double-counted), then an exact integer µs comparison
    picks the nearer side, ties to backward. Same linear single-shuffle
    shape as C8 — never a per-key quadratic join. The oracle derives
    the identical answer from two DuckDB ASOF joins."""
    ev = tables.load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "click_value",
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("click_value"),
    )
    order = [F.col("ts"), F.col("kind"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("kind") == 0, F.col("ts"))
    click_val = F.when(F.col("kind") == 0, F.col("click_value"))
    both = (
        clicks.unionByName(purch)
        .withColumn("b_ts", F.last(click_ts, ignorenulls=True).over(wb))
        .withColumn("b_val", F.last(click_val, ignorenulls=True).over(wb))
        .withColumn("f_ts", F.first(click_ts, ignorenulls=True).over(wf))
        .withColumn("f_val", F.first(click_val, ignorenulls=True).over(wf))
        .filter(F.col("kind") == 1)
    )
    back_wins = (
        F.col("f_ts").isNull()
        | (
            F.col("b_ts").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("b_ts")
                <= F.unix_micros("f_ts") - F.unix_micros("ts")
            )
        )
    )
    return both.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.when(back_wins, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "nearest_click_ts"
        ),
        F.when(back_wins, F.col("b_val")).otherwise(F.col("f_val")).alias(
            "nearest_click_value"
        ),
    ).orderBy("event_id")


def pit_join(
    obs: DataFrame,
    features: list[tuple[str, DataFrame, str]],
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time (feature-store) join: enrich each observation row
    with the latest value of EVERY feature table at-or-before the
    observation timestamp, leakage-free — the training-set assembly
    primitive behind every feature store.

    ``features``: list of (name, table, value_col); each table carries
    (key_col, ts_col, value_col) and must be pre-deduplicated per
    (key, ts) — same contract as the C8 as-of kernel. Output: the obs
    columns plus ``f_<name>`` and ``f_<name>_ts`` per feature.

    Spark-first shape: rather than N sequential as-of joins (what the
    DuckDB oracle does — one ASOF JOIN per feature), ALL tables union
    into one frame with a kind marker and a single per-key window pass
    computes every feature's running last — **one keyed shuffle total,
    independent of the number of feature tables**, linear in the union
    size. Feature rows order before observation rows at equal ts
    (kind asc), so "at-or-before" includes same-instant updates, per
    feature-store convention (and DuckDB ASOF's >= match).
    """
    n = len(features)
    obs_payload = [c for c in obs.columns if c not in (key_col, ts_col)]
    ftypes = {name: fdf.schema[vcol].dataType for name, fdf, vcol in features}
    parts = []
    for i, (name, fdf, vcol) in enumerate(features):
        sel = [F.col(key_col), F.col(ts_col), F.lit(i).alias("_kind")]
        for fname, _, _ in features:
            src = F.col(vcol) if fname == name else F.lit(None)
            sel.append(src.cast(ftypes[fname]).alias(f"_fv_{fname}"))
        sel += [
            F.lit(None).cast(obs.schema[c].dataType).alias(c)
            for c in obs_payload
        ]
        parts.append(fdf.select(*sel))
    obs_sel = [F.col(key_col), F.col(ts_col), F.lit(n).alias("_kind")]
    obs_sel += [
        F.lit(None).cast(ftypes[name]).alias(f"_fv_{name}")
        for name, _, _ in features
    ]
    obs_sel += [F.col(c) for c in obs_payload]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u = u.unionByName(obs.select(*obs_sel))
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # All last() expressions evaluate in ONE select so they land in a
    # single WindowExec over a single exchange; interleaving them with
    # per-feature projections (the withColumn chain) splits the window
    # stack and AQE then re-shuffles between the stacks.
    ts_carriers = [
        F.when(F.col(f"_fv_{name}").isNotNull(), F.col(ts_col)).alias(
            f"_fts_{name}"
        )
        for name, _, _ in features
    ]
    u = u.select("*", *ts_carriers)
    feature_outs = []
    for name, _, _ in features:
        feature_outs.append(
            F.last(F.col(f"_fv_{name}"), ignorenulls=True).over(w).alias(f"f_{name}")
        )
        feature_outs.append(
            F.last(F.col(f"_fts_{name}"), ignorenulls=True).over(w).alias(f"f_{name}_ts")
        )
    u = u.select(key_col, ts_col, "_kind", *obs_payload, *feature_outs)
    out_cols = [key_col, ts_col, *obs_payload]
    out_cols += [c for name, _, _ in features for c in (f"f_{name}", f"f_{name}_ts")]
    return u.filter(F.col("_kind") == n).select(*out_cols)


_PIT_SQL = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS v
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), vf AS (
  SELECT user_id, ts,
         CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS cum
  FROM (SELECT user_id, ts, count(*) AS c
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
), purch AS (
  SELECT event_id, user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
       c.v AS last_click_value, c.ts AS last_click_ts,
       coalesce(v2.cum, 0) AS views_so_far,
       cu.c_mktsegment AS segment
FROM purch p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
ASOF LEFT JOIN vf v2 ON p.user_id = v2.user_id AND p.ts >= v2.ts
LEFT JOIN customer cu ON p.user_id = cu.c_custkey
ORDER BY p.event_id
"""


@register("join_pit_features", oracle=_PIT_SQL, tags=("ext", "ml", "bench2"))
def join_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store training-set assembly (``pit_join`` kernel): each
    purchase observation picks up, leakage-free, (a) the latest click
    value at-or-before it, (b) the user's cumulative view count so
    far, and (c) the static customer segment — two temporal feature
    tables + one dimension in ONE keyed shuffle + one broadcast join,
    vs the oracle's two sequential ASOF joins. The f_<name>_ts columns
    are the point-in-time audit trail (which feature version each
    training row saw).
    """
    ev = tables.load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    vf = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(
                Window.partitionBy("user_id")
                .orderBy("ts")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long"),
        )
    )
    obs = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("purchase_value")
    )
    pj = pit_join(
        obs,
        [("click", clicks, "v"), ("views", vf, "cum")],
        key_col="user_id",
        ts_col="ts",
    )
    c = tables.load(spark, sf_dir, "customer")
    return (
        pj.join(F.broadcast(c), pj.user_id == c.c_custkey, "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            "purchase_value",
            F.col("f_click").alias("last_click_value"),
            F.col("f_click_ts").alias("last_click_ts"),
            F.coalesce("f_views", F.lit(0)).alias("views_so_far"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("event_id")
    )
