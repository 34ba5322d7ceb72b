"""SQL-text variants of the build-heavy headliners: same plan, one Py4J call."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry, tables
from ezbake_graph_spark.session import get_session
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_session("perf-sql")
qs = registry.queries()

# register views once
for t in tables.TABLES:
    tables.load(spark, SF, t).createOrReplaceTempView(t)
tables.customer_geo(spark, SF).createOrReplaceTempView("customer_geo_v")

def timeit(fn, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

MS = "CAST(sum(CAST(round(({e}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000"
MA = "(CAST(sum(CAST(round(({e}) * 1000000) AS BIGINT)) AS DOUBLE) / count(*)) / 1000000"
def ms(e): return MS.format(e=e)
def ma(e): return MA.format(e=e)

Q1 = f"""
SELECT l_returnflag, l_linestatus,
  {ms("l_quantity")} AS sum_qty,
  {ms("l_extendedprice")} AS sum_base_price,
  {ms("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  {ms("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {ma("l_quantity")} AS avg_qty,
  {ma("l_extendedprice")} AS avg_price,
  {ma("l_discount")} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
def q1_sql(spark, sf):
    return spark.sql(Q1).coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus")

STAR = f"""
SELECT /*+ BROADCAST(o), BROADCAST(cg), BROADCAST(s) */ n_name,
  {ms("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN (SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') o
  ON l_orderkey = o_orderkey
JOIN (SELECT c_custkey, c_nationkey, n_name FROM customer_geo_v WHERE r_name = 'ASIA') cg
  ON o_custkey = c_custkey
JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
GROUP BY n_name
"""
def star_sql(spark, sf):
    return spark.sql(STAR).coalesce(1).sortWithinPartitions("n_name")

ROLLUP = f"""
SELECT /*+ BROADCAST(nation), BROADCAST(region) */ r_name, n_name,
  count(*) AS n_customers,
  {ms("c_acctbal")} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""
def rollup_sql(spark, sf):
    return spark.sql(ROLLUP).coalesce(1).sortWithinPartitions(
        F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())

Q3 = f"""
SELECT /*+ BROADCAST(o) */ o_orderkey, o_orderdate,
  {ms("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN (SELECT o_orderkey, o_orderdate, o_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00') o
  ON l_orderkey = o_orderkey
LEFT SEMI JOIN (SELECT /*+ BROADCAST(customer) */ c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
  ON o_custkey = c_custkey
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""
def q3_sql(spark, sf):
    return spark.sql(Q3)

TUMBLING = f"""
SELECT window.start AS window_start, event_type,
  count(*) AS n_events,
  {ms("value")} AS sum_value
FROM events
GROUP BY window(ts, '1 hour'), event_type
"""
def tumbling_sql(spark, sf):
    return spark.sql(TUMBLING).coalesce(1).sortWithinPartitions("window_start", "event_type")

JSONQ = """
SELECT event_type, count(*) AS n_events,
  CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS DOUBLE) / count(*) AS avg_k,
  max(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""
def json_sql(spark, sf):
    return spark.sql(JSONQ).coalesce(1).sortWithinPartitions("event_type")

pairs = [
    ("agg_pricing_q1", q1_sql), ("join_star_q5", star_sql), ("agg_rollup", rollup_sql),
    ("topk_revenue_q3", q3_sql), ("stream_tumbling", tumbling_sql), ("scalar_json", json_sql),
]
# correctness: same rows as current impl
import pandas as pd
for k, fn in pairs:
    a = qs[k](spark, SF).toPandas().sort_values(by=lambda_cols) if False else qs[k](spark, SF).toPandas()
    b = fn(spark, SF).toPandas()
    ka = a.sort_values(list(a.columns)).reset_index(drop=True)
    kb = b.sort_values(list(b.columns)).reset_index(drop=True)
    same = ka.equals(kb)
    print(f"{k:18s} rows {len(a)}=={len(b)} equal={same}")

for i in range(3):
    for k, fn in pairs:
        qs[k](spark, SF).toPandas(); fn(spark, SF).toPandas()
print(f"{'key':18s} {'cur-build':>9s} {'sql-build':>9s} {'cur-full':>8s} {'sql-full':>8s}")
for k, fn in pairs:
    cb = timeit(lambda: qs[k](spark, SF))
    sb = timeit(lambda: fn(spark, SF))
    cf = timeit(lambda: qs[k](spark, SF).toPandas())
    sf_ = timeit(lambda: fn(spark, SF).toPandas())
    print(f"{k:18s} {cb*1000:9.1f} {sb*1000:9.1f} {cf*1000:8.1f} {sf_*1000:8.1f}")
