"""Round-8 perf probe: per-query job counts + variant timings at sf0.1.

Measures (warm session, min-of-5):
  1. current headline per-query times + job counts (statusTracker)
  2. graph_degree variants: current orderBy vs sortWithinPartitions vs none
  3. Catalyst-analysis share: fn(spark).toPandas() vs prebuilt df.toPandas()
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session
from pyspark.sql import functions as F
from ezbake_graph_spark import tables

SF = "/root/testdata/sf0.1"
spark = get_session("perf-probe")
qs = registry.queries()
keys = sorted(k for k, s in registry.REGISTRY.items() if "bench" in s.tags)

def timeit(fn, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

# warmup
for i in range(3):
    for k in keys:
        qs[k](spark, SF).toPandas()

st = spark.sparkContext.statusTracker()
print("== current headline: time + jobs ==")
tot = 0.0
for k in keys:
    sc = spark.sparkContext
    sc.setJobGroup(k, k)
    before = len(st.getJobIdsForGroup(k))
    t = timeit(lambda: qs[k](spark, SF).toPandas())
    # count jobs for ONE run
    spark.sparkContext.setJobGroup(k + "_c", k)
    qs[k](spark, SF).toPandas()
    jobs = len(st.getJobIdsForGroup(k + "_c"))
    tot += t
    print(f"{k:22s} {t*1000:7.1f} ms  jobs/run={jobs}")
print(f"TOTAL {tot:.4f} s")

print("\n== graph_degree variants ==")
li = tables.load(spark, SF, "lineitem")
def gd_base():
    return li.groupBy(F.col("l_suppkey").alias("supp_id")).agg(F.countDistinct("l_partkey").alias("degree"))
v = {
  "orderBy (current)": lambda: gd_base().orderBy("supp_id").toPandas(),
  "sortWithinPartitions": lambda: gd_base().sortWithinPartitions("supp_id").toPandas(),
  "no sort": lambda: gd_base().toPandas(),
  "distinct-then-count +swp": lambda: li.select(F.col("l_suppkey").alias("supp_id"), "l_partkey").distinct().groupBy("supp_id").agg(F.count(F.lit(1)).alias("degree")).sortWithinPartitions("supp_id").toPandas(),
}
for name, fn in v.items():
    fn()
    print(f"{name:28s} {timeit(fn)*1000:7.1f} ms")

print("\n== analysis share (prebuilt df reuse) ==")
for k in keys:
    df = qs[k](spark, SF)
    df.toPandas()
    t_pre = timeit(lambda: df.toPandas())
    t_full = timeit(lambda: qs[k](spark, SF).toPandas())
    print(f"{k:22s} full={t_full*1000:7.1f}  prebuilt={t_pre*1000:7.1f}  delta={1000*(t_full-t_pre):6.1f} ms")
