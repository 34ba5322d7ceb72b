import sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import tables
from ezbake_graph_spark.session import get_session
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_session("gd")
li = tables.load(spark, SF, "lineitem")

def t(label, fn, runs=7):
    fn(); fn()
    best = float("inf")
    for _ in range(runs):
        t0=time.perf_counter(); fn(); best=min(best,time.perf_counter()-t0)
    print(f"{label:40s} {best*1000:7.1f} ms")

cur = lambda: li.groupBy(F.col("l_suppkey").alias("supp_id")).agg(F.countDistinct("l_partkey").alias("degree")).toPandas()
t("current countDistinct", cur)

def packed():
    sp = (F.col("l_suppkey")*F.lit(1<<32) + F.col("l_partkey")).alias("sp")
    return (li.select(sp).distinct()
            .select((F.col("sp")/F.lit(1<<32)).cast("long").alias("supp_id"))
            .groupBy("supp_id").agg(F.count(F.lit(1)).alias("degree")).toPandas())
t("packed distinct->count", packed)

def distinct_then():
    return (li.select(F.col("l_suppkey").alias("supp_id"), "l_partkey").distinct()
            .groupBy("supp_id").agg(F.count(F.lit(1)).alias("degree")).toPandas())
t("distinct then count", distinct_then)
