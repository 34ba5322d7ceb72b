import time
from pyspark.sql import SparkSession
b = (SparkSession.builder.master("local[32]").appName("lat3")
     .config("spark.sql.shuffle.partitions","32")
     .config("spark.ui.enabled","false").config("spark.locality.wait","0"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
def t(label, fn, runs=15):
    fn(); fn()
    best = float("inf")
    for _ in range(runs):
        t0=time.perf_counter(); fn(); best=min(best,time.perf_counter()-t0)
    print(f"{label:40s} min={best*1000:7.1f} ms")

d1 = spark.range(1); d1.collect()
t("REUSED range(1).collect  (job only)", lambda: d1.collect())
t("FRESH  range(1).collect", lambda: spark.range(1).collect())
t("FRESH  range(1) build only", lambda: spark.range(1))
d1p = spark.range(1)
d1p._jdf.queryExecution().executedPlan()
t("PREPLANNED collect", lambda: d1p.collect())
jvm_time = spark._jvm.System
t("py4j round trip", lambda: jvm_time.currentTimeMillis())
df = spark.range(100000).selectExpr("id % 5 as k", "id as v").groupBy("k").sum("v")
df.collect()
t("REUSED 2-stage collect (jobs only)", lambda: df.collect())
