import time, sys
from pyspark.sql import SparkSession
master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
extra = sys.argv[2:] if len(sys.argv) > 2 else []
b = SparkSession.builder.master(master).appName("lat")
for kv in extra:
    k,_,v = kv.partition("="); b = b.config(k,v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
for _ in range(3): sc.parallelize([1],1).count()
def t(label, fn, runs=9):
    best = float("inf"); tot = 0
    for _ in range(runs):
        t0=time.perf_counter(); fn(); d=time.perf_counter()-t0; best=min(best,d); tot+=d
    print(f"{label:30s} min={best*1000:7.1f} avg={tot/runs*1000:7.1f} ms")
t("1-task job", lambda: sc.parallelize([1],1).count())
t("32-task job", lambda: sc.parallelize(range(32),32).count())
t("sql 1", lambda: spark.sql("select 1").collect())
t("range agg", lambda: spark.range(1000000).selectExpr("sum(id)").collect())
