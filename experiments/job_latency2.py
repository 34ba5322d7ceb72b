import time, sys
from pyspark.sql import SparkSession
b = (SparkSession.builder.master("local[32]").appName("lat2")
     .config("spark.sql.shuffle.partitions","32")
     .config("spark.sql.adaptive.enabled", sys.argv[1] if len(sys.argv)>1 else "true")
     .config("spark.ui.enabled","false")
     .config("spark.locality.wait","0"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
def t(label, fn, runs=11):
    fn(); fn()
    best = float("inf")
    for _ in range(runs):
        t0=time.perf_counter(); fn(); best=min(best,time.perf_counter()-t0)
    print(f"{label:34s} min={best*1000:7.1f} ms")
t("range(1).collect (1 job, 1 task)", lambda: spark.range(1).collect())
t("range(1e6).sum (1 job, N task)", lambda: spark.range(1000000).selectExpr("sum(id)").collect())
df = spark.range(100000).selectExpr("id % 5 as k", "id as v")
t("groupBy shuffle (2 stage)", lambda: df.groupBy("k").sum("v").collect())
t("groupBy shuffle toPandas", lambda: df.groupBy("k").sum("v").toPandas())
