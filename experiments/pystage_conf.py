import sys, time
from pyspark.sql import SparkSession
extra = sys.argv[1:]
b = (SparkSession.builder.master("local[32]").appName("ps")
     .config("spark.ui.enabled","false").config("spark.locality.wait","0")
     .config("spark.sql.execution.arrow.pyspark.enabled","true"))
for kv in extra:
    k,_,v = kv.partition("="); b = b.config(k,v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
tiny = spark.range(2).selectExpr("id as vec_id")
def pt(it):
    import pandas as pd
    for p in it: pass
    yield pd.DataFrame({"x":[1]})
ts = []
for i in range(8):
    t0 = time.perf_counter()
    tiny.coalesce(1).mapInPandas(pt, "x long").toPandas()
    ts.append(round((time.perf_counter()-t0)*1000,1))
print(ts, "min:", min(ts[2:]))
