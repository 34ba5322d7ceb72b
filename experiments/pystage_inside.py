import sys, time, json
from pyspark.sql import SparkSession
b = (SparkSession.builder.master("local[32]").appName("ps2")
     .config("spark.ui.enabled","false").config("spark.locality.wait","0"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
tiny = spark.range(2).selectExpr("id as vec_id")
def pt(it):
    import pandas as pd, time as _t
    t_entry = _t.time()
    n = 0
    for p in it: n += 1
    t_done = _t.time()
    yield pd.DataFrame({"entry":[t_entry], "done":[t_done]})
for i in range(6):
    t0 = time.time()
    r = tiny.coalesce(1).mapInPandas(pt, "entry double, done double").toPandas()
    t1 = time.time()
    entry, done = r.entry.iloc[0], r.done.iloc[0]
    print(f"total={1000*(t1-t0):6.1f}  submit->workerentry={1000*(entry-t0):6.1f}  worker={1000*(done-entry):5.1f}  return={1000*(t1-done):6.1f}")
