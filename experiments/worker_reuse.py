import sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark.session import get_session

spark = get_session("wr")
print("reuse conf:", spark.conf.get("spark.python.worker.reuse", "unset"))
print("faulthandler:", spark.conf.get("spark.python.worker.faulthandler.enabled", "unset"))
tiny = spark.range(2).selectExpr("id as vec_id")
def pt(it):
    import os, pandas as pd
    t0 = time.perf_counter()
    import numpy
    for p in it: pass
    yield pd.DataFrame({"pid":[os.getpid()]})
pids = []
for i in range(6):
    t0 = time.perf_counter()
    r = tiny.coalesce(1).mapInPandas(pt, "pid long").toPandas()
    dt = time.perf_counter() - t0
    pids.append((int(r.pid.iloc[0]), round(dt*1000,1)))
print("pids per run:", pids)
