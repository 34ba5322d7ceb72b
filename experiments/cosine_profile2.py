import sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import tables
from ezbake_graph_spark.session import get_session
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_session("cosprof2")
emb = tables.load(spark, SF, "embeddings").select("vec_id","embedding")
one = emb.select("vec_id","embedding",F.lit(0).cast("int").alias("b"),F.lit(0).cast("int").alias("pk"))

def t(label, fn, runs=7):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0=time.perf_counter(); fn(); best=min(best,time.perf_counter()-t0)
    print(f"{label:36s} {best*1000:7.1f} ms")

def pt_pandas(it):
    import pandas as pd
    for p in it: pass
    yield pd.DataFrame({"vid1":[1],"vid2":[2],"cosine":[0.5]})
t("mapInPandas passthrough", lambda: one.coalesce(1).mapInPandas(pt_pandas, "vid1 long, vid2 long, cosine double").toPandas())

def pt_arrow(it):
    import pyarrow as pa
    for b in it: pass
    yield pa.RecordBatch.from_pydict({"vid1":[1],"vid2":[2],"cosine":[0.5]})
def run_arrow():
    import pyarrow as pa
    return one.coalesce(1).mapInArrow(pt_arrow, "vid1 long, vid2 long, cosine double").toPandas()
t("mapInArrow passthrough", run_arrow)

# how much is the python stage vs the job itself? same job shape, JVM only:
t("JVM-only coalesce(1) count", lambda: one.coalesce(1).selectExpr("count(*)").toPandas())
# a python stage over TINY input:
tiny = spark.range(2).selectExpr("id as vec_id")
def pt2(it):
    import pandas as pd
    for p in it: pass
    yield pd.DataFrame({"x":[1]})
t("mapInPandas over 2 rows", lambda: tiny.coalesce(1).mapInPandas(pt2, "x long").toPandas())
