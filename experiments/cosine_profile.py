import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
from ezbake_graph_spark import registry, tables
from ezbake_graph_spark.session import get_session
from ezbake_graph_spark.operators.llm_similarity import _pair_group_topk
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.1"
spark = get_session("cosprof")
qs = registry.queries()
K = "sim_cosine_topk"
for _ in range(4): qs[K](spark, SF).toPandas()

def t(label, fn, runs=7):
    fn()
    best = float("inf")
    for _ in range(runs):
        t0=time.perf_counter(); fn(); best=min(best,time.perf_counter()-t0)
    print(f"{label:36s} {best*1000:7.1f} ms")

t("full query", lambda: qs[K](spark, SF).toPandas())
emb = tables.load(spark, SF, "embeddings").select("vec_id","embedding")
t("emb scan collect (toPandas)", lambda: emb.toPandas())
one = emb.select("vec_id","embedding",F.lit(0).cast("int").alias("b"),F.lit(0).cast("int").alias("pk"))
def passthrough(it):
    import pandas as pd
    for p in it:
        pass
    yield pd.DataFrame({"vid1":[1],"vid2":[2],"cosine":[0.5]})
t("mapInPandas passthrough", lambda: one.coalesce(1).mapInPandas(passthrough, "vid1 long, vid2 long, cosine double").toPandas())
pdf = one.toPandas()
t("kernel only (python)", lambda: _pair_group_topk(pdf, 1, 20))
