import sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session

SF = "/root/testdata/sf0.1"
spark = get_session("floorprof")
qs = registry.queries()
K = "text_term_counts"
for _ in range(5): qs[K](spark, SF).toPandas()

def t(label, fn, runs=7):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter(); r = fn(); best = min(best, time.perf_counter()-t0)
    print(f"{label:28s} {best*1000:7.1f} ms")
    return r

t("build", lambda: qs[K](spark, SF))
df = qs[K](spark, SF)
t("schema (analyze)", lambda: df.schema)
t("executedPlan", lambda: df._jdf.queryExecution().executedPlan())
t("build+exec+fetch (full)", lambda: qs[K](spark, SF).toPandas())
t("reuse-df toPandas", lambda: df.toPandas())
# fresh df each time, but time only the action:
def action_only():
    d = qs[K](spark, SF)
    d._jdf.queryExecution().executedPlan()  # pre-plan
    t0 = time.perf_counter()
    d.toPandas()
    return time.perf_counter() - t0
best = min(action_only() for _ in range(7))
print(f"{'action after pre-plan':28s} {best*1000:7.1f} ms")
# job-level: how long does an empty job take?
sc = spark.sparkContext
t("empty rdd job", lambda: sc.parallelize(range(32), 32).count())
t("1-task rdd job", lambda: sc.parallelize([1], 1).count())
