"""Probe 3: (a) planning-only cost; (b) AQE off full cost; (c) collect vs toPandas."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session

SF = "/root/testdata/sf0.1"
spark = get_session("perf-probe3")
qs = registry.queries()
keys = sorted(k for k, s in registry.REGISTRY.items() if "bench" in s.tags)

def timeit(fn, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

for i in range(2):
    for k in keys:
        qs[k](spark, SF).toPandas()

print(f"{'key':22s} {'plan-only':>9s} {'full':>7s} {'fullAQEoff':>10s}")
tot_on = tot_off = 0.0
for k in keys:
    def plan_only():
        df = qs[k](spark, SF)
        df._jdf.queryExecution().executedPlan()
    t_plan = timeit(plan_only)
    t_full = timeit(lambda: qs[k](spark, SF).toPandas())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs[k](spark, SF).toPandas()
    t_off = timeit(lambda: qs[k](spark, SF).toPandas())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    tot_on += t_full; tot_off += t_off
    print(f"{k:22s} {t_plan*1000:9.1f} {t_full*1000:7.1f} {t_off*1000:10.1f}")
print(f"TOTAL on={tot_on:.3f}s off={tot_off:.3f}s")
