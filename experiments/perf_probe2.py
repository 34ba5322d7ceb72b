"""Decompose: python plan-build vs JVM analysis vs execution; and check
whether fresh-lineage re-execution (no shuffle reuse) is the honest number."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session

SF = "/root/testdata/sf0.1"
spark = get_session("perf-probe2")
qs = registry.queries()
keys = sorted(k for k, s in registry.REGISTRY.items() if "bench" in s.tags)

def timeit(fn, runs=5):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

for i in range(3):
    for k in keys:
        qs[k](spark, SF).toPandas()

print(f"{'key':22s} {'build':>7s} {'analyze':>8s} {'full':>7s} {'reused-df':>9s}")
tot_full = tot_build = 0.0
for k in keys:
    t_build = timeit(lambda: qs[k](spark, SF))          # python DF construction only
    def build_and_analyze():
        df = qs[k](spark, SF)
        df.schema  # forces analysis
    t_an = timeit(build_and_analyze)
    t_full = timeit(lambda: qs[k](spark, SF).toPandas())
    df = qs[k](spark, SF); df.toPandas()
    t_re = timeit(lambda: df.toPandas())
    tot_full += t_full; tot_build += t_build
    print(f"{k:22s} {t_build*1000:7.1f} {t_an*1000:8.1f} {t_full*1000:7.1f} {t_re*1000:9.1f}")
print(f"TOTAL full={tot_full:.3f}s  build={tot_build:.3f}s")
