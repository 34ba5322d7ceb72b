"""Protocol-faithful mini-bench: headline keys only, 2 warm passes + min-of-5."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session

SF = "/root/testdata/sf0.1"
spark = get_session("minibench")
qs = registry.queries()
keys = sorted(k for k, s in registry.REGISTRY.items() if "bench" in s.tags)
for i in range(3):
    for k in keys:
        qs[k](spark, SF).toPandas()
out = {}
for k in keys:
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        qs[k](spark, SF).toPandas()
        best = min(best, time.perf_counter() - t0)
    out[k] = best
for k in keys:
    print(f"{k:22s} {out[k]*1000:7.1f}")
print(f"TOTAL {sum(out.values()):.4f} s")
