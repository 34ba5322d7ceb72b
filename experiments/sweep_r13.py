"""Round-13 quiet sweep: warm + min-of-N noop-sink timing for a list
of registry keys in ONE warm session (guide §1.4/§1.5). Used for the
non-tier-2 targets this round touches (ER append, HITS pair, Louvain
family) whose driver bench numbers don't exist at sf0.1.

Usage: python experiments/sweep_r13.py key1,key2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ezbake_graph_spark import registry  # noqa: E402
from ezbake_graph_spark.session import get_session  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
RUNS = int(os.environ.get("SWEEP_RUNS", "3"))


def main() -> None:
    keys = [k.strip() for k in sys.argv[1].split(",") if k.strip()]
    spark = get_session("sweep-r13")
    qs = registry.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")
    for key in keys:
        # one untimed warm run, then min-of-RUNS noop
        spark.sparkContext.setJobDescription(f"r13 sweep warm: {key}")
        qs[key](spark, SF).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(RUNS):
            spark.sparkContext.setJobDescription(f"r13 sweep: {key}")
            t0 = time.perf_counter()
            qs[key](spark, SF).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{key:40s} {best:8.3f}s  sf={SF}", flush=True)


if __name__ == "__main__":
    main()
