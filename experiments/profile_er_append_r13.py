"""Stage profile of dedup_resolve_entities_append (r13): where do the
~13 s go after the old-resolution checkpoint? Times each phase of the
append path separately via noop sinks (guide §1.4), one warm session.

Usage: python experiments/profile_er_append_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ezbake_graph_spark import registry, tables  # noqa: E402
from ezbake_graph_spark.session import get_session  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(os.environ.get("PROF_RUNS", "2"))


def timed(spark, label, fn, runs=RUNS):
    best = float("inf")
    for _ in range(runs):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df = fn()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{label:55s} {best:8.3f}s", flush=True)
    return best


def main() -> None:
    from ezbake_graph_spark.operators import llm_dedup as L

    spark = get_session("profile-er-append-r13")
    registry.queries()
    c = tables.load(spark, SF, "customer").select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("block"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("val"),
    )
    old = c.filter(F.col("rec_id") % 4 != 0)
    new = c.filter(F.col("rec_id") % 4 == 0)
    # warm
    registry.queries()["dedup_resolve_entities_append"](spark, SF).write.mode(
        "overwrite"
    ).format("noop").save()

    timed(spark, "1 batch resolve_entities(old) alone", lambda: L.resolve_entities(old))
    old_res = (
        L.resolve_entities(old)
        .select("rec_id", "entity_id", "n_matches")
        .localCheckpoint(eager=True)
    )
    timed(
        spark,
        "2 append fold given materialized old_res",
        lambda: L.resolve_entities_append(old, old_res, new),
    )
    cols = ["rec_id", "name", "block", "segment", "val"]
    all_r = (
        old.select(*cols)
        .withColumn("is_new", F.lit(False))
        .unionByName(new.select(*cols).withColumn("is_new", F.lit(True)))
        .localCheckpoint(eager=True)
    )
    timed(
        spark,
        "3   append candidate pairs (new x all)",
        lambda: L._er_candidate_pairs(all_r, new_only=True),
    )
    timed(
        spark,
        "4 full key (resolve + append)",
        lambda: registry.queries()["dedup_resolve_entities_append"](spark, SF),
    )


if __name__ == "__main__":
    main()
