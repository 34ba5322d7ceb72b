"""Same-session interleaved A/B: Louvain per-node argmax as row_number
window vs struct-max groupBy (r13 candidate). Both forms are run on the
IDENTICAL cached arc frame, alternating A/B/A/B (min-of-N each), so
machine drift hits both equally — the r12 attribution discipline.

Usage: python experiments/louvain_ab_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ezbake_graph_spark.operators.graph import bipartite_edges
from ezbake_graph_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = 4
REPS = 3


def rounds(ew, schedule, argmax):
    deg = ew.groupBy(F.col("src").alias("id")).agg(F.sum("_w").alias("deg")).cache()
    m2 = ew.agg(F.sum("_w").alias("m2")).cache()
    cm = deg.select("id", F.col("id").alias("label"))
    for r in range(ROUNDS):
        tot = cm.join(deg, "id").groupBy("label").agg(F.sum("deg").alias("tot"))
        kic = (
            ew.filter(F.col("src") != F.col("dst"))
            .join(
                cm.select(F.col("id").alias("dst"), F.col("label").alias("cand")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "cand")
            .agg(F.sum("_w").alias("kic"))
        )
        cands = (
            kic.unionByName(
                cm.select(
                    "id",
                    F.col("label").alias("cand"),
                    F.lit(0).cast("long").alias("kic"),
                )
            )
            .groupBy("id", "cand")
            .agg(F.max("kic").alias("kic"))
        )
        scored = (
            cands.join(deg, "id")
            .join(cm, "id")
            .join(tot.withColumnRenamed("label", "cand"), "cand")
            .crossJoin(F.broadcast(m2))
            .select(
                "id",
                "cand",
                "label",
                (
                    F.col("m2") * F.col("kic")
                    - F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("cand") == F.col("label"), F.col("deg")
                        ).otherwise(0)
                    )
                ).alias("score"),
            )
        )
        if schedule == "updown":
            direction = (
                F.col("cand") < F.col("label")
                if r % 2 == 0
                else F.col("cand") > F.col("label")
            )
            scored = scored.filter((F.col("cand") == F.col("label")) | direction)
        if argmax == "window":
            w = Window.partitionBy("id").orderBy(F.desc("score"), F.col("cand"))
            picked = (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("id", F.col("cand").alias("new_label"))
            )
        else:
            picked = (
                scored.groupBy("id")
                .agg(
                    F.max(
                        F.struct(F.col("score"), (-F.col("cand")).alias("neg_cand"))
                    ).alias("best")
                )
                .select("id", (-F.col("best.neg_cand")).alias("new_label"))
            )
        gate = F.col("id") % 2 == r % 2 if schedule == "parity" else F.lit(True)
        cm = cm.join(picked, "id").select(
            "id",
            F.when(gate, F.col("new_label")).otherwise(F.col("label")).alias("label"),
        )
        cm = cm.localCheckpoint(eager=True)
    out = cm.select("id", F.col("label").alias("community"))
    deg.unpersist()
    m2.unpersist()
    return out


def main() -> None:
    spark = get_session("louvain-ab-r13")
    conf = spark.conf
    edges = bipartite_edges(spark, SF)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    ew0 = sym.select("src", "dst", F.lit(1).cast("long").alias("_w"))
    prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
    prev_part = conf.get("spark.sql.shuffle.partitions", "200")
    conf.set("spark.sql.adaptive.enabled", "false")
    provisional = max(4, min(int(prev_part), spark.sparkContext.defaultParallelism))
    conf.set("spark.sql.shuffle.partitions", str(provisional))
    try:
        n_part = max(4, min(provisional, ew0.count() // 250_000 + 1))
        conf.set("spark.sql.shuffle.partitions", str(n_part))
        ew = ew0.repartition(n_part, "dst").cache()
        ew.count()
        # warm both forms once
        for form in ("window", "structmax"):
            rounds(ew, "parity", form).write.mode("overwrite").format("noop").save()
        best = {"window": float("inf"), "structmax": float("inf")}
        rows = {}
        for rep in range(REPS):
            for form in ("window", "structmax"):
                spark.sparkContext.setJobDescription(f"louvain {form} rep{rep}")
                t0 = time.perf_counter()
                out = rounds(ew, "parity", form)
                out.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best[form] = min(best[form], dt)
                print(f"rep{rep} {form:10s} {dt:7.3f}s", flush=True)
                rows[form] = sorted(
                    (r.id, r.community) for r in out.collect()
                )
        assert rows["window"] == rows["structmax"], "forms diverge!"
        print({k: round(v, 3) for k, v in best.items()})
    finally:
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        conf.set("spark.sql.shuffle.partitions", prev_part)


if __name__ == "__main__":
    main()
