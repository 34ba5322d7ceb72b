"""Round-12 stage-level profiler for the heavy tier-2 keys.

Times each internal stage of a key's pipeline separately via noop-sink
writes (guide §1.4) so the expensive operator is identified by
measurement, not guess. Labels every job (guide §1.5). Run on a quiet
machine; numbers are min-of-N warm.

Usage: python experiments/profile_r12.py <probe> [sf_dir]
Probes: minhash, er, curate, basket, warm_key <key>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ezbake_graph_spark import registry, tables  # noqa: E402
from ezbake_graph_spark.session import get_session  # noqa: E402

SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
RUNS = int(os.environ.get("PROF_RUNS", "3"))


def timed(spark, label, df_fn, runs=None, fetch=False):
    best = float("inf")
    n = None
    for _ in range(runs or RUNS):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df = df_fn()
        if fetch:
            out = df.toPandas()
            n = len(out)
        else:
            df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    print(f"{label:55s} {best:8.3f}s" + (f"  rows={n}" if n is not None else ""))
    return best


def probe_minhash(spark):
    from ezbake_graph_spark.operators import llm_dedup as L

    tok = L._doc_tokens(spark, SF).cache()
    tok.count()
    n_minhash = L.N_MINHASH
    sig_cols = [
        F.min(F.xxhash64(F.concat(F.col("token"), F.lit(f"#perm{i}")))).alias(f"h{i}")
        for i in range(n_minhash)
    ]
    timed(spark, "1 tok explode+distinct (uncached copy)",
          lambda: L._doc_tokens(spark, SF))
    sigs = tok.groupBy("doc_id").agg(*sig_cols)
    timed(spark, "2 64-minhash signature agg", lambda: sigs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"h{b * L.ROWS_PER_BAND + r}") for r in range(L.ROWS_PER_BAND)]
                ).alias("band_hash"),
            )
            for b in range(L.N_BANDS)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    ).cache()
    bands.count()
    left = bands.select("band_id", "band_hash", F.col("doc_id").alias("doc1"))
    right = bands.select("band_id", "band_hash", F.col("doc_id").alias("doc2"))
    cand_raw = (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
    )
    timed(spark, "3 band collision join (no distinct)", lambda: cand_raw)
    candidates = cand_raw.repartition(
        spark.sparkContext.defaultParallelism, "doc1", "doc2"
    ).distinct()
    timed(spark, "4 collisions + repartition + distinct", lambda: candidates)
    cand_c = candidates.cache()
    print("   n_candidates =", cand_c.count())
    toksets = tok.groupBy("doc_id").agg(F.collect_set("token").alias("toks"))
    t1 = F.broadcast(
        toksets.select(F.col("doc_id").alias("doc1"), F.col("toks").alias("toks1"))
    )
    t2 = F.broadcast(
        toksets.select(F.col("doc_id").alias("doc2"), F.col("toks").alias("toks2"))
    )
    common = F.size(F.array_intersect("toks1", "toks2")).cast("double")
    union = (F.size("toks1") + F.size("toks2")).cast("double") - common
    verified = (
        cand_c.join(t1, "doc1").join(t2, "doc2")
        .withColumn("jaccard_raw", common / union)
        .filter(F.col("jaccard_raw") >= L.JACCARD_THRESHOLD)
        .select("doc1", "doc2", F.col("jaccard_raw").alias("jaccard"))
    )
    timed(spark, "5 verify join+jaccard (from cached candidates)",
          lambda: verified)
    timed(spark, "6 verify + orderBy (noop)", lambda: verified.orderBy("doc1", "doc2"))
    timed(spark, "7 full key noop (as registered, uncached)",
          lambda: registry.queries()["dedup_minhash"](spark, SF))
    timed(spark, "8 full key toPandas (bench shape)",
          lambda: registry.queries()["dedup_minhash"](spark, SF), fetch=True)
    cand_c.unpersist(); bands.unpersist(); tok.unpersist()


def probe_er(spark):
    from ezbake_graph_spark.operators import llm_dedup as L

    c = tables.load(spark, SF, "customer")
    r = c.select(
        F.col("c_custkey").alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("block"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("val"),
    )
    sigs = r.filter(F.col("name").isNotNull()).select(
        "rec_id", "block", F.explode(L._deletion_sigs("name")).alias("sig")
    )
    timed(spark, "1 deletion-sig explode", lambda: sigs)
    cand = L._er_candidate_pairs(r)
    timed(spark, "2 candidate pairs (sig self-join + distinct)", lambda: cand)
    cand_c = cand.cache()
    print("   n_candidates =", cand_c.count())
    lhs = r.select(F.col("rec_id").alias("src"), F.col("name").alias("name_a"),
                   F.col("segment").alias("seg_a"))
    rhs = r.select(F.col("rec_id").alias("dst"), F.col("name").alias("name_b"),
                   F.col("segment").alias("seg_b"))
    dist = F.levenshtein("name_a", "name_b")
    pairs = (
        cand_c.join(lhs, "src").join(rhs, "dst")
        .select("src", "dst", dist.cast("int").alias("name_dist"),
                (F.col("seg_a") == F.col("seg_b")).alias("same_segment"))
        .filter((F.col("name_dist") <= L.ER_NAME_DIST)
                | ((F.col("name_dist") <= L.ER_WEAK_DIST) & F.col("same_segment")))
        .select("src", "dst")
    )
    timed(spark, "3 levenshtein verify (from cached candidates)", lambda: pairs)
    p = pairs.localCheckpoint()
    print("   n_match_pairs =", p.count())
    from ezbake_graph_spark.graph.pregel import connected_components
    sym = p.union(p.select(F.col("dst"), F.col("src")))
    verts = sym.select(F.col("src").alias("id")).distinct()

    def wcc():
        return connected_components(verts, p)

    timed(spark, "4 WCC pregel over match pairs", wcc, runs=2)
    timed(spark, "5 full key noop", lambda: registry.queries()["dedup_resolve_entities"](spark, SF), runs=2)
    timed(spark, "6 full key toPandas (bench shape)",
          lambda: registry.queries()["dedup_resolve_entities"](spark, SF),
          runs=2, fetch=True)
    cand_c.unpersist()


def probe_curate(spark):
    from ezbake_graph_spark import api
    from ezbake_graph_spark.operators.llm_curate import (
        CURATE_MAX_TOP_UNIGRAM, CURATE_THRESHOLD, _fab_docs,
    )

    docs = _fab_docs(spark, SF)
    timed(spark, "1 fabricated docs scan", lambda: docs)
    timed(spark, "2 full curate_corpus noop",
          lambda: registry.queries()["curate_corpus"](spark, SF), runs=2)
    timed(spark, "3 full prepare_training_data noop",
          lambda: registry.queries()["prepare_training_data"](spark, SF), runs=2)
    timed(spark, "4 curate toPandas (bench shape)",
          lambda: registry.queries()["curate_corpus"](spark, SF), runs=2, fetch=True)


def probe_basket(spark):
    timed(spark, "events_market_basket noop",
          lambda: registry.queries()["events_market_basket"](spark, SF))
    timed(spark, "events_market_basket toPandas",
          lambda: registry.queries()["events_market_basket"](spark, SF), fetch=True)


def probe_warm_key(spark, key):
    timed(spark, f"{key} noop", lambda: registry.queries()[key](spark, SF))
    timed(spark, f"{key} toPandas", lambda: registry.queries()[key](spark, SF),
          fetch=True)


def main():
    probe = sys.argv[1]
    spark = get_session("profile-r12")
    registry.queries()
    # one warmup pass of the probe target family to settle JIT
    if probe == "warm_key":
        key = SF  # shifted args: warm_key <key> [sf]
    if probe == "minhash":
        probe_minhash(spark)
    elif probe == "er":
        probe_er(spark)
    elif probe == "curate":
        probe_curate(spark)
    elif probe == "basket":
        probe_basket(spark)
    else:
        probe_warm_key(spark, probe)


if __name__ == "__main__":
    main()
