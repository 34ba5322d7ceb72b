"""Parameterized API (ezbake_graph_spark.api): the doctest on every
public function runs against a live session, and each kernel-backed
entry is cross-checked against the fixture-bound registry query that
shares its kernel."""

from __future__ import annotations

import doctest

import pytest

from ezbake_graph_spark import api, registry, tables
from tests.conftest import SF_SMOKE


def test_every_api_doctest_passes(spark):
    finder = doctest.DocTestFinder()
    runner = doctest.DocTestRunner(optionflags=doctest.NORMALIZE_WHITESPACE)
    ran = 0
    for dt in finder.find(api, extraglobs={"spark": spark}):
        if not dt.examples:
            continue
        runner.run(dt)
        ran += 1
    assert runner.failures == 0, f"{runner.failures} doctest failures"
    # every non-re-exported public function carries a runnable example
    assert ran >= 4


def test_cosine_topk_matches_registry_kernel(spark):
    emb = tables.load(spark, SF_SMOKE, "embeddings")
    got = api.cosine_topk(emb, k=20).collect()
    want = registry.queries()["sim_cosine_topk"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_minhash_near_dups_matches_registry_kernel(spark):
    docs = tables.load(spark, SF_SMOKE, "documents")
    got = {
        (r["doc1"], r["doc2"]) for r in api.minhash_near_dups(docs).collect()
    }
    want = {
        (r["doc1"], r["doc2"])
        for r in registry.queries()["dedup_minhash"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_sessionize_matches_session_stats(spark):
    from pyspark.sql import functions as F

    ev = tables.load(spark, SF_SMOKE, "events")
    sess = api.sessionize(ev, "user_id", "ts", 1800)
    got = sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions")
    )
    want = registry.queries()["events_session_stats"](spark, SF_SMOKE).select(
        "user_id", "n_sessions"
    )
    g = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    w = {r["user_id"]: r["n_sessions"] for r in want.collect()}
    assert g == w


def test_find_motif_reproduces_fixed_wedge_query(spark):
    """The parser-built (p1)->(s)<-(p2) wedge must reproduce the
    registered graph_motif query's per-supplier wedge counts."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"  # sf0.001 has no parts over the
    # registered query's retail-price predicate (empty = vacuous test)
    li = tables.load(spark, sf, "lineitem")
    e = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    ).distinct()
    good = (
        tables.load(spark, sf, "part")
        .filter(F.col("p_retailprice") > 990)
        .select(F.col("p_partkey").alias("src"))
    )
    e = e.join(F.broadcast(good), "src", "left_semi")
    v = e.select(F.col("src").alias("id")).union(e.select("dst")).distinct()
    m = api.find_motif(v, e, "(p1)-[]->(s); (p2)-[]->(s)")
    got = {
        (r["supp_id"], r["n_wedges"])
        for r in m.filter(F.col("p1")["id"] < F.col("p2")["id"])
        .groupBy(F.col("s")["id"].alias("supp_id"))
        .agg(F.count(F.lit(1)).alias("n_wedges"))
        .collect()
    }
    want = {
        (r["supp_id"], r["n_wedges"])
        for r in registry.queries()["graph_motif"](spark, sf).collect()
    }
    assert got == want and got


def test_find_motif_negation_and_edge_binding(spark):
    from pyspark.sql import functions as F

    v = spark.createDataFrame([(i, f"n{i}") for i in range(3)], "id long, name string")
    e = spark.createDataFrame(
        [(0, 1, 5.0), (1, 0, 6.0), (1, 2, 7.0)], "src long, dst long, w double"
    )
    # mutual edges, with the edge row bound
    mutual = api.find_motif(v, e, "(a)-[ab]->(b); (b)-[]->(a)")
    rows = {(r["a"]["id"], r["b"]["id"], r["ab"]["w"]) for r in mutual.collect()}
    assert rows == {(0, 1, 5.0), (1, 0, 6.0)}
    # one-way edges only
    oneway = api.find_motif(v, e, "(a)-[]->(b); !(b)-[]->(a)")
    assert {(r["a"]["id"], r["b"]["id"]) for r in oneway.collect()} == {(1, 2)}
    with pytest.raises(ValueError):
        api.find_motif(v, e, "(a)-[]->(b); !(c)-[]->(a)")
    with pytest.raises(ValueError):
        api.find_motif(v, e, "(a)<-[]-(b)")


def test_asof_join_matches_registry_query(spark):
    """api.asof_join on the events fixture must reproduce the C8
    registry query join_asof (purchases <- latest click per user)."""
    from pyspark.sql import functions as F

    ev = tables.load(spark, SF_SMOKE, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("last_click_ts"))
        .agg(F.max("value").alias("last_click_value"))
        .select("user_id", F.col("last_click_ts").alias("ts"), "last_click_value")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("purchase_value")
    )
    got = api.asof_join(purch, clicks, on="ts", by="user_id").withColumn(
        "last_click_ts",
        F.when(F.col("last_click_value").isNotNull(), F.col("ts")),
    )
    # the registry query reports the matched click's ts; recompute it
    # by joining back on (user_id, last_click_value <= ...): simpler to
    # compare (event_id -> last_click_value) maps, the payload that
    # identifies the matched row
    g = {r["event_id"]: r["last_click_value"] for r in got.collect()}
    want = registry.queries()["join_asof"](spark, SF_SMOKE).collect()
    w = {r["event_id"]: r["last_click_value"] for r in want}
    assert g == w and g


def test_harmonic_closeness_exact_matches_registry(spark):
    """With sample=None (all vertices) the API estimator reduces to the
    exact fixture query graph_closeness on the nation trade graph."""
    from pyspark.sql import functions as F

    from ezbake_graph_spark.operators.graph import _nation_trade_edges

    edges = _nation_trade_edges(spark, SF_SMOKE)
    v = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select("dst"))
        .distinct()
    )
    got = {
        r["id"]: (r["n_reached"], r["harmonic_centrality"])
        for r in api.harmonic_closeness(v, edges).collect()
    }
    want = {
        r["nation_id"]: (r["n_reachable"], round(r["harmonic_centrality"], 6))
        for r in registry.queries()["graph_closeness"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_harmonic_closeness_sampled_estimates(spark):
    """Half-sample estimate stays within 2x of exact on a toy graph
    and the pair state is |S| x V shaped (only sampled targets seed)."""
    v = spark.createDataFrame([(i,) for i in range(6)], "id long")
    e = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(6) if i != j],
        "src long, dst long",
    )  # complete digraph: every h(v) = 5.0 exactly
    est = {
        r["id"]: r["harmonic_centrality"]
        for r in api.harmonic_closeness(v, e, sample=[0, 2, 4]).collect()
    }
    assert set(est) == set(range(6))
    for h in est.values():
        assert h == 5.0  # d=1 to every target: estimator is exact here


def test_tfidf_top_terms_matches_registry(spark):
    """api.tfidf_top_terms on the doc_id<100 slice must reproduce the
    registered text_tfidf query exactly."""
    from pyspark.sql import functions as F

    d = tables.load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 100)
    got = [tuple(r) for r in api.tfidf_top_terms(d, k=3).collect()]
    want = [
        tuple(r) for r in registry.queries()["text_tfidf"](spark, SF_SMOKE).collect()
    ]
    assert got == want and got


def test_decontaminate_matches_registry_split(spark):
    """api.decontaminate fed the registry's own md5 train/test split
    must reproduce dedup_decontaminate (modulo its LIMIT 100)."""
    from pyspark.sql import functions as F

    d = tables.load(spark, SF_SMOKE, "documents")
    first2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    train = d.filter(first2 < "cc")
    test = d.filter(~(first2 < "cc"))
    got = {
        (r["doc_id"], r["n_contaminated_shingles"])
        for r in api.decontaminate(train, test).limit(100).collect()
    }
    want = {
        (r["doc_id"], r["n_contaminated_shingles"])
        for r in registry.queries()["dedup_decontaminate"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_gapfill_matches_registry_ts_gapfill(spark):
    """api.gapfill (zero-fill, hourly, keyed by event_type) must agree
    with the registered ts_gapfill on (type, hour, count) — F.window's
    epoch-aligned hourly buckets coincide with date_trunc('hour')."""
    from pyspark.sql import functions as F

    ev = tables.load(spark, SF_SMOKE, "events")
    got = {
        (r["event_type"], r["bucket_start"], int(r["n_events"]))
        for r in api.gapfill(
            ev, by="event_type", aggs={"n_events": F.count(F.lit(1))}
        ).collect()
    }
    want = {
        (r["event_type"], r["hour_start"], r["n_events"])
        for r in registry.queries()["ts_gapfill"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_connected_components_parameterized(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11)], "id long")
    comp = {
        r["id"]: r["component"]
        for r in api.connected_components(vertices, edges).collect()
    }
    assert comp[1] == comp[2] == comp[3]
    assert comp[10] == comp[11]
    assert comp[1] != comp[10]


def test_pack_sequences_matches_registry(spark):
    """api.pack_sequences keyed by lang must reproduce the registered
    text_pack_sequences layout exactly."""
    d = tables.load(spark, SF_SMOKE, "documents")
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"], r["bin_id"], r["offset_tokens"])
        for r in api.pack_sequences(d, by="lang", context=512).collect()
    }
    want = {
        tuple(r)
        for r in registry.queries()["text_pack_sequences"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_asof_join_takes_nearest_right_row_atomically(spark):
    """ADVICE r5: when right rows have NULLs in some value columns, the
    output must carry the single nearest right row wholesale — never
    stitch column values from different right rows (pandas merge_asof /
    DuckDB ASOF whole-row semantics)."""
    left = spark.createDataFrame([("A", 30, 1.0)], "sym string, t long, px double")
    right = spark.createDataFrame(
        [("A", 10, 99.0, 100.0), ("A", 20, None, 101.0)],
        "sym string, t long, bid double, ask double",
    )
    row = api.asof_join(left, right, on="t", by="sym").collect()[0]
    # nearest right row is t=20: (bid=None, ask=101.0); a torn result
    # would show bid=99.0 spliced from the t=10 row
    assert row["bid"] is None and row["ask"] == 101.0
    # no match at all -> whole right payload NULL
    early = spark.createDataFrame([("A", 5, 1.0)], "sym string, t long, px double")
    r0 = api.asof_join(early, right, on="t", by="sym").collect()[0]
    assert r0["bid"] is None and r0["ask"] is None


def test_exact_dedup_null_distinct_groups(spark):
    """ADVICE r5: NULL must not canonicalize to '' — (NULL,'x'),
    ('x',NULL), ('x',''), ('','x') are four distinct groups."""
    d = spark.createDataFrame(
        [(1, None, "x"), (2, "x", None), (3, "x", ""), (4, "", "x")],
        "doc_id long, a string, b string",
    )
    out = api.exact_dedup(d, ["a", "b"], "doc_id").collect()
    assert len(out) == 4
    assert all(r["n_copies"] == 1 for r in out)


def test_minhash_threshold_drives_banding_recall(spark):
    """ADVICE r5: at threshold=0.5 the fixed 16x4 banding recalls only
    ~64% per pair; the derived 32x2 banding must recover >= 95% of the
    exact Jaccard>=0.5 pairs on the fixture corpus."""
    from pyspark.sql import functions as F

    docs = tables.load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    tok = docs.select(
        "doc_id",
        F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
    )
    a = tok.select(F.col("doc_id").alias("doc1"), F.col("toks").alias("t1"))
    b = tok.select(F.col("doc_id").alias("doc2"), F.col("toks").alias("t2"))
    inter = F.size(F.array_intersect("t1", "t2")).cast("double")
    union = (F.size("t1") + F.size("t2")).cast("double") - inter
    exact = {
        (r["doc1"], r["doc2"])
        for r in a.crossJoin(b)
        .filter(F.col("doc1") < F.col("doc2"))
        .filter(inter / union >= 0.5)
        .collect()
    }
    got = {
        (r["doc1"], r["doc2"])
        for r in api.minhash_near_dups(docs, threshold=0.5).collect()
    }
    assert exact, "fixture must contain Jaccard>=0.5 pairs below id 200"
    # every returned pair is exact-verified, so no false positives
    assert got <= exact
    assert len(got) / len(exact) >= 0.95


def test_find_motif_self_loop_terms(spark):
    """ADVICE r5: GraphFrames accepts self-loop patterns; positive and
    negated (a)-[]->(a) terms must work, and duplicate edge names must
    raise."""
    import pytest

    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 0), (0, 1), (1, 2), (3, 3)], "src long, dst long"
    )
    loops = api.find_motif(v, e, "(a)-[]->(a)")
    assert sorted(r["a"]["id"] for r in loops.collect()) == [0, 3]
    # self-loop joined against another term: vertices with a loop AND
    # an outgoing edge to someone else
    both = api.find_motif(v, e, "(a)-[]->(a); (a)-[]->(b)")
    assert {(r["a"]["id"], r["b"]["id"]) for r in both.collect()} == {
        (0, 0),
        (0, 1),
        (3, 3),
    }
    # negated self-loop: edges whose source has no loop
    noloop = api.find_motif(v, e, "(a)-[]->(b); !(a)-[]->(a)")
    assert {(r["a"]["id"], r["b"]["id"]) for r in noloop.collect()} == {(1, 2)}
    with pytest.raises(ValueError, match="more than one term"):
        api.find_motif(v, e, "(a)-[x]->(b); (b)-[x]->(c)")
    with pytest.raises(ValueError, match="edge and a vertex"):
        api.find_motif(v, e, "(a)-[b]->(b)")
    # self-loop with a bound edge row
    le = api.find_motif(v, e, "(a)-[lp]->(a)")
    assert {(r["a"]["id"], r["lp"]["src"], r["lp"]["dst"]) for r in le.collect()} == {
        (0, 0, 0),
        (3, 3, 3),
    }


def test_ivf_search_matches_registry_kernel(spark):
    """api.ivf_search with supervised label cells, self-queries
    (ids < 10), k=5, nprobe=8 is exactly the sim_ivf registry query."""
    emb = tables.load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter("vec_id < 10")
    got = [
        tuple(r)
        for r in api.ivf_search(
            emb, queries, k=5, nprobe=8, cell_col="label"
        ).collect()
    ]
    want = [
        tuple(r) for r in registry.queries()["sim_ivf"](spark, SF_SMOKE).collect()
    ]
    assert got == want and got


def test_ivf_search_supervised_accepts_plain_query_table(spark):
    """ADVICE r6: supervised-cell mode must not demand the (unused)
    cell column on the QUERY table — 'queries is any (id, vector)
    table'. Result must equal the run where queries still carry it."""
    emb = tables.load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter("vec_id < 10").select("vec_id", "embedding")
    got = [
        tuple(r)
        for r in api.ivf_search(
            emb, queries, k=5, nprobe=8, cell_col="label"
        ).collect()
    ]
    want = [
        tuple(r)
        for r in api.ivf_search(
            emb, emb.filter("vec_id < 10"), k=5, nprobe=8, cell_col="label"
        ).collect()
    ]
    assert got == want and got


def test_ivf_search_unsupervised_recall(spark):
    """Hash-seeded Lloyd cells (no label column): recall vs exact kNN
    top-5 must clear 0.5 at nprobe=8 of 10 cells on near-random
    vectors (the exact-cell path measures 0.94 at the same probe
    budget; unsupervised cells are allowed to be somewhat worse)."""
    emb = tables.load(spark, SF_SMOKE, "embeddings")
    queries = emb.filter("vec_id < 10")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in api.ivf_search(
            emb, queries, k=5, n_cells=10, nprobe=8, build_iters=2
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in registry.queries()["sim_knn"](spark, SF_SMOKE)
        .filter("query_id < 10")
        .filter("rank <= 5")
        .collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_centroid_per_label_matches_registry_kernel(spark):
    from pyspark.sql import functions as F

    emb = tables.load(spark, SF_SMOKE, "embeddings")
    got = {
        (r["label"], r["dim_i"], r["c"], r["n_vectors"])
        for r in api.centroid_per_label(emb)
        .select(
            "label", F.posexplode("centroid").alias("pos", "c"), "n_vectors"
        )
        .select("label", (F.col("pos") + 1).alias("dim_i"), "c", "n_vectors")
        .collect()
    }
    want = {
        (r["label"], r["dim_i"], r["centroid"], r["n_vectors"])
        for r in registry.queries()["embed_centroid"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_watermark_dedup_stream_matches_registry(spark):
    """The parameterized streaming dedup on a doubled stream emits each
    event id exactly once — same check the stream_dedup registry key
    makes."""
    from pyspark.sql import functions as F

    from ezbake_graph_spark.operators.streaming import (
        _read_events_stream,
        _run_to_memory,
    )

    sdf = _read_events_stream(spark, SF_SMOKE, copies=2)
    dedup = api.watermark_dedup(sdf, ["event_id"], "ts", "1 hour").select(
        "event_id"
    )
    out = _run_to_memory(spark, dedup, "api_wm_dedup", "append")
    n = out.count()
    distinct = out.select("event_id").distinct().count()
    batch = tables.load(spark, SF_SMOKE, "events").count()
    assert n == distinct == batch


def test_incremental_mv_api_matches_batch(spark):
    """Generic measures (count/sum/min/max) maintained across forced
    multi-batch ingestion equal the one-shot batch aggregate."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ezbake_graph_spark.operators.streaming import _events_stream_dir

    src = _events_stream_dir(spark, SF_SMOKE)
    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "event_type",
            F.round(F.col("value") * 1_000_000).cast("long").alias("micro"),
        )
    )
    run = uuid.uuid4().hex[:8]
    base = f"/tmp/ezgs_api_mv_{run}"
    mv = api.incremental_mv(
        sdf,
        keys=["event_type"],
        measures={
            "n": ("count", "*"),
            "sum_micro": ("sum", "micro"),
            "min_micro": ("min", "micro"),
            "max_micro": ("max", "micro"),
        },
        mv_dir=os.path.join(base, "mv"),
        checkpoint_dir=os.path.join(base, "ckpt"),
    )
    got = {
        r["event_type"]: (r["n"], r["sum_micro"], r["min_micro"], r["max_micro"])
        for r in mv.collect()
    }
    want = {
        r["event_type"]: (r["n"], r["sum_micro"], r["min_micro"], r["max_micro"])
        for r in tables.load(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.round(F.col("value") * 1_000_000).cast("long").alias("micro"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("micro").alias("sum_micro"),
            F.min("micro").alias("min_micro"),
            F.max("micro").alias("max_micro"),
        )
        .collect()
    }
    shutil.rmtree(base, ignore_errors=True)
    assert got == want and got


def test_incremental_mv_rejects_fresh_checkpoint_on_existing_view(spark):
    """ADVICE r6 (medium): a wiped/fresh checkpoint_dir restarts batch
    ids at 0, so pairing it with an existing mv_dir would make the
    replay guard silently skip every new batch. The marker records the
    checkpoint identity and the mismatch raises up front."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from ezbake_graph_spark.operators.streaming import _events_stream_dir

    src = _events_stream_dir(spark, SF_SMOKE)
    schema = spark.read.parquet(src).schema

    def stream():
        return (
            spark.readStream.schema(schema)
            .parquet(src)
            .select("event_type", F.lit(1).alias("one"))
        )

    base = f"/tmp/ezgs_mv_guard_{uuid.uuid4().hex[:8]}"
    kwargs = dict(keys=["event_type"], measures={"n": ("count", "*")},
                  mv_dir=os.path.join(base, "mv"))
    api.incremental_mv(stream(), checkpoint_dir=os.path.join(base, "ckptA"), **kwargs)
    # same checkpoint again: fine (no new files -> unchanged view)
    api.incremental_mv(stream(), checkpoint_dir=os.path.join(base, "ckptA"), **kwargs)
    with pytest.raises(ValueError, match="different checkpoint"):
        api.incremental_mv(
            stream(), checkpoint_dir=os.path.join(base, "ckptB"), **kwargs
        )
    shutil.rmtree(base, ignore_errors=True)


def test_temperature_sample_keeps_null_stratum(spark):
    """ADVICE r6: NULL is a stratum like any other — the count join is
    eqNullSafe, so NULL-stratum rows survive (here NULL is the smallest
    stratum: keep-rate sqrt(min/min)=1 means ALL its rows survive)."""
    rows = [(i, "en") for i in range(40)] + [(100 + i, None) for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = api.temperature_sample(d, "lang", "doc_id").collect()
    null_ids = {r["doc_id"] for r in out if r["lang"] is None}
    assert null_ids == {100, 101, 102}


def test_curate_corpus_minhash_matches_exact_path(spark):
    """The flagship MinHash-LSH curation path produces EXACTLY the
    registry key's exact-prefix-filter result on the fixture (banding
    recall 1 at threshold 0.95) — this tie plus the key's DuckDB
    oracle certifies the minhash composite end-to-end."""
    from ezbake_graph_spark.operators.llm_curate import (
        CURATE_MAX_TOP_UNIGRAM,
        CURATE_THRESHOLD,
        _fab_docs,
    )

    fab = _fab_docs(spark, SF_SMOKE)
    kw = dict(
        dedup_threshold=CURATE_THRESHOLD,
        repetition_thresholds={"max_top_unigram": CURATE_MAX_TOP_UNIGRAM},
    )
    ex = {tuple(r) for r in api.curate_corpus(fab, dedup="exact", **kw).collect()}
    mh = {tuple(r) for r in api.curate_corpus(fab, dedup="minhash", **kw).collect()}
    assert ex == mh and len(ex) == 500


def test_curate_corpus_rejects_unknown_dedup(spark):
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dedup"):
        api.curate_corpus(d, dedup="bogus")


def test_api_parameter_gates_raise_loudly(spark):
    """r12 hardening sweep of the newest public surfaces: bad scalars
    fail at the API boundary with a named ValueError, never as a
    silently-empty result or a mid-job arithmetic error."""
    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="dedup_threshold"):
            api.curate_corpus(d, dedup_threshold=bad)
    with pytest.raises(ValueError, match="context"):
        api.prepare_training_data(d, context=0)
    with pytest.raises(ValueError, match="k must"):
        api.ivf_search(emb, emb, k=0)
    with pytest.raises(ValueError, match="n_cells"):
        api.ivf_search(emb, emb, n_cells=0)
    with pytest.raises(ValueError, match="nprobe"):
        api.ivf_search(emb, emb, nprobe=0)


def test_resolve_entities_names_missing_columns(spark):
    from ezbake_graph_spark.operators.llm_dedup import (
        resolve_entities,
        resolve_entities_append,
    )

    bad = spark.createDataFrame([(1, "acme")], "rec_id long, name string")
    with pytest.raises(ValueError, match="missing \\['block', 'segment', 'val'\\]"):
        resolve_entities(bad)
    ok = spark.createDataFrame(
        [(1, "acme", 0, "AUTO", 1.0)],
        "rec_id long, name string, block long, segment string, val double",
    )
    with pytest.raises(ValueError, match="new_records"):
        resolve_entities_append(ok, resolve_entities(ok), bad)
    with pytest.raises(ValueError, match="old_resolution"):
        resolve_entities_append(ok, bad.select("rec_id"), ok)


def test_empty_inputs_yield_empty_not_crash(spark):
    """Empty corpora flow through the curation / ER / ANN surfaces and
    come out as empty frames with the full output schema — the
    incremental-pipeline edge (an empty daily batch) must be a no-op,
    not a crash."""
    from ezbake_graph_spark.operators.llm_dedup import resolve_entities

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    out = api.curate_corpus(empty_docs)
    assert out.count() == 0
    assert set(out.columns) >= {"doc_id", "keep", "is_canonical", "clean_text"}
    empty_recs = spark.createDataFrame(
        [],
        "rec_id long, name string, block long, segment string, val double",
    )
    er = resolve_entities(empty_recs)
    assert er.count() == 0 and "entity_id" in er.columns
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert api.ivf_search(empty_emb, emb, n_cells=2).count() == 0
    assert api.ivf_search(emb, empty_emb, n_cells=2).count() == 0


def test_quality_score_matches_registry_kernel(spark):
    got = {tuple(r) for r in api.quality_score(
        tables.load(spark, SF_SMOKE, "documents")).collect()}
    want = {tuple(r) for r in
            registry.queries()["text_quality"](spark, SF_SMOKE).collect()}
    assert got == want and got


def test_language_id_matches_registry_kernel(spark):
    from pyspark.sql import functions as F

    d = tables.load(spark, SF_SMOKE, "documents")
    got = {
        (r["doc_id"], r["predicted"])
        for r in api.language_id(
            d.filter(F.col("doc_id") % 5 != 0), d.filter(F.col("doc_id") % 5 == 0)
        ).collect()
    }
    want = {
        (r["doc_id"], r["predicted"])
        for r in registry.queries()["text_langid"](spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_token_stats_matches_registry_kernel(spark):
    got = {tuple(r) for r in api.token_stats(
        tables.load(spark, SF_SMOKE, "documents")).collect()}
    want = {tuple(r) for r in
            registry.queries()["text_token_regex"](spark, SF_SMOKE).collect()}
    assert got == want and got


def test_fingerprint_docs_matches_registry_kernel(spark):
    from pyspark.sql import functions as F

    d = tables.load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 100)
    got = {tuple(r) for r in api.fingerprint_docs(d).collect()}
    want = {tuple(r) for r in
            registry.queries()["text_winnowing"](spark, SF_SMOKE).collect()}
    assert got == want and got


def test_temperature_sample_matches_registry_kernel(spark):
    got = {
        (r["lang"], r["doc_id"])
        for r in api.temperature_sample(
            tables.load(spark, SF_SMOKE, "documents"), "lang", "doc_id"
        ).collect()
    }
    want = {
        (r["lang"], r["doc_id"])
        for r in registry.queries()["sample_temperature_mix"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want and got


def test_near_dup_clusters_matches_registry_composition(spark):
    """api.near_dup_clusters (MinHash pair stage) on the doc_id<200
    slice equals the registry's exact-pair cluster composition —
    banding at j=0.8 recalls every exact pair on the fixture, so the
    transitive closure is identical."""
    from pyspark.sql import functions as F

    d = tables.load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    got = {tuple(r) for r in api.near_dup_clusters(d).collect()}
    want = {
        tuple(r)
        for r in registry.queries()["dedup_cluster_canonical"](
            spark, SF_SMOKE
        ).collect()
    }
    assert got == want and got


def test_zero_norm_vectors_are_excluded_not_poisonous(spark):
    """A zero embedding has no defined cosine. Regression for three
    distinct failure shapes: (a) the expression kernel (_cosine) used
    to raise ANSI DIVIDE_BY_ZERO; (b) the numpy top-k kernel used to
    produce NaN sims, and np.partition sorts NaN LAST, so kth became
    NaN and the whole group's top-k came back EMPTY; (c) the threshold
    kernel emitted NaN-cosine pairs that Spark ranks above every real
    value. Zero vectors must simply drop out of similarity results."""
    from pyspark.sql import functions as F

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [0.0, 0.0]),  # zero norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # (a)+(b) grid top-k: pairs among 1,2,3 only; never empty, no NaN
    got = api.cosine_topk(emb, k=10).collect()
    ids_seen = {r["vid1"] for r in got} | {r["vid2"] for r in got}
    assert 4 not in ids_seen
    assert len(got) == 3  # C(3,2) real pairs survive
    assert all(r["cosine"] == r["cosine"] for r in got)  # no NaN
    # force the multi-block (applyInPandas grid) path too
    got_grid = api.cosine_topk(emb, k=10, n_blocks=2).collect()
    assert sorted((r["vid1"], r["vid2"]) for r in got_grid) == sorted(
        (r["vid1"], r["vid2"]) for r in got
    )

    # (a) expression kernel via ivf_search: zero corpus vector is never
    # a neighbor, zero query emits no rows, and nothing raises
    q = spark.createDataFrame(
        [(100, [1.0, 0.05]), (101, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = api.ivf_search(emb, q, k=3, n_cells=2, nprobe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert 4 not in by_q.get(100, [])
    assert by_q.get(101, []) == []
    assert by_q[100][0] == 1  # nearest real neighbor still found

    # (c) threshold kernel directly: no NaN pair rows for the zero vec
    import pandas as pd

    from ezbake_graph_spark.operators.llm_similarity import _pair_group_sims

    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.0, 0.0]],
            "b": [0, 0, 0, 0],
            "pk": [0, 0, 0, 0],
        }
    )
    v1, v2, s = _pair_group_sims(pdf, 1)
    assert 4 not in set(v1) | set(v2)
    assert not any(x != x for x in s)  # no NaN
