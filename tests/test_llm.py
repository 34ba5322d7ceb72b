"""Property tests for the LLM-pipeline operators (SURVEY.md §2K).

The SQL-oracled K keys are covered by tests/test_oracle_all.py; here we
check the *approximate* operators against their exact counterparts —
the recall/containment properties that make them trustworthy as the
100 TB scale path.
"""

from __future__ import annotations

from ezbake_graph_spark import registry
from tests.conftest import SF_SMOKE


def _rows(spark, key, sf=SF_SMOKE):
    return registry.queries()[key](spark, sf).collect()


def test_dedup_exact_partitions_the_corpus(spark):
    """Every document lands in exactly one canonical group."""
    total_docs = registry.queries()["scan_parquet"]  # not the count we need
    from ezbake_graph_spark import tables

    n_docs = tables.load(spark, SF_SMOKE, "documents").count()
    groups = _rows(spark, "dedup_exact")
    assert sum(r["n_copies"] for r in groups) == n_docs
    assert len({r["canonical_doc_id"] for r in groups}) == len(groups)


def test_minhash_recall_vs_exact_jaccard(spark):
    """LSH candidates + exact verification must recover (almost) every
    exact Jaccard>=0.8 pair. With 16 bands x 4 rows the per-pair
    collision probability at j=0.8 is 1-(1-0.8^4)^16 ~ 0.9986."""
    exact = {(r["doc1"], r["doc2"]): r["jaccard"] for r in _rows(spark, "dedup_jaccard_pairs")}
    approx = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in _rows(spark, "dedup_minhash")
        if r["doc1"] < 200 and r["doc2"] < 200  # K2 is declared on the <200 slice
    }
    assert exact, "fixture should contain near-dup pairs"
    # precision is structural: every reported pair was exact-verified
    for pair, j in approx.items():
        assert pair in exact and abs(j - exact[pair]) < 1e-9
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.95, f"minhash recall {recall:.3f} < 0.95"


def test_rp_search_recall_vs_exact_topk(spark, duck):
    """The RP-sketch search (hamming<=2 multi-probe + exact rerank)
    must recover >= 0.8 of the EXACT top-20 TF-cosine pairs (measured
    1.0 at sf0.001, 0.9 at sf0.01), and every returned pair must carry
    its true exact cosine (precision is structural: rerank IS the
    exact kernel, only the candidate set is approximate)."""
    from ezbake_graph_spark.operators.llm_similarity import (
        _RP_SEARCH_K,
        _RP_TF_BUCKETS,
    )

    exact_rows = duck.execute(f"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        ), tf AS (
          SELECT doc_id,
                 ('0x' || substr(md5(term), 1, 4))::BIGINT % {_RP_TF_BUCKETS} AS bucket,
                 CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY doc_id, bucket
        ), dense AS (
          SELECT d.doc_id, r.j, CAST(COALESCE(tf.tf, 0) AS DOUBLE) AS x
          FROM (SELECT DISTINCT doc_id FROM documents) d
          CROSS JOIN (SELECT unnest(range({_RP_TF_BUCKETS})) AS j) r
          LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.bucket = r.j
        ), vec AS (
          SELECT doc_id, list(x ORDER BY j) AS v FROM dense GROUP BY doc_id
        )
        SELECT a.doc_id AS did1, b.doc_id AS did2,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM vec a JOIN vec b ON a.doc_id < b.doc_id
        ORDER BY cosine DESC, did1, did2 LIMIT {_RP_SEARCH_K}
    """).fetchall()
    exact = {(r[0], r[1]): r[2] for r in exact_rows}
    approx = {(r["did1"], r["did2"]): r["cosine"] for r in _rows(spark, "sim_rp_search")}
    assert exact, "fixture should contain near-dup document pairs"
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.8, f"rp-search recall {recall:.3f} < 0.8"
    for pair, c in approx.items():
        if pair in exact:
            assert abs(c - exact[pair]) < 1e-9


def test_simhash_pairs_within_hamming_budget(spark):
    rows = _rows(spark, "dedup_simhash")
    assert all(0 <= r["hamming"] <= 6 for r in rows)
    # exact duplicates (same text) must collide at hamming 0
    dup_groups = [r for r in _rows(spark, "dedup_exact") if r["n_copies"] > 1]
    pairs = {(r["doc1"], r["doc2"]) for r in rows}
    from ezbake_graph_spark import tables
    import pyspark.sql.functions as F

    d = tables.load(spark, SF_SMOKE, "documents")
    for g in dup_groups:
        same = sorted(
            r["doc_id"]
            for r in d.join(
                d.filter(F.col("doc_id") == g["canonical_doc_id"]).select(
                    F.col("text").alias("t")
                ),
                F.col("text") == F.col("t"),
            )
            .select("doc_id")
            .collect()
        )
        for i in range(len(same)):
            for j in range(i + 1, len(same)):
                assert (same[i], same[j]) in pairs


def test_ivf_recall_vs_exact_knn(spark):
    """Probing nprobe=8 of the 10 label cells must recover >= 0.9 of
    exact neighbors (measured 0.94 on the fixture). The fixture
    embeddings are near-random in 64-d — the adversarial worst case
    for ANY coarse quantizer, where recall ~= probed fraction (full
    curve in SCALE.md §8) — so certifying 0.9 costs a high nprobe
    here; clustered real corpora hit it at nprobe << cells."""
    exact = {(r["query_id"], r["neighbor_id"]) for r in _rows(spark, "sim_knn")}
    approx = {(r["query_id"], r["neighbor_id"]) for r in _rows(spark, "sim_ivf")}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.3f} < 0.9"


def test_ivf_persisted_reuse_runs_no_build_and_prunes_partitions(spark):
    """VERDICT r6 #4: the persisted IVF index. Reuse must (a) return
    exactly the fresh-build answer, (b) run ZERO Lloyd/centroid build
    stages (cell_centroids monkeypatch-poisoned), and (c) scan the
    cell-partitioned corpus with a dynamic-partition-pruning filter so
    a probe touches nprobe partitions, not the corpus."""
    import shutil
    import uuid

    from ezbake_graph_spark import api, tables
    from ezbake_graph_spark.operators import llm_similarity as sim

    path = f"/tmp/ezgs_ivf_idx_{uuid.uuid4().hex[:8]}"
    emb = tables.load(spark, SF_SMOKE, "embeddings")
    q = emb.filter("vec_id < 10").select("vec_id", "embedding")
    kw = dict(k=5, nprobe=8, cell_col="label", index_path=path)
    fresh = [tuple(r) for r in api.ivf_search(emb, q, **kw).collect()]

    real = sim.cell_centroids
    def poisoned(*a, **k):
        raise AssertionError("Lloyd/centroid build ran on the reuse path")
    sim.cell_centroids = poisoned
    try:
        reused_df = api.ivf_search(emb, q, **kw)
        reused = [tuple(r) for r in reused_df.collect()]
    finally:
        sim.cell_centroids = real
    assert reused == fresh and len(fresh) == 50

    plan = reused_df._jdf.queryExecution().executedPlan().toString()
    corpus_scans = [
        ln for ln in plan.splitlines() if "corpus" in ln and "FileScan" in ln
    ]
    assert corpus_scans, "no corpus file scan in reuse plan"
    assert all("dynamicpruning" in ln.lower() for ln in corpus_scans), (
        "corpus scan not dynamic-partition-pruned:\n" + "\n".join(corpus_scans)
    )
    shutil.rmtree(path, ignore_errors=True)


def test_ivf_persisted_registry_key_matches_memory_twin(spark):
    """sim_ivf_persisted (disk index) returns exactly sim_ivf's answer
    — same probe kernel, same cells, index round-trip is lossless."""
    import shutil

    shutil.rmtree("/tmp/ezgs_ivf_index_sf0.001", ignore_errors=True)
    got = [tuple(r) for r in _rows(spark, "sim_ivf_persisted")]
    want = [tuple(r) for r in _rows(spark, "sim_ivf")]
    assert got == want and len(got) == 50


def test_embed_centroid_counts(spark):
    from ezbake_graph_spark import tables

    n_vecs = tables.load(spark, SF_SMOKE, "embeddings").count()
    rows = _rows(spark, "embed_centroid")
    by_dim: dict[int, int] = {}
    for r in rows:
        by_dim[r["dim_i"]] = by_dim.get(r["dim_i"], 0) + r["n_vectors"]
        assert -1.5 <= r["centroid"] <= 1.5
    assert set(by_dim) == set(range(1, 65))
    assert all(v == n_vecs for v in by_dim.values())


def test_cosine_topk_is_sorted_and_bounded(spark):
    rows = _rows(spark, "sim_cosine_topk")
    assert len(rows) == 20
    sims = [r["cosine"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.000001 <= s <= 1.000001 for s in sims)
    assert all(r["vid1"] < r["vid2"] for r in rows)


def test_multimodal_decode_stub_plumbing(spark):
    """The decode path is stubbed (no image libs in-env) but the Spark
    plumbing — binary column in, typed struct out, Arrow batching —
    must be real."""
    rows = _rows(spark, "multimodal_decode_stub")
    assert rows
    schema = registry.queries()["multimodal_decode_stub"](spark, SF_SMOKE).schema
    names = [f.name for f in schema.fields]
    assert "doc_id" in names


def test_multimodal_decode_dispatch_both_branches(spark):
    """VERDICT r6 #7: the decode branches. (a) This container has no
    PIL -> the stub branch runs and the oracle-shaped output is the
    byte stats; (b) with a (faked) PIL installed, a decodable image
    payload yields real pixel stats and a NON-image payload still
    falls back to the stub — the same-oracle-both-modes property."""
    import sys
    import types

    from ezbake_graph_spark.operators import multimodal as mm

    payload = b"hello multimodal payload bytes"
    assert not mm._pil_available()  # the container genuinely lacks PIL
    assert mm._decode_payload(payload) == mm._fake_decode(payload)

    # fake PIL: 2x3 grayscale image whose pixels are the first 6 bytes
    class _FakeImg:
        def __init__(self, data):
            self._d = data
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
        def convert(self, mode):
            assert mode == "L"
            return self
        def getdata(self):
            return list(self._d[:6])

    def _open(buf):
        data = buf.getvalue()
        if not data.startswith(b"FAKEIMG"):
            raise OSError("cannot identify image file")
        return _FakeImg(data[7:])

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = types.SimpleNamespace(open=_open)
    sys.modules["PIL"] = fake_pil
    mm._PIL_CHECKED = True
    try:
        img = b"FAKEIMG" + bytes(range(10))
        n, mean, ck = mm._decode_payload(img)
        assert (n, mean, ck) == (6, sum(range(6)) / 6, sum(img[:16]) % 65536)
        # non-image payload with PIL "installed": stub fallback
        assert mm._decode_payload(payload) == mm._fake_decode(payload)
    finally:
        del sys.modules["PIL"]
        mm._PIL_CHECKED = None


def test_kmeans_clusters_align_with_labels(spark):
    """Seeded k-means on the embeddings beats random assignment:
    majority-label purity above the 1/10 random baseline (the synthetic
    embeddings are only weakly label-separated — measured 0.164 at
    sf0.001 — so the bound is above-random, not high-purity)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from ezbake_graph_spark import tables

    e = tables.load(spark, SF_SMOKE, "embeddings").select(
        "label", array_to_vector("embedding").alias("features")
    )
    model = KMeans(k=10, seed=42, maxIter=10).fit(e)
    pred = model.transform(e)
    counts = (
        pred.groupBy("prediction", "label").count().collect()
    )
    from collections import defaultdict

    per_cluster = defaultdict(list)
    for r in counts:
        per_cluster[r["prediction"]].append(r["count"])
    purity = sum(max(v) for v in per_cluster.values()) / sum(
        sum(v) for v in per_cluster.values()
    )
    assert len(per_cluster) <= 10
    assert purity > 0.12, purity


def test_dedup_cluster_canonical_consistent_with_pairs(spark):
    """Cluster assignment is the transitive closure of the >=0.8 pair
    graph: both ends of every pair share a canonical id; the canonical
    id is the min doc_id of its cluster; singletons are their own
    canonical."""
    from ezbake_graph_spark import registry
    from collections import defaultdict

    sf = "/root/testdata/sf0.001"
    canon = {
        r["doc_id"]: r["canonical_doc_id"]
        for r in registry.queries()["dedup_cluster_canonical"](spark, sf).collect()
    }
    pairs = [
        (r["doc1"], r["doc2"])
        for r in registry.queries()["dedup_jaccard_pairs"](spark, sf).collect()
    ]
    assert pairs, "fixture should contain near-dup pairs"
    for d1, d2 in pairs:
        assert canon[d1] == canon[d2]
    clusters = defaultdict(list)
    for d, c in canon.items():
        clusters[c].append(d)
    for c, members in clusters.items():
        assert c == min(members)


def test_pmi_matches_python_recompute(spark):
    """PMI of the returned bigrams matches a from-scratch count."""
    import math
    from collections import Counter

    from ezbake_graph_spark import registry, tables

    sf = "/root/testdata/sf0.001"
    texts = [
        r["text"] for r in tables.load(spark, sf, "documents").collect()
    ]
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nu, nb = sum(uni.values()), sum(bi.values())
    rows = registry.queries()["text_pmi_bigrams"](spark, sf).collect()
    assert len(rows) == 30
    for r in rows:
        c12 = bi[(r["w1"], r["w2"])]
        assert c12 == r["c12"] >= 5
        want = math.log((c12 * nu * nu) / (uni[r["w1"]] * uni[r["w2"]] * nb))
        assert abs(r["pmi"] - want) < 1e-5


def test_grid_pairs_cover_every_unordered_pair_exactly_once(spark):
    """The block-pair grid (sim_cosine_topk's 100 TB shape) must place
    every unordered vector pair in EXACTLY one pair-group: a pair {x,y}
    lives only in the group of its block pair {x%B, y%B}. Missing a
    group loses pairs; double-placement double-counts them."""
    from ezbake_graph_spark.operators.llm_similarity import _grid_pairs

    n, B = 37, 4  # deliberately not multiples of each other
    emb = spark.createDataFrame(
        [(i, [float(i)]) for i in range(n)], "vec_id long, embedding array<float>"
    )
    rows = _grid_pairs(emb, B).collect()
    # reconstruct which unordered pairs each group can see
    groups = {}
    for r in rows:
        groups.setdefault(r.pk, []).append((r.vec_id, r.b))
    seen = {}
    for pk, members in groups.items():
        bi, bj = divmod(pk, B)
        for x, bx in members:
            for y, by in members:
                if x >= y:
                    continue
                # the kernel pairs only (block bi) x (block bj) members
                if {bx, by} == {bi, bj} if bi != bj else (bx == by == bi):
                    seen[(x, y)] = seen.get((x, y), 0) + 1
    expected = {(x, y) for x in range(n) for y in range(x + 1, n)}
    assert set(seen) == expected
    assert set(seen.values()) == {1}


def test_grid_path_matches_narrow_path(spark):
    """Forcing small blocks (B > 1, the 100 TB grid path) must produce
    byte-identical results to the shuffle-free B == 1 path for both
    pair kernels — the physical strategy choice may never change the
    answer."""
    from ezbake_graph_spark.operators import llm_dedup, llm_similarity as ls

    sf = "/root/testdata/sf0.001"
    orig = ls._BLOCK_ROWS
    try:
        ls._BLOCK_ROWS = 10**9  # force B == 1
        narrow_topk = ls.sim_cosine_topk(spark, sf).collect()
        narrow_dup = llm_dedup.dedup_embedding(spark, sf).collect()
        ls._BLOCK_ROWS = 64  # force a real grid
        assert ls._grid_blocks(spark, sf) > 1
        grid_topk = ls.sim_cosine_topk(spark, sf).collect()
        grid_dup = llm_dedup.dedup_embedding(spark, sf).collect()
    finally:
        ls._BLOCK_ROWS = orig
    assert grid_topk == narrow_topk
    assert grid_dup == narrow_dup


def test_substring_spans_are_real_cross_doc_duplicates(spark):
    """Every reported span must (a) lie inside its document, (b) have
    every SPAN_K-shingle it covers present in at least one OTHER doc
    (that is what 'duplicated span' means), and (c) be maximal: the
    shingle just before span_start and just after the last start must
    NOT be cross-doc duplicated (else the island merge missed a hit)."""
    from collections import defaultdict

    from ezbake_graph_spark.operators.llm_dedup import SPAN_K, dedup_substring_spans
    from ezbake_graph_spark.tables import load

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load(spark, sf, "documents").collect()
    }
    owners = defaultdict(set)
    for did, toks in docs.items():
        for i in range(len(toks) - SPAN_K + 1):
            owners[" ".join(toks[i : i + SPAN_K])].add(did)

    def dup_at(did, i):  # 0-based shingle start; True = cross-doc duplicated
        toks = docs[did]
        if i < 0 or i > len(toks) - SPAN_K:
            return False
        return len(owners[" ".join(toks[i : i + SPAN_K])] - {did}) > 0

    rows = dedup_substring_spans(spark, sf).collect()
    assert rows, "fixture is known to contain duplicated spans"
    for r in rows:
        did, s, e = r["doc_id"], r["span_start"] - 1, r["span_end"] - 1
        assert 0 <= s and e < len(docs[did])
        assert r["span_tokens"] == e - s + 1
        assert dup_at(did, s) and dup_at(did, e - SPAN_K + 1)
        # maximality: no duplicated shingle start within SPAN_K before
        # the span, none after the last covered start
        assert not any(dup_at(did, j) for j in range(max(0, s - SPAN_K), s))
        last = e - SPAN_K + 1
        assert not any(dup_at(did, j) for j in range(last + 1, last + SPAN_K + 1))


def test_pq_adc_recall_vs_exact_knn(spark):
    """PQ shortlist + exact re-rank must recover >= 0.8 of the exact
    top-5 neighbors (measured: 0.88 at sf0.001, 0.96 at sf0.01; the
    hash-seeded Lloyd build is deterministic, so this is a stable
    floor, not a flaky threshold)."""
    from ezbake_graph_spark.operators.llm_similarity import sim_knn, sim_pq_adc

    sf = "/root/testdata/sf0.001"
    pq = {(r.query_id, r.neighbor_id) for r in sim_pq_adc(spark, sf).collect()}
    ex = {(r.query_id, r.neighbor_id) for r in sim_knn(spark, sf).collect()}
    assert len(pq & ex) / len(ex) >= 0.8
    # contract shape: 5 ranked rows per query, exact cosines re-ranked
    by_q = {}
    for r in sim_pq_adc(spark, sf).collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for q, rows in by_q.items():
        rows.sort()
        assert [r for r, _ in rows] == list(range(1, len(rows) + 1))
        cos = [c for _, c in rows]
        assert cos == sorted(cos, reverse=True)


def test_bpe_train_and_encode_match_python_golden(spark):
    """From-scratch python BPE (word-freq table, most-frequent adjacent
    pair, (count DESC, left, right) tie-break, left-to-right merge
    application) must reproduce every learned merge row and every
    per-doc encoded token count."""
    from collections import Counter

    from ezbake_graph_spark.operators.llm_tokenize import (
        END_OF_WORD,
        N_MERGES,
        text_bpe_encode,
        text_bpe_train,
    )
    from ezbake_graph_spark.tables import load

    sf = "/root/testdata/sf0.001"
    texts = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w]
        for r in load(spark, sf, "documents").collect()
    }
    wf = Counter(w for toks in texts.values() for w in toks)
    syms = {w: list(w) + [END_OF_WORD] for w in wf}

    golden = []
    for _ in range(N_MERGES):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        golden.append((left, right))
        for w in syms:
            s, out = syms[w], []
            for tok in s:
                if out and out[-1] == left and tok == right:
                    out[-1] = left + right
                else:
                    out.append(tok)
            syms[w] = out

    got = [(r["left"], r["right"]) for r in text_bpe_train(spark, sf).collect()]
    assert got == golden

    enc = {r["doc_id"]: r["n_bpe_tokens"] for r in text_bpe_encode(spark, sf).collect()}
    want = {d: sum(len(syms[w]) for w in toks) for d, toks in texts.items()}
    assert enc == want


def test_bpe_exact_oracle_handles_equal_symbol_runs(spark):
    """The exact twin's SQL oracle applies merges with a
    gaps-and-islands PARITY rule (overlapping occurrences exist only
    when left == right); the fixture corpus rarely merges a symbol
    with itself, so pin the edge directly: a run-heavy toy corpus
    ('aaaaa' must greedily become [aa, aa, a</w>], never [aa, a, aa])
    where the Spark fold and the unrolled DuckDB CTE must agree on
    every merge row."""
    import duckdb

    from ezbake_graph_spark.operators.llm_tokenize import (
        _bpe_exact_sql,
        bpe_train,
    )

    rows = [
        (1, "aaaaa aaaaa aaaa"),
        (2, "aaaaa aaa bb"),
        (3, "bb bb abab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, wf = bpe_train(df, "text", 4, batch_k=1)
    got = [(i + 1, l, r, l + r) for i, (l, r) in enumerate(merges)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [tuple(r) for r in con.execute(_bpe_exact_sql(4)).fetchall()]
    assert got == want, f"{got} != {want}"
    # the run edge actually fired: the corpus forces an (a, a) merge
    assert ("a", "a") in merges
    _ = wf  # trajectory equality above is the contract


def test_bpe_batched_matches_batched_python_golden(spark):
    """batch_k > 1 (VERDICT r7 #8) must reproduce a from-scratch
    python implementation of the SAME greedy batched rule: per round,
    scan the top-4k pairs in (count DESC, left, right) order (the 4k
    fetch window is part of the declared algorithm — the driver only
    ever pulls that many rows), accept up to k whose symbols are
    untouched by earlier accepts in the round, apply all accepted
    merges, repeat."""
    from collections import Counter

    from ezbake_graph_spark.operators.llm_tokenize import END_OF_WORD, bpe_train
    from ezbake_graph_spark.tables import load

    sf = "/root/testdata/sf0.001"
    K, N = 4, 12
    docs = load(spark, sf, "documents")
    got, _ = bpe_train(docs, "text", n_merges=N, batch_k=K)

    texts = [w for r in docs.collect() for w in r["text"].split(" ") if w]
    wf = Counter(texts)
    syms = {w: list(w) + [END_OF_WORD] for w in wf}
    golden = []
    while len(golden) < N:
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        k_round = min(K, N - len(golden))
        ranked = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * k_round]
        touched, batch = set(), []
        for (left, right), c in ranked:
            if c < 2:
                break
            if left in touched or right in touched:
                continue
            batch.append((left, right))
            touched.update((left, right))
            if len(batch) == k_round:
                break
        if not batch:
            break
        for left, right in batch:
            for w in syms:
                s, out = syms[w], []
                for tok in s:
                    if out and out[-1] == left and tok == right:
                        out[-1] = left + right
                    else:
                        out.append(tok)
                syms[w] = out
        golden.extend(batch)
    assert got == golden and len(got) == N


def test_ivfpq_recall_vs_exact_knn(spark):
    """IVFADC (IVF prune x PQ codes x exact re-rank) must recover
    >= 0.75 of the exact top-5 (measured: 0.84 at sf0.001, 0.90 at
    sf0.01 — about the product of the IVF nprobe=8 loss (~0.94) and
    the PQ shortlist loss (~0.96), as the two independent pruning
    stages predict; deterministic build, stable floor)."""
    from ezbake_graph_spark.operators.llm_similarity import sim_ivfpq, sim_knn

    sf = "/root/testdata/sf0.001"
    pq = {(r.query_id, r.neighbor_id) for r in sim_ivfpq(spark, sf).collect()}
    ex = {(r.query_id, r.neighbor_id) for r in sim_knn(spark, sf).collect()}
    assert len(pq & ex) / len(ex) >= 0.75


def test_ivf_append_equals_batch_encode_with_frozen_centroids(spark):
    """VERDICT r7 #3: appending new vectors to a persisted IVF index
    (frozen centroids, zero re-training) must answer queries EXACTLY
    like batch-encoding the union corpus with the same frozen centroid
    table in one pass."""
    import shutil

    from ezbake_graph_spark.operators import llm_similarity as sim

    shutil.rmtree("/tmp/ezgs_ivf_app_sf0.001", ignore_errors=True)
    got = [tuple(r) for r in _rows(spark, "sim_ivf_append")]

    vecs = sim._vectors(spark, SF_SMOKE).cache()
    base = vecs.filter("vec_id < 400")
    cent = sim.cell_centroids(base, "label").cache()
    assigned = sim.assign_nearest_cell(vecs, cent)
    queries = vecs.filter("vec_id < 10").selectExpr(
        "vec_id AS query_id", "v AS qv", "nrm AS qn"
    )
    want = [
        tuple(r)
        for r in sim.ivf_probe_topk(assigned, cent, queries, k=5, nprobe=8).collect()
    ]
    assert got == want and len(got) == 50
    # appended slice must actually be served: some neighbor >= 400
    assert any(r[1] >= 400 for r in got), "no appended vector ever retrieved"


def test_ivf_append_reuse_runs_no_build_jobs(spark):
    """The reuse path of sim_ivf_append (marker present) must run zero
    Lloyd/centroid AND zero assignment/append jobs."""
    from ezbake_graph_spark.operators import llm_similarity as sim

    first = [tuple(r) for r in _rows(spark, "sim_ivf_append")]

    def poisoned(*a, **k):
        raise AssertionError("build/append ran on the reuse path")

    saved = (sim.cell_centroids, sim.assign_nearest_cell, sim.append_ivf_index)
    sim.cell_centroids = sim.assign_nearest_cell = sim.append_ivf_index = poisoned
    try:
        reused = [tuple(r) for r in _rows(spark, "sim_ivf_append")]
    finally:
        sim.cell_centroids, sim.assign_nearest_cell, sim.append_ivf_index = saved
    assert reused == first


def test_pq_append_codes_match_batch_encode(spark):
    """append_pq_index must produce a code table identical to batch
    pq_encode of the union corpus under the same frozen codebook."""
    import shutil
    import uuid

    from ezbake_graph_spark.operators import llm_similarity as sim

    path = f"/tmp/ezgs_pq_app_{uuid.uuid4().hex[:8]}"
    vecs = sim._vectors(spark, SF_SMOKE).cache()
    base = vecs.filter("vec_id < 400").select("vec_id", "v")
    codes, codebook = sim.pq_train_encode(base, dim=64)
    sim.build_pq_index(codes, codebook, path)
    sim.append_pq_index(vecs.filter("vec_id >= 400").select("vec_id", "v"), path, 64)

    on_disk = {
        r["vec_id"]: (tuple(r["codes"]), r["recon_n"])
        for r in spark.read.parquet(path + "/codes").collect()
    }
    batch = {
        r["vec_id"]: (tuple(r["codes"]), r["recon_n"])
        for r in sim.pq_encode(vecs.select("vec_id", "v"), codebook, 64).collect()
    }
    assert set(on_disk) == set(batch) and len(on_disk) == vecs.count()
    for vid, (c, n) in batch.items():
        dc, dn = on_disk[vid]
        assert dc == c, f"codes drift for vec {vid}"
        assert abs(dn - n) < 1e-9, f"recon_n drift for vec {vid}"
    shutil.rmtree(path, ignore_errors=True)


def test_pq_persisted_reuse_runs_no_train_and_matches_memory_twin(spark):
    """The persisted PQ index: reuse must return exactly the in-memory
    sim_pq_adc answer and run ZERO Lloyd/encode jobs (pq_train_encode
    monkeypatch-poisoned on the reuse path)."""
    import shutil

    from ezbake_graph_spark.operators import llm_similarity as sim

    shutil.rmtree("/tmp/ezgs_pq_index_sf0.001", ignore_errors=True)
    fresh = [tuple(r) for r in sim.sim_pq_persisted(spark, "/root/testdata/sf0.001").collect()]
    want = [tuple(r) for r in sim.sim_pq_adc(spark, "/root/testdata/sf0.001").collect()]
    assert fresh == want and len(fresh) == 50

    real = sim.pq_train_encode
    def poisoned(*a, **k):
        raise AssertionError("PQ training ran on the reuse path")
    sim.pq_train_encode = poisoned
    try:
        reused = [tuple(r) for r in sim.sim_pq_persisted(spark, "/root/testdata/sf0.001").collect()]
    finally:
        sim.pq_train_encode = real
    assert reused == fresh
    shutil.rmtree("/tmp/ezgs_pq_index_sf0.001", ignore_errors=True)


def test_nb_train_predict_tiny_corpus(spark):
    """NB classifies obviously-separable docs correctly, prices OOV
    terms via the floor exactly (score decomposition check), and
    breaks exact ties by label ascending."""
    from ezbake_graph_spark.operators.llm_text import nb_predict, nb_train
    import math

    train = spark.createDataFrame(
        [
            ("pets", "cat dog cat fur"),
            ("pets", "dog cat paw"),
            ("cars", "engine wheel engine oil"),
            ("cars", "wheel brake oil"),
        ],
        "source string, text string",
    )
    stats, delta = nb_train(train, "source")
    srows = {r["label"]: r for r in stats.collect()}
    # priors: 2/4 docs each -> ln(0.5)*1e6 rounded
    assert srows["pets"]["prior_micro"] == round(math.log(0.5) * 1e6)
    # vocab = 8 distinct train terms; pets total_c = 7, cars total_c = 7
    assert srows["pets"]["total_c"] == 7 and srows["cars"]["total_c"] == 7
    floor = round(math.log(1.0 / (7 + 8)) * 1e6)
    assert srows["pets"]["floor_micro"] == floor
    test = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "engine brake"), (3, "zebra")],
        "doc_id long, text string",
    )
    pred = {r["doc_id"]: r for r in nb_predict(test, stats, delta).collect()}
    assert pred[1]["predicted"] == "pets" and pred[2]["predicted"] == "cars"
    # doc 3 is all-OOV: both classes score prior + 1*floor (equal here),
    # tie broken by label ascending -> "cars"; score decomposes exactly.
    assert pred[3]["predicted"] == "cars"
    assert pred[3]["micro_score"] == srows["cars"]["prior_micro"] + floor
    # matched-term score decomposition: doc 1 = prior + 3*floor + deltas
    drows = {(r["label"], r["term"]): r["dlt"] for r in delta.collect()}
    want = (
        srows["pets"]["prior_micro"]
        + 3 * floor
        + 2 * drows[("pets", "cat")]
        + drows[("pets", "dog")]
    )
    assert pred[1]["micro_score"] == want


def test_pca_fit_properties(spark):
    """Components are orthonormal, eigenvalues are the projected
    variances in descending order, the projection is centered, and
    two fits of the same data agree exactly (deterministic sign fix)."""
    import numpy as np
    from ezbake_graph_spark.operators.llm_similarity import pca_fit, pca_project
    from ezbake_graph_spark.tables import load
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    e = load(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mean, comps, eigvals, n = pca_fit(e, dim=64, k=4)
    w = np.asarray(comps)
    assert np.allclose(w @ w.T, np.eye(4), atol=1e-9)
    assert eigvals == sorted(eigvals, reverse=True)
    assert all(v >= -1e-12 for v in eigvals)
    proj = np.array(
        [r["proj"] for r in pca_project(e, mean, comps).collect()]
    )
    assert len(proj) == n
    # centered: mean of each projected coordinate ~ 0 (round6 output)
    assert np.abs(proj.mean(axis=0)).max() < 1e-4
    # projected variance per component matches its eigenvalue
    pv = proj.var(axis=0, ddof=1)
    assert np.allclose(pv, eigvals, rtol=1e-3)
    # total variance is bounded by the full trace
    mat = np.stack([r["v"] for r in e.collect()])
    assert sum(eigvals) <= mat.var(axis=0, ddof=1).sum() + 1e-9
    # determinism across fits
    mean2, comps2, eigvals2, _ = pca_fit(e, dim=64, k=4)
    assert mean2 == mean and eigvals2 == eigvals
    assert np.allclose(np.asarray(comps2), w)


def test_semdedup_invariants_and_recall(spark):
    """(a) exactly one keep per group and the kept member is the
    least-centroid-similar (paper's diversity-keep); (b) no two
    SURVIVORS in the same cell are near-dups at tau; (c) every exact
    near-dup pair (dedup_embedding kernel, same tau) whose members
    share a cell landed in the same group — within-cell recall is 1
    by construction, cross-cell misses are the documented
    approximation."""
    from ezbake_graph_spark.operators.llm_dedup import (
        EMBED_DUP_THRESHOLD,
        semdedup,
    )
    from ezbake_graph_spark.operators.llm_similarity import (
        _vectors,
        assign_nearest_cell,
        cell_centroids,
    )
    from tests.conftest import SF_SMOKE
    import itertools
    import numpy as np

    vecs = _vectors(spark, SF_SMOKE).cache()
    cent = cell_centroids(vecs, "label")
    assigned = assign_nearest_cell(vecs, cent).cache()
    out = {r["vec_id"]: r for r in semdedup(assigned, cent, EMBED_DUP_THRESHOLD).collect()}
    by_group = {}
    for r in out.values():
        by_group.setdefault(r["group_id"], []).append(r)
    for members in by_group.values():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1
        lo = min((m["centroid_sim"], m["vec_id"]) for m in members)
        assert (keeps[0]["centroid_sim"], keeps[0]["vec_id"]) == lo
        assert all(m["group_size"] == len(members) for m in members)
    # survivors: no same-cell pair at >= tau
    av = {r["vec_id"]: (np.array(r["v"]), r["nrm"], r["cell"]) for r in assigned.collect()}
    survivors = [vid for vid, r in out.items() if r["keep"]]
    for v1, v2 in itertools.combinations(sorted(survivors), 2):
        a, b = av[v1], av[v2]
        if a[2] != b[2] or a[1] == 0 or b[1] == 0:
            continue
        assert round(float(a[0] @ b[0]) / (a[1] * b[1]), 6) < EMBED_DUP_THRESHOLD
    # within-cell recall vs the exact pair kernel
    n_same_cell = 0
    for v1, v2 in itertools.combinations(sorted(av), 2):
        a, b = av[v1], av[v2]
        if a[1] == 0 or b[1] == 0:
            continue
        if round(float(a[0] @ b[0]) / (a[1] * b[1]), 6) >= EMBED_DUP_THRESHOLD and a[2] == b[2]:
            n_same_cell += 1
            assert out[v1]["group_id"] == out[v2]["group_id"]
    assert n_same_cell > 0  # the fixture actually exercises the path


def test_contrastive_pairs_batches_are_cluster_coherent(spark):
    """Every dup-cluster's pairs land in exactly one batch (the
    in-batch-negative soundness construction), anchors sort below
    positives, and each pair's jaccard clears the K2 threshold."""
    from ezbake_graph_spark import registry
    from ezbake_graph_spark.operators.llm_dedup import JACCARD_THRESHOLD
    from tests.conftest import SF_SMOKE

    rows = registry.queries()["text_contrastive_pairs"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    seen = {}
    for r in rows:
        assert r["anchor"] < r["positive"]
        assert r["jaccard"] >= JACCARD_THRESHOLD
        assert r["batch_id"] == r["cluster_id"] % 8
        prev = seen.setdefault(r["cluster_id"], r["batch_id"])
        assert prev == r["batch_id"]


def test_lda_and_word2vec_shape_and_determinism(spark):
    """The MLlib-backed keys return well-formed output: LDA = 5
    topics x 5 ranked terms with descending weights; Word2Vec = 3
    probes x 3 ranked neighbors, cosines in [-1, 1], probes excluded
    from their own neighbor lists. Reruns must keep the STRUCTURE
    (which terms/neighbors, close weights) — exact float equality is
    not promised: MLlib's parallel EM/SGD sums floats in partition
    order (rows-only classification per SURVEY §5.3 rule 5)."""
    from ezbake_graph_spark import registry
    from tests.conftest import SF_SMOKE

    qs = registry.queries()
    lda = qs["text_lda_topics"](spark, SF_SMOKE).collect()
    assert len(lda) == 25
    by_topic = {}
    for r in lda:
        by_topic.setdefault(r["topic"], []).append(r)
    assert set(by_topic) == set(range(5))
    for rows in by_topic.values():
        rows = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        ws = [r["weight"] for r in rows]
        assert ws == sorted(ws, reverse=True) and all(w > 0 for w in ws)
    lda2 = qs["text_lda_topics"](spark, SF_SMOKE).collect()
    a = {(r["topic"], r["rank"]): r for r in lda}
    b = {(r["topic"], r["rank"]): r for r in lda2}
    assert set(a) == set(b)
    assert all(abs(a[k]["weight"] - b[k]["weight"]) < 2e-2 for k in a)

    w2v = qs["text_word2vec"](spark, SF_SMOKE).collect()
    assert len(w2v) == 9
    for r in w2v:
        assert r["neighbor"] != r["probe"]
        assert -1.0 <= r["similarity"] <= 1.0
    w2v2 = qs["text_word2vec"](spark, SF_SMOKE).collect()
    by_probe = lambda rows: {
        r["probe"]: sorted(x["neighbor"] for x in rows if x["probe"] == r["probe"])
        for r in rows
    }
    assert by_probe(w2v).keys() == by_probe(w2v2).keys()


def test_resolve_entities_planted_clusters(spark):
    """resolve_entities recovers planted duplicate groups: a typo pair
    (distance 1), a weak-evidence chain A~B~C linked transitively where
    A!~C directly, a distance-2 pair WITHOUT segment agreement that
    must NOT match, a cross-block near-name that must NOT match
    (blocking boundary), and a singleton. Survivorship: min-id
    canonical, canonical's name as golden_name, max val as
    golden_value."""
    from ezbake_graph_spark.operators.llm_dedup import resolve_entities

    rows = [
        # entity 1: typo pair in block 0 (distance 1, segments differ)
        (1, "acme corp", 0, "AUTO", 10.0),
        (2, "acme corq", 0, "BLDG", 99.0),
        # entity 3: chain in block 1 — 3~4 dist 1; 4~5 dist 2 + same
        # segment; 3 vs 5 dist 3 (no direct edge) -> one entity of 3
        (3, "zeta aaaa", 1, "AUTO", 5.0),
        (4, "zeta aaab", 1, "AUTO", 7.0),
        (5, "zeta abbb", 1, "AUTO", 6.0),
        # 6 vs 7: distance 2 but DIFFERENT segment -> no match
        (6, "omega llc", 2, "AUTO", 1.0),
        (7, "omega lxx", 2, "BLDG", 2.0),
        # 8 vs 1: name distance 1 to "acme corp" but DIFFERENT block
        (8, "acme corp", 3, "AUTO", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "rec_id long, name string, block long, segment string, val double"
    )
    out = {
        int(r.rec_id): r for r in resolve_entities(df).collect()
    }
    assert len(out) == 8  # one provenance row per input record
    # typo pair
    assert out[1].entity_id == 1 and out[2].entity_id == 1
    assert out[1].cluster_size == 2 and out[2].is_canonical is False
    assert out[2].golden_name == "acme corp"  # canonical record's name
    assert out[2].golden_value == 99.0  # max val survives
    # transitive chain
    assert {out[k].entity_id for k in (3, 4, 5)} == {3}
    assert out[3].cluster_size == 3
    assert out[3].n_matches == 1 and out[4].n_matches == 2
    assert out[3].golden_name == "zeta aaaa"
    assert out[5].golden_value == 7.0
    # distance-2 without corroboration stays split
    assert out[6].entity_id == 6 and out[7].entity_id == 7
    assert out[6].cluster_size == 1 and out[6].n_matches == 0
    # blocking boundary: identical name in another block never matches
    assert out[8].entity_id == 8 and out[8].is_canonical is True
    assert out[8].golden_name == "acme corp" and out[8].golden_value == 50.0


def test_er_sig_prefix_fixture_precondition():
    """ADVICE r11: ER_SIG_PREFIX=32 signature truncation is provably
    lossless only while every name fits the prefix — the claim "every
    fixture name is < 32 chars" (llm_dedup.py ER_SIG_PREFIX note) was
    enforced only implicitly. Assert it EXPLICITLY across all three
    testdata scales, with 4 chars of headroom for the perturbed-scale
    fixture suffix (tools/scale_curve.py appends ``' ' + digit*3`` to
    c_name) so the perturbed ER curve inherits the losslessness too."""
    import duckdb

    from ezbake_graph_spark.operators.llm_dedup import ER_SIG_PREFIX

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/customer.parquet"
        mx = con.sql(f"SELECT max(len(c_name)) FROM '{path}'").fetchone()[0]
        assert mx + 4 <= ER_SIG_PREFIX, (
            f"{sf}: max c_name length {mx} (+4 perturbed suffix) exceeds "
            f"ER_SIG_PREFIX={ER_SIG_PREFIX} — the deletion-signature "
            "blocking is no longer provably lossless on this fixture"
        )


def test_er_sig_prefix_long_name_behavior(spark):
    """Pin the documented long-name behavior past the prefix bound:
    (a) the per-record signature count stays at the 529 cap however
    long the name is (the quadratic-explode guard, ADVICE r10), and
    (b) a distance-1 pair whose edit lies ENTIRELY beyond the prefix
    is still matched — equal prefixes share a signature and the
    levenshtein verify runs on the FULL name, so truncation costs
    recall only when edits straddle the boundary (documented), never
    precision."""
    from pyspark.sql import functions as F

    from ezbake_graph_spark.operators.llm_dedup import (
        ER_SIG_PREFIX,
        _deletion_sigs,
        resolve_entities,
    )

    long_a = "x" * ER_SIG_PREFIX + " alpha tail"
    long_b = "x" * ER_SIG_PREFIX + " alpha taik"  # 1 edit, beyond prefix
    df = spark.createDataFrame(
        [(1, long_a, 0, "AUTO", 1.0), (2, long_b, 0, "AUTO", 2.0)],
        "rec_id long, name string, block long, segment string, val double",
    )
    cap = 1 + ER_SIG_PREFIX + ER_SIG_PREFIX * (ER_SIG_PREFIX - 1) // 2
    n_sigs = df.select(
        F.size(_deletion_sigs("name")).alias("n")
    ).agg(F.max("n")).collect()[0][0]
    assert n_sigs == cap == 529
    out = {int(r.rec_id): r for r in resolve_entities(df).collect()}
    assert out[1].entity_id == out[2].entity_id == 1
    assert out[1].cluster_size == 2


def test_resolve_entities_append_bridge_and_empty_batch(spark):
    """The incremental path merges two EXISTING entities when a new
    record bridges them (the case incremental ER gets wrong if it only
    assigns new records to one nearest entity), and an empty new batch
    returns the old resolution unchanged."""
    from ezbake_graph_spark.operators.llm_dedup import (
        resolve_entities,
        resolve_entities_append,
    )

    schema = "rec_id long, name string, block long, segment string, val double"
    old = spark.createDataFrame(
        [
            # entity A: {1, 2} (distance-1 pair)
            (1, "aaaa xxxx", 0, "AUTO", 10.0),
            (2, "aaaa xxxy", 0, "AUTO", 20.0),
            # entity B: {5, 6} — distance 4 from A, same block
            (5, "aaaa zzzz", 0, "AUTO", 30.0),
            (6, "aaaa zzzy", 0, "AUTO", 40.0),
            # unrelated singleton in another block
            (9, "qqqq qqqq", 1, "BLDG", 5.0),
        ],
        schema,
    )
    old_res = resolve_entities(old)
    # empty batch: output == old resolution, row for row
    empty = spark.createDataFrame([], schema)
    same = resolve_entities_append(old, old_res, empty)
    assert sorted(map(tuple, same.collect())) == sorted(
        map(tuple, old_res.collect())
    )
    # bridge: "aaaa xzzy" weak-matches records on BOTH sides — 2
    # ("aaaa xxxy", d=2), 5 ("aaaa zzzz", d=2) and 6 ("aaaa zzzy",
    # d=1) — so entities A and B must merge, labeled min(1, 5, 10) = 1
    bridge = spark.createDataFrame([(10, "aaaa xzzy", 0, "AUTO", 99.0)], schema)
    out = {
        int(r.rec_id): r
        for r in resolve_entities_append(old, old_res, bridge).collect()
    }
    assert {out[k].entity_id for k in (1, 2, 5, 6, 10)} == {1}
    assert out[1].cluster_size == 5
    assert out[1].golden_value == 99.0  # the new record's val survives
    assert out[10].n_matches == 3 and out[10].is_canonical is False
    assert out[9].entity_id == 9 and out[9].cluster_size == 1
    # equivalence with the batch kernel on the union
    batch = {
        int(r.rec_id): tuple(r)
        for r in resolve_entities(old.unionByName(bridge)).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == batch


def test_deletion_signature_blocking_is_lossless(spark):
    """The symmetric-delete candidate guarantee behind
    ``_er_candidate_pairs``: ANY string pair with levenshtein <= 2
    shares at least one <=2-deletion signature. Exhaustively checked
    over every pair from a mixed pool (substitutions, insertions,
    deletions, transposition-like double edits, short strings, and
    far-apart controls): candidate pairs from the signature join must
    be a SUPERSET of pairs with ed <= ER_WEAK_DIST (the fixture-level
    equivalence with the old block-only join is pinned by the
    registered keys' unchanged recursive-CTE oracle)."""
    import itertools

    from ezbake_graph_spark.operators.llm_dedup import (
        ER_WEAK_DIST,
        _er_candidate_pairs,
    )

    pool = [
        "acme corp", "acme corq", "acme corp ", "acme co", "acme",
        "acm corp", "aacme corp", "cme corpx", "zeta aaaa", "zeta abbb",
        "Customer#000000001", "Customer#000000010", "Customer#000000100",
        "Customer#000001000", "Customer#000000002", "Customer#00000001",
        "a", "ab", "", "ba", "omega llc", "totally different",
    ]
    rows = [(i, s, 0, "AUTO", 0.0) for i, s in enumerate(pool)]
    df = spark.createDataFrame(
        rows, "rec_id long, name string, block long, segment string, val double"
    )
    cand = {
        (int(r.src), int(r.dst)) for r in _er_candidate_pairs(df).collect()
    }
    for i, j in itertools.combinations(range(len(pool)), 2):
        d = _py_levenshtein(pool[i], pool[j])
        if d <= ER_WEAK_DIST:
            assert (i, j) in cand, (
                f"missed candidate: {pool[i]!r} ~ {pool[j]!r} (ed={d})"
            )


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]
