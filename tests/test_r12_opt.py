"""Round-12 optimization equivalence pins.

Every optimization this round changed an operator's INTERNALS while
claiming bit-identical output; each claim gets a focused test here, on
inputs built to stress the rewrite's edge cases (not just the
fixtures the oracle sweep already covers).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_sig_rows_matches_array_form(spark):
    """The codegen double-explode signature generator emits exactly
    the (rec_id, sig) SET of the reference array form
    (``explode(_deletion_sigs(...))``) — duplicates differ (the
    rewrite skips within-record dedup by design), the set may not.
    Pool stresses the enumeration edges: empty name, length-1,
    repeated characters (duplicate variants), and a name longer than
    ER_SIG_PREFIX (prefix truncation)."""
    from ezbake_graph_spark.operators.llm_dedup import (
        ER_SIG_PREFIX,
        _deletion_sig_rows,
        _deletion_sigs,
    )

    pool = ["", "a", "ab", "aa", "aab", "acme corp", "x" * (ER_SIG_PREFIX + 5)]
    df = spark.createDataFrame(
        [(i, s, 0) for i, s in enumerate(pool)],
        "rec_id long, name string, block long",
    )
    ref = {
        (r.rec_id, r.sig)
        for r in df.select(
            "rec_id", F.explode(_deletion_sigs("name")).alias("sig")
        ).collect()
    }
    new = {
        (r.rec_id, r.sig) for r in _deletion_sig_rows(df, []).collect()
    }
    assert new == ref


def test_frontier_wcc_matches_union_find(spark):
    """Delta-frontier connected components == a python union-find on
    a deterministic pseudo-random graph whose shape (chains + a large
    star + isolated vertices) forces multi-superstep propagation, so
    later supersteps run with a SHRUNK frontier — the code path the
    r12 rewrite added."""
    from ezbake_graph_spark.graph.pregel import connected_components

    import hashlib

    n = 300
    edges = []
    # chains of length 6 (deep propagation) + one star + noise edges
    for c in range(0, 180, 6):
        edges += [(c + i, c + i + 1) for i in range(5)]
    edges += [(200, 200 + i) for i in range(1, 40)]
    for i in range(40):
        h = int(hashlib.md5(f"e{i}".encode()).hexdigest()[:8], 16)
        edges.append((240 + h % 30, 240 + (h // 30) % 30))
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.id: r.component for r in connected_components(verts, edf).collect()
    }
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min id of the component
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in range(n)}
    assert got == want


def test_delta_temporal_matches_relax_all(spark):
    """Delta-frontier temporal earliest-arrival == a python relax-all
    Jacobi reference at EVERY horizon 1..6 (the bounded-horizon
    semantics are per-round state equality, which is exactly what the
    delta rewrite must preserve). Contact list built so arrivals
    improve across several rounds (time-respecting chains with
    shortcuts that only open late)."""
    from ezbake_graph_spark.graph.pregel import temporal_earliest_arrival

    contacts = [
        (0, 1, 10), (1, 2, 20), (2, 3, 30), (3, 4, 40), (4, 5, 50),
        (0, 3, 35),            # shortcut, usable immediately
        (3, 5, 36),            # earlier arrival at 5 via the shortcut
        (5, 1, 60),            # cycle back (no-op: 1 already earlier)
        (2, 5, 25),            # NOT time-respecting from 2 (arr 20>25 ok -> usable)
        (7, 8, 5),             # disconnected from the seed
    ]
    verts = spark.createDataFrame([(i,) for i in range(9)], "id long")
    cdf = spark.createDataFrame(contacts, "src long, dst long, t long")
    for rounds in (1, 2, 3, 6):
        got = {
            r.id: r.arr
            for r in temporal_earliest_arrival(
                verts, cdf, source_ids=[0], n_rounds=rounds
            ).collect()
        }
        # python Jacobi relax-all reference
        arr = {0: 0}
        for _ in range(rounds):
            new = dict(arr)
            for s, d, t in contacts:
                if s in arr and t >= arr[s]:
                    if d not in new or t < new[d]:
                        new[d] = min(new.get(d, t), t)
            arr = new
        assert got == arr, f"horizon {rounds}: {got} != {arr}"


def test_ppjoin_filters_match_brute_force(spark):
    """exact_jaccard_pairs with the r12 length+positional filters ==
    brute-force exact Jaccard on a corpus built around the filter
    boundaries: size ratios exactly AT the threshold (the float-slack
    edge), near-identical template docs (prefix collisions), and
    disjoint docs."""
    from ezbake_graph_spark.operators.llm_dedup import exact_jaccard_pairs

    docs = [
        (1, "a b c d e f g h i j"),          # 10 tokens
        (2, "a b c d e f g h i"),            # 9  tokens, J=9/10=0.9
        (3, "a b c d e f g h i j k l m n o p q r s t"),
        (4, "a b c d e f g h i j k l m n o p q r s"),
        (5, "z y x w v"),
        (6, "a b c d e"),                    # subset of 1, J=5/10=0.5
        (7, "a b c d e f g h i j"),          # duplicate of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.5, 0.9, 0.95):
        got = {
            (r.doc1, r.doc2): round(r.jaccard, 9)
            for r in exact_jaccard_pairs(df, threshold=t).collect()
        }
        toks = {i: set(s.split(" ")) for i, s in docs}
        want = {}
        for i, j in itertools.combinations(sorted(toks), 2):
            inter = len(toks[i] & toks[j])
            jac = inter / (len(toks[i]) + len(toks[j]) - inter)
            if jac >= t:
                want[(i, j)] = round(jac, 9)
        assert got == want, f"t={t}: {got} != {want}"
