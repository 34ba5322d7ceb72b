"""Hypothesis property tests (SURVEY.md §5.4) for engine kernels that
golden/oracle tests only exercise on the fixture shapes: random inputs
probe the algebraic guarantees directly.

Each example launches real Spark jobs, so example counts are small and
deadlines disabled; inputs stay tiny (the properties are size-free).
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ezbake_graph_spark.determinism import SCALE, money_sum_expr
from ezbake_graph_spark.graph.pregel import core_number, shortest_paths_weighted

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# money-like doubles: two decimal places, bounded magnitude
_money = st.integers(min_value=-10_000_00, max_value=10_000_00).map(
    lambda c: c / 100.0
)


@given(xs=st.lists(_money, min_size=1, max_size=50))
@settings(**_SETTINGS)
def test_money_sum_is_exact(spark, xs):
    """money_sum_expr equals exact rational arithmetic, independent of
    partitioning/accumulation order."""
    df = spark.createDataFrame([(x,) for x in xs], "v double").repartition(4)
    got = df.agg(money_sum_expr(F.col("v")).alias("s")).collect()[0]["s"]
    exact = sum(Fraction(round(x * SCALE)) for x in xs) / SCALE
    assert got == float(exact)


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _ref_core(adj):
    deg = {v: len(n) for v, n in adj.items()}
    alive, core, k = set(adj), {}, 0
    while alive:
        v = min(alive, key=lambda x: deg[x])
        k = max(k, deg[v])
        core[v] = k
        alive.remove(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core


@given(edges=_edges)
@settings(**_SETTINGS)
def test_core_number_matches_peeling(spark, edges):
    """h-index fixpoint == sequential peeling on arbitrary graphs."""
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["c"] for r in core_number(edf).collect()}
    assert got == _ref_core(adj)


_weighted = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=9),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def _ref_dijkstra(adj, source):
    import heapq

    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, v = heapq.heappop(pq)
        if d > dist.get(v, float("inf")):
            continue
        for u, w in adj[v].items():
            nd = d + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


@given(edges=_weighted)
@settings(**_SETTINGS)
def test_sssp_matches_dijkstra(spark, edges):
    """Bellman-Ford Pregel == Dijkstra on arbitrary directed graphs
    (source fixed to the smallest vertex id present)."""
    adj = defaultdict(dict)
    verts = set()
    for s, d, w in edges:
        adj[s][d] = min(w, adj[s].get(d, w))
        verts.update((s, d))
    src = min(verts)
    # mirror the engine's input contract: one weight per (src, dst)
    dedup = [(s, d, w) for s, nbrs in adj.items() for d, w in nbrs.items()]
    edf = spark.createDataFrame(dedup, "src long, dst long, w long")
    vdf = spark.createDataFrame([(v,) for v in sorted(verts)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in shortest_paths_weighted(vdf, edf, [src]).collect()
    }
    assert got == _ref_dijkstra(adj, src)


def test_nested_ntz_guard_recursive_walk():
    """tables._has_ntz walks struct/array/map nesting and ignores
    columns merely NAMED like the type (the r2 guard's false-positive)."""
    from pyspark.sql import types as T

    from ezbake_graph_spark.tables import _has_ntz

    ntz = T.TimestampNTZType()
    assert _has_ntz(ntz)
    assert _has_ntz(T.StructType([T.StructField("x", ntz)]))
    assert _has_ntz(T.ArrayType(T.StructType([T.StructField("x", ntz)])))
    assert _has_ntz(T.MapType(T.StringType(), T.ArrayType(ntz)))
    assert not _has_ntz(T.TimestampType())
    assert not _has_ntz(T.ArrayType(T.TimestampType()))
    # a column *named* timestamp_ntz must not trip the guard
    named = T.StructType([T.StructField("timestamp_ntz", T.StringType())])
    assert not _has_ntz(named)


def test_zorder_morton_key_roundtrip():
    """The Morton interleave must be invertible (no bit collisions):
    de-interleaving the z-value recovers both coordinates for random
    16-bit inputs — the property that makes footer ranges meaningful."""
    from hypothesis import given, strategies as st

    from ezbake_graph_spark.operators.scans import _Z_BITS

    def z_py(x: int, y: int) -> int:
        z = 0
        for i in range(_Z_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    def unz_py(z: int) -> tuple[int, int]:
        x = y = 0
        for i in range(_Z_BITS):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    @given(
        st.integers(min_value=0, max_value=(1 << _Z_BITS) - 1),
        st.integers(min_value=0, max_value=(1 << _Z_BITS) - 1),
    )
    def check(x, y):
        assert unz_py(z_py(x, y)) == (x, y)

    check()


def test_zorder_spark_expr_matches_python(spark):
    """The JVM bit-op expression in sink_zorder_layout computes the
    same Morton key as the reference Python implementation."""
    from pyspark.sql import functions as F

    from ezbake_graph_spark.operators.scans import _Z_BITS, _z_value

    def z_py(x: int, y: int) -> int:
        z = 0
        for i in range(_Z_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(0, 0), (1, 0), (0, 1), (1499, 29), (65535, 65535), (1234, 4321)]
    df = spark.createDataFrame(pairs, "x long, y long").withColumn(
        "z", _z_value(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == z_py(r["x"], r["y"]), (r["x"], r["y"])


# small integer components force heavy cosine ties (duplicate vectors,
# scaled copies) — exactly the boundary cases the top-k kernel's
# raw-partition + rounded-order cut must survive
_vec = st.lists(
    st.integers(min_value=-3, max_value=3), min_size=4, max_size=4
).filter(lambda v: any(v))


@given(
    vecs=st.lists(_vec, min_size=2, max_size=16),
    n_blocks=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=100, deadline=None)
def test_pair_group_topk_matches_bruteforce(vecs, n_blocks):
    """_pair_group_topk (sim_cosine_topk's per-task kernel), unioned
    over every grid pair-group and globally merged, must equal the
    brute-force top-k under the oracle's exact composite order
    (round6(cosine) desc, vid1, vid2) — including every tie at the
    k-th boundary, which the kernel handles via a 1e-6 slack on the
    raw-value argpartition before the rounded-order cut."""
    import math

    import numpy as np
    import pandas as pd

    from ezbake_graph_spark.operators.llm_similarity import _pair_group_topk

    k = 5
    n = len(vecs)

    # brute force over all unordered pairs, rounded composite order
    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))),
            6,
        )

    expect = sorted(
        ((cos(vecs[i], vecs[j]), i, j) for i in range(n) for j in range(i + 1, n)),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:k]

    # kernel, run per grid pair-group exactly as _grid_pairs lays it out
    frames = []
    for bi in range(n_blocks):
        for bj in range(bi, n_blocks):
            members = [
                (i, v) for i, v in enumerate(vecs) if i % n_blocks in (bi, bj)
            ]
            if not members:
                continue
            pdf = pd.DataFrame(
                {
                    "vec_id": [i for i, _ in members],
                    "embedding": [np.array(v, dtype=np.float64) for _, v in members],
                    "b": [i % n_blocks for i, _ in members],
                    "pk": bi * n_blocks + bj,
                }
            )
            out = _pair_group_topk(pdf, n_blocks, k)
            if out is not None:
                frames.append(out)
    got_df = pd.concat(frames, ignore_index=True)
    got = sorted(
        zip(got_df["cosine"], got_df["vid1"], got_df["vid2"]),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:k]
    assert [(int(a), int(b)) for _, a, b in got] == [(a, b) for _, a, b in expect]
    for (gc, _, _), (ec, _, _) in zip(got, expect):
        assert abs(gc - ec) < 1e-9


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40_000), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_shard_manifest_prefix_sum_matches_serial(spark, sizes):
    """The distributed prefix sum inside multimodal_shard_manifest must
    reproduce the serial running-byte shard assignment on arbitrary
    document sizes — including zero-byte docs and docs larger than the
    16 KiB shard budget. Regression for the round-4 determinism bug:
    the repartitionByRange form re-sampled its boundaries on each of
    the subtree's two executions and produced overlapping shards."""
    import pandas as pd

    from ezbake_graph_spark.operators import multimodal as mm

    docs = [(i, "x" * n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # serial oracle in plain python
    shards: dict[int, list[int]] = {}
    before = 0
    for i, n in enumerate(sizes):
        shards.setdefault(before // 16384, []).append(i)
        before += n
    expect = {
        sid: (
            len(ids),
            sum(sizes[i] for i in ids),
            min(ids),
            max(ids),
        )
        for sid, ids in shards.items()
    }

    # run the operator's plan on the synthetic table by monkey-loading
    saved = mm.tables.load
    mm.tables.load = lambda s, sf, name: df  # noqa: E731
    try:
        got = {
            r["shard_id"]: (r["n_docs"], r["shard_bytes"], r["first_doc"], r["last_doc"])
            for r in mm.multimodal_shard_manifest(spark, "unused").collect()
        }
    finally:
        mm.tables.load = saved
    assert got == expect


def test_bounded_sort_queries_return_totally_ordered_rows(spark):
    """bounded_sort replaces orderBy with coalesce(1)+
    sortWithinPartitions; the driver's value-hash is order-insensitive
    so a broken total order would go unnoticed there — assert the
    presentational ordering contract directly."""
    from ezbake_graph_spark import registry

    cases = {
        "agg_pricing_q1": lambda r: (r["l_returnflag"], r["l_linestatus"]),
        "agg_count_distinct": lambda r: r["event_type"],
        "scalar_json": lambda r: r["event_type"],
        "stream_tumbling": lambda r: (r["window_start"], r["event_type"]),
        "join_star_q5": lambda r: r["n_name"],
    }
    qs = registry.queries()
    for key, sort_key in cases.items():
        rows = qs[key](spark, "/root/testdata/sf0.001").collect()
        keys = [sort_key(r) for r in rows]
        assert keys == sorted(keys), f"{key}: rows not totally ordered"
    # rollup: NULLS FIRST on both levels
    rows = qs["agg_rollup"](spark, "/root/testdata/sf0.001").collect()
    keys = [
        ((r["r_name"] is not None, r["r_name"]), (r["n_name"] is not None, r["n_name"]))
        for r in rows
    ]
    assert keys == sorted(keys), "agg_rollup: rows not nulls-first ordered"


@given(
    vecs=st.lists(_vec, min_size=2, max_size=14),
    n_blocks=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=100, deadline=None)
def test_pair_group_sims_covers_every_pair_exactly_once(vecs, n_blocks):
    """_pair_group_sims (the threshold kernel behind dedup_embedding)
    must emit every unordered vector pair exactly once across all grid
    pair-groups, with round6 cosines matching serial math — duplicate
    or dropped pairs would silently corrupt any threshold dedup built
    on it."""
    import math

    import numpy as np
    import pandas as pd

    from ezbake_graph_spark.operators.llm_similarity import _pair_group_sims

    n = len(vecs)
    got: dict[tuple[int, int], float] = {}
    for bi in range(n_blocks):
        for bj in range(bi, n_blocks):
            members = [
                (i, v) for i, v in enumerate(vecs) if i % n_blocks in (bi, bj)
            ]
            if not members:
                continue
            pdf = pd.DataFrame(
                {
                    "vec_id": [i for i, _ in members],
                    "embedding": [np.array(v, dtype=np.float64) for _, v in members],
                    "b": [i % n_blocks for i, _ in members],
                    "pk": bi * n_blocks + bj,
                }
            )
            out = _pair_group_sims(pdf, n_blocks)
            if out is None:
                continue
            v1, v2, s = out
            for a, b, c in zip(v1, v2, s):
                key = (int(a), int(b))
                assert key not in got, f"pair {key} emitted twice"
                got[key] = float(c)
    assert len(got) == n * (n - 1) // 2, "missing pairs"
    for (i, j), c in got.items():
        num = sum(x * y for x, y in zip(vecs[i], vecs[j]))
        exp = round(
            num
            / (
                math.sqrt(sum(x * x for x in vecs[i]))
                * math.sqrt(sum(y * y for y in vecs[j]))
            ),
            6,
        )
        assert abs(c - exp) < 1e-9, f"pair {(i, j)}: {c} != {exp}"


# ---------------------------------------------------------------- api kernels

_asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=50),    # t
        st.integers(min_value=0, max_value=999),   # payload
    ),
    min_size=1,
    max_size=25,
)


@given(lrows=_asof_rows, rrows=_asof_rows)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    """api.asof_join (union-tag + keyed running last) must agree with
    pandas.merge_asof on random keyed series, both directions. Pandas
    is an independent implementation of the same semantic, so this
    pins inclusive matching, per-key isolation, and no-match NULLs.
    Right rows are deduped per (key, t) with max(payload) — the same
    deterministic tie rule the API documents."""
    import pandas as pd

    from ezbake_graph_spark import api

    left = spark.createDataFrame(
        [(k, t, i, p) for i, (k, t, p) in enumerate(lrows)],
        "k long, t long, lid long, lval long",
    )
    rbest = {}
    for k, t, p in rrows:
        rbest[(k, t)] = max(rbest.get((k, t), -1), p)
    right = spark.createDataFrame(
        [(k, t, p) for (k, t), p in sorted(rbest.items())], "k long, t long, rval long"
    )
    lpd = pd.DataFrame(
        [(k, t, i, p) for i, (k, t, p) in enumerate(lrows)],
        columns=["k", "t", "lid", "lval"],
    ).sort_values(["t", "lid"], kind="stable")
    rpd = pd.DataFrame(
        [(k, t, p) for (k, t), p in sorted(rbest.items())],
        columns=["k", "t", "rval"],
    ).sort_values("t", kind="stable")
    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["rval"]
            for r in api.asof_join(
                left, right, on="t", by="k", direction=direction
            ).collect()
        }
        want_df = pd.merge_asof(
            lpd, rpd, on="t", by="k", direction=direction, allow_exact_matches=True
        )
        want = {
            int(r.lid): (None if pd.isna(r.rval) else int(r.rval))
            for r in want_df.itertuples()
        }
        assert got == want, f"direction={direction}"


_motif_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=5)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
    unique=True,
)


@given(edges=_motif_edges)
@settings(**_SETTINGS)
def test_find_motif_matches_brute_force(spark, edges):
    """api.find_motif's chained-join plan must enumerate exactly the
    bindings a brute-force nested loop finds, for a 2-path with a
    negated closing edge: (a)->(b); (b)->(c); !(c)->(a)."""
    from ezbake_graph_spark import api

    ids = sorted({v for e in edges for v in e})
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    e = spark.createDataFrame(list(edges), "src long, dst long")
    got = {
        (r["a"]["id"], r["b"]["id"], r["c"]["id"])
        for r in api.find_motif(
            v, e, "(a)-[]->(b); (b)-[]->(c); !(c)-[]->(a)"
        ).collect()
    }
    es = set(edges)
    want = {
        (a, b, c)
        for (a, b) in es
        for (b2, c) in es
        if b2 == b and (c, a) not in es
    }
    assert got == want


_ts_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),      # key
        st.integers(min_value=0, max_value=20),     # hour offset
        st.integers(min_value=1, max_value=9),      # value
    ),
    min_size=1,
    max_size=20,
)


@given(rows=_ts_rows)
@settings(**_SETTINGS)
def test_gapfill_matches_serial_oracle(spark, rows):
    """api.gapfill must produce exactly one row per (key, hour) over
    the GLOBAL min..max hour span, with zero-fill sums equal to a
    serial accumulation and locf carrying the last observed sum."""
    from datetime import datetime, timedelta

    from ezbake_graph_spark import api

    base = datetime(2024, 1, 1)
    data = [(f"k{k}", base + timedelta(hours=h), float(v)) for k, h, v in rows]
    df = spark.createDataFrame(data, "k string, ts timestamp, v double")

    lo, hi = min(h for _, h, _ in rows), max(h for _, h, _ in rows)
    keys = sorted({f"k{k}" for k, _, _ in rows})
    sums = defaultdict(float)
    for k, h, v in rows:
        sums[(f"k{k}", h)] += float(v)

    got = {
        (r["k"], int((r["bucket_start"] - base).total_seconds() // 3600)): r["s"]
        for r in api.gapfill(df, by="k", aggs={"s": F.sum("v")}).collect()
    }
    assert set(got) == {(k, h) for k in keys for h in range(lo, hi + 1)}
    for (k, h), v in got.items():
        assert v == sums.get((k, h), 0.0)

    locf = {
        (r["k"], int((r["bucket_start"] - base).total_seconds() // 3600)): r["s"]
        for r in api.gapfill(df, by="k", aggs={"s": F.sum("v")}, fill="locf").collect()
    }
    for k in keys:
        carry = None
        for h in range(lo, hi + 1):
            if (k, h) in sums:
                carry = sums[(k, h)]
            assert locf[(k, h)] == carry


# --- round-6 filter/URL tier: independent Python oracles ---------------

_words = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=4), min_size=1, max_size=40
)


@given(wordlists=st.lists(_words, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_repetition_metrics_match_counter_oracle(spark, wordlists):
    """repetition_stats vs a pure-Python collections.Counter oracle —
    independent of both Spark and DuckDB."""
    from collections import Counter

    from ezbake_graph_spark import api

    rows = [(i, " ".join(ws)) for i, ws in enumerate(wordlists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in api.repetition_stats(df).collect()}
    for i, ws in enumerate(wordlists):
        r = got[i]
        assert r["n_tokens"] == len(ws)
        assert r["dup_word_fraction"] == 1.0 - len(set(ws)) / len(ws)
        assert r["top_unigram_fraction"] == max(
            Counter(ws).values()
        ) / len(ws)
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if bgs:
            assert r["top_bigram_fraction"] == max(
                Counter(bgs).values()
            ) / len(bgs)
        else:
            assert r["top_bigram_fraction"] is None


_hosts = st.lists(
    st.text(alphabet="abcXYZ", min_size=1, max_size=6), min_size=2, max_size=4
).map(".".join)


@given(
    hosts=st.lists(_hosts, min_size=1, max_size=6),
    scheme=st.sampled_from(["http", "https"]),
)
@settings(**_SETTINGS)
def test_parse_urls_matches_urllib_oracle(spark, hosts, scheme):
    """parse_urls vs Python's urllib.parse on well-formed URLs —
    a third engine's opinion on the regex semantics."""
    from urllib.parse import urlparse

    from ezbake_graph_spark import api

    urls = [
        (i, f"{scheme}://{h}/p{i}/x?k={i}#frag") for i, h in enumerate(hosts)
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {r["id"]: r for r in api.parse_urls(df).collect()}
    for i, u in urls:
        p = urlparse(u)
        assert got[i]["scheme"] == p.scheme
        assert got[i]["host"] == p.netloc.lower()
        assert got[i]["path"] == p.path
        assert got[i]["query"] == p.query


_latlon = st.tuples(
    st.integers(min_value=-8000, max_value=8000),   # lat*100 in [-80, 80]
    st.integers(min_value=-17000, max_value=17000),  # lon*100, away from seam
)


@given(pts=st.lists(_latlon, min_size=2, max_size=25, unique=True))
@settings(**_SETTINGS)
def test_within_radius_matches_python_bruteforce(spark, pts):
    """Grid-bucketed radius join vs an all-pairs python haversine over
    hypothesis-generated coordinates (both hemispheres, up to |lat| 80
    where lon cells are ~5x narrower than the radius, clustered and
    dispersed) — the candidate pruning must never lose a true pair.
    ADVICE r6: the fan-out must size its cos at the POLEWARD edge of
    the +-1-lat neighborhood, not the probe point's own latitude."""
    import itertools
    import math

    from ezbake_graph_spark import api

    rows = [(i, la / 100.0, lo / 100.0) for i, (la, lo) in enumerate(pts)]
    df = spark.createDataFrame(rows, "point_id long, lat double, lon double")
    got = {(r["id1"], r["id2"]) for r in
           api.within_radius(df, radius_km=80.0).collect()}

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
        x = (math.sin(dla) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dlo) ** 2)
        return round(2 * 6371.0 * math.asin(math.sqrt(min(1.0, x))), 3)

    want = {(a[0], b[0]) for a, b in itertools.combinations(rows, 2)
            if hav(a, b) <= 80.0}
    assert got == want


def test_within_radius_wrap_lon_closes_antimeridian_seam(spark):
    """wrap_lon=True matches pairs straddling lon +-180 (the default
    documents the seam as unmatched); polar full-circle fan-out with
    wrapping must not emit duplicate pairs."""
    from ezbake_graph_spark import api

    pts = spark.createDataFrame(
        [(1, 0.0, 179.99), (2, 0.0, -179.99), (3, 10.0, 0.0)],
        "point_id long, lat double, lon double",
    )
    assert api.within_radius(pts, radius_km=50.0).count() == 0
    got = api.within_radius(pts, radius_km=50.0, wrap_lon=True).collect()
    assert [(r["id1"], r["id2"], r["dist_km"]) for r in got] == [(1, 2, 2.224)]
    # near-polar ring: cos_edge clamps to 0 -> full-circle fan; the
    # wrapped fan is array_distinct'ed so each pair appears once
    # (pairwise great-circle distances ~110/111/19 km at 89.5N)
    polar = spark.createDataFrame(
        [(1, 89.5, 10.0), (2, 89.5, 170.0), (3, 89.5, -170.0)],
        "point_id long, lat double, lon double",
    )
    rows = api.within_radius(
        polar, radius_km=120.0, cell_deg=2.0, wrap_lon=True
    ).collect()
    pairs = [(r["id1"], r["id2"]) for r in rows]
    assert len(pairs) == len(set(pairs)) == 3


def test_within_radius_wrap_lon_requires_integral_ring(spark):
    import pytest as _pytest

    from ezbake_graph_spark import api

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], "point_id long, lat double, lon double"
    )
    with _pytest.raises(ValueError, match="360/cell_deg"):
        api.within_radius(pts, radius_km=5.0, cell_deg=0.7, wrap_lon=True)


_pit_feats = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=20),  # ts
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda r: (r[0], r[1]),  # pre-deduplicated per (key, ts)
)
_pit_obs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=1,
    max_size=10,
    unique=True,
)


@given(f1=_pit_feats, f2=_pit_feats, obs=_pit_obs)
@settings(**_SETTINGS)
def test_pit_join_matches_bruteforce(spark, f1, f2, obs):
    """For arbitrary pre-deduplicated feature tables and observation
    rows, pit_join's picks equal the brute-force 'latest at-or-before
    per key' lookup for every feature, including misses (NULL)."""
    from ezbake_graph_spark.operators.joins import pit_join

    fa = spark.createDataFrame(f1 or [(99, 0, 0)], "k long, ts long, a long")
    fb = spark.createDataFrame(f2 or [(99, 0, 0)], "k long, ts long, b long")
    if not f1:
        fa = fa.filter("k < 0")
    if not f2:
        fb = fb.filter("k < 0")
    ob = spark.createDataFrame(obs, "k long, ts long")
    out = pit_join(ob, [("a", fa, "a"), ("b", fb, "b")], "k", "ts")
    got = {(r["k"], r["ts"]): (r["f_a"], r["f_a_ts"], r["f_b"]) for r in out.collect()}
    assert set(got) == set(obs)
    for k, ts in obs:
        cand_a = [(t, v) for kk, t, v in f1 if kk == k and t <= ts]
        cand_b = [(t, v) for kk, t, v in f2 if kk == k and t <= ts]
        want_a = max(cand_a)[1] if cand_a else None
        want_a_ts = max(cand_a)[0] if cand_a else None
        want_b = max(cand_b)[1] if cand_b else None
        assert got[(k, ts)] == (want_a, want_a_ts, want_b), (k, ts)


@given(pts=st.lists(_latlon, min_size=2, max_size=25, unique=True))
@settings(**_SETTINGS)
def test_knn_within_radius_matches_python_bruteforce(spark, pts):
    """Bounded-radius kNN vs all-pairs python: for every point the
    top-3 in-range neighbors (rounded-distance order, id tiebreak)
    must match exactly — the bucketed candidate set loses nothing."""
    import itertools
    import math

    from ezbake_graph_spark import api

    rows = [(i, la / 100.0, lo / 100.0) for i, (la, lo) in enumerate(pts)]
    df = spark.createDataFrame(rows, "point_id long, lat double, lon double")
    got = [
        (r.point_id, r.rank, r.neighbor_id, r.dist_km)
        for r in api.knn_within_radius(df, k=3, radius_km=80.0).collect()
    ]

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
        x = (math.sin(dla) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dlo) ** 2)
        return round(2 * 6371.0 * math.asin(math.sqrt(min(1.0, x))), 3)

    want = []
    for a in rows:
        nbrs = sorted(
            (hav(a, b), b[0]) for b in rows
            if b[0] != a[0] and hav(a, b) <= 80.0
        )
        want.extend(
            (a[0], r + 1, nid, d) for r, (d, nid) in enumerate(nbrs[:3])
        )
    assert sorted(got) == sorted(want)
