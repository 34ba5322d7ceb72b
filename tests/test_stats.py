"""Property + brute-force-twin tests for the round-8 statistics keys
(dq_ks_test, dq_mann_whitney, events_survival_km, text_rake_keywords).

Each key's cross-engine value hash is covered by test_oracle_all; these
tests pin the MATH against independent python recomputations from the
raw parquet, so an error shared by both SQL dialects (same wrong
formula on both sides) cannot hide behind a green hash.
"""

from __future__ import annotations

import collections
import math

import duckdb
import pandas as pd

from ezbake_graph_spark import registry
from tests.conftest import SF_SMOKE


def _rows(spark, key):
    return registry.queries()[key](spark, SF_SMOKE).toPandas()


def test_ks_invariants_and_bruteforce(spark):
    out = _rows(spark, "dq_ks_test")
    # running ECDF numerators are monotone and end at the totals
    assert out["cum_ref"].is_monotonic_increasing
    assert out["cum_cur"].is_monotonic_increasing
    assert out["cum_ref"].iloc[-1] == out["n_ref"].iloc[0]
    assert out["cum_cur"].iloc[-1] == out["n_cur"].iloc[0]
    # the reported statistic is the max gap, bounded in [0, 1]
    assert (out["ks_num"] == out["gap_num"].max()).all()
    assert 0.0 <= out["ks_stat"].iloc[0] <= 1.0
    # brute force from raw parquet
    raw = duckdb.sql(
        f"SELECT o_totalprice, o_orderdate FROM "
        f"'{SF_SMOKE}/orders.parquet'"
    ).df()
    raw["bin"] = (raw["o_totalprice"] // 1000).astype(int)
    ref = raw[raw["o_orderdate"] < pd.Timestamp("1998-01-01")]
    cur = raw[raw["o_orderdate"] >= pd.Timestamp("1998-01-01")]
    n1, n2 = len(ref), len(cur)
    bins = sorted(set(raw["bin"]))
    c1 = collections.Counter(ref["bin"])
    c2 = collections.Counter(cur["bin"])
    a = b = best = 0
    for bn in bins:
        a += c1[bn]
        b += c2[bn]
        best = max(best, abs(a * n2 - b * n1))
    assert out["ks_num"].iloc[0] == best
    assert out["n_ref"].iloc[0] == n1 and out["n_cur"].iloc[0] == n2


def test_mann_whitney_identities_and_bruteforce(spark):
    out = _rows(spark, "dq_mann_whitney")
    n1 = out["n1"].iloc[0]
    n2 = out["n2"].iloc[0]
    assert out["c1"].sum() == n1 and out["c2"].sum() == n2
    assert 0.0 <= out["auc"].iloc[0] <= 1.0
    # doubled tie-averaged ranks are strictly increasing in value
    assert out.sort_values("val")["rank2x"].is_monotonic_increasing
    # brute force: tie-averaged rank sum over the raw rows
    raw = duckdb.sql(
        f"SELECT CAST(l_quantity AS BIGINT) AS q, l_returnflag AS f FROM "
        f"'{SF_SMOKE}/lineitem.parquet' WHERE l_returnflag IN ('R','N')"
    ).df()
    ranks = raw["q"].rank(method="average")  # tie-averaged
    r1 = ranks[raw["f"] == "R"].sum()
    u1_2x = int(round(2 * r1)) - n1 * (n1 + 1)
    assert out["u1_2x"].iloc[0] == u1_2x
    # U1 + U2 = n1*n2  (doubled: u1_2x + u2_2x = 2*n1*n2)
    r2 = ranks[raw["f"] == "N"].sum()
    u2_2x = int(round(2 * r2)) - n2 * (n2 + 1)
    assert u1_2x + u2_2x == 2 * n1 * n2
    assert out["auc"].iloc[0] == round(u1_2x / (2 * n1 * n2), 6)


def test_km_survival_matches_python_km(spark):
    out = _rows(spark, "events_survival_km")
    # survival is a product of factors in (0,1]: non-increasing, >0
    assert out["survival"].is_monotonic_decreasing or (
        out["survival"].diff().dropna() <= 1e-12
    ).all()
    assert (out["survival"] > 0).all() and (out["survival"] <= 1.0).all()
    assert out["n_risk"].is_monotonic_decreasing
    # brute-force KM from raw orders
    o = duckdb.sql(
        f"SELECT o_custkey, o_orderdate, o_totalprice FROM "
        f"'{SF_SMOKE}/orders.parquet'"
    ).df()
    t0 = o.groupby("o_custkey")["o_orderdate"].min()
    big = (
        o[o["o_totalprice"] > 450000]
        .groupby("o_custkey")["o_orderdate"]
        .min()
    )
    tmax = o["o_orderdate"].max()
    obs = []
    for cust, start in t0.items():
        if cust in big.index:
            obs.append(((big[cust] - start).days, 1))
        else:
            obs.append(((tmax - start).days, 0))
    per_t = collections.defaultdict(lambda: [0, 0])
    for t, ev in obs:
        per_t[t][0 if ev else 1] += 1
    n = len(obs)
    s = 1.0
    expect = {}
    for t in sorted(per_t):
        d, c = per_t[t]
        if d:
            s *= 1.0 - d / n
            expect[t] = (n, d, c, s)
        n -= d + c
    got = {
        int(r.duration): (int(r.n_risk), int(r.n_event), int(r.n_censored))
        for r in out.itertuples()
    }
    assert got == {t: v[:3] for t, v in expect.items()}
    for r in out.itertuples():
        assert math.isclose(
            r.survival, expect[int(r.duration)][3], abs_tol=2e-6
        )


def test_rake_matches_python_rake(spark):
    out = _rows(spark, "text_rake_keywords")
    assert (out["score"] >= 1.0).all()  # degree >= freq always
    assert (out["degree"] >= out["freq"]).all()
    docs = duckdb.sql(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).df()["text"]
    freq: collections.Counter = collections.Counter()
    degree: collections.Counter = collections.Counter()
    for text in docs:
        phrase: list[str] = []
        for w in text.split(" ") + ["a"]:  # sentinel flushes last phrase
            if w in ("a", "the"):
                for pw in phrase:
                    freq[pw] += 1
                    degree[pw] += len(phrase)
                phrase = []
            else:
                phrase.append(w)
    scored = sorted(
        ((round(degree[w] / freq[w], 6), w) for w in freq),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = [(r.score, r.word, r.freq, r.degree) for r in out.itertuples()]
    assert [(s, w) for s, w, *_ in got] == scored
    for _, w, f, d in got:
        assert freq[w] == f and degree[w] == d


def test_mmr_matches_python_greedy(spark):
    import numpy as np

    out = _rows(spark, "sim_mmr_select")
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).df()
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }

    def cos_u(a, b):
        va, vb = vecs[a], vecs[b]
        c = float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        return int(np.round(c * 1_000_000))

    expect = []
    for g in range(5):
        rel = sorted(
            ((cos_u(g, c), -c) for c in vecs if c != g), reverse=True
        )[:12]
        cand = {-negc: r for r, negc in rel}
        sel: list[int] = []
        for step in range(1, 5):
            best = None
            for c, r in sorted(cand.items()):
                if c in sel:
                    continue
                ms = max((cos_u(c, s) for s in sel), default=0)
                score = 7 * r - 3 * ms
                if best is None or score > best[0]:
                    best = (score, c, r, ms)
            sel.append(best[1])
            expect.append((g, step, best[1], best[2], best[3], best[0]))
    got = [
        (
            int(r.group_id),
            int(r.step),
            int(r.item_id),
            int(r.rel_u),
            int(r.max_sim_u),
            int(r.score10),
        )
        for r in out.itertuples()
    ]
    assert got == expect
    # selections are distinct within each group
    for g in range(5):
        ids = [i for gg, _, i, *_ in got if gg == g]
        assert len(set(ids)) == 4


def test_chi_square_matches_python(spark):
    out = _rows(spark, "dq_chi_square")
    n = out["n"].iloc[0]
    assert out["o"].sum() == n
    # row/col totals partition correctly
    for seg, grp in out.groupby("segment"):
        assert (grp["row_tot"] == grp["o"].sum()).all()
    for reg, grp in out.groupby("region"):
        assert (grp["col_tot"] == grp["o"].sum()).all()
    # brute-force chi2 from the contingency counts
    expect = 0.0
    for r in out.itertuples():
        e = r.row_tot * r.col_tot / n
        expect += (r.o - e) ** 2 / e
    assert math.isclose(out["chi2_stat"].iloc[0], expect, abs_tol=2e-4)
    assert (out["chi2_term"] >= 0).all()


def test_welch_matches_python(spark):
    out = _rows(spark, "dq_welch_ttest")
    raw = duckdb.sql(
        f"SELECT CAST(l_quantity AS BIGINT) AS q, l_returnflag AS f FROM "
        f"'{SF_SMOKE}/lineitem.parquet' WHERE l_returnflag IN ('R','N')"
    ).df()
    r = raw[raw["f"] == "R"]["q"]
    nn = raw[raw["f"] == "N"]["q"]
    assert out["n1"].iloc[0] == len(r) and out["n2"].iloc[0] == len(nn)
    assert out["s1"].iloc[0] == r.sum() and out["s2"].iloc[0] == nn.sum()
    vn1 = r.var(ddof=1) / len(r)
    vn2 = nn.var(ddof=1) / len(nn)
    t = (r.mean() - nn.mean()) / math.sqrt(vn1 + vn2)
    df = (vn1 + vn2) ** 2 / (
        vn1**2 / (len(r) - 1) + vn2**2 / (len(nn) - 1)
    )
    assert math.isclose(out["t_stat"].iloc[0], t, abs_tol=1e-5)
    assert math.isclose(out["df"].iloc[0], df, rel_tol=1e-6)
    assert math.isclose(out["mean1"].iloc[0], r.mean(), abs_tol=1e-6)


def test_bootstrap_weights_and_means(spark):
    import hashlib

    out = _rows(spark, "stats_bootstrap_ci")
    assert len(out) == 20
    raw = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice FROM '{SF_SMOKE}/orders.parquet'"
    ).df()
    ts = (
        1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
        4292415291, 4294609777, 4294923276, 4294962463,
    )

    def weight(key, b):
        u = int(hashlib.md5(f"{key}:{b}".encode()).hexdigest()[:8], 16)
        for k, t in enumerate(ts):
            if u < t:
                return k
        return len(ts)

    # brute-force two resamples end-to-end
    for b in (0, 7):
        ws = [weight(k, b) for k in raw["o_orderkey"]]
        n_eff = sum(ws)
        sm = sum(
            w * int(round(x * 1_000_000))
            for w, x in zip(ws, raw["o_totalprice"])
        )
        row = out[out["b"] == b].iloc[0]
        assert row["n_eff"] == n_eff
        assert row["boot_mean"] == round((sm / n_eff) / 1_000_000, 6)
    # Poisson(1) weights: n_eff concentrates near n (sd = sqrt(n))
    n = len(raw)
    assert (abs(out["n_eff"] - n) < 6 * math.sqrt(n)).all()
    # envelope covers the plain mean
    mean = (
        raw["o_totalprice"].map(lambda x: int(round(x * 1e6))).sum()
        / n
        / 1e6
    )
    assert out["ci_lo"].iloc[0] <= mean <= out["ci_hi"].iloc[0]


def test_srm_matches_python(spark):
    import hashlib

    out = _rows(spark, "events_srm_check")
    users = duckdb.sql(
        f"SELECT DISTINCT user_id FROM '{SF_SMOKE}/events.parquet'"
    ).df()["user_id"]
    n_a = sum(
        1
        for u in users
        if int(hashlib.md5(str(int(u)).encode()).hexdigest()[:4], 16) % 2
        == 0
    )
    n_b = len(users) - n_a
    assert out["n_a"].iloc[0] == n_a and out["n_b"].iloc[0] == n_b
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    assert out["srm_chi2"].iloc[0] == round(chi2, 6)
    assert out["srm_flag"].iloc[0] == (1 if chi2 > 3.841459 else 0)


# ----------------------------------------------------- hypothesis properties

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSET = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # value (heavy ties)
            st.integers(min_value=0, max_value=1),  # is_ref
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_HSET)
def test_rank_sum_u_property(spark, rows):
    """rank_sum_u equals the textbook tie-averaged U on random data
    with heavy ties, including single-population inputs (U defined,
    AUC NULL when a side is empty — never a raised division)."""
    from ezbake_graph_spark.operators.quality import rank_sum_u

    df = spark.createDataFrame(rows, "val long, is_ref int").repartition(3)
    out = {r["val"]: r for r in rank_sum_u(df, "val", "is_ref").collect()}
    vals = sorted(v for v, _ in rows)
    n1 = sum(f for _, f in rows)
    n2 = len(rows) - n1
    # tie-averaged doubled ranks per distinct value
    pos = {}
    start = 1
    for v in sorted(set(vals)):
        ct = vals.count(v)
        pos[v] = 2 * (start - 1) + ct + 1  # 2*cb + ct + 1
        start += ct
    r1_2x = sum(pos[v] for v, f in rows if f == 1)
    u1_2x = r1_2x - n1 * (n1 + 1)
    for v, f in rows:
        assert out[v]["rank2x"] == pos[v]
    any_row = next(iter(out.values()))
    assert any_row["u1_2x"] == u1_2x
    if n1 and n2:
        assert any_row["auc"] == round(u1_2x / (2 * n1 * n2), 6)
    else:
        assert any_row["auc"] is None


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),  # duration
            st.integers(min_value=0, max_value=1),  # event
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_HSET)
def test_km_survival_property(spark, obs):
    """km_survival equals the serial KM recurrence on random censored
    data — risk sets, event counts, and the survival product."""
    from ezbake_graph_spark.operators.analytics import km_survival

    df = spark.createDataFrame(obs, "duration long, event int").repartition(3)
    got = {
        r["duration"]: r
        for r in km_survival(df, "duration", "event").collect()
    }
    per_t = collections.defaultdict(lambda: [0, 0])
    for t, ev in obs:
        per_t[t][0 if ev else 1] += 1
    n = len(obs)
    s = 1.0
    seen = set()
    for t in sorted(per_t):
        d, c = per_t[t]
        if d:
            s *= 1.0 - d / n
            seen.add(t)
            assert got[t]["n_risk"] == n
            assert got[t]["n_event"] == d
            assert got[t]["n_censored"] == c
            assert math.isclose(got[t]["survival"], s, abs_tol=2e-6)
        n -= d + c
    assert set(got) == seen


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # bin (collisions)
            st.integers(min_value=0, max_value=1),  # is_ref
        ),
        min_size=2,
        max_size=60,
    ).filter(
        lambda rs: any(f == 1 for _, f in rs) and any(f == 0 for _, f in rs)
    )
)
@settings(**_HSET)
def test_ks_flagged_property(spark, rows):
    """ks_flagged's integer gap equals the direct two-sample ECDF
    computation on random binned data."""
    from ezbake_graph_spark.operators.quality import ks_flagged

    df = spark.createDataFrame(
        [(float(b), f) for b, f in rows], "v double, is_ref int"
    ).repartition(3)
    out = ks_flagged(df, "v", "is_ref", 1.0).collect()
    n1 = sum(f for _, f in rows)
    n2 = len(rows) - n1
    c1 = collections.Counter(b for b, f in rows if f == 1)
    c2 = collections.Counter(b for b, f in rows if f == 0)
    a = b_ = best = 0
    cums = {}
    for bn in sorted(set(b for b, _ in rows)):
        a += c1[bn]
        b_ += c2[bn]
        cums[bn] = (a, b_)
        best = max(best, abs(a * n2 - b_ * n1))
    for r in out:
        ea, eb = cums[r["bin"]]
        assert (r["cum_ref"], r["cum_cur"]) == (ea, eb)
        assert r["gap_num"] == abs(ea * n2 - eb * n1)
        assert r["ks_num"] == best
        assert r["ks_stat"] == round(best / (n1 * n2), 6)


@given(
    data=st.lists(  # (group, item, rel_u) candidates
        st.tuples(
            st.integers(min_value=0, max_value=1),
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=2,
        max_size=16,
        unique_by=lambda t: (t[0], t[1]),
    ),
    sims=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=64, max_size=64),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_HSET)
def test_mmr_select_property(spark, data, sims, k):
    """mmr_select equals the serial greedy on random shortlists and
    similarity grids, for every k, including groups smaller than k
    (they just yield fewer steps)."""
    from ezbake_graph_spark.operators.llm_similarity import mmr_select

    sim = {}
    idx = 0
    for g in (0, 1):
        items = sorted(i for gg, i, _ in data if gg == g)
        for a in items:
            for b in items:
                if a != b:
                    key = (g, a, b)
                    sim[key] = sims[idx % len(sims)]
                    idx += 1
    # symmetrize (cosine is symmetric; the kernel itself doesn't care)
    for (g, a, b), v in list(sim.items()):
        sim[(g, b, a)] = v
        sim[(g, a, b)] = v
    cand = spark.createDataFrame(
        [(g, i, r) for g, i, r in data],
        "group_id long, item_id long, rel_u long",
    ).repartition(3)
    pairs = spark.createDataFrame(
        [(g, a, b, v) for (g, a, b), v in sim.items()],
        "group_id long, id_a long, id_b long, sim_u long",
    ).repartition(3)
    got = sorted(
        tuple(r)
        for r in mmr_select(cand, pairs, k=k, lam10=7).collect()
    )
    # serial greedy
    expect = []
    for g in (0, 1):
        rel = {i: r for gg, i, r in data if gg == g}
        if not rel:
            continue
        sel = []
        for step in range(1, k + 1):
            best = None
            for i in sorted(rel):  # ascending id = tie-break winner first
                if i in sel:
                    continue
                ms = max((sim[(g, i, s)] for s in sel), default=0)
                score = 7 * rel[i] - 3 * ms
                if best is None or score > best[0]:
                    best = (score, i, rel[i], ms)
            if best is None:
                break
            sel.append(best[1])
            # collect column order: group, step, item, rel, max_sim, score
            expect.append((g, step, best[1], best[2], best[3], best[0]))
    assert got == sorted(expect)


def test_bm25_matches_python(spark):
    out = _rows(spark, "text_bm25")
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).df()
    toks = {int(r.doc_id): r.text.split(" ") for r in docs.itertuples()}
    n = len(toks)
    total = sum(len(t) for t in toks.values())
    q = ("spark", "window", "merge")
    df = {t: sum(1 for d in toks.values() if t in d) for t in q}
    scores = {}
    hits = {}
    for d, words in toks.items():
        s = 0.0
        h = 0
        for t in q:
            tf = words.count(t)
            if not tf:
                continue
            h += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(words) * n / total))
        if h:
            scores[d] = s
            hits[d] = h
    top = sorted(scores, key=lambda d: (-round(scores[d], 6), d))[:25]
    got = [(int(r.doc_id), int(r.n_terms_hit), r.bm25) for r in out.itertuples()]
    assert [d for d, *_ in got] == top
    for d, h, s in got:
        assert hits[d] == h
        assert s == round(scores[d], 6)
    # BM25 saturation: contribution monotone in tf but bounded by
    # (k1+1)*idf — spot-check the top doc's score is positive
    assert got[0][2] > 0


def test_hybrid_rrf_matches_python(spark):
    import numpy as np

    out = _rows(spark, "sim_hybrid_rrf")
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).df()
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).df()
    # lexical arm (reuse the BM25 brute force)
    toks = {int(r.doc_id): r.text.split(" ") for r in docs.itertuples()}
    n = len(toks)
    total = sum(len(t) for t in toks.values())
    q = ("spark", "window", "merge")
    df = {t: sum(1 for d in toks.values() if t in d) for t in q}
    lex_scores = {}
    for d, words in toks.items():
        s = 0.0
        for t in q:
            tf = words.count(t)
            if tf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(words) * n / total)
                )
        if s:
            lex_scores[d] = round(s, 6)
    lex_rank = {
        d: i + 1
        for i, d in enumerate(
            sorted(lex_scores, key=lambda d: (-lex_scores[d], d))[:50]
        )
    }
    # dense arm
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in emb.itertuples()
    }
    qv = vecs[0]
    cos = {
        d: round(
            float(v @ qv) / (np.linalg.norm(v) * np.linalg.norm(qv)), 6
        )
        for d, v in vecs.items()
        if d != 0
    }
    dense_rank = {
        d: i + 1
        for i, d in enumerate(sorted(cos, key=lambda d: (-cos[d], d))[:50])
    }
    # fusion
    rrf = {}
    for d in set(lex_rank) | set(dense_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (60 + lex_rank[d])
        if d in dense_rank:
            s += 1.0 / (60 + dense_rank[d])
        rrf[d] = round(s, 6)
    top = sorted(rrf, key=lambda d: (-rrf[d], d))[:15]
    got = [
        (int(r.doc_id), r.lex_rank, r.dense_rank, r.rrf)
        for r in out.itertuples()
    ]
    assert [d for d, *_ in got] == top
    for d, lr, dr, s in got:
        assert (None if lr is None or (isinstance(lr, float) and lr != lr) else int(lr)) == lex_rank.get(d)
        assert (None if dr is None or (isinstance(dr, float) and dr != dr) else int(dr)) == dense_rank.get(d)
        assert s == rrf[d]


def test_cms_matches_python_and_one_sided(spark):
    import hashlib
    from collections import Counter, defaultdict

    out = _rows(spark, "text_cms_sketch")
    docs = duckdb.sql(
        f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
    ).df()["text"]
    tc = Counter()
    for t in docs:
        tc.update(t.split(" "))

    def col(r, term):
        return int(
            hashlib.md5(f"{r}:{term}".encode()).hexdigest()[:8], 16
        ) % 256

    counters = defaultdict(int)
    for term, n in tc.items():
        for r in range(4):
            counters[(r, col(r, term))] += n
    top = sorted(tc, key=lambda t: (-tc[t], t))[:20]
    got = [
        (r.term, int(r.n_exact), int(r.cms_est), int(r.overcount))
        for r in out.itertuples()
    ]
    assert [t for t, *_ in got] == top
    for term, n, est, over in got:
        assert n == tc[term]
        expect = min(counters[(r, col(r, term))] for r in range(4))
        assert est == expect
        assert over == est - n
        assert over >= 0  # CMS never underestimates


def test_pattern_match_python_twin(spark):
    out = _rows(spark, "events_pattern_match")
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"'{SF_SMOKE}/events.parquet' ORDER BY user_id, ts, event_id"
    ).df()
    sessions = []
    cur = None
    last = {}
    for r in ev.itertuples():
        key = r.user_id
        if key not in last or (r.ts - last[key][0]).total_seconds() > 1800:
            sessions.append([])
            last[key] = (r.ts, len(sessions) - 1)
        else:
            last[key] = (r.ts, last[key][1])
        sessions[last[key][1]].append(r.event_type)
    paths = ["->".join(s) for s in sessions]
    import fnmatch

    pats = {
        1: "*view*click*purchase*",
        2: "*signup*purchase*",
        3: "*error*purchase*",
    }
    for r in out.itertuples():
        want = sum(
            1 for p in paths if fnmatch.fnmatchcase(p, pats[int(r.pattern_id)])
        )
        assert int(r.n_matched) == want
        assert int(r.n_sessions) == len(paths)
        assert r.match_rate == round(want / len(paths), 6)


def test_benford_python_twin(spark):
    out = _rows(spark, "dq_benford_test")
    prices = duckdb.sql(
        f"SELECT o_totalprice FROM '{SF_SMOKE}/orders.parquet' "
        f"WHERE o_totalprice > 0"
    ).df()["o_totalprice"]
    digits = collections.Counter(
        int(str(int(round(p * 100)))[0]) for p in prices
    )
    total = sum(digits.values())
    mad = sum(
        abs(digits.get(d, 0) / total - math.log10(1 + 1 / d))
        for d in range(1, 10)
    ) / 9
    for r in out.itertuples():
        d = int(r.digit)
        assert int(r.n) == digits[d]
        assert r.observed_share == round(digits[d] / total, 6)
        assert r.expected_share == round(math.log10(1 + 1 / d), 6)
    assert abs(out["mad_stat"].iloc[0] - mad) < 2e-6


def test_km_oracle_handles_consumed_risk_set():
    """ADVICE r8: DuckDB's ln(0) raises 'Out of Range Error' (it is not
    -inf), so the committed _KM_SQL must short-circuit a duration where
    events consume the whole remaining risk set — exactly like the
    Spark kernel's consumed flag. Splice a consumed fixture into the
    oracle's own cnt/risk/curve CTEs: 4 subjects, t=1 one event + one
    censor (n_risk=4, S=0.75), t=2 two events with n_risk=2 → d ==
    n_risk → survival exactly 0.0, no error."""
    from ezbake_graph_spark.operators.analytics import _KM_SQL

    head, sep, tail = _KM_SQL.partition("cnt AS")
    assert sep, "oracle restructured: update this test's splice point"
    sql = (
        "WITH obs AS (SELECT * FROM (VALUES (1, 1), (1, 0), (2, 1), (2, 1))"
        " AS v(t, ev)),\ncnt AS" + tail
    )
    out = duckdb.sql(sql).df().set_index("duration")
    assert out.loc[1, "survival"] == 0.75
    assert out.loc[2, "survival"] == 0.0
    assert int(out.loc[2, "n_risk"]) == 2 and int(out.loc[2, "n_event"]) == 2


def test_km_spark_kernel_consumed_matches_oracle_fixture(spark):
    """The Spark kernel on the SAME consumed fixture as the oracle
    splice test above — both engines must report S(2) = exactly 0.0."""
    from ezbake_graph_spark.operators.analytics import km_survival

    df = spark.createDataFrame(
        [(1, 1), (1, 0), (2, 1), (2, 1)], "duration long, event int"
    )
    got = {
        int(r.duration): (int(r.n_risk), int(r.n_event), r.survival)
        for r in km_survival(df).collect()
    }
    assert got == {1: (4, 1, 0.75), 2: (2, 2, 0.0)}


def test_mmr_select_sparse_pairs_treated_as_zero_similarity(spark):
    """ADVICE r8: a remaining candidate with NO pair row to an already
    selected item must stay in the greedy argmax with similarity 0 —
    the pre-fix INNER join silently dropped it. Fixture: item 1 wins
    step 1; item 3 has no pair row to item 1, so its untouched
    relevance (7*80=560) beats item 2's penalized 7*90-3*50=480."""
    from ezbake_graph_spark.operators.llm_similarity import mmr_select

    cand = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 90), (1, 3, 80)],
        "group_id long, item_id long, rel_u long",
    )
    pairs = spark.createDataFrame(
        [(1, 2, 1, 50), (1, 1, 2, 50)],
        "group_id long, id_a long, id_b long, sim_u long",
    )
    got = {
        int(r.step): (int(r.item_id), int(r.max_sim_u), int(r.score10))
        for r in mmr_select(cand, pairs, k=3, lam10=7).collect()
    }
    assert got[1] == (1, 0, 700)
    assert got[2] == (3, 0, 560), "sparse candidate dropped from argmax"
    assert got[3] == (2, 50, 480)
