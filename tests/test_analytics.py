"""Brute-force-twin tests for the round-9 analytics keys.

Cross-engine value hashes are covered by test_oracle_all; these pin
the MATH against independent python recomputations from the raw
parquet, so a formula error shared by both SQL dialects cannot hide
behind a green hash.
"""

from __future__ import annotations

import collections
import itertools

import duckdb

from ezbake_graph_spark import registry
from tests.conftest import SF_SMOKE


def _rows(spark, key):
    return registry.queries()[key](spark, SF_SMOKE).toPandas()


def test_market_basket_python_twin(spark):
    out = _rows(spark, "events_market_basket")
    li = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"'{SF_SMOKE}/lineitem.parquet'"
    ).fetchall()
    baskets = collections.defaultdict(set)
    for o, p in li:
        baskets[o].add(p)
    item = collections.Counter()
    pair = collections.Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        for a, b in itertools.combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    n = len(baskets)
    want = {k: v for k, v in pair.items() if v >= 2}
    assert len(out) == len(want)
    for r in out.itertuples():
        key = (int(r.part_a), int(r.part_b))
        sup = want[key]
        assert int(r.pair_support) == sup
        assert int(r.support_a) == item[key[0]]
        assert int(r.support_b) == item[key[1]]
        assert int(r.n_baskets) == n
        assert r.conf_a_to_b == round(sup / item[key[0]], 6)
        assert r.conf_b_to_a == round(sup / item[key[1]], 6)
        assert r.lift == round(sup * n / (item[key[0]] * item[key[1]]), 6)
        # invariants: support monotonicity and confidence bounds
        assert sup <= min(item[key[0]], item[key[1]])
        assert 0 < r.conf_a_to_b <= 1 and 0 < r.conf_b_to_a <= 1


def test_permutation_test_python_twin(spark):
    import hashlib

    out = _rows(spark, "stats_permutation_test")
    rows = duckdb.sql(
        f"SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT), "
        f"o_orderstatus FROM '{SF_SMOKE}/orders.parquet' "
        f"WHERE o_orderstatus IN ('F','O')"
    ).fetchall()
    na = sum(1 for *_, s in rows if s == "F")
    nb = len(rows) - na
    sa = sum(c for _, c, s in rows if s == "F")
    sb = sum(c for _, c, s in rows if s == "O")
    obs = round((sa / na - sb / nb) / 100, 6)
    B = 32
    exceeds = 0
    by_b = {}
    for b in range(B):
        pna = pnb = psa = psb = 0
        for k, c, _ in rows:
            u = int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:8], 16)
            if u * (na + nb) < na * 4294967296:
                pna += 1
                psa += c
            else:
                pnb += 1
                psb += c
        d = round((psa / pna - psb / pnb) / 100, 6)
        by_b[b] = (pna, pnb, d)
        exceeds += abs(d) >= abs(obs)
    p = round((1 + exceeds) / (B + 1), 6)
    assert len(out) == B
    for r in out.itertuples():
        pna, pnb, d = by_b[int(r.b)]
        assert (int(r.n_a_perm), int(r.n_b_perm)) == (pna, pnb)
        assert r.perm_diff == d
        assert r.obs_diff == obs
        assert int(r.exceed) == (abs(d) >= abs(obs))
        assert r.p_value == p
    # permuted group sizes hover around their expectation
    assert abs(sum(v[0] for v in by_b.values()) / B - na) < 0.1 * (na + nb)


def test_temporal_reachability_python_twin(spark):
    out = _rows(spark, "graph_temporal_reachability")
    rows = duckdb.sql(
        f"""
        WITH s AS (
          SELECT user_id, epoch_us(ts) AS t, event_id,
                 CAST(json_extract_string(props,'$.k') AS INTEGER) AS k
          FROM '{SF_SMOKE}/events.parquet')
        SELECT k, t, event_id, user_id FROM s ORDER BY k, t, event_id
        """
    ).fetchall()
    contacts = []
    prev = {}
    for k, t, _e, u in rows:
        if k in prev and prev[k] != u:
            contacts.append((prev[k], u, t))
        prev[k] = u
    seed = min(r[3] for r in rows)
    arr = {seed: 0}
    for _ in range(12):
        new = dict(arr)
        for s_, d_, t_ in contacts:
            if s_ in arr and t_ >= arr[s_]:
                if d_ not in new or t_ < new[d_]:
                    new[d_] = t_
        if new == arr:
            break
        arr = new
    got = {int(r.user_id): int(r.arrival_us) for r in out.itertuples()}
    assert got == arr
    # time-respecting invariant: every non-seed arrival is a real
    # contact timestamp reachable monotonically
    ts_set = {t for *_, t in contacts}
    assert all(a in ts_set for u, a in arr.items() if u != seed)


def test_temporal_reachability_empty_events_emits_nothing(spark, tmp_path):
    """Empty-events edge (ADVICE r10): the vertex set unions in the
    min-user-id aggregate row, which is NULL on an empty table — the
    kernel must filter it, emitting ZERO rows rather than pushing a
    NULL vertex through the Pregel joins. (The SQL oracle's
    unconditional d0 emits one (NULL, 0) row on this edge — a declared
    divergence on empty input only; every fixture has events.)"""
    from ezbake_graph_spark import registry, tables

    empty_dir = tmp_path / "sf_empty"
    tables.load(spark, SF_SMOKE, "events").limit(0).write.parquet(
        str(empty_dir / "events.parquet")
    )
    out = registry.queries()["graph_temporal_reachability"](
        spark, str(empty_dir)
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["user_id", "arrival_us"]


def test_curriculum_order_python_twin(spark):
    out = _rows(spark, "sample_curriculum_order")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    df = collections.Counter()
    toks = {}
    for d, t in rows:
        toks[d] = t.split(" ")
        for term in set(toks[d]):
            df[term] += 1
    want = {}
    for d, ts in toks.items():
        n_tok = len(ts)
        tok_chars = sum(len(x) for x in ts)
        n_rare = sum(1 for x in ts if df[x] <= 2)
        want[d] = (n_tok, n_rare,
                   tok_chars * 1_000_000 // n_tok
                   + n_rare * 1_000_000 // n_tok)
    order = sorted(want, key=lambda d: (want[d][2], d))
    n = len(order)
    assert list(out.doc_id) == order
    for r in out.itertuples():
        n_tok, n_rare, diff = want[int(r.doc_id)]
        assert (int(r.n_tok), int(r.n_rare), int(r.difficulty_micro)) == (
            n_tok, n_rare, diff)
    # rank is 1..n in difficulty order; epoch buckets are equal-depth
    assert list(out.curriculum_rank) == list(range(1, n + 1))
    assert out.difficulty_micro.is_monotonic_increasing
    sizes = out.epoch_bucket.value_counts()
    assert sizes.max() - sizes.min() <= 1
    assert out.epoch_bucket.is_monotonic_increasing


def test_matryoshka_topk_python_twin(spark):
    import numpy as np

    out = _rows(spark, "embed_matryoshka_topk")
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet'"
    ).fetchall()
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=np.float64)

    def unit(m):
        n = np.sqrt((m * m).sum(axis=1, keepdims=True))
        return m / np.where(n == 0, 1, n)

    t, f = unit(mat[:, :16]), unit(mat)
    cand = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
            cand.append((round(float(t[i] @ t[j]), 6),
                         round(float(f[i] @ f[j]), 6), a, b))
    cand.sort(key=lambda r: (-r[0], r[2], r[3]))
    want = cand[:20]
    assert len(out) == 20
    for r, (ct, cf, a, b) in zip(out.itertuples(), want):
        assert (int(r.vid1), int(r.vid2)) == (a, b)
        assert abs(r.cos_trunc - ct) < 2e-6
        assert abs(r.cos_full - cf) < 2e-6
    # truncation changes the ranking: full-dim cosine of the truncated
    # winners is NOT itself sorted (the audit the key exists for)
    assert not out.cos_full.is_monotonic_decreasing


def test_dp_counts_python_twin(spark):
    import hashlib
    import math

    out = _rows(spark, "agg_dp_counts")
    truth = dict(duckdb.sql(
        f"SELECT o_orderpriority, count(*) FROM "
        f"'{SF_SMOKE}/orders.parquet' GROUP BY 1"
    ).fetchall())
    assert len(out) == len(truth)
    for r in out.itertuples():
        n = truth[r.o_orderpriority]
        u = int(hashlib.md5(f"dp:{r.o_orderpriority}".encode())
                .hexdigest()[:8], 16)
        u01 = (u + 0.5) / 4294967296.0
        want = round(-2.0 * math.copysign(1.0, u01 - 0.5)
                     * math.log(1.0 - 2.0 * abs(u01 - 0.5)), 6)
        assert int(r.n) == n
        assert r.epsilon == 0.5
        assert r.noise == want
        assert r.noisy_n == round(n + want, 6)
    # mechanism sanity: noise is Laplace-scaled (b=2), not degenerate
    assert out.noise.abs().max() > 0


def test_eval_ranking_python_twin(spark):
    import math

    out = _rows(spark, "ml_eval_ranking")
    assert len(out) == 1
    r = out.iloc[0]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    q = ("spark", "window", "merge")
    rel = {d: len(set(q) & set(t.split(" "))) for d, t in docs}
    rel = {d: v for d, v in rel.items() if v > 0}
    bm = _rows(spark, "text_bm25")
    ranking = list(bm.sort_values(["bm25", "doc_id"],
                                  ascending=[False, True]).doc_id)
    dcg = sum((2 ** rel.get(d, 0) - 1) / (math.log(i + 2) / math.log(2))
              for i, d in enumerate(ranking))
    ideal = sorted(rel.values(), reverse=True)[:25]
    idcg = sum((2 ** v - 1) / (math.log(i + 2) / math.log(2))
               for i, v in enumerate(ideal))
    n_rel = sum(1 for v in rel.values() if v == 3)
    hits = [i + 1 for i, d in enumerate(ranking) if rel.get(d, 0) == 3]
    assert int(r.k) == 25
    assert int(r.n_rel_total) == n_rel
    assert int(r.n_rel_retrieved) == len(hits)
    assert r.precision_k == round(len(hits) / 25, 6)
    assert r.recall_k == round(len(hits) / n_rel, 6)
    assert r.mrr == (round(1 / hits[0], 6) if hits else 0.0)
    assert abs(r.dcg - dcg) < 1e-5 and abs(r.idcg - idcg) < 1e-5
    assert r.ndcg == round(r.dcg / r.idcg, 6) or abs(r.ndcg - dcg / idcg) < 1e-5
    assert 0 < r.ndcg <= 1


def test_window_funnel_python_twin(spark):
    out = _rows(spark, "events_window_funnel")
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), event_type FROM "
        f"'{SF_SMOKE}/events.parquet' ORDER BY user_id, 1"
    ).fetchall()
    W = 86_400 * 1_000_000
    by_user = collections.defaultdict(list)
    for u, t, ty in rows:
        by_user[u].append((t, ty))
    for r in out.itertuples():
        evs = sorted(by_user[int(r.user_id)])
        t1 = min((t for t, ty in evs if ty == "view"), default=None)
        t2 = t3 = None
        if t1 is not None:
            t2 = min((t for t, ty in evs
                      if ty == "click" and t1 <= t <= t1 + W), default=None)
        if t2 is not None:
            t3 = min((t for t, ty in evs
                      if ty == "purchase" and t2 <= t <= t2 + W), default=None)
        depth = 3 if t3 else 2 if t2 else 1 if t1 else 0
        assert int(r.funnel_depth) == depth
        for got, want in ((r.t1_us, t1), (r.t2_us, t2), (r.t3_us, t3)):
            assert (want is None) == (got != got or got is None) or int(got) == want
            if want is not None:
                assert int(got) == want


def test_max_concurrency_python_twin(spark):
    out = _rows(spark, "ts_max_concurrency")
    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) FROM '{SF_SMOKE}/events.parquet' "
        f"ORDER BY user_id, 2"
    ).fetchall()
    GAP = 1_800_000_000
    sessions = []
    cur = None
    for u, t in rows:
        if cur and cur[0] == u and t - cur[2] < GAP:
            cur = (u, cur[1], t)
        else:
            if cur:
                sessions.append(cur)
            cur = (u, t, t)
    if cur:
        sessions.append(cur)
    sweep = [(s[1], 1) for s in sessions] + [(s[2] + GAP, -1) for s in sessions]
    sweep.sort()
    active = 0
    import datetime
    per_day_peak = collections.Counter()
    starts = collections.Counter()
    for t, d in sweep:
        active += d
        day = datetime.datetime.fromtimestamp(t / 1e6,
                                              tz=datetime.timezone.utc).date()
        per_day_peak[day] = max(per_day_peak[day], active)
        if d == 1:
            starts[day] += 1
    got_days = list(out.day)
    assert got_days == sorted(per_day_peak)
    for r in out.itertuples():
        assert int(r.peak_concurrency) == per_day_peak[r.day]
        assert int(r.n_sessions_started) == starts[r.day]
    # occupancy sanity: total starts equal total sessions
    assert int(out.n_sessions_started.sum()) == len(sessions)


def test_target_encoding_python_twin_and_leakage(spark):
    out = _rows(spark, "ml_target_encoding")
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, "
        f"CAST(round(o_totalprice*100) AS BIGINT) FROM "
        f"'{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    m = 20
    grp = collections.defaultdict(lambda: [0, 0])
    tot = [0, 0]
    for _, c, v in rows:
        grp[c][0] += 1
        grp[c][1] += v
        tot[0] += 1
        tot[1] += v
    prior = tot[1] / tot[0] / 100
    want = {}
    for k, c, v in rows:
        n, s = grp[c]
        want[k] = (c, n, round(((s - v) / 100 + m * prior) / (n - 1 + m), 6))
    assert len(out) == len(rows)
    for r in out.itertuples():
        c, n, enc = want[int(r.o_orderkey)]
        assert (r.cat, int(r.n_cat), r.loo_encoding) == (c, n, enc)
    # leakage check: two rows of the same category with different
    # targets must get DIFFERENT encodings (own target excluded)
    by_cat = collections.defaultdict(set)
    vals = {k: v for k, _, v in rows}
    for r in out.itertuples():
        by_cat[r.cat].add((vals[int(r.o_orderkey)], r.loo_encoding))
    for c, pairs in by_cat.items():
        cents = {p[0] for p in pairs}
        encs = {p[1] for p in pairs}
        if len(cents) > 1:
            assert len(encs) > 1


def test_woe_iv_python_twin(spark):
    import math

    out = _rows(spark, "ml_woe_iv")
    rows = duckdb.sql(f"""
        SELECT n.n_name, CASE WHEN o.o_orderstatus='F' THEN 1 ELSE 0 END
        FROM '{SF_SMOKE}/orders.parquet' o
        JOIN '{SF_SMOKE}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{SF_SMOKE}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
    """).fetchall()
    cell = collections.defaultdict(lambda: [0, 0])
    for nat, e in rows:
        cell[nat][e] += 1
    E = sum(v[1] for v in cell.values())
    NE = sum(v[0] for v in cell.values())
    iv = 0.0
    want = {}
    for nat, (ne, e) in cell.items():
        woe = math.log(((e + 0.5) / E) / ((ne + 0.5) / NE))
        gap = e / E - ne / NE
        want[nat] = (e, ne, round(woe, 6), round(gap * woe, 6))
        iv += gap * woe
    assert len(out) == len(cell)
    for r in out.itertuples():
        e, ne, woe, contrib = want[r.nation]
        assert (int(r.n_events), int(r.n_nonevents)) == (e, ne)
        assert r.woe == woe and r.iv_contrib == contrib
        assert abs(r.iv_total - iv) < 1e-5
    # IV is nonnegative by construction (gap and woe share sign)
    assert out.iv_total.iloc[0] >= 0


def test_neyman_allocation_python_twin(spark):
    import hashlib
    import math

    out = _rows(spark, "sample_neyman_allocation")
    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, "
        f"CAST(round(o_totalprice/10) AS BIGINT) FROM "
        f"'{SF_SMOKE}/orders.parquet'"
    ).fetchall()
    strata = collections.defaultdict(list)
    for k, s, x in rows:
        strata[s].append((k, x))
    mom = {
        s: (len(v), sum(x for _, x in v), sum(x * x for _, x in v))
        for s, v in strata.items()
    }
    sd = {s: math.sqrt(n * sxx - sx * sx) / n for s, (n, sx, sxx) in mom.items()}
    wtot = sum(mom[s][0] * sd[s] for s in mom)
    alloc = {s: int(math.floor(1000 * mom[s][0] * sd[s] / wtot + 0.5))
             for s in mom}
    assert len(out) == len(strata)
    for r in out.itertuples():
        s = r.stratum
        n, sx, sxx = mom[s]
        assert int(r.n_h) == n
        assert r.sd_dollars == round(sd[s] * 10, 6)
        assert int(r.alloc_h) == alloc[s]
        chosen = sorted(
            strata[s],
            key=lambda kv: (hashlib.md5(str(kv[0]).encode()).hexdigest(),
                            kv[0]),
        )[: alloc[s]]
        assert int(r.n_sampled) == len(chosen)
        assert r.sample_mean == round(
            sum(x for _, x in chosen) * 10 / len(chosen), 6)
    # Neyman property: allocation share tracks N_h * S_h share
    tot_alloc = int(out.alloc_h.sum())
    assert abs(tot_alloc - 1000) <= len(strata)  # rounding slack
