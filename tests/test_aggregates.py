from __future__ import annotations

import pytest

from tests.conftest import assert_query_matches_oracle

AGG_KEYS = [
    "agg_pricing_q1",
    "agg_count_distinct",
    "agg_rollup",
    "agg_filtered",
    "agg_collect",
    "agg_percentile",
    "agg_moments",
    "agg_distinct_rows",
]


@pytest.mark.parametrize("key", AGG_KEYS)
def test_agg_matches_oracle(spark, duck, key):
    assert_query_matches_oracle(spark, duck, key)


def test_approx_distinct_close_to_exact(spark):
    from ezbake_graph_spark import registry

    qs = registry.queries()
    sf = "/root/testdata/sf0.001"
    approx = {r["event_type"]: r["approx_users"] for r in qs["agg_approx_distinct"](spark, sf).collect()}
    exact = {r["event_type"]: r["n_users"] for r in qs["agg_count_distinct"](spark, sf).collect()}
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.1 * n)


def test_approx_percentile_close_to_exact(spark):
    from ezbake_graph_spark import registry, tables
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
        for r in registry.queries()["agg_approx_percentile"](spark, sf).collect()
    }
    li = tables.load(spark, sf, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("p50"),
            F.percentile("l_extendedprice", 0.95).alias("p95"),
        )
        .collect()
    }
    for flag, (p50e, p95e) in exact.items():
        p50a, p95a = approx[flag]
        assert abs(p50a - p50e) / p50e < 0.05
        assert abs(p95a - p95e) / p95e < 0.05


def test_zscore_outliers_semantics(spark):
    """Every flagged event is >2 population stddevs from its type mean
    (checked against float moments computed independently), and the
    flagged set is a small minority of events."""
    import math
    from collections import defaultdict

    from ezbake_graph_spark import registry, tables

    sf = "/root/testdata/sf0.001"
    rows = registry.queries()["events_zscore_outliers"](spark, sf).collect()
    ev = tables.load(spark, sf, "events").select("event_type", "value").collect()
    by_type = defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append(r["value"])
    moments = {}
    for t, vs in by_type.items():
        mu = sum(vs) / len(vs)
        sd = math.sqrt(sum((v - mu) ** 2 for v in vs) / len(vs))
        moments[t] = (mu, sd)
    assert 0 < len(rows) < 0.05 * len(ev)
    for r in rows:
        mu, sd = moments[r["event_type"]]
        assert abs(r["value"] - mu) > 2 * sd * (1 - 1e-9)
        assert abs(r["zscore"]) > 2


def test_intersect_all_bag_semantics(spark):
    """intersectAll multiplicity == min(left count, right count) per key."""
    from collections import Counter

    from ezbake_graph_spark import registry, tables
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    o = tables.load(spark, sf, "orders")
    left = Counter(
        r["o_custkey"] for r in o.filter(F.col("o_orderstatus") == "O").collect()
    )
    right = Counter(
        r["o_custkey"] for r in o.filter(F.col("o_orderstatus") == "F").collect()
    )
    got = Counter(
        r["custkey"]
        for r in registry.queries()["set_intersect_all"](spark, sf).collect()
    )
    want = Counter(
        {k: min(c, right[k]) for k, c in left.items() if k in right}
    )
    assert got == want


def test_sketch_merge_tracks_exact_distinct(spark):
    """The union-merged HLL estimate must track the exact distinct
    count within HLL's error envelope (lgConfigK=12 → ~1.6% σ; allow
    5%)."""
    from ezbake_graph_spark import registry, tables
    from tests.conftest import SF_SMOKE

    row = registry.queries()["agg_sketch_merge"](spark, SF_SMOKE).collect()[0]
    exact = (
        tables.load(spark, SF_SMOKE, "orders")
        .select("o_custkey").distinct().count()
    )
    assert abs(row["est_distinct_customers"] - exact) <= max(2, 0.05 * exact)
    assert row["n_orders"] == tables.load(spark, SF_SMOKE, "orders").count()


def test_psi_terms_are_nonnegative_and_symmetric(spark):
    """Every PSI contribution is >= 0 ((p-q) and ln(p/q) always share
    sign), swapping ref and cur leaves each bin's term unchanged
    (the formula is symmetric), and counts reconcile with the inputs."""
    from ezbake_graph_spark.operators.quality import psi_drift
    from tests.conftest import SF_SMOKE
    from ezbake_graph_spark.tables import load
    from pyspark.sql import functions as F

    o = load(spark, SF_SMOKE, "orders")
    ref = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    cur = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    fwd = psi_drift(ref, cur, "o_totalprice", 20000.0).collect()
    assert fwd and all(r["psi_term"] >= 0.0 for r in fwd)
    assert sum(r["ref_count"] for r in fwd) == ref.count()
    assert sum(r["cur_count"] for r in fwd) == cur.count()
    rev = {r["bin"]: r for r in psi_drift(cur, ref, "o_totalprice", 20000.0).collect()}
    for r in fwd:
        assert rev[r["bin"]]["psi_term"] == r["psi_term"]
        assert rev[r["bin"]]["ref_count"] == r["cur_count"]


def test_quantile_bins_partition_the_table(spark):
    """Decile sizes differ by at most 1, cover the full table, and bin
    edges are non-overlapping and ordered."""
    from ezbake_graph_spark.operators.aggregates import agg_quantile_bins
    from tests.conftest import SF_SMOKE
    from ezbake_graph_spark.tables import load

    rows = agg_quantile_bins(spark, SF_SMOKE).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == load(spark, SF_SMOKE, "orders").count()
    for a, b in zip(rows, rows[1:]):
        assert a["lo"] <= a["hi"] <= b["lo"] <= b["hi"]


def test_snapshot_diff_statuses_partition_the_key_union(spark):
    """snapshot_diff assigns every key in old ∪ new exactly one status;
    added/removed counts reconcile with the set differences, swapping
    the snapshots swaps added<->removed and preserves changed, and
    carried attributes coalesce new-side-first."""
    from ezbake_graph_spark.operators.quality import snapshot_diff

    old = spark.createDataFrame(
        [(1, "h1", "a"), (2, "h2", "a"), (3, "h3", "b")],
        "k long, content_hash string, src string",
    )
    new = spark.createDataFrame(
        [(2, "h2", "a2"), (3, "hX", "b2"), (4, "h4", "c")],
        "k long, content_hash string, src string",
    )
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], carry_cols=["src"]).collect()
    }
    assert {k: r["status"] for k, r in rows.items()} == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "added",
    }
    # new-side-first attribute coalesce: changed/unchanged read new attrs,
    # removed falls back to old.
    assert rows[3]["src"] == "b2" and rows[1]["src"] == "a" and rows[4]["src"] == "c"
    rev = {
        r["k"]: r["status"]
        for r in snapshot_diff(new, old, ["k"], carry_cols=["src"]).collect()
    }
    assert rev == {1: "added", 2: "unchanged", 3: "changed", 4: "removed"}


def test_pit_join_is_leakage_free_and_single_shuffle(spark):
    """The point-in-time kernel: (a) picks the latest at-or-before
    value per feature (inclusive of same-instant updates), never a
    future one; (b) NULLs when no feature row precedes the obs;
    (c) N feature tables cost ONE shuffle — the union+window plan has
    exactly one exchange regardless of feature count."""
    from ezbake_graph_spark.operators.joins import pit_join

    f1 = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 15, 150.0)],
        "k long, ts long, a double",
    )
    f2 = spark.createDataFrame(
        [(1, 5, 7), (1, 20, 9)], "k long, ts long, b long"
    )
    obs = spark.createDataFrame(
        [(1, 12, "x"), (1, 20, "y"), (1, 25, "z"), (2, 14, "w"), (3, 9, "v")],
        "k long, ts long, tag string",
    )
    out = pit_join(obs, [("a", f1, "a"), ("b", f2, "b")], "k", "ts")
    rows = {(r["k"], r["ts"]): r for r in out.collect()}
    assert len(rows) == 5
    # ts=12: a from ts10 only (not the future ts20), b from ts5
    assert rows[(1, 12)]["f_a"] == 100.0 and rows[(1, 12)]["f_a_ts"] == 10
    assert rows[(1, 12)]["f_b"] == 7
    # same-instant feature update is visible (inclusive as-of)
    assert rows[(1, 20)]["f_a"] == 200.0 and rows[(1, 20)]["f_b"] == 9
    assert rows[(1, 25)]["f_a"] == 200.0 and rows[(1, 25)]["f_a_ts"] == 20
    # no preceding feature rows -> NULLs; obs payload carried through
    assert rows[(2, 14)]["f_b"] is None and rows[(2, 14)]["f_a"] is None
    assert rows[(3, 9)]["f_a"] is None and rows[(3, 9)]["tag"] == "v"
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE appends a duplicate
    import re
    n_exchanges = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    assert n_exchanges == 1, plan


def test_hll_registers_golden_and_mergeable(spark):
    """agg_hll_registers: registers match a from-scratch python HLL on
    the same md5 hashing, the estimate lands within the m=64 error
    envelope, and registers MERGE by max (the sketch property that
    justifies it at scale)."""
    import hashlib
    import math
    from collections import defaultdict

    import duckdb

    from ezbake_graph_spark import registry
    from tests.conftest import SF_SMOKE

    out = {
        r["event_type"]: r
        for r in registry.queries()["agg_hll_registers"](
            spark, SF_SMOKE
        ).collect()
    }
    raw = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM "
        f"'{SF_SMOKE}/events.parquet'"
    ).fetchall()

    def hash60(uid):
        return int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16)

    regs = defaultdict(dict)  # type -> bucket -> max rho
    exact = defaultdict(set)
    halves = (defaultdict(dict), defaultdict(dict))
    for et, uid in raw:
        u = hash60(uid)
        b, w = u % 64, u // 64
        rho = 55 - w.bit_length() if w else 55
        regs[et][b] = max(regs[et].get(b, 0), rho)
        h = halves[int(uid) % 2]
        h[et][b] = max(h[et].get(b, 0), rho)
        exact[et].add(uid)
    for et, r in regs.items():
        denom = (64 - len(r)) * 2**55 + sum(2 ** (55 - v) for v in r.values())
        assert out[et]["denom_int"] == denom
        assert out[et]["n_buckets_used"] == len(r)
        assert out[et]["n_exact"] == len(exact[et])
        est_raw = 0.709 * 64 * 64 * 2.0**55 / denom
        v = 64 - len(r)
        est = 64 * math.log(64 / v) if (v > 0 and est_raw < 160) else est_raw
        assert out[et]["hll_estimate"] == round(est, 6)
        # m=64 -> standard error 1.04/8 = 13%; allow 4 sigma
        assert abs(est - len(exact[et])) / len(exact[et]) < 0.52
        # mergeability: max-merge of the two half-sketches == full
        merged = dict(halves[0][et])
        for b, v2 in halves[1][et].items():
            merged[b] = max(merged.get(b, 0), v2)
        assert merged == r


def test_hll_bucket_split_exact_integral_division(spark):
    """ADVICE r8: the register payload split must be exact integral
    `u div 64`, never double division — at the 60-bit md5-prefix
    magnitude a double loses low bits and can flip the leading-zero
    rank at a 2^j boundary. u = 2^59 - 1 demonstrates the hazard:
    float(u)/64 rounds UP across the 2^53 rank boundary."""
    from pyspark.sql import functions as F

    u = (1 << 59) - 1
    row = (
        spark.range(1)
        .select(
            F.expr(f"CAST({u} AS BIGINT) div 64").alias("w_div"),
            (F.lit(u) / F.lit(64)).cast("long").alias("w_float"),
        )
        .collect()[0]
    )
    assert row.w_div == u // 64  # the fixed path: exact
    assert row.w_float != u // 64  # the pre-fix path: provably wrong
