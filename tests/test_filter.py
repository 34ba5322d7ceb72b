"""Content-filter tier (operators/llm_filter.py + the api entries):
registry cross-checks plus the edge cases the DuckDB oracle sweep
cannot reach (single-token docs, user-supplied patterns, strata caps).
Oracle parity itself is covered by tools/verify_local.py and
tests/test_oracle_all.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from ezbake_graph_spark import api, registry, tables
from tests.conftest import SF_SMOKE


def _registry(spark, key):
    return registry.queries()[key](spark, SF_SMOKE)


def test_repetition_stats_matches_registry_kernel(spark):
    got = {tuple(r) for r in api.repetition_stats(
        tables.load(spark, SF_SMOKE, "documents")).collect()}
    want = {tuple(r) for r in _registry(spark, "filter_repetition").collect()}
    assert got == want and got


def test_repetition_single_token_doc_yields_null_bigram_fraction(spark):
    d = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    r = api.repetition_stats(d).collect()[0]
    assert r["n_tokens"] == 1
    assert r["top_bigram_fraction"] is None  # no bigrams, no ANSI error
    assert r["top_unigram_fraction"] == 1.0
    assert bool(r["is_repetitive"]) is True  # single repeated unigram = 100%


def test_curate_flag_kernel_matches_metrics(spark):
    """The map-side unigram-only flag kernel the curate composites use
    (round-11 fix for the round-10 composite regression) must agree
    with the hash-agg metric kernel's ``is_repetitive`` on every
    fixture document AND the NULL/single-token edges, at both the
    default and the curate-composite thresholds."""
    from ezbake_graph_spark.operators.llm_filter import (
        repetition_flag,
        repetition_metrics,
    )

    d = tables.load(spark, SF_SMOKE, "documents")
    edge = spark.createDataFrame(
        [(9001, "word"), (9002, None), (9003, "a a a a b")],
        "doc_id long, text string",
    )
    both = d.select("doc_id", "text").unionByName(edge)
    for kw in ({}, {"max_top_unigram": 0.1}):
        got = {(r["doc_id"], r["is_repetitive"])
               for r in repetition_flag(both, **kw).collect()}
        want = {(r["doc_id"], r["is_repetitive"])
                for r in repetition_metrics(both, **kw)
                .select("doc_id", "is_repetitive").collect()}
        assert got == want and got
    # and it is genuinely map-side: zero exchanges
    plan = (repetition_flag(d)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.split("InMemoryRelation")[0].count("Exchange") == 0


def test_gopher_quality_matches_registry_kernel(spark):
    got = {tuple(r) for r in api.gopher_quality(
        tables.load(spark, SF_SMOKE, "documents")).collect()}
    want = {tuple(r) for r in _registry(spark, "filter_gopher_rules").collect()}
    assert got == want and got
    # the gate must actually discriminate on the fixture
    flags = {r[-1] for r in got}
    assert flags == {True, False}


def test_pii_scan_and_redact_roundtrip(spark):
    d = spark.createDataFrame(
        [
            (1, "reach me at a.user+tag@sub.example.co.uk today"),
            (2, "call 555-0147 or 555-9999"),
            (3, "neither one"),
        ],
        "doc_id long, text string",
    )
    scan = {r["doc_id"]: (r["n_email"], r["n_phone"]) for r in
            api.pii_scan(d).collect()}
    assert scan == {1: (1, 0), 2: (0, 2), 3: (0, 0)}
    red = {r["doc_id"]: (r["redacted"], r["n_redacted"]) for r in
           api.pii_redact(d).collect()}
    assert red[1][0] == "reach me at [EMAIL] today"
    assert red[2] == ("call [PHONE] or [PHONE]", 2)
    assert red[3] == ("neither one", 0)
    # redacted text scans clean — the property a compliance pass needs
    clean = api.pii_scan(
        api.pii_redact(d).select("doc_id", F.col("redacted").alias("text"))
    )
    assert all(not r["has_pii"] for r in clean.collect())


def test_pii_scan_custom_patterns(spark):
    d = spark.createDataFrame(
        [(1, "key sk-abc123 leaked"), (2, "nothing")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_api_key"] for r in api.pii_scan(
        d, patterns={"api_key": "sk-[a-z0-9]+"}).collect()}
    assert out == {1: 1, 2: 0}


def test_seq_len_histogram_matches_registry_kernel(spark):
    got = [tuple(r) for r in api.seq_len_histogram(
        tables.load(spark, SF_SMOKE, "documents")).collect()]
    want = [tuple(r) for r in _registry(spark, "text_seq_len_hist").collect()]
    assert got == want and got
    # buckets cover every doc exactly once
    assert sum(r[1] for r in got) == tables.load(
        spark, SF_SMOKE, "documents").count()


def test_epoch_mix_matches_registry_kernel(spark):
    got = {tuple(r) for r in api.epoch_mix(
        tables.load(spark, SF_SMOKE, "documents"), "lang", "doc_id").collect()}
    want = {tuple(r) for r in _registry(spark, "sample_epoch_mix").collect()}
    assert got == want and got


def test_epoch_mix_cap_and_epoch_counts(spark):
    # 20 'en' vs 2 'de': uncapped reps would be 10; cap must bind at 3
    d = spark.createDataFrame(
        [(i, "en" if i < 20 else "de") for i in range(22)],
        "doc_id long, lang string",
    )
    out = api.epoch_mix(d, "lang", "doc_id", max_epochs=3)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 20, "de": 6}
    epochs = {r["epoch"] for r in out.filter(F.col("lang") == "de").collect()}
    assert epochs == {1, 2, 3}


def test_parse_urls_matches_registry_kernel(spark):
    got = {tuple(r) for r in _registry(spark, "url_parse_parts").collect()}
    from ezbake_graph_spark.operators.llm_url import _fabricated_urls

    want = {tuple(r) for r in api.parse_urls(
        _fabricated_urls(tables.load(spark, SF_SMOKE, "documents"))).collect()}
    assert got == want and got


def test_canonicalize_collapses_recrawl_variants(spark):
    d = spark.createDataFrame(
        [
            (1, "https://WWW.Site.COM/page/?utm_source=x"),
            (2, "https://www.site.com/page#frag"),
            (3, "http://www.site.com/page"),  # scheme differs: distinct
        ],
        "id long, url string",
    )
    out = api.canonicalize_urls(d)
    groups = out.groupBy("canonical_url").count().collect()
    assert {(r["canonical_url"], r["count"]) for r in groups} == {
        ("https://www.site.com/page", 2),
        ("http://www.site.com/page", 1),
    }


def test_blocklist_filter_is_broadcast_anti_join(spark):
    d = spark.createDataFrame(
        [(1, "http://x.bad.site/a"), (2, "http://ok.site/b")],
        "id long, url string",
    )
    bl = spark.createDataFrame([("bad.site",)], "domain string")
    out = api.filter_blocked_domains(d, bl)
    assert [r["id"] for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_curate_corpus_end_to_end_provenance(spark):
    rows = [
        # near-dup pair, both pass gates: only min id kept
        (1, "the quick brown fox jumps over the lazy dog today ok"),
        (2, "the quick brown fox jumps over the lazy dog today ok"),
        # repetitive: gated out before dedup
        (3, "spam spam spam spam spam spam spam spam spam spam"),
        # unique survivor with PII: kept, text redacted
        (4, "a clean document about the sea mail me jo@example.com"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in api.curate_corpus(
        d,
        quality_thresholds={"min_tokens": 5},
        repetition_thresholds={"max_top_unigram": 0.5},
    ).collect()}
    assert [out[i]["keep"] for i in (1, 2, 3, 4)] == [True, False, False, True]
    # provenance: gated-out doc has NULL dedup columns, flags preserved
    assert out[3]["is_repetitive"] and out[3]["canonical_doc_id"] is None
    # dup doc: mapped to canonical 1, not kept
    assert out[2]["canonical_doc_id"] == 1 and out[2]["cluster_size"] == 2
    # PII redacted in the survivor's clean_text
    assert "[EMAIL]" in out[4]["clean_text"] and out[4]["n_redacted"] == 1
    assert "jo@example.com" not in out[4]["clean_text"]


def test_curate_corpus_no_survivors(spark):
    d = spark.createDataFrame(
        [(1, "tiny"), (2, "also tiny")], "doc_id long, text string"
    )
    out = api.curate_corpus(d)  # default min_tokens=50 gates everything
    rows = out.collect()
    assert len(rows) == 2 and all(not r["keep"] for r in rows)


def test_gopher_empty_text_fails_gate_without_error(spark):
    d = spark.createDataFrame(
        [(1, ""), (2, "the well formed document here now ok fine yes sir")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in api.gopher_quality(
        d, min_tokens=5).collect()}
    assert out[1]["symbol_fraction"] is None  # 0/0 -> NULL, no ANSI error
    assert bool(out[1]["passes_gopher"]) is False
    assert bool(out[2]["passes_gopher"]) is True


def test_epoch_mix_null_stratum_rows_survive(spark):
    d = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en"), (4, None)],
        "doc_id long, lang string",
    )
    out = api.epoch_mix(d, "lang", "doc_id")
    rows = out.collect()
    # NULL stratum kept as its own group: 3 epochs (ceil(3/1)=3 < cap)
    null_epochs = sorted(r["epoch"] for r in rows if r["lang"] is None)
    assert null_epochs == [1, 2, 3]
    assert sorted(r["epoch"] for r in rows if r["lang"] == "en") == [1, 1, 1]


def test_seq_len_histogram_rejects_nonpositive_bucket(spark):
    import pytest as _pytest

    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        api.seq_len_histogram(d, bucket=0)


def test_filter_tier_is_map_side_no_exchange(spark):
    """The tier's scale claim, pinned: per-document filters compile to
    plans with ZERO Exchange operators (pure map-side projections that
    fuse into the scan). The histogram is allowed exactly its one
    aggregation exchange. Round 10: ``repetition_stats`` moved OFF the
    map-side contract by design — its gram counting is now explode +
    two keyed hash aggs (the interpreted-HOF fold saturated CPU;
    SCALE.md §22) — so it is pinned to exactly its TWO aggregation
    exchanges instead."""
    d = tables.load(spark, SF_SMOKE, "documents")
    from ezbake_graph_spark.operators import llm_filter, llm_url

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the fixture loader's cached InMemoryRelation contains its own
        # repartition exchange; the operator's plan is everything above
        return plan.split("InMemoryRelation")[0].count("Exchange")

    assert n_exchanges(api.repetition_stats(d)) == 2
    assert n_exchanges(api.gopher_quality(d)) == 0
    assert n_exchanges(api.pii_scan(llm_filter._fabricated_pii(d),
                                    "doc_id", "pii_text")) == 0
    assert n_exchanges(api.pii_redact(llm_filter._fabricated_pii(d),
                                      "doc_id", "pii_text")) == 0
    assert n_exchanges(api.parse_urls(llm_url._fabricated_urls(d))) == 0
    assert n_exchanges(api.canonicalize_urls(llm_url._fabricated_urls(d))) == 0


def test_filter_api_rejects_degenerate_parameters(spark):
    import pytest as _pytest

    d = spark.createDataFrame([(1, "a b", "en")],
                              "doc_id long, text string, lang string")
    with _pytest.raises(ValueError):
        api.epoch_mix(d, "lang", "doc_id", max_epochs=0)  # sequence(1,0) trap
    with _pytest.raises(ValueError):
        api.pii_scan(d, patterns={})
    with _pytest.raises(ValueError):
        api.pii_redact(d, replacements={})


def test_prepare_training_data_shards_and_manifest(spark):
    # alphabetic 6-char words, unique per doc (no near-dups), plus
    # stopwords — passes the Gopher gate by construction
    rows = [
        (
            i,
            " ".join(f"{chr(97 + i)}{chr(97 + j)}word" for j in range(12))
            + " the a",
        )
        for i in range(8)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = api.prepare_training_data(
        d, context=64, bins_per_shard=2,
        quality_thresholds={"min_tokens": 5},
        repetition_thresholds={"max_top_unigram": 0.9},
    )
    rows_out = out.collect()
    assert rows_out  # survivors exist
    # shard_id = bin_id // bins_per_shard everywhere
    assert all(r["shard_id"] == r["bin_id"] // 2 for r in rows_out)
    # manifest is one groupBy away and accounts for every packed token
    manifest = out.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    ).collect()
    assert sum(m["n_docs"] for m in manifest) == len(rows_out)
    with __import__("pytest").raises(ValueError):
        api.prepare_training_data(d, bins_per_shard=0)


def test_check_constraints_all_rule_types(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O"), (1, 11, "O"), (2, None, "X"), (3, 99, "F")],
        "ok long, ck long, st string",
    )
    cust = spark.createDataFrame([(10,), (11,)], "ck_ref long")
    out = {r["rule"]: r["violations"] for r in api.check_constraints(
        orders,
        [
            {"rule": "not_null", "column": "ck"},
            {"rule": "unique", "columns": ["ok"]},
            {"rule": "in_set", "column": "st", "allowed": ["O", "F"]},
            {"rule": "range", "column": "ok", "min": 1, "max": 2},
            {"rule": "fk", "columns": ["ck"], "ref": cust,
             "ref_columns": ["ck_ref"]},
            {"rule": "regex", "column": "st", "pattern": "[OF]"},
            {"rule": "dtype", "column": "st", "type": "bigint"},
        ],
    ).collect()}
    assert out == {
        "not_null(ck)": 1,      # the NULL ck
        "unique(ok)": 1,        # ok=1 twice -> one extra row
        "in_set(st)": 1,        # 'X'
        "range(ok)": 1,         # ok=3
        "fk(ck)": 1,            # ck=99 has no ref (NULL ck not counted)
        "regex(st)": 1,         # 'X' doesn't full-match [OF]
        "dtype(st)": 4,         # no status string casts to bigint
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        api.check_constraints(orders, [{"rule": "nope"}])


def test_dq_registry_keys_match_api_kernels(spark):
    got = {r["rule"]: r["violations"]
           for r in _registry(spark, "dq_constraint_audit").collect()}
    assert len(got) == 7
    # fixture is clean under the structural rules ...
    for rule in ("not_null(o_custkey)", "in_set(o_orderstatus)",
                 "range(o_orderkey)", "unique(o_orderkey)", "fk(o_custkey)"):
        assert got[rule] == 0
    # ... while the round-7 rules are tuned to have real violations:
    # priorities 4-NOT SPECIFIED / 5-LOW fall outside [1-3]-..., and a
    # one-letter status is never bigint-castable.
    assert got["regex(o_orderpriority)"] > 0
    assert got["dtype(o_orderstatus)"] > 0
    prof = {tuple(r) for r in _registry(spark, "dq_profile_columns").collect()}
    assert {c for c, *_ in prof} == {"o_orderkey", "o_custkey", "o_orderstatus"}


def test_profile_nested_columns_serialize_to_json(spark):
    d = spark.createDataFrame(
        [(1, [1, 2], {"k": 1}), (2, [1], None), (3, [1, 2], {"k": 2})],
        "id long, a array<int>, m map<string,int>",
    )
    out = {r["col_name"]: tuple(r)[1:]
           for r in api.profile(d, ["a", "m"]).collect()}
    assert out["a"] == (0, 2, "[1,2]", "[1]")   # lexicographic on JSON
    assert out["m"] == (1, 2, '{"k":1}', '{"k":2}')


def test_check_constraints_rejects_empty_rules(spark):
    import pytest as _pytest

    d = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        api.check_constraints(d, [])


def test_within_radius_matches_bruteforce(spark):
    import itertools
    import math

    rows = [(i, 5.0 + (i * 13 % 40) / 100.0, 5.0 + (i * 29 % 60) / 100.0)
            for i in range(30)]
    p = spark.createDataFrame(rows, "point_id long, lat double, lon double")
    got = {(r["id1"], r["id2"]) for r in
           api.within_radius(p, radius_km=40.0).collect()}

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
        x = (math.sin(dla) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dlo) ** 2)
        return round(2 * 6371.0 * math.asin(math.sqrt(x)), 3)

    want = {(a[0], b[0]) for a, b in itertools.combinations(rows, 2)
            if hav(a, b) <= 40.0}
    assert got == want and got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        api.within_radius(p, radius_km=120.0, cell_deg=1.0)  # > 1 lat cell


def test_geo_registry_keys(spark):
    import itertools
    import math

    from ezbake_graph_spark.operators.geo import _fabricated_points

    cust = tables.load(spark, SF_SMOKE, "customer")
    pts = [(r["point_id"], r["lat"], r["lon"])
           for r in _fabricated_points(cust).collect()]

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
        x = (math.sin(dla) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dlo) ** 2)
        return round(2 * 6371.0 * math.asin(math.sqrt(x)), 3)

    want = {(min(a[0], b[0]), max(a[0], b[0]))
            for a, b in itertools.combinations(pts, 2) if hav(a, b) <= 40.0}
    got = {(r["id1"], r["id2"])
           for r in _registry(spark, "geo_radius_pairs").collect()}
    assert got == want  # may be empty at the smoke SF; sf0.01 has 3400+
    cells = _registry(spark, "geo_cell_agg")
    assert cells.agg(F.sum("n_points")).collect()[0][0] == len(pts)


def test_within_radius_high_latitude_adaptive_fanout(spark):
    """At lat 75 a degree of longitude is ~28.7 km: two points 1.2 lon
    deg apart (~34 km) are inside a 40 km radius but 1-2 lon CELLS
    apart — a fixed 3x3 ring misses them; the per-latitude fan-out
    must find them."""
    p = spark.createDataFrame(
        [(1, 75.0, 10.05), (2, 75.0, 11.25), (3, 75.0, 19.0)],
        "point_id long, lat double, lon double",
    )
    got = {(r["id1"], r["id2"]) for r in
           api.within_radius(p, radius_km=40.0, cell_deg=1.0).collect()}
    assert got == {(1, 2)}


def test_constraint_and_geo_argument_validation(spark):
    import pytest as _pytest

    d = spark.createDataFrame([(1, "x")], "id long, v string")
    ref = spark.createDataFrame([(1, 2)], "a long, b long")
    for bad in (
        [{"rule": "in_set", "column": "v", "allowed": []}],
        [{"rule": "unique", "columns": []}],
        [{"rule": "fk", "columns": ["id", "v"], "ref": ref,
          "ref_columns": ["a"]}],  # length mismatch: silent zip trap
    ):
        with _pytest.raises(ValueError):
            api.check_constraints(d, bad)
    p = spark.createDataFrame([(1, 0.0, 0.0)],
                              "point_id long, lat double, lon double")
    with _pytest.raises(ValueError):
        api.within_radius(p, cell_deg=0.0)
