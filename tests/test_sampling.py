"""Sampling/split operator invariants (rows-only ops need property
tests; the hash split is SQL-oracled in test_oracle_all)."""

from __future__ import annotations

from ezbake_graph_spark import registry, tables
from tests.conftest import SF_SMOKE


def test_split_is_deterministic_and_partitioning(spark):
    qs = registry.queries()
    a = qs["sample_split_train_test"](spark, SF_SMOKE).collect()
    b = qs["sample_split_train_test"](spark, SF_SMOKE).collect()
    assert a == b  # pure function of the key
    n = tables.load(spark, SF_SMOKE, "documents").count()
    assert len(a) == n  # every doc assigned exactly once
    train = sum(1 for r in a if r["split"] == "train")
    assert 0.7 < train / n < 0.9  # ~79.7% expected


def test_bernoulli_sample_size_and_determinism(spark):
    qs = registry.queries()
    n_total = tables.load(spark, SF_SMOKE, "lineitem").count()
    s1 = qs["sample_bernoulli"](spark, SF_SMOKE).collect()
    s2 = qs["sample_bernoulli"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # same seed, same rows
    assert 0.05 * n_total < len(s1) < 0.15 * n_total


def test_stratified_sample_respects_fractions(spark):
    from collections import Counter

    qs = registry.queries()
    base = Counter(
        r["lang"] for r in tables.load(spark, SF_SMOKE, "documents").select("lang").collect()
    )
    got = Counter(r["lang"] for r in qs["sample_stratified"](spark, SF_SMOKE).collect())
    from ezbake_graph_spark.operators.sampling import _STRATA_FRACTIONS

    for lang, frac in _STRATA_FRACTIONS.items():
        if base[lang] >= 40:  # enough mass for a loose concentration bound
            ratio = got[lang] / base[lang]
            assert abs(ratio - frac) < 0.15, (lang, ratio, frac)


def test_temperature_mix_keeps_all_of_smallest_lang_and_flattens(spark):
    """rate(lang) = sqrt(min/n): the smallest language is kept whole
    (h^2 < 2^32 always), larger ones are downsampled toward it."""
    from collections import Counter

    qs = registry.queries()
    base = Counter(
        r["lang"]
        for r in tables.load(spark, SF_SMOKE, "documents").select("lang").collect()
    )
    kept = Counter(r["lang"] for r in qs["sample_temperature_mix"](spark, SF_SMOKE).collect())
    min_lang = min(base, key=lambda k: (base[k], k))
    assert kept[min_lang] == base[min_lang]
    # flattening: the max/min imbalance must not grow
    assert max(kept.values()) / min(kept.values()) <= max(base.values()) / min(
        base.values()
    ) + 1e-9
    # subset property
    for lang in kept:
        assert kept[lang] <= base[lang]


def test_negative_sampling_is_stable_and_excludes_anchor(spark):
    qs = registry.queries()
    rows1 = qs["sample_negatives_hash"](spark, SF_SMOKE).collect()
    rows2 = qs["sample_negatives_hash"](spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    per_anchor = {}
    for r in rows1:
        assert r["neg_id"] != r["anchor_id"]
        per_anchor.setdefault(r["anchor_id"], set()).add(r["neg_id"])
    assert all(len(v) == 5 for v in per_anchor.values())


def test_leakage_safe_split_invariants(spark):
    """Every near-dup cluster lands wholly in ONE split (the property
    the operator exists for); naive_leaks is exactly the per-cluster
    naive-split disagreement; singletons get split == naive_split."""
    from collections import defaultdict

    qs = registry.queries()
    rows = qs["sample_split_leakage_safe"](spark, SF_SMOKE).collect()
    by_c = defaultdict(list)
    for r in rows:
        by_c[r["canonical_doc_id"]].append(r)
    for members in by_c.values():
        assert len({m["split"] for m in members}) == 1, "split straddles cluster"
        leak = len({m["naive_split"] for m in members}) > 1
        for m in members:
            assert m["naive_leaks"] == leak
            assert m["cluster_size"] == len(members)
            if len(members) == 1:
                assert m["split"] == m["naive_split"]
    # the split of a cluster equals the hash split of its canonical:
    # cross-check against the plain per-doc split key on canonical ids
    plain = {
        r["doc_id"]: r["split"]
        for r in qs["sample_split_train_test"](spark, SF_SMOKE).collect()
    }
    for r in rows:
        assert r["split"] == plain[r["canonical_doc_id"]]


def test_dsir_importance_brute_force_twin(spark):
    """filter_dsir_importance equals a from-scratch python
    recomputation of the smoothed unigram log-likelihood-ratio weights
    (micro-int quantized per term, exact integer per-doc sum), and the
    selected set is enriched for the target language vs the corpus
    base rate."""
    import collections
    import math

    import duckdb

    got = {
        r["doc_id"]: (r["n_tokens"], r["w_micro"], r["selected"])
        for r in registry.queries()["filter_dsir_importance"](
            spark, SF_SMOKE
        ).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    cnt_all: collections.Counter = collections.Counter()
    cnt_tgt: collections.Counter = collections.Counter()
    for _, lang, text in docs:
        toks = text.split(" ")
        cnt_all.update(toks)
        if lang == "en":
            cnt_tgt.update(toks)
    llr = {
        t: round(
            (math.log(cnt_tgt.get(t, 0) + 1) - math.log(cnt_all[t] + 1)) * 1e6
        )
        for t in cnt_all
    }
    v = len(cnt_all)
    c_micro = round(
        (
            math.log(sum(cnt_tgt.values()) + v)
            - math.log(sum(cnt_all.values()) + v)
        )
        * 1e6
    )
    n_en_sel = n_sel = 0
    for doc_id, lang, text in docs:
        toks = text.split(" ")
        w = sum(llr[t] for t in toks) - len(toks) * c_micro
        assert got[doc_id] == (len(toks), w, w > 0), f"doc {doc_id}"
        if w > 0:
            n_sel += 1
            n_en_sel += lang == "en"
    base = sum(1 for _, lang, _ in docs if lang == "en") / len(docs)
    assert n_sel > 0
    assert n_en_sel / n_sel > base, "selection must enrich the target lang"
