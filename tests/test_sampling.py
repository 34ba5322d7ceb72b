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
