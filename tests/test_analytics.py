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
