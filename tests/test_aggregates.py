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
