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
