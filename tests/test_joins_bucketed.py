"""The bucketed co-located join must actually elide the shuffle —
asserted on the executed physical plan, not just on results."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, assert_query_matches_oracle


def test_bucketed_join_has_no_exchange(spark):
    from ezbake_graph_spark.operators.joins import bucketed_join_frames

    j = bucketed_join_frames(spark, SF_SMOKE)
    j.collect()  # finalize the (adaptive) plan
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "join_bucketed_colocated")
