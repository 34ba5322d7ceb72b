"""Live Structured Streaming smoke ops (SURVEY.md §2A5/A6, I4/I5/I7).

Each live op replays the events table through a real readStream file
source with trigger(availableNow) and a memory/foreachBatch sink; the
assertions pin stream results to their batch-query equivalents —
stream/batch parity is the Structured Streaming contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ezbake_graph_spark import registry, tables
from tests.conftest import SF_SMOKE


def _batch_counts_by_type(spark):
    ev = tables.load(spark, SF_SMOKE, "events")
    return {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_stream_source_matches_batch_counts(spark):
    rows = registry.queries()["stream_source_smoke"](spark, SF_SMOKE).collect()
    assert {r["event_type"]: r["n_events"] for r in rows} == _batch_counts_by_type(spark)


def test_stream_sink_roundtrip(spark):
    ev = tables.load(spark, SF_SMOKE, "events").filter(F.col("event_type") == "purchase")
    expected = ev.count()
    [row] = registry.queries()["stream_sink_smoke"](spark, SF_SMOKE).collect()
    assert row["n_purchases"] == expected
    assert 0 < row["n_users"] <= expected


def test_stream_watermark_totals(spark):
    rows = registry.queries()["stream_watermark"](spark, SF_SMOKE).collect()
    total = sum(r["n_events"] for r in rows)
    # availableNow replay = single batch; nothing is later than the
    # watermark, so no events drop
    assert total == tables.load(spark, SF_SMOKE, "events").count()


def test_stream_dedup_emits_each_event_once(spark):
    """Source holds every event twice; dedup must emit each once."""
    rows = registry.queries()["stream_dedup"](spark, SF_SMOKE).collect()
    batch = _batch_counts_by_type(spark)
    for r in rows:
        assert r["n_events"] == r["n_distinct"] == batch[r["event_type"]]


def test_stream_stateful_final_state_matches_batch(spark):
    rows = registry.queries()["stream_stateful"](spark, SF_SMOKE).collect()
    ev = tables.load(spark, SF_SMOKE, "events")
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000).alias("s"),
        )
        .collect()
    }
    assert len(rows) == len(batch)
    for r in rows:
        n, s = batch[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["total_value"] - s) < 1e-6


def test_stream_stream_join_matches_batch_interval_join(spark):
    rows = registry.queries()["stream_stream_join"](spark, SF_SMOKE).collect()
    ev = tables.load(spark, SF_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    batch = {
        r["p_user"]: r["n"]
        for r in purchases.join(
            clicks,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("interval 1 hour")),
        )
        .groupBy("p_user")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r["p_user"]: r["n_pairs"] for r in rows} == batch


def test_incremental_mv_matches_batch(spark):
    from ezbake_graph_spark import registry, tables
    from ezbake_graph_spark.determinism import money_sum_expr
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in registry.queries()["stream_incremental_mv"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = tables.load(spark, SF_SMOKE, "events")
    want = {
        r["event_type"]: (r["n_events"], r["sum_value"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum_expr(F.col("value")).alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_cdc_merge_tombstone_blocks_late_resurrection(spark):
    """A late-arriving OLDER update must not resurrect a deleted key,
    and the merge must be batch-partition-insensitive."""
    from ezbake_graph_spark.operators.streaming import cdc_merge

    cols = "user_id long, event_id long, ts_us long, event_type string, " \
           "value_micro long, n_ops long"
    b1 = spark.createDataFrame([(1, 10, 100, "error", 0, 1),
                                (2, 11, 100, "click", 5, 1)], cols)
    b2 = spark.createDataFrame([(1, 5, 50, "click", 7, 1),
                                (2, 12, 200, "view", 9, 1)], cols)
    s = cdc_merge(cdc_merge(None, b1), b2)
    rows = {r.user_id: r for r in s.collect()}
    # key 1: tombstone at t=100 wins over late t=50 update — still dead
    assert rows[1].event_type == "error" and rows[1].n_ops == 2
    # key 2: newest update wins
    assert rows[2].event_id == 12 and rows[2].n_ops == 2
    # batch-order insensitivity: applying b2 before b1 converges equally
    s2 = cdc_merge(cdc_merge(None, b2), b1)
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, s2.collect()))
    # single-batch apply equals two-batch apply
    s3 = cdc_merge(None, b1.unionByName(b2))
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, s3.collect()))


def test_transform_with_state_path_selection(spark):
    """The TWS key must take the real transformWithState path exactly
    when protobuf is importable, and produce the I7-identical result
    either way (same oracle, same state algebra)."""
    import pandas as pd

    from ezbake_graph_spark import registry
    from tests.conftest import SF_SMOKE

    try:
        import google.protobuf  # noqa: F401

        has_proto = True
    except ImportError:
        has_proto = False
    out = registry.queries()["stream_transform_with_state"](
        spark, SF_SMOKE
    ).toPandas()
    twin = registry.queries()["stream_stateful"](spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), twin.reset_index(drop=True)
    )
    if not has_proto:
        import pytest

        pytest.skip("protobuf absent: fallback path verified; TWS "
                    "path exercised where protobuf exists")
