"""Distributed global-order kernel (operators/distorder.py): the
documented 100 TB form of the three data-proportional global windows
(VERDICT r11 ask #3). Equivalence is exact — the kernel must return
bit-identical ranks / running sums / ntile buckets to the
single-partition window it replaces — and the size gate must keep the
committed fixtures on the exact path."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ezbake_graph_spark import registry
from ezbake_graph_spark.operators import distorder
from tests.conftest import SF_SMOKE

GATED_KEYS = [
    # VERDICT r11 ask #3 trio
    "agg_revenue_concentration",
    "sample_curriculum_order",
    "ts_max_concurrency",
    # r12 sweep of the remaining data-proportional global windows
    "agg_quantile_bins",
    "events_rfm_scores",
    "curate_images",
    "ml_eval_ranking",
]


@pytest.fixture()
def force_dist(monkeypatch):
    monkeypatch.setenv("EZGS_FORCE_DIST_WINDOWS", "1")
    yield


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kernel_matches_single_window_rank_and_ntile(spark):
    """Synthetic corpus with duplicate leading keys: global row_number
    and ntile from the kernel equal F.row_number/F.ntile over the same
    total order, for k both dividing and not dividing N, and few/many
    buckets."""
    rows = [(i, (i * 7) % 13, f"u{i}") for i in range(211)]  # dup keys
    df = spark.createDataFrame(rows, "id long, key long, name string")
    w = Window.orderBy("key", "id")
    for k in (4, 7):
        exact = df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.ntile(k).over(w).alias("nt"),
        )
        for nb in (1, 5, 64):
            got = distorder.attach_global_order(
                df,
                "key",
                [F.col("key"), F.col("id")],
                n_buckets=nb,
                rank_col="rn",
                ntile=("nt", k),
            ).select("id", F.col("rn").cast("int").alias("rn"), "nt")
            assert _rows(got) == _rows(exact), (k, nb)


def test_kernel_matches_single_window_desc_and_running(spark):
    """DESC leading order + inclusive running sum, and the N < k ntile
    edge (every bucket one row, ELSE branch unreachable)."""
    rows = [(i, 1000 - (i % 9) * 5, (-1) ** i) for i in range(97)]
    df = spark.createDataFrame(rows, "id long, key long, delta long")
    w = Window.orderBy(F.col("key").desc(), "id")
    exact = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run"),
    )
    got = distorder.attach_global_order(
        df,
        "key",
        [F.col("key").desc(), F.col("id")],
        desc=True,
        n_buckets=8,
        rank_col="rn",
        running={"run": "delta"},
    ).select("id", F.col("rn").cast("int").alias("rn"), "run")
    assert _rows(got) == _rows(exact)
    # N < k: ntile degenerates to rank
    small = spark.createDataFrame([(i, i) for i in range(3)], "id long, key long")
    got_nt = distorder.attach_global_order(
        small,
        "key",
        [F.col("key"), F.col("id")],
        n_buckets=2,
        ntile=("nt", 5),
    )
    assert sorted((r.id, r.nt) for r in got_nt.collect()) == [(0, 1), (1, 2), (2, 3)]


@pytest.mark.parametrize("key", GATED_KEYS)
def test_gated_keys_identical_on_both_paths(spark, key, force_dist, monkeypatch):
    """The three committed keys return IDENTICAL rows on the exact and
    distributed paths at sf0.001 (exact integer semantics survive the
    kernel swap)."""
    qs = registry.queries()
    dist = _rows(qs[key](spark, SF_SMOKE))
    monkeypatch.delenv("EZGS_FORCE_DIST_WINDOWS")
    exact = _rows(qs[key](spark, SF_SMOKE))
    assert dist == exact


def test_size_gate_keeps_fixtures_on_exact_path(spark):
    """Committed fixtures sit far below WINDOW_GATE_ROWS — the driver
    artifacts and PLANS.md plans are unchanged by the r12 swap."""
    assert not distorder.use_distributed_window(spark, SF_SMOKE, "orders")
    assert not distorder.use_distributed_window(spark, SF_SMOKE, "documents")
    assert not distorder.use_distributed_window(spark, SF_SMOKE, "events")
    assert distorder.WINDOW_GATE_ROWS >= 1_000_000
