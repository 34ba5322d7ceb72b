"""CBO / ANALYZE statistics demonstration (VERDICT r4 "missing" #3).

The engine's own star queries hand-shape their joins (broadcast spine
+ AQE), which covers the curated registry; an ad-hoc 6-table join from
a user needs the cost-based optimizer, which only engages on catalog
tables with collected statistics. This test is the documented recipe:

    df.write.saveAsTable(name)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")

and pins the two observable effects: per-table rowCount statistics
propagate through the optimized plan, and a deliberately pessimal join
order (fact table syntactically first, dimension pair last) is
rewritten so the small tables join before the fact table touches the
intermediate. SCALE.md §4.1 carries the matching prose.
"""

from __future__ import annotations

import re

import pytest

from ezbake_graph_spark import tables
from tests.conftest import SF_SMOKE

_Q = """
SELECT c.c_mktsegment, count(*) AS n
FROM cbo_lineitem l
JOIN cbo_customer c ON 1=1
JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@pytest.fixture(scope="module")
def cbo_tables(spark):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    names = ("lineitem", "orders", "customer")
    for t in names:
        # a fresh in-memory catalog does not know about a previous
        # session's managed-table directory — clear both
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        shutil.rmtree(f"{warehouse}/cbo_{t}", ignore_errors=True)
    prev = (
        spark.conf.get("spark.sql.cbo.enabled"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled"),
    )
    created = tables.enable_cbo(
        spark,
        {t: tables.load(spark, SF_SMOKE, t) for t in names},
        prefix="cbo_",
        overwrite=True,
    )
    assert created == [f"cbo_{t}" for t in names]
    # the helper switches CBO on; the cbo_on/off fixtures own the conf
    # during tests, so restore the pre-fixture setting here
    spark.conf.set("spark.sql.cbo.enabled", prev[0])
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev[1])
    yield
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


@pytest.fixture()
def cbo_on(spark):
    prev = (
        spark.conf.get("spark.sql.cbo.enabled"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled"),
    )
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    yield
    spark.conf.set("spark.sql.cbo.enabled", prev[0])
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", prev[1])


def _scan_order(spark) -> list[str]:
    plan = spark.sql(_Q)._jdf.queryExecution().optimizedPlan().toString()
    return re.findall(r"default\.cbo_(\w+)", plan)


def test_analyze_collects_row_count_stats(spark, cbo_tables, cbo_on):
    stats = (
        spark.table("cbo_lineitem")._jdf.queryExecution().optimizedPlan().stats()
    )
    n = tables.load(spark, SF_SMOKE, "lineitem").count()
    assert stats.rowCount().get() == n


def test_cbo_reorders_fact_table_last(spark, cbo_tables, cbo_on):
    order = _scan_order(spark)
    # dimension pair joins first; the fact table joins the (filtered,
    # small) intermediate instead of anchoring the join tree
    assert order[-1] == "lineitem", order
    assert set(order[:2]) == {"orders", "customer"}


def test_heuristic_order_differs_without_stats_reorder(spark, cbo_tables):
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    try:
        order = _scan_order(spark)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    # the stats-free heuristic keeps the fact table at the head —
    # the contrast that shows the CBO rewrite is stats-driven
    assert order[0] == "lineitem", order


def test_cbo_estimates_propagate_to_aggregate(spark, cbo_tables, cbo_on):
    stats = spark.sql(_Q)._jdf.queryExecution().optimizedPlan().stats()
    # c_mktsegment has 5 NDV in the column stats; the aggregate's
    # estimated row count derives from it (only possible with CBO on)
    assert stats.rowCount().get() == 5
