"""Subquery patterns through the SQL entry point (§2M).

TPC-H-shaped EXISTS / IN / HAVING queries. The point is the plan, not
the SQL: Catalyst's RewritePredicateSubquery turns EXISTS into a left
semi join and IN into a semi join with a deduplicated build side, so
the executed shape is a keyed (or broadcast) join — no per-row
re-execution, which is what lets these survive 100 TB. HAVING is a
filter above the partial+final hash aggregate.

The EXISTS/IN queries run the IDENTICAL SQL text in Spark and DuckDB
(dialect-portable subset); HAVING uses the DataFrame entry with a
micro-unit exact sum (determinism.py) so the float threshold compare
is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import SCALE, money_sum_expr, sql_money_avg
from ezbake_graph_spark.registry import register

_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_exists_subquery", oracle=_EXISTS_SQL, tags=("C4", "sql-entry"))
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS: orders with any returned line, by priority.

    Same SQL text both engines; Catalyst rewrites the EXISTS to a left
    semi join on l_orderkey (RewritePredicateSubquery), with the
    returnflag filter pushed below the join.
    """
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_EXISTS_SQL)


_IN_SQL = f"""
SELECT o_orderstatus, count(*) AS n_orders,
       {sql_money_avg("o_totalprice")} AS avg_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

# Spark-dialect twin of _IN_SQL: identical shape, but the micro-unit
# exact average spelled with Spark's integer division semantics.
_IN_SQL_SPARK = f"""
SELECT o_orderstatus, count(*) AS n_orders,
       (CAST(sum(CAST(round(o_totalprice * {SCALE}) AS BIGINT)) AS DOUBLE)
        / count(*)) / {SCALE} AS avg_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("sql_in_subquery", oracle=_IN_SQL, tags=("C4", "sql-entry"))
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery filter: orders from high-balance customers.

    Catalyst plans the IN as a semi join against the deduplicated
    customer subquery; the small build side broadcasts.
    """
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    tables.load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_IN_SQL_SPARK)


_HAVING_SQL = f"""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_quantity * {SCALE}) AS BIGINT)) AS DOUBLE)
         / {SCALE} AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_custkey, c.c_name
HAVING sum(CAST(round(l.l_quantity * {SCALE}) AS BIGINT)) > 900 * {SCALE}
ORDER BY total_qty DESC, c_custkey
"""


@register("agg_having", oracle=_HAVING_SQL, tags=("D1", "sql-entry"))
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped HAVING: customers with >900 total quantity.

    DataFrame entry: groupBy + agg + filter over the aggregate — the
    filter lands above the final HashAggregate, identical to SQL
    HAVING. The exact micro-unit sum keeps the threshold compare
    engine-independent.
    """
    c = tables.load(spark, sf_dir, "customer")
    o = tables.load(spark, sf_dir, "orders")
    li = tables.load(spark, sf_dir, "lineitem")
    micro_sum = F.sum(F.round(F.col("l_quantity") * SCALE).cast("long"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(micro_sum.alias("micro_qty"))
        .filter(F.col("micro_qty") > 900 * SCALE)  # exact integer compare
        .select(
            "c_custkey",
            "c_name",
            (F.col("micro_qty").cast("double") / SCALE).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "c_custkey")
    )


_WINDOW_DEDUP_SQL = """
WITH ranked AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts, round(value, 6) AS last_value
FROM ranked
WHERE rn = 1
ORDER BY user_id
"""


@register("sql_window_dedup", oracle=_WINDOW_DEDUP_SQL, tags=("A4", "M91"))
def sql_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup through the SQL entry point: latest event per
    user via ROW_NUMBER in a CTE — the IDENTICAL SQL text runs in both
    engines (the CDC compaction idiom as users actually write it;
    dedup_upsert_latest is the same semantics via the DataFrame API).
    Catalyst plans it as one keyed shuffle + per-partition sort with
    a rank-limit pushdown (WindowGroupLimit): each partition keeps
    only its running top-1, so the sort never materializes full
    per-user history — the property that makes latest-row compaction
    viable over a 100 TB changelog. Tie-break on event_id makes row
    choice deterministic; round(value, 6) is per-row regime-1."""
    tables.load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_WINDOW_DEDUP_SQL)


_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
  FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
),
reach(node, dist) AS (
  SELECT 0 AS node, 0 AS dist
  UNION ALL
  SELECT e.dst, r.dist + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.dist < 3
)
SELECT node, min(dist) AS dist
FROM reach
GROUP BY node
ORDER BY node
"""


@register("sql_recursive_cte", oracle=_RECURSIVE_SQL, tags=("A4", "M114"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL entry point (Spark 4's WITH
    RECURSIVE): breadth-first reach with hop counts from nation 0 over
    the directed trade graph, as the IDENTICAL SQL text in both engines
    — the declarative twin of the Pregel BFS (J9): the engine, not a
    driver loop, iterates to the depth bound. The UNION ALL expansion
    is depth-guarded (dist < 3) and collapsed by the outer min(dist),
    so path multiplicity can't change the answer. Scale note: each
    recursive step is one keyed join — the same shuffle-per-superstep
    cost as graph/pregel.py, but without driver round-trips or manual
    lineage checkpointing; prefer it once the frontier fits the
    engine's iteration machinery, and the Pregel loop when you need
    custom convergence tests or per-step caching policy."""
    tables.register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_PARAM_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100 AS total_price
FROM orders
WHERE o_totalprice > 200000.0 AND o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("sql_parameterized", oracle=_PARAM_SQL, tags=("SQL-extra", "M139"))
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (SQL-extra, Spark 4 ``spark.sql(sql, args=
    {...})``): the injection-safe templated-query entry point —
    parameter markers (:name) bind server-side as literals, so repeated
    dashboard/report queries reuse one text. Binding happens at parse
    time: Catalyst sees constants, so pushdown/pruning work exactly as
    with inline literals (the pushed filter appears in the scan).
    The oracle inlines the same values."""
    o = tables.load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS total_price
        FROM orders_param_v
        WHERE o_totalprice > :min_price AND o_orderdate >= CAST(:since AS TIMESTAMP)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """,
        args={"min_price": 200000.0, "since": "1995-01-01"},
    )


# ---------------------------------------------------------------------------
# SQL scripting (M229)

_SCRIPTING_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       cents,
       CASE WHEN n >= (SELECT CAST(sum(n) AS BIGINT) // 3 FROM t)
            THEN 'major' ELSE 'minor' END AS share_class
FROM t ORDER BY l_returnflag
"""


@register("sql_scripting_block", oracle=_SCRIPTING_SQL, tags=("A4", "M229"))
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 ``BEGIN ... END`` blocks): procedural
    SQL with session variables — DECLARE/SET computed from one query,
    then used as a parameter in the next — the migration path for
    warehouse stored-procedure workloads (Teradata BTEQ, T-SQL, HiveQL
    scripts) without a driver-language round trip; the variable value
    never leaves the JVM. The script classifies return-flag groups
    against a threshold derived in a prior statement; the oracle is
    the equivalent single statement with the threshold inlined as a
    scalar subquery."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE third BIGINT DEFAULT 0;
          SET third = (SELECT CAST(count(*) AS BIGINT) DIV 3 FROM lineitem);
          SELECT l_returnflag,
                 count(*) AS n,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents,
                 CASE WHEN count(*) >= third THEN 'major' ELSE 'minor' END
                   AS share_class
          FROM lineitem
          GROUP BY l_returnflag
          ORDER BY l_returnflag;
        END
        """
    )
