"""Set operations (SURVEY.md §2G).

UNION ALL is shuffle-free (plan concatenation); the distinct variants
add one keyed hash-aggregate shuffle. INTERSECT/EXCEPT plan as
left-semi/left-anti joins over distinct inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register


def _open_closed(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = tables.load(spark, sf_dir, "orders")
    open_ck = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    closed_ck = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_ck, closed_ck


_UNION_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@register("set_union_all", oracle=_UNION_ALL_SQL, tags=("G1",))
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (G1) — multiset semantics, duplicates preserved."""
    a, b = _open_closed(spark, sf_dir)
    return a.unionByName(b)


_UNION_DISTINCT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


@register("set_union_distinct", oracle=_UNION_DISTINCT_SQL, tags=("G2",))
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (G2)."""
    a, b = _open_closed(spark, sf_dir)
    return a.unionByName(b).distinct().orderBy("custkey")


_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


@register("set_intersect", oracle=_INTERSECT_SQL, tags=("G3",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (G3) — distinct semantics in both engines."""
    a, b = _open_closed(spark, sf_dir)
    return a.intersect(b).orderBy("custkey")


_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


@register("set_except", oracle=_EXCEPT_SQL, tags=("G4",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (G4) — distinct semantics (DataFrame.subtract)."""
    a, b = _open_closed(spark, sf_dir)
    return a.subtract(b).orderBy("custkey")


_INTERSECT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


@register("set_intersect_all", oracle=_INTERSECT_ALL_SQL, tags=("G3", "M56"))
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each custkey appears
    min(count_left, count_right) times. Plans as one keyed
    hash-aggregate per side plus a join on the key — same shuffle
    count as the distinct variant, so the ALL form costs nothing
    extra at scale."""
    a, b = _open_closed(spark, sf_dir)
    return a.intersectAll(b).orderBy("custkey")


_EXCEPT_ALL_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


@register("set_except_all", oracle=_EXCEPT_ALL_SQL, tags=("G4", "M56"))
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each custkey appears
    max(count_left − count_right, 0) times."""
    a, b = _open_closed(spark, sf_dir)
    return a.exceptAll(b).orderBy("custkey")
