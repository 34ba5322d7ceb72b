"""Projection / filter / predicate operators (SURVEY.md §2B).

These are pure narrow transformations — no shuffle at all. The point
of each key is that the predicate/projection reaches the parquet scan
(PushedFilters / ReadSchema in ``.explain``), so at 100 TB the scan
skips row groups and never materializes unused columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 6) AS net_price,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged,
       l_quantity AS qty
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("project_compute", oracle=_PROJECT_SQL, tags=("B1",))
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select / rename / compute (B1). Per-row IEEE arithmetic is
    bit-identical across engines, so round6 is safe here."""
    li = tables.load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 6).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charged"),
        F.col("l_quantity").alias("qty"),
    ).orderBy("l_orderkey", "l_linenumber")


_FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity > 45 OR l_discount < 0.02)
  AND NOT l_returnflag = 'N'
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
ORDER BY l_orderkey, l_linenumber
"""


@register("filter_compound", oracle=_FILTER_SQL, tags=("B2",))
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate (B2), pushed to the scan."""
    li = tables.load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            ((F.col("l_quantity") > 45) | (F.col("l_discount") < 0.02))
            & ~(F.col("l_returnflag") == "N")
            & (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


_NULL_SQL = """
SELECT o_orderkey,
       nullif(o_orderstatus, 'P') AS status_or_null,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled
FROM orders
WHERE nullif(o_orderstatus, 'P') IS NULL
ORDER BY o_orderkey
"""


@register("filter_null", oracle=_NULL_SQL, tags=("B3",))
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL (B3). Fixtures carry no stored NULLs, so
    nulls are manufactured with nullif and then filtered."""
    o = tables.load(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        )
        .filter(F.col("status_or_null").isNull())
        .orderBy("o_orderkey")
    )


_IN_BETWEEN_LIKE_SQL = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_acctbal BETWEEN 1000 AND 3000
  AND c_name LIKE 'Customer#00000%'
ORDER BY c_custkey
"""


@register("filter_in_between_like", oracle=_IN_BETWEEN_LIKE_SQL, tags=("B4",))
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + LIKE (B4)."""
    c = tables.load(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_acctbal").between(1000, 3000)
            & F.col("c_name").like("Customer#00000%")
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")
    )


_CASE_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS bucket,
       o_orderstatus,
       count(*) AS n_orders
FROM orders
GROUP BY bucket, o_orderstatus
ORDER BY bucket, o_orderstatus
"""


@register("project_case", oracle=_CASE_SQL, tags=("B5",))
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection (B5)."""
    o = tables.load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("bucket", "o_orderstatus")
    )


_CAST_SQL = """
SELECT o_orderkey,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_custkey AS DOUBLE) AS custkey_dbl,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
ORDER BY o_orderkey
"""


@register("project_cast", oracle=_CAST_SQL, tags=("B6",))
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts (B6). double→int goes through floor() first: Spark
    casts truncate while DuckDB casts round, so only integer-valued
    doubles cast portably."""
    o = tables.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_custkey").cast("double").alias("custkey_dbl"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    ).orderBy("o_orderkey")
