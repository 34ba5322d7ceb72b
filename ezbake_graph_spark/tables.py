"""Fixture-table loaders (SURVEY.md §1.3, TESTDATA.md).

Ten parquet tables per scale-factor directory. Loading is a plain
``spark.read.parquet`` — schemas come from parquet footers, the scan is
the vectorized columnar reader, and Catalyst pushes filters/projections
into it (verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).

At 100 TB these would be partitioned/bucketed tables in a metastore;
the loader keeps a single seam (``load``) so that swap is one function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "customer", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``sf_dir``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS); the Spark reader
        # rejects it unless read as long. Set at runtime so queries work
        # on any caller-provided session (the driver builds its own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ts is parquet TIMESTAMP(NANOS) read as long (see session.py);
        # truncate ns -> µs exactly like DuckDB's reader does.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (operator A4)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
