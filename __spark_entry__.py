"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``ezbake_graph_spark.registry``: every operator from
SURVEY.md §2 registers a (spark_fn, duckdb_oracle) pair there; this
module just re-exposes the registry in the driver's shape.

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Python WORKERS must also resolve ezbake_graph_spark: cloudpickle
# serializes module-level kernel helpers (e.g. the multimodal stubs,
# the similarity pair kernels) BY REFERENCE, so a worker spawned by a
# driver that wasn't launched from the repo root raises
# ModuleNotFoundError at first UDF execution. This export covers
# sessions whose JVM launches AFTER this import (the JVM snapshots the
# driver env); for sessions created BEFORE it, tables._read patches
# sc.environment at the load seam, which every registered query
# passes through before any UDF is wrapped.
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO_ROOT
    )

from ezbake_graph_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return registry.queries()["agg_pricing_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-checkable query key."""
    return registry.oracle_sql()
