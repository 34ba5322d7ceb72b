"""SparkSession factory (SURVEY.md §7.1 P0).

One warm session per process. Settings chosen for the 100 TB design
point scaled down to local[32] testing:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting
  are the scale levers we cannot hand-tune per dataset.
- ``spark.sql.shuffle.partitions=32``: matches local core count; on a
  real cluster this would be ~2-3x total executor cores, but AQE
  coalesces either way.
- UTC session timezone: determinism rule 1 (SURVEY.md §5.3).
- Arrow enabled: every pandas UDF / applyInPandas path is Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(app_name: str = "ezbake-graph-spark") -> SparkSession:
    """Build (or fetch) the singleton SparkSession."""
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # The bench harness materializes via toPandas(), and the pair-
        # dense dedup fixtures return ~1 GiB of rows at the scale-curve
        # 4x point — the 1g default tripped there (a HARNESS transfer,
        # not an operator collect; the operators themselves never ship
        # data-proportional results to the driver — enforced by the
        # collect audit in VERDICT and scale_lint).
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores ts as TIMESTAMP(NANOS), which the Spark
        # reader rejects; read as long and convert in tables.load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark's legacy default writes timestamps as INT96, and parquet
        # writers emit NO min/max statistics for INT96 — which silently
        # defeats row-group skipping on any timestamp-clustered sink
        # (sink_clustered_layout's whole purpose). Write µs INT64, which
        # carries full footer stats and is what every modern reader
        # (DuckDB, Arrow, Spark itself) expects.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # No data locality to wait for: local mode here, object storage
        # (S3/GCS) at the 100 TB design point. Waiting the 3s default
        # per locality level only delays task launch.
        .config("spark.locality.wait", "0")
    )
    # Ad-hoc overrides for experiments: "k=v;k2=v2".
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, extra.split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    if SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{CPUS}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Checkpoint dir for iterative (Pregel) lineage truncation.
    spark.sparkContext.setCheckpointDir("/tmp/ezgs-checkpoints")
    return spark
