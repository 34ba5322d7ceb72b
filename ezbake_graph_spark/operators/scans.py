"""Scans, sources, sinks, and the SQL entry point (SURVEY.md §2A).

Round-trip keys write to /tmp and read back so the connector path
(CSV/JSON/Parquet write → read) is exercised end-to-end while the
oracle compares against the original table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import sql_money_sum
from ezbake_graph_spark.registry import register

_ARTIFACTS = "/tmp/ezgs_artifacts"

_SCAN_SQL = """
SELECT count(*) AS n_rows,
       min(l_orderkey) AS min_orderkey,
       max(l_orderkey) AS max_orderkey,
       count(DISTINCT l_partkey) AS n_parts
FROM lineitem
"""


@register("scan_parquet", oracle=_SCAN_SQL, tags=("A1",))
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan (A1): count + min/max come straight off footer
    statistics once Catalyst prunes columns."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


_CSV_SQL = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"


@register("scan_csv_roundtrip", oracle=_CSV_SQL, tags=("A2",))
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write → read with explicit schema (A2); oracle is the
    original table, so the round trip must be lossless."""
    path = os.path.join(_ARTIFACTS, "region_csv")
    r = tables.load(spark, sf_dir, "region")
    r.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    return (
        spark.read.option("header", "true")
        .schema(schema)
        .csv(path)
        .orderBy("r_regionkey")
    )


_JSON_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"


@register("scan_json_roundtrip", oracle=_JSON_SQL, tags=("A2",))
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write → read with explicit schema (A2)."""
    path = os.path.join(_ARTIFACTS, "nation_json")
    n = tables.load(spark, sf_dir, "nation")
    n.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return (
        spark.read.schema(schema).json(path)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


_ORC_SQL = """
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 6) AS s_acctbal
FROM supplier ORDER BY s_suppkey
"""


@register("scan_orc_roundtrip", oracle=_ORC_SQL, tags=("A2c",))
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → read (A2c): the second columnar format a lake must
    speak. Same vectorized reader + pushdown machinery as parquet on
    the Spark side; the oracle reads the ORIGINAL parquet table, so
    the round trip must preserve values exactly (per-row round6 on the
    one double column is regime-1 deterministic)."""
    path = os.path.join(_ARTIFACTS, "supplier_orc")
    s = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    s.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round("s_acctbal", 6).alias("s_acctbal"),
    ).orderBy("s_suppkey")


_SINK_SQL = """
SELECT o_orderstatus, count(*) AS n_orders
FROM orders
WHERE o_totalprice > 100000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("sink_parquet_roundtrip", oracle=_SINK_SQL, tags=("A3",))
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink (A3): write partitionBy(status), read
    back, aggregate. partitionBy is the scale tool for downstream
    partition pruning."""
    path = os.path.join(_ARTIFACTS, "orders_sink")
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


_SQL_ENTRY_SQL = f"""
SELECT r_name,
       count(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@register("sql_temp_view_entry", oracle=_SQL_ENTRY_SQL, tags=("A4",))
def sql_temp_view_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point over temp views (A4): identical pipeline from
    the parser down (SURVEY §3.3); Spark-dialect SQL string."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
               count(*) AS n_customers,
               CAST(sum(CAST(round(c_acctbal * 1000000) AS BIGINT)) AS DOUBLE)
                     / 1000000 AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
        """
    )


_CORRELATED_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
FROM orders o
WHERE CAST(round(o_totalprice * 1000000) AS BIGINT)
      * (SELECT 2 * count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      > (SELECT 3 * sum(CAST(round(o2.o_totalprice * 1000000) AS BIGINT))
         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey
"""


@register("sql_correlated_subquery", oracle=_CORRELATED_SQL, tags=("A4", "C-extra"))
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries through the SQL entry point —
    orders priced above 1.5x their customer's average. The IDENTICAL
    SQL text runs in both engines (micro-unit integer arithmetic keeps
    the comparison exact); Catalyst decorrelates the two scalar
    subqueries into aggregate+join (RewriteCorrelatedScalarSubquery),
    so the executed plan is one keyed aggregate joined back to orders
    — no per-row re-execution, which is what makes correlated
    subqueries survive 100 TB."""
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORRELATED_SQL)


_PRUNED_SQL = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       count(*) AS n_events
FROM events
WHERE event_type = 'purchase'
GROUP BY hour
ORDER BY hour
"""


@register("sink_partition_pruned_read", oracle=_PRUNED_SQL, tags=("A3b",))
def sink_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events partitioned by event_type, read back ONE partition.

    The read-side filter on the partition column never touches data
    files of other partitions — `.explain` shows it as PartitionFilters
    on the scan (asserted in tests/test_plans.py), which is the 100 TB
    mechanism for time/type-partitioned event lakes: a day/type query
    reads that directory alone.
    """
    path = os.path.join(_ARTIFACTS, "events_by_type")
    ev = tables.load(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("hour")
    )


_MERGE_SQL = """
SELECT p_partkey, p_name, p_brand, p_size
FROM (
  SELECT p_partkey, p_name, NULL AS p_brand, NULL::INTEGER AS p_size
  FROM part WHERE p_partkey < 500
  UNION ALL
  SELECT p_partkey, NULL AS p_name, p_brand, p_size
  FROM part WHERE p_partkey >= 500
)
ORDER BY p_partkey
"""


@register("scan_schema_merge", oracle=_MERGE_SQL, tags=("A2b",))
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations with different
    column sets merge into one schema (``mergeSchema``), absent columns
    null-filled — how a 100 TB lake absorbs schema drift without
    rewriting history. Each generation's footer contributes its
    columns; the scan stays vectorized and column-pruned."""
    path = os.path.join(_ARTIFACTS, "part_evolving")
    p = tables.load(spark, sf_dir, "part")
    v1 = p.filter(F.col("p_partkey") < 500).select("p_partkey", "p_name")
    v2 = p.filter(F.col("p_partkey") >= 500).select("p_partkey", "p_brand", "p_size")
    v1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(path)
    return back.select("p_partkey", "p_name", "p_brand", "p_size").orderBy(
        "p_partkey"
    )


_CLUSTERED_SQL = """
SELECT count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
         / 1000000 AS sum_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
"""


@register("sink_clustered_layout", oracle=_CLUSTERED_SQL, tags=("A3c",))
def sink_clustered_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered storage layout: range-partition + sort on the filter
    column before writing, so every parquet file (and row group) covers
    a disjoint o_orderdate range — min/max footer stats then let a date
    query skip all non-overlapping files/row groups at scan time. This
    is THE data-layout lever at 100 TB (the poor man's Z-order for a
    single dimension); tests/test_plans.py proves the written footers
    carry disjoint ranges. The query itself reads the clustered copy
    with the date filter pushed down."""
    path = os.path.join(_ARTIFACTS, "orders_clustered")
    o = tables.load(spark, sf_dir, "orders")
    (
        o.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-07-01").cast("timestamp")
    micro = F.round(F.col("o_totalprice") * 1_000_000).cast("long")
    return (
        back.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(micro).cast("double") / 1_000_000).alias("sum_price"),
        )
    )


_ZORDER_SQL = f"""
SELECT count(*) AS n_events,
       {sql_money_sum("value")} AS sum_value
FROM events
WHERE user_id >= 10 AND user_id < 20
  AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
"""

_Z_BITS = 16


def _z_value(x, y):
    """Interleave the low _Z_BITS of two non-negative int columns into
    a Morton (Z-curve) key — pure JVM bit ops, codegen-friendly."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


@register("sink_zorder_layout", oracle=_ZORDER_SQL, tags=("A3d", "M73"))
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustered layout: interleave the bits of the
    two filter dimensions (user_id, event day) into one sort key, then
    range-partition + sort + write. Every parquet file then covers a
    LOCALIZED box in (user, time) space, so its footer min/max let a
    two-dimensional box query skip files on EITHER dimension — the
    multi-dim generalization of sink_clustered_layout's single-dim
    sort, and the standard lakehouse layout lever (Delta/Iceberg
    OPTIMIZE ZORDER BY) at 100 TB. A single-dim time sort leaves every
    file spanning the full user range (second-dim stats useless);
    tests/test_plans.py asserts the written footers skip on BOTH
    dimensions. The query itself reads the z-ordered copy with both
    filters pushed down; the oracle computes the same box on the
    original table, so a mis-layout that loses rows fails the hash."""
    path = os.path.join(_ARTIFACTS, "events_zorder")
    ev = tables.load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
    z = _z_value(F.col("user_id").cast("long"), day.cast("long"))
    (
        ev.withColumn("z", z)
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    lo_ts = F.lit("2024-01-10").cast("timestamp")
    hi_ts = F.lit("2024-01-20").cast("timestamp")
    micro = F.round(F.col("value") * 1_000_000).cast("long")
    return (
        back.filter(
            (F.col("user_id") >= 10)
            & (F.col("user_id") < 20)
            & (F.col("ts") >= lo_ts)
            & (F.col("ts") < hi_ts)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(micro).cast("double") / 1_000_000).alias("sum_value"),
        )
    )


_LATERAL_SQL = """
SELECT c_custkey, t.o_orderkey, t.o_totalprice
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c_custkey < 100
ORDER BY c_custkey, o_orderkey
"""


@register("sql_lateral_topn", oracle=_LATERAL_SQL, tags=("A4", "M74"))
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL entry point: top-2
    orders per customer, the IDENTICAL SQL text in both engines (ties
    broken by o_orderkey so row choice can't drift). Catalyst
    decorrelates the lateral into a ranked window over one keyed
    shuffle (RewriteLateralSubquery + rank pushdown) rather than
    re-running the subquery per customer row — per-row re-execution
    is exactly what cannot survive 100 TB."""
    tables.load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    tables.load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


_COMPACTION_SQL = """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
         / 1000000 AS sum_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("sink_compaction", oracle=_COMPACTION_SQL, tags=("A3e", "M79"))
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the lakehouse maintenance operator: a
    fragmented table (64 tiny files, the classic streaming-ingest
    artifact) is rewritten into size-targeted files via coalesce
    (narrow, no shuffle — compaction must not pay a shuffle just to
    merge files). At 100 TB this is OPTIMIZE/rewriteDataFiles: small
    files destroy scan throughput (footer+open cost per file, tiny
    row groups defeat vectorization), and compaction restores
    ~128 MB-1 GB files. The oracle checks the rewrite lost/duplicated
    NOTHING (count + exact money sum per flag on the read-back);
    tests/test_plans.py asserts the file count actually dropped."""
    frag = os.path.join(_ARTIFACTS, "lineitem_fragmented")
    compact = os.path.join(_ARTIFACTS, "lineitem_compacted")
    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    li.repartition(64).write.mode("overwrite").parquet(frag)
    frag_df = spark.read.parquet(frag)
    target_files = max(1, sum(
        f.stat().st_size for f in __import__("pathlib").Path(frag).glob("*.parquet")
    ) >> 23)  # ~8 MB target per file at test scale; 128 MB-1 GB in prod
    frag_df.coalesce(target_files).write.mode("overwrite").parquet(compact)
    back = spark.read.parquet(compact)
    micro = F.round(F.col("l_extendedprice") * 1_000_000).cast("long")
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(micro).cast("double") / 1_000_000).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


_TEXT_SQL = """
SELECT count(*) AS n_lines,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(length(text)) AS min_len,
       max(length(text)) AS max_len
FROM documents
"""


@register("scan_text_roundtrip", oracle=_TEXT_SQL, tags=("A2d", "M83"))
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-lines write → read (A2d): one document per line, the
    rawest LLM-corpus interchange format (`spark.read.text` is how a
    100 TB crawl dump enters the pipeline before any schema exists).
    Line order is not preserved across writers, so the oracle compares
    order-free aggregates of the read-back against the original table
    — a lost or truncated line fails the count/char-sum."""
    path = os.path.join(_ARTIFACTS, "documents_text")
    d = tables.load(spark, sf_dir, "documents")
    d.select("text").write.mode("overwrite").text(path)
    back = spark.read.text(path)  # one column: value
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
    )


_DPP_SQL = f"""
SELECT event_type, count(*) AS n_events,
       {sql_money_sum("value")} AS sum_value
FROM events
WHERE length(event_type) >= 6
GROUP BY event_type
ORDER BY event_type
"""


@register("join_dpp_partitioned", oracle=_DPP_SQL, tags=("A3f", "M86", "join"))
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is written partitioned
    by event_type; the dim side is a small *computed* set of event
    types (those with length >= 6 — a predicate on a dim attribute, so
    the surviving keys are unknowable at plan time). Catalyst's DPP
    rule turns the broadcast build of the dim side into a runtime
    partition filter on the fact scan (`dynamicpruningexpression` in
    PartitionFilters, asserted in tests/test_plans.py), so partitions
    whose key the dim filter eliminated are never read from disk.

    This is THE star-schema scan killer feature at 100 TB: a
    date-dimension filter ("fiscal Q3") prunes a year-partitioned fact
    to the matching directories at runtime — without DPP the scan reads
    all partitions and throws rows away after the join. The oracle
    computes the same join-as-filter on the original table, so a
    mis-pruned read (wrong or missing partitions) fails the hash."""
    path = os.path.join(_ARTIFACTS, "events_dpp")
    ev = tables.load(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        ev.select("event_type")
        .distinct()
        .filter(F.length("event_type") >= 6)
    )
    micro = F.round(F.col("value") * 1_000_000).cast("long")
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(micro).cast("double") / 1_000_000).alias("sum_value"),
        )
        .orderBy("event_type")
    )


_BINARYFILE_SQL = """
SELECT CAST(1 AS BIGINT) AS n_files,
       CAST(sum(length(text) + 1) AS BIGINT) AS total_bytes
FROM documents
"""


@register("scan_binaryfile", oracle=_BINARYFILE_SQL, tags=("A2e", "M98"))
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary-file ingestion (A2e): dump the corpus as one raw
    text file, then read it back through the ``binaryFile`` data source
    — (path, length, content: BINARY) rows, the entry point for
    image/audio/video blobs at 100 TB (each media file becomes one
    binary row; decode happens later via mapInPandas, see
    multimodal.py). The oracle pins the exact byte accounting: one
    file, sum(length(text)+1) bytes — the writer's newline per line —
    so truncation or encoding drift fails the hash. Scale note:
    binaryFile loads each file fully into one row; for 100 TB media
    lakes cap file size and let partition planning spread files across
    executors (maxPartitionBytes governs grouping, not splitting)."""
    path = os.path.join(_ARTIFACTS, "documents_blob")
    d = tables.load(spark, sf_dir, "documents")
    d.select("text").repartition(1).write.mode("overwrite").text(path)
    blob = spark.read.format("binaryFile").load(os.path.join(path, "*.txt"))
    return blob.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.length("content")).alias("total_bytes"),
    )


_MALFORMED_SQL = """
SELECT count(*) AS n_rows,
       CAST(count(*) FILTER (WHERE doc_id % 10 = 0) AS BIGINT) AS n_bad,
       CAST(sum(n_chars) FILTER (WHERE doc_id % 10 <> 0) AS BIGINT)
         AS sum_good_chars
FROM documents
"""


@register("scan_csv_malformed", oracle=_MALFORMED_SQL, tags=("A2f", "M111"))
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input CSV ingestion (A2f): every 10th line is corrupted
    (extra column, non-numeric field) before writing; the read uses
    PERMISSIVE mode with a ``_corrupt_record`` column, so bad lines
    surface as quarantine rows instead of failing the job — the
    poison-row containment a 100 TB crawl ingest cannot live without
    (FAILFAST on petabyte batches means one bad line kills hours of
    work; DROPMALFORMED silently loses data — PERMISSIVE + quarantine
    count is the auditable middle). The oracle pins the exact good/bad
    split and the checksum over good rows, so mis-classification in
    either direction fails the hash."""
    path = os.path.join(_ARTIFACTS, "docs_malformed_csv")
    d = tables.load(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.col("doc_id").cast("string"), F.lit(",not_a_number,extra")),
    ).otherwise(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(","), F.col("n_chars").cast("string")
        )
    )
    d.select(line.alias("value")).write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("_corrupt_record")).alias("n_bad"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), F.col("n_chars"))).alias(
            "sum_good_chars"
        ),
    )


_TIME_TRAVEL_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey % 3 = 0
ORDER BY o_orderkey
"""


@register("scan_time_travel", oracle=_TIME_TRAVEL_SQL, tags=("A2g", "M215"))
def scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolated time travel over plain parquet — the
    Delta/Iceberg `VERSION AS OF` primitive emulated with an explicit
    manifest layer: each commit is a JSON manifest naming exactly the
    data files in that snapshot, and a versioned read plans the scan
    from the MANIFEST's file list, never from directory listing.

    The fixture builds two commits of an orders slice: v1 = two file
    sets (A, B); v2 = a MERGE-shaped commit that rewrites B with
    bumped prices (update), adds C (insert), and leaves B's old files
    on disk (they are dead in v2 but live in v1 — exactly how Delta
    keeps time travel cheap until VACUUM). Reading v1 AFTER v2 is
    committed must return v1's bytes; a directory-listing reader
    would return A + B + B' + C (duplicates plus phantom updates),
    which the value-hash oracle (v1's defining predicate over the
    base table) catches loudly.

    At 100 TB this is the metadata design every table format uses:
    manifests are O(files) driver-side metadata, data files are
    immutable, and snapshot isolation is a pointer swap — the scan
    itself remains an ordinary pushed-predicate parquet read over the
    manifest's files. tests/test_plans.py asserts v2 sees the update
    and the insert and that the dead files really are still on disk.
    """
    import json

    table = os.path.join(_ARTIFACTS, "orders_versioned")
    mdir = os.path.join(table, "_manifests")
    o = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v1 = o.filter(F.col("o_orderkey") % 3 == 0)
    a = v1.filter(F.col("o_custkey") % 2 == 0)
    b = v1.filter(F.col("o_custkey") % 2 == 1)
    a.write.mode("overwrite").parquet(os.path.join(table, "a1"))
    b.write.mode("overwrite").parquet(os.path.join(table, "b1"))
    # v2: rewrite B (price bump = the update), append C (the insert)
    b.withColumn("o_totalprice", F.col("o_totalprice") + 1).write.mode(
        "overwrite"
    ).parquet(os.path.join(table, "b2"))
    o.filter(F.col("o_orderkey") % 3 == 1).write.mode("overwrite").parquet(
        os.path.join(table, "c2")
    )

    def _files(*subdirs: str) -> list[str]:
        import pathlib

        out: list[str] = []
        for s in subdirs:
            out.extend(
                str(p) for p in sorted(pathlib.Path(table, s).glob("*.parquet"))
            )
        return out

    os.makedirs(mdir, exist_ok=True)
    manifests = {1: _files("a1", "b1"), 2: _files("a1", "b2", "c2")}
    for v, files in manifests.items():
        with open(os.path.join(mdir, f"v{v}.json"), "w") as f:
            json.dump({"version": v, "files": files}, f)

    def read_version(v: int) -> DataFrame:
        with open(os.path.join(mdir, f"v{v}.json")) as f:
            manifest = json.load(f)
        return spark.read.parquet(*manifest["files"])

    return read_version(1).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Python DataSource API (M226)

_PYDS_PARTS = 8
_PYDS_ROWS = 10_000  # per the whole source, split across partitions


def _pyds_value(i: int) -> int:
    """Deterministic row payload: 32-bit integer from md5(id) — the
    same hash-uniform construction the sampling/bootstrap keys use,
    reproducible in any engine."""
    import hashlib

    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


def _make_pyds():
    """Build the custom DataSource class lazily (pyspark.sql.datasource
    import kept out of module import time)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        InputPartition,
    )

    class _GenReader(DataSourceReader):
        def __init__(self, n_rows: int, n_parts: int):
            self.n_rows = n_rows
            self.n_parts = n_parts
            self.only_part: int | None = None

        def pushFilters(self, filters):
            """Accept EqualTo on the partition column — the pruning
            contract: ``partitions()`` then returns ONLY the matching
            partition, so non-matching splits are never scheduled
            (the Python-source analogue of parquet partition
            pruning). Everything else is returned as unsupported and
            re-applied by Spark above the scan."""
            for f in filters:
                if (
                    isinstance(f, EqualTo)
                    and tuple(f.attribute) == ("part",)
                    and isinstance(f.value, int)
                ):
                    self.only_part = int(f.value)
                else:
                    yield f

        def partitions(self):
            parts = range(self.n_parts)
            if self.only_part is not None:
                parts = [p for p in parts if p == self.only_part]
            return [InputPartition(p) for p in parts]

        def read(self, partition):
            p = partition.value
            for i in range(p, self.n_rows, self.n_parts):
                yield (i, p, _pyds_value(i))

    class GenSource(DataSource):
        @classmethod
        def name(cls):
            return "ezgs_gen"

        def schema(self):
            return "id bigint, part int, value bigint"

        def reader(self, schema):
            return _GenReader(_PYDS_ROWS, _PYDS_PARTS)

    return GenSource


_PYDS_SQL = f"""
WITH src AS (
  SELECT i AS id, CAST(i % {_PYDS_PARTS} AS INTEGER) AS part,
         ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))::BIGINT AS value
  FROM range(0, {_PYDS_ROWS}) t(i)
)
SELECT part, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(value) AS BIGINT) AS sum_value,
       CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
FROM src WHERE part = 3
GROUP BY part ORDER BY part
"""


@register(
    "scan_python_datasource", oracle=_PYDS_SQL, tags=("A2h", "M226", "bench2")
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON data source (Spark 4 DataSource API): a
    partitioned deterministic generator source with FILTER PUSHDOWN —
    ``pushFilters`` accepts ``part = 3`` and ``partitions()`` then
    schedules only that split, the Python-source analogue of parquet
    partition pruning (7 of 8 splits never run; driver-side pruning
    behavior unit-tested directly on the reader in
    tests/test_plans.py since python scans expose no PushedFilters
    plan node). This is the extension seam for reading bespoke feeds
    (internal APIs, tickers, simulation output) as first-class
    partitioned DataFrames instead of driver-side collect loops."""
    # runtime conf (idempotent) so caller-provided vanilla sessions —
    # the driver builds its own — take the pushdown path
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(_make_pyds())
    except Exception:
        pass  # already registered in this session
    src = spark.read.format("ezgs_gen").load().filter(F.col("part") == 3)
    return (
        src.groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("part")
    )


# ---------------------------------------------------------------------------
# Python DataSource writer (M231)


def _make_pyds_sink(out_dir: str):
    """Custom python SINK with the two-phase commit protocol: each
    task writes a UNIQUELY-NAMED temp file and returns its path in a
    WriterCommitMessage; only the driver-side ``commit`` (called once
    ALL tasks succeeded) renames them into place and writes the
    manifest — a failed/speculative task's file is never visible
    (``abort`` removes strays). Exactly the contract every real sink
    (parquet committer, JDBC txn, Kafka txn producer) implements."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Msg(WriterCommitMessage):
        def __init__(self, path: str, n: int):
            self.path = path
            self.n = n

    class _Writer(DataSourceWriter):
        def __init__(self, path: str):
            self.path = path

        def write(self, iterator):
            import json as _json
            import os as _os
            import uuid as _uuid

            from pyspark import TaskContext

            tmp = _os.path.join(
                self.path, f"_tmp_{TaskContext.get().partitionId()}_"
                f"{_uuid.uuid4().hex[:8]}.jsonl"
            )
            n = 0
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(_json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return _Msg(tmp, n)

        def commit(self, messages):
            import json as _json
            import os as _os

            final = []
            for i, m in enumerate(messages):
                dst = _os.path.join(self.path, f"part-{i:05d}.jsonl")
                _os.replace(m.path, dst)
                final.append({"file": _os.path.basename(dst), "rows": m.n})
            with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                _json.dump(final, f)

        def abort(self, messages):
            import os as _os

            for m in messages:
                if m is not None and _os.path.exists(m.path):
                    _os.remove(m.path)

    class SinkSource(DataSource):
        @classmethod
        def name(cls):
            return "ezgs_jsonl_sink"

        def schema(self):
            return "o_orderpriority string, n bigint"

        def writer(self, schema, overwrite):
            import os as _os

            _os.makedirs(out_dir, exist_ok=True)
            if overwrite:
                for p in _os.listdir(out_dir):
                    _os.remove(_os.path.join(out_dir, p))
            return _Writer(out_dir)

    return SinkSource


_PYDS_SINK_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sink_python_datasource", oracle=_PYDS_SINK_SQL, tags=("A3g", "M231"))
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON sink (Spark 4 DataSource writer API) with the
    real two-phase commit protocol — tasks write uniquely-named temp
    files and return commit messages; the driver's ``commit`` renames
    into place and writes a manifest only after every task succeeded,
    so partial/speculative output is never visible (``abort`` cleans
    strays). The round trip back through plain JSON reads the
    MANIFEST's files, proving the committed set is complete and
    exactly-once; value-hashed against the direct aggregate."""
    import json

    out_dir = os.path.join(_ARTIFACTS, "pyds_sink")
    agg = (
        tables.load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    try:
        spark.dataSource.register(_make_pyds_sink(out_dir))
    except Exception:
        pass
    agg.write.format("ezgs_jsonl_sink").mode("overwrite").save()
    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    paths = [os.path.join(out_dir, m["file"]) for m in manifest]
    back = spark.read.json(paths, schema="o_orderpriority string, n long")
    return back.orderBy("o_orderpriority")
