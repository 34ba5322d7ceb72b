"""Scalar function families (SURVEY.md §2H).

One query key per family, each exercising several functions. All are
per-row, shuffle-free expressions that stay inside WholeStageCodegen;
cross-engine determinism per SURVEY §5.3 (IEEE per-row ops are
bit-identical; libm functions round6'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import bounded_sort
from ezbake_graph_spark.registry import register

_STRING_SQL = """
SELECT c_custkey,
       lower(c_name) AS name_lower,
       upper(c_mktsegment) AS seg_upper,
       trim(concat('  ', c_name, '  ')) AS name_trimmed,
       substring(c_name, 10, 9) AS key_digits,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
       split_part(c_name, '#', 1) AS name_prefix
FROM customer
ORDER BY c_custkey
"""


@register("scalar_string", oracle=_STRING_SQL, tags=("H1",))
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (H1)."""
    c = tables.load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.substring("c_name", 10, 9).alias("key_digits"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
    ).orderBy("c_custkey")


_DATETIME_SQL = """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofweek(o_orderdate) + 1 AS dow,
       date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
       CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS week_later,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
FROM orders
ORDER BY o_orderkey
"""


@register("scalar_datetime", oracle=_DATETIME_SQL, tags=("H2",))
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (H2). Dialect alignment: Spark dayofweek is
    1=Sunday..7 while DuckDB's is 0=Sunday..6, hence the +1 on the
    oracle side; both run in UTC."""
    o = tables.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).cast("long").alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate"), 7).alias("week_later"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    ).orderBy("o_orderkey")


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 2) AS price_2dp,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       round(sqrt(l_quantity), 6) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(exp(l_discount), 6) AS disc_exp,
       round(power(l_quantity, 2), 6) AS qty_sq,
       l_orderkey % 7 AS key_mod,
       CAST(sign(l_extendedprice - 50000) AS INT) AS above_mid
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@register("scalar_math", oracle=_MATH_SQL, tags=("H3",))
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (H3). ceil/floor cast to BIGINT on both sides
    (Spark returns LONG, DuckDB DOUBLE); libm outputs (ln/exp) are
    round6'd — 1-ulp cross-library drift sits ~10 orders below the
    rounding grid."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_2dp"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_extendedprice") - 50000).cast("int").alias("above_mid"),
    ).orderBy("l_orderkey", "l_linenumber")


_ARRAY_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
)
SELECT doc_id,
       len(tokens) AS n_tokens,
       len(list_distinct(tokens)) AS n_distinct,
       list_contains(tokens, 'spark') AS has_spark,
       array_to_string(tokens[1:3], ' ') AS first3,
       list_sort(list_distinct(tokens))[1] AS first_token_sorted,
       CAST(list_aggregate(list_transform(tokens, t -> length(t)), 'sum')
            AS BIGINT) AS total_chars
FROM toks
ORDER BY doc_id
"""


@register("scalar_array", oracle=_ARRAY_SQL, tags=("H4",))
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/aggregate (H4)."""
    d = tables.load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return (
        d.select("doc_id", tokens.alias("tokens"))
        .select(
            "doc_id",
            F.size("tokens").alias("n_tokens"),
            F.size(F.array_distinct("tokens")).alias("n_distinct"),
            F.array_contains("tokens", "spark").alias("has_spark"),
            F.array_join(F.slice("tokens", 1, 3), " ").alias("first3"),
            F.element_at(F.sort_array(F.array_distinct("tokens")), 1).alias(
                "first_token_sorted"
            ),
            F.aggregate(
                F.transform("tokens", lambda t: F.length(t)),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("total_chars"),
        )
        .orderBy("doc_id")
    )


_MAP_SQL = """
SELECT l_orderkey, l_linenumber,
       l_quantity AS qty_from_map,
       l_discount AS disc_from_map,
       2 AS n_keys,
       'disc|qty' AS keys_sorted
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
"""


@register("scalar_map", oracle=_MAP_SQL, tags=("H5",))
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (H5): build a MapType column, then extract scalars
    back out (element_at / map_keys / size) so the checked output is
    engine-portable plain columns."""
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_from_map"),
        F.element_at(m, "disc").alias("disc_from_map"),
        F.size(m).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), "|").alias("keys_sorted"),
    ).orderBy("l_orderkey", "l_linenumber")


_JSON_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / count(*) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# Spark-dialect twin of _JSON_SQL (get_json_object replaces DuckDB's
# json_extract_string); SQL-text form per tables.ensure_views.
_JSON_SPARK = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(k) AS DOUBLE) / count(*) AS avg_k,
       max(k) AS max_k
FROM (SELECT event_type,
             CAST(get_json_object(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


@register("scalar_json", oracle=_JSON_SQL, tags=("H6", "bench"))
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the dynamic-property column (H6) — the
    fixture instance of the reference's schema-less property bags
    (SURVEY §1.1): get_json_object over events.props."""
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_JSON_SPARK).transform(bounded_sort, "event_type")


_COND_SQL = """
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_returnflag, 'N'), 'NONE') AS flag_or_none,
       greatest(l_quantity, 25.0) AS qty_floor25,
       least(l_tax, l_discount) AS min_rate,
       CASE WHEN l_quantity IS NOT NULL THEN 1 ELSE 0 END AS qty_present
FROM lineitem
WHERE l_orderkey < 500
ORDER BY l_orderkey, l_linenumber
"""


@register("scalar_conditional", oracle=_COND_SQL, tags=("H7",))
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family (H7): coalesce/nullif/greatest/least."""
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
        F.when(F.col("l_quantity").isNotNull(), 1).otherwise(0).alias("qty_present"),
    ).orderBy("l_orderkey", "l_linenumber")


_BITWISE_SQL = """
SELECT event_id,
       user_id & 255 AS band,
       xor(user_id, event_id) AS x,
       user_id << 2 AS shl,
       event_id >> 3 AS shr,
       CAST(bit_count(user_id) AS INTEGER) AS bc
FROM events WHERE event_id < 1000 ORDER BY event_id
"""


@register("scalar_bitwise", oracle=_BITWISE_SQL, tags=("H-extra",))
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND, XOR, shifts, popcount — the hash/bucket
    primitives (used by simhash/minhash banding). All JVM codegen."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.expr("user_id & 255").alias("band"),
            F.expr("user_id ^ event_id").alias("x"),
            F.shiftleft("user_id", 2).alias("shl"),
            F.shiftright("event_id", 3).alias("shr"),
            F.bit_count("user_id").alias("bc"),
        )
        .orderBy("event_id")
    )


_STRUCT_SQL = """
SELECT o_orderkey,
       o_orderstatus AS status,
       round(o_totalprice, 6) AS price,
       CASE WHEN o_totalprice > 200000 THEN 'high' ELSE 'normal' END AS tier
FROM orders WHERE o_orderkey < 2000
ORDER BY o_orderkey
"""


@register("scalar_struct", oracle=_STRUCT_SQL, tags=("H-extra",))
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested record) construction and field access: pack
    columns into a struct, compute over it, unpack fields for output.
    The struct never leaves the JVM (codegen'd named_struct +
    GetStructField), and the OUTPUT is flat scalars — nested types
    stringify differently across engines (Spark Row vs DuckDB map), so
    flat extraction is also the hash-stable form. This is the
    dynamic-property-bag shape (SURVEY §1.2) the reference's property
    graph carries per vertex/edge."""
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    packed = o.withColumn(
        "props",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
        ),
    ).withColumn(
        "tier",
        F.when(F.col("props.price") > 200000, "high").otherwise("normal"),
    )
    return packed.select(
        "o_orderkey",
        F.col("props.status").alias("status"),
        F.round(F.col("props.price"), 6).alias("price"),
        "tier",
    ).orderBy("o_orderkey")


_URL_SQL = """
SELECT p_partkey,
       'https' AS proto,
       'shop.example.com' AS host,
       '/parts/' || CAST(p_partkey AS VARCHAR) AS path,
       CAST(p_size AS VARCHAR) AS size_param
FROM part
WHERE p_partkey < 200
ORDER BY p_partkey
"""


@register("scalar_url", oracle=_URL_SQL, tags=("H8", "M97"))
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family (H8): build a URL per part row, then extract
    protocol / host / path / one query parameter with ``parse_url`` —
    the web-crawl normalization primitive (a 100 TB crawl pipeline
    keys dedup and domain quotas on exactly these pieces). All JVM
    codegen string ops, map-side only. The oracle reconstructs the
    expected pieces directly from the source columns, so a parse that
    drops or mangles any component fails the hash."""
    p = tables.load(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    url = F.concat(
        F.lit("https://shop.example.com/parts/"),
        F.col("p_partkey").cast("string"),
        F.lit("?size="),
        F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("size")).alias("size_param"),
    ).orderBy("p_partkey")


_TRY_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_linenumber = 1 THEN NULL
            ELSE round(l_extendedprice / (l_linenumber - 1), 6) END AS price_per_line,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
       TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                     THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                     ELSE l_returnflag END AS INTEGER) AS mixed_as_int
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
"""


@register("scalar_try_arith", oracle=_TRY_SQL, tags=("H9", "M101"))
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family (H9): ``try_divide`` yields NULL on
    division by zero and ``try_cast`` NULL on malformed input, instead
    of failing the job — the ingestion-hardening primitives (a 100 TB
    crawl batch always contains malformed rows; one poison value must
    not kill a 6-hour job). All JVM codegen; the oracle expresses the
    same NULL-on-error semantics via CASE/TRY_CAST. The div result is
    a per-row scalar at ~1e4 magnitude (regime-1 round6 safe; dividing
    by the small float discount instead pushes ~1e8 magnitudes where
    the engines' round() implementations pick adjacent 6-dp doubles).
    mixed_as_int feeds a column that alternates integer strings and
    letters: the former parse, the latter go NULL, identically in both
    engines. (Decimal strings would NOT be portable: DuckDB's TRY_CAST
    reads '44.0' as 44 where Spark yields NULL — measured, avoided.)"""
    li = tables.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_extendedprice", F.col("l_linenumber") - 1), 6
        ).alias("price_per_line"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.when(
            F.col("l_linenumber") % 2 == 0,
            F.col("l_quantity").cast("long").cast("string"),
        )
        .otherwise(F.col("l_returnflag"))
        .try_cast("int")
        .alias("mixed_as_int"),
    ).orderBy("l_orderkey", "l_linenumber")


_VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
ORDER BY event_id
LIMIT 2000
"""


@register("scalar_variant", oracle=_VARIANT_SQL, tags=("H6b", "M115"))
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured type (H6b, Spark 4): parse the JSON
    props column once into the binary VARIANT encoding, then extract
    typed fields with variant_get — the modern replacement for
    per-access get_json_object string re-parsing (VARIANT parses once
    and stores a traversable binary; repeated field extraction is
    pointer chasing, not text parsing — the difference between O(fields)
    and O(fields × text length) on a 100 TB event lake). The oracle
    extracts the same field from the same JSON text."""
    ev = tables.load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        )
        .orderBy("event_id")
        .limit(2000)
    )
