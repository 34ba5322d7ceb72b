"""UDF / UDAF / UDTF surface (SURVEY.md §2L).

The UDF ladder, slowest → fastest:
- L1 row-at-a-time Python UDF — correctness escape hatch only; each
  row round-trips the Python worker.
- L2 pandas (Arrow-vectorized) scalar UDF — the acceptable Python hot
  path (~10-100x L1).
- L3 applyInPandas grouped-map — per-group pandas transforms.
- L4 Python UDTF — one row in, many rows out.

Oracles reimplement each function in DuckDB SQL, so the checked
contract is the *function semantics*, not the plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

_SCALAR_SQL = """
SELECT c_custkey,
       CAST(list_aggregate(list_transform(string_split(CAST(c_custkey AS VARCHAR), ''),
                                          x -> CAST(x AS INT)), 'sum')
            AS BIGINT) AS digit_sum,
       CAST(c_custkey % 97 AS BIGINT) AS key_mod97
FROM customer
ORDER BY c_custkey
"""


@register("udf_scalar", oracle=_SCALAR_SQL, tags=("L1",))
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (L1): digit sum of the key."""

    @udf("int")
    def digit_sum(k: int) -> int:
        return sum(int(ch) for ch in str(k))

    c = tables.load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        digit_sum("c_custkey").alias("digit_sum"),
        (F.col("c_custkey") % 97).alias("key_mod97"),
    ).orderBy("c_custkey")


_PANDAS_SQL = """
SELECT event_id,
       round(ln(1 + value) * 10, 6) AS log_scaled
FROM events
ORDER BY event_id
"""


@register("udf_pandas", oracle=_PANDAS_SQL, tags=("L2",))
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF (L2): numpy kernel per batch."""
    import numpy as np

    @pandas_udf("double")
    def log_scaled(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(v.values) * 10, 6))

    ev = tables.load(spark, sf_dir, "events")
    return ev.select("event_id", log_scaled("value").alias("log_scaled")).orderBy(
        "event_id"
    )


_GROUPED_SQL = """
WITH m AS (
  SELECT user_id, CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       CAST((2 * sum(micro) + count(*)) // (2 * count(*)) AS DOUBLE)
           / 1000000 AS mean_value,
       CAST(max(micro) - min(micro) AS DOUBLE) / 1000000 AS value_range
FROM m
GROUP BY user_id
ORDER BY user_id
"""


@register("udf_grouped", oracle=_GROUPED_SQL, tags=("L3",))
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (L3): per-user stats computed inside
    a pandas kernel.

    Every value is quantized to micro units with half-up floor(x*1e6+0.5)
    — the identical IEEE double expression the oracle uses — and the mean
    is an exact integer half-up division, so no rounding-mode divergence
    (Python banker's vs DuckDB half-away) can flake the value hash.
    """
    import numpy as np

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        micro = np.floor(pdf["value"].values * 1_000_000 + 0.5).astype("int64")
        n = len(pdf)
        s = int(micro.sum())
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n],
                "mean_value": [float((2 * s + n) // (2 * n)) / 1_000_000],
                "value_range": [float(int(micro.max()) - int(micro.min())) / 1_000_000],
            }
        )

    ev = tables.load(spark, sf_dir, "events").select("user_id", "value")
    schema = "user_id bigint, n_events bigint, mean_value double, value_range double"
    return ev.groupBy("user_id").applyInPandas(per_user, schema).orderBy("user_id")


_UDTF_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decile,
       count(*) AS n_events
FROM events
GROUP BY k_decile
ORDER BY k_decile
"""


@register("udtf_explode_props", oracle=_UDTF_SQL, tags=("L4",))
def udtf_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (L4): parse the dynamic-property JSON bag into
    (key, value) rows — the reference's schema-less property model [R]
    flattened by a table function — then aggregate."""
    import json

    @udtf(returnType="prop_key string, prop_value bigint")
    class ExplodeProps:
        def eval(self, props: str):
            if props:
                for k, v in json.loads(props).items():
                    yield k, int(v)

    spark.udtf.register("explode_props", ExplodeProps)
    ev = tables.load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_for_udtf")
    flat = spark.sql(
        """
        SELECT p.prop_key, p.prop_value
        FROM events_for_udtf, LATERAL explode_props(props) p
        """
    )
    return (
        flat.filter(F.col("prop_key") == "k")
        .groupBy((F.col("prop_value") / 10).cast("long").alias("k_decile"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("k_decile")
    )


_ARROW_SQL = """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
       CASE WHEN length(text) % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
FROM documents
ORDER BY doc_id
"""


@register("udf_arrow", oracle=_ARROW_SQL, tags=("L2b", "M100"))
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (L2b, Spark 3.5+/4 ``useArrow=True``):
    the scalar-UDF API with Arrow batch transfer underneath — the
    middle rung between L1 (row pickling) and L2 (pandas vectorized).
    The function body is still per-row Python, but serialization cost
    drops to Arrow columnar batches, typically several-fold over L1.
    Integer/string outputs only, so no float parity question. Use when
    porting row-wise logic that resists vectorization; prefer L2 for
    numeric kernels."""

    @udf("long", useArrow=True)
    def token_count(text: str) -> int:
        return len(text.split(" "))

    @udf("string", useArrow=True)
    def parity(text: str) -> str:
        return "even" if len(text) % 2 == 0 else "odd"

    d = tables.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        parity("text").alias("parity"),
    ).orderBy("doc_id")


_MAPARROW_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       length(string_split(text, ' ')) AS n_tokens
FROM documents
ORDER BY doc_id
"""


@register("udf_map_in_arrow", oracle=_MAPARROW_SQL, tags=("L5", "M106"))
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (L5): the zero-copy end of the UDF ladder — the
    function receives pyarrow RecordBatches and returns RecordBatches,
    skipping even the pandas conversion of L2/L3. This is the right
    rung for columnar-native Python kernels (tokenizers that accept
    Arrow buffers, feature extractors emitting fixed-width arrays):
    per-batch overhead is one FFI hop. Here the kernel computes chars
    + whitespace token counts with pyarrow.compute (C++ vectorized,
    no per-row Python); the oracle recomputes both in SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")

    def kernel(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.utf8_length(text).cast(pa.int64()),
                    pc.list_value_length(pc.split_pattern(text, " ")).cast(
                        pa.int64()
                    ),
                ],
                ["doc_id", "n_chars", "n_tokens"],
            )

    out = d.mapInArrow(kernel, "doc_id long, n_chars long, n_tokens long")
    return out.orderBy("doc_id")


_UDAF_SQL = """
WITH m AS (
  SELECT event_type, CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       CAST(median(micro) AS DOUBLE) / 1000000 AS median_value
FROM m
GROUP BY event_type
ORDER BY event_type
"""


@register("udaf_pandas_median", oracle=_UDAF_SQL, tags=("L6", "M119"))
def udaf_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas GROUPED_AGG UDAF (L6): a custom aggregate used directly
    inside ``groupBy().agg()`` — the missing rung between L3 (grouped-
    map, whole-group DataFrame in/out) and built-in aggregates. Spark
    ships each group's column as one Arrow batch to the Python worker,
    which reduces it to a scalar; partial aggregation does NOT apply
    (the full group must co-locate), so at 100 TB this is the shape for
    moderate-cardinality group keys — for per-key medians over skewed
    keys, pre-bucket or use approx_percentile instead.

    Kernel determinism: values quantized to micro ints with the same
    floor(x*1e6+0.5) the oracle uses; even-count median (a+b)/2 is
    exact in binary (ints < 2^52), matching DuckDB's interpolating
    median over BIGINT cast to DOUBLE."""
    import numpy as np

    @pandas_udf("double")
    def median_micro(v: pd.Series) -> float:
        a = np.sort(np.floor(v.values * 1_000_000 + 0.5).astype("int64"))
        n = len(a)
        return (float(a[(n - 1) // 2]) + float(a[n // 2])) / 2.0 / 1_000_000

    # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count is a second pandas UDAF rather than F.count.
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            n_rows("value").alias("n_events"),
            median_micro("value").alias("median_value"),
        )
        .orderBy("event_type")
    )


_ITER_UDF_SQL = """
SELECT doc_id,
       CASE WHEN n_chars < 150 THEN 'short'
            WHEN n_chars < 400 THEN 'medium'
            ELSE 'long' END AS length_class,
       n_chars * 4 // 3 AS est_tokens
FROM documents
ORDER BY doc_id
"""


@register("udf_pandas_iter", oracle=_ITER_UDF_SQL, tags=("L2c", "M138"))
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator pandas UDF (L2c): ``Iterator[pd.Series] →
    Iterator[pd.Series]`` — the rung whose point is AMORTIZED
    PER-PARTITION INIT: the body runs once per worker task, builds its
    expensive state (a model, a tokenizer — here a deterministic
    threshold table standing in for one), then streams every Arrow
    batch through it. The per-batch math is identical to L2; what
    changes is where setup cost lands. This is the shape for "score
    every document with a loaded model" at 100 TB: load once per task,
    not once per batch (L2) or once per row (L1).

    Kernel outputs are strings/ints bucketed from exact ints — no
    float parity surface. est_tokens uses floor division (n*4)//3,
    matching the oracle's integer // exactly."""
    @pandas_udf("string")
    def length_class(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time "model load" per task — deliberately outside the loop
        thresholds = [(150, "short"), (400, "medium")]
        for v in batches:
            out = pd.Series(["long"] * len(v), index=v.index)
            for cut, label in reversed(thresholds):
                out[v < cut] = label
            yield out

    @pandas_udf("long")
    def est_tokens(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for v in batches:
            yield (v * 4) // 3

    d = tables.load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        length_class("n_chars").alias("length_class"),
        est_tokens("n_chars").alias("est_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# SQL-declared UDF (M228)

_SQL_UDF_SQL = """
SELECT CASE WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 10 THEN 'mid'
            ELSE 'small' END AS tier,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                     AS BIGINT)) AS BIGINT) AS disc_cents
FROM lineitem
GROUP BY tier
ORDER BY tier
"""


@register("udf_sql_declared", oracle=_SQL_UDF_SQL, tags=("L7", "M228"))
def udf_sql_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-declared scalar functions (Spark 4 ``CREATE FUNCTION ...
    RETURN <expr>``): business logic named and shared in pure SQL —
    unlike every python rung of the L tier, the body INLINES into the
    calling plan (Catalyst substitutes the expression), so a SQL UDF
    keeps whole-stage codegen, pushdown, and vectorization; it is the
    zero-cost way to share semantics (tiering rules, money math)
    across queries, with python UDFs reserved for logic SQL cannot
    express. The oracle is the inlined expression itself — the
    equivalence that makes the feature safe."""
    tables.load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_tier(q DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN q >= 40 THEN 'bulk' "
        "WHEN q >= 10 THEN 'mid' ELSE 'small' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * (1 - d) * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT qty_tier(l_quantity) AS tier,
               count(*) AS n,
               sum(disc_cents(l_extendedprice, l_discount)) AS disc_cents
        FROM lineitem
        GROUP BY tier
        ORDER BY tier
        """
    )
