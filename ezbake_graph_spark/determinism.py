"""Determinism helpers (SURVEY.md §5.3).

The driver's correctness gate hashes result values order-insensitively,
so every floating-point output must be *bit-identical* between Spark
and the DuckDB oracle — not merely close.

Two regimes:

1. **Per-row scalar expressions** (x*(1-d), cosine of two vectors, ...)
   are IEEE-deterministic: the same double inputs produce the same
   double outputs in both engines. Rounding to 6 dp afterwards is then
   also deterministic. ``round6`` is enough.

2. **Aggregation over many rows** (SUM/AVG of DOUBLE) depends on
   summation order, which differs between engines and between runs
   (partitioning!). ``round(sum, 6)`` does NOT fix this: at 60k rows a
   double sum of ~1e8 carries absolute drift far above 1e-6.
   ``money_sum_expr`` instead scales each row to integer micro-units
   (round(x*1e6) → BIGINT) and sums exactly — integer addition is
   order-free — then divides back to natural scale. Both engines
   produce the identical double. The matching oracle-side SQL is
   produced by ``sql_money_sum``.

AVG drift is ~eps*sqrt(n)*avg ≈ 1e-10 at our scales, so plain
``round(avg(x), 6)`` is safe; same for stddev/corr/percentile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-units


def bounded_sort(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Total-order a GROUP-COUNT-BOUNDED result without the
    RangePartitioning exchange a plain ``orderBy`` plans.

    ``orderBy`` samples the input in a separate job to compute range
    bounds — a sequential ~0.1 s driver round-trip that dominates when
    the result is a handful of group rows (measured at sf0.1:
    agg_pricing_q1 0.39 s → 0.31 s, join_star_q5 0.39 s → 0.29 s warm
    min). ``coalesce(1)`` + ``sortWithinPartitions`` is an identical
    total order with no exchange at all.

    ONLY for dimension/group-bounded outputs (nations, flags, buckets,
    hour spines): a single partition of data-proportional rows would
    serialize the whole result through one task at 100 TB.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)


def round6(col: Column | str) -> Column:
    return F.round(col, 6)


def money_sum_expr(col: Column) -> Column:
    """Order-insensitive exact SUM of a DOUBLE column, natural scale.

    sum(cast(round(x * 1e6) as bigint)) / 1e6 — the inner cast is exact
    (round yields an integer-valued double), the integer sum is exact,
    and the final division is a single deterministic IEEE op.

    Deliberately NO final round(,6): the identical integer divided by
    the identical constant is already bit-identical in both engines,
    while round() itself DIVERGES once |sum| is large enough that
    ulp(x) approaches the 1e-6 grid (~4e9 — hit by sf0.1 Q1 charge
    sums: Spark rounds the shortest-decimal repr via BigDecimal,
    DuckDB rounds the binary double, and they pick ADJACENT doubles).
    """
    micro = F.round(col * F.lit(SCALE)).cast("long")
    return F.sum(micro).cast("double") / F.lit(SCALE)


def sql_money_sum(expr: str) -> str:
    """DuckDB-side twin of ``money_sum_expr`` for an SQL expression."""
    return (
        f"CAST(sum(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000"
    )


def money_avg_expr(col: Column) -> Column:
    """Order-insensitive exact AVG of a DOUBLE column.

    Exact integer micro-sum divided by the exact count — two
    deterministic IEEE divisions, identical in both engines. No final
    round (see ``money_sum_expr``): it would re-introduce divergence on
    exact halfway rationals (micro-sum/count landing on .5e-6 grid
    points, e.g. graph_aggmsg's 4105.5534375).
    """
    micro = F.round(col * F.lit(SCALE)).cast("long")
    return (F.sum(micro).cast("double") / F.count(F.lit(1))) / F.lit(SCALE)


def sql_money_avg(expr: str) -> str:
    """DuckDB-side twin of ``money_avg_expr``."""
    return (
        f"(CAST(sum(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / count(*)) / 1000000"
    )


def round6_avg_expr(col: Column) -> Column:
    return F.round(F.avg(col), 6)
