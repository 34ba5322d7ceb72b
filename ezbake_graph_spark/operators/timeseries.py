"""Time-series operators over the events stream image: gap-filled
resampling and OHLC-style first/last aggregation — the hypertable
rollup surface re-expressed as DataFrame plans.

Scale notes: both ops are one keyed shuffle (groupBy type×hour). The
gap-fill's hour spine is generated from the aggregated bounds — a
2-row input — so the sequence/explode is O(hours), never O(events),
and joins the (tiny) spine against the aggregated counts, not raw
events. first/last use min_by/max_by over a (ts, event_id) composite —
a deterministic total order per SURVEY §5.3 rule 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import money_sum_expr
from ezbake_graph_spark.registry import register

_GAPFILL_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) lo, date_trunc('hour', max(ts)) hi FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), cnt AS (
  SELECT event_type t, date_trunc('hour', ts) h, count(*) n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour_start,
       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
       (n IS NULL) AS gap_filled
FROM hours CROSS JOIN types
LEFT JOIN cnt ON hour_start = h AND event_type = t
ORDER BY event_type, hour_start
"""


@register("ts_gapfill", oracle=_GAPFILL_SQL, tags=("ext", "timeseries"))
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly counts per event type: a dense hour spine
    (sequence over the aggregated min/max bounds × distinct types)
    left-joined against the hourly aggregate."""
    ev = tables.load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour_start")
    )
    types = ev.select("event_type").distinct()
    cnt = (
        ev.groupBy(
            F.col("event_type").alias("t"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = hours.crossJoin(types)
    return (
        spine.join(
            cnt,
            (spine.hour_start == cnt.h) & (spine.event_type == cnt.t),
            "left",
        )
        .select(
            "event_type",
            "hour_start",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.col("n").isNull().alias("gap_filled"),
        )
        .orderBy("event_type", "hour_start")
    )


_RESAMPLE_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS hour_start,
       count(*) AS n_events,
       round(arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id), 6)
         AS first_value,
       round(arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000 + event_id), 6)
         AS last_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, hour_start
"""


@register("ts_resample", oracle=_RESAMPLE_SQL, tags=("ext", "timeseries"))
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC-style hourly resample: first/last (by event time with
    event_id tie-break — Spark orders the struct lexicographically,
    the oracle a HUGEINT composite; same total order) plus min/max."""
    ev = tables.load(spark, sf_dir, "events")
    ord_key = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min_by("value", ord_key), 6).alias("first_value"),
            F.round(F.max_by("value", ord_key), 6).alias("last_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("event_type", "hour_start")
    )


_HYPER_SQL = """
SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
       CASE WHEN GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP)) = 0
            THEN CAST(date_trunc('day', ts) AS TIMESTAMP) END AS day,
       CASE WHEN GROUPING(CAST(date_trunc('hour', ts) AS TIMESTAMP)) = 0
            THEN CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000
         AS sum_value
FROM events
GROUP BY GROUPING SETS (
  (CAST(date_trunc('week', ts) AS TIMESTAMP)),
  (CAST(date_trunc('week', ts) AS TIMESTAMP),
   CAST(date_trunc('day', ts) AS TIMESTAMP)),
  (CAST(date_trunc('week', ts) AS TIMESTAMP),
   CAST(date_trunc('day', ts) AS TIMESTAMP),
   CAST(date_trunc('hour', ts) AS TIMESTAMP)))
ORDER BY week, day NULLS FIRST, hour NULLS FIRST
"""


@register("ts_rollup_hypertable", oracle=_HYPER_SQL, tags=("ext", "timeseries"))
def ts_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: hour→day→week continuous
    aggregates in ONE pass (rollup = hierarchical grouping sets), the
    way a time-series store maintains multi-resolution views. Spark
    computes all three granularities with a single Expand + hash
    aggregate — one shuffle, map-side partial aggregation at every
    level; at 100 TB this replaces three separate scans. The grand
    total row is excluded (week IS NOT NULL) so the week level is the
    coarsest, matching the hypertable view."""
    ev = tables.load(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    return (
        ev.rollup(week.alias("week"), day.alias("day"), hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum_expr(F.col("value")).alias("sum_value"),
        )
        .filter(F.col("week").isNotNull())
        .orderBy("week", F.col("day").asc_nulls_first(), F.col("hour").asc_nulls_first())
    )
