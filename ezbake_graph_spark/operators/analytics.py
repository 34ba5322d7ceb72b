"""Product-analytics workloads over the events stream image (§2M).

Two classic end-user analyses composed from the engine's own
primitives — these are the queries a reference user actually runs on
an event store, demonstrating that the operator surface composes:

- ``events_cohort_retention``: weekly signup-cohort retention matrix.
  Two keyed aggregations (first-seen per user; cohort x offset
  distinct-user counts) — linear, map-side-combinable shuffles.
- ``events_funnel_paths``: 30-min-gap sessionization (the same strict
  gap semantics as ``stream_session``) + ordered event-type path per
  session + top-20 path frequencies. The path build shuffles once per
  window/groupBy on (user_id); path strings stay bounded because
  sessions are gap-bounded.

Determinism: session ordering keys (ts, event_id) are unique; the
Spark path is built by sorting an array of (ts, event_id, type)
structs — bit-identical to DuckDB's ``string_agg(... ORDER BY ts,
event_id)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

_COHORT_SQL = """
WITH first_seen AS (
  SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(datediff('week', f.cohort_week,
                       CAST(date_trunc('week', e.ts) AS DATE))
              AS INTEGER) AS week_offset
  FROM events e JOIN first_seen f USING (user_id)
)
SELECT cohort_week, week_offset, count(*) AS n_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@register("events_cohort_retention", oracle=_COHORT_SQL, tags=("ext", "analytics"))
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users active N weeks after first seen.

    Week offsets are exact (both engines truncate weeks to Monday, so
    the day difference is a multiple of 7 and the division is exact).
    """
    ev = tables.load(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    first_seen = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        ev.select("user_id", week.alias("activity_week"))
        .join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


_FUNNEL_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '->' ORDER BY ts, event_id) AS path
  FROM sess GROUP BY user_id, session_id
)
SELECT path, count(*) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@register("events_funnel_paths", oracle=_FUNNEL_SQL, tags=("ext", "analytics"))
def events_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journey paths (gaps-and-islands sessionize +
    ordered path aggregation)."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # µs-exact gap: casting ts to long would floor to seconds and
    # disagree with the oracle's INTERVAL compare on gaps inside
    # (1800 s, 1801 s).
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
        )
        .over(run)
        .alias("session_id"),
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            "->",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )
