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

from pyspark.sql import DataFrame, SparkSession, Window
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


_EWMA_SQL = """
WITH m AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS x
  FROM events
), l AS (
  SELECT user_id, ts, event_id, x,
         lag(x, 1) OVER w AS x1, lag(x, 2) OVER w AS x2,
         lag(x, 3) OVER w AS x3, lag(x, 4) OVER w AS x4,
         lag(x, 5) OVER w AS x5, lag(x, 6) OVER w AS x6,
         lag(x, 7) OVER w AS x7
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       CAST(128 * x + 64 * coalesce(x1, 0) + 32 * coalesce(x2, 0)
            + 16 * coalesce(x3, 0) + 8 * coalesce(x4, 0)
            + 4 * coalesce(x5, 0) + 2 * coalesce(x6, 0)
            + coalesce(x7, 0) AS DOUBLE)
       / ((128 + CASE WHEN x1 IS NULL THEN 0 ELSE 64 END
               + CASE WHEN x2 IS NULL THEN 0 ELSE 32 END
               + CASE WHEN x3 IS NULL THEN 0 ELSE 16 END
               + CASE WHEN x4 IS NULL THEN 0 ELSE 8 END
               + CASE WHEN x5 IS NULL THEN 0 ELSE 4 END
               + CASE WHEN x6 IS NULL THEN 0 ELSE 2 END
               + CASE WHEN x7 IS NULL THEN 0 ELSE 1 END) * 1000000)
       AS ewma
FROM l
"""


@register("ts_ewma", oracle=_EWMA_SQL, tags=("ext", "timeseries", "M59"))
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of event value
    per user, over the trailing 8 events in (ts, event_id) order.

    Float determinism: weights are powers of two over micro-unit
    BIGINTs, so numerator (≤ 255·5e8 ≈ 1.2e11 ≪ 2^53) and denominator
    (≤ 255e6) are EXACT integers in both engines; the single final
    division is one deterministic IEEE op — no rounding needed. A
    true infinite-horizon EWMA is inherently sequential; the 8-term
    truncation (residual weight 2⁻⁸) keeps it a fixed-frame window —
    one keyed shuffle on user_id, whole-stage-codegen'd, no Python.
    """
    ev = tables.load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * F.lit(1_000_000)).cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("x")] + [F.lag("x", i).over(w) for i in range(1, 8)]
    weights = [128, 64, 32, 16, 8, 4, 2, 1]
    num = sum(
        (F.coalesce(c, F.lit(0)) * F.lit(wt) for c, wt in zip(lags, weights)),
        start=F.lit(0),
    )
    den = sum(
        (F.when(c.isNull(), 0).otherwise(wt) for c, wt in zip(lags, weights)),
        start=F.lit(0),
    )
    return ev.select(
        "user_id",
        "event_id",
        (num.cast("double") / (den * F.lit(1_000_000))).alias("ewma"),
    )


_INTERP_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) lo, date_trunc('hour', max(ts)) hi FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), hourly AS (
  SELECT event_type t, date_trunc('hour', ts) h,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS micro
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type, hour_start, micro
  FROM hours CROSS JOIN types
  LEFT JOIN hourly ON hour_start = h AND event_type = t
), ctx AS (
  SELECT event_type, hour_start, micro,
         last_value(micro IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN micro IS NOT NULL THEN hour_start END IGNORE NULLS)
           OVER wp AS prev_h,
         first_value(micro IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN micro IS NOT NULL THEN hour_start END IGNORE NULLS)
           OVER wf AS next_h
  FROM spine
  WINDOW wp AS (PARTITION BY event_type ORDER BY hour_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY hour_start
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hour_start,
       CASE
         WHEN micro IS NOT NULL THEN CAST(micro AS DOUBLE) / 1000000
         WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
         ELSE CAST(prev_v * datediff('hour', hour_start, next_h)
                   + next_v * datediff('hour', prev_h, hour_start) AS DOUBLE)
              / (datediff('hour', prev_h, next_h) * 1000000)
       END AS sum_value,
       (micro IS NULL) AS interpolated
FROM ctx
"""


@register("ts_interpolate", oracle=_INTERP_SQL, tags=("ext", "timeseries", "M60"))
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense hourly spine: missing
    (event_type, hour) cells get the time-weighted average of the
    nearest non-missing hourly sums on each side; edge gaps stay NULL.

    Float determinism: hourly sums are exact micro-unit integers, and
    the interpolation (prev·(len−pos) + next·pos) / len is an exact
    integer rational — a single IEEE division, identical in both
    engines, no rounding. The spine is O(hours×types), built from a
    2-row aggregate (never O(events)); the gap lookups are two window
    passes over the spine, so fact-table cost is one hourly aggregate
    regardless of scale.
    """
    ev = tables.load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour_start"
        )
    )
    types = ev.select("event_type").distinct()
    hourly = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(F.round(F.col("value") * F.lit(1_000_000)).cast("long")).alias(
            "micro"
        )
    )
    spine = hours.crossJoin(types)
    spine = spine.join(
        hourly, (spine.hour_start == hourly.h) & (spine.event_type == hourly.t), "left"
    ).select("event_type", "hour_start", "micro")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked_hour = F.when(F.col("micro").isNotNull(), F.col("hour_start"))
    ctx = spine.select(
        "event_type",
        "hour_start",
        "micro",
        F.last("micro", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(marked_hour, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("micro", ignorenulls=True).over(wf).alias("next_v"),
        F.first(marked_hour, ignorenulls=True).over(wf).alias("next_h"),
    )
    hdiff = lambda a, b: (  # noqa: E731
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / 3600
    ).cast("long")
    interp = (
        F.col("prev_v") * hdiff(F.col("hour_start"), F.col("next_h"))
        + F.col("next_v") * hdiff(F.col("prev_h"), F.col("hour_start"))
    ).cast("double") / (hdiff(F.col("prev_h"), F.col("next_h")) * F.lit(1_000_000))
    return ctx.select(
        "event_type",
        "hour_start",
        F.when(F.col("micro").isNotNull(), F.col("micro").cast("double") / 1_000_000)
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(interp)
        .alias("sum_value"),
        F.col("micro").isNull().alias("interpolated"),
    )


_SCD2_SQL = """
SELECT user_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       round(value, 6) AS value
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, valid_from
"""


@register("ts_scd2_intervals", oracle=_SCD2_SQL, tags=("ext", "M82"))
def ts_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) interval construction:
    turn a changelog into [valid_from, valid_to) validity rows — each
    record's valid_to is the next change's timestamp, NULL marks the
    current version. One lead() window per entity key = one keyed
    shuffle, linear at any scale; this is how a 100 TB dimension
    history is built from CDC events without self-joins (the
    join-based formulation is quadratic per hot key). Ties order by
    event_id so both engines pick identical interval boundaries."""
    ev = tables.load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.round("value", 6).alias("value"),
    ).orderBy("user_id", "valid_from")


_LOCF_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) lo, date_trunc('hour', max(ts)) hi FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), hourly AS (
  SELECT event_type t, date_trunc('hour', ts) h,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS sum_micro
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT event_type, hour_start, sum_micro
  FROM hours CROSS JOIN types
  LEFT JOIN hourly ON hour_start = h AND event_type = t
)
SELECT event_type, hour_start,
       CAST(last_value(sum_micro IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY hour_start
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000
         AS carried_sum,
       (sum_micro IS NULL) AS carried
FROM spine
ORDER BY event_type, hour_start
"""


@register("ts_locf", oracle=_LOCF_SQL, tags=("ext", "timeseries", "M89"))
def ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward resample: the dense hourly
    spine per event type (same construction as ts_gapfill), with each gap
    hour carrying the most recent observed hourly sum instead of zero
    — the step-function fill for state-like metrics (a gauge keeps its
    last reading; contrast ts_gapfill's zero-fill for counters and
    ts_interpolate's linear blend). First-hours before any observation
    stay NULL — LOCF has nothing to carry, and inventing 0 would be a
    lie the oracle hash could not distinguish from real data.

    Exactness: the carried metric is an exact integer micro-sum; the
    fill is a last-IGNORE-NULLS window over the unique hour order —
    pure value transport, no arithmetic — and the final /1e6 is one
    IEEE division. Scale: spine explode + one keyed shuffle to the
    (type) window; the spine is |types| x |hours| rows, trivial beside
    the event scan."""
    ev = tables.load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour_start"
        )
    )
    types = ev.select("event_type").distinct()
    hourly = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("sum_micro"))
    spine = hours.crossJoin(types)
    joined = spine.join(
        hourly,
        (spine.hour_start == hourly.h) & (spine.event_type == hourly.t),
        "left",
    ).select("event_type", "hour_start", "sum_micro")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour_start",
        (
            F.last("sum_micro", ignorenulls=True).over(w).cast("double") / 1_000_000
        ).alias("carried_sum"),
        F.col("sum_micro").isNull().alias("carried"),
    ).orderBy("event_type", "hour_start")


_MAD_SQL = """
WITH m AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 1000000) AS BIGINT) AS x
  FROM events
), med AS (
  SELECT event_type AS t,
         CAST(quantile_cont(2 * x, 0.5) AS BIGINT) AS m2
  FROM m GROUP BY event_type
), d AS (
  SELECT event_id, event_type, value, abs(2 * x - m2) AS dev
  FROM m JOIN med ON event_type = t
), mad AS (
  SELECT event_type AS t,
         CAST(quantile_cont(2 * dev, 0.5) AS BIGINT) AS mad2
  FROM d GROUP BY event_type
)
SELECT event_id, event_type, round(value, 6) AS value
FROM d JOIN mad ON event_type = t
WHERE 2 * dev > 3 * mad2
ORDER BY event_id
"""


@register("ts_anomaly_mad", oracle=_MAD_SQL, tags=("ext", "timeseries", "M94"))
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: flag events whose value deviates from
    the per-type MEDIAN by more than 3x the median absolute deviation —
    the MAD gate is the robust twin of events_zscore_outliers (a few
    extreme outliers inflate a stddev and mask each other; they cannot
    move a median).

    Exactness: values become integer micro-units; medians are taken of
    DOUBLED integers so the even-count midpoint (a+b)/2 is itself an
    integer (no .5, no float), and the 3-sigma-style gate compares pure
    integers (2*dev vs 3*mad2) — the flag boundary cannot flip between
    engines, which is precisely what breaks naive float outlier oracles.

    Plan: two grouped exact percentiles over the 5 types (partial+final
    hash agg; percentile state is per-group, small), each broadcast
    back onto the stream — a map-side filter, no event shuffle at all.
    At 100 TB swap the exact percentile for approx_percentile with the
    same doubling trick (the gate then carries the sketch's rank
    error, declared rows-only)."""
    ev = tables.load(spark, sf_dir, "events")
    x = F.round(F.col("value") * 1_000_000).cast("long")
    m = ev.select("event_id", "event_type", "value", x.alias("x"))
    med = m.groupBy(F.col("event_type").alias("t")).agg(
        F.expr("CAST(percentile(2 * x, 0.5) AS BIGINT)").alias("m2")
    )
    d = m.join(F.broadcast(med), m.event_type == med.t).select(
        "event_id",
        "event_type",
        "value",
        F.abs(2 * F.col("x") - F.col("m2")).alias("dev"),
    )
    mad = d.groupBy(F.col("event_type").alias("t")).agg(
        F.expr("CAST(percentile(2 * dev, 0.5) AS BIGINT)").alias("mad2")
    )
    return (
        d.join(F.broadcast(mad), d.event_type == mad.t)
        .filter(2 * F.col("dev") > 3 * F.col("mad2"))
        .select("event_id", "event_type", F.round("value", 6).alias("value"))
        .orderBy("event_id")
    )


_SEASONAL_SQL = """
WITH m AS (
  SELECT event_id, event_type, CAST(hour(ts) AS INTEGER) AS hod,
         CAST(round(value * 1000000) AS BIGINT) AS x
  FROM events
), base AS (
  SELECT event_type AS t, hod AS h, count(*) AS n, sum(x) AS s
  FROM m GROUP BY event_type, hod
)
SELECT event_id, event_type, hod,
       (CAST(s AS DOUBLE) / n) / 1000000 AS seasonal_mean,
       (CAST(x * n - s AS DOUBLE) / n) / 1000000 AS residual
FROM m JOIN base ON event_type = t AND hod = h
ORDER BY event_id
LIMIT 2000
"""


@register("ts_seasonal_baseline", oracle=_SEASONAL_SQL, tags=("ext", "timeseries", "M105"))
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal baseline + residual: per (event_type, hour-of-day) mean
    as the daily-seasonality profile, and each event's deviation from
    its profile cell — the detrending step before any time-series
    anomaly or forecast model (the residual, not the raw value, is
    what downstream detectors consume; compare ts_anomaly_mad which
    gates on the undetrended distribution).

    Exactness: the residual is computed as (x*n - s)/n in exact integer
    micro-units BEFORE any division — x - s/n would subtract two
    doubles of different provenance and inherit the division's
    representation error; x*n - s is a single exact integer, and the
    two final IEEE divisions are deterministic in both engines.
    Plan: one tiny grouped aggregate (|types| x 24 cells) broadcast
    back onto the stream — map-side join, no event shuffle."""
    ev = tables.load(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.round(F.col("value") * 1_000_000).cast("long").alias("x"),
    )
    base = m.groupBy(
        F.col("event_type").alias("t"), F.col("hod").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    return (
        m.join(F.broadcast(base), (m.event_type == base.t) & (m.hod == base.h))
        .select(
            "event_id",
            "event_type",
            "hod",
            ((F.col("s").cast("double") / F.col("n")) / 1_000_000).alias(
                "seasonal_mean"
            ),
            (
                ((F.col("x") * F.col("n") - F.col("s")).cast("double") / F.col("n"))
                / 1_000_000
            ).alias("residual"),
        )
        .orderBy("event_id")
        .limit(2000)
    )


_AUTOCORR_SQL = """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY event_type, h
), pairs AS (
  SELECT a.event_type, a.n AS x, b.n AS y
  FROM c a JOIN c b
    ON a.event_type = b.event_type AND b.h = a.h + INTERVAL 1 HOUR
), s AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0),
             6) AS lag1_autocorr
FROM s
ORDER BY event_type
"""


@register("ts_autocorr", oracle=_AUTOCORR_SQL, tags=("ts", "M120"))
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series per type
    (ts-extra) — the seasonality screen run before picking a forecast
    baseline.

    Exact-moment construction as agg_corr_exact: hourly counts are
    integers, the five moment sums stay in BIGINT (counts are tiny),
    and the final Pearson expression is identical IEEE double math in
    both engines, then round6. Plan: one keyed agg events→(type,hour)
    — the only shuffle that scales with data — then a self-join and
    corr over the ~720-row-per-type series, negligible at any scale.
    The lag pairing joins on h = h+1hour rather than a lag() window so
    missing hours break pairs instead of silently lagging across gaps."""
    ev = tables.load(spark, sf_dir, "events")
    c = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.h") == F.col("a.h") + F.expr("INTERVAL 1 HOUR")),
    ).select(F.col("a.event_type").alias("event_type"), F.col("a.n").alias("x"), F.col("b.n").alias("y"))
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # Zero-variance guard (constant hourly series): NULL in both
    # engines — Spark ANSI would raise DIVIDE_BY_ZERO, DuckDB would
    # emit NaN/inf; when()/NULLIF make them agree.
    den = F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(
            F.when(den != 0, (nd * sxy - sx * sy) / den),
            6,
        ).alias("lag1_autocorr"),
    ).orderBy("event_type")


_CUSUM_SQL = """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
  FROM events GROUP BY event_type, h
), s AS (
  SELECT event_type, h, cnt,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS t,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY h) AS run,
         sum(cnt) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
), d AS (
  SELECT event_type, h, t,
         abs(CAST(n AS BIGINT) * CAST(run AS BIGINT)
             - CAST(t AS BIGINT) * CAST(total AS BIGINT)) AS dstat,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(CAST(n AS BIGINT) * CAST(run AS BIGINT)
                                         - CAST(t AS BIGINT) * CAST(total AS BIGINT))
                                     DESC, t) AS rk
  FROM s
)
SELECT event_type, h AS change_hour, CAST(t AS BIGINT) AS hour_index,
       CAST(dstat AS BIGINT) AS cusum_stat
FROM d WHERE rk = 1
ORDER BY event_type
"""


@register("ts_cusum_changepoint", oracle=_CUSUM_SQL, tags=("ts", "M128"))
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint (ts-extra): the hour where each type's event
    rate shifts most — argmax_t |n*S_t - t*S_n| over the hourly count
    series (the scaled-integer form of the classic CUSUM statistic, so
    every value is an exact BIGINT and no mean/variance float enters
    the hash; ties resolve to the earliest hour).

    Plan: one keyed agg events→(type,hour) — the only data-sized
    shuffle — then windows over the ~720-point series per type and an
    argmax rank. At 100 TB the series length is fixed by the time
    range, not the event volume: the heavy input collapses in the
    first agg, the changepoint scan is constant work."""
    ev = tables.load(spark, sf_dir, "events")
    c = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    wall = Window.partitionBy("event_type")
    s = c.select(
        "event_type",
        "h",
        F.row_number().over(wt).alias("t"),
        F.sum("cnt").over(wt).alias("run"),
        F.sum("cnt").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    dstat = F.abs(
        F.col("n").cast("long") * F.col("run").cast("long")
        - F.col("t").cast("long") * F.col("total").cast("long")
    )
    d = s.select(
        "event_type",
        "h",
        "t",
        dstat.alias("dstat"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(dstat.desc(), "t"))
        .alias("rk"),
    )
    return (
        d.filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("h").alias("change_hour"),
            F.col("t").cast("long").alias("hour_index"),
            F.col("dstat").cast("long").alias("cusum_stat"),
        )
        .orderBy("event_type")
    )


_LTTB_NB = 10


def lttb_downsample(points: DataFrame, n_buckets: int = _LTTB_NB) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013 —
    the Timescale/Grafana visualization downsampler), made INTEGER-
    exact: input points are (series, t:long, y:long) with integer
    coordinates (epoch-hour index, micro-unit value), and the triangle
    argmax uses the area multiplied through by the next bucket's point
    count ``c`` —

        A' = |(c·t_prev − Σt_next)(y_cand − y_prev)
             − (t_prev − t_cand)(Σy_next − c·y_prev)|

    — which preserves the argmax (c is constant within a bucket) and
    keeps EVERY intermediate a BIGINT, so the sequential selection
    chain is bit-identical cross-engine and the whole operator takes a
    full value-hash oracle (an unrolled-CTE twin, the labelprop trick),
    unlike every float formulation of LTTB. Ties break to the earliest
    point.

    Per the algorithm: first/last points pinned; interior points split
    into ``n_buckets``-2 index-equal buckets (bucket of 1-based idx =
    ((idx−2)·(nb−2)) div (n−2)); bucket k's pick maximizes A' against
    the PREVIOUS pick and bucket k+1's centroid (the last point for
    the final bucket). Series shorter than ``n_buckets`` are dropped
    (declared precondition, mirrored by the oracle).

    Scale: one ``applyInPandas`` per series — the correct shape for a
    per-series SEQUENTIAL algorithm whose series each fit a worker
    (downsampling is per-device/per-metric; a series too big for one
    worker should be pre-aggregated first, as this key's hourly rollup
    does). The groupBy is the only shuffle.
    """
    nb_i = n_buckets - 2

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t").reset_index(drop=True)
        n = len(pdf)
        if n < n_buckets:
            return pd.DataFrame(
                {"series": [], "ord": [], "t": [], "y": []}
            ).astype({"series": str, "ord": "int64", "t": "int64", "y": "int64"})
        t = [int(v) for v in pdf["t"]]
        y = [int(v) for v in pdf["y"]]
        # interior 0-based j in [1, n-2]; bucket = ((j-1)*nb_i)//(n-2)
        buckets: list[list[int]] = [[] for _ in range(nb_i)]
        for j in range(1, n - 1):
            buckets[((j - 1) * nb_i) // (n - 2)].append(j)
        sel = [0]
        prev = 0
        for k in range(nb_i):
            if k < nb_i - 1:
                nxt = buckets[k + 1]
            else:
                nxt = [n - 1]
            c = len(nxt)
            sx = sum(t[j] for j in nxt)
            sy = sum(y[j] for j in nxt)
            best, best_area = None, -1
            for j in buckets[k]:
                area = abs(
                    (c * t[prev] - sx) * (y[j] - y[prev])
                    - (t[prev] - t[j]) * (sy - c * y[prev])
                )
                if area > best_area:
                    best, best_area = j, area
            sel.append(best)
            prev = best
        sel.append(n - 1)
        return pd.DataFrame(
            {
                "series": pdf["series"].iat[0],
                "ord": range(len(sel)),
                "t": [t[j] for j in sel],
                "y": [y[j] for j in sel],
            }
        )

    return points.groupBy("series").applyInPandas(
        run, "series string, ord long, t long, y long"
    )


def _lttb_sql(nb: int = _LTTB_NB) -> str:
    """Unrolled-CTE oracle for the integer LTTB: selection is a chain
    of ``nb``-2 argmax steps, each one window over a bucket's
    candidates joined to the previous step's pick — expressible with
    the iteration count FIXED, exactly like the labelprop oracle."""
    nb_i = nb - 2
    steps = []
    for k in range(nb_i):
        prev = "sel_init" if k == 0 else f"step{k - 1}"
        steps.append(
            f"step{k} AS (\n"
            f"  SELECT series, t, y FROM (\n"
            f"    SELECT c.series, c.t, c.y,\n"
            f"           row_number() OVER (PARTITION BY c.series ORDER BY\n"
            f"             abs((ns.c * p.t - ns.sx) * (c.y - p.y)\n"
            f"                 - (p.t - c.t) * (ns.sy - ns.c * p.y)) DESC,\n"
            f"             c.idx ASC) AS rn\n"
            f"    FROM interior c\n"
            f"    JOIN {prev} p ON p.series = c.series\n"
            f"    JOIN nextstats ns ON ns.series = c.series AND ns.bucket = {k}\n"
            f"    WHERE c.bucket = {k}\n"
            f"  ) q WHERE rn = 1\n"
            f")"
        )
    sel_union = "\n  UNION ALL ".join(
        f"SELECT series, CAST({k + 1} AS BIGINT) AS ord, t, y FROM step{k}"
        for k in range(nb_i)
    )
    return (
        "WITH base AS (\n"
        "  SELECT event_type AS series,\n"
        "         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,\n"
        "         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y\n"
        "  FROM events GROUP BY 1, 2\n"
        "), idxd AS (\n"
        "  SELECT series, t, y,\n"
        "         row_number() OVER (PARTITION BY series ORDER BY t) AS idx,\n"
        "         count(*) OVER (PARTITION BY series) AS n\n"
        "  FROM base\n"
        f"), ok AS (\n"
        f"  SELECT * FROM idxd WHERE n >= {nb}\n"
        "), interior AS (\n"
        f"  SELECT series, t, y, idx, n,\n"
        f"         ((idx - 2) * {nb_i}) // (n - 2) AS bucket\n"
        "  FROM ok WHERE idx >= 2 AND idx <= n - 1\n"
        "), nxt AS (\n"
        "  SELECT series, bucket - 1 AS bucket, count(*) AS c,\n"
        "         CAST(sum(t) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy\n"
        "  FROM interior GROUP BY series, bucket\n"
        f"), nxt_last AS (\n"
        f"  SELECT series, CAST({nb_i - 1} AS BIGINT) AS bucket, 1 AS c,\n"
        f"         t AS sx, y AS sy\n"
        "  FROM ok WHERE idx = n\n"
        "), nextstats AS (\n"
        "  SELECT * FROM nxt WHERE bucket >= 0 UNION ALL SELECT * FROM nxt_last\n"
        "), sel_init AS (\n"
        "  SELECT series, t, y FROM ok WHERE idx = 1\n"
        "),\n"
        + ",\n".join(steps)
        + "\nSELECT series, ord, t, y FROM (\n"
        "  SELECT series, CAST(0 AS BIGINT) AS ord, t, y FROM ok WHERE idx = 1\n"
        "  UNION ALL " + sel_union + "\n"
        f"  UNION ALL SELECT series, CAST({nb - 1} AS BIGINT) AS ord, t, y\n"
        "  FROM ok WHERE idx = n\n"
        ") u ORDER BY series, ord\n"
    )


@register("ts_downsample_lttb", oracle=_lttb_sql(), tags=("ext", "timeseries"))
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visualization downsampling (``lttb_downsample`` kernel): each
    event_type's hourly micro-sum series reduced to the 10 most
    shape-preserving points by integer-exact LTTB. The pre-aggregation
    to hourly integers is what makes the sequential selection chain
    bit-deterministic cross-engine (see the kernel docstring)."""
    ev = tables.load(spark, sf_dir, "events")
    pts = (
        ev.groupBy(
            F.col("event_type").alias("series"),
            (
                F.unix_timestamp(F.date_trunc("hour", "ts"))
                .cast("long") / 3600
            ).cast("long").alias("t"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    return lttb_downsample(pts, _LTTB_NB).orderBy("series", "ord")


_FORECAST_SQL = """
WITH base AS (
  SELECT event_type AS series,
         CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS h,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), rel AS (
  SELECT series, h, y,
         h - min(h) OVER (PARTITION BY series) AS t,
         min(h) OVER (PARTITION BY series) AS h0
  FROM base
), m AS (
  SELECT series, min(h0) AS h0, count(*) AS n,
         CAST(max(t) AS BIGINT) AS t_max,
         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * y) AS BIGINT) AS sty
  FROM rel GROUP BY series
), fit AS (
  SELECT series, h0, n, t_max, sy, st,
         (n * CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
         / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
           AS slope
  FROM m
)
SELECT f.series,
       CAST(f.h0 + f.t_max + k.k AS BIGINT) AS h_pred,
       round(((CAST(f.sy AS DOUBLE) - f.slope * CAST(f.st AS DOUBLE)) / f.n
              + f.slope * (f.t_max + k.k)) / 1000000, 6) AS yhat,
       round(f.slope / 1000000, 6) AS slope_per_hour
FROM fit f CROSS JOIN (SELECT unnest(range(1, 7)) AS k) k
ORDER BY series, h_pred
"""


@register("ts_forecast_linear", oracle=_FORECAST_SQL, tags=("ext", "timeseries"))
def ts_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear-trend forecast: OLS slope/intercept fit to
    each event_type's hourly micro-sums, extrapolated 6 hours past the
    series end — the capacity-planning/alerting baseline a hypertable
    continuous aggregate feeds.

    Exactness: timestamps center to per-series RELATIVE hour t = h −
    min(h) BEFORE the moment sums (raw epoch-hour products overflow
    BIGINT at n·Σty; centered ones peak ~5e14), so all five OLS
    moments are exact integers; slope and intercept are then a fixed
    tree of IEEE ops on exact doubles, round6-closed. Plan: one keyed
    agg to hourly points, a per-series min window (same partitioning),
    one moments agg, and a constant 6-row horizon spine — two shuffles
    on the series key, linear in events.
    """
    ev = tables.load(spark, sf_dir, "events")
    base = ev.groupBy(
        F.col("event_type").alias("series"),
        (
            F.unix_timestamp(F.date_trunc("hour", "ts")).cast("long") / 3600
        ).cast("long").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
        .cast("long")
        .alias("y")
    )
    w = Window.partitionBy("series")
    rel = base.select(
        "series",
        "h",
        "y",
        (F.col("h") - F.min("h").over(w)).alias("t"),
        F.min("h").over(w).alias("h0"),
    )
    m = rel.groupBy("series").agg(
        F.min("h0").alias("h0"),
        F.count(F.lit(1)).alias("n"),
        F.max("t").cast("long").alias("t_max"),
        F.sum("t").cast("long").alias("st"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("sty"),
    )
    nD = F.col("n").cast("double")
    fit = m.select(
        "series",
        "h0",
        "n",
        "t_max",
        "sy",
        "st",
        (
            (nD * F.col("sty").cast("double") - F.col("st").cast("double") * F.col("sy").cast("double"))
            / (nD * F.col("stt").cast("double") - F.col("st").cast("double") * F.col("st").cast("double"))
        ).alias("slope"),
    )
    horizon = F.explode(F.sequence(F.lit(1), F.lit(6))).alias("k")
    return (
        fit.select("*", horizon)
        .select(
            "series",
            (F.col("h0") + F.col("t_max") + F.col("k")).cast("long").alias("h_pred"),
            F.round(
                (
                    (F.col("sy").cast("double") - F.col("slope") * F.col("st").cast("double"))
                    / F.col("n").cast("double")
                    + F.col("slope") * (F.col("t_max") + F.col("k")).cast("double")
                )
                / 1_000_000,
                6,
            ).alias("yhat"),
            F.round(F.col("slope") / 1_000_000, 6).alias("slope_per_hour"),
        )
        .orderBy("series", "h_pred")
    )


# ---------------------------------------------------------------------------
# Interval concurrency sweep (M224)

_CONCURRENCY_SQL = """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  -- event_id tiebreak so this cumulative window shares the SAME
  -- total order as the new_session flag window above and the two
  -- Spark windows: with duplicate (user_id, ts) rows a t_us-only
  -- order could split sessions differently per engine (ADVICE r9 #3)
  SELECT user_id, t_us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id,
         min(t_us) AS start_us,
         max(t_us) + CAST(1800000000 AS BIGINT) AS end_us
  FROM numbered GROUP BY user_id, session_id
), sweep AS (
  SELECT start_us AS t_us, CAST(1 AS BIGINT) AS delta,
         user_id, session_id
  FROM sessions
  UNION ALL
  SELECT end_us AS t_us, CAST(-1 AS BIGINT) AS delta,
         user_id, session_id
  FROM sessions
), running AS (
  SELECT t_us, delta,
         sum(delta) OVER (ORDER BY t_us, delta, user_id, session_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS active
  FROM sweep
)
SELECT CAST(make_timestamp(t_us) AS DATE) AS day,
       CAST(max(active) AS BIGINT) AS peak_concurrency,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions_started
FROM running
GROUP BY day
ORDER BY day
"""


@register("ts_max_concurrency", oracle=_CONCURRENCY_SQL, tags=("ext", "ts"))
def ts_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day — the interval-occupancy sweep line:
    sessionize (30-min gap, end = last event + 30 min, END-EXCLUSIVE
    via the -1 < +1 tiebreak so a back-to-back handoff at the same
    microsecond never double-counts), explode each session interval
    into a +1 start / -1 end event, and take the running sum over the
    total (t, delta, user, session) order. The capacity-planning
    readout (max simultaneous sessions/connections/jobs) that
    windowed counts get wrong — a session spanning a bucket boundary
    is concurrent in BOTH buckets.

    Determinism: timestamps are exact BIGINT µs, deltas are ±1, and
    the sweep order is total, so every prefix — hence every peak —
    is integer-exact. Scale shape: sessionize = one keyed window;
    the sweep's global running sum is a single total-order window at
    committed scales, and past ``distorder.WINDOW_GATE_ROWS`` it
    switches to per-time-bucket sums + bucket offsets (the
    distributed global-order kernel — quantile-bucketed local
    windows, triangular offsets, no single-partition exchange); the
    prefix sum is exact because bucketing is monotone in t_us
    (equivalence + plan pinned by tests/test_plans.py)."""
    ev = tables.load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (us - F.unix_micros(F.lag("ts").over(w)) >= 1_800_000_000),
        1,
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        us.alias("t_us"),
        F.sum(new_s)
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_id"),
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.min("t_us").alias("start_us"),
        (F.max("t_us") + F.lit(1_800_000_000).cast("long")).alias("end_us"),
    )
    sweep = sessions.select(
        F.col("start_us").alias("t_us"),
        F.lit(1).cast("long").alias("delta"),
        "user_id",
        "session_id",
    ).unionByName(
        sessions.select(
            F.col("end_us").alias("t_us"),
            F.lit(-1).cast("long").alias("delta"),
            "user_id",
            "session_id",
        )
    )
    from ezbake_graph_spark.operators import distorder

    if distorder.use_distributed_window(spark, sf_dir, "events"):
        running = distorder.attach_global_order(
            sweep,
            "t_us",
            [F.col("t_us"), F.col("delta"), F.col("user_id"), F.col("session_id")],
            running={"active": "delta"},
        ).select("t_us", "delta", "active")
    else:
        sw = Window.orderBy(
            "t_us", "delta", "user_id", "session_id"
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        running = sweep.select(
            "t_us", "delta", F.sum("delta").over(sw).alias("active")
        )
    return (
        running.groupBy(
            F.timestamp_micros(F.col("t_us")).cast("date").alias("day")
        )
        .agg(
            F.max("active").alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_sessions_started"
            ),
        )
        .orderBy("day")
    )
