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


_ZSCORE_SQL = """
WITH m AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 1000000) AS BIGINT) AS x
  FROM events
), s AS (
  SELECT event_type AS t, count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
  FROM m GROUP BY 1
)
SELECT event_id, event_type, value,
       round(CAST(CAST(n AS HUGEINT) * x - sx AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)),
             6) AS zscore
FROM m JOIN s ON event_type = t
WHERE (CAST(n AS HUGEINT) * x - sx) * (CAST(n AS HUGEINT) * x - sx)
      > 4 * (CAST(n AS HUGEINT) * sxx - sx * sx)
ORDER BY event_id
"""


@register("events_zscore_outliers", oracle=_ZSCORE_SQL, tags=("ext", "M58"))
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: events whose value sits more than 2 population
    standard deviations from their event-type mean, with the z-score.

    Float determinism (SURVEY §5.3): the |z| > 2 gate is evaluated in
    EXACT integer arithmetic — (n·x − Σx)² > 4·(n·Σx² − (Σx)²) over
    micro-unit BIGINTs (Σx² held in decimal(38,0) / HUGEINT, values
    ≤ ~1e26 at sf0.1, well under both engines' 38-digit range) — so the
    boundary can never flip between engines the way a float
    mean/stddev comparison could. The reported z divides the exact
    integer numerator by sqrt of the exact integer variance term; both
    casts are round-to-nearest, so the doubles agree bit-for-bit.

    Scale: the per-type moment table is 5 rows (one shuffle-free
    partial aggregate), broadcast back against the events scan —
    two linear passes, no keyed shuffle of the fact table at any size.
    """
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * F.lit(1_000_000)).cast("long").alias("x"),
    )
    dec = "decimal(38,0)"
    stats = (
        ev.groupBy(F.col("event_type").alias("t"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        )
    )
    j = ev.join(F.broadcast(stats), ev.event_type == stats.t)
    # n·x − Σx fits comfortably in BIGINT (≈1e13 at sf0.1); its square
    # and the variance term need 38-digit integers.
    diff = (F.col("n") * F.col("x") - F.col("sx")).alias("diff")
    j = j.select("event_id", "event_type", "value", "n", "sx", "sxx", diff)
    diff_sq = F.col("diff").cast(dec) * F.col("diff").cast(dec)
    var_term = F.col("n").cast(dec) * F.col("sxx") - F.col("sx").cast(
        dec
    ) * F.col("sx").cast(dec)
    return (
        j.filter(diff_sq > F.lit(4).cast(dec) * var_term)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(
                F.col("diff").cast("double") / F.sqrt(var_term.cast("double")), 6
            ).alias("zscore"),
        )
        .orderBy("event_id")
    )


_CONVERSION_SQL = """
WITH fv AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY 1
), conv AS (
  SELECT e.user_id, f.first_view,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts > f.first_view
                  THEN e.ts END) AS first_purchase_after
  FROM events e JOIN fv f USING (user_id)
  GROUP BY 1, 2
)
SELECT c.c_mktsegment AS segment, count(*) AS n_users,
       CAST(count_if(first_view IS NOT NULL) AS BIGINT) AS n_viewed,
       CAST(count_if(first_purchase_after IS NOT NULL
                AND first_purchase_after <= first_view + INTERVAL 1 HOUR)
         AS BIGINT) AS n_converted_1h,
       CAST(count_if(first_purchase_after IS NOT NULL
                     AND first_purchase_after <= first_view + INTERVAL 1 HOUR)
            AS DOUBLE)
         / NULLIF(count_if(first_view IS NOT NULL), 0) AS conversion_1h
FROM conv JOIN customer c ON user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


@register("events_funnel_conversion", oracle=_CONVERSION_SQL, tags=("ext", "M64"))
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel conversion per market segment: of users with a
    'view', how many reached a 'purchase' within 1 hour of their FIRST
    view. Two passes over events (first-view per user, then earliest
    qualifying purchase) + a broadcast join to the customer dim; the
    conversion rate is an exact BIGINT/BIGINT division, identical in
    both engines (timestamp comparisons are exact µs integers).
    """
    ev = tables.load(spark, sf_dir, "events")
    cust = tables.load(spark, sf_dir, "customer")
    fv = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        )
    )
    conv = (
        ev.join(fv, "user_id")
        .groupBy("user_id", "first_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("first_view")),
                    F.col("ts"),
                )
            ).alias("first_purchase_after")
        )
    )
    converted = F.col("first_purchase_after").isNotNull() & (
        F.col("first_purchase_after")
        <= F.col("first_view") + F.expr("interval 1 hour")
    )
    return (
        conv.join(F.broadcast(cust), conv.user_id == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count_if(F.col("first_view").isNotNull()).alias("n_viewed"),
            F.count_if(converted).alias("n_converted_1h"),
            # zero-viewer guard: a segment with no 'view' events makes
            # the rate 0/0 — Spark ANSI raises, DuckDB yields NaN;
            # when()/NULLIF agree on NULL (ADVICE r3 division class)
            F.when(
                F.count_if(F.col("first_view").isNotNull()) != 0,
                F.count_if(converted).cast("double")
                / F.count_if(F.col("first_view").isNotNull()),
            ).alias("conversion_1h"),
        )
        .orderBy("segment")
    )


_ATTRIBUTION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events
  WHERE event_type IN ('click', 'purchase')
)
SELECT event_id AS purchase_id,
       user_id,
       last_click_ts,
       CASE WHEN last_click_ts IS NOT NULL
             AND ts - last_click_ts <= INTERVAL 1 HOUR
            THEN 'click' ELSE 'organic' END AS attribution
FROM marked
WHERE event_type = 'purchase'
ORDER BY purchase_id
"""


@register("events_attribution_last_touch", oracle=_ATTRIBUTION_SQL, tags=("ext", "analytics", "M72"))
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the same user's
    most recent click if it happened within the preceding hour, else
    counts as organic — the marketing-attribution primitive.

    As-of join expressed as ONE running-max window over the
    interleaved click/purchase stream (the C8 formulation): a single
    keyed shuffle on user_id, no join blow-up, no per-purchase scan of
    click history. At 100 TB the naive formulation (purchases ⨝ all
    prior clicks, then max) shuffles the full click×purchase pair set;
    this one shuffles each event exactly once. Ties (click and
    purchase at the same ts) order by event_id so both engines agree
    on the frame boundary."""
    ev = tables.load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    marked = ev.withColumn("last_click_ts", last_click)
    # µs-exact comparison: DuckDB's `ts - last_click_ts <= INTERVAL 1
    # HOUR` compares at µs precision; cast("long") would truncate to
    # whole seconds and flip boundary rows.
    within_hour = (
        F.col("last_click_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
            <= 3600 * 1_000_000
        )
    )
    return (
        marked.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_click_ts",
            F.when(within_hour, "click").otherwise("organic").alias("attribution"),
        )
        .orderBy("purchase_id")
    )


_SESSION_STATS_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_ev,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_ev) AS BIGINT) AS n_events,
       CAST(sum(n_ev) AS DOUBLE) / count(*) AS avg_session_events,
       CAST(sum(dur_us) AS DOUBLE) / 1000000 / count(*) AS avg_session_secs
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


@register("events_session_stats", oracle=_SESSION_STATS_SQL, tags=("ext", "analytics", "M88"))
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session statistics: sessionize on the strict 30-min gap
    (identical gaps-and-islands kernel as events_funnel_paths /
    stream_session), then two keyed aggregations — per-session
    (count + µs duration) and per-user (session count, totals,
    averages). The engagement-summary shape every event pipeline runs.

    Exactness: durations are integer µs (max-min of µs instants), so
    every sum is exact; the two averages are single IEEE divisions of
    exact integers — deterministic in both engines with no rounding.
    Scale: one keyed shuffle for the sessionize window, then the
    per-session and per-user aggregates reuse the same user_id
    partitioning (no extra exchange: groupBy(user_id, session_id) and
    groupBy(user_id) are both co-partitioned with the window)."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
        .over(run)
        .alias("session_id"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").alias("n_events"),
            (F.sum("n_ev").cast("double") / F.count(F.lit(1))).alias(
                "avg_session_events"
            ),
            (
                F.sum("dur_us").cast("double") / 1_000_000 / F.count(F.lit(1))
            ).alias("avg_session_secs"),
        )
        .orderBy("user_id")
    )


_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
FROM pairs
ORDER BY prev_type, next_type
"""


@register("events_markov_transitions", oracle=_MARKOV_SQL, tags=("ext", "analytics", "M93"))
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    each (previous event type -> next event type) adjacent pair within
    a user's timeline, the count and the conditional probability — the
    behavioral-model fit every sequence pipeline starts with (and the
    sequence-statistics shape used to build n-gram LM counts over user
    journeys).

    Plan: one keyed window (lag over user timeline, same shuffle key as
    every session op), a small groupBy on the 5x5 type pairs, and a
    window sum for row-normalization — the probability is an exact
    integer/integer IEEE division, deterministic in both engines.
    Scale: the only data-sized movement is the per-user window shuffle;
    everything after is |types|^2 rows."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wn = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    ).orderBy("prev_type", "next_type")


_AB_SQL = """
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS value_micro
  FROM events GROUP BY user_id
), armed AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         converted, value_micro
  FROM u
)
SELECT arm,
       count(*) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       CAST(sum(converted) AS DOUBLE) / count(*) AS conv_rate,
       (CAST(sum(value_micro) AS DOUBLE) / count(*)) / 1000000
         AS avg_user_value
FROM armed
GROUP BY arm
ORDER BY arm
"""


@register("events_ab_assignment", oracle=_AB_SQL, tags=("ext", "analytics", "M103"))
def events_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based experiment assignment + per-arm outcome readout: users
    split 50/50 into arms A/B by the parity of md5(user_id) — the
    production A/B bucketing scheme (assignment must be a pure function
    of the unit id: stable across sessions, services, and re-runs, with
    no assignment table to join) — then per-arm user counts, conversion
    rate, and average per-user value.

    Exactness: assignment is an integer hash predicate; conversion is a
    max-flag; rates are exact-integer IEEE divisions; per-user value
    sums are micro-units. Plan: one user-keyed aggregate (same shuffle
    key as every per-user op), then a 2-row arm rollup — the arm column
    derives map-side from the group key, costing nothing."""
    ev = tables.load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("value_micro"),
    )
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    return (
        u.select(arm.alias("arm"), "converted", "value_micro")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_converted"),
            (F.sum("converted").cast("double") / F.count(F.lit(1))).alias(
                "conv_rate"
            ),
            (
                (F.sum("value_micro").cast("double") / F.count(F.lit(1)))
                / 1_000_000
            ).alias("avg_user_value"),
        )
        .orderBy("arm")
    )


_RFM_SQL = """
WITH u AS (
  SELECT user_id,
         epoch_us(max(ts)) AS last_us,
         count(*) AS freq,
         sum(CAST(round(value * 1000000) AS BIGINT)) AS monetary_micro
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY user_id
)
SELECT user_id,
       ntile(5) OVER (ORDER BY last_us DESC, user_id) AS r_score,
       ntile(5) OVER (ORDER BY freq DESC, user_id) AS f_score,
       ntile(5) OVER (ORDER BY monetary_micro DESC, user_id) AS m_score,
       freq,
       CAST(monetary_micro AS DOUBLE) / 1000000 AS monetary
FROM u
ORDER BY user_id
"""


@register("events_rfm_scores", oracle=_RFM_SQL, tags=("ext", "analytics", "M112"))
def events_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring: per purchasing user, quintile ranks
    (ntile 5) of Recency (last purchase instant), Frequency (purchase
    count), and Monetary (exact micro-sum of purchase value) — the
    classic segmentation every growth pipeline computes, with score 1 =
    best (most recent / most frequent / highest spend).

    Determinism: each ntile orders by an exact integer metric with a
    user_id tie-break, and ntile's bucket arithmetic (floor
    distribution of n rows into 5) is identical in both engines.
    Scale note: ntile over the full user set is a single-partition
    sort at committed scales (the aggregated per-user table, not the
    events); past ``distorder.WINDOW_GATE_ROWS`` each score switches
    to the distributed global-order kernel (SCALE.md §24) —
    bit-identical quintiles, one keyed shuffle per score, no
    single-partition exchange."""
    ev = tables.load(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.unix_micros(F.max("ts")).alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "monetary_micro"
            ),
        )
    )
    from ezbake_graph_spark.operators import distorder

    if distorder.use_distributed_window(spark, sf_dir, "events"):
        # three independent total orders -> three kernel passes (one
        # keyed shuffle each; still no single-partition exchange) —
        # the documented percent-rank swap, made exact (SCALE.md §24).
        # Cache the per-user aggregate: each kernel's quantile-bounds
        # sampling job would otherwise recompute the events rollup
        # (and every earlier kernel) from scratch.
        scored = u.cache()
        for col, out in (
            ("last_us", "r_score"),
            ("freq", "f_score"),
            ("monetary_micro", "m_score"),
        ):
            scored = distorder.attach_global_order(
                scored,
                col,
                [F.col(col).desc(), F.col("user_id")],
                desc=True,
                ntile=(out, 5),
            )
        return scored.select(
            "user_id",
            "r_score",
            "f_score",
            "m_score",
            "freq",
            (F.col("monetary_micro").cast("double") / 1_000_000).alias("monetary"),
        ).orderBy("user_id")
    wr = Window.orderBy(F.col("last_us").desc(), "user_id")
    wf = Window.orderBy(F.col("freq").desc(), "user_id")
    wm = Window.orderBy(F.col("monetary_micro").desc(), "user_id")
    return u.select(
        "user_id",
        F.ntile(5).over(wr).alias("r_score"),
        F.ntile(5).over(wf).alias("f_score"),
        F.ntile(5).over(wm).alias("m_score"),
        "freq",
        (F.col("monetary_micro").cast("double") / 1_000_000).alias("monetary"),
    ).orderBy("user_id")


_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
), isl AS (
  SELECT user_id, d,
         date_diff('day', DATE '1970-01-01', d)
         - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days
), runs AS (
  SELECT user_id, island, count(*) AS streak_len, min(d) AS streak_start
  FROM isl GROUP BY user_id, island
), best AS (
  SELECT user_id, streak_len, streak_start,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak_len DESC, streak_start) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n_streaks
  FROM runs
)
SELECT user_id, CAST(streak_len AS BIGINT) AS longest_streak_days,
       streak_start, CAST(n_streaks AS BIGINT) AS n_streaks
FROM best WHERE rk = 1
ORDER BY user_id
"""


@register("events_purchase_streaks", oracle=_STREAKS_SQL, tags=("ext", "M129"))
def events_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day purchase streak per user (ext): the
    gaps-and-islands idiom on calendar days — island id = epoch-day
    minus per-user row_number, constant within each unbroken run. All
    integers and dates; ties on streak length resolve to the earliest
    start.

    Plan: distinct (user, day) collapses the event volume first (one
    keyed shuffle), then two windows and an agg over the per-user day
    lists — bounded by days-per-user, not events. The same shape at
    100 TB: everything after the first distinct is proportional to
    users x active-days, and the user-keyed windows need no further
    shuffle once partitioned."""
    ev = tables.load(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        "d",
        (F.datediff("d", F.lit("1970-01-01")) - F.row_number().over(w)).alias(
            "island"
        ),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len"), F.min("d").alias("streak_start")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start")
    )
    best = runs.select(
        "user_id",
        "streak_len",
        "streak_start",
        F.row_number().over(wb).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_streaks"),
    )
    return (
        best.filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("streak_len").cast("long").alias("longest_streak_days"),
            "streak_start",
            F.col("n_streaks").cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


_ROLLING_ACTIVE_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), days AS (
  SELECT DISTINCT d FROM ud
)
SELECT days.d AS day,
       count(DISTINCT CASE WHEN ud.d = days.d THEN ud.user_id END) AS dau,
       count(DISTINCT ud.user_id) AS wau
FROM days JOIN ud
  ON ud.d <= days.d AND ud.d > days.d - INTERVAL 7 DAY
GROUP BY days.d
ORDER BY day
"""


@register("events_rolling_active_users", oracle=_ROLLING_ACTIVE_SQL, tags=("ext", "M135"))
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day (ext): rolling DISTINCT users —
    the one rolling metric a plain window frame cannot express (distinct
    doesn't decompose over sliding frames), hence the day-spine range
    join.

    Plan: events collapse to distinct (user, day) FIRST — one keyed
    shuffle proportional to users x active-days, everything after is
    day-grain. Each user-day then EXPLODES to the exactly-7 spine days
    it covers (sequence(d, d+6)) and equi-joins the broadcast day
    spine — a genuinely keyed shuffle with bounded 7x fan-out, not a
    range predicate (which Spark would plan as a broadcast
    nested-loop join, O(|days| x |user-days|) comparisons). At 100 TB
    the same shape holds: fan-out is a constant 7, the spine is
    day-grain (broadcast-tiny at any data scale), and the distinct
    state is bounded by users."""
    ev = tables.load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    cover = ud.select(
        "user_id",
        "d",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
    )
    return (
        # inner equi-join vs the observed-day spine: drops synthetic
        # cover days with no events (the oracle's spine join semantics)
        cover.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.countDistinct(
                F.when(F.col("d") == F.col("day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .orderBy("day")
    )


_CUPED_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN ts < TIMESTAMP '2024-01-15'
                   THEN CAST(round(value * 1000000) AS BIGINT) END), 0)
              AS BIGINT) AS x,
         CAST(coalesce(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15'
                   THEN CAST(round(value * 1000000) AS BIGINT) END), 0)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
), m AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM u
), th AS (
  SELECT n, sx,
         (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           AS theta
  FROM m
), armed AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         x, y
  FROM u
)
SELECT a.arm,
       count(*) AS n_users,
       round((CAST(sum(a.y) AS DOUBLE) / count(*)) / 1000000, 6) AS avg_value,
       round(((CAST(sum(a.y) AS DOUBLE) / count(*))
              - t.theta * ((CAST(sum(a.x) AS DOUBLE) / count(*))
                           - CAST(t.sx AS DOUBLE) / t.n)) / 1000000, 6)
         AS avg_value_cuped,
       round(t.theta, 6) AS theta
FROM armed a, th t
GROUP BY a.arm, t.theta, t.sx, t.n
ORDER BY a.arm
"""


@register(
    "events_cuped_adjusted",
    oracle=_CUPED_SQL,
    tags=("ext", "analytics", "bench2"),
)
def events_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (public: Deng, Xu, Kohavi, Walker 2013,
    "Improving the Sensitivity of Online Controlled Experiments") over
    the hash-assigned A/B arms (same md5-parity rule as
    ``events_ab_assignment``): per-user pre-period value (before
    2024-01-15) is the covariate x, post-period value the metric y;
    θ = cov(x,y)/var(x) is fit POOLED (standard CUPED — fitting per
    arm would bias the estimate), and each arm reports its raw and
    adjusted means, the adjusted one being ȳ_arm − θ·(x̄_arm − x̄).

    Exactness: the per-user x/y are micro-int sums out of ONE
    conditional-sum scan (no two-pass pre/post split — the PSI
    lesson); θ's numerator and denominator come from 128-bit exact
    integer moments (the ``agg_corr_exact`` regime; x·x at micro scale
    exceeds BIGINT), so θ is one IEEE division of two exact doubles,
    and the arm means are exact-integer ratios — round6 closes it.

    Scale: one user-keyed shuffle + a 2-row arm rollup + a broadcast
    1-row θ; the covariate window choice (14 days) is the fixture's;
    production uses the experiment's pre-launch window.
    """
    ev = tables.load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    micro = F.round(F.col("value") * 1_000_000).cast("long")
    u = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cutoff, micro)), F.lit(0)
        ).cast("long").alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= cutoff, micro)), F.lit(0)
        ).cast("long").alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
    )
    nD = F.col("n").cast("double")
    th = m.select(
        "n",
        "sx",
        (
            (nD * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (nD * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("theta"),
    )
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    armed = u.select(arm.alias("arm"), "x", "y")
    cnt = F.count(F.lit(1)).cast("double")
    return (
        armed.crossJoin(F.broadcast(th))
        .groupBy("arm", "theta", "sx", "n")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round((F.sum("y").cast("double") / cnt) / 1_000_000, 6).alias(
                "avg_value"
            ),
            F.round(
                (
                    (F.sum("y").cast("double") / cnt)
                    - F.col("theta")
                    * (
                        (F.sum("x").cast("double") / cnt)
                        - F.col("sx").cast("double") / F.col("n").cast("double")
                    )
                )
                / 1_000_000,
                6,
            ).alias("avg_value_cuped"),
        )
        .select(
            "arm",
            "n_users",
            "avg_value",
            "avg_value_cuped",
            F.round("theta", 6).alias("theta"),
        )
        .orderBy("arm")
    )


def km_survival(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier survival curve from right-censored durations —
    the time-to-event readout behind churn, retention-beyond-day-N,
    and time-to-conversion analyses. Input: one row per subject with
    an integer ``duration_col`` and a 0/1 ``event_col`` (0 = censored
    at that duration).

    Standard at-risk convention: subjects censored AT t remain in the
    risk set for the event at t and leave after, so
    ``n_t = N - Σ_{d<t}(events_d + censored_d)`` via an EXCLUSIVE
    running sum. Risk sets and event counts are exact integers; the
    survival product ``Π(1 - e_d/n_d)`` is the one float, realized as
    ``exp(running_sum(ln(...)))`` so both engines accumulate in the
    same duration order, and reported rounded.

    Plan shape: one keyed agg to per-duration (events, censored)
    counts, then windows over that AGGREGATED table only — bounded by
    the duration domain (calendar days here: a few thousand rows), the
    same bounded-window contract as the binned KS/PSI kernels. Output:
    one row per duration with ≥1 event.
    """
    from pyspark.sql import Window

    cnt = (
        durations.select(
            F.col(duration_col).alias("t"),
            F.col(event_col).alias("ev"),
        )
        .groupBy("t")
        .agg(
            F.sum("ev").alias("d"),
            F.sum(F.lit(1) - F.col("ev")).alias("c"),
        )
    )
    prev = Window.partitionBy().orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = Window.partitionBy()
    risk = cnt.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(tot)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prev), F.lit(0))
        ).alias("n_risk"),
    )
    run = Window.partitionBy().orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # A time where the events consume the whole remaining risk set
    # drives the factor to 0 and S(t) to exactly 0.0. Spark's log(0)
    # yields NULL and window SUM SKIPS nulls (it would silently report
    # exp(sum of the other terms) — the bug a hypothesis sweep caught),
    # so the consumed-at-or-before flag forces the 0 explicitly.
    # DuckDB's ln(0) does NOT return -inf — it raises an Out of Range
    # error — so _KM_SQL carries the SAME consumed guard (only d <
    # n_risk terms enter the log sum; a consumed prefix forces 0.0).
    consumed = F.max(
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    ).over(run)
    log_sum = F.sum(
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(
                F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
            ),
        )
    ).over(run)
    curve = risk.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.when(consumed == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(log_sum), 6))
        .alias("survival"),
    )
    return curve.filter(F.col("d") > 0).select(
        F.col("t").alias("duration"),
        F.col("n_risk"),
        F.col("d").alias("n_event"),
        F.col("c").alias("n_censored"),
        "survival",
    ).orderBy("duration")


_KM_SQL = """
WITH f AS (
  SELECT o_custkey, min(o_orderdate) AS t0
  FROM orders GROUP BY o_custkey
),
big AS (
  SELECT o_custkey, min(o_orderdate) AS tb
  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey
),
horizon AS (SELECT max(o_orderdate) AS tmax FROM orders),
obs AS (
  SELECT CAST(CASE WHEN tb IS NOT NULL THEN datediff('day', t0, tb)
              ELSE datediff('day', t0, tmax) END AS BIGINT) AS t,
         CASE WHEN tb IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM f LEFT JOIN big USING (o_custkey) CROSS JOIN horizon
),
cnt AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
         CAST(sum(1 - ev) AS BIGINT) AS c
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d, c,
         CAST(sum(d + c) OVER () AS BIGINT)
           - CAST(coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM cnt
),
curve AS (
  -- Same consumed guard as the Spark side: DuckDB's ln(0) raises an
  -- Out of Range error (it is not -inf), so a duration where events
  -- consume the whole risk set must short-circuit to survival = 0.0
  -- and only d < n_risk terms may enter the log sum.
  SELECT t, d, c, n_risk,
         CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
              THEN 0.0
              ELSE round(exp(sum(CASE WHEN d < n_risk
                          THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) END)
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
         END AS survival
  FROM risk
)
SELECT t AS duration, n_risk, d AS n_event, c AS n_censored, survival
FROM curve WHERE d > 0 ORDER BY duration
"""


@register("events_survival_km", oracle=_KM_SQL, tags=("ext", "analytics"))
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-big-purchase: per customer, days
    from their first order to their first order above 450k total
    price; customers who never cross the threshold are right-censored
    at the corpus horizon (global max order date). At sf0.01 that is
    ~2/3 events, ~1/3 censored — a genuine censoring mix, not a
    degenerate all-events curve.

    The horizon is a 1-row aggregate crossJoin-broadcast (never an
    unpartitioned window over per-customer rows — that funnel would
    scale with customer count); the per-customer duration build is one
    keyed agg + one keyed left join, and the curve windows run over
    the bounded per-duration table (``km_survival``)."""
    o = tables.load(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("t0"))
    big = (
        o.filter(F.col("o_totalprice") > 450000)
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("tb"))
    )
    horizon = o.agg(F.max("o_orderdate").alias("tmax"))
    obs = (
        f.join(big, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("tb").isNotNull(), F.datediff(F.col("tb"), F.col("t0"))
            )
            .otherwise(F.datediff(F.col("tmax"), F.col("t0")))
            .cast("long")
            .alias("duration"),
            F.when(F.col("tb").isNotNull(), 1).otherwise(0).alias("event"),
        )
    )
    return km_survival(obs, "duration", "event")


_SRM_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
armed AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS arm
  FROM u
),
cnt AS (
  SELECT
    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM armed
)
SELECT n_a, n_b,
       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b), 6)
         AS srm_chi2,
       CASE WHEN CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
                 > 3.841459 THEN 1 ELSE 0 END AS srm_flag
FROM cnt
"""


@register("events_srm_check", oracle=_SRM_SQL, tags=("ext", "analytics"))
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the 50/50 hash assignment
    (``events_ab_assignment``'s arms): the chi-square statistic
    against the expected equal split — for a 2-cell table with equal
    expectations it reduces to ``(n_a - n_b)^2 / (n_a + n_b)``, exact
    BIGINT until the one division. ``srm_flag`` fires above the
    chi2(1) 95% critical value (3.841459) — the first check every
    experimentation platform runs before reading any metric, because
    a ratio mismatch means the assignment (not the treatment) moved
    the populations.

    One distinct-users agg + one constant-size 2-counter reduce: the
    whole audit costs what ``count(distinct user_id)`` costs."""
    ev = tables.load(spark, sf_dir, "events")
    arm_a = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % 2
        == 0
    )
    cnt = (
        ev.select("user_id")
        .distinct()
        .agg(
            F.sum(F.when(arm_a, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(arm_a, 0).otherwise(1)).alias("n_b"),
        )
    )
    diff2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    )
    chi2 = diff2 / (F.col("n_a") + F.col("n_b"))
    return cnt.select(
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("srm_chi2"),
        F.when(chi2 > 3.841459, 1).otherwise(0).alias("srm_flag"),
    )


PATTERNS = (
    (1, "%view%click%purchase%"),
    (2, "%signup%purchase%"),
    (3, "%error%purchase%"),
)


def _pattern_sql() -> str:
    pats = " UNION ALL ".join(
        f"SELECT {pid} AS pattern_id, '{p}' AS pattern" for pid, p in PATTERNS
    )
    return f"""
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
), pats AS ({pats})
SELECT p.pattern_id, p.pattern,
       CAST(count(*) FILTER (WHERE paths.path LIKE p.pattern) AS BIGINT)
         AS n_matched,
       CAST(count(*) AS BIGINT) AS n_sessions,
       round(CAST(count(*) FILTER (WHERE paths.path LIKE p.pattern)
                  AS DOUBLE) / count(*), 6) AS match_rate
FROM paths CROSS JOIN pats p
GROUP BY p.pattern_id, p.pattern
ORDER BY p.pattern_id
"""


@register("events_pattern_match", oracle=_pattern_sql(), tags=("ext", "analytics"))
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence pattern matching over sessionized event paths
    — the MATCH_RECOGNIZE-lite every product-analytics store offers
    ("did view -> click -> purchase happen IN ORDER within one
    session?"). Sessions are the same 30-minute strict-gap build as
    ``events_funnel_paths``; each session's ordered type path is
    tested against LIKE patterns (identical `%` semantics in both
    engines — no regex dialect hazard), counted per pattern.

    One sessionize (two user-keyed windows) + one path agg; the
    pattern table is a literal handful of rows crossJoin-broadcast, so
    the match pass is map-side over the bounded path strings (sessions
    are gap-bounded). Counts exact; the single rate division reported
    round6."""
    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
            > 1800
        ),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                "->",
            ).alias("path")
        )
    )
    pats = spark.createDataFrame(list(PATTERNS), "pattern_id int, pattern string")
    # Column.like takes a literal, not a Column — the column-vs-column
    # LIKE goes through the SQL expression (ilike/like(expr, expr)).
    hit = F.expr("CASE WHEN path LIKE pattern THEN 1 ELSE 0 END")
    return (
        paths.crossJoin(F.broadcast(pats))
        .groupBy("pattern_id", "pattern")
        .agg(
            F.sum(hit).alias("n_matched"),
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum(hit).cast("double") / F.count(F.lit(1)), 6
            ).alias("match_rate"),
        )
        .orderBy("pattern_id")
    )


# ---------------------------------------------------------------------------
# Market-basket affinity (M212)

_BASKET_MIN_SUP = 2  # apriori minimum pair support

_BASKET_SQL = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), n AS (
  SELECT count(DISTINCT o) AS n_baskets FROM b
), item AS (
  SELECT p, count(*) AS sup FROM b GROUP BY p
), pair AS (
  SELECT a.p AS part_a, c.p AS part_b, count(*) AS pair_support
  FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
  GROUP BY 1, 2
  HAVING count(*) >= {_BASKET_MIN_SUP}
)
SELECT pr.part_a, pr.part_b, pr.pair_support,
       ia.sup AS support_a, ib.sup AS support_b,
       n.n_baskets,
       round(CAST(pr.pair_support AS DOUBLE) / ia.sup, 6) AS conf_a_to_b,
       round(CAST(pr.pair_support AS DOUBLE) / ib.sup, 6) AS conf_b_to_a,
       round(CAST(pr.pair_support AS DOUBLE) * n.n_baskets
             / (ia.sup * ib.sup), 6) AS lift
FROM pair pr
JOIN item ia ON ia.p = pr.part_a
JOIN item ib ON ib.p = pr.part_b
CROSS JOIN n
ORDER BY pr.pair_support DESC, pr.part_a, pr.part_b
"""


@register("events_market_basket", oracle=_BASKET_SQL, tags=("ext", "analytics", "bench2"))
def events_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity mining: support / confidence / lift for
    every co-purchased part pair with pair support >= 2, over the
    order baskets (distinct parts per order).

    Scale shape — the apriori candidate-pruning pattern: items whose
    OWN support is below the pair threshold cannot appear in any
    qualifying pair (item support >= pair support, monotonicity), so
    they are dropped BEFORE the self-join; the pair stream is then a
    keyed self-join on the basket id, never an all-pairs product, and
    per-basket work is bounded by the basket-size cap real pipelines
    apply (fixture max basket = 13 distinct parts). At 100 TB: two
    keyed shuffles (basket dedup, pair count) plus one broadcast of
    the pruned item-support table; skewed mega-baskets are excluded
    by the cap rather than salted — dropping degenerate baskets is
    the standard semantics in affinity analysis.

    Determinism: supports are exact BIGINT counts; confidence and
    lift are round6 of single divisions of exact integers — identical
    IEEE doubles in both engines.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_baskets = baskets.select(
        F.countDistinct("o").alias("n_baskets")
    )
    item = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("sup"))
    # apriori prune: only items that can still reach the pair threshold
    frequent = item.filter(F.col("sup") >= _BASKET_MIN_SUP)
    pruned = baskets.join(
        F.broadcast(frequent.select("p")), "p"
    ).select("o", "p")
    a = pruned.alias("a")
    c = pruned.alias("c")
    pairs = (
        a.join(c, (F.col("a.o") == F.col("c.o")) & (F.col("a.p") < F.col("c.p")))
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("c.p").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= _BASKET_MIN_SUP)
    )
    ia = F.broadcast(item.select(F.col("p"), F.col("sup").alias("support_a")))
    ib = F.broadcast(item.select(F.col("p"), F.col("sup").alias("support_b")))
    return (
        pairs.join(ia, pairs.part_a == ia.p)
        .drop("p")
        .join(ib, pairs.part_b == ib.p)
        .drop("p")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "pair_support",
            "support_a",
            "support_b",
            "n_baskets",
            F.round(
                F.col("pair_support").cast("double") / F.col("support_a"), 6
            ).alias("conf_a_to_b"),
            F.round(
                F.col("pair_support").cast("double") / F.col("support_b"), 6
            ).alias("conf_b_to_a"),
            F.round(
                F.col("pair_support").cast("double") * F.col("n_baskets")
                / (F.col("support_a") * F.col("support_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_support").desc(), "part_a", "part_b")
    )


# ---------------------------------------------------------------------------
# windowFunnel (M223)

_FUNNEL_WINDOW_US = 86_400 * 1_000_000  # 1 day per step

_WINDOW_FUNNEL_SQL = f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
),
s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t1_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2_us
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) >= s1.t1_us
    AND epoch_us(e.ts) <= s1.t1_us + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3_us
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) >= s2.t2_us
    AND epoch_us(e.ts) <= s2.t2_us + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT u.user_id,
       CASE WHEN s3.t3_us IS NOT NULL THEN 3
            WHEN s2.t2_us IS NOT NULL THEN 2
            WHEN s1.t1_us IS NOT NULL THEN 1
            ELSE 0 END AS funnel_depth,
       s1.t1_us, s2.t2_us, s3.t3_us
FROM users u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
ORDER BY user_id
"""


@register("events_window_funnel", oracle=_WINDOW_FUNNEL_SQL, tags=("ext", "analytics"))
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel: per-user maximum funnel depth through the
    earliest view -> click -> purchase chain whose successive steps
    each land within a 1-day window of the previous step — the
    ClickHouse ``windowFunnel`` / Amplitude funnel semantics, which
    differ from plain sequence matching (``events_pattern_match``) by
    the BOUNDED inter-step gap and from ``events_funnel_conversion``
    by anchoring each step to the EARLIEST feasible previous step
    (the deterministic greedy chain).

    Each step is one filtered keyed aggregate joined back on user_id
    — three pushed-predicate scans, no per-user sequence
    materialization; timestamps stay exact BIGINT µs throughout, so
    every chain anchor value-hashes. At 100 TB each stage filters to
    one event type BEFORE its shuffle (predicate pushdown visible in
    the scan), and state per stage is one row per surviving user."""
    ev = tables.load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    users = ev.select("user_id").distinct()
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1_us"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((us >= F.col("t1_us")) & (us <= F.col("t1_us") + _FUNNEL_WINDOW_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t2_us"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((us >= F.col("t2_us")) & (us <= F.col("t2_us") + _FUNNEL_WINDOW_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t3_us"))
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("t3_us").isNotNull(), 3)
            .when(F.col("t2_us").isNotNull(), 2)
            .when(F.col("t1_us").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_depth"),
            "t1_us",
            "t2_us",
            "t3_us",
        )
        .orderBy("user_id")
    )
