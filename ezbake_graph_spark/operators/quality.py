"""Data-quality operators: declarative constraint checking and
single-pass column profiling (the Deequ / dbt-test surface an
analytics engine needs before anything downstream trusts a table).

- ``check_constraints``: evaluate a rule list — ``not_null``,
  ``unique``, ``in_set``, ``range``, ``fk`` — and return one row per
  rule with its violation count. Aggregate-only rules (everything but
  fk/unique) fold into ONE scan of the table; ``unique`` adds one
  keyed agg, ``fk`` one anti-join against the reference table (the
  planner broadcasts a small reference side). At 100 TB the audit
  costs what one groupBy costs — there is no per-rule table scan.
- ``profile_columns``: per-column null count / distinct count / min /
  max in ONE pass (a single wide aggregate row, exploded to one row
  per column) — the profile a migration or schema review reads first.

Both registry keys carry full DuckDB oracles: violation counts and
profiles are exact integers/strings, no float hazards (profiled
columns are restricted to int/string/timestamp types; doubles would
need engine-identical string formatting and are deliberately
excluded — quantize first if you need them profiled).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate declarative quality rules; one output row per rule:
    (rule_id, rule, violations).

    Rule dicts (``rule`` selects the type):

    - ``{"rule": "not_null", "column": c}`` — NULLs in c.
    - ``{"rule": "unique", "columns": [c, ...]}`` — rows beyond the
      first per key (sum of count-1 over duplicated keys).
    - ``{"rule": "in_set", "column": c, "allowed": [...]}`` — non-NULL
      values outside the allowed set.
    - ``{"rule": "range", "column": c, "min": lo, "max": hi}`` —
      non-NULL values outside [lo, hi].
    - ``{"rule": "regex", "column": c, "pattern": p}`` — non-NULL
      values that do not FULLY match ``p`` (the pattern is anchored as
      ``^(?:p)$``; keep it in the RE2-compatible subset for
      cross-engine parity, like the PII patterns).
    - ``{"rule": "dtype", "column": c, "type": t}`` — non-NULL values
      that do not losslessly cast to Spark type ``t`` (``try_cast``
      NULL), e.g. stray text in a should-be-numeric string column.
    - ``{"rule": "fk", "columns": [...], "ref": DataFrame,
      "ref_columns": [...]}`` — rows (with non-NULL keys) that have no
      match in the reference table.

    All aggregate rules evaluate in ONE pass (a single agg over
    conditional sums); each ``unique`` adds one keyed aggregate and
    each ``fk`` one anti-join. ``rule_id`` is the rule's position in
    the input list, so the output is stable for diffing across runs.
    """
    if not rules:
        raise ValueError("rules must be a non-empty list")
    agg_exprs: list[Column] = []
    extra_counts: list[tuple[int, str, DataFrame]] = []
    labels: dict[int, str] = {}
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "not_null":
            c = r["column"]
            labels[i] = f"not_null({c})"
            agg_exprs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"v{i}")
            )
        elif kind == "in_set":
            c = r["column"]
            allowed = list(r["allowed"])
            if not allowed:
                raise ValueError(f"rule {i}: in_set needs a non-empty allowed list")
            labels[i] = f"in_set({c})"
            agg_exprs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull() & ~F.col(c).isin(*allowed), 1
                    ).otherwise(0)
                ).alias(f"v{i}")
            )
        elif kind == "range":
            c = r["column"]
            labels[i] = f"range({c})"
            agg_exprs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & ~F.col(c).between(r["min"], r["max"]),
                        1,
                    ).otherwise(0)
                ).alias(f"v{i}")
            )
        elif kind == "regex":
            c = r["column"]
            pattern = r["pattern"]
            if not pattern:
                raise ValueError(f"rule {i}: regex needs a non-empty pattern")
            labels[i] = f"regex({c})"
            agg_exprs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & ~F.col(c).rlike(f"^(?:{pattern})$"),
                        1,
                    ).otherwise(0)
                ).alias(f"v{i}")
            )
        elif kind == "dtype":
            c = r["column"]
            t = r["type"]
            # validate the type string at plan-build time (cast raises
            # on junk) before splicing it into the try_cast expression
            F.col(c).cast(t)
            labels[i] = f"dtype({c})"
            agg_exprs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & F.expr(f"try_cast(`{c}` AS {t})").isNull(),
                        1,
                    ).otherwise(0)
                ).alias(f"v{i}")
            )
        elif kind == "unique":
            cols = list(r["columns"])
            if not cols:
                raise ValueError(f"rule {i}: unique needs a non-empty column list")
            labels[i] = f"unique({','.join(cols)})"
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(
                    F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("violations")
                )
            )
            extra_counts.append((i, labels[i], dup))
        elif kind == "fk":
            cols = list(r["columns"])
            ref_cols = list(r["ref_columns"])
            if not cols or len(cols) != len(ref_cols):
                raise ValueError(
                    f"rule {i}: fk needs non-empty columns and ref_columns of "
                    f"equal length (got {len(cols)} vs {len(ref_cols)} - a "
                    "silent zip would check only the shorter prefix)"
                )
            labels[i] = f"fk({','.join(cols)})"
            ref = r["ref"].select(
                *[F.col(rc).alias(f"__ref_{j}") for j, rc in enumerate(ref_cols)]
            ).distinct()
            cond = None
            for j, c in enumerate(cols):
                e = F.col(c) == F.col(f"__ref_{j}")
                cond = e if cond is None else cond & e
            keyed = df.select(*cols).na.drop(subset=cols)
            orphans = keyed.join(ref, cond, "left_anti").agg(
                F.count(F.lit(1)).alias("violations")
            )
            extra_counts.append((i, labels[i], orphans))
        else:
            raise ValueError(f"unknown rule type: {kind!r}")

    parts: list[DataFrame] = []
    if agg_exprs:
        one = df.agg(*agg_exprs)
        # melt the single wide row into (rule_id, rule, violations)
        agg_ids = [i for i in labels if f"v{i}" in [c for c in one.columns]]
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("rule_id"),
                        F.lit(labels[i]).alias("rule"),
                        F.col(f"v{i}").cast("long").alias("violations"),
                    )
                    for i in agg_ids
                ]
            )
        ).alias("s")
        parts.append(one.select(stack).select("s.rule_id", "s.rule", "s.violations"))
    for i, label, cdf in extra_counts:
        parts.append(
            cdf.select(
                F.lit(i).alias("rule_id"),
                F.lit(label).alias("rule"),
                F.col("violations").cast("long").alias("violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule_id")


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Single-pass column profile: (col_name, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as strings. One wide
    aggregate row over the table (null counts, exact distinct counts,
    min/max per column), exploded to one output row per column; the
    table is scanned once regardless of how many columns are profiled.

    Array/map/struct columns profile on their canonical JSON rendering
    (``to_json``): nulls count normally, distincts/min/max are over
    the serialized value — deterministic, and the only total order a
    nested value honestly has (a raw ``count_distinct`` on a map
    column is an AnalysisException; round-6 self-review item). For
    float columns, min/max would need engine-identical string
    rendering — quantize first, as before."""
    aggs = []
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in columns:
        v = (
            F.to_json(F.col(c))
            if by_name.get(c, "").startswith(("array<", "map<", "struct<"))
            else F.col(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_{c}"),
            F.count_distinct(v).alias(f"d_{c}"),
            F.min(v).cast("string").alias(f"mn_{c}"),
            F.max(v).cast("string").alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"n_{c}").cast("long").alias("n_nulls"),
                    F.col(f"d_{c}").cast("long").alias("n_distinct"),
                    F.col(f"mn_{c}").alias("min_value"),
                    F.col(f"mx_{c}").alias("max_value"),
                )
                for c in columns
            ]
        )
    ).alias("s")
    return one.select(stack).select(
        "s.col_name", "s.n_nulls", "s.n_distinct", "s.min_value", "s.max_value"
    )


_DQ_AUDIT_SQL = """
WITH agg AS (
  SELECT
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS v1,
    CAST(sum(CASE WHEN o_orderkey IS NOT NULL
              AND o_orderkey NOT BETWEEN 0 AND 30000 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
    CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
              AND NOT regexp_full_match(o_orderpriority, '[1-3]-[A-Z ]+')
              THEN 1 ELSE 0 END) AS BIGINT) AS v5,
    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
              AND try_cast(o_orderstatus AS BIGINT) IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS v6
  FROM orders
), uniq AS (
  SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS v3
  FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
), fk AS (
  SELECT CAST(count(*) AS BIGINT) AS v4
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
)
SELECT 0 AS rule_id, 'not_null(o_custkey)' AS rule, v0 AS violations FROM agg
UNION ALL
SELECT 1, 'in_set(o_orderstatus)', v1 FROM agg
UNION ALL
SELECT 2, 'range(o_orderkey)', v2 FROM agg
UNION ALL
SELECT 3, 'unique(o_orderkey)', v3 FROM uniq
UNION ALL
SELECT 4, 'fk(o_custkey)', v4 FROM fk
UNION ALL
SELECT 5, 'regex(o_orderpriority)', v5 FROM agg
UNION ALL
SELECT 6, 'dtype(o_orderstatus)', v6 FROM agg
ORDER BY rule_id
"""


@register("dq_constraint_audit", oracle=_DQ_AUDIT_SQL, tags=("ext", "dq"))
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit of the orders table: not-null,
    in-set, range, uniqueness, an orders→customer foreign key, a
    full-match regex on the priority format, and a castability check
    — one violation-count row per rule (regex/dtype added in round 7;
    the regex bound is deliberately [1-3] so it has real violations
    on the fixture, and a VARCHAR status column is never BIGINT-
    castable so dtype counts every non-null row)."""
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    return check_constraints(
        o,
        [
            {"rule": "not_null", "column": "o_custkey"},
            {"rule": "in_set", "column": "o_orderstatus", "allowed": ["O", "F", "P"]},
            {"rule": "range", "column": "o_orderkey", "min": 0, "max": 30000},
            {"rule": "unique", "columns": ["o_orderkey"]},
            {"rule": "fk", "columns": ["o_custkey"], "ref": c,
             "ref_columns": ["c_custkey"]},
            {"rule": "regex", "column": "o_orderpriority",
             "pattern": "[1-3]-[A-Z ]+"},
            {"rule": "dtype", "column": "o_orderstatus", "type": "bigint"},
        ],
    )


_DQ_PROFILE_SQL = """
WITH one AS (
  SELECT
    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    count(DISTINCT o_orderkey) AS d0,
    CAST(min(o_orderkey) AS VARCHAR) AS mn0,
    CAST(max(o_orderkey) AS VARCHAR) AS mx0,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    count(DISTINCT o_custkey) AS d1,
    CAST(min(o_custkey) AS VARCHAR) AS mn1,
    CAST(max(o_custkey) AS VARCHAR) AS mx1,
    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    count(DISTINCT o_orderstatus) AS d2,
    CAST(min(o_orderstatus) AS VARCHAR) AS mn2,
    CAST(max(o_orderstatus) AS VARCHAR) AS mx2
  FROM orders
)
SELECT 'o_orderkey' AS col_name, n0 AS n_nulls, d0 AS n_distinct,
       mn0 AS min_value, mx0 AS max_value FROM one
UNION ALL
SELECT 'o_custkey', n1, d1, mn1, mx1 FROM one
UNION ALL
SELECT 'o_orderstatus', n2, d2, mn2, mx2 FROM one
ORDER BY col_name
"""


@register("dq_profile_columns", oracle=_DQ_PROFILE_SQL, tags=("ext", "dq"))
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass profile of three orders columns (nulls, exact
    distinct counts, min/max as strings)."""
    o = tables.load(spark, sf_dir, "orders")
    return profile_columns(
        o, ["o_orderkey", "o_custkey", "o_orderstatus"]
    ).orderBy("col_name")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bin_width: float,
) -> DataFrame:
    """Population Stability Index between two snapshots of one numeric
    column, fixed-width binning, Laplace add-one smoothing (keeps every
    log finite without dropping bins that exist in only one snapshot).

    Returns one row per observed bin: (bin, ref_count, cur_count,
    psi_term) with psi_term = (p - q) * ln(p / q), p = (cr+1)/(tr+nb),
    q = (cc+1)/(tc+nb). Total PSI = sum(psi_term); emitted per-bin so
    the only float math is a fixed per-row expression tree over exact
    ints — no cross-row float accumulation whose order could differ
    between engines (SURVEY §5.3 rule 2), round6 for the contract.

    Scale shape: each snapshot aggregates map-side to (bin, count) —
    one partial-agg shuffle per input, then the bins table (at most a
    few hundred rows for any sane width) is a single-partition
    broadcast-joined constant. 100 TB cost = two scans + two keyed
    partial aggs; nothing else grows with the data. When both
    "snapshots" are predicate-slices of ONE table, use
    ``psi_drift_flagged`` instead — same kernel, ONE scan."""
    flagged = ref.select(
        F.col(value_col).alias("v"), F.lit(1).alias("is_ref")
    ).unionAll(cur.select(F.col(value_col).alias("v"), F.lit(0).alias("is_ref")))
    return psi_drift_flagged(flagged, "v", "is_ref", bin_width)


def psi_drift_flagged(
    df: DataFrame,
    value_col: str,
    is_ref_col: str,
    bin_width: float,
) -> DataFrame:
    """Single-input form of ``psi_drift``: one DataFrame carrying an
    integer 0/1 ``is_ref_col`` flag. This is the right entry when the
    reference and current populations are slices of the SAME table
    (the common per-batch monitoring setup): the flag is a computed
    column, so the whole PSI is ONE scan + one keyed partial-agg
    shuffle — the two-DataFrame form over two filters of one table
    would scan it twice for near-complementary predicates that
    pushdown cannot exploit. Same math, same output schema."""
    from pyspark.sql import Window

    cnt = (
        df.select(
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin"),
            F.col(is_ref_col).alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("cr"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("cc"),
        )
    )
    # Totals as an UNPARTITIONED window over the bins table, not a
    # separate agg + crossJoin: that diamond re-executes the whole
    # ``cnt`` subtree — including the base scan — on both branches
    # (observed in the executed plan), turning "one scan" into two.
    # The window funnels only the aggregated bins (bounded: a few
    # hundred rows for any sane width) through one partition — the
    # same constant-size step the broadcast was.
    w = Window.partitionBy()
    tot = cnt.select(
        "bin",
        "cr",
        "cc",
        F.sum("cr").over(w).alias("tr"),
        F.sum("cc").over(w).alias("tc"),
        F.count(F.lit(1)).over(w).alias("nb"),
    )
    p = (F.col("cr") + 1).cast("double") / (F.col("tr") + F.col("nb"))
    q = (F.col("cc") + 1).cast("double") / (F.col("tc") + F.col("nb"))
    return tot.select(
        "bin",
        F.col("cr").alias("ref_count"),
        F.col("cc").alias("cur_count"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    ).orderBy("bin")


_DQ_DRIFT_SQL = """
WITH binned AS (
  SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
cnt AS (
  SELECT bin,
         CAST(sum(is_ref) AS BIGINT) AS cr,
         CAST(sum(1 - is_ref) AS BIGINT) AS cc
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(cc) AS BIGINT) AS tc,
         count(*) AS nb
  FROM cnt
)
SELECT bin, cr AS ref_count, cc AS cur_count,
   round((CAST(cr + 1 AS DOUBLE) / (tr + nb) - CAST(cc + 1 AS DOUBLE) / (tc + nb))
       * ln((CAST(cr + 1 AS DOUBLE) / (tr + nb)) / (CAST(cc + 1 AS DOUBLE) / (tc + nb))), 6)
       AS psi_term
FROM cnt, tot ORDER BY bin
"""


@register("dq_drift_psi", oracle=_DQ_DRIFT_SQL, tags=("ext", "dq"))
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit: PSI of o_totalprice between orders
    placed before vs after 1998-01-01 (20k-wide bins). The monitoring
    primitive a 100 TB ingest pipeline runs per batch to catch upstream
    distribution shifts before they poison training data.

    Declared on ``psi_drift_flagged``: both populations are slices of
    ONE table, so is_ref is a computed CASE column and the whole audit
    is a single orders scan — exactly the shape of its oracle
    (VERDICT r7 "what's wrong" #1; previously two filtered scans of
    near-complementary predicates). ``psi_drift`` remains the entry
    for genuinely distinct snapshots."""
    o = tables.load(spark, sf_dir, "orders")
    flagged = o.select(
        "o_totalprice",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        ).otherwise(0).alias("is_ref"),
    )
    return psi_drift_flagged(flagged, "o_totalprice", "is_ref", 20000.0)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    hash_col: str = "content_hash",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two corpus snapshots by key: one row per key with
    ``status`` in {added, removed, changed, unchanged} — the
    incremental-ingest audit a pipeline runs between corpus versions
    before re-triggering downstream dedup/training.

    Both inputs must already carry a content digest in ``hash_col``
    (hash BEFORE the join so the full-outer shuffle moves a 32-byte
    digest plus keys, never document bodies). ``carry_cols`` are
    attribute columns surfaced on the output, coalesced new-side-first
    so added docs read their new attributes and removed docs their old
    ones.

    Scale: ONE keyed shuffle (full outer join on the key columns);
    both sides project to keys + digest + carried attrs before the
    exchange. Linear in snapshot size, no skew hazard beyond the key
    distribution itself.
    """
    carry = carry_cols or []
    o = old.select(
        *key_cols,
        F.col(hash_col).alias("_old_hash"),
        *[F.col(c).alias(f"_old_{c}") for c in carry],
    )
    n = new.select(
        *key_cols,
        F.col(hash_col).alias("_new_hash"),
        *[F.col(c).alias(f"_new_{c}") for c in carry],
    )
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_old_hash").isNull(), F.lit("added"))
        .when(F.col("_new_hash").isNull(), F.lit("removed"))
        .when(F.col("_old_hash") == F.col("_new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *key_cols,
        status.alias("status"),
        *[
            F.coalesce(F.col(f"_new_{c}"), F.col(f"_old_{c}")).alias(c)
            for c in carry
        ],
    )


_SNAPSHOT_DIFF_SQL = """
WITH old_snap AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % 7 = 1 THEN text || ' [v1]' ELSE text END) AS h
  FROM documents WHERE doc_id % 7 <> 5
),
new_snap AS (
  SELECT doc_id, source, md5(text) AS h
  FROM documents WHERE doc_id % 7 <> 3
),
d AS (
  SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
         coalesce(n.source, o.source) AS source,
         CASE WHEN o.h IS NULL THEN 'added'
              WHEN n.h IS NULL THEN 'removed'
              WHEN o.h = n.h THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
)
SELECT source, status, count(*) AS n,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM d GROUP BY source, status ORDER BY source, status
"""


@register("dq_snapshot_diff", oracle=_SNAPSHOT_DIFF_SQL, tags=("ext", "dq"))
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff (``snapshot_diff`` kernel): which documents
    were added, removed, or changed between two snapshot versions,
    summarized per source — the audit that decides whether an
    incremental ingest re-triggers dedup/index-append downstream.

    Fixture construction (both snapshots derive deterministically from
    the one documents table, like the PSI key's before/after split):
    the OLD snapshot lacks doc_id%7==5 (not yet ingested) and carries
    a ' [v1]' variant of doc_id%7==1 bodies (since edited); the NEW
    snapshot dropped doc_id%7==3 (deleted upstream). Modulus 7 is
    coprime with the fixture's source assignment (doc_id%20), so every
    source sees every status — 80 summary rows, not a degenerate
    one-status-per-source alignment. The kernel never
    sees that provenance — it full-outer-joins two digest projections,
    exactly what it would do for genuinely distinct snapshot tables.
    """
    d = tables.load(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 7 != 5).select(
        "doc_id",
        "source",
        F.md5(
            F.encode(
                F.when(
                    F.col("doc_id") % 7 == 1, F.concat(F.col("text"), F.lit(" [v1]"))
                ).otherwise(F.col("text")),
                "UTF-8",
            )
        ).alias("content_hash"),
    )
    new = d.filter(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        "source",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("content_hash"),
    )
    diff = snapshot_diff(old, new, ["doc_id"], carry_cols=["source"])
    return (
        diff.groupBy("source", "status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source", "status")
    )


def ks_flagged(
    df: DataFrame,
    value_col: str,
    is_ref_col: str,
    bin_width: float,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test over quantized bins —
    the sibling of ``psi_drift_flagged`` for the same per-batch
    monitoring loop (PSI reacts to density shifts, KS to the largest
    CDF gap; production drift monitors run both on each ingest batch).

    The statistic is EXACT over the binned support: per bin the two
    cumulative counts are integers, and the CDF gap is compared via
    the cross-multiplied integer ``|cum_ref*n_cur - cum_cur*n_ref|``
    — no float ECDF division until the final reported ratio, so the
    argmax bin and the hash-checked columns are integer-deterministic
    across engines and partitionings.

    One input DataFrame carrying a 0/1 ``is_ref_col`` flag (same
    single-scan rationale as ``psi_drift_flagged``): one scan, one
    keyed partial-agg shuffle to per-bin counts. Both windows then run
    over the AGGREGATED bins table only — bounded (value range /
    bin_width rows; a few hundred for any sane width), so the
    single-partition funnel they imply is constant-size work, never a
    data-volume bottleneck. Output: one row per occupied bin with the
    running integer ECDF numerators, the integer gap, and constant
    columns (n_ref, n_cur, ks_num, ks_stat) so the statistic itself
    is part of the hashed result.
    """
    from pyspark.sql import Window

    cnt = (
        df.select(
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin"),
            F.col(is_ref_col).alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("cr"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("cc"),
        )
    )
    cum = Window.partitionBy().orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = cnt.select(
        "bin",
        F.sum("cr").over(cum).alias("cum_ref"),
        F.sum("cc").over(cum).alias("cum_cur"),
    )
    tot = Window.partitionBy()
    g = run.select(
        "bin",
        "cum_ref",
        "cum_cur",
        F.max("cum_ref").over(tot).alias("n_ref"),
        F.max("cum_cur").over(tot).alias("n_cur"),
    ).select(
        "bin",
        "cum_ref",
        "cum_cur",
        "n_ref",
        "n_cur",
        F.abs(
            F.col("cum_ref") * F.col("n_cur") - F.col("cum_cur") * F.col("n_ref")
        ).alias("gap_num"),
    )
    return g.select(
        "bin",
        "cum_ref",
        "cum_cur",
        "gap_num",
        "n_ref",
        "n_cur",
        F.max("gap_num").over(tot).alias("ks_num"),
        F.round(
            F.try_divide(
                F.max("gap_num").over(tot).cast("double"),
                F.col("n_ref") * F.col("n_cur"),
            ),
            6,
        ).alias("ks_stat"),
    ).orderBy("bin")


_DQ_KS_SQL = """
WITH binned AS (
  SELECT CAST(floor(o_totalprice / 1000) AS BIGINT) AS bin,
         CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS is_ref
  FROM orders
),
cnt AS (
  SELECT bin,
         CAST(sum(is_ref) AS BIGINT) AS cr,
         CAST(sum(1 - is_ref) AS BIGINT) AS cc
  FROM binned GROUP BY bin
),
run AS (
  SELECT bin,
         CAST(sum(cr) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_ref,
         CAST(sum(cc) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cur
  FROM cnt
),
g AS (
  SELECT bin, cum_ref, cum_cur,
         CAST(max(cum_ref) OVER () AS BIGINT) AS n_ref,
         CAST(max(cum_cur) OVER () AS BIGINT) AS n_cur
  FROM run
),
gg AS (
  SELECT bin, cum_ref, cum_cur,
         abs(cum_ref * n_cur - cum_cur * n_ref) AS gap_num,
         n_ref, n_cur
  FROM g
)
SELECT bin, cum_ref, cum_cur, gap_num, n_ref, n_cur,
       CAST(max(gap_num) OVER () AS BIGINT) AS ks_num,
       round(CAST(max(gap_num) OVER () AS DOUBLE) / (n_ref * n_cur), 6)
         AS ks_stat
FROM gg ORDER BY bin
"""


@register("dq_ks_test", oracle=_DQ_KS_SQL, tags=("ext", "dq"))
def dq_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift test on o_totalprice, before vs after
    1998-01-01 (the same one-scan flag split as ``dq_drift_psi``,
    1k-wide bins): the largest integer-exact ECDF gap between the two
    eras, reported per bin plus the global statistic. Running KS next
    to PSI on the same split is the standard drift-monitor pairing —
    PSI fires on reweighted densities, KS on a single large
    displacement."""
    o = tables.load(spark, sf_dir, "orders")
    flagged = o.select(
        "o_totalprice",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        ).otherwise(0).alias("is_ref"),
    )
    return ks_flagged(flagged, "o_totalprice", "is_ref", 1000.0)


def rank_sum_u(
    df: DataFrame,
    value_col: str,
    is_ref_col: str,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with tie-averaged ranks,
    computed entirely in integers: the effect-size companion to the
    KS/PSI drift pair (KS asks "did the distribution move", U/AUC asks
    "by how much does one sample stochastically dominate").

    Tie handling without floats: with per-value counts ``ct`` and the
    exclusive running count ``cb``, the tie-averaged rank is
    ``cb + (ct+1)/2`` — a possible half-integer — so everything is
    carried as DOUBLED ranks: ``rank2x = 2*cb + ct + 1`` (always an
    integer). Then ``R1*2 = Σ c1*rank2x`` and
    ``U1*2 = R1*2 - n1*(n1+1)`` are exact BIGINTs and the only float
    is the final AUC ``U1 / (n1*n2)``, reported rounded. The AUC form
    (probability a ref draw exceeds a cur draw, ties half-counted) is
    the common-language effect size ML evals report.

    Plan shape: one scan, one keyed agg to per-value counts, then
    windows over the AGGREGATED value table (bounded by the value
    domain — use on discrete/quantized columns, same contract as the
    binned KS). Output one row per distinct value with its integer
    doubled-rank, plus constant statistic columns.
    """
    from pyspark.sql import Window

    cnt = (
        df.select(
            F.col(value_col).alias("val"),
            F.col(is_ref_col).alias("is_ref"),
        )
        .groupBy("val")
        .agg(
            F.sum("is_ref").alias("c1"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("c2"),
        )
    )
    prev = Window.partitionBy().orderBy("val").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = cnt.select(
        "val",
        "c1",
        "c2",
        (
            2 * F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(prev), F.lit(0))
            + F.col("c1")
            + F.col("c2")
            + 1
        ).alias("rank2x"),
    )
    tot = Window.partitionBy()
    g = ranked.select(
        "val",
        "c1",
        "c2",
        "rank2x",
        F.sum("c1").over(tot).alias("n1"),
        F.sum("c2").over(tot).alias("n2"),
        F.sum(F.col("c1") * F.col("rank2x")).over(tot).alias("r1_2x"),
    )
    return g.select(
        "val",
        "c1",
        "c2",
        "rank2x",
        "n1",
        "n2",
        (F.col("r1_2x") - F.col("n1") * (F.col("n1") + 1)).alias("u1_2x"),
        F.round(
            F.try_divide(
                (F.col("r1_2x") - F.col("n1") * (F.col("n1") + 1)).cast(
                    "double"
                ),
                2 * F.col("n1") * F.col("n2"),
            ),
            6,
        ).alias("auc"),
    ).orderBy("val")


_DQ_MWU_SQL = """
WITH cnt AS (
  SELECT CAST(l_quantity AS BIGINT) AS val,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT)
           AS c2
  FROM lineitem
  WHERE l_returnflag IN ('R', 'N')
  GROUP BY 1
),
ranked AS (
  SELECT val, c1, c2,
         2 * CAST(coalesce(sum(c1 + c2) OVER (ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           + c1 + c2 + 1 AS rank2x
  FROM cnt
),
g AS (
  SELECT val, c1, c2, rank2x,
         CAST(sum(c1) OVER () AS BIGINT) AS n1,
         CAST(sum(c2) OVER () AS BIGINT) AS n2,
         CAST(sum(c1 * rank2x) OVER () AS BIGINT) AS r1_2x
  FROM ranked
)
SELECT val, c1, c2, rank2x, n1, n2,
       r1_2x - n1 * (n1 + 1) AS u1_2x,
       round(CAST(r1_2x - n1 * (n1 + 1) AS DOUBLE) / (2 * n1 * n2), 6) AS auc
FROM g ORDER BY val
"""


@register("dq_mann_whitney", oracle=_DQ_MWU_SQL, tags=("ext", "dq"))
def dq_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / AUC effect size: does l_quantity for returned
    lineitems (flag R) stochastically dominate non-returned (flag N)?
    l_quantity is a 50-value discrete domain, so the rank table the
    windows run over is bounded at 50 rows — the contract
    ``rank_sum_u`` documents (quantize continuous columns first, as
    the binned KS does)."""
    li = tables.load(spark, sf_dir, "lineitem")
    flagged = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_quantity").cast("long").alias("val"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_ref"),
    )
    return rank_sum_u(flagged, "val", "is_ref")


_CHI2_SQL = """
WITH obs AS (
  SELECT c_mktsegment AS segment, r_name AS region,
         CAST(count(*) AS BIGINT) AS o
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
tot AS (
  SELECT segment, region, o,
         CAST(sum(o) OVER (PARTITION BY segment) AS BIGINT) AS row_tot,
         CAST(sum(o) OVER (PARTITION BY region) AS BIGINT) AS col_tot,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM obs
),
cells AS (
  SELECT segment, region, o, row_tot, col_tot, n,
         round(CAST(o * n - row_tot * col_tot AS DOUBLE)
               * CAST(o * n - row_tot * col_tot AS DOUBLE)
               / (CAST(n AS DOUBLE) * row_tot * col_tot), 6) AS chi2_term
  FROM tot
)
SELECT segment, region, o, row_tot, col_tot, n, chi2_term,
       round(CAST(sum(chi2_term) OVER () AS DOUBLE), 6) AS chi2_stat
FROM cells ORDER BY segment, region
"""


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Chi-square independence test between two categorical columns —
    the categorical-drift / label-leakage audit. Returns one row per
    occupied contingency cell (a, b, o, row_tot, col_tot, n,
    chi2_term) plus the summed ``chi2_stat`` constant column.

    One keyed agg builds the contingency table; row/column/grand
    totals are windows over the AGGREGATED cell table (bounded by the
    category domains, never by data volume — quantize high-cardinality
    columns first, same contract as the binned KS). Each cell's
    ``(o*N - r*c)^2 / (N*r*c)`` uses exact BIGINT counts cast to
    double only for the final square-and-divide (the BIGINT products
    are exact up to N ~ 3e9 per cell; past that pre-scale the counts —
    same caveat family as the money-sum helpers). ``chi2_stat`` sums
    the ROUND6-quantized cell terms in one single-partition window —
    the quantized inputs keep the double sum order-insensitive at the
    reported precision."""
    from pyspark.sql import Window

    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    tot = obs.select(
        "a",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("b")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    num = (F.col("o") * F.col("n") - F.col("row_tot") * F.col("col_tot")).cast(
        "double"
    )
    cells = tot.select(
        "a",
        "b",
        "o",
        "row_tot",
        "col_tot",
        "n",
        F.round(
            num * num
            / (
                F.col("n").cast("double")
                * F.col("row_tot")
                * F.col("col_tot")
            ),
            6,
        ).alias("chi2_term"),
    )
    return cells.select(
        "a",
        "b",
        "o",
        "row_tot",
        "col_tot",
        "n",
        "chi2_term",
        F.round(
            F.sum("chi2_term").over(Window.partitionBy()), 6
        ).alias("chi2_stat"),
    ).orderBy("a", "b")


@register("dq_chi_square", oracle=_CHI2_SQL, tags=("ext", "dq"))
def dq_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit: is customer market segment
    independent of region? Two broadcast dim joins flatten the
    (segment, region) pair onto each customer, then
    ``chi_square_independence`` does the rest (|segments| x |regions|
    = 25 bounded cells)."""
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    r = tables.load(spark, sf_dir, "region")
    flat = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("r_name").alias("region"),
        )
    )
    return (
        chi_square_independence(flat, "segment", "region")
        .withColumnsRenamed({"a": "segment", "b": "region"})
    )


_WELCH_SQL = """
WITH g AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 'R' ELSE 'N' END AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS q
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY 1
),
w AS (
  SELECT
    max(CASE WHEN grp = 'R' THEN n END) AS n1,
    max(CASE WHEN grp = 'R' THEN s END) AS s1,
    max(CASE WHEN grp = 'R' THEN q END) AS q1,
    max(CASE WHEN grp = 'N' THEN n END) AS n2,
    max(CASE WHEN grp = 'N' THEN s END) AS s2,
    max(CASE WHEN grp = 'N' THEN q END) AS q2
  FROM g
),
v AS (
  SELECT n1, s1, q1, n2, s2, q2,
         CAST(n1 * q1 - s1 * s1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) AS vn1,
         CAST(n2 * q2 - s2 * s2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) AS vn2
  FROM w
)
SELECT n1, s1, q1, n2, s2, q2,
       round(CAST(s1 AS DOUBLE) / n1, 6) AS mean1,
       round(CAST(s2 AS DOUBLE) / n2, 6) AS mean2,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt(vn1 + vn2), 6) AS t_stat,
       round((vn1 + vn2) * (vn1 + vn2)
             / (vn1 * vn1 / (n1 - 1) + vn2 * vn2 / (n2 - 1)), 6) AS df
FROM v
"""


def welch_ttest(
    df: DataFrame, value_col: str, is_ref_col: str
) -> DataFrame:
    """Welch's unequal-variance t-test between the rows flagged 1 vs 0
    in ``is_ref_col`` over the INTEGER column ``value_col`` — the
    parametric mean-shift readout that pairs with ``rank_sum_u``
    (that one is distribution-free rank dominance; this one is the
    effect size dashboards actually quote).

    Single scan, ONE 2-row keyed agg: per group the count, sum, and
    sum-of-squares are exact BIGINTs (the squares fit while
    n*max(x)^2 < 9.2e18 — quantize wide columns first, as the binned
    KS does). The variance identity ``(n*q - s^2) / (n*n*(n-1))``
    (variance of the mean) runs on those exact integers with double
    division last; t and the Welch-Satterthwaite df are the only
    floats, reported rounded. The 2-row pivot is a constant-size
    single-row reduce — no window, no second scan."""
    qn = F.col(value_col).cast("long")
    g = df.groupBy(
        F.when(F.col(is_ref_col) == 1, "R").otherwise("N").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qn).alias("s"),
        F.sum(qn * qn).alias("q"),
    )
    w = g.agg(
        F.max(F.when(F.col("grp") == "R", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == "R", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("grp") == "R", F.col("q"))).alias("q1"),
        F.max(F.when(F.col("grp") == "N", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == "N", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("grp") == "N", F.col("q"))).alias("q2"),
    )
    vn1 = (
        (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n1").cast("double") * F.col("n1") * (F.col("n1") - 1))
    )
    vn2 = (
        (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2")).cast("double")
        / (F.col("n2").cast("double") * F.col("n2") * (F.col("n2") - 1))
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    return w.select(
        "n1",
        "s1",
        "q1",
        "n2",
        "s2",
        "q2",
        F.round(m1, 6).alias("mean1"),
        F.round(m2, 6).alias("mean2"),
        F.round((m1 - m2) / F.sqrt(vn1 + vn2), 6).alias("t_stat"),
        F.round(
            (vn1 + vn2)
            * (vn1 + vn2)
            / (
                vn1 * vn1 / (F.col("n1") - 1)
                + vn2 * vn2 / (F.col("n2") - 1)
            ),
            6,
        ).alias("df"),
    )


@register("dq_welch_ttest", oracle=_WELCH_SQL, tags=("ext", "dq"))
def dq_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t on mean l_quantity, returned (R) vs non-returned (N)
    lineitems — a one-flag projection into ``welch_ttest``."""
    li = tables.load(spark, sf_dir, "lineitem")
    flagged = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        "l_quantity",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_ref"),
    )
    return welch_ttest(flagged, "l_quantity", "is_ref")


# Poisson(1) CDF thresholds scaled to 2^32 (P(X<=k) * 2^32, k=0..8):
# a 32-bit uniform u maps to weight w = #thresholds <= u. Both engines
# compare the SAME integer literals against the SAME md5-derived
# uniform, so every resample weight is integer-deterministic.
_POISSON1_T = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
    4294609777,
    4294923276,
    4294962463,
)
_BOOT_B = 20  # resamples


def _boot_sql() -> str:
    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POISSON1_T)
    )
    return f"""
WITH ex AS (
  SELECT o_orderkey, o_totalprice, unnest(range(0, {_BOOT_B})) AS b
  FROM orders
),
u AS (
  SELECT b, o_totalprice,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                             CAST(b AS VARCHAR)), 1, 8))::BIGINT AS u
  FROM ex
),
w AS (
  SELECT b, o_totalprice,
         CASE {cases} ELSE {len(_POISSON1_T)} END AS w
  FROM u
),
means AS (
  SELECT b,
         CAST(sum(w) AS BIGINT) AS n_eff,
         round((CAST(sum(w * CAST(round(o_totalprice * 1000000) AS BIGINT))
                     AS DOUBLE) / sum(w)) / 1000000, 6) AS boot_mean
  FROM w GROUP BY b
)
SELECT b, n_eff, boot_mean,
       round(min(boot_mean) OVER (), 6) AS ci_lo,
       round(max(boot_mean) OVER (), 6) AS ci_hi
FROM means ORDER BY b
"""


def poisson_bootstrap_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_resamples: int = _BOOT_B,
) -> DataFrame:
    """Poisson bootstrap of ``mean(value_col)``: ``n_resamples``
    deterministic resamples, each row's multiplicity drawn as
    Poisson(1) via the inverse CDF over a 32-bit md5-derived uniform
    of (``key_col``, b) — THE distributed bootstrap (resampling n rows
    with replacement needs global coordination; independent Poisson(1)
    weights approximate the multinomial exactly as n grows and need
    only a per-row hash).

    One scan with a map-side B-way explode (bounded constant spine —
    the honest linear-in-B cost), exact micro-int weighted sums into
    one keyed agg on b with map-side partials, and the resample-mean
    envelope (min/max over the B-row table) as the reported interval.
    No RNG state anywhere: weights are a pure function of
    (key, b), so any engine reproduces every resample bit-for-bit —
    which is what makes a cross-engine value-hash oracle possible for
    a *bootstrap*."""
    ex = df.select(
        F.col(key_col).alias("_k"),
        F.col(value_col).alias("_x"),
        F.explode(F.sequence(F.lit(0), F.lit(n_resamples - 1))).alias("b"),
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("_k").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(len(_POISSON1_T))
    for k in range(len(_POISSON1_T) - 1, -1, -1):
        w = F.when(u < _POISSON1_T[k], k).otherwise(w)
    xm = F.round(F.col("_x") * 1_000_000).cast("long")
    means = (
        ex.select("b", w.alias("w"), xm.alias("xm"))
        .groupBy("b")
        .agg(
            F.sum("w").alias("n_eff"),
            F.round(
                F.try_divide(
                    F.sum(F.col("w") * F.col("xm")).cast("double"),
                    F.sum("w"),
                )
                / 1_000_000,
                6,
            ).alias("boot_mean"),
        )
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    return means.select(
        "b",
        "n_eff",
        "boot_mean",
        F.round(F.min("boot_mean").over(tot), 6).alias("ci_lo"),
        F.round(F.max("boot_mean").over(tot), 6).alias("ci_hi"),
    ).orderBy("b")


@register("stats_bootstrap_ci", oracle=_boot_sql(), tags=("ext", "dq", "bench2"))
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of mean(o_totalprice), B=20, keyed on
    o_orderkey — ``poisson_bootstrap_mean`` applied to orders."""
    o = tables.load(spark, sf_dir, "orders")
    return poisson_bootstrap_mean(o, "o_orderkey", "o_totalprice", _BOOT_B)


def _benford_sql() -> str:
    import math

    expected = ", ".join(
        f"({d}, {round(math.log10(1 + 1 / d), 6)})" for d in range(1, 10)
    )
    return f"""
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE o_totalprice > 0
),
digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM cents
),
cnt AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
exp_tab AS (SELECT digit, CAST(expected_share AS DOUBLE) AS expected_share
            FROM (VALUES {expected}) AS t(digit, expected_share))
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 6) AS observed_share,
       e.expected_share,
       round(abs(CAST(c.n AS DOUBLE) / t.total - e.expected_share), 6)
         AS abs_dev,
       round(CAST(sum(abs(CAST(c.n AS DOUBLE) / t.total - e.expected_share))
             OVER () AS DOUBLE) / 9, 6) AS mad_stat
FROM cnt c JOIN exp_tab e ON e.digit = c.digit CROSS JOIN tot t
ORDER BY c.digit
"""


@register("dq_benford_test", oracle=_benford_sql(), tags=("ext", "dq"))
def dq_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of o_totalprice — the classic
    fabricated-data / unit-mixing detector (organically-grown money
    amounts follow log10(1+1/d); flat or spiked digit histograms flag
    synthetic or truncated feeds). One row per leading digit with the
    observed vs expected share and the mean-absolute-deviation
    statistic (Nigrini's MAD, the standard conformity readout).

    Digit extraction is INTEGER-EXACT: first character of the cents
    BIGINT rendered as a string — never floor(x/10^floor(log10 x)),
    whose float log is wrong at power-of-ten boundaries and need not
    agree across engines. One scan + 9-row agg; windows run over the
    9-row digit table; the expected shares are shared literals."""
    from pyspark.sql import Window

    import math

    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    cnt = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    exp_rows = [(d, round(math.log10(1 + 1 / d), 6)) for d in range(1, 10)]
    exp_tab = o.sparkSession.createDataFrame(
        exp_rows, "digit int, expected_share double"
    )
    tot = Window.partitionBy()
    obs = F.col("n").cast("double") / F.sum("n").over(tot)
    dev = F.abs(obs - F.col("expected_share"))
    return (
        cnt.join(F.broadcast(exp_tab), "digit")
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_share"),
            "expected_share",
            F.round(dev, 6).alias("abs_dev"),
            F.round(F.sum(dev).over(tot) / 9, 6).alias("mad_stat"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Deterministic permutation test (M213)

_PERM_B = 32  # permutations


def _perm_sql() -> str:
    return f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS in_a
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
tot AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS na,
         CAST(sum(1 - in_a) AS BIGINT) AS nb,
         CAST(sum(in_a * cents) AS BIGINT) AS sa,
         CAST(sum((1 - in_a) * cents) AS BIGINT) AS sb
  FROM base
),
ex AS (
  SELECT k, cents, unnest(range(0, {_PERM_B})) AS b FROM base
),
assigned AS (
  SELECT b, cents,
         CASE WHEN ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                                       CAST(b AS VARCHAR)), 1, 8))::BIGINT
                   * (t.na + t.nb) < t.na * 4294967296
              THEN 1 ELSE 0 END AS in_a
  FROM ex CROSS JOIN tot t
),
perm AS (
  SELECT b,
         CAST(sum(in_a) AS BIGINT) AS n_a_perm,
         CAST(sum(1 - in_a) AS BIGINT) AS n_b_perm,
         CAST(sum(in_a * cents) AS BIGINT) AS sa,
         CAST(sum((1 - in_a) * cents) AS BIGINT) AS sb
  FROM assigned GROUP BY b
),
scored AS (
  SELECT p.b, p.n_a_perm, p.n_b_perm,
         round((CAST(p.sa AS DOUBLE) / p.n_a_perm
                - CAST(p.sb AS DOUBLE) / p.n_b_perm) / 100, 6) AS perm_diff,
         round((CAST(t.sa AS DOUBLE) / t.na
                - CAST(t.sb AS DOUBLE) / t.nb) / 100, 6) AS obs_diff
  FROM perm p CROSS JOIN tot t
)
SELECT b, n_a_perm, n_b_perm, perm_diff, obs_diff,
       CASE WHEN abs(perm_diff) >= abs(obs_diff) THEN 1 ELSE 0 END AS exceed,
       round(CAST(1 + sum(CASE WHEN abs(perm_diff) >= abs(obs_diff)
                               THEN 1 ELSE 0 END) OVER () AS DOUBLE)
             / {_PERM_B + 1}, 6) AS p_value
FROM scored ORDER BY b
"""


def permutation_test_mean(
    df: DataFrame,
    key_col: str,
    value_cents_col: str,
    group_col: str,
    n_perms: int = _PERM_B,
) -> DataFrame:
    """Randomization test for a two-group mean difference with NO RNG
    state: permutation b reassigns each row to group A with
    probability n_a/n via a 32-bit md5 uniform of (key, b), compared
    through EXACT integer cross-multiplication ``u * n < n_a * 2^32``
    (never a float threshold). This is the Bernoulli-randomization
    variant of the permutation test — group sizes float around their
    expectation instead of being held fixed, the standard trade made
    to keep the test embarrassingly parallel: an exact size-preserving
    shuffle needs a global permutation (one total sort per resample),
    while this needs only a per-row hash, so B resamples cost ONE
    B-way map-side explode + one keyed agg at any corpus size.

    Group sums are exact BIGINT cents; each mean difference is round6
    of single double divisions of those exact integers (identical IEEE
    doubles in both engines), so the exceedance indicator and the
    add-one-smoothed p-value ``(1 + #{|perm| >= |obs|}) / (B + 1)``
    are cross-engine value-hash-exact — a permutation test with a
    full SQL oracle, same regime as ``poisson_bootstrap_mean``.

    ``group_col`` must be 1 (group A) / 0 (group B).
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(value_cents_col).alias("cents"),
        F.col(group_col).alias("in_a"),
    )
    tot = base.agg(
        F.sum("in_a").alias("na"),
        F.sum(1 - F.col("in_a")).alias("nb"),
        F.sum(F.col("in_a") * F.col("cents")).alias("sa"),
        F.sum((1 - F.col("in_a")) * F.col("cents")).alias("sb"),
    )
    ex = base.select(
        "_k",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(n_perms - 1))).alias("b"),
    ).crossJoin(F.broadcast(tot))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("_k").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    in_a = F.when(
        u * (F.col("na") + F.col("nb")) < F.col("na") * F.lit(4294967296),
        1,
    ).otherwise(0)
    perm = (
        ex.select(
            "b",
            "cents",
            "na",
            "nb",
            "sa",
            "sb",
            in_a.alias("in_a"),
        )
        .groupBy("b", "na", "nb", "sa", "sb")
        .agg(
            F.sum("in_a").alias("n_a_perm"),
            F.sum(1 - F.col("in_a")).alias("n_b_perm"),
            F.sum(F.col("in_a") * F.col("cents")).alias("psa"),
            F.sum((1 - F.col("in_a")) * F.col("cents")).alias("psb"),
        )
    )
    perm_diff = F.round(
        (
            F.col("psa").cast("double") / F.col("n_a_perm")
            - F.col("psb").cast("double") / F.col("n_b_perm")
        )
        / 100,
        6,
    )
    obs_diff = F.round(
        (
            F.col("sa").cast("double") / F.col("na")
            - F.col("sb").cast("double") / F.col("nb")
        )
        / 100,
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    exceed = F.when(F.abs(F.col("perm_diff")) >= F.abs(F.col("obs_diff")), 1).otherwise(0)
    return (
        perm.select(
            "b",
            "n_a_perm",
            "n_b_perm",
            perm_diff.alias("perm_diff"),
            obs_diff.alias("obs_diff"),
        )
        .select(
            "b",
            "n_a_perm",
            "n_b_perm",
            "perm_diff",
            "obs_diff",
            exceed.alias("exceed"),
            F.round(
                (1 + F.sum(exceed).over(w)).cast("double") / (n_perms + 1), 6
            ).alias("p_value"),
        )
        .orderBy("b")
    )


@register("stats_permutation_test", oracle=_perm_sql(), tags=("ext", "dq"))
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test of mean(o_totalprice), finished (F) vs open
    (O) orders, B=32 — ``permutation_test_mean`` applied to orders."""
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O")
    )
    base = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("in_a"),
    )
    return permutation_test_mean(base, "o_orderkey", "cents", "in_a", _PERM_B)


# ---------------------------------------------------------------------------
# Leakage-safe target encoding (M232)

_TENC_SMOOTH = 20  # prior weight (rows of global mean blended in)

_TARGET_ENC_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS cat,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
grp AS (
  SELECT cat,
         CAST(count(*) AS BIGINT) AS n_cat,
         CAST(sum(cents) AS BIGINT) AS sum_cat
  FROM base GROUP BY cat
),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(cents) AS BIGINT) AS sum_all
  FROM base
)
SELECT b.o_orderkey, b.cat,
       g.n_cat,
       round((CAST(g.sum_cat - b.cents AS DOUBLE) / 100
              + {_TENC_SMOOTH} * (CAST(gl.sum_all AS DOUBLE) / gl.n_all / 100))
             / (g.n_cat - 1 + {_TENC_SMOOTH}), 6) AS loo_encoding
FROM base b
JOIN grp g ON g.cat = b.cat
CROSS JOIN gtot gl
ORDER BY b.o_orderkey
"""


def target_encode_loo(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    target_cents_col: str,
    smoothing: int = _TENC_SMOOTH,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing: each
    row's categorical feature becomes ``(sum_cat - own + m*prior) /
    (n_cat - 1 + m)`` — the category's mean target EXCLUDING the row
    itself, shrunk toward the global mean. Leave-one-out is the
    leakage rule: encoding a row with a statistic that contains its
    own target leaks the label into the feature (the train-serve gap
    every naive mean-encoder ships); the smoothing keeps rare
    categories from collapsing onto their own noise.

    All sums are exact BIGINT cents; the one blended division is
    round6 of exact-integer operands. One keyed agg + one broadcast
    of the per-category table + a 1-row global — the encode itself is
    map-side, so the op costs one shuffle at any corpus size."""
    base = df.select(
        F.col(key_col).alias("_k"),
        F.col(cat_col).alias("cat"),
        F.col(target_cents_col).alias("cents"),
    )
    grp = base.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum("cents").alias("sum_cat"),
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("cents").alias("sum_all"),
    )
    prior = F.col("sum_all").cast("double") / F.col("n_all") / 100
    enc = F.round(
        (
            (F.col("sum_cat") - F.col("cents")).cast("double") / 100
            + smoothing * prior
        )
        / (F.col("n_cat") - 1 + smoothing),
        6,
    )
    return (
        base.join(F.broadcast(grp), "cat")
        .crossJoin(F.broadcast(glob))
        .select(
            F.col("_k").alias("o_orderkey"),
            "cat",
            "n_cat",
            enc.alias("loo_encoding"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "ml_target_encoding", oracle=_TARGET_ENC_SQL, tags=("ext", "ml", "bench2")
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of o_orderpriority
    against the order amount — ``target_encode_loo`` on orders."""
    o = tables.load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return target_encode_loo(base, "o_orderkey", "o_orderpriority", "cents")


# ---------------------------------------------------------------------------
# Weight of evidence / information value (M233)

_WOE_SQL = """
WITH base AS (
  SELECT n.n_name AS nation,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
cell AS (
  SELECT nation,
         CAST(sum(ev) AS BIGINT) AS n_events,
         CAST(sum(1 - ev) AS BIGINT) AS n_nonevents
  FROM base GROUP BY nation
),
tot AS (
  SELECT CAST(sum(n_events) AS BIGINT) AS e_tot,
         CAST(sum(n_nonevents) AS BIGINT) AS ne_tot
  FROM cell
),
scored AS (
  SELECT c.nation, c.n_events, c.n_nonevents,
         ln(((c.n_events + 0.5) / t.e_tot)
            / ((c.n_nonevents + 0.5) / t.ne_tot)) AS woe_raw,
         (CAST(c.n_events AS DOUBLE) / t.e_tot
          - CAST(c.n_nonevents AS DOUBLE) / t.ne_tot) AS share_gap
  FROM cell c CROSS JOIN tot t
)
SELECT nation, n_events, n_nonevents,
       round(woe_raw, 6) AS woe,
       round(share_gap * woe_raw, 6) AS iv_contrib,
       round(sum(share_gap * woe_raw) OVER (), 6) AS iv_total
FROM scored
ORDER BY nation
"""


@register("ml_woe_iv", oracle=_WOE_SQL, tags=("ext", "ml", "bench2"))
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information value of the customer nation
    against order finality — the credit-scoring feature audit (WoE =
    ln of the event/non-event share ratio per category; IV = the
    share-gap-weighted sum, the standard predictive-power screen with
    the <0.02 useless / >0.5 suspicious reading). The +0.5 cell
    adjustment (adjusted WoE) is applied to EVERY cell in BOTH
    engines — not a zero-cell branch, so there is no latent oracle
    divergence on a future fixture with an empty cell (the ADVICE r8
    Kaplan-Meier lesson).

    Counts are exact BIGINT; ln over identical doubles; the IV window
    runs over the 25-row category table. One fact scan + two
    broadcast dims + one keyed agg — map-side at any scale."""
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    n = tables.load(spark, sf_dir, "nation")
    ev = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    base = (
        o.select("o_custkey", ev.alias("ev"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "ev")
    )
    cell = base.groupBy("nation").agg(
        F.sum("ev").alias("n_events"),
        F.sum(1 - F.col("ev")).alias("n_nonevents"),
    )
    tot = cell.agg(
        F.sum("n_events").alias("e_tot"),
        F.sum("n_nonevents").alias("ne_tot"),
    )
    woe_raw = F.log(
        ((F.col("n_events") + 0.5) / F.col("e_tot"))
        / ((F.col("n_nonevents") + 0.5) / F.col("ne_tot"))
    )
    share_gap = (
        F.col("n_events").cast("double") / F.col("e_tot")
        - F.col("n_nonevents").cast("double") / F.col("ne_tot")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    scored = cell.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n_events",
        "n_nonevents",
        woe_raw.alias("woe_raw"),
        share_gap.alias("share_gap"),
    )
    return scored.select(
        "nation",
        "n_events",
        "n_nonevents",
        F.round(F.col("woe_raw"), 6).alias("woe"),
        F.round(F.col("share_gap") * F.col("woe_raw"), 6).alias("iv_contrib"),
        F.round(
            F.sum(F.col("share_gap") * F.col("woe_raw")).over(w), 6
        ).alias("iv_total"),
    ).orderBy("nation")
