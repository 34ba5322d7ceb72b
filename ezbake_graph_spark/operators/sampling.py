"""Sampling & dataset-split operators for training-data pipelines.

A 100 TB training pipeline needs reproducible splits and samples:

- ``sample_split_train_test``: the deterministic hash split. Assignment
  is a pure function of the stable key (md5 of the id), so it is
  engine-independent (full SQL oracle), stable under re-runs, appends,
  and repartitioning — the property random() splits lack. One narrow
  scan, no shuffle: the split predicate fuses into WholeStageCodegen.
- ``sample_bernoulli``: seeded row sample (``df.sample``) — per-row
  coin flips, no shuffle, but engine-specific RNG ⇒ rows-only check;
  invariants (size concentration, determinism under same seed) are
  asserted in tests/test_sampling.py.
- ``sample_stratified``: per-stratum fractions (``df.sampleBy``) — the
  class-balancing primitive; same RNG caveat ⇒ rows-only.

Scale notes: all three are single-pass map-side operators; the only
aggregation here is the small per-split/per-stratum summary. Hash
splitting at 100 TB beats materializing split tables: it needs no
bookkeeping join at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

# first-two-hex-digit threshold: 'cc' = 204/256 = 79.7% train
_SPLIT_HEX_THRESHOLD = "cc"

_SPLIT_SQL = f"""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_SPLIT_HEX_THRESHOLD}'
            THEN 'train' ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


@register("sample_split_train_test", oracle=_SPLIT_SQL, tags=("ext", "sampling"))
def sample_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test split keyed on md5(doc_id)."""
    d = tables.load(spark, sf_dir, "documents")
    first2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return d.select(
        "doc_id",
        F.when(first2 < _SPLIT_HEX_THRESHOLD, "train").otherwise("test").alias("split"),
    ).orderBy("doc_id")


@register("sample_bernoulli", oracle=None, tags=("ext", "sampling", "rows-only"))
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 10% Bernoulli sample of lineitem (engine RNG ⇒ rows-only)."""
    li = tables.load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


_STRATA_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "ja": 0.25}


@register("sample_stratified", oracle=None, tags=("ext", "sampling", "rows-only"))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample by language: 50% en, 25% the rest — the
    class-rebalancing primitive for skewed corpora."""
    d = tables.load(spark, sf_dir, "documents")
    return d.sampleBy("lang", fractions=_STRATA_FRACTIONS, seed=42).select(
        "doc_id", "lang"
    )


_RESERVOIR_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY md5(l_orderkey || '-' || l_linenumber))
           AS rn
  FROM lineitem
)
SELECT l_returnflag, l_orderkey, l_linenumber
FROM ranked WHERE rn <= 20
ORDER BY l_returnflag, l_orderkey, l_linenumber
"""


@register("sample_reservoir_hash", oracle=_RESERVOIR_SQL, tags=("ext", "sampling"))
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-group sample via hash-ordering — the deterministic
    reservoir: rank rows by md5(stable key) inside each group and keep
    the first k. Unlike RNG reservoirs this is engine-independent
    (full SQL oracle), stable under re-runs/appends/repartitioning,
    and uniform as long as md5 is well-mixed. One keyed window; at
    100 TB replace the full rank with a per-partition top-k +
    merge-of-k (same TakeOrderedAndProject shape as F3)."""
    from pyspark.sql import Window

    li = tables.load(spark, sf_dir, "lineitem")
    key_hash = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy(key_hash)
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    )


_TEMPERATURE_SQL = """
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
     m AS (SELECT min(n) AS mn FROM counts)
SELECT d.lang, d.doc_id
FROM documents d JOIN counts c ON d.lang = c.lang, m
WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
    * ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
    * c.n < m.mn * 4294967296
ORDER BY d.lang, d.doc_id
"""


@register("sample_temperature_mix", oracle=_TEMPERATURE_SQL, tags=("ext", "sampling", "M85"))
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened corpus mixing (alpha = 0.5): sample each
    language at rate sqrt(min_count / n_lang), so over-represented
    languages are downsampled toward the smallest one — the standard
    multilingual-corpus rebalancing knob (alpha=1 keeps natural
    proportions, alpha=0 equalizes; sqrt is the midpoint used by
    multilingual LM data recipes).

    Engine-independent exactness: selection is the pure integer
    predicate h^2 * n < min_count * 2^32 with h = first-16-bits of
    md5(doc_id) — i.e. keep iff (h/2^16)^2 < min/n, a deterministic
    uniform draw at rate sqrt(min/n) with NO float sqrt or RNG anywhere
    (both engines agree bit-for-bit, full value-hash oracle; contrast
    sample_bernoulli's engine-specific RNG).

    Scale: two tiny aggregates (per-lang counts, global min) broadcast
    into a map-side filter over the corpus — one pass, no shuffle of
    the documents themselves; the assignment is stable under re-runs,
    appends, and repartitioning, like all hash-keyed sampling here."""
    d = tables.load(spark, sf_dir, "documents")
    return temperature_sample(d).select("lang", "doc_id").orderBy("lang", "doc_id")


def temperature_sample(
    df: DataFrame, strata_col: str = "lang", key_col: str = "doc_id"
) -> DataFrame:
    """Parameterized sqrt-temperature-flattening core shared by the
    ``sample_temperature_mix`` registry key and
    ``api.temperature_sample``: keep each row of stratum s at rate
    sqrt(min_count / n_s) via the pure integer predicate
    h^2 * n_s < min_count * 2^32 with h = first-16-bits of
    md5(key) — deterministic, RNG-free, stable under re-runs and
    repartitioning. Two tiny broadcast aggregates into one map-side
    filter; the data itself never shuffles. Returns the surviving rows
    with all input columns. NULL is a stratum like any other: the
    count join is eqNullSafe (same as ``epoch_mix`` — a plain
    equi-join would silently DROP every NULL-stratum row)."""
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(F.col(strata_col).alias("__strata"), "__n")
    )
    m = counts.agg(F.min("__n").alias("__mn"))
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    return (
        df.join(
            F.broadcast(counts), F.col(strata_col).eqNullSafe(F.col("__strata"))
        )
        .crossJoin(F.broadcast(m))
        .filter(h * h * F.col("__n") < F.col("__mn") * F.lit(4294967296))
        .select(*df.columns)
    )


_NEGATIVES_SQL = """
WITH pairs AS (
  SELECT a.doc_id AS anchor_id, c.doc_id AS neg_id,
         row_number() OVER (
           PARTITION BY a.doc_id
           ORDER BY md5(CAST(a.doc_id AS VARCHAR) || '-'
                        || CAST(c.doc_id AS VARCHAR))) AS rnk
  FROM documents a JOIN documents c ON c.doc_id <> a.doc_id
  WHERE a.doc_id < 50
)
SELECT anchor_id, neg_id, rnk
FROM pairs WHERE rnk <= 5
ORDER BY anchor_id, rnk
"""


@register("sample_negatives_hash", oracle=_NEGATIVES_SQL, tags=("ext", "sampling", "M99"))
def sample_negatives_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: 5
    negatives per anchor document, chosen by ranking candidates on
    md5(anchor, candidate) — uniform over the corpus, reproducible on
    any engine/partitioning/re-run (no RNG state to seed or ship), and
    different per anchor (the hash mixes both ids). This is the
    in-batch-negatives replacement when training needs STABLE pairs
    (eval sets, cached hard-negative mining).

    Scale: as written, anchors x corpus pairs flow through one keyed
    window — fine for a bounded anchor set. For all-anchors at 100 TB,
    keep the identical hash but select via threshold (hash16 < k/N *
    2^16: expected-k, no window) or per-anchor top-k over a hash-
    bucketed candidate slice; determinism is unchanged because the
    hash, not the plan, defines the sample."""
    d = tables.load(spark, sf_dir, "documents")
    anchors = d.filter(F.col("doc_id") < 50).select(F.col("doc_id").alias("anchor_id"))
    cands = d.select(F.col("doc_id").alias("neg_id"))
    pairs = F.broadcast(anchors).join(
        cands, F.col("neg_id") != F.col("anchor_id")
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("-"),
                F.col("neg_id").cast("string"),
            )
        )
    )
    return (
        pairs.select("anchor_id", "neg_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 5)
        .orderBy("anchor_id", "rnk")
    )


_WEIGHTED_SQL = """
WITH pri AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS DOUBLE)
             / n_chars AS priority
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, n_chars
FROM pri
ORDER BY priority, doc_id
LIMIT 50
"""


@register("sample_weighted", oracle=_WEIGHTED_SQL, tags=("ext", "sampling", "M126"))
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (size-biased): keep the 50 docs
    with the smallest priority u/w, where u is the 16-bit md5 uniform
    and w = n_chars — longer documents draw proportionally smaller
    priorities, so selection probability rises with weight. The
    training-mixture primitive behind "sample documents ∝ length".

    Cross-engine exactness: u/w is ONE IEEE division (correctly
    rounded by the standard, unlike libm pow/ln), so both engines rank
    identical doubles; doc_id tie-break seals the order. The textbook
    exponential-clocks scheme (-ln(u)/w, exact ∝w without-replacement
    semantics) would hang the hash on ln() parity — documented trade.
    Plan: map-side priority + TakeOrderedAndProject, no shuffle of the
    full table; repeatable under retries/repartitioning like every
    hash-keyed sampler here."""
    d = tables.load(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "double"
    )
    return (
        # zero-weight docs are excluded (both sides): priority u/0
        # would raise under Spark ANSI and sort as inf in DuckDB —
        # a weightless item has no place in a size-biased sample anyway
        d.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", (u / F.col("n_chars")).alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(50)
        .select("doc_id", "n_chars")
    )


_LEAK_SPLIT_SQL = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < 200
), pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / CAST(len(a.toks) + len(b.toks)
               - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        >= 0.8
), sym AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION SELECT d2, d1 FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM t
  UNION
  SELECT s.dst AS node, r.label
  FROM reach r JOIN sym s ON s.src = r.node
  WHERE r.label < s.dst
), comp AS (
  SELECT node AS doc_id, min(label) AS canonical_doc_id
  FROM reach GROUP BY node
), assigned AS (
  SELECT doc_id, canonical_doc_id,
         CASE WHEN substr(md5(CAST(canonical_doc_id AS VARCHAR)), 1, 2)
                   < '{_SPLIT_HEX_THRESHOLD}'
              THEN 'train' ELSE 'test' END AS split,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                   < '{_SPLIT_HEX_THRESHOLD}'
              THEN 'train' ELSE 'test' END AS naive_split
  FROM comp
)
SELECT doc_id, canonical_doc_id, split, naive_split,
       CAST(count(*) OVER (PARTITION BY canonical_doc_id) AS BIGINT)
         AS cluster_size,
       (min(naive_split) OVER (PARTITION BY canonical_doc_id)
        <> max(naive_split) OVER (PARTITION BY canonical_doc_id))
         AS naive_leaks
FROM assigned
ORDER BY doc_id
"""


@register(
    "sample_split_leakage_safe",
    oracle=_LEAK_SPLIT_SQL,
    tags=("ext", "sampling"),
)
def sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/test split: hash the near-duplicate CLUSTER
    canonical, not the document — so near-dups can never straddle the
    split boundary (the eval-contamination failure mode a plain
    per-doc hash split has: a test doc whose near-copy sits in train).
    Same exact-Jaccard pair graph + Pregel WCC canonicalization as
    ``dedup_cluster_canonical`` (doc_id<200 oracle scope; MinHash-LSH
    feeds the same kernel at 100 TB), then the md5 split keyed on
    ``canonical_doc_id``.

    Output carries the audit: ``naive_split`` (what the per-doc hash
    would do) and ``naive_leaks`` (true on every member of a cluster
    the naive split straddles — the rows this operator exists to fix).
    Split assignment stays a pure function of stable ids: stable under
    re-runs, appends, and repartitioning. Plan: the pair+WCC stages
    are the dedup kernel's (keyed shuffles, loop on the pair graph
    only); the split itself is map-side; the audit windows are keyed
    on the cluster id."""
    from ezbake_graph_spark.graph.pregel import connected_components
    from ezbake_graph_spark.operators.llm_dedup import (
        JACCARD_THRESHOLD,
        _doc_tokens,
        _jaccard_pairs,
    )

    tok = _doc_tokens(spark, sf_dir, max_doc=200)
    pairs = (
        _jaccard_pairs(tok)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
    )
    verts = tok.select(F.col("doc_id").alias("id")).distinct()
    comp = connected_components(verts, pairs).select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical_doc_id"),
    )

    def hash_split(col: str):
        first2 = F.substring(F.md5(F.col(col).cast("string")), 1, 2)
        return F.when(first2 < _SPLIT_HEX_THRESHOLD, "train").otherwise("test")

    w = Window.partitionBy("canonical_doc_id")
    assigned = comp.select(
        "doc_id",
        "canonical_doc_id",
        hash_split("canonical_doc_id").alias("split"),
        hash_split("doc_id").alias("naive_split"),
    )
    return assigned.select(
        "doc_id",
        "canonical_doc_id",
        "split",
        "naive_split",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.min("naive_split").over(w) != F.max("naive_split").over(w)).alias(
            "naive_leaks"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Curriculum ordering (M218)

_CURRICULUM_EPOCHS = 4

_CURRICULUM_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
per_doc AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(length(t.term)) AS BIGINT) AS tok_chars,
         CAST(sum(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare
  FROM tok t JOIN df d ON d.term = t.term
  GROUP BY t.doc_id
),
scored AS (
  SELECT doc_id, n_tok, n_rare,
         (tok_chars * 1000000) // n_tok
           + (n_rare * 1000000) // n_tok AS difficulty_micro
  FROM per_doc
)
SELECT doc_id, n_tok, n_rare, difficulty_micro,
       row_number() OVER (ORDER BY difficulty_micro, doc_id)
         AS curriculum_rank,
       ntile({_CURRICULUM_EPOCHS})
         OVER (ORDER BY difficulty_micro, doc_id) AS epoch_bucket
FROM scored
ORDER BY curriculum_rank
"""


@register("sample_curriculum_order", oracle=_CURRICULUM_SQL, tags=("ext", "sampling"))
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: schedule training documents
    easiest-first by an exact integer difficulty score — mean word
    length plus rare-word share (corpus df <= 2), both in micro-units
    via BIGINT floor division — then assign equal-depth epoch buckets
    (ntile over the same total order), the easy-to-hard curriculum
    schedule between data selection and packing.

    Determinism: the score is all-integer (no float op exists), and
    the (difficulty_micro, doc_id) order is total, so rank and epoch
    assignment are engine-exact. Scale shape: one token explode + one
    df agg + one broadcast-df join back + one per-doc agg; the global
    rank/ntile is a single total-order window at committed scales,
    and past ``distorder.WINDOW_GATE_ROWS`` it switches to
    rank-within-difficulty-bucket + bucket offsets (the distributed
    global-order kernel — quantile-bucketed local windows, triangular
    offsets, no single-partition exchange), which preserves the
    curriculum exactly because bucketing is monotone in the score
    (equivalence + plan pinned by tests/test_plans.py).

    Width note: the committed schema keeps Spark's IntegerType rank
    for engine parity; at true 100 TB cardinality the kernel's native
    LongType rank is the right width (drop the final cast)."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    per_doc = (
        tok.join(F.broadcast(df), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.length("term")).alias("tok_chars"),
            F.sum(F.when(F.col("df") <= 2, 1).otherwise(0)).alias("n_rare"),
        )
    )
    scored = per_doc.select(
        "doc_id",
        "n_tok",
        "n_rare",
        (
            F.expr("tok_chars * 1000000 div n_tok")
            + F.expr("n_rare * 1000000 div n_tok")
        ).alias("difficulty_micro"),
    )
    from ezbake_graph_spark.operators import distorder

    if distorder.use_distributed_window(spark, sf_dir, "documents"):
        return (
            distorder.attach_global_order(
                scored,
                "difficulty_micro",
                [F.col("difficulty_micro"), F.col("doc_id")],
                rank_col="_rank",
                ntile=("epoch_bucket", _CURRICULUM_EPOCHS),
            )
            .select(
                "doc_id",
                "n_tok",
                "n_rare",
                "difficulty_micro",
                F.col("_rank").cast("int").alias("curriculum_rank"),
                "epoch_bucket",
            )
            .orderBy("curriculum_rank")
        )
    w = Window.orderBy("difficulty_micro", "doc_id")
    return scored.select(
        "doc_id",
        "n_tok",
        "n_rare",
        "difficulty_micro",
        F.row_number().over(w).alias("curriculum_rank"),
        F.ntile(_CURRICULUM_EPOCHS).over(w).alias("epoch_bucket"),
    ).orderBy("curriculum_rank")


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling (M234)

_NEYMAN_N = 1000  # total sample target

_NEYMAN_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS stratum,
         CAST(round(o_totalprice / 10) AS BIGINT) AS x10
  FROM orders
),
mom AS (
  SELECT stratum,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(x10) AS BIGINT) AS sx,
         CAST(sum(x10 * x10) AS BIGINT) AS sxx
  FROM base GROUP BY stratum
),
sd AS (
  -- 128-bit exact variance numerator: n_h * sxx and sx * sx pass
  -- 2^63 at ~4x sf0.1 (measured 1.2e19 / 9.1e18 vs 9.2e18), so the
  -- combination runs in HUGEINT; Spark mirrors with decimal(38,0)
  -- and both engines round the SAME exact integer to double
  SELECT stratum, n_h,
         sqrt(CAST(CAST(n_h AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                   AS DOUBLE)) / n_h AS sd_h
  FROM mom
),
w AS (
  SELECT stratum, n_h, sd_h, n_h * sd_h AS w_h,
         sum(n_h * sd_h) OVER () AS w_tot
  FROM sd
),
alloc AS (
  SELECT stratum, n_h, sd_h,
         CAST(floor({_NEYMAN_N} * w_h / w_tot + 0.5) AS BIGINT) AS alloc_h
  FROM w
),
ranked AS (
  SELECT b.stratum, b.x10, a.alloc_h, a.n_h, a.sd_h,
         row_number() OVER (
           PARTITION BY b.stratum
           ORDER BY md5(CAST(b.o_orderkey AS VARCHAR)), b.o_orderkey
         ) AS rk
  FROM base b JOIN alloc a USING (stratum)
)
SELECT stratum, n_h, round(sd_h * 10, 6) AS sd_dollars, alloc_h,
       CAST(count(*) AS BIGINT) AS n_sampled,
       round(CAST(sum(x10) AS DOUBLE) * 10 / count(*), 6) AS sample_mean
FROM ranked WHERE rk <= alloc_h
GROUP BY stratum, n_h, sd_h, alloc_h
ORDER BY stratum
"""


@register(
    "sample_neyman_allocation",
    oracle=_NEYMAN_SQL,
    tags=("ext", "sampling", "bench2"),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling: allocate a 1000-row budget
    across the order-priority strata proportionally to N_h * S_h (the
    allocation that minimizes the stratified-mean variance for a fixed
    budget — big, heterogeneous strata get more samples), then draw
    each stratum's quota DETERMINISTICALLY by md5-rank (rank <=
    alloc_h), so the drawn set — not just its size — value-hashes
    cross-engine, the same no-RNG-state regime as the bootstrap and
    the permutation test.

    Determinism of the variance: values are quantized to exact $10
    BIGINT units so the moment sums (sum x, sum x²) stay exact BIGINT
    at any fixture scale (cents² overflows at sf0.1); S_h is then one
    sqrt over identical doubles. Per-stratum rounding of allocations
    is to-nearest — the summed allocation may differ from the budget
    by a couple of rows, the standard trade (exact-sum allocation
    needs a largest-remainder pass; documented, not needed for the
    variance argument). Scale shape: one keyed moment agg + broadcast
    allocation + one rank window per stratum."""
    o = tables.load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("stratum"),
        F.round(F.col("o_totalprice") / 10).cast("long").alias("x10"),
    )
    mom = base.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("x10").alias("sx"),
        F.sum(F.col("x10") * F.col("x10")).alias("sxx"),
    )
    # 128-bit exact combination (caught by the x4 scale curve, round
    # 10: n_h*sxx read 1.2e19 > 2^63 and ANSI long multiply threw).
    # decimal(38,0) keeps the numerator exact to ~1e38 — n ~ 1e12 rows
    # per stratum at x10-dollar quanta — and DuckDB's HUGEINT computes
    # the identical integer, so the double cast agrees bit-for-bit.
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sd_h = (
        F.sqrt((d("n_h") * d("sxx") - d("sx") * d("sx")).cast("double"))
        / F.col("n_h")
    )
    w = mom.select("stratum", "n_h", sd_h.alias("sd_h")).select(
        "stratum",
        "n_h",
        "sd_h",
        (F.col("n_h") * F.col("sd_h")).alias("w_h"),
    )
    wt = Window.partitionBy()
    alloc = w.select(
        "stratum",
        "n_h",
        "sd_h",
        F.floor(
            _NEYMAN_N * F.col("w_h") / F.sum("w_h").over(wt) + 0.5
        ).cast("long").alias("alloc_h"),
    )
    rk = Window.partitionBy("stratum").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    ranked = (
        base.join(F.broadcast(alloc), "stratum")
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= F.col("alloc_h"))
    )
    return (
        ranked.groupBy("stratum", "n_h", "sd_h", "alloc_h")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(
                F.sum("x10").cast("double") * 10 / F.count(F.lit(1)), 6
            ).alias("sample_mean"),
        )
        .select(
            "stratum",
            "n_h",
            F.round(F.col("sd_h") * 10, 6).alias("sd_dollars"),
            "alloc_h",
            "n_sampled",
            "sample_mean",
        )
        .orderBy("stratum")
    )
