"""BPE tokenizer training and encoding — the tokenizer-fitting step of
a training-data pipeline, distributed.

Classic byte-pair encoding (public algorithm: Sennrich/Haddow/Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016): start from characters, repeatedly merge the most frequent
adjacent symbol pair. The key structural fact for scale is that BPE
statistics live on the DISTINCT-WORD frequency table, not the corpus:
at 100 TB the corpus is billions of documents but the weighted word
table is orders of magnitude smaller, and it is the only thing the
merge loop ever touches. The corpus is scanned exactly once (one
map-side explode + one keyed count); each merge round is then

  1. one keyed aggregation over adjacent symbol pairs (partial
     map-side combine — hot pairs reduce before the shuffle), and
  2. one argmax collect of a SINGLE row (bounded, same class as the
     documented O(1)-row convergence collects in graph.py), and
  3. one map-side fold that applies the merge to every word's symbol
     array — no shuffle.

Determinism: counts are exact ints; the argmax tie-break is
(count DESC, left, right), so reruns and engines agree bit-for-bit.
Rows-only keys by the same §2 rule as graph_pagerank: the merge
recursion is not SQL-expressible (each round's input depends on the
previous round's data-dependent argmax); a from-scratch python golden
recomputation pins the values in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

END_OF_WORD = "</w>"
N_MERGES = 20


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-split text — the only
    corpus-proportional stage. Returns symbols as char arrays with the
    end-of-word marker appended (the marker keeps merges from crossing
    word boundaries and distinguishes suffix from prefix units)."""
    words = docs.select(F.explode(F.split(text_col, " ")).alias("word")).filter(
        F.col("word") != ""
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    return wf.select(
        "word",
        "freq",
        F.concat(F.split("word", ""), F.array(F.lit(END_OF_WORD))).alias("syms"),
    )


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the word table: zip each
    symbol array with its own tail, explode, aggregate. Overlap
    convention matches the reference algorithm: every adjacent
    occurrence counts (a word 'aaa' contributes ('a','a') twice)."""
    pairs = wf.select(
        "freq",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right")).agg(
        F.sum("freq").alias("c")
    )


def _merge_expr(left: str, right: str) -> Column:
    """Fold that rewrites a symbol array applying one merge
    left-to-right. No overlap flag is needed: a merged token is
    strictly longer than ``left``, so it can never immediately
    re-match as the left half of the same pair."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            # try_element_at: the accumulator starts EMPTY (ANSI mode
            # would raise on element_at(acc, -1)); NULL != lit_l keeps
            # the first symbol on the append branch
            (F.try_element_at(acc, F.lit(-1)) == lit_l) & (s == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
    batch_k: int = 1,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, encoded_words):
    merges as an ordered [(left, right), ...] list; encoded_words the
    final (word, freq, syms) table with all merges applied — ready to
    broadcast as an encode dictionary.

    ``batch_k`` is the batched-BPE round-trip reducer (VERDICT r7 #8):
    each Spark round fetches the top-4k pair rows and greedily accepts
    up to ``batch_k`` NON-CONFLICTING pairs — a pair is skipped if its
    left or right symbol was touched by an earlier accept in the same
    batch, because applying that merge changes the skipped pair's
    count. Accepted merges apply as chained lazy folds, so driver
    round trips drop from ``n_merges`` to ~``n_merges / batch_k``
    (the real-vocabulary ceiling: 32k merges at k=64 is ~500 rounds
    instead of 32k sequential jobs). ``batch_k=1`` is EXACTLY the
    classic sequential algorithm (pinned by the python golden);
    batched runs match a python golden implementing the same greedy
    rule. Batched merge LISTS can differ from sequential ones — the
    standard batched-BPE trade (the per-batch counts are stale by at
    most the batch's own merges); both are valid BPE vocabularies.

    The word table is cached once and localCheckpointed every few
    rounds so the fold-upon-fold lineage stays flat (same posture as
    the Pregel loops)."""
    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    wf = _word_freq(docs, text_col).cache()
    merges: list[tuple[str, str]] = []
    applied_since_ckpt = 0
    while len(merges) < n_merges:
        k = min(batch_k, n_merges - len(merges))
        top = (
            _pair_counts(wf)
            .orderBy(F.col("c").desc(), "left", "right")
            .limit(max(1, 4 * k))
            .collect()
        )
        touched: set[str] = set()
        batch: list[tuple[str, str]] = []
        for row in top:
            if row["c"] < 2:
                break
            left, right = row["left"], row["right"]
            if left in touched or right in touched:
                continue  # stale count once an accepted merge lands
            batch.append((left, right))
            touched.update((left, right))
            if len(batch) == k:
                break
        if not batch:
            break  # nothing left worth merging
        for left, right in batch:
            wf = wf.withColumn("syms", _merge_expr(left, right))
        merges.extend(batch)
        applied_since_ckpt += len(batch)
        if applied_since_ckpt >= 5:
            wf = wf.localCheckpoint()
            applied_since_ckpt = 0
    return merges, wf


BPE_EXACT_MERGES = 8


def _bpe_exact_sql(n: int = BPE_EXACT_MERGES) -> str:
    """Unrolled exact BPE oracle (VERDICT r9 #5 — the last rows-only
    family without an exact twin): ``n`` merge rounds as chained CTEs,
    the ``ts_downsample_lttb``/M77 unrolled-argmax regime applied to
    the merge recursion. Per round: weighted adjacent-pair counts over
    the word table, the (count DESC, left, right) argmax, then the
    greedy leftmost-non-overlapping merge application. Overlapping
    occurrences exist only when left == right (an occurrence at i and
    i+1 forces syms[i+1] to equal both), so greedy acceptance is a
    gaps-and-islands parity rule: within each maximal run of
    consecutive occurrence positions, accept every other one starting
    at the first — exactly what the Spark fold's "merged token can't
    immediately re-match" property produces. Chain CTEs are
    MATERIALIZED: w{{t}} is referenced twice per round, and DuckDB's
    default inlining would expand the scan 2^n times. All counts are
    BIGINT and the tie-break is total, so the trajectory is
    integer-deterministic cross-engine."""
    rounds = []
    for t in range(n):
        rounds.append(f"""
e{t} AS MATERIALIZED (
  SELECT word, freq, syms, unnest(range(1, len(syms))) AS i FROM w{t}),
p{t} AS (SELECT syms[i] AS l, syms[i+1] AS r, CAST(sum(freq) AS BIGINT) AS c
         FROM e{t} GROUP BY 1, 2),
m{t} AS (SELECT l, r FROM p{t} WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1),
occ{t} AS (SELECT e.word, e.i,
                  row_number() OVER (PARTITION BY e.word ORDER BY e.i) AS rn
           FROM e{t} e, m{t} m WHERE e.syms[e.i] = m.l AND e.syms[e.i+1] = m.r),
acc{t} AS (SELECT word, i FROM (
             SELECT word, i,
                    (i - min(i) OVER (PARTITION BY word, i - rn)) % 2 AS par
             FROM occ{t}) WHERE par = 0),
f{t} AS (SELECT word, freq, syms, unnest(range(1, len(syms) + 1)) AS j FROM w{t}),
w{t + 1} AS MATERIALIZED (
  SELECT f.word, min(f.freq) AS freq,
         list(CASE WHEN a.i IS NOT NULL THEN (SELECT l || r FROM m{t})
                   ELSE f.syms[f.j] END ORDER BY f.j) AS syms
  FROM f{t} f
  LEFT JOIN acc{t} a ON a.word = f.word AND a.i = f.j
  LEFT JOIN acc{t} b ON b.word = f.word AND b.i = f.j - 1
  WHERE b.i IS NULL
  GROUP BY f.word)""")
    finals = " UNION ALL ".join(
        f"SELECT {t + 1} AS rank, l AS \"left\", r AS \"right\", "
        f"l || r AS merged FROM m{t}"
        for t in range(n)
    )
    return (
        """WITH w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         list_append(list_transform(range(1, length(word) + 1),
                     x -> substring(word, x, 1)), '</w>') AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),"""
        + ",".join(rounds)
        + f"\nSELECT * FROM ({finals}) ORDER BY rank"
    )


@register("text_bpe_train_exact", oracle=_bpe_exact_sql(), tags=("ext", "iterative"))
def text_bpe_train_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-oracled twin of ``text_bpe_train`` at a reduced merge
    count: the first ``BPE_EXACT_MERGES`` (=8) classic sequential
    merges (``batch_k=1``), value-hash-pinned against the unrolled
    per-round argmax CTE in ``_bpe_exact_sql`` — the same
    exact-twin pattern as ``graph_pagerank_exact`` /
    ``dedup_minhash_signature``. The full 20-merge key stays
    rows-only (its python golden covers the batched path); this key
    certifies the merge ALGEBRA (pair counting, tie-break, greedy
    non-overlapping application) cross-engine."""
    d = tables.load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, "text", BPE_EXACT_MERGES, batch_k=1)
    rows = [
        (i + 1, left, right, left + right)
        for i, (left, right) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING"
    ).orderBy("rank")


@register("text_bpe_train", oracle=None, tags=("ext", "rows-only", "iterative"))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table over the documents corpus: one row
    per merge, (rank, left, right, merged). Rows-only (iterative
    data-dependent argmax is not SQL-expressible); a from-scratch
    python BPE recomputation pins every row in tests/test_llm.py."""
    d = tables.load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, "text", N_MERGES)
    rows = [
        (i + 1, left, right, left + right) for i, (left, right) in enumerate(merges)
    ]
    return spark.createDataFrame(rows, "rank INT, left STRING, right STRING, merged STRING").orderBy(
        "rank"
    )


@register("text_bpe_encode", oracle=None, tags=("ext", "rows-only", "iterative"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under the learned merges — the
    real 'how many tokens is this corpus' measurement (whitespace and
    regex counts bound it from below/above; this one is the
    tokenizer's own answer). The encode dictionary (distinct word ->
    token count) is broadcast-joined against the exploded corpus, then
    one keyed sum per doc: two shuffles total, both keyed, regardless
    of corpus size. Rows-only with the training key; the python golden
    in tests/test_llm.py re-encodes documents from scratch."""
    d = tables.load(spark, sf_dir, "documents")
    _, wf = bpe_train(d, "text", N_MERGES)
    dic = wf.select("word", F.size("syms").alias("n_word_tokens"))
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.join(F.broadcast(dic), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_word_tokens").alias("n_bpe_tokens"))
        .orderBy("doc_id")
    )
