"""Text-analysis operators (SURVEY.md §2K: K7–K11 + quality/lang-ID).

All are explode → keyed-aggregate pipelines: the shuffle key is a
token/term, aggregation is partially applied map-side, and nothing is
quadratic. Scores involving float math use exact micro-unit sums or
exact integer ratios so the DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import SCALE
from ezbake_graph_spark.registry import register

_TERM_SQL = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
SELECT term, count(*) AS n_occurrences
FROM tok
GROUP BY term
ORDER BY n_occurrences DESC, term
LIMIT 50
"""


# Spark-dialect twin of _TERM_SQL (explode/split for unnest/
# string_split); SQL-text form per tables.ensure_views. ORDER BY +
# LIMIT in the text plans as TakeOrderedAndProject, same as before.
_TERM_SPARK = """
SELECT term, count(*) AS n_occurrences
FROM (SELECT explode(split(text, ' ')) AS term FROM documents)
GROUP BY term
ORDER BY n_occurrences DESC, term
LIMIT 50
"""


@register("text_term_counts", oracle=_TERM_SQL, tags=("K7", "bench"))
def text_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + global term counts (K7), top 50."""
    tables.ensure_views(spark, sf_dir)
    return spark.sql(_TERM_SPARK)


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id < 100
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents WHERE doc_id < 100
), scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tfidf, rn
FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
"""


@register("text_tfidf", oracle=_TFIDF_SQL, tags=("K8", "bench2"))
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (K8), doc_id<100 slice.
    tf and df are exact ints; ln() is per-row libm (round6); the rank
    window tie-breaks on term."""
    d = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # n_docs stays IN the plan (broadcast 1-row agg, not a driver-side
    # d.count() that would scan the table eagerly a second time).
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


_NGRAM_SQL = """
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
)
SELECT bigram, count(*) AS n_occurrences
FROM b
GROUP BY bigram
ORDER BY n_occurrences DESC, bigram
LIMIT 50
"""


@register("text_ngrams", oracle=_NGRAM_SQL, tags=("K9",))
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram counts (K9), top 50. Bigrams come from zipping the
    token array with its own tail — per-row, shuffle only on the
    bigram key."""
    d = tables.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (t, i) -> concat(t, ' ', element_at(split(text, ' '), i + 2)))"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("bigram"))
        .limit(50)
    )


POS_WORDS = ("fast", "small", "merge")
NEG_WORDS = ("slow", "big", "dup")

_SENTIMENT_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT doc_id,
       CAST(count_if(term IN {POS_WORDS}) AS BIGINT) AS n_pos,
       CAST(count_if(term IN {NEG_WORDS}) AS BIGINT) AS n_neg,
       CAST(count_if(term IN {POS_WORDS}) AS BIGINT)
         - CAST(count_if(term IN {NEG_WORDS}) AS BIGINT) AS sentiment
FROM tok
GROUP BY doc_id
ORDER BY doc_id
"""


@register("text_sentiment", oracle=_SENTIMENT_SQL, tags=("K10",))
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment scoring (K10) per the Twitter-sentiment
    lexicon approach (PAPERS.md): signed hit count of a tiny ±lexicon
    over each document's tokens."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    n_pos = F.count_if(F.col("term").isin(*POS_WORDS))
    n_neg = F.count_if(F.col("term").isin(*NEG_WORDS))
    return (
        tok.groupBy("doc_id")
        .agg(
            n_pos.alias("n_pos"),
            n_neg.alias("n_neg"),
            (n_pos - n_neg).cast("long").alias("sentiment"),
        )
        .orderBy("doc_id")
    )


_LANG_STATS_SQL = """
WITH t AS (
  SELECT lang, source, n_chars, len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
       count(DISTINCT source) AS n_sources
FROM t
GROUP BY lang
ORDER BY lang
"""


@register("text_lang_stats", oracle=_LANG_STATS_SQL, tags=("K11",))
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-partitioned corpus stats (K11)."""
    d = tables.load(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            "source",
            "n_chars",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


STOPWORDS = ("a", "the")

_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, n_chars,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         len(list_filter(toks, x -> x IN {STOPWORDS})) AS n_stop
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_distinct AS DOUBLE) / n_tokens AS lexical_diversity,
       (n_tokens >= 50 AND CAST(n_distinct AS DOUBLE) / n_tokens > 0.1) AS passes_quality
FROM m
ORDER BY doc_id
"""


def quality_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
    min_tokens: int = 50,
    min_diversity: float = 0.1,
) -> DataFrame:
    """Parameterized quality-scoring core shared by the ``text_quality``
    registry key and ``api.quality_score``: one narrow map-side scan
    (no shuffle), exact int/int ratios. Returns (<id_col>, n_tokens,
    avg_token_len, stopword_ratio, lexical_diversity, passes_quality).
    """
    toks = F.split(text_col, " ")
    m = docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda x: x.isin(*stopwords))).alias("n_stop"),
    )
    diversity = F.col("n_distinct").cast("double") / F.col("n_tokens")
    return m.select(
        id_col,
        "n_tokens",
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias(
            "avg_token_len"
        ),
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias(
            "stopword_ratio"
        ),
        diversity.alias("lexical_diversity"),
        ((F.col("n_tokens") >= min_tokens) & (diversity > min_diversity)).alias(
            "passes_quality"
        ),
    )


@register("text_quality", oracle=_QUALITY_SQL, tags=("K-extra",))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for training-data filtering: token counts,
    stopword ratio, lexical diversity, and a pass/fail gate. All
    ratios are exact int/int divisions — deterministic (the fixture's
    n_chars column equals length(text), so the shared core's computed
    length matches the oracle's stored column)."""
    d = tables.load(spark, sf_dir, "documents")
    return quality_metrics(d).orderBy("doc_id")


_LANGID_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents
), train AS (
  SELECT lang, term, count(*) AS c
  FROM tok WHERE doc_id % 5 = 0
  GROUP BY lang, term
), totals AS (
  SELECT lang, sum(c) AS total FROM train GROUP BY lang
), profile AS (
  SELECT train.lang, term,
         CAST(round(ln(CAST(c AS DOUBLE) / total) * {SCALE}) AS BIGINT) AS micro_logp
  FROM train JOIN totals ON train.lang = totals.lang
), test_scores AS (
  SELECT tok.doc_id, tok.lang AS actual, profile.lang AS candidate,
         sum(profile.micro_logp) AS micro_score
  FROM tok JOIN profile ON tok.term = profile.term
  WHERE tok.doc_id % 5 <> 0
  GROUP BY tok.doc_id, tok.lang, profile.lang
), ranked AS (
  SELECT doc_id, actual, candidate,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY micro_score DESC, candidate) AS rn
  FROM test_scores
)
SELECT doc_id, actual, candidate AS predicted, (candidate = actual) AS hit
FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


def langid_predict(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Parameterized language-ID core shared by the ``text_langid``
    registry key and ``api.language_id``: unigram log-prob profiles
    from the labeled ``train`` table, argmax over ``test``. Log-probs
    are quantized to exact micro-units before summing so the scores
    (and the argmax) are bit-deterministic in both engines; the profile
    table (langs x vocab) broadcasts, so scoring is a map-side join +
    one keyed aggregate per test doc — the 100 TB shape. Returns
    (<id_col>, predicted, micro_score)."""
    tr = (
        train.select(
            F.col(lang_col).alias("lang"),
            F.explode(F.split(text_col, " ")).alias("term"),
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = tr.groupBy("lang").agg(F.sum("c").alias("total"))
    profile = tr.join(totals, "lang").select(
        F.col("lang").alias("candidate"),
        "term",
        F.round(F.log(F.col("c").cast("double") / F.col("total")) * SCALE)
        .cast("long")
        .alias("micro_logp"),
    )
    te = test.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("term")
    )
    scores = te.join(F.broadcast(profile), "term").groupBy(
        id_col, "candidate"
    ).agg(F.sum("micro_logp").alias("micro_score"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("micro_score").desc(), F.col("candidate")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("candidate").alias("predicted"), "micro_score")
    )


@register("text_langid", oracle=_LANGID_SQL, tags=("K-extra",))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (n-gram/naive-Bayes heuristic): unigram log-prob
    profiles learned from the doc_id%5==0 split, argmax over the rest
    (shared core: ``langid_predict``)."""
    d = tables.load(spark, sf_dir, "documents")
    pred = langid_predict(d.filter(F.col("doc_id") % 5 == 0), d.filter(F.col("doc_id") % 5 != 0))
    actual = d.select("doc_id", F.col("lang").alias("actual"))
    return (
        pred.join(actual, "doc_id")
        .select(
            "doc_id",
            "actual",
            "predicted",
            (F.col("predicted") == F.col("actual")).alias("hit"),
        )
        .orderBy("doc_id")
    )


_TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

_TOKEN_REGEX_SQL = rf"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_TOKEN_REGEX}')) AS n_regex_tokens,
       len(list_distinct(regexp_extract_all(text, '{_TOKEN_REGEX}')))
         AS n_distinct_pieces
FROM documents
ORDER BY doc_id
"""


def token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Parameterized token-counting core shared by the
    ``text_token_regex`` registry key and ``api.token_stats``:
    whitespace split and a BPE-ish pre-tokenizer regex. Pure JVM
    regexp, one narrow scan, no shuffle. Returns (<id_col>,
    n_ws_tokens, n_regex_tokens, n_distinct_pieces)."""
    pieces = F.regexp_extract_all(text_col, F.lit(_TOKEN_REGEX), F.lit(0))
    return docs.select(
        F.col(id_col),
        F.size(F.split(text_col, " ")).alias("n_ws_tokens"),
        F.size(pieces).alias("n_regex_tokens"),
        F.size(F.array_distinct(pieces)).alias("n_distinct_pieces"),
    )


@register("text_token_regex", oracle=_TOKEN_REGEX_SQL, tags=("K7b",))
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish
    pre-tokenizer regex (letter runs | digit runs | single
    punctuation) — the pre-tokenization pass every BPE/WordPiece
    pipeline runs before merges (shared core: ``token_stats``)."""
    d = tables.load(spark, sf_dir, "documents")
    return token_stats(d).orderBy("doc_id")


HH_PHI = 0.005  # heavy-hitter threshold (fraction of all tokens)
HH_K = 512  # Misra-Gries counters per partition (k >> 1/phi)

_HH_SQL = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
tot AS (SELECT count(*) AS n FROM tok)
SELECT term, count(*) AS n_occurrences
FROM tok, tot GROUP BY term, tot.n
HAVING count(*) >= {HH_PHI} * n
ORDER BY n_occurrences DESC, term
"""


@register("agg_heavy_hitters", oracle=_HH_SQL, tags=("ext", "sketch"))
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent terms (≥ 0.5% of all tokens) via Misra-Gries candidate
    generation + exact verification — EXACT output with bounded memory.

    Stage 1 summarizes each partition with a k-counter Misra-Gries
    sketch (Arrow-batched kernel over raw text; never materializes the
    full term multiset). Summing per-partition MG counts undercounts
    any term by at most n/k total, and k >> 1/phi, so every true heavy
    hitter survives as a candidate — the candidate set is ≤ k·parts
    rows, NOT vocabulary-sized. Stage 2 broadcasts the candidates and
    exactly counts ONLY candidate tokens (filter before the shuffle,
    so the keyed aggregate carries the heavy terms alone). This is how
    a 100 TB frequent-item query avoids shuffling the full vocabulary:
    sketch summaries ∝ k·partitions, verification shuffle ∝ heavy-term
    occurrences."""
    from collections import Counter
    from typing import Iterator

    import pandas as pd

    d = tables.load(spark, sf_dir, "documents")

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            for text in pdf["text"]:
                for term in text.split(" "):
                    if term in counters or len(counters) < HH_K:
                        counters[term] += 1
                    else:
                        # decrement-all: drop zeros (classic MG step)
                        for t in list(counters):
                            counters[t] -= 1
                            if counters[t] == 0:
                                del counters[t]
        yield pd.DataFrame(
            {"term": list(counters), "cnt": list(counters.values())}
        )

    candidates = (
        d.select("text")
        .mapInPandas(mg_partition, "term string, cnt long")
        .groupBy("term")
        .agg(F.sum("cnt").alias("cnt_lb"))
        .select("term")
    )
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    # The φ-threshold's N is derived in-plan (broadcast 1-row agg), not
    # via a driver-side tok.count() that would scan+explode the corpus
    # eagerly at plan-build time.
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    return (
        tok.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") >= HH_PHI * F.col("total"))
        .select("term", "n_occurrences")
        .orderBy(F.col("n_occurrences").desc(), "term")
    )


WINNOW_K = 4  # word k-gram width
WINNOW_W = 4  # winnowing window (grams per window)

_WINNOW_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100
), grams AS (
  SELECT doc_id,
         list_transform(range(1, len(w) - {WINNOW_K - 2}),
           i -> md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))
           AS gh
  FROM t WHERE len(w) >= {WINNOW_K}
), wins AS (
  SELECT doc_id, gh,
         unnest(range(1, greatest(len(gh) - {WINNOW_W - 1}, 1) + 1)) AS pos
  FROM grams
), fps AS (
  SELECT doc_id,
         list_aggregate(
           list_slice(gh, pos, least(pos + {WINNOW_W - 1}, len(gh))), 'min')
           AS fp
  FROM wins
)
SELECT doc_id, fp FROM fps GROUP BY doc_id, fp ORDER BY doc_id, fp
"""


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Parameterized winnowing core shared by the ``text_winnowing``
    registry key and ``api.fingerprint_docs``: hash every word k-gram,
    keep the minimum hash of each w-gram window, dedup — guarantees
    any shared run of >= k+w-1 words between two documents shares a
    fingerprint, at ~1/w the storage of all grams. All map-side array
    expressions + one distinct; the md5 lexicographic min is
    engine-portable. Returns (<id_col>, fp); documents shorter than k
    words emit nothing."""
    d = docs.select(
        F.col(id_col), F.split(text_col, " ").alias("w")
    ).filter(F.size("w") >= k)
    grams = d.select(
        id_col,
        F.expr(
            f"transform(sequence(1, size(w) - {k - 1}),"
            f" i -> md5(concat_ws(' ', "
            + ", ".join(f"element_at(w, i + {j})" for j in range(k))
            + ")))"
        ).alias("gh"),
    )
    wins = grams.select(
        id_col,
        "gh",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("gh") - (w - 1), F.lit(1)))
        ).alias("pos"),
    )
    fp = F.array_min(
        F.expr(f"slice(gh, pos, least(pos + {w - 1}, size(gh)) - pos + 1)")
    )
    return wins.select(id_col, fp.alias("fp")).distinct()


@register("text_winnowing", oracle=_WINNOW_SQL, tags=("ext", "fingerprint"))
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS rolling-hash scheme) over the
    doc_id<100 slice — the plagiarism/near-dup detector built on this
    joins documents by fingerprint, the same inverted-index shape as
    dedup_minhash bands (shared core: ``winnowing_fingerprints``)."""
    d = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return winnowing_fingerprints(d).orderBy("doc_id", "fp")


_PMI_SQL = """
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT unnest(toks) AS w FROM t),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
ut AS (SELECT count(*) AS nu FROM uni),
b AS (SELECT unnest(list_transform(range(1, len(toks)),
        i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM t),
bc AS (SELECT bigram, count(*) AS c12 FROM b GROUP BY bigram),
bt AS (SELECT count(*) AS nb FROM b)
SELECT split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2,
       c12,
       round(ln(CAST(c12 * nu * nu AS DOUBLE)
                / CAST(u1.c * u2.c * nb AS DOUBLE)), 6) AS pmi
FROM bc
JOIN uc u1 ON u1.w = split_part(bigram, ' ', 1)
JOIN uc u2 ON u2.w = split_part(bigram, ' ', 2)
CROSS JOIN ut CROSS JOIN bt
WHERE c12 >= 5
ORDER BY CAST(c12 * nu * nu AS DOUBLE)
         / CAST(u1.c * u2.c * nb AS DOUBLE) DESC, w1, w2
LIMIT 30
"""


@register("text_pmi_bigrams", oracle=_PMI_SQL, tags=("ext", "M63"))
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-30 word bigrams by pointwise mutual
    information, min support 5 — PMI = ln(p(w1w2) / (p(w1)·p(w2))).

    Determinism: the RANKING key is the exact integer rational
    c12·N_uni² / (c1·c2·N_bi) — numerator ≤ ~3e15 and denominator
    ≤ ~1e14 at sf0.1, both < 2^53, so the division is one IEEE op and
    the sort order can never disagree between engines (ln() is applied
    only to the already-selected rows, then rounded per §5.3 rule 2).
    Tie-break (w1, w2). Scale: two keyed shuffles (unigram + bigram
    counts) + broadcast of the two 1-row totals; bigram explosion is
    map-side.
    """
    d = tables.load(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (t, i) -> struct(t AS w1, element_at(split(text, ' '), i + 2) AS w2))"
    )
    uni = d.select(F.explode(F.split("text", " ")).alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = uni.agg(F.count(F.lit(1)).alias("nu"))
    bg = d.select(F.explode(bigrams).alias("b")).select("b.w1", "b.w2")
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    nb = bg.agg(F.count(F.lit(1)).alias("nb"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    ratio = (F.col("c12") * F.col("nu") * F.col("nu")).cast("double") / (
        F.col("c1") * F.col("c2") * F.col("nb")
    ).cast("double")
    return (
        bc.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .withColumn("ratio", ratio)
        .orderBy(F.col("ratio").desc(), "w1", "w2")
        .limit(30)
        .select("w1", "w2", "c12", F.round(F.log("ratio"), 6).alias("pmi"))
    )


_ZIPF_SQL = """
WITH terms AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
), freq AS (
  SELECT term, count(*) AS n FROM terms WHERE term <> '' GROUP BY term
), top AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk FROM freq
), pts AS (
  SELECT ln(CAST(rnk AS DOUBLE)) AS lx, ln(CAST(n AS DOUBLE)) AS ly
  FROM top WHERE rnk <= 100
)
SELECT count(*) AS n_points,
       round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
             / NULLIF(count(*) * sum(lx * lx) - sum(lx) * sum(lx), 0),
             6) AS zipf_slope
FROM pts
"""


@register("text_zipf_slope", oracle=_ZIPF_SQL, tags=("ext", "M96"))
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: least-squares
    slope of ln(freq) vs ln(rank) on the top-100 terms — the classic
    corpus-health diagnostic (natural language sits near -1; word-salad
    or boilerplate-heavy corpora flatten it; a training-data pipeline
    tracks this per source/shard to catch degenerate scrapes).

    Rank order is (count desc, term asc) — fully deterministic. The
    regression sums run over exactly 100 doubles of magnitude ~10, so
    cross-engine summation-order drift is ~1e-14 relative — far inside
    the round-6 envelope (SURVEY §5.3: small-n float aggregates round
    safely; only data-sized accumulations need the micro-int regime).
    Plan: explode + keyed term count (the text_term_counts shuffle),
    top-100 via TakeOrdered-style rank, then a single-row aggregate."""
    d = tables.load(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    # Top-100 via orderBy+limit FIRST (TakeOrderedAndProject: per-partition
    # heads + merge, never a global sort of the vocabulary), then rank the
    # 100 survivors — the single-partition window touches 100 rows, not
    # the corpus vocabulary.
    head = freq.orderBy(F.col("n").desc(), "term").limit(100)
    w = Window.orderBy(F.col("n").desc(), "term")
    top = head.select("n", F.row_number().over(w).alias("rnk"))
    pts = top.select(
        F.log(F.col("rnk").cast("double")).alias("lx"),
        F.log(F.col("n").cast("double")).alias("ly"),
    )
    cnt = F.count(F.lit(1))
    # degenerate-corpus guard: <2 distinct terms make the regression
    # denominator (the log-rank variance) 0 — Spark ANSI raises,
    # DuckDB yields NaN; when()/NULLIF agree on NULL
    den = cnt * F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx")
    return pts.agg(
        cnt.alias("n_points"),
        F.round(
            F.when(
                den != 0,
                (cnt * F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly"))
                / den,
            ),
            6,
        ).alias("zipf_slope"),
    )


_VOCAB_SQL = """
WITH tok AS (
  SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT lang,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_tokens,
       count(DISTINCT term) AS vocab_size,
       round(CAST(count(DISTINCT term) AS DOUBLE) / count(*), 6)
           AS type_token_ratio
FROM tok
GROUP BY lang
ORDER BY lang
"""


@register("text_vocab_coverage", oracle=_VOCAB_SQL, tags=("K-extra", "M127"))
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical-diversity profile (K-extra): corpus size,
    vocabulary size, and type-token ratio — the screen a corpus curator
    reads next to the M117 entropy mix before fixing sampling weights
    (low TTR at high volume flags boilerplate/templated text).

    One explode + one keyed agg with two count-distincts; Spark plans
    distinct counts as expand + two-phase aggregation (partial
    map-side), one shuffle keyed by (lang, grouping-id). The ratio is
    a single IEEE division of exact integers — bit-identical across
    engines without rounding; round6 kept for the output contract."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select("lang", "doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        tok.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("term").alias("vocab_size"),
            F.round(
                F.countDistinct("term").cast("double") / F.count(F.lit(1)), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("lang")
    )


_HASHTF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       CAST(('0x' || substr(md5(term), 1, 4))::BIGINT % 64 AS BIGINT) AS bucket,
       count(*) AS tf
FROM tok
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""


@register("text_hashing_tf", oracle=_HASHTF_SQL, tags=("K-extra", "M136"))
def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (K-extra): the HashingTF primitive — token →
    md5-hash bucket (64 here), per-doc bucket counts — the fixed-width,
    vocabulary-free featurization that feeds linear classifiers and
    quality filters at corpus scale (no global vocab build, no OOV).

    MLlib's HashingTF uses murmur3 (Spark-private); this uses the md5
    16-bit prefix so the whole transform is value-hash-oracled
    cross-engine — same trade as M121. Plan: explode + one keyed agg
    on (doc, bucket), map-side combinable; at 100 TB it's a single
    linear pass, state bounded by docs x 64 buckets."""
    d = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long") % 64
    ).alias("bucket")
    return (
        tok.groupBy("doc_id", bucket)
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy("doc_id", "bucket")
    )


_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), vocab AS (
  SELECT term, count(*) AS cnt FROM tok GROUP BY term
), n AS (
  SELECT count(*) AS total FROM tok
)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       round(sum(ln(CAST(vocab.cnt AS DOUBLE))) / count(*)
             - ln((SELECT CAST(total AS DOUBLE) FROM n)), 6) AS avg_logprob
FROM tok JOIN vocab USING (term)
GROUP BY tok.doc_id
ORDER BY tok.doc_id
"""


@register("text_unigram_logprob", oracle=_LOGPROB_SQL, tags=("K-extra", "M137"))
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM score per document (K-extra): mean log-probability
    under the corpus's own unigram distribution — the cheap stand-in
    for perplexity filtering (docs of improbable tokens score low and
    get culled/downweighted in pretraining pipelines).

    avg_logprob = Σ ln(cnt(term))/n_tok − ln(N): the algebra keeps one
    global constant ln(N) OUT of the per-token sum, so every summed
    term is ln of an exact integer — identical libm doubles — and the
    per-doc sum spans only that doc's tokens (round6 absorbs order
    drift). Plan: explode → term-keyed count (one shuffle) →
    broadcast-join counts back → doc-keyed agg (second shuffle).
    Both shuffles are keyed and map-side combined; the vocab table is
    the only broadcast and is Zipf-bounded at any corpus size."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    # ln(N) stays IN the plan: N = sum of vocab counts (a broadcast
    # 1-row agg over the already-computed vocab table), not a
    # driver-side tok.count() that would scan+explode the corpus a
    # second time eagerly at plan-build time. JVM-side log of the
    # exact integer total: Math.log has matched DuckDB's ln
    # bit-for-bit across this suite (text_tfidf et al.).
    total = vocab.agg(F.log(F.sum("cnt").cast("double")).alias("ln_total"))
    return (
        tok.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(F.log(F.col("cnt").cast("double"))) / F.count(F.lit(1))
            ).alias("mean_ln_cnt"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("mean_ln_cnt") - F.col("ln_total"), 6).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


def nb_train(
    train: DataFrame, label_col: str, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial naive-Bayes text classifier: returns
    ``(class_stats, delta_profile)`` in exact micro-log units.

    - ``class_stats``: one row per class — ``(label, prior_micro,
      floor_micro, total_c)``. ``prior_micro`` = round(ln(n_docs_c /
      n_docs)·1e6); ``floor_micro`` = round(ln(1/(total_c+V))·1e6),
      the Laplace-smoothed log-prob of a train-vocab term the class
      never saw (and of any OOV term).
    - ``delta_profile``: sparse ``(label, term, dlt)`` rows for terms
      each class OBSERVED, where ``dlt`` = micro_logp(term|class) −
      floor_micro. Scoring then needs only the sparse profile:
      score(doc, c) = prior_c + n_tokens·floor_c + Σ dlt over matched
      (term, c) — the dense classes×vocab table is never materialized.

    Determinism: every log quantizes to micro-int BEFORE any sum
    (the langid/perplexity regime), so scores and the argmax are
    bit-identical cross-engine. Scale: both outputs are bounded by
    classes × observed vocab (Zipf-bounded) and broadcast at scoring
    time; training is two keyed aggs over the exploded train slice.
    """
    tok = train.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(text_col, " ")).alias("term"),
    )
    cnts = tok.groupBy("label", "term").agg(F.count(F.lit(1)).alias("c"))
    totals = cnts.groupBy("label").agg(F.sum("c").cast("long").alias("total_c"))
    vocab = cnts.select("term").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    ndocs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    ntr = ndocs.agg(F.sum("nd").cast("long").alias("n"))
    class_stats = (
        totals.join(ndocs, "label")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ntr))
        .select(
            "label",
            F.round(
                F.log(F.col("nd").cast("double") / F.col("n")) * SCALE
            ).cast("long").alias("prior_micro"),
            F.round(
                F.log(F.lit(1.0) / (F.col("total_c") + F.col("v"))) * SCALE
            ).cast("long").alias("floor_micro"),
            "total_c",
        )
    )
    delta_profile = (
        cnts.join(class_stats, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "term",
            (
                F.round(
                    F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("total_c") + F.col("v"))
                    )
                    * SCALE
                ).cast("long")
                - F.col("floor_micro")
            ).alias("dlt"),
        )
    )
    return class_stats, delta_profile


def nb_predict(
    test: DataFrame,
    class_stats: DataFrame,
    delta_profile: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``test`` docs under an ``nb_train`` model and return
    ``(<id_col>, predicted, micro_score)`` — argmax class per doc,
    ties broken by label ascending.

    Scale: one explode of the test text, one BROADCAST join against
    the sparse delta profile, one keyed agg per (doc, matched class),
    then a constant-width cross join against the class spine (a
    bounded dimension, like the hours×types spines elsewhere) — OOV
    terms never join and are priced by n_tokens·floor_micro exactly.
    """
    tok = test.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("term")
    )
    sd = (
        tok.join(F.broadcast(delta_profile), "term")
        .groupBy(id_col, "label")
        .agg(F.sum("dlt").cast("long").alias("sd"))
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    scores = (
        dl.crossJoin(F.broadcast(class_stats.select("label", "prior_micro", "floor_micro")))
        .join(sd, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (
                F.col("prior_micro")
                + F.col("n_tokens") * F.col("floor_micro")
                + F.coalesce(F.col("sd"), F.lit(0))
            ).alias("micro_score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("micro_score").desc(), F.col("label")
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("predicted"), "micro_score")
    )


# Shared CTE block: the full NB train/score pipeline up to the per-doc
# argmax (used by the classifier key and its evaluation twin).
_NB_CTES = """
WITH tok_tr AS (
  SELECT source AS label, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id % 5 = 0
),
cnts AS (SELECT label, term, count(*) AS c FROM tok_tr GROUP BY label, term),
totals AS (
  SELECT label, CAST(sum(c) AS BIGINT) AS total_c FROM cnts GROUP BY label
),
vocab AS (SELECT count(DISTINCT term) AS v FROM tok_tr),
ndocs AS (
  SELECT source AS label, count(*) AS nd
  FROM documents WHERE doc_id % 5 = 0 GROUP BY source
),
ntr AS (SELECT CAST(sum(nd) AS BIGINT) AS n FROM ndocs),
cstats AS (
  SELECT t.label,
         CAST(round(ln(CAST(d.nd AS DOUBLE) / n.n) * 1000000) AS BIGINT)
           AS prior_micro,
         CAST(round(ln(1.0 / (t.total_c + v.v)) * 1000000) AS BIGINT)
           AS floor_micro,
         t.total_c
  FROM totals t, vocab v, ndocs d, ntr n WHERE d.label = t.label
),
delta AS (
  SELECT c.label, c.term,
         CAST(round(ln(CAST(c.c + 1 AS DOUBLE) / (s.total_c + v.v)) * 1000000)
              AS BIGINT) - s.floor_micro AS dlt
  FROM cnts c JOIN cstats s ON c.label = s.label, vocab v
),
tok_te AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE doc_id % 5 <> 0
),
sd AS (
  SELECT t.doc_id, d.label, CAST(sum(d.dlt) AS BIGINT) AS sd
  FROM tok_te t JOIN delta d ON t.term = d.term
  GROUP BY t.doc_id, d.label
),
dl AS (SELECT doc_id, count(*) AS n_tokens FROM tok_te GROUP BY doc_id),
scores AS (
  SELECT dl.doc_id, s.label,
         s.prior_micro + dl.n_tokens * s.floor_micro + coalesce(sd.sd, 0)
           AS micro_score
  FROM dl CROSS JOIN cstats s
  LEFT JOIN sd ON sd.doc_id = dl.doc_id AND sd.label = s.label
),
pred AS (
  SELECT doc_id, label AS predicted, micro_score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY micro_score DESC, label) AS rn
  FROM scores
)
"""

_NB_DOMAIN_SQL = (
    _NB_CTES
    + """
SELECT p.doc_id, d.source AS actual, p.predicted,
       (p.predicted = d.source) AS hit, p.micro_score
FROM pred p JOIN documents d ON p.doc_id = d.doc_id
WHERE p.rn = 1 ORDER BY p.doc_id
"""
)


@register("text_nb_domain", oracle=_NB_DOMAIN_SQL, tags=("ext", "text", "ml"))
def text_nb_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes DOMAIN classifier (``nb_train`` +
    ``nb_predict``): the fastText-style data-mixing tool — train on a
    labeled slice (doc_id%5==0, label = ``source``), score the held-out
    corpus, and use the per-domain posteriors to up/down-sample
    sources. Distinct from ``text_langid``'s heuristic: this is the
    FULL model — class priors, Laplace(+1) smoothing over the train
    vocabulary, and an OOV floor, so every (doc, class) score is
    defined even when no token matches.

    Exactness: all logs quantize to micro-int before summation; the
    score decomposition prior + n_tokens·floor + Σdelta keeps the
    profile SPARSE (observed (class, term) pairs only) while pricing
    unseen terms exactly — dense classes×vocab never materializes.
    """
    d = tables.load(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 5 == 0).select(
        F.col("source"), F.col("text")
    )
    class_stats, delta_profile = nb_train(train, "source")
    pred = nb_predict(
        d.filter(F.col("doc_id") % 5 != 0), class_stats, delta_profile
    )
    actual = d.select("doc_id", F.col("source").alias("actual"))
    return (
        pred.join(actual, "doc_id")
        .select(
            "doc_id",
            "actual",
            "predicted",
            (F.col("predicted") == F.col("actual")).alias("hit"),
            "micro_score",
        )
        .orderBy("doc_id")
    )


_NB_EVAL_SQL = (
    _NB_CTES
    + """
, final AS (
  SELECT p.doc_id, d.source AS actual, p.predicted
  FROM pred p JOIN documents d ON p.doc_id = d.doc_id
  WHERE p.rn = 1
), labels AS (
  SELECT DISTINCT source AS label FROM documents
), conf AS (
  SELECT actual, predicted, count(*) AS n FROM final GROUP BY actual, predicted
), per_label AS (
  SELECT l.label,
         CAST(coalesce(sum(CASE WHEN c.actual = l.label
                                 AND c.predicted = l.label THEN c.n END), 0)
              AS BIGINT) AS tp,
         CAST(coalesce(sum(CASE WHEN c.predicted = l.label
                                 AND c.actual <> l.label THEN c.n END), 0)
              AS BIGINT) AS fp,
         CAST(coalesce(sum(CASE WHEN c.actual = l.label
                                 AND c.predicted <> l.label THEN c.n END), 0)
              AS BIGINT) AS fn
  FROM labels l CROSS JOIN conf c
  GROUP BY l.label
)
SELECT label, tp, fp, fn,
       round(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS prec,
       round(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS rec,
       round(CAST(2 * tp AS DOUBLE) / NULLIF(2 * tp + fp + fn, 0), 6) AS f1
FROM per_label ORDER BY label
"""
)


@register("ml_eval_classification", oracle=_NB_EVAL_SQL, tags=("ext", "ml"))
def ml_eval_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation: per-class confusion counts and
    precision/recall/F1 for the NB domain classifier
    (``text_nb_domain``'s exact predictions re-aggregated) — the eval
    harness every model-gated curation step needs before its
    keep-threshold is trusted.

    Exactness: tp/fp/fn are integer conditional sums over the
    (actual, predicted) confusion table; the ratios are single IEEE
    divisions with NULLIF guards (a class never predicted has NULL
    precision, not a division error), round6-closed. F1 uses the
    2tp/(2tp+fp+fn) form so it is defined whenever either component
    is. Plan: the classifier's keyed aggregates + a ≤classes²
    confusion table cross-joined against the 20-row label spine —
    everything after scoring is dimension-sized.
    """
    pred = text_nb_domain(spark, sf_dir)
    conf = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    d = tables.load(spark, sf_dir, "documents")
    labels = d.select(F.col("source").alias("label")).distinct()
    tp = F.coalesce(
        F.sum(
            F.when(
                (F.col("actual") == F.col("label"))
                & (F.col("predicted") == F.col("label")),
                F.col("n"),
            )
        ),
        F.lit(0),
    ).cast("long")
    fp = F.coalesce(
        F.sum(
            F.when(
                (F.col("predicted") == F.col("label"))
                & (F.col("actual") != F.col("label")),
                F.col("n"),
            )
        ),
        F.lit(0),
    ).cast("long")
    fn = F.coalesce(
        F.sum(
            F.when(
                (F.col("actual") == F.col("label"))
                & (F.col("predicted") != F.col("label")),
                F.col("n"),
            )
        ),
        F.lit(0),
    ).cast("long")
    per = labels.crossJoin(F.broadcast(conf)).groupBy("label").agg(
        tp.alias("tp"), fp.alias("fp"), fn.alias("fn")
    )
    return per.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)),
            6,
        ).alias("prec"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)),
            6,
        ).alias("rec"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.nullif(
                (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("f1"),
    ).orderBy("label")


@register("text_lda_topics", oracle=None, tags=("ext", "ml", "rows-only"))
def text_lda_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LDA topic model over the corpus (k=5 topics, seeded EM, 10
    iterations) through Spark MLlib — the distributed variational/EM
    loop (per-document topic mixtures fit map-side against broadcast
    topic-term state, one aggregate per iteration; same BSP posture as
    the Pregel loops). Corpus-analysis tool: what themes dominate a
    crawl slice before mixing decisions.

    Rows-only (float EM; topic identity is permutation-arbitrary):
    output is each topic's top-5 terms by weight — shape, coverage,
    and structural rerun stability pinned in tests/test_llm.py (exact
    float equality is NOT promised: parallel EM sums floats in
    partition order).
    """
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    d = tables.load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", vocabSize=200, minDF=2
    ).fit(d)
    vecs = cv.transform(d)
    lda = LDA(k=5, seed=42, maxIter=10, optimizer="em").fit(vecs)
    vocab = cv.vocabulary
    topics = lda.describeTopics(5)
    rows = topics.select(
        "topic",
        F.posexplode(
            F.arrays_zip("termIndices", "termWeights")
        ).alias("rank", "tw"),
    ).select(
        "topic",
        (F.col("rank") + 1).alias("rank"),
        F.col("tw.termIndices").alias("term_idx"),
        F.round(F.col("tw.termWeights"), 6).alias("weight"),
    )
    vocab_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(vocab)], "term_idx int, term string"
    )
    return (
        rows.join(F.broadcast(vocab_df), "term_idx")
        .select("topic", "rank", "term", "weight")
        .orderBy("topic", "rank")
    )


@register("text_word2vec", oracle=None, tags=("ext", "ml", "rows-only"))
def text_word2vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word2Vec skip-gram embeddings (MLlib, 16-dim, seeded) over the
    corpus token sequences, read out as each frequent probe term's
    top-3 nearest vocabulary neighbors — the from-scratch embedding
    path when no pretrained encoder exists for a corpus/language.

    Distributed shape: MLlib's Word2Vec trains with per-partition
    gradient updates merged per iteration (broadcast global vectors,
    aggregate deltas) — linear scans, no pair materialization.
    Rows-only (float SGD): vocabulary coverage, neighbor-count shape,
    and structural rerun stability pinned in tests/test_llm.py.
    """
    from pyspark.ml.feature import Word2Vec

    d = tables.load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )
    model = Word2Vec(
        vectorSize=16,
        seed=42,
        minCount=5,
        maxIter=2,
        inputCol="toks",
        outputCol="vec",
    ).fit(d)
    probes = ["data", "table", "query"]
    out = None
    for p in probes:
        syn = model.findSynonyms(p, 3).select(
            F.lit(p).alias("probe"),
            F.col("word").alias("neighbor"),
            F.round("similarity", 6).alias("similarity"),
        )
        out = syn if out is None else out.unionByName(syn)
    w = Window.partitionBy("probe").orderBy(
        F.col("similarity").desc(), F.col("neighbor")
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .select("probe", "rank", "neighbor", "similarity")
        .orderBy("probe", "rank")
    )


RAKE_STOPWORDS = ("a", "the")
RAKE_TOPK = 20


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    topk: int = RAKE_TOPK,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    ``degree/frequency`` where ``freq`` counts occurrences and
    ``degree`` sums the length of every phrase the occurrence sits in
    (so words that co-occur inside long content phrases outrank
    equally-frequent words that appear alone). Both inputs to the
    score are exact integers; the division is the only float,
    reported rounded, with the (score DESC, word ASC) ordering making
    the top-k cutoff deterministic.

    Plan shape: positions via ``posexplode`` (never a lookahead-regex
    phrase split — RE2 oracles can't express lookahead), then every
    window is partitioned by document (phrase ids = running stopword
    count) or by (document, phrase) (phrase length) — shuffles scale
    with the corpus, no global funnel. The final word aggregation is
    one keyed shuffle over (word) with map-side partials; the top-k is
    an orderBy+limit → TakeOrderedAndProject, never a full sort.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p", "w"),
    ).select(
        "doc_id",
        "p",
        "w",
        F.when(F.col("w").isin(*stopwords), 1).otherwise(0).alias("is_stop"),
    )
    run = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pid = tok.select(
        "doc_id",
        "w",
        "is_stop",
        F.sum("is_stop").over(run).alias("phrase_id"),
    ).filter(F.col("is_stop") == 0)
    plen = pid.select(
        "doc_id",
        "w",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id", "phrase_id"))
        .alias("phrase_len"),
    )
    stats = plen.groupBy(F.col("w").alias("word")).agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("degree"),
    )
    return (
        stats.select(
            "word",
            "freq",
            "degree",
            F.round(F.col("degree").cast("double") / F.col("freq"), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), "word")
        .limit(topk)
    )


_RAKE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
pos AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS p FROM t
),
tok AS (
  SELECT doc_id, p, toks[p] AS w,
         CASE WHEN toks[p] IN {RAKE_STOPWORDS} THEN 1 ELSE 0 END AS is_stop
  FROM pos
),
pid AS (
  SELECT doc_id, w, is_stop,
         CAST(sum(is_stop) OVER (PARTITION BY doc_id ORDER BY p
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS phrase_id
  FROM tok
),
words AS (SELECT doc_id, phrase_id, w FROM pid WHERE is_stop = 0),
plen AS (
  SELECT doc_id, w,
         count(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
  FROM words
),
stats AS (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(phrase_len) AS BIGINT) AS degree
  FROM plen GROUP BY w
)
SELECT word, freq, degree,
       round(CAST(degree AS DOUBLE) / freq, 6) AS score
FROM stats ORDER BY score DESC, word LIMIT {RAKE_TOPK}
"""


@register("text_rake_keywords", oracle=_RAKE_SQL, tags=("ext", "llm"))
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keywords over the documents corpus: stopword-delimited
    phrases ('a'/'the' are the fixture's function words), integer
    degree/frequency per word, top-20 by the rounded score. The
    corpus-scale keyword readout a curation pipeline uses to eyeball
    what a source is actually about before admitting it."""
    d = tables.load(spark, sf_dir, "documents")
    return rake_keywords(d)


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "window", "merge")  # fixture query terms
BM25_TOPN = 25


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    topn: int = BM25_TOPN,
) -> DataFrame:
    """Okapi BM25 retrieval scoring — THE lexical ranker (the
    production baseline every dense retriever is benchmarked against,
    and the lexical arm of hybrid search). Scores every document
    against a bag of query terms; returns the top-n by score.

    Every corpus statistic is an exact integer or exact ratio of
    integers: per-doc/term tf, per-term df, doc length, corpus size,
    and total length (avgdl enters only as the exact ratio
    ``dl * n_docs / total_len``). The IDF uses the standard
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` form (always positive) and
    is the only transcendental; score reported round6, ties broken by
    doc id.

    Scale shape: the query side is a handful of literal terms — the
    tf table is filtered to them BEFORE any join (predicate on the
    term column, pushed below the shuffle), so the score join touches
    |query| x df rows, not the whole posting table; df and the length
    stats are broadcast 1-row/tiny aggregates; top-n is
    orderBy+limit → TakeOrderedAndProject."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    qt = list(query_terms)
    tf = (
        tok.filter(F.col("term").isin(*qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # dl/avgdl enters as the exact integer ratio dl*n_docs/total_len
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl") * F.col("n_docs") / F.col("total_len")
    )
    per_term = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (idf * F.col("tf") * (k1 + 1) / denom).alias("contrib"),
        )
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum("contrib"), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(topn)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({terms})
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY term
),
per_term AS (
  SELECT tf.doc_id,
         ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * {BM25_K1 + 1}
           / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
              + {BM25_B} * dl.dl * s.n_docs / CAST(s.total_len AS DOUBLE)))
           AS contrib
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       round(sum(contrib), 6) AS bm25
FROM per_term GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPN}
"""


@register("text_bm25", oracle=_bm25_sql(), tags=("ext", "llm", "bench2"))
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 documents for the fixture query {spark, window,
    merge} (``bm25_scores``): the lexical-retrieval twin of the dense
    ANN keys — hybrid search runs both and fuses."""
    d = tables.load(spark, sf_dir, "documents")
    return bm25_scores(d, BM25_QUERY)


RRF_K = 60  # standard reciprocal-rank-fusion constant
RRF_DEPTH = 50  # per-arm shortlist depth
RRF_TOPN = 15
RRF_QUERY_VEC = 0  # dense arm: query = embedding of vec_id 0


def _rrf_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({terms})
  GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY term
),
lex_scored AS (
  SELECT tf.doc_id,
         round(sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * {BM25_K1 + 1}
           / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
              + {BM25_B} * dl.dl * s.n_docs
                / CAST(s.total_len AS DOUBLE)))), 6) AS bm25
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
lex_rank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM lex_scored
  ORDER BY bm25 DESC, doc_id LIMIT {RRF_DEPTH}
),
qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id = {RRF_QUERY_VEC}
),
dense_scored AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.v),
               6) AS cosine
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> {RRF_QUERY_VEC}
),
dense_rank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id) AS dense_rank
  FROM dense_scored
  ORDER BY cosine DESC, doc_id LIMIT {RRF_DEPTH}
),
fused AS (
  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
         l.lex_rank, d.dense_rank,
         round(coalesce(1.0 / ({RRF_K} + l.lex_rank), 0)
               + coalesce(1.0 / ({RRF_K} + d.dense_rank), 0), 6) AS rrf
  FROM lex_rank l FULL OUTER JOIN dense_rank d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, rrf
FROM fused ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPN}
"""


@register("sim_hybrid_rrf", oracle=_rrf_sql(), tags=("ext", "llm"))
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the BM25 lexical
    arm (``bm25_scores``, query {spark, window, merge}) and a dense
    cosine arm (query = embedding 0 over the doc-aligned embeddings
    table) each produce a top-50 ranking; RRF fuses them with the
    standard ``1/(60 + rank)`` weights and returns the top-15. This is
    the production hybrid-search shape — the reason the engine carries
    BOTH a lexical scorer and the ANN tier.

    Ranks are integers from (score DESC, doc_id) windows over the two
    DEPTH-bounded shortlists, so the fusion is deterministic and the
    whole composition carries a value-hash oracle. Scale: each arm is
    its own documented shape (BM25: term-filtered postings; dense:
    broadcast query against the corpus — swap in the IVF/PQ keys past
    memory scale); the fusion is a full-outer join of two 50-row
    shortlists — constant-size."""
    from pyspark.sql import Window

    d = tables.load(spark, sf_dir, "documents")
    lex = bm25_scores(d, BM25_QUERY, topn=RRF_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.desc("bm25"), F.col("doc_id")))
        .alias("lex_rank"),
    )
    e = tables.load(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vecs = e.select("vec_id", dvec.alias("v"), F.sqrt(sq).alias("nrm"))
    qv = vecs.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dense = (
        vecs.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(F.try_divide(dot, F.col("nrm") * F.col("qn")), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(
                Window.partitionBy().orderBy(F.desc("cosine"), F.col("doc_id"))
            )
            .alias("dense_rank"),
        )
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(RRF_TOPN)


CMS_D = 4  # hash rows
CMS_W = 256  # counters per row
CMS_TOPN = 20


def _cms_sql() -> str:
    return f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
tc AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY term
),
cells AS (
  SELECT r.r, term, n,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || term), 1, 8))
           ::BIGINT % {CMS_W} AS col
  FROM tc CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS r) r
),
counters AS (
  SELECT r, col, CAST(sum(n) AS BIGINT) AS c
  FROM cells GROUP BY r, col
),
top_terms AS (
  SELECT term, n FROM tc ORDER BY n DESC, term LIMIT {CMS_TOPN}
),
probes AS (
  SELECT t.term, t.n, r.r,
         ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':' || t.term), 1, 8))
           ::BIGINT % {CMS_W} AS col
  FROM top_terms t CROSS JOIN (SELECT unnest(range(0, {CMS_D})) AS r) r
)
SELECT p.term, p.n AS n_exact,
       CAST(min(c.c) AS BIGINT) AS cms_est,
       CAST(min(c.c) - p.n AS BIGINT) AS overcount
FROM probes p JOIN counters c ON c.r = p.r AND c.col = p.col
GROUP BY p.term, p.n
ORDER BY n_exact DESC, term
"""


@register("text_cms_sketch", oracle=_cms_sql(), tags=("ext", "llm"))
def text_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch term-frequency estimates with EXACT
    cross-engine counters — the frequency sibling of the exact-register
    HLL key (``agg_hll_registers``): d=4 md5-derived hash rows x w=256
    BIGINT counters, point estimate = min over rows, reported for the
    top-20 exact terms beside their true counts (``overcount >= 0`` is
    the CMS one-sided-error guarantee, pinned in tests; counters ADD
    across partitions/days — the mergeability that makes this the
    100 TB heavy-hitter state instead of a full term dictionary).

    The sketch build is one keyed agg over d x distinct-terms rows
    (map-side combinable); the probe side is a 20-term broadcast
    against the 1024-cell counter table. Everything is BIGINT —
    no floats anywhere in this key."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
    col = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"), F.lit(":"), F.col("term")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )
    cells = tc.select("term", "n", rows).select("r", "term", "n", col.alias("col"))
    counters = cells.groupBy("r", "col").agg(F.sum("n").alias("c"))
    top_terms = tc.orderBy(F.desc("n"), "term").limit(CMS_TOPN)
    probes = top_terms.select("term", "n", rows).select(
        "term", "n", "r", col.alias("col")
    )
    return (
        F.broadcast(probes)
        .join(counters, ["r", "col"])
        .groupBy(F.col("term"), F.col("n").alias("n_exact"))
        .agg(F.min("c").alias("cms_est"))
        .select(
            "term",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("n_exact"), "term")
    )


# ---------------------------------------------------------------------------
# Ranking evaluation (M221)


def _eval_ranking_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    n_q = len(BM25_QUERY)
    bm25 = _bm25_sql().rstrip()
    return f"""
WITH ranking AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM ({bm25}) bm
),
rel AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS rel
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents) t
  WHERE term IN ({terms})
  GROUP BY doc_id
),
ranked_rel AS (
  SELECT r.rank, coalesce(v.rel, 0) AS rel
  FROM ranking r LEFT JOIN rel v USING (doc_id)
),
ideal AS (
  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rank
  FROM rel
),
dcg AS (
  SELECT sum((power(2.0, rel) - 1.0) / (ln(rank + 1.0) / ln(2.0))) AS dcg
  FROM ranked_rel
),
idcg AS (
  SELECT sum((power(2.0, rel) - 1.0) / (ln(rank + 1.0) / ln(2.0))) AS idcg
  FROM ideal WHERE rank <= {BM25_TOPN}
),
bin AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rel_total FROM rel
  WHERE rel = {n_q}
),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rel_retrieved,
         min(CASE WHEN rel = {n_q} THEN rank END) AS first_hit
  FROM ranked_rel WHERE rel = {n_q}
)
SELECT {BM25_TOPN} AS k,
       b.n_rel_total,
       h.n_rel_retrieved,
       round(CAST(h.n_rel_retrieved AS DOUBLE) / {BM25_TOPN}, 6)
         AS precision_k,
       round(CAST(h.n_rel_retrieved AS DOUBLE) / b.n_rel_total, 6)
         AS recall_k,
       round(coalesce(1.0 / h.first_hit, 0.0), 6) AS mrr,
       round(d.dcg, 6) AS dcg,
       round(i.idcg, 6) AS idcg,
       round(d.dcg / i.idcg, 6) AS ndcg
FROM dcg d CROSS JOIN idcg i CROSS JOIN bin b CROSS JOIN hits h
"""


@register("ml_eval_ranking", oracle=_eval_ranking_sql(), tags=("ext", "ml"))
def ml_eval_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the BM25 arm: NDCG@25 (graded
    gain 2^rel - 1, rel = number of distinct query terms present,
    ideal DCG from the best achievable ordering), MRR, precision@k,
    recall@k — the retrieval-eval readout the classification twin
    (``ml_eval_classification``) doesn't cover. Relevance is a
    deterministic function of the corpus (term containment), so the
    whole scorecard is value-hash-exact; the discount ln(rank+1)/ln 2
    is the only transcendental, over ranks 1..25.

    Scale shape: rel is one filtered explode + keyed agg; the DCG and
    MRR terms need each relevant document's FULL-corpus rank (a hit
    can sit past k), so the corpus ranking carries a global
    row_number — a single total-order window at committed scales;
    past ``distorder.WINDOW_GATE_ROWS`` both rankings switch to the
    distributed global-order kernel (SCALE.md §24), bit-identical
    ranks, no single-partition exchange."""
    from ezbake_graph_spark.operators import distorder

    d = tables.load(spark, sf_dir, "documents")
    n_q = len(BM25_QUERY)
    dist = distorder.use_distributed_window(spark, sf_dir, "documents")
    scores = bm25_scores(d, BM25_QUERY)
    if dist:
        ranking = distorder.attach_global_order(
            scores,
            "bm25",
            [F.col("bm25").desc(), F.col("doc_id")],
            desc=True,
            rank_col="_rank",
        ).select("doc_id", F.col("_rank").cast("int").alias("rank"))
    else:
        ranking = scores.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("rank"),
        )
    rel = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("rel"))
    )
    ranked_rel = ranking.join(F.broadcast(rel), "doc_id", "left").select(
        "rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / (
        F.log(F.col("rank") + 1.0) / F.log(F.lit(2.0))
    )
    dcg = ranked_rel.agg(F.sum(gain).alias("dcg"))
    if dist:
        # rel has <= n_q distinct values, so quantile bucketing here
        # degenerates to value-buckets — still correct, still keyed
        ideal = (
            distorder.attach_global_order(
                rel,
                "rel",
                [F.col("rel").desc(), F.col("doc_id")],
                desc=True,
                rank_col="_rank",
            )
            .select("rel", F.col("_rank").cast("int").alias("rank"))
            .filter(F.col("rank") <= BM25_TOPN)
        )
    else:
        ideal = rel.select(
            "rel",
            F.row_number()
            .over(Window.orderBy(F.col("rel").desc(), "doc_id"))
            .alias("rank"),
        ).filter(F.col("rank") <= BM25_TOPN)
    idcg = ideal.agg(F.sum(gain).alias("idcg"))
    bins = rel.filter(F.col("rel") == n_q).agg(
        F.count(F.lit(1)).alias("n_rel_total")
    )
    hits = ranked_rel.filter(F.col("rel") == n_q).agg(
        F.count(F.lit(1)).alias("n_rel_retrieved"),
        F.min("rank").alias("first_hit"),
    )
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(bins))
        .crossJoin(F.broadcast(hits))
        .select(
            F.lit(BM25_TOPN).alias("k"),
            "n_rel_total",
            "n_rel_retrieved",
            F.round(
                F.col("n_rel_retrieved").cast("double") / BM25_TOPN, 6
            ).alias("precision_k"),
            F.round(
                F.col("n_rel_retrieved").cast("double")
                / F.col("n_rel_total"),
                6,
            ).alias("recall_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(F.col("dcg"), 6).alias("dcg"),
            F.round(F.col("idcg"), 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )
