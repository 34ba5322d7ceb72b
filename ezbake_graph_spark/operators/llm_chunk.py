"""Document chunking, decontamination, and repetition quality (§2M).

Three more LLM-training-pipeline primitives over ``documents``:

- ``text_chunk_overlap``: fixed-size token chunks with overlap — the
  context-window packing step every pretraining pipeline runs. Pure
  array expressions (split → sequence of starts → slice), no UDF, no
  shuffle: chunking is embarrassingly parallel and stays map-side.
- ``dedup_decontaminate``: train/test contamination check — test-split
  documents sharing any word-4-gram shingle with the train split. The
  shuffle key is the shingle (explode → distinct → equi-join), so the
  plan is linear in total shingles, never all-pairs; at 100 TB the
  train shingle set would be bucketed by ``shingle`` and the probe is
  a co-located join (same shape as dedup_minhash's band join).
- ``text_repetition``: duplicated-bigram ratio per document — the
  standard boilerplate/template-spam quality gate. Map-side only.

Determinism: chunk ids/starts and bigram counts are exact integers;
``repetition_ratio`` is a single IEEE division of two exact integers,
bit-identical in both engines (SURVEY.md §5.3 rule 2 — no round()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.registry import register

CHUNK_SIZE = 64  # tokens per chunk
CHUNK_STRIDE = 48  # start-to-start distance => 16-token overlap

_CHUNK_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), starts AS (
  SELECT doc_id, toks,
         unnest(range(1, greatest(len(toks), 1) + 1, {CHUNK_STRIDE})) AS start
  FROM tok
)
SELECT doc_id,
       CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       array_to_string(
         list_slice(toks, start, least(start + {CHUNK_SIZE} - 1, len(toks))),
         ' ') AS chunk_text,
       least(start + {CHUNK_SIZE} - 1, len(toks)) - start + 1 AS n_tokens
FROM starts
ORDER BY doc_id, chunk_id
"""


@register("text_chunk_overlap", oracle=_CHUNK_SQL, tags=("ext", "chunking"))
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap (stride 48), 1-based starts."""
    d = tables.load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_id"),
            F.array_join(
                F.expr(
                    f"slice(toks, start, "
                    f"least(start + {CHUNK_SIZE} - 1, size(toks)) - start + 1)"
                ),
                " ",
            ).alias("chunk_text"),
            (
                F.least(
                    F.col("start") + (CHUNK_SIZE - 1), F.size("toks")
                )
                - F.col("start")
                + 1
            ).alias("n_tokens"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# Same md5 predicate as sample_split_train_test (sampling.py).
_SPLIT_PRED = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'"
DECON_N = 4  # shingle width (word 4-grams)

_DECON_SQL = f"""
WITH split AS (
  SELECT doc_id, text,
         CASE WHEN {_SPLIT_PRED} THEN 'train' ELSE 'test' END AS split
  FROM documents
), sh AS (
  SELECT doc_id, split,
         unnest(list_distinct(list_transform(range(1, len(w) - {DECON_N - 2}),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])))
           AS shingle
  FROM (SELECT doc_id, split, string_split(text, ' ') AS w FROM split)
  WHERE len(w) >= {DECON_N}
), train_sh AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train')
SELECT s.doc_id, count(*) AS n_contaminated_shingles
FROM sh s JOIN train_sh t USING (shingle)
WHERE s.split = 'test'
GROUP BY s.doc_id
ORDER BY n_contaminated_shingles DESC, doc_id
LIMIT 100
"""


@register("dedup_decontaminate", oracle=_DECON_SQL, tags=("ext", "dedup"))
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-split docs contaminated by train-split word-4-gram shingles.

    Explode each doc's distinct shingles once, split into train/test by
    the md5 hash split, and count per test doc the shingles that also
    occur anywhere in train. One keyed shuffle on ``shingle``.
    """
    d = tables.load(spark, sf_dir, "documents")
    first2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    w = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(F.col("w")) - (DECON_N - 1))
    shingle = F.concat_ws(
        " ", *[F.element_at("w", F.col("i") + k) for k in range(DECON_N)]
    )
    sh = (
        d.select(
            "doc_id",
            F.when(first2 < "cc", "train").otherwise("test").alias("split"),
            w.alias("w"),
        )
        .filter(F.size("w") >= DECON_N)
        .select("doc_id", "split", F.explode(idx).alias("i"), "w")
        .select("doc_id", "split", shingle.alias("shingle"))
        .distinct()
    )
    train_sh = sh.filter(F.col("split") == "train").select("shingle").distinct()
    return (
        sh.filter(F.col("split") == "test")
        .join(train_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
        .orderBy(F.col("n_contaminated_shingles").desc(), "doc_id")
        .limit(100)
    )


_REP_SQL = """
WITH g AS (
  SELECT doc_id,
         len(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
           AS total_bigrams,
         len(list_distinct(
             list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])))
           AS distinct_bigrams
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 2
)
SELECT doc_id, total_bigrams, distinct_bigrams,
       CAST(total_bigrams - distinct_bigrams AS DOUBLE)
         / CAST(total_bigrams AS DOUBLE) AS repetition_ratio
FROM g
ORDER BY repetition_ratio DESC, doc_id
LIMIT 50
"""


@register("text_repetition", oracle=_REP_SQL, tags=("ext", "quality"))
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-bigram ratio per doc, 50 most repetitive."""
    d = tables.load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    return (
        d.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.size(bigrams).alias("total_bigrams"),
            F.size(F.array_distinct(bigrams)).alias("distinct_bigrams"),
        )
        .select(
            "doc_id",
            "total_bigrams",
            "distinct_bigrams",
            (
                (F.col("total_bigrams") - F.col("distinct_bigrams")).cast("double")
                / F.col("total_bigrams").cast("double")
            ).alias("repetition_ratio"),
        )
        .orderBy(F.col("repetition_ratio").desc(), "doc_id")
        .limit(50)
    )


_PACK_SQL = """
WITH t AS (
  SELECT doc_id, lang, length(string_split(text, ' ')) AS n_tokens
  FROM documents
), f AS (
  SELECT * FROM t WHERE n_tokens <= 512
), c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM f
)
SELECT doc_id, lang, n_tokens,
       CAST(floor(cum_before / 512) AS BIGINT) AS bin_id,
       CAST(cum_before % 512 AS BIGINT) AS offset_tokens
FROM c
ORDER BY lang, doc_id
"""


@register("text_pack_sequences", oracle=_PACK_SQL, tags=("ext", "M104"))
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches: lay documents (capped
    at the 512-token context) end-to-end per language in stable doc_id
    order and assign each its bin (context window) and token offset —
    the pack-then-chunk scheme that lifts pretraining token utilization
    vs one-doc-per-row padding. Downstream, a groupBy(lang, bin_id)
    collect_list materializes the packed windows; documents straddling
    a boundary belong to the bin of their start offset (the chunker
    M26 handles intra-document splitting).

    Exactness: token counts and the running sum are integers; bin and
    offset are integer floor/mod — nothing can drift. Plan: one
    lang-keyed window (cumulative sum), map-side arithmetic after; at
    100 TB the pack key becomes (lang, shard) so each shard packs
    independently — packing quality is unaffected because bins never
    cross the partition key by construction."""
    d = tables.load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    ).filter(F.col("n_tokens") <= 512)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(F.col("cum_before") / 512).cast("long").alias("bin_id"),
        (F.col("cum_before") % 512).cast("long").alias("offset_tokens"),
    ).orderBy("lang", "doc_id")
