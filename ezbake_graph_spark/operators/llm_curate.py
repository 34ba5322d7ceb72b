"""Curation composites under the driver oracle regime (VERDICT r6 #1):
``curate_corpus`` and ``prepare_training_data`` — the end-to-end paths
a training-data user actually calls — as registry keys with FULL
value-hash DuckDB oracles.

Every building block is individually oracled elsewhere (gopher gate,
repetition gate, PII redact, prefix-filtered exact Jaccard pairs, WCC
canonicalization, sequence packing); these keys chain the SAME pieces
in one recursive-CTE oracle so the integration seams — provenance
columns, gate interactions, redact-before-dedup ordering — are
cross-engine certified, not just the parts.

The keys run ``api.curate_corpus(dedup="exact")``: the exact
prefix-filter pair stage replaces MinHash-LSH because LSH banding is
not SQL-expressible, and by construction the exact stage returns the
same pairs all-pairs SQL does. The MinHash flagship path is pinned to
this one by ``tests/test_api.py::test_curate_corpus_minhash_matches_
exact_path`` (recall 1 on the fixture) plus K3's own recall tests.

Fixture shape: inputs are the fabricated-PII documents (text +
deterministic emails/phones — ``llm_filter._fabricated_pii``) so the
redaction stage is non-trivial; dedup_threshold=0.95 and
max_top_unigram=0.1 were chosen from the measured fixture structure
(J distribution median is 0.8(!) — template-heavy synthetic text — so
0.8 would collapse everything into 2 clusters; 0.95 yields 171 kept of
266 survivors, 165 singletons + 6 real clusters, and 0.1 makes the
repetition gate actually gate ~10% of gopher-passers instead of 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.operators.llm_filter import (
    _FABRICATE_SQL_EXPR,
    PII_PATTERNS,
    _fabricated_pii,
)
from ezbake_graph_spark.registry import register

CURATE_THRESHOLD = 0.95
CURATE_MAX_TOP_UNIGRAM = 0.1
CURATE_CONTEXT = 512
CURATE_BINS_PER_SHARD = 2

# Shared CTE chain: fabricate -> gates -> redact -> exact pairs ->
# recursive WCC -> cluster provenance. Both oracles below build on it.
_CURATE_CTES = f"""
WITH RECURSIVE fab AS (
  SELECT doc_id, {_FABRICATE_SQL_EXPR} AS text FROM documents
), s AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM fab
), gates AS (
  SELECT doc_id, text,
    (len(toks) BETWEEN 50 AND 100000
     AND CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
         / len(toks) BETWEEN 3 AND 10
     AND CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
         / len(text) < 0.1
     AND CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
              AS DOUBLE) / len(toks) > 0.8
     AND list_has_any(toks, ['a', 'the', 'and', 'to', 'of'])) AS passes_gopher,
    (CAST(list_max(list_transform(list_distinct(toks),
                   w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
         / len(toks) > {CURATE_MAX_TOP_UNIGRAM}
     OR 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.9)
      AS is_repetitive
  FROM s
), red AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(text, '{PII_PATTERNS["email"]}',
                                  '[EMAIL]', 'g'),
                   '{PII_PATTERNS["phone"]}', '[PHONE]', 'g') AS clean_text,
    len(regexp_extract_all(text, '{PII_PATTERNS["email"]}'))
    + len(regexp_extract_all(text, '{PII_PATTERNS["phone"]}')) AS n_redacted
  FROM gates WHERE passes_gopher AND NOT is_repetitive
), rtok AS (
  SELECT doc_id, list_distinct(string_split(clean_text, ' ')) AS toks FROM red
), pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM rtok a JOIN rtok b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / CAST(len(a.toks) + len(b.toks)
               - len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        >= {CURATE_THRESHOLD}
), sym AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION SELECT d2, d1 FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM rtok
  UNION
  SELECT sy.dst AS node, re.label
  FROM reach re JOIN sym sy ON sy.src = re.node
  WHERE re.label < sy.dst
), comp AS (
  SELECT node AS doc_id, min(label) AS canonical_doc_id
  FROM reach GROUP BY node
), clus AS (
  SELECT doc_id, canonical_doc_id,
         count(*) OVER (PARTITION BY canonical_doc_id) AS cluster_size,
         (doc_id = canonical_doc_id) AS is_canonical
  FROM comp
)
"""

_CURATE_SQL = (
    _CURATE_CTES
    + """
SELECT g.doc_id, g.text, g.passes_gopher, g.is_repetitive,
       r.clean_text, r.n_redacted,
       c.canonical_doc_id, c.cluster_size, c.is_canonical,
       ((g.passes_gopher AND NOT g.is_repetitive)
        AND coalesce(c.is_canonical, false)) AS keep
FROM gates g
LEFT JOIN red r USING (doc_id)
LEFT JOIN clus c USING (doc_id)
ORDER BY g.doc_id
"""
)


def _fab_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables.load(spark, sf_dir, "documents")
    return _fabricated_pii(d).withColumnRenamed("pii_text", "text")


@register("curate_corpus", oracle=_CURATE_SQL, tags=("ext", "curate", "bench2"))
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (gates -> PII redact -> exact
    near-dup clusters) over the fabricated-PII documents, full
    provenance output — ``api.curate_corpus(dedup="exact")`` verbatim.

    Scale: stages 1-3 fuse into one WholeStageCodegen text pass; the
    exact pair stage is prefix-filtered (candidates keyed on rare
    prefix tokens, never all-pairs) and the canonicalization is the
    Pregel WCC loop over the pair graph only."""
    from ezbake_graph_spark import api

    return api.curate_corpus(
        _fab_docs(spark, sf_dir),
        dedup_threshold=CURATE_THRESHOLD,
        repetition_thresholds={"max_top_unigram": CURATE_MAX_TOP_UNIGRAM},
        dedup="exact",
    ).orderBy("doc_id")


_PREPARE_SQL = (
    _CURATE_CTES
    + f"""
, kept AS (
  SELECT r.doc_id, r.clean_text
  FROM red r JOIN clus c USING (doc_id)
  WHERE c.is_canonical
), toks2 AS (
  SELECT doc_id, len(string_split(clean_text, ' ')) AS n_tokens FROM kept
), fit AS (
  SELECT * FROM toks2 WHERE n_tokens <= {CURATE_CONTEXT}
), cum AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           - n_tokens AS cum_before
  FROM fit
)
SELECT doc_id, n_tokens,
       CAST(floor(cum_before / {CURATE_CONTEXT}) AS BIGINT) AS bin_id,
       CAST(cum_before % {CURATE_CONTEXT} AS BIGINT) AS offset_tokens,
       CAST(floor(floor(cum_before / {CURATE_CONTEXT})
                  / {CURATE_BINS_PER_SHARD}) AS BIGINT) AS shard_id
FROM cum
ORDER BY doc_id
"""
)


@register(
    "prepare_training_data", oracle=_PREPARE_SQL, tags=("ext", "curate", "bench2")
)
def prepare_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw documents to training-batch layout: curation (as in
    ``curate_corpus``) -> sequence packing of the kept docs' REDACTED
    text into 512-token bins -> shard ids (2 bins per shard) —
    ``api.prepare_training_data(dedup="exact")`` verbatim."""
    from ezbake_graph_spark import api

    return api.prepare_training_data(
        _fab_docs(spark, sf_dir),
        context=CURATE_CONTEXT,
        bins_per_shard=CURATE_BINS_PER_SHARD,
        dedup_threshold=CURATE_THRESHOLD,
        repetition_thresholds={"max_top_unigram": CURATE_MAX_TOP_UNIGRAM},
        dedup="exact",
    ).orderBy("doc_id")
