"""filter_repetition kernel shootout (round 10, VERDICT r9 #7).

OUTCOME (historical record): explode_two_agg won — 0.916s vs 1.766s
at sf0.1, 2.287s vs 5.624s at x4 (curve 2.50x vs 3.9x), values equal
at both scales — and was merged into ``repetition_metrics``, so
re-running this script now compares the merged kernel against itself.

Current kernel: per-doc map-side sorted-run fold via F.aggregate —
zero shuffle but INTERPRETED lambda evaluation per token (Catalyst
HOFs don't codegen), measured x4/x1 = 3.9x (CPU-saturated linear).

Candidate: explode unigrams+bigrams into ONE gram stream (bigrams are
distinguishable by their embedded space — tokens are split on space so
they can never contain one), then two codegen'd hash aggregations:
(doc, gram) counts with map-side combine, then per-doc conditional
maxes. Trades interpreted per-token CPU for two keyed shuffles over
combiner-reduced data.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from ezbake_graph_spark import tables
from ezbake_graph_spark.session import get_session
from ezbake_graph_spark.operators.llm_filter import repetition_metrics

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
spark = get_session("rep-variants")
docs = tables.load(spark, SF, "documents")

def variant_explode(docs):
    toks = F.split(F.col("text"), " ")
    bgs = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (t, i) -> concat(t, ' ', element_at(split(text, ' '), i + 2)))"
    )
    grams = docs.select("doc_id", F.explode(F.concat(toks, bgs)).alias("g"))
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    is_bg = F.instr(F.col("g"), " ") > 0
    m = per_gram.groupBy("doc_id").agg(
        F.sum(F.when(~is_bg, F.col("c"))).alias("n_tokens"),
        F.count(F.when(~is_bg, F.lit(1))).alias("n_distinct"),
        F.max(F.when(~is_bg, F.col("c"))).alias("top_uni"),
        F.max(F.when(is_bg, F.col("c"))).alias("top_bg"),
        F.sum(F.when(is_bg, F.col("c"))).alias("n_bigrams"),
    )
    dup = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")
    tu = F.col("top_uni").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id", "n_tokens", dup.alias("dup_word_fraction"),
        tu.alias("top_unigram_fraction"),
        F.try_divide(F.col("top_bg").cast("double"), F.col("n_bigrams")).alias("top_bigram_fraction"),
        ((tu > 0.2) | (dup > 0.9)).alias("is_repetitive"),
    )

variants = {
    "current_hof_fold": lambda: repetition_metrics(docs).orderBy("doc_id"),
    "explode_two_agg": lambda: variant_explode(docs).orderBy("doc_id"),
}
# correctness cross-check first
ref = {tuple(r) for r in variants["current_hof_fold"]().collect()}
new = {tuple(r) for r in variants["explode_two_agg"]().collect()}
print("match:", ref == new, len(ref), file=sys.stderr)
for name, fn in variants.items():
    for _ in range(2): fn().toPandas()  # warm
    best = min(
        (lambda t0: (fn().toPandas(), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(4)
    )
    print(f"{name}: {best:.3f}s")
