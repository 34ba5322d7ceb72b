"""Similarity search & embedding operators (SURVEY.md §2K: K4–K6,
K12–K13, + IVF ANN).

Scale ladder for 100 TB:
- K4 brute-force cosine is the correctness baseline (declared and
  benched — quadratic, only viable per-block).
- K6 blocked similarity prunes candidates to same-block pairs.
- sim_ivf is the ANN path: coarse-quantize every vector to its nearest
  centroid (broadcast centroid table), probe the nearest cells only.

Determinism: dot products are sequential double folds over 64 dims in
both engines (drift ~1e-14, 8 orders under the 6-dp grid); ORDER BY
uses the *rounded* similarity plus id tie-breaks so top-k cuts are
identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ezbake_graph_spark import tables
from ezbake_graph_spark.determinism import SCALE, sql_money_avg
from ezbake_graph_spark.registry import register


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with double-cast vectors and precomputed norms."""
    e = tables.load(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id", "label", dvec.alias("v"), F.sqrt(sq).alias("nrm")
    )


def _cosine(v1: Column, n1: Column, v2: Column, n2: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(v1, v2, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (n1 * n2)


_COSINE_TOPK_SQL = """
SELECT a.vec_id AS vid1, b.vec_id AS vid2,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cosine DESC, vid1, vid2
LIMIT 20
"""


@register("sim_cosine_topk", oracle=_COSINE_TOPK_SQL, tags=("K4", "bench"))
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 over all vector pairs (K4).

    Block-parallel BLAS kernel: one side of the pair space is broadcast
    as a dense float64 matrix, and each Arrow batch of the other side
    computes a vectorized ``batch @ M.T`` inside ``mapInPandas``, keeps
    its local top-20 (a superset bound: any global top-20 pair appears
    in the local top-20 of the batch holding its vid1), and the global
    ``orderBy().limit(20)`` merges ~20 rows per partition.

    Scale path: at 100 TB the corpus no longer fits one broadcast —
    this exact kernel is then applied per block-pair (grid-partitioned
    self-join) or after LSH/IVF pruning (``sim_blocked``/``sim_ivf``);
    the per-task compute stays this same dense matmul.
    """
    import numpy as np
    import pandas as pd

    emb = tables.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()  # broadcast-dimension build: 2k x 64 floats
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def block_topk(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            q_mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
            sims = (q_mat @ b_mat.T) / np.outer(q_norms, b_norms)
            # pair constraint vid1 < vid2; -inf knocks masked cells out
            mask = q_ids[:, None] < b_ids[None, :]
            sims = np.where(mask, np.round(sims, 6), -np.inf)
            flat = sims.ravel()
            k = min(20, int(mask.sum()))
            if k == 0:
                continue
            # keep EVERY cell tied with the k-th value, then cut by the
            # full (cosine desc, vid1, vid2) order — an argpartition-only
            # cut would resolve boundary ties arbitrarily and could drop
            # a pair the global composite order needs
            kth_val = np.partition(flat, len(flat) - k)[len(flat) - k]
            cand = np.flatnonzero(flat >= kth_val)
            cand = cand[flat[cand] > -np.inf]
            v1 = q_ids[cand // len(b_ids)]
            v2 = b_ids[cand % len(b_ids)]
            order = np.lexsort((v2, v1, -flat[cand]))[:k]
            yield pd.DataFrame(
                {
                    "vid1": v1[order],
                    "vid2": v2[order],
                    "cosine": flat[cand][order],
                }
            )

    local = emb.mapInPandas(block_topk, "vid1 long, vid2 long, cosine double")
    return local.orderBy(F.col("cosine").desc(), "vid1", "vid2").limit(20)


_KNN_SQL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


@register("sim_knn", oracle=_KNN_SQL, tags=("K5",))
def sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN (K5): top-5 neighbors for query vectors 0..9. The
    query side is 10 rows → broadcast; one pass over candidates."""
    q = _vectors(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = _vectors(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    cos = _cosine(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


_BLOCKED_SQL = """
WITH scored AS (
  SELECT a.label, a.vec_id AS vid1, b.vec_id AS vid2,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
), ranked AS (
  SELECT label, vid1, vid2, cosine,
         row_number() OVER (PARTITION BY label
                            ORDER BY cosine DESC, vid1, vid2) AS rank
  FROM scored
)
SELECT label, vid1, vid2, cosine, rank
FROM ranked WHERE rank <= 3
ORDER BY label, rank
"""


@register("sim_blocked", oracle=_BLOCKED_SQL, tags=("K6",))
def sim_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked similarity (K6): candidate pairs only within the same
    label block — the keyed-join pruning pattern that replaces the
    all-pairs cross join at scale; top-3 per block."""
    vecs = _vectors(spark, sf_dir)
    a = vecs.select(
        "label", F.col("vec_id").alias("vid1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    b = vecs.select(
        F.col("label").alias("label2"),
        F.col("vec_id").alias("vid2"),
        F.col("v").alias("v2"),
        F.col("nrm").alias("n2"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("label2")) & (F.col("vid1") < F.col("vid2"))
    )
    cos = _cosine(F.col("v1"), F.col("n1"), F.col("v2"), F.col("n2"))
    scored = pairs.select("label", "vid1", "vid2", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("label").orderBy(F.col("cosine").desc(), "vid1", "vid2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("label", "rank")
    )


_MULTIMODAL_JOIN_SQL = """
SELECT d.doc_id, d.lang,
       (e.vec_id IS NOT NULL) AS has_embedding,
       e.label
FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
"""


@register("multimodal_join", oracle=_MULTIMODAL_JOIN_SQL, tags=("K12",))
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal join (K12): text rows ↔ their embedding modality on
    doc_id = vec_id (vec_id ⊆ doc_id); left join keeps docs without
    vectors."""
    d = tables.load(spark, sf_dir, "documents")
    e = tables.load(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id, "left")
        .select(
            "doc_id",
            "lang",
            F.col("vec_id").isNotNull().alias("has_embedding"),
            "label",
        )
        .orderBy("doc_id")
    )


_CENTROID_SQL = f"""
WITH idx AS (SELECT unnest(range(1, 65)) AS dim_i),
expanded AS (
  SELECT label, dim_i, CAST(embedding[dim_i] AS DOUBLE) AS val
  FROM embeddings CROSS JOIN idx
)
SELECT label, dim_i,
       {sql_money_avg("val")} AS centroid,
       count(*) AS n_vectors
FROM expanded
GROUP BY label, dim_i
ORDER BY label, dim_i
"""


@register("embed_centroid", oracle=_CENTROID_SQL, tags=("K13",))
def embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding centroids per label (K13): element-wise mean via
    posexplode → keyed aggregate (micro-unit exact)."""
    e = tables.load(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("pos", "val_f")
    ).select("label", (F.col("pos") + 1).alias("dim_i"), F.col("val_f").cast("double").alias("val"))
    micro = F.round(F.col("val") * SCALE).cast("long")
    # no final round: exact micro-sum / count / scale is bit-identical
    # in both engines (see determinism.money_avg_expr)
    return (
        exploded.groupBy("label", "dim_i")
        .agg(
            ((F.sum(micro).cast("double") / F.count(F.lit(1))) / SCALE).alias(
                "centroid"
            ),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "dim_i")
    )


_NPROBE = 4


@register("sim_ivf", oracle=None, tags=("K-extra", "rows-only"))
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (scale path for K4/K5): coarse-quantize every
    vector to its nearest label-centroid cell, then answer queries
    0..9 by probing only the nearest 4 of 10 cells. Recall vs exact kNN is
    checked in tests. At 100 TB the cell id becomes the partition key,
    so a probe touches 2 partitions instead of the full corpus."""
    vecs = _vectors(spark, sf_dir).cache()
    # centroids: element-wise mean per label, assembled back into arrays
    exploded = vecs.select("label", F.posexplode("v").alias("pos", "val"))
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc")
        )
        .select(
            F.col("label").alias("cell"),
            F.transform("pc", lambda s: s.getField("c")).alias("cv"),
        )
    )
    csq = F.aggregate(
        F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    cent = cent.select("cell", "cv", F.sqrt(csq).alias("cn")).cache()
    # assign vectors to nearest cell
    vc = vecs.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "v",
        "nrm",
        "cell",
        _cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn")).alias("sim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    assigned = (
        vc.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cell")
    )
    # queries probe their 2 nearest cells
    queries = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    qc = queries.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "qv",
        "qn",
        "cell",
        _cosine(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn")).alias("sim"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _NPROBE)
        .select("query_id", "qv", "qn", "cell")
    )
    # search only vectors in probed cells
    cands = probes.join(assigned, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = _cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm"))
    scored = cands.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("cosine")
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 5)
        .orderBy("query_id", "rank")
    )


_QUANT_SQL = """
SELECT vec_id,
       list_transform(embedding,
         x -> CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5) AS INTEGER)) AS q,
       CAST(list_aggregate(list_transform(embedding,
         x -> abs(CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5) AS INTEGER))),
         'sum') AS BIGINT) AS l1_norm
FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
"""


@register("embed_quantize", oracle=_QUANT_SQL, tags=("K-extra",))
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the storage/
    bandwidth cut every vector index applies before ANN. Map-side array
    transform, no shuffle. Determinism: float32→double widening is
    exact, and half-up is spelled floor(x*127 + 0.5) — floor is
    bit-identical in both engines, whereas round() diverges on exact
    halves (Spark BigDecimal vs DuckDB binary; SURVEY §5.3)."""
    e = tables.load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 127 + F.lit(0.5)).cast("int"),
    )
    return e.select(
        "vec_id",
        q.alias("q"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("l1_norm"),
    ).orderBy("vec_id")


@register("embed_kmeans", oracle=None, tags=("K-extra", "ml", "rows-only"))
def embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering of the embedding corpus (k = 10, the label
    cardinality) through Spark MLlib — the distributed Lloyd's loop:
    broadcast centroids, map-side assignment, shuffle only the per-
    cluster partial sums (same BSP shape as the Pregel ops). Seeded
    kmeans|| init. Returns per-cluster sizes + intra-cluster cost;
    rows-only (cluster ids are permutation-arbitrary), clustering
    quality vs the ground-truth labels is asserted in
    tests/test_llm.py."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector("embedding").alias("features")
    )
    model = KMeans(k=10, seed=42, maxIter=10).fit(e)
    pred = model.transform(e)
    return (
        pred.groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy(F.col("n_vectors").desc(), "prediction")
        .select("n_vectors")  # cluster ids are permutation-arbitrary
    )


_L2_SQL = """
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                     * CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
              AS DOUBLE)) / 1000000 AS l2_norm
  FROM embeddings
)
SELECT vec_id, l2_norm,
       list_transform(embedding, x -> CAST(x AS DOUBLE) / l2_norm) AS unit
FROM n
ORDER BY vec_id
"""


@register("embed_l2_normalize", oracle=_L2_SQL, tags=("K-extra", "M61"))
def embed_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize every embedding: per-vector norm + unit vector —
    the standard pre-step before cosine retrieval (turns cosine into
    plain dot product).

    Float determinism: the squared norm is summed over micro-unit
    BIGINTs (exact, ≤ ~6e12 for unit-scale dim-64 vectors), so sqrt
    and the per-component divisions all see identical doubles in both
    engines — bit-exact with NO rounding. Map-side only: no shuffle,
    no UDF; the transform/aggregate lambdas run as JVM codegen'd
    higher-order functions, linear at any corpus size.
    """
    e = tables.load(spark, sf_dir, "embeddings")
    micro = lambda x: F.round(x.cast("double") * F.lit(1_000_000)).cast(  # noqa: E731
        "long"
    )
    sumsq = F.aggregate(
        "embedding", F.lit(0).cast("long"), lambda acc, x: acc + micro(x) * micro(x)
    )
    withn = e.select(
        "vec_id",
        "embedding",
        (F.sqrt(sumsq.cast("double")) / F.lit(1_000_000)).alias("l2_norm"),
    )
    return withn.select(
        "vec_id",
        "l2_norm",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.col("l2_norm")
        ).alias("unit"),
    ).orderBy("vec_id")
