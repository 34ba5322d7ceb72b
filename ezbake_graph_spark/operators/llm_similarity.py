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
    """Cosine of two pre-normed vectors. ``try_divide`` (not ``/``):
    a zero-norm vector has no defined cosine, and under Spark 4's
    default ANSI mode a plain division would raise DIVIDE_BY_ZERO on
    the first all-zero embedding in a user table. NULL instead — NULL
    fails every threshold comparison and sorts last under the DESC
    rankings all call sites use, so undefined-similarity pairs drop
    out of top-k/threshold results without poisoning the query."""
    dot = F.aggregate(
        F.zip_with(v1, v2, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.try_divide(dot, n1 * n2)


_COSINE_TOPK_SQL = """
SELECT a.vec_id AS vid1, b.vec_id AS vid2,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cosine DESC, vid1, vid2
LIMIT 20
"""

# Target rows per grid block for the block-pair self-join. Replication
# factor = number of blocks B, so B is the knob trading shuffle volume
# (B x corpus) against per-task matmul size ((n/B)^2). Below ~4k rows
# the whole corpus is one block and the planner takes the shuffle-free
# narrow path (B == 1: a 4k x 4k x 64 matmul is ~25ms of BLAS —
# task-launch overhead, not compute, dominates); above it, B grows so
# one block (~n/B vectors) fits an executor's memory budget — the
# kernel itself never changes. This mirrors how Catalyst picks
# broadcast vs sort-merge: same logical operator, size-picked physical
# strategy.
_BLOCK_ROWS = 4096
_PAIR_SCHEMA = "vid1 long, vid2 long, cosine double"

# (applicationId, sf_dir) -> corpus row count, to avoid a count() job
# per query invocation (bench reruns the same query many times).
_N_CACHE: dict[tuple[str, str], int] = {}


def _n_vectors(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    n = _N_CACHE.get(key)
    if n is None:
        n = tables.load(spark, sf_dir, "embeddings").count()
        _N_CACHE[key] = n
    return n


def _grid_blocks(spark: SparkSession, sf_dir: str) -> int:
    n = _n_vectors(spark, sf_dir)
    cap = max(16, spark.sparkContext.defaultParallelism)
    return max(1, min(cap, -(-n // _BLOCK_ROWS)))


def _grid_pairs(emb: DataFrame, n_blocks: int) -> DataFrame:
    """Replicate each vector to its B grid pair-groups.

    Block id b = vec_id mod B; a vector in block b belongs to every
    unordered block pair {b, o}, o in [0, B). Pair key pk encodes
    (min, max) so the later groupBy co-locates exactly the two blocks
    each pair-task needs. Shuffle volume is B x corpus — linear, chosen,
    and independent of the quadratic pair space.
    """
    b = (F.col("vec_id") % n_blocks).cast("int")
    return (
        emb.select("vec_id", "embedding", b.alias("b"))
        .withColumn("o", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
        .select(
            "vec_id",
            "embedding",
            "b",
            (F.least("b", "o") * n_blocks + F.greatest("b", "o")).alias("pk"),
        )
    )


def _apply_pair_kernel(spark: SparkSession, sf_dir: str, per_group) -> DataFrame:
    """Fixture-bound wrapper over ``apply_pair_kernel`` — loads the
    embeddings table and size-picks the block count."""
    emb = tables.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return apply_pair_kernel(emb, per_group, _grid_blocks(spark, sf_dir))


def apply_pair_kernel(emb: DataFrame, per_group, n_blocks: int) -> DataFrame:
    """Run a pair-group kernel (``pdf -> pdf`` over ``_PAIR_SCHEMA``)
    across a vector corpus with a size-picked physical strategy:

    - ``n_blocks == 1`` (corpus fits one block): narrow ``coalesce(1)``
      + ``mapInPandas`` — ZERO shuffle; the one task sees every vector.
    - ``n_blocks > 1``: grid block-pair replication +
      ``groupBy(pk).applyInPandas`` — one linear B x corpus shuffle,
      B(B+1)/2 bounded pair-tasks.

    ``emb`` must have integer ``vec_id`` and ``array`` ``embedding``
    columns. This is the reusable parameterized entry (see
    ``ezbake_graph_spark.api``); the fixture queries call it through
    ``_apply_pair_kernel``.
    """
    import pandas as pd

    if n_blocks > 1:
        return _grid_pairs(emb, n_blocks).groupBy("pk").applyInPandas(
            per_group, _PAIR_SCHEMA
        )
    one = emb.select(
        "vec_id",
        "embedding",
        F.lit(0).cast("int").alias("b"),
        F.lit(0).cast("int").alias("pk"),
    )

    def run(batches):
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            yield per_group(pd.concat(pdfs, ignore_index=True))

    return one.coalesce(1).mapInPandas(run, _PAIR_SCHEMA)


def _pair_group_sims(pdf, n_blocks: int):
    """Dense cosine matrix for one grid pair-group (pandas side).

    Returns (vid1, vid2, sims) flat arrays with vid1 < vid2, each
    unordered pair appearing exactly once across ALL groups: a pair
    {x, y} lives only in the group of its block pair {x%B, y%B}, and
    within a group the diagonal-block upper-triangle mask (bi == bj)
    or the bipartite cross product (bi != bj) counts it once.
    """
    import numpy as np

    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    # a zero-norm vector has no defined cosine: norm 1.0 keeps the
    # division finite (its dot products are all 0), and the pair rows
    # touching it are dropped below — NaN here would otherwise poison
    # downstream top-k/threshold comparisons.
    zero = norms == 0.0
    norms = np.where(zero, 1.0, norms)
    blocks = pdf["b"].to_numpy()
    bi, bj = divmod(int(pdf["pk"].iat[0]), n_blocks)
    if bi == bj:
        q_ids = c_ids = ids
        q_zero = c_zero = zero
        sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
        qi, ci = np.nonzero(q_ids[:, None] < c_ids[None, :])
    else:
        qsel, csel = blocks == bi, blocks == bj
        if not qsel.any() or not csel.any():
            return None
        q_ids, c_ids = ids[qsel], ids[csel]
        q_zero, c_zero = zero[qsel], zero[csel]
        sims = np.round(
            (mat[qsel] @ mat[csel].T) / np.outer(norms[qsel], norms[csel]), 6
        )
        qi, ci = np.nonzero(np.ones_like(sims, dtype=bool))
    if len(qi) == 0:
        return None
    keep = ~(q_zero[qi] | c_zero[ci])
    qi, ci = qi[keep], ci[keep]
    if len(qi) == 0:
        return None
    v1 = np.minimum(q_ids[qi], c_ids[ci])
    v2 = np.maximum(q_ids[qi], c_ids[ci])
    return v1, v2, sims[qi, ci]


def _pair_group_topk(pdf, n_blocks: int, k: int):
    """Local top-k of one grid pair-group WITHOUT materializing the
    pair list: the dense cosine matrix is masked in place (-inf on the
    diagonal-block lower triangle so each unordered pair counts once),
    then a single O(cells) argpartition finds the k-th value and only
    the ~k surviving cells are decoded to (vid1, vid2). The previous
    kernel's ``np.nonzero`` over the full comparison grid built three
    |pairs|-sized index arrays (2M+ entries at 2k vectors) — ~0.15 s of
    pure allocation/gather that this path skips entirely.
    """
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    # normalize rows ONCE (n x dim) so the matmul emits cosines
    # directly — replaces an outer-product + elementwise divide over
    # the full n^2 cell grid. Zero-norm rows divide by 1 (all-zero row
    # -> cosine 0 against everything) and are masked to -inf below:
    # dividing by the true 0 norm would make NaN sims, and np.partition
    # sorts NaN LAST, so one zero vector would otherwise make kth = NaN
    # and silently empty the whole group's top-k.
    norms = np.sqrt((mat * mat).sum(axis=1))
    zero = norms == 0.0
    mat /= np.where(zero, 1.0, norms)[:, None]
    blocks = pdf["b"].to_numpy()
    bi, bj = divmod(int(pdf["pk"].iat[0]), n_blocks)
    if bi == bj:
        # id-sort the block so "q_id < c_id" IS the strict upper
        # triangle; masking is then n contiguous row-slice writes, not
        # an n^2 broadcast-compare bool matrix
        srt = np.argsort(ids, kind="stable")
        q_ids = c_ids = ids[srt]
        sims = mat[srt] @ mat[srt].T
        for i in range(sims.shape[0]):
            sims[i, : i + 1] = -np.inf
        zs = zero[srt]
        sims[zs, :] = -np.inf
        sims[:, zs] = -np.inf
        nz = int((~zero).sum())
        valid = nz * (nz - 1) // 2
    else:
        qsel, csel = blocks == bi, blocks == bj
        if not qsel.any() or not csel.any():
            return None
        q_ids, c_ids = ids[qsel], ids[csel]
        sims = mat[qsel] @ mat[csel].T
        sims[zero[qsel], :] = -np.inf
        sims[:, zero[csel]] = -np.inf
        valid = int((~zero[qsel]).sum()) * int((~zero[csel]).sum())
    kk = min(k, valid)
    if kk == 0:
        return None
    flat = sims.ravel()
    # Top-k on RAW cosines, with slack so the subsequent ROUNDED-order
    # cut (the oracle sorts round6 values) stays exact: any cell in
    # the true rounded top-k — including every boundary tie — has
    # raw >= raw_kth - (1e-6 + 2 ulp) (|round6(x) - x| <= 5e-7 plus
    # one ulp of x*1e6 per rounding at the half boundary), so the
    # candidate set is a provable superset and only ~k cells ever get
    # rounded/sorted. 1.01e-6 over-covers the ulp terms by ~40x.
    kth = np.partition(flat, flat.size - kk)[flat.size - kk]
    cand = np.flatnonzero(flat >= kth - 1.01e-6)
    qi, ci = np.unravel_index(cand, sims.shape)
    v1 = np.minimum(q_ids[qi], c_ids[ci])
    v2 = np.maximum(q_ids[qi], c_ids[ci])
    s = np.round(flat[cand], 6)
    order = np.lexsort((v2, v1, -s))[:kk]
    return pd.DataFrame({"vid1": v1[order], "vid2": v2[order], "cosine": s[order]})


@register("sim_cosine_topk", oracle=_COSINE_TOPK_SQL, tags=("K4", "bench"))
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 over all vector pairs (K4).

    Grid-partitioned block-pair self-join: vectors are hashed into B
    blocks, each of the B(B+1)/2 block *pairs* becomes one task that
    computes a dense vectorized matmul over its two blocks and keeps a
    local top-20 (a superset bound: the global top-20 pairs each live in
    exactly one block pair, and that task's local top-20 retains them —
    via ``_pair_group_topk``'s masked argpartition, never a
    materialized pair list). The global ``orderBy().limit(20)`` then
    merges ~20 rows per task (TakeOrderedAndProject — no full sort).

    This is the 100 TB shape: no driver-side matrix build, no broadcast
    of the corpus — shuffle volume is B x corpus (linear, chosen via
    ``_BLOCK_ROWS``), per-task memory is two blocks, and the same
    kernel drops behind LSH/IVF pruning (``sim_blocked`` / ``sim_ivf``)
    when even the grid is too coarse. When the corpus fits one block
    (B == 1) the planner takes a shuffle-free narrow path instead
    (``_apply_pair_kernel``).
    """
    import pandas as pd

    n_blocks = _grid_blocks(spark, sf_dir)

    def pair_topk(pdf):
        out = _pair_group_topk(pdf, n_blocks, 20)
        if out is None:
            return pd.DataFrame({"vid1": [], "vid2": [], "cosine": []}).astype(
                {"vid1": "int64", "vid2": "int64", "cosine": "float64"}
            )
        return out

    local = _apply_pair_kernel(spark, sf_dir, pair_topk)
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
        .filter(F.col("cosine").isNotNull())
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
    scored = pairs.select(
        "label", "vid1", "vid2", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine").isNotNull())
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


# nprobe picked off the measured recall curve on the fixture (64-d
# near-random vectors — the adversarial worst case for ANY coarse
# quantizer, where recall grows ~linearly with the probed fraction):
# nprobe 4→0.60, 5→0.68, 6→0.84, 7→0.88, 8→0.94, 10→1.0. 8 clears the
# ≥0.9 certification bar (tests/test_llm.py); real corpora with
# cluster structure reach the same recall at nprobe << cells — see
# SCALE.md §8.
_NPROBE = 8


def cell_centroids(vecs: DataFrame, cell_col: str) -> DataFrame:
    """Element-wise mean per cell, assembled back into (cell, cv, cn)
    centroid rows — the IVF coarse-quantizer table. ``vecs`` must carry
    (v, nrm, <cell_col>). One posexplode + keyed agg; the centroid
    table is tiny (one row per cell) so downstream joins broadcast it."""
    exploded = vecs.select(F.col(cell_col).alias("cell"), F.posexplode("v").alias("pos", "val"))
    cent = (
        exploded.groupBy("cell", "pos")
        .agg(F.avg("val").alias("c"))
        .groupBy("cell")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc")
        )
        .select(
            "cell",
            F.transform("pc", lambda s: s.getField("c")).alias("cv"),
        )
    )
    csq = F.aggregate(
        F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return cent.select("cell", "cv", F.sqrt(csq).alias("cn"))


def assign_nearest_cell(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Quantize each vector to its nearest centroid cell (broadcast
    centroid table, cosine metric, cell-id tie-break). Returns
    (vec_id, v, nrm, cell)."""
    vc = vecs.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "v",
        "nrm",
        "cell",
        _cosine(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn")).alias("sim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        vc.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "cell")
    )


def ivf_probe_topk(
    assigned: DataFrame,
    cent: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
) -> DataFrame:
    """Shared IVF probe kernel (used by ``sim_ivf`` and
    ``api.ivf_search``): each query probes its ``nprobe`` nearest
    centroid cells and scores only the corpus vectors assigned there.
    ``assigned``: (vec_id, v, nrm, cell); ``cent``: (cell, cv, cn);
    ``queries``: (query_id, qv, qn). Returns (query_id, neighbor_id,
    cosine, rank) with rank <= k; a corpus vector whose id equals the
    query id is excluded (self-match). At 100 TB ``cell`` is the
    partition key of the corpus table, so a probe touches nprobe
    partitions instead of the full corpus."""
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
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cell")
    )
    # search only vectors in probed cells. The probe table is bounded
    # by (query batch x nprobe) — always the broadcast side; with a
    # cell-partitioned persisted corpus this broadcast join is what
    # lets dynamic partition pruning drop the un-probed partitions
    # from the scan (asserted in tests/test_llm.py).
    cands = F.broadcast(probes).join(assigned, "cell").filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = _cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm"))
    scored = cands.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine").isNotNull())  # zero-norm vectors: no defined cosine
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def build_ivf_index(assigned: DataFrame, cent: DataFrame, index_path: str) -> None:
    """Persist an IVF index: the assigned corpus written CELL-PARTITIONED
    (``partitionBy("cell")`` — the physical layout the 100 TB story in
    SCALE.md §8 calls for) plus the tiny centroid sidecar. A later
    probe reads only the partitions its nprobe cells name; the Lloyd
    build never re-runs.

    ``assigned``: (vec_id, v, nrm, cell); ``cent``: (cell, cv, cn).
    The cell id is cast to string on BOTH tables before writing so the
    partition-directory round trip is type-exact (Spark's partition
    type inference would otherwise re-read numeric cell dirs as int
    while the sidecar kept long, and the resulting cast on the join
    key can defeat dynamic partition pruning)."""
    assigned.withColumn("cell", F.col("cell").cast("string")).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(index_path + "/corpus")
    cent.withColumn("cell", F.col("cell").cast("string")).write.mode(
        "overwrite"
    ).parquet(index_path + "/centroids")


def append_ivf_index(new_vecs: DataFrame, index_path: str) -> None:
    """Incremental IVF maintenance (VERDICT r7 #3): encode NEW vectors
    with the index's FROZEN centroids and append them to the existing
    cell partitions — zero Lloyd jobs, zero rewrite of resident data.
    This is the daily-ingest path a growing corpus actually runs: the
    coarse quantizer is fixed at build time (re-training it would
    silently re-cell the resident corpus and invalidate every cached
    probe), so an append is one broadcast-argmin assignment pass over
    just the new rows plus a ``mode("append")`` cell-partitioned write
    that creates files only under the cells the new vectors land in.
    Search over the appended index is IDENTICAL to batch-encoding the
    union corpus with the same frozen centroid table (equivalence and
    zero-Lloyd both pinned in tests/test_llm.py). Re-train only on
    drift (dq_drift_psi is the monitor), which is a rebuild by design.

    ``new_vecs``: (vec_id, v, nrm) — caller guarantees ids disjoint
    from the resident corpus (dedup upstream; the index does not
    upsert)."""
    spark = new_vecs.sparkSession
    cent = spark.read.parquet(index_path + "/centroids").withColumn(
        "cell", F.col("cell").cast("string")
    )
    assigned = assign_nearest_cell(new_vecs.select("vec_id", "v", "nrm"), cent)
    assigned.withColumn("cell", F.col("cell").cast("string")).write.mode(
        "append"
    ).partitionBy("cell").parquet(index_path + "/corpus")


def load_ivf_index(spark: SparkSession, index_path: str):
    """Load a persisted IVF index -> (assigned, cent). The corpus scan
    keeps its partition columns; probing joins on ``cell`` then prune
    to nprobe partitions via dynamic partition pruning (plan-asserted
    in tests). Partition type inference is disabled via an explicit
    read schema derived from the data files + a string cell column."""
    cent = spark.read.parquet(index_path + "/centroids").withColumn(
        "cell", F.col("cell").cast("string")
    )
    corpus = spark.read.option("mergeSchema", "false").parquet(
        index_path + "/corpus"
    )
    return corpus.withColumn("cell", F.col("cell").cast("string")), cent


@register("sim_ivf_persisted", oracle=None, tags=("K-extra", "rows-only"))
def sim_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sim_ivf`` through a PERSISTED cell-partitioned index: build
    once to ``/tmp`` (keyed by the sf dir name), probe by reading the
    index back — reuse runs ZERO build jobs and scans only the probed
    cell partitions (dynamic partition pruning; asserted in
    tests/test_llm.py). Same output contract as ``sim_ivf``; rows-only
    by design like its twin (same §2 rule: ANN cell ranking is not
    SQL-expressible), recall pinned by the shared probe kernel tests."""
    import os

    index_path = f"/tmp/ezgs_ivf_index_{os.path.basename(sf_dir.rstrip('/'))}"
    if not os.path.exists(index_path + "/corpus/_SUCCESS"):
        vecs = _vectors(spark, sf_dir).cache()
        cent = cell_centroids(vecs, "label").cache()
        build_ivf_index(assign_nearest_cell(vecs, cent), cent, index_path)
    assigned, cent = load_ivf_index(spark, index_path)
    # queries come from the ORIGINAL table, not the index — a filter on
    # vec_id is not a partition predicate, so deriving the query batch
    # from the index scan would read every cell partition just to find
    # 10 rows and defeat the pruning the index exists for
    queries = _vectors(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    return ivf_probe_topk(assigned, cent, queries, k=5, nprobe=_NPROBE)


@register("sim_ivf_append", oracle=None, tags=("K-extra", "rows-only"))
def sim_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-ingest IVF path: build the index over the FIRST
    80% of the corpus (vec_id < 400), then APPEND the remaining 20%
    encoded with the frozen base centroids (``append_ivf_index``), then
    probe — the answer covers the FULL corpus though the quantizer
    never saw the appended slice at training time. Idempotent across
    invocations via an ``appended`` marker written LAST (the ADVICE r7
    ordering lesson: gate reuse on the final artifact, so a crash
    mid-sequence retriggers the build instead of serving a half-built
    index); the reuse path runs zero Lloyd AND zero assignment jobs.
    Rows-only like its IVF siblings (ANN cell ranking is not
    SQL-expressible); append-vs-batch equivalence and the zero-Lloyd
    poison check are pinned in tests/test_llm.py."""
    import os

    index_path = f"/tmp/ezgs_ivf_app_{os.path.basename(sf_dir.rstrip('/'))}"
    if not os.path.exists(index_path + "/appended/_SUCCESS"):
        vecs = _vectors(spark, sf_dir).cache()
        base = vecs.filter(F.col("vec_id") < 400)
        cent = cell_centroids(base, "label").cache()
        build_ivf_index(assign_nearest_cell(base, cent), cent, index_path)
        append_ivf_index(vecs.filter(F.col("vec_id") >= 400), index_path)
        spark.createDataFrame([(1,)], "ok int").write.mode("overwrite").parquet(
            index_path + "/appended"
        )
    assigned, cent = load_ivf_index(spark, index_path)
    queries = _vectors(spark, sf_dir).filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    return ivf_probe_topk(assigned, cent, queries, k=5, nprobe=_NPROBE)


@register("sim_ivf", oracle=None, tags=("K-extra", "rows-only", "bench2"))
def sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (scale path for K4/K5): coarse-quantize every
    vector to its nearest label-centroid cell, then answer queries
    0..9 by probing only the nearest ``_NPROBE`` of 10 cells. Recall vs
    exact kNN is checked in tests (>= 0.9). Kernel shared with
    ``api.ivf_search``."""
    vecs = _vectors(spark, sf_dir).cache()
    cent = cell_centroids(vecs, "label").cache()
    assigned = assign_nearest_cell(vecs, cent)
    queries = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    return ivf_probe_topk(assigned, cent, queries, k=5, nprobe=_NPROBE)


_QUANT_SQL = """
SELECT vec_id,
       array_to_string(list_transform(embedding,
         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5) AS INTEGER)
                   AS VARCHAR)), '|') AS q,
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
    halves (Spark BigDecimal vs DuckDB binary; SURVEY §5.3).

    Output contract: the quantized vector is emitted as a '|'-joined
    string (agg_collect convention, SURVEY §5.3) — the driver's pandas
    canonicalizer cannot sort/hash raw array cells (CORRECTNESS_r03
    fail); exact int components survive stringification losslessly."""
    e = tables.load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 127 + F.lit(0.5)).cast("int"),
    )
    return e.select(
        "vec_id",
        F.array_join(F.transform(q, lambda x: x.cast("string")), "|").alias("q"),
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
       array_to_string(list_transform(embedding,
         x -> CAST(CAST(floor(CAST(x AS DOUBLE) / l2_norm * 1000000 + 0.5)
                        AS BIGINT) AS VARCHAR)), '|') AS unit_q6
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

    Output contract: the unit vector is emitted as '|'-joined
    micro-int components (floor(x*1e6 + 0.5) — half-up via floor,
    bit-identical in both engines on the identical doubles above;
    agg_collect convention) because the driver's pandas canonicalizer
    cannot sort/hash raw array cells (CORRECTNESS_r03 fail).
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
    # try_divide: a zero vector has no unit direction — NULL components
    # (array_join drops them → empty unit_q6) instead of an ANSI
    # DIVIDE_BY_ZERO on the first all-zero embedding. Fixture vectors
    # are never zero, so the oracle needs no twin guard.
    return withn.select(
        "vec_id",
        "l2_norm",
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.floor(
                    F.try_divide(x.cast("double"), F.col("l2_norm"))
                    * F.lit(1_000_000)
                    + F.lit(0.5)
                )
                .cast("long")
                .cast("string"),
            ),
            "|",
        ).alias("unit_q6"),
    ).orderBy("vec_id")


_RP_BITS = 16
_RP_DIM = 64

_RP_SKETCH_SQL = f"""
WITH w AS (
  SELECT b, j,
         ('0x' || substr(md5(b || '-' || j), 1, 4))::BIGINT - 32768 AS wt
  FROM (SELECT unnest(range({_RP_BITS})) AS b),
       (SELECT unnest(range({_RP_DIM})) AS j)
), e AS (
  SELECT vec_id, j,
         CAST(round(CAST(embedding[j + 1] AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM embeddings, (SELECT unnest(range({_RP_DIM})) AS j)
), dots AS (
  SELECT vec_id, b, sum(wt * x) AS dot
  FROM e JOIN w USING (j)
  GROUP BY vec_id, b
)
SELECT vec_id,
       CAST(sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS sig
FROM dots
GROUP BY vec_id
ORDER BY vec_id
"""


def _rp_weights() -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: wt(b, j) = first 16
    bits of md5(f"{b}-{j}") - 2^15 — the same integers the oracle
    derives in SQL, so no RNG state crosses the engine boundary."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{b}-{j}".encode()).hexdigest()[:4], 16) - 32768
            for j in range(_RP_DIM)
        ]
        for b in range(_RP_BITS)
    ]


@register("sim_rp_sketch", oracle=_RP_SKETCH_SQL, tags=("ext", "M90"))
def sim_rp_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) sketch: each vector is
    compressed to a 16-bit signature whose b-th bit is the sign of a
    dot product with a fixed pseudo-random hyperplane. Collision
    probability per bit is 1 - theta/pi (Goemans-Williamson / Charikar
    LSH), so equal or near-equal signatures are the candidate filter
    for cosine similarity search: 2 BYTES per vector stand in for 256
    bytes of floats — at 100 TB the sketch table fits in memory and
    candidate generation is a groupBy(sig) bucket join (multi-probe:
    also probe signatures at hamming distance 1), with the exact
    kernel (sim_cosine_topk's matmul) re-scoring only candidates.

    This is the sketch-build stage, value-hash-oracled end to end:
    hyperplane weights are integers derived from md5 (identical in
    both engines — no RNG), embeddings enter as exact micro-units, so
    every dot product is exact integer arithmetic and the sign can
    never flip between engines. The plan is pure map-side JVM
    (zip_with + aggregate lambdas fused into codegen, no Python, no
    explode, no shuffle until the final orderBy).

    The 16 x 64 weight matrix rides in as DATA — one broadcast row
    cross-joined onto the scan — not as 1024 literals: the literal
    form compiled a ~3 s whole-stage-codegen unit PER EXECUTION
    (measured at sf0.01; the dominant cost of the query), while the
    nested-lambda form over an array column compiles in tens of ms
    and runs the identical integer arithmetic."""
    emb = tables.load(spark, sf_dir, "embeddings")
    wdf = spark.createDataFrame([(_rp_weights(),)], "w: array<array<bigint>>")
    micro = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * SCALE).cast("long")
    )
    df = emb.withColumn("m", micro).crossJoin(F.broadcast(wdf))

    def dot(b):
        return F.aggregate(
            F.zip_with("m", F.element_at("w", (b + 1).cast("int")), lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    sig = F.aggregate(
        F.sequence(F.lit(0), F.lit(_RP_BITS - 1)),
        F.lit(0).cast("long"),
        # 2^b via pow (exact in double for b <= 15); shiftleft needs a
        # literal bit count and can't take the lambda variable
        lambda acc, b: acc
        + F.when(
            dot(b) >= 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    return df.select("vec_id", sig.alias("sig")).orderBy("vec_id")


# --- RP-sketch SEARCH: the candidate-generation + rerank path the sketch
# promises. Runs over hashing-TF document vectors, NOT the embeddings
# fixture: LSH is a near-duplicate tool, and the embeddings fixture has
# no near-dup structure (its global top pair is cos 0.51, where a 16-bit
# sketch cannot separate signal from noise), while `documents` carries
# planted near-dups whose TF-cosines sit at 0.99+ against a 0.7
# background. Corpus-CENTERING (y = N*x - Σx, exact integers) moves that
# background to ~0 so the per-bit collision probability 1 - θ/π does the
# separating: measured on the fixtures, hamming ≤ 2 keeps 2.6-3.0% of
# all pairs as candidates at recall 1.0 (sf0.001) / 0.9 (sf0.01) of the
# exact top-20.

_RP_SEARCH_RADIUS = 2
_RP_SEARCH_K = 20
_RP_TF_BUCKETS = 64

_RP_SEARCH_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id,
         ('0x' || substr(md5(term), 1, 4))::BIGINT % {_RP_TF_BUCKETS} AS bucket,
         CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, bucket
), dense AS (
  SELECT d.doc_id, r.j, COALESCE(tf.tf, 0) AS x
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range({_RP_TF_BUCKETS})) AS j) r
  LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.bucket = r.j
), tot AS (
  SELECT j, CAST(sum(x) AS BIGINT) AS sx FROM dense GROUP BY j
), n AS (
  SELECT count(DISTINCT doc_id) AS nd FROM documents
), w AS (
  SELECT b, j,
         ('0x' || substr(md5(b || '-' || j), 1, 4))::BIGINT - 32768 AS wt
  FROM (SELECT unnest(range({_RP_BITS})) AS b),
       (SELECT unnest(range({_RP_TF_BUCKETS})) AS j)
), dots AS (
  SELECT doc_id, b,
         sum(wt * ((SELECT nd FROM n) * x - sx)) AS dot
  FROM dense JOIN tot USING (j) JOIN w USING (j)
  GROUP BY doc_id, b
), sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN dot >= 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS sig
  FROM dots GROUP BY doc_id
), vec AS (
  SELECT doc_id, list(CAST(x AS DOUBLE) ORDER BY j) AS v FROM dense GROUP BY doc_id
), cand AS (
  SELECT a.doc_id AS did1, b.doc_id AS did2
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= {_RP_SEARCH_RADIUS}
)
SELECT c.did1, c.did2,
       round(list_cosine_similarity(q.v, t.v), 6) AS cosine
FROM cand c JOIN vec q ON q.doc_id = c.did1 JOIN vec t ON t.doc_id = c.did2
ORDER BY cosine DESC, did1, did2
LIMIT {_RP_SEARCH_K}
"""


def _rp_probe_masks(radius: int) -> list[int]:
    """All XOR masks within hamming ``radius`` of 0 over _RP_BITS bits
    (radius 2 -> 1 + 16 + 120 = 137 masks)."""
    return [m for m in range(1 << _RP_BITS) if bin(m).count("1") <= radius]


def _tf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-TF document vectors as dense BIGINT arrays: token ->
    md5-prefix bucket (same bucketing as ``text_hashing_tf``), per-doc
    counts densified to a fixed _RP_TF_BUCKETS-wide array. One explode
    + one keyed agg; map-side combinable; state bounded by docs x 64."""
    d = tables.load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long")
        % _RP_TF_BUCKETS
    ).alias("bucket")
    sparse = tok.groupBy("doc_id", bucket).agg(F.count(F.lit(1)).alias("tf"))
    m = F.map_from_entries(F.collect_list(F.struct("bucket", "tf")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(_RP_TF_BUCKETS - 1)),
        lambda j: F.coalesce(
            F.element_at(F.col("m"), j.cast("long")), F.lit(0).cast("long")
        ),
    )
    return (
        sparse.groupBy("doc_id")
        .agg(m.alias("m"))
        .select("doc_id", dense.alias("x"))
    )


@register("sim_rp_search", oracle=_RP_SEARCH_SQL, tags=("ext", "M90b"))
def sim_rp_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-LSH near-duplicate SEARCH over the RP sketch: the
    registered completion of ``sim_rp_sketch``'s promised pipeline —
    bucket-join candidate generation on the 16-bit signature with
    multi-probe hamming ≤ 2, exact cosine rerank of CANDIDATES ONLY,
    global top-20. Every stage is integer-exact or round6-gridded, so
    unlike IVF/PQ this ANN path carries a FULL value-hash oracle: the
    DuckDB twin derives the identical signatures (md5 integer
    hyperplanes, exact centered dots) and takes candidates via
    bit_count(xor) ≤ 2 over pairs — the same SET the probe join emits.

    Input vectors are hashing-TF counts of `documents` (the corpus
    with planted near-dups), corpus-centered WITHOUT leaving integer
    arithmetic: y_j = N·x_j − Σx_j flips no dot-product sign vs true
    mean-centering (positive scaling by N) and keeps the sketch exact
    cross-engine. Magnitude bound: |wt·y| ≤ 2^15·N·max_tf·64 per dot —
    overflows BIGINT only past N·max_tf ≈ 4e12; shrink the weight
    scale or center per-partition-sample beyond that.

    100 TB shape: TF build + sketch are one explode + keyed aggs (the
    1-row totals/weights ride in as broadcasts); candidate generation
    explodes each signature row (2-col, ~10 B) into 137 probe keys and
    hash-joins probe = sig — shuffle is 137× a 2-column table, NOT the
    pair space; each qualifying pair is emitted exactly once (the mask
    that matches is uniquely sig_a XOR sig_b). Rerank joins the dense
    vectors back by doc id (two keyed joins, candidates-only) and the
    closing orderBy().limit() is a TakeOrderedAndProject merge of ~k
    rows per task. Measured on the fixtures: 2.6-3.0% of pairs survive
    to rerank at recall 1.0 (sf0.001) / 0.9 (sf0.01) vs exact top-20
    (pinned in tests/test_llm.py)."""
    tfv = _tf_vectors(spark, sf_dir)

    # corpus totals (1 row) + hyperplane weights (1 row) as broadcasts
    tots = tfv.agg(
        F.count(F.lit(1)).alias("nd"),
        F.array(
            *[
                F.sum(F.element_at("x", j + 1)).alias(f"s{j}")
                for j in range(_RP_TF_BUCKETS)
            ]
        ).alias("sx"),
    )
    wdf = spark.createDataFrame([(_rp_weights(),)], "w: array<array<bigint>>")
    df = tfv.crossJoin(F.broadcast(tots)).crossJoin(F.broadcast(wdf))
    centered = F.zip_with(
        "x", "sx", lambda xv, sv: F.col("nd") * xv - sv
    ).alias("y")
    df = df.select("doc_id", "x", centered, "w")

    def dot(b):
        return F.aggregate(
            F.zip_with("y", F.element_at("w", (b + 1).cast("int")), lambda y, w: y * w),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    sig = F.aggregate(
        F.sequence(F.lit(0), F.lit(_RP_BITS - 1)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            dot(b) >= 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    sigs = df.select("doc_id", sig.alias("sig"))

    masks = F.array(*[F.lit(m) for m in _rp_probe_masks(_RP_SEARCH_RADIUS)])
    probes = sigs.select(
        F.col("doc_id").alias("did1"),
        F.explode(masks).alias("mask"),
        F.col("sig").alias("sig1"),
    ).select("did1", F.col("sig1").bitwiseXOR(F.col("mask")).alias("probe"))
    cand = probes.join(
        sigs.select(F.col("doc_id").alias("did2"), F.col("sig").alias("sig2")),
        (F.col("probe") == F.col("sig2")) & (F.col("did1") < F.col("did2")),
    ).select("did1", "did2")

    dv = F.transform("x", lambda v: v.cast("double"))
    vec = tfv.select("doc_id", dv.alias("v"))
    sq = F.aggregate(
        F.transform("v", lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v
    )
    vec = vec.select("doc_id", "v", F.sqrt(sq).alias("nrm"))
    q = vec.select(
        F.col("doc_id").alias("did1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    t = vec.select(
        F.col("doc_id").alias("did2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    cos = _cosine(F.col("v1"), F.col("n1"), F.col("v2"), F.col("n2"))
    return (
        cand.join(q, "did1")
        .join(t, "did2")
        .select("did1", "did2", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), "did1", "did2")
        .limit(_RP_SEARCH_K)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compression ANN path. IVF
# shrinks the SEARCH (probe nprobe cells); PQ shrinks the STORAGE: a
# dim-64 float vector (256 B) becomes _PQ_M 1-byte codes (8 B), so a
# 100 TB embedding corpus fits executor memory as a ~3 TB code table
# and the scan side of ANN stops being I/O-bound. Public technique:
# Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
# Search", IEEE TPAMI 2011.
# ---------------------------------------------------------------------------

_PQ_M = 16  # subspaces (dim 64 -> 4 dims each)
_PQ_K = 64  # codes per subspace (scale K with the training sample)
_PQ_ITERS = 4
_PQ_SHORTLIST = 20  # ADC shortlist size before exact re-rank


def _pq_subvectors(vecs: DataFrame, dim: int, m_sub: int) -> DataFrame:
    """(vec_id, v) -> (vec_id, m, sv): split each vector into m_sub
    contiguous subvectors. Map-side only (transform + explode)."""
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sublen = dim // m_sub
    return vecs.select(
        "vec_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m_sub - 1)),
                lambda m: F.struct(
                    m.alias("m"), F.slice("v", m * sublen + 1, sublen).alias("sv")
                ),
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))


def _pq_centroids(assigned_sv: DataFrame) -> DataFrame:
    """Per-(subspace, code) mean centroid over (vec_id, m, sv, code)
    rows — ALL subspaces trained in one keyed aggregation. Centroids
    are snapped to the 1e-6 grid so the broadcast table is stable
    against float-sum aggregation-order drift (same micro-unit rule as
    determinism.py). Returns (m, code, cv, cn2)."""
    cent = (
        assigned_sv.select("m", "code", F.posexplode("sv").alias("pos", "val"))
        .groupBy("m", "code", "pos")
        .agg((F.round(F.avg("val") * 1e6) / 1e6).alias("c"))
        .groupBy("m", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            "m", "code", F.transform("pc", lambda s: s.getField("c")).alias("cv")
        )
    )
    cn2 = F.aggregate(F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    return cent.select("m", "code", "cv", cn2.alias("cn2"))


def _pq_assign(sv_tbl: DataFrame, cent: DataFrame) -> DataFrame:
    """Assign every subvector to its nearest (L2) centroid in its own
    subspace. Broadcast the m_sub*k_codes centroid table; the argmin
    is ``min(struct(d2, code))`` — an ordinary aggregate that
    partial-combines map-side over the k_codes candidate rows (same
    agg-only posture as the Pregel labelprop winners: a row_number
    window here would SORT the n*m_sub*k_codes candidate table every
    Lloyd iteration). The struct min is lexicographic, so the tie-break
    is (smallest d2, then smallest code) — deterministic. ``sv`` rides
    back in via one keyed join against the cached subvector table."""
    dist = F.aggregate(
        F.zip_with("sv", "cv", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    best = (
        sv_tbl.join(F.broadcast(cent), "m")
        .select("vec_id", "m", dist.alias("d2"), "code")
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "code")).alias("w"))
        .select("vec_id", "m", F.col("w").getField("code").alias("code"))
    )
    return sv_tbl.join(best, ["vec_id", "m"]).select("vec_id", "m", "sv", "code")


def pq_train_encode(
    vecs: DataFrame,
    dim: int,
    m_sub: int = _PQ_M,
    k_codes: int = _PQ_K,
    iters: int = _PQ_ITERS,
):
    """Train per-subspace codebooks (Lloyd, hash-seeded init — no RNG,
    reruns are reproducible) and encode the corpus.

    Returns (codes, codebook): codes = (vec_id, codes array<int>,
    recon_n double) where recon_n is the reconstructed-vector norm
    (sqrt of the sum of chosen-centroid squared norms — subspaces are
    orthogonal by construction); codebook = (m, code, cv, cn2).

    Scale shape: training runs ALL m_sub Lloyd problems in one
    DataFrame loop — per iteration one keyed partial agg (m, code,
    pos) plus one broadcast-join argmin; nothing shuffles the corpus
    itself. At 100 TB you train on a sample (codebooks converge on
    ~1e5 rows) and ENCODE the full corpus with one final broadcast
    argmin pass — encode is embarrassingly map-side."""
    sv_tbl = vecs.select("vec_id", "v")
    sv_tbl = _pq_subvectors(sv_tbl, dim, m_sub).cache()
    assigned = sv_tbl.withColumn(
        "code", F.pmod(F.xxhash64("vec_id", "m"), F.lit(k_codes)).cast("int")
    )
    for _ in range(iters):
        cent = _pq_centroids(assigned)
        assigned = _pq_assign(sv_tbl, cent)
    codebook = _pq_centroids(assigned).cache()
    # Encode via pq_encode against the RETURNED codebook (ADVICE r7):
    # encoding the loop's last `assigned` directly would emit codes
    # that are nearest-neighbors under the PREVIOUS iteration's
    # centroids, so the ADC LUT and recon_n would use centroids the
    # codes were never assigned against.
    return pq_encode(vecs, codebook, dim, m_sub), codebook


def pq_encode(
    vecs: DataFrame, codebook: DataFrame, dim: int, m_sub: int = _PQ_M
) -> DataFrame:
    """Encode (vec_id, v) rows with a FROZEN codebook — the zero-Lloyd
    path shared by ``pq_train_encode``'s tail, the 100 TB full-corpus
    encode after sample training, and incremental index appends
    (``append_pq_index``). One map-side subvector explode + one
    broadcast-argmin assignment + one vec_id-keyed agg; nothing
    shuffles the vectors themselves twice. Returns (vec_id, codes
    array<int>, recon_n)."""
    sv_tbl = _pq_subvectors(vecs.select("vec_id", "v"), dim, m_sub)
    assigned = _pq_assign(sv_tbl, codebook)
    return (
        assigned.join(F.broadcast(codebook.select("m", "code", "cn2")), ["m", "code"])
        .groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("m", "code"))).alias("mc"),
            F.sqrt(F.sum("cn2")).alias("recon_n"),
        )
        .select(
            "vec_id",
            F.transform("mc", lambda s: s.getField("code")).alias("codes"),
            "recon_n",
        )
    )


def append_pq_index(new_vecs: DataFrame, index_path: str, dim: int) -> None:
    """Incremental PQ maintenance (VERDICT r7 #3): encode NEW vectors
    with the persisted index's FROZEN codebook (``pq_encode`` — zero
    Lloyd jobs) and append their 16-byte codes to the code table. The
    codebook is fixed at build time for the same reason as the IVF
    centroids: re-training would re-code the resident corpus. Appended
    codes are byte-identical to what a batch encode of the union with
    the same codebook emits (pinned in tests). ``new_vecs``: (vec_id,
    v) with ids disjoint from the resident codes."""
    spark = new_vecs.sparkSession
    codebook = spark.read.parquet(index_path + "/codebook")
    pq_encode(new_vecs, codebook, dim).write.mode("append").parquet(
        index_path + "/codes"
    )


def _pq_lut(
    queries: DataFrame, codebook: DataFrame, dim: int, m_sub: int, k_codes: int
) -> DataFrame:
    """Per-query ADC lookup table: (query_id, lut array<array<double>>)
    with lut[m][code] = dot(query subvector m, codebook centroid).
    Built as a tiny DataFrame aggregation (n_queries x m_sub x k_codes
    rows) against the broadcast codebook."""
    qsv = _pq_subvectors(
        queries.select(F.col("query_id").alias("vec_id"), F.col("qv").alias("v")),
        dim,
        m_sub,
    ).withColumnRenamed("vec_id", "query_id")
    part = F.aggregate(
        F.zip_with("sv", "cv", lambda x, c: x * c), F.lit(0.0), lambda a, x: a + x
    )
    return (
        qsv.join(F.broadcast(codebook), "m")
        .select("query_id", "m", "code", part.alias("p"))
        .groupBy("query_id", "m")
        .agg(F.map_from_entries(F.collect_list(F.struct("code", "p"))).alias("cp"))
        # densify to exactly k_codes slots: Lloyd can leave a code
        # EMPTY (no members), which would shift positional indexing;
        # absent codes never appear in any `codes` array, so their
        # slot value is arbitrary (0.0)
        .select(
            "query_id",
            "m",
            F.transform(
                F.sequence(F.lit(0), F.lit(k_codes - 1)),
                lambda c: F.coalesce(
                    F.try_element_at("cp", c.cast("int")), F.lit(0.0)
                ),
            ).alias("row"),
        )
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("m", "row"))).alias("mr"))
        .select(
            "query_id", F.transform("mr", lambda s: s.getField("row")).alias("lut")
        )
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int,
    m_sub: int = _PQ_M,
    k_codes: int = _PQ_K,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays exact, the
    corpus is its PQ codes. Per query build the (m_sub x k_codes)
    dot-product lookup table as a TINY DataFrame aggregation, broadcast
    it, then score = one zip_with over the code array per corpus row —
    the corpus is scanned exactly once, map-side, no shuffle except
    the final per-query top-k window. Approximate cosine =
    LUT-summed dot / (query_norm * reconstructed_norm).

    ``queries``: (query_id, qv, qn). Output matches sim_knn's contract:
    (query_id, neighbor_id, cosine, rank), self-matches excluded."""
    lut = _pq_lut(queries, codebook, dim, m_sub, k_codes)
    q_side = queries.select("query_id", "qn").join(lut, "query_id")
    approx_dot = F.aggregate(
        F.zip_with(
            "codes", "lut", lambda c, row: F.element_at(row, c.cast("int") + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        codes.crossJoin(F.broadcast(q_side))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.try_divide(approx_dot, F.col("qn") * F.col("recon_n")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _exact_rerank(
    cand: DataFrame, vecs: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Shared tail of every shortlist ANN path (PQ, persisted PQ,
    IVFADC): exact cosine over just the (query_id, neighbor_id)
    candidates — one keyed join on vec_id against the full vectors,
    one broadcast of the query batch — then the per-query top-k.
    Output: (query_id, neighbor_id, cosine, rank), sim_knn contract."""
    exact = cand.select("query_id", "neighbor_id").join(
        vecs.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm"), "neighbor_id"
    ).join(F.broadcast(queries), "query_id")
    scored = exact.select(
        "query_id",
        "neighbor_id",
        F.round(_cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm")), 6).alias(
            "cosine"
        ),
    ).filter(F.col("cosine").isNotNull())
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pq_search(
    vecs: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int,
    m_sub: int = _PQ_M,
    k_codes: int = _PQ_K,
    shortlist: int = _PQ_SHORTLIST,
) -> DataFrame:
    """The full PQ retrieval pattern: ADC scan over the compressed
    codes produces a ``shortlist``-sized candidate set per query, then
    the EXACT cosine re-ranks just those candidates — so the full
    vectors are touched only for shortlist*n_queries rows (a keyed
    join on vec_id), never for the whole corpus. Measured on the
    fixture: shortlist-20 contains 96% of the exact top-5."""
    codes, codebook = pq_train_encode(vecs, dim, m_sub, k_codes)
    cand = pq_adc_topk(
        codes, codebook, queries, dim, k=shortlist, m_sub=m_sub, k_codes=k_codes
    )
    return _exact_rerank(cand, vecs, queries, k)


@register("sim_pq_adc", oracle=None, tags=("K-extra", "rows-only"))
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: train 16x64 codebooks, encode the corpus
    16x smaller (64 floats -> 16 byte-codes), answer queries 0..9 by
    ADC LUT scan + exact re-rank of the top-20 shortlist. Rows-only by
    the same §2 rule as sim_ivf (quantized ranking is not
    SQL-expressible); recall vs exact kNN is pinned in
    tests/test_llm.py."""
    vecs = _vectors(spark, sf_dir).cache()
    queries = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    return pq_search(vecs, queries, dim=64, k=5)


def ivfpq_search(
    vecs: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int,
    nprobe: int = _NPROBE,
    m_sub: int = _PQ_M,
    k_codes: int = _PQ_K,
    shortlist: int = _PQ_SHORTLIST,
    cell_col: str = "label",
) -> DataFrame:
    """IVF x PQ — the standard IVFADC layout (SCALE.md §8): the IVF
    coarse quantizer prunes WHICH cells a query reads, the PQ codes
    shrink WHAT each cell holds, and the exact kernel re-ranks only
    the shortlist. At 100 TB the corpus table is partitioned by cell
    and each partition stores 16-byte codes: a query touches
    nprobe/n_cells of the partitions and scans them at code (not
    vector) width — the two pruning axes compose multiplicatively.

    Pipeline (every stage keyed or broadcast):
    1. coarse-assign the corpus to centroid cells (broadcast argmin),
    2. PQ-encode the full vectors once (one shared codebook — raw
       vectors, not residuals; the exact re-rank step absorbs the
       extra quantization error the residual trick would remove),
    3. per query pick the ``nprobe`` nearest cells (broadcast centroid
       table), build ONE ADC LUT (cell-independent because codes
       encode raw vectors),
    4. score codes ONLY in probed cells: the probe table is the
       broadcast side of a join keyed on ``cell`` — with a persisted
       cell-partitioned code table this is the same dynamic-partition-
       pruning shape as ``sim_ivf_persisted``,
    5. exact cosine re-rank of the per-query shortlist (keyed join on
       vec_id against the full vectors).

    ``vecs``: (vec_id, v, nrm, <cell_col>); ``queries``: (query_id,
    qv, qn). Output: (query_id, neighbor_id, cosine, rank) like
    sim_knn, self-matches excluded."""
    cent = cell_centroids(vecs, cell_col).cache()
    assigned = assign_nearest_cell(vecs, cent)
    codes, codebook = pq_train_encode(vecs.select("vec_id", "v"), dim, m_sub, k_codes)
    codes = codes.join(assigned.select("vec_id", "cell"), "vec_id")

    qc = queries.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "cell",
        _cosine(F.col("qv"), F.col("qn"), F.col("cv"), F.col("cn")).alias("sim"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cell")
    )
    lut = _pq_lut(queries, codebook, dim, m_sub, k_codes)
    q_side = (
        probes.join(lut, "query_id")
        .join(queries.select("query_id", "qn"), "query_id")
    )
    approx_dot = F.aggregate(
        F.zip_with(
            "codes", "lut", lambda c, row: F.element_at(row, c.cast("int") + 1)
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cand = (
        codes.join(F.broadcast(q_side), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.try_divide(approx_dot, F.col("qn") * F.col("recon_n")), 6
            ).alias("adc"),
        )
        .filter(F.col("adc").isNotNull())
    )
    w_short = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), "neighbor_id")
    short = (
        cand.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(short, vecs, queries, k)


@register("sim_ivfpq", oracle=None, tags=("K-extra", "rows-only"))
def sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC over the embeddings fixture: label-centroid coarse cells,
    nprobe=8, 16x64 PQ codes, top-20 ADC shortlist, exact re-rank to
    k=5 for queries 0..9. Rows-only like its parents (sim_ivf /
    sim_pq_adc); recall vs exact kNN pinned in tests/test_llm.py."""
    vecs = _vectors(spark, sf_dir).select("vec_id", "label", "v", "nrm").cache()
    queries = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    return ivfpq_search(vecs, queries, dim=64, k=5)


def build_pq_index(codes: DataFrame, codebook: DataFrame, index_path: str) -> None:
    """Persist a PQ index: the 16-byte code table plus the tiny
    codebook sidecar. Unlike the IVF index there is no partition key —
    the ADC scan reads ALL codes by design (that is what the 16x
    compression buys: a full-corpus scan at code width) — so the win
    of persistence is skipping the Lloyd training, and at 100 TB the
    code table is the thing small enough to keep cached or even
    replicated. Compose with IVF (``ivfpq_search``) when partition
    pruning is also wanted."""
    codes.write.mode("overwrite").parquet(index_path + "/codes")
    codebook.write.mode("overwrite").parquet(index_path + "/codebook")


def load_pq_index(spark: SparkSession, index_path: str):
    """Load a persisted PQ index -> (codes, codebook)."""
    return (
        spark.read.parquet(index_path + "/codes"),
        spark.read.parquet(index_path + "/codebook"),
    )


@register("sim_pq_persisted", oracle=None, tags=("K-extra", "rows-only"))
def sim_pq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sim_pq_adc`` through a PERSISTED code table: train + encode
    once to /tmp (keyed by the sf dir name), answer from the on-disk
    codes — the reuse path runs ZERO Lloyd/encode jobs (asserted in
    tests, same regime as sim_ivf_persisted). Output contract and
    recall floor identical to sim_pq_adc."""
    import os

    index_path = f"/tmp/ezgs_pq_index_{os.path.basename(sf_dir.rstrip('/'))}"
    vecs = _vectors(spark, sf_dir).cache()
    # Reuse gate requires BOTH _SUCCESS markers: build_pq_index writes
    # codes BEFORE the codebook, so gating on codes alone would accept
    # an index whose codebook write crashed mid-flight and then fail
    # load_pq_index forever without ever retraining (ADVICE r7).
    if not (
        os.path.exists(index_path + "/codes/_SUCCESS")
        and os.path.exists(index_path + "/codebook/_SUCCESS")
    ):
        codes, codebook = pq_train_encode(vecs, dim=64)
        build_pq_index(codes, codebook, index_path)
    codes, codebook = load_pq_index(spark, index_path)
    queries = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = pq_adc_topk(codes, codebook, queries, dim=64, k=_PQ_SHORTLIST)
    return _exact_rerank(cand, vecs, queries, k=5)


def pca_fit(
    vecs: DataFrame, dim: int, k: int
) -> tuple[list, list, list, int]:
    """Fit a top-``k`` PCA of (vec_id, v:array<double>) rows the way
    distributed PCA is always done when dim is small and N is huge:

    1. **Per-batch partials** (``mapInPandas``, BLAS): each Arrow batch
       emits ONE row — (n, Σv : dim, ΣvᵀV : dim² Gram, flattened).
       No shuffle sees a vector; tasks stream batches and emit
       constant-size summaries (the same posture as the block-pair
       cosine kernel above).
    2. **Element-wise reduce**: posexplode the partial arrays and sum
       per position — two keyed aggs whose GROUP count is dim and dim²
       (constant), so the exchange carries ≤ (dim² + dim) rows per
       task regardless of N.
    3. **Driver eigendecomposition** of the dim×dim covariance
       (``numpy.linalg.eigh`` — dim² is a constant; this is the one
       place driver-side math is the scale-correct choice, like the
       25-node fixpoint checks in graph.py).

    Covariance uses the unbiased (n-1) denominator. Eigenvector sign
    is fixed deterministically (largest-|entry| coordinate made
    positive, lowest index on ties) so downstream projections are
    reproducible run to run. Returns (mean, components[k][dim],
    eigvals[k] desc, n).
    """
    import numpy as np

    def partials(it):
        import numpy as _np
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            m = _np.stack(pdf["v"].to_numpy()).astype(_np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    part = vecs.select(F.col("v")).mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    )
    part = part.persist()
    try:
        n = part.agg(F.sum("n")).collect()[0][0] or 0
        if n < 2:
            raise ValueError("pca_fit needs at least 2 vectors")
        srows = (
            part.select(F.posexplode("s").alias("pos", "x"))
            .groupBy("pos").agg(F.sum("x").alias("x")).collect()
        )
        grows = (
            part.select(F.posexplode("g").alias("pos", "x"))
            .groupBy("pos").agg(F.sum("x").alias("x")).collect()
        )
    finally:
        part.unpersist()
    s = np.zeros(dim)
    for r in srows:
        s[r["pos"]] = r["x"]
    g = np.zeros(dim * dim)
    for r in grows:
        g[r["pos"]] = r["x"]
    mean = s / n
    cov = (g.reshape(dim, dim) - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues, columns = vecs
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        c = v[:, idx]
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c = -c
        comps.append(c.tolist())
    return mean.tolist(), comps, [float(w[i]) for i in order], int(n)


def pca_project(
    vecs: DataFrame, mean: list, components: list
) -> DataFrame:
    """Project (vec_id, v) rows onto fitted components: map-side
    ``mapInPandas`` matmul against the CLOSURE-captured (k×dim)
    component matrix — constant-size, shipped with the task like a
    broadcast; zero shuffle, linear scan. Returns (vec_id,
    proj:array<double> length k, round6)."""

    def run(it):
        import numpy as np
        import pandas as pd

        mu = np.asarray(mean)
        w = np.asarray(components)  # k x dim
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            proj = np.round((m - mu) @ w.T, 6)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "proj": list(map(list, proj))}
            )

    return vecs.select("vec_id", "v").mapInPandas(
        run, "vec_id long, proj array<double>"
    )


_PCA_K = 8


@register("embed_pca", oracle=None, tags=("ext", "ml", "rows-only"))
def embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dimensionality reduction of the embedding corpus
    (``pca_fit`` + ``pca_project``): 64-d float vectors → top-8
    principal scores — the standard pre-step before clustering /
    visualization / cheap-ANN over embedding columns, and the
    whitening transform SemDeDup-style pipelines apply first.

    Rows-only by design (eigenvectors are float-iterative and
    platform-LAPACK-dependent; cross-engine bit parity is not
    defined): orthonormality, variance capture, centering, and
    determinism across runs are pinned in tests/test_llm.py. Output:
    one row per vector with the 8 principal scores FLATTENED to
    scalar columns ``pc1..pc8`` (round6), ordered by vec_id — the
    driver's correctness harness canonicalizes results through a
    pandas sort, where a top-level ``array<double>`` cell raises
    ``TypeError: unhashable type: 'list'`` (the CORRECTNESS_r09
    hard-error record). ``pca_project`` keeps the array form for API
    users; only the registered readout flattens.
    """
    e = tables.load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    mean, comps, _eigvals, _n = pca_fit(e, dim=64, k=_PCA_K)
    proj = pca_project(e, mean, comps)
    return proj.select(
        "vec_id",
        *[F.col("proj")[i].alias(f"pc{i + 1}") for i in range(_PCA_K)],
    ).orderBy("vec_id")


MMR_PROBES = 5  # probe query vectors: vec_id < MMR_PROBES
MMR_CAND = 12  # relevance-shortlist size fed into the greedy pass
MMR_K = 4  # items selected per probe
MMR_LAM10 = 7  # lambda = 0.7, carried as integer tenths


def mmr_select(
    cand: DataFrame,
    pairs: DataFrame,
    k: int = MMR_K,
    lam10: int = MMR_LAM10,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick ``k`` items per group maximizing
    ``lam*rel - (1-lam)*max_sim_to_already_selected`` — the diversity
    re-rank a training-data pipeline runs on a relevance shortlist so
    a near-duplicate cluster cannot monopolize a sampled batch.

    Inputs: ``cand(group_id, item_id, rel_u)`` — the shortlist with
    integer micro-unit relevance — and ``pairs(group_id, id_a, id_b,
    sim_u)`` — within-group pairwise micro-unit similarities (both
    directions). ``pairs`` may be SPARSE: a missing (item, selected)
    row counts as similarity 0 (left join + coalesce below), so
    nonzero-only pair tables are safe. All arithmetic is BIGINT (``score10 = lam10*rel_u -
    (10-lam10)*max_sim_u``, max over an empty selected set defined 0),
    ties broken by item id, so the greedy trajectory is
    integer-deterministic and SQL-expressible.

    The greedy recurrence is STATICALLY UNROLLED: ``k`` is a small
    query constant, so step t is one keyed join (remaining x selected
    through pairs) + one keyed argmax — the plan is k fixed stages,
    not a driver loop with data-dependent iteration count (same
    pattern as the LTTB key's unrolled oracle). Every shuffle is keyed
    on group_id; per-group work is bounded by the shortlist size, so
    the whole pass scales linearly with the number of groups.
    """
    lam_d = 10 - lam10
    w = Window.partitionBy("group_id").orderBy(
        F.desc("score10"), F.col("item_id")
    )
    sel = (
        cand.select(
            "group_id",
            "item_id",
            "rel_u",
            F.lit(0).cast("long").alias("max_sim_u"),
            (F.lit(lam10) * F.col("rel_u")).alias("score10"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("step", F.lit(1))
    )
    picked = sel
    for t in range(2, k + 1):
        remaining = cand.join(
            picked.select("group_id", "item_id"),
            on=["group_id", "item_id"],
            how="left_anti",
        )
        scored = (
            remaining.join(
                picked.select(
                    "group_id", F.col("item_id").alias("sel_id")
                ),
                "group_id",
            )
            .join(
                pairs.select(
                    "group_id",
                    F.col("id_a").alias("item_id"),
                    F.col("id_b").alias("sel_id"),
                    "sim_u",
                ),
                ["group_id", "item_id", "sel_id"],
                # LEFT, not inner: callers may pass SPARSE pairs
                # (nonzero-only similarities); an absent pair row means
                # similarity 0, not "drop the candidate from the
                # argmax". The registered fixture is dense, where left
                # == inner, so the unrolled oracle is unchanged.
                "left",
            )
            .groupBy("group_id", "item_id", "rel_u")
            .agg(
                F.max(F.coalesce(F.col("sim_u"), F.lit(0).cast("long")))
                .alias("max_sim_u")
            )
            .select(
                "group_id",
                "item_id",
                "rel_u",
                "max_sim_u",
                (
                    F.lit(lam10) * F.col("rel_u")
                    - F.lit(lam_d) * F.col("max_sim_u")
                ).alias("score10"),
            )
        )
        pick_t = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .withColumn("step", F.lit(t))
        )
        picked = picked.unionByName(pick_t)
    return picked.select(
        "group_id", "step", "item_id", "rel_u", "max_sim_u", "score10"
    ).orderBy("group_id", "step")


def _mmr_sql() -> str:
    """Unrolled-CTE DuckDB twin of ``mmr_select`` over the probe/
    shortlist build in ``sim_mmr_select`` (LTTB-style: one CTE per
    greedy step, NOT EXISTS excluding prior picks)."""
    lam10, lam_d = MMR_LAM10, 10 - MMR_LAM10
    steps = []
    for t in range(2, MMR_K + 1):
        prior = " UNION ALL ".join(
            f"SELECT group_id, item_id FROM s{j}" for j in range(1, t)
        )
        steps.append(f"""
s{t} AS (
  SELECT group_id, item_id, rel_u, max_sim_u,
         {lam10} * rel_u - {lam_d} * max_sim_u AS score10, {t} AS step
  FROM (
    SELECT c.group_id, c.item_id, c.rel_u, max(p.sim_u) AS max_sim_u,
           row_number() OVER (
             PARTITION BY c.group_id
             ORDER BY {lam10} * c.rel_u - {lam_d} * max(p.sim_u) DESC,
                      c.item_id) AS rn
    FROM cand c
    JOIN prior{t} s ON s.group_id = c.group_id
    JOIN pairs p ON p.group_id = c.group_id
     AND p.id_a = c.item_id AND p.id_b = s.item_id
    WHERE NOT EXISTS (SELECT 1 FROM prior{t} x
                      WHERE x.group_id = c.group_id
                        AND x.item_id = c.item_id)
    GROUP BY c.group_id, c.item_id, c.rel_u
  ) WHERE rn = 1
),
prior{t + 1} AS (SELECT group_id, item_id FROM prior{t}
                 UNION ALL SELECT group_id, item_id FROM s{t})""")
    union = " UNION ALL ".join(
        f"SELECT group_id, step, item_id, rel_u, max_sim_u, score10 FROM s{t}"
        for t in range(1, MMR_K + 1)
    )
    return f"""
WITH probes AS (
  SELECT vec_id AS group_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {MMR_PROBES}
),
scored AS (
  SELECT p.group_id, c.vec_id AS item_id,
         CAST(round(list_cosine_similarity(
             p.qv, CAST(c.embedding AS DOUBLE[])) * 1000000) AS BIGINT)
           AS rel_u,
         row_number() OVER (
           PARTITION BY p.group_id
           ORDER BY round(list_cosine_similarity(
               p.qv, CAST(c.embedding AS DOUBLE[])) * 1000000) DESC,
             c.vec_id) AS rk
  FROM probes p JOIN embeddings c ON c.vec_id <> p.group_id
),
cand AS (
  SELECT group_id, item_id, rel_u FROM scored WHERE rk <= {MMR_CAND}
),
pairs AS (
  SELECT a.group_id, a.item_id AS id_a, b.item_id AS id_b,
         CAST(round(list_cosine_similarity(
             CAST(ea.embedding AS DOUBLE[]),
             CAST(eb.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS sim_u
  FROM cand a
  JOIN cand b ON a.group_id = b.group_id AND a.item_id <> b.item_id
  JOIN embeddings ea ON ea.vec_id = a.item_id
  JOIN embeddings eb ON eb.vec_id = b.item_id
),
s1 AS (
  SELECT group_id, item_id, rel_u, CAST(0 AS BIGINT) AS max_sim_u,
         {lam10} * rel_u AS score10, 1 AS step
  FROM (
    SELECT group_id, item_id, rel_u,
           row_number() OVER (PARTITION BY group_id
                              ORDER BY rel_u DESC, item_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
prior2 AS (SELECT group_id, item_id FROM s1),
{",".join(steps)}
SELECT group_id, step, item_id, rel_u, max_sim_u, score10
FROM ({union}) ORDER BY group_id, step
"""


@register("sim_mmr_select", oracle=_mmr_sql(), tags=("K-extra", "llm"))
def sim_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity selection over the embeddings table: for each of
    5 probe vectors, shortlist the 12 most-relevant candidates by
    micro-int cosine, then greedily pick 4 balancing relevance against
    similarity-to-already-picked (lambda = 0.7). The re-rank that
    keeps a near-dup cluster from filling a retrieval batch.

    Probe side is 5 rows → broadcast; the shortlist build is the kNN
    shape (one pass over candidates, per-probe top-12 window); the
    within-shortlist pair grid is 12x12 per probe, keyed on the probe
    id; the greedy pass is ``mmr_select``'s k statically-unrolled
    keyed joins. Integer micro-unit scores end-to-end → full
    value-hash oracle (unrolled-CTE twin), unlike every other ANN key
    (their candidate GENERATION is sketch-dependent; here it is an
    exact top-k).
    """
    vecs = _vectors(spark, sf_dir)
    probes = vecs.filter(F.col("vec_id") < MMR_PROBES).select(
        F.col("vec_id").alias("group_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    rel = F.round(
        _cosine(F.col("qv"), F.col("qn"), F.col("v"), F.col("nrm")) * 1_000_000
    ).cast("long")
    wrk = Window.partitionBy("group_id").orderBy(
        F.desc("rel_u"), F.col("item_id")
    )
    cand = (
        F.broadcast(probes)
        .join(vecs, F.col("vec_id") != F.col("group_id"))
        .select(
            "group_id",
            F.col("vec_id").alias("item_id"),
            rel.alias("rel_u"),
        )
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= MMR_CAND)
        .drop("rk")
    )
    cv = cand.join(
        vecs.select(F.col("vec_id").alias("item_id"), "v", "nrm"), "item_id"
    ).select("group_id", "item_id", "v", "nrm")
    b = cv.select(
        "group_id",
        F.col("item_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        cv.select(
            "group_id",
            F.col("item_id").alias("id_a"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
        )
        .join(b, "group_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "group_id",
            "id_a",
            "id_b",
            F.round(
                _cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb"))
                * 1_000_000
            )
            .cast("long")
            .alias("sim_u"),
        )
    )
    return mmr_select(cand, pairs, MMR_K, MMR_LAM10)


# ---------------------------------------------------------------------------
# Matryoshka truncation (M219)

_MRL_DIMS = 16
_MRL_K = 20

_MRL_SQL = f"""
SELECT a.vec_id AS vid1, b.vec_id AS vid2,
       round(list_cosine_similarity(
         CAST(a.embedding AS DOUBLE[])[1:{_MRL_DIMS}],
         CAST(b.embedding AS DOUBLE[])[1:{_MRL_DIMS}]), 6) AS cos_trunc,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6)
         AS cos_full
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cos_trunc DESC, vid1, vid2
LIMIT {_MRL_K}
"""


def _mrl_pair_topk(pdf, n_blocks: int, dims: int, k: int):
    """Per-pair-group kernel: cosine over the FIRST ``dims``
    components (truncation implies renormalization) AND over the full
    vector, local top-k by the rounded truncated cosine with full
    (vid1, vid2) tiebreak. Candidates are preselected on the RAW
    matrix with the slack bound _pair_group_topk documents (a provable
    superset of the rounded top-k incl. boundary ties), so only ~k
    cells are rounded/sorted — rounding the full n^2 matrix first
    measured 7.9x wall growth at 4x volume."""
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    def unit(m):
        norms = np.sqrt((m * m).sum(axis=1))
        return m / np.where(norms == 0.0, 1.0, norms)[:, None], norms == 0.0

    full, zfull = unit(mat)
    trunc, ztr = unit(mat[:, :dims])
    blocks = pdf["b"].to_numpy()
    bi, bj = divmod(int(pdf["pk"].iat[0]), n_blocks)
    if bi == bj:
        srt = np.argsort(ids, kind="stable")
        q_ids = c_ids = ids[srt]
        st = trunc[srt] @ trunc[srt].T
        sf = full[srt] @ full[srt].T
        mask = np.zeros_like(st, dtype=bool)
        for i in range(st.shape[0]):
            mask[i, : i + 1] = True
        mask |= (ztr | zfull)[srt][:, None] | (ztr | zfull)[srt][None, :]
    else:
        qsel, csel = blocks == bi, blocks == bj
        if not qsel.any() or not csel.any():
            return None
        q_ids, c_ids = ids[qsel], ids[csel]
        st = trunc[qsel] @ trunc[csel].T
        sf = full[qsel] @ full[csel].T
        zq = (ztr | zfull)[qsel]
        zc = (ztr | zfull)[csel]
        mask = zq[:, None] | zc[None, :]
    st[mask] = -np.inf
    valid = int((~mask).sum())
    kk = min(k, valid)
    if kk == 0:
        return None
    flat = st.ravel()
    # preselect on RAW cosines with the same slack bound
    # _pair_group_topk documents (|round6(x) - x| <= 5e-7 + ulp terms,
    # 1.01e-6 over-covers), so only ~k cells are ever rounded/sorted —
    # rounding the full n^2 matrix first measured 7.9x at 4x volume.
    kth = np.partition(flat, flat.size - kk)[flat.size - kk]
    cand = np.flatnonzero(flat >= kth - 1.01e-6)
    qi, ci = np.unravel_index(cand, st.shape)
    v1 = np.minimum(q_ids[qi], c_ids[ci])
    v2 = np.maximum(q_ids[qi], c_ids[ci])
    ct = np.round(flat[cand], 6)
    order = np.lexsort((v2, v1, -ct))[:kk]
    return pd.DataFrame(
        {
            "vid1": v1[order],
            "vid2": v2[order],
            "cos_trunc": ct[order],
            "cos_full": np.round(sf.ravel()[cand][order], 6),
        }
    )


@register("embed_matryoshka_topk", oracle=_MRL_SQL, tags=("K-extra", "bench2"))
def embed_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation: retrieval over the FIRST
    16 of 64 embedding components (truncate + renormalize — the MRL
    serving trade: 4x less bandwidth/compute per query, ranked by a
    prefix of the representation), returning the truncated-cosine
    top-20 with the full-dimension cosine alongside — the columns a
    recall@k audit of the cheap prefix index needs.

    Same grid block-pair physical strategy as ``sim_cosine_topk``
    (linear B x corpus shuffle, bounded pair tasks, local top-k merged
    by TakeOrderedAndProject); the kernel computes both the 16-dim and
    64-dim BLAS products in one pass over each block pair. Local
    selection ranks on the ROUNDED truncated cosine with (vid1, vid2)
    tiebreak — exactly the oracle's comparator, so the local top-k is
    provably a superset of each group's contribution to the global
    top-k with no float-slack argument needed."""
    import pandas as pd

    n_blocks = _grid_blocks(spark, sf_dir)
    schema = "vid1 long, vid2 long, cos_trunc double, cos_full double"

    def per_group(pdf):
        out = _mrl_pair_topk(pdf, n_blocks, _MRL_DIMS, _MRL_K)
        if out is None:
            return pd.DataFrame(
                {"vid1": [], "vid2": [], "cos_trunc": [], "cos_full": []}
            ).astype(
                {
                    "vid1": "int64",
                    "vid2": "int64",
                    "cos_trunc": "float64",
                    "cos_full": "float64",
                }
            )
        return out

    emb = tables.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if n_blocks > 1:
        local = _grid_pairs(emb, n_blocks).groupBy("pk").applyInPandas(
            per_group, schema
        )
    else:
        one = emb.select(
            "vec_id",
            "embedding",
            F.lit(0).cast("int").alias("b"),
            F.lit(0).cast("int").alias("pk"),
        )

        def run(batches):
            pdfs = [p for p in batches if len(p)]
            if pdfs:
                yield per_group(pd.concat(pdfs, ignore_index=True))

        local = one.coalesce(1).mapInPandas(run, schema)
    return local.orderBy(
        F.col("cos_trunc").desc(), "vid1", "vid2"
    ).limit(_MRL_K)
