"""Pregel-style iterative graph algorithms as DataFrame driver loops.

BSP semantics per the Pregel/GraphX model [P]: each superstep is
  messages = edges ⨝ state  →  groupBy(dst).agg(...)   (2 keyed shuffles)
  state    = state ⨝ messages → vertex update
with driver-side iteration control (SURVEY.md §3.4).

Scale design:
- ``localCheckpoint`` every ``CHECKPOINT_EVERY`` supersteps truncates
  lineage — without it the plan grows exponentially (GraphX-on-
  DataFrames hazard [P]).
- Edges are cached once; vertex state is the only thing that changes.
- Convergence checks are separate tiny jobs (``isEmpty`` on a changed
  filter), run each superstep; fixed-iteration algorithms skip them.
- Shuffle key is the vertex id throughout, so successive supersteps
  reuse the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECKPOINT_EVERY = 3


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view of an edge list: both directions, deduped."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select("src", "dst").unionByName(rev).distinct()


def _truncate(df: DataFrame, step: int) -> DataFrame:
    if step % CHECKPOINT_EVERY == CHECKPOINT_EVERY - 1:
        return df.localCheckpoint(eager=True)
    return df


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Weakly connected components by min-label propagation.

    vertices: (id,) — edges: (src, dst) directed or not (symmetrized
    here). Returns (id, component) where component = min vertex id
    reachable. Converges in O(diameter) supersteps.
    """
    sym = symmetrize(edges).cache()
    state = vertices.select("id", F.col("id").alias("component"))
    for step in range(max_iter):
        msgs = (
            sym.join(state, sym.src == state.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("msg"))
        )
        new_state = (
            state.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("msg"), F.col("component"))
                ).alias("component"),
            )
        )
        new_state = _truncate(new_state, step)
        changed = (
            new_state.alias("n")
            .join(state.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
        )
        state = new_state
        if changed.isEmpty():
            break
    sym.unpersist()
    return state


def bfs(
    vertices: DataFrame, edges: DataFrame, source_ids: list[int], max_depth: int = 6
) -> DataFrame:
    """Unweighted shortest hop-count from a seed set (min-dist Pregel).

    Returns (id, dist) for reached vertices only, dist <= max_depth.
    """
    sym = symmetrize(edges).cache()
    state = vertices.select(
        "id",
        F.when(F.col("id").isin(source_ids), F.lit(0)).alias("dist"),
    )
    for step in range(max_depth):
        frontier = state.filter(F.col("dist") == step)
        if frontier.isEmpty():
            break
        msgs = (
            sym.join(frontier, sym.src == frontier.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + 1).alias("msg"))
        )
        state = state.join(msgs, "id", "left").select(
            "id",
            F.least(
                F.coalesce(F.col("dist"), F.lit(2**31)),
                F.coalesce(F.col("msg"), F.lit(2**31)),
            ).alias("d2"),
        )
        state = state.select(
            "id", F.when(F.col("d2") < 2**31, F.col("d2")).alias("dist")
        )
        state = _truncate(state, step)
    sym.unpersist()
    return state.filter(F.col("dist").isNotNull())


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank on the undirected (symmetrized) graph.

    Returns (id, rank). Dangling vertices (degree 0) keep the teleport
    mass only. Float shuffle-sum order varies per run → rows-only
    correctness; ranks are comparable after round().
    """
    sym = symmetrize(edges).cache()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    n = vertices.count()
    state = vertices.join(deg, "id", "left").select(
        "id",
        F.coalesce(F.col("deg"), F.lit(0)).alias("deg"),
        F.lit(1.0 / n).alias("rank"),
    )
    teleport = (1.0 - damping) / n
    for step in range(iterations):
        contribs = (
            sym.join(state, sym.src == state.id)
            .filter(F.col("deg") > 0)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        state = state.join(contribs, "id", "left").select(
            "id",
            "deg",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        state = _truncate(state, step)
    sym.unpersist()
    return state.select("id", "rank")


def label_propagation(
    vertices: DataFrame, edges: DataFrame, iterations: int = 5
) -> DataFrame:
    """Synchronous label propagation, ``iterations`` fixed supersteps.

    Labels start as vertex ids; each superstep every vertex adopts the
    most frequent neighbor label (ties → smallest label, so the whole
    run is deterministic). Returns (id, label).
    """
    from pyspark.sql import Window

    sym = symmetrize(edges).cache()
    state = vertices.select("id", F.col("id").alias("label"))
    for step in range(iterations):
        counts = (
            sym.join(state, sym.src == state.id)
            .groupBy(F.col("dst").alias("id"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        w = Window.partitionBy("id").orderBy(
            F.col("votes").desc(), F.col("label").asc()
        )
        winners = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        state = state.join(winners, "id", "left").select(
            "id", F.coalesce(F.col("new_label"), F.col("label")).alias("label")
        )
        state = _truncate(state, step)
    sym.unpersist()
    return state
