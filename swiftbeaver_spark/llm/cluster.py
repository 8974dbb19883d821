"""Duplicate-cluster resolution: connected components over the
near-dup pair graph, and canonical-document selection.

LSH dedup (minhash/simhash, llm/dedup.py) emits PAIRS; production
training-data dedup needs CLUSTERS — if A~B and B~C, keep exactly one
of {A,B,C} even when A~C was never emitted. That is connected
components over the pair graph.

Spark design: iterative label propagation with the component label =
min doc_id reachable. Each round joins the current labels across the
(symmetrized) edge list and takes the per-node min — labels only ever
decrease, so the fixpoint is exact regardless of join order; the loop
converges in O(graph diameter) rounds (near-dup clusters are dense and
shallow, so typically <= 3-4). Every round is one shuffle on doc_id;
a driver-side count checks convergence (the same shape as GraphX /
MLlib's iterative algorithms). For adversarial long-chain graphs the
large-star/small-star variant bounds rounds at O(log n); chain-shaped
duplicate graphs are rare enough in practice that the simple exact
iteration is the better default.

Reference analog: none — the reference carves files, it does not dedup
corpora. This is the training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, component) for every node in `pairs`, where component =
    the smallest doc_id in the node's connected component."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    try:
        converged = False
        for _ in range(max_iters):
            # neighbor minimum: the smallest label visible one hop away
            nbr = (
                edges.join(labels, edges["dst"] == labels["doc_id"])
                .groupBy(F.col("src").alias("doc_id"))
                .agg(F.min("component").alias("nbr_min"))
            )
            new_labels = (
                labels.join(nbr, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"), F.coalesce("nbr_min", F.col("component"))
                    ).alias("component"),
                )
                .persist()
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("component", "old"), "doc_id")
                .where(F.col("component") != F.col("old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # returning a non-fixpoint would silently split clusters
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} rounds "
                "(graph diameter exceeds max_iters — raise it for chain-shaped graphs)"
            )
        # detach the result from the persisted loop state
        return labels.select("doc_id", "component")
    finally:
        edges.unpersist()


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Drop every document whose near-dup component has a smaller
    member: the kept set is one canonical (minimum-id) doc per cluster
    plus all unpaired docs. Anti-join keeps the corpus pass shuffle-free
    on the doc side (components are tiny relative to the corpus)."""
    comps = connected_components(pairs, a_col, b_col)
    losers = comps.where(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(
        losers.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
