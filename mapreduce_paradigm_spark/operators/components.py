"""Connected components over a pair graph — dedup CLUSTERING.

Near-dup detection yields pairs; the pipeline action (keep one doc per
duplicate group) needs the transitive closure: connected components. This
is the engine's one genuinely ITERATIVE algorithm: a driver loop over
label-propagation rounds, each round pure DataFrame ops, converging in
O(log n) rounds for typical dedup graphs (components are small and dense).

Scale notes: each round is one join + one aggregate on (edges ∪ labels);
labels are checkpoint-persisted per round so the lineage (and thus task
binaries) don't grow with iterations — the classic Spark iterative-
algorithm discipline. For web-scale graphs swap the propagation for the
large-star/small-star formulation (same primitive ops, provably fewer
rounds on high-diameter graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 20,
) -> DataFrame:
    """``(doc_id, component)`` for every vertex in ``edges``; component =
    the minimum doc_id reachable. Deterministic.

    Min-label propagation: every vertex repeatedly adopts the smallest
    label among itself and its neighbors; fixpoint = components. The
    convergence check is one small action per round (count of changed
    labels) — the driver only ever sees a scalar.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: both directions once
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.persist()
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
        .persist()
    )
    labels.count()  # materialize

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["v"])
            .groupBy(F.col("a").alias("v2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["v"] == neighbor_min["v2"], "left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("v").alias("doc_id"), "component")
