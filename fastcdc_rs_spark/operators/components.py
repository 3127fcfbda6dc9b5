"""Connected components over candidate edges (SURVEY.md §2.B B11).

Iterative min-label propagation with *pointer jumping*, expressed entirely
as DataFrame joins:

  1. propagate: label(v) <- min(label(v), min over neighbors' labels) —
     one shuffle join of edges (symmetrized) with the label table;
  2. jump: label(v) <- label(label(v)) — contracts label chains, so
     convergence is O(log diameter) rounds instead of O(diameter)
     (the large-star/small-star idea in join form);
  3. ``localCheckpoint`` each round to truncate lineage — without it the
     plan doubles every iteration and the driver OOMs long before the data
     does.

Convergence is detected by counting changed labels (an aggregate per
round, cheap relative to the joins). Cluster id = min doc_id of the
component, a stable deterministic canonical representative.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id) for every vertex; singletons map to themselves.

    ``edges`` must have columns (a, b). ``vertices`` (one column ``id_col``)
    adds isolated docs; if None, only endpoint vertices are labeled.
    """
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    if vertices is not None:
        nodes = vertices.select(F.col(id_col).alias("node")).distinct()
    else:
        nodes = sym.select(F.col("src").alias("node")).distinct()
    sym = sym.persist()
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()

    for _ in range(max_iter):
        # 1. min over own + neighbor labels
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least("label", "nmin").alias("label"))
        )
        # 2. pointer jumping: label <- label(label)
        lab2 = new_labels.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        jumped = (
            new_labels.join(lab2, "label", "left")
            .select("node", F.coalesce("label2", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            jumped.join(labels.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
