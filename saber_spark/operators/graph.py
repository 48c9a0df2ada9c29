"""Graph analytics over the materialized KG: connected components.

Downstream of node/edge materialization, entity-resolution and QA workflows
need component structure ("which entities are transitively connected?").
Spark has no native CC; the scalable formulation is hash-min label
propagation (the Pregel/GraphX standard): every node starts labeled with
itself, each round every node takes the min label among itself and its
neighbors, convergence after <= diameter rounds. Each round is ONE join +
ONE aggregation — at 10^12 edges that is the only shape that works; the
driver holds nothing but the loop counter and a converged? flag (one count
per round, the standard iterate-until-fixpoint pattern).

Determinism: labels are the node ids themselves and min() is total on
strings/longs, so the result is engine-portable (DuckDB twin: a recursive
CTE computing min reachable node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """undirected edges -> (node, component) with component = min node id
    reachable from node. Isolated nodes (present only as endpoints here)
    keep their own id.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct())
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")))

    for _ in range(max_iter):
        neighbor_min = (sym.join(labels, sym.b == labels.node)
                        .groupBy("a")
                        .agg(F.min("label").alias("nmin")))
        new_labels = (labels.join(neighbor_min,
                                  labels.node == neighbor_min.a, "left")
                      .select("node",
                              F.least("label", F.coalesce("nmin", "label"))
                              .alias("label")))
        # fixpoint check: one small count per round (driver holds no data)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
        # cut the growing lineage so round k+1 doesn't recompute rounds 1..k
        labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("component"))
