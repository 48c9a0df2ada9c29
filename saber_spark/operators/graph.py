"""Graph analytics over the materialized KG: connected components.

Downstream of node/edge materialization, entity-resolution and QA workflows
need component structure ("which entities are transitively connected?").
Spark has no native CC; the scalable formulation is hash-min label
propagation (the Pregel/GraphX standard): every node starts labeled with
itself, each round every node takes the min label among itself and its
neighbors, convergence after <= diameter rounds. Each round is ONE join +
ONE aggregation — at 10^12 edges that is the only shape that works; the
driver holds nothing but the loop counter and a converged? flag.

Determinism: labels are the node ids themselves and min() is total on
strings/longs, so the result is engine-portable (DuckDB twin: a recursive
CTE computing min reachable node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _propagate(sym_with_self: DataFrame, labels: DataFrame) -> DataFrame:
    """min label over the CLOSED neighborhood (self-loops included in the
    edge set), so ``labels`` is referenced exactly ONCE per round — the
    logical plan grows linearly with rounds. The naive `least(own,
    neighbor-min)` form references labels twice and doubles the plan tree
    every round (exponential analyzer blowup, OOMs near 8 rounds)."""
    return (sym_with_self.join(labels, sym_with_self.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("node2", "node"))


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25,
                         rounds: int | None = None) -> DataFrame:
    """undirected edges -> (node, component) with component = min node id
    reachable from node. Isolated nodes (present only as endpoints here)
    keep their own id.

    Two modes:
      rounds=None (default, unknown diameter): iterate to the FIXPOINT —
        one tiny convergence count per round, lineage cut per round with
        localCheckpoint. The 10^12-edge mode; cost = diameter rounds of
        (join + agg).
      rounds=K (known diameter bound): build K lazy propagation rounds and
        run them as ONE job — no per-round actions, no checkpoints. After K
        rounds every node holds the min label within graph distance K, so
        K >= diameter gives the exact components. The right mode for small
        or shallow graphs, where per-round driver actions dominate
        (measured 71s -> seconds at fixture scale under a default
        200-shuffle-partition session).
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct())
    nodes = sym.select(F.col("a").alias("node")).distinct()
    # closed neighborhood: self-loops let each round be ONE join
    sym_self = sym.unionByName(
        nodes.select(F.col("node").alias("a"), F.col("node").alias("b")))
    labels = nodes.withColumn("label", F.col("node"))

    if rounds is not None:
        for _ in range(rounds):
            labels = _propagate(sym_self, labels)
        return labels.select("node", F.col("label").alias("component"))

    for _ in range(max_iter):
        new_labels = _propagate(sym_self, labels)
        # fixpoint check: one small count per round (driver holds no data)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
        # cut the growing lineage so round k+1 doesn't recompute rounds 1..k
        labels = labels.localCheckpoint(eager=True)
    # returning unconverged labels would silently split components
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(graph diameter exceeds max_iter); raise max_iter")
