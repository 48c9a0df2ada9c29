"""End-to-end KG-construction pipeline (the flagship "query").

pages --filter lang--> extract(text) --repartition(hash(url))-->
tag mentions (mapInPandas) --> link (broadcast join) -->
  +--> canonicalize -> nodes table (salted two-phase agg)
  +--> triples (1-shuffle pair expansion) -> dedup -> edges table

Reference lifecycle being reimplemented: Saber.annotate
(saber/saber.py:52-128) generalized from one string to a 10^12-row page
table, plus grounding (grounding_utils.py) and the annotation union
(app_utils.py:165-178) folded into set semantics.

Run as a job:  python -m saber_spark.pipeline --sf-dir /root/testdata/sf0.001
                      --out /tmp/kg_out [--checkpoint-dir /tmp/kg_ckpt]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from saber_spark import checkpoint as ckpt
from saber_spark.fixtures.dictionary import grounding_dict_df, surface_label_map
from saber_spark.fixtures.pages import build_pages_df
from saber_spark.operators.canonicalize import canonicalize_nodes
from saber_spark.operators.extract import extract_text
from saber_spark.operators.linking import link_mentions
from saber_spark.operators.tagger import detect_mentions
from saber_spark.operators.triples import assemble_triples, dedup_triples


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    dictionary: DataFrame | None = None,
    surface_map: dict | None = None,
    checkpoint_dir: str | None = None,
    lang: str | None = "en",
    repartition: int | None = None,
    coref: bool = False,
    enrich: bool = False,
) -> dict[str, DataFrame]:
    """Full pipeline; returns {mentions, linked, nodes, triples, edges}.

    ``repartition`` spreads extraction+tagging uniformly over the cluster on
    hash(url) (north_rule); default = 3x the session's parallelism, capped
    at 4x the input split count so tiny inputs don't pay empty-task
    overhead. AQE coalesces the downstream aggregation outputs.

    ``enrich=True`` attaches the graph-analytics metrics to the
    materialized tables: nodes gain (pr, n_triangles) from PageRank /
    triangle counting over the deduplicated edge set, edges gain the PMI
    confidence weight (doc-frequency-normalized co-occurrence). These are
    the standard quality signals a production KG build ships alongside raw
    counts; off by default so the baseline bench stays comparable.
    """
    if dictionary is None:
        dictionary = grounding_dict_df(spark)
    if surface_map is None:
        surface_map = surface_label_map()
    if repartition is None:
        # enough tasks to keep every core busy with headroom for stragglers,
        # but never a large multiple of the actual input split count — tiny
        # inputs would otherwise pay 3 stages of near-empty task overhead.
        # The split count is estimated from the scan's file bytes /
        # maxPartitionBytes (metadata only — the r5 rdd.getNumPartitions
        # probe forced a full python-RDD conversion costing ~1.4s of the
        # cold run); non-local storage falls back to the RDD probe.
        par = spark.sparkContext.defaultParallelism
        n_input = None
        try:
            from urllib.parse import urlparse
            files = pages.inputFiles()
            if files and all(urlparse(f).scheme in ("file", "")
                             for f in files):
                raw = spark.conf.get("spark.sql.files.maxPartitionBytes",
                                     "128m")
                import re as _re
                m = _re.match(r"(\d+)([a-zA-Z]*)", str(raw))
                mult = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
                        "m": 1 << 20, "mb": 1 << 20,
                        "g": 1 << 30, "gb": 1 << 30}.get(
                    m.group(2).lower(), 1) if m else 1
                maxpb = int(m.group(1)) * mult if m else 128 << 20
                total = sum(os.path.getsize(urlparse(f).path)
                            for f in files)
                n_input = max(1, -(-total // max(1, maxpb)))
        except Exception:
            n_input = None
        if n_input is None:
            n_input = pages.rdd.getNumPartitions()
        repartition = max(par, min(par * 3, n_input * 4))
    surface_bc = spark.sparkContext.broadcast(surface_map)

    def compute_mentions() -> DataFrame:
        extracted = extract_text(pages, lang=lang)
        # explicit url-hash repartition: uniform work distribution into the
        # Python tagger stage regardless of upstream file layout
        extracted = extracted.repartition(repartition, F.col("url"))
        if coref:
            # optional coref stage (reference: coref=True rewrites pronouns
            # before tagging, saber/preprocessor.py:54-57; off by default)
            from saber_spark.operators.coref import resolve_coreferences
            extracted = resolve_coreferences(extracted, surface_bc)
        return detect_mentions(extracted, surface_bc)

    mentions = ckpt.run_stage(spark, checkpoint_dir, "mentions", compute_mentions)
    linked = ckpt.run_stage(
        spark, checkpoint_dir, "linked",
        lambda: link_mentions(mentions, dictionary))
    if checkpoint_dir is None:
        # three consumers (nodes, triples->edges) fan out from `linked`;
        # without parquet checkpoints, persist it so the Python tagging
        # stage runs exactly once (at cluster scale checkpoint_dir replaces
        # this with durable parquet stages)
        linked = linked.persist()
    nodes = ckpt.run_stage(
        spark, checkpoint_dir, "nodes",
        lambda: canonicalize_nodes(linked))
    triples = ckpt.run_stage(
        spark, checkpoint_dir, "triples",
        lambda: assemble_triples(linked))
    edges = ckpt.run_stage(
        spark, checkpoint_dir, "edges",
        lambda: dedup_triples(triples))
    if enrich:
        from saber_spark.operators.graph import (label_propagation,
                                                 pagerank, triangle_count)
        from saber_spark.operators.triples import pmi_weights
        # materialize the deduplicated pair set ONCE; the graph ops then
        # skip their internal checkpoint (materialize=False) instead of
        # re-deriving the triples chain eagerly three times. Enrichment
        # launches jobs at call time (pagerank needs N); callers wanting
        # lazy outputs keep the default enrich=False.
        edge_pairs = (edges.select(F.col("subj").alias("src"),
                                   F.col("obj").alias("dst"),
                                   "n_occurrences")
                      .localCheckpoint(eager=True))
        metrics = (pagerank(edge_pairs, materialize=False,
                            weight_col="n_occurrences")
                   .join(triangle_count(edge_pairs, materialize=False),
                         "node", "outer")
                   .join(label_propagation(edge_pairs,
                                           weight_col="n_occurrences",
                                           rounds=3, materialize=False),
                         "node", "outer")
                   .withColumnRenamed("node", "canonical_id"))
        # isolated nodes (no edge) keep pr NULL / 0 triangles
        nodes = (nodes.join(metrics, "canonical_id", "left")
                 .withColumn("n_triangles",
                             F.coalesce("n_triangles", F.lit(0))))
        pmi = pmi_weights(linked, id_col="url")
        edges = edges.join(pmi.select("subj", "obj", "pmi"),
                           ["subj", "obj"], "left")
    return {"mentions": mentions, "linked": linked, "nodes": nodes,
            "triples": triples, "edges": edges}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    parser.add_argument("--out", default="/tmp/kg_out")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--lang", default="en")
    parser.add_argument("--format", default=None,
                        help="sink format (parquet default; iceberg at deploy)")
    parser.add_argument("--enrich", action="store_true",
                        help="attach PageRank/triangle metrics to nodes "
                             "and PMI weights to edges")
    args = parser.parse_args()

    from saber_spark.session import get_spark
    from saber_spark.sources.registry import (DEFAULT_WRITE_FORMAT,
                                              read_table, write_table)

    spark = get_spark("saber_spark.pipeline")
    pages = build_pages_df(spark, args.sf_dir)
    out = run_pipeline(spark, pages, checkpoint_dir=args.checkpoint_dir,
                       lang=args.lang, enrich=args.enrich)
    stats = {}
    for name in ("nodes", "edges", "triples"):
        path = os.path.join(args.out, name)
        write_table(out[name], path, args.format)
        stats[name] = read_table(
            spark, path, args.format or DEFAULT_WRITE_FORMAT).count()
    print(json.dumps({"out": args.out, "rows": stats}))


if __name__ == "__main__":
    main()
