"""saber_spark — a PySpark-native knowledge-graph construction engine.

Reimplements the capabilities of BaderLab/saber (biomedical IE: text
preprocessing, sequence tagging, entity chunking, entity linking /
grounding, evaluation) as vectorized stages over Spark DataFrames of
Common-Crawl-style web pages, producing deduplicated (subj, pred, obj)
triple tables plus node/edge tables.

Architecture (Spark-first, NOT a port):
  - pure deterministic kernels (saber_spark.kernels) define the per-row
    invariants (byte-identical text extraction, NERsuite tokenization,
    BIO/BIOES chunk decode, P/R/F1 math) and double as the *reference
    implementation* for the eval harness;
  - all dataflow is DataFrame ops + Arrow-backed pandas UDFs
    (no per-row Python in the hot path);
  - entity linking is a broadcast hash join; canonicalization is a
    two-phase salted aggregation; the tagger runs in mapInPandas with
    per-executor model caching.
"""

__version__ = "0.1.0"
