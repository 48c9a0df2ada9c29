"""Driver-sim oracle check: run queries under a DEFAULT SparkSession.

`tests/oracle_check.py` uses the repo's tuned session (`get_spark`: UTC,
32/16 shuffle partitions, ANSI default). The grading driver makes no such
promise, so this twin runs the same comparator inside a deliberately
DIFFERENT session — ANSI on, default 200 shuffle partitions, a non-UTC
session timezone — to flush out results that depend on session config
(timezone-sensitive timestamps, partition-count-sensitive nondeterminism,
ANSI cast behavior).

Usage:
    python tests/driversim_check.py [query ...]   # default: the r4 slate
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_check import SF_DIR, TABLES, frame_hash  # noqa: E402

# default slate: the r4 tail-head additions (r5 cap candidates) plus the
# r4-slate heads — the queries most recently added or rotated
R4_SLATE = [
    "sentence_split", "dict_mentions", "tfidf_ranked", "quality_filter",
    "proximity_triples", "degree_hist", "mixture_sample", "mixture_weights",
    "ngram_containment", "ppr_hosts", "weighted_sample", "random_walks",
    "scrub_dup_spans", "kcore_hosts", "readability", "lm_backoff",
    "clustering_entities", "textrank_keywords", "tagger_agreement",
    "auc_doclen", "cms_tokens", "rrf_search", "span_corruption",
    "skipgram_pairs", "skew_canonical", "link_fd_check", "char_entropy",
    "abbrev_aliases", "kge_negatives", "ktruss_hosts", "wl_fingerprint",
    "entity_centroids", "sssp_hosts", "chunk_documents", "linkpred_auc",
    "calibration_quality", "graph_summary", "community_modularity",
    "entity_salience", "negation_scope", "entity_resolution",
    "mad_outliers", "date_mentions", "triple_audit", "vocab_profile",
    "distance_histogram",
    "nb_lang_confusion", "bloom_decontaminate", "host_mirrors",
    "metapath_counts", "grouped_split_audit",
    "hearst_hypernyms", "domain_range_audit", "linkpred_mrr",
    "bcubed_resolution", "resolve_conflicts", "infer_types",
    "source_reliability", "taxonomy_cycles",
    "resolve_weighted", "rule_confidence",
    "jsonld_triples", "hashed_ngram_score", "blocking_metrics",
    "anf_reach", "winnow_fingerprint",
    "html_tables", "anchor_commonness", "host_boilerplate",
    "cocitation_hosts", "table_triples",
]


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    names = sys.argv[1:] or R4_SLATE
    spark = (SparkSession.builder.master("local[16]")
             .appName("driversim_check")
             .config("spark.sql.ansi.enabled", "true")
             .config("spark.sql.session.timeZone", "America/New_York")
             .getOrCreate())  # default 200 shuffle partitions
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for n in names:
        s = qs[n](spark, SF_DIR).toPandas()
        if n not in oracles:
            print(f"{n:24s} rows-only: {len(s)} rows OK")
            continue
        o = con.sql(oracles[n]).fetchdf()
        sn, sh = frame_hash(s)
        on, oh = frame_hash(o)
        ok = sn == on and sh == oh and sorted(s.columns) == sorted(o.columns)
        print(f"{n:24s} {'MATCH' if ok else 'DIFF '} spark={sn} duck={on}")
        if not ok:
            bad.append(n)
    if bad:
        print("FAILURES:", bad)
        return 1
    print("ALL MATCH (ANSI on, 200 shuffle partitions, America/New_York)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
