"""Benchmark harness: headline queries + full KG pipeline throughput.

Prints ONE COMPACT JSON line as the LAST line of stdout:
  {"metric": "kg_pipeline_docs_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query FIRST-RUN seconds, 2dp...}, "sf": ...,
   "docs_per_sec": ..., "total_seconds": ..., "steady_total_seconds": ...,
   "cpus": N, "detail": "BENCH/bench_full.json"}

The grading driver captures only the stdout TAIL (last ~2000 chars), so the
headline line is size-guarded (< 1900 chars: values at 2dp; if the registry
ever grows past what fits, per-query timings drop from stdout first). The
complete record — steady-state per-query seconds, first-run seconds, row
counts — is written to BENCH/bench_full.json (committed).

Timing bases (round-over-round comparability):
  total_seconds         sum of FIRST-execution per-query seconds + the warm
                        kg_pipeline run — the same basis as the r1/r2
                        records (includes one-off whole-stage-codegen
                        compile per plan).
  steady_total_seconds  sum of second-execution seconds + warm kg_pipeline —
                        the basis r3 temporarily reported under
                        "total_seconds"; renamed per round-3 ADVICE so the
                        field name no longer silently changes meaning.

Env:
  SPARK_GRAFT_SF_DIR   input dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     parallelism (default all cores) — the N vs 4N
                       scaling bench runs this script at 8 and 32.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as e
    from saber_spark.fixtures.pages import build_pages_df
    from saber_spark.pipeline import run_pipeline
    from saber_spark.session import get_spark

    spark = get_spark("saber_spark.bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    # ---- headline 1: full KG pipeline, writing real node/edge sinks
    out_dir = tempfile.mkdtemp(prefix="saber_bench_")
    pages = build_pages_df(spark, sf_dir)
    n_docs = pages.filter("lang = 'en'").count()  # excluded from the timing
    # COLD pipeline run first: includes Python-worker spawn + JIT, recorded
    # separately so cold-start cost stays visible round-over-round. It doubles
    # as the warmup for the steady-state number below (on a real cluster that
    # init is paid once per executor lifetime).
    t0 = time.monotonic()
    cold = run_pipeline(spark, pages)
    cold["edges"].write.mode("overwrite").parquet(f"{out_dir}/cold_edges")
    timings["kg_pipeline_cold"] = round(time.monotonic() - t0, 3)
    for df in cold.values():
        try:
            df.unpersist()
        except Exception:
            pass
    t0 = time.monotonic()
    result = run_pipeline(spark, pages)
    result["linked"].count()  # materialize the shared persisted stage once
    # node + edge sinks are independent consumers of `linked`: submit them as
    # concurrent Spark jobs (multi-sink practice; the scheduler interleaves
    # their stages instead of serializing two small jobs)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(2) as pool:
        f1 = pool.submit(lambda: result["edges"].write.mode("overwrite")
                         .parquet(f"{out_dir}/edges"))
        f2 = pool.submit(lambda: result["nodes"].write.mode("overwrite")
                         .parquet(f"{out_dir}/nodes"))
        f1.result(); f2.result()
    kg_seconds = time.monotonic() - t0
    timings["kg_pipeline"] = round(kg_seconds, 3)
    rows["kg_edges"] = spark.read.parquet(f"{out_dir}/edges").count()
    rows["docs"] = n_docs
    docs_per_sec = n_docs / kg_seconds if kg_seconds > 0 else 0.0

    # ---- headline 1b: corpus-curation pipeline (same cold/steady split;
    # excluded from total_seconds/steady_total_seconds for r1-r3
    # comparability — reported as its own keys)
    from saber_spark.curate import run_curation
    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_raw = docs_tbl.count()
    def run_curate_once(tag: str) -> tuple[float, int]:
        t0 = time.monotonic()
        cur = run_curation(spark, docs_tbl)
        kept = cur["decision"].filter("final_keep").count()
        cur["shards"].write.mode("overwrite").parquet(
            f"{out_dir}/shards_{tag}")
        secs = time.monotonic() - t0
        for name in ("scrubbed", "verdicts", "decision"):
            cur[name].unpersist()
        return secs, kept

    cold_secs, _ = run_curate_once("cold")
    timings["curate_pipeline_cold"] = round(cold_secs, 3)
    cur_seconds, n_kept = run_curate_once("warm")
    timings["curate_pipeline"] = round(cur_seconds, 3)
    rows["curate_kept"] = n_kept
    rows["curate_docs"] = n_raw
    curate_docs_per_sec = n_raw / cur_seconds if cur_seconds > 0 else 0.0
    shutil.rmtree(out_dir, ignore_errors=True)

    # ---- headline 2: representative operator suite
    qs = e.queries()
    bench_queries = [
        "token_freq", "bio_chunks", "entity_link", "canonicalize_salted",
        "triples_cooccur", "sessionize", "tpch_q1", "tpch_q3_top10",
        "tpch_q5_nation", "tpch_q6", "dedup_exact", "minhash_candidates",
        "ngram_jaccard", "simhash", "cosine_topk", "lsh_cosine_topk",
        "lang_id", "quality_score", "doc_fingerprint", "rollup_revenue",
        "above_nation_avg", "exists_high_value", "token_bigrams",
        "zscore_by_source", "eval_prf",
        # added round 3 (new operators; excluded from r1/r2 totals)
        "gopher_repetition", "sequence_packing", "dedup_clusters", "pii_scrub",
        "contamination_check",
        # added round 3, second batch (graph analytics + term weighting)
        "pagerank_entities", "triangle_entities", "edge_pmi", "tfidf_topterms",
        "crossdoc_ngram_dup", "pivot_events", "quality_buckets",
        "json_extract_agg",
        # added round 3, third batch (sequence analytics + data mixing)
        "funnel_conversion", "cohort_retention", "mixture_weights",
        "table_profile",
        # added round 4 (multi-token dictionary tagging, composite corpus
        # filter, token-window relation candidates, fuzzy grounding,
        # weighted corpus sampling)
        "dict_mentions", "quality_filter", "proximity_triples",
        "fuzzy_link", "mixture_sample", "event_transitions",
        "centroid_classify",
        # added round 4, second batch (web-crawl URL analytics + CCNet
        # line-level boilerplate removal)
        "url_host_stats", "url_dedup", "host_blocklist", "line_dedup_clean",
        "host_link_graph",
        # added round 4, third batch (crawl snapshot diff, incremental KG
        # maintenance, redirect resolution, anchor-text profiling)
        "snapshot_delta", "incremental_triples", "resolve_redirects",
        "anchor_profile",
        # added round 4, fourth batch (KG enrichment: sense disambiguation,
        # ontology rollup, community detection, LM quality scoring,
        # recrawl prioritization)
        "disambiguate_link", "type_closure", "label_propagation",
        "lm_perplexity", "crawl_frontier", "typed_triples",
        "triple_history", "link_prediction", "trending_entities",
        "robots_filter", "sitemap_urls", "warc_records",
        "kmeans_embeddings", "bpe_pair_stats", "bpe_encode",
        # added round 4, fifth batch (retrieval, importance resampling,
        # semantic dedup, hub/authority + BFS graph analytics)
        "bm25_search", "dsir_weights", "semdedup", "hits_hosts",
        "khop_hosts", "ngram_containment", "ppr_hosts", "weighted_sample",
        "random_walks", "scrub_dup_spans", "kcore_hosts", "readability",
        "lm_backoff", "clustering_entities", "textrank_keywords",
        "tagger_agreement", "auc_doclen", "cms_tokens", "rrf_search",
        "span_corruption", "skipgram_pairs", "skew_canonical",
        "link_fd_check", "char_entropy", "abbrev_aliases", "kge_negatives",
        "ktruss_hosts", "wl_fingerprint", "entity_centroids", "sssp_hosts", "chunk_documents", "linkpred_auc",
        "calibration_quality",
        # added round 4, sixth batch (graph structural profile, community
        # quality, entity salience, negation scoping)
        "graph_summary", "community_modularity", "entity_salience",
        "negation_scope", "entity_resolution", "mad_outliers",
        "date_mentions", "triple_audit", "vocab_profile",
        "distance_histogram",
        # added round 4, seventh batch (NB classifier, Bloom membership,
        # host-mirror dedup, KG metapaths, leakage-safe split)
        "nb_lang_confusion", "bloom_decontaminate", "host_mirrors",
        "metapath_counts", "grouped_split_audit",
        # eighth batch (Hearst taxonomy induction, schema audit, MRR)
        "hearst_hypernyms", "domain_range_audit", "linkpred_mrr",
        # ninth batch (B-cubed cluster eval, knowledge fusion, type
        # completion)
        "bcubed_resolution", "resolve_conflicts", "infer_types",
        # tenth batch (truth-discovery scorecard, taxonomy cycle QA)
        "source_reliability", "taxonomy_cycles",
        # eleventh batch (AMIE rule confidence, weighted fusion)
        "rule_confidence", "resolve_weighted",
        # round 5 (JSON-LD structured triples, hashed-trigram scorer,
        # ER blocking metrics, ANF reach sketches, winnowing digests)
        "jsonld_triples", "hashed_ngram_score", "blocking_metrics",
        "anf_reach", "winnow_fingerprint",
        # round 5 batch 2 (markup-table cells, EL commonness priors,
        # host boilerplate rate, co-citation similarity)
        "html_tables", "anchor_commonness", "host_boilerplate",
        "cocitation_hosts", "table_triples",
        # round 5 batch 3 (read side of the KG: SPARQL BGP + entity cards)
        "bgp_query", "entity_card",
        # round 5 batch 4 (characteristic sets + temporal snapshot diff)
        "char_sets", "kg_timetravel",
        # round 5 batch 5 (VoID statistics table for the BGP cost model)
        "void_stats",
        # round 5 batch 6 (RDF dump round-trip + SPARQL CONSTRUCT)
        "ntriples_roundtrip", "construct_triples",
        # round 5 batch 7 (schema.org microdata harvest)
        "microdata_triples",
        # round 5 final batch (PQ encode, quote attribution, nDCG, FD mining)
        "pq_codes", "quote_attribution", "ndcg_eval", "fd_mining",
        # round 5 final batch 2 (RDFS inference + SPARQL OPTIONAL)
        "rdfs_entailment", "optional_bgp",
        # round 5 final batch 3 (instance-based schema matching)
        "schema_matching",
        # round 5 final batch 4 (TransE plausibility + fact ranking)
        "transe_score", "fact_ranking",
        # round 5 final batch 5 (positional index, phrase search, Deequ gate)
        "inverted_index", "phrase_search", "expectations_check",
        # round 5 final batch 6 (measurements, citations, CUSUM monitor)
        "measurements", "citation_spans", "cusum_changepoints",
        # round 5 final batch 7 (concentration diagnostic, analogy probe)
        "gini_concentration", "analogy_eval",
        # round 5 final batch 8 (SHACL shapes, exact PPJoin, TextTiling)
        "shacl_validate", "ppjoin_similarity", "texttiling",
        # round 5 final batch 9 (FS probabilistic linkage, sorted-
        # neighborhood blocking)
        "fellegi_sunter", "fellegi_sunter_em", "sorted_neighborhood",
        "rendezvous_shards", "kg_align", "partition_quality",
        "logreg_quality",
        # round 5 continuation (RDFa markup harvest, ReVerb-lite OpenIE,
        # Good-Turing smoothing, Zipf OLS fit)
        "rdfa_triples", "openie_triples", "good_turing", "zipf_fit",
        "temporal_conflicts", "phonetic_blocking", "entity_hindex",
        "url_templates", "subprop_entailment", "sameas_rewrite",
        "noisyor_confidence", "transitive_property", "allen_relations",
        # round 5 final session (DistMult, property paths, CDC dedup,
        # label noise, DP release)
        "distmult_score", "property_paths", "cdc_chunk_dedup",
        "label_noise", "dp_release",
        # round 5 final session batch 2 (ComplEx, landmark harmonic
        # centrality, RAKE, k-anonymity audit, Kneser-Ney)
        "complex_score", "harmonic_hosts", "rake_keywords",
        "k_anonymity", "kneser_ney",
        # round 5 final session batch 3 (OWL-RL prp-ifp + cax-dw)
        "ifp_sameas", "disjoint_audit",
        # round 5 final session batch 4 (SemEval modes, accent folding)
        "eval_semeval", "folded_blocks",
        # round 5 final session batch 5 (KWIC concordance, corpus JSD)
        "kwic_snippets", "js_divergence",
        # round 5 final session batch 6 (KB-completeness estimators)
        "chao1_vocab", "capture_recapture",
        # round 5 final session batch 7 (Dunning G^2 collocations,
        # Monroe log-odds keyness, rank-biased overlap)
        "collocations", "logodds_keyness", "rbo_hosts",
        # round 5 final session batch 8 (Benford forensics, Yule's K
        # panel, Wilson lower-bound ranking)
        "benford_prices", "lexical_richness", "wilson_sources",
        # round 5 final session batch 9 (event-count ACF, Gries DP,
        # MAP/P@k)
        "acf_events", "term_dispersion", "map_eval",
        # round 5 final session batch 10 (Heaps' law, Burrows' Delta,
        # association rules)
        "heaps_fit", "burrows_delta", "assoc_rules",
        # round 5 final session batch 11 (rank-sum, KS, Spearman)
        "mannwhitney_chars", "ks_chars", "spearman_chars",
        # round 5 final session batch 12 (Kendall tau-b, chi-square,
        # entropy rate)
        "kendall_hosts", "chisq_lang_source", "entropy_rate",
        # round 5 final session batch 13 (S-stemmer, I-MR chart,
        # mojibake audit)
        "stem_collapse", "control_chart", "mojibake_audit",
        # round 5 final session batch 14 (sequential patterns,
        # Kaplan-Meier, Markov stationary)
        "seq_patterns", "kaplan_meier", "markov_stationary",
        # round 5 final session batch 15 (robust means, effect size,
        # Theil-Sen)
        "robust_means", "effect_size_chars", "theil_sen_trend",
        # round 5 final session batch 16 (lead-lag CCF, burstiness,
        # co-citation)
        "ccf_events", "burstiness", "cocitation_cosine",
        # round 5 final session batch 17 (Mann-Kendall, runs test,
        # seasonal profile)
        "mann_kendall", "runs_test", "seasonal_profile",
        # round 5 final session batch 18 (PPMI similarity, OpenGraph,
        # rel=canonical)
        "ppmi_similarity", "og_meta", "rel_canonical",
        # round 5 final session batch 19 (HT estimator, Neyman
        # allocation, grouped jackknife)
        "ht_estimate", "neyman_alloc", "jackknife_se",
        # round 5 final session batch 20 (Dirichlet QLD, ERR, MMR)
        "qld_search", "err_eval", "mmr_rerank",
        # round 5 final session batch 21 (NYSIIS, Dice verify, Katz)
        "nysiis_blocks", "dice_pairs", "katz_hosts",
        # round 5 final session batch 22 (Cavnar-Trenkle, adaptation,
        # Rocchio)
        "ct_lang", "token_adaptation", "rocchio_rerank",
        # round 5 final session batches 23-25 (cluster validity, PCA,
        # RotatE, bowtie census, TrustRank)
        "cluster_validity", "pca_top", "rotate_score", "bowtie_hosts",
        "trustrank_hosts",
        # round 5 final session batch 26 (SCAN clustering, k-center)
        "scan_hosts", "kcenter_seeds",
        # round 5 final session batch 27 (script census, PSL rollup)
        "script_profile", "pld_rollup",
        # round 5 final session batch 28 (WordPiece, Min-K% prob)
        "wordpiece_encode", "min_k_prob",
        # round 5 final session batch 29 (Self-BLEU diversity)
        "self_bleu",
        # round 5 final session batch 30 (SIF doc embeddings)
        "sif_embeddings",
        # round 5 final session batch 31 (Bradley-Terry strengths)
        "bradley_terry",
        # round 5 final session batch 32 (Luhn auto-abstract)
        "luhn_abstract",
    ]
    # Each query is timed twice: the first execution pays one-off per-plan
    # cost (whole-stage-codegen compile, window/agg exec JIT) that on a real
    # cluster amortizes over a 100 TB scan but at sf0.1 can dominate —
    # measured 5.4 s -> 0.7 s on back-to-back sessionize runs on a cold VM.
    # The steady-state run is the headline (same convention as the
    # kg_pipeline cold/warm split above); first-run seconds are reported
    # unedited in "first_run" so the one-off cost stays visible.
    first_run: dict[str, float] = {}
    # JMH-style inter-query hygiene, OUTSIDE the timed windows: eagerly
    # localCheckpointed blocks from earlier queries stay pinned until the
    # JVM collects their dereferenced RDD handles, and with a large heap
    # that collection may not happen for dozens of queries — the storage
    # pressure then contaminates later checkpoint-heavy queries (r4 saw
    # ktruss_hosts read 67 s in-bench vs 6.5 s standalone). A JVM GC per
    # query lets ContextCleaner unpin them before the next measurement.
    jvm_gc = spark.sparkContext._jvm.System.gc
    for name in bench_queries:
        jvm_gc()
        t0 = time.monotonic()
        n = qs[name](spark, sf_dir).count()
        first_run[name] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)
        rows[name] = n

    # total_seconds = FIRST-execution basis (r1/r2-comparable: their total
    # was sum(all queries) + warm kg_pipeline, excluding kg_pipeline_cold);
    # steady_total_seconds = second-execution basis (r3's "total_seconds",
    # renamed per round-3 ADVICE).
    steady_total = (sum(v for k, v in timings.items()
                        if k not in ("kg_pipeline_cold", "kg_pipeline",
                                     "curate_pipeline_cold",
                                     "curate_pipeline"))
                    + timings["kg_pipeline"])
    first_total = sum(first_run.values()) + timings["kg_pipeline"]

    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "bench_full.json")
    detail = {
        "metric": "kg_pipeline_docs_per_sec",
        "value": round(docs_per_sec, 3),
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "docs_per_sec": round(docs_per_sec, 3),
        "kg_pipeline": timings["kg_pipeline"],
        "kg_pipeline_cold": timings["kg_pipeline_cold"],
        "curate_pipeline": timings["curate_pipeline"],
        "curate_pipeline_cold": timings["curate_pipeline_cold"],
        "curate_docs_per_sec": round(curate_docs_per_sec, 3),
        "total_seconds": round(first_total, 3),
        "steady_total_seconds": round(steady_total, 3),
        "queries_steady": {k: v for k, v in timings.items()
                           if k not in ("kg_pipeline", "kg_pipeline_cold",
                                        "curate_pipeline",
                                        "curate_pipeline_cold")},
        "queries_first_run": first_run,
        "rows": rows,
    }
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")

    # Two-line stdout protocol (round-3 regression lesson: the driver
    # captures only the stdout TAIL and parses the LAST complete JSON
    # line, so the guaranteed-parseable line must be short and LAST):
    #   line 1: per-query first-run seconds (may be sliced by the tail
    #           capture at large registry sizes — the committed
    #           BENCH/bench_full.json carries it regardless);
    #   line 2: compact headline (~400 chars), always intact.
    detail_line = {
        "queries": {k: round(v, 2) for k, v in first_run.items()},
    }
    print(json.dumps(detail_line, separators=(",", ":")))
    # The contract names a "queries" key; the full registry no longer fits
    # the tail capture, so the headline carries the 20 slowest first-run
    # entries (the ones that matter for regression triage) and the detail
    # file carries all of them.
    slowest20 = dict(sorted(first_run.items(), key=lambda kv: -kv[1])[:20])
    headline = {
        "metric": "kg_pipeline_docs_per_sec",
        "value": round(docs_per_sec, 3),
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "docs_per_sec": round(docs_per_sec, 3),
        "kg_pipeline": timings["kg_pipeline"],
        "kg_pipeline_cold": timings["kg_pipeline_cold"],
        "curate_pipeline": timings["curate_pipeline"],
        "curate_docs_per_sec": round(curate_docs_per_sec, 3),
        "total_seconds": round(first_total, 3),
        "steady_total_seconds": round(steady_total, 3),
        "n_docs": n_docs,
        "n_queries": len(first_run),
        "queries": {k: round(v, 2) for k, v in slowest20.items()},
        "queries_note": "20 slowest of n_queries; full set in detail file",
        "detail": "BENCH/bench_full.json",
    }
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > 1900:  # belt-and-braces: never outgrow the tail capture
        headline.pop("queries", None)
        headline["queries_note"] = "see detail file"
        line = json.dumps(headline, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
