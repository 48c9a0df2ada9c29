"""Physical-plan audit: dump and check .explain() for headline queries.

Writes PLANS.md with annotated formatted plans and asserts the structural
properties each operator claims (BASELINE/SURVEY scale obligations):
  - language filter + column pruning reach the parquet scan (PushedFilters /
    ReadSchema);
  - entity linking is a BroadcastHashJoin (no shuffle of the mentions side);
  - aggregations are partial+final hash aggregates (map-side combine);
  - relational stages run inside WholeStageCodegen;
  - the window chunk decode shuffles ONCE on seq_id.

Usage: python tools/plan_audit.py [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"))
    args = ap.parse_args()

    import __spark_entry__ as e
    from saber_spark.fixtures.pages import build_pages_df
    from saber_spark.operators.extract import extract_text
    from saber_spark.session import get_spark

    spark = get_spark("plan_audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # (title, why, plan, must_contain, max_python_evals)
    sections: list[tuple[str, str, str, list[str], int | None]] = []

    # 1. extraction: filter pushdown + column pruning into the scan
    pages = build_pages_df(spark, SF_DIR)
    ext = extract_text(pages, lang="en")
    sections.append((
        "extract_text (lang filter + UDF)",
        "The lang='en' predicate must be PUSHED to the parquet scan and only "
        "(doc_id, text, lang) read (column pruning) — the Python UDF stage "
        "never sees filtered rows or unused columns. The extraction UDF must "
        "appear in EXACTLY ONE ArrowEvalPython node: Catalyst's filter-"
        "through-project pushdown duplicates deterministic UDFs, doubling "
        "Python cost (round-1 defect; blocked via asNondeterministic).",
        formatted_plan(ext),
        ["PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"],
        1,
    ))

    # 2. linking: broadcast hash join, no shuffle on the mentions side
    linked = e._linked_spark(spark, SF_DIR)
    sections.append((
        "entity_link (broadcast hash join)",
        "The grounding dictionary is broadcast; the token/mention side joins "
        "with ZERO shuffle (no Exchange hashpartitioning above its scan).",
        formatted_plan(linked),
        ["BroadcastHashJoin"],
        None,
    ))

    # 3. token_freq: partial+final hash aggregate
    tf = e.q_token_freq(spark, SF_DIR)
    sections.append((
        "token_freq (two-phase hash agg)",
        "HashAggregate(partial) before the Exchange, HashAggregate(final) "
        "after: the map-side combine collapses each partition to |vocab| "
        "rows, so the shuffle is tiny no matter the corpus size.",
        formatted_plan(tf),
        ["HashAggregate", "hashpartitioning"],
        None,
    ))

    # 4. chunk decode: two windows, one shuffle
    bc = e.q_bio_chunks(spark, SF_DIR)
    sections.append((
        "bio_chunks (window run-grouping)",
        "lag + running-sum windows share one (seq_id) partitioning; the "
        "groupBy reuses it — ONE Exchange for the whole decode.",
        formatted_plan(bc),
        ["Window", "hashpartitioning"],
        None,
    ))

    # 5. tpch_q5: broadcast dims, shuffle facts
    q5 = e.q_tpch_q5_nation(spark, SF_DIR)
    sections.append((
        "tpch_q5_nation (join strategy)",
        "nation/region broadcast (bounded dims); lineitem⋈orders left to "
        "Catalyst/AQE (shuffle join at scale, runtime-downgraded when small).",
        formatted_plan(q5),
        ["BroadcastHashJoin"],
        None,
    ))

    # 6. salted canonicalize: two-phase agg
    cs = e.q_canonicalize_salted(spark, SF_DIR)
    sections.append((
        "canonicalize_salted (skew-safe two-phase agg)",
        "Salted partial groupBy spreads hub keys across reducers; the final "
        "agg sees <= S rows per key.",
        formatted_plan(cs),
        ["HashAggregate"],
        None,
    ))

    # 7. xml article extraction: xpath stays JVM-side, zero Python
    xa = e.q_xml_articles(spark, SF_DIR)
    sections.append((
        "xml_articles (xpath extraction, zero Python)",
        "Title/abstract extraction must run entirely in the JVM (xpath_string"
        " inside codegen) — no ArrowEvalPython/BatchEvalPython node at all.",
        formatted_plan(xa),
        ["Scan parquet"],
        0,
    ))

    # 8. embedding near-dup: bucketed join, never a cartesian product
    nd = e.q_embedding_near_dup(spark, SF_DIR)
    plan_nd = formatted_plan(nd)
    sections.append((
        "embedding_near_dup (LSH-bucketed candidates)",
        "Candidate generation must be an equi-join on the bucket code(s) — "
        "a CartesianProduct/BroadcastNestedLoopJoin here would mean the "
        "all-pairs plan the LSH design exists to avoid.",
        plan_nd,
        [],
        None,
    ))
    if "CartesianProduct" in plan_nd or "BroadcastNestedLoopJoin" in plan_nd:
        # impossible marker -> section reports MISSING and the audit fails
        sections[-1] = (sections[-1][0], sections[-1][1], plan_nd,
                        ["<no cartesian product>"], None)

    # 9. sequence packing: the running count costs ONE exchange on the group
    sp = e.q_sequence_packing(spark, SF_DIR)
    plan_sp = formatted_plan(sp)
    sections.append((
        "sequence_packing (one-exchange running count)",
        "The per-group running token count is a single window over "
        "hashpartitioning(source): exactly one Exchange, everything else "
        "narrow in codegen. More than one Exchange would mean the window "
        "partitioning was not reused.",
        plan_sp,
        ["Window", "hashpartitioning(source"],
        0,
    ))
    # node-detail headers only ("(3) Exchange"); BroadcastExchange and the
    # duplicate tree-line mentions don't match
    if len(re.findall(r"\(\d+\) Exchange", plan_sp)) != 1:
        sections[-1] = (sections[-1][0], sections[-1][1], plan_sp,
                        ["<exactly one Exchange>"], 0)

    # 10. gopher repetition: gram counts are partial+final hash aggregates
    gq = e.q_gopher_repetition(spark, SF_DIR)
    sections.append((
        "gopher_repetition (two-phase gram aggregation)",
        "Bigram/trigram counts must be HashAggregate partial+final on "
        "(doc_id, gram) — map-side combine bounds the shuffle by the "
        "per-partition distinct grams; keys are doc-scoped so no hub-key "
        "skew exists by construction. Zero Python anywhere.",
        formatted_plan(gq),
        ["HashAggregate"],
        0,
    ))

    # 11. dedup_clusters: composite chain must stay equi-join end-to-end
    dc = e.q_dedup_clusters(spark, SF_DIR)
    plan_dc = formatted_plan(dc)
    sections.append((
        "dedup_clusters (bucketed chain, no all-pairs anywhere)",
        "Candidates, Jaccard verify AND the component propagation rounds "
        "are all equi-joins; a CartesianProduct/BroadcastNestedLoopJoin "
        "anywhere in this composite would reintroduce the all-pairs shape "
        "the whole dedup design avoids.",
        plan_dc,
        [],
        0,
    ))
    # The ONLY nested-loop join allowed is the 8-row broadcast seeds
    # constants crossJoin inside minhash_signatures (Cross BuildRight
    # against a bounded literal table — dedup.py's documented shape). Any
    # CartesianProduct, or a BNLJ that is not that shape, fails the audit.
    bnlj_kinds = set(re.findall(
        r"BroadcastNestedLoopJoin (\w+ \w+) \(\d+\)", plan_dc))
    if "CartesianProduct" in plan_dc or bnlj_kinds - {"Cross BuildRight"}:
        sections[-1] = (sections[-1][0], sections[-1][1], plan_dc,
                        ["<no cartesian product>"], 0)

    # 12. pagerank: every iteration is an equi-join + hash agg; the only
    # nested-loop shape anywhere must be absent entirely (the 1-row N is a
    # Python scalar, not a crossJoin)
    pr = e.q_pagerank_entities(spark, SF_DIR)
    plan_pr = formatted_plan(pr)
    sections.append((
        "pagerank_entities (5 rounds, equi-join + hash agg per round)",
        "Each power iteration must compile to a shuffled equi-join against "
        "the degree-carrying edge table plus ONE partial+final hash "
        "aggregate on the destination key; no CartesianProduct or "
        "BroadcastNestedLoopJoin may appear, and nothing Python-side.",
        plan_pr,
        ["HashAggregate"],
        0,
    ))
    if "CartesianProduct" in plan_pr or "BroadcastNestedLoopJoin" in plan_pr:
        sections[-1] = (sections[-1][0], sections[-1][1], plan_pr,
                        ["<no cartesian/BNLJ in pagerank>"], 0)

    # 13. triangle_count: wedge expansion + closing check stay equi-joins
    tc = e.q_triangle_entities(spark, SF_DIR)
    plan_tc = formatted_plan(tc)
    sections.append((
        "triangle_entities (degree-ordered wedges, equi-joins only)",
        "The wedge self-join keys on the low-degree endpoint and the "
        "closing-edge check is a LeftSemi equi-join on (v, w) — any "
        "CartesianProduct here would be the all-pairs shape the "
        "degree-ordering exists to avoid.",
        plan_tc,
        ["LeftSemi"],
        0,
    ))
    if "CartesianProduct" in plan_tc:
        sections[-1] = (sections[-1][0], sections[-1][1], plan_tc,
                        ["<no cartesian product in triangle_count>"], 0)

    # 14. pivot: explicit values -> ONE two-phase agg, no distinct pre-pass
    pv = e.q_pivot_events(spark, SF_DIR)
    plan_pv = formatted_plan(pv)
    n_exchanges_pv = len(re.findall(r"\(\d+\) Exchange", plan_pv))
    sections.append((
        "pivot_events (explicit-values pivot, one exchange)",
        "The explicit category list means no distinct-value pre-pass job "
        "and a single partial+final hash aggregation on user_id — exactly "
        "ONE Exchange in the whole plan.",
        plan_pv,
        ["HashAggregate"] + ([] if n_exchanges_pv == 1
                             else [f"<1 exchange, saw {n_exchanges_pv}>"]),
        0,
    ))

    # 15. quantile buckets: broadcast boundaries, no global sort anywhere
    qb = e.q_quality_buckets(spark, SF_DIR)
    plan_qb = formatted_plan(qb)
    sections.append((
        "quality_buckets (per-group percentile bounds, no ntile sort)",
        "Bucket assignment must be a BroadcastHashJoin of the tiny "
        "per-group boundary table plus a narrow fold — a global Sort or "
        "Window here would be the single-partition ntile shape this "
        "operator exists to avoid.",
        plan_qb,
        ["BroadcastHashJoin"]
        + (["<no Window in plan>"] if "Window" in plan_qb else [])
        + (["<no global sort shape>"]
           if ("rangepartitioning" in plan_qb or "SortMergeJoin" in plan_qb)
           else []),
        0,
    ))

    # 16. funnel: all step windows share ONE exchange + ONE sort; the
    # per-user aggregate reuses that partitioning (no extra exchange);
    # only the K-long scalar gather may add a second exchange.
    plan_fn = formatted_plan(e.queries()["funnel_conversion"](spark, SF_DIR))
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan_fn))
    n_sort = len(re.findall(r"\(\d+\) Sort", plan_fn))
    n_win = len(re.findall(r"\(\d+\) Window", plan_fn))
    sections.append((
        "funnel_conversion (K chained windows, one data shuffle)",
        "The K-step funnel must keep every running-min window pass on a "
        "single user_id Exchange + Sort (Catalyst collapses same-spec "
        "windows), and the per-user aggregate must reuse that partitioning "
        "— at most 2 Exchanges total (data shuffle + the K-row scalar "
        "gather). A join-based funnel would show K shuffled joins here.",
        plan_fn,
        ([f"<at most 2 exchanges, saw {n_ex}>"] if n_ex > 2 else [])
        + ([f"<one shared sort, saw {n_sort}>"] if n_sort > 1 else [])
        + ([f"<3 window passes, saw {n_win}>"] if n_win != 3 else []),
        0,
    ))

    # 17. sentence_split: narrow replace+split+explode — ZERO exchanges,
    # zero Python; the whole stage is codegen over the scan.
    plan_ss = formatted_plan(e.queries()["sentence_split"](spark, SF_DIR))
    n_ex_ss = len(re.findall(r"\(\d+\) Exchange", plan_ss))
    sections.append((
        "sentence_split (zero-shuffle codegen explode)",
        "Rule-based sentence segmentation must stay a narrow map "
        "(regexp_replace + split + posexplode) with NO Exchange and NO "
        "Python anywhere — it runs inside whole-stage codegen directly "
        "over the scan.",
        plan_ss,
        ["Generate", "codegen id"]
        + ([f"<0 exchanges, saw {n_ex_ss}>"] if n_ex_ss else []),
        0,
    ))

    # 18. dict_mentions: dictionary joins are broadcast; exactly ONE window
    # (shared by the >=2-gram candidates; unigrams come straight off the
    # token stream); no cartesian, no Python.
    plan_dm = formatted_plan(e.queries()["dict_mentions"](spark, SF_DIR))
    n_win_dm = len(re.findall(r"\(\d+\) Window", plan_dm))
    # one (doc_id, pos) partitioning/ordering; frames may differ (lead vs
    # the bounded suppression frame), so normalize the spec up to the frame
    specs_dm = {re.sub(r"#\d+L?", "", s.split(", specifiedwindowframe")[0])
                for s in re.findall(
                    r"windowspecdefinition\(([^)]*)\)", plan_dm)}
    n_scan_dm = len(re.findall(r"\(\d+\) Scan parquet", plan_dm))
    n_ex_doc = len(re.findall(
        r"Arguments: hashpartitioning\(doc_id", plan_dm))
    sections.append((
        "dict_mentions (one-pass windowed longest-match)",
        "The corpus must be scanned ONCE and shuffled ONCE on doc_id: the "
        "lead window, the per-length broadcast LEFT joins (dictionary "
        "pre-grouped per surface so the join is 1:1), and the windowed "
        "containment check (a max over a bounded ROWS frame — suppression "
        "as a window aggregate, not a join) all share that partitioning, "
        "and one explode emits the surviving matches. The r4-initial "
        "union-of-branches form scanned the corpus 3x and shuffled it "
        "2x for identical output. A CartesianProduct anywhere would be "
        "the all-pairs shape this construction avoids.",
        plan_dm,
        ["BroadcastHashJoin"]
        + ([f"<1 corpus scan, saw {n_scan_dm}>"] if n_scan_dm != 1 else [])
        + ([f"<1 doc_id exchange, saw {n_ex_doc}>"] if n_ex_doc != 1
           else [])
        + ([f"<1 window partitioning spec, saw {len(specs_dm)}>"]
           if len(specs_dm) > 1 else [])
        + ([f"<at most 2 window nodes, saw {n_win_dm}>"]
           if n_win_dm > 2 else [])
        + (["<no cartesian product>"] if "CartesianProduct" in plan_dm
           else []),
        0,
    ))

    # 19. quality_filter: lang+quality fused in ONE narrow projection (no
    # join between them); single doc_id join with the gopher branch.
    plan_qf = formatted_plan(e.queries()["quality_filter"](spark, SF_DIR))
    sections.append((
        "quality_filter (fused narrow rules + one gopher join)",
        "The lang and quality rules must be computed in one narrow "
        "projection sharing the tokenised array (joining lang_id ⋈ "
        "quality_score would shuffle the corpus twice); the only joins "
        "are gopher_quality's internal left joins plus the final doc_id "
        "join. Zero Python.",
        plan_qf,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_qf
           else []),
        0,
    ))

    # 20. proximity_triples: NO positional self-join — one collect agg +
    # higher-order pair expansion + final pair agg.
    plan_pt = formatted_plan(e.queries()["proximity_triples"](spark, SF_DIR))
    sections.append((
        "proximity_triples (collect + array pair expansion, no self-join)",
        "The window-k pair generation must be the collect_list + "
        "higher-order-expansion shape (per-doc mention counts are "
        "dictionary-bounded): a SortMergeJoin or CartesianProduct here "
        "would be the positional self-join that skews on hub documents.",
        plan_pt,
        ["HashAggregate", "Generate"]
        + (["<no sort-merge self-join>"] if "SortMergeJoin" in plan_pt
           else [])
        + (["<no cartesian product>"] if "CartesianProduct" in plan_pt
           else []),
        0,
    ))

    # 21. mixture_sample: the corpus joins the |sources|-row weight table
    # by BROADCAST and is otherwise untouched (narrow hash filter).
    plan_mx = formatted_plan(e.queries()["mixture_sample"](spark, SF_DIR))
    sections.append((
        "mixture_sample (broadcast weight join, unshuffled corpus)",
        "Sampling membership is a narrow Knuth-hash filter after ONE "
        "BroadcastHashJoin with the tiny per-source weight table; a "
        "SortMergeJoin would mean the corpus shuffled on source — the "
        "shape this sampler exists to avoid.",
        plan_mx,
        ["BroadcastHashJoin"]
        + (["<no sort-merge join>"] if "SortMergeJoin" in plan_mx else []),
        0,
    ))

    # 22. centroid_classify: the model is a broadcast (labels x dims) table;
    # fit is a hash agg; no cartesian anywhere.
    plan_cc = formatted_plan(e.queries()["centroid_classify"](spark, SF_DIR))
    sections.append((
        "centroid_classify (broadcast model, hash-agg fit)",
        "The centroid model must join the exploded test vectors as a "
        "BroadcastHashJoin (it is labels x dims rows); training is "
        "partial+final HashAggregate on (label, dim). A CartesianProduct "
        "or a sort-merge join of the model would mean the embedding "
        "table shuffled against a table that fits in one broadcast.",
        plan_cc,
        ["BroadcastHashJoin", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_cc
           else []),
        0,
    ))

    # 23. url_dedup: normalization is a narrow regexp map; ONE exchange
    # (the norm_url hash agg) and zero Python in the whole plan.
    plan_ud = formatted_plan(e.queries()["url_dedup"](spark, SF_DIR))
    n_ex_ud = len(re.findall(r"\(\d+\) Exchange", plan_ud))
    sections.append((
        "url_dedup (narrow normalization, one algebraic shuffle)",
        "URL normalization must stay a narrow whole-stage-codegen regexp "
        "projection at the scan; the only exchange is the norm_url hash "
        "aggregate, whose partial (map-side) combine collapses recrawl "
        "duplicates before any bytes hit the network — the property that "
        "makes URL dedup nearly free at crawl scale.",
        plan_ud,
        ["HashAggregate", "Project"]
        + ([f"<exactly 1 exchange, saw {n_ex_ud}>"] if n_ex_ud != 1 else [])
        + (["<no join>"] if "Join" in plan_ud else []),
        0,
    ))

    # 24. host_blocklist: broadcast LEFT ANTI — the corpus side must not
    # shuffle for the blocklist membership test.
    plan_hb = formatted_plan(e.queries()["host_blocklist"](spark, SF_DIR))
    sections.append((
        "host_blocklist (broadcast anti-join, unshuffled corpus)",
        "The blocklist (thousands of rows at production scale) must reach "
        "the corpus as a BroadcastHashJoin LeftAnti; a SortMergeJoin here "
        "would shuffle 10^12 pages to test membership in a table that "
        "fits in one broadcast.",
        plan_hb,
        ["BroadcastHashJoin"]
        + (["<no sort-merge join>"] if "SortMergeJoin" in plan_hb else []),
        0,
    ))

    # 25. line_dedup: everything keys on the 8-byte xxhash64(line); no
    # cartesian anywhere and zero Python; reassembly is one doc_id agg.
    plan_ld = formatted_plan(e.queries()["line_dedup_clean"](spark, SF_DIR))
    sections.append((
        "line_dedup_clean (hash-keyed boilerplate removal)",
        "The duplicated-line count and the removal anti-join must both key "
        "on xxhash64(line) (8-byte shuffle key, not raw line bytes); the "
        "boilerplate side is the count>=min_docs slice, AQE-broadcastable "
        "at runtime. Reassembly is a single collect_list+array_sort hash "
        "aggregate on doc_id. A CartesianProduct would be the all-pairs "
        "line comparison this construction exists to avoid; any Python "
        "node would put string reassembly on the slow path.",
        plan_ld,
        ["HashAggregate", "xxhash64"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ld
           else []),
        0,
    ))

    # 26. host_link_graph: link extraction must be a narrow generate over
    # the decoded html (no Python, no shuffle before the host-pair agg);
    # the only exchange is the (src_host, dst_host) hash aggregate.
    plan_lg = formatted_plan(e.queries()["host_link_graph"](spark, SF_DIR))
    n_ex_lg = len(re.findall(r"\(\d+\) Exchange", plan_lg))
    sections.append((
        "host_link_graph (narrow link extraction, one host-pair shuffle)",
        "regexp_extract_all + explode must run as a codegen Generate at "
        "the scan; the host-pair count is the only exchange, with map-side "
        "combine absorbing hub-destination skew. Any Python node would put "
        "per-page HTML parsing on the slow path for 10^12 pages.",
        plan_lg,
        ["Generate", "HashAggregate"]
        + ([f"<exactly 1 exchange, saw {n_ex_lg}>"] if n_ex_lg != 1 else [])
        + (["<no join>"] if "Join" in plan_lg else []),
        0,
    ))

    # 27. snapshot_delta: both snapshots must reduce to (url, xxhash64)
    # BEFORE the full-outer join — the exchange moves 16 bytes/row, never
    # page bodies; zero Python.
    plan_sd = formatted_plan(e.queries()["snapshot_delta"](spark, SF_DIR))
    sections.append((
        "snapshot_delta (hash-narrow full-outer crawl diff)",
        "xxhash64(content) must be computed below the join (project at the "
        "scan side), so the url-keyed FullOuter exchange carries hashes, "
        "not page bodies. With url-bucketed Iceberg snapshot tables the "
        "exchange disappears entirely.",
        plan_sd,
        ["xxhash64", "FullOuter"],
        0,
    ))

    # 28. resolve_redirects: ceil(log2(cap)) self-joins, no cartesian, no
    # Python — each doubling round is one equi-join on the current target.
    plan_rr = formatted_plan(e.queries()["resolve_redirects"](spark, SF_DIR))
    sections.append((
        "resolve_redirects (pointer doubling, 3 equi-join rounds)",
        "Chains up to 8 hops resolve in 3 LeftOuter equi-joins (log, not "
        "linear, in chain length); a CartesianProduct would mean the join "
        "condition degenerated. Cycles terminate by construction (fixed "
        "round count), so no fixpoint driver loop is needed.",
        plan_rr,
        ["Join LeftOuter"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_rr
           else []),
        0,
    ))

    # 29. anchor_profile: narrow zip+explode Generate, then exactly TWO
    # exchanges — the algebraic (dst, anchor) count and the single window
    # pass computing rank + per-dst totals on one sort.
    plan_ap = formatted_plan(e.queries()["anchor_profile"](spark, SF_DIR))
    n_ex_ap = len(re.findall(r"\(\d+\) Exchange", plan_ap))
    sections.append((
        "anchor_profile (narrow anchor extraction, agg + one window pass)",
        "Anchor pairs come from a codegen Generate (arrays_zip + explode) "
        "at the scan; the (dst, anchor) count is algebraic (map-side "
        "combine absorbs hub destinations); rank and per-dst totals share "
        "ONE window sort instead of a second groupBy + join.",
        plan_ap,
        ["Generate", "Window", "HashAggregate"]
        + ([f"<exactly 2 exchanges, saw {n_ex_ap}>"] if n_ex_ap != 2
           else []),
        0,
    ))

    # 30. incremental_triples: the dictionary join must broadcast on both
    # legs; delta membership and re-extraction stay JVM-side end-to-end.
    plan_it = formatted_plan(e.queries()["incremental_triples"](spark, SF_DIR))
    sections.append((
        "incremental_triples (delta-bounded re-extraction)",
        "Only delta pages re-enter tokenize/link/assemble; the grounding "
        "dictionary is a BroadcastHashJoin on each leg; the snapshot diff "
        "keys on xxhash64 like snapshot_delta. Zero Python: incremental "
        "maintenance must not be slower per page than the full build.",
        plan_it,
        ["BroadcastHashJoin", "xxhash64"],
        0,
    ))

    # 31. lm_perplexity: bigrams come from a codegen Generate over the
    # zipped token array (no (doc,pos) self-join); the 1-row vocab scalar
    # joins as BroadcastNestedLoopJoin; zero Python.
    plan_lm = formatted_plan(e.queries()["lm_perplexity"](spark, SF_DIR))
    sections.append((
        "lm_perplexity (narrow bigram extraction + model equi-joins)",
        "Bigram extraction must be a narrow Generate (zip_with over the "
        "token array), NOT a positional self-join — at 10^12 docs the "
        "self-join would shuffle the token table twice. The vocab size is "
        "a 1-row broadcast scalar; model joins are equi-joins (broadcast "
        "here via AQE at sf0.01; shuffle-hash co-partitioned at scale).",
        plan_lm,
        ["Generate", "BroadcastNestedLoopJoin", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_lm
           else []),
        0,
    ))

    # 32. disambiguate_link: the dictionary legs broadcast; the doc-context
    # expansion is the only shuffle join; the per-mention argmax compiles
    # to WindowGroupLimit (top-1 pushed below the sort).
    plan_dl = formatted_plan(e.queries()["disambiguate_link"](spark, SF_DIR))
    sections.append((
        "disambiguate_link (broadcast dictionary, windowed argmax)",
        "Candidate/sure matching must be BroadcastHashJoin (corpus side "
        "never shuffles for the dictionary); the doc_id coherence "
        "expansion co-partitions on doc_id; the per-mention top-1 must "
        "compile to WindowGroupLimit so reducers keep one row per "
        "mention, not the full vote list.",
        plan_dl,
        ["BroadcastHashJoin", "WindowGroupLimit"],
        0,
    ))

    # 33. label_propagation: per round ONE SMJ vote join + ONE hash agg +
    # ONE WindowGroupLimit top-1; edges come from a materialized
    # localCheckpoint so no per-round lineage recompute.
    plan_lp = formatted_plan(e.queries()["label_propagation"](spark, SF_DIR))
    sections.append((
        "label_propagation (3 rounds: join + vote agg + top-1 window)",
        "Each round references the label table exactly once (linear plan "
        "growth); votes collapse in a partial+final HashAggregate before "
        "the per-node argmax, which must compile to WindowGroupLimit — "
        "a hub's reducer sees its distinct neighbor-label votes, not its "
        "raw degree.",
        plan_lp,
        ["SortMergeJoin", "HashAggregate", "WindowGroupLimit"],
        0,
    ))

    # 34. type_closure: the ontology closure runs dimension-side; the
    # per-type facts broadcast into the bridge join; zero Python.
    plan_tc = formatted_plan(e.queries()["type_closure"](spark, SF_DIR))
    sections.append((
        "type_closure (dimension-side doubling closure, broadcast rollup)",
        "The corpus shuffles ONCE (its own label count agg); the "
        "path-doubling closure and the bridge join run on dimension-sized "
        "tables with the facts side explicitly broadcast.",
        plan_tc,
        ["BroadcastHashJoin", "HashAggregate"],
        0,
    ))

    # 35. crawl_frontier: in-degree and the max-ts scalar broadcast into
    # the page side; the only corpus shuffle is the per-host top-k window,
    # which must compile to WindowGroupLimit (rank<=k below the sort).
    plan_cf = formatted_plan(e.queries()["crawl_frontier"](spark, SF_DIR))
    sections.append((
        "crawl_frontier (broadcast authority + staleness, top-k window)",
        "Host in-degree joins as BroadcastHashJoin and the newest-capture "
        "scalar as BroadcastNestedLoopJoin (1 row), so the page table "
        "shuffles only for the per-host top-k — and that window must "
        "compile to WindowGroupLimit so hub hosts spill k rows, not "
        "their full URL set.",
        plan_cf,
        ["BroadcastHashJoin", "BroadcastNestedLoopJoin", "WindowGroupLimit"],
        0,
    ))

    # 36. typed_triples: pair expansion AND between-span slicing are
    # higher-order array ops over ONE per-doc collect — no positional
    # self-join of the token table; the per-pair predicate argmax compiles
    # to WindowGroupLimit; zero Python.
    plan_tt = formatted_plan(e.queries()["typed_triples"](spark, SF_DIR))
    sections.append((
        "typed_triples (array-sliced relation spans, argmax predicate)",
        "The corpus shuffles ONCE to collect per-doc (pos, token, ent) "
        "arrays; mention pairs and their between-token spans come from "
        "codegen Generate nodes (a tokens x pairs range join would "
        "shuffle the token table again and skew on long docs); the "
        "per-(subj,obj) predicate argmax must compile to WindowGroupLimit.",
        plan_tt,
        ["Generate", "WindowGroupLimit", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_tt
           else []),
        0,
    ))

    # 37. triple_history: EXACTLY ONE exchange — the per-triple snapshot
    # sets collect in one ObjectHashAggregate and the gaps-and-islands
    # interval split is pure array codegen.
    plan_th = formatted_plan(e.queries()["triple_history"](spark, SF_DIR))
    n_ex_th = len(re.findall(r"\(\d+\) Exchange", plan_th))
    sections.append((
        "triple_history (single-shuffle SCD-2 interval compaction)",
        "The row_number gaps-and-islands formulation costs a window sort "
        "plus a second (key, island) exchange; collecting each triple's "
        "bounded snapshot set once and splitting islands with array "
        "functions costs exactly ONE exchange — per-key state is bounded "
        "by corpus lifetime in snapshots, not observation count.",
        plan_th,
        ["Generate"]
        + ([f"<exactly 1 exchange, saw {n_ex_th}>"] if n_ex_th != 1
           else []),
        0,
    ))

    # 38. link_prediction: wedge join through the shared neighbor — no
    # all-pairs product; existing edges drop via LeftAnti; the global
    # top-k is TakeOrdered, never a full sort.
    plan_lk = formatted_plan(e.queries()["link_prediction"](spark, SF_DIR))
    sections.append((
        "link_prediction (Adamic-Adar wedges, anti-join, TakeOrdered)",
        "Candidates come from one self-join keyed on the wedge center "
        "(deg>=2 filtered BEFORE the 1/ln weight exists, so ANSI never "
        "divides by zero); a CartesianProduct would mean all-pairs "
        "scoring; the final top-k must be TakeOrderedAndProject.",
        plan_lk,
        ["LeftAnti", "TakeOrderedAndProject"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_lk
           else []),
        0,
    ))

    # 39. trending_entities: one count agg + one lag window, both keyed on
    # the node — the window partition holds (node, active-snapshot) rows,
    # bounded by corpus lifetime.
    plan_tr = formatted_plan(e.queries()["trending_entities"](spark, SF_DIR))
    n_ex_tr = len(re.findall(r"\(\d+\) Exchange", plan_tr))
    sections.append((
        "trending_entities (count agg + gap-aware lag window)",
        "Two exchanges total: the (node, snap) count and the per-node lag "
        "window; growth is computed gap-aware in the same projection.",
        plan_tr,
        ["Window", "HashAggregate"]
        + ([f"<exactly 2 exchanges, saw {n_ex_tr}>"] if n_ex_tr != 2
           else []),
        0,
    ))

    # 40. robots_filter: dimension-sized rule table broadcast into a LEFT
    # ANTI join (equi host + prefix residual); the page table never
    # shuffles; rule parsing is narrow regexp.
    plan_rb = formatted_plan(e.queries()["robots_filter"](spark, SF_DIR))
    sections.append((
        "robots_filter (broadcast anti-join politeness filter)",
        "The Disallow prefixes broadcast into BroadcastHashJoin LeftAnti "
        "with the prefix test as residual; a shuffled anti-join or a "
        "Python parser would put crawl politeness on the slow path.",
        plan_rb,
        ["BroadcastHashJoin", "LeftAnti"],
        0,
    ))

    # 41. sitemap_urls: xpath + explode is a codegen Generate — no Python
    # XML parsing in the plan.
    plan_sm = formatted_plan(e.queries()["sitemap_urls"](spark, SF_DIR))
    sections.append((
        "sitemap_urls (built-in xpath Generate, zero Python)",
        "Sitemap expansion must be the JVM xpath + Generate, one row's "
        "task per sitemap (the protocol caps a sitemap at 50k URLs).",
        plan_sm,
        ["Generate"],
        0,
    ))

    # 42. warc_records: header parsing is narrow regexp in codegen; no
    # Python, no shuffle — WARC ingestion is a pure scan-side map.
    plan_wc = formatted_plan(e.queries()["warc_records"](spark, SF_DIR))
    n_ex_wc = len(re.findall(r"\(\d+\) Exchange", plan_wc))
    sections.append((
        "warc_records (scan-side WARC record parsing, zero shuffle)",
        "Record splitting happens at the text source (lineSep) and header "
        "extraction is regexp in whole-stage codegen — ingestion of a "
        "multi-TB crawl must be a narrow map, no exchange, no Python.",
        plan_wc,
        ([f"<exactly 0 exchanges, saw {n_ex_wc}>"] if n_ex_wc != 0
         else []),
        0,
    ))

    # 43. kmeans_embeddings: the final assignment is a NARROW map against
    # broadcast-literal centroids — zero joins in the output plan; exact
    # integer arithmetic (no float argmin boundary).
    plan_km = formatted_plan(e.queries()["kmeans_embeddings"](spark, SF_DIR))
    sections.append((
        "kmeans_embeddings (literal-centroid narrow assignment)",
        "Lloyd's on Spark keeps the k x d model on the driver: the "
        "assignment must be a pure projection (zip_with distances + "
        "array_position argmin) with NO join and NO exchange — a "
        "centroid-table join per point would shuffle the embedding "
        "table every round.",
        plan_km,
        (["<no join>"] if "Join" in plan_km else [])
        + (["<no exchange>"] if "Exchange" in plan_km else []),
        0,
    ))

    # 44. bpe_encode: exactly ONE Arrow boundary node (the sanctioned
    # Python path, tagger contract) — and nothing else Python.
    plan_bp = formatted_plan(e.queries()["bpe_encode"](spark, SF_DIR))
    n_py_bp = len(re.findall(
        r"\(\d+\) (?:ArrowEvalPython|MapInPandas|BatchEvalPython)", plan_bp))
    sections.append((
        "bpe_encode (single Arrow boundary, broadcast merge model)",
        "Distributed BPE encoding rides mapInPandas with the trained "
        "merge list in the closure; the plan must contain exactly ONE "
        "Arrow node and no row-at-a-time Python.",
        plan_bp,
        ([f"<exactly 1 Arrow node, saw {n_py_bp}>"] if n_py_bp != 1
         else []) + (["<no BatchEvalPython>"] if "BatchEvalPython" in plan_bp
                     else []),
        1,
    ))

    # 45. hits_hosts: per half-round ONE equi-join of the score vector
    # against the edge table + ONE hash agg — never a cartesian product.
    plan_ht = formatted_plan(e.queries()["hits_hosts"](spark, SF_DIR))
    sections.append((
        "hits_hosts (per-half-round equi-join + hash agg)",
        "Unnormalized HITS power iteration: each half-round must be an "
        "equi-join keyed on the transmitting endpoint plus a partial+"
        "final hash aggregate on the receiving endpoint; a "
        "CartesianProduct would mean all-pairs score mixing.",
        plan_ht,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ht
           else []),
        0,
    ))

    # 46. khop_hosts: level-synchronous BFS — frontier equi-join + anti-
    # join against the visited set; the returned plan is the union of the
    # per-round checkpointed frontiers (flat lineage by construction).
    plan_kh = formatted_plan(e.queries()["khop_hosts"](spark, SF_DIR))
    sections.append((
        "khop_hosts (frontier BFS: scans of checkpointed frontiers)",
        "Each BFS round localCheckpoints its frontier, so the final plan "
        "must be a flat union over materialized round results (Scan "
        "ExistingRDD), not a 2^k-deep join tree — the lineage-growth "
        "guard for iterative graph ops.",
        plan_kh,
        ["Union"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_kh
           else []),
        0,
    ))

    # 47. semdedup: the pairwise verify must be an EQUI self-join keyed on
    # the k-means cluster (the blocking key) — never all-pairs.
    plan_sd = formatted_plan(e.queries()["semdedup"](spark, SF_DIR))
    sections.append((
        "semdedup (cluster-blocked pairwise cosine, no all-pairs)",
        "SemDeDup's whole point is that the quadratic verify is confined "
        "inside a cluster: the plan must join the two member sides on the "
        "cluster key (equi join) with the id inequality + cosine as "
        "residual; a CartesianProduct means the blocking failed.",
        plan_sd,
        (["<no cartesian product>"] if "CartesianProduct" in plan_sd
         else []),
        0,
    ))

    # 48. bm25_search: query terms broadcast-semi-filter the postings
    # BEFORE anything wide; the global top-k is TakeOrderedAndProject.
    plan_bm = formatted_plan(e.queries()["bm25_search"](spark, SF_DIR))
    sections.append((
        "bm25_search (broadcast query join, TakeOrdered top-k)",
        "The tens-of-terms query must broadcast into the postings join so "
        "only matching (doc, term) rows survive; the final top-k must be "
        "TakeOrderedAndProject (per-partition heap), never a global Sort "
        "of all scored documents.",
        plan_bm,
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        0,
    ))

    # 49. dsir_weights: bigrams from ONE lead window keyed on doc_id; the
    # bucket histogram (<= buckets rows) broadcasts back into the scoring
    # join — the corpus is never shuffled wider than its own doc_id.
    plan_ds = formatted_plan(e.queries()["dsir_weights"](spark, SF_DIR))
    sections.append((
        "dsir_weights (doc-keyed lead window, broadcast histogram)",
        "Hashed-bigram features come from a lead() window partitioned by "
        "doc_id; the Laplace-smoothed bucket table is bounded by the "
        "bucket count so it must enter the scoring join as a "
        "BroadcastHashJoin; zero Python anywhere.",
        plan_ds,
        ["Window", "BroadcastHashJoin"],
        0,
    ))

    # 50. ppr_hosts: same per-round shape as pagerank — one equi-join +
    # one hash agg, teleport re-added via a LEFT join to the materialized
    # node set; the seed table is broadcast.
    plan_pp = formatted_plan(e.queries()["ppr_hosts"](spark, SF_DIR))
    sections.append((
        "ppr_hosts (seed-teleport power iteration, pagerank shape)",
        "Each round must be an equi-join of the rank vector against the "
        "degree-carrying edge table plus one hash agg; the teleport "
        "vector re-enters via a join against the checkpointed seed-mass "
        "table — no cartesian product anywhere.",
        plan_pp,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_pp
           else []),
        0,
    ))

    # 51. ngram_containment: candidates-only verify (same contract as
    # ngram_jaccard) — the shingle join is keyed, never all-pairs.
    plan_nc = formatted_plan(e.queries()["ngram_containment"](spark, SF_DIR))
    sections.append((
        "ngram_containment (candidates-only asymmetric verify)",
        "Containment runs ONLY on LSH candidate pairs: the common-shingle "
        "count joins on (doc, shingle) keys and the sizes join is an "
        "equi-join; a CartesianProduct would mean all-pairs verification.",
        plan_nc,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_nc
           else []),
        0,
    ))

    # 52. weighted_sample: key assignment is a narrow map; the global
    # top-k must be TakeOrderedAndProject, never a full sort.
    plan_ws = formatted_plan(e.queries()["weighted_sample"](spark, SF_DIR))
    sections.append((
        "weighted_sample (narrow A-ES keys, TakeOrdered top-k)",
        "Efraimidis-Spirakis keys are md5+pow projections (no shuffle, no "
        "Python); the k-row sample must come from TakeOrderedAndProject "
        "per-partition heaps.",
        plan_ws,
        ["TakeOrderedAndProject"],
        0,
    ))

    # 53. random_walks: each step must be two 1:1 equi-joins (degree,
    # then (node, picked_rank)) — never a per-neighbor fan-out — and the
    # final plan a flat union of checkpointed steps.
    plan_rw = formatted_plan(e.queries()["random_walks"](spark, SF_DIR))
    sections.append((
        "random_walks (1:1 rank-keyed steps, flat union)",
        "The md5-picked next hop joins on (node, picked_rank) so a "
        "degree-10^6 hub never expands a walk row a million ways; steps "
        "are localCheckpointed (Scan ExistingRDD under a Union), the "
        "khop lineage contract.",
        plan_rw,
        ["Union"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_rw
           else []),
        0,
    ))

    # 54. scrub_dup_spans: positional grams from lead() windows on the
    # tokens table's own (doc_id, pos) key — one shuffle; coverage
    # expansion is a constant-factor Generate; no cartesian, no Python.
    plan_sc = formatted_plan(e.queries()["scrub_dup_spans"](spark, SF_DIR))
    sections.append((
        "scrub_dup_spans (lead-window grams, constant-factor coverage)",
        "Duplicate-span removal must stay keyed on the tokens table's "
        "natural key: lead windows for grams, two hash aggs for the "
        "df >= 2 table, a sequence+explode Generate for coverage, a "
        "LeftAnti to drop covered positions.",
        plan_sc,
        ["Window", "LeftAnti", "Generate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_sc
           else []),
        0,
    ))

    # 55. kcore_hosts: each peel round is two LeftSemi joins of the edge
    # table against the checkpointed survivor set + one degree agg.
    plan_kc = formatted_plan(e.queries()["kcore_hosts"](spark, SF_DIR))
    sections.append((
        "kcore_hosts (semi-join peel rounds over checkpointed survivors)",
        "kcore_nodes localCheckpoints each round's survivor table (the "
        "per-round LeftSemi+agg runs eagerly inside the loop), so the "
        "RETURNED plan must be just the materialized converged result — "
        "Scan ExistingRDD, flat lineage, no cartesian.",
        plan_kc,
        ["Scan ExistingRDD"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_kc
           else []),
        0,
    ))

    # 56. readability: one narrow projection — zero exchanges, zero
    # Python, whole-stage codegen.
    plan_rd = formatted_plan(e.queries()["readability"](spark, SF_DIR))
    n_ex_rd = len(re.findall(r"\(\d+\) Exchange", plan_rd))
    sections.append((
        "readability (single narrow projection)",
        "Flesch scoring must be a pure map over the scan: regexp counts "
        "+ split size + arithmetic, no exchange anywhere; '[codegen id' "
        "is the formatted-mode whole-stage-codegen marker.",
        plan_rd,
        ["[codegen id"]
        + ([f"<zero exchanges, saw {n_ex_rd}>"] if n_ex_rd != 0 else []),
        0,
    ))

    # 57. lm_backoff: trigram extraction narrow (no positional
    # self-join); counts are hash aggs; scoring joins are equi-joins.
    plan_lb = formatted_plan(e.queries()["lm_backoff"](spark, SF_DIR))
    sections.append((
        "lm_backoff (narrow trigram zip, equi-join scoring)",
        "Trigrams must come from in-row array ops (Generate over the "
        "transformed index sequence), never a (doc, pos) self-join; the "
        "count tables are partial+final hash aggs; no cartesian.",
        plan_lb,
        ["Generate", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_lb
           else []),
        0,
    ))

    # 58. clustering_entities: the triangle pass's degree-oriented wedge
    # join (equi-joins only) + one extra degree agg; no cartesian.
    plan_ce = formatted_plan(e.queries()["clustering_entities"](spark,
                                                                SF_DIR))
    sections.append((
        "clustering_entities (wedge equi-joins, no cartesian)",
        "LCC must reuse the triangle shape: SortMergeJoin/ShuffledHashJoin "
        "equi-joins for wedges + hash aggs for degrees — never an all-pairs "
        "neighbor product.",
        plan_ce,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ce
           else []),
        0,
    ))

    # 59. textrank_keywords: ONE Window exec for all lead distances (no
    # positional self-join), per-round equi-joins keyed (doc_id, token).
    # materialize=False: the production path localCheckpoints the edge
    # table (plan truncation is the point); audit the full lineage
    from saber_spark.operators.graph import textrank as _textrank
    plan_tk = formatted_plan(_textrank(
        e.tokenize_docs(e._docs(spark, SF_DIR)),
        window=2, iterations=3, top_k=3, materialize=False))
    sections.append((
        "textrank_keywords (single-window pair gen, equi-join rounds)",
        "Co-occurrence pairs must come from lead() windows over the tokens "
        "table's own (doc_id, pos) sort — exactly one Window node feeding "
        "the pair Generate — and every PageRank round is an equi-join + "
        "hash agg keyed (doc_id, token); no cartesian.",
        plan_tk,
        ["Window", "Generate", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_tk
           else []),
        0,
    ))

    # 60. tagger_agreement: marginals are category-bounded aggs; the
    # 1-row pe table rides in as a broadcast.
    plan_ka = formatted_plan(e.queries()["tagger_agreement"](spark, SF_DIR))
    sections.append((
        "tagger_agreement (category-bounded aggs, broadcast combine)",
        "Kappa must be two corpus aggs + two category-bounded marginal aggs "
        "with the 1-row expected-agreement table broadcast — nothing wider "
        "than |categories| shuffles after the map-side combine.",
        plan_ka,
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    # 61. auc_doclen: the window must run over the (group, score)
    # HISTOGRAM (agg BEFORE window), never raw corpus rows.
    plan_auc = formatted_plan(e.queries()["auc_doclen"](spark, SF_DIR))
    sections.append((
        "auc_doclen (histogram-then-window AUC)",
        "The cumulative-negatives window must consume the (group, score) "
        "histogram aggregate, so the sort is bounded by distinct scores per "
        "group — HashAggregate upstream of Window in the plan.",
        plan_auc,
        ["HashAggregate", "Window"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_auc
           else []),
        0,
    ))

    # 62. cms_tokens: the depth x width grid and the total ride in as
    # broadcasts; candidate estimates join the grid by (d, bucket).
    plan_cms = formatted_plan(e.queries()["cms_tokens"](spark, SF_DIR))
    sections.append((
        "cms_tokens (broadcast sketch grid)",
        "The CMS grid (depth*width rows) must BROADCAST into the candidate "
        "estimate join; the exact verify re-aggregates only surviving "
        "candidates via a broadcast semi-join.",
        plan_cms,
        ["BroadcastHashJoin", "HashAggregate"],
        0,
    ))

    # 63. rrf_search: both rank lists are top-k truncated before fusion;
    # the final top-k is a TakeOrderedAndProject, not a global sort.
    plan_rrf = formatted_plan(e.queries()["rrf_search"](spark, SF_DIR))
    sections.append((
        "rrf_search (top-k fusion, no global sort)",
        "Fusion consumes already-truncated rank lists (TakeOrderedAndProject "
        "in both branches) and the fused top-k is itself a "
        "TakeOrderedAndProject — no full-corpus Sort after the union.",
        plan_rrf,
        ["TakeOrderedAndProject", "HashAggregate"],
        0,
    ))

    # 64. span_corruption: mask decision is per-row arithmetic; both
    # texts reassemble via ordered collect (SortAggregate/ObjectHashAgg
    # on doc_id) — no per-row Python, no cartesian.
    plan_sc = formatted_plan(e.queries()["span_corruption"](spark, SF_DIR))
    sections.append((
        "span_corruption (hash mask, ordered-collect reassembly)",
        "The sentinel index is one Window over masked blocks; reassembly "
        "aggregates structs per doc_id; zero Python nodes.",
        plan_sc,
        ["Window", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_sc
           else []),
        0,
    ))

    # 65. skipgram_pairs: lead-window pair generation; negatives resolve
    # through BROADCAST joins (vocab + its 1-row size aggregate).
    plan_sg = formatted_plan(e.queries()["skipgram_pairs"](spark, SF_DIR))
    sections.append((
        "skipgram_pairs (window pairs, broadcast vocab negatives)",
        "Pairs come from lead() windows (no positional self-join); the "
        "negative id resolves against a BroadcastHashJoin on the "
        "vocab-bounded id table.",
        plan_sg,
        ["Window", "BroadcastHashJoin"],
        0,
    ))

    # 66. skew_canonical: histogram agg then a 1-row reduction; the
    # top-key pick must be an aggregate (max over struct), not a sort.
    plan_sk = formatted_plan(e.queries()["skew_canonical"](spark, SF_DIR))
    sections.append((
        "skew_canonical (histogram reduction, no global sort)",
        "The key histogram is a partial+final hash agg; the summary row "
        "reduces |keys| rows in one agg (max(struct) for the top key) — "
        "no Sort node over the histogram.",
        plan_sk,
        ["HashAggregate"],
        0,
    ))

    # 67. char_entropy: narrow regexp explode + two-phase aggs, zero
    # Python.
    plan_che = formatted_plan(e.queries()["char_entropy"](spark, SF_DIR))
    sections.append((
        "char_entropy (in-row split, two-phase aggs)",
        "Characters come from one Generate over regexp_extract_all; both "
        "aggregations are partial+final hash aggs; zero Python nodes.",
        plan_che,
        ["Generate", "HashAggregate"],
        0,
    ))

    # 68. abbrev_aliases: candidate sites from one in-row regexp pass
    # (Generate over the zipped capture groups); the only shuffle is the
    # alias-space agg; zero Python, no cartesian.
    plan_ab = formatted_plan(e.queries()["abbrev_aliases"](spark, SF_DIR))
    sections.append((
        "abbrev_aliases (in-row extraction, alias-space agg)",
        "Both capture groups come from one regexp_extract_all pass zipped "
        "in-row; word slicing/initials are codegen array ops; the only "
        "exchange feeds the (abbr, long_form) count-distinct agg.",
        plan_ab,
        ["Generate", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ab
           else []),
        0,
    ))

    # 69. kge_negatives: entity table + its size ride as broadcasts; the
    # filtered setting is ONE left-anti equi-join on the triple key.
    plan_kn = formatted_plan(e.queries()["kge_negatives"](spark, SF_DIR))
    sections.append((
        "kge_negatives (broadcast entities, anti-join filter)",
        "Corruption resolves through BroadcastHashJoins (entity ids + the "
        "1-row size aggregate); the filtered-negatives check is an anti "
        "equi-join, never a cartesian.",
        plan_kn,
        ["BroadcastHashJoin", "LeftAnti"],
        0,
    ))

    # 70. ktruss_hosts: each peel round's triangle pass must be
    # equi-joins (degree-oriented wedges) — no cartesian; the audited
    # plan is the final round's (upstream rounds are checkpointed).
    plan_kt = formatted_plan(e.queries()["ktruss_hosts"](spark, SF_DIR))
    sections.append((
        "ktruss_hosts (equi-join peel rounds)",
        "Per-round triangle support = degree-oriented wedge equi-joins + "
        "one support agg + one edge-keyed join; no cartesian anywhere.",
        plan_kt,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_kt
           else []),
        0,
    ))

    # 71. wl_fingerprint: each refinement round is ONE equi-join of the
    # color vector against the checkpointed edges + one sorted-collect
    # agg — linear plan growth, zero Python.
    plan_wl = formatted_plan(e.queries()["wl_fingerprint"](spark, SF_DIR))
    sections.append((
        "wl_fingerprint (one join + one agg per WL round)",
        "Color refinement must join the edge table against the color "
        "vector exactly once per round (SortMergeJoin/ShuffledHashJoin "
        "equi-join) with the neighbor multiset built by a sorted collect "
        "agg; no cartesian, zero Python.",
        plan_wl,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_wl
           else []),
        0,
    ))

    # 72. entity_centroids: mention multiplicity collapses BEFORE the
    # embeddings join; sums are partial+final aggs on (entity, dim).
    plan_ec = formatted_plan(e.queries()["entity_centroids"](spark,
                                                             SF_DIR))
    sections.append((
        "entity_centroids (distinct-first, two-phase sums)",
        "The (entity, doc) distinct runs before the embeddings equi-join "
        "so mention multiplicity never multiplies vector rows; the "
        "component sums are map-side-combined hash aggs.",
        plan_ec,
        ["HashAggregate", "Generate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ec
           else []),
        0,
    ))

    # 73. sssp_hosts: each relaxation round is one equi-join + one
    # min-agg (distance table referenced once via self-edges); the
    # returned plan is the converged round over checkpointed inputs.
    plan_ss = formatted_plan(e.queries()["sssp_hosts"](spark, SF_DIR))
    sections.append((
        "sssp_hosts (one join + one min-agg per relaxation)",
        "Bellman-Ford rounds must be equi-join + hash min-agg (no "
        "cartesian); integer cost arithmetic keeps the result "
        "engine-exact.",
        plan_ss,
        []
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ss
           else []),
        0,
    ))

    # 74. chunk_documents: membership is per-row arithmetic + constant-
    # factor Generate; reassembly aggregates on (doc, chunk).
    plan_cd = formatted_plan(e.queries()["chunk_documents"](spark, SF_DIR))
    sections.append((
        "chunk_documents (constant-factor explode, chunk-keyed agg)",
        "Chunk membership must be a Generate over an in-row integer "
        "sequence (never a chunk-table join); reassembly is one hash agg "
        "keyed (doc, chunk) — finer than doc_id, long docs spread.",
        plan_cd,
        ["Generate", "HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_cd
           else []),
        0,
    ))

    # 75. linkpred_auc: the AA candidate wedge join + the histogram AUC
    # window; never all-pairs.
    plan_lp = formatted_plan(e.queries()["linkpred_auc"](spark, SF_DIR))
    sections.append((
        "linkpred_auc (wedge candidates, histogram AUC)",
        "Candidate scoring is the shared wedge equi-join; labels are one "
        "left join against the test half; the AUC window runs over the "
        "distinct-score histogram. No cartesian.",
        plan_lp,
        ["HashAggregate", "Window"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_lp
           else []),
        0,
    ))

    # 76. calibration_quality: one bucket-keyed two-phase agg.
    plan_cq = formatted_plan(e.queries()["calibration_quality"](spark,
                                                                SF_DIR))
    sections.append((
        "calibration_quality (bucket-keyed two-phase agg)",
        "The reliability diagram must reduce to one partial+final hash "
        "agg keyed by the integer bucket; zero Python.",
        plan_cq,
        ["HashAggregate"],
        0,
    ))

    # 77. rule_confidence: mid-keyed self-join -> distinct body pairs ->
    # (a, b)-keyed head join; hub exclusion; never all-pairs.
    plan_rc = formatted_plan(e.queries()["rule_confidence"](spark, SF_DIR))
    sections.append((
        "rule_confidence (body-pair dedup before head join)",
        "Body pairs must be DISTINCT (pred1, pred2, a, b) — multi-mid "
        "fan-in collapses before the head equi-join — and both the body "
        "self-join and the head join are hash equi-joins with the hub-mid "
        "semi-join filter up front. No cartesian.",
        plan_rc,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_rc
           else []),
        0,
    ))

    # 78. resolve_weighted: decimal mass agg + struct-min winner, no
    # window sort, reliability table broadcast-sized.
    plan_rw = formatted_plan(e.queries()["resolve_weighted"](spark, SF_DIR))
    sections.append((
        "resolve_weighted (decimal mass, struct-min winner)",
        "Round-2 fusion must be two hash aggs (claim mass, then per-slot "
        "struct-min winner + total) with NO per-slot window sort; the "
        "round-1 reliability table joins at source cardinality.",
        plan_rw,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_rw
           else []),
        0,
    ))

    # r5: JSON-LD structured-triple extraction — pure narrow JVM map
    plan_jt = formatted_plan(e.q_jsonld_triples(spark, SF_DIR))
    sections.append((
        "jsonld_triples (schema.org block -> triples)",
        "Structured-data harvesting must be a ZERO-shuffle narrow map: "
        "regexp extract + from_json + inline all inside codegen, no Python "
        "eval, no Exchange — at 100 TB this stage runs at scan speed.",
        plan_jt,
        ["Generate"]
        + (["<no exchange>"] if "Exchange" in plan_jt else []),
        0,
    ))

    # r5: hashed-trigram linear scorer — higher-order aggregate, no explode
    plan_hs = formatted_plan(e.q_hashed_ngram_score(spark, SF_DIR))
    sections.append((
        "hashed_ngram_score (fastText-style linear scorer)",
        "The trigram sweep is a per-row higher-order aggregate over a "
        "position sequence — NO explode, NO shuffle, NO Python. The classic "
        "explode->groupBy formulation would shuffle ~len(text) rows/doc.",
        plan_hs,
        ["Project"]
        + (["<no exchange>"] if "Exchange" in plan_hs else []),
        0,
    ))

    # r5: blocking metrics — algebraic pair counts, never the pair space
    plan_bm = formatted_plan(e.q_blocking_metrics(spark, SF_DIR))
    sections.append((
        "blocking_metrics (ER blocking quality)",
        "Candidate-pair counts must come from one hash agg per scheme "
        "(sum nb*(nb-1)/2) — the quadratic candidate space is NEVER "
        "materialized and no cartesian product appears.",
        plan_bm,
        ["HashAggregate"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_bm
           else []),
        0,
    ))

    # r5: ANF reach — per-round equi-join + bit_or partial agg
    plan_ar = formatted_plan(e.q_anf_reach(spark, SF_DIR))
    sections.append((
        "anf_reach (HyperBall FM-sketch reach)",
        "Each OR-round must be one equi-join + one partial+final bit_or "
        "hash aggregate; the node state is a single int64 sketch (never a "
        "frontier set) and no cartesian product appears. (At sf0.01 the "
        "joins resolve to broadcast; at scale AQE picks shuffle hash/SMJ "
        "on the same logical plan.)",
        plan_ar,
        ["HashAggregate", "Join"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_ar
           else []),
        0,
    ))

    # r5: winnowing — per-doc window min, one doc-keyed exchange chain
    plan_wf = formatted_plan(e.q_winnow_fingerprint(spark, SF_DIR))
    sections.append((
        "winnow_fingerprint (MOSS winnowing digest)",
        "Winnowing is per-document: the k-gram explode feeds ONE "
        "doc_id-partitioned ROWS-frame window min, and the digest groupBy "
        "reuses the same doc_id partitioning (no second cross-doc "
        "shuffle shape). No Python eval.",
        plan_wf,
        ["Window", "HashAggregate"],
        0,
    ))

    # r5 batch 2: markup tables — three narrow generate passes, no shuffle
    plan_ht = formatted_plan(e.q_html_tables(spark, SF_DIR))
    sections.append((
        "html_tables (markup-table cell tuples)",
        "Three nested regexp_extract_all + posexplode passes must stay "
        "narrow: no Exchange, no Python — output cardinality is the cell "
        "count, reached without shuffling the html.",
        plan_ht,
        ["Generate"]
        + (["<no exchange>"] if "Exchange" in plan_ht else []),
        0,
    ))

    # r5 batch 2: commonness prior — one pair agg + per-anchor windows
    plan_ac = formatted_plan(e.q_anchor_commonness(spark, SF_DIR))
    sections.append((
        "anchor_commonness (EL sense prior)",
        "One (anchor, host) hash agg with map-side combine; the per-anchor "
        "total and argmax run as windows over the ALREADY-AGGREGATED pair "
        "table (never the raw anchors), sharing the anchor partitioning.",
        plan_ac,
        ["HashAggregate", "Window"],
        0,
    ))

    # r5 batch 2: host boilerplate — hashed line keys, host co-partition
    plan_hb = formatted_plan(e.q_host_boilerplate(spark, SF_DIR))
    sections.append((
        "host_boilerplate (site template rate)",
        "Line counts key on (host, xxhash64(line)) — an 8-byte line key; "
        "the per-line and per-host aggregates are partial+final hash aggs "
        "and the page-count join is host-keyed. No Python.",
        plan_hb,
        ["HashAggregate", "xxhash64"],
        0,
    ))

    # r5 batch 2: co-citation — wedge joins, never all-pairs
    plan_cc = formatted_plan(e.q_cocitation_hosts(spark, SF_DIR))
    sections.append((
        "cocitation_hosts (co-citation + coupling)",
        "Both measures come from wedge self-joins through the shared "
        "endpoint (the triangle-join shape) + one full-outer pair merge — "
        "no cartesian product anywhere.",
        plan_cc,
        ["HashAggregate", "Join"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_cc
           else []),
        0,
    ))

    # r5: table->triple recovery — two equi-joins on table-local keys
    plan_tt = formatted_plan(e.q_table_triples(spark, SF_DIR))
    sections.append((
        "table_triples (WebTables fact recovery)",
        "Header and entity-column slices join back on (url, table_idx, "
        "col/row) — plain equi-joins (broadcastable per shard), no window, "
        "no Python, no cartesian product.",
        plan_tt,
        ["Join"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_tt
           else []),
        0,
    ))

    # r5 read-side KG: BGP = pushed-down scans + equi-join chain + anti
    plan_bgp = formatted_plan(e.q_bgp_query(spark, SF_DIR))
    sections.append((
        "bgp_query (SPARQL BGP: pushdown + equi-join chain + anti-join)",
        "Every triple pattern is ONE scan with its predicate constant "
        "pushed as a filter; the conjunction is a selectivity-ordered "
        "equi-join chain on binding variables; FILTER NOT EXISTS is a "
        "LeftAnti join. No cartesian product (bgp_match raises on "
        "disconnected patterns instead of emitting one), no Python.",
        plan_bgp,
        ["Join", "LeftAnti"]
        + (["<no cartesian product>"] if "CartesianProduct" in plan_bgp
           else []),
        0,
    ))

    # r5 read-side KG: characteristic sets = two hash aggs, no join
    plan_cs = formatted_plan(e.q_char_sets(spark, SF_DIR))
    sections.append((
        "char_sets (characteristic sets: two aggs, schema-sized state)",
        "Per-subject collect_set(pred) state is schema-sized (distinct "
        "predicates, dozens), never triple-count-sized; the set-shape "
        "roll-up keys on the joined set string. Two partial+final hash "
        "aggs, no window, no join above the store derivation, no Python.",
        plan_cs,
        ["HashAggregate", "collect_set"],
        0,
    ))

    # r5 temporal KG: snapshot diff = one bool_or agg over the compact
    # interval table (no second as-of read, no full-outer join)
    plan_tt2 = formatted_plan(e.q_kg_timetravel(spark, SF_DIR))
    sections.append((
        "kg_timetravel (snapshot diff from the SCD-2 interval table)",
        "The delta between two snapshots is ONE bool_or aggregate over "
        "the interval table (covers-s1 / covers-s2 per triple) — not two "
        "as-of reads full-outer-joined (which would shuffle the store "
        "twice); the min-snapshot anchor arrives via a broadcast one-row "
        "cross join, no driver collect.",
        plan_tt2,
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    # r5 read-side KG: VoID stats = one schema-sized agg (expand for
    # the two exact distincts), no join, no Python
    plan_void = formatted_plan(e.q_void_stats(spark, SF_DIR))
    sections.append((
        "void_stats (VoID property partitions: one grouped agg)",
        "Per-predicate triple + distinct subject/object counts in one "
        "grouped aggregation keyed on the predicate (expand + two-phase "
        "partial/final for the exact distincts; exact=False swaps in "
        "HLL). Output is schema-sized. No join above the store "
        "derivation, no window, no Python.",
        plan_void,
        ["HashAggregate", "Expand"],
        0,
    ))

    # r5 read-side KG: entity cards = two map-side-combinable aggs
    plan_card = formatted_plan(e.q_entity_card(spark, SF_DIR))
    sections.append((
        "entity_card (CBD skeleton: struct-min modal agg, no window)",
        "Both direction projections of the SAME store scan union without "
        "a barrier, then two hash aggs (partial before each Exchange): "
        "per-neighbor counts, then the card roll-up whose min(struct(-n, "
        "nbr)) picks the modal neighbor inside the agg — no window, no "
        "self-join, no Python.",
        plan_card,
        ["HashAggregate", "hashpartitioning"],
        0,
    ))

    # r5 RDF interop: serialize -> parse must stay pure codegen'd
    # string Projects over the store (no Python, no extra shuffle —
    # the only exchanges belong to the store's own distinct)
    plan_nt = formatted_plan(e.q_ntriples_roundtrip(spark, SF_DIR))
    sections.append((
        "ntriples_roundtrip (RDF dump serialize+parse: scan-speed Projects)",
        "Both N-Triples directions (ECHAR escape via literal "
        "StringReplace chains, structural regexp_extract parse) must "
        "collapse to plain Project nodes stacked directly on the store "
        "derivation (codegen'd at execution; AQE formatted output does "
        "not print WholeStageCodegen markers) — zero Python eval nodes "
        "and no shuffle beyond the store's set-semantics distinct "
        "(HashAggregate pair per union branch), so a 10^12-triple dump "
        "serializes at scan speed.",
        plan_nt,
        ["Project", "HashAggregate", "Union"],
        0,
    ))

    # round-5 final batch: PQ encode, quote harvesting, nDCG, FD mining
    pq = e.q_pq_codes(spark, SF_DIR)
    sections.append((
        "pq_codes (narrow codebook argmin)",
        "PQ assignment must be a NARROW map: the broadcast-literal codebook "
        "argmin runs as higher-order expressions feeding one Generate "
        "(explode of the m per-subspace structs) — zero Python nodes; the "
        "only other job is the bounded codebook collect at build time.",
        formatted_plan(pq),
        ["Generate"],
        0,
    ))

    qa = e.q_quote_attribution(spark, SF_DIR)
    sections.append((
        "quote_attribution (JVM regex harvest)",
        "Both reported-speech frames are regexp_extract_all + arrays_zip "
        "inside codegen feeding Generate explodes, unioned — no Python "
        "node anywhere, no shuffle introduced by the operator itself.",
        formatted_plan(qa),
        ["Union", "Generate"],
        0,
    ))

    nd = e.q_ndcg_eval(spark, SF_DIR)
    sections.append((
        "ndcg_eval (single-scan ranking windows)",
        "Queries ride in as an exploded broadcast literal over ONE scan; "
        "tf/rel are higher-order filters in codegen; the two rankings are "
        "row_number windows on the same (term) partitioning feeding one "
        "hash agg — the per-term exchange is the only wide stage.",
        formatted_plan(nd),
        ["Window", "HashAggregate"],
        0,
    ))

    fdm = e.q_fd_mining(spark, SF_DIR)
    sections.append((
        "fd_mining (per-candidate two-phase aggs)",
        "Each candidate FD is an independent (lhs, rhs) partial+final hash "
        "agg over the same scan collapsing to one row, unioned — map-side "
        "combine bounds every shuffle by the attribute cardinality.",
        formatted_plan(fdm),
        ["HashAggregate", "Union"],
        0,
    ))

    rd = e.q_rdfs_entailment(spark, SF_DIR)
    sections.append((
        "rdfs_entailment (broadcast rule joins + dimension closure)",
        "The domain/range schema tables and the subClassOf closure are "
        "BROADCAST into the instance joins (the store is the only "
        "corpus-scale side, touched twice plus one distinct); the "
        "path-doubling closure iterates on dimension-sized data only.",
        formatted_plan(rd),
        ["BroadcastHashJoin", "HashAggregate"],
        0,
    ))

    ob = e.q_optional_bgp(spark, SF_DIR)
    sections.append((
        "optional_bgp (SPARQL OPTIONAL as left join)",
        "The OPTIONAL pattern must evaluate as a LEFT OUTER equi-join on "
        "the shared binding variable — unbound ?p survives as NULL into "
        "the per-customer rollup; constants are pushed into both pattern "
        "scans.",
        formatted_plan(ob),
        ["LeftOuter", "HashAggregate"],
        0,
    ))

    sm = e.q_schema_matching(spark, SF_DIR)
    sections.append((
        "schema_matching (value-overlap column alignment)",
        "Each side unpivots via ONE narrow explode then dedupes with a "
        "partial+final hash agg; the only corpus-wide exchange is the "
        "value equi-join of the already-distinct sides; per-column "
        "cardinalities join back as broadcasts — no column-pair cross "
        "join anywhere.",
        formatted_plan(sm),
        ["Generate", "HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    ke = e.q_transe_score(spark, SF_DIR)
    sections.append((
        "transe_score (broadcast embedding joins + codegen energy)",
        "The store is localCheckpointed ONCE across relation legs (its "
        "derivation joins/distinct are paid before this plan starts — "
        "the scan here is the materialized RDD); head and tail entities "
        "each resolve with a BROADCAST equi-join against the quantized "
        "embedding table per leg, the relation vector folds into dim "
        "scalar codegen terms, and the per-relation top-k prunes "
        "map-side via WindowGroupLimit before the single exchange.",
        formatted_plan(ke),
        ["BroadcastHashJoin", "WindowGroupLimit", "Window"],
        0,
    ))

    fr2 = e.q_fact_ranking(spark, SF_DIR)
    sections.append((
        "fact_ranking (global value counts + per-subject window)",
        "One (pred, obj) partial+final hash agg for the global value "
        "counts, one equi-join back on the same keys, N as a broadcast "
        "1-row aggregate, and the per-subject top-k window — hub objects "
        "collapse in the map-side combine before any shuffle.",
        formatted_plan(fr2),
        ["HashAggregate", "Window"],
        0,
    ))

    ii = e.q_inverted_index(spark, SF_DIR)
    sections.append((
        "inverted_index (in-agg posting build)",
        "Postings build in ONE (token, doc) hash agg with positions "
        "collected and array_sorted INSIDE the aggregate (no window, no "
        "per-doc explode-back); doc frequency is a second agg of the "
        "already-reduced posting table joined back on the token key.",
        formatted_plan(ii),
        ["HashAggregate", "hashpartitioning"],
        0,
    ))

    ph = e.q_phrase_search(spark, SF_DIR)
    sections.append((
        "phrase_search (anchored posting intersection)",
        "Each phrase term is one filtered scan projected to (doc, "
        "pos - i); the conjunction is an equi-join on the shared (doc, "
        "anchor) key — the BGP join shape applied to positions; one "
        "final per-doc agg.",
        formatted_plan(ph),
        ["HashAggregate"],
        0,
    ))

    ec = e.q_expectations_check(spark, SF_DIR)
    sections.append((
        "expectations_check (one aggregate per constraint)",
        "Every expectation is ONE aggregate over the same scan — "
        "violations count as codegen'd predicate sums (uniqueness is "
        "the lone two-phase value agg) — unioned as single-row "
        "verdicts; nothing corpus-sized survives any stage.",
        formatted_plan(ec),
        ["HashAggregate", "Union"],
        0,
    ))

    ms = e.q_measurements(spark, SF_DIR)
    sections.append((
        "measurements (regexp harvest + literal SI table)",
        "One regexp_extract_all pass per group zipped positionally into a "
        "Generate; the unit->SI conversion is a codegen'd when-chain over "
        "the fixed unit vocabulary — no join, no Python, no shuffle.",
        formatted_plan(ms),
        ["Generate"],
        0,
    ))

    cu = e.q_cusum_changepoints(spark, SF_DIR)
    sections.append((
        "cusum_changepoints (two windows, one partitioning)",
        "Daily counts reduce in a partial+final hash agg; the running sum "
        "and running min share ONE (key, day) window partitioning; per-key "
        "moments ride in as a broadcast join of a schema-sized aggregate.",
        formatted_plan(cu),
        ["HashAggregate", "Window"],
        0,
    ))

    gi = e.q_gini_concentration(spark, SF_DIR)
    sections.append((
        "gini_concentration (rank window over reduced counts)",
        "The (group, key) counts reduce in a partial+final hash agg "
        "BEFORE the rank window, so the window input is key-cardinality-"
        "sized; the final agg is one row per group.",
        formatted_plan(gi),
        ["HashAggregate", "Window"],
        0,
    ))

    ae = e.q_analogy_eval(spark, SF_DIR)
    sections.append((
        "analogy_eval (broadcast targets, WindowGroupLimit top-1)",
        "Targets are literal legs over ONE corpus scan (dim scalar "
        "codegen terms per row); the per-quad top-1 prunes map-side via "
        "WindowGroupLimit before the exchange.",
        formatted_plan(ae),
        ["WindowGroupLimit", "Union"],
        0,
    ))

    sv = e.q_shacl_validate(spark, SF_DIR)
    sections.append((
        "shacl_validate (one fact agg, broadcast shape joins)",
        "The fact table reduces in ONE (subj, pred) hash agg; all three "
        "constraint branches join broadcast shape literals; the minCount "
        "branch expands the entity-side types table by preds-per-class, "
        "never the fact table.",
        formatted_plan(sv),
        ["HashAggregate", "BroadcastHashJoin", "Union"],
        0,
    ))

    pj = e.q_ppjoin_similarity(spark, SF_DIR)
    sections.append((
        "ppjoin_similarity (prefix-filtered candidates, exact verify)",
        "Candidates join only frequency-ascending token prefixes (window "
        "prunes to p = |d| - ceil(t|d|) + 1 rows per doc); the length "
        "filter prunes before the exact-intersection verification joins.",
        formatted_plan(pj),
        ["Window", "BroadcastHashJoin", "HashAggregate"],
        0,
    ))

    tt = e.q_texttiling(spark, SF_DIR)
    sections.append((
        "texttiling (adjacent-block equi-join, gap-sized window)",
        "Block term counts reduce map-side; the cosine comes from an "
        "equi-join on (doc, blk+1, token) — no doc-level self-join — and "
        "the boundary window runs over gap-cardinality rows per doc.",
        formatted_plan(tt),
        ["HashAggregate", "Window"],
        0,
    ))

    fs = e.q_fellegi_sunter(spark, SF_DIR)
    sections.append((
        "fellegi_sunter (1-row parameter broadcast, no pair shuffle)",
        "The m/u parameter estimate reduces the labeled pairs to ONE row "
        "via a partial+final hash aggregate; scoring applies that row to "
        "every candidate pair through a broadcast nested-loop join "
        "(1-row build side), so the pair stream itself never exchanges.",
        formatted_plan(fs),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    fse = e.q_fellegi_sunter_em(spark, SF_DIR)
    sections.append((
        "fellegi_sunter_em (literal learned params, narrow scoring)",
        "After the EM rounds (each one hash agg collected as a 1-row "
        "model, not visible in this scoring plan), the learned m/u/lambda "
        "are literals: scoring is a narrow projection over the "
        "checkpointed pairs — no join, no exchange introduced by the "
        "matcher itself.",
        formatted_plan(fse),
        ["Project"],
        0,
    ))

    sn = e.q_sorted_neighborhood(spark, SF_DIR)
    sections.append((
        "sorted_neighborhood (distributed rank, rank equi-join)",
        "Ranks come from a range repartition + per-partition row_number "
        "plus broadcast partition offsets — the record-level Window is "
        "partitioned by _pid (no single-task global sort over records); "
        "pairing is an equi-join on the rank key.",
        formatted_plan(sn),
        ["Window", "BroadcastHashJoin"],
        0,
    ))

    rz = e.q_rendezvous_shards(spark, SF_DIR)
    sections.append((
        "rendezvous_shards (narrow argmax, no join/shuffle)",
        "Both HRW assignments (8 and 9 shards) plus the moved flag are "
        "one narrow projection over the scan — no Exchange, no join, no "
        "Python; the md5 weight legs all fold into whole-stage codegen.",
        formatted_plan(rz),
        ["Project", "codegen id"],
        0,
    ))

    kga = e.q_kg_align(spark, SF_DIR)
    sections.append((
        "kg_align (shared-fact equi-join, WindowGroupLimit argmax)",
        "Candidate pairs come ONLY from the (pred, obj) equi-join — "
        "never an entity cross join; per-entity counts are partial+final "
        "hash aggs; the mutual-best filter compiles to WindowGroupLimit "
        "passes (map-side top-1 pruning).",
        formatted_plan(kga),
        ["HashAggregate", "WindowGroupLimit"],
        0,
    ))

    pq = e.q_partition_quality(spark, SF_DIR)
    sections.append((
        "partition_quality (dimension joins, k-row load agg)",
        "node->part is one projection over the distinct nodes (the ntile "
        "window runs on the node dimension, not the corpus); the cut "
        "count is two equi-joins of edges against that map plus one "
        "aggregate.",
        formatted_plan(pq),
        ["HashAggregate", "Window"],
        0,
    ))

    lq = e.q_logreg_quality(spark, SF_DIR)
    sections.append((
        "logreg_quality (literal learned weights, narrow scoring)",
        "After the GD steps (each one hash agg collected as a "
        "|features|-row gradient, not visible here), the learned weights "
        "are literals: scoring is a narrow projection over the "
        "checkpointed features — no join, no exchange, no Python.",
        formatted_plan(lq),
        ["Project"],
        0,
    ))

    rdfa = e.q_rdfa_triples(spark, SF_DIR)
    sections.append((
        "rdfa_triples (narrow regexp scans, zero exchange)",
        "All three branches (typeof, span properties, meta properties) "
        "are narrow regexp projections over the same page scan unioned "
        "together — no Exchange, no Python; the element explode is a "
        "codegen Generate and scope-less pages are filtered before any "
        "element scan runs.",
        formatted_plan(rdfa),
        ["Union", "Generate"],
        0,
    ))

    oie = e.q_openie_triples(spark, SF_DIR)
    sections.append((
        "openie_triples (codegen regexp explode, one grouped agg)",
        "The verb-frame scan is regexp_extract_all + Generate inside "
        "whole-stage codegen (no Python); the only corpus-sized exchange "
        "is the partial-count agg keyed on (triple, doc_id) — the "
        "distinct-doc support then reduces over ALREADY-aggregated rows "
        "in the second, triple-keyed exchange (classic two-phase "
        "distinct aggregation).",
        formatted_plan(oie),
        ["Generate", "HashAggregate", "partial_count(distinct"],
        0,
    ))

    gt = e.q_good_turing(spark, SF_DIR)
    sections.append((
        "good_turing (one corpus shuffle, histogram-sized join)",
        "The type-frequency agg is the only corpus-sized exchange "
        "(partial+final); the count-of-counts agg and the r+1 self-join "
        "operate on the histogram (~tens of rows).",
        formatted_plan(gt),
        ["HashAggregate"],
        0,
    ))

    zf = e.q_zipf_fit(spark, SF_DIR)
    sections.append((
        "zipf_fit (vocab-bounded rank window, 1-row moment agg)",
        "The corpus reduces in one type-frequency agg; the global rank "
        "window runs over the VOCABULARY (vocab_ids convention) and the "
        "moment aggregate reduces map-side to a single row.",
        formatted_plan(zf),
        ["Window", "HashAggregate"],
        0,
    ))

    tc = e.q_temporal_conflicts(spark, SF_DIR)
    sections.append((
        "temporal_conflicts (co-partitioned interval self-join)",
        "Both join legs share the one (subj, pred) exchange of the "
        "history build; the overlap predicate is a post-join filter over "
        "snapshot-horizon-bounded per-key rows — no cartesian, no "
        "Python.",
        formatted_plan(tc),
        ["HashAggregate"],
        0,
    ))

    pb = e.q_phonetic_blocking(spark, SF_DIR)
    sections.append((
        "phonetic_blocking (codegen key chain, one vocab window)",
        "The Soundex-style key is a narrow regexp_replace chain inside "
        "whole-stage codegen; block sizes come from ONE count window "
        "partitioned on the key — a single exchange of the name "
        "dimension, with no join-back re-reading the corpus lineage "
        "(the groupBy+join variant measured 4.8 s vs 0.7 s steady).",
        formatted_plan(pb),
        ["Window", "regexp_replace"],
        0,
    ))

    eh = e.q_entity_hindex(spark, SF_DIR)
    sections.append((
        "entity_hindex (reduced-counts rank window, two aggs)",
        "The (label, doc) mention agg reduces the corpus map-side; the "
        "per-label rank window runs over the REDUCED doc counts (gini "
        "convention) and the final h/max agg is map-side combinable.",
        formatted_plan(eh),
        ["HashAggregate", "Window"],
        0,
    ))

    ut = e.q_url_templates(spark, SF_DIR)
    sections.append((
        "url_templates (narrow template regexps, one keyed agg)",
        "Host/path/template are codegen regexps over the scan; the "
        "profile is one (host, template) hash agg with map-side "
        "partials, the distinct-path count riding the same key via the "
        "two-phase distinct plan.",
        formatted_plan(ut),
        ["HashAggregate", "partial_count(distinct"],
        0,
    ))

    se = e.q_subprop_entailment(spark, SF_DIR)
    sections.append((
        "subprop_entailment (broadcast rule joins, one distinct)",
        "The subPropertyOf closure is schema-sized path doubling; the "
        "fact table is touched by BROADCAST ancestor/inverse joins and "
        "one final distinct — no corpus-scale iteration, mirroring "
        "rdfs_entailment.",
        formatted_plan(se),
        ["BroadcastHashJoin", "HashAggregate", "Union"],
        0,
    ))

    sr = e.q_sameas_rewrite(spark, SF_DIR)
    sections.append((
        "sameas_rewrite (edge-dimension CC, two canon joins)",
        "The sameAs closure runs on the alignment-output edge dimension "
        "(lazy bounded rounds here); the store is touched by two canon "
        "left joins + one distinct — no fact-scale iteration.",
        formatted_plan(sr),
        ["HashAggregate"],
        0,
    ))

    no = e.q_noisyor_confidence(spark, SF_DIR)
    sections.append((
        "noisyor_confidence (one triple-keyed agg, log-space product)",
        "The fusion is ONE hash agg keyed on the triple with map-side "
        "partial sums of ln(1-c) — no joins, no window, no Python; the "
        "product never materializes.",
        formatted_plan(no),
        ["HashAggregate", "partial_sum"],
        0,
    ))

    tp = e.q_transitive_property(spark, SF_DIR)
    sections.append((
        "transitive_property (fact-scale path doubling)",
        "Instance-level closure: log(depth) rounds of ONE self-join + "
        "distinct over the chain edges, each round lineage-cut with "
        "localCheckpoint (transitive_closure's convention) — so the "
        "final plan is a narrow projection over the LAST materialized "
        "round; the per-round join/distinct plans were audited when "
        "the operator landed (ontology.transitive_closure).",
        formatted_plan(tp),
        ["Scan ExistingRDD", "Project"],
        0,
    ))

    ar = e.q_allen_relations(spark, SF_DIR)
    sections.append((
        "allen_relations (co-partitioned pair join, codegen CASE)",
        "Same shape as temporal_conflicts: one (subj, pred) exchange "
        "feeds the interval self-join; the 13-way classification is a "
        "narrow mutually-exclusive CASE inside codegen.",
        formatted_plan(ar),
        ["HashAggregate", "CASE WHEN"],
        0,
    ))

    cx = e.q_complex_score(spark, SF_DIR)
    sections.append((
        "complex_score (relation literals folded, top-k pruned)",
        "transe/distmult shape: the store is localCheckpointed ONCE "
        "across relation legs; head and tail entities each resolve with "
        "a BROADCAST equi-join against the quantized embedding table; "
        "the 4-term ComplEx expansion is per-dimension integer literals "
        "inside codegen (no HOF lambda on the interpreted path); "
        "per-relation top-k prunes map-side via WindowGroupLimit. "
        "No cross join, no Python.",
        formatted_plan(cx),
        ["BroadcastHashJoin", "WindowGroupLimit", "Window"],
        0,
    ))

    hc = e.q_harmonic_hosts(spark, SF_DIR)
    sections.append((
        "harmonic_hosts (BFS rounds lineage-cut, one final agg)",
        "Level-synchronous multi-landmark BFS: each round joined ONLY "
        "the frontier and localCheckpointed it, so the final plan is "
        "the per-node aggregation over the materialized visited set — "
        "lineage stays flat no matter how many rounds ran.",
        formatted_plan(hc),
        ["HashAggregate", "Scan ExistingRDD"],
        0,
    ))

    rk = e.q_rake_keywords(spark, SF_DIR)
    sections.append((
        "rake_keywords (doc_id-keyed stats join, narrow candidates)",
        "Candidate phrases are built by a narrow map (tokenize -> "
        "delimiter-mark -> rejoin -> split); the word-stats agg, the "
        "stats join back, the phrase-score agg and the per-doc top-k "
        "window all key on doc_id; top-k prunes via WindowGroupLimit.",
        formatted_plan(rk),
        ["WindowGroupLimit", "HashAggregate"],
        0,
    ))

    ka = e.q_k_anonymity(spark, SF_DIR)
    sections.append((
        "k_anonymity (two algebraic aggs, single verdict row)",
        "Equivalence classes build in ONE hash agg over the quasi-"
        "identifier key (count + distinct-sensitive, partial-"
        "aggregatable); the verdict is a second agg over the reduced "
        "class table. No join, no window, no Python.",
        formatted_plan(ka),
        ["HashAggregate"],
        0,
    ))

    kn = e.q_kneser_ney(spark, SF_DIR)
    sections.append((
        "kneser_ney (one corpus-scale pair agg, reduced-side model)",
        "Bigrams zip out of the token array row-locally (no positional "
        "self-join); c(w1 w2) is the single corpus-scale hash agg; "
        "c(w1)/N1+(w1,*)/N1+(*,w2)/type-total all aggregate the "
        "already-reduced pair table; the type total rides in as a "
        "broadcast 1-row join.",
        formatted_plan(kn),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    ifp = e.q_ifp_sameas(spark, SF_DIR)
    sections.append((
        "ifp_sameas (fan-guarded key self-join)",
        "prp-ifp: one (pred, value) agg builds the fan filter (the "
        "placeholder-value skew guard — 2 <= fan <= max_fan), the "
        "self-join co-partitions on the same (pred, value) key, and "
        "the witness count is one pair agg. Pair volume is bounded at "
        "max_fan^2 per key by construction.",
        formatted_plan(ifp),
        ["HashAggregate"],
        0,
    ))

    dj = e.q_disjoint_audit(spark, SF_DIR)
    sections.append((
        "disjoint_audit (entity-keyed self-join, broadcast axioms)",
        "cax-dw: ONE self-join of the distinct (entity, type) table on "
        "the entity key — bounded by types-per-entity, not corpus "
        "size; the axiom list folds in as an array literal inside "
        "codegen (schema-sized, no join).",
        formatted_plan(dj),
        ["HashAggregate", "array_contains"],
        0,
    ))

    sm = e.q_eval_semeval(spark, SF_DIR)
    sections.append((
        "eval_semeval (one overlap join, modes inline from one row)",
        "SemEval four-mode eval: the overlap join co-partitions on "
        "seq_id (chunks-per-sequence bounded), per-prediction flags "
        "reduce in one agg, gold-side MIS in another, and the four "
        "mode rows Generate (inline) out of a single assembled count "
        "row — no second pass over chunk data.",
        formatted_plan(sm),
        ["HashAggregate", "Generate"],
        0,
    ))

    fb = e.q_folded_blocks(spark, SF_DIR)
    sections.append((
        "folded_blocks (narrow fold, one distinct-variant agg)",
        "ascii_fold is a pure translate() inside codegen; the block "
        "table is ONE hash agg on the folded key with the classic "
        "two-phase distinct-variant plan (partial_count + partial "
        "distinct on (folded, raw) absorb repeated spellings "
        "map-side). No join, no window, no Python.",
        formatted_plan(fb),
        ["HashAggregate", "translate"],
        0,
    ))

    kw = e.q_kwic_snippets(spark, SF_DIR)
    sections.append((
        "kwic_snippets (zero-shuffle concordance)",
        "Hit positions via index-aware transform, per-doc cap via "
        "array slice, snippet via array slice — the token array never "
        "leaves its row, so the whole operator is one scan + Generate "
        "with NO Exchange anywhere in the plan.",
        formatted_plan(kw),
        ["Generate"],
        0,
    ))
    if "Exchange" in formatted_plan(kw):
        sections[-1] = (sections[-1][0], sections[-1][1],
                        sections[-1][2] + "\nUNEXPECTED-EXCHANGE",
                        ["Generate", "NO-EXCHANGE-EXPECTED"], 0)

    jd = e.q_js_divergence(spark, SF_DIR)
    sections.append((
        "js_divergence (one corpus agg, broadcast totals)",
        "Both slices' counts live in ONE token-keyed hash agg as "
        "conditional sums; totals reduce to a 1-row broadcast joined "
        "back; the contribution sum is a second reduced-side agg. "
        "Single corpus-sized exchange.",
        formatted_plan(jd),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    ch = e.q_chao1_vocab(spark, SF_DIR)
    sections.append((
        "chao1_vocab (one corpus freq agg, histogram-sized tail)",
        "Type-frequency agg is the only corpus-sized shuffle "
        "(good_turing's contract); the count-of-counts agg and the "
        "single-row Chao1 arithmetic run on the histogram.",
        formatted_plan(ch),
        ["HashAggregate"],
        0,
    ))

    cr = e.q_capture_recapture(spark, SF_DIR)
    sections.append((
        "capture_recapture (two distincts, one co-partitioned join)",
        "Lincoln-Petersen/Chapman: each extractor output deduplicates "
        "on the mention key, the overlap is ONE equi-join on the same "
        "key, and three single-row counts assemble the estimate — no "
        "corpus-sized state beyond the distincts.",
        formatted_plan(cr),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    co = e.q_collocations(spark, SF_DIR)
    sections.append((
        "collocations (one bigram window, margin joins on collapsed pairs)",
        "Dunning G^2: the lead() window partitioned on doc_id is the only "
        "corpus-sized exchange — it sits ABOVE the localCheckpoint that "
        "feeds the four consumers, so this plan (correctly) starts at the "
        "checkpointed bigram scan; pair/margin aggs collapse map-side; "
        "the margin joins run on the already-distinct pair table; N is a "
        "1-row broadcast.",
        formatted_plan(co),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    lo = e.q_logodds_keyness(spark, SF_DIR)
    sections.append((
        "logodds_keyness (one conditional-sum token agg, broadcast totals)",
        "Monroe log-odds: unigram_js_divergence's shuffle profile — the "
        "per-token agg holds both slices as conditional sums; the pooled "
        "Dirichlet prior is computed from columns already in the agg row, "
        "so shrinkage adds zero exchanges.",
        formatted_plan(lo),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    rbo = e.q_rbo_hosts(spark, SF_DIR)
    sections.append((
        "rbo_hosts (constant-bounded past the host agg)",
        "Rank-biased overlap: corpus-scale work ends at the host stats "
        "agg; rankings, shared-item join, and the depth-range join all "
        "run on <= depth rows (the BroadcastNestedLoopJoin is over D=10 "
        "rows by construction).",
        formatted_plan(rbo),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    be = e.q_benford_prices(spark, SF_DIR)
    sections.append((
        "benford_prices (one 9-key agg, 9-row law join)",
        "Benford audit: the first-digit agg collapses map-side to <= 9 "
        "rows per partition; the digit spine and the 1-row total are "
        "broadcast joins; the law arithmetic is a narrow map over 9 rows.",
        formatted_plan(be),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    lx = e.q_lexical_richness(spark, SF_DIR)
    sections.append((
        "lexical_richness (one corpus freq agg, histogram tail)",
        "Yule's K / TTR panel: chao1_vocab's contract — the type-"
        "frequency agg is the only corpus-sized shuffle; count-of-counts "
        "and the single-row panel arithmetic run on the histogram.",
        formatted_plan(lx),
        ["HashAggregate"],
        0,
    ))

    wi = e.q_wilson_sources(spark, SF_DIR)
    sections.append((
        "wilson_sources (one group agg, |groups|-row rank window)",
        "Wilson lower bound: ONE source-keyed hash agg (conditional sum "
        "+ count, map-side combine); the score is a narrow map and the "
        "rank window runs on |sources| rows only.",
        formatted_plan(wi),
        ["HashAggregate", "Window"],
        0,
    ))

    ac = e.q_acf_events(spark, SF_DIR)
    sections.append((
        "acf_events (stream-sized bucket agg, time-bounded tail)",
        "ACF: the hourly bucket agg is the only stream-sized exchange; "
        "the densified series is bounded by TIME not data volume, so the "
        "spine, lag joins, and final agg run on ~span/bucket rows (the "
        "plan starts at the localCheckpointed series scan).",
        formatted_plan(ac),
        ["HashAggregate"],
        0,
    ))

    td = e.q_term_dispersion(spark, SF_DIR)
    sections.append((
        "term_dispersion (observed pairs only, no zero cross product)",
        "Gries DP: one (token, part) hash agg; part shares are a "
        "|parts|-row broadcast; the sum-to-one rearrangement means the "
        "(token x part) zero matrix is never materialized.",
        formatted_plan(td),
        ["HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    mp = e.q_map_eval(spark, SF_DIR)
    sections.append((
        "map_eval (one scan, one ranking-window exchange)",
        "MAP/P@k: ndcg_eval's contract — queries explode as a broadcast "
        "literal, tf/rel are higher-order filters in codegen, and the "
        "cumulative-relevant running sum rides the SAME sys-rank window "
        "(one exchange partitioned by query term).",
        formatted_plan(mp),
        ["Window", "HashAggregate"],
        0,
    ))

    hp = e.q_heaps_fit(spark, SF_DIR)
    sections.append((
        "heaps_fit (docs-row cumulative offset, 10-row OLS tail)",
        "Heaps fit: global token indices come from the |docs|-row "
        "running-sum window plus in-doc position — never a window over "
        "raw tokens; the checkpoint spine is a broadcast; the OLS "
        "reduces 10 rows.",
        formatted_plan(hp),
        ["HashAggregate", "Window"],
        0,
    ))

    bd = e.q_burrows_delta(spark, SF_DIR)
    sections.append((
        "burrows_delta (one corpus agg, parts x top-m grid tail)",
        "Burrows' Delta: the (part, token) agg is the only corpus-sized "
        "exchange; top-m selection windows the |vocab|-row freq table; "
        "grid/mu-sd/z/final-mean all run on |parts| * top_m rows.",
        formatted_plan(bd),
        ["HashAggregate", "Window", "BroadcastHashJoin"],
        0,
    ))

    ar = e.q_assoc_rules(spark, SF_DIR)
    sections.append((
        "assoc_rules (one distinct, one co-partitioned self-join)",
        "Association rules: baskets distinct once; the pair self-join is "
        "co-partitioned on user_id and bounded per user by distinct "
        "items; marginals and the user total join back as broadcasts.",
        formatted_plan(ar),
        ["HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    mw = e.q_mannwhitney_chars(spark, SF_DIR)
    sections.append((
        "mannwhitney_chars (histogram ranks, no row-level window)",
        "Rank-sum: the value-histogram agg is the only corpus-sized "
        "exchange; tie-averaged ranks come from a window over the "
        "|distinct values|-row table; one reduced agg assembles U and z.",
        formatted_plan(mw),
        ["HashAggregate", "Window"],
        0,
    ))

    ks = e.q_ks_chars(spark, SF_DIR)
    sections.append((
        "ks_chars (histogram CDFs, exact-integer max)",
        "KS: same histogram contract; the sup gap is decided on exact "
        "integer numerators over the common n_a*n_b denominator with "
        "one division at the end.",
        formatted_plan(ks),
        ["HashAggregate", "Window"],
        0,
    ))

    sp = e.q_spearman_chars(spark, SF_DIR)
    sections.append((
        "spearman_chars (per-column histogram ranks joined by value)",
        "Spearman: each column's ranks come from its own value "
        "histogram (broadcast back by value); Pearson on ranks is one "
        "agg; no window ever touches row-level data.",
        formatted_plan(sp),
        ["HashAggregate", "Window", "BroadcastHashJoin"],
        0,
    ))

    kt = e.q_kendall_hosts(spark, SF_DIR)
    sections.append((
        "kendall_hosts (pairwise on the reduced host table only)",
        "Kendall tau-b: the O(n^2) self-join runs on the |hosts|-row "
        "metric table (host agg upstream), never corpus rows; one agg "
        "classifies pairs and assembles tau.",
        formatted_plan(kt),
        ["HashAggregate"],
        0,
    ))

    cs = e.q_chisq_lang_source(spark, SF_DIR)
    sections.append((
        "chisq_lang_source (one cell agg, broadcast marginals)",
        "Chi-square/Cramér's V: ONE (a, b) hash agg is the only "
        "corpus-sized exchange; marginals re-aggregate the cells table "
        "and join back as broadcasts; zero cells contribute via the "
        "o^2/e - n identity without materialization.",
        formatted_plan(cs),
        ["HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    er = e.q_entropy_rate(spark, SF_DIR)
    sections.append((
        "entropy_rate (one bigram agg, margins derived from it)",
        "Shannon entropy rate: bigram extraction is a narrow zip_with "
        "map; the bigram agg combines map-side; the unigram margin "
        "re-aggregates the bigram table, so raw tokens are touched "
        "exactly once.",
        formatted_plan(er),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    sc2 = e.q_stem_collapse(spark, SF_DIR)
    sections.append((
        "stem_collapse (codegen stemmer, two combining aggs)",
        "S-stemmer: the three-rule stem is a pure scalar expression "
        "(no UDF); the (stem, token) and stem aggs both combine "
        "map-side; output is a row-set above the variant floor.",
        formatted_plan(sc2),
        ["HashAggregate"],
        0,
    ))

    cc = e.q_control_chart(spark, SF_DIR)
    sections.append((
        "control_chart (stream-sized bucket agg, time-bounded tail)",
        "I-MR chart: acf_events' contract — one bucket agg over the "
        "stream; densify, the lag window, and the limit filter run on "
        "the time-bounded series; violations-only output.",
        formatted_plan(cc),
        ["HashAggregate", "Window"],
        0,
    ))

    mj = e.q_mojibake_audit(spark, SF_DIR)
    sections.append((
        "mojibake_audit (one scan, 5-key agg, no regex)",
        "Encoding audit: occurrence counts via length difference in "
        "codegen (no regex backtracking, no Python); the agg collapses "
        "map-side to <= 5 rows per partition.",
        formatted_plan(mj),
        ["HashAggregate"],
        0,
    ))

    sq = e.q_seq_patterns(spark, SF_DIR)
    sections.append((
        "seq_patterns (first/last reduction, no pairwise event join)",
        "Sequential patterns: 'some a before some b' reduces to "
        "first_a < last_b on the (user, type) table — bounded by users "
        "x alphabet; the pattern join co-partitions on the user key.",
        formatted_plan(sq),
        ["HashAggregate"],
        0,
    ))

    km = e.q_kaplan_meier(spark, SF_DIR)
    sections.append((
        "kaplan_meier (user agg + lifetime-histogram windows)",
        "KM survival: one user-keyed agg for lifetimes; at-risk and "
        "cumulative-product windows run on the |distinct lifetimes|-row "
        "histogram; the corpus end is a 1-row broadcast.",
        formatted_plan(km),
        ["HashAggregate", "Window"],
        0,
    ))

    mk = e.q_markov_stationary(spark, SF_DIR)
    sections.append((
        "markov_stationary (one event-sized exchange, tiny fixpoint)",
        "Markov chain: the transition agg (lead window + hash agg) is "
        "the only event-sized work; 10 power-iteration steps run on the "
        "|alphabet|^2 matrix from a localCheckpointed probability table "
        "(linear plan growth, the pagerank pattern).",
        formatted_plan(mk),
        ["HashAggregate"],
        0,
    ))

    rm = e.q_robust_means(spark, SF_DIR)
    sections.append((
        "robust_means (per-group rank windows, one agg)",
        "Tukey trimmed/winsorized means: exact order statistics need "
        "the per-group rank windows (partitioned by source — "
        "parallelism = |groups|); k rides as a row-level window count "
        "so no aggregate nests inside another; one final agg.",
        formatted_plan(rm),
        ["Window", "HashAggregate"],
        0,
    ))

    es = e.q_effect_size_chars(spark, SF_DIR)
    sections.append((
        "effect_size_chars (one conditional-sum agg)",
        "Cohen's d / Hedges' g: a single corpus agg carrying both "
        "slices as conditional sums; everything after is single-row "
        "arithmetic.",
        formatted_plan(es),
        ["HashAggregate"],
        0,
    ))

    ts2 = e.q_theil_sen_trend(spark, SF_DIR)
    sections.append((
        "theil_sen_trend (stream-sized bucket agg, pair table bounded)",
        "Theil-Sen: one bucket agg over events; the pairwise slope "
        "table is (days choose 2) — time-bounded; medians are exact "
        "rank selections over the slope table (no interpolated "
        "percentile).",
        formatted_plan(ts2),
        ["HashAggregate", "Window"],
        0,
    ))

    cf = e.q_ccf_events(spark, SF_DIR)
    sections.append((
        "ccf_events (one dual-series bucket agg, bounded tail)",
        "Cross-correlation: ONE stream-sized agg holds both types as "
        "conditional counts per bucket; spine/lag-join/moments are "
        "time-bounded (acf_events' contract with two series).",
        formatted_plan(cf),
        ["HashAggregate"],
        0,
    ))

    bu = e.q_burstiness(spark, SF_DIR)
    sections.append((
        "burstiness (bucket agg + per-user co-partitioned lag)",
        "Burstiness panel: Fano from the bucketed series; gap moments "
        "from a lag window partitioned on user_id — a global gap "
        "series (single-partition sort of the stream) is deliberately "
        "not offered.",
        formatted_plan(bu),
        ["HashAggregate", "Window"],
        0,
    ))

    cc2 = e.q_cocitation_cosine(spark, SF_DIR)
    sections.append((
        "cocitation_cosine (citer-partitioned self-join, degree joins)",
        "Co-citation: the pair expansion co-partitions on the citing "
        "side (bounded by out-degree); in-degree marginals join back "
        "by key; canonical a < b halves the table.",
        formatted_plan(cc2),
        ["HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    mk2 = e.q_mann_kendall(spark, SF_DIR)
    sections.append((
        "mann_kendall (bucket agg, time-bounded sign pairs)",
        "Mann-Kendall: theil_sen's pair economics — sign comparisons "
        "over (days choose 2); the tie histogram is one agg over the "
        "densified series.",
        formatted_plan(mk2),
        ["HashAggregate"],
        0,
    ))

    rt = e.q_runs_test(spark, SF_DIR)
    sections.append((
        "runs_test (exact rank median, lag window on series)",
        "Runs test: exact two-middle median over the series; boundary "
        "flips via one lag window on the surviving time-ordered "
        "buckets; all post-agg work time-bounded.",
        formatted_plan(rt),
        ["HashAggregate", "Window"],
        0,
    ))

    sp2 = e.q_seasonal_profile(spark, SF_DIR)
    sections.append((
        "seasonal_profile (bucket agg, 24-row output)",
        "Seasonal profile: one stream-sized bucket agg; phase grouping "
        "and shares run on the densified time-bounded series; output "
        "is |period| rows.",
        formatted_plan(sp2),
        ["HashAggregate"],
        0,
    ))

    pp = e.q_ppmi_similarity(spark, SF_DIR)
    sections.append((
        "ppmi_similarity (window contexts, context-keyed dot join)",
        "PPMI similarity: context pairs from lead/lag columns on ONE "
        "window (never a positional self-join) — the window sits above "
        "the localCheckpoint, so this plan correctly starts at the "
        "checkpointed PPMI scan; the dot-product join co-partitions on "
        "the context key.",
        formatted_plan(pp),
        ["HashAggregate"],
        0,
    ))

    og = e.q_og_meta(spark, SF_DIR)
    sections.append((
        "og_meta (narrow zipped extraction, no joins)",
        "OpenGraph harvest: two regexp_extract_all passes zipped per "
        "row + one explode — the microdata plan shape; both attribute "
        "orders handled by union of narrow maps.",
        formatted_plan(og),
        ["Generate"],
        0,
    ))

    rc = e.q_rel_canonical(spark, SF_DIR)
    sections.append((
        "rel_canonical (single narrow regexp projection)",
        "rel=canonical: one regexp_extract per row, a filter, a "
        "projection — scan-bound; no shuffle at all.",
        formatted_plan(rc),
        ["Filter"],
        0,
    ))

    ht = e.q_ht_estimate(spark, SF_DIR)
    sections.append((
        "ht_estimate (narrow hash filter, one conditional agg)",
        "Horvitz-Thompson: the sample membership is a narrow "
        "multiplicative-hash map; sampled and true totals come from "
        "ONE conditional-sum agg; no joins.",
        formatted_plan(ht),
        ["HashAggregate"],
        0,
    ))

    ny = e.q_neyman_alloc(spark, SF_DIR)
    sections.append((
        "neyman_alloc (one stratum agg, broadcast normalizer)",
        "Neyman allocation: one stratum-keyed agg with map-side "
        "combine; |strata|-row arithmetic against a 1-row broadcast "
        "normalizer.",
        formatted_plan(ny),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    jk = e.q_jackknife_se(spark, SF_DIR)
    sections.append((
        "jackknife_se (group table + grand totals, no second pass)",
        "Grouped jackknife: every leave-one-out mean is derived from "
        "the group table and the broadcast grand totals — the data is "
        "scanned once; the variance reduces |groups| rows.",
        formatted_plan(jk),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    ql = e.q_qld_search(spark, SF_DIR)
    sections.append((
        "qld_search (bm25 contract: broadcast query, TakeOrdered)",
        "Dirichlet QLD: tf agg + broadcast query semi-join; the "
        "candidate x query grid is broadcast-bounded; final top-k is "
        "TakeOrderedAndProject, never a global sort.",
        formatted_plan(ql),
        ["HashAggregate", "TakeOrderedAndProject"],
        0,
    ))

    er2 = e.q_err_eval(spark, SF_DIR)
    sections.append((
        "err_eval (one scan, one ranking-window exchange)",
        "ERR: ndcg/map's harness — the cascade stopping product rides "
        "the SAME sys-rank window as a cumulative ln(1-R) sum; |Q|-row "
        "output.",
        formatted_plan(er2),
        ["Window", "HashAggregate"],
        0,
    ))

    mm = e.q_mmr_rerank(spark, SF_DIR)
    sections.append((
        "mmr_rerank (candidate-sized greedy, no driver data collect)",
        "MMR: every greedy step joins the tens-of-rows candidate table "
        "against the pair table (localCheckpointed between steps — "
        "the final plan is therefore a Union of checkpointed 1-row "
        "picks; the per-step agg/argmax plans already executed); only "
        "the loop counter lives on the driver.",
        formatted_plan(mm),
        ["Union"],
        0,
    ))

    nb = e.q_nysiis_blocks(spark, SF_DIR)
    sections.append((
        "nysiis_blocks (narrow key chain, one block window)",
        "NYSIIS-style key: the whole rule chain is narrow regexp/"
        "translate codegen; the only exchange is the block-size window "
        "keyed on nkey.",
        formatted_plan(nb),
        ["Window"],
        0,
    ))

    dp2 = e.q_dice_pairs(spark, SF_DIR)
    sections.append((
        "dice_pairs (block join, row-level verification)",
        "Two-stage ER: the candidate join co-partitions on the NYSIIS "
        "block key (never all-pairs); Dice runs INSIDE the row via "
        "array HOFs — no explode-join for verification.",
        formatted_plan(dp2),
        ["Join"],
        0,
    ))

    kz = e.q_katz_hosts(spark, SF_DIR)
    sections.append((
        "katz_hosts (edge-vector iteration, linear plan growth)",
        "Katz: the pagerank/markov loop shape — each of k_max steps is "
        "one equi-join of the localCheckpointed edges against the "
        "walk vector plus a hash agg; accumulation via union + re-agg.",
        formatted_plan(kz),
        ["HashAggregate"],
        0,
    ))

    ct = e.q_ct_lang(spark, SF_DIR)
    sections.append((
        "ct_lang (gram-keyed scoring join, broadcast profiles)",
        "Cavnar-Trenkle: trigram explode is narrow; language profiles "
        "are rank windows on |langs| x |grams| rows; scoring is one "
        "gram-keyed join against the broadcast top-40 profiles; the "
        "argmin is a window over |docs| x |langs| rows.",
        formatted_plan(ct),
        ["Window", "HashAggregate", "Generate"],
        0,
    ))

    ta = e.q_token_adaptation(spark, SF_DIR)
    sections.append((
        "token_adaptation (two-level count reduction)",
        "Church adaptation: one (doc, token) agg, one token agg over "
        "it, a 1-row N broadcast — all map-side combining.",
        formatted_plan(ta),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    ro = e.q_rocchio_rerank(spark, SF_DIR)
    sections.append((
        "rocchio_rerank (shared tf/df aggregates, broadcast weights)",
        "Rocchio: tf/df/tfidf built once and reused by the first pass, "
        "the feedback centroid, and the second-pass scoring; the "
        "expanded weight table is a broadcast; top-k is "
        "TakeOrderedAndProject.",
        formatted_plan(ro),
        ["HashAggregate", "TakeOrderedAndProject"],
        0,
    ))

    cv = e.q_cluster_validity(spark, SF_DIR)
    sections.append((
        "cluster_validity (centroid-distance panel, no point pairs)",
        "Silhouette/DB/CH from point-to-centroid and centroid-to-"
        "centroid distances only: one (cluster, dim) mean agg, a "
        "point x k x d broadcast join, k^2-row DB arithmetic — "
        "nothing pairwise in points.",
        formatted_plan(cv),
        ["HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    pc = e.q_pca_top(spark, SF_DIR)
    sections.append((
        "pca_top (id-keyed covariance, d^2-row power loop)",
        "Covariance from ONE self-join of the (id, dim) long table on "
        "the id key (d-bounded fan); the 8-step power loop runs on the "
        "localCheckpointed d^2-row matrix, so plan growth is linear "
        "and points are never paired.",
        formatted_plan(pc),
        ["HashAggregate"],
        0,
    ))

    rs = e.q_rotate_score(spark, SF_DIR)
    sections.append((
        "rotate_score (literal-folded rotations, windowed top-k)",
        "RotatE: the transe/distmult leg shape — one equi-join per "
        "entity side against the quantized embedding table, rotation "
        "constants folded as integer literals into codegen, "
        "WindowGroupLimit-pruned per-relation top-k. No cross join.",
        formatted_plan(rs),
        ["BroadcastHashJoin", "WindowGroupLimit", "Window"],
        0,
    ))

    bt = e.q_bowtie_hosts(spark, SF_DIR)
    sections.append((
        "bowtie_hosts (frontier BFS x2 + CC, no all-pairs)",
        "Broder bowtie: forward/backward reachability are frontier "
        "BFS joins off the localCheckpointed edge set (shuffle "
        "tracks the frontier), weak membership is the CC fixpoint, "
        "classification is one left-join chain + a broadcast pivot "
        "component.",
        formatted_plan(bt),
        ["HashAggregate", "BroadcastNestedLoopJoin"],
        0,
    ))

    tk = e.q_trustrank_hosts(spark, SF_DIR)
    sections.append((
        "trustrank_hosts (dual-vector power loop, directed)",
        "TrustRank + spam mass: ONE power loop carries both the "
        "PageRank and the trust vector — each round is one equi-join "
        "against the localCheckpointed degree-carrying edges + one "
        "hash agg computing BOTH sums (half the joins of two runs); "
        "the broadcast seed join is paid once inside the checkpointed "
        "teleport table; linear plan growth.",
        formatted_plan(tk),
        ["HashAggregate", "SortMergeJoin"],
        0,
    ))

    sc = e.q_scan_hosts(spark, SF_DIR)
    sections.append((
        "scan_hosts (per-edge wedge sigma, no all-pairs)",
        "SCAN: structural similarity is computed per EDGE via the "
        "triangle wedge join (adjacency joined to adjacency on the "
        "shared endpoint, degree-bounded); cores are one agg; "
        "clusters reuse the CC fixpoint; border/hub classification "
        "is joins + one agg.",
        formatted_plan(sc),
        ["HashAggregate", "Union"],
        0,
    ))

    kc = e.q_kcenter_seeds(spark, SF_DIR)
    sections.append((
        "kcenter_seeds (model-on-driver farthest-first)",
        "Gonzalez k-center: the chosen set is a k x d literal model; "
        "each round is one narrow min-distance scan + a 1-row "
        "TakeOrderedAndProject argmax — the k-row result frame itself "
        "is the collected model, so the audited plan is the final "
        "scan shape.",
        formatted_plan(kc),
        ["Scan"],
        0,
    ))

    sp = e.q_script_profile(spark, SF_DIR)
    sections.append((
        "script_profile (pure narrow regexp census)",
        "Unicode script counts are length-difference regexps per "
        "range — one narrow projection, zero joins, zero exchanges "
        "beyond the scan, zero Python.",
        formatted_plan(sp),
        ["Project", "Scan"],
        0,
    ))

    pl = e.q_pld_rollup(spark, SF_DIR)
    sections.append((
        "pld_rollup (broadcast PSL, constant fan-out)",
        "Registered-domain resolution: candidate suffix tails are a "
        "constant-width posexplode on DISTINCT hosts, matched via a "
        "broadcast PSL join + max-struct agg; the url table joins "
        "back once and aggregates.",
        formatted_plan(pl),
        ["BroadcastHashJoin", "HashAggregate", "Generate"],
        0,
    ))

    wp = e.q_wordpiece_encode(spark, SF_DIR)
    sections.append((
        "wordpiece_encode (join-based greedy walk, zero Python)",
        "WordPiece: longest match per (word, pos) is one "
        "broadcast-vocab join + max-struct agg into a jump table; "
        "the greedy walk is pointer-chasing equi-joins over it "
        "(lazy rounds) — no Arrow loop, no Python.",
        formatted_plan(wp),
        ["HashAggregate", "Union"],
        0,
    ))

    mk = e.q_min_k_prob(spark, SF_DIR)
    sections.append((
        "min_k_prob (bigram model + one per-doc window)",
        "Min-K%: the lm_cross_entropy model/scoring shape (two hash "
        "aggs, two left joins) plus ONE per-doc rank window and one "
        "agg for the tail-average.",
        formatted_plan(mk),
        ["HashAggregate", "Window"],
        0,
    ))

    sb = e.q_self_bleu(spark, SF_DIR)
    sections.append((
        "self_bleu (one gram table, top-2 window, never pairwise)",
        "Self-BLEU: n-gram tables built ONCE; clipping ceilings from "
        "ONE (n, gram)-keyed top-2 window; precision is one join + "
        "agg; brevity reference length joins a broadcast length "
        "histogram — linear in gram volume, never per-(candidate, "
        "reference).",
        formatted_plan(sb),
        ["HashAggregate", "Window", "BroadcastNestedLoopJoin"],
        0,
    ))

    sf_ = e.q_sif_embeddings(spark, SF_DIR)
    sections.append((
        "sif_embeddings (weighted mean + PC removal, linear growth)",
        "SIF: one vocab-bounded frequency agg broadcast into the "
        "token stream, one embedding equi-join, one (doc, dim) agg; "
        "the PC loop reuses pca_top's doc-keyed covariance self-join "
        "and localCheckpointed d^2 matrix; removal is a broadcast "
        "join + narrow arithmetic.",
        formatted_plan(sf_),
        ["HashAggregate", "BroadcastHashJoin"],
        0,
    ))

    btq = e.q_bradley_terry(spark, SF_DIR)
    sections.append((
        "bradley_terry (match reduction + driver MM model)",
        "Bradley-Terry: the match stream reduces with ONE hash agg "
        "to the item^2-bounded pair table (the distributed part); "
        "Hunter's MM loop runs on the driver over that bounded model "
        "(the BPE-trainer division of labor), so the audited plan is "
        "the small result frame + rank window.",
        formatted_plan(btq),
        ["Window"],
        0,
    ))

    lu = e.q_luhn_abstract(spark, SF_DIR)
    sections.append((
        "luhn_abstract (co-partitioned window clustering)",
        "Luhn: sentence split is a narrow map + explode; significance "
        "is one (doc, token) agg with a broadcast stopword anti-join; "
        "clustering is one lag + running-sum window pair keyed on "
        "(doc, sentence); selection is a per-doc rank window.",
        formatted_plan(lu),
        ["Window", "HashAggregate", "Generate"],
        0,
    ))

    failures = []
    out_parts = [
        "# PLANS — physical-plan audit of headline operators\n",
        "Generated by tools/plan_audit.py at sf0.01; re-run after plan-"
        "affecting changes.\nEach section states the scale property the plan "
        "must exhibit, then the formatted plan.\n",
    ]
    for title, why, plan, must_contain, max_py in sections:
        missing = [m for m in must_contain if m not in plan]
        # count node-detail headers only ("(5) ArrowEvalPython"), not the
        # duplicate mention in the tree summary
        n_py = len(re.findall(r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython)", plan))
        too_many_py = max_py is not None and n_py > max_py
        ok = not missing and not too_many_py
        status = "OK" if ok else "MISSING: " + str(missing) + (
            f" python_eval_nodes={n_py}>max {max_py}" if too_many_py else "")
        if not ok:
            failures.append(title)
        plan_out = plan
        plan_lines = plan.splitlines()
        if len(plan_lines) > 400:
            plan_out = "\n".join(plan_lines[:400]) + (
                f"\n... [{len(plan_lines) - 400} more lines truncated — "
                "composite plan; checks above ran on the FULL text]\n")
        out_parts.append(f"\n## {title}  [{status}]\n\n{why}\n\n```\n{plan_out}```\n")
        print(f"{title:45s} {status}")

    with open(args.out, "w") as f:
        f.write("".join(out_parts))
    print("wrote", args.out)
    if failures:
        raise SystemExit(f"plan properties missing: {failures}")


if __name__ == "__main__":
    main()
