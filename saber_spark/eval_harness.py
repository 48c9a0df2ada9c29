"""CRAFT/BC5CDR-style evaluation harness (the north-rule P/R gate).

Runs the Spark pipeline AND the row-by-row reference harness over the same
corpus, scores triples and mentions under exact/left/right boundary
criteria (saber/metrics.py:158-166 semantics), and writes the score table
to JSON (per-epoch JSON dump parity: saber/metrics.py:240-284).

CLI:  python -m saber_spark.eval_harness [--sf-dir ...] [--out eval.json]
Exit code 1 if triple P or R < 0.95 (the BASELINE.json gate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession

from saber_spark.fixtures.dictionary import GROUNDING_DICT_ROWS, surface_label_map
from saber_spark.fixtures.pages import build_pages_df, wrap_html
from saber_spark.kernels.metrics import get_precision_recall_f1_support
from saber_spark.operators.tagger import DictionaryTagger
from saber_spark.pipeline import run_pipeline
from saber_spark.reference_harness import (
    annotate_document,
    reference_triples,
    triple_precision_recall,
)

PR_GATE = 0.95


def _corpus_rows(spark: SparkSession, sf_dir: str) -> list[tuple]:
    rows = []
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        if r["lang"] != "en":
            continue
        url = f"https://example.org/doc/{r['doc_id']}"
        text = r["text"] if r["doc_id"] % 2 == 1 else None
        html = wrap_html(r["text"]).encode() if text is None else None
        rows.append((url, text, html))
    return rows


def evaluate(spark: SparkSession, sf_dir: str) -> dict:
    tagger = DictionaryTagger(surface_label_map())
    canonical_map = {(s, l): c for s, l, _, _, _, c in GROUNDING_DICT_ROWS}
    rows = _corpus_rows(spark, sf_dir)

    # reference side (row-by-row semantics)
    gold_triples = reference_triples(rows, tagger, canonical_map)
    gold_mentions = [
        (m["label"], f"{m['url']}#{m['sent_id']}#{m['start']}",
         f"{m['url']}#{m['sent_id']}#{m['end']}")
        for url, text, html in rows
        for m in annotate_document(url, text, html, tagger, canonical_map)
    ]

    # spark side
    out = run_pipeline(spark, build_pages_df(spark, sf_dir))
    pred_triples = {
        (t["subj"], t["pred"], t["obj"], t["url"], t["sent_id"])
        for t in out["triples"].collect()
    }
    pred_mentions = [
        (m["label"], f"{m['url']}#{m['sent_id']}#{m['start']}",
         f"{m['url']}#{m['sent_id']}#{m['end']}")
        for m in out["mentions"].collect()
    ]

    p, r = triple_precision_recall(pred_triples, gold_triples)
    report = {
        "sf_dir": sf_dir,
        "n_docs": len(rows),
        "triples": {"gold": len(gold_triples), "pred": len(pred_triples),
                    "precision": round(p, 6), "recall": round(r, 6),
                    "gate": PR_GATE, "pass": p >= PR_GATE and r >= PR_GATE},
        "mentions": {},
    }
    for criteria in ("exact", "left", "right"):
        scores = get_precision_recall_f1_support(
            gold_mentions, pred_mentions, criteria)
        report["mentions"][criteria] = {
            lab: {"precision": round(v[0], 6), "recall": round(v[1], 6),
                  "f1": round(v[2], 6), "support": v[3]}
            for lab, v in sorted(scores.items())
        }
    return report


TRIPLE_KEYS = ["subj", "pred", "obj", "url", "sent_id"]


def gold_triples_df(pages):
    """Distributed gold side: the row-by-row reference kernels run INSIDE an
    Arrow mapInPandas, one partition at a time — no driver collect. Per-doc
    triples are disjoint across docs (url is in the key), so batch-local
    reference_triples() sets union to exactly the corpus-wide gold set.
    """
    import pandas as pd

    def run(batches):
        tagger = DictionaryTagger(surface_label_map())
        cmap = {(s, l): c for s, l, _, _, _, c in GROUNDING_DICT_ROWS}
        for pdf in batches:
            rows = list(zip(pdf["url"],
                            pdf["text"].where(pdf["text"].notna(), None),
                            pdf["html"]))
            trip = reference_triples(rows, tagger, cmap)
            yield pd.DataFrame(sorted(trip), columns=TRIPLE_KEYS)

    return pages.select("url", "text", "html", "lang") \
        .filter("lang = 'en'").drop("lang") \
        .mapInPandas(run, schema="subj string, pred string, obj string, "
                                 "url string, sent_id int")


def evaluate_distributed(spark: SparkSession, sf_dir: str) -> dict:
    """The 0.95 triple P/R gate computed with JOINS, not Python sets.

    evaluate() collects the corpus to the driver — fine at sf0.001, wrong as
    a scale statement. Here both sides stay DataFrames and P/R reduces to
    semi-/anti-join counts: TP = pred semi-join gold on the full triple key;
    P = TP/|pred|, R = TP/|gold|. At 100 TB this is three shuffled counts.
    """
    pages = build_pages_df(spark, sf_dir)
    # both sides feed two actions each (their count + the semi-join):
    # persist so the Python reference pass and the pipeline run ONCE
    gold = gold_triples_df(pages).persist()
    pred = run_pipeline(spark, pages)["triples"].select(*TRIPLE_KEYS).persist()
    n_gold = gold.count()
    n_pred = pred.count()
    tp = pred.join(gold, TRIPLE_KEYS, "left_semi").count()
    gold.unpersist()
    pred.unpersist()
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    return {
        "sf_dir": sf_dir, "mode": "distributed-joins",
        "triples": {"gold": n_gold, "pred": n_pred, "tp": tp,
                    "precision": round(p, 6), "recall": round(r, 6),
                    "gate": PR_GATE, "pass": p >= PR_GATE and r >= PR_GATE},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--out", default="/tmp/saber_eval.json")
    ap.add_argument("--distributed", action="store_true",
                    help="compute the triple gate via joins (sf0.1-ready), "
                         "skipping the driver-side mention criteria table")
    args = ap.parse_args()

    from saber_spark.session import get_spark

    spark = get_spark("saber_spark.eval")
    spark.sparkContext.setLogLevel("ERROR")
    if args.distributed:
        report = evaluate_distributed(spark, args.sf_dir)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(json.dumps(report))
        sys.exit(0 if report["triples"]["pass"] else 1)
    report = evaluate(spark, args.sf_dir)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps({"triples": report["triples"],
                      "micro_exact": report["mentions"]["exact"].get("MICRO_AVG"),
                      "out": args.out}))
    sys.exit(0 if report["triples"]["pass"] else 1)


if __name__ == "__main__":
    main()
