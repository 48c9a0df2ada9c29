"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG pipeline on sf0.001 and returns the
deduplicated edge table. ``queries()`` enumerates every implemented operator
from SURVEY.md §2.2 (plus the training-data-pipeline operators); each
SQL-expressible one has a DuckDB oracle in ``oracle_sql()``. UDF-backed
stages (extraction, mention tagging, multimodal decode) are rows-only.

Engine-portability conventions (so value hashes match):
  - integer results cast to BIGINT on both sides;
  - money aggregates computed in DECIMAL (exact), cast to double at the end;
  - float similarity/ratio outputs rounded to 6 after exact-integer math;
  - every computed column aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from saber_spark.kernels.text import INFIX_PATTERN
from saber_spark.fixtures.dictionary import GROUNDING_DICT_ROWS, grounding_dict_df
from saber_spark.fixtures.pages import build_pages_df
from saber_spark.operators import tpch
from saber_spark.operators.canonicalize import (FOLD_DST, FOLD_SRC,
                                                salted_count)
from saber_spark.operators.chunker import chunk_bio_sql
from saber_spark.operators.dedup import (
    MINHASH_PRIME,
    MINHASH_SEEDS,
    SIMHASH_BITS,
    SIMHASH_MULT,
    exact_dedup,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash,
)
from saber_spark.operators.evaluation import evaluate_chunks
from saber_spark.operators.extract import extract_text
from saber_spark.operators.multimodal import attach_fake_media, decode_features
from saber_spark.operators.sessions import sessionize, tumbling_window_agg
from saber_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from saber_spark.operators.splits import HASH_MOD, KNUTH, fold_assign, top1_by
from saber_spark.operators.textstats import (
    EN_STOPWORDS,
    FP_MOD,
    FP_MULT,
    FP_OFFSET,
    doc_fingerprint,
    gopher_quality,
    lang_id,
    pii_scrub,
    quality_score,
    token_counts,
)
from saber_spark.operators.linking import dict_ngram_mentions
from saber_spark.operators.openie import OPENIE_PATTERN
from saber_spark.operators.vocab import (
    SENT_BOUNDARY_NOLB,
    rare_tokens,
    split_sentences,
    tfidf_topk,
    token_freq,
    tokenize_docs,
    vocab_ids,
)

RARE_MAX = 30  # catches the driver-planted 'dup' token at sf0.01


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- tag seqs

TAG_CASE = {"click": "B-CLK", "purchase": "I-CLK", "error": "B-ERR"}
PRED_TAG_CASE = {"click": "B-CLK", "purchase": "B-CLK"}  # perturbed model


def _event_tags(events: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """events -> (seq_id, pos, tag): per-user event stream as a BIO corpus."""
    from pyspark.sql import Window

    expr = F.lit("O")
    for k, v in mapping.items():
        expr = F.when(F.col("event_type") == k, F.lit(v)).otherwise(expr)
    # alias BEFORE windowing so this window and the downstream chunk-decode
    # windows agree on the same partitioning attribute (seq_id) — otherwise
    # Catalyst inserts a second Exchange for what is the same partitioning
    base = events.select(
        F.col("user_id").cast("long").alias("seq_id"),
        F.col("event_id"),
        expr.alias("tag"),
    )
    w = Window.partitionBy("seq_id").orderBy("event_id")
    return base.select(
        "seq_id",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        "tag",
    )


def _tag_case_sql(mapping: dict[str, str]) -> str:
    whens = " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in mapping.items())
    return f"CASE event_type {whens} ELSE 'O' END"


def _chunks_cte_sql(mapping: dict[str, str], prefix: str) -> str:
    """Gaps-and-islands BIO chunk decode over the events tag stream."""
    return f"""
{prefix}_seq AS (
  SELECT CAST(user_id AS BIGINT) AS seq_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS BIGINT) AS pos,
         {_tag_case_sql(mapping)} AS tag
  FROM events),
{prefix}_lag AS (
  SELECT *, lag(tag) OVER (PARTITION BY seq_id ORDER BY pos) AS prev_tag
  FROM {prefix}_seq),
{prefix}_brk AS (
  SELECT *, CASE WHEN tag LIKE 'I-%' AND prev_tag IS NOT NULL
                      AND regexp_extract(prev_tag, '[^-]+$') = regexp_extract(tag, '[^-]+$')
                      AND (prev_tag LIKE 'B-%' OR prev_tag LIKE 'I-%')
                 THEN 0 ELSE 1 END AS brk
  FROM {prefix}_lag),
{prefix}_grp AS (
  SELECT *, SUM(brk) OVER (PARTITION BY seq_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS grp
  FROM {prefix}_brk),
{prefix}_chunks AS (
  SELECT seq_id,
         regexp_extract(arg_min(tag, pos), '[^-]+$') AS label,
         CAST(min(pos) AS BIGINT) AS chunk_start,
         CAST(max(pos) + 1 AS BIGINT) AS chunk_end
  FROM {prefix}_grp
  GROUP BY seq_id, grp
  HAVING arg_min(tag, pos) LIKE 'B-%')
"""


def _eval_oracle_sql(criteria_keys: str) -> str:
    """Chunk-eval oracle parameterized by the boundary-criteria key columns
    (exact: start+end, left: start, right: end — saber/metrics.py:158-166)."""
    return f"""
            WITH {_chunks_cte_sql(TAG_CASE, 'g')}, {_chunks_cte_sql(PRED_TAG_CASE, 'p')},
            g AS (SELECT DISTINCT seq_id, label, {criteria_keys} FROM g_chunks),
            p AS (SELECT DISTINCT seq_id, label, {criteria_keys} FROM p_chunks),
            tp AS (SELECT label, count(*) AS tp
                   FROM g JOIN p USING (seq_id, label, {criteria_keys})
                   GROUP BY label),
            fn AS (SELECT label, count(*) AS fn
                   FROM g ANTI JOIN p USING (seq_id, label, {criteria_keys})
                   GROUP BY label),
            fp AS (SELECT label, count(*) AS fp
                   FROM p ANTI JOIN g USING (seq_id, label, {criteria_keys})
                   GROUP BY label),
            labels AS (SELECT DISTINCT label FROM g),
            m AS (SELECT l.label,
                         coalesce(tp.tp, 0) AS tp, coalesce(fp.fp, 0) AS fp,
                         coalesce(fn.fn, 0) AS fn
                  FROM labels l
                  LEFT JOIN tp ON l.label = tp.label
                  LEFT JOIN fn ON l.label = fn.label
                  LEFT JOIN fp ON l.label = fp.label)
            SELECT label, tp, fp, fn,
                   round(CASE WHEN tp > 0 THEN tp / (tp + fp)::DOUBLE ELSE 0 END, 6) AS precision,
                   round(CASE WHEN tp > 0 THEN tp / (tp + fn)::DOUBLE ELSE 0 END, 6) AS recall,
                   round(CASE WHEN tp > 0 AND (2*tp + fp + fn) > 0
                              THEN 2.0 * (tp / (tp + fp)::DOUBLE) * (tp / (tp + fn)::DOUBLE)
                                   / ((tp / (tp + fp)::DOUBLE) + (tp / (tp + fn)::DOUBLE))
                              ELSE 0 END, 6) AS f1
            FROM m"""


# ------------------------------------------------------- shared SQL pieces

TOKENS_CTE = f"""
tokens AS (
  SELECT doc_id,
         CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS pos,
         unnest(arr) AS token
  FROM (SELECT doc_id,
               regexp_extract_all(text, '{INFIX_PATTERN}', 0) AS arr
        FROM documents))
"""

HOST_EDGES_CTE = """
hedges AS (
  SELECT DISTINCT source || '.example.org' AS src,
         'src' || CAST(CASE WHEN doc_id % 2 = 0
                            THEN doc_id % 7
                            ELSE doc_id % 3 END AS VARCHAR)
           || '.example.org' AS dst
  FROM documents)
"""

VOCAB_CTE = """
vocab AS (
  SELECT token,
         CAST(ROW_NUMBER() OVER (ORDER BY token) + 1 AS BIGINT) AS token_id
  FROM (SELECT DISTINCT token FROM tokens))
"""

_SINGLE_DICT = sorted({
    (surface, label, canonical)
    for surface, label, _, _, _, canonical in GROUNDING_DICT_ROWS
    if " " not in surface
})

DICT_VALUES_SQL = ", ".join(
    f"('{s}', '{l}', '{c}')" for s, l, c in _SINGLE_DICT)

_MULTI_DICT = sorted({
    (surface, label, canonical)
    for surface, label, _, _, _, canonical in GROUNDING_DICT_ROWS
    if " " in surface
})

MULTI_DICT_VALUES_SQL = ", ".join(
    f"('{s}', '{l}', '{c}')" for s, l, c in _MULTI_DICT)

# ambiguous senses layered over the unambiguous base dictionary: two
# frequent corpus surfaces each map to TWO canonical ids, exercising the
# context-coherence disambiguator (the reference attaches every xref and
# never picks, grounding_utils.py:53-66 — a KG build must pick one)
AMBIG_DICT_ROWS = [
    ("window", "PRGE", "PRGE:window"),
    ("window", "CHED", "CHED:window"),
    ("join",   "DISO", "DISO:join"),
    ("join",   "LIVB", "LIVB:join"),
]
DISAMBIG_DICT = sorted(set(_SINGLE_DICT) | set(AMBIG_DICT_ROWS))
DISAMBIG_VALUES_SQL = ", ".join(
    f"('{s}', '{l}', '{c}')" for s, l, c in DISAMBIG_DICT)

# is_a hierarchy over the dictionary's entity-type codes (stand-in for the
# reference's grounding ontologies: Disease Ontology / NCBI Taxonomy /
# PubChem are all is_a DAGs, saber/constants.py:74-80)
TYPE_HIERARCHY_ROWS = [
    ("PRGE", "BIOMOL"), ("CHED", "BIOMOL"), ("BIOMOL", "ENTITY"),
    ("DISO", "PHEN"), ("PHEN", "ENTITY"), ("LIVB", "ENTITY"),
]
HIER_VALUES_SQL = ", ".join(f"('{c}', '{p}')" for c, p in TYPE_HIERARCHY_ROWS)

# NegEx pre-scope cue list (operators/linking.py:NEGATION_CUES) plus two
# corpus stand-in cues: the synthetic vocabulary contains no real English
# negation term, so the fixture adds two frequent corpus tokens as cues to
# exercise the window join with nonzero rates (the operator default stays
# the real clinical list). Single source of truth for Spark + oracle.
from saber_spark.operators.linking import NEGATION_CUES  # noqa: E402

FIXTURE_NEG_CUES = NEGATION_CUES + ("slow", "scan")
NEG_CUES_SQL = ("(" + ", ".join(f"'{c}'" for c in FIXTURE_NEG_CUES) + ")")

LINKED_CTE = f"""
linked AS (
  SELECT t.doc_id, t.pos, t.token, g.label, g.canonical_id
  FROM tokens t
  JOIN (VALUES {DICT_VALUES_SQL}) AS g(surface, label, canonical_id)
    ON t.token = g.surface)
"""

SEEDS_VALUES_SQL = ", ".join(f"({i}, {a}, {b})" for i, a, b in MINHASH_SEEDS)

# word 3-gram shingles via pos self-joins (identical set to the Spark
# higher-order-function formulation in operators/dedup.py)
SHINGLES_CTE = """
shingles AS (
  SELECT DISTINCT a.doc_id,
         a.token || ' ' || b.token || ' ' || c.token AS shingle
  FROM tokens a
  JOIN tokens b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokens c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
shvocab AS (
  SELECT shingle,
         CAST(ROW_NUMBER() OVER (ORDER BY shingle) + 1 AS BIGINT) AS shingle_id
  FROM (SELECT DISTINCT shingle FROM shingles))
"""

SIGS_CTE = f"""
sigs AS (
  SELECT doc_id, seed_id,
         CAST(min((a * shingle_id + b) % {MINHASH_PRIME}) AS BIGINT) AS minhash
  FROM shingles
  JOIN shvocab USING (shingle)
  CROSS JOIN (VALUES {SEEDS_VALUES_SQL}) AS seeds(seed_id, a, b)
  GROUP BY doc_id, seed_id)
"""

CANDIDATES_CTE = """
bands AS (
  SELECT doc_id, CAST(seed_id // 2 AS INT) AS band,
         array_to_string(list_sort(list(seed_id || ':' || minhash)), '|') AS band_sig
  FROM sigs GROUP BY doc_id, CAST(seed_id // 2 AS INT)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id)
"""

STOP_VALUES_SQL = ", ".join(f"('{w}')" for w in EN_STOPWORDS)
STOPWORDS_IN_SQL = ", ".join(f"'{w}'" for w in EN_STOPWORDS)

# entity co-occurrence graph (doc granularity) — shared by the graph
# analytics oracles; `sym` is deduped by UNION set semantics
ENTITY_EDGES_CTE = """
ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
e AS (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM ents a JOIN ents b
    ON a.doc_id = b.doc_id AND a.canonical_id < b.canonical_id),
sym AS (SELECT src AS a, dst AS b FROM e
        UNION SELECT dst, src FROM e),
outdeg AS (SELECT a, count(*) AS outdeg FROM sym GROUP BY a),
nn AS (SELECT count(*) AS n FROM outdeg)
"""


def _pagerank_oracle_sql(iterations: int = 5) -> str:
    """Unrolled power iteration twin of operators/graph.py:pagerank —
    one CTE per round, same (1-d)/N + d*sum(pr/outdeg) arithmetic in
    DOUBLE, rounded to 6 at the end."""
    rounds = "".join(f""",
            pr{i} AS (
              SELECT s.b AS node,
                     CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
                     + CAST(0.85 AS DOUBLE) * sum(p.pr / o.outdeg) AS pr
              FROM sym s
              JOIN pr{i - 1} p ON s.a = p.node
              JOIN outdeg o ON o.a = s.a
              GROUP BY s.b)""" for i in range(1, iterations + 1))
    return f"""
            WITH {TOKENS_CTE}, {LINKED_CTE}, {ENTITY_EDGES_CTE},
            pr0 AS (
              SELECT a AS node,
                     CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr
              FROM outdeg){rounds}
            SELECT node, round(pr, 6) AS pr FROM pr{iterations}"""


def _textrank_oracle_sql(iterations: int = 3, window: int = 2,
                         top_k: int = 3, damping: float = 0.85) -> str:
    """Unrolled per-doc TextRank twin of operators/graph.py:textrank —
    one CTE per round with doc_id carried through every key; the
    damping literals are interpolated from the SAME Python floats the
    Spark side uses (1.0 - damping is not the double nearest 0.15), so
    both engines compute bit-identical update arithmetic."""
    dm, om = damping, 1.0 - damping
    rounds = "".join(f""",
            tr{i} AS (
              SELECT ef.doc_id, ef.b AS node,
                     {om!r} + {dm!r} * sum(ef.frac * p.pr) AS pr
              FROM ef JOIN tr{i - 1} p
                ON ef.doc_id = p.doc_id AND ef.a = p.node
              GROUP BY ef.doc_id, ef.b)""" for i in range(1, iterations + 1))
    pair_selects = " UNION ALL ".join(
        f"""SELECT doc_id, token AS a,
                   lead(token, {d}) OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS b
            FROM tokens""" for d in range(1, window + 1))
    return f"""
            WITH {TOKENS_CTE},
            rawp AS ({pair_selects}),
            rawf AS (SELECT * FROM rawp WHERE b IS NOT NULL AND a <> b),
            und AS (SELECT doc_id, a, b FROM rawf
                    UNION ALL SELECT doc_id, b, a FROM rawf),
            e AS (SELECT doc_id, a, b, count(*) AS cw
                  FROM und GROUP BY doc_id, a, b),
            wdeg AS (SELECT doc_id, a, sum(cw) AS wdeg
                     FROM e GROUP BY doc_id, a),
            ef AS (SELECT e.doc_id, e.a, e.b, e.cw / wdeg.wdeg::DOUBLE AS frac
                   FROM e JOIN wdeg
                     ON e.doc_id = wdeg.doc_id AND e.a = wdeg.a),
            tr0 AS (SELECT doc_id, a AS node, CAST(1.0 AS DOUBLE) AS pr
                    FROM wdeg){rounds}
            SELECT doc_id, node AS token, score, CAST(rnk AS BIGINT) AS rank
            FROM (SELECT doc_id, node, round(pr, 6) AS score,
                         row_number() OVER (PARTITION BY doc_id
                           ORDER BY round(pr, 6) DESC, node) AS rnk
                  FROM tr{iterations})
            WHERE rnk <= {top_k}"""


# triangle-strip gadget for the k-truss fixture: inner (i, i+2) chords sit
# in exactly ONE triangle (peeled by k=4 in round 1), after which the
# (i, i+1) path edges lose all their triangles and peel in round 2 — a
# guaranteed multi-round cascade the dense host/entity graphs don't have
STRIP_EDGE_ROWS = ([(f"strip{i:02d}", f"strip{i + 1:02d}")
                    for i in range(9)]
                   + [(f"strip{i:02d}", f"strip{i + 2:02d}")
                      for i in range(8)])
STRIP_VALUES_SQL = ", ".join(f"('{a}', '{b}')" for a, b in STRIP_EDGE_ROWS)


def _ktruss_oracle_sql(rounds: int = 4, k: int = 4) -> str:
    """Unrolled peel twin of operators/graph.py:ktruss_edges over the
    host graph + triangle strip — one (triangles, supports, filter) CTE
    triple per round; peeling is monotone, so rounds past convergence
    are no-ops; the final support is recomputed on the stable set."""
    body = ""
    for i in range(1, rounds + 2):
        body += f""",
            t{i} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                     FROM e{i - 1} e1
                     JOIN e{i - 1} e2 ON e2.a = e1.b
                     JOIN e{i - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
            s{i} AS (SELECT a, b, count(*) AS c FROM (
                       SELECT x AS a, y AS b FROM t{i}
                       UNION ALL SELECT y, z FROM t{i}
                       UNION ALL SELECT x, z FROM t{i})
                     GROUP BY a, b)"""
        if i <= rounds:
            body += f""",
            e{i} AS MATERIALIZED (SELECT e.a, e.b FROM e{i - 1} e
                     LEFT JOIN s{i} s USING (a, b)
                     WHERE coalesce(s.c, 0) >= {k - 2})"""
    return f"""
            WITH {HOST_EDGES_CTE},
            alledges AS (SELECT src, dst FROM hedges
                         UNION ALL
                         SELECT * FROM (VALUES {STRIP_VALUES_SQL})
                           AS st(src, dst)),
            e0 AS MATERIALIZED (
                   SELECT least(src, dst) AS a, greatest(src, dst) AS b
                   FROM alledges WHERE src <> dst GROUP BY 1, 2){body}
            SELECT e.a, e.b, CAST(coalesce(s.c, 0) AS BIGINT) AS support
            FROM e{rounds} e LEFT JOIN s{rounds + 1} s USING (a, b)"""


def _lpa_rounds_body(rounds: int) -> str:
    """The per-round vote/top-1 CTE pairs of the unrolled synchronous-LPA
    twin (operators/graph.py:label_propagation) — requires ``wsym``
    (a, b, w) and ``lp0`` (node, label) upstream; ends at ``lp{rounds}``.
    Shared by the label_propagation and community_modularity oracles."""
    return "".join(f""",
            v{i} AS (SELECT s.a AS node, l.label, sum(s.w) AS ws
                     FROM wsym s JOIN lp{i - 1} l ON s.b = l.node
                     GROUP BY s.a, l.label),
            lp{i} AS (SELECT node, label FROM v{i}
                      QUALIFY row_number() OVER (
                        PARTITION BY node
                        ORDER BY ws DESC, label) = 1)""" for i in range(1, rounds + 1))


def _lpa_with_clause(rounds: int = 3) -> str:
    """WITH-clause of the unrolled-LPA twin over the n_docs-weighted
    entity co-occurrence edges; ends at ``lp{rounds}`` = (node, label)."""
    return f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
            we AS (SELECT a.canonical_id AS src, b.canonical_id AS dst,
                          count(*) AS nd
                   FROM ents a JOIN ents b
                     ON a.doc_id = b.doc_id
                    AND a.canonical_id < b.canonical_id
                   GROUP BY src, dst),
            wsym AS (SELECT src AS a, dst AS b, CAST(nd AS DOUBLE) AS w
                     FROM we
                     UNION ALL
                     SELECT dst, src, CAST(nd AS DOUBLE) FROM we),
            lp0 AS (SELECT DISTINCT a AS node, a AS label FROM wsym)\
{_lpa_rounds_body(rounds)}"""


def _label_propagation_oracle_sql(rounds: int = 3) -> str:
    """Unrolled synchronous-LPA twin (see _lpa_with_clause)."""
    return f"""{_lpa_with_clause(rounds)}
            SELECT node, label AS community FROM lp{rounds}"""


# community gadget for the modularity fixture: two 5-cliques joined by a
# single bridge — the host graph alone LPA-collapses to one community
# (dense hub structure), so without this the modularity evidence would be
# the degenerate Q=0 single row
GADGET_EDGE_ROWS = (
    [(f"cliqA{i:02d}", f"cliqA{j:02d}")
     for i in range(5) for j in range(i + 1, 5)]
    + [(f"cliqB{i:02d}", f"cliqB{j:02d}")
       for i in range(5) for j in range(i + 1, 5)]
    + [("cliqA00", "cliqB00")])
GADGET_VALUES_SQL = ", ".join(f"('{a}', '{b}')" for a, b in GADGET_EDGE_ROWS)

#: bowtie gadget: the bare host fixture is CORE + IN only (every host
#: links into the src0-6 hub set), so these deterministic extras create
#: the remaining Broder classes — an OUT chain off the core, a tendril
#: off IN, a tube IN->OUT bypassing the core, and a disconnected pair.
BOWTIE_GADGET_ROWS = [
    ("src1.example.org", "outa.example.org"),     # core -> OUT
    ("outa.example.org", "outb.example.org"),     # OUT chain
    ("src19.example.org", "tdra.example.org"),    # tendril off IN
    ("src17.example.org", "tubea.example.org"),   # tube entrance
    ("tubea.example.org", "outa.example.org"),    # tube -> OUT
    ("dsca.example.org", "dscb.example.org"),     # disconnected pair
]
BOWTIE_GADGET_VALUES_SQL = ", ".join(
    f"('{a}', '{b}')" for a, b in BOWTIE_GADGET_ROWS)

#: link-farm gadget for the trustrank query: five spam hosts pump rank
#: into a boss page that links into the trusted core — high PageRank,
#: zero trust, spam mass ~ 1 (the pattern TrustRank exists to catch).
TRUST_GADGET_ROWS = (
    [(f"spam{i:02d}.example.org", "spamboss.example.org")
     for i in range(5)]
    + [("spamboss.example.org", "src0.example.org")])
TRUST_GADGET_VALUES_SQL = ", ".join(
    f"('{a}', '{b}')" for a, b in TRUST_GADGET_ROWS)

#: SCAN gadget: the two-clique gadget plus a pendant off cliqA (sigma
#: 2/sqrt(12) ~ 0.577 >= eps -> BORDER) and a bridge touching both
#: cliques (sigma 2/sqrt(18) ~ 0.471 < eps on both sides, neighbors in
#: two clusters -> HUB), so every SCAN role is populated.
SCAN_GADGET_ROWS = GADGET_EDGE_ROWS + [
    ("pendA", "cliqA01"),
    ("hubX", "cliqA02"),
    ("hubX", "cliqB02"),
]
SCAN_GADGET_VALUES_SQL = ", ".join(
    f"('{a}', '{b}')" for a, b in SCAN_GADGET_ROWS)

#: WordPiece vocab for the corpus (31 distinct synthetic tokens): a few
#: whole-word pieces, sub-word splits for the rest, and all single
#: letters EXCEPT 'q' in both initial and continuation form — so
#: 'query' becomes [UNK], exercising the BERT whole-word-UNK rule.
_WP_LETTERS = "abcdefghijklmnoprstuvwxyz"  # no q
WORDPIECE_VOCAB = (
    ["data", "join", "str", "wind", "sp", "ba", "fil", "ta", "cus",
     "sc", "mer", "val", "agg", "key"]
    + ["##eam", "##ow", "##ark", "##tch", "##ter", "##ble", "##tom",
       "##er", "##an", "##ge", "##ue"]
    + list(_WP_LETTERS)
    + ["##" + c for c in _WP_LETTERS])
WORDPIECE_VOCAB_VALUES_SQL = ", ".join(
    f"('{p}', '{p[2:] if p.startswith('##') else p}', "
    f"{len(p[2:] if p.startswith('##') else p)}, "
    f"{'true' if p.startswith('##') else 'false'})"
    for p in sorted(set(WORDPIECE_VOCAB)))

#: the kge.ROT65 rotation table as SQL VALUES (idx, c, s) — the oracle
#: re-derives the per-dimension rotation choice from the same quantized
#: relation components, so the constant list must match kge.ROT65 exactly.
from saber_spark.operators.kge import ROT65 as _ROT65  # noqa: E402

ROT65_VALUES_SQL = ", ".join(
    f"({i}, {c}, {s})" for i, (c, s) in enumerate(_ROT65))


def _modularity_oracle_sql(rounds: int = 3) -> str:
    """Twin of operators/graph.py:modularity over label_propagation's
    partition of the UNWEIGHTED host graph + two-clique gadget: reciprocal
    directed edges collapse to one undirected w=1 edge (the Spark side's
    weight_col=None distinct), then the unrolled-LPA body and pure-SQL
    degree / intra-community-weight aggs; the Newman per-community
    q_contrib = w_in/m - (degsum/2m)^2 in the same double op order as
    the Spark side."""
    lp = f"lp{rounds}"
    return f"""
            WITH {HOST_EDGES_CTE},
            alledges AS (SELECT src, dst FROM hedges
                         UNION ALL
                         SELECT * FROM (VALUES {GADGET_VALUES_SQL})
                           AS g(src, dst)),
            we AS (SELECT least(src, dst) AS src,
                          greatest(src, dst) AS dst, 1 AS nd
                   FROM alledges WHERE src <> dst GROUP BY 1, 2, 3),
            wsym AS (SELECT src AS a, dst AS b, CAST(nd AS DOUBLE) AS w
                     FROM we
                     UNION ALL
                     SELECT dst, src, CAST(nd AS DOUBLE) FROM we),
            lp0 AS (SELECT DISTINCT a AS node, a AS label FROM wsym)\
{_lpa_rounds_body(rounds)},
            und AS (SELECT src AS a, dst AS b, nd AS w FROM we),
            mt AS (SELECT sum(w) AS m FROM und),
            deg AS (SELECT n, sum(w) AS deg FROM (
                      SELECT a AS n, w FROM und
                      UNION ALL SELECT b, w FROM und)
                    GROUP BY n),
            comm AS (SELECT l.label AS c, count(*) AS n_nodes,
                            sum(d.deg) AS degree_sum
                     FROM {lp} l JOIN deg d ON l.node = d.n
                     GROUP BY c),
            win AS (SELECT la.label AS c, sum(e.w) AS w_in
                    FROM und e
                    JOIN {lp} la ON e.a = la.node
                    JOIN {lp} lb ON e.b = lb.node
                               AND la.label = lb.label
                    GROUP BY c)
            SELECT comm.c AS community,
                   CAST(n_nodes AS BIGINT) AS n_nodes,
                   CAST(coalesce(w_in, 0) AS BIGINT) AS internal_weight,
                   CAST(degree_sum AS BIGINT) AS degree_sum,
                   round(CAST(coalesce(w_in, 0) AS DOUBLE)
                           / CAST(m AS DOUBLE)
                         - (CAST(degree_sum AS DOUBLE)
                            / (CAST(m AS DOUBLE) * 2.0))
                         * (CAST(degree_sum AS DOUBLE)
                            / (CAST(m AS DOUBLE) * 2.0)), 6) AS q_contrib
            FROM comm LEFT JOIN win ON comm.c = win.c CROSS JOIN mt"""


def _kmeans_with_clause(k: int = 4, iterations: int = 3) -> str:
    """WITH-clause of the unrolled Lloyd's twin of
    operators/cluster.py:kmeans_assign — one (assign, sums, centroids)
    CTE triple per round, recomputed RELATIONALLY (joins instead of the
    Spark side's broadcast-literal centroids — an independent
    derivation). All arithmetic is exact BIGINT: quantized components,
    integer squared distances, and the same round-half-away-from-zero
    integer mean. Ends with ``afinal`` = the final (vec_id, cluster,
    dist2) assignment, shared by the kmeans and semdedup oracles."""
    rounds = "".join(f""",
            a{r} AS (SELECT vec_id, cluster FROM (
                SELECT d.vec_id, c.cluster,
                       sum((d.qv - c.cq) * (d.qv - c.cq)) AS dist2
                FROM dims d JOIN c{r - 1} c ON d.dim = c.dim
                GROUP BY d.vec_id, c.cluster)
              QUALIFY row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist2, cluster) = 1),
            s{r} AS (SELECT a.cluster, d.dim, sum(d.qv) AS s,
                            count(*) AS n
                     FROM a{r} a JOIN dims d USING (vec_id)
                     GROUP BY a.cluster, d.dim),
            c{r} AS (SELECT c.cluster, c.dim,
                            COALESCE(CASE WHEN s.s >= 0
                                          THEN (2 * s.s + s.n) // (2 * s.n)
                                          ELSE -((-2 * s.s + s.n)
                                                 // (2 * s.n)) END,
                                     c.cq) AS cq
                     FROM c{r - 1} c LEFT JOIN s{r} s
                       ON s.cluster = c.cluster AND s.dim = c.dim)"""
                     for r in range(1, iterations + 1))
    return f"""
            WITH q AS (SELECT vec_id,
                              list_transform(embedding,
                                x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)
                              ) AS qv
                       FROM embeddings),
            dims AS (SELECT vec_id,
                            CAST(generate_subscripts(qv, 1) - 1 AS BIGINT)
                              AS dim,
                            unnest(qv) AS qv
                     FROM q),
            seeds AS (SELECT vec_id,
                             CAST(row_number() OVER (ORDER BY vec_id) - 1
                                  AS BIGINT) AS cluster
                      FROM (SELECT vec_id FROM embeddings
                            ORDER BY vec_id LIMIT {k})),
            c0 AS (SELECT s.cluster, d.dim, d.qv AS cq
                   FROM seeds s JOIN dims d USING (vec_id)){rounds},
            afinal AS (
                SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
                       CAST(dist2 AS BIGINT) AS dist2 FROM (
                    SELECT d.vec_id, c.cluster,
                           sum((d.qv - c.cq) * (d.qv - c.cq)) AS dist2
                    FROM dims d JOIN c{iterations} c ON d.dim = c.dim
                    GROUP BY d.vec_id, c.cluster)
                QUALIFY row_number() OVER (PARTITION BY vec_id
                          ORDER BY dist2, cluster) = 1)"""


def _kmeans_oracle_sql(k: int = 4, iterations: int = 3) -> str:
    return (_kmeans_with_clause(k, iterations)
            + "\n            SELECT vec_id, cluster, dist2 FROM afinal")


def _semdedup_oracle_sql(k: int = 4, iterations: int = 2,
                         threshold: float = 0.35) -> str:
    """Twin of operators/cluster.py:semdedup — the kmeans assignment CTE
    chain, then the within-cluster pairwise quantized cosine and the
    lowest-id-wins drop rule (same dot/norm arithmetic as the
    embedding_near_dup oracle)."""
    return _kmeans_with_clause(k, iterations) + f""",
            vals AS (SELECT vec_id,
                            CAST(generate_subscripts(qv, 1) AS INT) AS i,
                            unnest(qv) AS v
                     FROM q),
            norms AS (SELECT vec_id, sum(v * v) AS norm2
                      FROM vals GROUP BY vec_id),
            member AS (SELECT vec_id, cluster FROM afinal),
            pairs AS (SELECT x.vec_id AS va, y.vec_id AS vb
                      FROM member x JOIN member y
                        ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
            dots AS (SELECT p.va, p.vb, sum(a.v * b.v) AS dot
                     FROM pairs p
                     JOIN vals a ON a.vec_id = p.va
                     JOIN vals b ON b.vec_id = p.vb AND b.i = a.i
                     GROUP BY p.va, p.vb),
            dropped AS (SELECT DISTINCT d.vb
                        FROM dots d
                        JOIN norms na ON na.vec_id = d.va
                        JOIN norms nb ON nb.vec_id = d.vb
                        WHERE d.dot / sqrt(na.norm2::DOUBLE
                                           * nb.norm2::DOUBLE)
                              >= {threshold})
            SELECT m.vec_id, m.cluster, (dr.vb IS NULL) AS keep
            FROM member m LEFT JOIN dropped dr ON dr.vb = m.vec_id"""


def _linked_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = tokenize_docs(_docs(spark, sf_dir))
    dict_df = (spark.createDataFrame(
        _SINGLE_DICT, "surface string, label string, canonical_id string"))
    return tokens.join(F.broadcast(dict_df),
                       tokens.token == F.col("surface")).select(
        "doc_id", "pos", "token", "label", "canonical_id")


# ----------------------------------------------------------------- queries

def q_scan_filter_project(spark, sf_dir):
    return (_docs(spark, sf_dir)
            .filter((F.col("lang") == "en") & F.col("text").isNotNull())
            .select("doc_id", "source", "n_chars"))


def q_tokenize_explode(spark, sf_dir):
    return tokenize_docs(_docs(spark, sf_dir)).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "token")


def q_token_freq(spark, sf_dir):
    return token_freq(tokenize_docs(_docs(spark, sf_dir)))


def q_rare_tokens(spark, sf_dir):
    return rare_tokens(tokenize_docs(_docs(spark, sf_dir)), max_count=RARE_MAX)


def q_vocab_ids(spark, sf_dir):
    return vocab_ids(tokenize_docs(_docs(spark, sf_dir))).select(
        "token", F.col("token_id").cast("long").alias("token_id"))


def q_bio_chunks(spark, sf_dir):
    return chunk_bio_sql(_event_tags(_events(spark, sf_dir), TAG_CASE)).select(
        "seq_id", "label",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.col("chunk_end").cast("long").alias("chunk_end"))


def q_entity_link(spark, sf_dir):
    return _linked_spark(spark, sf_dir)


def q_canonicalize_salted(spark, sf_dir):
    linked = _linked_spark(spark, sf_dir)
    counts = salted_count(linked, ["canonical_id", "label"], "doc_id",
                          out_col="n_mentions")
    docs = (linked.select("canonical_id", "label", "doc_id").dropDuplicates()
            .groupBy("canonical_id", "label")
            .agg(F.count(F.lit(1)).alias("n_docs")))
    return counts.join(docs, ["canonical_id", "label"]).select(
        "canonical_id", "label", "n_mentions", "n_docs")


def q_triples_cooccur(spark, sf_dir):
    from saber_spark.operators.triples import assemble_triples
    linked = _linked_spark(spark, sf_dir).select(
        F.col("doc_id").alias("url"), F.lit(0).alias("sent_id"),
        "canonical_id")
    triples = assemble_triples(linked)
    return (triples.groupBy("subj", "pred", "obj")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("url").cast("long").alias("first_doc")))


def q_eval_prf(spark, sf_dir):
    events = _events(spark, sf_dir)
    gold = chunk_bio_sql(_event_tags(events, TAG_CASE))
    pred = chunk_bio_sql(_event_tags(events, PRED_TAG_CASE))
    return evaluate_chunks(gold, pred, criteria="exact", extra_keys=["seq_id"])


def q_split_folds(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (fold_assign(orders, "o_orderkey", 5)
            .groupBy(F.col("fold").cast("long").alias("fold"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("o_orderkey").alias("max_key")))


def q_top1_per_user(spark, sf_dir):
    return top1_by(_events(spark, sf_dir), ["user_id"], "value", "event_id"
                   ).select("user_id", "event_id", "value")


def q_sessionize(spark, sf_dir):
    return sessionize(_events(spark, sf_dir)).select(
        "user_id", F.col("session_id").cast("long").alias("session_id"),
        "n_events", "session_start_us", "session_end_us", "total_value")


def q_window_agg(spark, sf_dir):
    return tumbling_window_agg(_events(spark, sf_dir))


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition table over per-user event streams
    (deterministic (ts, event_id) ordering) — the behavioral-analytics
    complement of funnel/cohort."""
    from saber_spark.operators.sessions import event_transitions
    return event_transitions(_events(spark, sf_dir))


def q_funnel_conversion(spark, sf_dir):
    """K-step ordered funnel (view -> click -> purchase) in ONE shuffle:
    chained running-min windows over a single user_id sort; the oracle is
    the equivalent K-way join formulation."""
    from saber_spark.operators.funnel import funnel_conversion
    return funnel_conversion(_events(spark, sf_dir))


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention triangle over epoch-week indices (integer,
    timezone-free); active-week sets stay partitioned by user via
    collect_set, bounded by corpus lifetime in weeks."""
    from saber_spark.operators.funnel import cohort_retention
    return cohort_retention(_events(spark, sf_dir))


def q_mixture_weights(spark, sf_dir):
    """Temperature-scaled (alpha=0.5) data-mixing weights per source —
    the LLM-pretraining sampling-mixture table."""
    from saber_spark.operators.splits import mixture_weights
    return mixture_weights(_docs(spark, sf_dir))


def q_table_profile(spark, sf_dir):
    """ANALYZE-shape one-pass profiling of the documents table: stack K
    columns wide-to-long, ONE grouped agg for nulls/distinct/min/max."""
    from saber_spark.operators.profile import profile_table
    return profile_table(_docs(spark, sf_dir),
                         ["doc_id", "lang", "source", "n_chars"])


def q_tpch_q1(spark, sf_dir):
    return tpch.pricing_summary(tpch.load(spark, sf_dir, "lineitem"))


def q_tpch_q3_top10(spark, sf_dir):
    return tpch.top_orders_by_revenue(
        tpch.load(spark, sf_dir, "customer"),
        tpch.load(spark, sf_dir, "orders"),
        tpch.load(spark, sf_dir, "lineitem"))


def q_tpch_q5_nation(spark, sf_dir):
    return tpch.revenue_by_nation(
        tpch.load(spark, sf_dir, "customer"),
        tpch.load(spark, sf_dir, "orders"),
        tpch.load(spark, sf_dir, "lineitem"),
        tpch.load(spark, sf_dir, "nation"),
        tpch.load(spark, sf_dir, "region"))


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_docs(spark, sf_dir), portable_ids=True).select(
        "doc_id", F.col("seed_id").cast("long").alias("seed_id"),
        F.col("minhash").cast("long").alias("minhash"))


def q_minhash_candidates(spark, sf_dir):
    return minhash_candidates(_docs(spark, sf_dir), portable_ids=True)


def q_ngram_jaccard(spark, sf_dir):
    """Candidates + verify. The chain recomputes the narrow shingle lineage
    per join branch; whether to share it instead is SCALE-DEPENDENT,
    measured both ways (BENCH/ab_shingles.json, round 3):
      - plain sf0.1 (5k docs, this query's bench shape): recompute inside
        codegen wins, 3.2s vs 6.0s persisted — the cache round-trip costs
        more than the narrow JVM recompute;
      - sf0.1 x32 (160k docs, production xxhash64 ids): the shared stage
        wins, persist 22.4s / parquet-materialized 22.5s vs 27.0s
        recompute (no sample overlap across 3 interleaved rounds).
    So the registered query keeps the recompute plan (it wins at the scale
    the driver benches), and past the crossover — certainly at 100 TB —
    callers pass a persisted/materialized doc_shingles() via
    ngram_jaccard(..., shingles=...)."""
    docs = _docs(spark, sf_dir)
    return ngram_jaccard(docs, minhash_candidates(docs, portable_ids=True))


def q_ngram_containment(spark, sf_dir):
    """Asymmetric shingle containment over the LSH candidate pairs —
    catches quotation/subset relations that symmetric Jaccard dilutes
    (a short doc fully embedded in a long one). Same candidates and
    recompute-vs-share contract as ngram_jaccard."""
    from saber_spark.operators.dedup import (minhash_candidates,
                                             ngram_containment)
    docs = _docs(spark, sf_dir)
    return ngram_containment(docs, minhash_candidates(docs,
                                                      portable_ids=True))


def q_ppr_hosts(spark, sf_dir):
    """Personalized PageRank around two seed hosts (graph.py) — the
    GraphRAG-style 'rank the neighborhood of the query entities' scorer;
    teleport returns to the seeds, unreachable hosts report 0.0.
    Oracle: unrolled rounds with the same left-join teleport re-add."""
    from saber_spark.operators.graph import personalized_pagerank
    seeds = spark.createDataFrame(
        [("src3.example.org",), ("src5.example.org",)], "node string")
    return personalized_pagerank(_host_edges(spark, sf_dir), seeds,
                                 iterations=4)


def q_random_walks(spark, sf_dir):
    """DeepWalk-style walk corpus (2 walks x 3 steps from every host):
    deterministic md5-driven next-hop (graph.random_walks) — the
    reproducible training input for graph-embedding pipelines. Oracle:
    unrolled per-step twin with the same hash arithmetic."""
    from saber_spark.operators.graph import random_walks
    return random_walks(_host_edges(spark, sf_dir), walk_len=3,
                        walks_per_node=2)


def q_kcore_hosts(spark, sf_dir):
    """4-core of the host link graph (graph.kcore_nodes): the classic
    crawl-graph pruning pass — peeling drops dangling subtrees before
    expensive analytics. Oracle: unrolled peel rounds (monotone, so
    extra rounds past convergence are no-ops)."""
    from saber_spark.operators.graph import kcore_nodes
    return kcore_nodes(_host_edges(spark, sf_dir), k=4)


def q_readability(spark, sf_dir):
    """Flesch reading-ease per doc (textstats.readability_scores): the
    classic heuristic quality signal next to the Gopher shape rules —
    one narrow projection, two regexp counts + a split size."""
    from saber_spark.operators.textstats import readability_scores
    return readability_scores(_docs(spark, sf_dir))


def q_scrub_dup_spans(spark, sf_dir):
    """Cross-document duplicate-SPAN removal (Lee et al. 2022 rewrite
    counterpart of crossdoc_ngram_dup's score): positions covered by a
    5-gram appearing in >= 2 docs are deleted, survivors reassemble in
    order; fully-duplicated docs survive with clean_text = ''."""
    from saber_spark.operators.dedup import scrub_dup_spans
    return scrub_dup_spans(_docs(spark, sf_dir), n=5, min_df=2)


def q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis–Spirakis weighted sampling without
    replacement (top-25 by u^(1/w), u = md5-hash uniform): reproducible
    across runs, partitionings, and engines (operators/splits.py)."""
    from saber_spark.operators.splits import weighted_sample
    return weighted_sample(_docs(spark, sf_dir), "n_chars", k=25)


def q_simhash(spark, sf_dir):
    return simhash(_docs(spark, sf_dir)).select(
        "doc_id", F.col("simhash").cast("long").alias("simhash"))


def q_crossdoc_ngram_dup(spark, sf_dir):
    """Exact cross-document 3-gram duplication fraction per doc
    (RefinedWeb/CCNet-style boilerplate score — the exact complement to
    MinHash near-dup and to gopher's within-doc repetition)."""
    from saber_spark.operators.dedup import crossdoc_ngram_dup
    return crossdoc_ngram_dup(_docs(spark, sf_dir))


def q_cosine_topk(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=3).select(
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("long").alias("rank"))


def q_lsh_cosine_topk(spark, sf_dir):
    return lsh_cosine_topk(_embeddings(spark, sf_dir), k=3).select(
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("long").alias("rank"))


def q_lsh_cosine_multiband(spark, sf_dir):
    """Multi-band OR construction (2 bands x 3 planes): a pair is scored if
    it shares a bucket in ANY band — the recall-recovery half of the scaled
    ANN design (n_planes grows with log N, bands restore recall)."""
    return lsh_cosine_topk(_embeddings(spark, sf_dir), k=3,
                           n_planes=3, n_bands=2).select(
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("long").alias("rank"))


def q_ivf_cosine_topk(spark, sf_dir):
    """IVF ANN: cell-partitioned candidates (inverted file on the coarse
    quantizer) — the second scale path next to sign-LSH."""
    from saber_spark.operators.similarity import ivf_cosine_topk
    return ivf_cosine_topk(_embeddings(spark, sf_dir), k=3, n_centroids=8,
                           n_probe=2, n_queries=10).select(
        "query_id", "neighbor_id", "cosine",
        F.col("rank").cast("long").alias("rank"))


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs: LSH candidates verified once against
    a cosine threshold (the embedding member of the dedup family)."""
    from saber_spark.operators.similarity import embedding_near_dup
    return embedding_near_dup(_embeddings(spark, sf_dir),
                              threshold=0.35, n_planes=3, n_bands=2)


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_stopwords").cast("long").alias("n_stopwords"),
        "en_ratio", "pred_lang")


def q_quality_score(spark, sf_dir):
    q = quality_score(_docs(spark, sf_dir))
    return q.select(
        "doc_id", "n_chars", F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_token_len", "punct_ratio", "stopword_ratio", "quality")


def q_token_counts(spark, sf_dir):
    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_re_tokens").cast("long").alias("n_re_tokens"))


def q_doc_fingerprint(spark, sf_dir):
    return doc_fingerprint(_docs(spark, sf_dir)).select(
        "doc_id", F.col("fingerprint").cast("long").alias("fingerprint"))


def q_gopher_repetition(spark, sf_dir):
    """Gopher/MassiveText-style repetition + shape corpus filter."""
    return gopher_quality(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len", "top_bigram_frac", "dup_trigram_frac", "keep")


def q_pii_scrub(spark, sf_dir):
    """PII masking (emails/IPv4/phones -> placeholder tokens) + density
    counts; regex dialect restricted to the Java-regex/RE2 intersection so
    the scrubbed bytes match DuckDB exactly."""
    return pii_scrub(_docs(spark, sf_dir))


def q_sequence_packing(spark, sf_dir):
    """Token-budget sequence packing: per-source running token count cut
    into 512-token bins (the LLM-pretraining shard-assignment table)."""
    from saber_spark.operators.packing import pack_sequences
    return pack_sequences(_docs(spark, sf_dir), window=512)


def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id < 5 stand in for the
    eval set; every other doc is flagged if it shares any word 5-gram
    with them (broadcast n-gram semi-join + hit counts)."""
    from saber_spark.operators.dedup import contamination_check
    docs = _docs(spark, sf_dir)
    return contamination_check(docs.filter(F.col("doc_id") >= 5),
                               docs.filter(F.col("doc_id") < 5), n=5)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup dedup capstone: LSH candidates -> Jaccard>=0.5 verify ->
    connected components -> per-doc (cluster, size, keep) decision table.
    Oracle: the same chain in SQL with a recursive-CTE component step.
    rounds=None = fixpoint mode: EXACT like the oracle's recursive CTE for
    any chain length, and it raises rather than silently splitting a
    cluster if propagation hasn't converged (a fixed rounds=K would
    under-merge chains longer than K with no error). Cheap here because
    the edge table is materialized and tiny.
    Shingle-stage A/B (BENCH/ab_clusters.json, r4): sharing a persisted/
    materialized shingle stage across the candidate+verify branches is a
    statistical tie for the FULL chain at x32 corpus scale (medians 33.3
    vs 33.4 s) — the localCheckpointed pairs table already bounds
    recomputation — so the default stays recompute; at 100 TB the
    ``shingles=`` hook is for resumability, not latency."""
    from saber_spark.operators.dedup import dedup_clusters
    return dedup_clusters(_docs(spark, sf_dir), threshold=0.5, rounds=None,
                          portable_ids=True).select(
        "doc_id", F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"), "keep")


def q_zscore_by_source(spark, sf_dir):
    """applyInPandas grouped-map vs pure window SQL (cross-paradigm parity)."""
    from saber_spark.operators.groupstats import zscore_by_group
    return zscore_by_group(_docs(spark, sf_dir))


def q_eval_prf_left(spark, sf_dir):
    """Chunk eval under the 'left' boundary criteria (saber/metrics.py:161)."""
    events = _events(spark, sf_dir)
    gold = chunk_bio_sql(_event_tags(events, TAG_CASE))
    pred = chunk_bio_sql(_event_tags(events, PRED_TAG_CASE))
    return evaluate_chunks(gold, pred, criteria="left", extra_keys=["seq_id"])


def q_eval_prf_right(spark, sf_dir):
    """Chunk eval under the 'right' boundary criteria (saber/metrics.py:163-166)."""
    events = _events(spark, sf_dir)
    gold = chunk_bio_sql(_event_tags(events, TAG_CASE))
    pred = chunk_bio_sql(_event_tags(events, PRED_TAG_CASE))
    return evaluate_chunks(gold, pred, criteria="right", extra_keys=["seq_id"])


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + single aggregate (pushdown showcase)."""
    li = tpch.load(spark, sf_dir, "lineitem")
    return (li.filter((F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")
                       * F.col("l_discount").cast("decimal(5,4)"))
                 .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


def q_above_nation_avg(spark, sf_dir):
    """Correlated-subquery shape (decorrelation): customers whose balance
    exceeds their nation's average balance."""
    customer = tpch.load(spark, sf_dir, "customer")
    nation_avg = (customer.groupBy("c_nationkey")
                  .agg(F.avg(F.col("c_acctbal").cast("decimal(12,2)"))
                       .cast("double").alias("nation_avg")))
    return (customer.join(nation_avg, "c_nationkey")
            .filter(F.col("c_acctbal") > F.col("nation_avg"))
            .select("c_custkey", "c_nationkey", "c_acctbal",
                    F.round(F.col("nation_avg"), 6).alias("nation_avg")))


def q_exists_high_value(spark, sf_dir):
    """EXISTS / left-semi: orders having at least one lineitem > 1900."""
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    high = li.filter(F.col("l_extendedprice") > 1900).select("l_orderkey")
    return (orders.join(high, orders.o_orderkey == high.l_orderkey,
                        "left_semi")
            .select("o_orderkey", "o_orderstatus", "o_totalprice"))


def q_customers_without_orders(spark, sf_dir):
    """NOT EXISTS / anti join: FN-side of the eval joins (O20).

    Restricted to URGENT orders so the result is non-empty on testdata
    (every customer has some order; ~200 lack an urgent one at sf0.01)."""
    customer = tpch.load(spark, sf_dir, "customer")
    urgent = tpch.load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (customer.join(urgent,
                          customer.c_custkey == urgent.o_custkey,
                          "left_anti")
            .select("c_custkey", "c_name", "c_mktsegment"))


def q_token_bigrams(spark, sf_dir):
    """Token bigram counts over the corpus (n-gram LM statistics)."""
    tokens = tokenize_docs(_docs(spark, sf_dir))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (tokens
            .withColumn("next_token", F.lead("token").over(w))
            .filter(F.col("next_token").isNotNull())
            .groupBy("token", "next_token")
            .agg(F.count(F.lit(1)).alias("n")))


def q_mentions_histogram(spark, sf_dir):
    """Distribution query: how many docs have k linked mentions (count of
    counts — the shape of corpus QA dashboards)."""
    linked = _linked_spark(spark, sf_dir)
    per_doc = linked.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k"))
    return per_doc.groupBy("k").agg(F.count(F.lit(1)).alias("n_docs"))


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP aggregation (region -> nation -> grand total).

    The micro/macro aggregation vehicle from SURVEY §2.2 (O20/O21): subtotal
    rows correspond to pooled (micro) scores, leaf rows to per-label scores.
    """
    lineitem = tpch.load(spark, sf_dir, "lineitem")
    orders = tpch.load(spark, sf_dir, "orders")
    customer = tpch.load(spark, sf_dir, "customer")
    nation = tpch.load(spark, sf_dir, "nation")
    region = tpch.load(spark, sf_dir, "region")
    dims = (customer
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .select("c_custkey", "n_name", "r_name"))
    base = (lineitem
            .join(orders.select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .join(dims, F.col("o_custkey") == F.col("c_custkey")))
    return (base.rollup("r_name", "n_name")
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                 .cast("double").alias("total_price"),
                 F.count(F.lit(1)).alias("n_items")))


def q_asof_join(spark, sf_dir):
    """Point-in-time join: each purchase gets the user's most recent
    at-or-before click (the as-of join Spark lacks natively; one-shuffle
    union+window formulation, DuckDB native ASOF JOIN as oracle)."""
    from saber_spark.operators.asof import asof_join
    events = _events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("user_id", "event_id", "ts", "value")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("user_id", "event_id", "ts", "value")
    out = asof_join(purchases, clicks, keys=["user_id"], ts_col="ts",
                    payload_cols=["event_id", "value"])
    return out.select("user_id", "event_id", "value",
                      F.col("asof_event_id").cast("long").alias("asof_event_id"),
                      "asof_value")


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-source data mixing: 80% of src0, 50% of src1,
    none of src2, 20% of everything else — membership a pure hash of the
    row id (reproducible, nested, engine-portable; no RNG)."""
    from saber_spark.operators.splits import stratified_sample
    sampled = stratified_sample(
        _docs(spark, sf_dir), "source", "doc_id",
        fractions={"src0": 0.8, "src1": 0.5, "src2": 0.0},
        default_fraction=0.2)
    return (sampled.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.min("doc_id").alias("min_id")))


def q_connected_components(spark, sf_dir):
    """Iterative hash-min connected components over the entity co-occurrence
    graph (DuckDB oracle: recursive-CTE min-reachable-node)."""
    from saber_spark.operators.graph import connected_components
    # 9-node fixture graph: diameter <= 8, so 8 lazy rounds run as ONE job
    # (the fixpoint mode pays per-round driver actions — wrong trade here)
    return connected_components(_entity_edges(spark, sf_dir), rounds=8)


def _entity_edges(spark, sf_dir):
    """Shared entity co-occurrence edge derivation (doc granularity) for
    the graph-analytics queries — same shape the CC oracle uses.

    The (doc, entity) table is materialized before the self-join: both
    join branches otherwise re-evaluate the full tokenize+link lineage
    (measured ~2x the query time at sf0.1). At 100 TB this table is the
    pipeline's persisted mention output, not a recompute."""
    linked = _linked_spark(spark, sf_dir)
    ents = (linked.select("doc_id", "canonical_id").distinct()
            .localCheckpoint(eager=True))
    a, b = ents.alias("a"), ents.alias("b")
    return (a.join(b, "doc_id")
            .filter(F.col("a.canonical_id") < F.col("b.canonical_id"))
            .select(F.col("a.canonical_id").alias("src"),
                    F.col("b.canonical_id").alias("dst"))
            .distinct())


def q_pagerank_entities(spark, sf_dir):
    """Entity centrality: 5 power iterations of PageRank over the
    co-occurrence graph (oracle: unrolled CTE per iteration)."""
    from saber_spark.operators.graph import pagerank
    return pagerank(_entity_edges(spark, sf_dir), iterations=5)


def q_triangle_entities(spark, sf_dir):
    """Per-entity triangle counts (local clustering) over the
    co-occurrence graph — degree-ordered orientation in Spark, plain
    id-ordering in the oracle (the triangle set is orientation-free)."""
    from saber_spark.operators.graph import triangle_count
    return triangle_count(_entity_edges(spark, sf_dir))


def q_edge_pmi(spark, sf_dir):
    """PMI edge confidence for entity pairs (document granularity):
    normalizes co-occurrence by marginal doc frequency so hub entities
    don't dominate the KG edge weights."""
    from saber_spark.operators.triples import pmi_weights
    return pmi_weights(_linked_spark(spark, sf_dir))


def q_tfidf_topterms(spark, sf_dir):
    """Classic tf·ln(N/df) term weighting over the corpus (unranked
    score table; the ranked top-k is q_tfidf_ranked)."""
    from saber_spark.operators.vocab import tfidf_scores
    return tfidf_scores(tokenize_docs(_docs(spark, sf_dir)))


def q_tfidf_ranked(spark, sf_dir):
    """Per-doc top-3 terms by TF-IDF, deterministic (rounded-score DESC,
    token ASC) tie-break — VERDICT r3 #8: the ranked variant is now
    oracle-checkable because the rank orders by the 6dp-rounded score the
    unranked oracle already proves byte-identical across engines."""
    return (tfidf_topk(tokenize_docs(_docs(spark, sf_dir)), k=3)
            .select("doc_id", "token", "tf", "tfidf",
                    F.col("rank").cast("long").alias("rank")))


def q_sentence_split(spark, sf_dir):
    """Rule-based sentence segmentation (SURVEY O2) as an oracle-checked
    relational query — VERDICT r3 #6; parity kernels.text.sentence_spans /
    saber/preprocessor.py:90-99 (lookbehind-free construction, see
    operators/vocab.split_sentences)."""
    return split_sentences(_docs(spark, sf_dir))


def q_mixture_sample(spark, sf_dir):
    """Temperature-weighted corpus sampler: mixture_weights' oversample
    turned into per-source deterministic hash membership (expected
    target_fraction of corpus tokens kept, redistributed toward small
    sources; saturated sources visible as keep_rate=1.0)."""
    from saber_spark.operators.splits import mixture_sample
    return mixture_sample(_docs(spark, sf_dir), target_fraction=0.5)


def q_quality_filter(spark, sf_dir):
    """RefinedWeb-style composite keep/drop decision table with per-doc
    failure reasons (lang / low_quality / repetition) — the audit column a
    production corpus filter materializes alongside the keep bit."""
    from saber_spark.operators.textstats import quality_filter
    return quality_filter(_docs(spark, sf_dir))


def q_proximity_triples(spark, sf_dir):
    """Token-window relation candidates: (subj, near_10, obj) for linked
    mention pairs within 10 tokens, weighted by pair and doc counts —
    the co-occurrence granularity between doc-level triples_cooccur and
    sentence windows (this corpus has no sentence punctuation)."""
    from saber_spark.operators.triples import proximity_triples
    return proximity_triples(_linked_spark(spark, sf_dir), k=10)


def q_centroid_classify(spark, sf_dir):
    """Nearest-centroid embedding classifier with closed-form distributed
    training (one hash agg fits the model): held-out confusion counts on
    hash-fold 0, trained on the rest — the embedding-side quality-
    classifier shape of production corpus pipelines."""
    from saber_spark.operators.classify import centroid_confusion
    return (centroid_confusion(_embeddings(spark, sf_dir))
            .select(F.col("true_label").cast("long").alias("true_label"),
                    F.col("pred_label").cast("long").alias("pred_label"),
                    "n_vecs"))


def q_degree_hist(spark, sf_dir):
    """Degree distribution of the co-occurrence KG (graph health profile;
    the heavy tail is the hub-entity skew signal the salted
    canonicalization exists for)."""
    from saber_spark.operators.graph import degree_histogram
    return degree_histogram(q_triples_cooccur(spark, sf_dir),
                            src="subj", dst="obj")


def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality signal: score hash-half 0 of the corpus
    under an add-k bigram model fit on the other half. Bigrams are zipped
    out of each doc's token array (narrow, no shuffle); the model is two
    hash aggs; scoring is two equi-joins + one per-doc agg."""
    from saber_spark.operators.lm import lm_cross_entropy
    return lm_cross_entropy(_docs(spark, sf_dir), INFIX_PATTERN)


def q_lm_backoff(spark, sf_dir):
    """Stupid-backoff trigram scoring (Brants et al. 2007 — the
    web-scale distributed-counting LM recipe) one order above
    lm_perplexity: c123/c12, backing off through alpha*c23/c2 to an
    add-1 unigram floor; same hash-half train/score split."""
    from saber_spark.operators.lm import trigram_backoff_xent
    return trigram_backoff_xent(_docs(spark, sf_dir), INFIX_PATTERN)


def q_clustering_entities(spark, sf_dir):
    """Local clustering coefficient per KG entity (2T/deg(deg-1)):
    star-center vs clique-embedded triage one step past raw triangle
    counts — the over-merged-canonical-id symptom detector. Same
    degree-oriented wedge join as triangle_entities plus one
    distinct-neighbor degree agg."""
    from saber_spark.operators.graph import clustering_coefficient
    return clustering_coefficient(_entity_edges(spark, sf_dir))


def q_textrank_keywords(spark, sf_dir):
    """Per-document TextRank salience (Mihalcea & Tarau 2004): 3 weighted
    PageRank rounds over the window-2 token co-occurrence graph, all
    documents' graphs riding one (doc_id, token) keyspace; top-3 tokens
    per doc by 6dp-rounded score (token ASC tie-break — the
    tfidf_ranked portable-ranking convention). Oracle: unrolled CTE per
    round with doc_id carried through."""
    from saber_spark.operators.graph import textrank
    return textrank(tokenize_docs(_docs(spark, sf_dir)),
                    window=2, iterations=3, top_k=3)


def q_tagger_agreement(spark, sf_dir):
    """Cohen's kappa between the declared lang column (binarized
    en/other) and the stopword-ratio lang_id prediction — the
    annotation-agreement statistic run as rater-vs-model drift check;
    chance-corrected, so the en-heavy base rate doesn't inflate it."""
    from saber_spark.operators.evaluation import cohens_kappa
    docs = _docs(spark, sf_dir)
    declared = F.when(F.col("lang") == "en", F.lit("en")) \
        .otherwise(F.lit("other")).alias("declared")
    rated = (lang_id(docs).select("doc_id", "pred_lang")
             .join(docs.select("doc_id", declared), "doc_id"))
    return cohens_kappa(rated, "declared", "pred_lang")


def q_auc_doclen(spark, sf_dir):
    """Per-source ROC-AUC of document length (n_chars) as a predictor of
    lang='en' — the score-calibration statistic every quality/importance
    scorer in this repo should be audited with. Histogram (tie-exact
    Mann-Whitney) form: the window runs over distinct scores per group,
    never corpus rows."""
    from saber_spark.operators.evaluation import roc_auc
    docs = _docs(spark, sf_dir).select(
        "source", "n_chars", (F.col("lang") == "en").alias("is_en"))
    return roc_auc(docs, "is_en", "n_chars", "source")


def q_cms_tokens(spark, sf_dir):
    """Count-min-sketch heavy hitters over the token stream: the
    depth*width counter grid is broadcastable at any corpus size, CMS
    never underestimates (every true heavy hitter survives), and the
    exact verify count rides alongside the estimate so sketch error is
    visible in the result (the kmv_distinct honesty convention)."""
    from saber_spark.operators.sketch import cms_heavy_hitters
    return cms_heavy_hitters(tokenize_docs(_docs(spark, sf_dir)),
                             "token", width=64, depth=3,
                             support_denom=100).withColumnRenamed(
        "value", "token")


def q_rrf_search(spark, sf_dir):
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    top-15 for the 3-term lexical query with the dense cosine top-15
    around vec 0 (vec_id aligns with doc_id on this corpus) — the
    production RAG combiner; rank-based, so the two scorers need no
    calibration against each other."""
    from saber_spark.operators.retrieval import bm25_topk, rrf_fuse
    lexical = bm25_topk(tokenize_docs(_docs(spark, sf_dir)),
                        ["spark", "stream", "vector"], top_k=15)
    emb = _embeddings(spark, sf_dir)
    dense = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=15) \
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse({"bm25": lexical.select("doc_id", "rank"),
                     "dense": dense}, rrf_k=60, top_k=10)


def q_span_corruption(spark, sf_dir):
    """T5 denoising-objective sample prep (Raffel et al. 2020): hash-
    masked non-overlapping 3-token blocks (expected rate 1/7) replaced
    by <extra_id_k> sentinels in the input; target = sentinel + masked
    tokens per block. Deterministic (splits.py portable hash), so a
    10^12-doc run is reproducible; reassembly is the scrub_dup_spans
    ordered-collect pattern (one shuffle on doc_id)."""
    from saber_spark.operators.samples import span_corruption
    return span_corruption(tokenize_docs(_docs(spark, sf_dir)))


def q_skipgram_pairs(spark, sf_dir):
    """word2vec SGNS training pairs (Mikolov et al. 2013): window-2
    positives in both directions + 2 deterministic hash negatives per
    positive resolved against the broadcast vocab id table — the
    embedding-bootstrap data prep upstream of the reference's own
    word2vec load (saber/utils/data_utils.py)."""
    from saber_spark.operators.samples import skipgram_pairs
    return skipgram_pairs(tokenize_docs(_docs(spark, sf_dir)),
                          window=2, neg_k=2)


def q_skew_canonical(spark, sf_dir):
    """Key-skew diagnostics over the linked mentions' canonical_id — the
    pre-flight audit for the hub-entity skew that the salted
    canonicalization groupBy exists to absorb (skew_factor = max/mean
    key load; entropy vs ln(n_keys) = uniformity)."""
    from saber_spark.operators.profile import skew_profile
    return skew_profile(_linked_spark(spark, sf_dir), "canonical_id")


def q_link_fd_check(spark, sf_dir):
    """Functional-dependency audit surface -> canonical_id over the
    ambiguity-carrying dictionary: each violation row is a surface the
    disambiguator must resolve (empty result would mean the dictionary
    is ambiguity-free). The KG-QA twin of disambiguate_link."""
    from saber_spark.operators.profile import fd_violations
    dict_df = spark.createDataFrame(
        DISAMBIG_DICT, "surface string, label string, canonical_id string")
    linked = tokenize_docs(_docs(spark, sf_dir)).join(
        F.broadcast(dict_df),
        F.col("token") == F.col("surface")).select("token", "canonical_id")
    return fd_violations(linked, "token", "canonical_id")


def q_calibration_quality(spark, sf_dir):
    """Reliability diagram of the composite quality score against
    lang='en' (10 equal-width buckets): AUC's sibling — auc_doclen says
    a score RANKS, this says whether its VALUES mean what they claim
    before anyone thresholds on them. One bucket-keyed hash agg."""
    from saber_spark.operators.evaluation import calibration_curve
    docs = _docs(spark, sf_dir)
    scored = (quality_score(docs)
              .select("doc_id", "quality")
              .join(docs.select("doc_id",
                                (F.col("lang") == "en").alias("is_en")),
                    "doc_id"))
    return calibration_curve(scored, "is_en", "quality", n_buckets=10)


def q_linkpred_auc(spark, sf_dir):
    """Held-out link-prediction evaluation over the host graph: md5
    hash-split edges 50/50, Adamic-Adar scores from the TRAIN half,
    tie-exact ROC-AUC of the candidate scores against TEST membership —
    the eval harness that says whether link_prediction's ranking is any
    good (the eval_prf of KG completion)."""
    from saber_spark.operators.graph import link_prediction_eval
    return link_prediction_eval(_host_edges(spark, sf_dir))


def q_graph_summary(spark, sf_dir):
    """One-row structural profile of the directed host link graph
    (graph.graph_summary): node/edge counts, reciprocity, density, hub
    extremes, out-in degree assortativity — the ANALYZE-TABLE a crawl
    runs on a fresh edge snapshot before pointing PageRank/LPA at it.
    All counts exact BIGINT; the three ratios are single double
    expressions rounded to 6, so the DuckDB twin is byte-parity."""
    from saber_spark.operators.graph import graph_summary
    return graph_summary(_host_edges(spark, sf_dir))


def q_community_modularity(spark, sf_dir):
    """Partition quality of label_propagation's communities on the
    unweighted host graph + two-clique gadget (GADGET_EDGE_ROWS — the
    host graph alone LPA-collapses to one community): per-community
    Newman modularity contributions (graph.modularity); sum(q_contrib)
    is the global Q the KG build alerts on when a data change degrades
    its community structure. Oracle: the unrolled-LPA CTE body shared
    with label_propagation plus pure-SQL degree/intra-weight aggs."""
    from saber_spark.operators.graph import label_propagation, modularity
    gadget = spark.createDataFrame(GADGET_EDGE_ROWS,
                                   "src string, dst string")
    edges = (_host_edges(spark, sf_dir).unionByName(gadget)
             .localCheckpoint(eager=True))
    labels = label_propagation(edges, rounds=3)
    return modularity(edges, labels)


def q_entity_salience(spark, sf_dir):
    """Entity aboutness per (doc, entity): mention frequency + first/last
    position + salience = n_mentions * (1 - first_pos/doc_len)
    (linking.entity_salience; Dunietz & Gillick 2014 feature set). The
    signal that separates what a page is ABOUT from background mentions
    before triples inherit confidence. One agg + one doc_id join."""
    from saber_spark.operators.linking import entity_salience
    linked = _linked_spark(spark, sf_dir)
    doc_lens = (tokenize_docs(_docs(spark, sf_dir))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("doc_len")))
    return entity_salience(linked, doc_lens)


def q_negation_scope(spark, sf_dir):
    """NegEx-style pre-scope negation rates per entity
    (linking.negation_flags, Chapman et al. 2001): a mention preceded by
    a cue token within 5 tokens in the same document counts negated;
    output (canonical_id, n_mentions, n_negated, neg_rate). The
    asserted-vs-negated split the reference's UMLS linking lacks
    entirely (grounding_utils.py attaches every match). Per-document
    blocking keeps the cue join linear. Fixture cue list = the real
    NegEx cues + two corpus stand-ins (FIXTURE_NEG_CUES: the synthetic
    vocabulary has no English negation term)."""
    from saber_spark.operators.linking import negation_flags
    linked = _linked_spark(spark, sf_dir)
    tokens = tokenize_docs(_docs(spark, sf_dir))
    return negation_flags(linked, tokens, window=5,
                          cues=FIXTURE_NEG_CUES)


def q_entity_resolution(spark, sf_dir):
    """Blocked fuzzy entity resolution (canonicalize.resolve_entities):
    cluster surface forms within first-character blocks at edit
    distance <= 1, transitive closure via hash-min CC, canonical = min
    name per cluster; singletons keep themselves. Fixture names = the
    corpus vocabulary plus an 's'-suffixed variant of every token, so
    real merge edges exist. Oracle: DuckDB levenshtein + recursive-CTE
    closure (the connected_components oracle pattern)."""
    from saber_spark.operators.canonicalize import resolve_entities
    toks = (tokenize_docs(_docs(spark, sf_dir))
            .select(F.lower("token").alias("name")).distinct())
    names = toks.unionByName(
        toks.select(F.concat("name", F.lit("s")).alias("name"))).distinct()
    return resolve_entities(names, max_edits=1, block_chars=1)


def q_mad_outliers(spark, sf_dir):
    """Robust per-source length-outlier profile via median absolute
    deviation (groupstats.mad_outliers, Iglewicz-Hoaglin modified
    z-score > 3.5) — zscore_by_source's outlier-resistant sibling; the
    form web-corpus length filters actually use. The synthetic corpus is
    uniform-length, so the fixture injects deterministic boilerplate
    mega-pages (doc_id % 97 -> 50x length, mirrored in the oracle) to
    exercise nonzero flag counts."""
    from saber_spark.operators.groupstats import mad_outliers
    docs = _docs(spark, sf_dir).withColumn(
        "len", F.when(F.col("doc_id") % 97 == 0,
                      F.col("n_chars") * 50).otherwise(F.col("n_chars")))
    return mad_outliers(docs, "len", "source")


def q_date_mentions(spark, sf_dir):
    """Temporal-expression extraction for timestamped KG assembly
    (textstats.extract_dates): ISO dates in page text -> validated
    (doc_id, date_str, month) mentions, rolled up to per-month counts.
    The corpus has no dates, so the fixture appends one deterministic
    'published YYYY-MM-DD' stamp per doc (doc_id-derived; every 11th doc
    gets an INVALID month 13 that validation must drop) — mirrored in
    the oracle via the same concat."""
    from saber_spark.operators.textstats import extract_dates
    docs = _docs(spark, sf_dir)
    mm = F.when(F.col("doc_id") % 11 == 0, F.lit(13)).otherwise(
        F.col("doc_id") % 12 + 1)
    date_str = F.concat(
        (F.col("doc_id") % 5 + 2020).cast("string"), F.lit("-"),
        F.lpad(mm.cast("string"), 2, "0"), F.lit("-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"))
    stamped = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" published "), date_str)
        .alias("text"))
    return (extract_dates(stamped)
            .groupBy("month")
            .agg(F.count(F.lit(1)).alias("n_mentions"),
                 F.countDistinct("doc_id").alias("n_docs")))


def q_triple_audit(spark, sf_dir):
    """Per-predicate cardinality-constraint audit of the co-occurrence
    triple table (triples.triple_cardinality_audit): distinct-object
    fan-out per subject vs a max-cardinality expectation — the
    Wikidata-property-constraint-style QA gate that catches linking
    noise / escaped hub surfaces before the graph ships."""
    from saber_spark.operators.triples import (assemble_triples,
                                               triple_cardinality_audit)
    linked = _linked_spark(spark, sf_dir).select(
        F.col("doc_id").alias("url"), F.lit(0).alias("sent_id"),
        "canonical_id")
    return triple_cardinality_audit(assemble_triples(linked), max_card=3)


def q_vocab_profile(spark, sf_dir):
    """One-row corpus vocabulary health profile (vocab.vocab_profile):
    token/type counts, hapax share, type-token ratio, top-1 token share
    — the Zipf/Herdan first-look stats a tokenizer-training run checks
    before spending compute. Two hash aggs, ratios rounded to 6."""
    from saber_spark.operators.vocab import vocab_profile
    return vocab_profile(tokenize_docs(_docs(spark, sf_dir)))


def q_distance_histogram(spark, sf_dir):
    """Reachability profile of the host graph from the seed host: BFS
    minimum-hop distances within 3 hops (graph.khop_distance) rolled up
    to (dist, n_nodes, cum_nodes, cum_share) — the distance distribution
    whose 90th percentile is the effective diameter, the crawl-depth
    planning stat. Oracle: the khop recursive CTE + a window cumsum."""
    from pyspark.sql import Window
    from saber_spark.operators.graph import khop_distance
    seeds = spark.createDataFrame([("src3.example.org",)], "node string")
    dists = khop_distance(_host_edges(spark, sf_dir), seeds, k=3)
    hist = dists.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))
    # the unpartitioned window runs on the <=k+1-row histogram, never the
    # node table; total arrives via a 1-row crossJoin to stay lazy
    w = (Window.orderBy("dist")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = dists.agg(F.count(F.lit(1)).alias("_total"))
    return (hist
            .withColumn("cum_nodes", F.sum("n_nodes").over(w).cast("long"))
            .crossJoin(tot)
            .select("dist", "n_nodes", "cum_nodes",
                    F.round(F.col("cum_nodes").cast("double")
                            / F.col("_total").cast("double"), 6)
                    .alias("cum_share")))


def q_chunk_documents(spark, sf_dir):
    """Overlapping sliding-window chunking (window 8, stride 4) — the
    RAG/embedding-index chunker: no span is cut at a hard boundary
    without appearing intact in a neighbor chunk. Membership is per-row
    integer arithmetic + a constant-factor explode; reassembly keys on
    (doc, chunk), finer than doc_id, so long docs spread across
    reducers."""
    from saber_spark.operators.packing import chunk_documents
    return chunk_documents(tokenize_docs(_docs(spark, sf_dir)),
                           window=8, stride=4)


def q_sssp_hosts(spark, sf_dir):
    """Weighted shortest paths (distributed Bellman-Ford) from the seed
    host over the directed host graph with deterministic integer edge
    costs (1 + md5(src:dst) % 5 — the portable hash family): the COST
    upgrade of khop_hosts' hop counts. Exact integer min/+ arithmetic;
    oracle: unrolled relaxation rounds (monotone, so post-convergence
    rounds are no-ops)."""
    from saber_spark.operators.graph import sssp_weighted
    e = _host_edges(spark, sf_dir)
    cost = (F.conv(F.substring(F.md5(F.concat_ws(":", "src", "dst")),
                               1, 8), 16, 10).cast("long") % 5 + 1)
    seeds = spark.createDataFrame([("src3.example.org",)], "node string")
    return sssp_weighted(e.select("src", "dst", cost.alias("cost")),
                         seeds)


def q_entity_centroids(spark, sf_dir):
    """Entity context-embedding centroids: integer quantized component
    sums of the embeddings of documents mentioning each canonical
    entity (distinct doc per entity) — the KG<->embedding bridge that
    SemDeDup-style entity merging and alias suggestion consume.
    vec_id aligns with doc_id on this corpus (the rrf_search note)."""
    from saber_spark.operators.classify import entity_centroids
    return entity_centroids(_linked_spark(spark, sf_dir),
                            _embeddings(spark, sf_dir))


def q_wl_fingerprint(spark, sf_dir):
    """Weisfeiler-Lehman structural fingerprint of the host link graph:
    the color histogram after 2 refinement rounds (graph.wl_colors) —
    the snapshot-diff signature that detects neighborhood-structure
    change without row-by-row edge comparison, and the structural twin
    of the surface-based doc_fingerprint. Host graph, not the entity
    graph: the dictionary co-occurrence KG is near-complete on this
    corpus, so 1-WL collapses it to one color (the link_prediction
    fixture note) while the parity-varied host fan-out refines into a
    real spectrum."""
    from saber_spark.operators.graph import wl_colors
    return (wl_colors(_host_edges(spark, sf_dir), rounds=2)
            .groupBy("wl").agg(F.count(F.lit(1)).alias("n_nodes")))


def q_ktruss_hosts(spark, sf_dir):
    """k-truss decomposition (Cohen 2008, k=4) over the host link graph
    plus the triangle-strip gadget (STRIP_EDGE_ROWS): every surviving
    edge must sit in >= 2 triangles of the SURVIVING subgraph — the
    edge-wise sibling of kcore_hosts and the dense-community prefilter
    that cuts one-off co-occurrence links. The strip guarantees a real
    multi-round cascade (chords peel in round 1, stranded path edges in
    round 2); oracle: unrolled peel rounds with the final support
    recomputed on the stable set."""
    from saber_spark.operators.graph import ktruss_edges
    strip = spark.createDataFrame(STRIP_EDGE_ROWS, "src string, dst string")
    return ktruss_edges(_host_edges(spark, sf_dir).unionByName(strip), k=4)


def q_kge_negatives(spark, sf_dir):
    """KG-embedding training pairs (TransE, Bordes et al. 2013) over the
    co-occurrence triples: 2 deterministic hash-corrupted negatives per
    positive (Bernoulli head/tail pick), FILTERED — corruptions that
    reproduce a true triple are anti-joined away, never mislabeled. The
    triple-level sibling of skipgram_pairs; together they cover the two
    embedding-training preps a KG build feeds."""
    from saber_spark.operators.samples import kge_negatives
    return kge_negatives(q_triples_cooccur(spark, sf_dir), neg_k=2)


def q_abbrev_aliases(spark, sf_dir):
    """Schwartz-Hearst-style abbreviation harvesting (initial-letter
    subset — precision-first) over a deterministic fixture: even docs
    get a VALID trailing "w1 w2 (INITIALS)" definition built from their
    own first two tokens, odd docs a NON-matching "(ZZ)" — the
    extractor must accept exactly the valid sites. The alias table this
    emits is how a web-scale build widens the verbatim grounding
    dictionary (saber/utils/grounding_utils.py:53-66)."""
    from saber_spark.operators.linking import abbrev_aliases
    docs = _docs(spark, sf_dir)
    ws = F.split(F.trim(F.col("text")), r"\s+")
    w1, w2 = F.element_at(ws, 1), F.element_at(ws, 2)
    pos_abbr = F.upper(F.concat(F.substring(w1, 1, 1),
                                F.substring(w2, 1, 1)))
    aug = F.when(
        F.size(ws) >= 2,
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit(" "), w1, F.lit(" "), w2,
                        F.lit(" ("), pos_abbr, F.lit(")")))
        .otherwise(F.concat(F.col("text"), F.lit(" "), w1, F.lit(" "),
                            w2, F.lit(" (ZZ)")))
    ).otherwise(F.col("text"))
    return abbrev_aliases(docs.select("doc_id", aug.alias("text")))


def q_char_entropy(spark, sf_dir):
    """Character-distribution Shannon entropy per doc: the gibberish/
    base64/minified-JS detector quality_score can't see — natural
    language sits in a narrow entropy band, machine blobs near the
    uniform ceiling. Empty docs defined all-zero."""
    from saber_spark.operators.textstats import char_entropy
    return char_entropy(_docs(spark, sf_dir))


def q_disambiguate_link(spark, sf_dir):
    """Context-coherence sense disambiguation: ambiguous surfaces pick the
    candidate that co-occurs most with the document's unambiguous
    entities (argmax, ties by canonical_id) — the wikification step the
    reference's attach-all-xrefs grounding leaves open."""
    from saber_spark.operators.linking import disambiguate_link
    dict_df = spark.createDataFrame(
        DISAMBIG_DICT, "surface string, label string, canonical_id string")
    return disambiguate_link(tokenize_docs(_docs(spark, sf_dir)), dict_df)


def q_label_propagation(spark, sf_dir):
    """Weighted community detection over the entity co-occurrence KG:
    3 synchronous LPA rounds, deterministic (weight DESC, label ASC)
    vote resolution — oracle is an unrolled CTE per round."""
    from saber_spark.operators.graph import label_propagation
    linked = _linked_spark(spark, sf_dir)
    ents = (linked.select("doc_id", "canonical_id").distinct()
            .localCheckpoint(eager=True))
    a, b = ents.alias("a"), ents.alias("b")
    wedges = (a.join(b, "doc_id")
              .filter(F.col("a.canonical_id") < F.col("b.canonical_id"))
              .groupBy(F.col("a.canonical_id").alias("src"),
                       F.col("b.canonical_id").alias("dst"))
              .agg(F.count(F.lit(1)).alias("n_docs")))
    return label_propagation(wedges, weight_col="n_docs", rounds=3)


def q_type_closure(spark, sf_dir):
    """Ontology rollup: mention counts per entity type aggregated up the
    is_a hierarchy via path-doubling transitive closure (log-depth
    joins on the dimension side; the corpus shuffles once for its own
    count agg). Oracle: recursive CTE."""
    from saber_spark.operators.ontology import type_rollup
    facts = (_linked_spark(spark, sf_dir)
             .groupBy("label").agg(F.count(F.lit(1)).alias("n")))
    hier = spark.createDataFrame(TYPE_HIERARCHY_ROWS,
                                 "child string, parent string")
    return type_rollup(facts, hier)


def q_crawl_frontier(spark, sf_dir):
    """Recrawl scheduling: top-3 priority URLs per host with
    priority = (host in-degree + 1) * ln(1 + staleness). Pages/edges are
    synthesized relationally from documents (hosts from source, fan-out
    from doc_id % 7, capture ts = epoch + doc_id seconds) so the oracle
    twin is pure SQL; host_link_graph covers the html-parsing path."""
    from saber_spark.operators.webstats import crawl_frontier
    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.timestamp_add("SECOND", F.col("doc_id").cast("int"),
                        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                        ).alias("warc_ts"))
    edges = docs.select(
        F.concat(F.col("source"), F.lit(".example.org")).alias("src_host"),
        F.concat(F.lit("src"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example.org")).alias("dst_host")).distinct()
    return crawl_frontier(pages, edges, k=3)


def _host_edges(spark, sf_dir):
    """Synthetic host link graph shared by the graph-analytics queries
    (link_prediction / hits / khop): parity-varied fan-out — even
    sources link to 7 hub hosts, odd to 3 — so the graph is sparse with
    differentiated neighbor structure. SQL twin: HOST_EDGES_CTE."""
    docs = _docs(spark, sf_dir)
    dst_k = F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") % 7) \
        .otherwise(F.col("doc_id") % 3)
    return docs.select(
        F.concat(F.col("source"), F.lit(".example.org")).alias("src"),
        F.concat(F.lit("src"), dst_k.cast("string"),
                 F.lit(".example.org")).alias("dst")).distinct()


def q_link_prediction(spark, sf_dir):
    """Web-graph link prediction: top-20 non-adjacent HOST pairs by
    Adamic-Adar (wedge join through the shared neighbor — no all-pairs;
    anti-join drops existing edges). Parity-varied host fan-out fixture
    (_host_edges) — the entity co-occurrence graph is complete on this
    corpus (every dictionary pair co-occurs somewhere), which would make
    the candidate set empty."""
    from saber_spark.operators.graph import link_prediction
    return link_prediction(_host_edges(spark, sf_dir), top_k=20)


def q_hits_hosts(spark, sf_dir):
    """Hub/authority triage of the host link graph: 2 unnormalized HITS
    power iterations in exact BIGINT arithmetic (graph.hits) — the
    second centrality axis next to pagerank_entities (a crawl frontier
    wants hub pages; KG QA wants authorities). Oracle: unrolled
    half-round CTEs over the same edge fixture."""
    from saber_spark.operators.graph import hits
    return hits(_host_edges(spark, sf_dir), rounds=2)


def q_khop_hosts(spark, sf_dir):
    """Crawl scoping / KG neighborhood extraction: minimum directed-hop
    distance from the seed host within 3 hops (level-synchronous
    frontier BFS, graph.khop_distance). Oracle: depth-capped recursive
    CTE + min(dist) — path enumeration equals BFS minima."""
    from saber_spark.operators.graph import khop_distance
    seeds = spark.createDataFrame([("src3.example.org",)], "node string")
    return khop_distance(_host_edges(spark, sf_dir), seeds, k=3)


def q_trending_entities(spark, sf_dir):
    """KG monitoring: week-over-week growth of per-node activity with
    gap-aware lag (a reappearing node reports prev_n=0, growth NULL —
    no invented rates over absence)."""
    from saber_spark.operators.funnel import WEEK_US, _epoch_micros
    from saber_spark.operators.graph import trending_nodes
    obs = _events(spark, sf_dir).select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string"))
        .alias("node"),
        F.floor(_epoch_micros("ts") / F.lit(WEEK_US)).cast("long")
        .alias("snap"))
    return trending_nodes(obs, min_prev=1)


def q_robots_filter(spark, sf_dir):
    """Crawl politeness: parse per-host robots.txt (User-agent: * group)
    and anti-join the Disallow prefixes against the URL table. Fixture:
    every host disallows /private, even-numbered hosts also /tmp; paths
    cycle private/tmp/doc by doc_id%3 — the oracle reconstructs the keep
    set relationally (parsing parity is pytest-covered)."""
    from saber_spark.operators.webstats import robots_filter, robots_rules
    docs = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit(".example.org"))
    seg = F.when(F.col("doc_id") % 3 == 0, F.lit("/private/")) \
        .when(F.col("doc_id") % 3 == 1, F.lit("/tmp/")) \
        .otherwise(F.lit("/doc/"))
    pages = docs.select(
        F.concat(F.lit("https://"), host, seg,
                 F.col("doc_id").cast("string")).alias("url"),
        F.col("doc_id"))
    robots = (docs.select(
        host.alias("host"),
        (F.col("doc_id") % 20).alias("n")).distinct()
        .select("host", F.concat(
            F.lit("User-agent: archiver\nDisallow: /\n"
                  "User-agent: *\nDisallow: /private\n"),
            F.when(F.col("n") % 2 == 0, F.lit("Disallow: /tmp\n"))
            .otherwise(F.lit("")),
            F.lit("User-agent: indexer\nDisallow: /doc\n"))
            .alias("robots_txt")))
    return (robots_filter(pages, robots_rules(robots))
            .select("url", "doc_id", "host", "path"))


def q_sitemap_urls(spark, sf_dir):
    """Crawl discovery: per-host sitemap XML (urlset/url/loc, built from
    the host's own doc URLs in sorted order) exploded back to (host, loc)
    via built-in xpath — zero Python; the oracle reconstructs the URL set
    relationally."""
    from saber_spark.operators.webstats import sitemap_urls
    docs = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit(".example.org"))
    url = F.concat(F.lit("https://"), host, F.lit("/doc/"),
                   F.col("doc_id").cast("string"))
    sitemaps = (docs.select(host.alias("host"), url.alias("u"))
                .groupBy("host")
                .agg(F.concat(
                    F.lit("<urlset>"),
                    F.array_join(F.transform(
                        F.array_sort(F.collect_list("u")),
                        lambda u: F.concat(F.lit("<url><loc>"), u,
                                           F.lit("</loc></url>"))), ""),
                    F.lit("</urlset>")).alias("xml")))
    return sitemap_urls(sitemaps)


def q_kmeans_embeddings(spark, sf_dir):
    """Distributed Lloyd's k-means (k=4, 3 centroid updates) over the
    embedding column: per round one NARROW assignment map against
    broadcast-literal centroids (zero joins) + one hash agg of
    (cluster, dim) sums; exact-integer quantized arithmetic makes the
    result bit-portable (oracle: unrolled relational rounds)."""
    from saber_spark.operators.cluster import kmeans_assign
    return kmeans_assign(_embeddings(spark, sf_dir), k=4, iterations=3)


def q_semdedup(spark, sf_dir):
    """Semantic dedup (SemDeDup, arXiv:2303.09540): k-means clusters as
    the blocking key, within-cluster quantized cosine >= 0.35 drops the
    higher id — the embedding-space sibling of dedup_clusters' MinHash
    chain. k=4/iterations=2 keeps the unrolled oracle CTE chain short;
    at 100 TB k scales with the corpus so cluster sizes stay bounded
    (see operators/cluster.py:semdedup)."""
    from saber_spark.operators.cluster import semdedup
    return semdedup(_embeddings(spark, sf_dir), k=4, iterations=2,
                    threshold=0.35)


def q_bm25_search(spark, sf_dir):
    """Lexical retrieval: Okapi BM25 top-15 documents for a 3-term query
    (operators/retrieval.py) — integer tf/df/dl everywhere, one 6dp
    rounding on the final score, deterministic (score DESC, doc_id ASC)
    tie-break, TakeOrderedAndProject instead of a global sort."""
    from saber_spark.operators.retrieval import bm25_topk
    return bm25_topk(tokenize_docs(_docs(spark, sf_dir)),
                     ["spark", "stream", "vector"], top_k=15)


def q_dsir_weights(spark, sf_dir):
    """Domain-targeted data selection (DSIR, arXiv:2302.03169): hashed
    bigram-bucket importance weights of each raw document against the
    target subset (sources src0/src1), md5-portable feature hash,
    Laplace-smoothed bucket probabilities (operators/splits.py)."""
    from saber_spark.operators.splits import dsir_weights
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source").isin("src0", "src1")) \
        .select("doc_id")
    return dsir_weights(tokenize_docs(docs), target, buckets=64)


def q_bpe_pair_stats(spark, sf_dir):
    """BPE trainer iteration 0: adjacent-symbol pair frequencies weighted
    by word frequency (chars + the </w> end marker) — the statistic the
    merge loop maximizes, computed distributively. The merge loop itself
    runs driver-side over the vocabulary-bounded word-frequency table
    (operators/bpe.py, the sentencepiece/HF trainer division of labor)."""
    from saber_spark.operators.bpe import END, word_freqs
    wf = word_freqs(tokenize_docs(_docs(spark, sf_dir)))
    cs = F.concat(
        F.regexp_extract_all(F.col("word"), F.lit("."), F.lit(0)),
        F.array(F.lit(END)))
    wf = wf.withColumn("cs", cs)
    n = F.size("cs")
    pairs = F.zip_with(
        F.slice(F.col("cs"), 1, n - 1), F.slice(F.col("cs"), 2, n - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")))
    return (wf.select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"),
                     F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("pair_freq")))


def q_bpe_encode(spark, sf_dir):
    """Distributed BPE encoding under a corpus-trained 32-merge model:
    mapInPandas with the broadcast merge list (single ArrowEvalPython,
    tagger contract). Rows-only by design — the ordered merge loop is
    not SQL-expressible; trainer correctness is pytest-golden against
    the Sennrich reference example and a concat-roundtrip property."""
    from saber_spark.operators.bpe import encode_df, train_bpe
    tokens = tokenize_docs(_docs(spark, sf_dir))
    merges = train_bpe(tokens, n_merges=32)
    return encode_df(tokens, merges)


def q_warc_records(spark, sf_dir):
    """WARC ingestion: synthesize one ISO-28500 record per document
    (response type, Target-URI, Date, payload = text), parse with the
    connector's column-level parser (narrow portable regexp, zero
    Python), and emit tz-safe fields (the timestamp renders back through
    the same session tz it was parsed in, so the string roundtrips
    identically under any driver session timezone). The file-split path
    (lineSep record delimiter) is pytest-covered with a real .warc file."""
    from saber_spark.sources.warc import parse_warc_chunks
    docs = _docs(spark, sf_dir)
    ts_str = F.date_format(
        F.timestamp_add("SECOND", F.col("doc_id").cast("int"),
                        F.to_timestamp(F.lit("2024-01-01 00:00:00"))),
        "yyyy-MM-dd'T'HH:mm:ss'Z'")
    chunk = F.concat(
        F.lit("WARC-Type: response\r\nWARC-Target-URI: https://"),
        F.col("source"), F.lit(".example.org/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: "), ts_str,
        F.lit("\r\nContent-Type: text/plain\r\n\r\n"),
        F.col("text"), F.lit("\r\n\r\n"))
    out = parse_warc_chunks(docs.select(chunk.alias("value")))
    return out.select(
        "url", "rec_type",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.length("payload").cast("long").alias("n_payload"))


def q_typed_triples(spark, sf_dir):
    """Typed relation extraction: each in-window mention pair's predicate
    is its most frequent non-stopword connecting token (OpenIE-style
    no-parser typing; ties by token ASC). One corpus shuffle — pair
    expansion and between-span slicing are higher-order array ops."""
    from saber_spark.operators.triples import typed_triples
    tokens = tokenize_docs(_docs(spark, sf_dir))
    dict_df = spark.createDataFrame(
        _SINGLE_DICT, "surface string, label string, canonical_id string")
    tagged = (tokens.join(
        F.broadcast(dict_df.select("surface", "canonical_id")),
        tokens.token == F.col("surface"), "left")
        .select("doc_id", "pos", "token", "canonical_id"))
    return typed_triples(tagged, k=10, stopwords=list(EN_STOPWORDS))


def q_triple_history(spark, sf_dir):
    """Temporal-KG validity intervals: (user did event_type) facts per
    epoch week, compacted into SCD-2 [valid_from, valid_to] runs via
    single-shuffle array islands (oracle: row_number gaps-and-islands —
    an independent derivation)."""
    from saber_spark.operators.funnel import WEEK_US, _epoch_micros
    from saber_spark.operators.triples import triple_history
    obs = _events(spark, sf_dir).select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string"))
        .alias("subj"),
        F.lit("did").alias("pred"),
        F.col("event_type").alias("obj"),
        F.floor(_epoch_micros("ts") / F.lit(WEEK_US)).cast("long")
        .alias("snap"))
    return triple_history(obs)


def q_fuzzy_link(spark, sf_dir):
    """Typo-tolerant grounding: tokens link to the nearest dictionary
    surface within 1 Levenshtein edit (best = fewest edits, then smallest
    surface). Vocabulary-level comparison vs the broadcast dictionary;
    the corpus never shuffles."""
    from saber_spark.operators.linking import fuzzy_link
    return fuzzy_link(tokenize_docs(_docs(spark, sf_dir)),
                      grounding_dict_df(spark))


def q_dict_mentions(spark, sf_dir):
    """Dictionary mention detection incl. MULTI-token surfaces with
    longest-match suppression, as pure DataFrame ops with a SQL oracle —
    VERDICT r3 #4 (the Arrow tagger path stays as kg_mentions; reference
    semantics: exact surface keying, saber/utils/grounding_utils.py:65-66).
    """
    return dict_ngram_mentions(tokenize_docs(_docs(spark, sf_dir)),
                               grounding_dict_df(spark))


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def json_props_agg(events: DataFrame) -> DataFrame:
    """Typed JSON extraction from the props column (from_json with an
    explicit schema — JVM codegen, no Python; malformed JSON, missing
    keys, and non-integer-typed values all become NULL) + per-type
    rollup. The oracle replicates exactly those semantics with a
    json_valid + json_type guard (tested on dirty props in pytest)."""
    k = F.from_json("props", "k BIGINT").getField("k")
    return (events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


def q_json_extract_agg(spark, sf_dir):
    """Schema-on-read for raw event logs (see json_props_agg)."""
    return json_props_agg(_events(spark, sf_dir))


def q_pivot_events(spark, sf_dir):
    """Explicit-values pivot: per-user event-type count matrix (wide).
    Passing the category list skips the distinct-value pre-pass job and
    fixes the schema — the only pivot shape sane at scale."""
    from saber_spark.operators.reshape import pivot_counts
    return pivot_counts(_events(spark, sf_dir), "user_id", "event_type",
                        EVENT_TYPES)


def q_quality_buckets(spark, sf_dir):
    """Per-source quality quartiles (curriculum/mixing buckets) without a
    global ntile sort: exact percentile boundaries per group, broadcast
    back, strict-> comparison fold."""
    from saber_spark.operators.splits import quantile_buckets
    scored = quality_score(_docs(spark, sf_dir), keep_cols=("source",)) \
        .select("doc_id", "source", "quality")
    return (quantile_buckets(scored, "quality", "source")
            .select("doc_id", "source", "quality", "bucket"))


def q_hypertable_rollup(spark, sf_dir):
    """Continuous aggregate: hour rollup from raw events, day rollup from
    the HOUR table (raw data scanned once however many grains exist)."""
    from saber_spark.operators.timeseries import hypertable_rollup
    return hypertable_rollup(_events(spark, sf_dir))


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch per source, next to the exact count —
    a mergeable cardinality estimator whose arithmetic is engine-portable
    (HLL twins like approx_count_distinct are not oracle-checkable)."""
    from saber_spark.operators.sketch import kmv_distinct
    docs = _docs(spark, sf_dir)
    tokens = tokenize_docs(docs)
    vocab = vocab_ids(tokens)
    tok = (tokens.join(F.broadcast(vocab), "token")
           .join(docs.select("doc_id", "source"), "doc_id"))
    return kmv_distinct(tok, "source", "token_id", k=16)


def q_range_join_clicks(spark, sf_dir):
    """Banded range join: clicks within the hour BEFORE each purchase
    (same user), counted per purchase. Equi-join on (user, time-bin) + exact
    residual filter — never a per-key nested loop."""
    from saber_spark.operators.rangejoin import range_join
    events = _events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase") \
        .select("user_id", "event_id", "ts")
    clicks = events.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", "event_id", "value")
    HOUR_US = 3_600_000_000
    pairs = range_join(purchases, clicks, keys=["user_id"], ts_col="ts",
                       lower_us=-HOUR_US, upper_us=-1,
                       payload_cols=["event_id", "value"])
    return (pairs.groupBy("user_id", "event_id")
            .agg(F.count(F.lit(1)).alias("n_clicks"),
                 F.round(F.sum(F.col("r_value").cast("decimal(18,2)"))
                         .cast("double"), 6).alias("click_value")))


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: date-window scan + EXISTS-correlated count by
    priority (semi-join decorrelation + partial agg). timestamp_ntz
    literals keep the window timezone-independent (events.ts lesson);
    on a date-partitioned Iceberg table this predicate IS the partition
    prune. Testdata has no commit/receipt dates, so the EXISTS condition
    is high-quantity lineitems."""
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 45).select("l_orderkey")
    lo = F.lit("1995-07-01").cast("timestamp_ntz")
    hi = F.lit("1996-01-01").cast("timestamp_ntz")
    return (orders
            .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


def q_moving_avg(spark, sf_dir):
    """Sliding-frame window (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
    3-event moving average of value per user."""
    from pyspark.sql import Window
    events = _events(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(-2, 0))
    return events.select(
        "user_id", "event_id",
        F.round(F.avg(F.col("value").cast("decimal(18,2)")).over(w)
                .cast("double"), 6).alias("mavg3"))


def q_median_by_source(spark, sf_dir):
    """Exact percentiles (median + p90) of doc length per source —
    percentile() is the exact (sort-based) variant, matching DuckDB's
    quantile_cont; approx_percentile is the sketch the 100-TB path uses."""
    return (_docs(spark, sf_dir)
            .groupBy("source")
            .agg(F.expr("percentile(n_chars, 0.5)").alias("median_chars"),
                 F.expr("percentile(n_chars, 0.9)").alias("p90_chars"),
                 F.count(F.lit(1)).alias("n_docs")))


def q_cube_revenue(spark, sf_dir):
    """CUBE aggregation: all 4 grouping combinations of (priority, status)
    in one pass (completes the rollup/cube/grouping-sets family)."""
    orders = tpch.load(spark, sf_dir, "orders")
    return (orders.cube("o_orderpriority", "o_orderstatus")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                 .cast("double").alias("total_price"),
                 F.count(F.lit(1)).alias("n_orders")))


def q_grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS: two independent breakdowns (by priority, by
    status) in one scan — neither rollup nor cube expresses this set."""
    orders = tpch.load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS total_price,
               count(*) AS n_orders
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""")


def q_xml_articles(spark, sf_dir):
    """Hermetic O17: (title, abstract) out of article-shaped XML via the
    built-in xpath_string — zero Python (saber/utils/app_utils.py:63-80)."""
    from saber_spark.operators.articles import (attach_fake_article_xml,
                                                extract_article_fields_df)
    arts = attach_fake_article_xml(_docs(spark, sf_dir))
    out = extract_article_fields_df(arts)
    return out.select(
        "doc_id", "title",
        F.length("abstract").cast("long").alias("n_abstract_chars"))


def q_setops_active_customers(spark, sf_dir):
    """INTERSECT/EXCEPT set operators (vocab-union generalization, O6/O10).

    active  = customers with orders INTERSECT positive-balance customers
    dormant = positive-balance customers EXCEPT customers with orders
    """
    customer = tpch.load(spark, sf_dir, "customer")
    orders = tpch.load(spark, sf_dir, "orders")
    pos = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey"))
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    active = pos.intersect(with_orders).withColumn("status", F.lit("active"))
    dormant = pos.exceptAll(with_orders).withColumn("status", F.lit("dormant"))
    return active.unionByName(dormant)


# ------------------------------------------------ UDF stages (rows-only)

def q_kg_mentions(spark, sf_dir):
    from saber_spark.fixtures.dictionary import surface_label_map
    from saber_spark.operators.tagger import detect_mentions
    pages = build_pages_df(spark, sf_dir)
    bc = spark.sparkContext.broadcast(surface_label_map())
    return detect_mentions(extract_text(pages), bc)


def q_curation_decision(spark, sf_dir):
    """Corpus-curation flagship: the per-doc release decision table
    (quality verdicts + near-dup keep-list + contamination flag ->
    final_keep) from the resumable curate.py pipeline. Rows-only by
    design: every COMPONENT verdict is independently oracle-checked
    (quality_filter, dedup_clusters, contamination_check, pii_scrub);
    the composition itself is pytest-verified end-to-end
    (tests/test_curate.py), and dedup runs on the PII-masked text, which
    has no single-statement SQL twin."""
    from saber_spark.curate import run_curation
    # persist=False: a query wrapper cannot unpersist after the driver
    # materializes the frame — don't leak cached partitions per evaluation
    return run_curation(spark, _docs(spark, sf_dir),
                        persist=False)["decision"]


def q_kg_edges(spark, sf_dir):
    from saber_spark.pipeline import run_pipeline
    pages = build_pages_df(spark, sf_dir)
    return run_pipeline(spark, pages)["edges"]


def q_multimodal_features(spark, sf_dir):
    """Rows-only UDF stage; the driver canonicalizer sorts columns, so the
    array<float> feature is exploded to primitive (dim, value) rows."""
    media = attach_fake_media(_docs(spark, sf_dir))
    feats = decode_features(media)
    return feats.select(
        "doc_id", "media_type", "n_bytes",
        F.posexplode("feature").alias("dim", "value"),
    ).select("doc_id", "media_type", "n_bytes", "dim",
             F.round(F.col("value").cast("double"), 6).alias("value"))


# --- web-crawl URL analytics (operators/webstats.py; added late r4;
# rotated into the cap for the r4 driver run — see the registry comment) ---

def _synth_pages_url(docs: DataFrame) -> DataFrame:
    """Deterministic crawl-style URLs from documents (host varies by
    source, mixed case proves host lowercasing)."""
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".Example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "doc_id", "source", "n_chars")


def q_url_host_stats(spark, sf_dir):
    """Per-host crawl profile (CCNet/RefinedWeb domain-stats stage):
    host extraction is a narrow regexp map; count/sum/avg are algebraic,
    so map-side combine absorbs head-domain skew."""
    from saber_spark.operators.webstats import host_stats
    return host_stats(_synth_pages_url(_docs(spark, sf_dir))).select(
        "host", "n_docs", "total_chars", "avg_chars")


def q_url_dedup(spark, sf_dir):
    """URL-normalized exact dedup over two synthesized recrawl variants
    per page (tracking params + fragment + trailing slash + host case):
    each pair must collapse to ONE normalized url keeping the first
    doc_id. One algebraic shuffle on norm_url."""
    from saber_spark.operators.webstats import url_dedup
    docs = _docs(spark, sf_dir)
    clean = F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".example.org/doc/"),
                     F.col("doc_id").cast("string"))
    recrawl = F.concat(F.lit("HTTPS://"), F.col("source"),
                       F.lit(".EXAMPLE.org/doc/"),
                       F.col("doc_id").cast("string"),
                       F.lit("/?utm_source=feed#top"))
    pages = docs.select(F.explode(F.array(clean, recrawl)).alias("url"),
                        "doc_id")
    return url_dedup(pages)


def q_host_blocklist(spark, sf_dir):
    """Domain-blocklist filter: broadcast LEFT ANTI join against a
    blocked-host list (corpus side never shuffles), then per-source kept
    counts. Exact-host match here (oracle-portable); apex-domain matching
    is pytest-covered."""
    from saber_spark.operators.webstats import blocklist_filter
    blocked = spark.createDataFrame(
        [("src0.example.org",), ("src3.example.org",)], "blocked string")
    pages = _synth_pages_url(_docs(spark, sf_dir))
    kept = blocklist_filter(pages, blocked, match_apex=False)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


def q_host_link_graph(spark, sf_dir):
    """Web link-graph construction: synthesize pages whose html carries a
    relative link (must be ignored), a same-host nav link (dropped by
    drop_self) and one cross-host link (doc_id % 7 fan-out), then
    extract_links (narrow regexp over decoded binary html) -> host_graph
    (ONE algebraic shuffle on the host pair). The host edge table is what
    feeds graph.pagerank for host authority."""
    from saber_spark.operators.webstats import extract_links, host_graph
    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<html><body><a href="/about">a</a>'
              '<a href="https://'), F.col("source"),
        F.lit('.example.org/nav">n</a> <a href="https://src'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('.example.org/doc/0">x</a></body></html>'))
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.encode(html, "utf-8").alias("html"))
    return host_graph(extract_links(pages))


def _snapshots(docs):
    """Deterministic two-crawl synthesis over documents: the new snapshot
    drops every 13th page, rewrites every 10th (' v2' suffix), and adds
    fresh urls for every 17th. Shared by snapshot_delta and
    incremental_triples."""
    url = F.concat(F.lit("https://ex.org/"), F.col("doc_id").cast("string"))
    old = docs.select(url.alias("url"), "text")
    changed = docs.filter(F.col("doc_id") % 13 != 0).select(
        url.alias("url"),
        F.when(F.col("doc_id") % 10 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")).alias("text"))
    added = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.concat(F.lit("https://ex.org/new/"),
                 F.col("doc_id").cast("string")).alias("url"),
        "text")
    return old, changed.unionByName(added)


def q_snapshot_delta(spark, sf_dir):
    """Crawl-to-crawl delta (added/removed/changed urls) driving
    incremental KG re-extraction. Both sides reduce to
    (url, xxhash64(content)) narrowly before ONE co-partitioned FULL OUTER
    join — the shuffle moves 16 bytes/row, never page bodies. Oracle
    compares content strings directly (hash equality == string equality
    modulo 2^-64)."""
    from saber_spark.operators.webstats import snapshot_delta
    old, new = _snapshots(_docs(spark, sf_dir))
    return snapshot_delta(old, new)


def q_incremental_triples(spark, sf_dir):
    """Incremental KG maintenance composed end-to-end: snapshot delta ->
    re-extract ONLY added/changed pages (upsert triples from new content)
    + removed pages (retract triples from old content), via the same
    dictionary mention+grounding stage the full build uses. The unchanged
    corpus majority never re-enters extraction — the property that makes
    a 10^12-page daily refresh affordable."""
    from saber_spark.operators.triples import delta_triples
    from saber_spark.operators.webstats import snapshot_delta
    old, new = _snapshots(_docs(spark, sf_dir))
    delta = snapshot_delta(old, new)
    dict_df = spark.createDataFrame(
        _SINGLE_DICT, "surface string, label string, canonical_id string")

    def linker(docs):
        toks = tokenize_docs(docs, id_col="url")
        return (toks.join(F.broadcast(dict_df),
                          toks["token"] == F.col("surface"))
                .select("url", F.lit(0).alias("sent_id"), "canonical_id"))

    return delta_triples(delta, old, new, linker)


def q_resolve_redirects(spark, sf_dir):
    """Redirect-chain resolution via pointer doubling (3 rounds = cap 8):
    synthetic redirect table u<d> -> u<d-1> for every doc_id not divisible
    by 5 — chains of up to 4 hops ending at multiples of 5. Oracle follows
    the same chains with a recursive CTE + depth cap."""
    from saber_spark.operators.webstats import resolve_redirects
    docs = _docs(spark, sf_dir)
    edges = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string"))
        .alias("src_url"),
        F.concat(F.lit("u"), (F.col("doc_id") - 1).cast("string"))
        .alias("dst_url"))
    return resolve_redirects(edges, max_hops=8)


def q_anchor_profile(spark, sf_dir):
    """Anchor-text aggregation per destination host — the web-KG alias
    source (how the web names a page): most frequent anchor + reference
    counts, deterministic (count DESC, anchor ASC) tie-break."""
    from saber_spark.operators.webstats import anchor_profile, extract_anchors
    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.concat(F.lit("https://src"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit('<p><a href="https://e'),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('.org/page" class="x">Entity '),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('</a> and <a href="https://e'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('.org/other">alias '),
            (F.col("doc_id") % 11).cast("string"),
            F.lit("</a></p>")).alias("html"))
    return anchor_profile(extract_anchors(pages))


def q_line_dedup(spark, sf_dir):
    """CCNet-style cross-doc line-level boilerplate removal: synthesize
    line structure by breaking before three common words (portable
    Java-cap-RE2 regexp), then drop every line appearing in >= 2 distinct
    docs and reassemble survivors in order. The count agg keys on
    xxhash64(line) (8-byte shuffle key); the removal join is LEFT ANTI on
    the same key with the boilerplate side AQE-broadcastable."""
    from saber_spark.operators.dedup import line_dedup
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace("text", r" (table|line|value)\b", "\n$1")
        .alias("text"))
    return line_dedup(docs, min_docs=2)


def q_nb_lang_confusion(spark, sf_dir):
    """Multinomial Naive Bayes held-out confusion: fit the token-count
    model on hash-half != 0 with the declared lang as the label, score
    half 0, -> (true_label, pred_label, n_docs). The fastText-era
    corpus-quality/language classifier as three integer count aggs +
    one token equi-join; scores round to 6dp before the argmax (ties
    label ASC) so the winner is engine-portable."""
    from saber_spark.operators.classify import nb_confusion
    docs = _docs(spark, sf_dir)
    return nb_confusion(tokenize_docs(docs),
                        docs.select("doc_id",
                                    F.col("lang").alias("label")))


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination (docs with doc_id < 5 as the eval
    set, the contamination_check fixture): a corpus word 5-gram is
    flagged iff all k=3 md5 bit positions land in the eval set's m=4096
    filter. No false negatives by construction — n_bloom_hits >=
    n_exact on every row, and the exact twin rides alongside so the
    false-positive cost is visible in the result itself."""
    from saber_spark.operators.sketch import bloom_decontaminate
    docs = _docs(spark, sf_dir)
    return bloom_decontaminate(docs.filter(F.col("doc_id") >= 5),
                               docs.filter(F.col("doc_id") < 5),
                               n=5, m=4096, k=3)


def q_host_mirrors(spark, sf_dir):
    """Mirror-site detection over a two-variant recrawl fixture: each
    source serves /{source}/p/{doc_id mod 37} on <source>.org and (for
    doc_id mod 10 != 0) on <source>-m.org — the mirror pair shares
    ~90% of its path set, cross-source hosts share nothing. Hosts pair
    ONLY through a shared path (equi-join, never host cross-join);
    popular paths are excluded from pair generation by the
    max_hosts_per_path stopword rule."""
    from saber_spark.operators.webstats import host_mirrors
    docs = _docs(spark, sf_dir)
    path = F.concat(F.lit("/"), F.col("source"), F.lit("/p/"),
                    (F.col("doc_id") % 37).cast("string"))
    main = F.concat(F.lit("https://"), F.col("source"), F.lit(".org"),
                    path)
    mirror = F.when(
        F.col("doc_id") % 10 != 0,
        F.concat(F.lit("https://"), F.col("source"), F.lit("-m.org"),
                 path))
    pages = (docs.select(F.explode(F.array(main, mirror)).alias("url"))
             .filter(F.col("url").isNotNull()))
    return host_mirrors(pages, tau=0.5)


def q_metapath_counts(spark, sf_dir):
    """KG rule-mining profile: 2-hop predicate-composition counts over
    the typed relation table (the typed_triples chain feeds directly
    in) -> (pred1, pred2, n_paths, n_mids). One self-equi-join on the
    mid entity with hub mids excluded up front — the AMIE path-support
    statistic, computable before any embedding exists."""
    from saber_spark.operators.triples import metapath_counts
    return metapath_counts(q_typed_triples(spark, sf_dir))


def q_grouped_split_audit(spark, sf_dir):
    """Leakage-safe grouped split audit: docs fold by md5(source) — all
    docs of one source land in ONE fold by the hash formula itself (no
    shuffle, no assignment table) — then per-fold balance stats
    (n_groups, n_docs, largest_group_docs). The group-k-fold discipline
    a host-correlated web corpus needs before any held-out number is
    believable."""
    from saber_spark.operators.splits import grouped_split_audit
    return grouped_split_audit(_docs(spark, sf_dir), "source", folds=3)


def q_hearst_hypernyms(spark, sf_dir):
    """Taxonomy induction via Hearst patterns (triples.hearst_hypernyms,
    Hearst COLING 1992): 'X such as Y' / 'X including Y' / 'Y and other
    X' regex sweeps -> (hypernym, hyponym, pattern, n_mentions) — the
    is-a harvesting step Saber's UMLS grounding assumes already exists.
    The corpus has no such phrases, so the fixture appends ONE chained
    deterministic clause per doc (' grpA such as entB and other catC
    including subD', letters doc_id-derived) that exercises all three
    patterns — mirrored verbatim in the oracle; the sweep itself runs
    over the full stamped text in both engines."""
    from saber_spark.operators.triples import hearst_hypernyms
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def let(m):
        return F.substring(F.lit(alpha),
                           (F.col("doc_id") % m + 1).cast("int"), 1)

    stamped = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" grp"), let(7), F.lit(" such as ent"), let(13),
                 F.lit(" and other cat"), let(5),
                 F.lit(" including sub"), let(3)).alias("text"))
    return hearst_hypernyms(stamped)


def _schema_kg(spark, sf_dir):
    """Fixture KG from TPC-H for the schema-QA queries:
    (cust)-[placed]->(order) and (order)-[contains]->(part) facts, with
    every 13th order's 'placed' object corrupted to the customer itself
    (a real ingestion bug shape: id column swap)."""
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    cust = F.concat(F.lit("cust:"), F.col("o_custkey").cast("string"))
    placed = orders.select(
        cust.alias("subj"), F.lit("placed").alias("pred"),
        F.when(F.col("o_orderkey") % 13 == 0, cust)
        .otherwise(F.concat(F.lit("order:"),
                            F.col("o_orderkey").cast("string")))
        .alias("obj"))
    contains = li.select(
        F.concat(F.lit("order:"), F.col("l_orderkey").cast("string"))
        .alias("subj"),
        F.lit("contains").alias("pred"),
        F.concat(F.lit("part:"), F.col("l_partkey").cast("string"))
        .alias("obj"))
    return placed.unionByName(contains)


def q_domain_range_audit(spark, sf_dir):
    """SHACL-style schema conformance over a typed triple store
    (triples.domain_range_audit): per predicate, the modal
    (domain, range) type signature and the count of violating triples —
    triple_audit's type-signature sibling, over the corrupted _schema_kg
    fixture so the audit reports nonzero violations; the type table is
    the entity prefix."""
    from saber_spark.operators.triples import domain_range_audit
    triples = _schema_kg(spark, sf_dir)
    types = (triples.select(F.col("subj").alias("entity"))
             .unionByName(triples.select(F.col("obj").alias("entity")))
             .distinct()
             .select("entity",
                     F.split_part(F.col("entity"), F.lit(":"), F.lit(1))
                     .alias("etype")))
    return domain_range_audit(triples, types)


def q_bcubed_resolution(spark, sf_dir):
    """B-cubed evaluation of the blocked fuzzy entity resolver
    (evaluation.bcubed_eval over the entity_resolution chain): gold
    clusters = each surface's base token (the fixture derives an
    's'-suffixed variant from every corpus token; a name derivable two
    ways takes min(gold) deterministically), predicted = the resolver's
    edit-distance-1 components. The resolver also merges true typo
    neighbors ('cat'/'car'), so precision is genuinely < 1 — the metric
    is exercised, not saturated."""
    from saber_spark.operators.canonicalize import resolve_entities
    from saber_spark.operators.evaluation import bcubed_eval
    base = (tokenize_docs(_docs(spark, sf_dir))
            .select(F.lower("token").alias("name")).distinct())
    names = base.unionByName(
        base.select(F.concat("name", F.lit("s")).alias("name"))).distinct()
    resolved = resolve_entities(names, max_edits=1, block_chars=1)
    gold = (base.select("name", F.col("name").alias("gold"))
            .unionByName(base.select(
                F.concat("name", F.lit("s")).alias("name"),
                F.col("name").alias("gold")))
            .groupBy("name").agg(F.min("gold").alias("gold")))
    assign = (resolved.join(gold, "name")
              .select(F.col("name").alias("item"),
                      F.col("canonical").alias("pred_cluster"),
                      F.col("gold").alias("gold_cluster")))
    return bcubed_eval(assign)


def _feed_obs(spark, sf_dir):
    """Three simulated feeds asserting each order's status: feedA/feedC
    report the true o_orderstatus, feedB corrupts every 7th order to
    'X' — the multi-source observation fixture for the knowledge-fusion
    queries."""
    orders = tpch.load(spark, sf_dir, "orders")
    subj = F.concat(F.lit("order:"), F.col("o_orderkey").cast("string"))

    def leg(obj_col, src):
        return orders.select(subj.alias("subj"),
                             F.lit("status").alias("pred"),
                             obj_col.alias("obj"),
                             F.lit(src).alias("source"))

    truth = F.col("o_orderstatus")
    return (leg(truth, "feedA")
            .unionByName(leg(F.when(F.col("o_orderkey") % 7 == 0,
                                    F.lit("X")).otherwise(truth),
                             "feedB"))
            .unionByName(leg(truth, "feedC")))


def q_resolve_conflicts(spark, sf_dir):
    """Knowledge-fusion majority vote (triples.resolve_conflicts) over
    the _feed_obs fixture — the resolved value recovers the truth at
    confidence 2/3 on conflicted slots, 1.0 on clean ones."""
    from saber_spark.operators.triples import resolve_conflicts
    return resolve_conflicts(_feed_obs(spark, sf_dir))


def q_source_reliability(spark, sf_dir):
    """Truth-discovery feed scorecard (triples.source_reliability) over
    the same _feed_obs fixture: feedA/feedC score 1.0; feedB's
    reliability is exactly the share of orders NOT hit by its every-7th
    corruption — the per-source prior the next voting round would
    weight by."""
    from saber_spark.operators.triples import source_reliability
    return source_reliability(_feed_obs(spark, sf_dir))


def q_resolve_weighted(spark, sf_dir):
    """TruthFinder round 2 (triples.resolve_weighted) over the same
    _feed_obs fixture: claims re-weighted by round-1 source
    reliability, so feedB's corrupted 'X' votes carry ~0.857 mass
    against the 2.0 the two clean feeds stack on the truth —
    weight_share on conflicted slots is genuinely the weighted margin,
    not a vote count."""
    from saber_spark.operators.triples import resolve_weighted
    return resolve_weighted(_feed_obs(spark, sf_dir))


def q_rule_confidence(spark, sf_dir):
    """AMIE rule mining (triples.rule_confidence) over _schema_kg plus
    a 'bought' leg (cust->part for parts with l_partkey % 3 != 0):
    mines (placed . contains => bought) at confidence ~2/3 — the
    missing third of parts is genuine negative evidence — and the
    corrupted self-loop placed edges surface the degenerate
    (placed . placed => placed) / (placed . bought => bought) rules at
    1.0, exercising multi-rule output and conf < 1 in one result.

    Execution shape (r6): the miner's output carries only predicate
    names and counts — entity identity is internal — so the store
    feeds in as injectively tagged longs (the _schema_kg3_ids
    encoding) instead of 'ns:key' strings: the 5-way-referenced
    distinct triple table, both degree aggs, the mid-keyed body join
    and the (a, b) head join all shuffle 8-byte keys (guide §2.3);
    identical counts by injectivity, verified hash-MATCH vs the
    unchanged string oracle."""
    from saber_spark.operators.triples import rule_confidence
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    t = _KG3_TAGS
    cust = (F.lit(t["cust"] * _KG3_SHIFT) + F.col("o_custkey"))
    placed = orders.select(
        cust.cast("long").alias("subj"), F.lit("placed").alias("pred"),
        F.when(F.col("o_orderkey") % 13 == 0, cust)
        .otherwise(F.lit(t["order"] * _KG3_SHIFT) + F.col("o_orderkey"))
        .cast("long").alias("obj"))
    contains = li.select(
        (F.lit(t["order"] * _KG3_SHIFT) + F.col("l_orderkey"))
        .cast("long").alias("subj"),
        F.lit("contains").alias("pred"),
        (F.lit(t["part"] * _KG3_SHIFT) + F.col("l_partkey"))
        .cast("long").alias("obj"))
    bought = (orders.join(li, orders.o_orderkey == li.l_orderkey)
              .filter(F.col("l_partkey") % 3 != 0)
              .select(cust.cast("long").alias("subj"),
                      F.lit("bought").alias("pred"),
                      (F.lit(t["part"] * _KG3_SHIFT) + F.col("l_partkey"))
                      .cast("long").alias("obj")))
    # materialize=True: the distinct triple table is referenced five
    # times; with the narrow numeric store the A/B is no longer a tie —
    # checkpoint 4.6/3.1s vs recompute 11.0/4.9s (first/steady, sf0.1).
    return rule_confidence(
        placed.unionByName(contains).unionByName(bought),
        materialize=True)


def q_taxonomy_cycles(spark, sf_dir):
    """Bounded cycle QA for hierarchy tables (graph.cycle_edges):
    is-a edges t(doc_id%9) -> t((2*doc_id+1)%9) — a deterministic
    functional graph whose 9 distinct edges contain a self-loop
    (cycle_len 1), a 2-ring, and a 6-ring invisible at max_len=4
    (NULL), exercising found/shortest/bounded in one result. The check
    type_closure assumes has already passed."""
    from saber_spark.operators.graph import cycle_edges
    e = _docs(spark, sf_dir).select(
        F.concat(F.lit("t"), (F.col("doc_id") % 9).cast("string"))
        .alias("src"),
        F.concat(F.lit("t"), ((F.col("doc_id") * 2 + 1) % 9)
                 .cast("string")).alias("dst"))
    return cycle_edges(e, max_len=4)


def q_infer_types(spark, sf_dir):
    """Predicate-signature type completion (triples.infer_entity_types)
    over the corrupted _schema_kg fixture with the curated schema
    (placed: cust->order, contains: order->part): every triple votes
    types into its subject/object slots; customers receiving corrupted
    'placed' objects collect dissenting 'order' votes, so vote_share
    is genuinely < 1 on touched entities."""
    from saber_spark.operators.triples import infer_entity_types
    sig = spark.createDataFrame(
        [("placed", "cust", "order"), ("contains", "order", "part")],
        "pred string, domain_type string, range_type string")
    return infer_entity_types(_schema_kg(spark, sf_dir), sig)


def q_linkpred_mrr(spark, sf_dir):
    """MRR + Hits@{1,3,10} ranking evaluation of Adamic-Adar link
    prediction on the host graph (graph.link_prediction_ranking) — the
    metric pair KG-completion papers report, over the SAME deterministic
    md5 edge split linkpred_auc scores with AUC. Rank ties are
    engine-portable because aa_score is 6dp-rounded in the shared
    scorer and ties break on candidate id ASC."""
    from saber_spark.operators.graph import link_prediction_ranking
    return link_prediction_ranking(_host_edges(spark, sf_dir))


def _schema_kg3(spark, sf_dir):
    """Distinct triple STORE for the read-side KG queries: _schema_kg's
    (cust)-[placed]->(order)-[contains]->(part) facts plus a third
    (supp)-[supplies]->(part) relation from lineitem, deduplicated —
    BGP evaluation is defined over set-semantics stores, and the third
    relation gives the pattern queries a genuine 3-way join shape.

    Execution shape (r6): the three relations are DISJOINT by pred, so
    the global ``distinct()`` of the string union factors into one
    distinct per relation — and each per-leg distinct runs on the
    narrow numeric key pair (8-16 bytes) BEFORE the uri strings are
    built, instead of shuffling ~60-byte concatenated strings
    (guide §2.3 "narrower types"; measured 3.9s -> 1.3s at sf0.1).
    The corrupted 'placed' rows (obj = the customer itself) dedup on a
    -1 sentinel per customer, exactly as the string form collapses
    (cust:X, placed, cust:X); result set verified identical
    (exceptAll both ways = 0 rows)."""
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    cust = F.concat(F.lit("cust:"), F.col("o_custkey").cast("string"))
    placed = (
        orders.select(
            "o_custkey",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit(-1))
            .otherwise(F.col("o_orderkey")).alias("_okey"))
        .distinct()
        .select(cust.alias("subj"), F.lit("placed").alias("pred"),
                F.when(F.col("_okey") == -1, cust)
                .otherwise(F.concat(F.lit("order:"),
                                    F.col("_okey").cast("string")))
                .alias("obj")))
    contains = (
        li.select("l_orderkey", "l_partkey").distinct()
        .select(F.concat(F.lit("order:"), F.col("l_orderkey").cast("string"))
                .alias("subj"),
                F.lit("contains").alias("pred"),
                F.concat(F.lit("part:"), F.col("l_partkey").cast("string"))
                .alias("obj")))
    supplies = (
        li.select("l_suppkey", "l_partkey").distinct()
        .select(F.concat(F.lit("supp:"), F.col("l_suppkey").cast("string"))
                .alias("subj"),
                F.lit("supplies").alias("pred"),
                F.concat(F.lit("part:"), F.col("l_partkey").cast("string"))
                .alias("obj")))
    return placed.unionByName(contains).unionByName(supplies)


def q_bgp_query(spark, sf_dir):
    """SPARQL basic-graph-pattern evaluation (triples.bgp_match) — the
    READ side of the constructed KG: conjunctive pattern
    ``?c placed ?o . ?o contains ?p . ?s supplies ?p`` with
    ``FILTER NOT EXISTS { ?c placed ?c }`` (drops the customers the
    _schema_kg fixture corrupts with id-swap self-loops), bindings then
    rolled up per customer -> (customer, n_bindings, n_orders, n_parts,
    n_suppliers). Each pattern is one pushed-down scan of the store;
    the conjunction is a selectivity-ordered equi-join chain; the NOT
    EXISTS is an anti-join — zero Python anywhere."""
    from saber_spark.operators.triples import bgp_match
    b = bgp_match(_schema_kg3(spark, sf_dir),
                  [("?c", "placed", "?o"), ("?o", "contains", "?p"),
                   ("?s", "supplies", "?p")],
                  anti=[("?c", "placed", "?c")])
    return (b.groupBy(F.col("c").alias("customer"))
            .agg(F.count(F.lit(1)).alias("n_bindings"),
                 F.count_distinct("o").alias("n_orders"),
                 F.count_distinct("p").alias("n_parts"),
                 F.count_distinct("s").alias("n_suppliers")))


def q_entity_card(spark, sf_dir):
    """Per-entity lookup card (triples.entity_card): for every entity,
    direction and predicate over the 3-relation store — triple count,
    distinct-neighbor count, and the modal neighbor (struct-min inside
    the agg; ties ASC) -> the concise-bounded-description skeleton a KG
    serves for entity pages. Two map-side-combinable aggs, no window,
    no self-join."""
    from saber_spark.operators.triples import entity_card
    return entity_card(_schema_kg3(spark, sf_dir))


def q_char_sets(spark, sf_dir):
    """Characteristic sets (triples.characteristic_sets, Neumann &
    Moerkotte ICDE 2011): entities grouped by their exact predicate
    set -> (char_set, n_entities, n_triples) — the RDF-store statistic
    behind star-BGP cardinality estimation and emergent schema
    discovery. Store: the rule_confidence fixture (placed/contains +
    the partial 'bought' leg, so customers split into {bought, placed}
    vs {placed} shapes), set semantics."""
    from saber_spark.operators.triples import characteristic_sets
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    bought = (orders.join(li, orders.o_orderkey == li.l_orderkey)
              .filter(F.col("l_partkey") % 3 != 0)
              .select(F.concat(F.lit("cust:"),
                               F.col("o_custkey").cast("string"))
                      .alias("subj"),
                      F.lit("bought").alias("pred"),
                      F.concat(F.lit("part:"),
                               F.col("l_partkey").cast("string"))
                      .alias("obj")))
    store = _schema_kg(spark, sf_dir).unionByName(bought).distinct()
    return characteristic_sets(store)


def q_kg_timetravel(spark, sf_dir):
    """Temporal-KG snapshot delta (triples.kg_snapshot_diff) computed
    from the SCD-2 interval table ALONE — no second scan of raw
    observations: per triple, ONE bool_or agg of interval-covers-s1 /
    covers-s2 -> status in {added, retracted, unchanged}. Snapshots are
    derived from the data (s1 = min valid_from via a broadcast one-row
    cross join, s2 = s1+1), so no driver-side collect and no magic
    constants. History: the q_triple_history chain (user-did-event
    facts per epoch week)."""
    from saber_spark.operators.funnel import WEEK_US, _epoch_micros
    from saber_spark.operators.triples import (kg_snapshot_diff,
                                               triple_history)
    obs = _events(spark, sf_dir).select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string"))
        .alias("subj"),
        F.lit("did").alias("pred"),
        F.col("event_type").alias("obj"),
        F.floor(_epoch_micros("ts") / F.lit(WEEK_US)).cast("long")
        .alias("snap"))
    h = triple_history(obs)
    m = h.groupBy().agg(F.min("valid_from").alias("_s1"))
    return kg_snapshot_diff(h.crossJoin(F.broadcast(m)),
                            F.col("_s1"), F.col("_s1") + 1)


def q_void_stats(spark, sf_dir):
    """W3C VoID property partitions (triples.void_profile): per
    predicate, triple count + distinct subject/object counts over the
    3-relation store — the statistics table bgp_match's cost-based
    join ordering consumes (via triples.bgp_stats) and the first QA
    view of a triple dump. ONE schema-sized hash agg."""
    from saber_spark.operators.triples import void_profile
    return void_profile(_schema_kg3(spark, sf_dir))


def q_microdata_triples(spark, sf_dir):
    """Schema.org MICRODATA harvesting (structured.microdata_triples):
    the third publisher-asserted triple syntax next to jsonld_triples
    and table_triples — the WebDataCommons extraction triad complete.
    The fixture entity-escapes every value on the way in (the publisher
    constant carries all four entities) and the extractor decodes
    (&amp; last), while the oracle re-derives every field from
    documents RAW — so a missing/mis-ordered escape or decode on either
    side breaks the hash. JVM-only: regexp scans + posexplode inside
    codegen, no Python, no shuffle."""
    from saber_spark.fixtures.pages import build_pages_with_microdata
    from saber_spark.operators.structured import microdata_triples
    return microdata_triples(build_pages_with_microdata(spark, sf_dir))


def q_construct_triples(spark, sf_dir):
    """SPARQL CONSTRUCT (triples.construct): materialize the derived
    (cust)-[bought_from]->(supp) and inverse (supp)-[sold_to]->(cust)
    relations over every placed/contains/supplies chain in the
    3-relation store, excluding the id-swap self-loop corruption via
    FILTER NOT EXISTS — the rule-APPLICATION twin of rule_confidence's
    rule MINING. Set semantics (a CONSTRUCT result is a graph):
    bgp_match's join chain + two template Projects + one distinct.

    Execution shape (r6): the BGP join chain, the ~32M-row template
    union and the set-semantics distinct all run over the tagged-long
    twin store (guide §2.3); uri strings are rebuilt only on the 9M
    distinct result triples. Injective encode -> distinct commutes
    with the decode; verified hash-MATCH vs the unchanged oracle."""
    from saber_spark.operators.triples import construct
    g = construct(_schema_kg3_ids(spark, sf_dir),
                  [("?c", "placed", "?o"), ("?o", "contains", "?p"),
                   ("?s", "supplies", "?p")],
                  [("?c", "bought_from", "?s"),
                   ("?s", "sold_to", "?c")],
                  anti=[("?c", "placed", "?c")])
    return g.select(_kg3_id_to_uri(F.col("subj")).alias("subj"), "pred",
                    _kg3_id_to_uri(F.col("obj")).alias("obj"))


def q_ntriples_roundtrip(spark, sf_dir):
    """RDF N-Triples serialize -> parse round-trip
    (sources/ntriples.py): the 3-relation entity store plus a literal
    leg whose strings contain EVERY spec ECHAR (quote, backslash, LF,
    CR, TAB) is rendered to spec N-Triples lines and parsed back; the
    oracle reconstructs the store directly, so the hash match proves
    serialize∘parse = identity on real data INCLUDING the escaping
    corner cases — a no-op on either side, a wrong escape order, or a
    regexp_replace backslash bug all break it. Both directions are
    JVM literal-replace/regex chains at scan speed (no Python, no
    shuffle beyond the store's own distinct)."""
    from saber_spark.sources.ntriples import parse_ntriples, to_ntriples
    ents = _schema_kg3(spark, sf_dir).withColumn("is_lit", F.lit(False))
    lits = (_events(spark, sf_dir)
            .select(F.concat(F.lit("user:"),
                             F.col("user_id").cast("string")).alias("subj"),
                    F.lit("noted").alias("pred"),
                    F.concat(F.col("event_type"), F.lit('"'), F.lit("\\"),
                             F.lit("\n"), F.lit("\r"), F.lit("\t"),
                             F.lit("x")).alias("obj"),
                    F.lit(True).alias("is_lit"))
            .distinct())
    lines = to_ntriples(ents.unionByName(lits), literal_col="is_lit",
                        validate=False)
    return parse_ntriples(lines, validate=False)


def q_jsonld_triples(spark, sf_dir):
    """Structured-data harvesting (structured.jsonld_triples): pull the
    schema.org JSON-LD block out of each page's html and emit
    publisher-asserted (url, pred, obj) triples — the free, exact triple
    source real Common-Crawl KG construction runs BEFORE any tagger
    (the reference has no markup-triple path at all; its only markup
    handling is the PubMed XML pull, saber/utils/app_utils.py:63-80).
    Fixture pages synthesize the block with to_json so escaping is real
    (fixtures/pages.py:build_pages_with_jsonld); the oracle re-derives
    every field from documents independently, so a parse/round-trip bug
    on either side breaks the hash. JVM-only: regexp + from_json inside
    codegen, no Python, no shuffle."""
    from saber_spark.fixtures.pages import build_pages_with_jsonld
    from saber_spark.operators.structured import jsonld_triples
    return jsonld_triples(build_pages_with_jsonld(spark, sf_dir))


def q_hashed_ngram_score(spark, sf_dir):
    """fastText-style hashed-trigram linear quality scorer
    (classify.hashed_linear_score, Joulin et al. 2016 hashing trick):
    bucket = polynomial hash of each char trigram mod 1024, weight =
    Knuth-mixed bucket in [-8, 8], doc score = sum — the CCNet
    classifier shape with a deterministic weight table so the scores
    are oracle-checkable. ZERO-shuffle: the trigram sweep is a
    higher-order aggregate over a position sequence inside whole-stage
    codegen (no explode, no groupBy, no Python) — at 100 TB scoring
    runs at scan speed."""
    from saber_spark.operators.classify import hashed_linear_score
    return hashed_linear_score(_docs(spark, sf_dir))


def q_blocking_metrics(spark, sf_dir):
    """Blocking-quality evaluation for entity resolution
    (canonicalize.blocking_metrics, Christen 2012 ch. 7): reduction
    ratio + pair completeness for a first-char and a last-char blocking
    scheme over the resolution fixture names. Variants: even-length
    names get an 's' suffix (first-char block keeps them, last-char
    loses them), odd-length names get their first char uppercased
    (the reverse) — so BOTH schemes land strictly between 0 and 1 and
    the trade-off is visible. Candidate counts are algebraic
    (sum nb*(nb-1)/2 over one hash agg) — the quadratic pair space is
    never materialized."""
    from saber_spark.operators.canonicalize import blocking_metrics
    base = (tokenize_docs(_docs(spark, sf_dir))
            .select(F.lower("token").alias("name")).distinct())
    variant = F.when(F.length("name") % 2 == 0,
                     F.concat("name", F.lit("s"))) \
        .otherwise(F.concat(F.upper(F.substring("name", 1, 1)),
                            F.expr("substring(name, 2)")))
    pairs = (base.select(F.col("name").alias("a"), variant.alias("b"))
             .filter(F.col("a") != F.col("b")))
    records = (base.unionByName(pairs.select(F.col("b").alias("name")))
               .distinct())
    return blocking_metrics(records, pairs)


def q_anf_reach(spark, sf_dir):
    """Approximate neighborhood function (graph.anf_reach — ANF KDD'02 /
    HyperBall): per-node 2-hop reach estimated from a Flajolet-Martin
    bitstring that each round ORs in its out-neighbors' sketches. ONE
    int64 per node replaces the per-node frontier SET exact k-hop
    carries — the only per-node-reach shape that survives 10^12 edges.
    Fixture: a 2-level page graph (page -> two mod-211 hub pages) so
    reach varies by node; md5-prefix hash keeps the sketch itself (not
    just the estimate) engine-reproducible, and the oracle replays both
    OR-rounds."""
    from saber_spark.operators.graph import anf_reach
    page = F.concat(F.lit("p"), F.col("doc_id").cast("string"))
    docs = _docs(spark, sf_dir)
    edges = (docs.select(
        page.alias("src"),
        F.concat(F.lit("p"), (F.col("doc_id") % 211).cast("string"))
        .alias("dst"))
        .unionByName(docs.select(
            page.alias("src"),
            F.concat(F.lit("p"), ((F.col("doc_id") * 7) % 211)
                     .cast("string")).alias("dst")))
        .filter(F.col("src") != F.col("dst")))
    return anf_reach(edges, rounds=2)


def q_winnow_fingerprint(spark, sf_dir):
    """MOSS winnowing digest per document (dedup.winnow_fingerprints,
    Schleimer/Wilkerson/Aiken SIGMOD'03): min 5-gram hash per 4-window
    guarantees any shared substring of length >= 8 shares a fingerprint
    — POSITIONAL overlap detection, the property MinHash's whole-doc
    signature cannot give (in-cap dedup siblings cover the set-similarity
    side). Per-document only: explode + one ROWS-frame window min + one
    agg, no cross-doc shuffle."""
    from saber_spark.operators.dedup import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir))


def q_html_tables(spark, sf_dir):
    """WebTables-style markup-table extraction (structured.html_tables):
    every <table>/<tr>/<td> cell becomes a relational (url, table_idx,
    row_idx, col_idx, cell) tuple — the other publisher-structured fact
    source besides JSON-LD (a large share of web-harvested KG facts
    originate as table cells). Fixture pages carry a 2x2 metadata table
    per doc plus a second single-cell table on every 4th doc (multi-table
    indexing must be right). Three nested regexp+posexplode passes, zero
    shuffle, zero Python."""
    from saber_spark.operators.structured import html_tables
    docs = _docs(spark, sf_dir)
    extra = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(F.lit("<table><tr><td>extra "),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit("</td></tr></table>"))).otherwise(F.lit(""))
    pages = docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit("<html><body><table><tr><td>doc "),
            F.col("doc_id").cast("string"), F.lit("</td><td>"),
            F.col("lang"), F.lit("</td></tr><tr><td>"),
            F.col("source"), F.lit("</td><td>"),
            F.col("n_chars").cast("string"),
            F.lit("</td></tr></table>"), extra,
            F.lit("</body></html>")).alias("html"))
    return html_tables(pages)


def q_anchor_commonness(spark, sf_dir):
    """Entity-linking commonness prior p(target | anchor text)
    (webstats.anchor_commonness, Milne-Witten): per (anchor, dst_host)
    reference counts, the per-anchor total, the prior, and the argmax
    flag — the no-context sense prior every web-scale EL stack
    precomputes from anchor text. Same two-link page fixture as
    anchor_profile (anchors 'Entity k' fan over e{k}.org hosts)."""
    from saber_spark.operators.webstats import (anchor_commonness,
                                                extract_anchors)
    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.concat(F.lit("https://src"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit('<p><a href="https://e'),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('.org/page" class="x">Entity '),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('</a> and <a href="https://e'),
            (F.col("doc_id") % 5).cast("string"),
            F.lit('.org/other">alias '),
            (F.col("doc_id") % 11).cast("string"),
            F.lit("</a></p>")).alias("html"))
    return anchor_commonness(extract_anchors(pages))


def q_host_boilerplate(spark, sf_dir):
    """Host-scoped boilerplate profile (webstats.host_boilerplate): the
    CCNet within-site template signal — a line is boilerplate on its host
    when it appears on >= 50% of that host's pages; the per-host rate is
    the curation down-weight. Fixture stamps a per-host footer line on
    every page (always boilerplate) and a 'privacy policy' line on even
    doc_ids (sits exactly at the 50% threshold), on top of the mostly
    unique content lines. Line counts key on xxhash64 in Spark; the
    oracle groups raw lines (the line_dedup collision convention)."""
    from saber_spark.operators.webstats import host_boilerplate
    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.col("text"), F.lit("\n(c) "), F.col("source"),
            F.lit(" footer"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("\nprivacy policy"))
            .otherwise(F.lit(""))).alias("text"))
    return host_boilerplate(pages)


def q_cocitation_hosts(spark, sf_dir):
    """Co-citation + bibliographic coupling over the host link graph
    (graph.cocitation, Small 1973 / Kessler 1963): shared-in-neighbor and
    shared-out-neighbor counts per canonical host pair — the classic
    relatedness priors next to Adamic-Adar, via the triangle-counting
    wedge-join shape (never all-pairs)."""
    from saber_spark.operators.graph import cocitation
    return cocitation(_host_edges(spark, sf_dir))


def q_table_triples(spark, sf_dir):
    """Table-to-triple recovery (structured.table_triples, WebTables /
    Cafarella VLDB'08): header row + entity rows -> (url, subj, pred,
    obj) facts — the downstream half of html_tables that turns markup
    cells into KG assertions. Fixture tables carry a (name, lang,
    source) header and one entity row per doc, plus a second
    header-only table on every 4th doc (must contribute nothing).
    Two broadcastable equi-joins on (url, table, col/row)."""
    from saber_spark.operators.structured import html_tables, table_triples
    docs = _docs(spark, sf_dir)
    extra = F.when(
        F.col("doc_id") % 4 == 0,
        F.lit("<table><tr><td>k</td><td>v</td></tr></table>")) \
        .otherwise(F.lit(""))
    pages = docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit("<html><body><table>"
                  "<tr><td>name</td><td>lang</td><td>source</td></tr>"
                  "<tr><td>doc "),
            F.col("doc_id").cast("string"), F.lit("</td><td>"),
            F.col("lang"), F.lit("</td><td>"),
            F.col("source"),
            F.lit("</td></tr></table>"), extra,
            F.lit("</body></html>")).alias("html"))
    return table_triples(html_tables(pages))


def q_pq_codes(spark, sf_dir):
    """Product-quantization encode (similarity.pq_codes, Jégou et al.
    TPAMI 2011): each embedding splits into 4 contiguous subvectors,
    each replaced by its nearest codeword id from a deterministic
    8-entry per-subspace codebook — the memory-side ANN component next
    to ivf_cosine_topk (cell routing) and lsh_cosine_topk (hash
    routing); at 10^12 vectors PQ is what makes the re-rank candidate
    set RAM-resident. Exact integer L2 on the quantized components, so
    the oracle's argmin agrees bit-for-bit; assignment is a NARROW
    higher-order argmin over a broadcast-literal codebook (no shuffle,
    no crossJoin, no Python)."""
    from saber_spark.operators.similarity import pq_codes
    return pq_codes(_embeddings(spark, sf_dir), m=4, n_codes=8)


def q_quote_attribution(spark, sf_dir):
    """Reported-speech harvesting (structured.quote_attribution,
    Quotebank-style who-said-what extraction): direct ``X said "..."``
    and inverted ``"...," said|replied X`` frames pulled with two JVM
    regexp_extract_all passes and positional arrays_zip — quote/claim
    edges are the web-KG triple family the tagger path cannot see.
    The fixture synthesizes both frames deterministically from each
    document's own words (fixtures/pages.py:build_docs_with_quotes)
    and the oracle re-derives the text AND re-runs the identical
    RE2/Java-portable pattern from documents RAW, so a regex or zip
    bug on either side breaks the hash. No Python, no shuffle."""
    from saber_spark.fixtures.pages import build_docs_with_quotes
    from saber_spark.operators.structured import quote_attribution
    return quote_attribution(build_docs_with_quotes(spark, sf_dir))


def q_ndcg_eval(spark, sf_dir):
    """Ranking-quality evaluation (retrieval.ndcg_eval, Järvelin &
    Kekäläinen TOIS 2002): nDCG@10 for three term queries over
    documents — the graded-judgment eval metric next to linkpred's
    MRR/AUC; system ranking by query-term tf, graded relevance derived
    independently from a paired relevance term (grades 0..3), DCG with
    the (2^rel-1)/log2(rank+1) gain, IDCG by re-ranking the same
    candidates. ONE scan: queries ride in as an exploded broadcast
    literal, tf/rel are higher-order filters inside codegen, and the
    only exchange is the per-query ranking window."""
    from saber_spark.operators.retrieval import ndcg_eval
    return ndcg_eval(_docs(spark, sf_dir),
                     [("join", "merge"), ("stream", "window"),
                      ("filter", "scan")], k=10)


def q_fd_mining(spark, sf_dir):
    """Approximate functional-dependency mining (profile.fd_mine,
    TANE/Pyro-style g3 error, Kivinen & Mannila 1995): for four
    candidate lhs -> rhs pairs over orders, the fraction of rows that
    must be deleted for the FD to hold — the schema-DISCOVERY
    generalization of link_fd_check's single-FD audit, run before
    resolve_conflicts assumes a predicate is functional. The slate
    spans the spectrum: o_orderkey -> o_custkey holds exactly (key),
    the rest fail at three distinct error levels. One (lhs, rhs) hash
    agg per candidate with map-side combine; each result is one row."""
    from saber_spark.operators.profile import fd_mine
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return fd_mine(orders, [("o_orderkey", "o_custkey"),
                            ("o_custkey", "o_orderstatus"),
                            ("o_orderstatus", "o_orderpriority"),
                            ("o_orderdate", "o_orderstatus")])


RDFS_DOMAIN_ROWS = [("placed", "Customer"), ("contains", "Order"),
                    ("supplies", "Supplier")]
RDFS_RANGE_ROWS = [("placed", "Order"), ("contains", "Part"),
                   ("supplies", "Part")]
RDFS_SUBCLASS_ROWS = [("Customer", "Agent"), ("Supplier", "Agent"),
                      ("Order", "Record"), ("Part", "Artifact"),
                      ("Record", "Thing"), ("Artifact", "Thing"),
                      ("Agent", "Thing")]


def q_rdfs_entailment(spark, sf_dir):
    """RDFS type-entailment materialization (ontology.rdfs_entail, W3C
    RDF 1.1 Semantics §9.2 rules rdfs2/rdfs3/rdfs9): domain/range
    declarations type every subject/object of the 3-relation store and
    the subClassOf closure (path-doubling) lifts each assertion up a
    depth-2 hierarchy — the inference stage between triple assembly and
    domain_range_audit's QA. The fixture's id-swap self-loops surface
    as genuine type CONFLICTS (a cust: node typed Order via
    range(placed)) rather than being cleaned away. Schema tables are
    broadcast; the store shuffles only for the final set-semantics
    distinct. Oracle: recursive CTE closure + the same rule joins.
    Execution shape (r6): tagged-long twin store (rules key on pred
    strings; entity identity is internal until the final decode of the
    573k distinct (entity, type) rows — guide §2.3), hash-MATCH vs the
    unchanged oracle."""
    from saber_spark.operators.ontology import rdfs_entail
    ent = rdfs_entail(
        _schema_kg3_ids(spark, sf_dir),
        spark.createDataFrame(RDFS_DOMAIN_ROWS, "pred string, cls string"),
        spark.createDataFrame(RDFS_RANGE_ROWS, "pred string, cls string"),
        spark.createDataFrame(RDFS_SUBCLASS_ROWS,
                              "child string, parent string"))
    return ent.select(_kg3_id_to_uri(F.col("entity")).alias("entity"),
                      "type")


def q_optional_bgp(spark, sf_dir):
    """SPARQL OPTIONAL evaluation (triples.bgp_match optionals= leg):
    ``?c placed ?o OPTIONAL { ?o contains ?p }`` over the 3-relation
    store — the left-join half of the BGP surface that bgp_query
    (inner+anti) and construct_triples (anti) don't exercise. The
    fixture's id-swap self-loops make the OPTIONAL genuinely partial:
    a cust: object is never a contains-subject, so those bindings
    surface with ?p unbound (NULL) exactly as SPARQL prescribes.
    Rolled up per customer -> (customer, n_bindings, n_orders,
    n_part_bindings, n_unbound)."""
    from saber_spark.operators.triples import bgp_match
    b = bgp_match(_schema_kg3(spark, sf_dir),
                  [("?c", "placed", "?o")],
                  optionals=[("?o", "contains", "?p")])
    return (b.groupBy(F.col("c").alias("customer"))
            .agg(F.count(F.lit(1)).alias("n_bindings"),
                 F.count_distinct("o").alias("n_orders"),
                 F.count("p").alias("n_part_bindings"),
                 F.sum(F.when(F.col("p").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_unbound")))


def q_schema_matching(spark, sf_dir):
    """Instance-based schema matching (profile.schema_match, Rahm &
    Bernstein VLDB J. 2001): align customer columns to supplier columns
    by distinct-value-set overlap — the integration step that decides
    which KG predicate a NEW source's column feeds before its
    table_triples/microdata facts merge in. Jaccard ranks the nationkey
    pair above the accidental key overlap; containment flags subset
    matches. The value equi-join on pre-deduped sides is the only
    corpus-wide exchange; no column×column cross join exists anywhere."""
    from saber_spark.operators.profile import schema_match
    return schema_match(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/supplier.parquet"),
        ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
        ["s_suppkey", "s_name", "s_nationkey"])


def q_transe_score(spark, sf_dir):
    """KG-embedding triple plausibility (kge.transe_score, Bordes et al.
    NeurIPS 2013): exact-integer L1 TransE energy |q(h)+q(r)-q(t)| over
    the 3-relation store, entities resolved to embedding rows by a
    deterministic arithmetic id and relation vectors riding in as a
    broadcast literal — the post-construction fact-validation /
    completion signal that pairs with kge_negatives' training sampler.
    Top-5 most plausible triples per relation. Two equi-joins against
    the quantized embedding table are the only shuffles; the energy is
    a higher-order zip/aggregate inside codegen."""
    from saber_spark.operators.kge import transe_score
    return transe_score(
        _schema_kg3(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        {"placed": 100, "contains": 101, "supplies": 102}, top_k=5)


def q_fact_ranking(spark, sf_dir):
    """Entity summarization by fact self-information
    (triples.fact_ranking, RELIN/FACES family): each subject's top-3
    facts ranked by -log2(n_po/N) of the (pred, obj) value — the
    ranked upgrade of entity_card's modal-value skeleton; hub objects
    score low, rare values make the summary. One global (pred, obj)
    agg, one join back, N as a broadcast 1-row aggregate, one window."""
    from saber_spark.operators.triples import fact_ranking
    return fact_ranking(_schema_kg3(spark, sf_dir), k=3)


def q_inverted_index(spark, sf_dir):
    """Positional inverted-index build (retrieval.inverted_index): the
    Lucene-segment-shaped posting table — (token, doc) rows with sorted
    occurrence positions and per-token document frequency — that the
    bm25/ndcg ranking stack would be served from at 10^12 docs. ONE
    (token, doc) hash agg with in-agg position collection (array_sort,
    never a window), a second agg of the already-reduced postings for
    df, one join back on the token key."""
    from saber_spark.operators.retrieval import inverted_index
    from saber_spark.operators.vocab import tokenize_docs
    idx = inverted_index(tokenize_docs(_docs(spark, sf_dir)))
    # positions project as CSV for the comparator (array hashing differs
    # between the pandas-path and driver-default comparators); the
    # operator itself keeps the real array<long> column
    return idx.select("token", "doc_id", "doc_freq", "n_occ",
                      F.array_join("positions", ",").alias("positions_csv"))


def q_phrase_search(spark, sf_dir):
    """Exact positional phrase search (retrieval.phrase_search): the
    posting-intersection consumer of the inverted index — each phrase
    term is one filtered pushed-down scan projected to (doc, pos - i),
    conjoined by equi-joins on the shared (doc, anchor) key (the BGP
    join shape applied to positions). Phrase: "batch batch" — repeated
    tokens make overlap handling visible (three in a row = two
    anchors)."""
    from saber_spark.operators.retrieval import phrase_search
    from saber_spark.operators.vocab import tokenize_docs
    hits = phrase_search(tokenize_docs(_docs(spark, sf_dir)),
                         ["batch", "batch"])
    return hits.select("doc_id", "n_matches",
                       F.array_join("match_positions", ",")
                       .alias("match_positions_csv"))


def q_expectations_check(spark, sf_dir):
    """Deequ-style declarative data-quality gate
    (profile.expectations_check, Schelter et al. VLDB 2018): five
    constraints over orders — key uniqueness, FK completeness, a price
    floor, and two accepted-values domains, one of which (priorities
    restricted to the top-3 urgency classes) FAILS with real violation
    counts so the verdict table exercises both outcomes. Each check is
    one aggregate over the same scan; verdicts union as single rows."""
    from saber_spark.operators.profile import expectations_check
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return expectations_check(orders, [
        ("custkey_not_null", "not_null", "o_custkey", None),
        ("orderkey_unique", "unique", "o_orderkey", None),
        ("priority_top3_only", "accepted_values", "o_orderpriority",
         ["1-URGENT", "2-HIGH", "3-MEDIUM"]),
        ("status_domain", "accepted_values", "o_orderstatus",
         ["O", "F", "P"]),
        ("totalprice_floor", "min", "o_totalprice", 0.0),
    ])


def q_measurements(spark, sf_dir):
    """Quantity extraction + SI normalization (structured.measurements):
    numeric attribute-value harvesting ("spans 12 km" -> (doc, 12.0,
    km, 12000.0, m)) — the measurement analog of the microdata/table
    triple paths; numeric object literals are how a web KG gets its
    quantitative facts. One JVM regexp pass zipped positionally, the
    unit->SI table a codegen'd when-chain; the fixture keeps values
    binary-exact (x.0 / x.5) so conversion is engine-identical and the
    oracle re-derives the sentence from documents RAW."""
    from saber_spark.fixtures.pages import build_docs_with_measurements
    from saber_spark.operators.structured import measurements
    return measurements(build_docs_with_measurements(spark, sf_dir))


def q_citation_spans(spark, sf_dir):
    """Bracketed-citation harvesting (structured.citation_spans):
    "see [n] and [n+1,n+2]" -> one row per referenced number with its
    0-based group index — the (doc, ref) edge table scholarly-webtext
    reference resolution starts from. Two nested codegen explodes
    (groups via regexp_extract_all, members via split); no Python, no
    shuffle."""
    from saber_spark.fixtures.pages import build_docs_with_measurements
    from saber_spark.operators.structured import citation_spans
    return citation_spans(build_docs_with_measurements(spark, sf_dir))


def q_cusum_changepoints(spark, sf_dir):
    """Page's CUSUM changepoint monitor (timeseries.cusum_changepoints,
    Biometrika 1954) over per-type daily event counts — the drift
    alarm a continuously-ingesting pipeline runs on its own extraction
    metrics. Upper CUSUM via the cumsum identity (running sum minus
    running min — two windows on ONE (key, day) partitioning, no
    recursion); day buckets are tz-free epoch-microsecond floors (the
    hypertable_rollup convention); mean/stddev derive from exact
    integer sums so both engines agree."""
    from saber_spark.operators.timeseries import cusum_changepoints
    return cusum_changepoints(_events(spark, sf_dir))


def q_gini_concentration(spark, sf_dir):
    """Gini concentration of mention mass per label
    (groupstats.gini_concentration): how unequally a label's mentions
    distribute over its canonical entities — the hub-entity diagnostic
    run before trusting per-label statistics (one entity holding 90%
    of DISO means the label's numbers are that entity's). Sorted-rank
    identity over exact integer counts: one (label, entity) agg, one
    rank window over the already-reduced counts, one final agg."""
    from saber_spark.operators.groupstats import gini_concentration
    return gini_concentration(_linked_spark(spark, sf_dir),
                              "label", "canonical_id")


def q_analogy_eval(spark, sf_dir):
    """word2vec analogy probe (kge.analogy_eval, Mikolov NAACL 2013:
    b - a + c): three quadruples against the embedding table — the
    intrinsic geometry check run on trained embeddings before they
    gate linking/dedup decisions. Targets are a broadcast literal;
    each corpus row scores all targets via dim scalar codegen terms
    (exact integer dot against the integer target); top-1 per quad via
    a WindowGroupLimit-pruned window, a/b/c excluded per protocol."""
    from saber_spark.operators.kge import analogy_eval
    return analogy_eval(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        [(0, 1, 2), (3, 4, 5), (10, 20, 30)])


SHACL_SHAPES = [
    ("Customer", "in_nation", 1, 1),
    ("Customer", "placed", 1, 4),
    ("Customer", "in_segment", 1, 1),
]
SHACL_SHAPES_SQL = ", ".join(
    f"('{c}', '{p}', {lo}, {hi})" for c, p, lo, hi in SHACL_SHAPES)


def q_shacl_validate(spark, sf_dir):
    """SHACL-style shape validation (ontology.shacl_validate): minCount /
    maxCount / closed violations for Customer node shapes over facts
    derived from customer+orders — the constraint gate a KG publishes
    behind. Fixture facts: in_nation and in_segment (exactly one each —
    clean), placed (urgent orders only; missing -> minCount, >4 ->
    maxCount), vip_flag (custkey % 97 == 0; unlisted -> closed). One
    fact-side hash agg; shapes are broadcast literals."""
    from saber_spark.operators.ontology import shacl_validate
    cust = tpch.load(spark, sf_dir, "customer")
    orders = tpch.load(spark, sf_dir, "orders")
    subj = F.concat(F.lit("cust:"), F.col("c_custkey").cast("string"))
    facts = (cust.select(subj.alias("subj"),
                         F.lit("in_nation").alias("pred"),
                         F.concat(F.lit("nation:"),
                                  F.col("c_nationkey").cast("string"))
                         .alias("obj"))
             .unionByName(
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.concat(F.lit("cust:"),
                         F.col("o_custkey").cast("string")).alias("subj"),
                F.lit("placed").alias("pred"),
                F.concat(F.lit("order:"),
                         F.col("o_orderkey").cast("string")).alias("obj")))
             .unionByName(
        cust.select(subj.alias("subj"),
                    F.lit("in_segment").alias("pred"),
                    F.col("c_mktsegment").alias("obj")))
             .unionByName(
        cust.filter(F.col("c_custkey") % 97 == 0)
        .select(subj.alias("subj"), F.lit("vip_flag").alias("pred"),
                F.lit("true").alias("obj"))))
    types = cust.select(subj.alias("subj"), F.lit("Customer").alias("cls"))
    shapes = spark.createDataFrame(
        SHACL_SHAPES, "cls string, pred string, min_count int, max_count int")
    return shacl_validate(facts, types, shapes,
                          closed_classes=["Customer"])


def q_ppjoin_similarity(spark, sf_dir):
    """Exact-Jaccard set-similarity self-join >= 0.95 via prefix filtering
    (dedup.ppjoin_similarity; AllPairs/PPJoin) — the no-false-negative
    counterpart to the MinHash/LSH path for auditable dedup policies.
    Candidates join only on frequency-ascending token prefixes; the
    oracle is an INDEPENDENT brute-force all-pairs derivation, so the
    match evidences the prefix filter's losslessness."""
    from saber_spark.operators.dedup import ppjoin_similarity
    return ppjoin_similarity(_docs(spark, sf_dir), threshold=0.95)


def q_texttiling(spark, sf_dir):
    """TextTiling topic segmentation (textstats.texttiling, Hearst CL
    1997): adjacent 10-token-block cosine per gap + immediate-neighbor
    depth score; boundaries at sharp strict local cohesion minima —
    the topic-aware passage splitter upstream of fixed-stride chunking.
    Dot/norms are exact integer aggs; cosine/depth are single double
    expressions; one per-doc window over gap-cardinality rows."""
    from saber_spark.operators.textstats import texttiling
    return texttiling(_docs(spark, sf_dir), window=10, cutoff=0.1)


def _linkage_pairs(spark, sf_dir):
    """Shared fixture for the record-linkage queries: candidate pairs over
    the corpus vocabulary with a comparison vector and ground truth.
    Matches are (t, t || 's') suffix variants; non-matches are
    (t, reverse(t) || 'qq') — so the three agreement fields (first char,
    length-within-1, 3-char prefix) genuinely separate the classes.
    labeled = even-length(a) marks the deterministic training half."""
    toks = (tokenize_docs(_docs(spark, sf_dir))
            .select(F.lower("token").alias("a")).distinct())
    m = toks.select("a", F.concat("a", F.lit("s")).alias("b"),
                    F.lit(True).alias("is_match"))
    u = toks.select("a", F.concat(F.reverse("a"), F.lit("qq")).alias("b"),
                    F.lit(False).alias("is_match"))
    return (m.unionByName(u)
            .withColumn("f_first",
                        F.substring("a", 1, 1) == F.substring("b", 1, 1))
            .withColumn("f_len",
                        F.abs(F.length("a") - F.length("b")) <= 1)
            .withColumn("f_pre3",
                        F.substring("a", 1, 3) == F.substring("b", 1, 3))
            .withColumn("labeled", F.length("a") % 2 == 0))


def q_fellegi_sunter(spark, sf_dir):
    """Probabilistic record linkage (canonicalize.fellegi_sunter, Fellegi
    & Sunter JASA 1969 / Splink's model): m/u probabilities estimated
    from the labeled pair half with Laplace smoothing, every pair scored
    with the log2 likelihood-ratio match weight + posterior probability,
    and classified by the FS three-way rule (link / possible-link /
    non-link). One hash agg estimates the parameters; scoring is a
    broadcast of the 1-row parameter table — the pair stream never
    shuffles. Oracle replays the exact Laplace arithmetic in SQL."""
    from saber_spark.operators.canonicalize import fellegi_sunter
    pairs = _linkage_pairs(spark, sf_dir)
    return fellegi_sunter(pairs, ["f_first", "f_len", "f_pre3"],
                          upper=2.0, lower=-2.0) \
        .select("a", "b", "match_weight", "match_probability", "decision")


def q_fellegi_sunter_em(spark, sf_dir):
    """UNSUPERVISED Fellegi-Sunter via 2 EM rounds
    (canonicalize.fellegi_sunter_em, Winkler 1988 — the Splink training
    loop): m/u/lambda learned from the pair comparison vectors alone (the
    fixture's labels are never read), then the same log2-likelihood
    scoring + FS three-way decision as the supervised twin. Each M-step
    is one hash agg reduced to a single parameter row (driver collects
    the model only, kmeans-style); scoring is a narrow literal map.
    Oracle unrolls both EM rounds as chained CTEs with op-identical
    arithmetic."""
    from saber_spark.operators.canonicalize import fellegi_sunter_em
    pairs = _linkage_pairs(spark, sf_dir) \
        .select("a", "b", "f_first", "f_len", "f_pre3")
    return fellegi_sunter_em(pairs, ["f_first", "f_len", "f_pre3"],
                             iterations=2, upper=2.0, lower=-2.0) \
        .select("a", "b", "match_weight", "match_probability", "decision")


def q_kg_align(spark, sf_dir):
    """Cross-KG instance alignment (triples.kg_align, PARIS-style exact-
    fact Jaccard + mutual-best): an existing customer KG vs a 'crawled'
    twin with renamed entities (w<k>, every 3rd customer missing), a
    dropped segment fact for every 5th, and a near-unique acct_band fact
    (mod 211) making true pairs distinctive. Candidates only from the
    shared-(pred,obj) equi-join — never all-pairs; mutual-best argmax
    compiles to two WindowGroupLimit passes. The scale-free df-cut
    (max_df_frac=0.05) drops the in_segment hub facts at EVERY sf
    (df ~ n/5 > 0.05n) while keeping in_nation (df ~ n/25) and the
    near-unique bands — measured 51.5 -> ~13 s steady at sf0.1 (the
    candidate join shrank from ~3.6e7 segment-dominated pairs to the
    nation+band ~6.7e6; the remaining cost IS that nation-pair volume —
    tightening the frac below 1/25 would drop nation too and collapse
    the alignment to band ties); true pairs still score jaccard 1.0 on
    the pruned 2-fact sets vs <= 1/3 for impostors."""
    from saber_spark.operators.triples import kg_align
    cust = tpch.load(spark, sf_dir, "customer")
    ck = F.col("c_custkey")
    facts = lambda src, ent: (
        src.select(ent.alias("subj"), F.lit("in_nation").alias("pred"),
                   F.concat(F.lit("nation:"),
                            F.col("c_nationkey").cast("string"))
                   .alias("obj"))
        .unionByName(src.select(
            ent.alias("subj"), F.lit("acct_band").alias("pred"),
            F.concat(F.lit("band:"), (ck % 211).cast("string"))
            .alias("obj"))))
    seg = lambda src, ent: src.select(
        ent.alias("subj"), F.lit("in_segment").alias("pred"),
        F.col("c_mktsegment").alias("obj"))
    ent_a = F.concat(F.lit("c"), ck.cast("string"))
    ent_b = F.concat(F.lit("w"), ck.cast("string"))
    cust_b = cust.filter(ck % 3 != 0)
    kg_a = facts(cust, ent_a).unionByName(seg(cust, ent_a))
    kg_b = facts(cust_b, ent_b).unionByName(
        seg(cust_b.filter(ck % 5 != 0), ent_b))
    return kg_align(kg_a, kg_b, threshold=0.5, mutual=True,
                    max_df_frac=0.05)


def q_partition_quality(spark, sf_dir):
    """Graph-partitioning quality audit (graph.partition_quality) over
    the host link graph at k=4: md5-hash vs range (ntile) node
    partitioning compared on edge-cut fraction and load imbalance — the
    measurement that decides the node-key layout before iterative KG
    analytics (every pagerank/CC round pays cut_fraction in cross-
    partition traffic). Node->part is one projection; the cut is two
    dimension joins + one agg."""
    from saber_spark.operators.graph import partition_quality
    docs = _docs(spark, sf_dir)
    edges = docs.select(
        F.concat(F.col("source"), F.lit(".example.org")).alias("src"),
        F.concat(F.lit("src"),
                 F.when(F.col("doc_id") % 2 == 0, F.col("doc_id") % 7)
                 .otherwise(F.col("doc_id") % 3).cast("string"),
                 F.lit(".example.org")).alias("dst")).distinct()
    return partition_quality(edges, k=4)


def q_logreg_quality(spark, sf_dir):
    """Trainable corpus-quality filter via full-batch gradient descent
    (classify.logreg_fit_predict, the CCNet/fastText linear-classifier
    shape): 2 GD steps over (bias, scaled length, mod-3 signal) features
    with a deterministic mod-3 label — each step ONE hash agg collected
    as a |features|-row gradient (kmeans convention), scoring a narrow
    literal map. Oracle unrolls both steps with op-identical arithmetic
    (zero-init makes step 1's sigmoid exactly 0.5)."""
    from saber_spark.operators.classify import logreg_fit_predict
    feats = _docs(spark, sf_dir).select(
        "doc_id",
        F.lit(1.0).alias("x_bias"),
        (F.col("n_chars") / F.lit(1000.0)).alias("x_len"),
        ((F.col("doc_id") % 3) / F.lit(2.0)).alias("x_mod"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("y"))
    return logreg_fit_predict(feats, ["x_bias", "x_len", "x_mod"],
                              label_col="y", lr=2.0, steps=2,
                              id_cols=["doc_id"])


def q_rendezvous_shards(spark, sf_dir):
    """Rendezvous/HRW stable sharding with resize-churn audit
    (packing.rendezvous_shards, Thaler-Ravishankar 1998): every doc
    assigned to 8 shards by md5 highest-random-weight, re-assigned at 9,
    moved flag per doc — the minimal-movement bucketing an incremental
    recrawl pipeline needs (pmod hashing would remap ~8/9 of keys).
    Narrow per-row argmax over literal legs: zero joins, zero shuffles,
    zero Python; md5 keeps the weights engine-portable so the oracle
    replays them exactly."""
    from saber_spark.operators.packing import rendezvous_shards
    return rendezvous_shards(_docs(spark, sf_dir), n_shards=8,
                             compare_shards=9) \
        .select("doc_id", "shard", "shard_resized", "moved")


def q_sorted_neighborhood(spark, sf_dir):
    """Multi-pass sorted-neighborhood candidate generation
    (canonicalize.sorted_neighborhood, Hernandez & Stolfo SIGMOD'95):
    vocabulary sorted by the name and by its reversal, pairs within a
    rank window of 3 per pass — linear candidate volume, and the
    reversed pass recovers first-character typos that key-equality
    blocking (blocking_metrics) structurally misses. Ranks come from the
    distributed range-partition + offset construction, not a single-task
    window; the oracle derives the same pairs via lead() over each sort
    order."""
    from saber_spark.operators.canonicalize import sorted_neighborhood
    toks = (tokenize_docs(_docs(spark, sf_dir))
            .select(F.lower("token").alias("name")).distinct())
    return sorted_neighborhood(
        toks,
        {"fwd": lambda c: F.col(c),
         "rev": lambda c: F.reverse(F.col(c))},
        window=3)


def q_rdfa_triples(spark, sf_dir):
    """RDFa Lite harvesting (structured.rdfa_triples): the fourth
    publisher-asserted triple syntax next to jsonld_triples,
    table_triples and microdata_triples — the WebDataCommons extraction
    quartet complete. Same adversarial fixture convention as microdata:
    every value is entity-escaped on the way in (the publisher constant
    carries all four entities) and the extractor decodes (&amp; last),
    while the oracle re-derives every field from documents RAW — a
    missing or mis-ordered escape/decode on either side breaks the hash.
    JVM-only: regexp scans + explode inside codegen, no Python, no
    shuffle."""
    from saber_spark.fixtures.pages import build_pages_with_rdfa
    from saber_spark.operators.structured import rdfa_triples
    return rdfa_triples(build_pages_with_rdfa(spark, sf_dir))


def q_openie_triples(spark, sf_dir):
    """Open information extraction (openie.openie_triples, ReVerb-lite):
    capitalized-subject verb-frame scan with copula->isA / possession->has
    relation normalization, grouped to (subj, pred, obj, freq, support).
    Input is the relations fixture — deterministic clauses injected AFTER
    each document's lowercase word-salad body, so the pattern must not
    fire on the body (capitalized-subject guard) and fires exactly three
    times per non-blank doc. The oracle re-derives the injected clauses
    from documents RAW (person/org/verb wheels keyed on doc_id) and runs
    the IDENTICAL Java-cap-RE2 pattern via regexp_extract_all. One
    corpus shuffle (the triple groupBy with map-side partials)."""
    from saber_spark.fixtures.pages import build_docs_with_relations
    from saber_spark.operators.openie import openie_triples
    return openie_triples(build_docs_with_relations(spark, sf_dir))


def q_good_turing(spark, sf_dir):
    """Good-Turing count-of-counts smoothing (lm.good_turing): frequency
    histogram n_r over the token stream plus the simple-GT smoothed
    count r* = (r+1) n_{r+1}/n_r (NULL at histogram gaps — honest, not
    padded), the unseen-mass/backoff estimator next to lm_backoff's
    Katz-style trigram chain. Corpus touches exactly one shuffle (the
    type-frequency agg); everything after runs on the hundreds-row
    histogram."""
    from saber_spark.operators.lm import good_turing
    return good_turing(tokenize_docs(_docs(spark, sf_dir)))


def q_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency OLS (vocab.zipf_fit): ln(freq) ~ ln(rank)
    slope/intercept/R^2 in closed form — the corpus-health scalar next
    to vocab_profile and gini_concentration. Deterministic rank
    (freq DESC, token ASC); the global rank window is vocabulary-bounded
    (the vocab_ids convention) and the moment agg reduces map-side to
    one row. Oracle replays the identical arithmetic in DuckDB, both
    sides rounded to 6."""
    from saber_spark.operators.vocab import zipf_fit
    return zipf_fit(tokenize_docs(_docs(spark, sf_dir)))


def q_temporal_conflicts(spark, sf_dir):
    """Temporal functional-predicate audit (triples.temporal_conflicts):
    overlapping-validity interval pairs with different objects over the
    q_triple_history SCD-2 chain, treating 'did' as functional — the
    temporal twin of link_fd_check/domain_range_audit (the web asserts
    contradictory facts; maintenance must surface them). Self-join
    co-partitions on (subj, pred) in ONE exchange; per-key rows bounded
    by the snapshot horizon. Oracle: the row_number gaps-and-islands
    history (independent derivation) + the same overlap join."""
    from saber_spark.operators.funnel import WEEK_US, _epoch_micros
    from saber_spark.operators.triples import (temporal_conflicts,
                                               triple_history)
    obs = _events(spark, sf_dir).select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string"))
        .alias("subj"),
        F.lit("did").alias("pred"),
        F.col("event_type").alias("obj"),
        F.floor(_epoch_micros("ts") / F.lit(WEEK_US)).cast("long")
        .alias("snap"))
    return temporal_conflicts(triple_history(obs), ["did"])


def q_phonetic_blocking(spark, sf_dir):
    """Phonetic blocking keys (canonicalize.phonetic_blocking): the
    classic third ER blocking strategy next to key-equality
    (blocking_metrics) and rank windows (sorted_neighborhood) — a
    Soundex-style 4-char key from a portable regexp_replace chain (no
    backreferences, so RE2 replays it identically), assignments plus
    block sizes over the distinct lowered vocabulary. Key derivation is
    narrow codegen; the size agg is vocabulary-bounded."""
    from saber_spark.operators.canonicalize import phonetic_blocking
    names = (tokenize_docs(_docs(spark, sf_dir))
             .select(F.lower("token").alias("name")).distinct())
    return phonetic_blocking(names)


def q_entity_hindex(spark, sf_dir):
    """Hirsch-index entity salience (linking.entity_hindex): h = max h
    with >= h docs of >= h mentions — the breadth-AND-depth scalar next
    to entity_salience's per-doc aboutness (one viral page and a
    thousand drive-by mentions both score h=1). One (label, doc) agg,
    per-label rank window over the REDUCED counts (gini convention),
    one final agg. Oracle replays the identical sorted-rank identity."""
    from saber_spark.operators.linking import entity_hindex
    return entity_hindex(_linked_spark(spark, sf_dir))


def q_url_templates(spark, sf_dir):
    """URL path-template mining (webstats.url_templates): hex runs ->
    {h} then digit runs -> {d} in the path, profiled per (host,
    template) — the frontier-shaping / spider-trap signal next to
    url_dedup's exact normalization and crawl_frontier's scheduling.
    Fixture synthesizes two real template families per corpus: dated
    article paths /news/{d}/{d}/doc{d} and hash-addressed /p/{h} pages
    (md5 prefixes — identical hex in both engines). One hash agg on
    (host, template); distinct paths ride the same key two-phase."""
    from saber_spark.operators.webstats import url_templates
    docs = _docs(spark, sf_dir)
    dated = F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".example.org/news/2024/"),
                     (F.col("doc_id") % 12 + 1).cast("string"),
                     F.lit("/doc"), F.col("doc_id").cast("string"))
    hashed = F.concat(F.lit("https://cdn.example.org/p/"),
                      F.substring(F.md5(F.col("doc_id").cast("string")),
                                  1, 12))
    pages = docs.select(
        F.when(F.col("doc_id") % 3 == 0, hashed).otherwise(dated)
        .alias("url"))
    return url_templates(pages)


def q_subprop_entailment(spark, sf_dir):
    """Sub-property + inverse entailment (ontology.subprop_entail):
    rdfs5/rdfs7 plus owl:inverseOf over the 3-relation store —
    the RELATION half of the RDFS rule set next to rdfs_entailment's
    TYPE rules. Property schema: placed/supplies under commercial_rel
    under related_to (a 2-deep chain exercising the rdfs5 closure),
    contains under structural_rel; inverses placed<->placed_by and
    contains<->contained_in. Facts touched by two broadcast joins and
    ONE distinct; the closure is schema-sized (driver BFS fast path).
    Oracle: recursive-CTE closure + the same unions. Execution shape
    (r6): tagged-long twin store (rules rewrite pred strings only;
    entities decode after the final 4.2M-row distinct — guide §2.3),
    hash-MATCH vs the unchanged oracle."""
    from saber_spark.operators.ontology import subprop_entail
    subprops = spark.createDataFrame(
        [("placed", "commercial_rel"), ("supplies", "commercial_rel"),
         ("commercial_rel", "related_to"), ("contains", "structural_rel")],
        "child string, parent string")
    inverses = spark.createDataFrame(
        [("placed", "placed_by"), ("contains", "contained_in")],
        "pred string, inverse string")
    ent = subprop_entail(_schema_kg3_ids(spark, sf_dir), subprops, inverses)
    return ent.select(_kg3_id_to_uri(F.col("subj")).alias("subj"), "pred",
                      _kg3_id_to_uri(F.col("obj")).alias("obj"))


def q_sameas_rewrite(spark, sf_dir):
    """owl:sameAs fusion (triples.sameas_rewrite): the step AFTER
    kg_align — transitive closure of sameAs pairs via connected
    components, min-id canonical representatives, store rewritten
    through the canon map with collapsing facts deduplicated. Fixture:
    the 3-relation store with placed-subjects aliased to dup:<k>
    (every 4th customer) and dup2:<k> (every 8th — a 2-link chain the
    CC must close), sameAs pairs declared accordingly; the rewrite must
    restore the fully-canonical store ('cust:' sorts below 'dup:', so
    min-id lands on the real entity). CC runs on the sameAs edge
    dimension (rounds=4 lazy mode); the store sees two canon joins +
    one distinct. Oracle: recursive-CTE reachability CC + same joins."""
    from saber_spark.operators.triples import sameas_rewrite
    li = tpch.load(spark, sf_dir, "lineitem")
    orders = tpch.load(spark, sf_dir, "orders")
    ck = F.col("o_custkey")
    alias_subj = (F.when(ck % 8 == 0,
                         F.concat(F.lit("dup2:"), ck.cast("string")))
                  .when(ck % 4 == 0,
                        F.concat(F.lit("dup:"), ck.cast("string")))
                  .otherwise(F.concat(F.lit("cust:"), ck.cast("string"))))
    placed = orders.select(
        alias_subj.alias("subj"), F.lit("placed").alias("pred"),
        F.when(F.col("o_orderkey") % 13 == 0,
               F.concat(F.lit("cust:"), ck.cast("string")))
        .otherwise(F.concat(F.lit("order:"),
                            F.col("o_orderkey").cast("string")))
        .alias("obj"))
    contains = li.select(
        F.concat(F.lit("order:"), F.col("l_orderkey").cast("string"))
        .alias("subj"),
        F.lit("contains").alias("pred"),
        F.concat(F.lit("part:"), F.col("l_partkey").cast("string"))
        .alias("obj"))
    store = placed.unionByName(contains).distinct()
    custs = orders.select(ck.alias("k")).distinct()
    pairs = (custs.filter(F.col("k") % 4 == 0).select(
        F.concat(F.lit("dup:"), F.col("k").cast("string")).alias("a"),
        F.concat(F.lit("cust:"), F.col("k").cast("string")).alias("b"))
        .unionByName(custs.filter(F.col("k") % 8 == 0).select(
            F.concat(F.lit("dup2:"), F.col("k").cast("string")).alias("a"),
            F.concat(F.lit("dup:"), F.col("k").cast("string")).alias("b"))))
    return sameas_rewrite(store, pairs, rounds=4)


def q_noisyor_confidence(spark, sf_dir):
    """Noisy-OR evidence fusion (triples.noisyor_confidence, the
    Knowledge-Vault/NELL combination rule): per (user did event_type)
    triple, fuse one deterministic per-day extractor confidence
    (((user*37+day) %% 90)/100 + 0.05) into conf = 1 - prod(1-c_i),
    computed in log space as ONE map-side-combinable agg — the
    belief-RAISING complement to resolve_conflicts' belief-PICKING
    votes. No joins, no window, no Python."""
    from saber_spark.operators.funnel import _epoch_micros
    from saber_spark.operators.triples import noisyor_confidence
    day = F.floor(_epoch_micros("ts") / F.lit(86_400_000_000)).cast("long")
    ev = (_events(spark, sf_dir)
          .select(F.concat(F.lit("user:"), F.col("user_id").cast("string"))
                  .alias("subj"),
                  F.lit("did").alias("pred"),
                  F.col("event_type").alias("obj"),
                  F.col("user_id"), day.alias("day"))
          .distinct()
          .withColumn("conf",
                      ((F.col("user_id") * 37 + F.col("day")) % 90)
                      / F.lit(100.0) + F.lit(0.05)))
    return noisyor_confidence(ev)


def q_transitive_property(spark, sf_dir):
    """owl:TransitiveProperty materialization at INSTANCE scale:
    per-customer order chains (order_k -> next order by key) closed to
    every (earlier, later) precedes+ pair. Oracle: recursive CTE over
    the lead()-derived edges.

    Execution shape (r6, guide §8 "use what you know"): each
    customer's precedes chain is a TOTAL ORDER, so its transitive
    closure is exactly the set of (o_i, o_j) pairs with o_i < o_j
    inside the customer — ONE equi-self-join on o_custkey with a key
    inequality, replacing the generic log(depth) path-doubling fixpoint
    (6+ self-join+distinct+checkpoint rounds; 10.2s -> <1.5s at sf0.1).
    Distinctness is structural (o_orderkey is unique), and the pair set
    equals the chain closure by transitivity of < — verified hash-MATCH
    against the unchanged recursive-CTE oracle. The generic
    ontology.transitive_closure stays the engine for DAG-shaped
    hierarchies (type_closure/rdfs/subprop), where no such order
    exists."""
    orders = tpch.load(spark, sf_dir, "orders")
    left = orders.select(F.col("o_custkey").alias("ck"),
                         F.col("o_orderkey").alias("k1"))
    right = orders.select(F.col("o_custkey").alias("ck"),
                          F.col("o_orderkey").alias("k2"))
    return (left.join(right, "ck")
            .filter(F.col("k1") < F.col("k2"))
            .select(F.concat(F.lit("order:"), F.col("k1").cast("string"))
                    .alias("earlier"),
                    F.concat(F.lit("order:"), F.col("k2").cast("string"))
                    .alias("later")))


def q_allen_relations(spark, sf_dir):
    """Allen interval-algebra classification (triples.allen_relations,
    Allen CACM 1983, discrete adaptation): every same-(subj, pred)
    interval pair over the q_triple_history SCD-2 chain named with
    exactly one of the 13 relations — the temporal-reasoning layer
    above temporal_conflicts' boolean overlap. Same co-partitioned
    (subj, pred) self-join; the classification is a narrow codegen
    CASE. Oracle: the gaps-and-islands history + the identical
    mutually-exclusive CASE chain."""
    from saber_spark.operators.funnel import WEEK_US, _epoch_micros
    from saber_spark.operators.triples import (allen_relations,
                                               triple_history)
    obs = _events(spark, sf_dir).select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string"))
        .alias("subj"),
        F.lit("did").alias("pred"),
        F.col("event_type").alias("obj"),
        F.floor(_epoch_micros("ts") / F.lit(WEEK_US)).cast("long")
        .alias("snap"))
    return allen_relations(triple_history(obs))


def q_distmult_score(spark, sf_dir):
    """DistMult bilinear triple plausibility (kge.distmult_score, Yang
    et al. ICLR 2015): exact-integer trilinear score sum h_i*r_i*t_i
    over the 3-relation store — the multiplicative sibling of
    transe_score (same entity-resolution joins, same relation-vector
    literal folding into codegen, opposite ranking direction: HIGHEST
    score wins). Top-5 most plausible per relation."""
    from saber_spark.operators.kge import distmult_score
    return distmult_score(
        _schema_kg3(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        {"placed": 100, "contains": 101, "supplies": 102}, top_k=5)


_KG3_TAGS = {"cust": 1, "order": 2, "part": 3, "supp": 4}
_KG3_SHIFT = 1 << 40  # ids stay far below 2^40 at any published TPC-H SF


def _schema_kg3_ids(spark, sf_dir):
    """Numeric twin of _schema_kg3 for the heavy path/entailment
    queries: subj/obj are injectively tagged longs (namespace_tag *
    2^40 + key) instead of 'ns:key' strings, built with the same
    per-leg narrow distinct. Bijective with the string store by
    construction, so any path/join/agg over it computes the same
    result set; the ~50-byte uri strings are rebuilt AFTER the final
    aggregation (guide §2.3 "shuffle keys, not payloads": 34.9M
    midpoint-join rows shuffle as 16-byte long pairs)."""
    orders = tpch.load(spark, sf_dir, "orders")
    li = tpch.load(spark, sf_dir, "lineitem")
    t = _KG3_TAGS
    cust = F.lit(t["cust"] * _KG3_SHIFT) + F.col("o_custkey")
    placed = (
        orders.select(
            "o_custkey",
            F.when(F.col("o_orderkey") % 13 == 0, F.lit(-1))
            .otherwise(F.col("o_orderkey")).alias("_okey"))
        .distinct()
        .select(cust.cast("long").alias("subj"),
                F.lit("placed").alias("pred"),
                F.when(F.col("_okey") == -1, cust)
                .otherwise(F.lit(t["order"] * _KG3_SHIFT) + F.col("_okey"))
                .cast("long").alias("obj")))
    contains = (
        li.select("l_orderkey", "l_partkey").distinct()
        .select((F.lit(t["order"] * _KG3_SHIFT) + F.col("l_orderkey"))
                .cast("long").alias("subj"),
                F.lit("contains").alias("pred"),
                (F.lit(t["part"] * _KG3_SHIFT) + F.col("l_partkey"))
                .cast("long").alias("obj")))
    supplies = (
        li.select("l_suppkey", "l_partkey").distinct()
        .select((F.lit(t["supp"] * _KG3_SHIFT) + F.col("l_suppkey"))
                .cast("long").alias("subj"),
                F.lit("supplies").alias("pred"),
                (F.lit(t["part"] * _KG3_SHIFT) + F.col("l_partkey"))
                .cast("long").alias("obj")))
    return placed.unionByName(contains).unionByName(supplies)


def _kg3_id_to_uri(col):
    """Decode a tagged long back to the 'ns:key' uri string."""
    expr = None
    key = (col % _KG3_SHIFT).cast("string")
    for ns, tag in _KG3_TAGS.items():
        branch = F.concat(F.lit(ns + ":"), key)
        cond = (col >= tag * _KG3_SHIFT) & (col < (tag + 1) * _KG3_SHIFT)
        expr = F.when(cond, branch) if expr is None else \
            expr.when(cond, branch)
    return expr


def q_property_paths(spark, sf_dir):
    """SPARQL 1.1 property-path evaluation (triples.property_path, spec
    §9): the navigational path ((placed/contains)|supplies)/^supplies —
    every entity (customer via its orders' parts, or supplier directly)
    connected to a supplier through a shared part — exercising sequence
    (midpoint equi-joins), alternation (union) and inverse (endpoint
    swap) in one expression, then rolled up to (src, dst, n_paths) path
    counts (bag semantics per the spec's BGP translation). Each atomic
    leg is a predicate-constant pushed-down scan of the store.

    Execution shape (r6): the path runs over the tagged-long twin
    store (_schema_kg3_ids) and the uri strings are rebuilt only on
    the 10.8M aggregated result rows — the 34.9M-row midpoint join and
    the (src, dst) roll-up shuffle 16-byte key pairs instead of
    ~50-byte strings (guide §2.3); verified hash-MATCH vs the
    unchanged string oracle."""
    from saber_spark.operators.triples import property_path
    path = ("seq",
            ("alt", ("seq", "placed", "contains"), "supplies"),
            ("inv", "supplies"))
    return (property_path(_schema_kg3_ids(spark, sf_dir), path)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
            .select(_kg3_id_to_uri(F.col("src")).alias("src"),
                    _kg3_id_to_uri(F.col("dst")).alias("dst"),
                    "n_paths"))


def q_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking dedup (dedup.cdc_chunk_dedup, the
    LBFS/FastCDC boundary idea at token granularity): chunk boundaries
    fire where md5-hash(token) % 8 == 0, so shared runs re-align after
    any single-token edit — the shift-robust complement of the
    fixed-width shingle dedups. Cross-document duplicated chunks with
    doc/occurrence counts; one per-doc running-sum window + two hash
    aggs, no Python."""
    from saber_spark.operators.dedup import cdc_chunk_dedup
    return cdc_chunk_dedup(_docs(spark, sf_dir), divisor=8, min_docs=2)


def q_label_noise(spark, sf_dir):
    """Confident-learning label-noise audit (classify.label_noise,
    Northcutt JAIR 2021): the confident-joint matrix over the labeled
    embedding table with leave-fold-out centroid scores computed by
    subtraction (K-fold out-of-sample for two aggregations) and
    exact-integer threshold tests (si * n_c >= ssum_c) so no float-sum
    ordering can flip a cell on any engine. Off-diagonal mass =
    estimated mislabeled examples per (given, guessed) class pair."""
    from saber_spark.operators.classify import label_noise
    return (label_noise(_embeddings(spark, sf_dir), folds=5)
            .select(F.col("true_label").cast("long").alias("true_label"),
                    F.col("guessed_label").cast("long")
                    .alias("guessed_label"),
                    "n_vecs"))


def q_dp_release(spark, sf_dir):
    """Differentially-private grouped-count release
    (profile.dp_release_counts, Korolova WWW'09 thresholding shape):
    per-(source, lang) doc counts + seeded inverse-CDF Laplace(1/0.5)
    noise, suppressing groups whose noisy count misses the threshold —
    the release rule for publishing corpus statistics over
    user-contributed keys. Noise derives from the md5-portable hash so
    the release replays bit-identically (production swaps one
    expression for a secure RNG draw)."""
    from saber_spark.operators.profile import dp_release_counts
    docs = _docs(spark, sf_dir).withColumn(
        "grp", F.concat_ws("|", "source", "lang"))
    return dp_release_counts(docs, "grp", epsilon=0.5, threshold=5.0)


def q_complex_score(spark, sf_dir):
    """ComplEx triple plausibility (kge.complex_score, Trouillon et al.
    ICML 2016): exact-integer Re(<h, r, conj(t)>) over the 3-relation
    store with embeddings read as complex vectors (first half Re,
    second half Im) — the ANTISYMMETRY-capable member of the
    transe/distmult scoring family (it can rank a directed fact above
    its reversal, which the DistMult diagonal cannot). Same two
    entity-resolution equi-joins, relation halves folded into codegen
    literals, top-5 HIGHEST per relation."""
    from saber_spark.operators.kge import complex_score
    return complex_score(
        _schema_kg3(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        {"placed": 100, "contains": 101, "supplies": 102}, top_k=5)


def q_harmonic_hosts(spark, sf_dir):
    """Landmark-sampled harmonic centrality of the host link graph
    (graph.harmonic_centrality, Boldi-Vigna 2014 axioms; Eppstein-Wang
    landmark estimation): est_harmonic(v) = avg over 3 hub landmarks of
    1/d(l, v) — the unreachable-robust centrality for crawl host graphs
    that are nowhere near strongly connected (1/inf = 0 instead of
    closeness' poisoned mean). ONE multi-source BFS carrying
    (landmark, node) state, frontier-proportional shuffles. Oracle:
    recursive CTE shortest-hop distances over the same edge fixture."""
    from saber_spark.operators.graph import harmonic_centrality
    landmarks = spark.createDataFrame(
        [("src0.example.org",), ("src1.example.org",),
         ("src2.example.org",)], "node string")
    return harmonic_centrality(_host_edges(spark, sf_dir), landmarks,
                               max_depth=4)


def q_rake_keywords(spark, sf_dir):
    """RAKE keyphrase extraction (textstats.rake_keywords, Rose et al.
    2010): stopword/punctuation-delimited candidate phrases scored by
    sum of member-word deg/freq — the graph-free one-pass keyphrase
    signal next to textrank_keywords' iterative PageRank (RAKE triages
    at full corpus scale; textrank refines where it matters). Candidate
    construction is a narrow map; all shuffles key on doc_id. Top-3
    phrases per document."""
    from saber_spark.operators.textstats import rake_keywords
    return rake_keywords(_docs(spark, sf_dir), max_words=4, top_k=3)


def q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity release audit
    (profile.k_anonymity_audit, Sweeney 2002; Machanavajjhala 2006):
    equivalence classes over the (nation, acctbal-bucket) quasi-
    identifier with mktsegment as the sensitive attribute — the
    privacy gate a pipeline runs before publishing per-group corpus
    statistics, auditing what dp_release_counts would instead noise.
    One class-building agg + one summary agg; returns the ONE verdict
    row."""
    from saber_spark.operators.profile import k_anonymity_audit
    cust = tpch.load(spark, sf_dir, "customer").withColumn(
        "acct_bucket", F.floor(F.col("c_acctbal") / 1000).cast("long"))
    return k_anonymity_audit(
        cust, ["c_nationkey", "acct_bucket"], "c_mktsegment", k=5, ell=2)


def q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram smoothing (lm.kneser_ney_bigrams,
    Kneser-Ney 1995 / Chen-Goodman 1998) — the KenLM model class behind
    CCNet's perplexity filter, completing the smoothing ladder above
    lm_perplexity's add-k and lm_backoff's stupid backoff: continuation
    counts N1+(*, w2) weight words by context diversity, not frequency.
    ONE corpus-scale pair agg; every other statistic reduces from it.
    Top-20 bigrams by count with their full count/continuation
    breakdown."""
    from saber_spark.operators.lm import kneser_ney_bigrams
    return kneser_ney_bigrams(_docs(spark, sf_dir), INFIX_PATTERN,
                              discount=0.75, top_k=20)


def q_ifp_sameas(spark, sf_dir):
    """OWL-RL prp-ifp sameAs inference (ontology.ifp_sameas): subjects
    sharing a value of an inverse-functional key predicate (phone /
    vat here; email / DOI / ORCID in the wild) are the same entity —
    the precision-end identity producer feeding sameas_rewrite, next
    to kg_align's fact-overlap recall end. Fixture: customers carry a
    'phone' and a 'vat' key; every 4th customer collides on k % 300
    (two witnesses per inferred pair), every 16th lands on the
    'ph:hub' PLACEHOLDER value whose fan-out exceeds max_fan=64 at
    sf >= 0.01 and is excluded by the skew guard — the guard is
    semantics (a placeholder is not identity evidence), not just
    safety. Oracle: identical fan-filtered self-join."""
    from saber_spark.operators.ontology import ifp_sameas
    cust = tpch.load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    subj = F.concat(F.lit("cust:"), k.cast("string"))
    phone_obj = (F.when(k % 16 == 0, F.lit("ph:hub"))
                 .when(k % 4 == 0, F.concat(F.lit("ph:"),
                                            (k % 300).cast("string")))
                 .otherwise(F.concat(F.lit("ph:u"), k.cast("string"))))
    vat_obj = (F.when((k % 4 == 0) & (k % 16 != 0),
                      F.concat(F.lit("vat:"), (k % 300).cast("string")))
               .otherwise(F.concat(F.lit("vat:u"), k.cast("string"))))
    triples = (cust.select(subj.alias("subj"),
                           F.lit("phone").alias("pred"),
                           phone_obj.alias("obj"))
               .unionByName(cust.select(subj.alias("subj"),
                                        F.lit("vat").alias("pred"),
                                        vat_obj.alias("obj"))))
    return ifp_sameas(triples, ["phone", "vat"], max_fan=64)


def q_disjoint_audit(spark, sf_dir):
    """OWL-RL cax-dw disjoint-class violation audit
    (ontology.disjoint_audit): entities asserted into two classes
    declared owl:disjointWith — the class-level consistency gate next
    to domain_range_audit (property-level) and shacl_validate
    (shapes); on a construction KG this catches linker collisions
    before fusion. Fixture: Customer/Supplier type assertions whose id
    spaces deliberately collide (custkey % 3000 vs suppkey * 10), plus
    Delinquent (negative balance); axioms declare Customer|Supplier
    and Supplier|Delinquent disjoint — Customer+Delinquent co-typing
    is NOT audited (axiom filtering is load-bearing). One entity-keyed
    self-join bounded by types-per-entity, broadcast axiom list."""
    from saber_spark.operators.ontology import disjoint_audit
    cust = tpch.load(spark, sf_dir, "customer")
    supp = tpch.load(spark, sf_dir, "supplier")
    ent_c = F.concat(F.lit("ent:"),
                     (F.col("c_custkey") % 3000).cast("string"))
    types = (cust.select(ent_c.alias("entity"),
                         F.lit("Customer").alias("type"))
             .unionByName(supp.select(
                 F.concat(F.lit("ent:"),
                          (F.col("s_suppkey") * 10).cast("string"))
                 .alias("entity"), F.lit("Supplier").alias("type")))
             .unionByName(cust.filter(F.col("c_acctbal") < 0)
                          .select(ent_c.alias("entity"),
                                  F.lit("Delinquent").alias("type"))))
    return disjoint_audit(types, [("Customer", "Supplier"),
                                  ("Delinquent", "Supplier")])


def q_eval_semeval(spark, sf_dir):
    """MUC-5 / SemEval-2013 four-mode chunk evaluation
    (evaluation.evaluate_chunks_semeval): strict / exact / partial /
    type rows with COR/INC/PAR/MIS/SPU counts and half-credit P/R/F1 —
    the overlap-credit ladder above eval_prf's exact/left/right
    boundary criteria (reference: saber/metrics.py:158-166), on the
    same gold-vs-perturbed-model BIO chunk fixture (the perturbation
    splits I- continuations, so partial overlaps genuinely occur).
    ONE overlap join co-partitioned on seq_id; the four mode rows
    inline() out of a single assembled count row."""
    events = _events(spark, sf_dir)
    from saber_spark.operators.evaluation import evaluate_chunks_semeval
    gold = chunk_bio_sql(_event_tags(events, TAG_CASE))
    pred = chunk_bio_sql(_event_tags(events, PRED_TAG_CASE))
    return evaluate_chunks_semeval(gold, pred, extra_keys=["seq_id"])


def q_folded_blocks(spark, sf_dir):
    """Accent-folded ER blocking (canonicalize.folded_blocks /
    ascii_fold): ICU/Lucene-style ASCII folding as a pure aligned
    translate() — the normalization every production linkage stack
    (Splink, dedupe, JedAI) applies before exact/phonetic/sorted-
    neighborhood blocking. Fixture: part-name first words decorated
    into three deterministic spelling variants (plain, grave/circumflex
    accents, acute accents + uppercase); the fold must reunite them —
    n_variants counts the RAW spellings each block recovered. Oracle:
    the identical aligned fold map interpolated from the single source
    of truth (FOLD_SRC/FOLD_DST)."""
    from saber_spark.operators.canonicalize import folded_blocks
    part = tpch.load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    fw = F.split(F.col("p_name"), " ")[0]
    raw = (F.when(k % 3 == 1, F.translate(fw, "aeiou", "àéîöû"))
           .when(k % 3 == 2, F.upper(F.translate(fw, "aeiou", "áèïôü")))
           .otherwise(fw))
    return folded_blocks(part.select(raw.alias("name")))


def q_kwic_snippets(spark, sf_dir):
    """Keyword-in-context concordance (retrieval.kwic_snippets, Luhn
    1960): the ±3-token context around the first 3 occurrences of
    'batch' per document — the result-snippet surface next to
    bm25_search's ranks and phrase_search's positions. Entirely narrow
    (index-aware transform + array slices inside the row): one scan,
    ZERO shuffles, zero Python at any corpus size."""
    from saber_spark.operators.retrieval import kwic_snippets
    return kwic_snippets(_docs(spark, sf_dir), "batch",
                         window=3, max_per_doc=3)


def q_js_divergence(spark, sf_dir):
    """Unigram Jensen-Shannon divergence between the English and German
    corpus slices (vocab.unigram_js_divergence, Lin 1991): the bounded
    symmetric whole-slice drift statistic a pipeline runs between crawl
    snapshots or before/after a filter change — DSIR's per-document
    importance weighting collapsed to one corpus-level number. One
    corpus-sized token agg holding both slices as conditional sums;
    totals broadcast back; contribution sum reduced-side."""
    from saber_spark.operators.vocab import unigram_js_divergence
    toks = _docs(spark, sf_dir).select(
        "lang", F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(INFIX_PATTERN), F.lit(0))).alias("token"))
    return unigram_js_divergence(toks, "lang", "en", "de")


def q_chao1_vocab(spark, sf_dir):
    """Chao1 vocabulary-richness estimate (profile.chao1_richness, Chao
    1984 bias-corrected; Trushkowsky ICDE 2013 for KB completeness):
    from the token-frequency histogram's singletons/doubletons,
    estimate how many vocabulary types the NEXT crawl would add — the
    type-count complement of good_turing's unseen probability MASS.
    One corpus-sized freq agg, histogram-sized everything after, one
    output row."""
    from saber_spark.operators.profile import chao1_richness
    return chao1_richness(tokenize_docs(_docs(spark, sf_dir)), "token")


def q_capture_recapture(spark, sf_dir):
    """Lincoln-Petersen/Chapman capture-recapture recall estimation
    (evaluation.capture_recapture, Razniewski CIKM 2016 for KB recall):
    two independently hash-thinned extractor runs over the dictionary
    mention universe (A keeps md5('a:'...)%5 < 4 ≈ 80%, B keeps
    md5('b:'...)%5 < 3 ≈ 60% — different salts, so the thinning
    processes are independent by construction) estimate the full
    mention universe and each run's absolute recall WITHOUT gold
    annotation. Chapman-corrected; the pytest asserts N-hat recovers
    the true universe size on this exact construction."""
    from saber_spark.operators.evaluation import capture_recapture
    base = _linked_spark(spark, sf_dir).select("doc_id", "pos")
    key = F.concat_ws(":", F.col("doc_id").cast("string"),
                      F.col("pos").cast("string"))
    h = lambda salt: (F.conv(F.substring(  # noqa: E731
        F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10)
        .cast("long") % 5)
    a = base.filter(h("a:") < 4)
    b = base.filter(h("b:") < 3)
    return capture_recapture(a, b, ["doc_id", "pos"])


def q_collocations(spark, sf_dir):
    """Dunning log-likelihood bigram collocations (vocab.
    loglik_collocations, Dunning CL 1993): G^2 significance of adjacent
    alphabetic token pairs against the independence margins — the
    phrase-mining primitive next to pmi_weights' document-level entity
    PMI (G^2 stays calibrated at the low counts where PMI explodes).
    Row-set output (c12 >= 5), no top-k tie-break risk. One window
    shuffle to form bigrams; three hash aggs; marginals joined back by
    key; N broadcast."""
    from saber_spark.operators.vocab import loglik_collocations
    return loglik_collocations(tokenize_docs(_docs(spark, sf_dir)),
                               min_count=5)


def q_logodds_keyness(spark, sf_dir):
    """Monroe "Fightin' Words" keyness (vocab.logodds_keyness, Monroe
    et al. Political Analysis 2008): per-token log-odds between the
    English and German slices under an informative Dirichlet prior
    drawn from the pooled corpus, with z-scores — ranks WHICH tokens
    drive the drift that js_divergence measures in one number. Same
    scale shape as js_divergence: one corpus-sized conditional-sum agg,
    1-row totals broadcast, narrow vocabulary-table map."""
    from saber_spark.operators.vocab import logodds_keyness
    toks = _docs(spark, sf_dir).select(
        "lang", F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(INFIX_PATTERN), F.lit(0))).alias("token"))
    return logodds_keyness(toks, "lang", "en", "de",
                           alpha0=100.0, min_total=20)


def q_rbo_hosts(spark, sf_dir):
    """Rank-biased overlap between two host priority rankings
    (retrieval.rbo_overlap, Webber/Moffat/Zobel TOIS 2010): hosts
    ranked by document count vs by total extracted chars — the
    "did the crawl-frontier ordering change?" statistic for truncated,
    possibly-disjoint top-10 lists where Kendall tau is undefined.
    Both rankings are deterministic (metric DESC, host ASC
    row_number); everything past the host agg runs on <= depth rows."""
    from saber_spark.operators.retrieval import rbo_overlap
    from saber_spark.operators.webstats import host_stats
    stats = host_stats(_synth_pages_url(_docs(spark, sf_dir)))
    wa = Window.orderBy(F.col("n_docs").desc(), F.col("host").asc())
    wb = Window.orderBy(F.col("total_chars").desc(), F.col("host").asc())
    ra = stats.select("host",
                      F.row_number().over(wa).cast("long").alias("rank"))
    rb = stats.select("host",
                      F.row_number().over(wb).cast("long").alias("rank"))
    return rbo_overlap(ra, rb, ["host"], depth=10, p=0.9)


def q_benford_prices(spark, sf_dir):
    """Benford first-digit forensics over order totals
    (profile.benford_audit, Benford 1938 / Nigrini's audit standard):
    the numeric-fact quality audit — a source whose extracted
    magnitudes break the log10(1+1/d) law is templated, fabricated, or
    unit-mangled and gets quarantined before fusion. ONE 9-key hash
    agg; law join is a 9-row broadcast."""
    from saber_spark.operators.profile import benford_audit
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return benford_audit(orders, "o_totalprice")


def q_lexical_richness(spark, sf_dir):
    """Yule's K / TTR / hapax panel (profile.lexical_richness, Yule
    1944): the repetitiveness complement of chao1_vocab (unseen types)
    and good_turing (unseen mass) from the SAME type-frequency
    histogram — the template/boilerplate corpus signal. One corpus
    agg, histogram-sized tail, one output row."""
    from saber_spark.operators.profile import lexical_richness
    return lexical_richness(tokenize_docs(_docs(spark, sf_dir)), "token")


def q_wilson_sources(spark, sf_dir):
    """Wilson lower-bound source ranking (evaluation.
    wilson_lower_bound, Wilson JASA 1927): rank sources by the 95%
    lower confidence bound of their clean-document proportion
    (n_chars >= 300) — the shrinkage-honest leaderboard where 3/3
    cannot outrank 970/1000 (raw p-hat would). One group agg;
    rank window on |sources| rows."""
    from saber_spark.operators.evaluation import wilson_lower_bound
    return wilson_lower_bound(_docs(spark, sf_dir), "source",
                              F.col("n_chars") >= 300)


def q_acf_events(spark, sf_dir):
    """Sample autocorrelation of the hourly event-count series
    (timeseries.autocorrelation, Box & Jenkins 1970): r_1..r_24 over
    the DENSIFIED hourly series — the seasonality/burst diagnostic for
    a crawl scheduler (daily cycle = peak at lag 24). The bucket agg
    is the only stream-sized exchange; the series, spine, lag joins,
    and final agg are all time-bounded (~720 rows at sf0.01)."""
    from saber_spark.operators.timeseries import autocorrelation
    return autocorrelation(_events(spark, sf_dir), max_lag=24)


def q_term_dispersion(spark, sf_dir):
    """Gries' Deviation of Proportions across sources
    (vocab.term_dispersion, Gries IJCL 2008): the burstiness /
    boilerplate flag keyness can't give — a template string
    concentrates in the part that carries it, a content word tracks
    part sizes. Computed over OBSERVED (token, source) pairs only via
    the sum-to-one rearrangement; never the zero-filled cross
    product."""
    from saber_spark.operators.vocab import term_dispersion
    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(INFIX_PATTERN), F.lit(0))).alias("token"))
    return term_dispersion(toks, "source", min_count=50)


def q_map_eval(spark, sf_dir):
    """MAP / precision@10 (retrieval.map_eval, TREC conventions): the
    binary-relevance twin of ndcg_eval over the same three term
    queries and the same deliberately-simple tf ranker — AP@10 with
    the min(R, k) normalizer and P@10 side by side. Same single-scan,
    one-window-exchange plan; the cumulative-relevant running sum
    rides the sys-rank window for free."""
    from saber_spark.operators.retrieval import map_eval
    return map_eval(_docs(spark, sf_dir),
                    [("join", "merge"), ("stream", "window"),
                     ("filter", "scan")], k=10)


def q_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth OLS (vocab.heaps_fit, Heaps 1978):
    V(n) ~ K n^beta over 10 deterministic corpus prefixes — the
    capacity question next to zipf_fit's concentration and
    chao1_vocab's one-point unseen-type estimate: what a 10x crawl
    does to vocab-shard sizing. Global token indices come from a
    |docs|-row cumulative offset, never a window over raw tokens."""
    from saber_spark.operators.vocab import heaps_fit
    return heaps_fit(tokenize_docs(_docs(spark, sf_dir)))


def q_burrows_delta(spark, sf_dir):
    """Burrows' Delta host stylometry (textstats.burrows_delta,
    Burrows LLC 2002; Argamon 2008): mean |z| of each source's
    relative frequencies of the corpus' 30 most frequent tokens,
    standardized across sources — the style-fingerprint that flags
    spam farms / MT mirrors on function words where keyness sees
    only topic. The (source x 30) grid is explicit (zeros included);
    sd = 0 tokens contribute z = 0."""
    from saber_spark.operators.textstats import burrows_delta
    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.regexp_extract_all(
            F.col("text"), F.lit(INFIX_PATTERN), F.lit(0))).alias("token"))
    return burrows_delta(toks, "source", top_m=30)


def q_assoc_rules(spark, sf_dir):
    """Pairwise association rules with lift (sessions.assoc_rules,
    Agrawal/Srikant Apriori level 2): per-user event-type ITEM SETS
    (set semantics, vs event_transitions' adjacent ordered bigrams)
    -> support / both confidences / lift per unordered pair. One
    distinct agg, one co-partitioned self-join on user, broadcast
    marginals."""
    from saber_spark.operators.sessions import assoc_rules
    return assoc_rules(_events(spark, sf_dir), min_support=5)


def q_mannwhitney_chars(spark, sf_dir):
    """Mann-Whitney U rank-sum drift test (groupstats.mann_whitney_u,
    Mann & Whitney 1947, full tie correction): did document length
    SHIFT between the English and German slices — the nonparametric
    location test for heavy-tailed metrics where mean comparisons
    mislead. Ranks per DISTINCT value from the value histogram; the
    window never touches row-level data."""
    from saber_spark.operators.groupstats import mann_whitney_u
    return mann_whitney_u(_docs(spark, sf_dir), "lang", "en", "de",
                          "n_chars")


def q_ks_chars(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov D (groupstats.ks_two_sample,
    Smirnov 1939): max CDF gap in doc length between slices — catches
    SHAPE drift (variance, bimodality) the rank-sum test misses. The
    max is decided on exact integer numerators over the common
    n_a*n_b denominator; one division at the end."""
    from saber_spark.operators.groupstats import ks_two_sample
    return ks_two_sample(_docs(spark, sf_dir), "lang", "en", "de",
                         "n_chars")


def q_spearman_chars(spark, sf_dir):
    """Spearman rank correlation (groupstats.spearman_rho, tie-averaged
    ranks): monotone association between document char length and
    token count — the outlier-robust sanity check that the tokenizer
    tracks document size. Per-column ranks from value histograms
    joined back by value; Pearson on ranks in one agg."""
    from saber_spark.operators.groupstats import spearman_rho
    toks_per_doc = (tokenize_docs(_docs(spark, sf_dir))
                    .groupBy("doc_id")
                    .agg(F.count(F.lit(1)).alias("n_toks")))
    d = (_docs(spark, sf_dir).select("doc_id", "n_chars")
         .join(toks_per_doc, "doc_id"))
    return spearman_rho(d, "n_chars", "n_toks")


def q_kendall_hosts(spark, sf_dir):
    """Kendall tau-b between host doc-count and host total-chars
    (groupstats.kendall_tau, Kendall 1938/1945): pair-level rank
    agreement with tie corrections over the REDUCED host table —
    deliberately O(hosts^2) (190 pairs at 20 hosts) where
    spearman_chars covers the corpus-sized case and rbo_hosts the
    top-weighted prefix view."""
    from saber_spark.operators.groupstats import kendall_tau
    from saber_spark.operators.webstats import host_stats
    stats = host_stats(_synth_pages_url(_docs(spark, sf_dir)))
    return kendall_tau(stats, "n_docs", "total_chars")


def q_chisq_lang_source(spark, sf_dir):
    """Chi-square independence + Cramér's V for lang x source
    (profile.chisq_independence, Pearson 1900 / Cramér 1946): the
    categorical-association audit that catches stratification bugs
    and leaky splits — benford_prices tests a column against a LAW,
    this tests two columns against each other. Zero cells enter
    through the sum o^2/e - n identity without materialization."""
    from saber_spark.operators.profile import chisq_independence
    return chisq_independence(_docs(spark, sf_dir), "lang", "source")


def q_entropy_rate(spark, sf_dir):
    """Shannon unigram entropy and bigram entropy rate of the corpus
    (lm.entropy_rate, Shannon 1951): H1, H2 = H(W2|W1) and their
    perplexities — H1 - H2 is the predictive value of one token of
    context; boilerplate collapses H2, noise pushes it to H1. ML
    estimates on the corpus itself (no split/smoothing — the
    corpus-property complement of lm_cross_entropy's held-out model
    score)."""
    from saber_spark.operators.lm import entropy_rate
    return entropy_rate(_docs(spark, sf_dir), INFIX_PATTERN)


def q_stem_collapse(spark, sf_dir):
    """Harman S-stemmer conflation audit (vocab.s_stem/stem_collapse,
    Harman JASIS 1991): every stem class merging >= 2 surface types
    with its token mass — what plural conflation buys the
    index/vocab, and the overstemming review surface. Pure codegen
    stemming (three suffix rules, first match wins), two map-side
    combining aggs."""
    from saber_spark.operators.vocab import stem_collapse
    toks = tokenize_docs(_docs(spark, sf_dir)).select("doc_id", "token")
    # deterministic plural fixture (the _synth_pages_url convention —
    # the corpus word list carries no plurals): docs with doc_id % 3
    # == 0 also emit the regular English plural of each token
    plural = (toks.filter(F.col("doc_id") % 3 == 0)
              .select("doc_id", F.when(
                  F.col("token").endswith("y"),
                  F.concat(F.substring(F.col("token"), 1,
                                       F.length("token") - 1),
                           F.lit("ies")))
                  .when(F.col("token").endswith("s"),
                        F.concat(F.col("token"), F.lit("es")))
                  .otherwise(F.concat(F.col("token"), F.lit("s")))
                  .alias("token")))
    return stem_collapse(toks.unionByName(plural))


def q_control_chart(spark, sf_dir):
    """Shewhart I-MR control chart on hourly event counts
    (timeseries.control_chart, Shewhart 1931; 2.66 = 3/d2): WHICH
    hours are statistically out of control — the alert view next to
    cusum_changepoints' sustained-shift detection and acf_events'
    cyclicity. Densified series (an empty hour can BE the violation);
    violations-only output."""
    from saber_spark.operators.timeseries import control_chart
    return control_chart(_events(spark, sf_dir))


def q_mojibake_audit(spark, sf_dir):
    """Encoding-damage audit (textstats.mojibake_audit, ftfy
    heuristics, Speer 2019): occurrences of the classic double-decode
    artifacts (UTF-8-as-Latin-1, BOM-as-text, U+FFFD) — the crawl-QA
    gate before damaged bytes pollute shingles and KG surfaces. One
    row per marker ALWAYS (zeros are the healthy record); detection
    behavior is pytest-proven on synthesized damage."""
    from saber_spark.operators.textstats import mojibake_audit
    return mojibake_audit(_docs(spark, sf_dir))


def q_seq_patterns(spark, sf_dir):
    """Length-2 sequential patterns with gaps (sessions.seq_patterns,
    PrefixSpan support, Pei ICDE 2001): users for whom type a occurs
    strictly before type b — the ordered-with-gaps third view next to
    event_transitions (adjacent) and assoc_rules (unordered). Reduces
    to first_a < last_b on the (user, type) table: no pairwise event
    join ever happens."""
    from saber_spark.operators.sessions import seq_patterns
    return seq_patterns(_events(spark, sf_dir), min_support=5)


def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier user-lifetime survival with right-censoring
    (sessions.kaplan_meier, Kaplan & Meier JASA 1958): the churn curve
    cohort_retention can't give honestly — users active near the
    observation boundary are censored, not churned. Cumulative
    product via exp-sum-ln with an exact-zero guard; all windows run
    on the |distinct lifetimes|-row table."""
    from saber_spark.operators.sessions import kaplan_meier
    return kaplan_meier(_events(spark, sf_dir), censor_guard_hours=12)


def q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the behavioral Markov chain
    (sessions.markov_stationary, Markov 1906; power iteration — the
    PageRank fixpoint on event_transitions' matrix): long-run
    steady-state by 10 synchronous updates on the |alphabet|^2
    matrix; the transition agg is the only event-sized exchange."""
    from saber_spark.operators.sessions import markov_stationary
    return markov_stationary(_events(spark, sf_dir), iterations=10)


def q_robust_means(spark, sf_dir):
    """Tukey trimmed + winsorized means of doc length per source
    (groupstats.robust_location, Tukey 1962): the robust location
    summary where a handful of pathological docs drag the plain mean
    — mad_outliers flags them, this reports location with them
    neutralized. Per-group rank window (the honest cost of exact
    order statistics), one agg."""
    from saber_spark.operators.groupstats import robust_location
    return robust_location(_docs(spark, sf_dir), "source", "n_chars",
                           trim_frac=0.1)


def q_effect_size_chars(spark, sf_dir):
    """Cohen's d / Hedges' g for doc length, en vs de
    (groupstats.effect_size, Cohen 1969 / Hedges 1981): the effect
    size the drift TESTS deliberately don't give — at 10^12 docs
    everything is significant; this says by how many pooled standard
    deviations. One conditional-sum agg, one row."""
    from saber_spark.operators.groupstats import effect_size
    return effect_size(_docs(spark, sf_dir), "lang", "en", "de",
                       "n_chars")


def q_theil_sen_trend(spark, sf_dir):
    """Theil-Sen robust trend of daily event counts
    (timeseries.theil_sen, Theil 1950 / Sen 1968): median pairwise
    slope + median-residual intercept, computed with EXACT rank
    medians (no engine-interpolated percentiles) — the crawl-rate
    trend one burst day cannot hijack. Time-bounded pair table."""
    from saber_spark.operators.timeseries import theil_sen
    return theil_sen(_events(spark, sf_dir))


def q_ccf_events(spark, sf_dir):
    """Cross-correlation lead-lag between click and purchase hourly
    series (timeseries.cross_correlation, Box & Jenkins ch. 11):
    r_xy(k) for k = -12..12 — does type_a lead type_b and by how many
    buckets; the causal-ordering hint acf_events can't give. ONE
    conditional-count bucket agg holds both series; the tail is
    time-bounded."""
    from saber_spark.operators.timeseries import cross_correlation
    return cross_correlation(_events(spark, sf_dir), "click",
                             "purchase", max_lag=12)


def q_burstiness(spark, sf_dir):
    """Burstiness panel (timeseries.burstiness_panel, Fano 1947 +
    Goh & Barabási EPL 2008): Fano factor of hourly counts and the
    (cv-1)/(cv+1) burstiness of per-USER inter-arrival gaps — the
    "are arrivals Poisson?" check that decides whether the control
    chart's assumptions hold. Gaps are per-user lag windows,
    co-partitioned; a global gap series is deliberately not
    offered."""
    from saber_spark.operators.timeseries import burstiness_panel
    return burstiness_panel(_events(spark, sf_dir))


def q_cocitation_cosine(spark, sf_dir):
    """Cosine-normalized co-citation strength
    (graph.cocitation_cosine, Small JASIS 1973 + Salton
    normalization): the degree-normalized view next to
    cocitation_hosts' raw shared-neighbor counts — "specifically
    related" vs "both popular". Bibliographic coupling (Kessler 1963)
    is the same operator on reversed edges (test-proven). Self-join
    co-partitioned on the citing side; canonical a < b order."""
    from saber_spark.operators.graph import cocitation_cosine
    return cocitation_cosine(_host_edges(spark, sf_dir), min_common=2)


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone-trend test on daily event counts
    (timeseries.mann_kendall, Mann 1945 / Kendall 1975, tie-corrected
    variance, continuity-corrected z): the significance companion
    theil_sen_trend is always paired with — is the drift
    distinguishable from noise. Time-bounded pair comparisons."""
    from saber_spark.operators.timeseries import mann_kendall
    return mann_kendall(_events(spark, sf_dir))


def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the above/below-median hourly
    series (timeseries.runs_test, 1940): regime clumping vs
    oscillation — the randomness axis orthogonal to trend
    (mann_kendall) and periodicity (acf_events). Exact rank median;
    equal-to-median buckets excluded per the standard convention."""
    from saber_spark.operators.timeseries import runs_test
    return runs_test(_events(spark, sf_dir))


def q_seasonal_profile(spark, sf_dir):
    """Hour-of-day seasonal profile (timeseries.seasonal_profile):
    the explicit cyclic shape acf_events only detects — mean count
    and share per phase, the table a crawl scheduler reads to place
    load and the divisor for seasonal adjustment. 24 rows, densified,
    tz-free phase."""
    from saber_spark.operators.timeseries import seasonal_profile
    return seasonal_profile(_events(spark, sf_dir))


def q_ppmi_similarity(spark, sf_dir):
    """Count-based distributional similarity (vocab.ppmi_similarity,
    Church & Hanks 1990; Levy & Goldberg 2014): PPMI context vectors
    (+-2 window) scored by cosine — embedding-free synonym candidates
    for linking/expansion, consuming the same statistics
    skipgram_pairs materializes for training. Context pairs from
    lead/lag columns on ONE window (never a positional self-join);
    similarity join co-partitioned on the context key."""
    from saber_spark.operators.vocab import ppmi_similarity
    return ppmi_similarity(tokenize_docs(_docs(spark, sf_dir)),
                           window=2, min_pair=3, min_shared=3)


def q_og_meta(spark, sf_dir):
    """Open Graph metadata harvest (structured.og_meta, ogp.me): the
    fourth harvester next to microdata/RDFa/JSON-LD — og:* meta tags
    in BOTH attribute orders, entity-decoded. Fixture carries
    property-first title (with &amp; escape) + locale and a
    content-first type tag, so both regexp passes and the decode are
    exercised. Narrow zipped extraction, one explode, no joins."""
    from saber_spark.operators.structured import og_meta
    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit('<html><head><meta property="og:title" content="Doc '),
        F.col("doc_id").cast("string"),
        F.lit(' &amp; more" /><meta content="article" '
              'property="og:type" /><meta property="og:locale" '
              'content="'), F.col("lang"),
        F.lit('" /></head></html>'))
    pages = docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        html.alias("html"))
    return og_meta(pages)


def q_rel_canonical(spark, sf_dir):
    """rel=canonical harvest (webstats.rel_canonical, RFC 6596): the
    explicit webmaster dedup signal — markup-layer canonicalization
    edges next to resolve_redirects' HTTP layer. Fixture: every 5th
    doc is its group's canonical leader, the rest point at it, so
    self/non-self declarations both appear. One narrow regexp per
    row."""
    from saber_spark.operators.webstats import rel_canonical
    docs = _docs(spark, sf_dir)
    leader = (F.col("doc_id") - F.col("doc_id") % 5).cast("string")
    html = F.concat(
        F.lit('<html><head><link rel="canonical" '
              'href="https://example.org/doc/'), leader,
        F.lit('" /></head></html>'))
    pages = docs.select(
        F.concat(F.lit("https://example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        html.alias("html"))
    return rel_canonical(pages)


def q_ht_estimate(spark, sf_dir):
    """Horvitz-Thompson total estimation from an unequal-probability
    sample (samples.horvitz_thompson, Horvitz & Thompson JASA 1952):
    estimate total corpus chars from a hash-thinned stratified sample
    (en at 50%, de at 30%, other langs fully sampled) with KNOWN
    inclusion probabilities — "measure the corpus from the sample",
    with the true total and relative error reported in the SAME pass
    so calibration is itself checked."""
    from saber_spark.operators.samples import horvitz_thompson
    return horvitz_thompson(_docs(spark, sf_dir), "doc_id", "n_chars",
                            {"en": 0.5, "de": 0.3}, "lang")


def q_neyman_alloc(spark, sf_dir):
    """Neyman optimal sampling allocation across sources
    (samples.neyman_allocation, Neyman JRSS 1934): the
    variance-minimizing n_h proportional to N_h * S_h, reported next
    to proportional allocation — the design table a labeling/eval
    pipeline computes BEFORE drawing its sample. One stratum agg,
    |strata|-row arithmetic."""
    from saber_spark.operators.samples import neyman_allocation
    return neyman_allocation(_docs(spark, sf_dir), "source", "n_chars",
                             budget=1000)


def q_jackknife_se(spark, sf_dir):
    """Delete-one-source jackknife standard error of mean doc length
    (samples.jackknife_mean, Quenouille 1956/Tukey 1958, grouped
    form): the deterministic, RNG-free resampling error bar that
    respects cluster correlation — reported against the naive
    sd/sqrt(n) that understates it on clustered web data. Every
    leave-one-out mean comes from the group table + grand totals;
    never a second data pass."""
    from saber_spark.operators.samples import jackknife_mean
    return jackknife_mean(_docs(spark, sf_dir), "source", "n_chars")


def q_qld_search(spark, sf_dir):
    """Dirichlet query-likelihood retrieval (retrieval.qld_topk, Ponte
    & Croft 1998; Zhai & Lafferty 2001, mu=2000): the LM scorer beside
    bm25_search — smoothing gives unseen query terms nonzero mass, so
    candidates score on ALL terms. Same query as bm25_search for
    side-by-side comparison; rrf_search can fuse the two."""
    from saber_spark.operators.retrieval import qld_topk
    return qld_topk(tokenize_docs(_docs(spark, sf_dir)),
                    ["spark", "stream", "vector"], top_k=15)


def q_err_eval(spark, sf_dir):
    """Expected Reciprocal Rank (retrieval.err_eval, Chapelle CIKM
    2009): the cascade-model metric next to ndcg_eval (position
    discount) and map_eval (binary AP) over the same three queries —
    models a user who STOPS at the first satisfying result; the
    stopping product rides the ranking window as a cumulative
    ln(1-R) sum with a kaplan_meier-style exact-one dead flag."""
    from saber_spark.operators.retrieval import err_eval
    return err_eval(_docs(spark, sf_dir),
                    [("join", "merge"), ("stream", "window"),
                     ("filter", "scan")], k=10)


def q_mmr_rerank(spark, sf_dir):
    """Maximal Marginal Relevance diversified top-5 (retrieval.
    mmr_rerank, Carbonell & Goldstein 1998): greedy
    relevance-vs-novelty selection over the bm25 top-15, with
    pairwise token-set Jaccard as the redundancy measure — the
    mirror-farm antidote a plain top-k lacks. Every greedy step is
    candidate-sized; deterministic 6dp/id argmax."""
    from saber_spark.operators.retrieval import bm25_topk, mmr_rerank
    toks = tokenize_docs(_docs(spark, sf_dir))
    # eager checkpoint of the 15-row candidate table: the pairwise-sim
    # chain and the rerank loop both consume it, and without the cut
    # each consumer re-derives the whole BM25 corpus pass (r6)
    cand = bm25_topk(toks, ["spark", "stream", "vector"], top_k=15) \
        .select("doc_id", F.col("score").alias("rel")) \
        .localCheckpoint(eager=True)
    dt = (toks.join(cand.select("doc_id"), "doc_id")
          .select("doc_id", "token").distinct())
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (dt.alias("p")
             .join(dt.alias("q"), F.col("p.token") == F.col("q.token"))
             .filter(F.col("p.doc_id") < F.col("q.doc_id"))
             .groupBy(F.col("p.doc_id").alias("a"),
                      F.col("q.doc_id").alias("b"))
             .agg(F.count(F.lit(1)).alias("ni")))
    sim = (inter
           .join(F.broadcast(sizes.select(F.col("doc_id").alias("a"),
                                          F.col("sz").alias("sa"))), "a")
           .join(F.broadcast(sizes.select(F.col("doc_id").alias("b"),
                                          F.col("sz").alias("sb"))), "b")
           .select("a", "b",
                   (F.col("ni")
                    / (F.col("sa") + F.col("sb") - F.col("ni")))
                   .alias("sim")))
    return mmr_rerank(cand, sim, k=5, lam=0.7)


def q_nysiis_blocks(spark, sf_dir):
    """NYSIIS-style phonetic blocking keys over part names
    (canonicalize.nysiis_key, Taft 1970): the second phonetic pass
    next to phonetic_blocking's Soundex-style key — NYSIIS keeps
    vowel-position structure, so the two blockings are independent
    and their union recovers pairs either alone misses. One narrow
    key map + one block-size agg."""
    from saber_spark.operators.canonicalize import nysiis_key
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    keyed = parts.select(F.col("p_name").alias("name"),
                         nysiis_key(F.col("p_name")).alias("nkey"))
    w = Window.partitionBy("nkey")
    return keyed.select("name", "nkey",
                        F.count(F.lit(1)).over(w).cast("long")
                        .alias("block_size")).distinct()


def q_dice_pairs(spark, sf_dir):
    """Two-stage ER comparator (canonicalize.dice_verified_pairs,
    Sorensen 1948 / Dice 1945): NYSIIS blocks propose, char-bigram
    Dice verifies (set semantics, row-level HOFs — no explode-join) —
    the blocking+verification pattern with the edit-based fuzzy_link
    replaced by a transposition-tolerant set measure. Never
    all-pairs."""
    from saber_spark.operators.canonicalize import dice_verified_pairs
    parts = (spark.read.parquet(f"{sf_dir}/part.parquet")
             .filter(F.col("p_partkey") <= 500)  # deterministic slice
             .select(F.col("p_partkey").alias("id"),
                     F.col("p_name").alias("name")))
    return dice_verified_pairs(parts, "name", "id", threshold=0.6)


def q_katz_hosts(spark, sf_dir):
    """Katz centrality by truncated walk series (graph.katz_centrality,
    Katz 1953, alpha=0.1, k<=6): the damped-walk influence between
    degree and PageRank — no out-degree normalization, so prolific
    hubs still pass credit. The pagerank iteration pattern on the
    shared host-edge fixture; linear plan growth, no driver
    collect."""
    from saber_spark.operators.graph import katz_centrality
    return katz_centrality(_host_edges(spark, sf_dir))


def q_ct_lang(spark, sf_dir):
    """Cavnar-Trenkle rank-order language ID held-out confusion
    (classify.ct_lang_confusion, SDAIR 1994 — the original TextCat):
    top-40 char-trigram profiles per language, out-of-place distance
    with missing-gram penalty, argmin prediction — the rank-profile
    method next to nb_lang_confusion's multinomial NB on the same
    hash split. Scoring is one gram-keyed join against the broadcast
    language profiles."""
    from saber_spark.operators.classify import ct_lang_confusion
    return ct_lang_confusion(_docs(spark, sf_dir), top_k=40)


def q_token_adaptation(spark, sf_dir):
    """Church adaptation (vocab.token_adaptation, EMNLP 2000 "two
    Noriegas"): P(token again | token appeared) vs its prior — the
    document-level burstiness twin of term_dispersion's corpus-part
    view and the statistical basis for BM25's tf saturation. Two-level
    count reduction, 1-row N broadcast."""
    from saber_spark.operators.vocab import token_adaptation
    return token_adaptation(tokenize_docs(_docs(spark, sf_dir)),
                            min_df=10)


def q_rocchio_rerank(spark, sf_dir):
    """Rocchio pseudo-relevance feedback rerank (retrieval.
    rocchio_rerank, Rocchio 1971/SMART): BM25 top-10 as blind
    feedback, query moved toward their tf-idf centroid, 5
    deterministic expansion terms, second-pass dot-product scoring
    over the original candidates — the classic expansion loop over
    the same 3-term query as bm25_search/qld_search."""
    from saber_spark.operators.retrieval import rocchio_rerank
    return rocchio_rerank(tokenize_docs(_docs(spark, sf_dir)),
                          ["spark", "stream", "vector"])


def q_cluster_validity(spark, sf_dir):
    """Internal cluster-validity panel (cluster.cluster_validity:
    simplified silhouette Hruschka 2004 / Davies-Bouldin 1979 /
    Calinski-Harabasz 1974) over the kmeans_embeddings partition —
    "is k right" without any pairwise point-point work: everything
    derives from point-to-centroid and centroid-to-centroid
    distances."""
    from saber_spark.operators.cluster import cluster_validity
    return cluster_validity(_embeddings(spark, sf_dir), k=4,
                            iterations=3)


def q_pca_top(spark, sf_dir):
    """First principal component by power iteration
    (cluster.pca_top_component, Pearson 1901 / von Mises 1929): the
    dominant axis of the embedding cloud with its variance share —
    the anisotropy/collapse smell test and the input to
    dominant-direction removal. Covariance from ONE id-keyed
    self-join of the long table; the fixpoint runs on the d^2-row
    matrix."""
    from saber_spark.operators.cluster import pca_top_component
    return pca_top_component(_embeddings(spark, sf_dir), iterations=8)


def q_rotate_score(spark, sf_dir):
    """RotatE triple plausibility (kge.rotate_score, Sun et al. ICLR
    2019): per-dimension unit complex rotations drawn from the 32
    exact hypotenuse-65 Pythagorean rotations (no trig — engine-exact
    integers until one final /65), L1 energy ||h o r - t||_1, LOWEST
    wins — the composition/inversion-capable completion of the
    transe/distmult/complex scoring family. Same two entity-resolution
    equi-joins, rotation constants folded into codegen literals, top-5
    per relation."""
    from saber_spark.operators.kge import rotate_score
    return rotate_score(
        _schema_kg3(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        {"placed": 100, "contains": 101, "supplies": 102}, top_k=5)


def q_bowtie_hosts(spark, sf_dir):
    """Broder WWW-2000 bowtie census of the host graph
    (graph.bowtie_structure): CORE/IN/OUT/TENDRIL/DISCONNECTED class
    sizes + shares from one forward and one backward frontier BFS off
    the max-degree pivot plus weak-CC membership. The bare fixture is
    CORE + IN only, so BOWTIE_GADGET_ROWS adds an OUT chain, a tendril,
    an IN->OUT tube, and a disconnected pair. Oracle: two depth-capped
    recursive reachability CTEs + the recursive min-label CC."""
    from saber_spark.operators.graph import bowtie_structure
    gadget = spark.createDataFrame(BOWTIE_GADGET_ROWS,
                                   "src string, dst string")
    return bowtie_structure(
        _host_edges(spark, sf_dir).unionByName(gadget), max_depth=8)


def q_trustrank_hosts(spark, sf_dir):
    """TrustRank + relative spam mass (graph.trustrank_spam_mass,
    Gyöngyi et al. VLDB 2004 / spam mass 2006) over the DIRECTED host
    graph plus a five-host link farm (TRUST_GADGET_ROWS): trusted core
    {src0, src1}, one power loop carrying BOTH the PageRank and the
    trust vector (half the joins of two runs), spam_mass =
    (pr - trust)/pr from the 6dp-rounded values. The farm's boss page
    earns high rank and ~1 spam mass; the trusted core goes <= 0.
    Oracle: unrolled 4-round directed twin of the ppr_hosts CTE."""
    from saber_spark.operators.graph import trustrank_spam_mass
    gadget = spark.createDataFrame(TRUST_GADGET_ROWS,
                                   "src string, dst string")
    seeds = spark.createDataFrame(
        [("src0.example.org",), ("src1.example.org",)], "node string")
    return trustrank_spam_mass(
        _host_edges(spark, sf_dir).unionByName(gadget), seeds,
        iterations=4)


def q_scan_hosts(spark, sf_dir):
    """SCAN structural clustering (graph.scan_clusters, Xu et al. KDD
    2007) of the host graph + SCAN_GADGET_ROWS: cluster by structural
    similarity sigma = |closed-neighborhood overlap| / sqrt(deg*deg)
    per EDGE (wedge join, never all-pairs), cores/borders via
    eps=0.5/mu=3, hubs and outliers named explicitly — the community
    map that, unlike LPA, tells you which hosts are noise and which
    are inter-community brokers. Oracle: the identical
    sigma/core/border chain + recursive min-label CC."""
    from saber_spark.operators.graph import scan_clusters
    gadget = spark.createDataFrame(SCAN_GADGET_ROWS,
                                   "src string, dst string")
    return scan_clusters(
        _host_edges(spark, sf_dir).unionByName(gadget), eps=0.5, mu=3)


def q_kcenter_seeds(spark, sf_dir):
    """Farthest-first k-center seeding (cluster.kcenter_seeds, Gonzalez
    1985 2-approximation): 6 maximally spread embedding rows by exact
    integer squared distance, ties to the smallest id — the diversity
    picker for eval seeding and IVF warm starts; the last row's d2 is
    the coverage-radius certificate. Oracle: unrolled per-round
    argmax CTEs over the long (id, dim) table."""
    from saber_spark.operators.cluster import kcenter_seeds
    return kcenter_seeds(_embeddings(spark, sf_dir), k=6)


def q_script_profile(spark, sf_dir):
    """Unicode script census (textstats.script_profile): the
    writing-SYSTEM axis orthogonal to language ID — per-doc letter
    counts over six BMP script ranges, dominant script + share. The
    fixture injects deterministic multi-script snippets (CJK for zh,
    accented Latin for de/fr/es, Cyrillic every 11th doc, Greek every
    13th) since the synthetic corpus is pure ASCII. Pure narrow
    regexp codegen — zero joins/shuffles/Python. Oracle: identical
    byte-for-byte \\x{...} classes (the syntax Java regex and RE2
    share)."""
    from saber_spark.operators.textstats import script_profile
    docs = _docs(spark, sf_dir)
    inj = (F.when(F.col("lang") == "zh", F.lit(" 数据流处理"))
           .when(F.col("lang") == "de", F.lit(" straße prüfung"))
           .when(F.col("lang") == "fr", F.lit(" données département"))
           .when(F.col("lang") == "es", F.lit(" años señal"))
           .otherwise(F.lit("")))
    cyr = F.when(F.col("doc_id") % 11 == 0,
                 F.lit(" поток данных")).otherwise(F.lit(""))
    grk = F.when(F.col("doc_id") % 13 == 0,
                 F.lit(" διαδικασία")).otherwise(F.lit(""))
    fx = docs.select("doc_id",
                     F.concat("text", inj, cyr, grk).alias("text"))
    return script_profile(fx)


def q_pld_rollup(spark, sf_dir):
    """Registered-domain (pay-level-domain) crawl rollup against the
    embedded public-suffix snapshot (webstats.pld_rollup,
    publicsuffix.org semantics: LONGEST matching suffix + one label —
    the upgrade apex_domain's docstring promises): per-PLD url/host
    counts over synthetic crawl URLs spanning single- and multi-label
    suffixes, subdomain shapes, and an unknown TLD (naive-apex
    fallback, matched=false). One distinct-host resolution via a
    constant-fan-out candidate explode + broadcast PSL join + one
    max-struct agg — no windows, no corpus shuffle."""
    from saber_spark.operators.webstats import pld_rollup
    docs = _docs(spark, sf_dir)
    sfx = F.array(*[F.lit(s) for s in
                    ["com", "co.uk", "org", "com.au", "de", "io",
                     "net", "gov.uk", "zz"]])
    suffix = F.element_at(sfx, (F.col("doc_id") % 9 + 1).cast("int"))
    sub = (F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
           .when(F.col("doc_id") % 5 == 0, F.lit("a.b."))
           .otherwise(F.lit("")))
    urls = docs.select(
        F.concat(F.lit("https://"), sub, F.lit("site"),
                 (F.col("doc_id") % 7).cast("string"), F.lit("."),
                 suffix, F.lit("/p/"),
                 F.col("doc_id").cast("string")).alias("url"))
    return pld_rollup(urls)


def q_wordpiece_encode(spark, sf_dir):
    """WordPiece greedy longest-match encoding (bpe.wordpiece_encode,
    Wu et al. 2016 / BERT; Schuster-Nakajima 2012) over the corpus's
    distinct words with WORDPIECE_VOCAB: the match-based sibling of
    the BPE encoder, expressed ENTIRELY in joins — longest match per
    (word, pos) is one broadcast-vocab join + max-struct agg, and the
    greedy walk is pointer-chasing over that jump table (lazy rounds,
    no Python, unlike encode_df's Arrow loop). 'query' lands on the
    whole-word [UNK] rule (no 'q' piece); the 25-char cap mirrors the
    reference's word truncation (saber/constants.py:64). Oracle: the
    same jump table + a recursive pointer-walk CTE."""
    from saber_spark.operators.bpe import wordpiece_encode
    from saber_spark.operators.vocab import tokenize_docs
    return wordpiece_encode(
        tokenize_docs(_docs(spark, sf_dir)).select("token").distinct(),
        WORDPIECE_VOCAB)


def q_min_k_prob(spark, sf_dir):
    """Min-K% Prob membership audit (lm.min_k_prob, Shi et al. 2023):
    per scored doc, the mean log-probability of its 20% least-likely
    bigrams under the repo's add-k bigram reference LM — the
    probability-based leakage detector next to the verbatim n-gram
    decontamination ops (members lack the low-probability outliers
    non-members have). One model (two hash aggs), two scoring joins,
    one per-doc window + agg; tie-invariant selection documented in
    the operator."""
    from saber_spark.operators.lm import min_k_prob
    return min_k_prob(_docs(spark, sf_dir), INFIX_PATTERN, k_pct=0.2)


def q_self_bleu(spark, sf_dir):
    """Self-BLEU corpus-diversity audit (textstats.self_bleu, Zhu et
    al. 2018 Texygen / Papineni 2002 arithmetic): each doc BLEU-scored
    against the REST of the corpus — the distributional-redundancy
    axis the exact/MinHash dedup ops don't see. Clipping ceilings come
    from ONE (n, gram)-keyed top-2 window (ties -> smaller doc id), so
    the plan is linear in gram volume, never per-(candidate,
    reference) quadratic; brevity penalty uses the closest OTHER-doc
    length from a broadcast length histogram."""
    from saber_spark.operators.textstats import self_bleu
    return self_bleu(_docs(spark, sf_dir), INFIX_PATTERN)


def q_sif_embeddings(spark, sf_dir):
    """SIF document embeddings (cluster.sif_embeddings, Arora-Liang-Ma
    ICLR 2017): frequency-weighted word-vector means with first-PC
    common-component removal — the tough-to-beat doc-embedding
    baseline composing three existing stages (token freqs, the
    quantized embedding table via the DSIR md5-portable word->row
    hash, pca_top_component's power loop on the doc-vector
    covariance). Long-form (doc_id, dim, value) output."""
    from saber_spark.operators.cluster import sif_embeddings
    from saber_spark.operators.vocab import tokenize_docs
    return sif_embeddings(
        tokenize_docs(_docs(spark, sf_dir)),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry preference strengths by Hunter's MM
    (evaluation.bradley_terry, Bradley-Terry 1952 / Hunter 2004) —
    the Chatbot-Arena leaderboard model: deterministic synthetic
    pairwise judgments between sources (each doc stages a match
    against a derived opponent; the lower-indexed source wins 2/3 of
    the time), fitted for 8 MM rounds with geometric-mean
    re-centering. One item-bounded pair table; each round one
    equi-join + agg (the pagerank loop shape). Oracle: 8 unrolled
    MM CTEs."""
    from saber_spark.operators.evaluation import bradley_terry
    docs = _docs(spark, sf_dir)
    ia = F.regexp_extract("source", r"([0-9]+)", 1).cast("long")
    ib = (F.col("doc_id") * 7 + 3) % 20
    team_b = F.concat(F.lit("src"), ib.cast("string"))
    fav = F.when(ia < ib, F.col("source")).otherwise(team_b)
    und = F.when(ia < ib, team_b).otherwise(F.col("source"))
    fav_wins = (F.col("n_chars") + F.col("doc_id")) % 3 > 0
    matches = (docs.filter(ia != ib)
               .select(F.when(fav_wins, fav).otherwise(und)
                       .alias("winner"),
                       F.when(fav_wins, und).otherwise(fav)
                       .alias("loser")))
    return bradley_terry(matches, iterations=8)


def q_luhn_abstract(spark, sf_dir):
    """Luhn auto-abstract (textstats.luhn_abstract, Luhn IBM Journal
    1958 — the original extractive summarizer, the cheap snippet
    generator next to textrank_keywords): per doc, the top-2
    sentences by best significant-word cluster score n_sig^2/span
    (significant = doc-frequency >= 2, non-stopword; cluster = runs
    with <= 4 insignificant words between significant ones). Sentence
    split + ONE (doc, token) freq agg + one lag/running-sum window
    pair + per-doc rank — all co-partitioned, zero Python."""
    from saber_spark.operators.textstats import luhn_abstract
    return luhn_abstract(_docs(spark, sf_dir), INFIX_PATTERN)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline on sf0.001 -> deduplicated edge table."""
    from saber_spark.pipeline import run_pipeline

    pages = build_pages_df(spark, "/root/testdata/sf0.001")
    return run_pipeline(spark, pages)["edges"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver's correctness gate evaluates only the
    # FIRST 50 entries (dict insertion order); entries past position 50 get
    # no driver row. Full rationale + rotation history: git log on this
    # block (r2-r4 slates) and the r4 comment at commit b875eba^.
    #
    # r5 slate (FINAL round) — cap priority per the r4-written plan:
    #   * the four rows-only flagships stay in-cap (kg_mentions, kg_edges,
    #     curation_decision, multimodal_features) — they have no other
    #     driver-evidence channel;
    #   * the remaining 46 slots go to the r4 tail-head backlog: the 53
    #     never-driver-evaluated r4 additions minus seven family-redundant
    #     sit-outs that keep local-gate evidence only (both comparators,
    #     tests/driversim_check.py + tests/oracle_check.py; sweep artifact
    #     BENCH/driversim_sweep_r5.json):
    #       linkpred_mrr      (in-cap sibling linkpred_auc — same held-out
    #                          split + ranking machinery),
    #       resolve_conflicts (in-cap siblings resolve_weighted, which
    #                          generalizes its majority vote, and
    #                          source_reliability),
    #       kcore_hosts       (in-cap sibling ktruss_hosts — same iterative
    #                          peel; graph_summary reports degeneracy),
    #       char_entropy      (in-cap siblings readability/vocab_profile),
    #       grouped_split_audit (driver-green family: split_folds r3,
    #                          mixture_sample r4),
    #       weighted_sample   (driver-green siblings mixture_sample r4,
    #                          stratified_sample r2/r3),
    #       random_walks      (in-cap sibling ppr_hosts — same walk/
    #                          transition machinery; metapath_counts too).
    #   * every r4-cap entry is driver-green in CORRECTNESS_r04 (45
    #     hash-MATCH + rows-only flagships clean) and moves to the tail
    #     head with that 1-round-old evidence.
    # New r5 queries displace the most family-redundant remaining backlog
    # entries (displacement noted inline below when it happens).
    return {
        # --- rows-only flagships (no other driver channel) ---
        "kg_mentions": q_kg_mentions,
        "kg_edges": q_kg_edges,
        "curation_decision": q_curation_decision,
        "multimodal_features": q_multimodal_features,
        # --- NEW r5 operators (first driver rows; displaced the
        # family-redundant backlog entries auc_doclen, mad_outliers,
        # cms_tokens, span_corruption, skew_canonical to the tail
        # head below) ---
        "jsonld_triples": q_jsonld_triples,
        "hashed_ngram_score": q_hashed_ngram_score,
        "blocking_metrics": q_blocking_metrics,
        "anf_reach": q_anf_reach,
        "winnow_fingerprint": q_winnow_fingerprint,
        # batch 2 (displaced lm_backoff — driver-green sibling
        # lm_perplexity r4 — and tagger_agreement — eval-family
        # siblings bcubed_resolution/calibration_quality in-cap):
        "html_tables": q_html_tables,
        "anchor_commonness": q_anchor_commonness,
        # (table_triples displaced skipgram_pairs — sampling-family
        # sibling kge_negatives in-cap):
        "table_triples": q_table_triples,
        # --- r4 tail-head backlog: first driver rows this round ---
        "ngram_containment": q_ngram_containment,
        "ppr_hosts": q_ppr_hosts,
        "scrub_dup_spans": q_scrub_dup_spans,
        "readability": q_readability,
        "clustering_entities": q_clustering_entities,
        "textrank_keywords": q_textrank_keywords,
        "rrf_search": q_rrf_search,
        "link_fd_check": q_link_fd_check,
        "abbrev_aliases": q_abbrev_aliases,
        "kge_negatives": q_kge_negatives,
        "ktruss_hosts": q_ktruss_hosts,
        "wl_fingerprint": q_wl_fingerprint,
        "entity_centroids": q_entity_centroids,
        "sssp_hosts": q_sssp_hosts,
        "chunk_documents": q_chunk_documents,
        "linkpred_auc": q_linkpred_auc,
        "calibration_quality": q_calibration_quality,
        "graph_summary": q_graph_summary,
        "community_modularity": q_community_modularity,
        "entity_salience": q_entity_salience,
        "negation_scope": q_negation_scope,
        "entity_resolution": q_entity_resolution,
        "date_mentions": q_date_mentions,
        "triple_audit": q_triple_audit,
        "vocab_profile": q_vocab_profile,
        "distance_histogram": q_distance_histogram,
        "nb_lang_confusion": q_nb_lang_confusion,
        "bloom_decontaminate": q_bloom_decontaminate,
        "host_mirrors": q_host_mirrors,
        "metapath_counts": q_metapath_counts,
        "hearst_hypernyms": q_hearst_hypernyms,
        "domain_range_audit": q_domain_range_audit,
        "bcubed_resolution": q_bcubed_resolution,
        "infer_types": q_infer_types,
        "source_reliability": q_source_reliability,
        "taxonomy_cycles": q_taxonomy_cycles,
        "resolve_weighted": q_resolve_weighted,
        "rule_confidence": q_rule_confidence,
        # ------- position 51+: tail (driver-green or local-gate) -------
        # late-r5 read-side KG operators (local-gate evidence: both
        # comparators + the refreshed sweep artifact; added after the
        # r5 cap slate was frozen, so they do not displace the
        # never-driver-evaluated backlog above):
        # r5-continuation additions (local-gate evidence: both
        # comparators MATCH, sweep artifact refreshed; added after the
        # frozen r5 cap slate, so they sit in the tail like the other
        # late-r5 entries): probabilistic record linkage (supervised +
        # EM), sorted-neighborhood blocking, HRW sharding, cross-KG
        # alignment, partition-layout audit, GD logistic regression
        "fellegi_sunter": q_fellegi_sunter,
        "fellegi_sunter_em": q_fellegi_sunter_em,
        "sorted_neighborhood": q_sorted_neighborhood,
        "rendezvous_shards": q_rendezvous_shards,
        "kg_align": q_kg_align,
        "partition_quality": q_partition_quality,
        "logreg_quality": q_logreg_quality,
        "bgp_query": q_bgp_query,
        "entity_card": q_entity_card,
        "char_sets": q_char_sets,
        "kg_timetravel": q_kg_timetravel,
        "void_stats": q_void_stats,
        "ntriples_roundtrip": q_ntriples_roundtrip,
        "construct_triples": q_construct_triples,
        "microdata_triples": q_microdata_triples,
        # seven family-redundant sit-outs (local-gate evidence only;
        # siblings named in the contract comment above):
        "linkpred_mrr": q_linkpred_mrr,
        "resolve_conflicts": q_resolve_conflicts,
        "kcore_hosts": q_kcore_hosts,
        "char_entropy": q_char_entropy,
        "grouped_split_audit": q_grouped_split_audit,
        "weighted_sample": q_weighted_sample,
        "random_walks": q_random_walks,
        # r5 displacements for the five new operators above — all
        # local-gate MATCH in both comparators; in-cap siblings:
        # auc_doclen (linkpred_auc/calibration_quality AUC family),
        # mad_outliers (distance_histogram/vocab_profile robust
        # stats), cms_tokens (bloom_decontaminate sketch family),
        # span_corruption (chunk_documents/sequence-masking family),
        # skew_canonical (canonicalize family: salted two-phase agg
        # runs inside the kg_edges flagship row):
        "auc_doclen": q_auc_doclen,
        "mad_outliers": q_mad_outliers,
        "cms_tokens": q_cms_tokens,
        "span_corruption": q_span_corruption,
        "skew_canonical": q_skew_canonical,
        "lm_backoff": q_lm_backoff,
        "tagger_agreement": q_tagger_agreement,
        "skipgram_pairs": q_skipgram_pairs,
        # r5 batch-2 tail-only additions (local-gate evidence in both
        # comparators; in-cap family siblings host_mirrors /
        # line_dedup_clean-via-url_dedup and link_prediction /
        # triangle_entities wedge joins):
        "host_boilerplate": q_host_boilerplate,
        "cocitation_hosts": q_cocitation_hosts,
        # r5 demotions: the full r4 cap, all driver-green in
        # CORRECTNESS_r04 (1 round old):
        "scan_filter_project": q_scan_filter_project,
        "sentence_split": q_sentence_split,
        "dict_mentions": q_dict_mentions,
        "fuzzy_link": q_fuzzy_link,
        "proximity_triples": q_proximity_triples,
        "degree_hist": q_degree_hist,
        "hits_hosts": q_hits_hosts,
        "khop_hosts": q_khop_hosts,
        "url_host_stats": q_url_host_stats,
        "url_dedup": q_url_dedup,
        "host_blocklist": q_host_blocklist,
        "line_dedup_clean": q_line_dedup,
        "host_link_graph": q_host_link_graph,
        "snapshot_delta": q_snapshot_delta,
        "incremental_triples": q_incremental_triples,
        "resolve_redirects": q_resolve_redirects,
        "anchor_profile": q_anchor_profile,
        "disambiguate_link": q_disambiguate_link,
        "type_closure": q_type_closure,
        "label_propagation": q_label_propagation,
        "lm_perplexity": q_lm_perplexity,
        "crawl_frontier": q_crawl_frontier,
        "typed_triples": q_typed_triples,
        "triple_history": q_triple_history,
        "link_prediction": q_link_prediction,
        "trending_entities": q_trending_entities,
        "robots_filter": q_robots_filter,
        "sitemap_urls": q_sitemap_urls,
        "warc_records": q_warc_records,
        "kmeans_embeddings": q_kmeans_embeddings,
        "bpe_pair_stats": q_bpe_pair_stats,
        "bpe_encode": q_bpe_encode,
        "event_transitions": q_event_transitions,
        "mixture_sample": q_mixture_sample,
        "tpch_q5_nation": q_tpch_q5_nation,
        "exists_high_value": q_exists_high_value,
        "above_nation_avg": q_above_nation_avg,
        "sessionize": q_sessionize,
        "moving_avg": q_moving_avg,
        "rollup_revenue": q_rollup_revenue,
        "semdedup": q_semdedup,
        "centroid_classify": q_centroid_classify,
        "quality_filter": q_quality_filter,
        "tfidf_ranked": q_tfidf_ranked,
        "bm25_search": q_bm25_search,
        "dsir_weights": q_dsir_weights,
        # older tail: driver-green r1-r3 with in-cap or driver-green
        # family siblings per the r2-r4 ordering-contract notes (git log):
        "range_join_clicks": q_range_join_clicks,
        "pii_scrub": q_pii_scrub,
        "token_freq": q_token_freq,
        "rare_tokens": q_rare_tokens,
        "vocab_ids": q_vocab_ids,
        "bio_chunks": q_bio_chunks,
        "tokenize_explode": q_tokenize_explode,
        "entity_link": q_entity_link,
        "canonicalize_salted": q_canonicalize_salted,
        "triples_cooccur": q_triples_cooccur,
        "dedup_clusters": q_dedup_clusters,
        "pagerank_entities": q_pagerank_entities,
        "ivf_cosine_topk": q_ivf_cosine_topk,
        "tpch_q4": q_tpch_q4,
        "table_profile": q_table_profile,
        "eval_prf": q_eval_prf,
        "split_folds": q_split_folds,
        "quality_buckets": q_quality_buckets,
        "funnel_conversion": q_funnel_conversion,
        "lsh_cosine_multiband": q_lsh_cosine_multiband,
        "tfidf_topterms": q_tfidf_topterms,
        "quality_score": q_quality_score,
        "gopher_repetition": q_gopher_repetition,
        "minhash_candidates": q_minhash_candidates,
        "ngram_jaccard": q_ngram_jaccard,
        "crossdoc_ngram_dup": q_crossdoc_ngram_dup,
        "triangle_entities": q_triangle_entities,
        "cohort_retention": q_cohort_retention,
        "mixture_weights": q_mixture_weights,
        "contamination_check": q_contamination_check,
        "sequence_packing": q_sequence_packing,
        "connected_components": q_connected_components,
        "edge_pmi": q_edge_pmi,
        "hypertable_rollup": q_hypertable_rollup,
        "doc_fingerprint": q_doc_fingerprint,
        "embedding_near_dup": q_embedding_near_dup,
        "stratified_sample": q_stratified_sample,
        "median_by_source": q_median_by_source,
        "pivot_events": q_pivot_events,
        "json_extract_agg": q_json_extract_agg,
        "setops_active_customers": q_setops_active_customers,
        "cube_revenue": q_cube_revenue,
        "grouping_sets_revenue": q_grouping_sets_revenue,
        "xml_articles": q_xml_articles,
        "kmv_distinct": q_kmv_distinct,
        "asof_join": q_asof_join,
        "top1_per_user": q_top1_per_user,
        "window_agg": q_window_agg,
        "mentions_histogram": q_mentions_histogram,
        "eval_prf_left": q_eval_prf_left,
        "eval_prf_right": q_eval_prf_right,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "tpch_q1": q_tpch_q1,
        "minhash_signatures": q_minhash_signatures,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "dedup_exact": q_dedup_exact,
        "tpch_q3_top10": q_tpch_q3_top10,
        "tpch_q6": q_tpch_q6,
        "token_bigrams": q_token_bigrams,
        "zscore_by_source": q_zscore_by_source,
        "customers_without_orders": q_customers_without_orders,
        # added post-freeze in round 5 (tail — the r5 cap slate above is
        # frozen; these carry local-gate + pytest evidence this round):
        "pq_codes": q_pq_codes,
        "quote_attribution": q_quote_attribution,
        "ndcg_eval": q_ndcg_eval,
        "fd_mining": q_fd_mining,
        "rdfs_entailment": q_rdfs_entailment,
        "optional_bgp": q_optional_bgp,
        "schema_matching": q_schema_matching,
        "transe_score": q_transe_score,
        "fact_ranking": q_fact_ranking,
        "inverted_index": q_inverted_index,
        "phrase_search": q_phrase_search,
        "expectations_check": q_expectations_check,
        "measurements": q_measurements,
        "citation_spans": q_citation_spans,
        "cusum_changepoints": q_cusum_changepoints,
        "gini_concentration": q_gini_concentration,
        "analogy_eval": q_analogy_eval,
        "shacl_validate": q_shacl_validate,
        "ppjoin_similarity": q_ppjoin_similarity,
        "texttiling": q_texttiling,
        # r5-continuation batch 2 (local-gate MATCH in both comparators;
        # tail like the other post-freeze entries): RDFa harvesting
        # (completes the WebDataCommons markup quartet), ReVerb-lite
        # OpenIE verb frames, Good-Turing smoothing, Zipf OLS fit
        "rdfa_triples": q_rdfa_triples,
        "openie_triples": q_openie_triples,
        "good_turing": q_good_turing,
        "zipf_fit": q_zipf_fit,
        # r5-continuation batch 3: temporal functional-conflict audit,
        # phonetic blocking keys
        "temporal_conflicts": q_temporal_conflicts,
        "phonetic_blocking": q_phonetic_blocking,
        "entity_hindex": q_entity_hindex,
        "url_templates": q_url_templates,
        "subprop_entailment": q_subprop_entailment,
        "sameas_rewrite": q_sameas_rewrite,
        "noisyor_confidence": q_noisyor_confidence,
        "transitive_property": q_transitive_property,
        "allen_relations": q_allen_relations,
        # r5 final-session additions (local-gate evidence in both
        # comparators; tail like the other post-freeze entries):
        # DistMult scoring, SPARQL property paths, CDC chunk dedup,
        # confident-learning label noise, DP count release
        "distmult_score": q_distmult_score,
        "property_paths": q_property_paths,
        "cdc_chunk_dedup": q_cdc_chunk_dedup,
        "label_noise": q_label_noise,
        "dp_release": q_dp_release,
        # r5 final-session batch 2 (local-gate evidence in both
        # comparators; tail like the other post-freeze entries):
        # ComplEx scoring, landmark harmonic centrality, RAKE
        # keyphrases, k-anonymity audit, Kneser-Ney smoothing
        "complex_score": q_complex_score,
        "harmonic_hosts": q_harmonic_hosts,
        "rake_keywords": q_rake_keywords,
        "k_anonymity": q_k_anonymity,
        "kneser_ney": q_kneser_ney,
        # r5 final-session batch 3: OWL-RL identity + consistency rules
        # (prp-ifp inverse-functional sameAs inference, cax-dw
        # disjoint-class violations)
        "ifp_sameas": q_ifp_sameas,
        "disjoint_audit": q_disjoint_audit,
        # r5 final-session batch 4: SemEval-2013 four-mode chunk eval +
        # accent-folded ER blocking
        "eval_semeval": q_eval_semeval,
        "folded_blocks": q_folded_blocks,
        # r5 final-session batch 5: KWIC concordance + corpus-drift JSD
        "kwic_snippets": q_kwic_snippets,
        "js_divergence": q_js_divergence,
        # r5 final-session batch 6: KB-completeness estimators (Chao1
        # richness, Lincoln-Petersen/Chapman capture-recapture)
        "chao1_vocab": q_chao1_vocab,
        "capture_recapture": q_capture_recapture,
        # r5 final session batch 7 (Dunning G^2 collocations, Monroe
        # log-odds keyness, rank-biased overlap)
        "collocations": q_collocations,
        "logodds_keyness": q_logodds_keyness,
        "rbo_hosts": q_rbo_hosts,
        # r5 final session batch 8 (Benford forensics, Yule's K panel,
        # Wilson lower-bound ranking)
        "benford_prices": q_benford_prices,
        "lexical_richness": q_lexical_richness,
        "wilson_sources": q_wilson_sources,
        # r5 final session batch 9 (event-count ACF, Gries DP
        # dispersion, MAP/P@k)
        "acf_events": q_acf_events,
        "term_dispersion": q_term_dispersion,
        "map_eval": q_map_eval,
        # r5 final session batch 10 (Heaps' law, Burrows' Delta,
        # association rules)
        "heaps_fit": q_heaps_fit,
        "burrows_delta": q_burrows_delta,
        "assoc_rules": q_assoc_rules,
        # r5 final session batch 11 (rank-sum, KS, Spearman drift tests)
        "mannwhitney_chars": q_mannwhitney_chars,
        "ks_chars": q_ks_chars,
        "spearman_chars": q_spearman_chars,
        # r5 final session batch 12 (Kendall tau-b, chi-square/Cramér's V,
        # Shannon entropy rate)
        "kendall_hosts": q_kendall_hosts,
        "chisq_lang_source": q_chisq_lang_source,
        "entropy_rate": q_entropy_rate,
        # r5 final session batch 13 (S-stemmer, I-MR chart, mojibake)
        "stem_collapse": q_stem_collapse,
        "control_chart": q_control_chart,
        "mojibake_audit": q_mojibake_audit,
        # r5 final session batch 14 (sequential patterns, Kaplan-Meier,
        # Markov stationary)
        "seq_patterns": q_seq_patterns,
        "kaplan_meier": q_kaplan_meier,
        "markov_stationary": q_markov_stationary,
        # r5 final session batch 15 (robust means, effect size,
        # Theil-Sen trend)
        "robust_means": q_robust_means,
        "effect_size_chars": q_effect_size_chars,
        "theil_sen_trend": q_theil_sen_trend,
        # r5 final session batch 16 (lead-lag CCF, burstiness panel,
        # co-citation)
        "ccf_events": q_ccf_events,
        "burstiness": q_burstiness,
        "cocitation_cosine": q_cocitation_cosine,
        # r5 final session batch 17 (Mann-Kendall, runs test,
        # seasonal profile)
        "mann_kendall": q_mann_kendall,
        "runs_test": q_runs_test,
        "seasonal_profile": q_seasonal_profile,
        # r5 final session batch 18 (PPMI similarity, OpenGraph harvest,
        # rel=canonical)
        "ppmi_similarity": q_ppmi_similarity,
        "og_meta": q_og_meta,
        "rel_canonical": q_rel_canonical,
        # r5 final session batch 19 (survey statistics: HT estimator,
        # Neyman allocation, grouped jackknife)
        "ht_estimate": q_ht_estimate,
        "neyman_alloc": q_neyman_alloc,
        "jackknife_se": q_jackknife_se,
        # r5 final session batch 20 (Dirichlet QLD, ERR metric,
        # MMR diversified rerank)
        "qld_search": q_qld_search,
        "err_eval": q_err_eval,
        "mmr_rerank": q_mmr_rerank,
        # r5 final session batch 21 (NYSIIS blocking, Dice verification,
        # Katz centrality)
        "nysiis_blocks": q_nysiis_blocks,
        "dice_pairs": q_dice_pairs,
        "katz_hosts": q_katz_hosts,
        # r5 final session batch 22 (Cavnar-Trenkle, Church adaptation,
        # Rocchio feedback)
        "ct_lang": q_ct_lang,
        "token_adaptation": q_token_adaptation,
        "rocchio_rerank": q_rocchio_rerank,
        # r5 final session batch 23 (cluster validity, PCA power
        # iteration)
        "cluster_validity": q_cluster_validity,
        "pca_top": q_pca_top,
        # batch 24 (RotatE scoring, Broder bowtie census)
        "rotate_score": q_rotate_score,
        "bowtie_hosts": q_bowtie_hosts,
        # batch 25 (TrustRank web-spam demotion)
        "trustrank_hosts": q_trustrank_hosts,
        # batch 26 (SCAN structural clustering, k-center seeding)
        "scan_hosts": q_scan_hosts,
        "kcenter_seeds": q_kcenter_seeds,
        # batch 27 (Unicode script census, public-suffix PLD rollup)
        "script_profile": q_script_profile,
        "pld_rollup": q_pld_rollup,
        # batch 28 (WordPiece join-based encoding, Min-K% membership)
        "wordpiece_encode": q_wordpiece_encode,
        "min_k_prob": q_min_k_prob,
        # batch 29 (Self-BLEU corpus diversity)
        "self_bleu": q_self_bleu,
        # batch 30 (SIF document embeddings)
        "sif_embeddings": q_sif_embeddings,
        # batch 31 (Bradley-Terry preference strengths)
        "bradley_terry": q_bradley_terry,
        # batch 32 (Luhn auto-abstract)
        "luhn_abstract": q_luhn_abstract,
    }


def _phonetic_sql(expr: str) -> str:
    """DuckDB twin of canonicalize.phonetic_key — the identical
    regexp_replace chain ('g' flag: DuckDB replaces first match by
    default, Spark replaces all)."""
    from saber_spark.operators.canonicalize import SOUNDEX_CLASSES
    s = f"substr({expr}, 2)"
    for pat, rep in SOUNDEX_CLASSES:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    s = f"regexp_replace({s}, '[^1-6]', '', 'g')"
    for d in "123456":
        s = f"regexp_replace({s}, '{d}{{2,}}', '{d}', 'g')"
    return (f"rpad(substr(substr({expr}, 1, 1) || {s}, 1, 4), 4, '0')")


def oracle_sql() -> dict[str, str]:
    qualities = """
  SELECT d.doc_id,
         length(d.text) AS n_chars,
         count(t.token) AS n_tokens,
         count(CASE WHEN NOT regexp_matches(t.token, '^[0-9a-zA-Z]+$') THEN 1 END) AS n_punct,
         count(s.w) AS n_stop,
         coalesce(sum(length(t.token)), 0) AS tok_chars
  FROM documents d
  LEFT JOIN tokens t ON d.doc_id = t.doc_id
  LEFT JOIN (VALUES {stops}) AS s(w) ON t.token = s.w
  GROUP BY d.doc_id, length(d.text)
""".format(stops=STOP_VALUES_SQL)

    return {
        "scan_filter_project": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND text IS NOT NULL""",
        # oracle re-derives every JSON-LD field from documents directly —
        # a synthesis/parse round-trip bug on the Spark side breaks the hash
        "jsonld_triples": r"""
            WITH base AS (
              SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     substr(text, 1, 40) AS headline, lang,
                     CAST(len(regexp_split_to_array(trim(text), '\s+'))
                          AS BIGINT) AS wc
              FROM documents
              WHERE text IS NOT NULL AND trim(text) <> '')
            SELECT url, pred, obj FROM (
              SELECT url, 'rdf:type' AS pred, 'Article' AS obj FROM base
              UNION ALL SELECT url, 'schema:headline', headline FROM base
              UNION ALL SELECT url, 'schema:inLanguage', lang FROM base
              UNION ALL SELECT url, 'schema:wordCount', CAST(wc AS VARCHAR)
                        FROM base)
            WHERE obj IS NOT NULL""",
        # microdata twin of the jsonld oracle: every field re-derived
        # from documents RAW (no escaping) — the Spark side must
        # entity-escape into the fixture html and decode back out, so
        # the hash proves escape∘decode = identity including the
        # all-entities publisher constant
        "microdata_triples": r"""
            WITH base AS (
              SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     substr(text, 1, 40) AS headline,
                     coalesce(lang, '') AS lang,
                     CAST(len(regexp_split_to_array(trim(text), '\s+'))
                          AS BIGINT) AS wc
              FROM documents
              WHERE text IS NOT NULL AND trim(text) <> '')
            SELECT url, pred, obj FROM (
              SELECT url, 'rdf:type' AS pred, 'Article' AS obj FROM base
              UNION ALL SELECT url, 'schema:headline', headline FROM base
              UNION ALL SELECT url, 'schema:inLanguage', lang FROM base
              UNION ALL SELECT url, 'schema:wordCount', CAST(wc AS VARCHAR)
                        FROM base
              UNION ALL SELECT url, 'schema:publisher', 'p<q & "r"'
                        FROM base)""",
        "hashed_ngram_score": r"""
            WITH clean AS (
              SELECT doc_id,
                     regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g')
                       AS c
              FROM documents),
            grams AS (
              SELECT doc_id,
                     ((ascii(substring(c, i, 1)) * 961
                       + ascii(substring(c, i + 1, 1)) * 31
                       + ascii(substring(c, i + 2, 1))) % 1024) AS b
              FROM clean,
                   unnest(range(1, greatest(length(c) - 1, 1))) AS u(i))
            SELECT c.doc_id,
                   CAST(greatest(length(c.c) - 2, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(
                     sum((b * 2654435761 % 1000003) % 17 - 8), 0)
                     AS BIGINT) AS score,
                   CASE WHEN coalesce(
                     sum((b * 2654435761 % 1000003) % 17 - 8), 0) > 0
                        THEN 'keep' ELSE 'drop' END AS label
            FROM clean c LEFT JOIN grams g USING (doc_id)
            GROUP BY c.doc_id, length(c.c)""",
        "blocking_metrics": f"""
            WITH {TOKENS_CTE},
            base AS (SELECT DISTINCT lower(token) AS name FROM tokens),
            tp AS (SELECT * FROM (
                     SELECT name AS a,
                            CASE WHEN length(name) % 2 = 0 THEN name || 's'
                                 ELSE upper(substr(name, 1, 1))
                                      || substr(name, 2) END AS b
                     FROM base) WHERE a <> b),
            records AS (SELECT name FROM base UNION SELECT b FROM tp),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_records FROM records),
            nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM tp),
            fc AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                          CAST(sum(nb * (nb - 1) / 2) AS BIGINT)
                            AS n_cand_pairs
                   FROM (SELECT substr(name, 1, 1) AS blk,
                                count(*) AS nb
                         FROM records GROUP BY 1)),
            fct AS (SELECT CAST(count(*) AS BIGINT) AS n_true_cand FROM tp
                    WHERE substr(a, 1, 1) = substr(b, 1, 1)),
            lc AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
                          CAST(sum(nb * (nb - 1) / 2) AS BIGINT)
                            AS n_cand_pairs
                   FROM (SELECT substr(name, -1, 1) AS blk,
                                count(*) AS nb
                         FROM records GROUP BY 1)),
            lct AS (SELECT CAST(count(*) AS BIGINT) AS n_true_cand FROM tp
                    WHERE substr(a, -1, 1) = substr(b, -1, 1))
            SELECT 'first_char' AS scheme, n_records, n_blocks,
                   n_cand_pairs, n_true_pairs, n_true_cand,
                   round(CAST(n_true_cand AS DOUBLE) / n_true_pairs, 6)
                     AS pair_completeness,
                   round(1 - n_cand_pairs
                           / (n_records * (n_records - 1) / 2.0), 6)
                     AS reduction_ratio
            FROM n, nt, fc, fct
            UNION ALL
            SELECT 'last_char', n_records, n_blocks, n_cand_pairs,
                   n_true_pairs, n_true_cand,
                   round(CAST(n_true_cand AS DOUBLE) / n_true_pairs, 6),
                   round(1 - n_cand_pairs
                           / (n_records * (n_records - 1) / 2.0), 6)
            FROM n, nt, lc, lct""",
        # replays the exact Laplace m/u arithmetic and the left-assoc
        # weight sum so the double-precision result matches to 1e-6
        "fellegi_sunter": f"""
            WITH {TOKENS_CTE},
            base AS (SELECT DISTINCT lower(token) AS a FROM tokens),
            pairs AS (
              SELECT a, a || 's' AS b, TRUE AS is_match FROM base
              UNION ALL
              SELECT a, reverse(a) || 'qq', FALSE FROM base),
            g AS (
              SELECT a, b, is_match,
                     CAST(substr(a, 1, 1) = substr(b, 1, 1) AS INT)
                       AS f_first,
                     CAST(abs(length(a) - length(b)) <= 1 AS INT) AS f_len,
                     CAST(substr(a, 1, 3) = substr(b, 1, 3) AS INT)
                       AS f_pre3,
                     (length(a) % 2 = 0) AS labeled
              FROM pairs),
            p AS (
              SELECT sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS nm,
                     sum(CASE WHEN is_match THEN 0 ELSE 1 END) AS nu,
                     sum(CASE WHEN is_match THEN f_first ELSE 0 END) AS maf,
                     sum(CASE WHEN is_match THEN 0 ELSE f_first END) AS uaf,
                     sum(CASE WHEN is_match THEN f_len ELSE 0 END) AS mal,
                     sum(CASE WHEN is_match THEN 0 ELSE f_len END) AS ual,
                     sum(CASE WHEN is_match THEN f_pre3 ELSE 0 END) AS map3,
                     sum(CASE WHEN is_match THEN 0 ELSE f_pre3 END) AS uap3
              FROM g WHERE labeled),
            w AS (
              SELECT a, b,
                     log2((nm + 1) / CAST(nu + 1 AS DOUBLE))
                     + CASE WHEN f_first = 1
                         THEN log2(((maf + 1) / CAST(nm + 2 AS DOUBLE))
                                   / ((uaf + 1) / CAST(nu + 2 AS DOUBLE)))
                         ELSE log2((1 - (maf + 1) / CAST(nm + 2 AS DOUBLE))
                                   / (1 - (uaf + 1)
                                          / CAST(nu + 2 AS DOUBLE))) END
                     + CASE WHEN f_len = 1
                         THEN log2(((mal + 1) / CAST(nm + 2 AS DOUBLE))
                                   / ((ual + 1) / CAST(nu + 2 AS DOUBLE)))
                         ELSE log2((1 - (mal + 1) / CAST(nm + 2 AS DOUBLE))
                                   / (1 - (ual + 1)
                                          / CAST(nu + 2 AS DOUBLE))) END
                     + CASE WHEN f_pre3 = 1
                         THEN log2(((map3 + 1) / CAST(nm + 2 AS DOUBLE))
                                   / ((uap3 + 1) / CAST(nu + 2 AS DOUBLE)))
                         ELSE log2((1 - (map3 + 1) / CAST(nm + 2 AS DOUBLE))
                                   / (1 - (uap3 + 1)
                                          / CAST(nu + 2 AS DOUBLE))) END
                       AS wt
              FROM g, p)
            SELECT a, b, round(wt, 6) AS match_weight,
                   round(1 / (1 + pow(2.0, -wt)), 6) AS match_probability,
                   CASE WHEN round(wt, 6) >= 2.0 THEN 'link'
                        WHEN round(wt, 6) <= -2.0 THEN 'non-link'
                        ELSE 'possible-link' END AS decision
            FROM w""",
        # unrolls both EM rounds with op-identical arithmetic: init
        # constants appear as (1 - 0.8)-style expressions because the
        # Spark side computes them the same way (python 1-m), and the
        # left-assoc product/sum orders mirror the operator's exprs
        "fellegi_sunter_em": f"""
            WITH {TOKENS_CTE},
            base AS (SELECT DISTINCT lower(token) AS a FROM tokens),
            pairs AS (
              SELECT a, a || 's' AS b FROM base
              UNION ALL
              SELECT a, reverse(a) || 'qq' FROM base),
            g AS (
              SELECT a, b,
                     CAST(substr(a, 1, 1) = substr(b, 1, 1) AS INT) AS f1,
                     CAST(abs(length(a) - length(b)) <= 1 AS INT) AS f2,
                     CAST(substr(a, 1, 3) = substr(b, 1, 3) AS INT) AS f3
              FROM pairs),
            e1 AS (
              SELECT g.*,
                     (0.5 * (((CASE WHEN f1 = 1 THEN 0.8
                                    ELSE (1 - 0.8) END)
                              * (CASE WHEN f2 = 1 THEN 0.8
                                      ELSE (1 - 0.8) END))
                             * (CASE WHEN f3 = 1 THEN 0.8
                                     ELSE (1 - 0.8) END)))
                     / ((0.5 * (((CASE WHEN f1 = 1 THEN 0.8
                                       ELSE (1 - 0.8) END)
                                 * (CASE WHEN f2 = 1 THEN 0.8
                                         ELSE (1 - 0.8) END))
                                * (CASE WHEN f3 = 1 THEN 0.8
                                        ELSE (1 - 0.8) END)))
                        + ((1 - 0.5)
                           * (((CASE WHEN f1 = 1 THEN 0.2
                                     ELSE (1 - 0.2) END)
                               * (CASE WHEN f2 = 1 THEN 0.2
                                       ELSE (1 - 0.2) END))
                              * (CASE WHEN f3 = 1 THEN 0.2
                                      ELSE (1 - 0.2) END)))) AS r
              FROM g),
            p1 AS (
              SELECT (sum(r) + 1) / (count(*) + 2) AS lam,
                     (sum(r * f1) + 1) / (sum(r) + 2) AS m1,
                     (sum(f1) - sum(r * f1) + 1)
                       / ((count(*) - sum(r)) + 2) AS u1,
                     (sum(r * f2) + 1) / (sum(r) + 2) AS m2,
                     (sum(f2) - sum(r * f2) + 1)
                       / ((count(*) - sum(r)) + 2) AS u2,
                     (sum(r * f3) + 1) / (sum(r) + 2) AS m3,
                     (sum(f3) - sum(r * f3) + 1)
                       / ((count(*) - sum(r)) + 2) AS u3
              FROM e1),
            e2 AS (
              SELECT g.*,
                     (lam * (((CASE WHEN f1 = 1 THEN m1
                                    ELSE (1 - m1) END)
                              * (CASE WHEN f2 = 1 THEN m2
                                      ELSE (1 - m2) END))
                             * (CASE WHEN f3 = 1 THEN m3
                                     ELSE (1 - m3) END)))
                     / ((lam * (((CASE WHEN f1 = 1 THEN m1
                                       ELSE (1 - m1) END)
                                 * (CASE WHEN f2 = 1 THEN m2
                                         ELSE (1 - m2) END))
                                * (CASE WHEN f3 = 1 THEN m3
                                        ELSE (1 - m3) END)))
                        + ((1 - lam)
                           * (((CASE WHEN f1 = 1 THEN u1
                                     ELSE (1 - u1) END)
                               * (CASE WHEN f2 = 1 THEN u2
                                       ELSE (1 - u2) END))
                              * (CASE WHEN f3 = 1 THEN u3
                                      ELSE (1 - u3) END)))) AS r
              FROM g, p1),
            p2 AS (
              SELECT (sum(r) + 1) / (count(*) + 2) AS lam,
                     (sum(r * f1) + 1) / (sum(r) + 2) AS m1,
                     (sum(f1) - sum(r * f1) + 1)
                       / ((count(*) - sum(r)) + 2) AS u1,
                     (sum(r * f2) + 1) / (sum(r) + 2) AS m2,
                     (sum(f2) - sum(r * f2) + 1)
                       / ((count(*) - sum(r)) + 2) AS u2,
                     (sum(r * f3) + 1) / (sum(r) + 2) AS m3,
                     (sum(f3) - sum(r * f3) + 1)
                       / ((count(*) - sum(r)) + 2) AS u3
              FROM e2),
            w AS (
              SELECT a, b,
                     log2(lam / (1 - lam))
                     + CASE WHEN f1 = 1 THEN log2(m1 / u1)
                            ELSE log2((1 - m1) / (1 - u1)) END
                     + CASE WHEN f2 = 1 THEN log2(m2 / u2)
                            ELSE log2((1 - m2) / (1 - u2)) END
                     + CASE WHEN f3 = 1 THEN log2(m3 / u3)
                            ELSE log2((1 - m3) / (1 - u3)) END AS wt
              FROM g, p2)
            SELECT a, b, round(wt, 6) AS match_weight,
                   round(1 / (1 + pow(2.0, -wt)), 6) AS match_probability,
                   CASE WHEN round(wt, 6) >= 2.0 THEN 'link'
                        WHEN round(wt, 6) <= -2.0 THEN 'non-link'
                        ELSE 'possible-link' END AS decision
            FROM w""",
        "kg_align": """
            WITH ka AS (
              SELECT 'c' || CAST(c_custkey AS VARCHAR) AS ent_a,
                     pred, obj
              FROM (SELECT c_custkey, 'in_nation' AS pred,
                           'nation:' || CAST(c_nationkey AS VARCHAR)
                             AS obj FROM customer
                    UNION ALL
                    SELECT c_custkey, 'acct_band',
                           'band:' || CAST(c_custkey % 211 AS VARCHAR)
                    FROM customer
                    UNION ALL
                    SELECT c_custkey, 'in_segment', c_mktsegment
                    FROM customer)),
            kb AS (
              SELECT 'w' || CAST(c_custkey AS VARCHAR) AS ent_b,
                     pred, obj
              FROM (SELECT c_custkey, 'in_nation' AS pred,
                           'nation:' || CAST(c_nationkey AS VARCHAR)
                             AS obj FROM customer
                    UNION ALL
                    SELECT c_custkey, 'acct_band',
                           'band:' || CAST(c_custkey % 211 AS VARCHAR)
                    FROM customer
                    UNION ALL
                    SELECT c_custkey, 'in_segment', c_mktsegment
                    FROM customer WHERE c_custkey % 5 <> 0)
              WHERE c_custkey % 3 <> 0),
            fa0 AS (SELECT DISTINCT * FROM ka),
            fb0 AS (SELECT DISTINCT * FROM kb),
            dfa AS (SELECT pred, obj, count(*) AS c FROM fa0
                    GROUP BY 1, 2),
            dfb AS (SELECT pred, obj, count(*) AS c FROM fb0
                    GROUP BY 1, 2),
            keep AS (
              SELECT pred, obj
              FROM dfa FULL OUTER JOIN dfb USING (pred, obj)
              WHERE coalesce(dfa.c, 0)
                      <= 0.05 * (SELECT count(DISTINCT ent_a) FROM fa0)
                AND coalesce(dfb.c, 0)
                      <= 0.05 * (SELECT count(DISTINCT ent_b) FROM fb0)),
            fa AS (SELECT fa0.* FROM fa0 JOIN keep USING (pred, obj)),
            fb AS (SELECT fb0.* FROM fb0 JOIN keep USING (pred, obj)),
            na AS (SELECT ent_a, CAST(count(*) AS BIGINT) AS n_a
                   FROM fa GROUP BY 1),
            nb AS (SELECT ent_b, CAST(count(*) AS BIGINT) AS n_b
                   FROM fb GROUP BY 1),
            sh AS (SELECT ent_a, ent_b,
                          CAST(count(*) AS BIGINT) AS n_shared
                   FROM fa JOIN fb USING (pred, obj) GROUP BY 1, 2),
            sc AS (SELECT sh.ent_a, sh.ent_b, n_shared, n_a, n_b,
                          n_shared / (n_a + n_b - n_shared) AS j
                   FROM sh JOIN na USING (ent_a) JOIN nb USING (ent_b)
                   WHERE n_shared / (n_a + n_b - n_shared) >= 0.5),
            m AS (SELECT *,
                         row_number() OVER (PARTITION BY ent_a
                           ORDER BY j DESC, ent_b ASC) AS ra,
                         row_number() OVER (PARTITION BY ent_b
                           ORDER BY j DESC, ent_a ASC) AS rb
                  FROM sc)
            SELECT ent_a, ent_b, n_shared, n_a, n_b,
                   round(j, 6) AS jaccard
            FROM m WHERE ra = 1 AND rb = 1""",
        "partition_quality": f"""
            WITH {HOST_EDGES_CTE},
            nodes AS (SELECT src AS node FROM hedges
                      UNION SELECT dst FROM hedges),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes
                    FROM nodes),
            te AS (SELECT CAST(count(*) AS BIGINT) AS n_edges
                   FROM hedges),
            hp AS (SELECT node,
                          CAST('0x' || substr(md5(node), 1, 8) AS BIGINT)
                            % 4 AS part
                   FROM nodes),
            rp AS (SELECT node,
                          CAST(ntile(4) OVER (ORDER BY node) - 1
                               AS BIGINT) AS part
                   FROM nodes),
            hcut AS (SELECT CAST(sum(CASE WHEN p1.part <> p2.part
                                          THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_cut
                     FROM hedges e JOIN hp p1 ON e.src = p1.node
                                   JOIN hp p2 ON e.dst = p2.node),
            rcut AS (SELECT CAST(sum(CASE WHEN p1.part <> p2.part
                                          THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_cut
                     FROM hedges e JOIN rp p1 ON e.src = p1.node
                                   JOIN rp p2 ON e.dst = p2.node),
            hload AS (SELECT CAST(max(nl) AS BIGINT) AS max_load,
                             CAST(min(nl) AS BIGINT) AS min_load
                      FROM (SELECT count(*) AS nl FROM hp
                            GROUP BY part)),
            rload AS (SELECT CAST(max(nl) AS BIGINT) AS max_load,
                             CAST(min(nl) AS BIGINT) AS min_load
                      FROM (SELECT count(*) AS nl FROM rp
                            GROUP BY part))
            SELECT 'hash' AS strategy, CAST(4 AS BIGINT) AS k,
                   n_nodes, n_edges, n_cut,
                   round(n_cut / CAST(n_edges AS DOUBLE), 6)
                     AS cut_fraction,
                   max_load, min_load,
                   round(max_load / (n_nodes / 4.0), 6) AS imbalance
            FROM tot, te, hcut, hload
            UNION ALL
            SELECT 'range', CAST(4 AS BIGINT), n_nodes, n_edges, n_cut,
                   round(n_cut / CAST(n_edges AS DOUBLE), 6),
                   max_load, min_load,
                   round(max_load / (n_nodes / 4.0), 6)
            FROM tot, te, rcut, rload""",
        # unrolls both GD steps; margins are written in the operator's
        # left-assoc order and the zero-init step-1 sigmoid is the
        # exact constant 0.5
        "logreg_quality": """
            WITH g AS (
              SELECT doc_id, 1.0 AS x_bias, n_chars / 1000.0 AS x_len,
                     (doc_id % 3) / 2.0 AS x_mod,
                     CAST(doc_id % 3 = 0 AS INT) AS y
              FROM documents),
            s1 AS (
              SELECT count(*) AS n,
                     sum((CAST(y AS DOUBLE) - 0.5) * x_bias) AS g1,
                     sum((CAST(y AS DOUBLE) - 0.5) * x_len) AS g2,
                     sum((CAST(y AS DOUBLE) - 0.5) * x_mod) AS g3
              FROM g),
            w1 AS (
              SELECT 0.0 + 2.0 * (g1 / n) AS w_bias,
                     0.0 + 2.0 * (g2 / n) AS w_len,
                     0.0 + 2.0 * (g3 / n) AS w_mod
              FROM s1),
            s2 AS (
              SELECT count(*) AS n,
                     sum((CAST(y AS DOUBLE)
                          - 1.0 / (1.0 + exp(-(((0.0 + w_bias * x_bias)
                                                + w_len * x_len)
                                               + w_mod * x_mod))))
                         * x_bias) AS g1,
                     sum((CAST(y AS DOUBLE)
                          - 1.0 / (1.0 + exp(-(((0.0 + w_bias * x_bias)
                                                + w_len * x_len)
                                               + w_mod * x_mod))))
                         * x_len) AS g2,
                     sum((CAST(y AS DOUBLE)
                          - 1.0 / (1.0 + exp(-(((0.0 + w_bias * x_bias)
                                                + w_len * x_len)
                                               + w_mod * x_mod))))
                         * x_mod) AS g3
              FROM g, w1),
            w2 AS (
              SELECT w_bias + 2.0 * (g1 / n) AS w_bias,
                     w_len + 2.0 * (g2 / n) AS w_len,
                     w_mod + 2.0 * (g3 / n) AS w_mod
              FROM s2, w1),
            sc AS (
              SELECT g.*,
                     1.0 / (1.0 + exp(-(((0.0 + w_bias * x_bias)
                                         + w_len * x_len)
                                        + w_mod * x_mod))) AS p
              FROM g, w2)
            SELECT doc_id, x_bias, x_len, x_mod, y,
                   round(p, 6) AS p_hat, p >= 0.5 AS pred
            FROM sc""",
        "rendezvous_shards": """
            WITH w8 AS (
              SELECT doc_id, s,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || '#'
                                              || CAST(s AS VARCHAR)),
                                         1, 8) AS BIGINT) AS wt
              FROM documents, unnest(range(0, 8)) AS u(s)),
            a AS (
              SELECT doc_id, CAST(s AS BIGINT) AS shard FROM (
                SELECT doc_id, s, row_number() OVER (
                  PARTITION BY doc_id ORDER BY wt DESC, s ASC) AS rn
                FROM w8) WHERE rn = 1),
            w9 AS (
              SELECT doc_id, s,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                              || '#'
                                              || CAST(s AS VARCHAR)),
                                         1, 8) AS BIGINT) AS wt
              FROM documents, unnest(range(0, 9)) AS u(s)),
            b AS (
              SELECT doc_id, CAST(s AS BIGINT) AS shard_resized FROM (
                SELECT doc_id, s, row_number() OVER (
                  PARTITION BY doc_id ORDER BY wt DESC, s ASC) AS rn
                FROM w9) WHERE rn = 1)
            SELECT a.doc_id, a.shard, b.shard_resized,
                   a.shard <> b.shard_resized AS moved
            FROM a JOIN b USING (doc_id)""",
        "sorted_neighborhood": f"""
            WITH {TOKENS_CTE},
            base AS (SELECT DISTINCT lower(token) AS name FROM tokens),
            fwd AS (SELECT name, lead(name, 1) OVER w AS b1,
                           lead(name, 2) OVER w AS b2
                    FROM base WINDOW w AS (ORDER BY name)),
            rev AS (SELECT name, lead(name, 1) OVER w AS b1,
                           lead(name, 2) OVER w AS b2
                    FROM base WINDOW w AS (ORDER BY reverse(name), name))
            SELECT 'fwd' AS pass, name AS a, b1 AS b,
                   CAST(1 AS BIGINT) AS gap FROM fwd WHERE b1 IS NOT NULL
            UNION ALL SELECT 'fwd', name, b2, CAST(2 AS BIGINT)
                      FROM fwd WHERE b2 IS NOT NULL
            UNION ALL SELECT 'rev', name, b1, CAST(1 AS BIGINT)
                      FROM rev WHERE b1 IS NOT NULL
            UNION ALL SELECT 'rev', name, b2, CAST(2 AS BIGINT)
                      FROM rev WHERE b2 IS NOT NULL""",
        "anf_reach": """
            WITH e AS (
              SELECT DISTINCT s, d FROM (
                SELECT 'p' || CAST(doc_id AS VARCHAR) AS s,
                       'p' || CAST(doc_id % 211 AS VARCHAR) AS d
                FROM documents
                UNION ALL
                SELECT 'p' || CAST(doc_id AS VARCHAR),
                       'p' || CAST((doc_id * 7) % 211 AS VARCHAR)
                FROM documents)
              WHERE s <> d),
            nodes AS (SELECT DISTINCT s AS node FROM e
                      UNION SELECT DISTINCT d FROM e),
            init AS (
              SELECT node,
                     (CAST(1 AS BIGINT)
                      << least(bit_count((h & -h) - 1), 24)) AS sketch
              FROM (SELECT node,
                           CAST('0x' || substr(md5(node), 1, 8) AS BIGINT)
                             AS h
                    FROM nodes)),
            r1 AS (
              SELECT i.node, i.sketch | coalesce(bit_or(n.sketch), 0)
                       AS sketch
              FROM init i LEFT JOIN e ON e.s = i.node
              LEFT JOIN init n ON n.node = e.d
              GROUP BY i.node, i.sketch),
            r2 AS (
              SELECT i.node, i.sketch | coalesce(bit_or(n.sketch), 0)
                       AS sketch
              FROM r1 i LEFT JOIN e ON e.s = i.node
              LEFT JOIN r1 n ON n.node = e.d
              GROUP BY i.node, i.sketch)
            SELECT node, sketch,
                   CAST(bit_count(xor(sketch, sketch + 1)) - 1 AS INT)
                     AS fm_bit,
                   pow(CAST(2 AS DOUBLE),
                       bit_count(xor(sketch, sketch + 1)) - 1) / 0.77351
                     AS est_reach
            FROM r2""",
        "html_tables": """
            WITH pages AS (
              SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     '<html><body><table><tr><td>doc '
                     || CAST(doc_id AS VARCHAR) || '</td><td>' || lang
                     || '</td></tr><tr><td>' || source || '</td><td>'
                     || CAST(n_chars AS VARCHAR) || '</td></tr></table>'
                     || CASE WHEN doc_id % 4 = 0
                             THEN '<table><tr><td>extra '
                                  || CAST(doc_id % 7 AS VARCHAR)
                                  || '</td></tr></table>'
                             ELSE '' END
                     || '</body></html>' AS html
              FROM documents),
            t1 AS (
              SELECT url, generate_subscripts(a, 1) - 1 AS table_idx,
                     unnest(a) AS tbl
              FROM (SELECT url, regexp_extract_all(html,
                             '(?s)<table>(.*?)</table>', 1) AS a
                    FROM pages)),
            t2 AS (
              SELECT url, table_idx,
                     generate_subscripts(r, 1) - 1 AS row_idx,
                     unnest(r) AS rw
              FROM (SELECT url, table_idx, regexp_extract_all(tbl,
                             '(?s)<tr>(.*?)</tr>', 1) AS r
                    FROM t1)),
            t3 AS (
              SELECT url, table_idx, row_idx,
                     generate_subscripts(c, 1) - 1 AS col_idx,
                     unnest(c) AS cell
              FROM (SELECT url, table_idx, row_idx, regexp_extract_all(rw,
                             '(?s)<td>(.*?)</td>', 1) AS c
                    FROM t2))
            SELECT url, CAST(table_idx AS BIGINT) AS table_idx,
                   CAST(row_idx AS BIGINT) AS row_idx,
                   CAST(col_idx AS BIGINT) AS col_idx, cell
            FROM t3""",
        "anchor_commonness": """
            WITH pages AS (
              SELECT '<p><a href="https://e' || CAST(doc_id % 7 AS VARCHAR)
                       || '.org/page" class="x">Entity '
                       || CAST(doc_id % 7 AS VARCHAR)
                       || '</a> and <a href="https://e'
                       || CAST(doc_id % 5 AS VARCHAR)
                       || '.org/other">alias '
                       || CAST(doc_id % 11 AS VARCHAR)
                       || '</a></p>' AS html
              FROM documents),
            x AS (
              SELECT regexp_extract_all(html,
                       'href="(https?://[^"]*)"[^>]*>([^<]*)<', 1) AS hs,
                     regexp_extract_all(html,
                       'href="(https?://[^"]*)"[^>]*>([^<]*)<', 2) AS ts
              FROM pages),
            a AS (SELECT unnest(hs) AS dst_url, unnest(ts) AS anchor FROM x),
            cnt AS (
              SELECT trim(anchor) AS anchor,
                     lower(regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS dst_host,
                     CAST(count(*) AS BIGINT) AS n_refs
              FROM a WHERE trim(anchor) <> ''
              GROUP BY 1, 2)
            SELECT anchor, dst_host, n_refs,
                   CAST(sum(n_refs) OVER (PARTITION BY anchor) AS BIGINT)
                     AS n_anchor_total,
                   round(CAST(n_refs AS DOUBLE)
                         / sum(n_refs) OVER (PARTITION BY anchor), 6)
                     AS prior,
                   (ROW_NUMBER() OVER (PARTITION BY anchor
                                       ORDER BY n_refs DESC, dst_host) = 1)
                     AS is_top
            FROM cnt""",
        "host_boilerplate": """
            WITH pages AS (
              SELECT source || '.example.org' AS host,
                     'https://' || source || '.example.org/doc/'
                       || CAST(doc_id AS VARCHAR) AS u,
                     text || chr(10) || '(c) ' || source || ' footer'
                       || CASE WHEN doc_id % 2 = 0
                               THEN chr(10) || 'privacy policy'
                               ELSE '' END AS text
              FROM documents),
            np AS (SELECT host, CAST(count(DISTINCT u) AS BIGINT) AS n_pages
                   FROM pages GROUP BY host),
            lines AS (
              SELECT host, u, unnest(string_split(text, chr(10))) AS line
              FROM pages),
            pl AS (SELECT host, line, count(DISTINCT u) AS n_docs
                   FROM lines WHERE line <> '' GROUP BY host, line)
            SELECT pl.host, np.n_pages,
                   CAST(count(*) AS BIGINT) AS n_distinct_lines,
                   CAST(sum(CASE WHEN n_docs >= ceil(0.5 * n_pages)
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_boiler_lines,
                   round(sum(CASE WHEN n_docs >= ceil(0.5 * n_pages)
                                  THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) AS boiler_rate
            FROM pl JOIN np USING (host)
            GROUP BY pl.host, np.n_pages""",
        "cocitation_hosts": f"""
            WITH {HOST_EDGES_CTE.strip()},
            e AS (SELECT DISTINCT src AS s, dst AS d FROM hedges),
            co AS (SELECT x.d AS a, y.d AS b,
                          CAST(count(*) AS BIGINT) AS n_cocited
                   FROM e x JOIN e y ON x.s = y.s AND x.d < y.d
                   GROUP BY 1, 2),
            bc AS (SELECT x.s AS a, y.s AS b,
                          CAST(count(*) AS BIGINT) AS n_coupled
                   FROM e x JOIN e y ON x.d = y.d AND x.s < y.s
                   GROUP BY 1, 2)
            SELECT coalesce(co.a, bc.a) AS a, coalesce(co.b, bc.b) AS b,
                   coalesce(n_cocited, 0) AS n_cocited,
                   coalesce(n_coupled, 0) AS n_coupled
            FROM co FULL OUTER JOIN bc ON co.a = bc.a AND co.b = bc.b
            WHERE coalesce(n_cocited, 0) >= 1
               OR coalesce(n_coupled, 0) >= 1""",
        # oracle asserts the recovered facts equal the source columns the
        # fixture published into the table (independent re-derivation, like
        # jsonld_triples); the header-only second table must add nothing
        "table_triples": """
            SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                     AS url,
                   'doc ' || CAST(doc_id AS VARCHAR) AS subj, pred, obj
            FROM documents,
                 LATERAL (VALUES ('lang', lang), ('source', source))
                   AS t(pred, obj)""",
        "winnow_fingerprint": r"""
            WITH base AS (
              SELECT doc_id,
                     regexp_replace(lower(coalesce(text, '')),
                                    '[^ -~]', '', 'g') AS c
              FROM documents),
            b2 AS (SELECT doc_id, c,
                          CAST(length(c) - 7 AS BIGINT) AS n_windows
                   FROM base WHERE length(c) >= 8),
            grams AS (
              SELECT doc_id, n_windows, i AS pos,
                     (ascii(substring(c, i, 1)) * 923521
                      + ascii(substring(c, i + 1, 1)) * 29791
                      + ascii(substring(c, i + 2, 1)) * 961
                      + ascii(substring(c, i + 3, 1)) * 31
                      + ascii(substring(c, i + 4, 1))) % 1048573 AS gh
              FROM b2, unnest(range(1, length(c) - 3)) AS u(i)),
            fps AS (
              SELECT doc_id, n_windows, pos,
                     min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW
                                   AND 3 FOLLOWING) AS fp
              FROM grams)
            SELECT doc_id, n_windows,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_fps,
                   min(fp) AS min_fp,
                   CAST(sum(DISTINCT fp) AS BIGINT) AS fp_sum
            FROM fps WHERE pos <= n_windows
            GROUP BY doc_id, n_windows""",
        "tokenize_explode": f"""
            WITH {TOKENS_CTE}
            SELECT doc_id, pos, token FROM tokens""",
        "token_freq": f"""
            WITH {TOKENS_CTE}
            SELECT token, count(*) AS freq FROM tokens GROUP BY token""",
        "rare_tokens": f"""
            WITH {TOKENS_CTE}
            SELECT token, count(*) AS freq FROM tokens
            GROUP BY token HAVING count(*) <= {RARE_MAX}""",
        "vocab_ids": f"""
            WITH {TOKENS_CTE}, {VOCAB_CTE}
            SELECT token, token_id FROM vocab""",
        "bio_chunks": f"""
            WITH {_chunks_cte_sql(TAG_CASE, 'g')}
            SELECT seq_id, label, chunk_start, chunk_end FROM g_chunks""",
        "entity_link": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE}
            SELECT doc_id, pos, token, label, canonical_id FROM linked""",
        "canonicalize_salted": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE}
            SELECT canonical_id, label,
                   count(*) AS n_mentions,
                   count(DISTINCT doc_id) AS n_docs
            FROM linked GROUP BY canonical_id, label""",
        "triples_cooccur": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked)
            SELECT a.canonical_id AS subj, 'cooccurs_with' AS pred,
                   b.canonical_id AS obj, count(*) AS n_docs,
                   CAST(min(a.doc_id) AS BIGINT) AS first_doc
            FROM ents a JOIN ents b
              ON a.doc_id = b.doc_id AND a.canonical_id < b.canonical_id
            GROUP BY 1, 2, 3""",
        "eval_prf": _eval_oracle_sql("chunk_start, chunk_end"),
        "split_folds": f"""
            SELECT ((o_orderkey * {KNUTH}) % {HASH_MOD}) % 5 AS fold,
                   count(*) AS n_orders,
                   min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
            FROM orders GROUP BY 1""",
        "top1_per_user": """
            SELECT user_id, event_id, value FROM (
              SELECT user_id, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rn
              FROM events) WHERE rn = 1""",
        "sessionize": """
            WITH lagged AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS us,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS prev_us
              FROM events),
            brk AS (
              SELECT *, CASE WHEN prev_us IS NULL THEN 1
                             WHEN us - prev_us > 1800000000 THEN 1
                             ELSE 0 END AS new_session
              FROM lagged),
            sid AS (
              SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                               ORDER BY us, event_id
                                               ROWS UNBOUNDED PRECEDING) AS session_id
              FROM brk)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(us) AS session_start_us, max(us) AS session_end_us,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM sid GROUP BY user_id, session_id""",
        "window_agg": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                   event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2""",
        "table_profile": """
            WITH stacked AS (
              SELECT 'doc_id' AS column_name, CAST(doc_id AS VARCHAR) AS value FROM documents
              UNION ALL
              SELECT 'lang', CAST(lang AS VARCHAR) FROM documents
              UNION ALL
              SELECT 'source', CAST(source AS VARCHAR) FROM documents
              UNION ALL
              SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents)
            SELECT column_name,
                   count(*) AS n_rows,
                   count(value) AS n_nonnull,
                   CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM stacked GROUP BY column_name""",
        "funnel_conversion": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
            u1 AS (SELECT user_id, min(us) AS t FROM e
                   WHERE event_type = 'view' GROUP BY user_id),
            u2 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN u1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.us > u1.t GROUP BY e.user_id),
            u3 AS (SELECT e.user_id, min(e.us) AS t FROM e JOIN u2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.us > u2.t GROUP BY e.user_id),
            c AS (SELECT (SELECT count(*) FROM u1) AS n1,
                         (SELECT count(*) FROM u2) AS n2,
                         (SELECT count(*) FROM u3) AS n3)
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                   CAST(n1 AS BIGINT) AS n_users,
                   round(n1 / greatest(n1, 1), 6) AS conv_rate FROM c
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'click', CAST(n2 AS BIGINT),
                   round(n2 / greatest(n1, 1), 6) FROM c
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'purchase', CAST(n3 AS BIGINT),
                   round(n3 / greatest(n1, 1), 6) FROM c""",
        "cohort_retention": """
            WITH w AS (SELECT user_id,
                              CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
                       FROM events),
            f AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY user_id),
            a AS (SELECT DISTINCT w.user_id, f.cohort_week,
                         w.wk - f.cohort_week AS week_offset
                  FROM w JOIN f USING (user_id)),
            c AS (SELECT cohort_week, week_offset,
                         CAST(count(*) AS BIGINT) AS n_users
                  FROM a GROUP BY 1, 2)
            SELECT cohort_week, week_offset, n_users,
                   round(n_users / max(CASE WHEN week_offset = 0 THEN n_users END)
                                   OVER (PARTITION BY cohort_week), 6) AS retention
            FROM c""",
        "mixture_weights": """
            WITH per AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(CASE WHEN trim(text) = '' THEN 0
                              ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+'))
                                        AS BIGINT) END) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source),
            shares AS (
              SELECT *,
                     CASE WHEN sum(n_tokens) OVER () = 0 THEN 0.0
                          ELSE n_tokens / sum(n_tokens) OVER () END AS share
              FROM per),
            raws AS (SELECT *, pow(share, 0.5) AS raw FROM shares),
            weights AS (
              SELECT *,
                     CASE WHEN sum(raw) OVER () = 0 THEN 0.0
                          ELSE raw / sum(raw) OVER () END AS weight
              FROM raws)
            SELECT source, n_docs, n_tokens,
                   round(share, 6) AS token_share,
                   round(weight, 6) AS weight,
                   round(CASE WHEN share = 0 THEN 0.0
                         ELSE weight / share END, 6) AS oversample
            FROM weights""",
        "event_transitions": """
            WITH pairs AS (
              SELECT user_id, event_type AS from_type,
                     lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS to_type
              FROM events),
            agg AS (
              SELECT from_type, to_type, count(*) AS n_transitions
              FROM pairs WHERE to_type IS NOT NULL
              GROUP BY from_type, to_type)
            SELECT from_type, to_type,
                   CAST(n_transitions AS BIGINT) AS n_transitions,
                   round(n_transitions
                         / sum(n_transitions) OVER (PARTITION BY from_type)::DOUBLE,
                         6) AS p
            FROM agg""",
        "mixture_sample": f"""
            WITH per AS (
              SELECT source, count(*) AS n_docs,
                     CAST(sum(CASE WHEN trim(text) = '' THEN 0
                              ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+'))
                                        AS BIGINT) END) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source),
            shares AS (
              SELECT *,
                     CASE WHEN sum(n_tokens) OVER () = 0 THEN 0.0
                          ELSE n_tokens / sum(n_tokens) OVER () END AS share
              FROM per),
            raws AS (SELECT *, pow(share, 0.5) AS raw FROM shares),
            weights AS (
              SELECT *,
                     CASE WHEN sum(raw) OVER () = 0 THEN 0.0
                          ELSE raw / sum(raw) OVER () END AS weight
              FROM raws),
            mix AS (
              SELECT source,
                     round(CASE WHEN share = 0 THEN 0.0
                           ELSE weight / share END, 6) AS oversample
              FROM weights)
            SELECT d.doc_id, d.source,
                   floor(least(1.0, 0.5 * m.oversample) * 1000000)
                     / 1000000.0 AS keep_rate
            FROM documents d JOIN mix m USING (source)
            WHERE ((d.doc_id * {KNUTH}) % {HASH_MOD}) % 1000000
                  < floor(least(1.0, 0.5 * m.oversample) * 1000000)""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS sum_disc_price,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(5,4)))
                            * (1 + CAST(l_tax AS DECIMAL(5,4)))), 6) AS DOUBLE) AS sum_charge,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "tpch_q3_top10": """
            SELECT o_orderkey,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "tpch_q5_nation": """
            SELECT r_name, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name""",
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*) AS n_docs,
                   min(doc_id) AS min_doc_id
            FROM documents GROUP BY md5(text)""",
        "minhash_signatures": f"""
            WITH {TOKENS_CTE}, {SHINGLES_CTE}, {SIGS_CTE}
            SELECT doc_id, CAST(seed_id AS BIGINT) AS seed_id, minhash FROM sigs""",
        "minhash_candidates": f"""
            WITH {TOKENS_CTE}, {SHINGLES_CTE}, {SIGS_CTE}, {CANDIDATES_CTE}
            SELECT doc_a, doc_b FROM cand""",
        "ngram_jaccard": f"""
            WITH {TOKENS_CTE}, {SHINGLES_CTE}, {SIGS_CTE}, {CANDIDATES_CTE},
            sizes AS (SELECT doc_id, count(*) AS n_tok FROM shingles GROUP BY doc_id),
            common AS (
              SELECT c.doc_a, c.doc_b, count(*) AS n_common
              FROM cand c
              JOIN shingles ta ON ta.doc_id = c.doc_a
              JOIN shingles tb ON tb.doc_id = c.doc_b AND tb.shingle = ta.shingle
              GROUP BY c.doc_a, c.doc_b)
            SELECT m.doc_a, m.doc_b, m.n_common,
                   sa.n_tok + sb.n_tok - m.n_common AS n_union,
                   round(m.n_common / (sa.n_tok + sb.n_tok - m.n_common)::DOUBLE, 6) AS jaccard
            FROM common m
            JOIN sizes sa ON sa.doc_id = m.doc_a
            JOIN sizes sb ON sb.doc_id = m.doc_b""",
        "ngram_containment": f"""
            WITH {TOKENS_CTE}, {SHINGLES_CTE}, {SIGS_CTE}, {CANDIDATES_CTE},
            sizes AS (SELECT doc_id, count(*) AS n_sh
                      FROM shingles GROUP BY doc_id),
            common AS (
              SELECT c.doc_a, c.doc_b, count(*) AS n_common
              FROM cand c
              JOIN shingles ta ON ta.doc_id = c.doc_a
              JOIN shingles tb ON tb.doc_id = c.doc_b
                              AND tb.shingle = ta.shingle
              GROUP BY c.doc_a, c.doc_b)
            SELECT m.doc_a, m.doc_b, m.n_common,
                   sa.n_sh AS n_a, sb.n_sh AS n_b,
                   round(m.n_common / sa.n_sh::DOUBLE, 6) AS cont_a,
                   round(m.n_common / sb.n_sh::DOUBLE, 6) AS cont_b
            FROM common m
            JOIN sizes sa ON sa.doc_id = m.doc_a
            JOIN sizes sb ON sb.doc_id = m.doc_b""",
        "ppr_hosts": f"""
            WITH {HOST_EDGES_CTE.strip()},
            sym AS (SELECT src AS a, dst AS b FROM hedges
                    UNION SELECT dst AS a, src AS b FROM hedges),
            outdeg AS (SELECT a, count(*) AS outdeg FROM sym GROUP BY a),
            sv AS (SELECT a AS node,
                          CASE WHEN a IN ('src3.example.org',
                                          'src5.example.org')
                               THEN 0.5 ELSE 0.0 END AS s
                   FROM outdeg),
            pr0 AS (SELECT node, s AS pr FROM sv)"""
        + "".join(f""",
            pr{i} AS (
              SELECT v.node,
                     0.15 * v.s + 0.85 * COALESCE(c.c, 0.0) AS pr
              FROM sv v LEFT JOIN (
                SELECT s.b AS node, sum(p.pr / o.outdeg) AS c
                FROM sym s
                JOIN pr{i - 1} p ON s.a = p.node
                JOIN outdeg o ON o.a = s.a
                GROUP BY s.b) c USING (node))""" for i in range(1, 5))
        + """
            SELECT node, round(pr, 6) AS pr FROM pr4""",
        "kcore_hosts": f"""
            WITH {HOST_EDGES_CTE.strip()},
            sym AS (SELECT src AS a, dst AS b FROM hedges WHERE src <> dst
                    UNION
                    SELECT dst AS a, src AS b FROM hedges WHERE src <> dst),
            n0 AS (SELECT DISTINCT a AS node FROM sym)"""
        + "".join(f""",
            n{i} AS (SELECT s.a AS node FROM sym s
                     JOIN n{i - 1} x ON x.node = s.a
                     JOIN n{i - 1} y ON y.node = s.b
                     GROUP BY s.a HAVING count(*) >= 4)"""
                  for i in range(1, 7))
        + """
            SELECT s.a AS node, count(*) AS core_deg
            FROM sym s
            JOIN n6 x ON x.node = s.a
            JOIN n6 y ON y.node = s.b
            GROUP BY s.a""",
        "readability": """
            SELECT doc_id,
                   CASE WHEN nw = 0 THEN 0 ELSE ns END AS n_sentences,
                   nw AS n_words,
                   CASE WHEN nw = 0 THEN 0 ELSE nsy END AS n_syllables,
                   CASE WHEN nw = 0 THEN 0.0
                        ELSE round(206.835
                                   - 1.015 * (nw::DOUBLE / ns)
                                   - 84.6 * (nsy::DOUBLE / nw), 6)
                   END AS flesch
            FROM (SELECT doc_id,
                         CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                              ELSE len(regexp_split_to_array(
                                     trim(text), '\\s+')) END::BIGINT AS nw,
                         len(regexp_extract_all(
                               lower(coalesce(text, '')),
                               '[aeiouy]+'))::BIGINT AS nsy,
                         greatest(1, len(regexp_extract_all(
                               coalesce(text, ''),
                               '[.!?]+')))::BIGINT AS ns
                  FROM documents)""",
        "scrub_dup_spans": f"""
            WITH {TOKENS_CTE},
            g0 AS (SELECT doc_id, pos, token,
                          lead(token, 1) OVER w AS t1,
                          lead(token, 2) OVER w AS t2,
                          lead(token, 3) OVER w AS t3,
                          lead(token, 4) OVER w AS t4
                   FROM tokens
                   WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            grams AS (SELECT doc_id, pos,
                             concat_ws(' ', token, t1, t2, t3, t4) AS gram
                      FROM g0 WHERE t4 IS NOT NULL),
            dup AS (SELECT gram FROM (
                      SELECT gram, count(DISTINCT doc_id) AS df
                      FROM grams GROUP BY gram)
                    WHERE df >= 2),
            cov AS (SELECT DISTINCT g.doc_id, g.pos + u.i AS pos
                    FROM grams g JOIN dup USING (gram)
                    CROSS JOIN (SELECT unnest(range(5)) AS i) u),
            kept AS (SELECT t.doc_id, t.pos, t.token
                     FROM tokens t
                     LEFT JOIN cov c
                       ON c.doc_id = t.doc_id AND c.pos = t.pos
                     WHERE c.pos IS NULL),
            stats AS (SELECT doc_id, count(*) AS n_tokens
                      FROM tokens GROUP BY doc_id),
            reb AS (SELECT doc_id, count(*) AS n_kept,
                           string_agg(token, ' ' ORDER BY pos)
                             AS clean_text
                    FROM kept GROUP BY doc_id)
            SELECT s.doc_id, s.n_tokens,
                   s.n_tokens - COALESCE(r.n_kept, 0) AS n_removed,
                   COALESCE(r.clean_text, '') AS clean_text
            FROM stats s LEFT JOIN reb r USING (doc_id)""",
        "random_walks": f"""
            WITH {HOST_EDGES_CTE.strip()},
            sym AS (SELECT src AS a, dst AS b FROM hedges WHERE src <> dst
                    UNION
                    SELECT dst AS a, src AS b FROM hedges WHERE src <> dst),
            nbr AS (SELECT a, b,
                           CAST(row_number() OVER (PARTITION BY a
                                                   ORDER BY b) - 1
                                AS BIGINT) AS rnk
                    FROM sym),
            degs AS (SELECT a, count(*) AS deg FROM nbr GROUP BY a),
            w0 AS (SELECT d.a AS start, w.walk, d.a AS node
                   FROM degs d
                   CROSS JOIN (SELECT unnest([0, 1]) AS walk) w)"""
        + "".join(f""",
            s{t} AS (SELECT c.start, c.walk, n.b AS node
                     FROM {'w0' if t == 1 else f's{t - 1}'} c
                     JOIN degs d ON d.a = c.node
                     JOIN nbr n ON n.a = c.node
                       AND n.rnk = CAST('0x' || substr(md5(
                             c.start || '|' || c.walk || '|{t}|' || c.node),
                             1, 8) AS BIGINT) % d.deg)"""
                  for t in range(1, 4))
        + """
            SELECT concat(start, '#', walk) AS walk_id, start,
                   CAST(step AS BIGINT) AS step, node FROM (
              SELECT start, walk, 0 AS step, node FROM w0
              UNION ALL SELECT start, walk, 1, node FROM s1
              UNION ALL SELECT start, walk, 2, node FROM s2
              UNION ALL SELECT start, walk, 3, node FROM s3)""",
        "weighted_sample": """
            WITH keyed AS (
              SELECT doc_id, n_chars AS weight,
                     round(pow(
                       (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8) AS BIGINT) + 0.5)
                       / 4294967296.0,
                       1.0 / n_chars), 6) AS key
              FROM documents)
            SELECT doc_id, weight, key,
                   CAST(row_number() OVER (ORDER BY key DESC, doc_id)
                        AS BIGINT) AS rank
            FROM keyed
            ORDER BY key DESC, doc_id
            LIMIT 25""",
        "simhash": f"""
            WITH {TOKENS_CTE}, {VOCAB_CTE},
            weighted AS (
              SELECT doc_id, token_id, count(*) AS w
              FROM tokens JOIN vocab USING (token)
              GROUP BY doc_id, token_id),
            h AS (SELECT doc_id, (token_id * {SIMHASH_MULT}) % 4294967296 AS hval, w
                  FROM weighted),
            perbit AS (
              SELECT doc_id, bit,
                     sum(CASE WHEN (hval >> bit) & 1 = 1 THEN w ELSE -w END) AS s
              FROM h CROSS JOIN (SELECT unnest(range({SIMHASH_BITS})) AS bit)
              GROUP BY doc_id, bit)
            SELECT doc_id,
                   CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
            FROM perbit GROUP BY doc_id""",
        "cosine_topk": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM q),
            norms AS (SELECT vec_id, sum(v * v) AS norm2 FROM vals GROUP BY vec_id),
            dots AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     sum(a.v * b.v) AS dot
              FROM vals a JOIN vals b ON a.i = b.i AND a.vec_id != b.vec_id
              WHERE a.vec_id < 10
              GROUP BY a.vec_id, b.vec_id),
            scored AS (
              SELECT d.query_id, d.neighbor_id,
                     d.dot / sqrt(nq.norm2::DOUBLE * nn.norm2::DOUBLE) AS cos
              FROM dots d
              JOIN norms nq ON nq.vec_id = d.query_id
              JOIN norms nn ON nn.vec_id = d.neighbor_id)
            SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id) AS rank
                  FROM scored)
            WHERE rank <= 3""",
        "lsh_cosine_topk": """
            WITH b AS (
              SELECT vec_id,
                     (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                      + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                      + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
                      + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket,
                     list_transform(embedding,
                         x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS (
              SELECT vec_id, bucket, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM b),
            norms AS (SELECT vec_id, sum(v * v) AS norm2 FROM vals GROUP BY vec_id),
            dots AS (
              SELECT a.vec_id AS query_id, bb.vec_id AS neighbor_id,
                     sum(a.v * bb.v) AS dot
              FROM vals a JOIN vals bb
                ON a.i = bb.i AND a.bucket = bb.bucket AND a.vec_id != bb.vec_id
              GROUP BY a.vec_id, bb.vec_id),
            scored AS (
              SELECT d.query_id, d.neighbor_id,
                     d.dot / sqrt(nq.norm2::DOUBLE * nn.norm2::DOUBLE) AS cos
              FROM dots d
              JOIN norms nq ON nq.vec_id = d.query_id
              JOIN norms nn ON nn.vec_id = d.neighbor_id)
            SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id) AS rank
                  FROM scored)
            WHERE rank <= 3""",
        "lsh_cosine_multiband": """
            WITH e AS (
              SELECT vec_id,
                     (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                      + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                      + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS b0,
                     (CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END
                      + CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END
                      + CASE WHEN embedding[6] >= 0 THEN 4 ELSE 0 END) AS b1,
                     list_transform(embedding,
                         x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            cand AS (
              SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
              FROM e a JOIN e b
                ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.vec_id != b.vec_id),
            vals AS (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM e),
            norms AS (SELECT vec_id, sum(v * v) AS norm2 FROM vals GROUP BY vec_id),
            dots AS (
              SELECT c.query_id, c.neighbor_id, sum(a.v * b.v) AS dot
              FROM cand c
              JOIN vals a ON a.vec_id = c.query_id
              JOIN vals b ON b.vec_id = c.neighbor_id AND b.i = a.i
              GROUP BY c.query_id, c.neighbor_id),
            scored AS (
              SELECT d.query_id, d.neighbor_id,
                     d.dot / sqrt(nq.norm2::DOUBLE * nn.norm2::DOUBLE) AS cos
              FROM dots d
              JOIN norms nq ON nq.vec_id = d.query_id
              JOIN norms nn ON nn.vec_id = d.neighbor_id)
            SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id) AS rank
                  FROM scored)
            WHERE rank <= 3""",
        "ivf_cosine_topk": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM q),
            norms AS (SELECT vec_id, sum(v * v) AS norm2 FROM vals GROUP BY vec_id),
            cscore AS (
              SELECT a.vec_id, c.vec_id AS cid,
                     sum(a.v * c.v)
                       / sqrt(na.norm2::DOUBLE * nc.norm2::DOUBLE) AS cos
              FROM vals a
              JOIN vals c ON c.i = a.i AND c.vec_id < 8
              JOIN norms na ON na.vec_id = a.vec_id
              JOIN norms nc ON nc.vec_id = c.vec_id
              GROUP BY a.vec_id, c.vec_id, na.norm2, nc.norm2),
            ranked AS (
              SELECT vec_id, cid,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, cid) AS rn
              FROM cscore),
            assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
            probe AS (SELECT vec_id AS query_id, cid AS cell
                      FROM ranked WHERE rn <= 2 AND vec_id < 10),
            cand AS (
              SELECT p.query_id, a.vec_id AS neighbor_id
              FROM probe p JOIN assign a
                ON a.cell = p.cell AND a.vec_id != p.query_id),
            dots AS (
              SELECT c.query_id, c.neighbor_id, sum(a.v * b.v) AS dot
              FROM cand c
              JOIN vals a ON a.vec_id = c.query_id
              JOIN vals b ON b.vec_id = c.neighbor_id AND b.i = a.i
              GROUP BY c.query_id, c.neighbor_id),
            scored AS (
              SELECT d.query_id, d.neighbor_id,
                     d.dot / sqrt(nq.norm2::DOUBLE * nn.norm2::DOUBLE) AS cos
              FROM dots d
              JOIN norms nq ON nq.vec_id = d.query_id
              JOIN norms nn ON nn.vec_id = d.neighbor_id)
            SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id) AS rank
                  FROM scored)
            WHERE rank <= 3""",
        "embedding_near_dup": """
            WITH e AS (
              SELECT vec_id,
                     (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
                      + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
                      + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END) AS b0,
                     (CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END
                      + CASE WHEN embedding[5] >= 0 THEN 2 ELSE 0 END
                      + CASE WHEN embedding[6] >= 0 THEN 4 ELSE 0 END) AS b1,
                     list_transform(embedding,
                         x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            cand AS (
              SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
              FROM e a JOIN e b
                ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.vec_id < b.vec_id),
            vals AS (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM e),
            norms AS (SELECT vec_id, sum(v * v) AS norm2 FROM vals GROUP BY vec_id),
            dots AS (
              SELECT c.vec_a, c.vec_b, sum(a.v * b.v) AS dot
              FROM cand c
              JOIN vals a ON a.vec_id = c.vec_a
              JOIN vals b ON b.vec_id = c.vec_b AND b.i = a.i
              GROUP BY c.vec_a, c.vec_b)
            SELECT d.vec_a, d.vec_b,
                   round(d.dot / sqrt(na.norm2::DOUBLE * nb.norm2::DOUBLE), 6)
                     AS cosine
            FROM dots d
            JOIN norms na ON na.vec_id = d.vec_a
            JOIN norms nb ON nb.vec_id = d.vec_b
            WHERE d.dot / sqrt(na.norm2::DOUBLE * nb.norm2::DOUBLE) >= 0.35""",
        "lang_id": f"""
            WITH {TOKENS_CTE},
            counts AS (
              SELECT d.doc_id, count(t.token) AS n_tokens, count(s.w) AS n_stopwords
              FROM documents d
              LEFT JOIN tokens t ON d.doc_id = t.doc_id
              LEFT JOIN (VALUES {STOP_VALUES_SQL}) AS s(w) ON t.token = s.w
              GROUP BY d.doc_id)
            SELECT doc_id, n_tokens, n_stopwords,
                   round(n_stopwords / greatest(n_tokens, 1)::DOUBLE, 6) AS en_ratio,
                   CASE WHEN n_stopwords / greatest(n_tokens, 1)::DOUBLE > 0.02
                        THEN 'en' ELSE 'other' END AS pred_lang
            FROM counts""",
        "quality_score": f"""
            WITH {TOKENS_CTE},
            base AS ({qualities})
            SELECT doc_id, n_chars, n_tokens,
                   round(tok_chars / greatest(n_tokens, 1)::DOUBLE, 6) AS avg_token_len,
                   round(n_punct / greatest(n_tokens, 1)::DOUBLE, 6) AS punct_ratio,
                   round(n_stop / greatest(n_tokens, 1)::DOUBLE, 6) AS stopword_ratio,
                   round(0.4 * least(n_tokens / 100.0, 1.0)
                         + 0.3 * (1 - n_punct / greatest(n_tokens, 1)::DOUBLE)
                         + 0.3 * least((n_stop / greatest(n_tokens, 1)::DOUBLE) / 0.05, 1.0),
                         6) AS quality
            FROM base""",
        "token_counts": f"""
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '{INFIX_PATTERN}', 0)) AS BIGINT) AS n_re_tokens
            FROM documents""",
        "doc_fingerprint": f"""
            WITH {TOKENS_CTE}, {VOCAB_CTE}
            SELECT doc_id,
                   CAST(sum((token_id * ((pos * {FP_MULT} + {FP_OFFSET}) % {FP_MOD})) % {FP_MOD})
                     % {FP_MOD} AS BIGINT) AS fingerprint
            FROM tokens JOIN vocab USING (token)
            GROUP BY doc_id""",
        "pii_scrub": r"""
            WITH s1 AS (
              SELECT doc_id, text,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM documents),
            s2 AS (
              SELECT doc_id, text, t1,
                     regexp_replace(t1,
                       '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t2
              FROM s1)
            SELECT doc_id,
                   regexp_replace(t2,
                     '(\+\d{7,15}|\b\d{3}-\d{3}-\d{4}\b)',
                     '<PHONE>', 'g') AS scrubbed,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                        AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(t1,
                     '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
                   CAST(len(regexp_extract_all(t2,
                     '(\+\d{7,15}|\b\d{3}-\d{3}-\d{4}\b)'))
                        AS BIGINT) AS n_phones,
                   (len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    + len(regexp_extract_all(t1,
                     '\b(\d{1,3}\.){3}\d{1,3}\b'))
                    + len(regexp_extract_all(t2,
                     '(\+\d{7,15}|\b\d{3}-\d{3}-\d{4}\b)')) = 0
                   ) AS clean
            FROM s2""",
        "sequence_packing": """
            WITH t AS (
              SELECT doc_id, source,
                     CAST(len(string_split(trim(text), ' ')) AS BIGINT
                          ) AS n_tokens
              FROM documents),
            c AS (
              SELECT doc_id, source, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                            PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT) AS cb
              FROM t)
            SELECT doc_id, source, n_tokens,
                   cb // 512 AS bin_id, cb % 512 AS bin_offset
            FROM c""",
        "contamination_check": f"""
            WITH {TOKENS_CTE},
            g5 AS (
              SELECT DISTINCT a.doc_id,
                     a.token || ' ' || b.token || ' ' || c.token || ' '
                       || d.token || ' ' || e.token AS g
              FROM tokens a
              JOIN tokens b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN tokens c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
              JOIN tokens d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
              JOIN tokens e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4),
            ev AS (SELECT DISTINCT g FROM g5 WHERE doc_id < 5),
            hits AS (
              SELECT doc_id, count(*) AS n_hits
              FROM (SELECT doc_id, g FROM g5 WHERE doc_id >= 5) x
              JOIN ev USING (g)
              GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_eval_ngrams,
                   (h.doc_id IS NOT NULL) AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id >= 5) d
            LEFT JOIN hits h USING (doc_id)""",
        "dedup_clusters": f"""
            WITH RECURSIVE {TOKENS_CTE}, {SHINGLES_CTE}, {SIGS_CTE},
            {CANDIDATES_CTE},
            sizes AS (SELECT doc_id, count(*) AS n_tok
                      FROM shingles GROUP BY doc_id),
            common AS (
              SELECT c.doc_a, c.doc_b, count(*) AS n_common
              FROM cand c
              JOIN shingles ta ON ta.doc_id = c.doc_a
              JOIN shingles tb ON tb.doc_id = c.doc_b
                               AND tb.shingle = ta.shingle
              GROUP BY c.doc_a, c.doc_b),
            jac AS (
              SELECT m.doc_a, m.doc_b
              FROM common m
              JOIN sizes sa ON sa.doc_id = m.doc_a
              JOIN sizes sb ON sb.doc_id = m.doc_b
              WHERE round(m.n_common
                          / (sa.n_tok + sb.n_tok - m.n_common)::DOUBLE, 6)
                    >= 0.5),
            sym AS (SELECT doc_a AS a, doc_b AS b FROM jac
                    UNION SELECT doc_b, doc_a FROM jac),
            reach(node, root) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node),
            comp AS (SELECT node AS doc_id, min(root) AS cluster
                     FROM reach GROUP BY node),
            cl AS (SELECT cluster, count(*) AS cluster_size
                   FROM comp GROUP BY cluster)
            SELECT d.doc_id,
                   CAST(coalesce(comp.cluster, d.doc_id) AS BIGINT
                        ) AS cluster_id,
                   CAST(coalesce(cl.cluster_size, 1) AS BIGINT
                        ) AS cluster_size,
                   (comp.doc_id IS NULL OR d.doc_id = comp.cluster) AS keep
            FROM documents d
            LEFT JOIN comp ON comp.doc_id = d.doc_id
            LEFT JOIN cl ON cl.cluster = comp.cluster""",
        "gopher_repetition": """
            WITH w AS (
              SELECT doc_id, string_split(trim(text), ' ') AS words
              FROM documents),
            base AS (
              SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
                     round(list_sum(list_transform(words, x -> length(x)))
                           / greatest(len(words), 1)::DOUBLE, 6
                           ) AS mean_word_len
              FROM w),
            bi AS (
              SELECT doc_id,
                     round(max(c) / sum(c)::DOUBLE, 6) AS top_bigram_frac
              FROM (SELECT doc_id, g, count(*) AS c
                    FROM (SELECT doc_id,
                                 unnest(list_transform(
                                   range(1, len(words)),
                                   i -> words[i] || ' ' || words[i+1])) AS g
                          FROM w)
                    GROUP BY doc_id, g)
              GROUP BY doc_id),
            tri AS (
              SELECT doc_id,
                     round((count(*) - count(DISTINCT g))
                           / count(*)::DOUBLE, 6) AS dup_trigram_frac
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             range(1, len(words) - 1),
                             i -> words[i] || ' ' || words[i+1]
                                  || ' ' || words[i+2])) AS g
                    FROM w)
              GROUP BY doc_id)
            SELECT b.doc_id, b.n_words, b.mean_word_len,
                   coalesce(bi.top_bigram_frac, 0.0) AS top_bigram_frac,
                   coalesce(tri.dup_trigram_frac, 0.0) AS dup_trigram_frac,
                   (b.n_words >= 40
                    AND b.mean_word_len >= 2.0 AND b.mean_word_len <= 10.0
                    AND coalesce(bi.top_bigram_frac, 0.0) <= 0.12
                    AND coalesce(tri.dup_trigram_frac, 0.0) <= 0.30) AS keep
            FROM base b
            LEFT JOIN bi USING (doc_id)
            LEFT JOIN tri ON b.doc_id = tri.doc_id""",
        "eval_prf_left": _eval_oracle_sql("chunk_start"),
        "eval_prf_right": _eval_oracle_sql("chunk_end"),
        "tpch_q6": """
            SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_discount AS DECIMAL(5,4))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",
        "above_nation_avg": """
            WITH na AS (
              SELECT c_nationkey,
                     CAST(avg(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS nation_avg
              FROM customer GROUP BY c_nationkey)
            SELECT c_custkey, c.c_nationkey, c_acctbal,
                   round(nation_avg, 6) AS nation_avg
            FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
            WHERE c_acctbal > nation_avg""",
        "exists_high_value": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_extendedprice > 1900)""",
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')""",
        "token_bigrams": f"""
            WITH {TOKENS_CTE},
            nx AS (
              SELECT token,
                     lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS next_token
              FROM tokens)
            SELECT token, next_token, count(*) AS n
            FROM nx WHERE next_token IS NOT NULL
            GROUP BY token, next_token""",
        "mentions_histogram": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            per_doc AS (SELECT doc_id, count(*) AS k FROM linked GROUP BY doc_id)
            SELECT k, count(*) AS n_docs FROM per_doc GROUP BY k""",
        "zscore_by_source": """
            SELECT doc_id, source, n_chars,
                   round(CASE WHEN stddev_pop(n_chars) OVER (PARTITION BY source) > 0
                              THEN (n_chars - avg(n_chars) OVER (PARTITION BY source))
                                   / stddev_pop(n_chars) OVER (PARTITION BY source)
                              ELSE 0.0 END, 6) AS zscore
            FROM documents""",
        "rollup_revenue": """
            SELECT r_name, n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)""",
        "asof_join": """
            SELECT p.user_id, p.event_id, p.value,
                   c.event_id AS asof_event_id, c.value AS asof_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts""",
        "stratified_sample": f"""
            WITH sampled AS (
              SELECT * FROM documents
              WHERE ((doc_id * {KNUTH}) % {HASH_MOD}) % 1000000 <
                    CASE source WHEN 'src0' THEN 800000
                                WHEN 'src1' THEN 500000
                                WHEN 'src2' THEN 0
                                ELSE 200000 END)
            SELECT source, count(*) AS n_kept, min(doc_id) AS min_id
            FROM sampled GROUP BY source""",
        "connected_components": f"""
            WITH RECURSIVE {TOKENS_CTE}, {LINKED_CTE},
            ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
            e AS (
              SELECT a.canonical_id AS src, b.canonical_id AS dst
              FROM ents a JOIN ents b
                ON a.doc_id = b.doc_id AND a.canonical_id < b.canonical_id),
            sym AS (SELECT src AS a, dst AS b FROM e
                    UNION SELECT dst, src FROM e),
            reach(node, root) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node)
            SELECT node, min(root) AS component
            FROM reach GROUP BY node""",
        "json_extract_agg": """
            WITH parsed AS (
              -- faithful from_json(k BIGINT) twin: malformed JSON, a
              -- missing key, or a non-integer-typed value (quoted "5",
              -- 3.7) all become NULL instead of erroring/coercing
              SELECT event_type,
                     CASE WHEN json_valid(props)
                               AND json_type(props, '$.k')
                                   IN ('BIGINT', 'UBIGINT')
                          THEN TRY_CAST(json_extract_string(props, '$.k')
                                        AS BIGINT)
                     END AS k
              FROM events)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(min(k) AS BIGINT) AS min_k,
                   CAST(max(k) AS BIGINT) AS max_k
            FROM parsed GROUP BY event_type""",
        "pivot_events": f"""
            SELECT user_id,
                   {", ".join(
                       f"CAST(count(CASE WHEN event_type = '{t}' THEN 1 END)"
                       f" AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
            FROM events GROUP BY user_id""",
        "quality_buckets": f"""
            WITH {TOKENS_CTE},
            base AS ({qualities}),
            q AS (
              SELECT b.doc_id, d.source,
                     round(0.4 * least(b.n_tokens / 100.0, 1.0)
                           + 0.3 * (1 - b.n_punct / greatest(b.n_tokens, 1)::DOUBLE)
                           + 0.3 * least((b.n_stop / greatest(b.n_tokens, 1)::DOUBLE) / 0.05, 1.0),
                           6) AS quality
              FROM base b JOIN documents d USING (doc_id)),
            bounds AS (
              SELECT source,
                     quantile_cont(quality, [0.25, 0.5, 0.75]) AS bs
              FROM q GROUP BY source)
            SELECT q.doc_id, q.source, q.quality,
                   -- NULL score or NULL bounds -> NULL bucket (operator's
                   -- documented semantics; unreachable on this data)
                   CAST(CASE WHEN q.quality IS NULL OR bs IS NULL THEN NULL
                        ELSE 1 + (CASE WHEN q.quality > bs[1] THEN 1 ELSE 0 END)
                               + (CASE WHEN q.quality > bs[2] THEN 1 ELSE 0 END)
                               + (CASE WHEN q.quality > bs[3] THEN 1 ELSE 0 END)
                        END AS BIGINT) AS bucket
            -- null-safe join: the operator keeps NULL-group rows (its own
            -- group), so the oracle must too (no source is NULL here, but
            -- the twin stays faithful on dirty data)
            FROM q JOIN bounds b
              ON q.source IS NOT DISTINCT FROM b.source""",
        "crossdoc_ngram_dup": f"""
            WITH {TOKENS_CTE}, {SHINGLES_CTE},
            dfc AS (SELECT shingle, count(*) AS df
                    FROM shingles GROUP BY shingle),
            per AS (
              SELECT s.doc_id, count(*) AS n_grams,
                     count(CASE WHEN dfc.df >= 2 THEN 1 END) AS n_dup
              FROM shingles s JOIN dfc USING (shingle)
              GROUP BY s.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_grams,
                   coalesce(round(p.n_dup / p.n_grams::DOUBLE, 6), 0.0)
                     AS dup_frac
            FROM documents d LEFT JOIN per p USING (doc_id)""",
        "pagerank_entities": _pagerank_oracle_sql(5),
        "lm_backoff": f"""
            WITH {TOKENS_CTE},
            tg AS (
              SELECT t1.doc_id, t1.token AS w1, t2.token AS w2,
                     t3.token AS w3,
                     ((t1.doc_id * {KNUTH}) % {HASH_MOD}) % 2 AS part
              FROM tokens t1
              JOIN tokens t2 ON t1.doc_id = t2.doc_id
                            AND t2.pos = t1.pos + 1
              JOIN tokens t3 ON t1.doc_id = t3.doc_id
                            AND t3.pos = t1.pos + 2),
            c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg
                     WHERE part <> 0 GROUP BY w1, w2, w3),
            c12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12
                    FROM c123 GROUP BY w1, w2),
            c23 AS (SELECT w2, w3, count(*) AS c23 FROM tg
                    WHERE part <> 0 GROUP BY w2, w3),
            c2 AS (SELECT w2, CAST(sum(c23) AS BIGINT) AS c2
                   FROM c23 GROUP BY w2),
            c3 AS (SELECT w3, count(*) AS c3 FROM tg
                   WHERE part <> 0 GROUP BY w3),
            nv AS (SELECT count(*) AS n, count(DISTINCT w3) AS v
                   FROM tg WHERE part <> 0),
            s AS (SELECT b.doc_id,
                         -ln(CASE
                           WHEN coalesce(c123.c123, 0) > 0
                             THEN c123.c123 / c12.c12::DOUBLE
                           WHEN coalesce(c23.c23, 0) > 0
                             THEN 0.4 * c23.c23 / c2.c2::DOUBLE
                           ELSE 0.16 * (coalesce(c3.c3, 0) + 1)
                                / (nv.n + greatest(nv.v, 1))::DOUBLE
                         END) AS nll
                  FROM tg b
                  LEFT JOIN c123 ON b.w1 = c123.w1 AND b.w2 = c123.w2
                               AND b.w3 = c123.w3
                  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
                  LEFT JOIN c23 ON b.w2 = c23.w2 AND b.w3 = c23.w3
                  LEFT JOIN c2 ON b.w2 = c2.w2
                  LEFT JOIN c3 ON b.w3 = c3.w3
                  CROSS JOIN nv
                  WHERE b.part = 0)
            SELECT doc_id, count(*) AS n_trigrams,
                   round(avg(nll), 6) AS xent
            FROM s GROUP BY doc_id""",
        "clustering_entities": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE}, {ENTITY_EDGES_CTE},
            tri AS (
              SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
              FROM e e1
              JOIN e e2 ON e2.src = e1.dst
              JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            corners AS (
              SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri),
            pern AS (SELECT node, count(*) AS n_triangles
                     FROM corners GROUP BY node)
            SELECT o.a AS node,
                   CAST(o.outdeg AS BIGINT) AS degree,
                   CAST(coalesce(p.n_triangles, 0) AS BIGINT)
                     AS n_triangles,
                   CASE WHEN o.outdeg >= 2
                        THEN round(2.0 * coalesce(p.n_triangles, 0)
                                   / (o.outdeg * (o.outdeg - 1)), 6)
                        ELSE 0.0 END AS lcc
            FROM outdeg o LEFT JOIN pern p ON p.node = o.a""",
        "textrank_keywords": _textrank_oracle_sql(3, 2, 3),
        "tagger_agreement": f"""
            WITH {TOKENS_CTE},
            counts AS (
              SELECT d.doc_id, count(t.token) AS n_tokens,
                     count(s.w) AS n_stopwords
              FROM documents d
              LEFT JOIN tokens t ON d.doc_id = t.doc_id
              LEFT JOIN (VALUES {STOP_VALUES_SQL}) AS s(w) ON t.token = s.w
              GROUP BY d.doc_id),
            rated AS (
              SELECT d.doc_id,
                     CASE WHEN d.lang = 'en' THEN 'en'
                          ELSE 'other' END AS ra,
                     CASE WHEN c.n_stopwords
                               / greatest(c.n_tokens, 1)::DOUBLE > 0.02
                          THEN 'en' ELSE 'other' END AS rb
              FROM documents d JOIN counts c USING (doc_id)),
            tot AS (SELECT count(*) AS n,
                           sum(CASE WHEN ra = rb THEN 1 ELSE 0 END)
                             AS n_agree
                    FROM rated),
            ma AS (SELECT ra AS cat, count(*) AS ca FROM rated GROUP BY ra),
            mb AS (SELECT rb AS cat, count(*) AS cb FROM rated GROUP BY rb),
            pe_t AS (SELECT sum(ca::DOUBLE * cb) AS pe_num
                     FROM ma JOIN mb USING (cat))
            SELECT n, CAST(n_agree AS BIGINT) AS n_agree,
                   round(n_agree / n::DOUBLE, 6) AS po,
                   round(coalesce(pe_num, 0) / (n::DOUBLE * n), 6) AS pe,
                   round(CASE WHEN coalesce(pe_num, 0) / (n::DOUBLE * n)
                                   >= 1.0
                              THEN CASE WHEN n_agree = n
                                        THEN 1.0 ELSE 0.0 END
                              ELSE (n_agree / n::DOUBLE
                                    - coalesce(pe_num, 0) / (n::DOUBLE * n))
                                   / (1.0 - coalesce(pe_num, 0)
                                            / (n::DOUBLE * n)) END,
                         6) AS kappa
            FROM tot CROSS JOIN pe_t""",
        "auc_doclen": """
            WITH hist AS (
              SELECT source AS grp, n_chars AS score,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       AS n_pos_s,
                     sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                       AS n_neg_s
              FROM documents GROUP BY source, n_chars),
            c AS (SELECT grp, n_pos_s, n_neg_s,
                         coalesce(sum(n_neg_s) OVER (
                           PARTITION BY grp ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cum_neg
                  FROM hist),
            g AS (SELECT grp, sum(n_pos_s) AS n_pos, sum(n_neg_s) AS n_neg,
                         sum(n_pos_s * cum_neg::DOUBLE
                             + 0.5 * n_pos_s * n_neg_s) AS conc
                  FROM c GROUP BY grp)
            SELECT grp AS source,
                   CAST(n_pos AS BIGINT) AS n_pos,
                   CAST(n_neg AS BIGINT) AS n_neg,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN round(conc / (n_pos::DOUBLE * n_neg), 6)
                   END AS auc
            FROM g""",
        "cms_tokens": f"""
            WITH {TOKENS_CTE},
            vals AS (SELECT token AS value FROM tokens),
            nt AS (SELECT count(*) AS n_total FROM vals),
            db AS (
              SELECT value, d,
                     CAST('0x' || substr(md5(CAST(d AS VARCHAR)
                                             || ':' || value), 1, 8)
                          AS BIGINT) % 64 AS bucket
              FROM vals CROSS JOIN (VALUES (0), (1), (2)) AS dd(d)),
            grid AS (SELECT d, bucket, count(*) AS c
                     FROM db GROUP BY d, bucket),
            cdb AS (SELECT DISTINCT value, d, bucket FROM db),
            est AS (SELECT c2.value, min(g.c) AS est
                    FROM cdb c2 JOIN grid g USING (d, bucket)
                    GROUP BY c2.value),
            surv AS (SELECT value, est FROM est CROSS JOIN nt
                     WHERE est >= n_total // 100),
            ex AS (SELECT v.value, count(*) AS exact
                   FROM vals v
                   JOIN (SELECT value FROM surv) s USING (value)
                   GROUP BY v.value)
            SELECT s.value AS token, CAST(s.est AS BIGINT) AS est,
                   CAST(e.exact AS BIGINT) AS exact
            FROM surv s JOIN ex e USING (value)""",
        "rrf_search": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dl AS (SELECT doc_id, count(*) AS dl
                   FROM tokens GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            qt AS (SELECT unnest(['spark', 'stream', 'vector']) AS token),
            hits AS (SELECT tf.* FROM tf JOIN qt USING (token)),
            dfq AS (SELECT token, count(*) AS df FROM hits GROUP BY token),
            bscored AS (
              SELECT h.doc_id,
                     round(sum(
                       ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * h.tf * 2.2
                       / (h.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                     ), 6) AS score
              FROM hits h
              JOIN dfq d USING (token)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
              GROUP BY h.doc_id),
            bmr AS (SELECT doc_id, rnk AS rank FROM
                      (SELECT doc_id,
                              row_number() OVER (ORDER BY score DESC,
                                                 doc_id) AS rnk
                       FROM bscored)
                    WHERE rnk <= 15),
            q AS (SELECT vec_id, list_transform(embedding,
                         x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
                  FROM embeddings),
            evals AS (SELECT vec_id,
                             CAST(generate_subscripts(qv, 1) AS INT) AS i,
                             unnest(qv) AS v
                      FROM q),
            norms AS (SELECT vec_id, sum(v * v) AS norm2
                      FROM evals GROUP BY vec_id),
            dots AS (SELECT b.vec_id AS neighbor_id, sum(a.v * b.v) AS dot
                     FROM evals a JOIN evals b
                       ON a.i = b.i AND b.vec_id <> 0
                     WHERE a.vec_id = 0
                     GROUP BY b.vec_id),
            dscore AS (SELECT d.neighbor_id,
                              d.dot / sqrt(n0.norm2::DOUBLE
                                           * nn.norm2::DOUBLE) AS cosv
                       FROM dots d
                       JOIN norms nn ON nn.vec_id = d.neighbor_id
                       CROSS JOIN (SELECT norm2 FROM norms
                                   WHERE vec_id = 0) AS n0(norm2)),
            den AS (SELECT neighbor_id AS doc_id, rnk AS rank FROM
                      (SELECT neighbor_id,
                              row_number() OVER (ORDER BY cosv DESC,
                                                 neighbor_id) AS rnk
                       FROM dscore)
                    WHERE rnk <= 15),
            allr AS (SELECT doc_id, 1.0 / (60 + rank) AS rr FROM bmr
                     UNION ALL
                     SELECT doc_id, 1.0 / (60 + rank) FROM den),
            fused AS (SELECT doc_id,
                             CAST(count(*) AS BIGINT) AS n_rankers,
                             round(sum(rr), 6) AS rrf
                      FROM allr GROUP BY doc_id)
            SELECT doc_id, n_rankers, rrf,
                   CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
                        AS BIGINT) AS rank
            FROM fused ORDER BY rrf DESC, doc_id
            LIMIT 10""",
        "span_corruption": f"""
            WITH {TOKENS_CTE},
            toks AS (
              SELECT doc_id, pos, token, pos // 3 AS block,
                     ((doc_id * {KNUTH}) % {HASH_MOD} * 31 + pos // 3)
                       % {HASH_MOD} % 7 = 0 AS masked
              FROM tokens),
            blocks AS (SELECT doc_id, block, min(pos) AS bpos
                       FROM toks WHERE masked GROUP BY doc_id, block),
            sent AS (SELECT doc_id, block, bpos,
                            '<extra_id_' || CAST(row_number() OVER (
                              PARTITION BY doc_id ORDER BY block) - 1
                              AS VARCHAR) || '>' AS sentinel
                     FROM blocks),
            inp AS (SELECT doc_id,
                           string_agg(tok, ' ' ORDER BY spos, flag)
                             AS input_text
                    FROM (SELECT doc_id, pos AS spos, 1 AS flag,
                                 token AS tok
                          FROM toks WHERE NOT masked
                          UNION ALL
                          SELECT doc_id, bpos, 0, sentinel FROM sent)
                    GROUP BY doc_id),
            tgt AS (SELECT doc_id,
                           string_agg(tok, ' ' ORDER BY spos, flag)
                             AS target_text
                    FROM (SELECT t.doc_id, t.pos AS spos, 1 AS flag,
                                 t.token AS tok
                          FROM toks t JOIN sent s
                            ON t.doc_id = s.doc_id AND t.block = s.block
                          WHERE t.masked
                          UNION ALL
                          SELECT doc_id, bpos, 0, sentinel FROM sent)
                    GROUP BY doc_id),
            stats AS (SELECT doc_id, count(*) AS n_tokens,
                             sum(CASE WHEN masked THEN 1 ELSE 0 END)
                               AS n_masked
                      FROM toks GROUP BY doc_id)
            SELECT s.doc_id, s.n_tokens,
                   CAST(s.n_masked AS BIGINT) AS n_masked,
                   coalesce(i.input_text, '') AS input_text,
                   coalesce(t.target_text, '') AS target_text
            FROM stats s
            LEFT JOIN inp i USING (doc_id)
            LEFT JOIN tgt t USING (doc_id)""",
        "skipgram_pairs": f"""
            WITH {TOKENS_CTE},
            led AS (SELECT doc_id, pos AS cpos, token AS tok,
                           lead(token, 1) OVER (PARTITION BY doc_id
                                                ORDER BY pos) AS n1,
                           lead(token, 2) OVER (PARTITION BY doc_id
                                                ORDER BY pos) AS n2
                    FROM tokens),
            pairs AS (
              SELECT doc_id, cpos AS pos, tok AS center, n1 AS context,
                     1 AS dist, 0 AS dir
              FROM led WHERE n1 IS NOT NULL
              UNION ALL
              SELECT doc_id, cpos + 1, n1, tok, 1, 1
              FROM led WHERE n1 IS NOT NULL
              UNION ALL
              SELECT doc_id, cpos, tok, n2, 2, 0
              FROM led WHERE n2 IS NOT NULL
              UNION ALL
              SELECT doc_id, cpos + 2, n2, tok, 2, 1
              FROM led WHERE n2 IS NOT NULL),
            vocab AS (SELECT token AS context,
                             CAST(row_number() OVER (ORDER BY token)
                                  AS BIGINT) AS vid
                      FROM (SELECT DISTINCT token FROM tokens)),
            vs AS (SELECT count(*) AS n_vocab FROM vocab),
            negs AS (SELECT p.doc_id, p.pos, p.center,
                            CAST('0x' || substr(md5(
                              p.doc_id || ':' || p.pos || ':'
                              || p.dist || ':' || p.dir || ':' || j),
                              1, 8) AS BIGINT) % n_vocab + 1 AS vid
                     FROM pairs p
                     CROSS JOIN (VALUES (1), (2)) AS js(j)
                     CROSS JOIN vs)
            SELECT doc_id, pos, center, context, 1 AS label FROM pairs
            UNION ALL
            SELECT n.doc_id, n.pos, n.center, v.context, 0
            FROM negs n JOIN vocab v USING (vid)""",
        "skew_canonical": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            hist AS (SELECT CAST(canonical_id AS VARCHAR) AS k,
                            count(*) AS c
                     FROM linked GROUP BY 1),
            topk AS (SELECT k, c FROM hist
                     ORDER BY c DESC, k DESC LIMIT 1),
            agg AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
                           count(*) AS n_keys,
                           sum(c * ln(c::DOUBLE)) AS clnc
                    FROM hist)
            SELECT a.n_rows, a.n_keys, t.k AS top_key,
                   CAST(t.c AS BIGINT) AS max_count,
                   round(t.c / a.n_rows::DOUBLE, 6) AS max_share,
                   round(t.c * a.n_keys / a.n_rows::DOUBLE, 6)
                     AS skew_factor,
                   round(ln(a.n_rows::DOUBLE) - a.clnc / a.n_rows, 6)
                     AS entropy
            FROM agg a CROSS JOIN topk t""",
        "link_fd_check": f"""
            WITH {TOKENS_CTE},
            dl AS (SELECT t.token, g.canonical_id
                   FROM tokens t
                   JOIN (VALUES {DISAMBIG_VALUES_SQL})
                     AS g(surface, label, canonical_id)
                     ON t.token = g.surface)
            SELECT token,
                   count(DISTINCT canonical_id) AS n_distinct_rhs,
                   count(*) AS n_rows
            FROM dl GROUP BY token
            HAVING count(DISTINCT canonical_id) > 1""",
        "ktruss_hosts": _ktruss_oracle_sql(4, 4),
        "calibration_quality": f"""
            WITH {TOKENS_CTE},
            base AS ({qualities}),
            scored AS (
              SELECT b.doc_id,
                     round(0.4 * least(b.n_tokens / 100.0, 1.0)
                           + 0.3 * (1 - b.n_punct
                                    / greatest(b.n_tokens, 1)::DOUBLE)
                           + 0.3 * least((b.n_stop
                                    / greatest(b.n_tokens, 1)::DOUBLE)
                                   / 0.05, 1.0), 6) AS quality,
                     (d.lang = 'en') AS is_en
              FROM base b JOIN documents d USING (doc_id))
            SELECT CAST(least(greatest(floor(quality * 10), 0), 9)
                        AS BIGINT) AS bucket,
                   count(*) AS n,
                   CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos,
                   round(avg(CASE WHEN is_en THEN 1 ELSE 0 END), 6)
                     AS frac_pos,
                   round(avg(quality), 6) AS mean_score
            FROM scored GROUP BY 1""",
        "graph_summary": f"""
            WITH {HOST_EDGES_CTE},
            e AS (SELECT DISTINCT src AS s, dst AS d FROM hedges
                  WHERE src <> dst),
            od AS (SELECT s, count(*) AS x FROM e GROUP BY s),
            idg AS (SELECT d, count(*) AS y FROM e GROUP BY d),
            xy AS (SELECT e.s, e.d, od.x, idg.y
                   FROM e JOIN od USING (s) JOIN idg USING (d)),
            sums AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                            sum(x * x) AS sxx, sum(y * y) AS syy,
                            sum(x * y) AS sxy
                     FROM xy),
            nn AS (SELECT count(DISTINCT n) AS n_nodes FROM (
                     SELECT s AS n FROM e UNION ALL SELECT d FROM e)),
            rc AS (SELECT count(*) AS n_recip FROM e
                   WHERE EXISTS (SELECT 1 FROM e r
                                 WHERE r.s = e.d AND r.d = e.s)),
            mo AS (SELECT max(x) AS max_out FROM od),
            mi AS (SELECT max(y) AS max_in FROM idg)
            SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
                   CAST(m AS BIGINT) AS n_edges,
                   CAST(n_recip AS BIGINT) AS n_reciprocal,
                   round(CAST(n_recip AS DOUBLE) / m, 6) AS reciprocity,
                   round(CASE WHEN n_nodes < 2 THEN 0.0
                         ELSE CAST(m AS DOUBLE)
                              / (CAST(n_nodes AS DOUBLE)
                                 * CAST(n_nodes - 1 AS DOUBLE)) END, 6)
                     AS density,
                   CAST(max_out AS BIGINT) AS max_out_degree,
                   CAST(max_in AS BIGINT) AS max_in_degree,
                   round(CASE WHEN m * sxx - sx * sx = 0
                               OR m * syy - sy * sy = 0 THEN 0.0
                         ELSE CAST(m * sxy - sx * sy AS DOUBLE)
                              / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                                     * CAST(m * syy - sy * sy AS DOUBLE))
                         END, 6) AS assortativity
            FROM sums CROSS JOIN nn CROSS JOIN rc
            CROSS JOIN mo CROSS JOIN mi""",
        "community_modularity": _modularity_oracle_sql(3),
        "entity_salience": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            dl AS (SELECT doc_id, count(*) AS doc_len FROM tokens
                   GROUP BY doc_id),
            per AS (SELECT doc_id, canonical_id,
                           count(*) AS n_mentions,
                           CAST(min(pos) AS BIGINT) AS first_pos,
                           CAST(max(pos) AS BIGINT) AS last_pos
                    FROM linked GROUP BY doc_id, canonical_id)
            SELECT per.doc_id, canonical_id,
                   CAST(n_mentions AS BIGINT) AS n_mentions,
                   first_pos, last_pos,
                   last_pos - first_pos AS spread,
                   CAST(doc_len AS BIGINT) AS doc_len,
                   round(CAST(n_mentions AS DOUBLE)
                         * (1.0 - CAST(first_pos AS DOUBLE)
                                  / CAST(doc_len AS DOUBLE)), 6)
                     AS salience
            FROM per JOIN dl USING (doc_id)""",
        "negation_scope": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            cues AS (SELECT doc_id AS cd, pos AS cp FROM tokens
                     WHERE lower(token) IN {NEG_CUES_SQL}),
            per AS (SELECT canonical_id, count(*) AS n_mentions
                    FROM linked GROUP BY canonical_id),
            neg AS (SELECT canonical_id, count(*) AS n_negated
                    FROM linked m
                    WHERE EXISTS (SELECT 1 FROM cues c
                                  WHERE c.cd = m.doc_id
                                    AND c.cp < m.pos
                                    AND c.cp >= m.pos - 5)
                    GROUP BY canonical_id)
            SELECT per.canonical_id,
                   CAST(n_mentions AS BIGINT) AS n_mentions,
                   CAST(coalesce(n_negated, 0) AS BIGINT) AS n_negated,
                   round(CAST(coalesce(n_negated, 0) AS DOUBLE)
                         / n_mentions, 6) AS neg_rate
            FROM per LEFT JOIN neg USING (canonical_id)""",
        "entity_resolution": f"""
            WITH RECURSIVE {TOKENS_CTE},
            base AS (SELECT DISTINCT lower(token) AS name FROM tokens),
            names AS (SELECT name FROM base
                      UNION SELECT name || 's' FROM base),
            e AS (SELECT a.name AS src, b.name AS dst
                  FROM names a JOIN names b
                    ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
                   AND a.name < b.name
                   AND levenshtein(a.name, b.name) <= 1),
            sym AS (SELECT src AS a, dst AS b FROM e
                    UNION SELECT dst, src FROM e),
            reach(node, root) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node),
            comp AS (SELECT node, min(root) AS component
                     FROM reach GROUP BY node)
            SELECT n.name, coalesce(c.component, n.name) AS canonical
            FROM names n LEFT JOIN comp c ON n.name = c.node""",
        "mad_outliers": """
            WITH base AS (
              SELECT source,
                     CASE WHEN doc_id % 97 = 0 THEN n_chars * 50
                          ELSE n_chars END AS len
              FROM documents),
            med AS (SELECT source, quantile_cont(len, 0.5) AS median_val,
                           count(*) AS n_rows
                    FROM base GROUP BY source),
            dev AS (SELECT b.source,
                           abs(CAST(b.len AS DOUBLE) - m.median_val)
                             AS absdev,
                           m.median_val, m.n_rows
                    FROM base b JOIN med m USING (source)),
            mad AS (SELECT source, median_val, n_rows,
                           quantile_cont(absdev, 0.5) AS mad
                    FROM dev GROUP BY source, median_val, n_rows),
            ag AS (SELECT d.source,
                          sum(CASE WHEN m2.mad > 0
                                    AND 0.6745 * d.absdev > 3.5 * m2.mad
                                   THEN 1 ELSE 0 END) AS n_outliers
                   FROM dev d
                   JOIN (SELECT source, mad FROM mad) m2 USING (source)
                   GROUP BY d.source)
            SELECT mad.source, median_val, mad, n_rows,
                   CAST(n_outliers AS BIGINT) AS n_outliers,
                   round(CAST(n_outliers AS DOUBLE) / n_rows, 6)
                     AS outlier_rate
            FROM mad JOIN ag USING (source)""",
        "date_mentions": """
            WITH stamped AS (
              SELECT doc_id,
                     text || ' published '
                       || CAST(doc_id % 5 + 2020 AS VARCHAR) || '-'
                       || lpad(CAST(CASE WHEN doc_id % 11 = 0 THEN 13
                                         ELSE doc_id % 12 + 1 END
                                    AS VARCHAR), 2, '0') || '-'
                       || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                       AS text
              FROM documents),
            hits AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                       text, '[0-9]{4}-[0-9]{2}-[0-9]{2}', 0)) AS date_str
              FROM stamped),
            valid AS (
              SELECT doc_id, date_str,
                     substr(date_str, 1, 7) AS month
              FROM hits
              WHERE TRY_CAST(date_str AS DATE) IS NOT NULL)
            SELECT month,
                   CAST(count(*) AS BIGINT) AS n_mentions,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM valid GROUP BY month""",
        "triple_audit": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
            t AS (SELECT DISTINCT a.canonical_id AS s,
                         'cooccurs_with' AS p, b.canonical_id AS o
                  FROM ents a JOIN ents b
                    ON a.doc_id = b.doc_id
                   AND a.canonical_id < b.canonical_id),
            fan AS (SELECT p, s, count(*) AS n_obj FROM t GROUP BY p, s),
            po AS (SELECT p, count(*) AS n_triples,
                          count(DISTINCT o) AS n_objects
                   FROM t GROUP BY p),
            ps AS (SELECT p, count(*) AS n_subjects,
                          CAST(max(n_obj) AS BIGINT) AS max_fanout,
                          sum(CASE WHEN n_obj > 3 THEN 1 ELSE 0 END)
                            AS n_violating_subjects
                   FROM fan GROUP BY p)
            SELECT po.p AS pred,
                   CAST(n_triples AS BIGINT) AS n_triples,
                   CAST(n_subjects AS BIGINT) AS n_subjects,
                   CAST(n_objects AS BIGINT) AS n_objects,
                   max_fanout,
                   CAST(n_violating_subjects AS BIGINT)
                     AS n_violating_subjects,
                   round(CAST(n_violating_subjects AS DOUBLE)
                         / n_subjects, 6) AS violation_rate
            FROM po JOIN ps USING (p)""",
        "vocab_profile": f"""
            WITH {TOKENS_CTE},
            freq AS (SELECT token, count(*) AS n FROM tokens
                     GROUP BY token),
            agg AS (SELECT sum(n) AS n_tokens, count(*) AS n_types,
                           sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                             AS n_hapax,
                           max(n) AS top1
                    FROM freq)
            SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_types AS BIGINT) AS n_types,
                   CAST(n_hapax AS BIGINT) AS n_hapax,
                   round(CAST(n_hapax AS DOUBLE) / n_types, 6)
                     AS hapax_ratio,
                   round(CAST(n_types AS DOUBLE) / n_tokens, 6)
                     AS type_token_ratio,
                   round(CAST(top1 AS DOUBLE) / n_tokens, 6)
                     AS top1_share
            FROM agg""",
        "distance_histogram": f"""
            WITH RECURSIVE {HOST_EDGES_CTE.strip()},
            walk (node, dist) AS (
              SELECT 'src3.example.org', 0
              UNION ALL
              SELECT e.dst, w.dist + 1
              FROM walk w JOIN hedges e ON e.src = w.node
              WHERE w.dist < 3),
            mind AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist
                     FROM walk GROUP BY node),
            hist AS (SELECT dist, count(*) AS n_nodes FROM mind
                     GROUP BY dist),
            tot AS (SELECT count(*) AS total FROM mind)
            SELECT dist,
                   CAST(n_nodes AS BIGINT) AS n_nodes,
                   CAST(sum(n_nodes) OVER (ORDER BY dist
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS cum_nodes,
                   round(CAST(sum(n_nodes) OVER (ORDER BY dist
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS DOUBLE)
                         / CAST(total AS DOUBLE), 6) AS cum_share
            FROM hist CROSS JOIN tot""",
        "linkpred_auc": """
            WITH edges0 AS (
              SELECT DISTINCT source || '.example.org' AS src,
                     'src' || CAST(CASE WHEN doc_id % 2 = 0
                                        THEN doc_id % 7
                                        ELSE doc_id % 3 END AS VARCHAR)
                       || '.example.org' AS dst
              FROM documents),
            norm AS (SELECT DISTINCT least(src, dst) AS a,
                            greatest(src, dst) AS b
                     FROM edges0 WHERE src <> dst),
            hashed AS (SELECT a, b,
                              CAST('0x' || substr(md5(a || ':' || b),
                                                  1, 8) AS BIGINT) % 2
                                AS h
                       FROM norm),
            train AS (SELECT a, b FROM hashed WHERE h <> 0),
            test AS (SELECT a, b FROM hashed WHERE h = 0),
            sym AS (SELECT a, b FROM train
                    UNION ALL SELECT b, a FROM train),
            deg2 AS (SELECT a, count(*) AS deg FROM sym
                     GROUP BY a HAVING count(*) >= 2),
            nbr AS (SELECT s.a AS z, s.b AS n,
                           1.0 / ln(CAST(d.deg AS DOUBLE)) AS w
                    FROM sym s JOIN deg2 d ON d.a = s.a),
            wed AS (SELECT l.n AS a, r.n AS b,
                           round(sum(l.w), 6) AS aa_score
                    FROM nbr l JOIN nbr r ON l.z = r.z AND l.n < r.n
                    GROUP BY l.n, r.n),
            cand AS (SELECT * FROM wed
                     WHERE NOT EXISTS (SELECT 1 FROM sym s
                                       WHERE s.a = wed.a
                                         AND s.b = wed.b)),
            lab AS (SELECT c.aa_score AS score,
                           EXISTS (SELECT 1 FROM test t
                                   WHERE t.a = c.a AND t.b = c.b)
                             AS lbl
                    FROM cand c),
            hist AS (SELECT score,
                            sum(CASE WHEN lbl THEN 1 ELSE 0 END)
                              AS n_pos_s,
                            sum(CASE WHEN lbl THEN 0 ELSE 1 END)
                              AS n_neg_s
                     FROM lab GROUP BY score),
            c AS (SELECT n_pos_s, n_neg_s,
                         coalesce(sum(n_neg_s) OVER (ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cum_neg
                  FROM hist),
            g AS (SELECT sum(n_pos_s) AS n_pos, sum(n_neg_s) AS n_neg,
                         sum(n_pos_s * cum_neg::DOUBLE
                             + 0.5 * n_pos_s * n_neg_s) AS conc
                  FROM c)
            SELECT CAST(n_pos AS BIGINT) AS n_pos,
                   CAST(n_neg AS BIGINT) AS n_neg,
                   CASE WHEN n_pos > 0 AND n_neg > 0
                        THEN round(conc / (n_pos::DOUBLE * n_neg), 6)
                   END AS auc
            FROM g""",
        "chunk_documents": f"""
            WITH {TOKENS_CTE},
            assigned AS (
              SELECT doc_id, pos, token,
                     unnest(generate_series(
                       CASE WHEN pos - 8 + 1 <= 0 THEN 0
                            ELSE (pos - 8 + 4) // 4 END,
                       pos // 4)) AS k
              FROM tokens)
            SELECT doc_id, k AS chunk_id,
                   CAST(k * 4 AS BIGINT) AS chunk_start,
                   count(*) AS n_tokens,
                   string_agg(token, ' ' ORDER BY pos) AS chunk_text
            FROM assigned GROUP BY doc_id, k""",
        "sssp_hosts": f"""
            WITH {HOST_EDGES_CTE},
            base AS (SELECT src AS u, dst AS v,
                            CAST('0x' || substr(md5(src || ':' || dst),
                                                1, 8) AS BIGINT) % 5 + 1
                              AS w
                     FROM hedges),
            dedup AS (SELECT u, v, min(w) AS w FROM base GROUP BY u, v),
            nodes AS (SELECT DISTINCT u AS node FROM dedup
                      UNION SELECT v FROM dedup),
            es AS MATERIALIZED (
              SELECT u, v, w FROM dedup
              UNION ALL
              SELECT node, node, CAST(0 AS BIGINT) FROM nodes),
            d0 AS (SELECT 'src3.example.org' AS node,
                          CAST(0 AS BIGINT) AS dist),
            d1 AS MATERIALIZED (
              SELECT v AS node, min(dist + w) AS dist
              FROM es JOIN d0 d ON es.u = d.node
              GROUP BY v),
            d2 AS MATERIALIZED (
              SELECT v AS node, min(dist + w) AS dist
              FROM es JOIN d1 d ON es.u = d.node
              GROUP BY v),
            d3 AS MATERIALIZED (
              SELECT v AS node, min(dist + w) AS dist
              FROM es JOIN d2 d ON es.u = d.node
              GROUP BY v),
            d4 AS MATERIALIZED (
              SELECT v AS node, min(dist + w) AS dist
              FROM es JOIN d3 d ON es.u = d.node
              GROUP BY v),
            d5 AS MATERIALIZED (
              SELECT v AS node, min(dist + w) AS dist
              FROM es JOIN d4 d ON es.u = d.node
              GROUP BY v),
            d6 AS MATERIALIZED (
              SELECT v AS node, min(dist + w) AS dist
              FROM es JOIN d5 d ON es.u = d.node
              GROUP BY v)
            SELECT node, CAST(dist AS BIGINT) AS dist FROM d6""",
        "entity_centroids": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ed AS (SELECT DISTINCT canonical_id AS entity,
                          doc_id AS d
                   FROM linked),
            dims AS (SELECT vec_id AS d,
                            CAST(generate_subscripts(qv, 1) - 1 AS INT)
                              AS dim,
                            unnest(qv) AS qv
                     FROM (SELECT vec_id, list_transform(embedding,
                                  x -> CAST(round(x::DOUBLE * 1000)
                                            AS BIGINT)) AS qv
                           FROM embeddings))
            SELECT ed.entity AS canonical_id, dims.dim,
                   CAST(sum(dims.qv) AS BIGINT) AS csum,
                   count(DISTINCT ed.d) AS n_docs
            FROM ed JOIN dims USING (d)
            GROUP BY 1, 2""",
        "wl_fingerprint": f"""
            WITH {HOST_EDGES_CTE},
            sym AS (SELECT src AS a, dst AS b FROM hedges WHERE src <> dst
                    UNION
                    SELECT dst, src FROM hedges WHERE src <> dst),
            c0 AS (SELECT a AS node, CAST(count(*) AS VARCHAR) AS wl
                   FROM sym GROUP BY a),
            nb1 AS (SELECT s.a AS node,
                           string_agg(c.wl, ',' ORDER BY c.wl) AS nbs
                    FROM sym s JOIN c0 c ON c.node = s.b GROUP BY s.a),
            c1 AS (SELECT c0.node,
                          substr(md5(c0.wl || ',' || nb1.nbs), 1, 16) AS wl
                   FROM c0 JOIN nb1 USING (node)),
            nb2 AS (SELECT s.a AS node,
                           string_agg(c.wl, ',' ORDER BY c.wl) AS nbs
                    FROM sym s JOIN c1 c ON c.node = s.b GROUP BY s.a),
            c2 AS (SELECT c1.node,
                          substr(md5(c1.wl || ',' || nb2.nbs), 1, 16) AS wl
                   FROM c1 JOIN nb2 USING (node))
            SELECT wl, count(*) AS n_nodes FROM c2 GROUP BY wl""",
        "kge_negatives": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ents0 AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
            pos AS (SELECT DISTINCT a.canonical_id AS subj,
                           'cooccurs_with' AS pred,
                           b.canonical_id AS obj
                    FROM ents0 a JOIN ents0 b
                      ON a.doc_id = b.doc_id
                     AND a.canonical_id < b.canonical_id),
            e AS (SELECT e, CAST(row_number() OVER (ORDER BY e) AS BIGINT)
                           AS vid
                  FROM (SELECT DISTINCT subj AS e FROM pos
                        UNION SELECT obj FROM pos)),
            es AS (SELECT count(*) AS n_ents FROM e),
            base AS (SELECT subj, pred, obj, j
                     FROM pos CROSS JOIN (VALUES (1), (2)) AS js(j)),
            hashes AS (SELECT subj, pred, obj,
                              CAST('0x' || substr(md5(subj || ':' || pred
                                || ':' || obj || ':' || j), 1, 8)
                                AS BIGINT) AS sh,
                              CAST('0x' || substr(md5(subj || ':' || pred
                                || ':' || obj || ':' || j || ':e'), 1, 8)
                                AS BIGINT) AS eh
                       FROM base),
            corr AS (SELECT h.subj AS s0, h.pred, h.obj AS o0,
                            (h.sh % 2 = 0) AS ct, e.e
                     FROM hashes h
                     CROSS JOIN es
                     JOIN e ON e.vid = h.eh % es.n_ents + 1),
            cand AS (SELECT CASE WHEN ct THEN s0 ELSE e END AS subj,
                            pred,
                            CASE WHEN ct THEN e ELSE o0 END AS obj
                     FROM corr),
            negs AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
                       SELECT 1 FROM pos p
                       WHERE p.subj = c.subj AND p.pred = c.pred
                         AND p.obj = c.obj))
            SELECT subj, pred, obj, 1 AS label FROM pos
            UNION ALL
            SELECT subj, pred, obj, 0 FROM negs""",
        "abbrev_aliases": """
            WITH aug AS (
              SELECT doc_id,
                CASE WHEN len(ws) >= 2 THEN
                  CASE WHEN doc_id % 2 = 0
                    THEN text || ' ' || ws[1] || ' ' || ws[2] || ' ('
                         || upper(left(ws[1], 1) || left(ws[2], 1)) || ')'
                    ELSE text || ' ' || ws[1] || ' ' || ws[2] || ' (ZZ)'
                  END
                ELSE text END AS text
              FROM (SELECT doc_id, text,
                           regexp_split_to_array(trim(text), '\\s+') AS ws
                    FROM documents)),
            m AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text,
                       '((?:[A-Za-z]+ ){1,8})\\(([A-Z]{2,8})\\)', 1)) AS lf,
                     unnest(regexp_extract_all(text,
                       '((?:[A-Za-z]+ ){1,8})\\(([A-Z]{2,8})\\)', 2)) AS ab
              FROM aug),
            w AS (SELECT doc_id, string_split(trim(lf), ' ') AS words,
                         ab AS abbr
                  FROM m),
            c AS (SELECT doc_id, abbr,
                         list_slice(words, len(words) - len(abbr) + 1,
                                    len(words)) AS cand
                  FROM w WHERE len(words) >= len(abbr)),
            ok AS (SELECT doc_id, abbr,
                          lower(array_to_string(cand, ' ')) AS long_form,
                          array_to_string(list_transform(cand,
                            x -> upper(x[1])), '') AS ini
                   FROM c)
            SELECT abbr, long_form, count(DISTINCT doc_id) AS n_docs
            FROM ok WHERE ini = abbr
            GROUP BY abbr, long_form""",
        "char_entropy": """
            WITH chars AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '(?s).', 0)) AS ch
              FROM documents),
            hist AS (SELECT doc_id, ch, count(*) AS c
                     FROM chars GROUP BY doc_id, ch),
            per AS (SELECT doc_id,
                           CAST(sum(c) AS BIGINT) AS n_chars_total,
                           count(*) AS n_distinct_chars,
                           round(ln(sum(c)::DOUBLE)
                                 - sum(c * ln(c::DOUBLE)) / sum(c), 6)
                             AS entropy
                    FROM hist GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(p.n_chars_total, 0) AS n_chars_total,
                   coalesce(p.n_distinct_chars, 0) AS n_distinct_chars,
                   coalesce(p.entropy, 0.0) AS entropy
            FROM documents d LEFT JOIN per p USING (doc_id)""",
        "lm_perplexity": f"""
            WITH {TOKENS_CTE},
            bg AS (
              SELECT t1.doc_id, t1.token AS w1, t2.token AS w2,
                     ((t1.doc_id * {KNUTH}) % {HASH_MOD}) % 2 AS part
              FROM tokens t1 JOIN tokens t2
                ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg
                    WHERE part <> 0 GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
                   FROM c12 GROUP BY w1),
            v AS (SELECT count(DISTINCT w) AS v FROM (
                    SELECT w2 AS w FROM bg WHERE part <> 0
                    UNION ALL SELECT w1 FROM bg WHERE part <> 0)),
            s AS (SELECT b.doc_id,
                         -ln((coalesce(c12.c12, 0) + 0.5)
                             / (coalesce(c1.c1, 0)
                                + 0.5 * greatest((SELECT v FROM v), 1))
                             ) AS nll
                  FROM bg b
                  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
                  LEFT JOIN c1 ON b.w1 = c1.w1
                  WHERE b.part = 0)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(nll), 6) AS xent
            FROM s GROUP BY doc_id""",
        "disambiguate_link": f"""
            WITH {TOKENS_CTE},
            cand AS (
              SELECT surface, canonical_id,
                     count(*) OVER (PARTITION BY surface) AS n_cands
              FROM (SELECT DISTINCT surface, canonical_id
                    FROM (VALUES {DISAMBIG_VALUES_SQL})
                         AS g(surface, label, canonical_id))),
            sure AS (SELECT DISTINCT t.doc_id, c.canonical_id
                     FROM tokens t
                     JOIN cand c ON t.token = c.surface AND c.n_cands = 1),
            cooc AS (SELECT a.canonical_id AS x, b.canonical_id AS y,
                            count(*) AS n_docs
                     FROM sure a JOIN sure b
                       ON a.doc_id = b.doc_id
                      AND a.canonical_id < b.canonical_id
                     GROUP BY x, y),
            coocs AS (SELECT x, y, n_docs FROM cooc
                      UNION ALL SELECT y, x, n_docs FROM cooc),
            amb AS (SELECT t.doc_id, t.pos, c.surface, c.canonical_id,
                           c.n_cands
                    FROM tokens t
                    JOIN cand c ON t.token = c.surface AND c.n_cands > 1),
            scored AS (
              SELECT a.doc_id, a.pos, a.surface, a.canonical_id,
                     a.n_cands, coalesce(sum(cs.n_docs), 0) AS score
              FROM amb a
              LEFT JOIN sure s ON s.doc_id = a.doc_id
              LEFT JOIN coocs cs ON cs.x = a.canonical_id
                                AND cs.y = s.canonical_id
              GROUP BY a.doc_id, a.pos, a.surface, a.canonical_id,
                       a.n_cands)
            SELECT doc_id, pos, surface, canonical_id,
                   CAST(score AS BIGINT) AS score,
                   CAST(n_cands AS BIGINT) AS n_cands
            FROM scored
            QUALIFY row_number() OVER (
              PARTITION BY doc_id, pos
              ORDER BY score DESC, canonical_id) = 1""",
        "label_propagation": _label_propagation_oracle_sql(3),
        "link_prediction": """
            WITH edges AS (
              SELECT DISTINCT source || '.example.org' AS src,
                     'src' || CAST(CASE WHEN doc_id % 2 = 0
                                        THEN doc_id % 7
                                        ELSE doc_id % 3 END AS VARCHAR)
                       || '.example.org' AS dst
              FROM documents),
            sym AS (SELECT src AS a, dst AS b FROM edges
                    UNION SELECT dst, src FROM edges),
            deg2 AS (SELECT a, count(*) AS deg FROM sym
                     GROUP BY a HAVING count(*) >= 2),
            nbr AS (SELECT s.a AS z, s.b AS n,
                           1.0 / ln(CAST(d.deg AS DOUBLE)) AS w
                    FROM sym s JOIN deg2 d ON d.a = s.a),
            wed AS (SELECT l.n AS a, r.n AS b, count(*) AS n_common,
                           round(sum(l.w), 6) AS aa_score
                    FROM nbr l JOIN nbr r ON l.z = r.z AND l.n < r.n
                    GROUP BY l.n, r.n),
            cand AS (SELECT * FROM wed
                     WHERE NOT EXISTS (SELECT 1 FROM sym s
                                       WHERE s.a = wed.a AND s.b = wed.b))
            SELECT a, b, CAST(n_common AS BIGINT) AS n_common, aa_score
            FROM cand ORDER BY aa_score DESC, a, b LIMIT 20""",
        "trending_entities": """
            WITH obs AS (
              SELECT 'user:' || CAST(user_id AS VARCHAR) AS node,
                     CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT)
                       AS snap
              FROM events),
            counts AS (SELECT node, snap, count(*) AS n
                       FROM obs GROUP BY node, snap),
            lagged AS (SELECT node, snap, n,
                              lag(n) OVER (PARTITION BY node
                                           ORDER BY snap) AS pn,
                              lag(snap) OVER (PARTITION BY node
                                              ORDER BY snap) AS ps
                       FROM counts)
            SELECT node, snap, CAST(n AS BIGINT) AS n,
                   CAST(CASE WHEN ps = snap - 1 THEN pn ELSE 0 END
                        AS BIGINT) AS prev_n,
                   CASE WHEN ps = snap - 1 AND pn > 0
                        THEN round(CAST(n AS DOUBLE) / pn, 6) END AS growth
            FROM lagged
            WHERE CASE WHEN ps = snap - 1 THEN pn ELSE 0 END >= 1""",
        "robots_filter": """
            WITH pages AS (
              SELECT 'https://' || source || '.example.org'
                       || CASE WHEN doc_id % 3 = 0 THEN '/private/'
                               WHEN doc_id % 3 = 1 THEN '/tmp/'
                               ELSE '/doc/' END
                       || CAST(doc_id AS VARCHAR) AS url,
                     doc_id,
                     source || '.example.org' AS host,
                     CASE WHEN doc_id % 3 = 0 THEN '/private/'
                          WHEN doc_id % 3 = 1 THEN '/tmp/'
                          ELSE '/doc/' END
                       || CAST(doc_id AS VARCHAR) AS path
              FROM documents)
            SELECT url, doc_id, host, path FROM pages
            WHERE doc_id % 3 = 2
               OR (doc_id % 3 = 1 AND (doc_id % 20) % 2 = 1)""",
        "sitemap_urls": """
            SELECT source || '.example.org' AS host,
                   'https://' || source || '.example.org/doc/'
                     || CAST(doc_id AS VARCHAR) AS loc
            FROM documents""",
        "kmeans_embeddings": _kmeans_oracle_sql(4, 3),
        "semdedup": _semdedup_oracle_sql(4, 2, 0.35),
        "hits_hosts": f"""
            WITH {HOST_EDGES_CTE.strip()},
            nodes AS (SELECT src AS node FROM hedges
                      UNION SELECT dst FROM hedges),
            -- h0 = 1 everywhere, so auth after half-round 1 = in-degree
            a1 AS (SELECT n.node,
                          COALESCE(x.a, 0) AS a
                   FROM nodes n LEFT JOIN (
                     SELECT dst AS node, CAST(count(*) AS BIGINT) AS a
                     FROM hedges GROUP BY dst) x USING (node)),
            h1 AS (SELECT n.node, COALESCE(x.h, 0) AS h
                   FROM nodes n LEFT JOIN (
                     SELECT e.src AS node, sum(a1.a) AS h
                     FROM hedges e JOIN a1 ON a1.node = e.dst
                     GROUP BY e.src) x USING (node)),
            a2 AS (SELECT n.node, COALESCE(x.a, 0) AS a
                   FROM nodes n LEFT JOIN (
                     SELECT e.dst AS node, sum(h1.h) AS a
                     FROM hedges e JOIN h1 ON h1.node = e.src
                     GROUP BY e.dst) x USING (node)),
            h2 AS (SELECT n.node, COALESCE(x.h, 0) AS h
                   FROM nodes n LEFT JOIN (
                     SELECT e.src AS node, sum(a2.a) AS h
                     FROM hedges e JOIN a2 ON a2.node = e.dst
                     GROUP BY e.src) x USING (node))
            SELECT n.node, CAST(h2.h AS BIGINT) AS hub,
                   CAST(a2.a AS BIGINT) AS auth
            FROM nodes n JOIN h2 USING (node) JOIN a2 USING (node)""",
        "khop_hosts": f"""
            WITH RECURSIVE {HOST_EDGES_CTE.strip()},
            walk (node, dist) AS (
              SELECT 'src3.example.org', 0
              UNION ALL
              SELECT e.dst, w.dist + 1
              FROM walk w JOIN hedges e ON e.src = w.node
              WHERE w.dist < 3)
            SELECT node, CAST(min(dist) AS BIGINT) AS dist
            FROM walk GROUP BY node""",
        "bm25_search": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dl AS (SELECT doc_id, count(*) AS dl
                   FROM tokens GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            qt AS (SELECT unnest(['spark', 'stream', 'vector']) AS token),
            hits AS (SELECT tf.* FROM tf JOIN qt USING (token)),
            dfq AS (SELECT token, count(*) AS df FROM hits GROUP BY token),
            scored AS (
              SELECT h.doc_id, count(*) AS n_hits,
                     round(sum(
                       ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * h.tf * 2.2
                       / (h.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                     ), 6) AS score
              FROM hits h
              JOIN dfq d USING (token)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
              GROUP BY h.doc_id)
            SELECT doc_id, n_hits, score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
            FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 15""",
        "dsir_weights": f"""
            WITH {TOKENS_CTE},
            grams AS (
              SELECT doc_id,
                     CAST('0x' || substr(md5(token || ' ' || nxt), 1, 8)
                          AS BIGINT) % 64 AS bucket
              FROM (SELECT doc_id, token,
                           lead(token) OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS nxt
                    FROM tokens)
              WHERE nxt IS NOT NULL),
            tgt AS (SELECT g.* FROM grams g
                    WHERE g.doc_id IN (SELECT doc_id FROM documents
                                       WHERE source IN ('src0', 'src1'))),
            hist AS (
              SELECT r.bucket, r.n_raw, COALESCE(t.n_tgt, 0) AS n_tgt
              FROM (SELECT bucket, count(*) AS n_raw
                    FROM grams GROUP BY bucket) r
              LEFT JOIN (SELECT bucket, count(*) AS n_tgt
                         FROM tgt GROUP BY bucket) t USING (bucket)),
            totals AS (SELECT sum(n_raw) AS tot_raw, sum(n_tgt) AS tot_tgt
                       FROM hist),
            scored AS (
              SELECT g.doc_id, count(*) AS n_features,
                     round(sum(
                       ln((h.n_tgt + 1)::DOUBLE / (t.tot_tgt + 64))
                       - ln((h.n_raw + 1)::DOUBLE / (t.tot_raw + 64))
                     ), 6) AS logw
              FROM grams g JOIN hist h USING (bucket) CROSS JOIN totals t
              GROUP BY g.doc_id)
            SELECT d.doc_id,
                   COALESCE(s.n_features, 0) AS n_features,
                   COALESCE(s.logw, 0.0) AS logw
            FROM (SELECT DISTINCT doc_id FROM tokens) d
            LEFT JOIN scored s USING (doc_id)""",
        "bpe_pair_stats": f"""
            WITH {TOKENS_CTE},
            wf AS (SELECT token AS word, count(*) AS freq
                   FROM tokens GROUP BY token),
            chars AS (SELECT freq,
                             list_append(regexp_extract_all(word, '.'),
                                         '</w>') AS cs
                      FROM wf),
            pairs AS (SELECT c.freq, c.cs[t.g] AS lhs, c.cs[t.g + 1] AS rhs
                      FROM chars c,
                           UNNEST(generate_series(1, len(c.cs) - 1))
                             AS t(g))
            SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS pair_freq
            FROM pairs GROUP BY lhs, rhs""",
        "warc_records": """
            SELECT 'https://' || source || '.example.org/doc/'
                     || CAST(doc_id AS VARCHAR) AS url,
                   'response' AS rec_type,
                   strftime(TIMESTAMP '2024-01-01 00:00:00'
                            + doc_id * INTERVAL 1 SECOND,
                            '%Y-%m-%d %H:%M:%S') AS ts_str,
                   CAST(length(text) AS BIGINT) AS n_payload
            FROM documents""",
        "typed_triples": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            pairs AS (
              SELECT m1.doc_id, m1.canonical_id AS subj,
                     m2.canonical_id AS obj, m1.pos AS p1, m2.pos AS p2
              FROM linked m1 JOIN linked m2
                ON m1.doc_id = m2.doc_id AND m2.pos > m1.pos
               AND m2.pos - m1.pos <= 10
               AND m2.canonical_id <> m1.canonical_id),
            np AS (SELECT subj, obj, count(*) AS n_pairs,
                          count(DISTINCT doc_id) AS n_docs
                   FROM pairs GROUP BY subj, obj),
            bet AS (SELECT p.subj, p.obj, t.token AS ptok
                    FROM pairs p JOIN tokens t
                      ON t.doc_id = p.doc_id
                     AND t.pos > p.p1 AND t.pos < p.p2
                    WHERE t.token NOT IN ({STOPWORDS_IN_SQL})),
            tc AS (SELECT subj, obj, ptok, count(*) AS pred_freq
                   FROM bet GROUP BY subj, obj, ptok),
            top AS (SELECT * FROM tc
                    QUALIFY row_number() OVER (
                      PARTITION BY subj, obj
                      ORDER BY pred_freq DESC, ptok) = 1)
            SELECT t.subj, t.ptok AS pred, t.obj,
                   CAST(n.n_pairs AS BIGINT) AS n_pairs,
                   CAST(n.n_docs AS BIGINT) AS n_docs,
                   CAST(t.pred_freq AS BIGINT) AS pred_freq
            FROM top t JOIN np n ON t.subj = n.subj AND t.obj = n.obj""",
        "triple_history": """
            WITH obs AS (
              SELECT DISTINCT
                     'user:' || CAST(user_id AS VARCHAR) AS subj,
                     'did' AS pred, event_type AS obj,
                     CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT)
                       AS snap
              FROM events),
            isl AS (SELECT *, snap - row_number() OVER (
                      PARTITION BY subj, pred, obj ORDER BY snap) AS island
                    FROM obs)
            SELECT subj, pred, obj,
                   min(snap) AS valid_from, max(snap) AS valid_to,
                   CAST(count(*) AS BIGINT) AS n_snaps
            FROM isl GROUP BY subj, pred, obj, island""",
        "type_closure": f"""
            WITH RECURSIVE {TOKENS_CTE}, {LINKED_CTE},
            hier(child, parent) AS (
              SELECT * FROM (VALUES {HIER_VALUES_SQL}) h(c, p)),
            closure(c, p) AS (
              SELECT child, parent FROM hier
              UNION
              SELECT cl.c, h.parent FROM closure cl
              JOIN hier h ON cl.p = h.child),
            facts AS (SELECT label AS t, count(*) AS n
                      FROM linked GROUP BY label),
            allt AS (SELECT t FROM facts
                     UNION SELECT c FROM closure
                     UNION SELECT p FROM closure),
            bridge AS (SELECT c AS t, p AS anc FROM closure
                       UNION ALL SELECT t, t FROM allt)
            SELECT anc AS ancestor_type,
                   CAST(coalesce(sum(n), 0) AS BIGINT) AS n_total,
                   CAST(coalesce(sum(CASE WHEN t = anc THEN n END), 0)
                        AS BIGINT) AS n_direct,
                   count(CASE WHEN n IS NOT NULL THEN 1 END) AS n_types
            FROM bridge LEFT JOIN facts USING (t)
            GROUP BY anc""",
        "crawl_frontier": """
            WITH pages AS (
              SELECT source || '.example.org' AS host,
                     'https://' || source || '.example.org/doc/'
                       || CAST(doc_id AS VARCHAR) AS url,
                     doc_id
              FROM documents),
            edges AS (SELECT DISTINCT source || '.example.org' AS src_host,
                             'src' || CAST(doc_id % 7 AS VARCHAR)
                               || '.example.org' AS dst_host
                      FROM documents),
            indeg AS (SELECT dst_host AS host,
                             count(DISTINCT src_host) AS in_deg
                      FROM edges GROUP BY dst_host),
            base AS (
              SELECT h.host, h.url,
                     CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
                     CAST((SELECT max(doc_id) FROM documents) - h.doc_id
                          AS BIGINT) AS age_sec
              FROM pages h LEFT JOIN indeg i USING (host)),
            pri AS (SELECT *, round((in_deg + 1)
                                    * ln(1 + CAST(age_sec AS DOUBLE)),
                                    6) AS priority
                    FROM base)
            SELECT host, url, in_deg, age_sec, priority,
                   CAST(row_number() OVER (
                     PARTITION BY host
                     ORDER BY priority DESC, url) AS BIGINT) AS rk
            FROM pri
            QUALIFY rk <= 3""",
        "triangle_entities": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE}, {ENTITY_EDGES_CTE},
            -- e is already id-oriented (src < dst) and distinct; the
            -- triangle SET is orientation-independent, so this plain
            -- ordering matches Spark's degree-ordered implementation
            tri AS (
              SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
              FROM e e1
              JOIN e e2 ON e2.src = e1.dst
              JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            corners AS (
              SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri),
            pern AS (SELECT node, count(*) AS n_triangles
                     FROM corners GROUP BY node)
            SELECT o.a AS node,
                   CAST(coalesce(p.n_triangles, 0) AS BIGINT) AS n_triangles
            FROM outdeg o LEFT JOIN pern p ON p.node = o.a""",
        "edge_pmi": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
            marg AS (SELECT canonical_id, count(*) AS c
                     FROM ents GROUP BY canonical_id),
            nn AS (SELECT count(DISTINCT doc_id) AS n_docs FROM ents),
            pairs AS (
              SELECT a.canonical_id AS subj, b.canonical_id AS obj,
                     count(*) AS c_ab
              FROM ents a JOIN ents b
                ON a.doc_id = b.doc_id AND a.canonical_id < b.canonical_id
              GROUP BY 1, 2)
            SELECT p.subj, p.obj, CAST(p.c_ab AS BIGINT) AS c_ab,
                   round(ln(CAST(p.c_ab AS DOUBLE)
                            * (SELECT n_docs FROM nn)
                            / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE))),
                         6) AS pmi
            FROM pairs p
            JOIN marg ma ON ma.canonical_id = p.subj
            JOIN marg mb ON mb.canonical_id = p.obj""",
        "tfidf_topterms": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
            nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf)
            SELECT t.doc_id, t.token,
                   CAST(t.tf AS BIGINT) AS tf,
                   CAST(d.df AS BIGINT) AS df,
                   round(CAST(t.tf AS DOUBLE)
                         * ln(CAST((SELECT n FROM nn) AS DOUBLE) / d.df),
                         6) AS tfidf
            FROM tf t JOIN dfreq d USING (token)""",
        "quality_filter": f"""
            WITH {TOKENS_CTE},
            qbase AS ({qualities}),
            narrow AS (
              SELECT doc_id,
                     (n_stop / greatest(n_tokens, 1)::DOUBLE) > 0.02
                       AS lang_ok,
                     round(0.4 * least(n_tokens / 100.0, 1.0)
                           + 0.3 * (1 - n_punct / greatest(n_tokens, 1)::DOUBLE)
                           + 0.3 * least((n_stop / greatest(n_tokens, 1)::DOUBLE) / 0.05, 1.0),
                           6) >= 0.5 AS quality_ok
              FROM qbase),
            w AS (
              SELECT doc_id,
                     string_split(trim(coalesce(text, '')), ' ') AS words
              FROM documents),
            gbase AS (
              SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
                     round(list_sum(list_transform(words, x -> length(x)))
                           / greatest(len(words), 1)::DOUBLE, 6
                           ) AS mean_word_len
              FROM w),
            bi AS (
              SELECT doc_id,
                     round(max(c) / sum(c)::DOUBLE, 6) AS top_bigram_frac
              FROM (SELECT doc_id, g, count(*) AS c
                    FROM (SELECT doc_id,
                                 unnest(list_transform(
                                   range(1, len(words)),
                                   i -> words[i] || ' ' || words[i+1])) AS g
                          FROM w)
                    GROUP BY doc_id, g)
              GROUP BY doc_id),
            tri AS (
              SELECT doc_id,
                     round((count(*) - count(DISTINCT g))
                           / count(*)::DOUBLE, 6) AS dup_trigram_frac
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             range(1, len(words) - 1),
                             i -> words[i] || ' ' || words[i+1]
                                  || ' ' || words[i+2])) AS g
                    FROM w)
              GROUP BY doc_id),
            gopher AS (
              SELECT b.doc_id,
                     (b.n_words >= 40
                      AND b.mean_word_len >= 2.0 AND b.mean_word_len <= 10.0
                      AND coalesce(bi.top_bigram_frac, 0.0) <= 0.12
                      AND coalesce(tri.dup_trigram_frac, 0.0) <= 0.30)
                       AS gopher_ok
              FROM gbase b
              LEFT JOIN bi USING (doc_id)
              LEFT JOIN tri USING (doc_id))
            SELECT n.doc_id,
                   (lang_ok AND quality_ok AND gopher_ok) AS keep,
                   CAST((CASE WHEN lang_ok THEN 0 ELSE 1 END)
                        + (CASE WHEN quality_ok THEN 0 ELSE 1 END)
                        + (CASE WHEN gopher_ok THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_failed,
                   concat_ws(',',
                     CASE WHEN NOT lang_ok THEN 'lang' END,
                     CASE WHEN NOT quality_ok THEN 'low_quality' END,
                     CASE WHEN NOT gopher_ok THEN 'repetition' END)
                     AS reasons
            FROM narrow n JOIN gopher USING (doc_id)""",
        "proximity_triples": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            pairs AS (
              SELECT a.doc_id,
                     least(a.canonical_id, b.canonical_id) AS subj,
                     greatest(a.canonical_id, b.canonical_id) AS obj
              FROM linked a JOIN linked b
                ON a.doc_id = b.doc_id
               AND a.pos < b.pos AND b.pos - a.pos <= 10
               AND a.canonical_id <> b.canonical_id)
            SELECT subj, 'near_10' AS pred, obj,
                   CAST(count(*) AS BIGINT) AS n_cooccur,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM pairs GROUP BY subj, obj""",
        "centroid_classify": f"""
            WITH q AS (
              SELECT vec_id, label,
                     ((vec_id * {KNUTH}) % {HASH_MOD}) % 5 AS fold,
                     list_transform(embedding,
                       x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS (
              SELECT vec_id, label, fold,
                     CAST(generate_subscripts(qv, 1) AS INT) AS dim,
                     unnest(qv) AS v
              FROM q),
            cent AS (
              SELECT label AS c_label, dim, sum(v) AS csum
              FROM vals WHERE fold != 0 GROUP BY label, dim),
            cnorm AS (
              SELECT c_label, sum(csum * csum) AS cnorm2
              FROM cent GROUP BY c_label),
            dots AS (
              SELECT t.vec_id, c.c_label, sum(t.v * c.csum) AS dot
              FROM vals t JOIN cent c ON t.dim = c.dim
              WHERE t.fold = 0
              GROUP BY t.vec_id, c.c_label),
            scored AS (
              SELECT d.vec_id, d.c_label,
                     d.dot / sqrt(n.cnorm2::DOUBLE) AS score
              FROM dots d JOIN cnorm n USING (c_label)),
            pred AS (
              SELECT vec_id, c_label AS pred_label,
                     ROW_NUMBER() OVER (PARTITION BY vec_id
                          ORDER BY score DESC, c_label ASC) AS rn
              FROM scored)
            SELECT CAST(t.label AS BIGINT) AS true_label,
                   CAST(p.pred_label AS BIGINT) AS pred_label,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM pred p
            JOIN (SELECT DISTINCT vec_id, label FROM q WHERE fold = 0) t
              USING (vec_id)
            WHERE p.rn = 1
            GROUP BY t.label, p.pred_label""",
        "degree_hist": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            ents AS (SELECT DISTINCT doc_id, canonical_id FROM linked),
            tri AS (SELECT a.canonical_id AS subj, b.canonical_id AS obj
                    FROM ents a JOIN ents b
                      ON a.doc_id = b.doc_id
                     AND a.canonical_id < b.canonical_id
                    GROUP BY a.canonical_id, b.canonical_id),
            sym AS (SELECT subj AS a, obj AS b FROM tri
                    UNION SELECT obj, subj FROM tri),
            deg AS (SELECT a, CAST(count(*) AS BIGINT) AS degree
                    FROM sym GROUP BY a)
            SELECT degree, CAST(count(*) AS BIGINT) AS n_entities
            FROM deg GROUP BY degree""",
        "tfidf_ranked": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
            nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
            scored AS (
              SELECT t.doc_id, t.token, CAST(t.tf AS BIGINT) AS tf,
                     round(CAST(t.tf AS DOUBLE)
                           * ln(CAST((SELECT n FROM nn) AS DOUBLE) / d.df),
                           6) AS tfidf
              FROM tf t JOIN dfreq d USING (token)),
            ranked AS (
              SELECT *,
                     CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY tfidf DESC, token) AS BIGINT) AS rank
              FROM scored)
            SELECT doc_id, token, tf, tfidf, rank
            FROM ranked WHERE rank <= 3""",
        "sentence_split": f"""
            SELECT doc_id, sent_idx, sentence FROM (
              SELECT doc_id,
                     CAST(generate_subscripts(arr, 1) - 1 AS BIGINT)
                       AS sent_idx,
                     unnest(arr) AS sentence
              FROM (SELECT doc_id,
                           string_split(
                             regexp_replace(text,
                               '{SENT_BOUNDARY_NOLB}',
                               '\\1' || chr(30), 'g'),
                             chr(30)) AS arr
                    FROM documents))
            WHERE sentence <> ''""",
        "fuzzy_link": f"""
            WITH {TOKENS_CTE},
            vocab AS (SELECT DISTINCT token FROM tokens),
            cand AS (
              SELECT v.token, g.surface, g.label, g.canonical_id,
                     CAST(levenshtein(v.token, g.surface) AS BIGINT)
                       AS n_edits
              FROM vocab v
              JOIN (VALUES {DICT_VALUES_SQL})
                AS g(surface, label, canonical_id)
                ON levenshtein(v.token, g.surface) <= 1),
            best AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY token
                        ORDER BY n_edits, surface) AS rn
              FROM cand)
            SELECT t.doc_id, t.pos, t.token, b.surface, b.label,
                   b.canonical_id, b.n_edits
            FROM tokens t JOIN best b ON t.token = b.token AND b.rn = 1""",
        "dict_mentions": f"""
            WITH {TOKENS_CTE},
            cand AS (
              SELECT doc_id, pos, token,
                     lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS t1
              FROM tokens),
            bi AS (
              SELECT c.doc_id, CAST(c.pos AS BIGINT) AS start_pos,
                     CAST(2 AS BIGINT) AS n_tokens,
                     g.surface, g.label, g.canonical_id
              FROM cand c
              JOIN (VALUES {MULTI_DICT_VALUES_SQL})
                AS g(surface, label, canonical_id)
                ON c.token || ' ' || c.t1 = g.surface),
            covered AS (
              SELECT doc_id, start_pos AS pos FROM bi
              UNION SELECT doc_id, start_pos + 1 FROM bi),
            uni AS (
              SELECT c.doc_id, CAST(c.pos AS BIGINT) AS start_pos,
                     CAST(1 AS BIGINT) AS n_tokens,
                     g.surface, g.label, g.canonical_id
              FROM cand c
              JOIN (VALUES {DICT_VALUES_SQL})
                AS g(surface, label, canonical_id)
                ON c.token = g.surface
              WHERE NOT EXISTS (SELECT 1 FROM covered v
                                WHERE v.doc_id = c.doc_id
                                  AND v.pos = c.pos))
            SELECT * FROM bi UNION ALL SELECT * FROM uni""",
        "hypertable_rollup": """
            WITH hour AS (
              SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
                     event_type, count(*) AS n_events,
                     sum(CAST(value AS DECIMAL(18,2))) AS total
              FROM events GROUP BY 1, 2),
            day AS (
              -- CAST: DuckDB sum(BIGINT) -> HUGEINT -> float64 in pandas,
              -- which hash-mismatched Spark's int64 in CORRECTNESS_r02.
              SELECT (bucket_us // 86400000000) * 86400000000 AS bucket_us,
                     event_type, CAST(sum(n_events) AS BIGINT) AS n_events,
                     sum(total) AS total
              FROM hour GROUP BY 1, 2)
            SELECT 'hour' AS grain, bucket_us, event_type, n_events,
                   CAST(total AS DOUBLE) AS total_value
            FROM hour
            UNION ALL
            SELECT 'day' AS grain, bucket_us, event_type, n_events,
                   CAST(total AS DOUBLE) AS total_value
            FROM day""",
        "kmv_distinct": f"""
            WITH {TOKENS_CTE}, {VOCAB_CTE},
            src AS (
              SELECT d.source, v.token_id
              FROM tokens t JOIN vocab v USING (token)
              JOIN documents d USING (doc_id)),
            hashed AS (
              SELECT DISTINCT source,
                     (976369111 * token_id + 563079003) % 2147483647 AS h
              FROM src),
            topk AS (
              SELECT source, h,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
              FROM hashed),
            pg AS (SELECT source, max(h) AS kth, count(*) AS k_eff
                   FROM topk WHERE rn <= 16 GROUP BY source),
            exact AS (SELECT source, count(DISTINCT token_id) AS exact_distinct
                      FROM src GROUP BY source)
            SELECT p.source,
                   CAST(CASE WHEN k_eff < 16 THEN k_eff
                             ELSE (15 * CAST(2147483647 AS BIGINT)) // kth
                        END AS BIGINT) AS est_distinct,
                   exact_distinct
            FROM pg p JOIN exact USING (source)""",
        "range_join_clicks": """
            SELECT p.user_id, p.event_id,
                   count(*) AS n_clicks,
                   round(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE), 6)
                     AS click_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id
             AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
             AND epoch_us(c.ts) <= epoch_us(p.ts) - 1
            GROUP BY p.user_id, p.event_id""",
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1995-07-01'
              AND o_orderdate <  TIMESTAMP '1996-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_quantity > 45)
            GROUP BY o_orderpriority""",
        "moving_avg": """
            SELECT user_id, event_id,
                   round(CAST(avg(CAST(value AS DECIMAL(18,2)))
                              OVER (PARTITION BY user_id ORDER BY event_id
                                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                         AS DOUBLE), 6) AS mavg3
            FROM events""",
        "median_by_source": """
            SELECT source,
                   quantile_cont(n_chars, 0.5) AS median_chars,
                   quantile_cont(n_chars, 0.9) AS p90_chars,
                   count(*) AS n_docs
            FROM documents GROUP BY source""",
        "cube_revenue": """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                     AS total_price,
                   count(*) AS n_orders
            FROM orders
            GROUP BY CUBE (o_orderpriority, o_orderstatus)""",
        "grouping_sets_revenue": """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                     AS total_price,
                   count(*) AS n_orders
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""",
        "xml_articles": """
            SELECT doc_id, substr(text, 1, 40) AS title,
                   CAST(length(text) AS BIGINT) AS n_abstract_chars
            FROM documents""",
        "setops_active_customers": """
            WITH pos AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0),
            wo AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
            SELECT custkey, 'active' AS status FROM (SELECT custkey FROM pos INTERSECT SELECT custkey FROM wo)
            UNION ALL
            SELECT custkey, 'dormant' AS status FROM (SELECT custkey FROM pos EXCEPT SELECT custkey FROM wo)""",
        "url_host_stats": """
            WITH pages AS (
              SELECT 'https://' || source || '.Example.org/doc/' ||
                     CAST(doc_id AS VARCHAR) AS url, n_chars
              FROM documents)
            SELECT lower(regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(avg(n_chars), 6) AS avg_chars
            FROM pages GROUP BY 1""",
        "url_dedup": """
            WITH pages AS (
              SELECT u.url, d.doc_id
              FROM documents d, UNNEST([
                'https://' || d.source || '.example.org/doc/' ||
                  CAST(d.doc_id AS VARCHAR),
                'HTTPS://' || d.source || '.EXAMPLE.org/doc/' ||
                  CAST(d.doc_id AS VARCHAR) || '/?utm_source=feed#top'
              ]) AS u(url)),
            base AS (
              SELECT regexp_replace(regexp_replace(url, '[?#].*$', ''),
                                    '/+$', '') AS b,
                     doc_id FROM pages),
            canon AS (
              SELECT lower(regexp_extract(b,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', 0)) ||
                     substr(b, length(regexp_extract(b,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', 0)) + 1)
                       AS norm_url,
                     doc_id FROM base)
            SELECT norm_url, min(doc_id) AS keep_id,
                   count(*) AS n_variants
            FROM canon GROUP BY norm_url""",
        "host_blocklist": """
            WITH pages AS (
              SELECT 'https://' || source || '.Example.org/doc/' ||
                     CAST(doc_id AS VARCHAR) AS url, source
              FROM documents)
            SELECT source, count(*) AS n_kept
            FROM pages
            WHERE lower(regexp_extract(url,
                    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                  NOT IN ('src0.example.org', 'src3.example.org')
            GROUP BY source""",
        "line_dedup_clean": """
            WITH d2 AS (
              SELECT doc_id,
                     regexp_replace(text, ' (table|line|value)\\b',
                                    chr(10) || '\\1', 'g') AS text
              FROM documents),
            lines AS (
              SELECT doc_id,
                     CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS pos,
                     unnest(arr) AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS arr
                    FROM d2)),
            boiler AS (
              SELECT line FROM (
                SELECT line, count(DISTINCT doc_id) AS nd
                FROM lines GROUP BY line)
              WHERE nd >= 2),
            kept AS (
              SELECT l.doc_id, l.pos, l.line
              FROM lines l LEFT JOIN boiler b ON l.line = b.line
              WHERE b.line IS NULL),
            totals AS (
              SELECT doc_id,
                     CAST(len(string_split(text, chr(10))) AS BIGINT)
                       AS n_lines
              FROM d2),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS clean_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id)
            SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
                   t.n_lines,
                   t.n_lines - coalesce(r.n_kept, 0) AS n_removed
            FROM totals t LEFT JOIN rebuilt r USING (doc_id)""",
        "host_link_graph": """
            WITH pages AS (
              SELECT 'https://' || source || '.example.org/doc/' ||
                       CAST(doc_id AS VARCHAR) AS url,
                     '<html><body><a href="/about">a</a><a href="https://'
                       || source ||
                       '.example.org/nav">n</a> <a href="https://src' ||
                       CAST(doc_id % 7 AS VARCHAR) ||
                       '.example.org/doc/0">x</a></body></html>' AS html
              FROM documents),
            links AS (
              SELECT url AS src_url,
                     unnest(regexp_extract_all(html,
                       'href="(https?://[^"]*)"', 1)) AS dst_url
              FROM pages),
            hosts AS (
              SELECT lower(regexp_extract(src_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     lower(regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS dst_host
              FROM links)
            SELECT src_host, dst_host, count(*) AS n_links
            FROM hosts
            WHERE src_host <> dst_host
            GROUP BY src_host, dst_host""",
        # Oracle compares coalesced content strings directly; the Spark
        # side compares xxhash64(content) (equal modulo 2^-64 collisions).
        "snapshot_delta": """
            WITH old AS (
              SELECT 'https://ex.org/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(text, '') AS c
              FROM documents),
            new AS (
              SELECT 'https://ex.org/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                                   ELSE text END, '') AS c
              FROM documents WHERE doc_id % 13 <> 0
              UNION ALL
              SELECT 'https://ex.org/new/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(text, '') AS c
              FROM documents WHERE doc_id % 17 = 0),
            j AS (
              SELECT coalesce(o.url, n.url) AS url, o.c AS oc, n.c AS nc
              FROM old o FULL OUTER JOIN new n ON o.url = n.url)
            SELECT url,
                   CASE WHEN oc IS NULL THEN 'added'
                        WHEN nc IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM j
            WHERE oc IS NULL OR nc IS NULL OR oc <> nc""",
        # delta carries old/new content inline (oc/nc) instead of joining
        # back to the snapshots — an independent derivation of the same
        # upsert/retract sets the Spark side computes via joins.
        "incremental_triples": f"""
            WITH old AS (
              SELECT 'https://ex.org/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(text, '') AS c
              FROM documents),
            new AS (
              SELECT 'https://ex.org/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                                   ELSE text END, '') AS c
              FROM documents WHERE doc_id % 13 <> 0
              UNION ALL
              SELECT 'https://ex.org/new/' || CAST(doc_id AS VARCHAR) AS url,
                     coalesce(text, '') AS c
              FROM documents WHERE doc_id % 17 = 0),
            delta AS (
              SELECT coalesce(o.url, n.url) AS url,
                     CASE WHEN o.c IS NULL THEN 'added'
                          WHEN n.c IS NULL THEN 'removed'
                          ELSE 'changed' END AS status,
                     o.c AS oc, n.c AS nc
              FROM old o FULL OUTER JOIN new n ON o.url = n.url
              WHERE o.c IS NULL OR n.c IS NULL OR o.c <> n.c),
            docs2 AS (
              SELECT url, nc AS text, 'upsert' AS op FROM delta
              WHERE status IN ('added', 'changed')
              UNION ALL
              SELECT url, oc AS text, 'retract' AS op FROM delta
              WHERE status = 'removed'),
            tok AS (
              SELECT op, url,
                     unnest(regexp_extract_all(text, '{INFIX_PATTERN}', 0))
                       AS token
              FROM docs2),
            linked AS (
              SELECT DISTINCT t.op, t.url, g.canonical_id
              FROM tok t
              JOIN (VALUES {DICT_VALUES_SQL})
                AS g(surface, label, canonical_id)
                ON t.token = g.surface)
            SELECT a.canonical_id AS subj, 'cooccurs_with' AS pred,
                   b.canonical_id AS obj, a.op AS op, count(*) AS n_docs
            FROM linked a JOIN linked b
              ON a.url = b.url AND a.op = b.op
             AND a.canonical_id < b.canonical_id
            GROUP BY 1, 2, 3, 4""",
        "resolve_redirects": """
            WITH RECURSIVE edges AS (
              SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
                     'u' || CAST(doc_id - 1 AS VARCHAR) AS dst
              FROM documents WHERE doc_id % 5 <> 0),
            r AS (
              SELECT src, dst AS cur, CAST(1 AS BIGINT) AS hops FROM edges
              UNION ALL
              SELECT r.src, e.dst, r.hops + 1
              FROM r JOIN edges e ON r.cur = e.src
              WHERE r.hops < 8)
            SELECT src AS src_url, cur AS final_url, hops AS n_hops
            FROM (SELECT src, cur, hops,
                         ROW_NUMBER() OVER (PARTITION BY src
                                            ORDER BY hops DESC) AS rn
                  FROM r)
            WHERE rn = 1""",
        "anchor_profile": """
            WITH pages AS (
              SELECT '<p><a href="https://e' || CAST(doc_id % 7 AS VARCHAR)
                       || '.org/page" class="x">Entity '
                       || CAST(doc_id % 7 AS VARCHAR)
                       || '</a> and <a href="https://e'
                       || CAST(doc_id % 5 AS VARCHAR)
                       || '.org/other">alias '
                       || CAST(doc_id % 11 AS VARCHAR)
                       || '</a></p>' AS html
              FROM documents),
            x AS (
              SELECT regexp_extract_all(html,
                       'href="(https?://[^"]*)"[^>]*>([^<]*)<', 1) AS hs,
                     regexp_extract_all(html,
                       'href="(https?://[^"]*)"[^>]*>([^<]*)<', 2) AS ts
              FROM pages),
            a AS (SELECT unnest(hs) AS dst_url, unnest(ts) AS anchor FROM x),
            cnt AS (
              SELECT lower(regexp_extract(dst_url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS dst,
                     trim(anchor) AS anchor, count(*) AS n
              FROM a WHERE trim(anchor) <> ''
              GROUP BY 1, 2)
            SELECT dst, anchor AS top_anchor, n_refs, n_anchors_distinct
            FROM (SELECT dst, anchor,
                         ROW_NUMBER() OVER (PARTITION BY dst
                                            ORDER BY n DESC, anchor) AS rn,
                         CAST(SUM(n) OVER (PARTITION BY dst) AS BIGINT)
                           AS n_refs,
                         COUNT(*) OVER (PARTITION BY dst)
                           AS n_anchors_distinct
                  FROM cnt)
            WHERE rn = 1""",
        "nb_lang_confusion": f"""
            WITH {TOKENS_CTE},
            lab AS (SELECT doc_id, lang AS label,
                           ((doc_id * {KNUTH}) % {HASH_MOD}) % 2 AS part
                    FROM documents),
            tt AS (SELECT t.doc_id, t.token, l.label
                   FROM tokens t JOIN lab l USING (doc_id)
                   WHERE l.part <> 0),
            model AS (SELECT label, token, count(*) AS c_wt
                      FROM tt GROUP BY label, token),
            stats AS (SELECT m.label,
                             CAST(sum(m.c_wt) AS BIGINT) AS c_total,
                             nd.n_docs
                      FROM model m
                      JOIN (SELECT label, count(*) AS n_docs FROM lab
                            WHERE part <> 0 GROUP BY label) nd
                        USING (label)
                      GROUP BY m.label, nd.n_docs),
            sizes AS (SELECT count(DISTINCT doc_id) AS n,
                             count(DISTINCT token) AS v FROM tt),
            tf AS (SELECT t.doc_id, t.token, count(*) AS tf
                   FROM tokens t JOIN lab l USING (doc_id)
                   WHERE l.part = 0 GROUP BY t.doc_id, t.token),
            doclen AS (SELECT doc_id, sum(tf) AS t_total
                       FROM tf GROUP BY doc_id),
            corr AS (SELECT f.doc_id, m.label,
                            sum(f.tf * (ln(m.c_wt + 0.5) - ln(0.5)))
                              AS corr
                     FROM tf f JOIN model m USING (token)
                     GROUP BY f.doc_id, m.label),
            consts AS (SELECT s.label,
                              ln(s.n_docs) - ln(z.n) AS prior,
                              ln(0.5) - ln(s.c_total
                                           + 0.5 * greatest(z.v, 1))
                                AS base
                       FROM stats s CROSS JOIN sizes z),
            scored AS (SELECT d.doc_id, c.label,
                              round(c.prior + d.t_total * c.base
                                    + coalesce(r.corr, 0.0), 6) AS score
                       FROM doclen d CROSS JOIN consts c
                       LEFT JOIN corr r ON r.doc_id = d.doc_id
                                       AND r.label = c.label),
            pred AS (SELECT doc_id, label AS pred_label FROM scored
                     QUALIFY row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, label) = 1)
            SELECT l.label AS true_label, p.pred_label,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM pred p JOIN lab l USING (doc_id)
            GROUP BY 1, 2""",
        "bloom_decontaminate": f"""
            WITH {TOKENS_CTE},
            g5 AS (
              SELECT DISTINCT a.doc_id,
                     a.token || ' ' || b.token || ' ' || c.token || ' '
                       || d.token || ' ' || e.token AS g
              FROM tokens a
              JOIN tokens b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN tokens c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
              JOIN tokens d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
              JOIN tokens e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4),
            ev AS (SELECT DISTINCT g FROM g5 WHERE doc_id < 5),
            ds AS (SELECT unnest([0, 1, 2]) AS d),
            bits AS (SELECT DISTINCT
                       CAST('0x' || substr(md5(CAST(d AS VARCHAR)
                              || ':' || g), 1, 8) AS BIGINT) % 4096
                         AS bit
                     FROM ev CROSS JOIN ds),
            probe AS (
              SELECT doc_id, g, count(*) AS bits_hit
              FROM (SELECT x.doc_id, x.g,
                           CAST('0x' || substr(md5(CAST(d AS VARCHAR)
                                  || ':' || g), 1, 8) AS BIGINT) % 4096
                             AS bit
                    FROM (SELECT doc_id, g FROM g5 WHERE doc_id >= 5) x
                    CROSS JOIN ds) y
              JOIN bits USING (bit)
              GROUP BY doc_id, g),
            bh AS (SELECT doc_id, count(*) AS n_bloom FROM probe
                   WHERE bits_hit = 3 GROUP BY doc_id),
            eh AS (SELECT doc_id, count(*) AS n_exact
                   FROM (SELECT doc_id, g FROM g5 WHERE doc_id >= 5) x
                   JOIN ev USING (g) GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(b.n_bloom, 0) AS BIGINT)
                     AS n_bloom_hits,
                   CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
                   (b.doc_id IS NOT NULL) AS bloom_flagged,
                   (e.doc_id IS NOT NULL) AS exact_contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id >= 5) d
            LEFT JOIN bh b USING (doc_id)
            LEFT JOIN eh e USING (doc_id)""",
        "host_mirrors": """
            WITH hp AS (
              SELECT DISTINCT host, path FROM (
                SELECT source || '.org' AS host,
                       '/' || source || '/p/'
                         || CAST(doc_id % 37 AS VARCHAR) AS path
                FROM documents
                UNION ALL
                SELECT source || '-m.org',
                       '/' || source || '/p/'
                         || CAST(doc_id % 37 AS VARCHAR)
                FROM documents WHERE doc_id % 10 <> 0)),
            sizes AS (SELECT host, count(*) AS n_paths
                      FROM hp GROUP BY host),
            rare AS (SELECT path FROM hp GROUP BY path
                     HAVING count(*) <= 100),
            b AS (SELECT hp.* FROM hp JOIN rare USING (path)),
            inter AS (SELECT a.host AS host_a, c.host AS host_b,
                             count(*) AS n_shared
                      FROM b a JOIN b c
                        ON a.path = c.path AND a.host < c.host
                      GROUP BY 1, 2)
            SELECT host_a, host_b, n_shared, n_a, n_b, jaccard
            FROM (SELECT i.host_a, i.host_b,
                         CAST(i.n_shared AS BIGINT) AS n_shared,
                         CAST(sa.n_paths AS BIGINT) AS n_a,
                         CAST(sb.n_paths AS BIGINT) AS n_b,
                         round(CAST(i.n_shared AS DOUBLE)
                               / (sa.n_paths + sb.n_paths - i.n_shared),
                               6) AS jaccard
                  FROM inter i
                  JOIN sizes sa ON sa.host = i.host_a
                  JOIN sizes sb ON sb.host = i.host_b)
            WHERE jaccard >= 0.5""",
        "metapath_counts": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            pairs AS (
              SELECT m1.doc_id, m1.canonical_id AS subj,
                     m2.canonical_id AS obj, m1.pos AS p1, m2.pos AS p2
              FROM linked m1 JOIN linked m2
                ON m1.doc_id = m2.doc_id AND m2.pos > m1.pos
               AND m2.pos - m1.pos <= 10
               AND m2.canonical_id <> m1.canonical_id),
            bet AS (SELECT p.subj, p.obj, t.token AS ptok
                    FROM pairs p JOIN tokens t
                      ON t.doc_id = p.doc_id
                     AND t.pos > p.p1 AND t.pos < p.p2
                    WHERE t.token NOT IN ({STOPWORDS_IN_SQL})),
            tc AS (SELECT subj, obj, ptok, count(*) AS pred_freq
                   FROM bet GROUP BY subj, obj, ptok),
            typed AS (SELECT subj AS s, ptok AS p, obj AS o FROM tc
                      QUALIFY row_number() OVER (
                        PARTITION BY subj, obj
                        ORDER BY pred_freq DESC, ptok) = 1),
            t AS (SELECT DISTINCT s, p, o FROM typed),
            iok AS (SELECT o FROM t GROUP BY o
                    HAVING count(*) <= 1000),
            ook AS (SELECT s FROM t GROUP BY s
                    HAVING count(*) <= 1000),
            mids AS (SELECT iok.o AS m FROM iok
                     JOIN ook ON iok.o = ook.s),
            l AS (SELECT t.s AS a, t.p AS pred1, t.o AS m FROM t
                  WHERE t.o IN (SELECT m FROM mids)),
            r AS (SELECT t.s AS m, t.p AS pred2, t.o AS b FROM t
                  WHERE t.s IN (SELECT m FROM mids))
            SELECT pred1, pred2, CAST(count(*) AS BIGINT) AS n_paths,
                   CAST(count(DISTINCT m) AS BIGINT) AS n_mids
            FROM l JOIN r USING (m)
            WHERE a <> b
            GROUP BY 1, 2""",
        "grouped_split_audit": """
            WITH g AS (
              SELECT doc_id, source,
                     CAST('0x' || substr(md5(source), 1, 8) AS BIGINT)
                       % 3 AS fold
              FROM documents),
            pg AS (SELECT fold, source, count(*) AS n_rows
                   FROM g GROUP BY 1, 2)
            SELECT fold, CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(n_rows) AS BIGINT) AS n_docs,
                   CAST(max(n_rows) AS BIGINT) AS largest_group_docs
            FROM pg GROUP BY fold""",
        # \\b is escaped because this is a regular (non-raw) Python
        # string: the SQL engine must see the two-char sequence \b
        # (RE2 word boundary), not a backspace.
        "hearst_hypernyms": """
            WITH stamped AS (
              SELECT lower(text
                || ' grp' || substr('abcdefghijklmnopqrstuvwxyz',
                                    CAST(doc_id % 7 AS INT) + 1, 1)
                || ' such as ent' || substr('abcdefghijklmnopqrstuvwxyz',
                                    CAST(doc_id % 13 AS INT) + 1, 1)
                || ' and other cat' || substr('abcdefghijklmnopqrstuvwxyz',
                                    CAST(doc_id % 5 AS INT) + 1, 1)
                || ' including sub' || substr('abcdefghijklmnopqrstuvwxyz',
                                    CAST(doc_id % 3 AS INT) + 1, 1))
                AS t
              FROM documents),
            m1 AS (SELECT unnest(regexp_extract_all(t,
                     '\\b([a-z]+) such as ([a-z]+)\\b')) AS m
                   FROM stamped),
            p1 AS (SELECT
                     regexp_extract(m, '\\b([a-z]+) such as ([a-z]+)\\b',
                                    1) AS hypernym,
                     regexp_extract(m, '\\b([a-z]+) such as ([a-z]+)\\b',
                                    2) AS hyponym,
                     'such_as' AS pattern
                   FROM m1),
            m2 AS (SELECT unnest(regexp_extract_all(t,
                     '\\b([a-z]+) including ([a-z]+)\\b')) AS m
                   FROM stamped),
            p2 AS (SELECT
                     regexp_extract(m,
                       '\\b([a-z]+) including ([a-z]+)\\b', 1)
                       AS hypernym,
                     regexp_extract(m,
                       '\\b([a-z]+) including ([a-z]+)\\b', 2)
                       AS hyponym,
                     'including' AS pattern
                   FROM m2),
            m3 AS (SELECT unnest(regexp_extract_all(t,
                     '\\b([a-z]+) and other ([a-z]+)\\b')) AS m
                   FROM stamped),
            p3 AS (SELECT
                     regexp_extract(m,
                       '\\b([a-z]+) and other ([a-z]+)\\b', 2)
                       AS hypernym,
                     regexp_extract(m,
                       '\\b([a-z]+) and other ([a-z]+)\\b', 1)
                       AS hyponym,
                     'and_other' AS pattern
                   FROM m3),
            allm AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                     UNION ALL SELECT * FROM p3)
            SELECT hypernym, hyponym, pattern,
                   count(*) AS n_mentions
            FROM allm GROUP BY 1, 2, 3""",
        # type lookup shortcut: every entity's type IS its prefix, so
        # split_part on the triple columns is exactly the Spark side's
        # (distinct-entities -> prefix) type-table join
        "domain_range_audit": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT * FROM placed
                  UNION ALL SELECT * FROM contains_t),
            typed AS (SELECT pred AS p,
                             split_part(subj, ':', 1) AS s_type,
                             split_part(obj, ':', 1) AS o_type
                      FROM t),
            sig AS (SELECT p, s_type, o_type, count(*) AS n
                    FROM typed GROUP BY 1, 2, 3),
            modal AS (SELECT p, s_type, o_type, n,
                             row_number() OVER (PARTITION BY p
                               ORDER BY n DESC, s_type, o_type) AS rk
                      FROM sig),
            pp AS (SELECT p, sum(n) AS n_triples FROM sig GROUP BY p)
            SELECT pp.p AS pred,
                   CAST(pp.n_triples AS BIGINT) AS n_triples,
                   m.s_type AS domain_type, m.o_type AS range_type,
                   CAST(m.n AS BIGINT) AS n_conform,
                   CAST(pp.n_triples - m.n AS BIGINT) AS n_violations,
                   round((pp.n_triples - m.n)::DOUBLE / pp.n_triples, 6)
                     AS violation_rate
            FROM pp JOIN modal m ON m.p = pp.p AND m.rk = 1""",
        # _schema_kg3 store; one grouped agg with exact distincts
        "void_stats": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t))
            SELECT pred,
                   CAST(count(*) AS BIGINT) AS n_triples,
                   CAST(count(DISTINCT subj) AS BIGINT)
                     AS n_distinct_subj,
                   CAST(count(DISTINCT obj) AS BIGINT)
                     AS n_distinct_obj
            FROM t GROUP BY pred""",
        # serialize->parse round-trip identity: the oracle reconstructs
        # the store DIRECTLY (3-relation entity legs + the every-ECHAR
        # literal leg built from the same SQL expressions), so any
        # escape/unescape defect on the Spark side breaks the hash.
        # DuckDB default strings are standard-SQL (no backslash escapes):
        # '\' IS one backslash; chr() supplies LF/CR/TAB.
        "ntriples_roundtrip": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            ent AS (SELECT DISTINCT * FROM (
                      SELECT * FROM placed
                      UNION ALL SELECT * FROM contains_t
                      UNION ALL SELECT * FROM supplies_t)),
            lits AS (
              SELECT DISTINCT
                     'user:' || CAST(user_id AS VARCHAR) AS subj,
                     'noted' AS pred,
                     event_type || '"' || '\\' || chr(10) || chr(13)
                       || chr(9) || 'x' AS obj
              FROM events)
            SELECT subj, pred, obj, FALSE AS is_literal FROM ent
            UNION ALL
            SELECT subj, pred, obj, TRUE AS is_literal FROM lits""",
        # rule_confidence's store re-derived; per-subject predicate sets
        # via list_sort(list(DISTINCT ...)) twin array_sort(collect_set)
        "char_sets": """
            WITH kg AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR),
                     'contains',
                     'part:' || CAST(l_partkey AS VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'cust:' || CAST(o.o_custkey AS VARCHAR),
                     'bought',
                     'part:' || CAST(l.l_partkey AS VARCHAR)
              FROM orders o JOIN lineitem l
                ON o.o_orderkey = l.l_orderkey
              WHERE l.l_partkey % 3 <> 0),
            t AS (SELECT DISTINCT subj, pred, obj FROM kg),
            per AS (SELECT subj, count(*) AS n_t,
                           list_sort(list(DISTINCT pred)) AS preds
                    FROM t GROUP BY subj)
            SELECT array_to_string(preds, ',') AS char_set,
                   CAST(count(*) AS BIGINT) AS n_entities,
                   CAST(sum(n_t) AS BIGINT) AS n_triples
            FROM per GROUP BY 1""",
        # the triple_history gaps-and-islands chain, then the diff is a
        # per-triple bool_or of interval coverage at s1 / s1+1
        "kg_timetravel": """
            WITH obs AS (
              SELECT DISTINCT
                     'user:' || CAST(user_id AS VARCHAR) AS subj,
                     'did' AS pred, event_type AS obj,
                     CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT)
                       AS snap
              FROM events),
            isl AS (SELECT *, snap - row_number() OVER (
                      PARTITION BY subj, pred, obj ORDER BY snap) AS island
                    FROM obs),
            hist AS (SELECT subj, pred, obj,
                            min(snap) AS valid_from, max(snap) AS valid_to
                     FROM isl GROUP BY subj, pred, obj, island),
            m AS (SELECT min(valid_from) AS s1 FROM hist),
            per AS (SELECT subj, pred, obj,
                           bool_or(valid_from <= s1 AND valid_to >= s1)
                             AS in1,
                           bool_or(valid_from <= s1 + 1
                                   AND valid_to >= s1 + 1) AS in2
                    FROM hist CROSS JOIN m
                    GROUP BY subj, pred, obj)
            SELECT subj, pred, obj,
                   CASE WHEN in1 AND in2 THEN 'unchanged'
                        WHEN in2 THEN 'added'
                        ELSE 'retracted' END AS status
            FROM per WHERE in1 OR in2""",
        # the three-relation distinct store (_schema_kg3) re-derived in
        # SQL; the BGP is literal joins + NOT IN for the anti pattern
        "bgp_query": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t)),
            loops AS (SELECT DISTINCT subj FROM t
                      WHERE pred = 'placed' AND subj = obj)
            SELECT t1.subj AS customer,
                   CAST(count(*) AS BIGINT) AS n_bindings,
                   CAST(count(DISTINCT t1.obj) AS BIGINT) AS n_orders,
                   CAST(count(DISTINCT t2.obj) AS BIGINT) AS n_parts,
                   CAST(count(DISTINCT t3.subj) AS BIGINT) AS n_suppliers
            FROM t t1
            JOIN t t2 ON t2.subj = t1.obj
            JOIN t t3 ON t3.obj = t2.obj
            WHERE t1.pred = 'placed' AND t2.pred = 'contains'
              AND t3.pred = 'supplies'
              AND t1.subj NOT IN (SELECT subj FROM loops)
            GROUP BY 1""",
        # CONSTRUCT = the same BGP join chain, then both templates
        # instantiated per binding and collapsed to set semantics
        "construct_triples": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t)),
            loops AS (SELECT DISTINCT subj FROM t
                      WHERE pred = 'placed' AND subj = obj),
            b AS (SELECT t1.subj AS c, t3.subj AS s
                  FROM t t1
                  JOIN t t2 ON t2.subj = t1.obj
                  JOIN t t3 ON t3.obj = t2.obj
                  WHERE t1.pred = 'placed' AND t2.pred = 'contains'
                    AND t3.pred = 'supplies'
                    AND t1.subj NOT IN (SELECT subj FROM loops))
            SELECT DISTINCT subj, pred, obj FROM (
              SELECT c AS subj, 'bought_from' AS pred, s AS obj FROM b
              UNION ALL
              SELECT s AS subj, 'sold_to' AS pred, c AS obj FROM b)""",
        # same store; modal neighbor via row_number (n DESC, nbr ASC)
        # twinning Spark's min(struct(-n, nbr)) tie-break
        "entity_card": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t)),
            both_dir AS (
              SELECT subj AS entity, 'out' AS direction, pred, obj AS nbr
              FROM t
              UNION ALL
              SELECT obj AS entity, 'in' AS direction, pred, subj AS nbr
              FROM t),
            per_nbr AS (SELECT entity, direction, pred, nbr,
                               count(*) AS n
                        FROM both_dir GROUP BY 1, 2, 3, 4),
            ranked AS (SELECT entity, direction, pred, nbr,
                              row_number() OVER (
                                PARTITION BY entity, direction, pred
                                ORDER BY n DESC, nbr) AS rk
                       FROM per_nbr),
            tot AS (SELECT entity, direction, pred,
                           CAST(sum(n) AS BIGINT) AS n_triples,
                           CAST(count(*) AS BIGINT) AS n_neighbors
                    FROM per_nbr GROUP BY 1, 2, 3)
            SELECT tot.entity, tot.direction, tot.pred, tot.n_triples,
                   tot.n_neighbors, r.nbr AS top_neighbor
            FROM tot
            JOIN ranked r ON r.entity = tot.entity
              AND r.direction = tot.direction AND r.pred = tot.pred
              AND r.rk = 1""",
        # shares the linkpred_auc CTE chain through the candidate set,
        # then ranks per query node instead of histogramming scores
        "linkpred_mrr": """
            WITH edges0 AS (
              SELECT DISTINCT source || '.example.org' AS src,
                     'src' || CAST(CASE WHEN doc_id % 2 = 0
                                        THEN doc_id % 7
                                        ELSE doc_id % 3 END AS VARCHAR)
                       || '.example.org' AS dst
              FROM documents),
            norm AS (SELECT DISTINCT least(src, dst) AS a,
                            greatest(src, dst) AS b
                     FROM edges0 WHERE src <> dst),
            hashed AS (SELECT a, b,
                              CAST('0x' || substr(md5(a || ':' || b),
                                                  1, 8) AS BIGINT) % 2
                                AS h
                       FROM norm),
            train AS (SELECT a, b FROM hashed WHERE h <> 0),
            test AS (SELECT a, b FROM hashed WHERE h = 0),
            sym AS (SELECT a, b FROM train
                    UNION ALL SELECT b, a FROM train),
            deg2 AS (SELECT a, count(*) AS deg FROM sym
                     GROUP BY a HAVING count(*) >= 2),
            nbr AS (SELECT s.a AS z, s.b AS n,
                           1.0 / ln(CAST(d.deg AS DOUBLE)) AS w
                    FROM sym s JOIN deg2 d ON d.a = s.a),
            wed AS (SELECT l.n AS a, r.n AS b,
                           round(sum(l.w), 6) AS aa_score
                    FROM nbr l JOIN nbr r ON l.z = r.z AND l.n < r.n
                    GROUP BY l.n, r.n),
            cand AS (SELECT * FROM wed
                     WHERE NOT EXISTS (SELECT 1 FROM sym s
                                       WHERE s.a = wed.a
                                         AND s.b = wed.b)),
            lab AS (SELECT c.a, c.b, c.aa_score,
                           EXISTS (SELECT 1 FROM test t
                                   WHERE t.a = c.a AND t.b = c.b)
                             AS lbl
                    FROM cand c),
            rk AS (SELECT a, lbl,
                          row_number() OVER (PARTITION BY a
                            ORDER BY aa_score DESC, b) AS rk
                   FROM lab),
            best AS (SELECT a, min(rk) AS best_rk
                     FROM rk WHERE lbl GROUP BY a)
            SELECT CAST(count(*) AS BIGINT) AS n_queries,
                   round(avg(1.0::DOUBLE / best_rk), 6) AS mrr,
                   CAST(coalesce(sum(CASE WHEN best_rk <= 1
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS hits_1,
                   CAST(coalesce(sum(CASE WHEN best_rk <= 3
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS hits_3,
                   CAST(coalesce(sum(CASE WHEN best_rk <= 10
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS hits_10
            FROM best""",
        # shares the entity_resolution resolver chain, then scores the
        # predicted components against base-token gold clusters with B3
        "bcubed_resolution": f"""
            WITH RECURSIVE {TOKENS_CTE},
            base AS (SELECT DISTINCT lower(token) AS name FROM tokens),
            names AS (SELECT name FROM base
                      UNION SELECT name || 's' FROM base),
            e AS (SELECT a.name AS src, b.name AS dst
                  FROM names a JOIN names b
                    ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
                   AND a.name < b.name
                   AND levenshtein(a.name, b.name) <= 1),
            sym AS (SELECT src AS a, dst AS b FROM e
                    UNION SELECT dst, src FROM e),
            reach(node, root) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node),
            comp AS (SELECT node, min(root) AS component
                     FROM reach GROUP BY node),
            resolved AS (
              SELECT n.name, coalesce(c.component, n.name) AS canonical
              FROM names n LEFT JOIN comp c ON n.name = c.node),
            goldmap AS (
              SELECT name, min(gold) AS gold FROM (
                SELECT name, name AS gold FROM base
                UNION ALL SELECT name || 's' AS name, name AS gold
                FROM base) u
              GROUP BY name),
            assign AS (SELECT r.canonical AS c, g.gold AS g
                       FROM resolved r JOIN goldmap g USING (name)),
            cells AS (SELECT c, g, count(*) AS n FROM assign
                      GROUP BY c, g),
            nc AS (SELECT c, sum(n) AS nc FROM cells GROUP BY c),
            ng AS (SELECT g, sum(n) AS ng FROM cells GROUP BY g),
            agg AS (SELECT sum(n) AS n_items,
                           sum(n * n / nc::DOUBLE) AS pm,
                           sum(n * n / ng::DOUBLE) AS rm
                    FROM cells JOIN nc USING (c) JOIN ng USING (g))
            SELECT CAST(n_items AS BIGINT) AS n_items,
                   round(pm / n_items, 6) AS bcubed_precision,
                   round(rm / n_items, 6) AS bcubed_recall,
                   round(CASE WHEN pm + rm > 0 THEN
                           2 * (pm / n_items) * (rm / n_items)
                           / (pm / n_items + rm / n_items) END, 6)
                     AS bcubed_f1
            FROM agg""",
        "resolve_conflicts": """
            WITH obs AS (
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS subj,
                     'status' AS pred, o_orderstatus AS obj,
                     'feedA' AS source
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
                     'status',
                     CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                          ELSE o_orderstatus END,
                     'feedB'
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
                     'status', o_orderstatus, 'feedC'
              FROM orders),
            votes AS (SELECT subj, pred, obj,
                             count(DISTINCT source) AS n_supporting
                      FROM obs GROUP BY 1, 2, 3),
            totals AS (SELECT subj, pred,
                              sum(n_supporting) AS n_votes,
                              count(*) AS n_values
                       FROM votes GROUP BY 1, 2),
            w AS (SELECT subj, pred, obj, n_supporting,
                         row_number() OVER (PARTITION BY subj, pred
                           ORDER BY n_supporting DESC, obj) AS rk
                  FROM votes)
            SELECT w.subj, w.pred, w.obj AS resolved_obj,
                   CAST(t.n_values AS BIGINT) AS n_values,
                   CAST(t.n_votes AS BIGINT) AS n_votes,
                   CAST(w.n_supporting AS BIGINT) AS n_supporting,
                   round(w.n_supporting::DOUBLE / t.n_votes, 6)
                     AS confidence
            FROM w JOIN totals t USING (subj, pred)
            WHERE w.rk = 1""",
        "infer_types": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT * FROM placed
                  UNION ALL SELECT * FROM contains_t),
            sig(pred, domain_type, range_type) AS (
              VALUES ('placed', 'cust', 'order'),
                     ('contains', 'order', 'part')),
            tj AS (SELECT t.subj, t.obj, s.domain_type, s.range_type
                   FROM t JOIN sig s ON s.pred = t.pred),
            v AS (SELECT entity, vote, count(*) AS n FROM (
                    SELECT subj AS entity, domain_type AS vote FROM tj
                    UNION ALL
                    SELECT obj AS entity, range_type AS vote FROM tj) u
                  GROUP BY 1, 2),
            tot AS (SELECT entity, sum(n) AS n_votes FROM v
                    GROUP BY 1),
            r AS (SELECT entity, vote, n,
                         row_number() OVER (PARTITION BY entity
                           ORDER BY n DESC, vote) AS rk
                  FROM v)
            SELECT r.entity, r.vote AS inferred_type,
                   CAST(r.n AS BIGINT) AS n_for,
                   CAST(t2.n_votes AS BIGINT) AS n_votes,
                   round(r.n::DOUBLE / t2.n_votes, 6) AS vote_share
            FROM r JOIN tot t2 USING (entity)
            WHERE rk = 1""",
        "source_reliability": """
            WITH obs AS (
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS subj,
                     'status' AS pred, o_orderstatus AS obj,
                     'feedA' AS source
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
                     'status',
                     CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                          ELSE o_orderstatus END,
                     'feedB'
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
                     'status', o_orderstatus, 'feedC'
              FROM orders),
            claims AS (SELECT DISTINCT subj, pred, obj, source
                       FROM obs),
            votes AS (SELECT subj, pred, obj,
                             count(DISTINCT source) AS n_supporting
                      FROM obs GROUP BY 1, 2, 3),
            w AS (SELECT subj, pred, obj,
                         row_number() OVER (PARTITION BY subj, pred
                           ORDER BY n_supporting DESC, obj) AS rk
                  FROM votes),
            winners AS (SELECT subj, pred, obj AS resolved_obj
                        FROM w WHERE rk = 1)
            SELECT c.source,
                   CAST(count(*) AS BIGINT) AS n_claims,
                   CAST(sum(CASE WHEN c.obj = wi.resolved_obj
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_correct,
                   round(sum(CASE WHEN c.obj = wi.resolved_obj
                                  THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 6) AS reliability
            FROM claims c JOIN winners wi USING (subj, pred)
            GROUP BY c.source""",
        "resolve_weighted": """
            WITH obs AS (
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS subj,
                     'status' AS pred, o_orderstatus AS obj,
                     'feedA' AS source
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
                     'status',
                     CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                          ELSE o_orderstatus END,
                     'feedB'
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
                     'status', o_orderstatus, 'feedC'
              FROM orders),
            claims AS (SELECT DISTINCT subj, pred, obj, source
                       FROM obs),
            votes AS (SELECT subj, pred, obj,
                             count(DISTINCT source) AS n_supporting
                      FROM obs GROUP BY 1, 2, 3),
            w AS (SELECT subj, pred, obj,
                         row_number() OVER (PARTITION BY subj, pred
                           ORDER BY n_supporting DESC, obj) AS rk
                  FROM votes),
            winners AS (SELECT subj, pred, obj AS resolved_obj
                        FROM w WHERE rk = 1),
            rel AS (SELECT c.source,
                           round(sum(CASE WHEN c.obj = wi.resolved_obj
                                          THEN 1 ELSE 0 END)::DOUBLE
                                 / count(*), 6) AS reliability
                    FROM claims c JOIN winners wi USING (subj, pred)
                    GROUP BY c.source),
            wv AS (SELECT c.subj, c.pred, c.obj,
                          count(*) AS n_sources,
                          sum(CAST(r.reliability AS DECIMAL(18,6)))
                            AS wt
                   FROM claims c JOIN rel r ON c.source = r.source
                   GROUP BY 1, 2, 3),
            tot AS (SELECT subj, pred, sum(wt) AS total_w
                    FROM wv GROUP BY 1, 2),
            w2 AS (SELECT subj, pred, obj, n_sources, wt,
                          row_number() OVER (PARTITION BY subj, pred
                            ORDER BY wt DESC, obj) AS rk
                   FROM wv)
            SELECT w2.subj, w2.pred, w2.obj AS resolved_obj,
                   CAST(w2.n_sources AS BIGINT) AS n_sources,
                   round(CAST(w2.wt AS DOUBLE), 6) AS weight,
                   round(CAST(w2.wt AS DOUBLE)
                         / CAST(t2.total_w AS DOUBLE), 6)
                     AS weight_share
            FROM w2 JOIN tot t2 USING (subj, pred)
            WHERE w2.rk = 1""",
        "rule_confidence": """
            WITH kg AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders
              UNION ALL
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR),
                     'contains',
                     'part:' || CAST(l_partkey AS VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'cust:' || CAST(o.o_custkey AS VARCHAR),
                     'bought',
                     'part:' || CAST(l.l_partkey AS VARCHAR)
              FROM orders o JOIN lineitem l
                ON o.o_orderkey = l.l_orderkey
              WHERE l.l_partkey % 3 <> 0),
            t AS (SELECT DISTINCT subj AS s, pred AS p, obj AS o
                  FROM kg),
            iok AS (SELECT o FROM t GROUP BY o
                    HAVING count(*) <= 1000),
            ook AS (SELECT s FROM t GROUP BY s
                    HAVING count(*) <= 1000),
            mids AS (SELECT iok.o AS m FROM iok
                     JOIN ook ON iok.o = ook.s),
            l AS (SELECT s AS a, p AS pred1, o AS m FROM t
                  WHERE o IN (SELECT m FROM mids)),
            r AS (SELECT s AS m, p AS pred2, o AS b FROM t
                  WHERE s IN (SELECT m FROM mids)),
            body AS (SELECT DISTINCT pred1, pred2, a, b
                     FROM l JOIN r USING (m) WHERE a <> b),
            bn AS (SELECT pred1, pred2,
                          count(*) AS n_body_pairs
                   FROM body GROUP BY 1, 2),
            supp AS (SELECT b.pred1, b.pred2, h.p AS head_pred,
                            count(*) AS n_support
                     FROM body b JOIN t h
                       ON h.s = b.a AND h.o = b.b
                     GROUP BY 1, 2, 3)
            SELECT s.pred1, s.pred2, s.head_pred,
                   CAST(bn.n_body_pairs AS BIGINT) AS n_body_pairs,
                   CAST(s.n_support AS BIGINT) AS n_support,
                   round(s.n_support::DOUBLE / bn.n_body_pairs, 6)
                     AS confidence
            FROM supp s JOIN bn USING (pred1, pred2)""",
        "taxonomy_cycles": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT
                     't' || CAST(doc_id % 9 AS VARCHAR) AS a,
                     't' || CAST((doc_id * 2 + 1) % 9 AS VARCHAR) AS b
              FROM documents),
            reach(start, node, hops) AS (
              SELECT a, b, 1 FROM e
              UNION ALL
              SELECT r.start, e2.b, r.hops + 1
              FROM reach r JOIN e e2 ON e2.a = r.node
              WHERE r.hops < 3),
            mins AS (SELECT start, node, min(hops) AS hops
                     FROM reach GROUP BY 1, 2)
            SELECT e.a AS src, e.b AS dst,
                   CAST(CASE WHEN e.a = e.b THEN 1
                             WHEN m.hops + 1 <= 4 THEN m.hops + 1
                        END AS INT) AS cycle_len
            FROM e LEFT JOIN mins m
              ON m.start = e.b AND m.node = e.a""",
        # --- round-5 post-freeze tail ---
        "pq_codes": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM q),
            sv AS (SELECT vec_id, CAST((i - 1) // 16 AS INT) AS sub_id, i, v
                   FROM vals),
            d AS (
              SELECT a.vec_id, a.sub_id, c.vec_id AS code,
                     sum((a.v - c.v) * (a.v - c.v)) AS dist2
              FROM sv a JOIN sv c ON c.i = a.i AND c.vec_id < 8
              GROUP BY a.vec_id, a.sub_id, c.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY dist2, code) AS rn
                  FROM d)
            SELECT vec_id, sub_id, CAST(code AS INT) AS code,
                   CAST(dist2 AS BIGINT) AS dist2
            FROM r WHERE rn = 1""",
        "quote_attribution": r"""
            WITH cast_list AS (
              SELECT ['Dr. Chen','Prof. Okafor','Ms. Ito','Mr. Alvarez',
                      'Dean Park'] AS cs),
            t AS (
              SELECT doc_id,
                     coalesce(text, '') ||
                     CASE WHEN text IS NOT NULL AND trim(text) != ''
                          THEN ' ' || cs[CAST(doc_id % 5 AS INT) + 1]
                               || ' said "' || substr(trim(text), 1, 30)
                               || '." "' || substr(trim(text), 31, 24)
                               || '," replied '
                               || cs[CAST((doc_id + 2) % 5 AS INT) + 1] || '.'
                          ELSE '' END AS text
              FROM documents, cast_list),
            direct AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text,
                       '((?:[A-Z][A-Za-z.]* )*[A-Z][A-Za-z]*) said "([^"]+)"',
                       1)) AS speaker,
                     unnest(regexp_extract_all(text,
                       '((?:[A-Z][A-Za-z.]* )*[A-Z][A-Za-z]*) said "([^"]+)"',
                       2)) AS quote,
                     'said' AS cue, 'direct' AS frame
              FROM t),
            inv AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text,
                       '"([^"]+)," (said|replied) ((?:[A-Z][A-Za-z.]* )*[A-Z][A-Za-z]*)',
                       3)) AS speaker,
                     unnest(regexp_extract_all(text,
                       '"([^"]+)," (said|replied) ((?:[A-Z][A-Za-z.]* )*[A-Z][A-Za-z]*)',
                       1)) AS quote,
                     unnest(regexp_extract_all(text,
                       '"([^"]+)," (said|replied) ((?:[A-Z][A-Za-z.]* )*[A-Z][A-Za-z]*)',
                       2)) AS cue,
                     'inverted' AS frame
              FROM t)
            SELECT doc_id, speaker, quote, cue, frame FROM direct
            UNION ALL
            SELECT doc_id, speaker, quote, cue, frame FROM inv""",
        "ndcg_eval": r"""
            WITH qs AS (SELECT * FROM (VALUES ('join', 'merge'),
                        ('stream', 'window'), ('filter', 'scan'))
                        AS v(term, rel_term)),
            scored AS (
              SELECT d.doc_id, q.term,
                     len(list_filter(regexp_split_to_array(trim(d.text),
                         '\s+'), x -> x = q.term)) AS tf,
                     least(len(list_filter(regexp_split_to_array(
                         trim(d.text), '\s+'), x -> x = q.rel_term)),
                         3)::BIGINT AS rel
              FROM documents d CROSS JOIN qs q
              WHERE len(list_filter(regexp_split_to_array(trim(d.text),
                        '\s+'), x -> x = q.term)) > 0),
            ranked AS (
              SELECT *,
                     ROW_NUMBER() OVER (PARTITION BY term
                       ORDER BY tf DESC, doc_id) AS sys_rank,
                     ROW_NUMBER() OVER (PARTITION BY term
                       ORDER BY rel DESC, doc_id) AS ideal_rank
              FROM scored),
            agg AS (
              SELECT term AS query_term, count(*) AS n_candidates,
                     sum(CASE WHEN sys_rank <= 10 THEN
                         (pow(2.0, rel) - 1) / log2(sys_rank + 1.0)
                         ELSE 0.0 END) AS dcg_raw,
                     sum(CASE WHEN ideal_rank <= 10 THEN
                         (pow(2.0, rel) - 1) / log2(ideal_rank + 1.0)
                         ELSE 0.0 END) AS idcg_raw
              FROM ranked GROUP BY term)
            SELECT query_term, n_candidates,
                   round(dcg_raw, 6) AS dcg, round(idcg_raw, 6) AS idcg,
                   round(CASE WHEN idcg_raw > 0 THEN dcg_raw / idcg_raw
                         ELSE 0.0 END, 6) AS ndcg
            FROM agg""",
        "fd_mining": """
            WITH
            c1 AS (SELECT o_orderkey AS l, o_custkey AS r, count(*) AS c
                   FROM orders GROUP BY 1, 2),
            p1 AS (SELECT l, max(c) AS keep, sum(c) AS tot FROM c1 GROUP BY l),
            a1 AS (SELECT 'o_orderkey' AS lhs_col, 'o_custkey' AS rhs_col,
                          count(*) AS n_groups,
                          CAST(sum(tot) AS BIGINT) AS n_rows,
                          round(1.0 - sum(keep)::DOUBLE / sum(tot)::DOUBLE,
                                6) AS g3_error
                   FROM p1),
            c2 AS (SELECT o_custkey AS l, o_orderstatus AS r, count(*) AS c
                   FROM orders GROUP BY 1, 2),
            p2 AS (SELECT l, max(c) AS keep, sum(c) AS tot FROM c2 GROUP BY l),
            a2 AS (SELECT 'o_custkey' AS lhs_col, 'o_orderstatus' AS rhs_col,
                          count(*) AS n_groups,
                          CAST(sum(tot) AS BIGINT) AS n_rows,
                          round(1.0 - sum(keep)::DOUBLE / sum(tot)::DOUBLE,
                                6) AS g3_error
                   FROM p2),
            c3 AS (SELECT o_orderstatus AS l, o_orderpriority AS r,
                          count(*) AS c
                   FROM orders GROUP BY 1, 2),
            p3 AS (SELECT l, max(c) AS keep, sum(c) AS tot FROM c3 GROUP BY l),
            a3 AS (SELECT 'o_orderstatus' AS lhs_col,
                          'o_orderpriority' AS rhs_col,
                          count(*) AS n_groups,
                          CAST(sum(tot) AS BIGINT) AS n_rows,
                          round(1.0 - sum(keep)::DOUBLE / sum(tot)::DOUBLE,
                                6) AS g3_error
                   FROM p3),
            c4 AS (SELECT o_orderdate AS l, o_orderstatus AS r, count(*) AS c
                   FROM orders GROUP BY 1, 2),
            p4 AS (SELECT l, max(c) AS keep, sum(c) AS tot FROM c4 GROUP BY l),
            a4 AS (SELECT 'o_orderdate' AS lhs_col,
                          'o_orderstatus' AS rhs_col,
                          count(*) AS n_groups,
                          CAST(sum(tot) AS BIGINT) AS n_rows,
                          round(1.0 - sum(keep)::DOUBLE / sum(tot)::DOUBLE,
                                6) AS g3_error
                   FROM p4)
            SELECT lhs_col, rhs_col, n_groups, n_rows, g3_error,
                   g3_error <= 0.0 AS holds
            FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2
                  UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4)
            ORDER BY lhs_col, rhs_col""",
        "rdfs_entailment": """
            WITH RECURSIVE placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t)),
            dom AS (SELECT * FROM (VALUES ('placed', 'Customer'),
                      ('contains', 'Order'), ('supplies', 'Supplier'))
                    AS v(pred, cls)),
            rng AS (SELECT * FROM (VALUES ('placed', 'Order'),
                      ('contains', 'Part'), ('supplies', 'Part'))
                    AS v(pred, cls)),
            sub AS (SELECT * FROM (VALUES ('Customer', 'Agent'),
                      ('Supplier', 'Agent'), ('Order', 'Record'),
                      ('Part', 'Artifact'), ('Record', 'Thing'),
                      ('Artifact', 'Thing'), ('Agent', 'Thing'))
                    AS v(child, parent)),
            clos(child, anc) AS (
              SELECT child, parent FROM sub
              UNION
              SELECT c.child, s.parent
              FROM clos c JOIN sub s ON s.child = c.anc),
            base AS (
              SELECT t.subj AS entity, d.cls
              FROM t JOIN dom d ON d.pred = t.pred
              UNION ALL
              SELECT t.obj AS entity, r.cls
              FROM t JOIN rng r ON r.pred = t.pred),
            inh AS (
              SELECT b.entity, c.anc AS cls
              FROM base b JOIN clos c ON c.child = b.cls)
            SELECT DISTINCT entity, cls AS type
            FROM (SELECT * FROM base UNION ALL SELECT * FROM inh)""",
        "optional_bgp": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t))
            SELECT t1.subj AS customer,
                   CAST(count(*) AS BIGINT) AS n_bindings,
                   CAST(count(DISTINCT t1.obj) AS BIGINT) AS n_orders,
                   CAST(count(t2.obj) AS BIGINT) AS n_part_bindings,
                   CAST(sum(CASE WHEN t2.obj IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unbound
            FROM (SELECT * FROM t WHERE pred = 'placed') t1
            LEFT JOIN (SELECT * FROM t WHERE pred = 'contains') t2
              ON t2.subj = t1.obj
            GROUP BY t1.subj""",
        "schema_matching": """
            WITH ua AS (
              SELECT DISTINCT 'c_custkey' AS col,
                     CAST(c_custkey AS VARCHAR) AS val
              FROM customer WHERE c_custkey IS NOT NULL
              UNION
              SELECT DISTINCT 'c_name', c_name
              FROM customer WHERE c_name IS NOT NULL
              UNION
              SELECT DISTINCT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
              FROM customer WHERE c_nationkey IS NOT NULL
              UNION
              SELECT DISTINCT 'c_mktsegment', c_mktsegment
              FROM customer WHERE c_mktsegment IS NOT NULL),
            ub AS (
              SELECT DISTINCT 's_suppkey' AS col,
                     CAST(s_suppkey AS VARCHAR) AS val
              FROM supplier WHERE s_suppkey IS NOT NULL
              UNION
              SELECT DISTINCT 's_name', s_name
              FROM supplier WHERE s_name IS NOT NULL
              UNION
              SELECT DISTINCT 's_nationkey', CAST(s_nationkey AS VARCHAR)
              FROM supplier WHERE s_nationkey IS NOT NULL),
            na AS (SELECT col, count(*) AS n_a FROM ua GROUP BY col),
            nb AS (SELECT col, count(*) AS n_b FROM ub GROUP BY col),
            common AS (
              SELECT ua.col AS col_a, ub.col AS col_b,
                     count(*) AS n_common
              FROM ua JOIN ub ON ub.val = ua.val
              GROUP BY 1, 2)
            SELECT c.col_a, c.col_b, na.n_a, nb.n_b, c.n_common,
                   round(c.n_common::DOUBLE /
                         (na.n_a + nb.n_b - c.n_common)::DOUBLE,
                         6) AS jaccard,
                   round(c.n_common::DOUBLE /
                         least(na.n_a, nb.n_b)::DOUBLE, 6) AS containment
            FROM common c
            JOIN na ON na.col = c.col_a
            JOIN nb ON nb.col = c.col_b""",
        "transe_score": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj, 'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0 THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR) END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR), 'contains', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR), 'supplies', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            t AS (SELECT DISTINCT * FROM (SELECT * FROM placed UNION ALL SELECT * FROM contains_t UNION ALL SELECT * FROM supplies_t)),
            q AS MATERIALIZED (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv FROM embeddings),
            vals AS MATERIALIZED (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i, unnest(qv) AS v FROM q),
            nv AS (SELECT count(*) AS n FROM embeddings),
            tt AS MATERIALIZED (
              SELECT subj, pred, obj,
                     (CAST(regexp_extract(subj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN subj LIKE 'cust:%' THEN 0 WHEN subj LIKE 'order:%' THEN 7
                             WHEN subj LIKE 'part:%' THEN 13 WHEN subj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS hid,
                     (CAST(regexp_extract(obj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN obj LIKE 'cust:%' THEN 0 WHEN obj LIKE 'order:%' THEN 7
                             WHEN obj LIKE 'part:%' THEN 13 WHEN obj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS tid,
                     CASE pred WHEN 'placed' THEN 100 WHEN 'contains' THEN 101 WHEN 'supplies' THEN 102 END AS rid
              FROM t),
            hr AS MATERIALIZED (
              SELECT h.vec_id AS hid, r.vec_id AS rid, h.i, h.v + r.v AS hv
              FROM vals h JOIN vals r ON r.i = h.i AND r.vec_id IN (100, 101, 102)),
            ids AS MATERIALIZED (SELECT DISTINCT hid, rid, tid FROM tt),
            en AS MATERIALIZED (
              SELECT e.hid, e.rid, e.tid, sum(abs(hr.hv - ta.v)) AS energy
              FROM ids e
              JOIN hr ON hr.hid = e.hid AND hr.rid = e.rid
              JOIN vals ta ON ta.vec_id = e.tid AND ta.i = hr.i
              GROUP BY 1, 2, 3)
            SELECT subj, pred, obj, CAST(energy AS BIGINT) AS energy, CAST(rank AS BIGINT) AS rank
            FROM (SELECT tt.subj, tt.pred, tt.obj, en.energy,
                         ROW_NUMBER() OVER (PARTITION BY tt.pred ORDER BY en.energy, tt.subj, tt.obj) AS rank
                  FROM tt JOIN en ON en.hid = tt.hid AND en.rid = tt.rid AND en.tid = tt.tid)
            WHERE rank <= 5""",
        "fact_ranking": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t)),
            po AS (SELECT pred, obj, count(*) AS n_po
                   FROM t GROUP BY 1, 2),
            tot AS (SELECT count(*) AS n FROM t),
            scored AS (
              SELECT t.subj, t.pred, t.obj, po.n_po,
                     round(-log2(po.n_po::DOUBLE
                                 / (SELECT n FROM tot)::DOUBLE),
                           6) AS info
              FROM t JOIN po USING (pred, obj))
            SELECT subj, pred, obj, n_po, info, CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY subj
                        ORDER BY info DESC, pred, obj) AS rank
                  FROM scored)
            WHERE rank <= 3""",
        "inverted_index": r"""
            WITH tokens AS (
              SELECT doc_id,
                     CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS pos,
                     unnest(arr) AS token
              FROM (SELECT doc_id,
                           regexp_extract_all(text,
                             '[0-9a-zA-Z]+|[^0-9a-zA-Z\s]', 0) AS arr
                    FROM documents)),
            postings AS (
              SELECT token, doc_id, count(*) AS n_occ,
                     array_to_string(list_sort(list(pos)), ',')
                       AS positions_csv
              FROM tokens GROUP BY 1, 2),
            dfq AS (SELECT token, count(*) AS doc_freq
                    FROM postings GROUP BY 1)
            SELECT p.token, p.doc_id, d.doc_freq, p.n_occ, p.positions_csv
            FROM postings p JOIN dfq d USING (token)""",
        "phrase_search": r"""
            WITH tokens AS (
              SELECT doc_id,
                     CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS pos,
                     unnest(arr) AS token
              FROM (SELECT doc_id,
                           regexp_extract_all(text,
                             '[0-9a-zA-Z]+|[^0-9a-zA-Z\s]', 0) AS arr
                    FROM documents)),
            l0 AS (SELECT doc_id, pos AS anchor FROM tokens
                   WHERE token = 'batch'),
            l1 AS (SELECT doc_id, pos - 1 AS anchor FROM tokens
                   WHERE token = 'batch'),
            hits AS (SELECT l0.doc_id, l0.anchor
                     FROM l0 JOIN l1 USING (doc_id, anchor))
            SELECT doc_id, count(*) AS n_matches,
                   array_to_string(list_sort(list(anchor)), ',')
                     AS match_positions_csv
            FROM hits GROUP BY doc_id""",
        "expectations_check": """
            WITH nn AS (
              SELECT 'custkey_not_null' AS check_name, 'not_null' AS kind,
                     'o_custkey' AS "column", count(*) AS n_rows,
                     CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_violations
              FROM orders),
            uq AS (
              SELECT 'orderkey_unique', 'unique', 'o_orderkey',
                     CAST(sum(c) AS BIGINT),
                     CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END)
                          AS BIGINT)
              FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)),
            pr AS (
              SELECT 'priority_top3_only', 'accepted_values',
                     'o_orderpriority', count(*),
                     CAST(sum(CASE WHEN o_orderpriority IN
                              ('1-URGENT', '2-HIGH', '3-MEDIUM')
                              THEN 0 ELSE 1 END) AS BIGINT)
              FROM orders),
            st AS (
              SELECT 'status_domain', 'accepted_values', 'o_orderstatus',
                     count(*),
                     CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                              THEN 0 ELSE 1 END) AS BIGINT)
              FROM orders),
            fl AS (
              SELECT 'totalprice_floor', 'min', 'o_totalprice', count(*),
                     CAST(sum(CASE WHEN o_totalprice IS NULL
                                     OR o_totalprice < 0.0
                              THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders)
            SELECT check_name, kind, "column", n_rows, n_violations,
                   n_violations = 0 AS passed
            FROM (SELECT * FROM nn UNION ALL SELECT * FROM uq
                  UNION ALL SELECT * FROM pr UNION ALL SELECT * FROM st
                  UNION ALL SELECT * FROM fl)
            ORDER BY check_name""",
        "measurements": r"""
            WITH us AS (SELECT ['km', 'kg', 'ms', 'mb'] AS u),
            t AS (
              SELECT doc_id,
                     coalesce(text, '') ||
                     CASE WHEN text IS NOT NULL AND trim(text) != ''
                          THEN ' spans ' || CAST(doc_id % 97 AS VARCHAR)
                               || ' ' || u[CAST(doc_id % 4 AS INT) + 1]
                               || ' and weighs '
                               || CAST((doc_id + 3) % 41 AS VARCHAR) || '.5'
                               || ' ' || u[CAST((doc_id + 1) % 4 AS INT) + 1]
                               || ', see [' || CAST(doc_id % 8 + 1 AS VARCHAR)
                               || '] and [' || CAST(doc_id % 8 + 2 AS VARCHAR)
                               || ',' || CAST(doc_id % 8 + 3 AS VARCHAR)
                               || '].'
                          ELSE '' END AS text
              FROM documents, us),
            m AS (
              SELECT doc_id,
                     CAST(unnest(regexp_extract_all(text,
                       '([0-9]+(?:\.[0-9]+)?) (km|kg|ms|mb)', 1))
                       AS DOUBLE) AS quantity,
                     unnest(regexp_extract_all(text,
                       '([0-9]+(?:\.[0-9]+)?) (km|kg|ms|mb)', 2)) AS unit
              FROM t)
            SELECT doc_id, quantity, unit,
                   round(quantity * CASE unit WHEN 'km' THEN 1000.0
                         WHEN 'kg' THEN 1000.0 WHEN 'ms' THEN 0.001
                         WHEN 'mb' THEN 1048576.0 END, 6) AS si_value,
                   CASE unit WHEN 'km' THEN 'm' WHEN 'kg' THEN 'g'
                        WHEN 'ms' THEN 's' WHEN 'mb' THEN 'b' END AS si_unit
            FROM m""",
        "citation_spans": r"""
            WITH us AS (SELECT ['km', 'kg', 'ms', 'mb'] AS u),
            t AS (
              SELECT doc_id,
                     coalesce(text, '') ||
                     CASE WHEN text IS NOT NULL AND trim(text) != ''
                          THEN ' spans ' || CAST(doc_id % 97 AS VARCHAR)
                               || ' ' || u[CAST(doc_id % 4 AS INT) + 1]
                               || ' and weighs '
                               || CAST((doc_id + 3) % 41 AS VARCHAR) || '.5'
                               || ' ' || u[CAST((doc_id + 1) % 4 AS INT) + 1]
                               || ', see [' || CAST(doc_id % 8 + 1 AS VARCHAR)
                               || '] and [' || CAST(doc_id % 8 + 2 AS VARCHAR)
                               || ',' || CAST(doc_id % 8 + 3 AS VARCHAR)
                               || '].'
                          ELSE '' END AS text
              FROM documents, us),
            groups AS (
              SELECT doc_id,
                     CAST(generate_subscripts(g, 1) - 1 AS INT) AS group_idx,
                     unnest(g) AS grp
              FROM (SELECT doc_id, regexp_extract_all(text,
                      '\[([0-9]+(?:,[0-9]+)*)\]', 1) AS g FROM t))
            SELECT doc_id, group_idx,
                   CAST(unnest(string_split(grp, ',')) AS BIGINT) AS ref_num
            FROM groups""",
        "cusum_changepoints": """
            WITH daily AS (
              SELECT event_type AS key,
                     (epoch_us(ts) // 86400000000) * 86400000000 AS day,
                     count(*) AS n_events
              FROM events GROUP BY 1, 2),
            stats AS (
              SELECT key, sum(n_events) AS s1,
                     sum(n_events * n_events) AS s2, count(*) AS nd
              FROM daily GROUP BY key),
            m AS (
              SELECT d.key, d.day, d.n_events,
                     s.s1::DOUBLE / s.nd AS mean,
                     s.s2::DOUBLE / s.nd
                       - (s.s1::DOUBLE / s.nd) * (s.s1::DOUBLE / s.nd) AS var
              FROM daily d JOIN stats s USING (key)),
            wc AS (
              SELECT *, sum(n_events::DOUBLE - mean)
                     OVER (PARTITION BY key ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS c
              FROM m),
            wd AS (
              SELECT *, c - min(c)
                     OVER (PARTITION BY key ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS d
              FROM wc)
            SELECT key, day, CAST(n_events AS BIGINT) AS n_events,
                   round(d, 6) AS cusum,
                   d > 3.0 * sqrt(greatest(var, 0.0)) AS flagged
            FROM wd""",
        "gini_concentration": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            counts AS (
              SELECT label AS grp, canonical_id AS key, count(*) AS x
              FROM linked GROUP BY 1, 2),
            ranked AS (
              SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY grp
                             ORDER BY x, key) AS BIGINT) AS i
              FROM counts)
            SELECT grp AS label, count(*) AS n_keys,
                   CAST(sum(x) AS BIGINT) AS total,
                   round(2.0 * sum(i * x)::DOUBLE
                           / (count(*) * sum(x))::DOUBLE
                         - (count(*) + 1)::DOUBLE / count(*)::DOUBLE,
                         6) AS gini
            FROM ranked GROUP BY grp""",
        "analogy_eval": """
            WITH q AS MATERIALIZED (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS MATERIALIZED (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i,
                     unnest(qv) AS v
              FROM q),
            norms AS (SELECT vec_id, sum(v * v) AS norm2
                      FROM vals GROUP BY vec_id),
            quads(quad_id, a, b, c) AS (
              SELECT * FROM (VALUES (0, 0, 1, 2), (1, 3, 4, 5),
                                    (2, 10, 20, 30))),
            tv AS MATERIALIZED (
              SELECT qd.quad_id, vb.i, vb.v - va.v + vc.v AS tv
              FROM quads qd
              JOIN vals va ON va.vec_id = qd.a
              JOIN vals vb ON vb.vec_id = qd.b AND vb.i = va.i
              JOIN vals vc ON vc.vec_id = qd.c AND vc.i = va.i),
            tn AS (SELECT quad_id, sum(tv * tv) AS tn FROM tv GROUP BY 1),
            scores AS (
              SELECT t.quad_id, x.vec_id AS predicted, sum(x.v * t.tv) AS dot
              FROM tv t JOIN vals x ON x.i = t.i
              GROUP BY 1, 2),
            cos AS (
              SELECT s.quad_id, qd.a, qd.b, qd.c, s.predicted,
                     s.dot::DOUBLE / sqrt(n.norm2::DOUBLE * tn.tn::DOUBLE)
                       AS cosv
              FROM scores s
              JOIN quads qd ON qd.quad_id = s.quad_id
              JOIN norms n ON n.vec_id = s.predicted
              JOIN tn ON tn.quad_id = s.quad_id
              WHERE s.predicted NOT IN (qd.a, qd.b, qd.c))
            SELECT CAST(quad_id AS INT) AS quad_id,
                   CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
                   CAST(c AS BIGINT) AS c, predicted,
                   round(cosv, 6) AS cosine
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY quad_id
                          ORDER BY cosv DESC, predicted) AS rk
                  FROM cos)
            WHERE rk = 1""",
        "shacl_validate": f"""
            WITH facts AS (
              SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS subj,
                     'in_nation' AS pred FROM customer
              UNION ALL
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR), 'placed'
              FROM orders WHERE o_orderpriority = '1-URGENT'
              UNION ALL
              SELECT 'cust:' || CAST(c_custkey AS VARCHAR), 'in_segment'
              FROM customer
              UNION ALL
              SELECT 'cust:' || CAST(c_custkey AS VARCHAR), 'vip_flag'
              FROM customer WHERE c_custkey % 97 = 0),
            types AS (
              SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS subj,
                     'Customer' AS cls FROM customer),
            shapes(cls, pred, min_count, max_count) AS (
              SELECT * FROM (VALUES {SHACL_SHAPES_SQL})),
            counts AS (
              SELECT f.subj, f.pred, t.cls, count(*) AS n
              FROM facts f JOIN types t ON t.subj = f.subj
              GROUP BY f.subj, f.pred, t.cls)
            SELECT c.subj, c.cls, c.pred, 'maxCount' AS violation,
                   CAST(s.max_count AS BIGINT) AS expected,
                   CAST(c.n AS BIGINT) AS actual
            FROM counts c JOIN shapes s
              ON s.cls = c.cls AND s.pred = c.pred
            WHERE s.max_count IS NOT NULL AND c.n > s.max_count
            UNION ALL
            SELECT t.subj, t.cls, s.pred, 'minCount',
                   CAST(s.min_count AS BIGINT),
                   CAST(COALESCE(c.n, 0) AS BIGINT)
            FROM types t
            JOIN shapes s ON s.cls = t.cls AND s.min_count > 0
            LEFT JOIN counts c ON c.subj = t.subj AND c.pred = s.pred
            WHERE COALESCE(c.n, 0) < s.min_count
            UNION ALL
            SELECT c.subj, c.cls, c.pred, 'closed',
                   CAST(0 AS BIGINT), CAST(c.n AS BIGINT)
            FROM counts c LEFT JOIN shapes s
              ON s.cls = c.cls AND s.pred = c.pred
            WHERE c.cls IN ('Customer') AND s.pred IS NULL""",
        "ppjoin_similarity": f"""
            WITH {TOKENS_CTE},
            ts AS (SELECT DISTINCT doc_id, token FROM tokens),
            sz AS (SELECT doc_id, count(*) AS sz FROM ts GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS inter
              FROM ts a JOIN ts b
                ON a.token = b.token AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS inter,
                   CAST(sa.sz AS BIGINT) AS size_a,
                   CAST(sb.sz AS BIGINT) AS size_b,
                   round(i.inter::DOUBLE
                         / (sa.sz + sb.sz - i.inter)::DOUBLE, 6) AS jaccard
            FROM inter i
            JOIN sz sa ON sa.doc_id = i.doc_a
            JOIN sz sb ON sb.doc_id = i.doc_b
            WHERE i.inter * 20 >= 19 * (sa.sz + sb.sz - i.inter)""",
        "texttiling": f"""
            WITH {TOKENS_CTE},
            blocks AS (
              SELECT doc_id, pos // 10 AS blk, token, count(*) AS n
              FROM tokens GROUP BY 1, 2, 3),
            norms AS (
              SELECT doc_id, blk, sum(n * n) AS norm2
              FROM blocks GROUP BY 1, 2),
            dots AS (
              SELECT a.doc_id, a.blk AS gap, sum(a.n * b.n) AS dot
              FROM blocks a JOIN blocks b
                ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
               AND a.token = b.token
              GROUP BY 1, 2),
            gaps AS (
              SELECT l.doc_id, l.blk AS gap,
                     COALESCE(d.dot, 0)::DOUBLE
                       / sqrt(l.norm2::DOUBLE * r.norm2::DOUBLE) AS cos
              FROM norms l
              JOIN norms r ON r.doc_id = l.doc_id AND r.blk = l.blk + 1
              LEFT JOIN dots d ON d.doc_id = l.doc_id AND d.gap = l.blk),
            scored AS (
              SELECT doc_id, gap, cos,
                     lag(cos) OVER w AS lagc, lead(cos) OVER w AS leadc
              FROM gaps
              WINDOW w AS (PARTITION BY doc_id ORDER BY gap))
            SELECT doc_id, CAST(gap AS BIGINT) AS gap,
                   round(cos, 6) + 0.0 AS cosine,
                   round((lagc - cos) + (leadc - cos), 6) + 0.0 AS depth,
                   (lagc IS NOT NULL AND leadc IS NOT NULL
                    AND (lagc - cos) + (leadc - cos) > 0.1
                    AND cos < lagc AND cos < leadc) AS boundary
            FROM scored""",
        "rdfa_triples": r"""
            WITH base AS (
              SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     substr(text, 1, 40) AS headline,
                     coalesce(lang, '') AS lang,
                     CAST(len(regexp_split_to_array(trim(text), '\s+'))
                          AS BIGINT) AS wc
              FROM documents
              WHERE text IS NOT NULL AND trim(text) <> '')
            SELECT url, pred, obj FROM (
              SELECT url, 'rdf:type' AS pred, 'Article' AS obj FROM base
              UNION ALL SELECT url, 'schema:headline', headline FROM base
              UNION ALL SELECT url, 'schema:inLanguage', lang FROM base
              UNION ALL SELECT url, 'schema:wordCount', CAST(wc AS VARCHAR)
                        FROM base
              UNION ALL SELECT url, 'schema:publisher', 'p<q & "r"'
                        FROM base)""",
        "openie_triples": rf"""
            WITH wheeled AS (
              SELECT doc_id, text,
                list_element(['Alice','Bob','Carol','Dave','Erin','Frank'],
                             CAST(doc_id % 6 AS INT) + 1) AS p,
                list_element(['Acme','Globex','Initech','Umbrella','Hooli'],
                             CAST((doc_id + 1) % 5 AS INT) + 1) AS o,
                list_element(['founded','acquired','owns','leads','runs'],
                             CAST((doc_id + 2) % 5 AS INT) + 1) AS v,
                regexp_extract(trim(coalesce(text, '')), '^(\S+)', 1) AS w1
              FROM documents),
            base AS (
              SELECT doc_id,
                     coalesce(text, '') ||
                     CASE WHEN text IS NOT NULL AND trim(text) <> ''
                          THEN ' ' || p || ' ' || v || ' ' || o || '. '
                               || o || ' is a ' || w1 || '. '
                               || p || ' has a ' || w1 || '.'
                          ELSE '' END AS text
              FROM wheeled),
            m AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text,
                            '{OPENIE_PATTERN}', 0)) AS m
              FROM base),
            t AS (
              SELECT doc_id,
                     regexp_extract(m, '{OPENIE_PATTERN}', 1) AS subj,
                     regexp_extract(m, '{OPENIE_PATTERN}', 2) AS verb,
                     regexp_extract(m, '{OPENIE_PATTERN}', 3) AS obj
              FROM m)
            SELECT subj,
                   CASE WHEN verb IN ('is','was','are','were') THEN 'isA'
                        WHEN verb IN ('has','have','had') THEN 'has'
                        ELSE verb END AS pred,
                   obj, count(*) AS freq,
                   count(DISTINCT doc_id) AS support
            FROM t GROUP BY 1, 2, 3""",
        "good_turing": f"""
            WITH {TOKENS_CTE},
            freqs AS (SELECT token, count(*) AS r FROM tokens
                      GROUP BY token),
            nr AS (SELECT r, count(*) AS n_r FROM freqs GROUP BY r)
            SELECT n.r, n.n_r,
                   round((n.r + 1) * x.n_r / n.n_r, 6) AS r_star
            FROM nr n LEFT JOIN nr x ON x.r = n.r + 1""",
        "zipf_fit": f"""
            WITH {TOKENS_CTE},
            freqs AS (SELECT token, count(*) AS freq FROM tokens
                      GROUP BY token),
            xy AS (SELECT ln(row_number() OVER
                            (ORDER BY freq DESC, token ASC)) AS x,
                          ln(freq) AS y
                   FROM freqs),
            a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                         sum(x * x) AS sxx, sum(y * y) AS syy
                  FROM xy)
            SELECT CAST(n AS BIGINT) AS n_types,
                   round((n * sxy - sx * sy)
                         / nullif(n * sxx - sx * sx, 0), 6) AS slope,
                   round((sy - (n * sxy - sx * sy)
                          / nullif(n * sxx - sx * sx, 0) * sx) / n, 6)
                     AS intercept,
                   round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                         / nullif((n * sxx - sx * sx)
                                  * (n * syy - sy * sy), 0), 6) AS r2
            FROM a""",
        "temporal_conflicts": """
            WITH obs AS (
              SELECT DISTINCT
                     'user:' || CAST(user_id AS VARCHAR) AS subj,
                     'did' AS pred, event_type AS obj,
                     CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT)
                       AS snap
              FROM events),
            isl AS (SELECT *, snap - row_number() OVER (
                      PARTITION BY subj, pred, obj ORDER BY snap) AS island
                    FROM obs),
            hist AS (
              SELECT subj, pred, obj,
                     min(snap) AS valid_from, max(snap) AS valid_to
              FROM isl GROUP BY subj, pred, obj, island)
            SELECT a.subj, a.pred, a.obj AS obj_a, b.obj AS obj_b,
                   greatest(a.valid_from, b.valid_from) AS overlap_from,
                   least(a.valid_to, b.valid_to) AS overlap_to
            FROM hist a
            JOIN hist b ON a.subj = b.subj AND a.pred = b.pred
                       AND a.obj < b.obj
            WHERE a.valid_from <= b.valid_to
              AND b.valid_from <= a.valid_to""",
        "phonetic_blocking": f"""
            WITH {TOKENS_CTE},
            names AS (SELECT DISTINCT lower(token) AS name FROM tokens),
            keyed AS (SELECT name, {_phonetic_sql('name')} AS pkey
                      FROM names),
            sizes AS (SELECT pkey, count(*) AS block_size FROM keyed
                      GROUP BY pkey)
            SELECT k.name, k.pkey, s.block_size
            FROM keyed k JOIN sizes s USING (pkey)""",
        "entity_hindex": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            pd AS (SELECT label, doc_id, count(*) AS n
                   FROM linked GROUP BY 1, 2),
            rk AS (SELECT label, n,
                          least(row_number() OVER (
                                  PARTITION BY label
                                  ORDER BY n DESC, doc_id ASC), n) AS hc
                   FROM pd)
            SELECT label, CAST(max(hc) AS BIGINT) AS h_index,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_mentions
            FROM rk GROUP BY label""",
        "url_templates": """
            WITH pages AS (
              SELECT CASE WHEN doc_id % 3 = 0
                     THEN 'https://cdn.example.org/p/'
                          || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                     ELSE 'https://' || source || '.example.org/news/2024/'
                          || CAST(doc_id % 12 + 1 AS VARCHAR)
                          || '/doc' || CAST(doc_id AS VARCHAR)
                     END AS url
              FROM documents),
            parts AS (
              SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1)
                       AS path
              FROM pages),
            t AS (
              SELECT host, path,
                     regexp_replace(regexp_replace(path,
                       '[0-9a-f]{8,}', '{h}', 'g'), '[0-9]+', '{d}', 'g')
                       AS template
              FROM parts)
            SELECT host, template, count(*) AS n_pages,
                   count(DISTINCT path) AS n_paths
            FROM t GROUP BY host, template""",
        "subprop_entailment": """
            WITH RECURSIVE placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR) AS subj,
                     'supplies' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t
                    UNION ALL SELECT * FROM supplies_t)),
            sub AS (SELECT * FROM (VALUES
                      ('placed', 'commercial_rel'),
                      ('supplies', 'commercial_rel'),
                      ('commercial_rel', 'related_to'),
                      ('contains', 'structural_rel'))
                    AS v(child, parent)),
            clos(child, anc) AS (
              SELECT child, parent FROM sub
              UNION
              SELECT c.child, s.parent
              FROM clos c JOIN sub s ON s.child = c.anc),
            inv AS (SELECT * FROM (VALUES
                      ('placed', 'placed_by'),
                      ('contains', 'contained_in'))
                    AS v(pred, inverse)),
            e1 AS (
              SELECT * FROM t
              UNION ALL
              SELECT t.subj, c.anc AS pred, t.obj
              FROM t JOIN clos c ON c.child = t.pred),
            flipped AS (
              SELECT e1.obj AS subj, i.inverse AS pred, e1.subj AS obj
              FROM e1 JOIN inv i ON i.pred = e1.pred)
            SELECT DISTINCT subj, pred, obj FROM (
              SELECT * FROM e1
              UNION ALL SELECT * FROM flipped
              UNION ALL
              SELECT f.subj, c.anc AS pred, f.obj
              FROM flipped f JOIN clos c ON c.child = f.pred)""",
        "sameas_rewrite": """
            WITH RECURSIVE placed AS (
              SELECT CASE WHEN o_custkey % 8 = 0
                          THEN 'dup2:' || CAST(o_custkey AS VARCHAR)
                          WHEN o_custkey % 4 = 0
                          THEN 'dup:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'cust:' || CAST(o_custkey AS VARCHAR)
                     END AS subj,
                     'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR)
                     END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR) AS subj,
                     'contains' AS pred,
                     'part:' || CAST(l_partkey AS VARCHAR) AS obj
              FROM lineitem),
            t AS (SELECT DISTINCT * FROM (
                    SELECT * FROM placed
                    UNION ALL SELECT * FROM contains_t)),
            ks AS (SELECT DISTINCT o_custkey AS k FROM orders),
            pairs AS (
              SELECT 'dup:' || CAST(k AS VARCHAR) AS a,
                     'cust:' || CAST(k AS VARCHAR) AS b
              FROM ks WHERE k % 4 = 0
              UNION ALL
              SELECT 'dup2:' || CAST(k AS VARCHAR),
                     'dup:' || CAST(k AS VARCHAR)
              FROM ks WHERE k % 8 = 0),
            sym AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
            reach(node, root) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node),
            canon AS (
              SELECT node AS ent, min(root) AS canon
              FROM reach GROUP BY node
              HAVING node <> min(root))
            SELECT DISTINCT
                   coalesce(cs.canon, t.subj) AS subj,
                   t.pred,
                   coalesce(co.canon, t.obj) AS obj
            FROM t
            LEFT JOIN canon cs ON cs.ent = t.subj
            LEFT JOIN canon co ON co.ent = t.obj""",
        "noisyor_confidence": """
            WITH ev AS (
              SELECT DISTINCT
                     'user:' || CAST(user_id AS VARCHAR) AS subj,
                     'did' AS pred, event_type AS obj, user_id,
                     CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)
                       AS day
              FROM events),
            conf AS (
              SELECT subj, pred, obj,
                     ((user_id * 37 + day) % 90) / 100.0 + 0.05 AS c
              FROM ev)
            SELECT subj, pred, obj,
                   CAST(count(*) AS BIGINT) AS n_sources,
                   round(1.0 - exp(sum(ln(1.0
                     - least(greatest(c, 0.0), 1.0 - 1e-9)))), 6) AS conf
            FROM conf GROUP BY subj, pred, obj""",
        "transitive_property": """
            WITH RECURSIVE e AS (
              SELECT 'order:' || CAST(o_orderkey AS VARCHAR) AS child,
                     'order:' || CAST(lead(o_orderkey) OVER (
                         PARTITION BY o_custkey ORDER BY o_orderkey)
                       AS VARCHAR) AS parent
              FROM orders
              QUALIFY parent IS NOT NULL),
            clos(child, anc) AS (
              SELECT child, parent FROM e
              UNION
              SELECT c.child, e.parent
              FROM clos c JOIN e ON e.child = c.anc)
            SELECT child AS earlier, anc AS later FROM clos""",
        "allen_relations": """
            WITH obs AS (
              SELECT DISTINCT
                     'user:' || CAST(user_id AS VARCHAR) AS subj,
                     'did' AS pred, event_type AS obj,
                     CAST(floor(epoch_us(ts) / 604800000000.0) AS BIGINT)
                       AS snap
              FROM events),
            isl AS (SELECT *, snap - row_number() OVER (
                      PARTITION BY subj, pred, obj ORDER BY snap) AS island
                    FROM obs),
            hist AS (
              SELECT subj, pred, obj,
                     min(snap) AS valid_from, max(snap) AS valid_to
              FROM isl GROUP BY subj, pred, obj, island)
            SELECT a.subj, a.pred, a.obj AS obj_a, b.obj AS obj_b,
                   a.valid_from AS from_a, a.valid_to AS to_a,
                   b.valid_from AS from_b, b.valid_to AS to_b,
                   CASE
                     WHEN a.valid_from = b.valid_from
                          AND a.valid_to = b.valid_to THEN 'equals'
                     WHEN a.valid_to < b.valid_from - 1 THEN 'precedes'
                     WHEN a.valid_to = b.valid_from - 1 THEN 'meets'
                     WHEN a.valid_from > b.valid_to + 1
                       THEN 'preceded_by'
                     WHEN a.valid_from = b.valid_to + 1 THEN 'met_by'
                     WHEN a.valid_from = b.valid_from
                          AND a.valid_to < b.valid_to THEN 'starts'
                     WHEN a.valid_from = b.valid_from THEN 'started_by'
                     WHEN a.valid_to = b.valid_to
                          AND a.valid_from > b.valid_from
                       THEN 'finishes'
                     WHEN a.valid_to = b.valid_to THEN 'finished_by'
                     WHEN a.valid_from > b.valid_from
                          AND a.valid_to < b.valid_to THEN 'during'
                     WHEN a.valid_from < b.valid_from
                          AND a.valid_to > b.valid_to THEN 'contains'
                     WHEN a.valid_from < b.valid_from THEN 'overlaps'
                     ELSE 'overlapped_by'
                   END AS relation
            FROM hist a
            JOIN hist b ON a.subj = b.subj AND a.pred = b.pred
                       AND a.obj < b.obj""",
        "distmult_score": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj, 'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0 THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR) END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR), 'contains', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR), 'supplies', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            t AS (SELECT DISTINCT * FROM (SELECT * FROM placed UNION ALL SELECT * FROM contains_t UNION ALL SELECT * FROM supplies_t)),
            q AS MATERIALIZED (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv FROM embeddings),
            vals AS MATERIALIZED (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i, unnest(qv) AS v FROM q),
            nv AS (SELECT count(*) AS n FROM embeddings),
            tt AS MATERIALIZED (
              SELECT subj, pred, obj,
                     (CAST(regexp_extract(subj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN subj LIKE 'cust:%' THEN 0 WHEN subj LIKE 'order:%' THEN 7
                             WHEN subj LIKE 'part:%' THEN 13 WHEN subj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS hid,
                     (CAST(regexp_extract(obj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN obj LIKE 'cust:%' THEN 0 WHEN obj LIKE 'order:%' THEN 7
                             WHEN obj LIKE 'part:%' THEN 13 WHEN obj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS tid,
                     CASE pred WHEN 'placed' THEN 100 WHEN 'contains' THEN 101 WHEN 'supplies' THEN 102 END AS rid
              FROM t),
            hr AS MATERIALIZED (
              SELECT h.vec_id AS hid, r.vec_id AS rid, h.i, h.v * r.v AS hv
              FROM vals h JOIN vals r ON r.i = h.i AND r.vec_id IN (100, 101, 102)),
            ids AS MATERIALIZED (SELECT DISTINCT hid, rid, tid FROM tt),
            en AS MATERIALIZED (
              SELECT e.hid, e.rid, e.tid, sum(hr.hv * ta.v) AS score
              FROM ids e
              JOIN hr ON hr.hid = e.hid AND hr.rid = e.rid
              JOIN vals ta ON ta.vec_id = e.tid AND ta.i = hr.i
              GROUP BY 1, 2, 3)
            SELECT subj, pred, obj, CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
            FROM (SELECT tt.subj, tt.pred, tt.obj, en.score,
                         ROW_NUMBER() OVER (PARTITION BY tt.pred ORDER BY en.score DESC, tt.subj, tt.obj) AS rank
                  FROM tt JOIN en ON en.hid = tt.hid AND en.rid = tt.rid AND en.tid = tt.tid)
            WHERE rank <= 5""",
        "property_paths": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj, 'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0 THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR) END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR), 'contains', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR), 'supplies', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            t AS (SELECT DISTINCT * FROM (SELECT * FROM placed UNION ALL SELECT * FROM contains_t UNION ALL SELECT * FROM supplies_t)),
            -- (placed/contains) | supplies  : bag semantics, src -> part
            leg1 AS (
              SELECT a.subj AS src, b.obj AS mid
              FROM t a JOIN t b ON a.pred = 'placed' AND b.pred = 'contains'
                              AND a.obj = b.subj
              UNION ALL
              SELECT subj, obj FROM t WHERE pred = 'supplies'),
            -- ... / ^supplies : part -> supplier via inverse
            paths AS (
              SELECT l.src, s.subj AS dst
              FROM leg1 l JOIN t s ON s.pred = 'supplies' AND s.obj = l.mid)
            SELECT src, dst, CAST(count(*) AS BIGINT) AS n_paths
            FROM paths GROUP BY src, dst""",
        "cdc_chunk_dedup": f"""
            WITH {TOKENS_CTE},
            fl AS (
              SELECT doc_id, pos, token,
                     CASE WHEN CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 8 = 0
                          THEN 1 ELSE 0 END AS b
              FROM tokens),
            cid AS (
              SELECT doc_id, pos, token,
                     COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
              FROM fl),
            ch AS (
              SELECT doc_id, chunk_id,
                     md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_md5,
                     CAST(count(*) AS BIGINT) AS tok_len
              FROM cid GROUP BY doc_id, chunk_id)
            SELECT chunk_md5, min(tok_len) AS tok_len,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_occ
            FROM ch GROUP BY chunk_md5
            HAVING count(DISTINCT doc_id) >= 2""",
        "label_noise": f"""
            WITH q AS (
              SELECT vec_id, label,
                     ((vec_id * {KNUTH}) % {HASH_MOD}) % 5 AS fold,
                     list_transform(embedding,
                       x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            vals AS MATERIALIZED (
              SELECT vec_id, label, fold,
                     CAST(generate_subscripts(qv, 1) AS INT) AS dim,
                     unnest(qv) AS v
              FROM q),
            total AS (SELECT label AS c_label, dim, sum(v) AS csum
                      FROM vals GROUP BY 1, 2),
            perfold AS (SELECT fold, label AS c_label, dim, sum(v) AS fsum
                        FROM vals GROUP BY 1, 2, 3),
            folds AS (SELECT DISTINCT fold FROM q),
            loo AS MATERIALIZED (
              SELECT f.fold, t.c_label, t.dim,
                     t.csum - COALESCE(p.fsum, 0) AS lsum
              FROM total t CROSS JOIN folds f
              LEFT JOIN perfold p ON p.fold = f.fold
                   AND p.c_label = t.c_label AND p.dim = t.dim),
            cnorm AS (SELECT fold, c_label, sum(lsum * lsum) AS cnorm2
                      FROM loo GROUP BY 1, 2),
            dots AS (
              SELECT t.vec_id, t.label, t.fold, l.c_label,
                     sum(t.v * l.lsum) AS dot
              FROM vals t JOIN loo l ON l.fold = t.fold AND l.dim = t.dim
              GROUP BY 1, 2, 3, 4),
            scored AS (
              SELECT d.vec_id, d.label, d.c_label,
                     CAST(round(1000000.0 * d.dot
                                / sqrt(n.cnorm2::DOUBLE)) AS BIGINT) AS si
              FROM dots d JOIN cnorm n ON n.fold = d.fold
                   AND n.c_label = d.c_label),
            thr AS (SELECT c_label, sum(si) AS ssum, count(*) AS n_c
                    FROM scored WHERE label = c_label GROUP BY 1),
            qual AS (SELECT s.* FROM scored s JOIN thr t USING (c_label)
                     WHERE s.si * t.n_c >= t.ssum),
            pick AS (SELECT vec_id, label, c_label,
                            ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY si DESC, c_label ASC) AS rn
                     FROM qual)
            SELECT CAST(label AS BIGINT) AS true_label,
                   CAST(c_label AS BIGINT) AS guessed_label,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM pick WHERE rn = 1 GROUP BY 1, 2""",
        "dp_release": """
            WITH g AS (
              SELECT source || '|' || lang AS grp, count(*) AS n
              FROM documents GROUP BY 1),
            u AS (
              SELECT grp, n,
                     ((CAST('0x' || substr(md5('dp0:' || grp), 1, 8)
                            AS BIGINT) % 1048576)::DOUBLE + 0.5)
                       / 1048576.0 AS uu
              FROM g),
            noised AS (
              SELECT grp,
                     round(n + (-(1.0 / 0.5) * sign(uu - 0.5)
                                * ln(1.0 - 2.0 * abs(uu - 0.5))), 6)
                       AS noisy_n
              FROM u)
            SELECT grp, noisy_n FROM noised WHERE noisy_n >= 5.0""",
        "complex_score": """
            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj, 'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0 THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR) END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR), 'contains', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR), 'supplies', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            t AS (SELECT DISTINCT * FROM (SELECT * FROM placed UNION ALL SELECT * FROM contains_t UNION ALL SELECT * FROM supplies_t)),
            q AS MATERIALIZED (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv FROM embeddings),
            dm AS (SELECT CAST(len(qv) / 2 AS INT) AS h FROM q LIMIT 1),
            vals AS MATERIALIZED (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i, unnest(qv) AS v FROM q),
            -- complex packing: dim i pairs Re = component i, Im = component i + half
            cx AS MATERIALIZED (
              SELECT a.vec_id, a.i, a.v AS re, b.v AS im
              FROM vals a JOIN vals b ON b.vec_id = a.vec_id
                                     AND b.i = a.i + (SELECT h FROM dm)
              WHERE a.i <= (SELECT h FROM dm)),
            nv AS (SELECT count(*) AS n FROM embeddings),
            tt AS MATERIALIZED (
              SELECT subj, pred, obj,
                     (CAST(regexp_extract(subj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN subj LIKE 'cust:%' THEN 0 WHEN subj LIKE 'order:%' THEN 7
                             WHEN subj LIKE 'part:%' THEN 13 WHEN subj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS hid,
                     (CAST(regexp_extract(obj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN obj LIKE 'cust:%' THEN 0 WHEN obj LIKE 'order:%' THEN 7
                             WHEN obj LIKE 'part:%' THEN 13 WHEN obj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS tid,
                     CASE pred WHEN 'placed' THEN 100 WHEN 'contains' THEN 101 WHEN 'supplies' THEN 102 END AS rid
              FROM t),
            hr AS MATERIALIZED (
              SELECT h.vec_id AS hid, r.vec_id AS rid, h.i,
                     h.re, h.im, r.re AS rr, r.im AS ri
              FROM cx h JOIN cx r ON r.i = h.i AND r.vec_id IN (100, 101, 102)),
            ids AS MATERIALIZED (SELECT DISTINCT hid, rid, tid FROM tt),
            en AS MATERIALIZED (
              SELECT e.hid, e.rid, e.tid,
                     sum(hr.re * hr.rr * ta.re + hr.im * hr.rr * ta.im
                         + hr.re * hr.ri * ta.im - hr.im * hr.ri * ta.re) AS score
              FROM ids e
              JOIN hr ON hr.hid = e.hid AND hr.rid = e.rid
              JOIN cx ta ON ta.vec_id = e.tid AND ta.i = hr.i
              GROUP BY 1, 2, 3)
            SELECT subj, pred, obj, CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
            FROM (SELECT tt.subj, tt.pred, tt.obj, en.score,
                         ROW_NUMBER() OVER (PARTITION BY tt.pred ORDER BY en.score DESC, tt.subj, tt.obj) AS rank
                  FROM tt JOIN en ON en.hid = tt.hid AND en.rid = tt.rid AND en.tid = tt.tid)
            WHERE rank <= 5""",
        "harmonic_hosts": f"""
            WITH RECURSIVE {HOST_EDGES_CTE},
            lm(lmark) AS (VALUES ('src0.example.org'), ('src1.example.org'),
                                 ('src2.example.org')),
            walk(lmark, node, dist) AS (
              SELECT lmark, lmark, 0 FROM lm
              UNION
              SELECT w.lmark, e.dst, w.dist + 1
              FROM walk w JOIN hedges e ON e.src = w.node
              WHERE w.dist < 4),
            mind AS (
              SELECT lmark, node, min(dist) AS dist
              FROM walk GROUP BY 1, 2)
            SELECT node, CAST(count(*) AS BIGINT) AS n_reached,
                   round(sum(1.0 / dist) / 3, 6) AS est_harmonic
            FROM mind WHERE dist > 0 GROUP BY node""",
        "rake_keywords": f"""
            WITH ph AS (
              SELECT doc_id, trim(p) AS phrase
              FROM (SELECT doc_id,
                           unnest(regexp_split_to_array(
                             array_to_string(list_transform(
                               regexp_extract_all(lower(text),
                                                  '{INFIX_PATTERN}', 0),
                               t -> CASE WHEN regexp_matches(t, '^[0-9a-zA-Z]+$')
                                          AND t NOT IN ({STOPWORDS_IN_SQL})
                                         THEN t ELSE '|' END), ' '),
                             '\\|')) AS p
                    FROM documents)),
            occ AS (
              SELECT doc_id, phrase,
                     len(string_split(phrase, ' ')) AS n_words
              FROM ph
              WHERE phrase <> '' AND len(string_split(phrase, ' ')) <= 4),
            wrd AS (
              SELECT doc_id, n_words,
                     unnest(string_split(phrase, ' ')) AS word
              FROM occ),
            stats AS (
              SELECT doc_id, word, count(*) AS freq, sum(n_words) AS deg
              FROM wrd GROUP BY 1, 2),
            uniq AS (
              SELECT doc_id, phrase, max(n_words) AS n_words
              FROM occ GROUP BY 1, 2),
            uw AS (
              SELECT doc_id, phrase, n_words,
                     unnest(string_split(phrase, ' ')) AS word
              FROM uniq),
            scored AS (
              SELECT uw.doc_id, uw.phrase,
                     max(uw.n_words) AS n_words,
                     round(sum(CAST(s.deg AS DOUBLE) / s.freq), 6) AS score
              FROM uw JOIN stats s ON s.doc_id = uw.doc_id AND s.word = uw.word
              GROUP BY 1, 2)
            SELECT doc_id, phrase, CAST(n_words AS BIGINT) AS n_words,
                   score, CAST(rank AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, phrase) AS rank
                  FROM scored)
            WHERE rank <= 3""",
        "k_anonymity": """
            WITH cls AS (
              SELECT coalesce(CAST(c_nationkey AS VARCHAR), '<NULL>') AS q0,
                     coalesce(CAST(CAST(floor(c_acctbal / 1000) AS BIGINT)
                                   AS VARCHAR), '<NULL>') AS q1,
                     count(*) AS class_size,
                     count(DISTINCT c_mktsegment) AS l_div
              FROM customer GROUP BY 1, 2)
            SELECT CAST(sum(class_size) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(5 AS BIGINT) AS k_threshold,
                   CAST(min(class_size) AS BIGINT) AS min_class_size,
                   CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_classes_below_k,
                   CAST(sum(CASE WHEN class_size < 5 THEN class_size
                                 ELSE 0 END) AS BIGINT) AS n_rows_below_k,
                   CAST(2 AS BIGINT) AS l_threshold,
                   CAST(min(l_div) AS BIGINT) AS min_l_diversity,
                   CAST(sum(CASE WHEN l_div < 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_classes_below_l,
                   min(class_size) >= 5 AS k_anonymous,
                   min(l_div) >= 2 AS l_diverse
            FROM cls""",
        "kneser_ney": f"""
            WITH {TOKENS_CTE},
            bg AS (
              SELECT a.token AS w1, b.token AS w2
              FROM tokens a JOIN tokens b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
            l AS (SELECT w1, sum(c12) AS c1, count(*) AS n1plus_fwd
                  FROM c12 GROUP BY 1),
            r AS (SELECT w2, count(*) AS n1plus_bwd FROM c12 GROUP BY 1),
            ty AS (SELECT count(*) AS n_types FROM c12),
            s AS (
              SELECT c12.w1, c12.w2, c12.c12, l.c1, l.n1plus_fwd,
                     r.n1plus_bwd,
                     CAST(r.n1plus_bwd AS DOUBLE) / ty.n_types AS p_cont,
                     greatest(c12.c12 - 0.75, 0.0) / l.c1
                       + 0.75 * l.n1plus_fwd / l.c1
                         * (CAST(r.n1plus_bwd AS DOUBLE) / ty.n_types)
                       AS p_kn
              FROM c12 JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN ty)
            SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
                   CAST(c1 AS BIGINT) AS c1,
                   CAST(n1plus_fwd AS BIGINT) AS n1plus_fwd,
                   CAST(n1plus_bwd AS BIGINT) AS n1plus_bwd,
                   round(p_cont, 6) AS p_cont, round(p_kn, 6) AS p_kn
            FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY c12 DESC, w1, w2)
                            AS rk FROM s)
            WHERE rk <= 20""",
        "ifp_sameas": """
            WITH keys AS (
              SELECT DISTINCT s, p, v FROM (
                SELECT 'cust:' || CAST(c_custkey AS VARCHAR) AS s,
                       'phone' AS p,
                       CASE WHEN c_custkey % 16 = 0 THEN 'ph:hub'
                            WHEN c_custkey % 4 = 0
                              THEN 'ph:' || CAST(c_custkey % 300 AS VARCHAR)
                            ELSE 'ph:u' || CAST(c_custkey AS VARCHAR)
                       END AS v
                FROM customer
                UNION ALL
                SELECT 'cust:' || CAST(c_custkey AS VARCHAR),
                       'vat',
                       CASE WHEN c_custkey % 4 = 0 AND c_custkey % 16 <> 0
                              THEN 'vat:' || CAST(c_custkey % 300 AS VARCHAR)
                            ELSE 'vat:u' || CAST(c_custkey AS VARCHAR)
                       END
                FROM customer)),
            fan AS (
              SELECT p, v FROM keys GROUP BY p, v
              HAVING count(*) >= 2 AND count(*) <= 64),
            shared AS (SELECT k.s, k.p, k.v
                       FROM keys k JOIN fan USING (p, v)),
            pairs AS (
              SELECT a.s AS a, b.s AS b
              FROM shared a JOIN shared b
                ON a.p = b.p AND a.v = b.v AND a.s < b.s)
            SELECT a, b, CAST(count(*) AS BIGINT) AS n_witnesses
            FROM pairs GROUP BY a, b""",
        "disjoint_audit": """
            WITH types AS (
              SELECT DISTINCT entity, ty FROM (
                SELECT 'ent:' || CAST(c_custkey % 3000 AS VARCHAR) AS entity,
                       'Customer' AS ty
                FROM customer
                UNION ALL
                SELECT 'ent:' || CAST(s_suppkey * 10 AS VARCHAR), 'Supplier'
                FROM supplier
                UNION ALL
                SELECT 'ent:' || CAST(c_custkey % 3000 AS VARCHAR),
                       'Delinquent'
                FROM customer WHERE c_acctbal < 0)),
            ax(ta, tb) AS (VALUES ('Customer', 'Supplier'),
                                  ('Delinquent', 'Supplier'))
            SELECT t1.entity,
                   t1.ty AS type_a, t2.ty AS type_b
            FROM types t1
            JOIN types t2 ON t2.entity = t1.entity AND t1.ty < t2.ty
            JOIN ax ON ax.ta = t1.ty AND ax.tb = t2.ty""",
        "eval_semeval": f"""
            WITH {_chunks_cte_sql(TAG_CASE, 'g')},
                 {_chunks_cte_sql(PRED_TAG_CASE, 'p')},
            g AS (SELECT DISTINCT seq_id, label, chunk_start, chunk_end
                  FROM g_chunks),
            p AS (SELECT DISTINCT seq_id, label, chunk_start, chunk_end
                  FROM p_chunks),
            ov AS (
              SELECT p.seq_id, p.label, p.chunk_start, p.chunk_end,
                     g.label AS g_label, g.chunk_start AS g_start,
                     g.chunk_end AS g_end
              FROM p JOIN g ON g.seq_id = p.seq_id
                           AND g.chunk_start < p.chunk_end
                           AND p.chunk_start < g.chunk_end),
            flags AS (
              SELECT seq_id, label, chunk_start, chunk_end,
                     max(CASE WHEN g_start = chunk_start
                               AND g_end = chunk_end
                               AND g_label = label THEN 1 ELSE 0 END) AS ex_l,
                     max(CASE WHEN g_start = chunk_start
                               AND g_end = chunk_end THEN 1 ELSE 0 END) AS ex,
                     max(CASE WHEN g_label = label THEN 1 ELSE 0 END) AS ov_l
              FROM ov GROUP BY 1, 2, 3, 4),
            pp AS (
              SELECT coalesce(f.ex_l, 0) AS ex_l, coalesce(f.ex, 0) AS ex,
                     coalesce(f.ov_l, 0) AS ov_l,
                     CASE WHEN f.ex IS NULL THEN 0 ELSE 1 END AS ov
              FROM p LEFT JOIN flags f
                USING (seq_id, label, chunk_start, chunk_end)),
            pc AS (SELECT count(*) AS n_pred, sum(ex_l) AS s_ex_l,
                          sum(ex) AS s_ex, sum(ov_l) AS s_ov_l,
                          sum(ov) AS s_ov FROM pp),
            gm AS (
              SELECT g.seq_id, g.label, g.chunk_start, g.chunk_end,
                     max(CASE WHEN p.chunk_start IS NOT NULL
                              THEN 1 ELSE 0 END) AS h
              FROM g LEFT JOIN p ON p.seq_id = g.seq_id
                                AND p.chunk_start < g.chunk_end
                                AND g.chunk_start < p.chunk_end
              GROUP BY 1, 2, 3, 4),
            mm AS (SELECT count(*) - sum(h) AS mis FROM gm),
            modes AS (
              SELECT 'strict' AS mode, s_ex_l AS cor, s_ov - s_ex_l AS inc,
                     0 AS par, mis, n_pred - s_ov AS spu FROM pc, mm
              UNION ALL
              SELECT 'exact', s_ex, s_ov - s_ex, 0, mis, n_pred - s_ov
              FROM pc, mm
              UNION ALL
              SELECT 'partial', s_ex, 0, s_ov - s_ex, mis, n_pred - s_ov
              FROM pc, mm
              UNION ALL
              SELECT 'type', s_ov_l, s_ov - s_ov_l, 0, mis, n_pred - s_ov
              FROM pc, mm),
            scored AS (
              SELECT mode, cor, inc, par, mis, spu,
                     CASE WHEN cor + inc + par + spu > 0
                          THEN (cor + 0.5 * par)
                               / (cor + inc + par + spu) ELSE 0.0 END AS p_,
                     CASE WHEN cor + inc + par + mis > 0
                          THEN (cor + 0.5 * par)
                               / (cor + inc + par + mis) ELSE 0.0 END AS r_
              FROM modes)
            SELECT mode, CAST(cor AS BIGINT) AS cor,
                   CAST(inc AS BIGINT) AS inc, CAST(par AS BIGINT) AS par,
                   CAST(mis AS BIGINT) AS mis, CAST(spu AS BIGINT) AS spu,
                   round(p_, 6) AS precision, round(r_, 6) AS recall,
                   round(CASE WHEN p_ + r_ > 0
                              THEN 2 * p_ * r_ / (p_ + r_)
                              ELSE 0.0 END, 6) AS f1
            FROM scored""",
        "folded_blocks": f"""
            WITH names AS (
              SELECT CASE
                       WHEN p_partkey % 3 = 1
                         THEN translate(fw, 'aeiou', 'àéîöû')
                       WHEN p_partkey % 3 = 2
                         THEN upper(translate(fw, 'aeiou', 'áèïôü'))
                       ELSE fw
                     END AS raw
              FROM (SELECT p_partkey,
                           string_split(p_name, ' ')[1] AS fw FROM part))
            SELECT translate(lower(raw), '{FOLD_SRC}', '{FOLD_DST}')
                     AS folded,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT raw) AS BIGINT) AS n_variants
            FROM names GROUP BY 1""",
        "kwic_snippets": f"""
            WITH d AS (
              SELECT doc_id,
                     regexp_extract_all(text, '{INFIX_PATTERN}', 0) AS arr
              FROM documents),
            tok AS (
              SELECT doc_id, arr,
                     CAST(generate_subscripts(arr, 1) - 1 AS BIGINT) AS pos,
                     unnest(arr) AS t
              FROM d),
            hits AS (
              SELECT doc_id, arr, pos,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS rn
              FROM tok WHERE t = 'batch')
            SELECT doc_id, pos,
                   array_to_string(
                     list_slice(arr,
                                CAST(greatest(pos - 3, 0) + 1 AS BIGINT),
                                CAST(least(pos + 4, len(arr)) AS BIGINT)),
                     ' ') AS snippet
            FROM hits WHERE rn <= 3""",
        "js_divergence": f"""
            WITH tok AS (
              SELECT lang,
                     unnest(regexp_extract_all(text, '{INFIX_PATTERN}', 0))
                       AS token
              FROM documents WHERE lang IN ('en', 'de')),
            counts AS (
              SELECT token,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS cb
              FROM tok GROUP BY token),
            totals AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts),
            terms AS (
              SELECT ca, cb, na, nb,
                     (CASE WHEN ca > 0
                           THEN 0.5 * (ca / na)
                                * ln((ca / na)
                                     / (((ca / na) + (cb / nb)) / 2))
                           ELSE 0.0 END
                      + CASE WHEN cb > 0
                             THEN 0.5 * (cb / nb)
                                  * ln((cb / nb)
                                       / (((ca / na) + (cb / nb)) / 2))
                             ELSE 0.0 END) AS term
              FROM counts CROSS JOIN totals)
            SELECT CAST(max(na) AS BIGINT) AS n_tokens_a,
                   CAST(max(nb) AS BIGINT) AS n_tokens_b,
                   CAST(count(*) AS BIGINT) AS n_types,
                   round(sum(term), 6) AS jsd_nats
            FROM terms""",
        "chao1_vocab": f"""
            WITH {TOKENS_CTE},
            freqs AS (SELECT token, count(*) AS r FROM tokens
                      GROUP BY token),
            hist AS (SELECT r, count(*) AS n_r FROM freqs GROUP BY r),
            agg AS (
              SELECT sum(n_r) AS s_obs,
                     coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS f1,
                     coalesce(sum(CASE WHEN r = 2 THEN n_r END), 0) AS f2
              FROM hist)
            SELECT CAST(s_obs AS BIGINT) AS s_obs,
                   CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
                   round(s_obs + f1 * (f1 - 1) / (2 * (f2 + 1)), 6)
                     AS chao1,
                   round(1.0 - s_obs
                         / (s_obs + f1 * (f1 - 1) / (2 * (f2 + 1))), 6)
                     AS unseen_frac
            FROM agg""",
        "capture_recapture": f"""
            WITH {TOKENS_CTE}, {LINKED_CTE},
            base AS (SELECT DISTINCT doc_id, pos FROM linked),
            keyed AS (
              SELECT doc_id, pos,
                     CAST(doc_id AS VARCHAR) || ':'
                       || CAST(pos AS VARCHAR) AS k
              FROM base),
            a AS (SELECT doc_id, pos FROM keyed
                  WHERE CAST('0x' || substr(md5('a:' || k), 1, 8) AS BIGINT)
                        % 5 < 4),
            b AS (SELECT doc_id, pos FROM keyed
                  WHERE CAST('0x' || substr(md5('b:' || k), 1, 8) AS BIGINT)
                        % 5 < 3),
            cnt AS (
              SELECT (SELECT count(*) FROM a) AS n_a,
                     (SELECT count(*) FROM b) AS n_b,
                     (SELECT count(*) FROM a JOIN b USING (doc_id, pos))
                       AS n_both)
            SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   CAST(n_both AS BIGINT) AS n_both,
                   round((n_a + 1) * (n_b + 1) / (n_both + 1) - 1, 6)
                     AS n_hat,
                   round(n_a / ((n_a + 1) * (n_b + 1) / (n_both + 1) - 1), 6)
                     AS recall_a,
                   round(n_b / ((n_a + 1) * (n_b + 1) / (n_both + 1) - 1), 6)
                     AS recall_b
            FROM cnt""",
        "collocations": f"""
            WITH {TOKENS_CTE},
            big AS (
              SELECT token AS w1,
                     lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS w2
              FROM tokens),
            ab AS (SELECT w1, w2 FROM big
                   WHERE w2 IS NOT NULL
                     AND regexp_full_match(w1, '[A-Za-z]+')
                     AND regexp_full_match(w2, '[A-Za-z]+')),
            p12 AS (SELECT w1, w2, count(*) AS c12 FROM ab GROUP BY w1, w2),
            m1 AS (SELECT w1, count(*) AS c1 FROM ab GROUP BY w1),
            m2 AS (SELECT w2, count(*) AS c2 FROM ab GROUP BY w2),
            tot AS (SELECT count(*) AS n FROM ab),
            j AS (SELECT w1, w2, c12, c1, c2, n
                  FROM p12 JOIN m1 USING (w1) JOIN m2 USING (w2)
                  CROSS JOIN tot
                  WHERE c12 >= 5)
            SELECT w1, w2,
                   CAST(c12 AS BIGINT) AS c12,
                   CAST(c1 AS BIGINT) AS c1,
                   CAST(c2 AS BIGINT) AS c2,
                   round(2 * (
                     CASE WHEN c12 > 0 THEN c12
                          * ln(c12 / (c1 * c2 / n)) ELSE 0 END
                     + CASE WHEN c1 - c12 > 0 THEN (c1 - c12)
                            * ln((c1 - c12) / (c1 * (n - c2) / n))
                            ELSE 0 END
                     + CASE WHEN c2 - c12 > 0 THEN (c2 - c12)
                            * ln((c2 - c12) / ((n - c1) * c2 / n))
                            ELSE 0 END
                     + CASE WHEN n - c1 - c2 + c12 > 0
                            THEN (n - c1 - c2 + c12)
                            * ln((n - c1 - c2 + c12)
                                 / ((n - c1) * (n - c2) / n))
                            ELSE 0 END), 6) AS g2
            FROM j""",
        "logodds_keyness": """
            WITH tok AS (
              SELECT lang,
                     unnest(regexp_extract_all(text,
                       '[0-9a-zA-Z]+|[^0-9a-zA-Z\s]', 0)) AS token
              FROM documents WHERE lang IN ('en', 'de')),
            counts AS (
              SELECT token,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS cb
              FROM tok GROUP BY token),
            totals AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts),
            j AS (SELECT token, ca, cb, na, nb,
                         100.0 * (ca + cb) / (na + nb) AS aw
                  FROM counts CROSS JOIN totals
                  WHERE ca + cb >= 20)
            SELECT token,
                   CAST(ca AS BIGINT) AS ca,
                   CAST(cb AS BIGINT) AS cb,
                   round(ln((ca + aw) / (na + 100.0 - ca - aw))
                         - ln((cb + aw) / (nb + 100.0 - cb - aw)), 6)
                     AS delta,
                   round((ln((ca + aw) / (na + 100.0 - ca - aw))
                          - ln((cb + aw) / (nb + 100.0 - cb - aw)))
                         / sqrt(1 / (ca + aw) + 1 / (cb + aw)), 6) AS z
            FROM j""",
        "rbo_hosts": """
            WITH pages AS (
              SELECT 'https://' || source || '.Example.org/doc/' ||
                     CAST(doc_id AS VARCHAR) AS url, n_chars
              FROM documents),
            stats AS (
              SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     count(*) AS n_docs,
                     sum(n_chars) AS total_chars
              FROM pages GROUP BY 1),
            ra AS (SELECT host, ROW_NUMBER() OVER
                     (ORDER BY n_docs DESC, host ASC) AS ra FROM stats),
            rb AS (SELECT host, ROW_NUMBER() OVER
                     (ORDER BY total_chars DESC, host ASC) AS rb
                   FROM stats),
            shared AS (
              SELECT greatest(ra, rb) AS entry
              FROM ra JOIN rb USING (host)
              WHERE ra <= 10 AND rb <= 10),
            xd AS (
              SELECT d, count(entry) AS x_d
              FROM generate_series(1, 10) AS t(d)
              LEFT JOIN shared ON entry <= d
              GROUP BY d)
            SELECT CAST(10 AS BIGINT) AS depth,
                   0.9 AS p,
                   CAST(max(CASE WHEN d = 10 THEN x_d END) AS BIGINT)
                     AS x_depth,
                   round(max(CASE WHEN d = 10 THEN x_d END) / 10.0, 6)
                     AS agreement,
                   round(0.1 * sum(pow(0.9, d - 1) * x_d / d), 6) AS rbo
            FROM xd""",
        "benford_prices": """
            WITH vals AS (
              SELECT o_totalprice AS x FROM orders WHERE o_totalprice > 0),
            d AS (
              SELECT CAST(floor(x / pow(10.0, floor(log10(x))))
                          AS BIGINT) AS digit
              FROM vals),
            counts AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
            filled AS (
              SELECT t.d AS digit, coalesce(counts.n, 0) AS n
              FROM generate_series(1, 9) AS t(d)
              LEFT JOIN counts ON counts.digit = t.d),
            tot AS (SELECT sum(n) AS total FROM filled)
            SELECT CAST(digit AS BIGINT) AS digit,
                   CAST(n AS BIGINT) AS n,
                   round(n / total, 6) AS obs_p,
                   round(log10(1 + 1 / digit), 6) AS exp_p,
                   round(pow(n - total * log10(1 + 1 / digit), 2)
                         / (total * log10(1 + 1 / digit)), 6) AS chi2_term
            FROM filled CROSS JOIN tot""",
        "lexical_richness": f"""
            WITH {TOKENS_CTE},
            freqs AS (SELECT token, count(*) AS r FROM tokens
                      GROUP BY token),
            hist AS (SELECT r, count(*) AS n_r FROM freqs GROUP BY r),
            agg AS (
              SELECT sum(r * n_r) AS n_tokens,
                     sum(n_r) AS n_types,
                     coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS f1,
                     sum(r * r * n_r) AS sum_r2
              FROM hist)
            SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_types AS BIGINT) AS n_types,
                   CAST(f1 AS BIGINT) AS f1,
                   round(n_types / n_tokens, 6) AS ttr,
                   round(f1 / n_types, 6) AS hapax_frac,
                   round(1e4 * (sum_r2 - n_tokens) / n_tokens / n_tokens,
                         6) AS yule_k
            FROM agg""",
        "wilson_sources": """
            WITH g AS (
              SELECT source,
                     count(*) AS n,
                     sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS k
              FROM documents GROUP BY source),
            scored AS (
              SELECT source,
                     CAST(n AS BIGINT) AS n,
                     CAST(k AS BIGINT) AS k,
                     round(k / n, 6) AS p_hat,
                     round(((k / n) + 1.959964 * 1.959964 / (2 * n)
                            - 1.959964 * sqrt((k / n) * (1 - k / n) / n
                                + 1.959964 * 1.959964 / (4 * n) / n))
                           / (1 + 1.959964 * 1.959964 / n), 6)
                       AS wilson_lb
              FROM g)
            SELECT source, n, k, p_hat, wilson_lb,
                   CAST(ROW_NUMBER() OVER
                     (ORDER BY wilson_lb DESC, source ASC) AS BIGINT)
                     AS rank
            FROM scored""",
        "acf_events": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b, coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            m AS (SELECT avg(x) AS xbar, count(*) AS n FROM series),
            denom AS (
              SELECT sum(pow(x - xbar, 2)) AS ss, max(xbar) AS xbar
              FROM series CROSS JOIN m),
            lags AS (SELECT unnest(generate_series(1, 24)) AS lag),
            pairs AS (
              SELECT lags.lag, a.x AS x, b2.x AS x2
              FROM series a CROSS JOIN lags
              JOIN series b2 ON b2.b = a.b + lags.lag)
            SELECT CAST(lag AS BIGINT) AS lag,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   round(sum((x - xbar) * (x2 - xbar)) / max(ss), 6) AS r
            FROM pairs CROSS JOIN denom
            GROUP BY lag""",
        "term_dispersion": """
            WITH tok AS (
              SELECT source,
                     unnest(regexp_extract_all(text,
                       '[0-9a-zA-Z]+|[^0-9a-zA-Z\s]', 0)) AS token
              FROM documents),
            tp AS (SELECT token, source, count(*) AS c
                   FROM tok GROUP BY token, source),
            parts AS (SELECT source, sum(c) AS part_n FROM tp
                      GROUP BY source),
            tot AS (SELECT sum(part_n) AS total_n FROM parts),
            sized AS (SELECT source, part_n / total_n AS s
                      FROM parts CROSS JOIN tot),
            tok_tot AS (SELECT token, sum(c) AS n FROM tp GROUP BY token)
            SELECT token,
                   CAST(max(n) AS BIGINT) AS n,
                   round(0.5 * (1 + sum(abs(c / n - s) - s)), 6) AS dp
            FROM tp JOIN sized USING (source) JOIN tok_tot USING (token)
            GROUP BY token
            HAVING max(n) >= 50""",
        "map_eval": """
            WITH q AS (
              SELECT * FROM (VALUES ('join', 'merge'),
                                    ('stream', 'window'),
                                    ('filter', 'scan'))
                AS t(term, rel_term)),
            scored AS (
              SELECT d.doc_id, q.term,
                     len(list_filter(
                       string_split_regex(trim(d.text), '\s+'),
                       x -> x = q.term)) AS tf,
                     CASE WHEN len(list_filter(
                       string_split_regex(trim(d.text), '\s+'),
                       x -> x = q.rel_term)) > 0 THEN 1 ELSE 0 END AS rel
              FROM documents d CROSS JOIN q),
            cand AS (SELECT * FROM scored WHERE tf > 0),
            ranked AS (
              SELECT *,
                     ROW_NUMBER() OVER
                       (PARTITION BY term
                        ORDER BY tf DESC, doc_id ASC) AS sys_rank,
                     sum(rel) OVER
                       (PARTITION BY term
                        ORDER BY tf DESC, doc_id ASC
                        ROWS UNBOUNDED PRECEDING) AS cum_rel
              FROM cand),
            agg AS (
              SELECT term,
                     count(*) AS n_candidates,
                     sum(rel) AS n_relevant,
                     sum(CASE WHEN sys_rank <= 10 AND rel = 1
                              THEN cum_rel / sys_rank ELSE 0 END) AS ap_num,
                     sum(CASE WHEN sys_rank <= 10 THEN rel ELSE 0 END)
                       AS rel_at_k
              FROM ranked GROUP BY term)
            SELECT term AS query_term,
                   CAST(n_candidates AS BIGINT) AS n_candidates,
                   CAST(n_relevant AS BIGINT) AS n_relevant,
                   round(rel_at_k / 10, 6) AS p_at_k,
                   round(CASE WHEN n_relevant > 0
                              THEN ap_num / least(n_relevant, 10)
                              ELSE 0 END, 6) AS ap
            FROM agg""",
        "heaps_fit": f"""
            WITH {TOKENS_CTE},
            lens AS (SELECT doc_id, count(*) AS len FROM tokens
                     GROUP BY doc_id),
            offs AS (
              SELECT doc_id,
                     coalesce(sum(len) OVER
                       (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS off
              FROM lens),
            idx AS (
              SELECT t.token, o.off + t.pos + 1 AS idx
              FROM tokens t JOIN offs o USING (doc_id)),
            first AS (SELECT token, min(idx) AS first_idx FROM idx
                      GROUP BY token),
            tot AS (SELECT max(idx) AS n_tokens FROM idx),
            spine AS (
              SELECT j, n_tokens,
                     CAST(floor(j * n_tokens / 10) AS BIGINT) AS n_c
              FROM generate_series(1, 10) AS g(j) CROSS JOIN tot),
            growth AS (
              SELECT s.j, s.n_c, s.n_tokens, count(*) AS v_c
              FROM first f JOIN spine s ON f.first_idx <= s.n_c
              GROUP BY s.j, s.n_c, s.n_tokens),
            pts AS (
              SELECT n_tokens, ln(CAST(n_c AS DOUBLE)) AS x,
                     ln(CAST(v_c AS DOUBLE)) AS y
              FROM growth),
            ols AS (
              SELECT max(n_tokens) AS n_tokens, count(*) AS k,
                     sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                     sum(x * x) AS sxx, sum(y * y) AS syy
              FROM pts),
            nt AS (SELECT count(*) AS n_types FROM first)
            SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_types AS BIGINT) AS n_types,
                   round((sxy - sx * sy / k) / (sxx - sx * sx / k), 6)
                     AS beta,
                   round(exp(sy / k - (sxy - sx * sy / k)
                             / (sxx - sx * sx / k) * sx / k), 6)
                     AS k_hat,
                   round((sxy - sx * sy / k) * (sxy - sx * sy / k)
                         / ((sxx - sx * sx / k) * (syy - sy * sy / k)),
                         6) AS r2
            FROM ols CROSS JOIN nt""",
        "burrows_delta": """
            WITH tok AS (
              SELECT source,
                     unnest(regexp_extract_all(text,
                       '[0-9a-zA-Z]+|[^0-9a-zA-Z\s]', 0)) AS token
              FROM documents),
            pt AS (SELECT source, token, count(*) AS c FROM tok
                   GROUP BY source, token),
            plen AS (SELECT source, sum(c) AS plen FROM pt
                     GROUP BY source),
            corpus AS (SELECT token, sum(c) AS cf FROM pt GROUP BY token),
            top AS (
              SELECT token FROM (
                SELECT token, ROW_NUMBER() OVER
                  (ORDER BY cf DESC, token ASC) AS rk
                FROM corpus) WHERE rk <= 30),
            grid AS (SELECT plen.source, plen.plen, top.token
                     FROM plen CROSS JOIN top),
            f AS (
              SELECT g.source, g.token, g.plen,
                     coalesce(pt.c, 0) / g.plen AS f
              FROM grid g LEFT JOIN pt
                ON pt.source = g.source AND pt.token = g.token),
            stats AS (
              SELECT token, avg(f) AS mu, stddev_samp(f) AS sd
              FROM f GROUP BY token),
            z AS (
              SELECT f.source, f.plen,
                     CASE WHEN s.sd > 0
                          THEN abs((f.f - s.mu) / s.sd) ELSE 0 END AS az
              FROM f JOIN stats s USING (token))
            SELECT source,
                   CAST(max(plen) AS BIGINT) AS part_tokens,
                   round(avg(az), 6) AS delta
            FROM z GROUP BY source""",
        "assoc_rules": """
            WITH baskets AS (
              SELECT DISTINCT user_id, event_type AS it FROM events),
            nu AS (SELECT count(DISTINCT user_id) AS n_users
                   FROM baskets),
            item_n AS (SELECT it, count(*) AS cnt FROM baskets
                       GROUP BY it),
            pairs AS (
              SELECT a.it AS item_a, b.it AS item_b,
                     count(*) AS support
              FROM baskets a JOIN baskets b USING (user_id)
              WHERE a.it < b.it
              GROUP BY a.it, b.it
              HAVING count(*) >= 5)
            SELECT item_a, item_b,
                   CAST(support AS BIGINT) AS support,
                   round(support / ca.cnt, 6) AS conf_ab,
                   round(support / cb.cnt, 6) AS conf_ba,
                   round(nu.n_users * support / ca.cnt / cb.cnt, 6)
                     AS lift
            FROM pairs
            JOIN item_n ca ON ca.it = pairs.item_a
            JOIN item_n cb ON cb.it = pairs.item_b
            CROSS JOIN nu""",
        "mannwhitney_chars": """
            WITH hist AS (
              SELECT n_chars,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS cb
              FROM documents WHERE lang IN ('en', 'de')
              GROUP BY n_chars),
            ranked AS (
              SELECT ca, cb, ca + cb AS t,
                     coalesce(sum(ca + cb) OVER
                       (ORDER BY n_chars
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS less
              FROM hist),
            agg AS (
              SELECT sum(ca) AS na, sum(cb) AS nb,
                     sum(ca * (less + (t + 1) / 2)) AS ra,
                     sum(t * t * t - t) AS ties
              FROM ranked)
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(ra - na * (na + 1) / 2, 6) AS u_a,
                   round((ra - na * (na + 1) / 2 - na * nb / 2)
                         / sqrt((na * nb / 12)
                                * (na + nb + 1
                                   - ties / ((na + nb)
                                             * (na + nb - 1)))), 6) AS z
            FROM agg""",
        "ks_chars": """
            WITH hist AS (
              SELECT n_chars,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS cb
              FROM documents WHERE lang IN ('en', 'de')
              GROUP BY n_chars),
            cum AS (
              SELECT sum(ca) OVER
                       (ORDER BY n_chars ROWS UNBOUNDED PRECEDING)
                       AS cum_a,
                     sum(cb) OVER
                       (ORDER BY n_chars ROWS UNBOUNDED PRECEDING)
                       AS cum_b
              FROM hist),
            tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM hist),
            agg AS (
              SELECT max(abs(cum_a * nb - cum_b * na)) AS max_num,
                     max(na) AS na, max(nb) AS nb
              FROM cum CROSS JOIN tot)
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(max_num / (na * nb), 6) AS d,
                   round(max_num / (na * nb)
                         * sqrt(na * nb / (na + nb)), 6) AS scaled
            FROM agg""",
        "spearman_chars": f"""
            WITH {TOKENS_CTE},
            tpd AS (SELECT doc_id, count(*) AS n_toks FROM tokens
                    GROUP BY doc_id),
            d AS (SELECT dd.n_chars, tpd.n_toks
                  FROM documents dd JOIN tpd USING (doc_id)),
            hx AS (SELECT n_chars, count(*) AS t FROM d
                   GROUP BY n_chars),
            rx AS (SELECT n_chars,
                          coalesce(sum(t) OVER
                            (ORDER BY n_chars
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) + (t + 1) / 2 AS rx
                   FROM hx),
            hy AS (SELECT n_toks, count(*) AS t FROM d GROUP BY n_toks),
            ry AS (SELECT n_toks,
                          coalesce(sum(t) OVER
                            (ORDER BY n_toks
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) + (t + 1) / 2 AS ry
                   FROM hy),
            j AS (SELECT rx.rx, ry.ry
                  FROM d JOIN rx USING (n_chars) JOIN ry USING (n_toks)),
            agg AS (
              SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
                     sum(rx * ry) AS sxy, sum(rx * rx) AS sxx,
                     sum(ry * ry) AS syy
              FROM j)
            SELECT CAST(n AS BIGINT) AS n,
                   round((sxy - sx * sy / n)
                         / sqrt((sxx - sx * sx / n)
                                * (syy - sy * sy / n)), 6) AS rho
            FROM agg""",
        "kendall_hosts": """
            WITH pages AS (
              SELECT 'https://' || source || '.Example.org/doc/' ||
                     CAST(doc_id AS VARCHAR) AS url, n_chars
              FROM documents),
            stats AS (
              SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                     count(*) AS x, sum(n_chars) AS y
              FROM pages GROUP BY 1),
            ids AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY host) AS i
                    FROM stats),
            pairs AS (
              SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
              FROM ids a JOIN ids b ON a.i < b.i),
            agg AS (
              SELECT count(*) AS n0,
                     sum(CASE WHEN (x1 - x2) * (y1 - y2) > 0
                              THEN 1 ELSE 0 END) AS c,
                     sum(CASE WHEN (x1 - x2) * (y1 - y2) < 0
                              THEN 1 ELSE 0 END) AS d,
                     sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS n1,
                     sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS n2
              FROM pairs),
            nn AS (SELECT count(*) AS n FROM stats)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(c AS BIGINT) AS concordant,
                   CAST(d AS BIGINT) AS discordant,
                   round((c - d) / sqrt(CAST((n0 - n1) AS DOUBLE)
                                        * CAST((n0 - n2) AS DOUBLE)), 6)
                     AS tau_b
            FROM agg CROSS JOIN nn""",
        "chisq_lang_source": """
            WITH cells AS (
              SELECT lang, source, count(*) AS o FROM documents
              GROUP BY lang, source),
            ra AS (SELECT lang, sum(o) AS ri FROM cells GROUP BY lang),
            cb AS (SELECT source, sum(o) AS cj FROM cells
                   GROUP BY source),
            tot AS (SELECT sum(o) AS n, count(DISTINCT lang) AS r,
                           count(DISTINCT source) AS c
                    FROM cells),
            agg AS (
              SELECT sum(o * o * n / (ri * cj)) AS s,
                     max(n) AS n, max(r) AS r, max(c) AS c
              FROM cells JOIN ra USING (lang) JOIN cb USING (source)
              CROSS JOIN tot)
            SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
                   CAST(c AS BIGINT) AS c,
                   CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
                   round(s - n, 6) AS chi2,
                   round(sqrt((s - n)
                              / CAST(n * least(r - 1, c - 1) AS DOUBLE)),
                         6) AS cramers_v
            FROM agg""",
        "entropy_rate": f"""
            WITH {TOKENS_CTE},
            lagd AS (
              SELECT token AS w1,
                     lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS w2
              FROM tokens),
            bg AS (SELECT w1, w2 FROM lagd WHERE w2 IS NOT NULL),
            bgc AS (SELECT w1, w2, count(*) AS c12 FROM bg
                    GROUP BY w1, w2),
            leftm AS (SELECT w1, sum(c12) AS c1 FROM bgc GROUP BY w1),
            nn AS (SELECT sum(c12) AS n FROM bgc),
            h2 AS (
              SELECT -sum(c12 / n * ln(c12 / c1)) AS h2,
                     max(n) AS n_bigrams
              FROM bgc JOIN leftm USING (w1) CROSS JOIN nn),
            h1 AS (
              SELECT -sum(c1 / n * ln(c1 / n)) AS h1
              FROM leftm CROSS JOIN nn)
            SELECT CAST(n_bigrams AS BIGINT) AS n_bigrams,
                   round(h1, 6) AS h_unigram,
                   round(h2, 6) AS h_bigram_rate,
                   round(exp(h1), 6) AS ppl_unigram,
                   round(exp(h2), 6) AS ppl_bigram
            FROM h2 CROSS JOIN h1""",
        "stem_collapse": f"""
            WITH {TOKENS_CTE},
            plural AS (
              SELECT doc_id,
                     CASE WHEN token LIKE '%y'
                          THEN substr(token, 1, len(token) - 1) || 'ies'
                          WHEN token LIKE '%s' THEN token || 'es'
                          ELSE token || 's' END AS token
              FROM tokens WHERE doc_id % 3 = 0),
            allt AS (
              SELECT token FROM tokens
              UNION ALL SELECT token FROM plural),
            stemmed AS (
              SELECT token AS tok,
              CASE WHEN token LIKE '%ies' THEN
                     CASE WHEN token LIKE '%eies' OR token LIKE '%aies'
                          THEN token
                          ELSE substr(token, 1, len(token) - 3) || 'y'
                     END
                   WHEN token LIKE '%es' THEN
                     CASE WHEN token LIKE '%aes' OR token LIKE '%ees'
                               OR token LIKE '%oes'
                          THEN token
                          ELSE substr(token, 1, len(token) - 1)
                     END
                   WHEN token LIKE '%s' THEN
                     CASE WHEN token LIKE '%us' OR token LIKE '%ss'
                          THEN token
                          ELSE substr(token, 1, len(token) - 1)
                     END
                   ELSE token END AS stem
              FROM allt),
            per_type AS (
              SELECT stem, tok, count(*) AS c FROM stemmed
              GROUP BY stem, tok)
            SELECT stem,
                   CAST(count(*) AS BIGINT) AS n_variants,
                   CAST(sum(c) AS BIGINT) AS n_tokens
            FROM per_type
            GROUP BY stem
            HAVING count(*) >= 2""",
        "control_chart": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b, coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            mr AS (
              SELECT b, x,
                     abs(x - lag(x) OVER (ORDER BY b)) AS mrv
              FROM series),
            stats AS (SELECT avg(x) AS xbar, avg(mrv) AS mr_bar FROM mr)
            SELECT CAST(b * 3600000000 AS BIGINT) AS bucket_us,
                   CAST(x AS BIGINT) AS x,
                   round(xbar, 6) AS xbar,
                   round(mr_bar, 6) AS mr_bar,
                   round(xbar + 2.66 * mr_bar, 6) AS ucl,
                   round(greatest(xbar - 2.66 * mr_bar, 0.0), 6) AS lcl,
                   CASE WHEN x > xbar + 2.66 * mr_bar THEN 'high'
                        ELSE 'low' END AS side
            FROM mr CROSS JOIN stats
            WHERE x > xbar + 2.66 * mr_bar
               OR x < greatest(xbar - 2.66 * mr_bar, 0.0)""",
        "mojibake_audit": """
            WITH occs AS (
              SELECT 'Ã' AS marker,
                     CAST((len(text) - len(replace(text, 'Ã', '')))
                          / 1 AS BIGINT) AS occ
              FROM documents
              UNION ALL
              SELECT 'â€' AS marker,
                     CAST((len(text) - len(replace(text, 'â€', '')))
                          / 2 AS BIGINT) AS occ
              FROM documents
              UNION ALL
              SELECT 'Â' AS marker,
                     CAST((len(text) - len(replace(text, 'Â', '')))
                          / 1 AS BIGINT) AS occ
              FROM documents
              UNION ALL
              SELECT 'ï»¿' AS marker,
                     CAST((len(text) - len(replace(text, 'ï»¿', '')))
                          / 3 AS BIGINT) AS occ
              FROM documents
              UNION ALL
              SELECT '�' AS marker,
                     CAST((len(text) - len(replace(text, '�', '')))
                          / 1 AS BIGINT) AS occ
              FROM documents
            )
            SELECT marker,
                   CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_docs_affected,
                   CAST(sum(occ) AS BIGINT) AS n_occurrences
            FROM occs GROUP BY marker""",
        "seq_patterns": """
            WITH occ AS (
              SELECT user_id, event_type AS t,
                     min(ROW(ts, event_id)) AS first_k,
                     max(ROW(ts, event_id)) AS last_k
              FROM events GROUP BY user_id, event_type),
            nu AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
            pairs AS (
              SELECT a.t AS first_type, b.t AS then_type,
                     count(*) AS support
              FROM occ a JOIN occ b USING (user_id)
              WHERE a.t <> b.t AND a.first_k < b.last_k
              GROUP BY a.t, b.t
              HAVING count(*) >= 5)
            SELECT first_type, then_type,
                   CAST(support AS BIGINT) AS support,
                   round(support / n_users, 6) AS support_frac
            FROM pairs CROSS JOIN nu""",
        "kaplan_meier": """
            WITH spans AS (
              SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
              FROM events GROUP BY user_id),
            endt AS (SELECT max(ts) AS end_ts FROM events),
            lifetimes AS (
              SELECT CAST(floor(date_diff('microsecond', first_ts,
                                          last_ts) / 86400000000)
                          AS BIGINT) AS t_days,
                     CASE WHEN date_diff('microsecond', last_ts, end_ts)
                               >= 12 * 3600000000 THEN 1 ELSE 0 END
                       AS churned
              FROM spans CROSS JOIN endt),
            hist AS (
              SELECT t_days, count(*) AS n_here, sum(churned) AS d
              FROM lifetimes GROUP BY t_days),
            at_risk AS (
              SELECT t_days, n_here, d,
                     sum(n_here) OVER
                       (ORDER BY t_days DESC ROWS UNBOUNDED PRECEDING)
                       AS n_risk
              FROM hist),
            curve AS (
              SELECT t_days, n_risk, d, n_here,
                     sum(CASE WHEN d < n_risk
                              THEN ln(1 - d / n_risk) END) OVER
                       (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
                       AS ln_s,
                     max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER
                       (ORDER BY t_days ROWS UNBOUNDED PRECEDING)
                       AS dead
              FROM at_risk)
            SELECT t_days,
                   CAST(n_risk AS BIGINT) AS n_risk,
                   CAST(d AS BIGINT) AS n_churned,
                   CAST(n_here - d AS BIGINT) AS n_censored_here,
                   round(CASE WHEN dead = 1 THEN 0.0
                              ELSE exp(ln_s) END, 6) AS survival
            FROM curve WHERE d > 0""",
        "markov_stationary": """
            WITH pairs AS (
              SELECT s_from, s_to FROM (
                SELECT event_type AS s_from,
                       lead(event_type) OVER
                         (PARTITION BY user_id
                          ORDER BY ts, event_id) AS s_to
                FROM events)
              WHERE s_to IS NOT NULL),
            counts AS (SELECT s_from, s_to, count(*) AS c FROM pairs
                       GROUP BY s_from, s_to),
            outdeg AS (SELECT s_from, sum(c) AS tot FROM counts
                       GROUP BY s_from),
            pm AS (SELECT counts.s_from, counts.s_to,
                          counts.c / outdeg.tot AS p
                   FROM counts JOIN outdeg USING (s_from)),
            states AS (
              SELECT DISTINCT state FROM (
                SELECT s_from AS state FROM pm
                UNION SELECT s_to FROM pm)),
            ns AS (SELECT count(*) AS n FROM states),
            v0 AS (SELECT state, 1.0 / n AS v FROM states CROSS JOIN ns),
            v1 AS (
              SELECT pm.s_to AS state, sum(pm.p * v0.v) AS v
              FROM pm JOIN v0 ON pm.s_from = v0.state
              GROUP BY pm.s_to),
            v2 AS (
              SELECT pm.s_to AS state, sum(pm.p * v1.v) AS v
              FROM pm JOIN v1 ON pm.s_from = v1.state
              GROUP BY pm.s_to),
            v3 AS (
              SELECT pm.s_to AS state, sum(pm.p * v2.v) AS v
              FROM pm JOIN v2 ON pm.s_from = v2.state
              GROUP BY pm.s_to),
            v4 AS (
              SELECT pm.s_to AS state, sum(pm.p * v3.v) AS v
              FROM pm JOIN v3 ON pm.s_from = v3.state
              GROUP BY pm.s_to),
            v5 AS (
              SELECT pm.s_to AS state, sum(pm.p * v4.v) AS v
              FROM pm JOIN v4 ON pm.s_from = v4.state
              GROUP BY pm.s_to),
            v6 AS (
              SELECT pm.s_to AS state, sum(pm.p * v5.v) AS v
              FROM pm JOIN v5 ON pm.s_from = v5.state
              GROUP BY pm.s_to),
            v7 AS (
              SELECT pm.s_to AS state, sum(pm.p * v6.v) AS v
              FROM pm JOIN v6 ON pm.s_from = v6.state
              GROUP BY pm.s_to),
            v8 AS (
              SELECT pm.s_to AS state, sum(pm.p * v7.v) AS v
              FROM pm JOIN v7 ON pm.s_from = v7.state
              GROUP BY pm.s_to),
            v9 AS (
              SELECT pm.s_to AS state, sum(pm.p * v8.v) AS v
              FROM pm JOIN v8 ON pm.s_from = v8.state
              GROUP BY pm.s_to),
            v10 AS (
              SELECT pm.s_to AS state, sum(pm.p * v9.v) AS v
              FROM pm JOIN v9 ON pm.s_from = v9.state
              GROUP BY pm.s_to)
            SELECT state, round(v, 6) AS pi FROM v10""",
        "robust_means": """
            WITH ranked AS (
              SELECT source, n_chars AS v,
                     ROW_NUMBER() OVER
                       (PARTITION BY source ORDER BY n_chars ASC,
                        doc_id ASC) AS ra,
                     ROW_NUMBER() OVER
                       (PARTITION BY source ORDER BY n_chars DESC,
                        doc_id DESC) AS rd,
                     CAST(floor(count(*) OVER (PARTITION BY source)
                                * 0.1) AS BIGINT) AS k
              FROM documents),
            agg AS (
              SELECT source,
                     count(*) AS n,
                     max(k) AS k_trimmed,
                     avg(v) AS mean,
                     avg(CASE WHEN ra > k AND rd > k THEN v END)
                       AS tmean,
                     sum(CASE WHEN ra > k AND rd > k THEN v END)
                       AS kept_sum,
                     min(CASE WHEN ra > k AND rd > k THEN v END) AS lo,
                     max(CASE WHEN ra > k AND rd > k THEN v END) AS hi
              FROM ranked GROUP BY source)
            SELECT source, CAST(n AS BIGINT) AS n,
                   CAST(k_trimmed AS BIGINT) AS k_trimmed,
                   round(mean, 6) AS mean,
                   round(tmean, 6) AS trimmed_mean,
                   round((kept_sum + k_trimmed * lo + k_trimmed * hi)
                         / n, 6) AS winsorized_mean
            FROM agg""",
        "effect_size_chars": """
            WITH agg AS (
              SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS na,
                     sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS nb,
                     sum(CASE WHEN lang = 'en' THEN n_chars
                              ELSE 0 END) AS sa,
                     sum(CASE WHEN lang = 'de' THEN n_chars
                              ELSE 0 END) AS sb,
                     sum(CASE WHEN lang = 'en' THEN n_chars * n_chars
                              ELSE 0 END) AS qa,
                     sum(CASE WHEN lang = 'de' THEN n_chars * n_chars
                              ELSE 0 END) AS qb
              FROM documents WHERE lang IN ('en', 'de')),
            m AS (
              SELECT na, nb, sa / na AS ma, sb / nb AS mb,
                     (qa - sa * sa / na) / (na - 1) AS va,
                     (qb - sb * sb / nb) / (nb - 1) AS vb
              FROM agg),
            s AS (
              SELECT na, nb, ma, mb,
                     sqrt(((na - 1) * va + (nb - 1) * vb)
                          / (na + nb - 2)) AS sp
              FROM m)
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
                   round((ma - mb) / sp, 6) AS cohens_d,
                   round((ma - mb) / sp
                         * (1 - 3 / (4 * (na + nb) - 9)), 6)
                     AS hedges_g
            FROM s""",
        "theil_sen_trend": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                       AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b, coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            slopes AS (
              SELECT (b2.x - b1.x) / CAST(b2.b - b1.b AS DOUBLE)
                       AS slope
              FROM series b1 JOIN series b2 ON b2.b > b1.b),
            sm AS (
              SELECT avg(slope) AS med FROM (
                SELECT slope, ROW_NUMBER() OVER (ORDER BY slope ASC)
                         AS r, count(*) OVER () AS cnt
                FROM slopes)
              WHERE r IN ((cnt + 1) // 2, (cnt + 2) // 2)),
            resid AS (
              SELECT series.x - sm.med * series.b AS resid
              FROM series CROSS JOIN sm),
            im AS (
              SELECT avg(resid) AS imed FROM (
                SELECT resid, ROW_NUMBER() OVER (ORDER BY resid ASC)
                         AS r, count(*) OVER () AS cnt
                FROM resid)
              WHERE r IN ((cnt + 1) // 2, (cnt + 2) // 2)),
            meta AS (
              SELECT (SELECT count(*) FROM series) AS n_buckets,
                     (SELECT count(*) FROM slopes) AS n_pairs)
            SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   round(sm.med, 6) AS slope_per_bucket,
                   round(im.imed, 6) AS intercept
            FROM meta CROSS JOIN sm CROSS JOIN im""",
        "ccf_events": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                       AS b,
                     sum(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END) AS x,
                     sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS y
              FROM events WHERE event_type IN ('click', 'purchase')
              GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b, coalesce(counts.x, 0) AS x,
                     coalesce(counts.y, 0) AS y
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            m AS (SELECT avg(x) AS xbar, avg(y) AS ybar FROM series),
            denom AS (
              SELECT sum(pow(x - xbar, 2)) AS sx,
                     sum(pow(y - ybar, 2)) AS sy,
                     max(xbar) AS xbar, max(ybar) AS ybar
              FROM series CROSS JOIN m),
            lags AS (SELECT unnest(generate_series(-12, 12)) AS lag),
            pairs AS (
              SELECT lags.lag, a.x AS x, b2.y AS y2
              FROM series a CROSS JOIN lags
              JOIN series b2 ON b2.b = a.b + lags.lag)
            SELECT CAST(lag AS BIGINT) AS lag,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   round(sum((x - xbar) * (y2 - ybar))
                         / sqrt(max(sx) * max(sy)), 6) AS r
            FROM pairs CROSS JOIN denom
            GROUP BY lag""",
        "burstiness": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                       AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            fano AS (
              SELECT count(*) AS n_buckets,
                     (avg(x * x) - avg(x) * avg(x)) / avg(x) AS fano
              FROM series),
            gaps AS (
              SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY epoch_us(ts)))
                     / 1e6 AS gap
              FROM events),
            g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
            gstats AS (
              SELECT count(*) AS n_gaps, avg(gap) AS mg,
                     avg(gap * gap) - avg(gap) * avg(gap) AS vg
              FROM g)
            SELECT CAST(n_buckets AS BIGINT) AS n_buckets,
                   round(fano, 6) AS fano,
                   CAST(n_gaps AS BIGINT) AS n_gaps,
                   round(mg, 6) AS mean_gap_s,
                   round(sqrt(greatest(vg, 0.0)) / mg, 6) AS cv_gap,
                   round((sqrt(greatest(vg, 0.0)) / mg - 1)
                         / (sqrt(greatest(vg, 0.0)) / mg + 1), 6)
                     AS burstiness
            FROM fano CROSS JOIN gstats""",
        "cocitation_cosine": f"""
            WITH {HOST_EDGES_CTE},
            e AS (SELECT DISTINCT src AS s, dst AS d FROM hedges),
            indeg AS (SELECT d, count(*) AS deg FROM e GROUP BY d),
            pairs AS (
              SELECT a.d AS a, b.d AS b, count(*) AS n_common
              FROM e a JOIN e b ON a.s = b.s AND a.d < b.d
              GROUP BY a.d, b.d
              HAVING count(*) >= 2)
            SELECT a, b,
                   CAST(n_common AS BIGINT) AS n_common,
                   round(n_common / sqrt(da.deg * db.deg), 6) AS cosine
            FROM pairs
            JOIN indeg da ON da.d = pairs.a
            JOIN indeg db ON db.d = pairs.b""",
        "mann_kendall": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                       AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b, coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            s_agg AS (
              SELECT CAST(sum(sign(b2.x - b1.x)) AS BIGINT) AS s
              FROM series b1 JOIN series b2 ON b2.b > b1.b),
            n_agg AS (SELECT count(*) AS n FROM series),
            ties AS (
              SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
                       AS tie_term
              FROM (SELECT count(*) AS t FROM series GROUP BY x)),
            j AS (SELECT s, n, tie_term
                  FROM s_agg CROSS JOIN n_agg CROSS JOIN ties)
            SELECT CAST(n AS BIGINT) AS n_buckets,
                   CAST(s AS BIGINT) AS s,
                   round((n * (n - 1) * (2 * n + 5) - tie_term)
                         / 18, 6) AS var_s,
                   round(CASE
                     WHEN s > 0 THEN (s - 1)
                       / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)
                              / 18)
                     WHEN s < 0 THEN (s + 1)
                       / sqrt((n * (n - 1) * (2 * n + 5) - tie_term)
                              / 18)
                     ELSE 0.0 END, 6) AS z
            FROM j""",
        "runs_test": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                       AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b, coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            med AS (
              SELECT avg(_m) AS med FROM (
                SELECT x AS _m, ROW_NUMBER() OVER (ORDER BY x ASC)
                         AS r, count(*) OVER () AS cnt
                FROM series)
              WHERE r IN ((cnt + 1) // 2, (cnt + 2) // 2)),
            signed AS (
              SELECT b, CASE WHEN x > med THEN 1 ELSE 0 END AS above
              FROM series CROSS JOIN med
              WHERE x <> med),
            flips AS (
              SELECT above,
                     CASE WHEN above <> lag(above) OVER (ORDER BY b)
                          THEN 1 ELSE 0 END AS flip
              FROM signed),
            agg AS (
              SELECT sum(above) AS n1, sum(1 - above) AS n2,
                     coalesce(sum(flip), 0) + 1 AS runs
              FROM flips)
            SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                   CAST(runs AS BIGINT) AS runs,
                   round(2 * n1 * n2 / (n1 + n2) + 1, 6) AS mu,
                   round((runs - (2 * n1 * n2 / (n1 + n2) + 1))
                         / sqrt((2 * n1 * n2
                                 * (2 * n1 * n2 - (n1 + n2)))
                                / ((n1 + n2) * (n1 + n2)
                                   * (n1 + n2 - 1))), 6) AS z
            FROM agg""",
        "seasonal_profile": """
            WITH counts AS (
              SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
                       AS b,
                     count(*) AS x
              FROM events GROUP BY 1),
            bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM counts),
            spine AS (
              SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
            series AS (
              SELECT spine.b % 24 AS phase, coalesce(counts.x, 0) AS x
              FROM spine LEFT JOIN counts ON counts.b = spine.b),
            tot AS (SELECT sum(x) AS total FROM series)
            SELECT CAST(phase AS BIGINT) AS phase,
                   CAST(count(*) AS BIGINT) AS n_buckets,
                   round(sum(x) / count(*), 6) AS mean_count,
                   round(sum(x) / max(total), 6) AS share
            FROM series CROSS JOIN tot
            GROUP BY phase""",
        "ppmi_similarity": f"""
            WITH {TOKENS_CTE},
            ctx AS (
              SELECT w, c FROM (
                SELECT token AS w,
                       unnest([lead(token, 1) OVER win,
                               lead(token, 2) OVER win,
                               lag(token, 1) OVER win,
                               lag(token, 2) OVER win]) AS c
                FROM tokens
                WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
              WHERE c IS NOT NULL),
            wc AS (SELECT w, c, count(*) AS cwc FROM ctx
                   GROUP BY w, c HAVING count(*) >= 3),
            cw AS (SELECT w, sum(cwc) AS cw FROM wc GROUP BY w),
            ccm AS (SELECT c, sum(cwc) AS cc FROM wc GROUP BY c),
            nn AS (SELECT sum(cwc) AS n FROM wc),
            ppmi AS (
              SELECT w, c,
                     greatest(ln(cwc * n / (cw.cw * ccm.cc)), 0.0) AS p
              FROM wc JOIN cw USING (w) JOIN ccm USING (c)
              CROSS JOIN nn),
            pos_p AS (SELECT w, c, p FROM ppmi WHERE p > 0),
            norms AS (SELECT w, sqrt(sum(p * p)) AS nrm FROM pos_p
                      GROUP BY w),
            dots AS (
              SELECT x.w AS a, y.w AS b,
                     count(*) AS n_shared,
                     sum(x.p * y.p) AS dot
              FROM pos_p x JOIN pos_p y
                ON x.c = y.c AND x.w < y.w
              GROUP BY x.w, y.w
              HAVING count(*) >= 3)
            SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared,
                   round(dot / (na.nrm * nb.nrm), 6) AS cosine
            FROM dots
            JOIN norms na ON na.w = dots.a
            JOIN norms nb ON nb.w = dots.b""",
        "og_meta": """
            WITH base AS (
              SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                       AS url,
                     doc_id, lang
              FROM documents)
            SELECT url, og_key, content FROM (
              SELECT url, 'og:title' AS og_key,
                     'Doc ' || CAST(doc_id AS VARCHAR) || ' & more'
                       AS content
              FROM base
              UNION ALL
              SELECT url, 'og:type', 'article' FROM base
              UNION ALL
              SELECT url, 'og:locale', lang FROM base)""",
        "rel_canonical": """
            SELECT 'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                     AS url,
                   'https://example.org/doc/'
                     || CAST(doc_id - doc_id % 5 AS VARCHAR)
                     AS canonical,
                   doc_id % 5 = 0 AS self_canonical
            FROM documents""",
        "ht_estimate": """
            WITH s AS (
              SELECT doc_id, n_chars,
                     (doc_id * 2654435761) % 2147483647
                       / 2147483647.0 AS h,
                     CASE WHEN lang = 'de' THEN 0.3
                          WHEN lang = 'en' THEN 0.5
                          ELSE 1.0 END AS pi
              FROM documents)
            SELECT CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN h < pi THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sampled,
                   CAST(sum(n_chars) AS BIGINT) AS t_true,
                   round(sum(CASE WHEN h < pi THEN n_chars / pi END),
                         6) AS t_hat,
                   round(abs(sum(CASE WHEN h < pi
                                      THEN n_chars / pi END)
                             - sum(n_chars)) / sum(n_chars), 6)
                     AS rel_err
            FROM s""",
        "neyman_alloc": """
            WITH g AS (
              SELECT source AS stratum, count(*) AS nh,
                     sum(n_chars) AS s1,
                     sum(n_chars * n_chars) AS s2
              FROM documents GROUP BY source),
            scored AS (
              SELECT stratum, nh,
                     sqrt(greatest(s2 / nh - (s1 / nh) * (s1 / nh),
                                   0.0)) AS sd,
                     nh * sqrt(greatest(s2 / nh - (s1 / nh) * (s1 / nh),
                                        0.0)) AS w
              FROM g),
            tot AS (SELECT sum(w) AS sw, sum(nh) AS n FROM scored)
            SELECT stratum, CAST(nh AS BIGINT) AS n_rows,
                   round(sd, 6) AS sd,
                   round(1000 * w / sw, 6) AS alloc_neyman,
                   round(1000 * nh / n, 6) AS alloc_prop
            FROM scored CROSS JOIN tot""",
        "jackknife_se": """
            WITH g AS (
              SELECT source, count(*) AS nh, sum(n_chars) AS sh,
                     sum(n_chars * n_chars) AS qh
              FROM documents GROUP BY source),
            tot AS (SELECT sum(nh) AS n, sum(sh) AS s, sum(qh) AS q,
                           count(*) AS ng
                    FROM g),
            loos AS (
              SELECT (s - sh) / (n - nh) AS theta_i, n, s, q, ng
              FROM g CROSS JOIN tot),
            agg AS (
              SELECT max(n) AS n, max(ng) AS ng, max(s) AS s,
                     max(q) AS q, avg(theta_i) AS tbar,
                     sum(theta_i * theta_i) AS t2
              FROM loos)
            SELECT CAST(n AS BIGINT) AS n_rows,
                   CAST(ng AS BIGINT) AS n_groups,
                   round(s / n, 6) AS mean,
                   round(sqrt(greatest((ng - 1) * 1.0 / ng
                              * (t2 - ng * tbar * tbar), 0.0)), 6)
                     AS se_jack,
                   round(sqrt((q * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n))
                              / n), 6) AS se_naive
            FROM agg""",
        "qld_search": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dl AS (SELECT doc_id, count(*) AS dl
                   FROM tokens GROUP BY doc_id),
            cn AS (SELECT count(*) AS cn FROM tokens),
            qt AS (SELECT unnest(['spark', 'stream', 'vector']) AS qt),
            cf AS (
              SELECT qt, coalesce(sum(CASE WHEN token = qt
                                           THEN 1 END), 0) AS cf
              FROM qt LEFT JOIN tokens ON token = qt GROUP BY qt),
            cands AS (
              SELECT DISTINCT doc_id FROM tf JOIN qt ON tf.token = qt),
            grid AS (
              SELECT c.doc_id, dl.dl, cf.qt, cf.cf, cn.cn
              FROM cands c JOIN dl USING (doc_id)
              CROSS JOIN cf CROSS JOIN cn),
            tfq AS (SELECT doc_id, token AS qt, tf FROM tf
                    JOIN qt ON tf.token = qt),
            st AS (
              SELECT g.doc_id, g.dl, g.qt,
                     coalesce(tfq.tf, 0) AS tf, g.cf, g.cn
              FROM grid g LEFT JOIN tfq
                ON tfq.doc_id = g.doc_id AND tfq.qt = g.qt),
            scored AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hits,
                     round(sum(ln((tf + 2000.0 * cf / cn)
                                  / (dl + 2000.0))), 6) AS score
              FROM st GROUP BY doc_id)
            SELECT doc_id, n_hits, score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
            FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 15""",
        "err_eval": """
            WITH q AS (
              SELECT * FROM (VALUES ('join', 'merge'),
                                    ('stream', 'window'),
                                    ('filter', 'scan'))
                AS t(term, rel_term)),
            scored AS (
              SELECT d.doc_id, q.term,
                     len(list_filter(
                       string_split_regex(trim(d.text), '\s+'),
                       x -> x = q.term)) AS tf,
                     least(len(list_filter(
                       string_split_regex(trim(d.text), '\s+'),
                       x -> x = q.rel_term)), 3) AS rel
              FROM documents d CROSS JOIN q),
            cand AS (SELECT * FROM scored WHERE tf > 0),
            ranked AS (
              SELECT term, doc_id,
                     (pow(2.0, rel) - 1) / 8.0 AS rr,
                     ROW_NUMBER() OVER
                       (PARTITION BY term
                        ORDER BY tf DESC, doc_id ASC) AS rank,
                     sum(CASE WHEN (pow(2.0, rel) - 1) / 8.0 < 1
                              THEN ln(1 - (pow(2.0, rel) - 1) / 8.0)
                         END) OVER
                       (PARTITION BY term
                        ORDER BY tf DESC, doc_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS ln_stop,
                     max(CASE WHEN (pow(2.0, rel) - 1) / 8.0 >= 1
                              THEN 1 ELSE 0 END) OVER
                       (PARTITION BY term
                        ORDER BY tf DESC, doc_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS dead_before
              FROM cand)
            SELECT term AS query_term,
                   CAST(count(*) AS BIGINT) AS n_candidates,
                   round(sum(CASE WHEN rank <= 10
                                  AND coalesce(dead_before, 0) = 0
                             THEN rr / rank
                                  * exp(coalesce(ln_stop, 0.0))
                             ELSE 0 END), 6) AS err
            FROM ranked GROUP BY term""",
        "mmr_rerank": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dl AS (SELECT doc_id, count(*) AS dl
                   FROM tokens GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            qt AS (SELECT unnest(['spark', 'stream', 'vector']) AS token),
            hits AS (SELECT tf.* FROM tf JOIN qt USING (token)),
            dfq AS (SELECT token, count(*) AS df FROM hits GROUP BY token),
            bscored AS (
              SELECT h.doc_id, count(*) AS n_hits,
                     round(sum(
                       ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * h.tf * 2.2
                       / (h.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                     ), 6) AS score
              FROM hits h
              JOIN dfq d USING (token)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
              GROUP BY h.doc_id),
            cand AS (SELECT doc_id, score AS rel FROM bscored
                     ORDER BY score DESC, doc_id LIMIT 15),
            dt AS (
              SELECT DISTINCT t.doc_id, t.token
              FROM tokens t JOIN cand ON cand.doc_id = t.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM dt
                      GROUP BY doc_id),
            inter AS (
              SELECT p.doc_id AS a, q.doc_id AS b, count(*) AS ni
              FROM dt p JOIN dt q
                ON p.token = q.token AND p.doc_id < q.doc_id
              GROUP BY p.doc_id, q.doc_id),
            simt AS (
              SELECT a, b, ni / (sa.sz + sb.sz - ni) AS sim
              FROM inter
              JOIN sizes sa ON sa.doc_id = inter.a
              JOIN sizes sb ON sb.doc_id = inter.b),
            sym AS (
              SELECT a AS x, b AS y, sim FROM simt
              UNION ALL SELECT b, a, sim FROM simt),
            pick1 AS (
              SELECT doc_id, rel, round(0.7 * rel, 6) AS mmr,
                     CAST(1 AS BIGINT) AS step
              FROM cand ORDER BY round(0.7 * rel, 6) DESC, doc_id
              LIMIT 1),
            avail2 AS (
              SELECT c.doc_id, c.rel,
                     coalesce(max(s.sim), 0.0) AS ms
              FROM cand c
              LEFT JOIN sym s
                ON s.x = c.doc_id
               AND s.y IN (SELECT doc_id FROM (SELECT doc_id FROM pick1))
              WHERE c.doc_id NOT IN (SELECT doc_id FROM pick1)
              GROUP BY c.doc_id, c.rel),
            pick2 AS (
              SELECT doc_id, rel,
                     round(0.7 * rel - 0.3 * ms, 6) AS mmr,
                     CAST(2 AS BIGINT) AS step
              FROM avail2
              ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, doc_id
              LIMIT 1),
            avail3 AS (
              SELECT c.doc_id, c.rel,
                     coalesce(max(s.sim), 0.0) AS ms
              FROM cand c
              LEFT JOIN sym s
                ON s.x = c.doc_id
               AND s.y IN (SELECT doc_id FROM (SELECT doc_id FROM pick1 UNION ALL SELECT doc_id FROM pick2))
              WHERE c.doc_id NOT IN (SELECT doc_id FROM pick1 UNION ALL SELECT doc_id FROM pick2)
              GROUP BY c.doc_id, c.rel),
            pick3 AS (
              SELECT doc_id, rel,
                     round(0.7 * rel - 0.3 * ms, 6) AS mmr,
                     CAST(3 AS BIGINT) AS step
              FROM avail3
              ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, doc_id
              LIMIT 1),
            avail4 AS (
              SELECT c.doc_id, c.rel,
                     coalesce(max(s.sim), 0.0) AS ms
              FROM cand c
              LEFT JOIN sym s
                ON s.x = c.doc_id
               AND s.y IN (SELECT doc_id FROM (SELECT doc_id FROM pick1 UNION ALL SELECT doc_id FROM pick2 UNION ALL SELECT doc_id FROM pick3))
              WHERE c.doc_id NOT IN (SELECT doc_id FROM pick1 UNION ALL SELECT doc_id FROM pick2 UNION ALL SELECT doc_id FROM pick3)
              GROUP BY c.doc_id, c.rel),
            pick4 AS (
              SELECT doc_id, rel,
                     round(0.7 * rel - 0.3 * ms, 6) AS mmr,
                     CAST(4 AS BIGINT) AS step
              FROM avail4
              ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, doc_id
              LIMIT 1),
            avail5 AS (
              SELECT c.doc_id, c.rel,
                     coalesce(max(s.sim), 0.0) AS ms
              FROM cand c
              LEFT JOIN sym s
                ON s.x = c.doc_id
               AND s.y IN (SELECT doc_id FROM (SELECT doc_id FROM pick1 UNION ALL SELECT doc_id FROM pick2 UNION ALL SELECT doc_id FROM pick3 UNION ALL SELECT doc_id FROM pick4))
              WHERE c.doc_id NOT IN (SELECT doc_id FROM pick1 UNION ALL SELECT doc_id FROM pick2 UNION ALL SELECT doc_id FROM pick3 UNION ALL SELECT doc_id FROM pick4)
              GROUP BY c.doc_id, c.rel),
            pick5 AS (
              SELECT doc_id, rel,
                     round(0.7 * rel - 0.3 * ms, 6) AS mmr,
                     CAST(5 AS BIGINT) AS step
              FROM avail5
              ORDER BY round(0.7 * rel - 0.3 * ms, 6) DESC, doc_id
              LIMIT 1)
            SELECT step, doc_id, round(rel, 6) AS rel, mmr FROM pick1
            UNION ALL SELECT step, doc_id, round(rel, 6), mmr FROM pick2
            UNION ALL SELECT step, doc_id, round(rel, 6), mmr FROM pick3
            UNION ALL SELECT step, doc_id, round(rel, 6), mmr FROM pick4
            UNION ALL SELECT step, doc_id, round(rel, 6), mmr FROM pick5""",
        "nysiis_blocks": """
            WITH base AS (SELECT p_name AS name FROM part),
            s0 AS (SELECT name,
                     regexp_replace(lower(name), '[^a-z]', '', 'g') AS k
                   FROM base),
            s1 AS (SELECT name,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(k, '^mac', 'mcc'),
                             '^kn', 'nn'),
                           '^k', 'c'),
                         '^(ph|pf)', 'ff'),
                       '^sch', 'sss') AS k
                   FROM s0),
            s2 AS (SELECT name,
                     regexp_replace(
                       regexp_replace(k, '(ee|ie)$', 'y'),
                       '(dt|rt|rd|nt|nd)$', 'd') AS k
                   FROM s1),
            s3 AS (SELECT name, substr(k, 1, 1) AS hd,
                     substr(k, 2) AS tl
                   FROM s2),
            s4 AS (SELECT name, hd,
                     translate(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               translate(
                                 regexp_replace(tl, 'ev', 'af', 'g'),
                                 'qzm', 'gsn'),
                               'kn', 'n', 'g'),
                             'k', 'c', 'g'),
                           'sch', 'sss', 'g'),
                         'ph', 'ff', 'g'),
                       'eiou', 'aaaa') AS tl
                   FROM s3),
            s5 AS (SELECT name, hd || tl AS k FROM s4),
            s6 AS (SELECT name, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(k, 'a{2,}', 'a', 'g'), 'b{2,}', 'b', 'g'), 'c{2,}', 'c', 'g'), 'd{2,}', 'd', 'g'), 'e{2,}', 'e', 'g'), 'f{2,}', 'f', 'g'), 'g{2,}', 'g', 'g'), 'h{2,}', 'h', 'g'), 'i{2,}', 'i', 'g'), 'j{2,}', 'j', 'g'), 'k{2,}', 'k', 'g'), 'l{2,}', 'l', 'g'), 'm{2,}', 'm', 'g'), 'n{2,}', 'n', 'g'), 'o{2,}', 'o', 'g'), 'p{2,}', 'p', 'g'), 'q{2,}', 'q', 'g'), 'r{2,}', 'r', 'g'), 's{2,}', 's', 'g'), 't{2,}', 't', 'g'), 'u{2,}', 'u', 'g'), 'v{2,}', 'v', 'g'), 'w{2,}', 'w', 'g'), 'x{2,}', 'x', 'g'), 'y{2,}', 'y', 'g'), 'z{2,}', 'z', 'g') AS k FROM s5),
            keyed AS (SELECT name,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(k, 's$', ''),
                         'ay$', 'y'),
                       'a$', '') AS nkey
                   FROM s6)
            SELECT DISTINCT name, nkey,
                   CAST(count(*) OVER (PARTITION BY nkey) AS BIGINT)
                     AS block_size
            FROM keyed""",
        "dice_pairs": """
            WITH base AS (
              SELECT p_partkey AS id, p_name AS name FROM part
              WHERE p_partkey <= 500),
            t0 AS (SELECT DISTINCT name,
                     regexp_replace(lower(name), '[^a-z]', '', 'g') AS k
                   FROM base),
            t1 AS (SELECT name,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(k, '^mac', 'mcc'),
                             '^kn', 'nn'),
                           '^k', 'c'),
                         '^(ph|pf)', 'ff'),
                       '^sch', 'sss') AS k
                   FROM t0),
            t2 AS (SELECT name,
                     regexp_replace(
                       regexp_replace(k, '(ee|ie)$', 'y'),
                       '(dt|rt|rd|nt|nd)$', 'd') AS k
                   FROM t1),
            t3 AS (SELECT name, substr(k, 1, 1) AS hd,
                     substr(k, 2) AS tl
                   FROM t2),
            t4 AS (SELECT name, hd,
                     translate(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               translate(
                                 regexp_replace(tl, 'ev', 'af', 'g'),
                                 'qzm', 'gsn'),
                               'kn', 'n', 'g'),
                             'k', 'c', 'g'),
                           'sch', 'sss', 'g'),
                         'ph', 'ff', 'g'),
                       'eiou', 'aaaa') AS tl
                   FROM t3),
            t5 AS (SELECT name, hd || tl AS k FROM t4),
            t6 AS (SELECT name, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(k, 'a{2,}', 'a', 'g'), 'b{2,}', 'b', 'g'), 'c{2,}', 'c', 'g'), 'd{2,}', 'd', 'g'), 'e{2,}', 'e', 'g'), 'f{2,}', 'f', 'g'), 'g{2,}', 'g', 'g'), 'h{2,}', 'h', 'g'), 'i{2,}', 'i', 'g'), 'j{2,}', 'j', 'g'), 'k{2,}', 'k', 'g'), 'l{2,}', 'l', 'g'), 'm{2,}', 'm', 'g'), 'n{2,}', 'n', 'g'), 'o{2,}', 'o', 'g'), 'p{2,}', 'p', 'g'), 'q{2,}', 'q', 'g'), 'r{2,}', 'r', 'g'), 's{2,}', 's', 'g'), 't{2,}', 't', 'g'), 'u{2,}', 'u', 'g'), 'v{2,}', 'v', 'g'), 'w{2,}', 'w', 'g'), 'x{2,}', 'x', 'g'), 'y{2,}', 'y', 'g'), 'z{2,}', 'z', 'g') AS k FROM t5),
            keyed2 AS (SELECT name,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(k, 's$', ''),
                         'ay$', 'y'),
                       'a$', '') AS nkey
                   FROM t6),
            a AS (SELECT base.id, base.name AS name_a, keyed2.nkey
                  FROM base JOIN keyed2 USING (name)),
            b AS (SELECT base.id, base.name AS name_b, keyed2.nkey
                  FROM base JOIN keyed2 USING (name)),
            bg AS (
              SELECT id, list_distinct(
                       list_transform(range(1, len(name)),
                                      i -> substr(name, i, 2))) AS bs
              FROM base WHERE len(name) >= 2),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b, name_a, name_b
              FROM a JOIN b USING (nkey)
              WHERE a.id < b.id),
            scored AS (
              SELECT id_a, id_b, name_a, name_b,
                     round(CASE WHEN len(ba.bs) + len(bb.bs) > 0
                                THEN 2.0 * len(list_intersect(ba.bs,
                                                              bb.bs))
                                     / (len(ba.bs) + len(bb.bs))
                                ELSE 0.0 END, 6) AS dice
              FROM pairs
              JOIN bg ba ON ba.id = pairs.id_a
              JOIN bg bb ON bb.id = pairs.id_b)
            SELECT * FROM scored WHERE dice >= 0.6""",
        "katz_hosts": f"""
            WITH {HOST_EDGES_CTE},
            e AS (SELECT DISTINCT src AS s, dst AS d FROM hedges),
            nodes AS (SELECT DISTINCT node FROM (
              SELECT s AS node FROM e UNION SELECT d FROM e)),
            w0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS w FROM nodes),
            w1 AS (SELECT e.d AS node, CAST(0.1 AS DOUBLE) * sum(w0.w) AS w
                   FROM e JOIN w0 ON w0.node = e.s GROUP BY e.d),
            w2 AS (SELECT e.d AS node, CAST(0.1 AS DOUBLE) * sum(w1.w) AS w
                   FROM e JOIN w1 ON w1.node = e.s GROUP BY e.d),
            w3 AS (SELECT e.d AS node, CAST(0.1 AS DOUBLE) * sum(w2.w) AS w
                   FROM e JOIN w2 ON w2.node = e.s GROUP BY e.d),
            w4 AS (SELECT e.d AS node, CAST(0.1 AS DOUBLE) * sum(w3.w) AS w
                   FROM e JOIN w3 ON w3.node = e.s GROUP BY e.d),
            w5 AS (SELECT e.d AS node, CAST(0.1 AS DOUBLE) * sum(w4.w) AS w
                   FROM e JOIN w4 ON w4.node = e.s GROUP BY e.d),
            w6 AS (SELECT e.d AS node, CAST(0.1 AS DOUBLE) * sum(w5.w) AS w
                   FROM e JOIN w5 ON w5.node = e.s GROUP BY e.d),
            tot AS (
              SELECT node, sum(w) AS w FROM (
                SELECT * FROM w1 UNION ALL SELECT * FROM w2
                UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4
                UNION ALL SELECT * FROM w5 UNION ALL SELECT * FROM w6)
              GROUP BY node)
            SELECT nodes.node, round(coalesce(tot.w, 0.0), 6) AS katz
            FROM nodes LEFT JOIN tot USING (node)""",
        "ct_lang": """
            WITH grams AS (
              SELECT doc_id, lang,
                     unnest(list_transform(
                       range(1, greatest(len(text) - 1, 1)),
                       i -> substr(lower(text), i, 3))) AS g,
                     ((doc_id * 2654435761) % 2147483647) % 4 = 0
                       AS is_test
              FROM documents),
            lang_counts AS (
              SELECT lang, g, count(*) AS c FROM grams
              WHERE NOT is_test GROUP BY lang, g),
            lang_prof AS (
              SELECT lang, g, lr FROM (
                SELECT lang, g, ROW_NUMBER() OVER
                  (PARTITION BY lang ORDER BY c DESC, g ASC) AS lr
                FROM lang_counts) WHERE lr <= 40),
            doc_counts AS (
              SELECT doc_id, lang AS true_lang, g, count(*) AS c
              FROM grams WHERE is_test
              GROUP BY doc_id, lang, g),
            doc_prof AS (
              SELECT doc_id, true_lang, g, dr FROM (
                SELECT doc_id, true_lang, g, ROW_NUMBER() OVER
                  (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS dr
                FROM doc_counts) WHERE dr <= 40),
            langs AS (SELECT DISTINCT lang FROM lang_prof),
            grid AS (SELECT d.*, langs.lang
                     FROM doc_prof d CROSS JOIN langs),
            joined AS (
              SELECT grid.doc_id, grid.true_lang, grid.lang,
                     coalesce(abs(grid.dr - lp.lr), 40) AS pen
              FROM grid LEFT JOIN lang_prof lp
                ON lp.lang = grid.lang AND lp.g = grid.g),
            dist AS (
              SELECT doc_id, true_lang, lang, sum(pen) AS d
              FROM joined GROUP BY doc_id, true_lang, lang),
            pred AS (
              SELECT true_lang, lang AS pred_lang FROM (
                SELECT *, ROW_NUMBER() OVER
                  (PARTITION BY doc_id ORDER BY d ASC, lang ASC) AS rk
                FROM dist) WHERE rk = 1)
            SELECT true_lang, pred_lang,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM pred GROUP BY true_lang, pred_lang""",
        "token_adaptation": f"""
            WITH {TOKENS_CTE},
            dt AS (SELECT doc_id, token, count(*) AS c FROM tokens
                   GROUP BY doc_id, token),
            nd AS (SELECT count(DISTINCT doc_id) AS n FROM tokens),
            pt AS (
              SELECT token, count(*) AS df1,
                     sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS df2
              FROM dt GROUP BY token HAVING count(*) >= 10)
            SELECT token,
                   CAST(df1 AS BIGINT) AS df1,
                   CAST(df2 AS BIGINT) AS df2,
                   round(df1 / n, 6) AS prior,
                   round(df2 / df1, 6) AS adaptation,
                   round((df2 / df1) / (df1 / n), 6) AS lift
            FROM pt CROSS JOIN nd""",
        "rocchio_rerank": f"""
            WITH {TOKENS_CTE},
            tf AS (SELECT doc_id, token, count(*) AS tf
                   FROM tokens GROUP BY doc_id, token),
            dl AS (SELECT doc_id, count(*) AS dl
                   FROM tokens GROUP BY doc_id),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            qt AS (SELECT unnest(['spark', 'stream', 'vector']) AS token),
            hits AS (SELECT tf.* FROM tf JOIN qt USING (token)),
            dfq AS (SELECT token, count(*) AS df FROM hits GROUP BY token),
            bscored AS (
              SELECT h.doc_id,
                     round(sum(
                       ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * h.tf * 2.2
                       / (h.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                     ), 6) AS score
              FROM hits h
              JOIN dfq d USING (token)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
              GROUP BY h.doc_id),
            fb_docs AS (SELECT doc_id FROM bscored
                        ORDER BY score DESC, doc_id LIMIT 10),
            dfall AS (SELECT token, count(*) AS df FROM tf
                      GROUP BY token),
            tfidf AS (
              SELECT tf.doc_id, tf.token,
                     tf.tf * ln(s.n_docs * 1.0 / dfall.df) AS w
              FROM tf JOIN dfall USING (token) CROSS JOIN stats s),
            fb AS (
              SELECT token, sum(w) / 10 AS cw
              FROM tfidf JOIN fb_docs USING (doc_id)
              GROUP BY token),
            expansion AS (
              SELECT token, cw FROM fb
              WHERE token NOT IN (SELECT token FROM qt)
              ORDER BY round(cw, 6) DESC, token ASC LIMIT 5),
            q_weights AS (
              SELECT qt.token,
                     1.0 + 0.75 * coalesce(fb.cw, 0.0) AS qw
              FROM qt LEFT JOIN fb USING (token)),
            weights AS (
              SELECT token, qw FROM q_weights
              UNION ALL
              SELECT token, 0.75 * cw AS qw FROM expansion),
            cands AS (SELECT DISTINCT doc_id FROM hits),
            scored AS (
              SELECT t.doc_id,
                     round(sum(t.w * weights.qw), 6) AS score
              FROM tfidf t
              JOIN weights USING (token)
              JOIN cands ON cands.doc_id = t.doc_id
              GROUP BY t.doc_id)
            SELECT doc_id, score,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rank
            FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 10""",
        "cluster_validity": _kmeans_with_clause(4, 3) + """,
            dimsj AS (
              SELECT d.vec_id, d.dim, d.qv AS v, a.cluster
              FROM dims d JOIN afinal a USING (vec_id)),
            cents AS (SELECT cluster, dim, avg(v) AS c
                      FROM dimsj GROUP BY cluster, dim),
            d2 AS (
              SELECT p.vec_id, p.cluster AS own, c.cluster AS cl,
                     sum((p.v - c.c) * (p.v - c.c)) AS d2
              FROM dimsj p JOIN cents c USING (dim)
              GROUP BY p.vec_id, p.cluster, c.cluster),
            per_point AS (
              SELECT vec_id, own,
                     max(CASE WHEN cl = own THEN d2 END) AS a2,
                     min(CASE WHEN cl <> own THEN d2 END) AS b2
              FROM d2 GROUP BY vec_id, own),
            ps AS (
              SELECT own AS cluster,
                     CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0
                          THEN (sqrt(b2) - sqrt(a2))
                               / greatest(sqrt(a2), sqrt(b2))
                          ELSE 0.0 END AS s,
                     a2, sqrt(a2) AS ad
              FROM per_point),
            cl_stats AS (
              SELECT cluster, count(*) AS n_i, avg(ad) AS s_i,
                     sum(a2) AS w_i, avg(s) AS sil_i
              FROM ps GROUP BY cluster),
            gmu AS (SELECT dim, avg(v) AS g FROM dimsj GROUP BY dim),
            btw AS (
              SELECT sum(n_i * bd2) AS b FROM (
                SELECT c.cluster, sum((c.c - g.g) * (c.c - g.g)) AS bd2
                FROM cents c JOIN gmu g USING (dim)
                GROUP BY c.cluster) x
              JOIN cl_stats USING (cluster)),
            cc AS (
              SELECT a.cluster AS ci, b.cluster AS cj,
                     sqrt(sum((a.c - b.c) * (a.c - b.c))) AS dc
              FROM cents a JOIN cents b USING (dim)
              WHERE a.cluster <> b.cluster
              GROUP BY a.cluster, b.cluster),
            dbt AS (
              SELECT ci, max((si.s_i + sj.s_i) / dc) AS r_i
              FROM cc
              JOIN cl_stats si ON si.cluster = cc.ci
              JOIN cl_stats sj ON sj.cluster = cc.cj
              GROUP BY ci),
            dbv AS (SELECT avg(r_i) AS db FROM dbt),
            tot AS (SELECT sum(n_i) AS n, sum(w_i) AS w,
                           sum(n_i * sil_i) AS sil_sum
                    FROM cl_stats)
            SELECT CAST(4 AS BIGINT) AS k,
                   CAST(n AS BIGINT) AS n,
                   round(sil_sum / n, 6) AS silhouette,
                   round(db, 6) AS davies_bouldin,
                   round((b / 3) / (w / (n - 4)), 6)
                     AS calinski_harabasz
            FROM tot CROSS JOIN btw CROSS JOIN dbv""",
        "pca_top": """
            WITH q AS (SELECT vec_id,
                              list_transform(embedding,
                                x -> CAST(round(x::DOUBLE * 1000)
                                          AS BIGINT)) AS qv
                       FROM embeddings),
            dims AS (SELECT vec_id,
                            CAST(generate_subscripts(qv, 1) - 1
                                 AS BIGINT) AS dim,
                            unnest(qv) AS v
                     FROM q),
            mu AS (SELECT dim, avg(v) AS mu FROM dims GROUP BY dim),
            centered AS (
              SELECT d.vec_id, d.dim, d.v - mu.mu AS x
              FROM dims d JOIN mu USING (dim)),
            nn AS (SELECT count(*) AS n FROM q),
            cov AS MATERIALIZED (
              SELECT a.dim AS i, b.dim AS j,
                     sum(a.x * b.x) / (max(nn.n) - 1) AS c
              FROM centered a JOIN centered b USING (vec_id)
              CROSS JOIN nn
              GROUP BY a.dim, b.dim),
            v0 AS (SELECT DISTINCT i AS dim, CAST(1.0 AS DOUBLE) AS v
                   FROM cov),
            w1 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v0.v) AS w
              FROM cov JOIN v0 ON v0.dim = cov.j
              GROUP BY cov.i),
            n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
            v1 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w1 CROSS JOIN n1),
            w2 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v1.v) AS w
              FROM cov JOIN v1 ON v1.dim = cov.j
              GROUP BY cov.i),
            n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
            v2 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w2 CROSS JOIN n2),
            w3 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v2.v) AS w
              FROM cov JOIN v2 ON v2.dim = cov.j
              GROUP BY cov.i),
            n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3),
            v3 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w3 CROSS JOIN n3),
            w4 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v3.v) AS w
              FROM cov JOIN v3 ON v3.dim = cov.j
              GROUP BY cov.i),
            n4 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w4),
            v4 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w4 CROSS JOIN n4),
            w5 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v4.v) AS w
              FROM cov JOIN v4 ON v4.dim = cov.j
              GROUP BY cov.i),
            n5 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w5),
            v5 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w5 CROSS JOIN n5),
            w6 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v5.v) AS w
              FROM cov JOIN v5 ON v5.dim = cov.j
              GROUP BY cov.i),
            n6 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w6),
            v6 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w6 CROSS JOIN n6),
            w7 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v6.v) AS w
              FROM cov JOIN v6 ON v6.dim = cov.j
              GROUP BY cov.i),
            n7 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w7),
            v7 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w7 CROSS JOIN n7),
            w8 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * v7.v) AS w
              FROM cov JOIN v7 ON v7.dim = cov.j
              GROUP BY cov.i),
            n8 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w8),
            v8 AS MATERIALIZED (SELECT i AS dim, w / nrm AS v
                     FROM w8 CROSS JOIN n8),
            lam AS (
              SELECT sum(vi.v * cov.c * vj.v) AS lam
              FROM cov
              JOIN v8 vi ON vi.dim = cov.i
              JOIN v8 vj ON vj.dim = cov.j),
            tr AS (SELECT sum(c) AS tr FROM cov WHERE i = j),
            sgn AS (SELECT CASE WHEN sum(v) < 0 THEN -1.0
                                ELSE 1.0 END AS sgn
                    FROM v8)
            SELECT CAST(v8.dim AS BIGINT) AS dim,
                   round(v8.v * sgn.sgn, 6) AS loading,
                   round(lam.lam, 6) AS eigenvalue,
                   round(lam.lam / tr.tr, 6) AS var_share
            FROM v8 CROSS JOIN lam CROSS JOIN tr CROSS JOIN sgn""",
        "rotate_score": f"""

            WITH placed AS (
              SELECT 'cust:' || CAST(o_custkey AS VARCHAR) AS subj, 'placed' AS pred,
                     CASE WHEN o_orderkey % 13 = 0 THEN 'cust:' || CAST(o_custkey AS VARCHAR)
                          ELSE 'order:' || CAST(o_orderkey AS VARCHAR) END AS obj
              FROM orders),
            contains_t AS (
              SELECT 'order:' || CAST(l_orderkey AS VARCHAR), 'contains', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            supplies_t AS (
              SELECT 'supp:' || CAST(l_suppkey AS VARCHAR), 'supplies', 'part:' || CAST(l_partkey AS VARCHAR) FROM lineitem),
            t AS (SELECT DISTINCT * FROM (SELECT * FROM placed UNION ALL SELECT * FROM contains_t UNION ALL SELECT * FROM supplies_t)),
            q AS MATERIALIZED (
              SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv FROM embeddings),
            dm AS (SELECT CAST(len(qv) / 2 AS INT) AS h FROM q LIMIT 1),
            vals AS MATERIALIZED (
              SELECT vec_id, CAST(generate_subscripts(qv, 1) AS INT) AS i, unnest(qv) AS v FROM q),
            -- complex packing: dim i pairs Re = component i, Im = component i + half
            cx AS MATERIALIZED (
              SELECT a.vec_id, a.i, a.v AS re, b.v AS im
              FROM vals a JOIN vals b ON b.vec_id = a.vec_id
                                     AND b.i = a.i + (SELECT h FROM dm)
              WHERE a.i <= (SELECT h FROM dm)),
            nv AS (SELECT count(*) AS n FROM embeddings),
            tt AS MATERIALIZED (
              SELECT subj, pred, obj,
                     (CAST(regexp_extract(subj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN subj LIKE 'cust:%' THEN 0 WHEN subj LIKE 'order:%' THEN 7
                             WHEN subj LIKE 'part:%' THEN 13 WHEN subj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS hid,
                     (CAST(regexp_extract(obj, '([0-9]+)', 1) AS BIGINT)
                      + CASE WHEN obj LIKE 'cust:%' THEN 0 WHEN obj LIKE 'order:%' THEN 7
                             WHEN obj LIKE 'part:%' THEN 13 WHEN obj LIKE 'supp:%' THEN 29 ELSE 0 END)
                       % (SELECT n FROM nv) AS tid,
                     CASE pred WHEN 'placed' THEN 100 WHEN 'contains' THEN 101 WHEN 'supplies' THEN 102 END AS rid
              FROM t),
            rot AS (SELECT * FROM (VALUES {ROT65_VALUES_SQL}) AS rot(idx, c, s)),
            relrot AS MATERIALIZED (
              SELECT r.vec_id AS rid, r.i, rot.c, rot.s
              FROM cx r
              JOIN rot ON rot.idx = (abs(r.re) + 3 * abs(r.im)) % 32
              WHERE r.vec_id IN (100, 101, 102)),
            hrx AS MATERIALIZED (
              SELECT h.vec_id AS hid, rr.rid, h.i,
                     h.re, h.im, rr.c, rr.s
              FROM cx h JOIN relrot rr ON rr.i = h.i),
            ids AS MATERIALIZED (SELECT DISTINCT hid, rid, tid FROM tt),
            en AS MATERIALIZED (
              SELECT e.hid, e.rid, e.tid,
                     round(sum(abs(hr.re * hr.c - hr.im * hr.s - 65 * ta.re)
                               + abs(hr.im * hr.c + hr.re * hr.s - 65 * ta.im)
                               ) / 65.0, 6) AS energy
              FROM ids e
              JOIN hrx hr ON hr.hid = e.hid AND hr.rid = e.rid
              JOIN cx ta ON ta.vec_id = e.tid AND ta.i = hr.i
              GROUP BY 1, 2, 3)
            SELECT subj, pred, obj, energy, CAST(rank AS BIGINT) AS rank
            FROM (SELECT tt.subj, tt.pred, tt.obj, en.energy,
                         ROW_NUMBER() OVER (PARTITION BY tt.pred ORDER BY en.energy ASC, tt.subj, tt.obj) AS rank
                  FROM tt JOIN en ON en.hid = tt.hid AND en.rid = tt.rid AND en.tid = tt.tid)
            WHERE rank <= 5""",
        "bowtie_hosts": f"""
            WITH RECURSIVE {HOST_EDGES_CTE.strip()},
            gadget AS (SELECT * FROM (VALUES {BOWTIE_GADGET_VALUES_SQL})
                       AS g(src, dst)),
            alle AS (SELECT DISTINCT src, dst FROM
                     (SELECT src, dst FROM hedges
                      UNION ALL SELECT src, dst FROM gadget)),
            nodes AS (SELECT DISTINCT node FROM
                      (SELECT src AS node FROM alle
                       UNION ALL SELECT dst FROM alle)),
            d1 AS (SELECT src AS node, count(*) AS c FROM alle GROUP BY 1),
            d2 AS (SELECT dst AS node, count(*) AS c FROM alle GROUP BY 1),
            deg AS (SELECT n.node,
                           coalesce(d1.c, 0) + coalesce(d2.c, 0) AS d
                    FROM nodes n
                    LEFT JOIN d1 USING (node) LEFT JOIN d2 USING (node)),
            pv AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 1),
            fwd (node, dist) AS (
              SELECT node, 0 FROM pv
              UNION
              SELECT e.dst, f.dist + 1
              FROM fwd f JOIN alle e ON e.src = f.node
              WHERE f.dist < 8),
            bwd (node, dist) AS (
              SELECT node, 0 FROM pv
              UNION
              SELECT e.src, b.dist + 1
              FROM bwd b JOIN alle e ON e.dst = b.node
              WHERE b.dist < 8),
            sym AS (SELECT src AS a, dst AS b FROM alle
                    UNION SELECT dst, src FROM alle),
            reach (node, root) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.node),
            comp AS (SELECT node, min(root) AS component
                     FROM reach GROUP BY node),
            pcomp AS (SELECT c.component FROM comp c
                      JOIN pv p ON p.node = c.node),
            fset AS (SELECT DISTINCT node FROM fwd),
            bset AS (SELECT DISTINCT node FROM bwd),
            cls AS (
              SELECT n.node,
                     CASE WHEN f.node IS NOT NULL AND b.node IS NOT NULL
                            THEN 'CORE'
                          WHEN b.node IS NOT NULL THEN 'IN'
                          WHEN f.node IS NOT NULL THEN 'OUT'
                          WHEN c.component = (SELECT component FROM pcomp)
                            THEN 'TENDRIL'
                          ELSE 'DISCONNECTED' END AS component
              FROM nodes n
              LEFT JOIN fset f ON f.node = n.node
              LEFT JOIN bset b ON b.node = n.node
              JOIN comp c ON c.node = n.node),
            tot AS (SELECT count(*) AS n FROM nodes)
            SELECT component, CAST(count(*) AS BIGINT) AS n_hosts,
                   round(count(*) / (SELECT n FROM tot)::DOUBLE, 6) AS share
            FROM cls GROUP BY component""",
        "trustrank_hosts": f"""
            WITH {HOST_EDGES_CTE.strip()},
            gadget AS (SELECT * FROM (VALUES {TRUST_GADGET_VALUES_SQL})
                       AS g(src, dst)),
            alle AS (SELECT DISTINCT src AS a, dst AS b FROM
                     (SELECT src, dst FROM hedges
                      UNION ALL SELECT src, dst FROM gadget)),
            outdeg AS (SELECT a, count(*) AS outdeg FROM alle GROUP BY a),
            nodes AS (SELECT DISTINCT node FROM
                      (SELECT a AS node FROM alle
                       UNION ALL SELECT b FROM alle)),
            nn AS (SELECT count(*) AS n FROM nodes),
            sv AS (SELECT node,
                          1.0 / (SELECT n FROM nn) AS u,
                          CASE WHEN node IN ('src0.example.org',
                                             'src1.example.org')
                               THEN 0.5 ELSE 0.0 END AS seed
                   FROM nodes),
            v0 AS (SELECT node, u AS pr, seed AS trust FROM sv)"""
        + "".join(f""",
            v{i} AS (
              SELECT s.node,
                     0.15 * s.u + 0.85 * COALESCE(c.cp, 0.0) AS pr,
                     0.15 * s.seed + 0.85 * COALESCE(c.ct, 0.0) AS trust
              FROM sv s LEFT JOIN (
                SELECT e.b AS node,
                       sum(p.pr / o.outdeg) AS cp,
                       sum(p.trust / o.outdeg) AS ct
                FROM alle e
                JOIN v{i - 1} p ON e.a = p.node
                JOIN outdeg o ON o.a = e.a
                GROUP BY e.b) c USING (node))""" for i in range(1, 5))
        + """
            SELECT node, round(pr, 6) AS pr, round(trust, 6) AS trust,
                   CASE WHEN round(pr, 6) > 0
                        THEN round((round(pr, 6) - round(trust, 6))
                                   / round(pr, 6), 6)
                        ELSE 0.0 END AS spam_mass
            FROM v4""",
        "scan_hosts": f"""
            WITH RECURSIVE {HOST_EDGES_CTE.strip()},
            gadget AS (SELECT * FROM (VALUES {SCAN_GADGET_VALUES_SQL})
                       AS g(src, dst)),
            alle AS (SELECT src, dst FROM hedges
                     UNION ALL SELECT src, dst FROM gadget),
            sym AS (SELECT DISTINCT a, b FROM
                    (SELECT src AS a, dst AS b FROM alle
                     UNION ALL SELECT dst, src FROM alle)
                    WHERE a <> b),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            closed AS (SELECT a, b FROM sym
                       UNION ALL SELECT node, node FROM nodes),
            deg AS (SELECT a, count(*) AS deg FROM closed GROUP BY a),
            common AS (
              SELECT e.a AS u, e.b AS v, count(*) AS n_common
              FROM sym e
              JOIN closed x ON x.a = e.a
              JOIN closed y ON y.a = e.b AND y.b = x.b
              GROUP BY e.a, e.b),
            sig AS (
              SELECT c.u, c.v,
                     round(c.n_common
                           / sqrt(du.deg * dv.deg::DOUBLE), 6) AS sigma
              FROM common c
              JOIN deg du ON du.a = c.u
              JOIN deg dv ON dv.a = c.v),
            epse AS MATERIALIZED (SELECT u, v FROM sig
                                  WHERE sigma >= 0.5),
            core AS MATERIALIZED (
              SELECT u AS node FROM epse
              GROUP BY u HAVING count(*) + 1 >= 3),
            ce AS (SELECT e.u, e.v FROM epse e
                   JOIN core cu ON cu.node = e.u
                   JOIN core cv ON cv.node = e.v
                   UNION SELECT node, node FROM core),
            cesym AS (SELECT u AS a, v AS b FROM ce
                      UNION SELECT v, u FROM ce),
            reach (node, root) AS (
              SELECT a, a FROM cesym
              UNION
              SELECT s.b, r.root
              FROM reach r JOIN cesym s ON s.a = r.node),
            cc AS (SELECT node, min(root) AS cluster
                   FROM reach GROUP BY node),
            border AS (
              SELECT e.v AS node, min(cc.cluster) AS cluster
              FROM epse e JOIN cc ON cc.node = e.u
              WHERE e.v NOT IN (SELECT node FROM cc)
              GROUP BY e.v),
            clustered AS (
              SELECT node, 'core' AS role, cluster FROM cc
              UNION ALL
              SELECT node, 'border', cluster FROM border),
            rest AS (SELECT node FROM nodes
                     WHERE node NOT IN (SELECT node FROM clustered)),
            bridge AS (
              SELECT s.a AS node,
                     count(DISTINCT cl.cluster) AS n_cl
              FROM sym s
              JOIN rest r ON r.node = s.a
              JOIN clustered cl ON cl.node = s.b
              GROUP BY s.a)
            SELECT node, role, cluster FROM clustered
            UNION ALL
            SELECT r.node,
                   CASE WHEN coalesce(b.n_cl, 0) >= 2
                        THEN 'hub' ELSE 'outlier' END AS role,
                   NULL AS cluster
            FROM rest r LEFT JOIN bridge b ON b.node = r.node""",
        "kcenter_seeds": """
            WITH q AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS qv
              FROM embeddings),
            dims AS MATERIALIZED (
              SELECT vec_id,
                     CAST(generate_subscripts(qv, 1) - 1 AS BIGINT) AS dim,
                     unnest(qv) AS v
              FROM q),
            c0 AS (SELECT min(vec_id) AS id FROM q),
            m0 AS MATERIALIZED (
              SELECT p.vec_id,
                     sum((p.v - c.v) * (p.v - c.v)) AS d2
              FROM dims p
              JOIN dims c ON c.vec_id = (SELECT id FROM c0)
                         AND c.dim = p.dim
              GROUP BY p.vec_id),
            s1 AS (SELECT vec_id, d2 FROM m0
                     ORDER BY d2 DESC, vec_id LIMIT 1),
            m1 AS MATERIALIZED (
              SELECT m.vec_id, least(m.d2, n.d2) AS d2
              FROM m0 m JOIN (
                SELECT p.vec_id,
                       sum((p.v - c.v) * (p.v - c.v)) AS d2
                FROM dims p
                JOIN dims c ON c.vec_id = (SELECT vec_id FROM s1)
                           AND c.dim = p.dim
                GROUP BY p.vec_id) n USING (vec_id)),
            s2 AS (SELECT vec_id, d2 FROM m1
                     ORDER BY d2 DESC, vec_id LIMIT 1),
            m2 AS MATERIALIZED (
              SELECT m.vec_id, least(m.d2, n.d2) AS d2
              FROM m1 m JOIN (
                SELECT p.vec_id,
                       sum((p.v - c.v) * (p.v - c.v)) AS d2
                FROM dims p
                JOIN dims c ON c.vec_id = (SELECT vec_id FROM s2)
                           AND c.dim = p.dim
                GROUP BY p.vec_id) n USING (vec_id)),
            s3 AS (SELECT vec_id, d2 FROM m2
                     ORDER BY d2 DESC, vec_id LIMIT 1),
            m3 AS MATERIALIZED (
              SELECT m.vec_id, least(m.d2, n.d2) AS d2
              FROM m2 m JOIN (
                SELECT p.vec_id,
                       sum((p.v - c.v) * (p.v - c.v)) AS d2
                FROM dims p
                JOIN dims c ON c.vec_id = (SELECT vec_id FROM s3)
                           AND c.dim = p.dim
                GROUP BY p.vec_id) n USING (vec_id)),
            s4 AS (SELECT vec_id, d2 FROM m3
                     ORDER BY d2 DESC, vec_id LIMIT 1),
            m4 AS MATERIALIZED (
              SELECT m.vec_id, least(m.d2, n.d2) AS d2
              FROM m3 m JOIN (
                SELECT p.vec_id,
                       sum((p.v - c.v) * (p.v - c.v)) AS d2
                FROM dims p
                JOIN dims c ON c.vec_id = (SELECT vec_id FROM s4)
                           AND c.dim = p.dim
                GROUP BY p.vec_id) n USING (vec_id)),
            s5 AS (SELECT vec_id, d2 FROM m4
                     ORDER BY d2 DESC, vec_id LIMIT 1)
            SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS seed_rank,
                   (SELECT id FROM c0) AS vec_id,
                   CAST(0 AS BIGINT) AS d2
            UNION ALL
            SELECT CAST(1 AS BIGINT), vec_id,
                   CAST(d2 AS BIGINT) FROM s1
            UNION ALL
            SELECT CAST(2 AS BIGINT), vec_id,
                   CAST(d2 AS BIGINT) FROM s2
            UNION ALL
            SELECT CAST(3 AS BIGINT), vec_id,
                   CAST(d2 AS BIGINT) FROM s3
            UNION ALL
            SELECT CAST(4 AS BIGINT), vec_id,
                   CAST(d2 AS BIGINT) FROM s4
            UNION ALL
            SELECT CAST(5 AS BIGINT), vec_id,
                   CAST(d2 AS BIGINT) FROM s5)
            ORDER BY seed_rank""",
        "script_profile": r"""
            WITH fx AS (
              SELECT doc_id,
                     text
                     || CASE lang
                          WHEN 'zh' THEN ' 数据流处理'
                          WHEN 'de' THEN ' straße prüfung'
                          WHEN 'fr' THEN ' données département'
                          WHEN 'es' THEN ' años señal'
                          ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                             THEN ' поток данных' ELSE '' END
                     || CASE WHEN doc_id % 13 = 0
                             THEN ' διαδικασία' ELSE '' END AS text
              FROM documents),
            c AS (
              SELECT doc_id,
                     CAST(length(text) - length(regexp_replace(text, '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS BIGINT) AS n_latin,
                     CAST(length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
                     CAST(length(text) - length(regexp_replace(text, '[\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
                     CAST(length(text) - length(regexp_replace(text, '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
                     CAST(length(text) - length(regexp_replace(text, '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
                     CAST(length(text) - length(regexp_replace(text, '[\x{AC00}-\x{D7AF}]', '', 'g')) AS BIGINT) AS n_hangul
              FROM fx),
            m AS (SELECT c.*, greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_hangul) AS mx, n_latin + n_cyrillic + n_greek + n_cjk + n_arabic + n_hangul AS tot FROM c)
            SELECT doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic, n_hangul,
                   CASE WHEN n_latin = mx AND mx > 0 THEN 'latin' WHEN n_cyrillic = mx AND mx > 0 THEN 'cyrillic' WHEN n_greek = mx AND mx > 0 THEN 'greek' WHEN n_cjk = mx AND mx > 0 THEN 'cjk' WHEN n_arabic = mx AND mx > 0 THEN 'arabic' WHEN n_hangul = mx AND mx > 0 THEN 'hangul' ELSE 'none' END AS script,
                   CASE WHEN tot > 0
                        THEN round(mx / tot::DOUBLE, 6)
                        ELSE 0.0 END AS share
            FROM m""",
        "pld_rollup": """
            WITH urls AS (
              SELECT 'https://'
                     || CASE WHEN doc_id % 3 = 0 THEN 'www.'
                             WHEN doc_id % 5 = 0 THEN 'a.b.'
                             ELSE '' END
                     || 'site' || CAST(doc_id % 7 AS VARCHAR) || '.'
                     || (['com', 'co.uk', 'org', 'com.au', 'de', 'io',
                          'net', 'gov.uk', 'zz'])[CAST(doc_id % 9 AS INT) + 1]
                     || '/p/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents),
            wh AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)', 1)) AS host
              FROM urls),
            hosts AS (SELECT DISTINCT host FROM wh),
            hp AS (SELECT host, string_split(host, '.') AS parts
                   FROM hosts),
            cands AS (
              SELECT h.host,
                     array_to_string(list_slice(h.parts,
                       greatest(len(h.parts) - k.k + 1, 1),
                       len(h.parts)), '.') AS cand
              FROM hp h CROSS JOIN (SELECT unnest([1, 2, 3]) AS k) k),
            psl AS (SELECT * FROM (VALUES ('ac.uk', 2), ('ai', 1), ('app', 1), ('au', 1), ('br', 1), ('ca', 1), ('cn', 1), ('co.in', 2), ('co.jp', 2), ('co.uk', 2), ('com', 1), ('com.au', 2), ('com.br', 2), ('com.cn', 2), ('com.mx', 2), ('de', 1), ('dev', 1), ('edu', 1), ('fr', 1), ('gov', 1), ('gov.uk', 2), ('in', 1), ('int', 1), ('io', 1), ('jp', 1), ('mil', 1), ('mx', 1), ('ne.jp', 2), ('net', 1), ('net.au', 2), ('org', 1), ('org.au', 2), ('org.uk', 2), ('uk', 1), ('us', 1))
                    AS p(suffix, n_labels)),
            best AS (
              SELECT host, suffix, n_labels FROM (
                SELECT c.host, p.suffix, p.n_labels,
                       row_number() OVER (PARTITION BY c.host
                         ORDER BY p.n_labels DESC, p.suffix DESC) AS rn
                FROM cands c JOIN psl p ON p.suffix = c.cand)
              WHERE rn = 1),
            pld AS (
              SELECT h.host,
                     CASE WHEN b.suffix IS NOT NULL
                               AND len(h.parts) > b.n_labels
                          THEN array_to_string(list_slice(h.parts,
                            len(h.parts) - b.n_labels, len(h.parts)), '.')
                          WHEN b.suffix IS NOT NULL THEN h.host
                          ELSE array_to_string(list_slice(h.parts,
                            greatest(len(h.parts) - 1, 1),
                            len(h.parts)), '.') END AS registered,
                     coalesce(b.suffix, '') AS suffix,
                     (b.suffix IS NOT NULL
                      AND len(h.parts) > b.n_labels) AS matched
              FROM hp h LEFT JOIN best b ON b.host = h.host)
            SELECT p.registered, p.suffix,
                   count(*) AS n_urls,
                   count(DISTINCT w.host) AS n_hosts,
                   p.matched
            FROM wh w JOIN pld p ON p.host = w.host
            GROUP BY p.registered, p.suffix, p.matched""",
        "wordpiece_encode": f"""
            WITH RECURSIVE {TOKENS_CTE},
            words AS (SELECT DISTINCT token AS word FROM tokens
                      WHERE length(token) BETWEEN 1 AND 25),
            vocab AS (SELECT * FROM
                      (VALUES {WORDPIECE_VOCAB_VALUES_SQL})
                      AS v(piece, raw, rlen, cont)),
            cand AS (
              SELECT w.word, p.pos, v.piece, v.rlen
              FROM words w
              CROSS JOIN (SELECT unnest(range(1, 26)) AS pos) p
              JOIN vocab v
                ON p.pos <= length(w.word)
               AND substr(w.word, CAST(p.pos AS INT), v.rlen) = v.raw
               AND p.pos + v.rlen - 1 <= length(w.word)
               AND v.cont = (p.pos > 1)),
            best AS (
              SELECT word, pos, max_by(piece, rlen) AS piece,
                     pos + max(rlen) AS next_pos
              FROM cand GROUP BY word, pos),
            walk (word, idx, piece, next_pos) AS (
              SELECT word, 0, piece, next_pos FROM best WHERE pos = 1
              UNION ALL
              SELECT b.word, w.idx + 1, b.piece, b.next_pos
              FROM walk w
              JOIN best b ON b.word = w.word AND b.pos = w.next_pos),
            done AS (
              SELECT w.word,
                     (coalesce(max(k.next_pos), -1)
                      = length(w.word) + 1) AS ok
              FROM words w LEFT JOIN walk k ON k.word = w.word
              GROUP BY w.word),
            allwords AS (SELECT DISTINCT token AS word FROM tokens)
            SELECT k.word, CAST(k.idx AS INT) AS idx, k.piece
            FROM walk k JOIN done d ON d.word = k.word AND d.ok
            UNION ALL
            SELECT a.word, 0, '[UNK]'
            FROM allwords a
            WHERE a.word NOT IN (SELECT word FROM done WHERE ok)""",
        "min_k_prob": f"""
            WITH {TOKENS_CTE},
            bg AS (
              SELECT t1.doc_id, t1.token AS w1, t2.token AS w2,
                     ((t1.doc_id * {KNUTH}) % {HASH_MOD}) % 2 AS part
              FROM tokens t1 JOIN tokens t2
                ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1),
            c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg
                    WHERE part <> 0 GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
                   FROM c12 GROUP BY w1),
            v AS (SELECT count(DISTINCT w) AS v FROM (
                    SELECT w2 AS w FROM bg WHERE part <> 0
                    UNION ALL SELECT w1 FROM bg WHERE part <> 0)),
            s AS (SELECT b.doc_id,
                         -ln((coalesce(c12.c12, 0) + 0.5)
                             / (coalesce(c1.c1, 0)
                                + 0.5 * greatest((SELECT v FROM v), 1))
                             ) AS nll
                  FROM bg b
                  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
                  LEFT JOIN c1 ON b.w1 = c1.w1
                  WHERE b.part = 0),
            ranked AS (
              SELECT doc_id, nll,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY nll DESC) AS rn,
                     count(*) OVER (PARTITION BY doc_id) AS n
              FROM s)
            SELECT doc_id,
                   CAST(max(n) AS BIGINT) AS n_bigrams,
                   CAST(max(CAST(ceil(0.2 * n) AS BIGINT)) AS BIGINT
                        ) AS n_selected,
                   round(-sum(CASE WHEN rn <= ceil(0.2 * n)
                                   THEN nll END)
                         / max(CAST(ceil(0.2 * n) AS BIGINT)), 6
                         ) AS mink_avg_logprob,
                   round(-avg(nll), 6) AS full_avg_logprob
            FROM ranked GROUP BY doc_id""",
        "self_bleu": f"""
            WITH {TOKENS_CTE},
            base AS (SELECT doc_id, count(*) AS n_tokens
                     FROM tokens GROUP BY doc_id),
            grams AS (
              SELECT doc_id, 1 AS n, token AS gram FROM tokens
              UNION ALL
              SELECT t1.doc_id, 2, t1.token || ' ' || t2.token
              FROM tokens t1 JOIN tokens t2
                ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
              UNION ALL
              SELECT t1.doc_id, 3,
                     t1.token || ' ' || t2.token || ' ' || t3.token
              FROM tokens t1
              JOIN tokens t2 ON t1.doc_id = t2.doc_id
                            AND t2.pos = t1.pos + 1
              JOIN tokens t3 ON t1.doc_id = t3.doc_id
                            AND t3.pos = t1.pos + 2
              UNION ALL
              SELECT t1.doc_id, 4,
                     t1.token || ' ' || t2.token || ' '
                     || t3.token || ' ' || t4.token
              FROM tokens t1
              JOIN tokens t2 ON t1.doc_id = t2.doc_id
                            AND t2.pos = t1.pos + 1
              JOIN tokens t3 ON t1.doc_id = t3.doc_id
                            AND t3.pos = t1.pos + 2
              JOIN tokens t4 ON t1.doc_id = t4.doc_id
                            AND t4.pos = t1.pos + 3),
            counts AS MATERIALIZED (
              SELECT n, gram, doc_id, count(*) AS c
              FROM grams GROUP BY n, gram, doc_id),
            top2 AS MATERIALIZED (
              SELECT n, gram,
                     max(CASE WHEN rn = 1 THEN doc_id END) AS d1,
                     max(CASE WHEN rn = 1 THEN c END) AS m1,
                     max(CASE WHEN rn = 2 THEN c END) AS m2
              FROM (SELECT n, gram, doc_id, c,
                           row_number() OVER (PARTITION BY n, gram
                             ORDER BY c DESC, doc_id) AS rn
                    FROM counts)
              WHERE rn <= 2 GROUP BY n, gram),
            prec AS (
              SELECT c.doc_id, c.n,
                     sum(least(c.c,
                       CASE WHEN c.doc_id <> t.d1 THEN t.m1
                            ELSE coalesce(t.m2, 0) END))
                     / sum(c.c)::DOUBLE AS p
              FROM counts c
              JOIN top2 t ON t.n = c.n AND t.gram = c.gram
              GROUP BY c.doc_id, c.n),
            hist AS (SELECT n_tokens AS rl, count(*) AS cnt
                     FROM base GROUP BY n_tokens),
            rlen AS (
              SELECT doc_id, rl AS ref_len FROM (
                SELECT b.doc_id, h.rl,
                       row_number() OVER (PARTITION BY b.doc_id
                         ORDER BY abs(h.rl - b.n_tokens), h.rl) AS rn
                FROM base b
                JOIN hist h ON h.cnt > 1 OR h.rl <> b.n_tokens)
              WHERE rn = 1),
            pw AS (
              SELECT doc_id, min(p) AS pmin,
                     sum(ln(CASE WHEN p > 0 THEN p ELSE 1.0 END))
                       / 4 AS logmean,
                     round(max(CASE WHEN n = 1 THEN p END), 6) AS p1,
                     round(max(CASE WHEN n = 2 THEN p END), 6) AS p2,
                     round(max(CASE WHEN n = 3 THEN p END), 6) AS p3,
                     round(max(CASE WHEN n = 4 THEN p END), 6) AS p4
              FROM prec GROUP BY doc_id)
            SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
                   CAST(r.ref_len AS INT) AS ref_len,
                   w.p1, w.p2, w.p3, w.p4,
                   round(CASE WHEN b.n_tokens >= r.ref_len THEN 1.0
                              ELSE exp(1 - r.ref_len
                                       / b.n_tokens::DOUBLE) END, 6
                         ) AS bp,
                   round(CASE WHEN w.pmin > 0
                              THEN (CASE WHEN b.n_tokens >= r.ref_len
                                         THEN 1.0
                                         ELSE exp(1 - r.ref_len
                                              / b.n_tokens::DOUBLE) END)
                                   * exp(w.logmean)
                              ELSE 0.0 END, 6) AS self_bleu
            FROM base b
            JOIN rlen r ON r.doc_id = b.doc_id
            JOIN pw w ON w.doc_id = b.doc_id""",
        "sif_embeddings": f"""
            WITH {TOKENS_CTE},
            freq AS (SELECT token, count(*) AS c
                     FROM tokens GROUP BY token),
            tot AS (SELECT sum(c) AS tot FROM freq),
            nv AS (SELECT count(*) AS n FROM embeddings),
            weights AS (
              SELECT token,
                     0.001 / (0.001
                              + c / (SELECT tot FROM tot)::DOUBLE) AS w,
                     CAST('0x' || substr(md5(token), 1, 8) AS BIGINT)
                       % (SELECT n FROM nv) AS row
              FROM freq),
            dims AS MATERIALIZED (
              SELECT vec_id AS row,
                     CAST(generate_subscripts(qv, 1) - 1 AS BIGINT
                          ) AS dim,
                     unnest(qv) AS v
              FROM (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(round(x::DOUBLE * 1000)
                                       AS BIGINT)) AS qv
                    FROM embeddings)),
            dlen AS (SELECT doc_id, count(*) AS n_tok
                     FROM tokens GROUP BY doc_id),
            sacc AS (
              SELECT t.doc_id, d.dim, sum(w.w * d.v) AS s
              FROM tokens t
              JOIN weights w USING (token)
              JOIN dims d ON d.row = w.row
              GROUP BY t.doc_id, d.dim),
            vd AS MATERIALIZED (
              SELECT s.doc_id, s.dim, s.s / l.n_tok AS x
              FROM sacc s JOIN dlen l USING (doc_id)),
            mu AS (SELECT dim, avg(x) AS mu FROM vd GROUP BY dim),
            centered AS MATERIALIZED (
              SELECT v.doc_id, v.dim, v.x - m.mu AS cx
              FROM vd v JOIN mu m USING (dim)),
            nd AS (SELECT count(DISTINCT doc_id) AS n FROM vd),
            cov AS MATERIALIZED (
              SELECT a.dim AS i, b.dim AS j,
                     sum(a.cx * b.cx) / ((SELECT n FROM nd) - 1) AS c
              FROM centered a JOIN centered b USING (doc_id)
              GROUP BY a.dim, b.dim),
            u0 AS (SELECT DISTINCT i AS dim, CAST(1.0 AS DOUBLE) AS u
                   FROM cov),
            w1 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * u0.u) AS w
              FROM cov JOIN u0 ON u0.dim = cov.j
              GROUP BY cov.i),
            n1 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w1),
            u1 AS MATERIALIZED (
              SELECT i AS dim, w / nrm AS u
              FROM w1 CROSS JOIN n1),
            w2 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * u1.u) AS w
              FROM cov JOIN u1 ON u1.dim = cov.j
              GROUP BY cov.i),
            n2 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w2),
            u2 AS MATERIALIZED (
              SELECT i AS dim, w / nrm AS u
              FROM w2 CROSS JOIN n2),
            w3 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * u2.u) AS w
              FROM cov JOIN u2 ON u2.dim = cov.j
              GROUP BY cov.i),
            n3 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w3),
            u3 AS MATERIALIZED (
              SELECT i AS dim, w / nrm AS u
              FROM w3 CROSS JOIN n3),
            w4 AS MATERIALIZED (
              SELECT cov.i, sum(cov.c * u3.u) AS w
              FROM cov JOIN u3 ON u3.dim = cov.j
              GROUP BY cov.i),
            n4 AS (SELECT sqrt(sum(w * w)) AS nrm FROM w4),
            u4 AS MATERIALIZED (
              SELECT i AS dim, w / nrm AS u
              FROM w4 CROSS JOIN n4),
            proj AS (
              SELECT v.doc_id, sum(v.x * u.u) AS dot
              FROM vd v JOIN u4 u USING (dim) GROUP BY v.doc_id)
            SELECT v.doc_id, v.dim,
                   round(v.x - p.dot * u.u, 6) AS value
            FROM vd v
            JOIN u4 u USING (dim)
            JOIN proj p USING (doc_id)""",
        "bradley_terry": """
            WITH base AS (
              SELECT source,
                     CAST(regexp_extract(source, '([0-9]+)', 1)
                          AS BIGINT) AS ia,
                     (doc_id * 7 + 3) % 20 AS ib,
                     n_chars, doc_id
              FROM documents),
            m AS (
              SELECT CASE WHEN (n_chars + doc_id) % 3 > 0
                          THEN (CASE WHEN ia < ib THEN source
                                ELSE 'src' || CAST(ib AS VARCHAR) END)
                          ELSE (CASE WHEN ia < ib
                                THEN 'src' || CAST(ib AS VARCHAR)
                                ELSE source END) END AS w,
                     CASE WHEN (n_chars + doc_id) % 3 > 0
                          THEN (CASE WHEN ia < ib
                                THEN 'src' || CAST(ib AS VARCHAR)
                                ELSE source END)
                          ELSE (CASE WHEN ia < ib THEN source
                                ELSE 'src' || CAST(ib AS VARCHAR) END)
                          END AS l
              FROM base WHERE ia <> ib),
            wins0 AS (SELECT w AS item, count(*) AS wins
                      FROM m GROUP BY w),
            items AS (SELECT DISTINCT item FROM
                      (SELECT w AS item FROM m
                       UNION ALL SELECT l FROM m)),
            w_tbl AS (SELECT i.item, coalesce(wins0.wins, 0) AS wins
                      FROM items i LEFT JOIN wins0 USING (item)),
            pairs AS MATERIALIZED (
              SELECT a, b, count(*) AS n FROM
              (SELECT w AS a, l AS b FROM m
               UNION ALL SELECT l, w FROM m)
              GROUP BY a, b),
            comp AS (SELECT a AS item, sum(n) AS comparisons
                     FROM pairs GROUP BY a),
            t0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS theta
                   FROM w_tbl),
            d1 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t0 ta ON ta.item = p.a
              JOIN t0 tb ON tb.item = p.b
              GROUP BY p.a),
            raw1 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d1 d USING (item)),
            g1 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw1 WHERE theta > 0),
            t1 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g1) AS theta
              FROM raw1),
            d2 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t1 ta ON ta.item = p.a
              JOIN t1 tb ON tb.item = p.b
              GROUP BY p.a),
            raw2 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d2 d USING (item)),
            g2 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw2 WHERE theta > 0),
            t2 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g2) AS theta
              FROM raw2),
            d3 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t2 ta ON ta.item = p.a
              JOIN t2 tb ON tb.item = p.b
              GROUP BY p.a),
            raw3 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d3 d USING (item)),
            g3 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw3 WHERE theta > 0),
            t3 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g3) AS theta
              FROM raw3),
            d4 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t3 ta ON ta.item = p.a
              JOIN t3 tb ON tb.item = p.b
              GROUP BY p.a),
            raw4 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d4 d USING (item)),
            g4 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw4 WHERE theta > 0),
            t4 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g4) AS theta
              FROM raw4),
            d5 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t4 ta ON ta.item = p.a
              JOIN t4 tb ON tb.item = p.b
              GROUP BY p.a),
            raw5 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d5 d USING (item)),
            g5 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw5 WHERE theta > 0),
            t5 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g5) AS theta
              FROM raw5),
            d6 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t5 ta ON ta.item = p.a
              JOIN t5 tb ON tb.item = p.b
              GROUP BY p.a),
            raw6 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d6 d USING (item)),
            g6 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw6 WHERE theta > 0),
            t6 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g6) AS theta
              FROM raw6),
            d7 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t6 ta ON ta.item = p.a
              JOIN t6 tb ON tb.item = p.b
              GROUP BY p.a),
            raw7 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d7 d USING (item)),
            g7 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw7 WHERE theta > 0),
            t7 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g7) AS theta
              FROM raw7),
            d8 AS (
              SELECT p.a AS item,
                     sum(p.n / (ta.theta + tb.theta)) AS d
              FROM pairs p
              JOIN t7 ta ON ta.item = p.a
              JOIN t7 tb ON tb.item = p.b
              GROUP BY p.a),
            raw8 AS (
              SELECT w.item,
                     CASE WHEN coalesce(d.d, 0) > 0
                          THEN w.wins / d.d ELSE 0.0 END AS theta
              FROM w_tbl w LEFT JOIN d8 d USING (item)),
            g8 AS (SELECT exp(avg(ln(theta))) AS g
                     FROM raw8 WHERE theta > 0),
            t8 AS MATERIALIZED (
              SELECT item, theta / (SELECT g FROM g8) AS theta
              FROM raw8)
            SELECT w.item, CAST(w.wins AS BIGINT) AS wins,
                   CAST(coalesce(c.comparisons, 0) AS BIGINT
                        ) AS comparisons,
                   round(t.theta, 6) AS theta,
                   CAST(row_number() OVER (ORDER BY t.theta DESC,
                                           w.item) AS INT) AS rank
            FROM w_tbl w
            LEFT JOIN comp c USING (item)
            JOIN t8 t USING (item)""",
        "luhn_abstract": f"""
            WITH sents AS (
              SELECT doc_id, sent_idx, sentence FROM (
                SELECT doc_id,
                       CAST(generate_subscripts(arr, 1) - 1 AS BIGINT)
                         AS sent_idx,
                       unnest(arr) AS sentence
                FROM (SELECT doc_id,
                             string_split(
                               regexp_replace(text,
                                 '{SENT_BOUNDARY_NOLB}',
                                 '\\1' || chr(30), 'g'),
                               chr(30)) AS arr
                      FROM documents))
              WHERE sentence <> ''),
            toks AS (
              SELECT doc_id, sent_idx,
                     CAST(generate_subscripts(arr, 1) - 1 AS BIGINT
                          ) AS pos,
                     unnest(arr) AS token
              FROM (SELECT doc_id, sent_idx,
                           regexp_extract_all(sentence,
                             '{INFIX_PATTERN}', 0) AS arr
                    FROM sents)),
            freq AS (SELECT doc_id, token, count(*) AS c
                     FROM toks GROUP BY doc_id, token),
            sig AS (SELECT doc_id, token FROM freq
                    WHERE c >= 2 AND token NOT IN ('a', 'and', 'in', 'is', 'it', 'of', 'the', 'to')),
            sp AS (SELECT t.doc_id, t.sent_idx, t.pos
                   FROM toks t
                   JOIN sig s ON s.doc_id = t.doc_id
                             AND s.token = t.token),
            cl2 AS (
              SELECT doc_id, sent_idx, pos,
                     sum(brk) OVER (PARTITION BY doc_id, sent_idx
                       ORDER BY pos ROWS UNBOUNDED PRECEDING) AS cl
              FROM (SELECT *,
                           CASE WHEN prev IS NULL OR pos - prev > 5
                                THEN 1 ELSE 0 END AS brk
                    FROM (SELECT *,
                                 lag(pos) OVER (PARTITION BY doc_id,
                                   sent_idx ORDER BY pos) AS prev
                          FROM sp))),
            cs AS (
              SELECT doc_id, sent_idx, cl,
                     count(*) AS n_sig,
                     count(*) * count(*)
                       / (max(pos) - min(pos) + 1)::DOUBLE AS score
              FROM cl2 GROUP BY doc_id, sent_idx, cl),
            ss AS (
              SELECT doc_id, sent_idx, n_sig, score FROM (
                SELECT doc_id, sent_idx, n_sig, score,
                       row_number() OVER (PARTITION BY doc_id, sent_idx
                         ORDER BY score DESC, n_sig DESC) AS rn
                FROM cs)
              WHERE rn = 1),
            ranked AS (
              SELECT s.doc_id, s.sent_idx, s.n_sig, s.score,
                     row_number() OVER (PARTITION BY s.doc_id
                       ORDER BY s.score DESC, s.sent_idx) AS rank
              FROM ss s)
            SELECT r.doc_id, r.sent_idx, CAST(r.rank AS INT) AS rank,
                   CAST(r.n_sig AS BIGINT) AS n_sig,
                   round(r.score, 6) AS score, se.sentence
            FROM ranked r
            JOIN sents se ON se.doc_id = r.doc_id
                         AND se.sent_idx = r.sent_idx
            WHERE r.rank <= 2""",
    }
