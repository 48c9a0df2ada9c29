"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in expressions (JVM codegen, zero Python)
and engine-portable for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from saber_spark.kernels.text import INFIX_PATTERN
from saber_spark.operators.vocab import tokenize_docs, vocab_ids

# tiny multi-language stopword inventory for the n-gram/stopword heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

FP_MOD = 1_000_003  # fingerprint modulus (prime)
FP_MULT = 31
FP_OFFSET = 7


def _quality_parts(text_col: str) -> dict:
    """Shared column expressions for the text-quality family — the SINGLE
    definition of the tokenisation, stopword/punct counts, and the
    0.4/0.3/0.3 composite formula, so lang_id / quality_score /
    quality_filter cannot drift apart (their oracles still carry the SQL
    copies; tests/test_operators.py ties filter verdicts to score output).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN),
                                F.lit(0))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    nt = F.greatest(F.size(toks), F.lit(1))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.size(F.filter(
        toks, lambda t: t.rlike("^[0-9a-zA-Z]+$") == F.lit(False)))
    stop_ratio = n_stop / nt
    punct_ratio = n_punct / nt
    quality = composite_quality(F.size(toks), punct_ratio, stop_ratio)
    return {"toks": toks, "nt": nt, "n_stop": n_stop, "n_punct": n_punct,
            "stop_ratio": stop_ratio, "punct_ratio": punct_ratio,
            "quality": quality}


def composite_quality(n_tokens, punct_ratio, stop_ratio):
    """THE 0.4/0.3/0.3 composite quality formula (single definition):
    favors long, low-punct, natural-language docs."""
    return (0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
            + 0.3 * (1 - punct_ratio)
            + 0.3 * F.least(stop_ratio / F.lit(0.05), F.lit(1.0)))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", threshold: float = 0.02) -> DataFrame:
    """Stopword-ratio language heuristic.

    -> (doc_id, n_tokens, n_stopwords, en_ratio rounded 6, pred_lang).
    pred_lang = 'en' iff ratio of English stopwords > threshold.
    """
    p = _quality_parts(text_col)
    return docs.select(
        F.col(id_col),
        F.size(p["toks"]).alias("n_tokens"),
        p["n_stop"].alias("n_stopwords"),
    ).select(
        id_col, "n_tokens", "n_stopwords",
        F.round(F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
                ).alias("en_ratio"),
        F.when(F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1))
               > threshold, F.lit("en")).otherwise(F.lit("other")
                                                   ).alias("pred_lang"),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Document quality features + a composite score.

    -> (doc_id, *keep_cols, n_chars, n_tokens, avg_token_len, punct_ratio,
        stopword_ratio, quality rounded 6).
    quality = 0.4*min(n_tokens/100,1) + 0.3*(1-punct_ratio) + 0.3*stopword_sat
    (stopword_sat = min(stopword_ratio/0.05, 1)): favors long, low-punct,
    natural-language docs — the standard web-corpus filter shape.

    keep_cols passes metadata columns (source, url, ...) through the
    projection so downstream grouping doesn't need a second scan + join on
    the id just to reattach them.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN), F.lit(0))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    base = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9a-zA-Z]+$") == F.lit(False))
               ).alias("n_punct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))
               ).alias("n_stop"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t)).alias("tok_chars"),
    )
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    punct_ratio = F.col("n_punct") / nt
    stop_ratio = F.col("n_stop") / nt
    quality = composite_quality(F.col("n_tokens"), punct_ratio, stop_ratio)
    return base.select(
        id_col, *keep_cols, "n_chars", "n_tokens",
        F.round(F.col("tok_chars") / nt, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace vs regex ("BPE-ish") token counts per doc.

    -> (doc_id, n_ws_tokens, n_re_tokens). The regex count uses the NERsuite
    pattern (subword-ish: punctuation splits), the whitespace count is the
    cheap upper bound used for budget estimates.
    """
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(INFIX_PATTERN),
                                    F.lit(0))).alias("n_re_tokens"),
    )


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 40, min_mean_len: float = 2.0,
                   max_mean_len: float = 10.0,
                   max_top_bigram_frac: float = 0.12,
                   max_dup_trigram_frac: float = 0.30) -> DataFrame:
    """Gopher/MassiveText-style repetition + shape filters per document.

    -> (doc_id, n_words, mean_word_len, top_bigram_frac, dup_trigram_frac,
        keep). All engine-portable built-ins:
      top_bigram_frac  = occurrences of the most frequent word 2-gram
                         / total 2-grams (repetition signal)
      dup_trigram_frac = 1 - distinct/total word 3-grams (near-repetition)
      keep             = within all thresholds (the corpus filter bit)

    Words split on single spaces (the corpus layout), n-grams built with
    higher-order array functions — narrow until the per-(doc, gram) count,
    which is two hash aggregations with map-side partial combine. At 100 TB
    each agg shuffles on (doc_id, gram): uniformly distributed keys, no
    hub-key skew by construction (a gram key is doc-scoped).
    """
    words = F.split(F.trim(F.col(text_col)), " ")

    def grams(n: int):
        # n parallel length-guarded slices zipped into structs — no
        # lambda anywhere, so the whole gram build stays out of the
        # interpreted higher-order-function path (r6: the former
        # per-position transform/concat_ws/element_at lambdas cost
        # ~3s/branch at sf0.1; grouping on the struct instead of a
        # concatenated string is exact because words split on a
        # single-char separator and so contain no separator themselves)
        ln = F.greatest(F.size(words) - (n - 1), F.lit(0))
        return F.arrays_zip(*[F.slice(words, i + 1, ln) for i in range(n)])

    # sum(len(word)) == len(trim(text)) - (n_words - 1) exactly: a
    # single-char split yields n_words parts and n_words-1 separators
    # (r6 — replaces the per-word interpreted aggregate with integer
    # scan arithmetic)
    base = docs.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.round(
            (F.length(F.trim(F.col(text_col)))
             - (F.size(words) - F.lit(1))).cast("long")
            / F.greatest(F.size(words), F.lit(1)), 6).alias("mean_word_len"),
    )
    bi = (docs.select(F.col(id_col), F.explode(grams(2)).alias("g"))
          .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
          .groupBy(id_col)
          .agg(F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")))
    tri = (docs.select(F.col(id_col), F.explode(grams(3)).alias("g"))
           .groupBy(id_col)
           .agg(F.round(
               (F.count(F.lit(1)) - F.countDistinct("g"))
               / F.count(F.lit(1)), 6).alias("dup_trigram_frac")))
    return (
        base.join(bi, id_col, "left").join(tri, id_col, "left")
        .select(
            id_col, "n_words", "mean_word_len",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)
                       ).alias("dup_trigram_frac"),
            ((F.col("n_words") >= min_words)
             & (F.col("mean_word_len") >= min_mean_len)
             & (F.col("mean_word_len") <= max_mean_len)
             & (F.coalesce("top_bigram_frac", F.lit(0.0))
                <= max_top_bigram_frac)
             & (F.coalesce("dup_trigram_frac", F.lit(0.0))
                <= max_dup_trigram_frac)).alias("keep"),
        )
    )


# PII patterns: intersection of Java-regex (Spark) and RE2 (DuckDB) syntax —
# no lookaround, no backrefs — so the scrub is engine-portable byte-for-byte.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"(\+\d{7,15}|\b\d{3}-\d{3}-\d{4}\b)"


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Mask common PII surface forms before corpus release.

    -> (doc_id, scrubbed, n_emails, n_ips, n_phones, clean). Emails, IPv4
    addresses and phone-shaped numbers are replaced with <EMAIL>/<IP>/
    <PHONE> tokens (the standard web-corpus release step); counts are kept
    so downstream filters can drop PII-dense documents; ``clean`` = no
    substitutions at all. Pure built-in regexp_replace/regexp_count chains
    — JVM codegen, zero Python, narrow (no shuffle).

    Each count is computed on the SAME intermediate text its replacement
    step sees, so counts equal substitutions made: a span like
    "+14155552671@relay.example.com" is one email and zero phones (the
    phone digits are consumed by the earlier email replacement), and a
    phone reading that only materializes after an earlier substitution is
    counted. Raw-text per-category counts would disagree with the scrub
    on such overlaps.
    """
    after_email = F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    n_em = F.regexp_count(F.col(text_col), F.lit(PII_EMAIL))
    n_ip = F.regexp_count(after_email, F.lit(PII_IPV4))
    n_ph = F.regexp_count(after_ip, F.lit(PII_PHONE))
    return docs.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        n_em.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ips"),
        n_ph.cast("long").alias("n_phones"),
        ((n_em + n_ip + n_ph) == 0).alias("clean"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Position-sensitive rolling-hash fingerprint per document.

    fp = sum over positions of token_id * ((pos * 31 + 7) mod M)  (mod M)
    Each term is position-dependent (so permuted docs differ) but the SUM is
    commutative — aggregation order cannot change the result, making the
    value engine-portable and shuffle-safe.
    -> (doc_id, fingerprint).
    """
    tokens = tokenize_docs(docs, text_col=text_col, id_col=id_col)
    vocab = vocab_ids(tokens)
    with_ids = tokens.join(F.broadcast(vocab), "token")
    term = F.pmod(
        F.col("token_id").cast("long") *
        F.pmod(F.col("pos").cast("long") * FP_MULT + FP_OFFSET, F.lit(FP_MOD)),
        F.lit(FP_MOD))
    return (
        with_ids.select(F.col(id_col), term.alias("term"))
        .groupBy(id_col)
        .agg(F.pmod(F.sum("term"), F.lit(FP_MOD)).alias("fingerprint"))
    )


def quality_filter(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_quality: float = 0.5,
                   lang_threshold: float = 0.02,
                   **gopher_kwargs) -> DataFrame:
    """Composite keep/drop decision table — the RefinedWeb/CCNet-style
    per-document filter verdict combining the three heuristic families:

      lang         stopword-ratio language ID (lang_id semantics:
                   en_ratio > lang_threshold)
      low_quality  composite quality score (quality_score formula,
                   6dp-rounded) below min_quality
      repetition   any Gopher/MassiveText shape or repetition threshold
                   violated (gopher_quality keep bit)

    -> (doc_id, keep, n_failed, reasons) with reasons a comma-joined list
    in the fixed order lang,low_quality,repetition — the audit column a
    production pipeline keeps so every dropped doc is explainable.

    Scale shape: the lang + quality rules are ONE narrow projection over
    the scan (no join between them — they share the tokenised array
    expression, unlike joining lang_id ⋈ quality_score which would shuffle
    the corpus twice); the only shuffles are gopher_quality's two doc-local
    n-gram aggs and the final doc_id equi-join of the two branches.
    Portability: the keep decision compares the 6dp-ROUNDED quality (the
    value the oracle proves byte-identical), so the boundary doc sits on
    the same side in both engines. NULL text is treated as empty — it
    fails all three rules (keep=false, reasons lists every rule) instead
    of NULL verdicts silently passing the filter under ANSI NULL
    propagation.
    """
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    p = _quality_parts(text_col)
    narrow = docs.select(
        F.col(id_col),
        (p["stop_ratio"] > lang_threshold).alias("lang_ok"),
        (F.round(p["quality"], 6) >= min_quality).alias("quality_ok"))
    gopher = (gopher_quality(docs, text_col, id_col, **gopher_kwargs)
              .select(id_col, F.col("keep").alias("gopher_ok")))
    fails = F.filter(
        F.array(F.when(~F.col("lang_ok"), F.lit("lang")),
                F.when(~F.col("quality_ok"), F.lit("low_quality")),
                F.when(~F.col("gopher_ok"), F.lit("repetition"))),
        lambda x: x.isNotNull())
    return (narrow.join(gopher, id_col)
            .select(id_col,
                    (F.size(fails) == 0).alias("keep"),
                    F.size(fails).cast("long").alias("n_failed"),
                    F.concat_ws(",", fails).alias("reasons")))


def readability_scores(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease per document:
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/words).

    -> (doc_id, n_sentences, n_words, n_syllables, flesch rounded 6).
    The classic heuristic quality signal (used alongside the Gopher
    shape rules for corpus triage): syllables are approximated as
    maximal vowel-group runs ([aeiouy]+ — the standard cheap estimator,
    counted over the whole text since whitespace breaks every run), and
    sentences as terminal-punctuation runs ([.!?]+), floored at 1 so
    punctuation-free docs are one sentence, not a divide-by-zero. Docs
    with zero words report all-zero counts and flesch 0.0 (the
    mixture_weights defined-degeneracy convention).

    Scale: one narrow projection — two regexp counts + a split size, no
    shuffle, no Python, whole-stage-codegen throughout.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))  # NULL text == empty doc
    n_words = F.when(F.trim(txt) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(txt), r"\s+"))).cast("long")
    n_syll = F.size(F.regexp_extract_all(
        F.lower(txt), F.lit("[aeiouy]+"), F.lit(0))).cast("long")
    n_sent = F.greatest(F.lit(1), F.size(F.regexp_extract_all(
        txt, F.lit("[.!?]+"), F.lit(0)))).cast("long")
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (n_words.cast("double") / n_sent)
              - F.lit(84.6) * (n_syll.cast("double") / n_words))
    return docs.select(
        F.col(id_col),
        F.when(n_words == 0, F.lit(0)).otherwise(n_sent)
        .alias("n_sentences"),
        n_words.alias("n_words"),
        F.when(n_words == 0, F.lit(0)).otherwise(n_syll)
        .alias("n_syllables"),
        F.when(n_words == 0, F.lit(0.0)).otherwise(F.round(flesch, 6))
        .alias("flesch"))


def char_entropy(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document character-distribution statistics -> (doc_id,
    n_chars_total, n_distinct_chars, entropy): Shannon entropy of the
    character histogram in nats.

    The gibberish detector quality_score can't see: base64 blobs,
    minified JS, and key-mash spam have near-uniform character
    distributions (entropy -> ln alphabet), while natural language sits
    in a narrow band (~2.8-3.2 nats for English); both tails are drop
    candidates a production web filter cuts on. Empty/NULL docs are
    DEFINED all-zero (the readability convention).

    Scale shape: characters come from one in-row regexp split
    ((?s). — Java and RE2 agree) + explode, then two partial+final hash
    aggs: (doc, char) counts, then the per-doc reduction via
    H = ln n - sum(c ln c)/n — one pass, no per-char probability
    column. Alphabet size bounds the first agg's post-combine width.
    """
    chars = docs.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col),
                                       F.lit(r"(?s)."), F.lit(0)))
        .alias("ch"))
    hist = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    per_doc = hist.groupBy(id_col).agg(
        F.sum("c").alias("n_chars_total"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(F.log(F.sum("c").cast("double"))
                - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
                / F.sum("c"), 6).alias("entropy"))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_chars_total", F.lit(0))
                    .alias("n_chars_total"),
                    F.coalesce("n_distinct_chars", F.lit(0))
                    .alias("n_distinct_chars"),
                    F.coalesce("entropy", F.lit(0.0)).alias("entropy")))


# ISO-8601 calendar date; the character-class form is the Java-regex /
# RE2 / DuckDB common dialect (same discipline as pii_scrub's patterns)
ISO_DATE_PATTERN = "[0-9]{4}-[0-9]{2}-[0-9]{2}"


def extract_dates(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Temporal-expression extraction -> (doc_id, date_str, month) per
    VALID ISO date mention (invalid calendar strings like 2024-13-40 are
    dropped, leap-day aware via a real date-parse round-trip).

    Timestamped KG assembly needs the WHEN next to the WHO/WHAT: a triple
    observed on a page carrying '2023-07-14' can be interval-stamped
    (feeding the SCD-2 triple-history table) instead of dateless. This is
    the deterministic ISO half of temporal tagging (a production system
    layers natural-language dates on top — e.g. a HeidelTime-style rule
    cascade; those rules are locale data, not new dataflow).

    Validation is TRY-parse semantics: try_to_date round-trips the
    string; a non-date keeps date_str NULL and is filtered — no ANSI-mode
    exception on garbage, identical to DuckDB TRY_CAST(.. AS DATE).
    month = the first 7 chars, the standard rollup key.

    Scale: one regexp_extract_all + posexplode (narrow, zero Python,
    pushdown-eligible upstream); validation is an expression, no join.
    """
    hits = docs.select(
        F.col(id_col),
        F.explode(F.expr(
            f"regexp_extract_all({text_col}, '{ISO_DATE_PATTERN}', 0)"))
        .alias("date_str"))
    return (hits
            .filter(F.try_to_date("date_str", "yyyy-MM-dd").isNotNull())
            .select(id_col, "date_str",
                    F.substring("date_str", 1, 7).alias("month")))


def texttiling(docs: DataFrame, window: int = 10, cutoff: float = 0.1,
               text_col: str = "text", id_col: str = "doc_id"
               ) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst CL 1997): score every
    gap between adjacent fixed-size token blocks by term-vector cosine,
    then mark boundaries at sharp local cohesion minima — the
    passage-splitting stage a web corpus runs BEFORE chunking long pages
    into training/retrieval units, so chunk edges land on topic shifts
    instead of mid-argument (fixed-stride chunking, packing.py:
    chunk_documents, is the downstream consumer).

    Per gap g (between block g and g+1): cosine of the two blocks' term
    count vectors — dot and squared norms are EXACT integer aggregates;
    the cosine is one double expression over them. Depth score is the
    simplified immediate-neighbor form (lag(cos) - cos) + (lead(cos) -
    cos); a boundary needs depth > cutoff AND a strict local minimum.
    Edge gaps (no lag or no lead) are never boundaries — depth is NULL.

    Scale shape: one (doc, block, token) hash agg (map-side combinable),
    one adjacent-block equi-join on (doc, block+1, token) — never a doc-
    level self-join — and one per-doc window over gap-cardinality rows
    (tokens/window per doc, not tokens). All narrow in the doc key, so a
    10^12-page corpus tiles embarrassingly parallel.

    -> (doc_id, gap, cosine 6dp, depth 6dp, boundary) — gap g separates
    blocks g and g+1.
    """
    from pyspark.sql import Window

    toks = tokenize_docs(docs, text_col=text_col)
    blocks = (toks.select(F.col(id_col).alias("doc"),
                          F.floor(F.col("pos") / window).alias("blk"),
                          "token")
              .groupBy("doc", "blk", "token")
              .agg(F.count(F.lit(1)).alias("n")))
    norms = (blocks.groupBy("doc", "blk")
             .agg(F.sum(F.col("n") * F.col("n")).alias("norm2")))
    dots = (blocks.alias("a")
            .join(blocks.alias("b"),
                  (F.col("a.doc") == F.col("b.doc"))
                  & (F.col("b.blk") == F.col("a.blk") + 1)
                  & (F.col("a.token") == F.col("b.token")))
            .groupBy(F.col("a.doc").alias("doc"),
                     F.col("a.blk").alias("gap"))
            .agg(F.sum(F.col("a.n") * F.col("b.n")).alias("dot")))
    gaps = (norms.alias("l")
            .join(norms.alias("r"),
                  (F.col("l.doc") == F.col("r.doc"))
                  & (F.col("r.blk") == F.col("l.blk") + 1))
            .select(F.col("l.doc").alias("doc"),
                    F.col("l.blk").alias("gap"),
                    F.col("l.norm2").alias("nl"),
                    F.col("r.norm2").alias("nr"))
            .join(dots, ["doc", "gap"], "left")
            .select("doc", "gap",
                    (F.coalesce(F.col("dot"), F.lit(0)).cast("double")
                     / F.sqrt(F.col("nl").cast("double")
                              * F.col("nr").cast("double"))).alias("cos")))
    w = Window.partitionBy("doc").orderBy("gap")
    lagc, leadc = F.lag("cos").over(w), F.lead("cos").over(w)
    depth = (lagc - F.col("cos")) + (leadc - F.col("cos"))
    return (gaps.select(
        F.col("doc").alias(id_col),
        F.col("gap").cast("long").alias("gap"),
        # + 0.0 collapses IEEE -0.0 to +0.0 (round keeps the sign bit on
        # tiny negatives; engines disagree on it while agreeing on value)
        (F.round("cos", 6) + F.lit(0.0)).alias("cosine"),
        (F.round(depth, 6) + F.lit(0.0)).alias("depth"),
        (depth.isNotNull() & (depth > cutoff)
         & (F.col("cos") < lagc) & (F.col("cos") < leadc))
        .alias("boundary")))


def rake_keywords(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_words: int = 4,
                  top_k: int = 3) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al., "Automatic Keyword
    Extraction from Individual Documents", 2010): candidate phrases are
    the maximal runs of content words between stopword/punctuation
    delimiters; each word scores deg(w)/freq(w) where freq counts the
    word's phrase occurrences and deg sums the lengths of the phrases
    containing it (co-occurrence degree, self included); a phrase
    scores the sum of its word scores. The graph-free, one-pass cousin
    of graph.textrank — RAKE needs no iteration and no co-occurrence
    join, which is why it is the cheap first-pass keyphrase signal in
    web-scale enrichment (textrank then refines where it matters).

    Candidate construction is a NARROW map (tokenize -> delimiter-mark
    -> rejoin -> split on the markers), so the only shuffles are the
    per-(doc, word) stats agg, the co-partitioned join back to the
    exploded phrase words, the per-(doc, phrase) score agg, and the
    per-doc top-k window — all keyed on doc_id, so AQE coalesces them
    onto one partitioning. Phrase length caps at max_words (Rose's
    own fixed-window practice), bounding deg and the explode fan-out.

    -> (doc_id, phrase, n_words, score 6dp, rank <= top_k); rank ties
    break phrase ASC.
    """
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    toks = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(INFIX_PATTERN), F.lit(0))
    marked = F.transform(
        toks,
        lambda t: F.when(t.rlike("^[0-9a-zA-Z]+$")
                         & ~F.array_contains(stop_arr, t), t)
        .otherwise(F.lit("|")))
    phrases = F.filter(
        F.transform(F.split(F.array_join(marked, " "), r"\|"),
                    lambda p: F.trim(p)),
        lambda p: (p != F.lit(""))
        & (F.size(F.split(p, " ")) <= F.lit(max_words)))
    occ = (docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(phrases).alias("phrase"))
           .withColumn("words", F.split("phrase", " "))
           .withColumn("n_words", F.size("words")))
    # word stats see EVERY phrase occurrence (RAKE's freq/deg are
    # occurrence counts) ...
    words = occ.select("doc_id", "n_words",
                       F.explode("words").alias("word"))
    stats = (words.groupBy("doc_id", "word")
             .agg(F.count(F.lit(1)).alias("freq"),
                  F.sum("n_words").alias("deg")))
    # ... while the output carries one row per DISTINCT phrase; word
    # multiplicity inside a phrase ("big big win") is preserved by
    # re-exploding the distinct phrase's own word array
    uniq = (occ.groupBy("doc_id", "phrase")
            .agg(F.max("n_words").alias("n_words")))
    uniq_words = uniq.select(
        "doc_id", "phrase", "n_words",
        F.explode(F.split("phrase", " ")).alias("word"))
    scored = (uniq_words.join(stats, ["doc_id", "word"])
              .groupBy("doc_id", "phrase")
              .agg(F.max("n_words").alias("n_words"),
                   F.sum(F.col("deg").cast("double")
                         / F.col("freq")).alias("score")))
    from pyspark.sql import Window
    # rank on the ROUNDED score: the raw double is a sum whose term order
    # differs across engines, and an ulp at the boundary would flip ranks
    # that the phrase tie-break should decide (cross-engine contract)
    scored = scored.withColumn("score", F.round("score", 6))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("phrase").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("doc_id", "phrase",
                    F.col("n_words").cast("long").alias("n_words"),
                    "score",
                    F.col("rank").cast("long").alias("rank")))


def burrows_delta(tokens: DataFrame, part_col: str,
                  token_col: str = "token",
                  top_m: int = 30) -> DataFrame:
    """Burrows' Delta stylometric distinctiveness (Burrows, LLC 2002;
    Argamon 2008 for the z-score formulation): for each part
    (source/host/author), the mean absolute z-score of its relative
    frequencies of the corpus' ``top_m`` most frequent tokens, where
    z is standardized ACROSS parts per token — THE authorship /
    style-fingerprint statistic, here pointed at hosts: a spam farm
    or machine-translated mirror sits far from the corpus norm on
    exactly the high-frequency function words Delta measures, while
    topical drift (which keyness flags) barely moves them.

        f_{p,m} = c_{p,m} / len(p)            (relative frequency)
        z_{p,m} = (f_{p,m} - mu_m) / sd_m     (across parts; sd_samp)
        Delta_p = mean_m |z_{p,m}|

    Parts missing a token count f = 0 — the (part x top_m) grid is
    materialized EXPLICITLY (it is tiny: |parts| * top_m), because
    skipping zeros silently biases mu/sd. sd_m = 0 (a token perfectly
    even across parts) contributes z = 0 by convention. Top-m
    selection is deterministic (corpus freq DESC, token ASC).

    Scale shape: one (part, token) hash agg is the only corpus-sized
    exchange; the top-m window runs on the |vocab|-row corpus freq
    table (TakeOrderedAndProject shape); the grid, the per-token
    mu/sd agg, and the final per-part mean all run on |parts| * top_m
    rows. No Python.

    -> (part, part_tokens, delta 6dp) — one row per part.
    """
    pt = (tokens.groupBy(part_col, token_col)
          .agg(F.count(F.lit(1)).alias("c")))
    plen = pt.groupBy(part_col).agg(F.sum("c").alias("plen"))
    corpus = (pt.groupBy(token_col).agg(F.sum("c").alias("cf")))
    wtop = Window.orderBy(F.col("cf").desc(), F.col(token_col).asc())
    top = (corpus.select(token_col,
                         F.row_number().over(wtop).alias("rk"))
           .filter(F.col("rk") <= top_m)
           .select(token_col))
    grid = plen.crossJoin(F.broadcast(top))
    f = (grid.join(pt, [part_col, token_col], "left")
         .select(part_col, token_col, "plen",
                 (F.coalesce(F.col("c"), F.lit(0)) / F.col("plen"))
                 .alias("f")))
    stats = (f.groupBy(token_col)
             .agg(F.avg("f").alias("mu"),
                  F.stddev_samp("f").alias("sd")))
    z = (f.join(F.broadcast(stats), token_col)
         .select(part_col, "plen",
                 F.when(F.col("sd") > 0,
                        F.abs((F.col("f") - F.col("mu")) / F.col("sd")))
                 .otherwise(F.lit(0.0)).alias("az")))
    return (z.groupBy(part_col)
            .agg(F.max("plen").cast("long").alias("part_tokens"),
                 F.round(F.avg("az"), 6).alias("delta")))


# Classic double-decode artifacts (the ftfy heuristic family, Speer
# 2019), written as escapes so the source stays ASCII-auditable:
#   \u00c3 'A-tilde'  — UTF-8 lead byte re-decoded as Latin-1
#   \u00e2\u20ac     — smart-quote family double-decode prefix
#   \u00c2            — NBSP / C1 double-decode
#   \u00ef\u00bb\u00bf — UTF-8 BOM bytes decoded as Latin-1
#   \ufffd            — replacement character (lossy decode happened)
MOJIBAKE_MARKERS = ["\u00c3", "\u00e2\u20ac", "\u00c2",
                    "\u00ef\u00bb\u00bf", "\ufffd"]


def mojibake_audit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mojibake / encoding-damage audit (ftfy heuristics, Speer 2019):
    count the classic double-decode artifacts — UTF-8 bytes re-decoded
    as Latin-1, BOM-as-text, and U+FFFD replacement characters marking
    lossy decodes — the crawl-QA gate that catches a mis-declared
    charset BEFORE damaged text pollutes tokenization, dedup shingles,
    and KG surface forms (sterilize normalizes whitespace; it cannot
    repair bytes, so detection must happen here).

    One row per marker, ALWAYS emitted (zeros are the healthy signal
    an audit wants on record). Occurrences counted by length
    difference — pure codegen, no regex, no Python.

    Scale shape: one scan, one 5-key agg (map-side combine to <= 5
    rows per partition). The marker list is a code constant — no join.

    -> (marker, n_docs_affected, n_occurrences), one row per marker.
    """
    t = F.col(text_col)
    legs = []
    for m in MOJIBAKE_MARKERS:
        occ = ((F.length(t)
                - F.length(F.replace(t, F.lit(m), F.lit(""))))
               / len(m)).cast("long")
        legs.append(F.struct(F.lit(m).alias("marker"), occ.alias("occ")))
    exploded = (docs.select(F.explode(F.array(*legs)).alias("s"))
                .select(F.col("s.marker").alias("marker"),
                        F.col("s.occ").alias("occ")))
    return (exploded.groupBy("marker")
            .agg(F.sum((F.col("occ") > 0).cast("long"))
                 .cast("long").alias("n_docs_affected"),
                 F.sum("occ").cast("long").alias("n_occurrences")))


#: Unicode script ranges (BMP, explicit \\x{...} classes — the syntax
#: both Java regex and RE2 accept, so the oracle pattern is identical
#: byte-for-byte). Order = deterministic dominant-script tie priority.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-z\\x{00C0}-\\x{024F}"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("cjk", "\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}"),
    ("arabic", "\\x{0600}-\\x{06FF}"),
    ("hangul", "\\x{AC00}-\\x{D7AF}"),
]


def script_profile(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Unicode script census per document (the writing-SYSTEM axis
    orthogonal to language ID: lang_id/ct_lang separate en from de but
    both are Latin; this separates Latin from Cyrillic/CJK/Arabic —
    the first gate of multilingual curation, the mixed-script spoofing
    smell, and the router for script-specific tokenizers): count
    letters per script over six BMP ranges, name the dominant script
    (ties -> SCRIPT_RANGES order) and its share of all letters.

    Counting: length(text) - length(regexp_replace(text, [class], ''))
    — pure narrow codegen regexp, zero joins, zero shuffles, zero
    Python; counts are code points (both engines' length() semantics
    on BMP text).

    -> (doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
    n_hangul, script, share 6dp); script = 'none' / share = 0.0 for
    letterless documents.
    """
    text = F.col(text_col)
    counts = {
        name: (F.length(text)
               - F.length(F.regexp_replace(
                   text, f"[{cls}]", ""))).cast("long")
        for name, cls in SCRIPT_RANGES}
    cols = [counts[n].alias(f"n_{n}") for n, _ in SCRIPT_RANGES]
    base = docs.select(F.col(id_col), *cols)
    mx = F.greatest(*[F.col(f"n_{n}") for n, _ in SCRIPT_RANGES])
    total = None
    for n, _ in SCRIPT_RANGES:
        total = F.col(f"n_{n}") if total is None \
            else total + F.col(f"n_{n}")
    dom = F.lit("none")
    for n, _ in reversed(SCRIPT_RANGES):
        dom = F.when((F.col(f"n_{n}") == mx) & (mx > 0), n) \
            .otherwise(dom)
    return base.select(
        id_col, *[f"n_{n}" for n, _ in SCRIPT_RANGES],
        dom.alias("script"),
        F.when(total > 0, F.round(mx / total.cast("double"), 6))
        .otherwise(F.lit(0.0)).alias("share"))


def self_bleu(docs: DataFrame, pattern: str, max_n: int = 4,
              text_col: str = "text", id_col: str = "doc_id"
              ) -> DataFrame:
    """Self-BLEU corpus-diversity audit (Zhu et al. 2018,
    arXiv:1802.01886 "Texygen": BLEU of each document against the REST
    of the corpus as references; Papineni et al. 2002 BLEU arithmetic):
    high self-BLEU = template/near-duplicate saturation — the
    distributional redundancy axis the exact/MinHash dedup ops don't
    see (they catch copies; this catches a corpus that is one big
    paraphrase of itself). Per doc:

        p_n  = clipped n-gram matches / doc n-grams   (n = 1..max_n)
        BP   = 1 if c >= r else exp(1 - r/c)  (closest ref length,
                ties -> shorter, per the original BLEU convention)
        BLEU = BP * exp(mean_n ln p_n), 0 if any p_n = 0

    Clipping is against the MAX count of the gram in any single OTHER
    document (the BLEU multi-reference rule): per (n, gram) the top-2
    per-doc counts (ties -> smaller doc id first) give every doc its
    reference ceiling in one pass — the n-gram tables are built ONCE,
    never per (candidate, reference) pair, so the plan is linear in
    corpus gram volume instead of quadratic in documents.

    Scale shape: gram explosion is a narrow transform/slice map; the
    top-2 rank is ONE (n, gram)-keyed window (WindowGroupLimit-
    prunable); clip + precision are one join + two aggs; the
    brevity-penalty reference length joins the doc table against the
    BROADCAST distinct-length histogram. Gram-keyed shuffles hash well
    (no hot keys beyond stopword unigrams — absorbed by partial aggs).

    -> (doc_id, n_tokens, ref_len, p1..p{max_n} 6dp, bp 6dp,
    self_bleu 6dp).
    """
    arr = F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
    base = (docs.select(F.col(id_col), arr.alias("arr"))
            .select(id_col, "arr", F.size("arr").alias("n_tokens"))
            .filter(F.col("n_tokens") >= 1)
            .localCheckpoint(eager=True))
    # n length-guarded slices zipped into structs, joined AFTER the
    # explode inside codegen — no lambda, so the gram build stays off
    # the interpreted HOF path (r6; same strings as the former
    # per-position transform/array_join/slice form)
    gram_legs = []
    for n in range(1, max_n + 1):
        ln = F.greatest(F.col("n_tokens") - F.lit(n - 1), F.lit(0))
        zipped = F.arrays_zip(*[
            F.slice(F.col("arr"), j + 1, ln).alias(f"w{j}")
            for j in range(n)])
        gram_legs.append(
            base.filter(F.col("n_tokens") >= n)
            .select(id_col, F.lit(n).alias("n"),
                    F.explode(zipped).alias("g"))
            .select(id_col, "n", F.concat_ws(
                " ", *[f"g.w{j}" for j in range(n)]).alias("gram")))
    gram_rows = gram_legs[0]
    for leg in gram_legs[1:]:
        gram_rows = gram_rows.unionByName(leg)
    counts = (gram_rows.groupBy("n", "gram", id_col)
              .agg(F.count(F.lit(1)).alias("c"))
              .localCheckpoint(eager=True))
    w = Window.partitionBy("n", "gram").orderBy(
        F.col("c").desc(), F.col(id_col).asc())
    top2 = (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .groupBy("n", "gram")
            .agg(F.max(F.when(F.col("rn") == 1, F.col(id_col)))
                 .alias("d1"),
                 F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("m1"),
                 F.max(F.when(F.col("rn") == 2, F.col("c")))
                 .alias("m2")))
    ref_max = F.when(F.col(id_col) != F.col("d1"), F.col("m1")) \
        .otherwise(F.coalesce("m2", F.lit(0)))
    prec = (counts.join(top2, ["n", "gram"])
            .groupBy(id_col, "n")
            .agg((F.sum(F.least(F.col("c"), ref_max))
                  / F.sum("c").cast("double")).alias("p")))
    # closest OTHER-doc length for the brevity penalty
    lens = base.select(id_col, "n_tokens")
    hist = (lens.groupBy(F.col("n_tokens").alias("rl"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    rlen = (lens.crossJoin(F.broadcast(hist))
            .filter((F.col("cnt") > 1)
                    | (F.col("rl") != F.col("n_tokens")))
            .groupBy(id_col)
            .agg(F.min(F.struct(
                F.abs(F.col("rl") - F.col("n_tokens")).alias("diff"),
                F.col("rl").alias("rl"))).alias("m"))
            .select(id_col, F.col("m.rl").alias("ref_len")))
    pw = prec.groupBy(id_col).agg(
        F.min("p").alias("pmin"),
        (F.sum(F.ln(F.when(F.col("p") > 0, F.col("p"))
                    .otherwise(F.lit(1.0)))) / F.lit(float(max_n)))
        .alias("logmean"),
        *[F.round(F.max(F.when(F.col("n") == n, F.col("p"))), 6)
          .alias(f"p{n}") for n in range(1, max_n + 1)])
    bp = F.when(F.col("n_tokens") >= F.col("ref_len"), F.lit(1.0)) \
        .otherwise(F.exp(F.lit(1.0) - F.col("ref_len")
                         / F.col("n_tokens").cast("double")))
    return (lens.join(rlen, id_col).join(pw, id_col)
            .select(id_col, "n_tokens", "ref_len",
                    *[f"p{n}" for n in range(1, max_n + 1)],
                    F.round(bp, 6).alias("bp"),
                    F.round(F.when(F.col("pmin") > 0,
                                   bp * F.exp(F.col("logmean")))
                            .otherwise(F.lit(0.0)), 6)
                    .alias("self_bleu")))


def luhn_abstract(docs: DataFrame, pattern: str, top_sentences: int = 2,
                  sig_min_freq: int = 2, gap: int = 4,
                  stopwords: list[str] | None = None,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> DataFrame:
    """Luhn auto-abstract (Luhn, IBM Journal 1958 "The Automatic
    Creation of Literature Abstracts" — the original extractive
    summarizer, still the standard cheap snippet generator next to
    textrank_keywords' graph ranking): significant words are the
    document's frequent non-stopword tokens (doc frequency >=
    sig_min_freq); each sentence is scored by its best CLUSTER of
    significant words — a maximal run where consecutive significant
    words are <= ``gap`` insignificant words apart — with Luhn's
    score n_sig^2 / span; the top_sentences highest-scoring sentences
    (ties -> document order) form the abstract.

    Scale shape: the rule-based sentence splitter (narrow map +
    explode), one (doc, token) frequency agg for significance
    (broadcast stopword anti-join), then per-sentence clustering as
    ONE lag window + running-sum window + one agg — all keyed on
    (doc, sentence), co-partitioned; final selection is a per-doc
    rank window. No Python, no joins beyond the broadcast
    significance table.

    -> (doc_id, sent_idx, rank, n_sig, score 6dp, sentence).
    """
    from pyspark.sql import Window
    from saber_spark.operators.vocab import split_sentences
    stops = sorted(set(stopwords if stopwords is not None
                       else EN_STOPWORDS))
    sents = split_sentences(docs, text_col=text_col, id_col=id_col) \
        .localCheckpoint(eager=True)
    toks = (sents.select(id_col, "sent_idx",
                         F.posexplode(F.regexp_extract_all(
                             "sentence", F.lit(pattern), F.lit(0)))
                         .alias("pos", "token")))
    freq = (toks.groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).alias("c")))
    stop_df = toks.sparkSession.createDataFrame(
        [(w,) for w in stops], "token string")
    sig = (freq.filter(F.col("c") >= sig_min_freq)
           .join(F.broadcast(stop_df), "token", "left_anti")
           .select(id_col, "token"))
    sig_pos = toks.join(sig, [id_col, "token"])
    w_lag = Window.partitionBy(id_col, "sent_idx").orderBy("pos")
    clustered = (sig_pos
                 .withColumn("prev", F.lag("pos").over(w_lag))
                 .withColumn("brk", F.when(
                     F.col("prev").isNull()
                     | (F.col("pos") - F.col("prev") > gap + 1),
                     F.lit(1)).otherwise(F.lit(0)))
                 .withColumn("cl", F.sum("brk").over(
                     w_lag.rowsBetween(Window.unboundedPreceding, 0))))
    cluster_scores = (clustered
                      .groupBy(id_col, "sent_idx", "cl")
                      .agg(F.count(F.lit(1)).alias("n_sig"),
                           (F.max("pos") - F.min("pos") + 1)
                           .alias("span"))
                      .select(id_col, "sent_idx", "n_sig",
                              (F.col("n_sig") * F.col("n_sig")
                               / F.col("span").cast("double"))
                              .alias("cs")))
    sent_scores = (cluster_scores
                   .groupBy(id_col, "sent_idx")
                   .agg(F.max(F.struct(F.col("cs"), F.col("n_sig")))
                        .alias("m"))
                   .select(id_col, "sent_idx",
                           F.col("m.n_sig").alias("n_sig"),
                           F.col("m.cs").alias("score")))
    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("sent_idx").asc())
    return (sents.join(sent_scores, [id_col, "sent_idx"])
            .withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= top_sentences)
            .select(id_col, "sent_idx", "rank", "n_sig",
                    F.round("score", 6).alias("score"), "sentence"))
