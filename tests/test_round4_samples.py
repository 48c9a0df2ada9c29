"""Round-4 batch 2: span corruption, skip-gram pairs, skew profile,
FD audit, char entropy — brute-force parity + edge cases."""

import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from saber_spark.operators.splits import HASH_MOD, KNUTH


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _masked(doc_id: int, block: int, denom: int = 7) -> bool:
    return ((doc_id * KNUTH) % HASH_MOD * 31 + block) % HASH_MOD % denom == 0


def _corrupt_brute(doc_id, toks, span_len=3):
    blocks = sorted({p // span_len for p, _ in enumerate(toks)
                     if _masked(doc_id, p // span_len)})
    sentinel = {b: f"<extra_id_{k}>" for k, b in enumerate(blocks)}
    inp, tgt, n_masked = [], [], 0
    for p, t in enumerate(toks):
        b = p // span_len
        if b in sentinel:
            n_masked += 1
            if p == min(q for q in range(len(toks)) if q // span_len == b):
                inp.append(sentinel[b])
        else:
            inp.append(t)
    for b in blocks:
        tgt.append(sentinel[b])
        tgt.extend(t for p, t in enumerate(toks) if p // span_len == b)
    return (len(toks), n_masked, " ".join(inp), " ".join(tgt))


class TestSpanCorruption:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.samples import span_corruption
        rng = random.Random(21)
        vocab = list("abcdefgh")
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(1, 30))]
                for i in range(60)}
        rows = [(i, p, t) for i, ts in docs.items()
                for p, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        got = {r.doc_id: (r.n_tokens, r.n_masked, r.input_text,
                          r.target_text)
               for r in span_corruption(df).collect()}
        want = {i: _corrupt_brute(i, ts) for i, ts in docs.items()}
        assert got == want
        # at least one doc should actually be masked at denom=7 over 60 docs
        assert any(v[1] > 0 for v in want.values())

    def test_unmasked_doc_keeps_text_and_empty_target(self, spark):
        from saber_spark.operators.samples import span_corruption
        doc_id = next(i for i in range(1000)
                      if not _masked(i, 0) and not _masked(i, 1))
        rows = [(doc_id, p, t) for p, t in enumerate("u v w x y z".split())]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        r = span_corruption(df).collect()[0]
        assert (r.n_masked, r.input_text, r.target_text) == \
            (0, "u v w x y z", "")

    def test_fully_masked_doc(self, spark):
        from saber_spark.operators.samples import span_corruption
        doc_id = next(i for i in range(1000) if _masked(i, 0))
        rows = [(doc_id, 0, "a"), (doc_id, 1, "b"), (doc_id, 2, "c")]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        r = span_corruption(df).collect()[0]
        assert (r.n_masked, r.input_text, r.target_text) == \
            (3, "<extra_id_0>", "<extra_id_0> a b c")


class TestSkipgramPairs:
    def test_positives_match_bruteforce_and_negatives_counted(self, spark):
        from saber_spark.operators.samples import skipgram_pairs
        rng = random.Random(2)
        vocab = list("pqrstu")
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(0, 10))]
                for i in range(20)}
        rows = [(i, p, t) for i, ts in docs.items()
                for p, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        out = skipgram_pairs(df, window=2, neg_k=2).collect()
        pos = Counter((r.doc_id, r.pos, r.center, r.context)
                      for r in out if r.label == 1)
        want = Counter()
        for i, ts in docs.items():
            for p, t in enumerate(ts):
                for d in (1, 2):
                    if p + d < len(ts):
                        want[(i, p, t, ts[p + d])] += 1
                        want[(i, p + d, ts[p + d], t)] += 1
        assert pos == want
        negs = [r for r in out if r.label == 0]
        assert len(negs) == 2 * sum(want.values())
        corpus_vocab = {t for ts in docs.values() for t in ts}
        assert all(r.context in corpus_vocab for r in negs)

    def test_deterministic_across_runs(self, spark):
        from saber_spark.operators.samples import skipgram_pairs
        df = spark.createDataFrame(
            [(1, p, t) for p, t in enumerate("a b c d e".split())],
            "doc_id long, pos int, token string")
        a = sorted(map(tuple, skipgram_pairs(df).collect()))
        b = sorted(map(tuple, skipgram_pairs(df).collect()))
        assert a == b and len(a) > 0


class TestSkewProfile:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.profile import skew_profile
        rng = random.Random(4)
        keys = [f"k{min(rng.randrange(1, 8), rng.randrange(1, 8))}"
                for _ in range(500)]
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        r = skew_profile(df, "key").collect()[0]
        c = Counter(keys)
        n = len(keys)
        top = max(c.items(), key=lambda kv: (kv[1], kv[0]))
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        assert (r.n_rows, r.n_keys, r.top_key, r.max_count) == \
            (n, len(c), top[0], top[1])
        assert r.max_share == _r6(top[1] / n)
        assert r.skew_factor == _r6(top[1] * len(c) / n)
        assert r.entropy == _r6(h)

    def test_uniform_keys(self, spark):
        from saber_spark.operators.profile import skew_profile
        df = spark.createDataFrame(
            [(f"k{i % 4}",) for i in range(40)], "key string")
        r = skew_profile(df, "key").collect()[0]
        assert r.skew_factor == 1.0
        assert r.entropy == _r6(math.log(4))

    def test_null_keys_are_counted(self, spark):
        from saber_spark.operators.profile import skew_profile
        df = spark.createDataFrame([("a",), (None,), (None,)], "key string")
        r = skew_profile(df, "key").collect()[0]
        assert r.n_keys == 2 and r.max_count == 2


class TestFdViolations:
    def test_holds_and_violations(self, spark):
        from saber_spark.operators.profile import fd_violations
        df = spark.createDataFrame(
            [("a", "x"), ("a", "x"), ("b", "y"), ("b", "z"), ("b", "z"),
             ("c", "x")],
            "lhs string, rhs string")
        got = {r.lhs: (r.n_distinct_rhs, r.n_rows)
               for r in fd_violations(df, "lhs", "rhs").collect()}
        assert got == {"b": (2, 3)}
        clean = df.filter("lhs <> 'b'")
        assert fd_violations(clean, "lhs", "rhs").count() == 0


class TestCharEntropy:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.textstats import char_entropy
        texts = {1: "aaaa", 2: "abab", 3: "abcd", 4: "", 5: None,
                 6: "hello world"}
        df = spark.createDataFrame(list(texts.items()),
                                   "doc_id long, text string")
        got = {r.doc_id: (r.n_chars_total, r.n_distinct_chars, r.entropy)
               for r in char_entropy(df).collect()}
        for i, t in texts.items():
            if not t:
                assert got[i] == (0, 0, 0.0)
                continue
            c = Counter(t)
            n = len(t)
            h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
            assert got[i] == (n, len(c), _r6(h))
        assert got[1][2] == 0.0          # single-char text: zero entropy
        assert got[3][2] == _r6(math.log(4))  # uniform: ln(alphabet)


class TestRound4Properties:
    def test_auc_invariant_under_monotone_transform(self, spark):
        """AUC depends only on the score ORDER — exp() of the scores must
        give the identical result (rank statistics property)."""
        from pyspark.sql import functions as F

        from saber_spark.operators.evaluation import roc_auc
        rng = random.Random(17)
        rows = [("g", rng.random() < 0.5, rng.uniform(-3, 3))
                for _ in range(200)]
        df = spark.createDataFrame(rows, "grp string, y boolean, s double")
        base = roc_auc(df, "y", "s", "grp").collect()[0]
        trans = roc_auc(df.withColumn("s", F.exp("s")),
                        "y", "s", "grp").collect()[0]
        assert (base.n_pos, base.n_neg, base.auc) == \
            (trans.n_pos, trans.n_neg, trans.auc)

    def test_kappa_symmetric_in_raters(self, spark):
        from saber_spark.operators.evaluation import cohens_kappa
        rng = random.Random(19)
        pairs = [(rng.choice("abc"), rng.choice("ab")) for _ in range(150)]
        df = spark.createDataFrame(pairs, "ra string, rb string")
        ab = cohens_kappa(df, "ra", "rb").collect()[0]
        ba = cohens_kappa(df, "rb", "ra").collect()[0]
        assert (ab.n, ab.n_agree, ab.po, ab.pe, ab.kappa) == \
            (ba.n, ba.n_agree, ba.po, ba.pe, ba.kappa)

    def test_span_corruption_roundtrip_reconstructs_original(self, spark):
        """Interleaving input_text and target_text on the sentinels must
        reconstruct the original token stream exactly — the property that
        makes (input, target) a lossless denoising pair."""
        from saber_spark.operators.samples import span_corruption
        rng = random.Random(23)
        vocab = list("abcdefgh")
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(1, 40))]
                for i in range(80)}
        rows = [(i, p, t) for i, ts in docs.items()
                for p, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        for r in span_corruption(df).collect():
            spans = {}
            cur = None
            for tok in r.target_text.split():
                if tok.startswith("<extra_id_"):
                    cur = tok
                    spans[cur] = []
                else:
                    spans[cur].append(tok)
            rebuilt = []
            for tok in r.input_text.split():
                if tok.startswith("<extra_id_"):
                    rebuilt.extend(spans[tok])
                else:
                    rebuilt.append(tok)
            assert rebuilt == docs[r.doc_id], r.doc_id


class TestAbbrevAliases:
    def _run(self, spark, rows):
        from saber_spark.operators.linking import abbrev_aliases
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {(r.abbr, r.long_form): r.n_docs
                for r in abbrev_aliases(df).collect()}

    def test_accepts_only_initial_matches(self, spark):
        got = self._run(spark, [
            (1, "the World Health Organization (WHO) said"),
            (2, "a Big Fish (BF) swam"),
            (3, "not matching words (XYZ) here"),
            (4, "too few (ABCDE) words"),
        ])
        assert got == {("WHO", "world health organization"): 1,
                       ("BF", "big fish"): 1}

    def test_counts_distinct_docs_and_multiple_sites(self, spark):
        got = self._run(spark, [
            (1, "knowledge graph (KG) and knowledge graph (KG) again"),
            (2, "a knowledge graph (KG) too"),
            (3, "machine learning (ML) here"),
        ])
        assert got == {("KG", "knowledge graph"): 2,
                       ("ML", "machine learning"): 1}

    def test_window_takes_last_n_words(self, spark):
        # 4 words precede the paren; only the last two must be used
        got = self._run(spark, [(1, "we like Entity Linking (EL) a lot")])
        assert got == {("EL", "entity linking"): 1}

    def test_single_letter_abbrs_rejected_by_pattern(self, spark):
        assert self._run(spark, [(1, "alpha (A) beta")]) == {}


class TestKgeNegatives:
    def test_structure_and_filtering(self, spark):
        from saber_spark.operators.samples import kge_negatives
        pos = [("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c"),
               ("c", "r", "d")]
        df = spark.createDataFrame(pos, "subj string, pred string, obj string")
        out = kge_negatives(df, neg_k=3).collect()
        got_pos = {(r.subj, r.pred, r.obj) for r in out if r.label == 1}
        assert got_pos == set(pos)
        negs = [(r.subj, r.pred, r.obj) for r in out if r.label == 0]
        # filtered setting: no negative may be a true triple
        assert not set(negs) & set(pos)
        # each negative shares exactly one endpoint column with a positive
        ents = {e for t in pos for e in (t[0], t[2])}
        for s, p, o in negs:
            assert p == "r" and s in ents and o in ents
        assert 0 < len(negs) <= 3 * len(pos)

    def test_deterministic(self, spark):
        from saber_spark.operators.samples import kge_negatives
        df = spark.createDataFrame(
            [("x", "p", "y"), ("y", "p", "z")],
            "subj string, pred string, obj string")
        a = sorted(map(tuple, kge_negatives(df).collect()))
        b = sorted(map(tuple, kge_negatives(df).collect()))
        assert a == b


class TestEntityCentroids:
    def test_matches_bruteforce_and_votes_once_per_doc(self, spark):
        from saber_spark.operators.classify import entity_centroids
        linked = spark.createDataFrame(
            # entity E1 mentioned TWICE in doc 0 (must vote once)
            [(0, "E1"), (0, "E1"), (1, "E1"), (1, "E2")],
            "doc_id long, canonical_id string")
        emb = spark.createDataFrame(
            [(0, [0.1, -0.2]), (1, [0.3, 0.4])],
            "vec_id long, embedding array<float>")
        got = {(r.canonical_id, r.dim): (r.csum, r.n_docs)
               for r in entity_centroids(linked, emb).collect()}
        # quantized: doc0 -> [100, -200], doc1 -> [300, 400]
        assert got == {
            ("E1", 0): (400, 2), ("E1", 1): (200, 2),
            ("E2", 0): (300, 1), ("E2", 1): (400, 1),
        }

    def test_mergeable_across_shards(self, spark):
        """Sums from two disjoint doc shards must add to the full-corpus
        sums — the property that makes the table incrementally
        maintainable."""
        from saber_spark.operators.classify import entity_centroids
        linked = spark.createDataFrame(
            [(i, "E") for i in range(6)], "doc_id long, canonical_id string")
        emb = spark.createDataFrame(
            [(i, [float(i)]) for i in range(6)],
            "vec_id long, embedding array<float>")
        full = {(r.dim): r.csum
                for r in entity_centroids(linked, emb).collect()}
        parts = []
        for pred in ("doc_id < 3", "doc_id >= 3"):
            parts.append({r.dim: r.csum for r in entity_centroids(
                linked.filter(pred), emb).collect()})
        assert full == {d: parts[0].get(d, 0) + parts[1].get(d, 0)
                        for d in full}


class TestChunkDocuments:
    @staticmethod
    def _brute(toks, w, s):
        out = {}
        n = len(toks)
        k = 0
        while k * s < n:
            seg = toks[k * s:k * s + w]
            out[k] = (k * s, len(seg), " ".join(seg))
            k += 1
        return out

    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.packing import chunk_documents
        rng = random.Random(53)
        docs = {i: [f"t{rng.randrange(20)}"
                    for _ in range(rng.randrange(1, 30))]
                for i in range(40)}
        rows = [(i, p, t) for i, ts in docs.items()
                for p, t in enumerate(ts)]
        df = spark.createDataFrame(rows, "doc_id long, pos int, token string")
        got = {}
        for r in chunk_documents(df, window=8, stride=4).collect():
            got.setdefault(r.doc_id, {})[r.chunk_id] = \
                (r.chunk_start, r.n_tokens, r.chunk_text)
        want = {i: self._brute(ts, 8, 4) for i, ts in docs.items()}
        assert got == want

    def test_every_window_span_is_intact_somewhere(self, spark):
        """The overlap guarantee: any span of <= stride+1 consecutive
        tokens appears UNCUT in at least one chunk."""
        from saber_spark.operators.packing import chunk_documents
        toks = [f"w{i}" for i in range(20)]
        df = spark.createDataFrame(
            [(1, p, t) for p, t in enumerate(toks)],
            "doc_id long, pos int, token string")
        chunks = [r.chunk_text for r in
                  chunk_documents(df, window=8, stride=4).collect()]
        for start in range(0, 20 - 4):
            span = " ".join(toks[start:start + 5])
            assert any(span in c for c in chunks), span

    def test_short_doc_single_chunk_and_bad_params(self, spark):
        import pytest as _pytest

        from saber_spark.operators.packing import chunk_documents
        df = spark.createDataFrame(
            [(1, p, t) for p, t in enumerate("a b c".split())],
            "doc_id long, pos int, token string")
        rows = chunk_documents(df, window=8, stride=4).collect()
        assert len(rows) == 1 and rows[0].chunk_text == "a b c"
        with _pytest.raises(ValueError):
            chunk_documents(df, window=4, stride=5)
