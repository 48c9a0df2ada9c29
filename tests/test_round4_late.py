"""Round-4 batch 7: Naive Bayes classifier, Bloom decontamination,
host mirrors, metapath counts, grouped split, N-Triples export —
brute-force parity + edge cases."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --------------------------------------------------------------- Naive Bayes


def _nb_brute(train, test, add_k=0.5):
    """train/test: {doc_id: (label, [tokens])} -> {doc_id: pred}."""
    c_wt = Counter()
    c_l = Counter()
    n_docs = Counter()
    vocab = set()
    for _, (lab, toks) in train.items():
        n_docs[lab] += 1
        for t in toks:
            c_wt[(lab, t)] += 1
            c_l[lab] += 1
            vocab.add(t)
    n = len(train)
    v = max(len(vocab), 1)
    preds = {}
    for d, (_, toks) in test.items():
        best = None
        for lab in sorted(n_docs):
            s = math.log(n_docs[lab] / n)
            for t in toks:
                s += math.log((c_wt[(lab, t)] + add_k)
                              / (c_l[lab] + add_k * v))
            s = round(s, 6)
            if best is None or s > best[0]:
                best = (s, lab)
        preds[d] = best[1]
    return preds


class TestNaiveBayes:
    def _fit_predict(self, spark, train, test, add_k=0.5):
        from saber_spark.operators.classify import nb_fit, nb_predict
        tok_rows = [(d, t) for d, (_, ts) in train.items() for t in ts]
        lab_rows = [(d, lab) for d, (lab, _) in train.items()]
        toks = spark.createDataFrame(tok_rows, "doc_id long, token string")
        labs = spark.createDataFrame(lab_rows, "doc_id long, label string")
        model, stats, sizes = nb_fit(toks, labs)
        test_rows = [(d, t) for d, (_, ts) in test.items() for t in ts]
        test_df = spark.createDataFrame(test_rows,
                                        "doc_id long, token string")
        return {r.doc_id: r.pred_label
                for r in nb_predict(test_df, model, stats, sizes,
                                    add_k).collect()}

    def test_matches_bruteforce(self, spark):
        import random
        rng = random.Random(11)
        vocabs = {"A": list("abcdefmn"), "B": list("mnopqrst")}
        train = {}
        for i in range(40):
            lab = "A" if i % 2 else "B"
            train[i] = (lab, [rng.choice(vocabs[lab])
                              for _ in range(rng.randrange(3, 15))])
        test = {}
        for i in range(100, 130):
            lab = "A" if i % 2 else "B"
            # mixed bags incl. out-of-vocab tokens
            pool = vocabs[lab] + ["zz", "yy"]
            test[i] = (lab, [rng.choice(pool)
                             for _ in range(rng.randrange(1, 12))])
        got = self._fit_predict(spark, train, test)
        assert got == _nb_brute(train, test)

    def test_separates_distinct_vocabularies(self, spark):
        train = {i: ("spam", ["buy", "now", "cheap"]) for i in range(5)}
        train.update({i: ("ham", ["meeting", "agenda", "notes"])
                      for i in range(5, 10)})
        test = {20: ("spam", ["cheap", "buy"]),
                21: ("ham", ["agenda", "meeting", "notes"])}
        got = self._fit_predict(spark, train, test)
        assert got == {20: "spam", 21: "ham"}

    def test_unseen_tokens_fall_back_to_prior(self, spark):
        # doc of only unseen tokens, equal token mass per class ->
        # prior decides (B has 2x the docs)
        train = {0: ("A", ["x", "x"]), 1: ("B", ["y"]), 2: ("B", ["y"])}
        test = {9: (None, ["unseen1", "unseen2"])}
        got = self._fit_predict(spark, train, test)
        assert got == {9: "B"}

    def test_confusion_counts(self, spark):
        from saber_spark.operators.classify import nb_confusion
        from saber_spark.operators.splits import HASH_MOD, KNUTH
        import random
        rng = random.Random(7)
        vocabs = {"A": list("abcd"), "B": list("wxyz")}
        docs = {i: ("A" if i % 3 else "B", None) for i in range(60)}
        docs = {i: (lab, [rng.choice(vocabs[lab])
                          for _ in range(8)])
                for i, (lab, _) in docs.items()}
        tok_rows = [(d, p, t) for d, (_, ts) in docs.items()
                    for p, t in enumerate(ts)]
        toks = spark.createDataFrame(tok_rows,
                                     "doc_id long, pos int, token string")
        labs = spark.createDataFrame(
            [(d, lab) for d, (lab, _) in docs.items()],
            "doc_id long, label string")
        conf = {(r.true_label, r.pred_label): r.n_docs
                for r in nb_confusion(toks, labs).collect()}
        test_ids = [d for d in docs
                    if ((d * KNUTH) % HASH_MOD) % 2 == 0]
        # disjoint vocabularies -> the diagonal holds every test doc
        assert sum(conf.values()) == len(test_ids)
        assert all(t == p for t, p in conf)


# ------------------------------------------------------- Bloom decontaminate


def _bloom_bits_brute(gram: str, m: int, k: int) -> list[int]:
    return [_md5_32(f"{d}:{gram}") % m for d in range(k)]


def _shingles(text: str, n: int) -> set[str]:
    toks = re.findall(r"\S+", text)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


class TestBloomDecontaminate:
    def _run(self, spark, corpus, eval_docs, n=3, m=512, k=3):
        from saber_spark.operators.sketch import bloom_decontaminate
        docs = spark.createDataFrame(list(corpus.items()),
                                     "doc_id long, text string")
        ev = spark.createDataFrame(list(eval_docs.items()),
                                   "doc_id long, text string")
        return {r.doc_id: r for r in
                bloom_decontaminate(docs, ev, n=n, m=m, k=k).collect()}

    def test_matches_bruteforce(self, spark):
        import random
        rng = random.Random(3)
        vocab = [f"w{i}" for i in range(30)]
        eval_docs = {100 + i: " ".join(rng.choice(vocab)
                                       for _ in range(20))
                     for i in range(4)}
        corpus = {i: " ".join(rng.choice(vocab) for _ in range(25))
                  for i in range(40)}
        # plant one exact contamination
        corpus[0] = corpus[0] + " " + eval_docs[100]
        n, m, k = 3, 512, 3
        got = self._run(spark, corpus, eval_docs, n, m, k)
        bits = set()
        for t in eval_docs.values():
            for g in _shingles(t, n):
                bits.update(_bloom_bits_brute(g, m, k))
        eval_grams = set().union(*(_shingles(t, n)
                                   for t in eval_docs.values()))
        for d, text in corpus.items():
            grams = _shingles(text, n)
            n_bloom = sum(all(b in bits
                              for b in _bloom_bits_brute(g, m, k))
                          for g in grams)
            n_exact = len(grams & eval_grams)
            r = got[d]
            assert (r.n_bloom_hits, r.n_exact) == (n_bloom, n_exact)
            assert r.bloom_flagged == (n_bloom > 0)
            assert r.exact_contaminated == (n_exact > 0)

    def test_no_false_negatives(self, spark):
        # tiny m forces collisions/false positives; the guarantee that
        # must survive is bloom >= exact on every doc
        import random
        rng = random.Random(5)
        vocab = [f"t{i}" for i in range(12)]
        eval_docs = {900: " ".join(rng.choice(vocab) for _ in range(30))}
        corpus = {i: " ".join(rng.choice(vocab) for _ in range(30))
                  for i in range(30)}
        got = self._run(spark, corpus, eval_docs, n=3, m=64, k=2)
        assert all(r.n_bloom_hits >= r.n_exact for r in got.values())
        assert any(r.n_bloom_hits > r.n_exact for r in got.values()), \
            "m=64 over hundreds of grams should collide somewhere"
        for r in got.values():
            if r.exact_contaminated:
                assert r.bloom_flagged


# ------------------------------------------------------------- host mirrors


class TestHostMirrors:
    def _run(self, spark, urls, tau=0.5, cap=100):
        from saber_spark.operators.webstats import host_mirrors
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return {(r.host_a, r.host_b): r
                for r in host_mirrors(df, tau=tau,
                                      max_hosts_per_path=cap).collect()}

    def test_mirror_pair_detected(self, spark):
        urls = [f"https://a.org/p/{i}" for i in range(10)]
        urls += [f"https://b.org/p/{i}" for i in range(8)]   # 8/10 shared
        urls += [f"https://c.org/q/{i}" for i in range(10)]  # disjoint
        got = self._run(spark, urls, tau=0.5)
        assert set(got) == {("a.org", "b.org")}
        r = got[("a.org", "b.org")]
        assert (r.n_shared, r.n_a, r.n_b) == (8, 10, 8)
        assert r.jaccard == 0.8
        # disjoint hosts never pair up (no shared path -> no join row)

    def test_popular_path_excluded_from_pairing(self, spark):
        # '/' on every host: with cap=2 it cannot generate pairs
        urls = [f"https://h{i}.org/" for i in range(5)]
        urls += ["https://h0.org/x", "https://h1.org/x"]
        got = self._run(spark, urls, tau=0.1, cap=2)
        assert set(got) == {("h0.org", "h1.org")}
        r = got[("h0.org", "h1.org")]
        # sizes still count the popular path; intersection does not
        assert (r.n_shared, r.n_a, r.n_b) == (1, 2, 2)

    def test_tau_threshold(self, spark):
        urls = [f"https://a.org/p/{i}" for i in range(10)]
        urls += [f"https://b.org/p/{i}" for i in range(2)]
        got = self._run(spark, urls, tau=0.5)
        assert got == {}  # jaccard 2/10 < 0.5


# ---------------------------------------------------------- metapath counts


class TestMetapathCounts:
    def _run(self, spark, triples, cap=1000):
        from saber_spark.operators.triples import metapath_counts
        df = spark.createDataFrame(triples,
                                   "subj string, pred string, obj string")
        return {(r.pred1, r.pred2): (r.n_paths, r.n_mids)
                for r in metapath_counts(df,
                                         max_mid_degree=cap).collect()}

    def test_matches_bruteforce(self, spark):
        import random
        rng = random.Random(13)
        ents = [f"e{i}" for i in range(12)]
        preds = ["p1", "p2", "p3"]
        triples = list({(rng.choice(ents), rng.choice(preds),
                         rng.choice(ents)) for _ in range(80)})
        got = self._run(spark, triples)
        by_mid_in = defaultdict(list)
        by_mid_out = defaultdict(list)
        for s, p, o in triples:
            by_mid_in[o].append((s, p))
            by_mid_out[s].append((p, o))
        want = defaultdict(lambda: [0, set()])
        for m in set(by_mid_in) & set(by_mid_out):
            for a, p1 in by_mid_in[m]:
                for p2, b in by_mid_out[m]:
                    if a != b:
                        want[(p1, p2)][0] += 1
                        want[(p1, p2)][1].add(m)
        assert got == {k: (v[0], len(v[1])) for k, v in want.items()}

    def test_hub_mid_excluded(self, spark):
        # hub 'h' has in-degree 3 > cap=2 -> no paths through it
        triples = [("a", "p", "h"), ("b", "p", "h"), ("c", "p", "h"),
                   ("h", "q", "x"),
                   ("a", "p", "m"), ("m", "q", "y")]
        got = self._run(spark, triples, cap=2)
        assert got == {("p", "q"): (1, 1)}  # only a -p-> m -q-> y

    def test_returning_path_excluded(self, spark):
        triples = [("a", "p", "m"), ("m", "q", "a")]
        assert self._run(spark, triples) == {}


# ------------------------------------------------------------ grouped split


class TestGroupedSplit:
    def test_group_exclusive_and_portable(self, spark):
        from saber_spark.operators.splits import grouped_split
        rows = [(i, f"host{i % 7}") for i in range(70)]
        df = spark.createDataFrame(rows, "doc_id long, host string")
        got = grouped_split(df, "host", folds=3).collect()
        by_group = defaultdict(set)
        for r in got:
            by_group[r.host].add(r.fold)
        assert all(len(fs) == 1 for fs in by_group.values())
        for g, fs in by_group.items():
            assert fs == {_md5_32(g) % 3}

    def test_audit_shape(self, spark):
        from saber_spark.operators.splits import grouped_split_audit
        rows = [(i, f"h{i % 5}") for i in range(50)]
        # make h0 a hub: 30 extra docs
        rows += [(100 + i, "h0") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, host string")
        audit = {r.fold: r for r in
                 grouped_split_audit(df, "host", folds=2).collect()}
        assert sum(r.n_docs for r in audit.values()) == 80
        assert sum(r.n_groups for r in audit.values()) == 5
        hub_fold = _md5_32("h0") % 2
        assert audit[hub_fold].largest_group_docs == 40


# ---------------------------------------------------------------- N-Triples


class TestNTriples:
    def test_roundtrip_and_escaping(self, spark, tmp_path):
        from saber_spark.sources.graph_export import write_ntriples
        rows = [("alice smith", "knows", "bob"),
                ("bob", "works<at>", "acme|corp"),
                ("c", "p", "d")]
        df = spark.createDataFrame(rows, "subj string, pred string, obj string")
        out = str(tmp_path / "nt")
        write_ntriples(df, out)
        lines = [r.value for r in spark.read.text(out).collect()]
        assert len(lines) == 3
        pat = re.compile(r"^<[^ <>\"{}|^`\\]+> <[^ <>\"{}|^`\\]+> "
                         r"<[^ <>\"{}|^`\\]+> \.$")
        for ln in lines:
            assert pat.match(ln), ln
        assert any("alice%20smith" in ln for ln in lines)

    def test_null_term_raises(self, spark, tmp_path):
        from saber_spark.sources.graph_export import write_ntriples
        df = spark.createDataFrame([("a", None, "b")],
                                   "subj string, pred string, obj string")
        with pytest.raises(ValueError):
            write_ntriples(df, str(tmp_path / "nt2"))
