"""Round-4 second-wave operators: BM25 retrieval, DSIR importance
weights, SemDeDup, HITS, k-hop BFS — randomized brute-force parity plus
edge cases, following the test_properties convention (small random
inputs, an independent pure-Python reimplementation, exact compare)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from saber_spark.operators.cluster import kmeans_assign, semdedup
from saber_spark.operators.graph import hits, khop_distance
from saber_spark.operators.retrieval import bm25_topk
from saber_spark.operators.splits import dsir_weights


def _rand_graph(rng, n_nodes=12, n_edges=30):
    return list({(f"n{rng.randrange(n_nodes)}", f"n{rng.randrange(n_nodes)}")
                 for _ in range(n_edges)})


class TestHits:
    def test_matches_bruteforce_power_iteration(self, spark):
        rng = random.Random(11)
        edges = _rand_graph(rng)
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r.node: (r.hub, r.auth)
               for r in hits(df, rounds=2).collect()}
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        h = {n: 1 for n in nodes}
        a = {}
        for _ in range(2):
            a = {n: 0 for n in nodes}
            for u, v in edges:
                a[v] += h[u]
            h = {n: 0 for n in nodes}
            for u, v in edges:
                h[u] += a[v]
        assert got == {n: (h[n], a[n]) for n in nodes}

    def test_dedup_of_parallel_edges(self, spark):
        df = spark.createDataFrame([("a", "b")] * 3 + [("b", "c")],
                                   "src string, dst string")
        got = {r.node: (r.hub, r.auth) for r in hits(df, rounds=1).collect()}
        # distinct edges: a->b, b->c; h0=1: auth(b)=1, auth(c)=1;
        # hub(a)=auth(b)=1, hub(b)=auth(c)=1
        assert got == {"a": (1, 0), "b": (1, 1), "c": (0, 1)}

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src string, dst string")
        assert hits(df, rounds=2).count() == 0


class TestKhop:
    def test_matches_bruteforce_bfs(self, spark):
        rng = random.Random(23)
        edges = _rand_graph(rng, n_nodes=15, n_edges=25)
        seeds = ["n0", "n3"]
        df = spark.createDataFrame(edges, "src string, dst string")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
        got = {r.node: r.dist for r in khop_distance(df, sdf, k=4).collect()}
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
        for d in range(1, 5):
            frontier = {v for u in frontier for v in adj.get(u, ())
                        if v not in dist}
            for v in frontier:
                dist[v] = d
        assert got == dist

    def test_directed_not_symmetric(self, spark):
        df = spark.createDataFrame([("a", "b"), ("c", "b")],
                                   "src string, dst string")
        sdf = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.dist for r in khop_distance(df, sdf, k=3).collect()}
        assert got == {"a": 0, "b": 1}  # c unreachable along direction

    def test_early_exit_on_empty_frontier(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        sdf = spark.createDataFrame([("b",)], "node string")
        got = {r.node: r.dist for r in khop_distance(df, sdf, k=9).collect()}
        assert got == {"b": 0}

    def test_seed_keeps_dist_zero_on_cycle(self, spark):
        df = spark.createDataFrame([("a", "b"), ("b", "a")],
                                   "src string, dst string")
        sdf = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.dist for r in khop_distance(df, sdf, k=5).collect()}
        assert got == {"a": 0, "b": 1}


class TestBm25:
    def _brute(self, docs, terms, k1=1.2, b=0.75):
        toks = {i: d.split() for i, d in docs.items()}
        toks = {i: t for i, t in toks.items() if t}
        n = len(toks)
        avgdl = sum(len(t) for t in toks.values()) / n
        out = {}
        for i, t in toks.items():
            score, hitn = 0.0, 0
            for term in sorted(set(terms)):
                tf = t.count(term)
                if not tf:
                    continue
                hitn += 1
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                score += (idf * tf * (k1 + 1)
                          / (tf + k1 * (1 - b + b * len(t) / avgdl)))
            if hitn:
                out[i] = (hitn, round(score, 6))
        return out

    def test_matches_bruteforce(self, spark):
        rng = random.Random(7)
        vocab = ["spark", "table", "row", "scan", "join", "agg"]
        docs = {i: " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(3, 20)))
                for i in range(40)}
        tokens = spark.createDataFrame(
            [(i, p, t) for i, d in docs.items()
             for p, t in enumerate(d.split())],
            "doc_id long, pos long, token string")
        got = bm25_topk(tokens, ["spark", "join"], top_k=10).collect()
        brute = self._brute(docs, ["spark", "join"])
        order = sorted(brute.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]
        assert [(r.doc_id, r.n_hits, r.score, r.rank) for r in got] == \
            [(i, h, s, rk + 1) for rk, (i, (h, s)) in enumerate(order)]

    def test_empty_query_raises(self, spark):
        tokens = spark.createDataFrame([(1, 0, "a")],
                                       "doc_id long, pos long, token string")
        with pytest.raises(ValueError):
            bm25_topk(tokens, [])

    def test_no_matching_docs_is_empty(self, spark):
        tokens = spark.createDataFrame([(1, 0, "a")],
                                       "doc_id long, pos long, token string")
        assert bm25_topk(tokens, ["zzz"]).count() == 0


class TestDsir:
    def test_matches_bruteforce(self, spark):
        rng = random.Random(41)
        vocab = ["a", "b", "c", "d"]
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(0, 9))]
                for i in range(30)}
        target = [i for i in docs if i % 5 == 0]
        tokens = spark.createDataFrame(
            [(i, p, t) for i, d in docs.items() for p, t in enumerate(d)],
            "doc_id long, pos long, token string")
        tdf = spark.createDataFrame([(i,) for i in target], "doc_id long")
        B = 16
        got = {r.doc_id: (r.n_features, r.logw)
               for r in dsir_weights(tokens, tdf, buckets=B).collect()}

        import hashlib

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

        grams = {i: [bucket(f"{d[j]} {d[j+1]}") for j in range(len(d) - 1)]
                 for i, d in docs.items()}
        raw, tgt = {}, {}
        for i, gs in grams.items():
            for g in gs:
                raw[g] = raw.get(g, 0) + 1
                if i in target:
                    tgt[g] = tgt.get(g, 0) + 1
        tot_raw, tot_tgt = sum(raw.values()), sum(tgt.values())
        want = {}
        for i, d in docs.items():
            if not d:
                continue  # zero tokens -> no doc_id in tokens at all
            gs = grams[i]
            lw = sum(math.log((tgt.get(g, 0) + 1) / (tot_tgt + B))
                     - math.log((raw[g] + 1) / (tot_raw + B)) for g in gs)
            want[i] = (len(gs), round(lw, 6) if gs else 0.0)
        assert got == want

    def test_target_docs_score_higher_on_average(self, spark):
        # two disjoint vocabularies -> target docs must dominate
        rows, tids = [], []
        for i in range(20):
            word = "x" if i < 10 else "y"
            if i < 10:
                tids.append((i,))
            rows += [(i, p, word) for p in range(6)]
        tokens = spark.createDataFrame(rows,
                                       "doc_id long, pos long, token string")
        tdf = spark.createDataFrame(tids, "doc_id long")
        res = dsir_weights(tokens, tdf, buckets=8).collect()
        tgt_w = [r.logw for r in res if r.doc_id < 10]
        raw_w = [r.logw for r in res if r.doc_id >= 10]
        assert min(tgt_w) > max(raw_w)


class TestSemdedup:
    def test_keep_set_matches_bruteforce(self, spark):
        rng = random.Random(3)
        vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(6)]
                for i in range(40)}
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<float>")
        got = {r.vec_id: (r.cluster, r.keep)
               for r in semdedup(df, k=3, iterations=2,
                                 threshold=0.5).collect()}
        # brute force: reuse kmeans_assign for the clusters (itself
        # oracle- and test-covered), recompute the drop rule in python
        assign = {r.vec_id: r.cluster
                  for r in kmeans_assign(df, k=3, iterations=2).collect()}

        def q(v):
            return [round(x * 1000) for x in
                    [float(f) for f in v]]

        def cos(a, b):
            qa, qb = q(a), q(b)
            dot = sum(x * y for x, y in zip(qa, qb))
            na = math.sqrt(sum(x * x for x in qa))
            nb = math.sqrt(sum(x * x for x in qb))
            return dot / (na * nb)

        dropped = set()
        for i in vecs:
            for j in vecs:
                if i < j and assign[i] == assign[j] \
                        and cos(vecs[i], vecs[j]) >= 0.5:
                    dropped.add(j)
        want = {i: (assign[i], i not in dropped) for i in vecs}
        assert got == want

    def test_every_cluster_keeps_at_least_one(self, spark):
        df = spark.createDataFrame(
            [(i, [float(i % 4), 1.0, 0.5]) for i in range(16)],
            "vec_id long, embedding array<float>")
        res = semdedup(df, k=2, iterations=1, threshold=0.9).collect()
        clusters = {r.cluster for r in res}
        kept = {r.cluster for r in res if r.keep}
        assert kept == clusters  # lowest id in each cluster always kept
        assert len(res) == 16   # one row per input vector


class TestPersonalizedPagerank:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.graph import personalized_pagerank
        rng = random.Random(5)
        edges = _rand_graph(rng, n_nodes=10, n_edges=22)
        seeds = ["n1", "n4"]
        df = spark.createDataFrame(edges, "src string, dst string")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
        got = {r.node: r.pr
               for r in personalized_pagerank(df, sdf,
                                              iterations=3).collect()}
        sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
        nodes = sorted({a for a, _ in sym})
        outdeg = {n: sum(1 for a, _ in sym if a == n) for n in nodes}
        s = {n: (0.5 if n in seeds else 0.0) for n in nodes}
        pr = dict(s)
        for _ in range(3):
            contrib = {n: 0.0 for n in nodes}
            for a, b in sym:
                contrib[b] += pr[a] / outdeg[a]
            pr = {n: 0.15 * s[n] + 0.85 * contrib[n] for n in nodes}
        assert got == {n: round(pr[n], 6) for n in nodes}

    def test_mass_stays_in_seed_component(self, spark):
        from saber_spark.operators.graph import personalized_pagerank
        # two disconnected components; seed in the first: ALL rank mass
        # stays there (sum == 1 — teleport + damping conserve mass) and
        # the unseeded component reports exactly 0.0 for every node
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")],
            "src string, dst string")
        sdf = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.pr
               for r in personalized_pagerank(df, sdf,
                                              iterations=4).collect()}
        assert got["x"] == got["y"] == got["z"] == 0.0
        assert all(got[n] > 0 for n in ("a", "b", "c"))
        assert abs(sum(got.values()) - 1.0) < 1e-5

    def test_empty_seed_raises(self, spark):
        from saber_spark.operators.graph import personalized_pagerank
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        sdf = spark.createDataFrame([], "node string")
        with pytest.raises(ValueError):
            personalized_pagerank(df, sdf)


class TestWeightedSample:
    def test_matches_bruteforce_aes_keys(self, spark):
        import hashlib

        from saber_spark.operators.splits import weighted_sample
        rows = [(i, (i % 7) + 1) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = [(r.doc_id, r.weight, r.key, r.rank)
               for r in weighted_sample(df, "w", k=10).collect()]

        def key(i, w):
            u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                 + 0.5) / 2**32
            return round(u ** (1.0 / w), 6)

        brute = sorted(((i, w, key(i, w)) for i, w in rows),
                       key=lambda t: (-t[2], t[0]))[:10]
        assert got == [(i, w, k, r + 1)
                       for r, (i, w, k) in enumerate(brute)]

    def test_rejects_nonpositive_weights(self, spark):
        from saber_spark.operators.splits import weighted_sample
        df = spark.createDataFrame([(1, 0)], "doc_id long, w long")
        with pytest.raises(ValueError):
            weighted_sample(df, "w", k=1)


class TestNgramContainment:
    def test_subset_doc_scores_full_containment(self, spark):
        from saber_spark.operators.dedup import ngram_containment
        short = "alpha beta gamma delta epsilon"
        long = short + " zeta eta theta iota kappa lam mu nu xi omicron"
        docs = spark.createDataFrame([(1, short), (2, long)],
                                     "doc_id long, text string")
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        r = ngram_containment(docs, pairs).first()
        assert r.cont_a == 1.0          # every shingle of short is in long
        assert r.cont_b < 1.0
        assert r.n_common == r.n_a

    def test_counts_match_manual_sets(self, spark):
        from saber_spark.operators.dedup import ngram_containment

        def sh(words, n=3):
            w = words.split()
            return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

        a = "one two three four five six"
        b = "zero one two three four nine eight"
        docs = spark.createDataFrame([(1, a), (2, b)],
                                     "doc_id long, text string")
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        r = ngram_containment(docs, pairs).first()
        inter = sh(a) & sh(b)
        assert (r.n_common, r.n_a, r.n_b) == (len(inter), len(sh(a)),
                                              len(sh(b)))
        assert r.cont_a == round(len(inter) / len(sh(a)), 6)


class TestRandomWalks:
    def test_matches_bruteforce_hash_walks(self, spark):
        import hashlib

        from saber_spark.operators.graph import random_walks
        rng = random.Random(17)
        edges = _rand_graph(rng, n_nodes=8, n_edges=14)
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {(r.walk_id, r.step): r.node
               for r in random_walks(df, walk_len=3,
                                     walks_per_node=2).collect()}
        sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
        adj = {}
        for a, b in sorted(sym):
            adj.setdefault(a, []).append(b)
        want = {}
        for start in adj:
            for walk in range(2):
                node = start
                want[(f"{start}#{walk}", 0)] = node
                for t in range(1, 4):
                    h = int(hashlib.md5(
                        f"{start}|{walk}|{t}|{node}".encode())
                        .hexdigest()[:8], 16)
                    node = adj[node][h % len(adj[node])]
                    want[(f"{start}#{walk}", t)] = node
        assert got == want

    def test_walks_are_reproducible(self, spark):
        from saber_spark.operators.graph import random_walks
        df = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")],
                                   "src string, dst string")
        r1 = sorted(map(tuple, random_walks(df, 4, 1).collect()))
        r2 = sorted(map(tuple, random_walks(df, 4, 1).collect()))
        assert r1 == r2 and len(r1) == 3 * 5

    def test_steps_follow_edges(self, spark):
        from saber_spark.operators.graph import random_walks
        df = spark.createDataFrame([("a", "b"), ("b", "c")],
                                   "src string, dst string")
        rows = random_walks(df, walk_len=5, walks_per_node=1).collect()
        sym = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}
        byw = {}
        for r in rows:
            byw.setdefault(r.walk_id, {})[r.step] = r.node
        for wid, steps in byw.items():
            assert len(steps) == 6
            for t in range(1, 6):
                assert (steps[t - 1], steps[t]) in sym


class TestGuards:
    def test_hits_rejects_zero_rounds(self, spark):
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        with pytest.raises(ValueError):
            hits(df, rounds=0)

    def test_ppr_rejects_absent_seed(self, spark):
        from saber_spark.operators.graph import personalized_pagerank
        df = spark.createDataFrame([("a", "b")], "src string, dst string")
        sdf = spark.createDataFrame([("zz",)], "node string")
        with pytest.raises(ValueError):
            personalized_pagerank(df, sdf)


class TestScrubDupSpans:
    def test_matches_bruteforce(self, spark):
        from saber_spark.operators.dedup import scrub_dup_spans
        rng = random.Random(29)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(1, 15))]
                for i in range(25)}
        df = spark.createDataFrame(
            [(i, " ".join(d)) for i, d in docs.items()],
            "doc_id long, text string")
        N = 3
        got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
               for r in scrub_dup_spans(df, n=N, min_df=2).collect()}
        gram_docs = {}
        for i, d in docs.items():
            for j in range(len(d) - N + 1):
                gram_docs.setdefault(tuple(d[j:j + N]), set()).add(i)
        dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
        want = {}
        for i, d in docs.items():
            cov = set()
            for j in range(len(d) - N + 1):
                if tuple(d[j:j + N]) in dup:
                    cov.update(range(j, j + N))
            kept = [t for p, t in enumerate(d) if p not in cov]
            want[i] = (len(d), len(d) - len(kept), " ".join(kept))
        assert got == want

    def test_unique_doc_untouched_and_dup_doc_emptied(self, spark):
        from saber_spark.operators.dedup import scrub_dup_spans
        dup_text = "one two three four five"
        df = spark.createDataFrame(
            [(1, dup_text), (2, dup_text), (3, "six seven eight nine ten")],
            "doc_id long, text string")
        got = {r.doc_id: (r.n_removed, r.clean_text)
               for r in scrub_dup_spans(df, n=5, min_df=2).collect()}
        assert got[1] == (5, "") and got[2] == (5, "")
        assert got[3] == (0, "six seven eight nine ten")

    def test_short_docs_have_no_grams(self, spark):
        from saber_spark.operators.dedup import scrub_dup_spans
        df = spark.createDataFrame([(1, "hi there"), (2, "hi there")],
                                   "doc_id long, text string")
        got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
               for r in scrub_dup_spans(df, n=5, min_df=2).collect()}
        assert got == {1: (2, 0, "hi there"), 2: (2, 0, "hi there")}


class TestKcore:
    def test_driver_fast_path_matches_distributed(self, spark,
                                                  monkeypatch):
        # r6: driver peel vs the per-round semi-join loop
        from saber_spark.operators import graph
        rng = random.Random(37)
        edges = [(a, b) for a, b in _rand_graph(rng, 12, 34) if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        fast = sorted(map(tuple, graph.kcore_nodes(df, k=2).collect()))
        monkeypatch.setattr(graph, "DRIVER_EDGE_CAP", 0)
        slow = sorted(map(tuple, graph.kcore_nodes(df, k=2).collect()))
        assert fast == slow and len(fast) >= 3

    def test_matches_bruteforce_peeling(self, spark):
        from saber_spark.operators.graph import kcore_nodes
        rng = random.Random(31)
        edges = [(a, b) for a, b in _rand_graph(rng, 14, 40) if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        K = 3
        got = {r.node: r.core_deg for r in kcore_nodes(df, k=K).collect()}
        sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
        alive = {a for a, _ in sym}
        while True:
            deg = {n: sum(1 for a, b in sym
                          if a == n and b in alive and a in alive)
                   for n in alive}
            nxt = {n for n in alive if deg[n] >= K}
            if nxt == alive:
                break
            alive = nxt
        assert got == {n: deg[n] for n in alive}

    def test_tree_has_empty_2core(self, spark):
        from saber_spark.operators.graph import kcore_nodes
        df = spark.createDataFrame(
            [("r", "a"), ("r", "b"), ("a", "c"), ("a", "d")],
            "src string, dst string")
        assert kcore_nodes(df, k=2).count() == 0

    def test_triangle_with_tail_peels_tail(self, spark):
        from saber_spark.operators.graph import kcore_nodes
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "tail")],
            "src string, dst string")
        got = {r.node: r.core_deg for r in kcore_nodes(df, k=2).collect()}
        assert got == {"a": 2, "b": 2, "c": 2}


class TestReadability:
    def test_formula_and_counts(self, spark):
        from saber_spark.operators.textstats import readability_scores
        text = "The cat sat. It purred loudly!"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = readability_scores(df).first()
        # words: 6; sentences: 2; vowel-group runs in lowercase text:
        # e/a/a/i/u/e/ou/y -> 8
        assert (r.n_sentences, r.n_words, r.n_syllables) == (2, 6, 8)
        import math
        want = 206.835 - 1.015 * (6 / 2) - 84.6 * (8 / 6)
        assert math.isclose(r.flesch, round(want, 6))

    def test_empty_and_null_are_defined(self, spark):
        from saber_spark.operators.textstats import readability_scores
        df = spark.createDataFrame([(1, ""), (2, None), (3, "   ")],
                                   "doc_id long, text string")
        rows = {r.doc_id: (r.n_sentences, r.n_words, r.n_syllables,
                           r.flesch)
                for r in readability_scores(df).collect()}
        assert rows == {1: (0, 0, 0, 0.0), 2: (0, 0, 0, 0.0),
                        3: (0, 0, 0, 0.0)}


class TestTrigramBackoff:
    def test_matches_bruteforce(self, spark):
        import math

        from saber_spark.operators.lm import trigram_backoff_xent
        from saber_spark.operators.splits import HASH_MOD, KNUTH
        rng = random.Random(13)
        vocab = ["a", "b", "c", "d", "e"]
        docs = {i: [rng.choice(vocab) for _ in range(rng.randrange(0, 12))]
                for i in range(40)}
        df = spark.createDataFrame(
            [(i, " ".join(d)) for i, d in docs.items()],
            "doc_id long, text string")
        got = {r.doc_id: (r.n_trigrams, r.xent)
               for r in trigram_backoff_xent(df, r"\S+").collect()}
        part = {i: ((i * KNUTH) % HASH_MOD) % 2 for i in docs}
        tris = {i: [tuple(d[j:j + 3]) for j in range(len(d) - 2)]
                for i, d in docs.items()}
        c123, c23, c3 = {}, {}, {}
        n = 0
        vset = set()
        for i, ts in tris.items():
            if part[i] == 0:
                continue
            for t in ts:
                c123[t] = c123.get(t, 0) + 1
                c23[t[1:]] = c23.get(t[1:], 0) + 1
                c3[t[2]] = c3.get(t[2], 0) + 1
                n += 1
                vset.add(t[2])
        c12 = {}
        for t, c in c123.items():
            c12[t[:2]] = c12.get(t[:2], 0) + c
        c2 = {}
        for t, c in c23.items():
            c2[t[0]] = c2.get(t[0], 0) + c
        V = max(len(vset), 1)
        want = {}
        for i, ts in tris.items():
            if part[i] != 0 or not ts:
                continue
            nll = []
            for t in ts:
                if c123.get(t, 0) > 0:
                    s = c123[t] / c12[t[:2]]
                elif c23.get(t[1:], 0) > 0:
                    s = 0.4 * c23[t[1:]] / c2[t[1]]
                else:
                    s = 0.16 * (c3.get(t[2], 0) + 1) / (n + V)
                nll.append(-math.log(s))
            want[i] = (len(ts), round(sum(nll) / len(nll), 6))
        assert got == want

    def test_seen_trigrams_score_better_than_garbage(self, spark):
        from saber_spark.operators.lm import trigram_backoff_xent
        from saber_spark.operators.splits import HASH_MOD, KNUTH

        def part(i):
            return ((i * KNUTH) % HASH_MOD) % 2

        # many docs repeating one phrase; a garbage doc placed in the
        # SCORE half (part 0) so both kinds are actually scored
        rows = [(i, "the quick brown fox jumps") for i in range(30)]
        garbage_id = next(i for i in range(100, 200) if part(i) == 0)
        rows.append((garbage_id, "zz qq xx ww vv"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        res = {r.doc_id: r.xent
               for r in trigram_backoff_xent(df, r"\S+").collect()}
        phrase_scores = [v for k, v in res.items() if k != garbage_id]
        assert garbage_id in res and phrase_scores
        # unseen trigrams fall through to the unigram floor -> much
        # higher cross-entropy than the memorized phrase
        assert res[garbage_id] > max(phrase_scores)
