"""Web-crawl URL analytics (operators/webstats.py).

The reference has no corpus-level URL stage (it ingests one document at a
time, saber/saber.py:52-96); these operators belong to the
training-data-pipeline addendum. Oracle twins cover url_host_stats /
url_dedup / host_blocklist in __spark_entry__; this file covers the
edge cases the oracles can't reach: normalization corner cases, apex-domain
blocklist matching, and tie/ordering semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from saber_spark.operators.webstats import (
    apex_domain,
    blocklist_filter,
    host_stats,
    normalize_url,
    url_dedup,
    url_host,
)


def _norm(spark, url: str) -> str:
    return (spark.range(1).select(normalize_url(F.lit(url)).alias("u"))
            .first()["u"])


class TestNormalizeUrl:
    def test_strips_query_fragment_and_trailing_slash(self, spark):
        assert (_norm(spark, "https://a.example.org/p/q/?utm=x#frag")
                == "https://a.example.org/p/q")

    def test_lowercases_scheme_and_host_but_not_path(self, spark):
        assert (_norm(spark, "HTTPS://WWW.Example.ORG/CaseSensitive/Path")
                == "https://www.example.org/CaseSensitive/Path")

    def test_bare_host_and_root_path_collapse_together(self, spark):
        # "https://h" and "https://h/" must normalize identically
        assert _norm(spark, "https://h.org/") == _norm(spark, "https://h.org")

    def test_port_is_part_of_the_lowercased_prefix(self, spark):
        assert (_norm(spark, "http://Host.org:8080/A")
                == "http://host.org:8080/A")

    def test_only_first_query_or_fragment_marker_cuts(self, spark):
        # everything after the FIRST ? or # goes, regardless of order
        assert (_norm(spark, "https://h.org/a#frag?query")
                == "https://h.org/a")


class TestHostApex:
    def test_host_drops_port_and_path(self, spark):
        row = (spark.range(1)
               .select(url_host(F.lit("https://A.B.Example.org:443/x?q")).alias("h"))
               .first())
        assert row["h"] == "a.b.example.org"

    def test_apex_is_last_two_labels(self, spark):
        row = (spark.range(1)
               .select(apex_domain(F.lit("a.b.example.org")).alias("d"))
               .first())
        assert row["d"] == "example.org"

    def test_apex_of_two_label_host_is_itself(self, spark):
        row = (spark.range(1)
               .select(apex_domain(F.lit("example.org")).alias("d"))
               .first())
        assert row["d"] == "example.org"


class TestUrlDedup:
    def test_recrawl_variants_collapse_keeping_first(self, spark):
        df = spark.createDataFrame(
            [("https://h.org/doc/1", 10),
             ("HTTPS://H.ORG/doc/1/?utm_source=f#top", 3),
             ("https://h.org/doc/2", 7)],
            "url string, doc_id int")
        out = {r["norm_url"]: (r["keep_id"], r["n_variants"])
               for r in url_dedup(df).collect()}
        assert out == {"https://h.org/doc/1": (3, 2),
                       "https://h.org/doc/2": (7, 1)}

    def test_case_sensitive_paths_do_not_collapse(self, spark):
        df = spark.createDataFrame(
            [("https://h.org/A", 1), ("https://h.org/a", 2)],
            "url string, doc_id int")
        assert url_dedup(df).count() == 2


class TestBlocklist:
    def _pages(self, spark):
        return spark.createDataFrame(
            [("https://www.bad.org/x", 1),
             ("https://sub.deep.bad.org/y", 2),
             ("https://good.org/z", 3),
             ("https://bad.org.evil.net/w", 4)],  # bad.org as non-suffix
            "url string, doc_id int")

    def test_apex_match_blocks_all_subdomains(self, spark):
        blocked = spark.createDataFrame([("bad.org",)], "blocked string")
        kept = blocklist_filter(self._pages(spark), blocked, match_apex=True)
        assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]

    def test_exact_match_blocks_only_that_host(self, spark):
        blocked = spark.createDataFrame([("www.bad.org",)], "blocked string")
        kept = blocklist_filter(self._pages(spark), blocked, match_apex=False)
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4]

    def test_helper_columns_are_dropped(self, spark):
        blocked = spark.createDataFrame([("bad.org",)], "blocked string")
        kept = blocklist_filter(self._pages(spark), blocked)
        assert kept.columns == ["url", "doc_id"]


class TestHostStats:
    def test_counts_and_averages_per_host(self, spark):
        df = spark.createDataFrame(
            [("https://A.org/1", 10), ("https://a.org/2", 20),
             ("https://b.org/1", 5)],
            "url string, n_chars int")
        out = {r["host"]: (r["n_docs"], r["total_chars"], r["avg_chars"])
               for r in host_stats(df).collect()}
        assert out == {"a.org": (2, 30, 15.0), "b.org": (1, 5, 5.0)}


class TestLinkGraph:
    def _pages(self, spark, binary=False):
        from pyspark.sql import functions as F
        rows = [
            ("https://a.org/1",
             '<a href="/rel">r</a><a href="https://a.org/nav">n</a>'
             '<a href="https://b.org/x">b</a><a href="https://b.org/y">b2</a>'),
            ("https://a.org/2", '<a href="https://b.org/x">b</a>'),
            ("https://c.org/1", '<a href="mailto:x@y.z">m</a>no links here'),
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        if binary:
            df = df.select("url", F.encode("html", "utf-8").alias("html"))
        return df

    def test_extracts_absolute_http_links_only(self, spark):
        from saber_spark.operators.webstats import extract_links
        links = extract_links(self._pages(spark))
        got = sorted((r["src_url"], r["dst_url"]) for r in links.collect())
        assert got == [("https://a.org/1", "https://a.org/nav"),
                       ("https://a.org/1", "https://b.org/x"),
                       ("https://a.org/1", "https://b.org/y"),
                       ("https://a.org/2", "https://b.org/x")]

    def test_binary_html_decodes_identically(self, spark):
        from saber_spark.operators.webstats import extract_links
        a = sorted(map(tuple, extract_links(self._pages(spark)).collect()))
        b = sorted(map(tuple,
                       extract_links(self._pages(spark, binary=True)).collect()))
        assert a == b

    def test_host_graph_drops_self_and_counts(self, spark):
        from saber_spark.operators.webstats import extract_links, host_graph
        g = host_graph(extract_links(self._pages(spark)))
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in g.collect()}
        assert got == {("a.org", "b.org"): 3}

    def test_host_graph_keep_self(self, spark):
        from saber_spark.operators.webstats import extract_links, host_graph
        g = host_graph(extract_links(self._pages(spark)), drop_self=False)
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in g.collect()}
        assert got == {("a.org", "b.org"): 3, ("a.org", "a.org"): 1}

    def test_feeds_pagerank(self, spark):
        # the composition the docstring promises: host edges -> authority.
        # pagerank symmetrizes, so centrality = degree here: b.org (linked
        # from both a.org and c.org) must outrank the two leaf hosts.
        from saber_spark.operators.graph import pagerank
        from saber_spark.operators.webstats import extract_links, host_graph
        pages = spark.createDataFrame(
            [("https://a.org/1", '<a href="https://b.org/x">b</a>'),
             ("https://c.org/1", '<a href="https://b.org/y">b</a>')],
            "url string, html string")
        g = host_graph(extract_links(pages))
        pr = pagerank(g.selectExpr("src_host as src", "dst_host as dst"),
                      iterations=3)
        cols = pr.columns
        scores = {r[cols[0]]: r[cols[1]] for r in pr.collect()}
        assert set(scores) == {"a.org", "b.org", "c.org"}
        assert scores["b.org"] > scores["a.org"] == scores["c.org"]


class TestSnapshotDelta:
    def _delta(self, spark, old_rows, new_rows):
        from saber_spark.operators.webstats import snapshot_delta
        old = spark.createDataFrame(old_rows, "url string, text string")
        new = spark.createDataFrame(new_rows, "url string, text string")
        return {r["url"]: r["status"]
                for r in snapshot_delta(old, new).collect()}

    def test_added_removed_changed_unchanged(self, spark):
        got = self._delta(
            spark,
            [("u1", "same"), ("u2", "old body"), ("u3", "gone")],
            [("u1", "same"), ("u2", "new body"), ("u4", "fresh")])
        # u1 unchanged -> filtered out entirely
        assert got == {"u2": "changed", "u3": "removed", "u4": "added"}

    def test_null_content_equals_empty(self, spark):
        # coalesce(content, '') on both sides: NULL vs '' is UNCHANGED,
        # NULL vs non-empty is changed
        got = self._delta(spark,
                          [("u1", None), ("u2", None)],
                          [("u1", ""), ("u2", "now has text")])
        assert got == {"u2": "changed"}

    def test_disjoint_snapshots(self, spark):
        got = self._delta(spark, [("a", "x")], [("b", "y")])
        assert got == {"a": "removed", "b": "added"}


class TestResolveRedirects:
    def _resolve(self, spark, edges, **kw):
        from saber_spark.operators.webstats import resolve_redirects
        df = spark.createDataFrame(edges, "src_url string, dst_url string")
        return {r["src_url"]: (r["final_url"], r["n_hops"])
                for r in resolve_redirects(df, **kw).collect()}

    def test_chain_resolves_to_terminal_with_hop_count(self, spark):
        got = self._resolve(spark, [("a", "b"), ("b", "c"), ("c", "t")])
        assert got == {"a": ("t", 3), "b": ("t", 2), "c": ("t", 1)}

    def test_cycle_reports_cap_hops(self, spark):
        # 2-cycle: pointer doubling lands 8 (even) hops around -> self,
        # n_hops == cap flags the unresolved chain
        got = self._resolve(spark, [("a", "b"), ("b", "a")], max_hops=8)
        assert got == {"a": ("a", 8), "b": ("b", 8)}

    def test_chain_longer_than_cap_stops_at_cap(self, spark):
        edges = [(f"n{i}", f"n{i+1}") for i in range(12)]
        got = self._resolve(spark, edges, max_hops=4)
        # cap rounds up to a power of two (4 -> 2 rounds -> 4 hops)
        assert got["n0"] == ("n4", 4)
        assert got["n9"] == ("n12", 3)  # reaches terminal inside the cap

    def test_multiple_targets_collapse_to_min(self, spark):
        got = self._resolve(spark, [("a", "z"), ("a", "b"), ("b", "t")])
        assert got["a"] == ("t", 2)  # min("b","z")="b", then b->t


class TestAnchors:
    def _pages(self, spark, binary=False):
        rows = [
            ("https://s1.org/1",
             '<a href="https://e.org/p">Acme Corp</a>'
             '<a href="https://e.org/q" rel="x">Acme Corp</a>'
             '<a href="https://f.org/r">  </a>'),
            ("https://s2.org/1",
             '<a href="https://e.org/p">ACME</a>'
             '<a href="/rel">relative skipped</a>'),
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        if binary:
            df = df.select("url", F.encode("html", "utf-8").alias("html"))
        return df

    def test_extract_pairs_href_with_text(self, spark):
        from saber_spark.operators.webstats import extract_anchors
        got = sorted(map(tuple,
                         extract_anchors(self._pages(spark)).collect()))
        assert got == [
            ("https://s1.org/1", "https://e.org/p", "Acme Corp"),
            ("https://s1.org/1", "https://e.org/q", "Acme Corp"),
            ("https://s1.org/1", "https://f.org/r", "  "),
            ("https://s2.org/1", "https://e.org/p", "ACME"),
        ]

    def test_binary_html_identical(self, spark):
        from saber_spark.operators.webstats import extract_anchors
        a = sorted(map(tuple, extract_anchors(self._pages(spark)).collect()))
        b = sorted(map(tuple,
                       extract_anchors(self._pages(spark, True)).collect()))
        assert a == b

    def test_profile_top_anchor_counts_and_blank_drop(self, spark):
        from saber_spark.operators.webstats import (anchor_profile,
                                                    extract_anchors)
        prof = {r["dst"]: (r["top_anchor"], r["n_refs"],
                           r["n_anchors_distinct"])
                for r in anchor_profile(
                    extract_anchors(self._pages(spark))).collect()}
        # whitespace-only anchor dropped -> f.org absent entirely
        assert prof == {"e.org": ("Acme Corp", 3, 2)}

    def test_profile_tie_breaks_anchor_asc(self, spark):
        from saber_spark.operators.webstats import anchor_profile
        df = spark.createDataFrame(
            [("s", "https://h.org/1", "beta"), ("s", "https://h.org/2", "alpha")],
            "src_url string, dst_url string, anchor string")
        row = anchor_profile(df).first()
        assert (row["top_anchor"], row["n_refs"]) == ("alpha", 2)


class TestDeltaTriples:
    def test_upsert_and_retract_legs(self, spark):
        from saber_spark.operators.triples import delta_triples
        from saber_spark.operators.webstats import snapshot_delta
        old = spark.createDataFrame(
            [("u1", "x y"), ("u2", "a b kept"), ("u3", "a c dead")],
            "url string, text string")
        new = spark.createDataFrame(
            [("u1", "a b fresh"), ("u2", "a b kept"), ("u4", "b c born")],
            "url string, text string")
        dict_df = spark.createDataFrame(
            [("a", "E_A"), ("b", "E_B"), ("c", "E_C")],
            "surface string, canonical_id string")

        def linker(docs):
            toks = docs.select(
                "url", F.explode(F.split("text", " ")).alias("token"))
            return (toks.join(F.broadcast(dict_df),
                              toks["token"] == F.col("surface"))
                    .select("url", F.lit(0).alias("sent_id"),
                            "canonical_id"))

        delta = snapshot_delta(old, new)
        got = {(r["subj"], r["obj"], r["op"]): r["n_docs"]
               for r in delta_triples(delta, old, new, linker).collect()}
        # u1 changed -> upsert (E_A,E_B); u4 added -> upsert (E_B,E_C);
        # u3 removed -> retract (E_A,E_C); u2 unchanged -> NOT re-extracted
        assert got == {("E_A", "E_B", "upsert"): 1,
                       ("E_B", "E_C", "upsert"): 1,
                       ("E_A", "E_C", "retract"): 1}


class TestRobots:
    def test_rules_parse_star_group_only(self, spark):
        from saber_spark.operators.webstats import robots_rules
        txt = ("User-agent: archiver\nDisallow: /\n"
               "User-agent: *\nDisallow: /private\nDisallow: /tmp\n"
               "Allow: /tmp/ok\n"   # Allow lines are not Disallow rules
               "User-agent: indexer\nDisallow: /doc\n")
        df = spark.createDataFrame([("h.org", txt)],
                                   "host string, robots_txt string")
        rules = {(r.host, r.rule_path) for r in robots_rules(df).collect()}
        assert rules == {("h.org", "/private"), ("h.org", "/tmp")}

    def test_rules_case_insensitive_and_crlf(self, spark):
        from saber_spark.operators.webstats import robots_rules
        txt = "user-AGENT: *\r\ndisallow: /x\r\n"
        df = spark.createDataFrame([("h.org", txt)],
                                   "host string, robots_txt string")
        assert [r.rule_path for r in robots_rules(df).collect()] == ["/x"]

    def test_no_star_group_means_no_rules(self, spark):
        from saber_spark.operators.webstats import robots_rules
        df = spark.createDataFrame(
            [("h.org", "User-agent: other\nDisallow: /\n")],
            "host string, robots_txt string")
        assert robots_rules(df).count() == 0

    def test_filter_is_per_host_prefix(self, spark):
        from saber_spark.operators.webstats import robots_filter
        pages = spark.createDataFrame(
            [("https://a.org/private/1",), ("https://a.org/doc/1",),
             ("https://b.org/private/1",)], "url string")
        rules = spark.createDataFrame([("a.org", "/private")],
                                      "host string, rule_path string")
        kept = {r.url for r in robots_filter(pages, rules).collect()}
        assert kept == {"https://a.org/doc/1", "https://b.org/private/1"}


class TestSitemap:
    def test_locs_exploded_per_host(self, spark):
        from saber_spark.operators.webstats import sitemap_urls
        xml = ("<urlset><url><loc>https://h.org/a</loc></url>"
               "<url><loc>https://h.org/b</loc></url></urlset>")
        df = spark.createDataFrame([("h.org", xml), ("empty.org",
                                                     "<urlset></urlset>")],
                                   "host string, xml string")
        out = {(r.host, r.loc) for r in sitemap_urls(df).collect()}
        assert out == {("h.org", "https://h.org/a"),
                       ("h.org", "https://h.org/b")}
