"""funnel_conversion / cohort_retention / mixture_weights unit tests
against hand-computed fixtures (the sf0.01 oracle cross-check lives in
tests/oracle_check.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from saber_spark.operators.funnel import (WEEK_US, cohort_retention,
                                          funnel_conversion)
from saber_spark.operators.splits import mixture_weights


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz")


class TestFunnel:
    def test_hand_computed(self, spark):
        rows = [
            # u1 completes all three in order
            (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
            # u2: click BEFORE view -> stops at step 1
            (2, "click", _ts(1)), (2, "view", _ts(2)),
            # u3: view+click, purchase before click -> stops at step 2
            (3, "purchase", _ts(1)), (3, "view", _ts(2)), (3, "click", _ts(3)),
            # u4 never views -> counted nowhere
            (4, "click", _ts(1)), (4, "purchase", _ts(2)),
        ]
        out = {r["step"]: r for r in
               funnel_conversion(_events(spark, rows)).collect()}
        assert [out[k]["n_users"] for k in (1, 2, 3)] == [3, 2, 1]
        assert out[3]["conv_rate"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[1]["event_type"] == "view"

    def test_strict_order_ties_dont_count(self, spark):
        # click at the SAME microsecond as view is not "after" it
        rows = [(1, "view", _ts(1)), (1, "click", _ts(1))]
        out = {r["step"]: r["n_users"] for r in
               funnel_conversion(_events(spark, rows)).collect()}
        assert out[1] == 1 and out[2] == 0

    def test_earliest_witness_chain(self, spark):
        # second view is earlier than the click; the first view already
        # qualifies the click, so the user still converts
        rows = [(1, "view", _ts(5)), (1, "click", _ts(6)),
                (1, "view", _ts(1))]
        out = {r["step"]: r["n_users"] for r in
               funnel_conversion(_events(spark, rows)).collect()}
        assert out[2] == 1

    def test_empty_input(self, spark):
        out = funnel_conversion(_events(spark, [])).collect()
        assert [r["n_users"] for r in out] == [0, 0, 0]
        assert [r["conv_rate"] for r in out] == [0.0, 0.0, 0.0]


class TestCohortRetention:
    def test_hand_computed(self, spark):
        wk = dt.datetime(2024, 1, 1)  # a Monday, but the op only uses
        # epoch-week floor, so any base works
        rows = [
            # u1 first seen week0, active weeks 0 and 1
            (1, "view", wk), (1, "view", wk + dt.timedelta(days=8)),
            # u2 first seen week0, only week 0
            (2, "view", wk + dt.timedelta(days=2)),
            # u3 first seen week1
            (3, "view", wk + dt.timedelta(days=9)),
        ]
        out = cohort_retention(_events(spark, rows)).collect()
        by_key = {(r["cohort_week"] - min(x["cohort_week"] for x in out),
                   r["week_offset"]): r for r in out}
        assert by_key[(0, 0)]["n_users"] == 2
        assert by_key[(0, 1)]["n_users"] == 1
        assert by_key[(0, 1)]["retention"] == pytest.approx(0.5)
        assert by_key[(1, 0)]["n_users"] == 1
        assert by_key[(0, 0)]["retention"] == pytest.approx(1.0)

    def test_week_arithmetic_is_integer_epoch_weeks(self, spark):
        rows = [(1, "view", dt.datetime(2024, 1, 1))]
        r = cohort_retention(_events(spark, rows)).collect()[0]
        expected = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                       .timestamp() * 1_000_000) // WEEK_US
        assert r["cohort_week"] == expected


class TestMixtureWeights:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d", "big"), (2, "a b c d", "big"),
             (3, "x y", "small")],
            "doc_id long, text string, source string")
        out = {r["source"]: r for r in mixture_weights(docs).collect()}
        assert out["big"]["n_tokens"] == 8 and out["small"]["n_tokens"] == 2
        # shares 0.8 / 0.2; alpha=0.5 -> raw sqrt(.8), sqrt(.2)
        s_big, s_small = 0.8 ** 0.5, 0.2 ** 0.5
        assert out["big"]["weight"] == pytest.approx(
            s_big / (s_big + s_small), abs=1e-6)
        assert out["small"]["oversample"] == pytest.approx(
            (s_small / (s_big + s_small)) / 0.2, abs=1e-6)
        # weights always sum to 1
        assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0)

    def test_zero_token_source_gets_defined_zero_not_null(self, spark):
        """ADVICE r3: a source whose docs are all empty must get
        share=weight=oversample=0.0 (not NULL) so samplers never see NULL;
        an all-empty corpus yields all-zero rows."""
        docs = spark.createDataFrame(
            [(1, "a b c d", "big"), (2, "", "empty"), (3, "   ", "empty")],
            "doc_id long, text string, source string")
        out = {r["source"]: r for r in mixture_weights(docs).collect()}
        assert out["empty"]["n_tokens"] == 0
        assert out["empty"]["token_share"] == 0.0
        assert out["empty"]["weight"] == 0.0
        assert out["empty"]["oversample"] == 0.0
        assert out["big"]["weight"] == pytest.approx(1.0, abs=1e-6)

        all_empty = spark.createDataFrame(
            [(1, "", "s1"), (2, " ", "s2")],
            "doc_id long, text string, source string")
        for r in mixture_weights(all_empty).collect():
            assert (r["token_share"], r["weight"], r["oversample"]) \
                == (0.0, 0.0, 0.0)

    def test_alpha_one_is_proportional(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "a b c d e f", "s2")],
            "doc_id long, text string, source string")
        out = {r["source"]: r for r in
               mixture_weights(docs, alpha=1.0).collect()}
        assert out["s1"]["weight"] == pytest.approx(0.25, abs=1e-6)
        assert out["s1"]["oversample"] == pytest.approx(1.0, abs=1e-6)


class TestFunnelRandomizedParity:
    def test_matches_bruteforce_reference(self, spark):
        """Randomized event logs vs an order-independent brute-force
        reference: a user reaches step k iff an increasing witness chain
        of step types exists (computed here by greedy earliest-completion
        over the sorted events — provably equivalent to 'exists chain')."""
        import random
        rng = random.Random(42)
        steps = ("view", "click", "purchase")
        types = ["view", "click", "purchase", "signup", "error"]
        rows = []
        for u in range(60):
            for _ in range(rng.randint(0, 12)):
                rows.append((u, rng.choice(types),
                             _ts(rng.randint(1, 27), rng.randint(0, 23),
                                 rng.randint(0, 59))))

        def brute(user_rows):
            evs = sorted(user_rows)  # (ts, type); ties sort deterministically
            reached = 0
            t_prev = None
            for k, step in enumerate(steps, start=1):
                best = None
                for ts, typ in evs:
                    if typ == step and (t_prev is None or ts > t_prev):
                        best = ts
                        break
                if best is None:
                    break
                reached, t_prev = k, best
            return reached

        per_user = {}
        for u, typ, ts in rows:
            per_user.setdefault(u, []).append((ts, typ))
        expected = [0, 0, 0]
        for evs in per_user.values():
            r = brute(evs)
            for k in range(r):
                expected[k] += 1

        out = {r["step"]: r["n_users"] for r in
               funnel_conversion(_events(spark, rows)).collect()}
        assert [out[1], out[2], out[3]] == expected


class TestCohortRandomizedParity:
    def test_matches_bruteforce_reference(self, spark):
        """Random event logs vs a brute-force cohort/retention reference."""
        import random

        from saber_spark.operators.funnel import WEEK_US

        rng = random.Random(99)
        rows = []
        for u in range(50):
            for _ in range(rng.randint(1, 8)):
                rows.append((u, "view",
                             _ts(rng.randint(1, 27), rng.randint(0, 23))))

        def week(ts):
            us = int(ts.replace(tzinfo=__import__("datetime").timezone.utc)
                     .timestamp() * 1_000_000)
            return us // WEEK_US

        per_user = {}
        for u, _, ts in rows:
            per_user.setdefault(u, set()).add(week(ts))
        counts = {}
        for weeks in per_user.values():
            cohort = min(weeks)
            for w in weeks:
                key = (cohort, w - cohort)
                counts[key] = counts.get(key, 0) + 1

        out = cohort_retention(_events(spark, rows)).collect()
        got = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in out}
        assert got == counts
        for r in out:
            denom = counts[(r["cohort_week"], 0)]
            assert r["retention"] == pytest.approx(
                counts[(r["cohort_week"], r["week_offset"])] / denom,
                abs=1e-6)


class TestMixtureSample:
    def test_saturation_and_determinism(self, spark):
        from saber_spark.operators.splits import mixture_sample
        # tiny source -> oversample >> 1 -> saturates at keep_rate 1.0
        rows = [(i, "w" + " x" * 99, "web") for i in range(100)]
        rows += [(1000, "a b c", "tiny")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = mixture_sample(docs, target_fraction=0.5).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert by_src["tiny"][0]["keep_rate"] == 1.0  # saturated
        assert len(by_src["tiny"]) == 1               # kept everything
        # web keeps roughly half (deterministic hash, not RNG)
        assert 30 <= len(by_src["web"]) <= 70
        again = mixture_sample(docs, target_fraction=0.5).collect()
        assert sorted(r["doc_id"] for r in again) == \
            sorted(r["doc_id"] for r in out)

    def test_nested_under_growing_target(self, spark):
        from saber_spark.operators.splits import mixture_sample
        docs = spark.createDataFrame(
            [(i, "w " * 20, f"s{i % 3}") for i in range(300)],
            "doc_id long, text string, source string")
        small = {r["doc_id"] for r in
                 mixture_sample(docs, target_fraction=0.2).collect()}
        big = {r["doc_id"] for r in
               mixture_sample(docs, target_fraction=0.6).collect()}
        assert small <= big  # hash membership nests, RNG sampling wouldn't
