"""As-of join / sessionization / gap-fill unit goldens."""

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.timeseries import (asof_join, gap_fill,
                                               session_stats, sessionize)


class TestAsofJoin:
    def test_backward_match_and_tolerance(self, spark):
        left = spark.createDataFrame(
            [("u1", 100, 1.0), ("u1", 250, 2.0), ("u2", 100, 3.0)],
            "k string, ts long, lv double")
        right = spark.createDataFrame(
            [("u1", 50, 10.0), ("u1", 200, 20.0), ("u2", 500, 30.0)],
            "k string, ts long, rv double")
        out = {(r.k, r.ts): (r.r_ts, r.r_rv)
               for r in asof_join(left, right, ["k"], payload_cols=["rv"],
                                  prefix="r_").collect()}
        assert out == {("u1", 100): (50, 10.0),
                       ("u1", 250): (200, 20.0),
                       ("u2", 100): (None, None)}   # right is in the future
        # tolerance: u1@250 match at 200 dropped when tolerance < 50
        tol = {(r.k, r.ts): r.r_rv
               for r in asof_join(left, right, ["k"], payload_cols=["rv"],
                                  tolerance_ms=49, prefix="r_").collect()}
        assert tol[("u1", 250)] is None
        assert tol[("u1", 100)] is None              # gap 50 > 49
        # equal-ts right row matches (ties inclusive)
        right2 = spark.createDataFrame([("u1", 100, 9.0)],
                                       "k string, ts long, rv double")
        eq = asof_join(left, right2, ["k"], payload_cols=["rv"]).collect()
        got = {(r.k, r.ts): r.r_rv for r in eq}
        assert got[("u1", 100)] == 9.0

    def test_latest_of_duplicate_candidates(self, spark):
        left = spark.createDataFrame([("u", 100, 0.0)],
                                     "k string, ts long, lv double")
        right = spark.createDataFrame(
            [("u", 10, 1.0), ("u", 20, 2.0), ("u", 90, 3.0)],
            "k string, ts long, rv double")
        r = asof_join(left, right, ["k"], payload_cols=["rv"]).first()
        assert (r.r_ts, r.r_rv) == (90, 3.0)


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        df = spark.createDataFrame(
            [("u", t) for t in [0, 10, 20, 1000, 1010, 5000]],
            "k string, ts long")
        s = sessionize(df, ["k"], gap_ms=100)
        got = {r.ts: r.session_idx for r in s.collect()}
        assert got == {0: 0, 10: 0, 20: 0, 1000: 1, 1010: 1, 5000: 2}
        stats = {r.session_idx: (r.n_events, r.duration_ms)
                 for r in session_stats(df, ["k"], gap_ms=100).collect()}
        assert stats == {0: (3, 20), 1: (2, 10), 2: (1, 0)}

    def test_sessions_are_per_key(self, spark):
        df = spark.createDataFrame(
            [("a", 0), ("b", 0), ("a", 1000), ("b", 10)],
            "k string, ts long")
        s = sessionize(df, ["k"], gap_ms=100)
        got = {(r.k, r.ts): r.session_idx for r in s.collect()}
        assert got == {("a", 0): 0, ("a", 1000): 1,
                       ("b", 0): 0, ("b", 10): 0}


class TestGapFill:
    def test_locf_with_staleness(self, spark):
        df = spark.createDataFrame(
            [("s", 100, 1.0), ("s", 300, 2.0)],
            "k string, ts long, value double")
        out = gap_fill(df, ["k"], 0, 600, 100, max_stale_ms=150)
        got = {r.t: r.value for r in out.collect()}
        # t=0 nothing; 100 exact; 200 carries (gap 100 <= 150);
        # 300 exact; 400 carries; 500 stale (gap 200 > 150); 600 stale
        assert got == {0: None, 100: 1.0, 200: 1.0, 300: 2.0,
                       400: 2.0, 500: None, 600: None}

    def test_grid_per_series(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 1.0), ("b", 100, 2.0)],
            "k string, ts long, value double")
        out = gap_fill(df, ["k"], 0, 100, 100)
        assert out.count() == 4  # 2 series x 2 steps
