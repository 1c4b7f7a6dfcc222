"""Goldens ported from the reference's StitchRvsExecSpec.

Source (behavior only): query/src/test/scala/filodb/query/exec/
StitchRvsExecSpec.scala:24-144 — overlapping range-vector merges where
conflicting real samples at a timestamp produce NaN, NaN-vs-real picks
the real sample, and a single vector passes through.
"""

import math

import pytest

from filodb_spark.kernels.stitch import stitch_rvs

NAN = float("nan")


def _merge(spark, rvs, **kw):
    frames = [spark.createDataFrame([("s", t, float(v)) for t, v in rv],
                                    "k string, t long, value double")
              for rv in rvs]
    out = stitch_rvs(frames, series_cols=["k"], **kw).collect()
    return {r["t"]: r["value"] for r in out}


def _check(got, expected):
    assert sorted(got) == [t for t, _ in expected]
    for t, want in expected:
        if math.isnan(want):
            assert math.isnan(got[t]), t
        else:
            assert got[t] == want, t


class TestStitchMergeGoldens:
    RV1 = [(10, 3), (20, 3), (30, 3), (40, 3), (50, 3)]
    RV2 = [(30, 4), (50, 4), (60, 3), (70, 3), (80, 3), (90, 3), (100, 3)]

    def test_two_overlapping(self, spark):
        # :24-54 — conflicting reals at 30/50 -> NaN
        expected = [(10, 3), (20, 3), (30, NAN), (40, 3), (50, NAN),
                    (60, 3), (70, 3), (80, 3), (90, 3), (100, 3)]
        _check(_merge(spark, [self.RV1, self.RV2]), expected)

    def test_two_overlapping_with_nans(self, spark):
        # :56-93 — NaN-vs-real picks the real sample; real-vs-real
        # conflict still NaN
        rv1 = [(10, 3), (20, 3), (30, 3), (40, 3), (50, 3),
               (60, NAN), (70, NAN), (80, NAN), (90, NAN), (100, NAN)]
        rv2 = [(10, NAN), (20, NAN), (30, 4), (50, 4),
               (60, 3), (70, 3), (80, 3), (90, 3), (100, 3)]
        expected = [(10, 3), (20, 3), (30, NAN), (40, 3), (50, NAN),
                    (60, 3), (70, 3), (80, 3), (90, 3), (100, 3)]
        _check(_merge(spark, [rv1, rv2]), expected)

    def test_single_rv_passthrough(self, spark):
        # :95-107
        rv = [(10, 3), (20, 3), (30, NAN), (40, 3), (50, NAN), (60, 3)]
        _check(_merge(spark, [rv]), rv)

    def test_three_overlapping(self, spark):
        # :109-144
        rv3 = [(30, 4), (55, 3)]
        expected = [(10, 3), (20, 3), (30, NAN), (40, 3), (50, NAN),
                    (55, 3), (60, 3), (70, 3), (80, 3), (90, 3), (100, 3)]
        _check(_merge(spark, [self.RV1, self.RV2, rv3]), expected)

    def test_approx_equal_resolves_near_ties(self, spark):
        # :86-91 — with the approximately-equal check, reals that
        # truncate to the same value at the tolerance merge cleanly
        rv1 = [(10, 3.00000000001)]
        rv2 = [(10, 3.00000000002)]
        got = _merge(spark, [rv1, rv2], approx_equal=True,
                     tolerance_decimals=10)
        assert got[10] == pytest.approx(3.0, abs=1e-9)
        got_strict = _merge(spark, [rv1, rv2])
        assert math.isnan(got_strict[10])
