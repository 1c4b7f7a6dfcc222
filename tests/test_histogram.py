"""Histogram kernel tests — goldens per Histogram.scala quantile
semantics (linear interpolation, +Inf top bucket rule)."""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.grid import StepGrid
from filodb_spark.kernels.histogram import (bucketize, hist_fraction,
                                            hist_quantile,
                                            hist_range_function, hist_sum)

INF = float("inf")


def hist_df(spark, rows):
    # rows: (series, les, values)
    return spark.createDataFrame(
        [(s, (les, vals)) for s, les, vals in rows],
        "series string, hist struct<les: array<double>, values: array<double>>")


def q_of(spark, les, values, q):
    df = hist_df(spark, [("a", les, values)])
    return df.select(hist_quantile(q, F.col("hist")).alias("v")).first()["v"]


class TestQuantile:
    LES = [2.0, 4.0, 8.0, 16.0, INF]

    def test_interpolation(self, spark):
        vals = [10.0, 20.0, 30.0, 40.0, 50.0]
        # q=0.5: rank=25 -> bucket (4,8]: lo_cum=20 -> 4 + 4*(5/10) = 6
        assert q_of(spark, self.LES, vals, 0.5) == pytest.approx(6.0)

    def test_first_bucket_from_zero(self, spark):
        vals = [40.0, 40.0, 40.0, 40.0, 50.0]
        # q=0.5: rank=25 -> first bucket: 0 + 2*(25/40) = 1.25
        assert q_of(spark, self.LES, vals, 0.5) == pytest.approx(1.25)

    def test_top_bucket_returns_last_finite_le(self, spark):
        vals = [10.0, 20.0, 30.0, 40.0, 100.0]
        assert q_of(spark, self.LES, vals, 0.99) == pytest.approx(16.0)

    def test_nan_cases(self, spark):
        assert math.isnan(q_of(spark, [2.0, 4.0], [1.0, 2.0], 0.5))  # no +Inf
        assert math.isnan(q_of(spark, self.LES, [0.0] * 5, 0.5))     # empty
        assert q_of(spark, self.LES, [1.0] * 5, -1) == -INF
        assert q_of(spark, self.LES, [1.0] * 5, 2) == INF


class TestFraction:
    def test_fraction(self, spark):
        les = [2.0, 4.0, INF]
        vals = [10.0, 30.0, 40.0]
        df = hist_df(spark, [("a", les, vals)])
        # [0,2] -> 10/40; [2,4] -> 20/40; [0,3] -> (10 + 10)/40
        got = df.select(
            hist_fraction(0.0, 2.0, F.col("hist")).alias("a"),
            hist_fraction(2.0, 4.0, F.col("hist")).alias("b"),
            hist_fraction(0.0, 3.0, F.col("hist")).alias("c")).first()
        assert got["a"] == pytest.approx(0.25)
        assert got["b"] == pytest.approx(0.5)
        assert got["c"] == pytest.approx(0.5)


class TestBucketizeSumRate:
    def test_bucketize(self, spark):
        df = spark.createDataFrame(
            [("a", float(v)) for v in [1, 2, 3, 5, 9]], "series string, value double")
        h = bucketize(df, ["series"], [2.0, 4.0, 8.0]).first()["hist"]
        assert list(h["les"]) == [2.0, 4.0, 8.0, INF]
        assert list(h["values"]) == [2.0, 3.0, 4.0, 5.0]

    def test_hist_sum(self, spark):
        les = [1.0, INF]
        df = hist_df(spark, [("a", les, [1.0, 2.0]), ("b", les, [3.0, 4.0])])
        out = hist_sum(df.withColumn("g", F.lit("x")), ["g"]).first()["hist"]
        assert list(out["values"]) == [4.0, 6.0]

    def test_hist_rate_per_bucket(self, spark):
        # cumulative histogram over time: rate per bucket
        les = [1.0, INF]
        rows = [("a", int(ts), (les, [float(v), float(2 * v)]))
                for ts, v in [(0, 0), (10_000, 10), (20_000, 20)]]
        df = spark.createDataFrame(
            rows, "series string, ts long, "
                  "hist struct<les: array<double>, values: array<double>>")
        grid = StepGrid(20_000, 20_000, 10_000)
        out = hist_range_function(df, "rate", ["series"], grid, 20_000)
        h = out.first()["hist"]
        # delta 20 over exactly-spanning 20s window -> 1/s; bucket2: 2/s
        assert list(h["les"]) == les
        assert h["values"][0] == pytest.approx(1.0)
        assert h["values"][1] == pytest.approx(2.0)
