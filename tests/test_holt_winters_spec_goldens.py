"""Goldens ported from AggrOverTimeFunctionsSpec holt_winters /
predict_linear sections (:686-898): the exact smoothing recurrence
(s0 = first sample, b0 = second - first, per-sample double smoothing)
and the shifted-x linear regression extrapolation, replicated in pure
python and asserted against the kernel on fixed trend fixtures and a
multi-step grid.
"""

import math

import pytest

from filodb_spark.kernels.grid import StepGrid
from filodb_spark.kernels.range_fns import range_function

T0 = 100_000
PUB = 10_000


def _hw(arr, sf=0.01, tf=0.1):
    if len(arr) < 2:
        return float("nan")
    s0, b0 = arr[0], arr[1] - arr[0]
    for i in range(1, len(arr)):
        smoothed = sf * arr[i] + (1 - sf) * (s0 + b0)
        b0 = tf * (smoothed - s0) + (1 - tf) * b0
        s0 = smoothed
    return s0


def _pl(samples, duration_s, t_end):
    # shifted-x least squares, x in seconds relative to the window end
    if len(samples) < 2:
        return float("nan")
    n = float(len(samples))
    sx = sy = sxy = sx2 = 0.0
    for ts, v in samples:
        x = (ts - t_end) / 1000.0
        sy += v
        sx += x
        sxy += x * v
        sx2 += x * x
    cov = sxy - sx * sy / n
    var = sx2 - sx * sx / n
    slope = cov / var
    intercept = sy / n - slope * sx / n
    return slope * duration_s + intercept


def _df(spark, values):
    return spark.createDataFrame(
        [("s", T0 + i * PUB, float(v)) for i, v in enumerate(values)],
        "k string, ts long, value double")


TRENDS = [
    [15900.0, 15920.0, 15940.0, 15960.0, 15980.0, 16000.0],
    [23850.0, 23880.0, 23910.0, 23940.0, 23970.0, 24000.0],
    [31800.0, 31840.0, 31880.0, 31920.0, 31960.0, 32000.0],
    [-15900.0, -15920.0, -15940.0, -15960.0, -15980.0, -16000.0],
]


class TestHoltWintersSpecGoldens:
    @pytest.mark.parametrize("values", TRENDS)
    def test_trend_fixtures(self, spark, values):
        # spec window: end 160000, window 100000 -> all 6 samples
        out = range_function(_df(spark, values), "holt_winters", ["k"],
                             StepGrid(160_000, 160_000, 1_000), 100_000,
                             params=(0.01, 0.1)).collect()
        assert len(out) == 1
        assert out[0]["value"] == pytest.approx(_hw(values), abs=1e-10)

    def test_multi_step_grid_matches_model(self, spark):
        values = [float(v) for v in range(1, 41)]
        df = _df(spark, values)
        window = 120_000  # 12 samples + the boundary one
        grid = StepGrid(T0 + 150_000, T0 + 350_000, 50_000)
        got = {r["t"]: r["value"]
               for r in range_function(df, "holt_winters", ["k"], grid,
                                       window, params=(0.01, 0.1)).collect()}
        for t in range(grid.start, grid.end + 1, grid.step):
            in_w = [v for i, v in enumerate(values)
                    if t - window <= T0 + i * PUB <= t]
            want = _hw(in_w)
            if math.isnan(want):
                assert t not in got
            else:
                assert got[t] == pytest.approx(want, abs=1e-9), t


class TestPredictLinearSpecGoldens:
    @pytest.mark.parametrize("duration", [50.0, 600.0])
    def test_matches_shifted_regression(self, spark, duration):
        values = [float(v) for v in range(1, 31)]
        df = _df(spark, values)
        window = 100_000
        grid = StepGrid(T0 + 120_000, T0 + 280_000, 40_000)
        got = {r["t"]: r["value"]
               for r in range_function(df, "predict_linear", ["k"], grid,
                                       window, params=(duration,)).collect()}
        for t in range(grid.start, grid.end + 1, grid.step):
            in_w = [(T0 + i * PUB, v) for i, v in enumerate(values)
                    if t - window <= T0 + i * PUB <= t]
            want = _pl(in_w, duration, t)
            if math.isnan(want):
                assert t not in got
            else:
                assert got[t] == pytest.approx(want, rel=1e-9), t
