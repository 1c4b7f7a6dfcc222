"""WindowIteratorSpec goldens, evaluated by EVERY plan family.

Sample tables and expected outputs ported from the reference's
window-iterator tests (query/src/test/scala/filodb/query/exec/
WindowIteratorSpec.scala — values only, the execution model here is the
declarative DataFrame plans). Each golden is asserted against the
grid-explode, tiled, and as-of paths, so the reference's
SlidingWindowIterator/ChunkedWindowIterator behavior pins all three.

Window semantics note: the reference runs these with
inclusive-range=true (filodb-defaults.conf), which the sum golden
demonstrates — the sample at exactly t-window counts (350000 -> 12
includes the 250000 boundary sample). The two staleness goldens were
checked free of start-boundary coincidences, so the reference's
window=stale+1 exclusive-start formulation equals our inclusive
[t-window, t] at window=stale.
"""

import math

import pytest

from filodb_spark.kernels.grid import StepGrid
from filodb_spark.kernels.range_fns import range_function

MODES = [("explode", False), ("tiled", True), ("asof", "asof")]


def _run(spark, samples, fn, grid, window, mode):
    df = spark.createDataFrame([("s", int(t), float(v)) for t, v in samples],
                               "series string, ts long, value double")
    out = range_function(df, fn, ["series"], grid, window, tiling=mode)
    return {r["t"]: r["value"] for r in out.collect()
            if not (r["value"] is None or math.isnan(r["value"]))}


# WindowIteratorSpec.scala:183-217 — SumOverTime after the series stops,
# NaN end-of-series marker, sparse windows
SUM_SAMPLES = [
    (100000, 1), (153000, 2), (250000, 3), (270000, 4), (280000, 5),
    (360000, 6), (430000, 7), (690000, 8), (700000, 9),
    (710000, float("nan")),
]
SUM_EXPECTED = {150000: 1.0, 250000: 5.0, 350000: 12.0, 450000: 13.0,
                750000: 17.0}


@pytest.mark.parametrize("name,mode", MODES)
def test_sum_over_time_golden(spark, name, mode):
    got = _run(spark, SUM_SAMPLES, "sum_over_time",
               StepGrid(50000, 1100000, 100000), 100000, mode)
    # reference emits NaN rows for empty windows and filters them; our
    # engine emits no row — the non-NaN sets must match exactly
    assert got == SUM_EXPECTED, name


# WindowIteratorSpec.scala:220-256 — "rate ... matching the prometheus
# rate function"; window/step = 20 so the auto path takes the tiled plan
RATE_SAMPLES = [
    (1548191486000, 84), (1548191496000, 152), (1548191506000, 195),
    (1548191516000, 222), (1548191526000, 245), (1548191536000, 251),
    (1548191546000, 329), (1548191556000, 374), (1548191566000, 431),
]
RATE_EXPECTED = {
    1548191496000: 0.34,
    1548191511000: 0.555,
    1548191526000: 0.60375,
    1548191541000: 0.668,
    1548191556000: 1.0357142857142858,
}


@pytest.mark.parametrize("name,mode", MODES + [("auto", None)])
def test_prometheus_rate_golden(spark, name, mode):
    got = _run(spark, RATE_SAMPLES, "rate",
               StepGrid(1548191496000, 1548191796000, 15000), 300000, mode)
    for t, want in RATE_EXPECTED.items():
        assert got[t] == pytest.approx(want, abs=1e-10), (name, t)


# WindowIteratorSpec.scala (3-minute window Last): samples an hour
# apart, each visible for exactly the 180s window on the 15s grid
STALE_SAMPLES = [
    (1540832354000, 1), (1540835954000, 2), (1540839554000, 3),
    (1540843154000, 4), (1540846754000, 237), (1540850354000, 330),
]
LAST_3MIN_EXPECTED = dict(
    [(1540846755000 + 15000 * i, 237.0) for i in range(12)]
    + [(1540850355000 + 15000 * i, 330.0) for i in range(12)])


@pytest.mark.parametrize("name,mode", MODES)
def test_last_3min_window_golden(spark, name, mode):
    got = _run(spark, STALE_SAMPLES, "last_over_time",
               StepGrid(1540845090000, 1540855905000, 15000), 180000, mode)
    # the grid starts mid-gap: instants before the 237-sample fall in
    # the reach of no sample (values 1..4 are hours stale) — the
    # reference golden's non-NaN set is exactly the two 12-step runs
    assert got == LAST_3MIN_EXPECTED, name


# WindowIteratorSpec.scala (default staleness lastSample): same series
# through the default 5m lookback -> 20 visible steps per sample
LAST_5MIN_EXPECTED = dict(
    [(1540846755000 + 15000 * i, 237.0) for i in range(20)]
    + [(1540850355000 + 15000 * i, 330.0) for i in range(20)])


@pytest.mark.parametrize("name,mode", MODES)
def test_last_default_staleness_golden(spark, name, mode):
    got = _run(spark, STALE_SAMPLES, "last_over_time",
               StepGrid(1540845090000, 1540855905000, 15000), 300000, mode)
    assert got == LAST_5MIN_EXPECTED, name


# WindowIteratorSpec.scala ("should not return NaN if value is present
# at time - staleSampleAfterMs"): the boundary sample stays visible
BOUNDARY_SAMPLES = [(100000, 100), (153000, 160), (200000, 200)]
BOUNDARY_EXPECTED = {100000: 100.0, 200000: 200.0, 300000: 200.0,
                     400000: 200.0, 500000: 200.0}


@pytest.mark.parametrize("name,mode", MODES)
def test_staleness_boundary_golden(spark, name, mode):
    got = _run(spark, BOUNDARY_SAMPLES, "last_over_time",
               StepGrid(100000, 600000, 100000), 300000, mode)
    assert got == BOUNDARY_EXPECTED, name
