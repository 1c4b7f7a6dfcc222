"""Tiled (two-level) window path: equivalence with the grid-explode path
and plan-shape assertions.

The tiled plan (kernels/range_fns.py `_tiled_range_function`) must produce
the same rows and values as the explode plan for every TILEABLE function,
including the adversarial cases: samples exactly on grid instants
(inclusive [t-window, t] boundary), counter resets, NaN staleness markers,
single-sample windows, and windows clipped at the grid edges.
"""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.grid import StepGrid
from filodb_spark.kernels import range_fns
from filodb_spark.kernels.range_fns import TILEABLE, range_function

STEP = 10_000
WINDOW = 320_000  # window/step = 32 >= TILE_RATIO -> auto-tiled
GRID = StepGrid(1_000_000, 1_600_000, STEP)

PARAMS = {"quantile_over_time": (0.9,), "predict_linear": (3600.0,),
          "holt_winters": (0.5, 0.1)}


@pytest.fixture(scope="module")
def samples(spark):
    # deterministic LCG; boundary-aligned ts every 7th sample; resets for
    # counter kernels; NaN staleness markers; two series with different
    # densities (series b sparse: some windows hold 0 or 1 sample)
    rows, x = [], 12345
    for i in range(400):
        x = (1103515245 * x + 12345) % (1 << 31)
        ts = 990_000 + i * 1_700
        if i % 7 == 0:
            ts = GRID.start + (i // 7) * STEP  # exactly on a grid instant
        v = float(x % 10_000) / 7.0
        if i % 31 == 0:
            v = float("nan")
        rows.append(("a", ts, v))
    for i in range(12):
        rows.append(("b", 1_000_000 + i * 50_000, float(i * i)))
    return spark.createDataFrame(rows, "series string, ts long, value double")


def _rows_map(df):
    out = {}
    for r in df.collect():
        out[(r["series"], r["t"])] = r["value"]
    return out


def _same(a, b):
    if a is None or b is None:
        return a is b
    if math.isnan(a):
        return math.isnan(b)
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


@pytest.mark.parametrize("fn", sorted(TILEABLE))
def test_tiled_equals_explode(spark, samples, fn):
    params = PARAMS.get(fn, ())
    tiled = range_function(samples, fn, ["series"], GRID, WINDOW,
                           params=params, tiling=True)
    plain = range_function(samples, fn, ["series"], GRID, WINDOW,
                           params=params, tiling=False)
    a, b = _rows_map(tiled), _rows_map(plain)
    assert set(a) == set(b)
    bad = [(k, a[k], b[k]) for k in a if not _same(a[k], b[k])]
    assert not bad, f"{fn}: {bad[:5]} (+{len(bad)} total)"


def test_auto_selects_tiled_above_ratio(spark, samples):
    plan = range_function(samples, "rate", ["series"], GRID, WINDOW) \
        ._jdf.queryExecution().executedPlan().toString()
    # two aggregation levels (tile partials + window combine), explode of
    # the *partials* between them
    assert plan.count("HashAggregate") >= 4
    assert "Generate explode" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_auto_keeps_explode_below_ratio(spark, samples):
    grid = StepGrid(1_000_000, 1_600_000, 100_000)
    plan = range_function(samples, "sum_over_time", ["series"], grid, 200_000) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") == 2  # single partial+final pair


def test_non_tileable_fn_ignores_ratio(spark, samples):
    # quantile keeps the explode path even at ratio 32 (documented boundary)
    out = range_function(samples, "quantile_over_time", ["series"], GRID,
                         WINDOW, params=(0.9,))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" in plan


def test_regression_numerics_at_epoch_timestamps(spark):
    """deriv's tiled moments must stay window-magnitude at real epoch
    timestamps (a global-reference centering would square 1.7e12 into
    catastrophic cancellation — the reason _tiled_regression centers
    per group)."""
    t0 = 1_700_000_000_000
    df = spark.createDataFrame(
        [("a", t0 + i * 1_700, 2.0 + 0.001 * i + (i % 7) * 0.01)
         for i in range(2_000)],
        "series string, ts long, value double")
    grid = StepGrid(t0 + 500_000, t0 + 3_000_000, 10_000)
    a = _rows_map(range_function(df, "deriv", ["series"], grid, 320_000,
                                 tiling=True))
    b = _rows_map(range_function(df, "deriv", ["series"], grid, 320_000,
                                 tiling=False))
    assert set(a) == set(b) and a
    for k in a:
        assert _same(a[k], b[k]), (k, a[k], b[k])


def test_force_tiled_rejects_non_tileable(spark, samples):
    with pytest.raises(ValueError, match="not tileable"):
        range_function(samples, "quantile_over_time", ["series"], GRID,
                       WINDOW, params=(0.9,), tiling=True).collect()


def test_carry_cols_survive_tiling(spark):
    df = spark.createDataFrame(
        [("a", "lbl-a", 1_000_000 + i * 1_000, float(i)) for i in range(200)],
        "series string, extra string, ts long, value double")
    out = range_function(df, "sum_over_time", ["series"],
                         StepGrid(1_000_000, 1_200_000, 5_000), 160_000,
                         carry_cols=["extra"], tiling=True)
    rows = out.collect()
    assert rows and all(r["extra"] == "lbl-a" for r in rows)


def test_tile_count_independent_of_density(spark):
    """The scale property itself: group (tile) count is bounded by
    ~2*n_steps per series no matter how many samples land in each gap."""
    grid = StepGrid(0, 100_000, 1_000)
    dense = spark.createDataFrame(
        [("a", i * 10, 1.0) for i in range(10_000)],
        "series string, ts long, value double")
    from filodb_spark.kernels.grid import step_bounds
    k_min, k_max = step_bounds(grid, 64_000, F.col("ts"))
    n_groups = (dense.select(k_min.alias("a"), k_max.alias("b"))
                .distinct().count())
    assert n_groups <= 2 * grid.n_steps + 2
