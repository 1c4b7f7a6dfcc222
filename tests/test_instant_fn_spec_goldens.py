"""Goldens ported from the reference's InstantFunctionSpec.

Sources (behavior only, no code):
- query/src/test/scala/filodb/query/exec/rangefn/InstantFunctionSpec.scala
  (math-fn edge values :94-178, date-time goldens :392-435, or_vector
  empty-source semantics :236-297, histogram goldens :315-390)
- core/src/test/scala/filodb.core/TestData.scala:375-399,469-480
  (linearHistSeries / histogramRV fixture reproduced in rows)

scala.math and C math99 agree on every value asserted here, so the
expected values are computed with python `math` where the spec computes
them with scala.math, and hand-copied where the spec hard-codes them.
"""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.instant_fns import instant_fn_expr
from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

T0 = 1_700_000_000_000
INF = float("inf")
NAN = float("nan")

# InstantFunctionSpec "special cases" sample values (:98-117) plus -Inf
SPECIAL = [INF, -INF, 4.5, 0.0, -2.1, -0.1, 0.3, 5.9, NAN, 3.3, 3239.3423,
           94935.1523, 5.1, 5.6, 4.6, 4.4, 5.4]


def _feq(a, b):
    if math.isnan(a):
        return math.isnan(b)
    if math.isinf(a):
        return a == b
    return a == pytest.approx(b, abs=1e-9, rel=1e-12)


def _py_round(v, nearest=1.0):
    # RoundImpl: toNearestInverse = 1/nearest; floor(v*inv + 0.5)/inv,
    # NaN/Inf passthrough (InstantFunctionSpec.scala:157-178)
    if math.isnan(v) or math.isinf(v):
        return v
    inv = 1.0 / nearest
    return math.floor(v * inv + 0.5) / inv


def _py_ln(v):
    if v == 0.0:
        return -INF
    if v < 0 or math.isnan(v):
        return NAN
    return math.log(v)


def _py_log(base):
    def f(v):
        ln = _py_ln(v)
        return ln / math.log(base) if not math.isnan(ln) else ln
    return f


def _py_exp(v):
    # java.lang.Math.exp overflows to +Inf; python math raises
    if math.isnan(v):
        return NAN
    try:
        return math.exp(v)
    except OverflowError:
        return INF


PY_FN = {
    "abs": abs,
    "ceil": lambda v: v if math.isnan(v) or math.isinf(v) else math.ceil(v),
    "floor": lambda v: v if math.isnan(v) or math.isinf(v) else math.floor(v),
    "exp": _py_exp,
    "ln": _py_ln,
    "log10": _py_log(10.0),
    "log2": _py_log(2.0),
    "sqrt": lambda v: math.sqrt(v) if v >= 0 else (v if math.isnan(v) else NAN),
    "sgn": lambda v: v if math.isnan(v) else float((v > 0) - (v < 0)),
}


class TestMathFnSpecialValues:
    """InstantFunctionSpec fireInstantFunctionTests over NaN/Inf/negatives."""

    @pytest.fixture(scope="class")
    def vals(self, spark):
        df = spark.createDataFrame([(v,) for v in SPECIAL], "v double")

        def run(fn, params=()):
            out = df.select(
                instant_fn_expr(fn, F.col("v"), params).alias("r")).collect()
            return [r["r"] for r in out]
        return run

    @pytest.mark.parametrize("fn", sorted(PY_FN))
    def test_matches_scala_math(self, vals, fn):
        got = vals(fn)
        for v, g in zip(SPECIAL, got):
            assert g is not None, (fn, v)
            assert _feq(PY_FN[fn](v), g), (fn, v, g)

    def test_clamp_max_min(self, vals):
        for v, g in zip(SPECIAL, vals("clamp_max", (4.0,))):
            assert _feq(min(v, 4.0) if not math.isnan(v) else NAN, g), v
        for v, g in zip(SPECIAL, vals("clamp_min", (4.0,))):
            assert _feq(max(v, 4.0) if not math.isnan(v) else NAN, g), v

    def test_round(self, vals):
        for v, g in zip(SPECIAL, vals("round")):
            assert _feq(_py_round(v), g), (v, g)
        for v, g in zip(SPECIAL, vals("round", (10.0,))):
            assert _feq(_py_round(v, 10.0), g), (v, g)


class TestDateTimeGoldens:
    """InstantFunctionSpec.scala:392-435 — exact epochs incl. leap day,
    leap-second boundary, and a Sunday; NaN passthrough."""

    # epoch-seconds sample values, in spec order
    EPOCHS = [1456790399.0,  # 2016-02-29 23:59:59 (leap day)
              1456790400.0,  # 2016-03-01 00:00:00
              1230768000.0,  # 2009-01-01 00:00:00 (just after leap second)
              1230767999.0,  # 2008-12-31 23:59:59 (just before)
              1569179748.0]  # 2019-09-22 19:15:48 (Sunday)
    GOLD = {
        "month": [2.0, 3.0, 1.0, 12.0, 9.0],
        "year": [2016.0, 2016.0, 2009.0, 2008.0, 2019.0],
        "minute": [59.0, 0.0, 0.0, 59.0, 15.0],
        "hour": [23.0, 0.0, 0.0, 23.0, 19.0],
        "days_in_month": [29.0, 31.0, 31.0, 31.0, 30.0],
        "day_of_month": [29.0, 1.0, 1.0, 31.0, 22.0],
        "day_of_week": [1.0, 2.0, 4.0, 3.0, 0.0],
    }

    @pytest.mark.parametrize("fn", sorted(GOLD))
    def test_golden_epochs(self, spark, fn):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(self.EPOCHS + [NAN, NAN])],
            "i long, v double")
        got = [r["r"] for r in
               df.orderBy("i")
                 .select(instant_fn_expr(fn, F.col("v")).alias("r"))
                 .collect()]
        assert got[:5] == self.GOLD[fn], fn
        assert math.isnan(got[5]) and math.isnan(got[6]), fn


@pytest.fixture(scope="module")
def small_engine(spark):
    rows = [({"__name__": "m", "job": "web"}, T0 + i * 10_000, float(i))
            for i in range(13)]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


class TestOrVectorEmptySource:
    """InstantFunctionSpec.scala:236-297: or_vector on an empty source
    emits one static series over the step grid; any other function on an
    empty source stays empty; a non-empty source is passed through."""

    S, E, STEP = T0, T0 + 100_000, 20_000

    def test_empty_source_emits_static_series(self, small_engine):
        res = small_engine.query_range(
            "or_vector(nosuch_metric, 1.0)", self.S, self.E, self.STEP
        ).collect()
        assert len(res) == 6
        assert sorted(r["t"] for r in res) == \
            [self.S + i * self.STEP for i in range(6)]
        assert all(r["value"] == 1.0 for r in res)
        assert all(dict(r["labels"] or {}) == {} for r in res)

    def test_empty_source_other_fn_stays_empty(self, small_engine):
        res = small_engine.query_range(
            "ceil(nosuch_metric)", self.S, self.E, self.STEP).collect()
        assert res == []

    def test_nonempty_source_transformed_not_replaced(self, small_engine):
        res = small_engine.query_range(
            "or_vector(m, 99.0)", self.S, self.E, self.STEP).collect()
        assert len(res) == 6
        got = {r["t"]: r["value"] for r in res}
        # instant values of m at each step (value == step index * 2)
        assert got == {self.S + i * self.STEP: float(2 * i) for i in range(6)}


def _linear_hist_rows(metric, n_samples, inf_bucket):
    """linearHistSeries, one series (TestData.scala:375-399): at sample n,
    buckets[b] += 1 for b >= n % 8; cumulative les 2,4,...,256 (or +Inf top)."""
    if inf_bucket:
        les = [float(2 ** (b + 1)) for b in range(7)] + [INF]
    else:
        les = [float(2 ** (b + 1)) for b in range(8)]
    buckets = [0.0] * 8
    rows = []
    for n in range(n_samples):
        for b in range(n % 8, 8):
            buckets[b] += 1.0
        rows.append(({"__name__": metric, "dc": "0"}, T0 + n * 10_000,
                     float(sum(buckets)), float(buckets[-1]),
                     (les, list(buckets))))
    return rows


@pytest.fixture(scope="module")
def hist_spec_engine(spark):
    rows = _linear_hist_rows("hl", 10, False) + \
        _linear_hist_rows("hli", 10, True)
    hist_df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, sum double, count double, "
              "hist struct<les: array<double>, values: array<double>>")
    gauge_df = spark.createDataFrame(
        [], "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(gauge_df, hist_df=hist_df,
                                       hist_metrics=("hl", "hli")))


def _series_vals(engine, promql, n):
    res = engine.query_range(promql, T0, T0 + (n - 1) * 10_000, 10_000
                             ).collect()
    got = {r["t"]: r["value"] for r in res}
    return [got.get(T0 + i * 10_000, NAN) for i in range(n)]


class TestHistogramSpecGoldens:
    def test_histogram_quantile_golden(self, hist_spec_engine):
        # spec expected for the first 8 samples (:317); samples 9-10
        # hand-computed with the same linear-interp rule
        gold = [0.8, 1.6, 2.4, 3.2, 4.0, 5.6, 7.2, 9.6, 6.4, 4.0]
        got = _series_vals(hist_spec_engine,
                           "histogram_quantile(0.4, hl)", 10)
        assert got == pytest.approx(gold)

    def test_histogram_bucket_golden(self, hist_spec_engine):
        # :377-390 — le=16 cumulative counts; +Inf bucket counts 1..10;
        # nonexistent bucket -> NaN
        gold16 = [1.0, 2.0, 3.0, 4.0, 4.0, 4.0, 4.0, 4.0, 5.0, 6.0]
        got = _series_vals(hist_spec_engine,
                           "histogram_bucket(16.0, hli)", 10)
        assert got == pytest.approx(gold16)
        got_inf = _series_vals(hist_spec_engine,
                               "histogram_bucket(Inf, hli)", 10)
        assert got_inf == pytest.approx([float(i + 1) for i in range(10)])
        got_missing = _series_vals(hist_spec_engine,
                                   "histogram_bucket(9.0, hli)", 10)
        assert all(math.isnan(v) for v in got_missing)


class TestParamValidation:
    """InstantFunctionSpec.scala:180-234 "should validate invalid
    function params" — missing/extra scalar params are plan-time
    requirement failures, never a silent default."""

    CASES = [
        "clamp_max(m)",       # Cannot use ClampMax without an upper limit
        "clamp_min(m)",       # Cannot use ClampMin without a lower limit
        "clamp(m, 1)",        # Clamp requires both limits
        "sgn(m, 1)",          # no additional parameters allowed
        "sqrt(m, 1)",
        "round(m, 1, 2)",     # only ONE optional parameter for Round
        "abs(m, 3)",
    ]

    @pytest.mark.parametrize("q", CASES)
    def test_rejects(self, small_engine, q):
        with pytest.raises(Exception, match="parameter|argument"):
            small_engine.query_range(q, T0, T0, 10_000).collect()

    def test_legal_arities_pass(self, small_engine):
        for q in ("round(m)", "round(m, 1)", "clamp(m, 1, 2)",
                  "clamp_max(m, 1)", "clamp_min(m, 1)"):
            small_engine.query_range(q, T0, T0, 10_000).collect()
