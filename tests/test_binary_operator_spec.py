"""Goldens ported from the reference's BinaryOperatorSpec.

Source (behavior only): query/src/test/scala/filodb/query/exec/rangefn/
BinaryOperatorSpec.scala — scalar-vector arithmetic over NaN/Inf/negative
samples (:48-177), filter-comparison semantics that emit the LHS operand
(:181-205), and `bool`-comparison NaN propagation (:207-246).

Expected values are computed with python float ops, which follow IEEE-754
like scala.math on every case asserted here (pow avoids the single
java-vs-C99 divergence, 1.0 ** NaN, by not including 1.0 in the sample).
"""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import scalar_op, vector_binary_op

NAN = float("nan")
INF = float("inf")

# BinaryOperatorSpec sample values: "special cases" battery (:103-125)
# plus the NaN battery samples (:68-101) and -Inf
VALS = [INF, -INF, 4.5, 0.0, -2.1, 5.9, NAN, 3.3, 5.6, 4.6, 4.4, 5.4,
        3239.3423, 94935.1523]
MATH_OPS = ["+", "-", "*", "/", "%", "^"]
CMP_OPS = ["==", "!=", ">", "<", ">=", "<="]


def _py_math(op, l, r):
    if math.isnan(l) or math.isnan(r):
        # pow: x ** 0 == 1 even for NaN x (java and C99 agree)
        if op == "^" and r == 0.0:
            return 1.0
        return NAN
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        v = l * r
        return v if v == v or math.isnan(l * r) else v
    if op == "/":
        if r == 0.0:
            return INF if l > 0 else -INF if l < 0 else NAN
        return l / r
    if op == "%":
        # java %: Inf % x = NaN (python fmod raises); x % Inf = x
        if math.isinf(l) or r == 0.0:
            return NAN
        return math.fmod(l, r)
    if op == "^":
        try:
            return l ** r
        except OverflowError:
            return INF
    raise AssertionError(op)


def _py_cmp(op, l, r):
    # IEEE: NaN compares false except !=
    if math.isnan(l) or math.isnan(r):
        return op == "!="
    return {"==": l == r, "!=": l != r, ">": l > r, "<": l < r,
            ">=": l >= r, "<=": l <= r}[op]


def _feq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if math.isnan(a):
        return math.isnan(b)
    if math.isinf(a):
        return a == b
    return b == pytest.approx(a, rel=1e-12, abs=1e-12)


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(VALS)], "i long, value double").cache()


class TestScalarVectorMath:
    @pytest.mark.parametrize("op", MATH_OPS)
    @pytest.mark.parametrize("scalar", [5.0, NAN])
    @pytest.mark.parametrize("prefix", [True, False])
    def test_matches_ieee(self, sample_df, op, scalar, prefix):
        got = {r["i"]: r["value"]
               for r in scalar_op(sample_df, op, scalar,
                                  scalar_on_lhs=prefix).collect()}
        for i, v in enumerate(VALS):
            l, r = (scalar, v) if prefix else (v, scalar)
            want = _py_math(op, l, r)
            assert _feq(want, got[i]), (op, scalar, prefix, v, want, got[i])


class TestScalarVectorComparisons:
    @pytest.mark.parametrize("op", CMP_OPS)
    @pytest.mark.parametrize("scalar", [5.0, NAN])
    @pytest.mark.parametrize("prefix", [True, False])
    def test_filter_emits_lhs(self, sample_df, op, scalar, prefix):
        got = {r["i"]: r["value"]
               for r in scalar_op(sample_df, op, scalar,
                                  scalar_on_lhs=prefix).collect()}
        for i, v in enumerate(VALS):
            l, r = (scalar, v) if prefix else (v, scalar)
            if _py_cmp(op, l, r):
                assert i in got and _feq(l, got[i]), (op, scalar, prefix, v)
            else:
                assert i not in got, (op, scalar, prefix, v)

    @pytest.mark.parametrize("op", CMP_OPS)
    @pytest.mark.parametrize("scalar", [5.0, NAN])
    def test_bool_nan_propagates(self, sample_df, op, scalar):
        got = {r["i"]: r["value"]
               for r in scalar_op(sample_df, op, scalar, scalar_on_lhs=True,
                                  bool_modifier=True).collect()}
        assert len(got) == len(VALS)  # bool keeps every row
        for i, v in enumerate(VALS):
            if math.isnan(scalar) or math.isnan(v):
                want = NAN
            else:
                want = 1.0 if _py_cmp(op, scalar, v) else 0.0
            assert _feq(want, got[i]), (op, scalar, v, want, got[i])


class TestVectorVectorComparisonNaN:
    """Vector-vector comparisons share the IEEE discipline: the NaN
    sample must not match `==` / order comparisons, must match `!=`,
    and must produce NaN under `bool` (same BinaryOperatorFunction)."""

    @pytest.fixture(scope="class")
    def pair(self, spark):
        mk = lambda rows: spark.createDataFrame(
            [({"inst": str(i)}, 1000, float(v)) for i, v in enumerate(rows)],
            "labels map<string,string>, t long, value double")
        return mk([NAN, 4.6, 0.0]), mk([5.6, 4.4, 5.4])

    def test_filter(self, pair):
        l, r = pair
        got = {r["labels"]["inst"]: r["value"]
               for r in vector_binary_op(l, r, ">").collect()}
        assert got == {"1": 4.6}  # NaN > 5.6 false; 0 > 5.4 false

        got_ne = {r["labels"]["inst"]: r["value"]
                  for r in vector_binary_op(l, r, "!=").collect()}
        assert set(got_ne) == {"0", "1", "2"}  # NaN != x is true
        assert math.isnan(got_ne["0"]) and got_ne["1"] == 4.6

    def test_bool(self, pair):
        l, r = pair
        got = {r["labels"]["inst"]: r["value"]
               for r in vector_binary_op(l, r, ">",
                                         bool_modifier=True).collect()}
        assert math.isnan(got["0"])
        assert got["1"] == 1.0 and got["2"] == 0.0


class TestEngineScalarPrefixComparison:
    """Through the parser+compiler: `5 > m` keeps matching series with the
    SCALAR as the emitted value (BinaryOperatorSpec:184-205)."""

    def test_prefix_emits_scalar(self, spark):
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.promql.compiler import TsStore
        T0 = 1_700_000_000_000
        rows = [({"__name__": "m", "inst": str(i)}, T0, float(v))
                for i, v in enumerate([3.0, 7.0])]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        eng = PromQLEngine(spark, TsStore(df))
        res = eng.query_range("5 > m", T0, T0, 10_000).collect()
        assert len(res) == 1
        assert res[0]["labels"]["inst"] == "0" and res[0]["value"] == 5.0
        # suffix form keeps the vector value
        res2 = eng.query_range("m > 5", T0, T0, 10_000).collect()
        assert len(res2) == 1
        assert res2[0]["labels"]["inst"] == "1" and res2[0]["value"] == 7.0


class TestScalarHistogramMath:
    """BinaryOperatorSpec.scala:403-461 — ScalarOperationMapper on the
    histogram schema applies math bucket-wise; bounds unchanged."""

    @pytest.fixture(scope="class")
    def hist_engine(self, spark):
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.promql.compiler import TsStore
        T0 = 1_700_000_000_000
        rows = [({"__name__": "hl", "job": "a"}, T0, 40.0, 4.0,
                 ([1.0, 2.0, INF], [1.0, 2.0, 4.0]))]
        hist_df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, sum double, "
                  "count double, "
                  "hist struct<les: array<double>, values: array<double>>")
        gauge_df = spark.createDataFrame(
            [], "labels map<string,string>, ts long, value double")
        return PromQLEngine(spark, TsStore(gauge_df, hist_df=hist_df,
                                           hist_metrics=("hl",))), T0

    def test_suffix_multiply(self, hist_engine):
        eng, T0 = hist_engine
        r = eng.query_range("hl * 2", T0, T0, 10_000).collect()
        assert r[0]["hist"]["les"] == [1.0, 2.0, INF]
        assert r[0]["hist"]["values"] == [2.0, 4.0, 8.0]

    def test_prefix_divide(self, hist_engine):
        eng, T0 = hist_engine
        r = eng.query_range("2 / hl", T0, T0, 10_000).collect()
        assert r[0]["hist"]["values"] == [2.0, 1.0, 0.5]

    def test_quantile_scale_invariant(self, hist_engine):
        eng, T0 = hist_engine
        a = eng.query_range("histogram_quantile(0.5, hl)",
                            T0, T0, 10_000).collect()[0]["value"]
        b = eng.query_range("histogram_quantile(0.5, hl * 2)",
                            T0, T0, 10_000).collect()[0]["value"]
        assert a == b == 2.0

    def test_comparison_rejected(self, hist_engine):
        eng, T0 = hist_engine
        with pytest.raises(Exception, match="histogram"):
            eng.query_range("hl > 2", T0, T0, 10_000)
