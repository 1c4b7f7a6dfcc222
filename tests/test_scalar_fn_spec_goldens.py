"""Goldens ported from the reference's ScalarFunctionSpec.

Source (behavior only): query/src/test/scala/filodb/query/exec/rangefn/
ScalarFunctionSpec.scala — scalar() multi-series/empty -> NaN per step,
single-series -> per-step values; TimeScalarGeneratorExec goldens for
time()/hour()/day_of_week() grids; ScalarBinaryOperationExec arithmetic
on the grid (60*60, time()-3600).
"""

import math

import pytest

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def sc_engine(spark):
    rows = [
        ({"__name__": "multi", "src": "a"}, T0, 1.0),
        ({"__name__": "multi", "src": "b"}, T0, 5.0),
        ({"__name__": "one", "src": "a"}, T0, 1.0),
        ({"__name__": "one", "src": "a"}, T0 + 10_000, 10.0),
        ({"__name__": "one", "src": "a"}, T0 + 20_000, 30.0),
    ]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


def _series(engine, q, start, end, step):
    res = engine.query_range(q, start, end, step).collect()
    return sorted((r["t"], r["value"]) for r in res)


class TestScalarFunction:
    def test_multiple_series_is_nan(self, sc_engine):
        got = _series(sc_engine, "scalar(multi)", T0, T0, 10_000)
        assert len(got) == 1 and math.isnan(got[0][1])

    def test_empty_source_is_nan(self, sc_engine):
        # :134-144 — no range vectors still yields a scalar row (NaN)
        got = _series(sc_engine, "scalar(nosuch)", T0, T0, 10_000)
        assert len(got) == 1 and math.isnan(got[0][1])

    def test_single_series_values(self, sc_engine):
        got = _series(sc_engine, "scalar(one)", T0, T0 + 20_000, 10_000)
        assert got == [(T0, 1.0), (T0 + 10_000, 10.0), (T0 + 20_000, 30.0)]


class TestTimeScalarGenerators:
    def test_time_grid(self, sc_engine):
        # :158-175 — RangeParams(10, 10, 100): time() emits the step
        # timestamps in seconds
        got = _series(sc_engine, "vector(time())", 10_000, 100_000, 10_000)
        assert got == [(t * 1000, float(t)) for t in range(10, 101, 10)]

    def test_hour_grid(self, sc_engine):
        # :176-193 — epoch 1565627710..1565627790 is 16:xx UTC
        got = _series(sc_engine, "vector(hour())",
                      1_565_627_710_000, 1_565_627_790_000, 10_000)
        assert len(got) == 9
        assert all(v == 16.0 for _, v in got)

    def test_day_of_week_grid(self, sc_engine):
        # :194-211 — epoch 1583682900..1583683400 is a Sunday (0)
        got = _series(sc_engine, "vector(day_of_week())",
                      1_583_682_900_000, 1_583_683_400_000, 100_000)
        assert len(got) == 6
        assert all(v == 0.0 for _, v in got)


class TestSortFunctionSpec:
    """SortFunctionSpec.scala — sort/sort_desc order series by last
    value; empty input stays empty."""

    @pytest.fixture(scope="class")
    def sort_engine(self, spark):
        rows = [({"__name__": "s", "i": str(i)}, T0, float(v))
                for i, v in enumerate([1, 5, 3, 2, 4, 6, 0])]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        return PromQLEngine(spark, TsStore(df))

    def test_sort_ascending(self, sort_engine):
        res = sort_engine.query_range("sort(s)", T0, T0, 10_000).collect()
        assert [r["value"] for r in res] == [0.0, 1.0, 2.0, 3.0, 4.0,
                                             5.0, 6.0]

    def test_sort_descending(self, sort_engine):
        res = sort_engine.query_range("sort_desc(s)", T0, T0,
                                      10_000).collect()
        assert [r["value"] for r in res] == [6.0, 5.0, 4.0, 3.0, 2.0,
                                             1.0, 0.0]

    def test_sort_empty(self, sort_engine):
        assert sort_engine.query_range("sort(nosuch)", T0, T0,
                                       10_000).collect() == []

    def test_sort_after_grouped_aggregate(self, sort_engine):
        # :133-170 — sort applies to aggregation output
        res = sort_engine.query_range('sort(sum by (i) (s))', T0, T0,
                                      10_000).collect()
        assert [r["value"] for r in res] == [0.0, 1.0, 2.0, 3.0, 4.0,
                                             5.0, 6.0]


class TestScalarBinaryOnGrid:
    def test_const_multiplication(self, sc_engine):
        # :213-227 — 60 * 60 on every step
        got = _series(sc_engine, "vector(60 * 60)",
                      1_583_682_900_000, 1_583_683_400_000, 100_000)
        assert got == [(1_583_682_900_000 + i * 100_000, 3600.0)
                       for i in range(6)]

    def test_time_minus_const(self, sc_engine):
        # :229-247 — time() - 60*60 over RangeParams(3600, 100, 4100)
        got = _series(sc_engine, "vector(time() - 60 * 60)",
                      3_600_000, 4_100_000, 100_000)
        assert got == [(3_600_000 + i * 100_000, float(i * 100))
                       for i in range(6)]
