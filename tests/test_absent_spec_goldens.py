"""Goldens ported from the reference's AbsentFunctionSpec.

Source (behavior only): query/src/test/scala/filodb/query/exec/rangefn/
AbsentFunctionSpec.scala — label extraction from Equals matchers only
(:81-135, :157-168), the NaN-sample battery where a step whose series are
all stale-marked counts as ABSENT (:137-155), and instant-query shape
(:170-193). Our convention renders present steps as no-row where the
reference emits NaN rows; the absent steps (value 1.0) match exactly.
"""

import pytest

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

NAN = float("nan")
T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def absent_engine(spark):
    # testSampleNan (:59-79): test1 [NaN, 1, NaN], test2 [5, NaN, NaN]
    series = {"test1": [NAN, 1.0, NAN], "test2": [5.0, NAN, NAN]}
    rows = [({"__name__": "m", "metric": name,
              "src": "source-value", "dst": "destination-value"},
             T0 + i * 10_000, float(v))
            for name, vals in series.items() for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


def _absent_rows(engine, q, n_steps=1, t0=T0):
    res = engine.query_range(q, t0, t0 + (n_steps - 1) * 10_000, 10_000
                             ).collect()
    return [(dict(r["labels"] or {}), r["t"], r["value"]) for r in res]


class TestAbsentLabels:
    def test_equals_matchers_become_labels(self, absent_engine):
        # :81-94 — empty input, Equals filters -> labels; 1.0 per step
        rows = _absent_rows(
            absent_engine,
            'absent(nosuch{host="host1", instance="instance1"})', n_steps=6)
        assert len(rows) == 6
        for lab, _, v in rows:
            assert lab == {"host": "host1", "instance": "instance1"}
            assert v == 1.0

    def test_non_equals_matchers_excluded(self, absent_engine):
        # :110-121 — regex/negative filters contribute no labels
        rows = _absent_rows(absent_engine, 'absent(nosuch{host!~"host1"})',
                            n_steps=6)
        assert len(rows) == 6
        assert all(lab == {} for lab, _, _ in rows)

    def test_metric_name_excluded(self, absent_engine):
        # :123-135 — the metric-name filter never becomes a label
        rows = _absent_rows(absent_engine, "absent(http_requests)", n_steps=6)
        assert len(rows) == 6
        assert all(lab == {} for lab, _, _ in rows)

    def test_instant_query(self, absent_engine):
        # :170-183 — single-step absent
        rows = _absent_rows(absent_engine,
                            'absent(nosuch{host="host1"})', n_steps=1)
        assert rows == [({"host": "host1"}, T0, 1.0)]


class TestAbsentWithStaleMarkers:
    def test_nan_battery(self, absent_engine):
        # :137-155 — expected (t0, NaN) (t1, NaN) (t2, 1.0): at t0 test2
        # is live (5.0), at t1 test1 is live (1.0), at t2 BOTH series
        # carry NaN staleness markers shadowing their older samples ->
        # the metric is absent
        rows = _absent_rows(absent_engine, "absent(m)", n_steps=3)
        assert [(t, v) for _, t, v in rows] == [(T0 + 20_000, 1.0)]

    def test_present_sample_suppresses_absent(self, absent_engine):
        # :96-108 — non-empty input at a live step -> no absent row
        assert _absent_rows(absent_engine, "absent(m)", n_steps=1) == []
