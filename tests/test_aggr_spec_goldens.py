"""Goldens ported from the reference's AggrOverRangeVectorsSpec.

Source (behavior only): query/src/test/scala/filodb/query/exec/
AggrOverRangeVectorsSpec.scala:208-332 ("should ignore NaN while
aggregating" — 3 series with one NaN sample, hard-coded expecteds for
sum/min/count/avg/bottomk/topk/quantile/stdvar/stddev/group) and
:851-979 (max/min NaN discipline with negative values).
"""

import math

import pytest

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

NAN = float("nan")
T0 = 1_700_000_000_000
T1 = T0 + 10_000

# AggrOverRangeVectorsSpec:210-214 — series a=1 [NaN, 5.6], a=2 [4.6, 4.4],
# a=3 [2.1, 5.4] at two timesteps
SERIES = {"1": [NAN, 5.6], "2": [4.6, 4.4], "3": [2.1, 5.4]}

GOLD = {  # :208-332, in spec order
    "sum": [6.7, 15.4],
    "min": [2.1, 4.4],
    "count": [2.0, 3.0],
    "avg": [3.35, 5.133333333333333],
    "quantile(0.5, m)": [3.35, 5.4],
    "stdvar": [1.5625, 0.27555555555556],
    "stddev": [1.25, 0.52493385826745],
    "group": [1.0, 1.0],
    "max": [4.6, 5.6],
}


@pytest.fixture(scope="module")
def agg_engine(spark):
    rows = [({"__name__": "m", "a": a}, t, float(v))
            for a, vals in SERIES.items()
            for t, v in zip((T0, T1), vals)]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


def _vals(engine, q):
    res = engine.query_range(q, T0, T1, 10_000).collect()
    out = {}
    for r in res:
        out.setdefault(r["t"], []).append(r["value"])
    return out


class TestIgnoreNaNWhileAggregating:
    @pytest.mark.parametrize("q", sorted(GOLD))
    def test_simple_aggs(self, agg_engine, q):
        promql = q if "(" in q else f"{q}(m)"
        got = _vals(agg_engine, promql)
        assert len(got.get(T0, [])) == 1 and len(got.get(T1, [])) == 1, q
        assert got[T0][0] == pytest.approx(GOLD[q][0], rel=1e-9), q
        assert got[T1][0] == pytest.approx(GOLD[q][1], rel=1e-9), q

    def test_topk_membership(self, agg_engine):
        # :273-300 presented topk(2): t0 -> {a2:4.6, a3:2.1} (a1 is NaN),
        # t1 -> {a1:5.6, a3:5.4}
        res = agg_engine.query_range("topk(2, m)", T0, T1, 10_000).collect()
        got = {(r["labels"]["a"], r["t"]): r["value"] for r in res
               if not math.isnan(r["value"])}
        assert got == {("2", T0): 4.6, ("3", T0): 2.1,
                       ("1", T1): 5.6, ("3", T1): 5.4}

    def test_bottomk_membership(self, agg_engine):
        # :252-271 presented bottomk(2): t0 -> {a3:2.1, a2:4.6},
        # t1 -> {a2:4.4, a3:5.4}; a=1 never a member
        res = agg_engine.query_range("bottomk(2, m)", T0, T1, 10_000).collect()
        got = {(r["labels"]["a"], r["t"]): r["value"] for r in res
               if not math.isnan(r["value"])}
        assert got == {("3", T0): 2.1, ("2", T0): 4.6,
                       ("2", T1): 4.4, ("3", T1): 5.4}


class TestMaxMinNaNDiscipline:
    """:851-979 — NaN ignored even with negative values; all-NaN steps
    yield no numeric result."""

    @pytest.fixture(scope="class")
    def neg_engine(self, spark):
        series = {"1": [-2.0, NAN, -4.0], "2": [NAN, NAN, -1.5],
                  "3": [-5.0, NAN, NAN]}
        rows = [({"__name__": "n", "a": a}, T0 + i * 10_000, float(v))
                for a, vals in series.items()
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        # lookback would fill step 2 from step 1; pin instant semantics by
        # querying each step with its exact timestamp only
        return PromQLEngine(spark, TsStore(df))

    def _step(self, engine, q, i):
        t = T0 + i * 10_000
        res = engine.query_range(q, t, t, 10_000).collect()
        return [r["value"] for r in res]

    def test_max_ignores_nan_negatives(self, neg_engine):
        assert self._step(neg_engine, "max(n)", 0) == [-2.0]
        assert self._step(neg_engine, "min(n)", 0) == [-5.0]

    def test_all_nan_step(self, neg_engine):
        # every series carries a NaN staleness marker at step 1: the
        # marker SHADOWS older samples (LastSampleChunkedFunctionD), so
        # the aggregation input is empty -> no rows (reference emits NaN,
        # rendered as absent)
        assert self._step(neg_engine, "max(n)", 1) == []

    def test_nan_after_real_values(self, neg_engine):
        # :926-979 — at step 2, series 3 is NaN (stale); max over the
        # live series = max(-4.0, -1.5) = -1.5
        assert self._step(neg_engine, "max(n)", 2) == [-1.5]
        assert self._step(neg_engine, "min(n)", 2) == [-4.0]


class TestTopKNaNPresentation:
    """:601-634 "should add NaN in topK" — per-step top-k membership
    over series that go NaN/stale at different steps. The reference
    presents every emitted series over the FULL grid with NaN where it
    is not in the top-k; in this engine's sparse representation those
    NaN rows are simply absent — the per-step membership and values
    are the ported semantics."""

    @pytest.fixture(scope="class")
    def topk_engine(self, spark):
        nan = float("nan")
        s1 = [(1000, nan), (2000, 5.1), (3000, nan), (4000, 5.6),
              (5000, 4.0), (6000, nan)]
        s2 = [(1000, nan), (2000, 5.0), (3000, nan), (4000, 5.7),
              (5000, 4.4), (6000, nan)]
        rows = [({"__name__": "m", "s": name}, t, v)
                for name, pts in (("one", s1), ("two", s2)) for t, v in pts]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        # lookback 1ms so each step sees exactly its own sample (the
        # spec feeds the mapper pre-gridded rows)
        return PromQLEngine(spark, TsStore(df), lookback_ms=1)

    def test_per_step_membership(self, topk_engine):
        eng = topk_engine
        eng_res = eng.query_range("topk(1, m)", 1000, 6000, 1000).collect()
        got = {(r["t"], r["labels"]["s"]): r["value"] for r in eng_res
               if not math.isnan(r["value"])}
        # spec expecteds: series "one" wins at 2000 (5.1 > 5.0);
        # series "two" wins at 4000 (5.7) and 5000 (4.4); NaN steps
        # (1000/3000/6000) emit nothing
        assert got == {(2000, "one"): 5.1,
                       (4000, "two"): 5.7, (5000, "two"): 4.4}
