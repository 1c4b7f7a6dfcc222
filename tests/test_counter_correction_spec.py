"""Goldens ported from the reference's
BufferableCounterCorrectionIteratorSpec.

Source (behavior only):
query/src/test/scala/filodb/query/exec/
BufferableCounterCorrectionIteratorSpec.scala — monotone counter
reconstruction: every dip adds the previous value to a running
correction (PeriodicSamplesMapper.scala:547-566). The Spark analog is
`kernels.range_fns.counter_correct`, one lag+running-sum window per
series. The iterator's buffering contract (peek==next) is a JVM
iterator concern with no DataFrame analog; value semantics are what
is ported.
"""

from __future__ import annotations

import pytest

from filodb_spark.kernels.range_fns import counter_correct

NAN = float("nan")


def _run(spark, values):
    df = spark.createDataFrame(
        [("s", i, float(v)) for i, v in enumerate(values)],
        "k string, ts long, value double")
    out = counter_correct(df, ["k"]).orderBy("ts").collect()
    return [r["value"] for r in out]


def test_corrects_dip(spark):
    assert _run(spark, [3, 5, 7, 13, 2, 34]) == \
        [3.0, 5.0, 7.0, 13.0, 15.0, 47.0]


def test_corrects_multiple_dips(spark):
    assert _run(spark, [3, 5, 7, 13, 2, 34, 4, 6]) == \
        [3.0, 5.0, 7.0, 13.0, 15.0, 47.0, 51.0, 53.0]


def test_no_dips_unchanged(spark):
    assert _run(spark, [3, 5, 7, 13, 22, 34]) == \
        [3.0, 5.0, 7.0, 13.0, 22.0, 34.0]


def test_empty_input(spark):
    assert _run(spark, []) == []


def test_nan_reads_as_zero_reset(spark):
    # PeriodicSamplesMapper.scala:560 — NaN is the explicit end-of-series
    # counter-reset marker: reads as 0 (a dip), prior value folded in
    assert _run(spark, [3, 7, NAN, 5]) == [3.0, 7.0, 7.0, 12.0]


def test_per_series_isolation(spark):
    # corrections never leak across series keys
    rows = [("a", 0, 10.0), ("a", 1, 2.0), ("b", 0, 5.0), ("b", 1, 6.0)]
    df = spark.createDataFrame(rows, "k string, ts long, value double")
    out = {(r["k"], r["ts"]): r["value"]
           for r in counter_correct(df, ["k"]).collect()}
    assert out == {("a", 0): 10.0, ("a", 1): 12.0,
                   ("b", 0): 5.0, ("b", 1): 6.0}
