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


# ---- histogram (per-bucket) goldens ----------------------------------
# BufferableCounterCorrectionIteratorHSpec.scala — the same correction
# applied independently per bucket; Spark analog counter_correct_hist
# (explode -> scalar kernel per bucket -> assemble). The buffered
# (peek==next) cases are JVM iterator concerns; value semantics ported.

def _run_hist(spark, rows):
    les = [float(i) for i in range(len(rows[0]))]
    df = spark.createDataFrame(
        [("s", i, (les, [float(v) for v in r]))
         for i, r in enumerate(rows)],
        "k string, ts long, "
        "hist struct<les: array<double>, values: array<double>>")
    from filodb_spark.kernels.histogram import counter_correct_hist
    out = counter_correct_hist(df, ["k"]).orderBy("ts").collect()
    return [list(r["hist"]["values"]) for r in out]


def test_hist_corrects_dip_all_buckets(spark):
    got = _run_hist(spark, [
        [3, 5, 7], [5, 7, 13], [7, 13, 15], [13, 15, 20],
        [2, 5, 8],     # dip in all buckets
        [34, 40, 50]])
    assert got == [
        [3.0, 5.0, 7.0], [5.0, 7.0, 13.0], [7.0, 13.0, 15.0],
        [13.0, 15.0, 20.0],
        [15.0, 20.0, 28.0],    # 2+13, 5+15, 8+20
        [47.0, 55.0, 70.0]]    # 34+13, 40+15, 50+20


def test_hist_corrects_multiple_dips(spark):
    got = _run_hist(spark, [
        [3, 5], [5, 7], [7, 13], [13, 15],
        [2, 5],        # first dip
        [34, 40],
        [4, 6],        # second dip
        [6, 8]])
    assert got[4:] == [
        [15.0, 20.0], [47.0, 55.0],
        [51.0, 61.0],          # 4+13+34, 6+15+40
        [53.0, 63.0]]          # 6+13+34, 8+15+40


def test_hist_no_dips_no_correction(spark):
    got = _run_hist(spark, [[3, 5, 7], [5, 7, 13], [7, 13, 15]])
    assert got == [[3.0, 5.0, 7.0], [5.0, 7.0, 13.0], [7.0, 13.0, 15.0]]


def test_hist_empty_input(spark):
    from filodb_spark.kernels.histogram import counter_correct_hist
    df = spark.createDataFrame(
        [], "k string, ts long, "
            "hist struct<les: array<double>, values: array<double>>")
    assert counter_correct_hist(df, ["k"]).count() == 0


def test_hist_nan_buckets_are_resets(spark):
    got = _run_hist(spark, [
        [3, 5], [5, 7], [NAN, NAN], [10, 15]])
    assert got == [
        [3.0, 5.0], [5.0, 7.0],
        [5.0, 7.0],            # NaN reads 0 + correction from previous
        [15.0, 22.0]]          # 10+5, 15+7
