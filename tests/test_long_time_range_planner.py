"""LongTimeRangePlannerSpec goldens ported (reference:
coordinator/.../queryplanner/LongTimeRangePlannerSpec.scala, planner
LongTimeRangePlanner.scala:110-171) — which side (raw table vs ds-gauge
rollups) answers each instant of a retention-boundary-spanning query.

Provenance is observable through values: the raw table holds only
post-boundary samples (exact per-minute values), the ds table holds 5m
rollups of ALL history — each instant's value identifies the side that
produced it.

Fixture: g = i at T0 + i min (i in 0..19); raw retention starts at
T0+10m; ds rollups at 5m with END-inclusive periods (T0 is a 5m
multiple, so the i=0 sample falls in the period ENDING at T0 —
DownsamplePeriodMarker.scala:82-88):
  ttime 0m: sum 0, 5m: 15, 10m: 40, 15m: 65, 19m: 70.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import canonical_labels
from filodb_spark.promql.compiler import PromQLEngine, TsStore
from filodb_spark.streaming.downsample import downsample

T0 = 1_704_067_200_000
MIN = 60_000
BOUNDARY = T0 + 10 * MIN


@pytest.fixture(scope="module")
def engine(spark):
    full = spark.createDataFrame(
        [({"__name__": "g", "job": "a"}, T0 + i * MIN, float(i))
         for i in range(20)],
        "labels map<string,string>, ts long, value double")
    raw = full.where(F.col("ts") >= BOUNDARY)
    ds = downsample(full.withColumn(
        "_sk", canonical_labels(F.col("labels"))),
        ["labels"], 5 * MIN).drop("_sk")
    store = TsStore(raw, ds_df=ds, raw_retention_start_ms=BOUNDARY)
    return PromQLEngine(spark, store)


def _run(engine, q, start_min, end_min, step_min=1):
    out = engine.query_range(q, T0 + start_min * MIN, T0 + end_min * MIN,
                             step_min * MIN).collect()
    return {(r["t"] - T0) // MIN: r["value"] for r in out}


def raw_sum(i, w=5):
    return float(sum(range(i - w, i + 1)))


DS_TTIMES = {0: 0.0, 5: 15.0, 10: 40.0, 15: 65.0, 19: 70.0}


def ds_sum(i, w=5):
    return sum(v for t, v in DS_TTIMES.items() if i - w <= t <= i)


def test_raw_only_query_goes_to_raw(engine):
    # "should direct raw-cluster-only queries to raw planner": every
    # instant's window is raw-resident -> exact per-minute sums
    got = _run(engine, "sum_over_time(g[5m])", 16, 19)
    assert got == {i: raw_sum(i) for i in range(16, 20)}


def test_downsample_only_query(engine):
    # "should direct downsample-only queries to downsample planner":
    # end < earliestRawTime -> rollup sums
    got = _run(engine, "sum_over_time(g[5m])", 5, 9)
    assert got == {i: ds_sum(i) for i in range(5, 10)}


def test_overlapping_query_splits_and_stitches(engine):
    # "should direct overlapping queries to both raw & downsample
    # planner and stitch": firstInstantInRaw = start + (numSteps+1)*step
    # where numSteps = (earliestRaw - start + lookback) / step
    got = _run(engine, "sum_over_time(g[5m])", 5, 19)
    expected = {i: ds_sum(i) for i in range(5, 16)}        # ds side
    expected.update({i: raw_sum(i) for i in range(16, 20)})  # raw side
    assert got == expected


def test_boundary_crossing_windows_go_to_ds(engine):
    # instants in [boundary, boundary+window) must NOT be answered by
    # the truncated raw table (the pre-r8 bug: t=14m raw-side read
    # [9m,14m] from a table starting at 10m and returned 60)
    got = _run(engine, "sum_over_time(g[5m])", 14, 14, step_min=1)
    assert got == {14: ds_sum(14)}  # 95.0, not the truncated 60.0


def test_long_lookback_whole_grid_on_ds(engine):
    # "should delegate to downsample cluster ... when there is a long
    # lookback": end - lookback < earliestRawTime -> every instant DS,
    # even recent ones the raw table could partially serve
    got = _run(engine, "sum_over_time(g[15m])", 18, 19)
    assert got == {18: ds_sum(18, 15), 19: ds_sum(19, 15)}
    assert got[19] == 190.0  # all four rollups; raw-truncated would be 145


def test_offset_compensates_for_boundary(engine):
    # "should direct instant raw-data queries ... offset" family: the
    # offset shifts the evaluated window; raw-capability is judged in
    # offset space (grid already shifted by the caller)
    # end-offset-window = 19-2-5 = 12m >= 10m -> split still happens;
    # shifted instants 14..17m: raw-capable from 16m (back-shifted 18m)
    got = _run(engine, "sum_over_time(g[5m] offset 2m)", 16, 19)
    assert got == {16: ds_sum(14), 17: ds_sum(15),
                   18: raw_sum(16), 19: raw_sum(17)}
    # offset pushes the whole window pre-boundary -> all DS
    got2 = _run(engine, "sum_over_time(g[5m] offset 10m)", 16, 19)
    assert got2 == {i: ds_sum(i - 10) for i in range(16, 20)}


def test_avg_and_count_rewrites_across_split(engine):
    # ds-gauge rewrites (avg = sum(sum)/sum(count), count = sum(count))
    # keep working across the split
    avg = _run(engine, "avg_over_time(g[5m])", 5, 19)
    cnt = _run(engine, "count_over_time(g[5m])", 5, 19)
    assert avg[19] == raw_sum(19) / 6 and cnt[19] == 6.0
    # one rollup in [4m, 9m] (ttime 5m: sum 15, count 5)
    assert avg[9] == 15.0 / 5 and cnt[9] == 5.0
