"""DownsamplerMainSpec goldens — batch downsampling of every schema.

Fixtures and expected outputs ported from the reference's downsampler
job spec (spark-jobs/src/test/scala/filodb/downsampler/
DownsamplerMainSpec.scala — values only; the execution model here is
window-function / groupBy DataFrame plans, not chunk iteration):

  gauge          :844-860 raw, :1524-1530 (1-min), :1996-2000 (5-min)
  low-freq gauge :886-900 raw, :1561-1566
  prom-counter   :925-945 raw, :1595-1610 (1-min), :2026-2040 (5-min)
  delta-counter  :988-1008 raw, :1657-1664
  prom-histogram :1031-1046 raw, :1695-1707 (1-min), :2074-2082 (5-min)
  delta-histogram:1073-1091 raw, :1763-1769
  otel-cumulative:1115-1133 raw, :1802-1813
  otel-delta     :1157-1175 raw, :1871-1877
  hist NaN       :1367-1390 raw, :1942-1972 (1-min), :2109-2137 (5-min)

The reference's counter marker emits the first row of every CHUNK
(drop detection across chunk boundaries,
DownsamplePeriodMarker.scala:104-107); these fixtures ingest a single
chunk per partition, and the chunkless analog here (series' first
sample) coincides exactly.

Not ported: the exp-delta-histogram golden (:1880-1916) — its periods
mix Base2 schemes of scales 3 and 2 and the expected values bake in
MutableHistogram's in-place scheme-evolution order (the same
shared-mutable artifact class adjudicated for
PeriodicSamplesMapperSpec in round 9). Concretely: period 1 sums rows
[0,0,0,1]+[0,0,2,2] (scale 3, tops 1/2^(1/8)/2^(1/4)) + [0,2,3,3]
(scale 2, tops 1/2^(1/4)/2^(1/2)) and expects (0,2,6,6) ON THE SCALE-3
GRID — but at top 2^(1/8) the scale-2 row can contribute at most 3
under ANY monotone projection of its cumulative values (floor-carry
gives 2, ceiling gives 3), so 6 = 0+2+“4” is not a pure function of
the inputs. hist_sum's documented deterministic mixed-scheme rule
(union-grid projection / NaN on unprojectable mixes) stands in. The
mixed-schema (prom-hist chunk + otel-cum chunk in one partition) cases
are chunk-level schema migrations with no chunkless analog.
"""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.streaming.downsample import (
    downsample, downsample_counter, downsample_delta_counter,
    downsample_delta_hist, downsample_hist)

MIN1 = 60_000
MIN5 = 300_000
NAN = float("nan")

GAUGE_RAW = [
    (74372801000, 3.0), (74372802000, 5.0),
    (74372861000, 9.0), (74372862000, 11.0),
    (74372921000, 13.0), (74372922000, 15.0),
    (74372981000, 17.0), (74372982000, 15.0),
    (74373041000, 13.0), (74373042000, 11.0),
]

COUNTER_RAW = [
    (74372801000, 3.0), (74372801500, 4.0), (74372802000, 5.0),
    (74372861000, 9.0), (74372861500, 10.0), (74372862000, 11.0),
    (74372921000, 2.0), (74372921500, 7.0), (74372922000, 15.0),
    (74372981000, 17.0), (74372981500, 1.0), (74372982000, 15.0),
    (74373041000, 18.0), (74373042000, 20.0),
]

DELTA_COUNTER_RAW = [
    (74372801000, 3.0), (74372801500, 1.0), (74372802000, 1.0),
    (74372861000, 4.0), (74372861500, 1.0), (74372862000, 1.0),
    (74372921000, 2.0), (74372921500, 5.0), (74372922000, 8.0),
    (74372981000, 2.0), (74372981500, 1.0), (74372982000, 14.0),
    (74373041000, 3.0), (74373042000, 2.0),
]

LES = [3.0, 10.0, float("inf")]

# (ts, sum, count, bucket values)
HIST_RAW = [
    (74372801000, 0.0, 1.0, [0, 0, 1]),
    (74372801500, 2.0, 3.0, [0, 2, 3]),
    (74372802000, 5.0, 6.0, [2, 5, 6]),
    (74372861000, 9.0, 9.0, [2, 5, 9]),
    (74372861500, 10.0, 10.0, [2, 5, 10]),
    (74372862000, 11.0, 14.0, [2, 8, 14]),
    (74372921000, 2.0, 2.0, [0, 0, 2]),
    (74372921500, 7.0, 9.0, [1, 7, 9]),
    (74372922000, 15.0, 19.0, [1, 15, 19]),
    (74372981000, 17.0, 21.0, [2, 16, 21]),
    (74372981500, 1.0, 1.0, [0, 1, 1]),
    (74372982000, 15.0, 15.0, [0, 15, 15]),
    (74373041000, 18.0, 19.0, [1, 16, 19]),
    (74373042000, 20.0, 25.0, [4, 20, 25]),
]

DELTA_HIST_RAW = [
    (74372801000, 0.0, 1.0, [0, 0, 1]),
    (74372801500, 2.0, 2.0, [0, 2, 2]),
    (74372802000, 3.0, 3.0, [2, 3, 3]),
    (74372861000, 4.0, 3.0, [0, 0, 3]),
    (74372861500, 1.0, 1.0, [0, 0, 1]),
    (74372862000, 1.0, 4.0, [0, 3, 4]),
    (74372921000, 2.0, 2.0, [0, 0, 2]),
    (74372921500, 5.0, 7.0, [1, 1, 7]),
    (74372922000, 8.0, 10.0, [0, 8, 10]),
    (74372981000, 2.0, 2.0, [1, 1, 2]),
    (74372981500, 1.0, 1.0, [0, 1, 1]),
    (74372982000, 14.0, 14.0, [0, 14, 14]),
    (74373041000, 3.0, 4.0, [1, 1, 4]),
    (74373042000, 2.0, 6.0, [3, 4, 6]),
]

# (ts, min, max) companions, same sum/count/buckets as HIST_RAW
OTEL_CUM_MINMAX = [
    (74372801000, 0.0, 10.0), (74372801500, 0.0, 20.0),
    (74372802000, 1.0, 30.0),
    (74372861000, 2.0, 15.0), (74372861500, 1.0, 10.0),
    (74372862000, 1.0, 18.0),
    (74372921000, 0.0, 10.0), (74372921500, 1.0, 20.0),
    (74372922000, 1.0, 30.0),
    (74372981000, 2.0, 25.0), (74372981500, 0.0, 10.0),
    (74372982000, 0.0, 15.0),
    (74373041000, 1.0, 30.0), (74373042000, 2.0, 40.0),
]

# (ts, min, max) companions, same sum/count/buckets as DELTA_HIST_RAW
OTEL_DELTA_MINMAX = [
    (74372801000, 0.0, 10.0), (74372801500, 1.0, 20.0),
    (74372802000, 2.0, 15.0),
    (74372861000, 1.0, 16.0), (74372861500, 0.0, 10.0),
    (74372862000, 0.0, 30.0),
    (74372921000, 0.0, 11.0), (74372921500, 3.0, 20.0),
    (74372922000, 6.0, 25.0),
    (74372981000, 1.0, 20.0), (74372981500, 0.0, 10.0),
    (74372982000, 3.0, 25.0),
    (74373041000, 1.0, 30.0), (74373042000, 1.0, 22.0),
]

HIST_NAN_RAW = [
    (74372801000, 0.0, 1.0, [0, 0, 1]),
    (74372801500, 2.0, 3.0, [0, 2, 3]),
    (74372802000, 5.0, 6.0, [2, 5, 6]),
    (74372802500, NAN, NAN, [0, 0, 0]),
    (74372861000, 9.0, 9.0, [2, 5, 9]),
    (74372861500, 10.0, 10.0, [2, 5, 10]),
    (74372862000, NAN, NAN, [0, 0, 0]),
    (74372862500, 11.0, 14.0, [2, 8, 14]),
    (74372921000, 2.0, 2.0, [0, 0, 2]),
    (74372921500, 7.0, 9.0, [1, 7, 9]),
    (74372922000, NAN, NAN, [0, 0, 0]),
    (74372922500, 4.0, 1.0, [0, 1, 1]),
    (74372981000, 17.0, 21.0, [2, 16, 21]),
    (74372981500, 1.0, 1.0, [0, 1, 1]),
    (74372982000, 15.0, 15.0, [0, 15, 15]),
    (74373041000, 18.0, 19.0, [1, 16, 19]),
    (74373041500, 20.0, 25.0, [4, 20, 25]),
    (74373042000, NAN, NAN, [0, 0, 0]),
]


def _scalar_df(spark, rows):
    return spark.createDataFrame(
        [("s", int(t), float(v)) for t, v in rows],
        "series string, ts long, value double")


def _hist_df(spark, rows, minmax=None):
    mm = {t: (mn, mx) for t, mn, mx in (minmax or [])}
    data = []
    for t, s, c, vals in rows:
        extra = mm.get(t, ())
        data.append(("s", int(t), float(s), float(c),
                     (LES, [float(v) for v in vals]), *extra))
    schema = ("series string, ts long, sum double, count double, "
              "hist struct<les: array<double>, values: array<double>>")
    if minmax:
        schema += ", min double, max double"
    return spark.createDataFrame(data, schema)


def _collect_scalar(ds):
    return [(r["ts"], r["value"])
            for r in ds.orderBy("ts").collect()]


def _collect_gauge(ds):
    return [(r["ts"], r["min"], r["max"], r["sum"], r["count"], r["avg"])
            for r in ds.orderBy("ts").collect()]


def _collect_hist(ds, minmax=False):
    out = []
    for r in ds.orderBy("ts").collect():
        assert list(r["hist"]["les"]) == LES
        row = (r["ts"], r["sum"], r["count"], list(r["hist"]["values"]))
        if minmax:
            row += (r["min"], r["max"])
        out.append(row)
    return out


class TestGaugeGoldens:
    def test_gauge_1min(self, spark):
        ds = downsample(_scalar_df(spark, GAUGE_RAW), ["series"], MIN1)
        assert _collect_gauge(ds) == [
            (74372802000, 3.0, 5.0, 8.0, 2.0, 4.0),
            (74372862000, 9.0, 11.0, 20.0, 2.0, 10.0),
            (74372922000, 13.0, 15.0, 28.0, 2.0, 14.0),
            (74372982000, 15.0, 17.0, 32.0, 2.0, 16.0),
            (74373042000, 11.0, 13.0, 24.0, 2.0, 12.0),
        ]

    def test_gauge_low_freq_1min(self, spark):
        raw = [r for r in GAUGE_RAW
               if r[0] not in (74372861000, 74372862000,
                               74372981000,74372982000)]
        ds = downsample(_scalar_df(spark, raw), ["series"], MIN1)
        assert _collect_gauge(ds) == [
            (74372802000, 3.0, 5.0, 8.0, 2.0, 4.0),
            (74372922000, 13.0, 15.0, 28.0, 2.0, 14.0),
            (74373042000, 11.0, 13.0, 24.0, 2.0, 12.0),
        ]

    def test_gauge_5min(self, spark):
        ds = downsample(_scalar_df(spark, GAUGE_RAW), ["series"], MIN5)
        assert _collect_gauge(ds) == [
            (74372982000, 3.0, 17.0, 88.0, 8.0, 11.0),
            (74373042000, 11.0, 13.0, 24.0, 2.0, 12.0),
        ]


class TestCounterGoldens:
    def test_prom_counter_1min(self, spark):
        ds = downsample_counter(_scalar_df(spark, COUNTER_RAW),
                                ["series"], MIN1)
        assert _collect_scalar(ds) == [
            (74372801000, 3.0), (74372802000, 5.0),
            (74372862000, 11.0),
            (74372921000, 2.0), (74372922000, 15.0),
            (74372981000, 17.0), (74372981500, 1.0), (74372982000, 15.0),
            (74373042000, 20.0),
        ]

    def test_prom_counter_5min(self, spark):
        ds = downsample_counter(_scalar_df(spark, COUNTER_RAW),
                                ["series"], MIN5)
        assert _collect_scalar(ds) == [
            (74372801000, 3.0),
            (74372862000, 11.0),
            (74372921000, 2.0),
            (74372981000, 17.0), (74372981500, 1.0),
            (74372982000, 15.0),
            (74373042000, 20.0),
        ]

    def test_delta_counter_1min(self, spark):
        ds = downsample_delta_counter(_scalar_df(spark, DELTA_COUNTER_RAW),
                                      ["series"], MIN1)
        assert _collect_scalar(ds) == [
            (74372802000, 5.0), (74372862000, 6.0), (74372922000, 15.0),
            (74372982000, 17.0), (74373042000, 5.0),
        ]


class TestHistGoldens:
    def test_prom_hist_1min(self, spark):
        ds = downsample_hist(_hist_df(spark, HIST_RAW), ["series"], MIN1)
        assert _collect_hist(ds) == [
            (74372801000, 0.0, 1.0, [0.0, 0.0, 1.0]),
            (74372802000, 5.0, 6.0, [2.0, 5.0, 6.0]),
            (74372862000, 11.0, 14.0, [2.0, 8.0, 14.0]),
            (74372921000, 2.0, 2.0, [0.0, 0.0, 2.0]),
            (74372922000, 15.0, 19.0, [1.0, 15.0, 19.0]),
            (74372981000, 17.0, 21.0, [2.0, 16.0, 21.0]),
            (74372981500, 1.0, 1.0, [0.0, 1.0, 1.0]),
            (74372982000, 15.0, 15.0, [0.0, 15.0, 15.0]),
            (74373042000, 20.0, 25.0, [4.0, 20.0, 25.0]),
        ]

    def test_prom_hist_5min(self, spark):
        ds = downsample_hist(_hist_df(spark, HIST_RAW), ["series"], MIN5)
        assert _collect_hist(ds) == [
            (74372801000, 0.0, 1.0, [0.0, 0.0, 1.0]),
            (74372862000, 11.0, 14.0, [2.0, 8.0, 14.0]),
            (74372921000, 2.0, 2.0, [0.0, 0.0, 2.0]),
            (74372981000, 17.0, 21.0, [2.0, 16.0, 21.0]),
            (74372981500, 1.0, 1.0, [0.0, 1.0, 1.0]),
            (74372982000, 15.0, 15.0, [0.0, 15.0, 15.0]),
            (74373042000, 20.0, 25.0, [4.0, 20.0, 25.0]),
        ]

    def test_delta_hist_1min(self, spark):
        ds = downsample_delta_hist(_hist_df(spark, DELTA_HIST_RAW),
                                   ["series"], MIN1)
        assert _collect_hist(ds) == [
            (74372802000, 5.0, 6.0, [2.0, 5.0, 6.0]),
            (74372862000, 6.0, 8.0, [0.0, 3.0, 8.0]),
            (74372922000, 15.0, 19.0, [1.0, 9.0, 19.0]),
            (74372982000, 17.0, 17.0, [1.0, 16.0, 17.0]),
            (74373042000, 5.0, 10.0, [4.0, 5.0, 10.0]),
        ]

    def test_otel_cumulative_1min(self, spark):
        ds = downsample_hist(
            _hist_df(spark, HIST_RAW, minmax=OTEL_CUM_MINMAX),
            ["series"], MIN1, minmax_cols=("min", "max"))
        assert _collect_hist(ds, minmax=True) == [
            (74372801000, 0.0, 1.0, [0.0, 0.0, 1.0], 0.0, 10.0),
            (74372802000, 5.0, 6.0, [2.0, 5.0, 6.0], 0.0, 30.0),
            (74372862000, 11.0, 14.0, [2.0, 8.0, 14.0], 1.0, 18.0),
            (74372921000, 2.0, 2.0, [0.0, 0.0, 2.0], 0.0, 10.0),
            (74372922000, 15.0, 19.0, [1.0, 15.0, 19.0], 1.0, 30.0),
            (74372981000, 17.0, 21.0, [2.0, 16.0, 21.0], 2.0, 25.0),
            (74372981500, 1.0, 1.0, [0.0, 1.0, 1.0], 0.0, 10.0),
            (74372982000, 15.0, 15.0, [0.0, 15.0, 15.0], 0.0, 15.0),
            (74373042000, 20.0, 25.0, [4.0, 20.0, 25.0], 1.0, 40.0),
        ]

    def test_otel_delta_1min(self, spark):
        ds = downsample_delta_hist(
            _hist_df(spark, DELTA_HIST_RAW, minmax=OTEL_DELTA_MINMAX),
            ["series"], MIN1, minmax_cols=("min", "max"))
        assert _collect_hist(ds, minmax=True) == [
            (74372802000, 5.0, 6.0, [2.0, 5.0, 6.0], 0.0, 20.0),
            (74372862000, 6.0, 8.0, [0.0, 3.0, 8.0], 0.0, 30.0),
            (74372922000, 15.0, 19.0, [1.0, 9.0, 19.0], 0.0, 25.0),
            (74372982000, 17.0, 17.0, [1.0, 16.0, 17.0], 0.0, 25.0),
            (74373042000, 5.0, 10.0, [4.0, 5.0, 10.0], 1.0, 30.0),
        ]


class TestHistNaNGoldens:
    """NaN sum/count samples are counter dips (value reads 0,
    CorrectingDoubleVectorReader) — the marker keeps them AND their
    predecessors; the emitted NaN rows keep their NaN values."""

    EXPECTED_1MIN = [
        (74372801000, 0.0, 1.0, [0.0, 0.0, 1.0]),
        (74372802000, 5.0, 6.0, [2.0, 5.0, 6.0]),
        (74372802500, None, None, [0.0, 0.0, 0.0]),
        (74372861500, 10.0, 10.0, [2.0, 5.0, 10.0]),
        (74372862000, None, None, [0.0, 0.0, 0.0]),
        (74372862500, 11.0, 14.0, [2.0, 8.0, 14.0]),
        (74372921000, 2.0, 2.0, [0.0, 0.0, 2.0]),
        (74372921500, 7.0, 9.0, [1.0, 7.0, 9.0]),
        (74372922000, None, None, [0.0, 0.0, 0.0]),
        (74372922500, 4.0, 1.0, [0.0, 1.0, 1.0]),
        (74372981000, 17.0, 21.0, [2.0, 16.0, 21.0]),
        (74372981500, 1.0, 1.0, [0.0, 1.0, 1.0]),
        (74372982000, 15.0, 15.0, [0.0, 15.0, 15.0]),
        (74373041500, 20.0, 25.0, [4.0, 20.0, 25.0]),
        (74373042000, None, None, [0.0, 0.0, 0.0]),
    ]

    EXPECTED_5MIN = [
        (74372801000, 0.0, 1.0, [0.0, 0.0, 1.0]),
        (74372802000, 5.0, 6.0, [2.0, 5.0, 6.0]),
        (74372802500, None, None, [0.0, 0.0, 0.0]),
        (74372861500, 10.0, 10.0, [2.0, 5.0, 10.0]),
        (74372862000, None, None, [0.0, 0.0, 0.0]),
        (74372862500, 11.0, 14.0, [2.0, 8.0, 14.0]),
        (74372921000, 2.0, 2.0, [0.0, 0.0, 2.0]),
        (74372921500, 7.0, 9.0, [1.0, 7.0, 9.0]),
        (74372922000, None, None, [0.0, 0.0, 0.0]),
        (74372981000, 17.0, 21.0, [2.0, 16.0, 21.0]),
        (74372981500, 1.0, 1.0, [0.0, 1.0, 1.0]),
        (74372982000, 15.0, 15.0, [0.0, 15.0, 15.0]),
        (74373041500, 20.0, 25.0, [4.0, 20.0, 25.0]),
        (74373042000, None, None, [0.0, 0.0, 0.0]),
    ]

    @staticmethod
    def _norm(rows):
        # NaN -> None so tuple equality works; reference compares NaN
        # rows by timestamp only and value rows exactly, which this
        # normalization preserves (NaN rows carry NaN sum AND count)
        out = []
        for t, s, c, v in rows:
            isnan = isinstance(s, float) and math.isnan(s)
            out.append((t, None if isnan else s,
                        None if (isinstance(c, float) and math.isnan(c))
                        else c, v))
        return out

    @pytest.mark.parametrize("res,expected", [
        (MIN1, EXPECTED_1MIN), (MIN5, EXPECTED_5MIN)])
    def test_hist_nan(self, spark, res, expected):
        ds = downsample_hist(_hist_df(spark, HIST_NAN_RAW),
                             ["series"], res)
        assert self._norm(_collect_hist(ds)) == self._norm(expected)


class TestCascadeConsistency:
    def test_counter_5min_is_cascade_stable(self, spark):
        """Downsampling the 1-min counter output again at 5-min equals
        downsampling raw at 5-min directly: the 1-min row subset keeps
        every dip, its predecessor, the series head, and each finer
        period's last row — exactly the rows the 5-min marker can mark.
        (The reference computes each resolution from raw; this pins the
        equivalence that makes that choice free.)"""
        raw = _scalar_df(spark, COUNTER_RAW)
        direct = downsample_counter(raw, ["series"], MIN5)
        cascade = downsample_counter(
            downsample_counter(raw, ["series"], MIN1), ["series"], MIN5)
        assert _collect_scalar(direct) == _collect_scalar(cascade)

    def test_hist_5min_is_cascade_stable(self, spark):
        """Same equivalence for the histogram marker (on the count
        column), including the per-period dMin/dMax columns: fine
        marker segments nest inside coarse ones, so min-of-min /
        max-of-max over the 1-min rows' segment aggregates equals the
        raw 5-min segment aggregate — this is what lets
        retention_ladder(schema="hist") cascade tier-from-tier."""
        raw = _hist_df(spark, HIST_RAW, minmax=OTEL_CUM_MINMAX)
        direct = downsample_hist(raw, ["series"], MIN5,
                                 minmax_cols=("min", "max"))
        cascade = downsample_hist(
            downsample_hist(raw, ["series"], MIN1,
                            minmax_cols=("min", "max")),
            ["series"], MIN5, minmax_cols=("min", "max"))
        assert _collect_hist(direct, minmax=True) == \
            _collect_hist(cascade, minmax=True)


class TestScaleShape:
    def test_counter_downsample_is_one_shuffle(self, spark):
        """The marker is window functions over one series-keyed
        Exchange (hash(series) satisfies the (series, period) window's
        clustering, so the per-period max adds only a local re-sort) —
        at 100 TB the counter downsample job costs one shuffle of the
        raw table, the same class as the gauge rollup's single hash
        aggregation."""
        raw = _scalar_df(spark, COUNTER_RAW)
        plan = downsample_counter(raw, ["series"], MIN1) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_hist_downsample_is_one_shuffle(self, spark):
        df = _hist_df(spark, HIST_RAW, minmax=OTEL_CUM_MINMAX)
        plan = downsample_hist(df, ["series"], MIN1,
                               minmax_cols=("min", "max")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestCounterMarkerProperties:
    """Randomized validation of the counter marker against a pure-Python
    model (random cadence, dips, NaN markers) — 40 series in one Spark
    job, deterministic seed."""

    RES = 300_000

    @staticmethod
    def _model_keep(samples, res):
        """Pure-Python CounterDownsamplePeriodMarker."""
        keep = set()
        if not samples:
            return keep
        keep.add(samples[0][0])                       # series head
        read = [0.0 if math.isnan(v) else v for _, v in samples]
        last_in_period = {}
        for t, _ in samples:
            last_in_period[(t - 1) // res] = t        # last wins (sorted)
        keep.update(last_in_period.values())
        for i in range(1, len(samples)):
            if read[i] < read[i - 1]:                 # dip
                keep.add(samples[i][0])
                keep.add(samples[i - 1][0])           # pre-dip
        return keep

    @pytest.fixture(scope="class")
    def random_counters(self, spark):
        import random
        rng = random.Random(1234)
        data = {}
        for i in range(40):
            n = rng.randint(0, 50)
            ts = sorted(set(rng.randint(0, 3_000_000) for _ in range(n)))
            v, out = rng.uniform(0, 100), []
            for t in ts:
                r = rng.random()
                if r < 0.06:
                    val = float("nan")                # reset marker
                elif r < 0.18:
                    v = rng.uniform(0, 5)             # dip
                    val = v
                else:
                    v += rng.uniform(0, 10)
                    val = v
                out.append((t, val))
            data[f"s{i}"] = out
        return data

    def test_matches_python_model(self, spark, random_counters):
        rows = [(k, int(t), float(v))
                for k, ss in random_counters.items() for t, v in ss]
        df = spark.createDataFrame(
            rows, "series string, ts long, value double")
        got = {}
        for r in downsample_counter(df, ["series"], self.RES).collect():
            got.setdefault(r["series"], set()).add(r["ts"])
        for k, ss in random_counters.items():
            want = self._model_keep(ss, self.RES)
            assert got.get(k, set()) == want, k

    def test_subset_invariants(self, spark, random_counters):
        """Every dip row and its predecessor survive, so the sum of
        corrections over the subset equals the raw sum of dips — the
        property that makes rate/increase correct on DS data."""
        for k, ss in random_counters.items():
            keep = self._model_keep(ss, self.RES)
            read = [0.0 if math.isnan(v) else v for _, v in ss]
            raw_corr = sum(read[i - 1] for i in range(1, len(ss))
                           if read[i] < read[i - 1])
            kept = [(t, read[i]) for i, (t, v) in enumerate(ss)
                    if t in keep]
            sub_corr = sum(kept[i - 1][1] for i in range(1, len(kept))
                           if kept[i][1] < kept[i - 1][1])
            assert sub_corr == pytest.approx(raw_corr), k


class TestDownsampleEligibility:
    """isEligibleForDownsample semantics
    (DownsamplerSettings.scala:174-180; applied per partition by
    BatchDownsampler.scala:151 and DSIndexJob.scala:116): allow/block
    entries are label->value maps matching only when EVERY pair is
    present; empty allow admits all; block wins over allow."""

    def _eligible(self, spark, labels, allow=(), block=()):
        from filodb_spark.streaming.downsample import \
            is_eligible_for_downsample
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(labels,)],
                                   "labels map<string,string>")
        return df.where(is_eligible_for_downsample(
            F.col("labels"), allow, block)).count() == 1

    def test_empty_allow_admits_all(self, spark):
        assert self._eligible(spark, {"_ws_": "w"})

    def test_allow_conjunction(self, spark):
        allow = ({"_ws_": "w", "_ns_": "n"},)
        assert self._eligible(spark, {"_ws_": "w", "_ns_": "n"}, allow)
        assert not self._eligible(spark, {"_ws_": "w"}, allow)
        assert not self._eligible(
            spark, {"_ws_": "w", "_ns_": "other"}, allow)

    def test_allow_disjunction_of_entries(self, spark):
        allow = ({"_ns_": "a"}, {"_ns_": "b"})
        assert self._eligible(spark, {"_ns_": "b"}, allow)
        assert not self._eligible(spark, {"_ns_": "c"}, allow)

    def test_missing_label_never_matches(self, spark):
        # a block entry naming an absent label must NOT block
        assert self._eligible(spark, {"_ws_": "w"},
                              block=({"_ns_": "n"},))
        # and an allow entry naming an absent label must not admit
        assert not self._eligible(spark, {"_ws_": "w"},
                                  allow=({"_ns_": "n"},))

    def test_block_wins_over_allow(self, spark):
        allow = ({"_ws_": "w"},)
        block = ({"_ns_": "n"},)
        assert not self._eligible(
            spark, {"_ws_": "w", "_ns_": "n"}, allow, block)
        assert self._eligible(
            spark, {"_ws_": "w", "_ns_": "ok"}, allow, block)

    def test_ladder_blocked_series_keep_raw_retention_only(
            self, spark, tmp_path):
        """The reference consequence: a blocked partition is never
        downsampled, so it lives only as long as raw retention."""
        from pyspark.sql import functions as F
        from filodb_spark.sources.table import (retention_ladder,
                                                write_series_table)
        day, hour = 24 * 3600 * 1000, 3600 * 1000
        t0 = 1_700_000_000_000 - (1_700_000_000_000 % day)
        rows = []
        for ns in ("keep", "drop"):
            rows += [({"__name__": "g", "_ws_": "w", "_ns_": ns},
                      t0 + d * day + h * hour, float(h))
                     for d in range(10) for h in range(24)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        raw = str(tmp_path / "raw")
        write_series_table(df, raw)
        retention_ladder(
            spark, raw, str(tmp_path / "tiers"),
            now_ms=t0 + 9 * day + 23 * hour,
            tiers=((6 * hour, "6h", 30),), raw_keep_days=3,
            block=({"_ns_": "drop"},))
        t6 = spark.read.parquet(str(tmp_path / "tiers/6h"))
        ns_vals = {r[0] for r in
                   t6.select(F.col("labels")["_ns_"]).distinct().collect()}
        assert ns_vals == {"keep"}
        # blocked series still present in surviving raw
        left = spark.read.parquet(raw)
        assert left.where(F.col("labels")["_ns_"] == "drop").count() > 0


class TestEligibilityProperties:
    """Randomized cross-check of is_eligible_for_downsample against a
    pure-Python port of DownsamplerSettings.isEligibleForDownsample
    (:174-180) — one Spark job over 300 random label sets x random
    allow/block configs."""

    @staticmethod
    def _model(pairs: dict, allow, block):
        def matches(m):
            return all(pairs.get(k) == v for k, v in m.items())
        if allow and not any(matches(m) for m in allow):
            return False
        return not any(matches(m) for m in block)

    def test_random_battery(self, spark):
        import random

        from pyspark.sql import functions as F

        from filodb_spark.streaming.downsample import \
            is_eligible_for_downsample
        rng = random.Random(987)
        keys = ["_ws_", "_ns_", "app", "dc"]
        vals = ["a", "b", "c"]

        def rand_map(max_pairs):
            return {k: rng.choice(vals)
                    for k in rng.sample(keys, rng.randint(1, max_pairs))}

        labels = [
            {k: rng.choice(vals) for k in rng.sample(
                keys, rng.randint(0, len(keys)))}
            for _ in range(300)]
        for _ in range(12):
            allow = tuple(rand_map(2) for _ in range(rng.randint(0, 3)))
            block = tuple(rand_map(2) for _ in range(rng.randint(0, 3)))
            df = spark.createDataFrame(
                [(i, m) for i, m in enumerate(labels)],
                "i long, labels map<string,string>")
            got = {r["i"] for r in df.where(is_eligible_for_downsample(
                F.col("labels"), allow, block)).collect()}
            want = {i for i, m in enumerate(labels)
                    if self._model(m, allow, block)}
            assert got == want, (allow, block,
                                 sorted(got ^ want)[:5])
