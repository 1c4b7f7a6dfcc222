"""PromQL engine over histogram-schema metrics: struct histograms,
_bucket/_sum/_count rewrites, hist rate, hist sum, quantile agreement
between struct and bucket forms (FIXTURES golden query #5)."""

import pytest
from pyspark.sql import functions as F

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

T0 = 1_700_000_000_000
INF = float("inf")
LES = [1.0, 2.0, 4.0, INF]


@pytest.fixture(scope="module")
def hist_engine(spark):
    rows = []
    # cumulative histogram: at step i, bucket counts grow linearly;
    # series a grows 2x faster than b
    for job, mult in [("a", 2.0), ("b", 1.0)]:
        for i in range(5):
            vals = [mult * i * 1, mult * i * 2, mult * i * 3, mult * i * 4]
            rows.append(({"__name__": "http_latency", "job": job},
                         T0 + i * 10_000,
                         float(mult * i * 40), float(mult * i * 4),
                         (LES, vals)))
    hist_df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, sum double, count double, "
              "hist struct<les: array<double>, values: array<double>>")
    gauge_df = spark.createDataFrame(
        [], "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(gauge_df, hist_df=hist_df,
                                       hist_metrics=("http_latency",)))


def rows_of(df):
    return [(dict(r["labels"] or {}), r["t"],
             r["value"] if "value" in r.__fields__ else r["hist"])
            for r in df.collect()]


class TestHistSchema:
    T = T0 + 40_000

    def test_hist_rate_quantile(self, hist_engine):
        res = rows_of(hist_engine.query_range(
            "histogram_quantile(0.5, rate(http_latency[40s]))",
            self.T, self.T, 10_000))
        assert len(res) == 2
        # per-bucket rate for series a: [0.2, 0.4, 0.6, 0.8]/s
        # rank = 0.5*0.8 = 0.4 = cum of bucket le=2 -> exactly at bucket 2:
        # interp in (1,2]: lo_cum=0.2, frac=(0.4-0.2)/(0.4-0.2)=1 -> le=2
        vals = {lab["job"]: v for lab, _, v in res}
        assert vals["a"] == pytest.approx(2.0)
        assert vals["b"] == pytest.approx(2.0)  # shape identical, scaled

    def test_sum_count_rewrites(self, hist_engine):
        # avg latency = rate(_sum) / rate(_count) = 40i/4i = 10
        res = rows_of(hist_engine.query_range(
            "rate(http_latency_sum[40s]) / rate(http_latency_count[40s])",
            self.T, self.T, 10_000))
        assert len(res) == 2
        assert all(v == pytest.approx(10.0) for _, _, v in res)

    def test_bucket_rewrite_and_agreement(self, hist_engine):
        # exploded _bucket series carry an le label...
        res = rows_of(hist_engine.query_range(
            'http_latency_bucket{job="a", le="2"}', self.T, self.T, 10_000))
        assert len(res) == 1 and res[0][2] == 16.0  # 2*4*2
        # ...and histogram_quantile agrees between struct & bucket forms
        q_struct = rows_of(hist_engine.query_range(
            "histogram_quantile(0.5, http_latency)", self.T, self.T, 10_000))
        q_bucket = rows_of(hist_engine.query_range(
            "histogram_quantile(0.5, http_latency_bucket)",
            self.T, self.T, 10_000))
        s = {lab["job"]: v for lab, _, v in q_struct}
        b = {lab["job"]: v for lab, _, v in q_bucket}
        assert s == pytest.approx(b)

    def test_hist_sum_aggregation(self, hist_engine):
        res = hist_engine.query_range(
            "histogram_quantile(0.5, sum(rate(http_latency[40s])))",
            self.T, self.T, 10_000).collect()
        assert len(res) == 1
        # summed bucket rates keep the same shape -> same quantile
        assert res[0]["value"] == pytest.approx(2.0)

    def test_hist_fraction(self, hist_engine):
        res = hist_engine.query_range(
            "histogram_fraction(0, 2, http_latency)",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        # at last sample: cum at 2 = half of total (16/32 for a)
        assert vals["a"] == pytest.approx(0.5)


class TestHistBucketAndSort:
    T = T0 + 40_000

    def test_histogram_bucket(self, hist_engine):
        res = hist_engine.query_range(
            "histogram_bucket(2.0, http_latency)", self.T, self.T, 10_000
        ).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals["a"] == 16.0  # 2 * 4 * 2
        assert vals["b"] == 8.0

    def test_hist_to_prom_vectors(self, hist_engine):
        # one series per bucket with an le label
        # (HistToPromSeriesMapper, RangeVectorTransformer.scala:497-573)
        res = hist_engine.query_range(
            "hist_to_prom_vectors(http_latency)", self.T, self.T, 10_000
        ).collect()
        assert len(res) == 8              # 2 series x 4 buckets
        by_series = {(r["labels"]["job"], r["labels"]["le"]): r["value"]
                     for r in res}
        # series a at i=4: buckets [8, 16, 24, 32]; le strings Prom-style
        assert by_series[("a", "1")] == 8.0
        assert by_series[("a", "2")] == 16.0
        assert by_series[("a", "+Inf")] == 32.0
        assert by_series[("b", "4")] == 12.0
        # metric name gains the Prom _bucket suffix
        # (HistToPromSeriesMapperSpec.scala:47-51)
        assert all(r["labels"]["__name__"] == "http_latency_bucket"
                   for r in res)

    def test_sort_desc(self, hist_engine):
        res = hist_engine.query_range(
            "sort_desc(rate(http_latency_count[40s]))", self.T, self.T, 10_000
        ).collect()
        vals = [r["value"] for r in res]
        assert vals == sorted(vals, reverse=True)


@pytest.fixture(scope="module")
def maxmin_engine(spark):
    # histogram schema WITH min/max companion columns (otel-style)
    rows = []
    for i in range(5):
        vals = [float(i), float(2 * i), float(4 * i)]
        rows.append(({"__name__": "lat2", "job": "a"}, T0 + i * 10_000,
                     float(i * 40), float(i * 4), 0.5, 3.5,
                     ([1.0, 2.0, INF], vals)))
    hist_df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, sum double, count double, "
              "min double, max double, "
              "hist struct<les: array<double>, values: array<double>>")
    gauge_df = spark.createDataFrame(
        [], "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(gauge_df, hist_df=hist_df,
                                       hist_metrics=("lat2",)))


class TestMaxQuantile:
    T = T0 + 40_000

    def test_max_quantile_interpolates_to_max(self, maxmin_engine):
        # q=0.9: rank=0.9*16=14.4 -> +Inf bucket (cum 8..16); with max=3.5
        # inside, bucket (2, 3.5]: frac=(14.4-8)/8 -> 2 + 1.5*0.8 = 3.2
        res = maxmin_engine.query_range(
            "histogram_max_quantile(0.9, last_over_time(lat2[50s]))",
            self.T, self.T, 10_000).collect()
        assert res[0]["value"] == pytest.approx(2.0 + 1.5 * 0.8)

    def test_plain_quantile_clamps_at_top(self, maxmin_engine):
        res = maxmin_engine.query_range(
            "histogram_quantile(0.9, last_over_time(lat2[50s]))",
            self.T, self.T, 10_000).collect()
        assert res[0]["value"] == pytest.approx(2.0)  # last finite le

    def test_rate_carries_minmax(self, maxmin_engine):
        res = maxmin_engine.query_range(
            "histogram_max_quantile(0.9, rate(lat2[50s]))",
            self.T, self.T, 10_000).collect()
        # bucket rates keep shape; rank in +Inf bucket -> interpolate to
        # window-max 3.5: same 3.2 as counts are proportional
        assert res[0]["value"] == pytest.approx(3.2)


class TestMixedSchemeThroughEngine:
    """sum() over histogram series with heterogeneous bucket schemes:
    reference parity = all-NaN result histogram (addNoCorrection's
    mismatched-scheme branch, Histogram.scala:367-420)."""

    def test_sum_mixed_schemes_is_nan(self, spark):
        import math
        rows = []
        for job, les in [("a", [1.0, 2.0, INF]), ("b", [1.5, 3.0, INF])]:
            for i in range(3):
                vals = [float(i), float(2 * i), float(3 * i)]
                rows.append(({"__name__": "lat_mixed", "job": job},
                             T0 + i * 10_000, float(i), float(i),
                             (les, vals)))
        hist_df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, sum double, "
                  "count double, "
                  "hist struct<les: array<double>, values: array<double>>")
        gauge_df = spark.createDataFrame(
            [], "labels map<string,string>, ts long, value double")
        eng = PromQLEngine(spark, TsStore(gauge_df, hist_df=hist_df,
                                          hist_metrics=("lat_mixed",)))
        t = T0 + 20_000
        res = eng.query_range("sum(lat_mixed)", t, t, 10_000).collect()
        assert len(res) == 1
        assert all(math.isnan(v) for v in res[0]["hist"]["values"])
        # and quantile over the NaN histogram is NaN, not garbage
        q = eng.query_range("histogram_quantile(0.9, sum(lat_mixed))",
                            t, t, 10_000).collect()
        assert len(q) == 1 and math.isnan(q[0]["value"])

    def test_sum_same_scheme_unaffected(self, spark):
        rows = []
        for job in ["a", "b"]:
            rows.append(({"__name__": "lat_same", "job": job}, T0,
                         1.0, 1.0, ([1.0, INF], [1.0, 2.0])))
        hist_df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, sum double, "
                  "count double, "
                  "hist struct<les: array<double>, values: array<double>>")
        gauge_df = spark.createDataFrame(
            [], "labels map<string,string>, ts long, value double")
        eng = PromQLEngine(spark, TsStore(gauge_df, hist_df=hist_df,
                                          hist_metrics=("lat_same",)))
        res = eng.query_range("sum(lat_same)", T0, T0, 10_000).collect()
        assert len(res) == 1
        assert list(res[0]["hist"]["values"]) == [2.0, 4.0]


class TestExpSchemeMergeThroughEngine:
    """sum() over base-2 exponential histograms with two different
    scales: the engine discovers the schemes at plan time and merges
    onto the reference's merged scheme (min scale, union range) instead
    of NaN-ing — Base2ExpHistogramBuckets.add via hist_sum(target_les)."""

    def _engine(self, spark):
        from filodb_spark.kernels.histogram import base2_exp_les
        a_les = base2_exp_les(1, 0, 4)       # scale 1: [0, r2, 2, 2r2, 4]
        b_les = base2_exp_les(0, 0, 3)       # scale 0: [0, 2, 4, 8]
        rows = [
            ({"__name__": "exp_lat", "job": "a"}, T0, 1.0, 1.0,
             (a_les, [1.0, 2.0, 3.0, 4.0, 5.0])),
            ({"__name__": "exp_lat", "job": "b"}, T0, 1.0, 1.0,
             (b_les, [10.0, 20.0, 30.0, 40.0])),
        ]
        hist_df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, sum double, "
                  "count double, "
                  "hist struct<les: array<double>, values: array<double>>")
        gauge_df = spark.createDataFrame(
            [], "labels map<string,string>, ts long, value double")
        return PromQLEngine(spark, TsStore(
            gauge_df, hist_df=hist_df, hist_metrics=("exp_lat",),
            exp_hist_metrics=("exp_lat",)))

    def test_sum_merges_exp_scales(self, spark):
        eng = self._engine(spark)
        res = eng.query_range("sum(exp_lat)", T0, T0, 10_000).collect()
        assert len(res) == 1
        h = res[0]["hist"]
        # merged scheme (0, -1, 4): les [0, 1, 2, 4, 8]
        assert list(h["les"]) == [0.0, 1.0, 2.0, 4.0, 8.0]
        vals = list(h["values"])
        assert vals[0] == 11.0                 # zero buckets 1 + 10
        assert vals[2:] == [23.0, 35.0, 45.0]  # exact in-range remaps
        import math
        assert not any(math.isnan(v) for v in vals)

    def test_quantile_over_merged(self, spark):
        eng = self._engine(spark)
        res = eng.query_range(
            "histogram_quantile(0.5, sum(exp_lat))", T0, T0, 10_000
        ).collect()
        assert len(res) == 1
        v = res[0]["value"]
        import math
        assert math.isfinite(v) and 0.0 < v <= 8.0


def test_hist_rejection_names_the_users_function(hist_engine):
    """absent_over_time internally recurses into present_over_time; the
    histogram-schema rejection must name the fn the USER wrote, not the
    internal presence probe (ADVICE r11)."""
    with pytest.raises(ValueError,
                       match=r"absent_over_time is not defined over "
                             r"histograms"):
        hist_engine.query_range("absent_over_time(http_latency[30s])",
                                T0, T0 + 40_000, 10_000)
    with pytest.raises(ValueError,
                       match=r"deriv is not defined over histograms"):
        hist_engine.query_range("deriv(http_latency[30s])",
                                T0, T0 + 40_000, 10_000)
