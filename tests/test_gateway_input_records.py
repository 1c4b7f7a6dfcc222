"""Gateway input-record goldens — PrometheusInputRecordSpec +
InputRecordBuilderSpec.

Sources (behavior only):
gateway/src/test/scala/filodb/gateway/conversion/
PrometheusInputRecordSpec.scala — metric extraction, drop-if-no-metric,
copyTags; InputRecordBuilderSpec.scala — bucket kvs + sum/count [+
min/max] assembly into prom-histogram / otel-cumulative records,
LongHistogram truncation, skip-empty gate.

Not ported: the binary-record byte-identity cases (TreeMap vs Map
overloads produce identical BinaryRecords; predefined-key renames) —
BinaryRecordV2 encoding concerns with no DataFrame analog (rows carry
a labels map; tag ordering cannot be observed), and shardKeyHash
equality (shard routing is write_series_table's physical partitioning
here).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.sources.gateway import (assemble_prom_hist_records,
                                          prometheus_records)

SCHEMA = "labels map<string,string>, ts long, value double"
BASE = {"dataset": "timeseries", "host": "MacBook-Pro-229.local",
        "shard": "0"}

# InputRecordBuilderSpec fixture: counts per bucket, sum/count/min/max
BUCKETS = ["0.5", "1.0", "2.5", "5.0", "10.0", "+Inf"]
COUNTS = [10.0, 20.0, 25.0, 38.0, 50.0, 66.0]
SUM, COUNT = float(sum(COUNTS)), 50.0
MIN, MAX = 10.0, 66.0


def _hist_series_rows(metric="my_hist", ts=100_000, tags=BASE,
                      minmax=False, buckets=True):
    rows = []
    if buckets:
        for le, v in zip(BUCKETS, COUNTS):
            rows.append(({**tags, "__name__": f"{metric}_bucket",
                          "le": le}, ts, v))
    rows.append(({**tags, "__name__": f"{metric}_sum"}, ts, SUM))
    rows.append(({**tags, "__name__": f"{metric}_count"}, ts, COUNT))
    if minmax:
        rows.append(({**tags, "__name__": f"{metric}_min"}, ts, MIN))
        rows.append(({**tags, "__name__": f"{metric}_max"}, ts, MAX))
    return rows


class TestHistAssembly:
    def test_prom_hist_record(self, spark):
        df = spark.createDataFrame(_hist_series_rows(), SCHEMA)
        out = assemble_prom_hist_records(df).collect()
        assert len(out) == 1
        r = out[0]
        assert r["ts"] == 100_000 and r["sum"] == SUM \
            and r["count"] == COUNT
        assert dict(r["labels"]) == {**BASE, "__name__": "my_hist"}
        assert list(r["hist"]["les"]) == \
            [0.5, 1.0, 2.5, 5.0, 10.0, float("inf")]
        assert list(r["hist"]["values"]) == COUNTS

    def test_otel_cumulative_with_minmax(self, spark):
        df = spark.createDataFrame(_hist_series_rows(minmax=True), SCHEMA)
        out = assemble_prom_hist_records(df, minmax=True).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["sum"], r["count"], r["min"], r["max"]) == \
            (SUM, COUNT, MIN, MAX)
        assert list(r["hist"]["values"]) == COUNTS

    def test_skip_empty_histograms_write_subsequent(self, spark):
        # InputRecordBuilderSpec:127-143 — a group with NO buckets
        # writes no record; the next complete group still lands
        rows = _hist_series_rows(metric="empty", buckets=False) + \
            _hist_series_rows(metric="full")
        df = spark.createDataFrame(rows, SCHEMA)
        out = assemble_prom_hist_records(df).collect()
        assert len(out) == 1
        assert out[0]["labels"]["__name__"] == "full"

    def test_no_inf_bucket_drops_group(self, spark):
        # the gotInf gate (InfluxRecord.scala parity — a cumulative
        # histogram without +Inf cannot serve quantiles)
        rows = [r for r in _hist_series_rows()
                if r[0].get("le") != "+Inf"]
        df = spark.createDataFrame(rows, SCHEMA)
        assert assemble_prom_hist_records(df).count() == 0

    def test_bucket_values_truncate_to_long(self, spark):
        # LongHistogram: extractSumCountBuckets does v.toLong
        rows = [({**BASE, "__name__": "m_bucket", "le": "1.0"},
                 1, 3.9),
                ({**BASE, "__name__": "m_bucket", "le": "+Inf"},
                 1, 7.2),
                ({**BASE, "__name__": "m_sum"}, 1, 11.1),
                ({**BASE, "__name__": "m_count"}, 1, 7.0)]
        out = assemble_prom_hist_records(
            spark.createDataFrame(rows, SCHEMA)).collect()
        assert list(out[0]["hist"]["values"]) == [3.0, 7.0]
        assert out[0]["sum"] == 11.1  # sum/count stay double

    def test_missing_sum_count_stay_nan(self, spark):
        # extractSumCountBuckets initializes sum/count to NaN
        rows = [({**BASE, "__name__": "m_bucket", "le": "+Inf"}, 1, 5.0)]
        out = assemble_prom_hist_records(
            spark.createDataFrame(rows, SCHEMA)).collect()
        assert math.isnan(out[0]["sum"]) and math.isnan(out[0]["count"])

    def test_separate_timestamps_separate_records(self, spark):
        rows = _hist_series_rows(ts=100_000) + _hist_series_rows(ts=200_000)
        out = assemble_prom_hist_records(
            spark.createDataFrame(rows, SCHEMA)).collect()
        assert sorted(r["ts"] for r in out) == [100_000, 200_000]


class TestPrometheusRecords:
    def _run(self, spark, rows):
        return prometheus_records(
            spark.createDataFrame(rows, SCHEMA)).collect()

    def test_metric_and_tags(self, spark):
        # "should parse from TimeSeries proto": metric from __name__,
        # tags keep everything else
        tags = {**BASE, "__name__": "num_partitions", "_ns_": "filodb",
                "_ws_": "demo"}
        (r,) = self._run(spark, [(tags, 1_000_000, 1.1)])
        assert dict(r["labels"]) == tags
        assert (r["ts"], r["value"]) == (1_000_000, 1.1)

    def test_drops_rows_without_metric(self, spark):
        # "should not return any records if metric missing"
        assert self._run(spark, [(BASE, 1_000_000, 1.1)]) == []

    def test_metric_column_normalizes(self, spark):
        # a `_metric_` label is the metric column's alias
        (r,) = self._run(
            spark, [({**BASE, "_metric_": "num_partitions"},
                     1_000_000, 1.1)])
        assert r["labels"]["__name__"] == "num_partitions"
        assert "_metric_" not in r["labels"]

    def test_copy_tags_fills_missing_ns(self, spark):
        # "should copy tags from another key if copyTags defined and
        # original key missing": exporter -> _ns_
        tags = {**BASE, "__name__": "num_partitions",
                "exporter": "gateway", "_ws_": "demo"}
        (r,) = self._run(spark, [(tags, 1_000_000, 1.1)])
        assert r["labels"]["_ns_"] == "gateway"
        assert r["labels"]["exporter"] == "gateway"  # source kept
        # no source tag -> nothing added
        (r2,) = self._run(
            spark, [({**BASE, "__name__": "num_partitions"},
                     1_000_000, 1.1)])
        assert "_ns_" not in r2["labels"]

    def test_copy_tags_honors_order_and_existing(self, spark):
        # filodb-defaults.conf:186-195 — _ns_ sources in order
        # [_ns, exporter, job]; an existing _ns_ is never overwritten
        tags = {"__name__": "m", "_ns": "first", "exporter": "second",
                "job": "third"}
        (r,) = self._run(spark, [(tags, 1, 1.0)])
        assert r["labels"]["_ns_"] == "first"
        tags2 = {"__name__": "m", "exporter": "second", "job": "third"}
        (r2,) = self._run(spark, [(tags2, 1, 1.0)])
        assert r2["labels"]["_ns_"] == "second"
        tags3 = {"__name__": "m", "_ns_": "keep", "exporter": "second"}
        (r3,) = self._run(spark, [(tags3, 1, 1.0)])
        assert r3["labels"]["_ns_"] == "keep"


def test_remote_write_hist_end_to_end(spark):
    """Remote-write bucket series -> gateway conversion -> histogram
    table -> histogram_quantile through the engine: the ingest-side
    assembly feeds the query side losslessly."""
    from filodb_spark.promql.compiler import PromQLEngine, TsStore
    from filodb_spark.remote_write import (decode_write_request,
                                           encode_write_request)
    series = []
    for le, v in zip(BUCKETS, COUNTS):
        series.append(({**BASE, "__name__": "lat_bucket", "le": le,
                        "_ns_": "app"}, [(100_000, v)]))
    series.append(({**BASE, "__name__": "lat_sum", "_ns_": "app"},
                   [(100_000, SUM)]))
    series.append(({**BASE, "__name__": "lat_count", "_ns_": "app"},
                   [(100_000, COUNT)]))
    wire = encode_write_request(series)
    rows = [(labels, int(ts), float(v))
            for labels, samples in decode_write_request(wire)
            for ts, v in samples]
    df = prometheus_records(spark.createDataFrame(rows, SCHEMA))
    hist = assemble_prom_hist_records(df)
    store = TsStore(df.where(F.lit(False)), hist_df=hist,
                    hist_metrics=("lat",))
    out = PromQLEngine(spark, store).query_range(
        "histogram_quantile(0.5, lat)", 100_000, 100_000, 10_000) \
        .collect()
    assert len(out) == 1
    # median of the builder-spec histogram: 25 of 66 at le<=2.5,
    # 38 at le<=5 -> interpolates inside (2.5, 5]
    assert 2.5 < out[0]["value"] <= 5.0


class TestExpHistAssembly:
    def test_otel_exp_delta_record(self, spark):
        # InputRecordBuilderSpec:101-125 — Base2ExpHistogramBuckets
        # (scale 3, posBucketOffset -5, 10 positive buckets), cumulative
        # counts 1..11 (index 0 = zero bucket)
        from filodb_spark.kernels.histogram import base2_exp_les
        from filodb_spark.sources.gateway import \
            assemble_otel_exp_hist_records
        counts = list(range(1, 12))
        rows = [({**BASE, "__name__": "my_hist_bucket", "idx": str(i)},
                 100_000, float(c)) for i, c in enumerate(counts)]
        rows += [({**BASE, "__name__": "my_hist_sum"}, 100_000, SUM),
                 ({**BASE, "__name__": "my_hist_count"}, 100_000, COUNT),
                 ({**BASE, "__name__": "my_hist_min"}, 100_000, MIN),
                 ({**BASE, "__name__": "my_hist_max"}, 100_000, MAX),
                 ({**BASE, "__name__": "my_hist_scale"}, 100_000, 3.0),
                 ({**BASE, "__name__": "my_hist_posBucketOffset"},
                  100_000, -5.0)]
        out = assemble_otel_exp_hist_records(
            spark.createDataFrame(rows, SCHEMA)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["sum"], r["count"], r["min"], r["max"]) == \
            (SUM, COUNT, MIN, MAX)
        assert dict(r["labels"]) == {**BASE, "__name__": "my_hist"}
        assert list(r["hist"]["values"]) == [float(c) for c in counts]
        # les computed in-plan (Java Math.pow) can differ from the
        # Python helper by 1 ulp; every row assembled by the same plan
        # shares bitwise-identical les, which is what scheme grouping
        # (hist_sum count_distinct on les) depends on
        assert list(r["hist"]["les"]) == \
            pytest.approx(base2_exp_les(3, -5, 10), rel=1e-15)

    def test_exp_skip_empty(self, spark):
        from filodb_spark.sources.gateway import \
            assemble_otel_exp_hist_records
        rows = [({**BASE, "__name__": "m_sum"}, 1, 1.0),
                ({**BASE, "__name__": "m_scale"}, 1, 3.0)]
        assert assemble_otel_exp_hist_records(
            spark.createDataFrame(rows, SCHEMA)).count() == 0
