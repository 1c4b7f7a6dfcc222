"""Full-lifecycle integration: real events fixture -> partitioned series
table on disk -> TsStore.from_table -> PromQL engine -> Prometheus JSON."""

import pytest
from pyspark.sql import functions as F

from filodb_spark.api import query_api, query_range_api
from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore
from filodb_spark.sources.table import write_series_table
from filodb_spark.tsdf import events_labels_ts


@pytest.fixture(scope="module")
def table_engine(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "gauge")
    df = events_labels_ts(spark, "/root/testdata/sf0.001")
    # tag shard-key labels so the table partitions meaningfully
    df = df.withColumn("labels", F.map_concat(
        "labels", F.create_map(F.lit("_ws_"), F.lit("demo"),
                               F.lit("_ns_"), F.col("labels")["__name__"])))
    write_series_table(df, path)
    eng = PromQLEngine(spark, TsStore.from_table(spark, path),
                       lookback_ms=24 * 3600 * 1000)
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    return eng, lo, hi


class TestLifecycle:
    def test_query_range_json(self, table_engine):
        eng, lo, hi = table_engine
        resp = query_range_api(
            eng, 'sum by (__name__) (count_over_time({_ws_="demo"}[24h]))',
            lo / 1000, hi / 1000, 6 * 3600)
        assert resp["status"] == "success"
        assert resp["data"]["resultType"] == "matrix"
        result = resp["data"]["result"]
        assert len(result) == 5  # five metrics
        m = {r["metric"]["__name__"]: r for r in result}
        assert "purchase" in m
        t, v = m["purchase"]["values"][0]
        assert float(v) > 0 and isinstance(t, float)

    def test_query_instant_json(self, table_engine):
        eng, lo, hi = table_engine
        resp = query_api(eng, 'count({_ws_="demo"})', hi / 1000)
        assert resp["data"]["resultType"] == "vector"
        [r] = resp["data"]["result"]
        assert float(r["value"][1]) > 0

    def test_partition_pruning_via_selector(self, table_engine, spark):
        eng, lo, hi = table_engine
        # _ns_ equals the metric name by construction; the selector filter
        # should restrict results to one metric
        df = eng.query_range('{_ns_="purchase"}', hi, hi, 1000)
        names = {r["labels"]["__name__"] for r in df.collect()}
        assert names == {"purchase"}


def test_fmt_prometheus_value_strings():
    # Prometheus renders sample values as strings: bare integers,
    # +Inf/-Inf for infinities (PrometheusModel value rendering)
    from filodb_spark.api import _fmt
    assert _fmt(5.0) == "5"
    assert _fmt(2.5) == "2.5"
    assert _fmt(float("inf")) == "+Inf"
    assert _fmt(float("-inf")) == "-Inf"
