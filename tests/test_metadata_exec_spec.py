"""MetadataExecSpec goldens ported (reference:
query/src/test/scala/filodb/query/exec/MetadataExecSpec.scala) — the
same part-key fixture (5 prom series across 2 shards + a long-label
metric in its own workspace), each assertion run against BOTH metadata
paths: the part-key table and the sample-scan fallback. The reference's
`_metric_` key is `__name__` here (Prom default); its promCounter
schema name maps to this engine's "gauge" `_type_`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from filodb_spark import metadata
from filodb_spark.partkey import partkey_from_samples
from filodb_spark.promql.compiler import TsStore

PI, MU = "uniπtag", "uniμtag"

SERIES = [
    ("http_req_total", {"instance": "someHost:8787", "job": "myCoolService",
                        "unicode_tag": PI, "_ws_": "demo", "_ns_": "App-0"}),
    ("http_foo_total", {"instance": "someHost:8787", "job": "myCoolService",
                        "unicode_tag": MU, "_ws_": "demo", "_ns_": "App-0"}),
    ("http_req_total", {"instance": "someHost:9090", "job": "myCoolService",
                        "unicode_tag": PI, "_ws_": "demo", "_ns_": "App-0"}),
    ("http_bar_total", {"instance": "someHost:8787", "job": "myCoolService",
                        "unicode_tag": PI, "_ws_": "demo", "_ns_": "App-0"}),
    ("http_req_total-A", {"instance": "someHost:9090", "job": "myCoolService",
                          "unicode_tag": PI, "_ws_": "demo-A",
                          "_ns_": "App-A"}),
    ("long_labels_metric", {**{f"label{i}": str(i) * 20 for i in range(5)},
                            "job": "myUniqueService", "_ws_": "testws",
                            "_ns_": "testns"}),
]
NOW = 1_700_000_000_000


@pytest.fixture(scope="module")
def samples(spark):
    rows = []
    for metric, tags in SERIES:
        labels = {"__name__": metric, **tags}
        for i in range(10):
            rows.append((labels, NOW - (10 - i) * 10_000, float(i)))
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double").cache()


@pytest.fixture(scope="module", params=["partkey", "fallback"])
def store(request, samples):
    if request.param == "partkey":
        return TsStore(samples, partkey_df=partkey_from_samples(samples))
    return TsStore(samples)


def _maps(df):
    return sorted((sorted(r["labels"].items()) for r in df.collect()))


def test_label_values_multi_with_filters(store):
    # "should read the job names from timeseriesindex matching the
    # columnfilters" (MetadataExecSpec.scala:143-166): jobQueryResult1
    out = metadata.label_values_multi(
        store, ("job", "unicode_tag"),
        match='http_req_total{job="myCoolService"}',
        start_ms=NOW - 5_000_000, end_ms=NOW)
    assert _maps(out) == [[("job", "myCoolService"), ("unicode_tag", PI)]]


def test_label_values_multi_type_filter(store):
    # :167-191 — matching _type_ passes through; :192+ — a known
    # schema mismatch yields the empty result
    ok = metadata.label_values_multi(
        store, ("job", "unicode_tag"),
        match='http_req_total{_type_="gauge", job="myCoolService"}')
    assert _maps(ok) == [[("job", "myCoolService"), ("unicode_tag", PI)]]
    empty = metadata.label_values_multi(
        store, ("job", "unicode_tag"),
        match='http_req_total{_type_="prom-histogram", job="myCoolService"}')
    assert empty.count() == 0


def test_label_values_multi_unicode_filter(store):
    # "should be able to query with unicode filter": jobQueryResult2
    out = metadata.label_values_multi(
        store, ("job", "unicode_tag"), match='{unicode_tag="%s"}' % MU)
    assert _maps(out) == [[("job", "myCoolService"), ("unicode_tag", MU)]]


def test_label_values_multi_partial_maps(store):
    # LabelValueResultIterator:712-715 — a series lacking one requested
    # label contributes a PARTIAL map; series lacking all are skipped
    out = metadata.label_values_multi(store, ("unicode_tag", "label0"))
    maps = _maps(out)
    assert [("label0", "0" * 20)] in maps        # long-label series
    assert [("unicode_tag", PI)] in maps
    assert [("unicode_tag", MU)] in maps
    assert metadata.label_values_multi(store, ("nope",)).count() == 0


def test_labels_with_filter_includes_type(store):
    # "should be able to query labels with filter" (:329-353)
    out = metadata.label_names(store, match='{job="myCoolService"}')
    assert {r["label"] for r in out.collect()} == {
        "job", "__name__", "unicode_tag", "instance", "_ws_", "_ns_",
        "_type_"}
    # no matching series -> no _type_ row either
    assert metadata.label_names(store, match='{job="nobody"}').count() == 0


def test_label_values_of_type_label(store):
    out = metadata.label_values(store, "_type_")
    assert [r["value"] for r in out.collect()] == ["gauge"]


def test_label_cardinality_golden(store):
    # "should be able to query label cardinality" (:376-413)
    out = metadata.label_cardinality(
        store, match='http_req_total{_ws_="demo", _ns_="App-0"}')
    got = {r["label"]: r["cardinality"] for r in out.collect()}
    assert got == {"_ns_": 1, "unicode_tag": 1, "job": 1, "instance": 2,
                   "__name__": 1, "_ws_": 1, "_type_": 1}


TSCARD_SPECS = [
    ((), 1, {("demo",): 4, ("testws",): 1, ("demo-A",): 1}),
    ((), 2, {("demo", "App-0"): 4, ("testws", "testns"): 1,
             ("demo-A", "App-A"): 1}),
    ((), 3, {("demo", "App-0", "http_req_total"): 2,
             ("demo", "App-0", "http_bar_total"): 1,
             ("demo", "App-0", "http_foo_total"): 1,
             ("demo-A", "App-A", "http_req_total-A"): 1,
             ("testws", "testns", "long_labels_metric"): 1}),
    (("demo",), 1, {("demo",): 4}),
    (("demo",), 2, {("demo", "App-0"): 4}),
    (("demo",), 3, {("demo", "App-0", "http_req_total"): 2,
                    ("demo", "App-0", "http_bar_total"): 1,
                    ("demo", "App-0", "http_foo_total"): 1}),
    (("demo", "App-0"), 2, {("demo", "App-0"): 4}),
    (("demo", "App-0"), 3, {("demo", "App-0", "http_req_total"): 2,
                            ("demo", "App-0", "http_bar_total"): 1,
                            ("demo", "App-0", "http_foo_total"): 1}),
    (("demo", "App-0", "http_req_total"), 3,
     {("demo", "App-0", "http_req_total"): 2}),
]


def test_ts_card_exec_goldens(store):
    # "should correctly execute TsCardExec" (:414-491) — all nine
    # (shardKeyPrefix, numGroupByFields) specs; CardCounts collapse to
    # total_series in a single-store engine. Drives the EXEC analog
    # directly, like the reference spec constructing TsCardExec — two
    # specs ((), 3 and ("demo",), 3) are rejected by the logical plan's
    # third require but remain valid exec shapes.
    for prefix, n, expected in TSCARD_SPECS:
        out = metadata.ts_card_exec(store, prefix, n)
        fields = ("_ws_", "_ns_", "__name__")[:max(n, len(prefix))]
        got = {tuple(r[f] for f in fields): r["total_series"]
               for r in out.collect()}
        assert got == expected, (prefix, n)


def test_ts_cardinalities_requires(store):
    # the three TsCardinalities requires (LogicalPlan.scala:350-355)
    import pytest
    with pytest.raises(ValueError, match=r"lie on \[1, 3\]"):
        metadata.ts_cardinality_prefix(store, (), 0)
    with pytest.raises(ValueError, match="at least as deep"):
        metadata.ts_cardinality_prefix(store, ("demo", "App-0"), 1)
    # cannot group at the metric level when the prefix lacks ws and ns
    for prefix in ((), ("demo",)):
        with pytest.raises(ValueError, match="metric level"):
            metadata.ts_cardinality_prefix(store, prefix, 3)
    # size-2 prefix with n=3 is legal
    assert metadata.ts_cardinality_prefix(
        store, ("demo", "App-0"), 3).count() > 0


def test_topk_overflow_group(store):
    # "should add overflow group" (:491-549): capacity 1 -> one real
    # group plus `_overflow_` carrying the SUM of the dropped groups
    out = metadata.topk_cardinality(
        store, ("_ws_", "_ns_", "__name__"), k=1, overflow=True)
    rows = {tuple(r[f] for f in ("_ws_", "_ns_", "__name__")):
            r["total_series"] for r in out.collect()}
    assert len(rows) == 2
    assert rows.pop(("_overflow_",) * 3) == 4  # 6 series - top group's 2
    ((group, count),) = rows.items()
    assert group == ("demo", "App-0", "http_req_total") and count == 2


def test_series_with_times(store):
    out = metadata.series(store, 'http_req_total{instance="someHost:8787"}',
                          with_times=True).collect()
    assert len(out) == 1
    labels = out[0]["labels"]
    assert labels["_firstSampleTime_"] == str(NOW - 100_000)
    assert labels["_lastSampleTime_"] == str(NOW - 10_000)
    assert labels["_type_"] == "gauge"


class TestHistSeriesInMetadata:
    """The reference's per-shard index covers EVERY schema's part keys —
    histogram series must be visible to unmatched metadata queries on
    both paths (one index per shard, not per schema)."""

    @pytest.fixture(scope="class")
    def hist_store(self, spark, samples):
        hist = spark.createDataFrame(
            [({"__name__": "lat", "job": "histsvc", "_ws_": "demo",
               "_ns_": "App-H"}, NOW - 50_000, 1.0, 2.0,
              ([1.0, 2.0], [1.0, 2.0]))],
            "labels map<string,string>, ts long, sum double, count double, "
            "hist struct<les: array<double>, values: array<double>>")
        return hist

    def _stores(self, samples, hist):
        from filodb_spark.partkey import partkey_from_store
        plain = TsStore(samples, hist_df=hist, hist_metrics=("lat",))
        indexed = TsStore(samples, hist_df=hist, hist_metrics=("lat",))
        return plain, TsStore(samples, hist_df=hist, hist_metrics=("lat",),
                              partkey_df=partkey_from_store(indexed))

    def test_unmatched_metadata_sees_hist_series(self, samples, hist_store):
        for st in self._stores(samples, hist_store):
            names = {r["label"] for r in metadata.label_names(st).collect()}
            assert "job" in names
            vals = [r["value"] for r in
                    metadata.label_values(st, "job").collect()]
            assert "histsvc" in vals
            card = {tuple(r[g] for g in ("__name__",)): r["total_series"]
                    for r in metadata.ts_cardinality(st).collect()}
            assert card[("lat",)] == 1

    def test_hist_type_label(self, samples, hist_store):
        for st in self._stores(samples, hist_store):
            out = metadata.series(st, 'lat{job="histsvc"}').collect()
            assert len(out) == 1
            assert out[0]["labels"]["_type_"] == "prom-histogram"
            types = [r["value"] for r in
                     metadata.label_values(st, "_type_").collect()]
            assert types == ["gauge", "prom-histogram"]
