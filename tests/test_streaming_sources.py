"""Tests: streaming ingest (file source end-to-end), downsampler +
ds rewrites + stitch, influx/CSV parsers, metadata queries."""

import json
import os

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.grid import StepGrid
from filodb_spark.metadata import (label_cardinality, label_names,
                                   label_values, series, ts_cardinality)
from filodb_spark.promql.compiler import TsStore
from filodb_spark.sources.influx import (parse_influx_hist_lines,
                                         parse_influx_lines)
from filodb_spark.streaming.downsample import (downsample, range_function_ds,
                                               stitch_raw_ds)
from filodb_spark.streaming.ingest import (dedupe_batch, parse_json_records,
                                           start_ingest)

# slow battery: skipped by default for the driver's pytest budget (SPARK_GRAFT_RUN_SLOW=1 runs it; scripts/round_close.py does)
pytestmark = pytest.mark.slow


class TestInflux:
    def test_parse_basic(self, spark):
        lines = [
            "cpu,host=h1,dc=east usage=0.5,idle=99 1700000000000000000",
            "mem,host=h2 used=1024i 1700000001000000000",
            r"disk,path=/a\ b free=10 1700000002000000000",
        ]
        df = parse_influx_lines(spark.createDataFrame(
            [(l,) for l in lines], "value string"))
        rows = {(r["labels"]["__name__"], r["labels"].get("host"),
                 r["ts"], r["value"]) for r in df.collect()}
        assert ("cpu_usage", "h1", 1700000000000, 0.5) in rows
        assert ("cpu_idle", "h1", 1700000000000, 99.0) in rows
        assert ("mem_used", "h2", 1700000001000, 1024.0) in rows
        disk = [r for r in df.collect() if r["labels"]["__name__"] == "disk_free"]
        assert disk[0]["labels"]["path"] == "/a b"

    def test_hostile_lines_drop_not_crash(self, spark):
        """Ingest hardening: one malformed line must never kill the
        batch — it is dropped (or leniently parsed) while good lines
        in the SAME batch survive."""
        lines = [
            "cpu,host=h1 usage=0.5 1700000000000000000",     # good
            "garbage",                                       # no fields
            "m,host=h1,host=h2 v=1 1700000000000000000",     # dup tag key
            "m,__name__=evil v=1 1700000000000000000",       # reserved tag
            "m,host v=1 1700000000000000000",                # tag missing =
            "m,host=h1 v=notanumber 1700000000000000000",    # bad field
            "m,host=h1 v=1 not_a_timestamp",                 # bad ts
            "",                                              # empty
        ]
        df = parse_influx_lines(spark.createDataFrame(
            [(l,) for l in lines], "value string"))
        rows = df.collect()   # must not raise
        got = {(r["labels"]["__name__"], r["ts"], r["value"])
               for r in rows}
        assert ("cpu_usage", 1700000000000, 0.5) in got
        # dup-tag line survives with first-occurrence-wins tags
        dup = [r for r in rows if r["labels"]["__name__"] == "m_v"
               and r["labels"].get("host") == "h1"]
        assert any(r["labels"].get("host") == "h1" for r in dup)
        # reserved __name__ tag cannot hijack the metric name
        assert all(r["labels"]["__name__"] != "evil" for r in rows)
        # bad-timestamp line is dropped, not ingested at "now"
        assert all(r["ts"] == 1700000000000 for r in rows)

    def test_missing_timestamp_defaults_to_now(self, spark):
        import time
        df = parse_influx_lines(spark.createDataFrame(
            [("cpu,host=h1 usage=1",)], "value string"))
        r = df.collect()[0]
        assert abs(r["ts"] - time.time() * 1000) < 60_000


class TestJsonRecordHardening:
    def test_hostile_records_drop_not_crash(self, spark):
        recs = [
            '{"metric":"m","tags":{"h":"a"},"ts":1,"value":2.0}',  # good
            'not json at all',
            '{"metric":"m","tags":{"__name__":"evil"},"ts":1,"value":2.0}',
            '{"tags":{"h":"a"},"ts":1,"value":2.0}',     # no metric
            '{"metric":"m","value":2.0}',                # no ts
        ]
        out = parse_json_records(spark.createDataFrame(
            [(r,) for r in recs], "value string")).collect()
        assert len(out) == 2       # good + de-hijacked evil record
        assert all(r["labels"]["__name__"] == "m" for r in out)


class TestDownsample:
    def _raw(self, spark):
        rows = [("a", i * 60_000, float(i)) for i in range(10)]
        return spark.createDataFrame(rows, "series string, ts long, value double")

    def test_downsample_aggregates(self, spark):
        ds = downsample(self._raw(spark), ["series"], 300_000)
        got = {r["ts"]: r for r in ds.collect()}
        # END-inclusive period (0, 5m]: samples 1..5 (the boundary
        # sample at exactly 5m belongs to the period that ends there,
        # DownsamplePeriodMarker.scala:82-88), stamped at the last ts
        r0 = got[5 * 60_000]
        assert (r0["min"], r0["max"], r0["sum"], r0["count"], r0["avg"]) == \
            (1.0, 5.0, 15.0, 5.0, 3.0)
        assert r0["ttime"] == 5 * 60_000

    def test_ds_rewrites_match_raw(self, spark):
        raw = self._raw(spark)
        ds = downsample(raw, ["series"], 300_000)
        grid = StepGrid(540_000, 540_000, 60_000)
        window = 540_001  # covers everything
        from filodb_spark.kernels.range_fns import range_function
        for fn in ["min_over_time", "max_over_time", "sum_over_time",
                   "count_over_time", "avg_over_time"]:
            raw_v = range_function(raw, fn, ["series"], grid, window).first()["value"]
            ds_v = range_function_ds(ds, fn, ["series"], grid, window).first()["value"]
            assert ds_v == pytest.approx(raw_v), fn

    def test_cascade_matches_direct_rollup(self, spark):
        # 1h-from-5m must equal 1h-from-raw on every ds-gauge aggregate
        # (the reference's two-resolution downsampler pipeline)
        from filodb_spark.streaming.downsample import downsample_cascade
        rows = [("a", i * 60_000, float((i * 7) % 13)) for i in range(120)]
        raw = spark.createDataFrame(
            rows, "series string, ts long, value double")
        ds5 = downsample(raw, ["series"], 300_000)
        hour = lambda ts: (ts - 1) // 3_600_000  # end-inclusive period id
        via5 = {hour(r["ts"]): r
                for r in downsample_cascade(ds5, ["series"], 3_600_000)
                .collect()}
        direct = {hour(r["ts"]): r
                  for r in downsample(raw, ["series"], 3_600_000).collect()}
        assert via5.keys() == direct.keys() and via5
        for k in direct:
            for c in ("min", "max", "sum", "count", "ttime"):
                assert via5[k][c] == direct[k][c], (k, c)
            assert via5[k]["avg"] == pytest.approx(direct[k]["avg"])

    def test_stitch(self, spark):
        raw = self._raw(spark)
        ds = downsample(raw, ["series"], 300_000)
        grid = StepGrid(300_000, 540_000, 60_000)
        # window must cover >= the DS resolution, else rollup rows can
        # legitimately miss a step
        out = stitch_raw_ds(raw, ds, boundary_ms=480_000, fn="sum_over_time",
                            series_cols=["series"], grid=grid, window=300_000)
        ts = sorted(r["t"] for r in out.collect())
        assert ts == [300_000, 360_000, 420_000, 480_000, 540_000]


class TestStreamingIngest:
    def test_checkpoint_restart_recovery(self, spark, tmp_path):
        """Restart semantics (TimeSeriesShard offset-watermark recovery
        analog): a second run from the same checkpoint processes only
        new files, and dropDuplicates state persisted across the restart
        drops re-sent records."""
        src = tmp_path / "in"
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        src.mkdir()

        def write_batch(name, recs):
            with open(src / name, "w") as f:
                for r in recs:
                    f.write(json.dumps({"value": json.dumps(r)}) + "\n")

        def rec(i):
            return {"metric": "m", "tags": {"job": "w"},
                    "ts": 1_700_000_000_000 + i * 1000, "value": float(i)}

        def run_once():
            raw = spark.readStream.schema("value string").json(str(src))
            q = start_ingest(parse_json_records(raw), str(out), str(ckpt),
                             trigger_once=True)
            q.awaitTermination(120)

        write_batch("b1.json", [rec(i) for i in range(5)])
        run_once()
        assert spark.read.parquet(str(out)).count() == 5
        # restart: 2 re-sent duplicates + 3 new records
        write_batch("b2.json", [rec(0), rec(1), rec(5), rec(6), rec(7)])
        run_once()
        got = spark.read.parquet(str(out))
        assert got.count() == 8            # dups dropped across restart
        assert got.select("ts").distinct().count() == 8

    def test_file_stream_end_to_end(self, spark, tmp_path):
        src = tmp_path / "in"
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        src.mkdir()
        recs = [{"metric": "m", "tags": {"job": "w"},
                 "ts": 1_700_000_000_000 + i * 1000, "value": float(i)}
                for i in range(5)]
        recs.append(recs[0])  # duplicate -> must be dropped
        with open(src / "batch.json", "w") as f:
            for r in recs:
                f.write(json.dumps({"value": json.dumps(r)}) + "\n")
        raw = spark.readStream.schema("value string").json(str(src))
        stream = parse_json_records(raw)
        q = start_ingest(stream, str(out), str(ckpt), trigger_once=True)
        q.awaitTermination(120)
        got = spark.read.parquet(str(out))
        assert got.count() == 5  # dup dropped
        assert got.where(F.col("labels")["__name__"] == "m").count() == 5

    def test_dedupe_batch(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)],
            "s string, ts long, value double")
        out = dedupe_batch(df, ["s"])
        assert {(r["ts"], r["value"]) for r in out.collect()} == {(1, 2.0), (2, 3.0)}


class TestMetadata:
    @pytest.fixture()
    def store(self, spark):
        rows = []
        for job, inst in [("web", "1"), ("web", "2"), ("db", "1")]:
            for i in range(3):
                rows.append(({"__name__": "m", "job": job, "inst": inst},
                             i * 1000, 1.0))
        return TsStore(spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double"))

    def test_label_names_values(self, store):
        assert [r["label"] for r in label_names(store).collect()] == \
            ["__name__", "_type_", "inst", "job"]
        assert [r["value"] for r in label_values(store, "job").collect()] == \
            ["db", "web"]
        assert [r["value"] for r in
                label_values(store, "inst", 'm{job="web"}').collect()] == ["1", "2"]

    def test_series_and_cardinality(self, store):
        assert series(store, 'm{job="web"}').count() == 2
        card = {r["label"]: r["cardinality"]
                for r in label_cardinality(store).collect()}
        assert card["job"] == 2 and card["inst"] == 2
        tsc = ts_cardinality(store, ("__name__", "job")).collect()
        got = {(r["__name__"], r["job"]): r["total_series"] for r in tsc}
        assert got == {("m", "web"): 2, ("m", "db"): 1}

    def test_active_cardinality(self, store):
        tsc = ts_cardinality(store, ("__name__",), active_after_ms=10_000)
        r = tsc.first()
        assert r["total_series"] == 3 and r["active_series"] == 0


class TestStatefulResets:
    def _run_batch(self, spark, src, out, ckpt):
        from filodb_spark.streaming.stateful import reset_events
        stream = spark.readStream.schema(
            "series string, ts long, value double").json(str(src))
        q = (reset_events(stream).writeStream.format("parquet")
             .option("path", str(out)).option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    def test_state_survives_across_batches(self, spark, tmp_path):
        import json as _json
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        # batch 1: rising counter, one reset at ts=3
        rows1 = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0), ("b", 1, 1.0)]
        with open(src / "b1.json", "w") as f:
            for s, t, v in rows1:
                f.write(_json.dumps({"series": s, "ts": t, "value": v}) + "\n")
        self._run_batch(spark, src, out, ckpt)
        got = {(r["series"], r["ts"]): r["prev_value"]
               for r in spark.read.parquet(str(out)).collect()}
        assert got == {("a", 3): 20.0}
        # batch 2: new file; reset relative to state from batch 1
        # (b last=1.0 -> 0.5 is a reset only if state persisted)
        rows2 = [("b", 2, 0.5), ("a", 2, 50.0), ("a", 4, 6.0)]
        with open(src / "b2.json", "w") as f:
            for s, t, v in rows2:
                f.write(_json.dumps({"series": s, "ts": t, "value": v}) + "\n")
        self._run_batch(spark, src, out, ckpt)
        got = {(r["series"], r["ts"]): r["prev_value"]
               for r in spark.read.parquet(str(out)).collect()}
        # a@2 is out-of-order vs state (last_ts=3) -> dropped, no event
        assert got == {("a", 3): 20.0, ("b", 2): 1.0}


class TestSaltedAndChunkMeta:
    def test_salted_sum_matches_plain(self, spark):
        from filodb_spark.kernels.aggregations import salted_sum
        rows = [("hot", float(i % 7)) for i in range(10_000)] + \
               [("cold", 1.0)] * 10
        df = spark.createDataFrame(rows, "k string, value double")
        got = {r["k"]: r["value"]
               for r in salted_sum(df, ["k"], salt_buckets=8).collect()}
        assert got["hot"] == sum(i % 7 for i in range(10_000))
        assert got["cold"] == 10.0

    def test_chunk_meta(self, spark, tmp_path):
        from filodb_spark.metadata import chunk_meta
        p = str(tmp_path / "t.parquet")
        spark.createDataFrame(
            [(i, 1_700_000_000_000 + i) for i in range(100)],
            "id long, ts long").coalesce(1).write.parquet(p)
        meta = chunk_meta(spark, p).collect()
        assert sum(r["num_rows"] for r in meta) == 100
        assert min(r["ts_min"] for r in meta) == 1_700_000_000_000


class TestKafkaWireE2E:
    """Kafka ingest path e2e WITHOUT a broker (none can run in this
    container): records in the kafka source's exact wire frame
    (KAFKA_WIRE_SCHEMA — key/value binary, topic, partition, offset,
    timestamp) are replayed through a file stream, so every operator
    downstream of the kafka .load() — kafka_frame_to_records ->
    start_ingest (watermark + dedupe + append) -> PromQL query — is the
    production plan. Delta vs a live broker: only the consumer itself,
    whose offset tracking Structured Streaming checkpoints replace
    (TimeSeriesShard offset-watermark analog)."""

    T0 = 1_700_000_000_000

    def _wire_rows(self, n, dup_first=False):
        import datetime
        rows = []
        idxs = list(range(n)) + ([0] if dup_first else [])
        for off, i in enumerate(idxs):
            payload = json.dumps({
                "metric": "kafka_m", "tags": {"job": "k", "inst": str(i % 2)},
                "ts": self.T0 + i * 10_000, "value": float(i)})
            rows.append((
                f"k{i % 2}".encode(),            # key: series routing bytes
                payload.encode(),                 # value: record payload
                "metrics", i % 2, off,
                datetime.datetime.fromtimestamp(
                    (self.T0 + i * 10_000) / 1000,
                    tz=datetime.timezone.utc),
                0))
        return rows

    def test_kafka_wire_to_promql(self, spark, tmp_path):
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.streaming.ingest import (KAFKA_WIRE_SCHEMA,
                                                   kafka_frame_to_records)
        wire, out, ckpt = tmp_path / "wire", tmp_path / "out", tmp_path / "ck"
        spark.createDataFrame(self._wire_rows(6, dup_first=True),
                              KAFKA_WIRE_SCHEMA) \
            .write.parquet(str(wire))
        raw = (spark.readStream.schema(KAFKA_WIRE_SCHEMA)
               .parquet(str(wire)))
        q = start_ingest(kafka_frame_to_records(raw), str(out), str(ckpt),
                         trigger_once=True)
        q.awaitTermination(120)

        table = spark.read.parquet(str(out))
        assert table.count() == 6            # wire-level duplicate dropped
        eng = PromQLEngine(spark, TsStore(table))
        t = self.T0 + 50_000
        res = eng.query_range('sum(kafka_m{job="k"})', t, t, 10_000).collect()
        assert len(res) == 1
        assert res[0]["value"] == 4.0 + 5.0  # last sample of each inst
        rate = eng.query_range("sum(rate(kafka_m[50s]))", t, t, 10_000
                               ).collect()
        assert rate[0]["value"] == pytest.approx(0.2, rel=1e-6)


class TestStreamingDownsample:
    def test_matches_batch_downsample(self, spark, tmp_path):
        """The streaming rollup must agree row-for-row with the batch
        downsampler on the same closed windows."""
        import json as _json
        from filodb_spark.streaming.downsample import (downsample,
                                                       streaming_downsample)
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        rows = [("a", i * 60_000, float((i * 7) % 13)) for i in range(30)] \
             + [("b", i * 60_000, float(i)) for i in range(30)]
        with open(src / "b1.json", "w") as f:
            for s, t, v in rows:
                f.write(_json.dumps({"series": s, "ts": t, "value": v})
                        + "\n")
        stream = spark.readStream.schema(
            "series string, ts long, value double").json(str(src))
        ds = streaming_downsample(stream, ["series"], 300_000,
                                  watermark_delay="0 seconds")
        q = (ds.writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = spark.read.parquet(str(out))
        batch = downsample(
            spark.createDataFrame(rows, "series string, ts long, "
                                        "value double"),
            ["series"], 300_000)
        cols = ["series", "ts", "min", "max", "sum", "count", "avg",
                "ttime"]
        g = {tuple(r[c] for c in cols) for r in got.collect()}
        b = {tuple(r[c] for c in cols) for r in batch.collect()}
        # append mode emits only watermark-closed windows; every emitted
        # row must match batch exactly, and most windows must have closed
        assert g <= b
        assert len(g) >= len(b) - 2     # at most the last window per series open


class TestStreamingExport:
    """Streaming twin of the batch exporter: same cascade, same
    partitioned layout, row-equal to export_rows, restart-safe."""

    RULES = None   # built lazily (ExportRule import at class body is fine)

    @staticmethod
    def _rules():
        from filodb_spark.sources.export import ExportRule
        return (
            ExportRule(block_filter_groups=((("ns", "=", "blocked"),),),
                       allow_filter_groups=((("__name__", "=", "cpu"),),),
                       drop_labels=("env",)),
            ExportRule(allow_filter_groups=((("__name__", "=~", "mem|io"),),)),
        )

    @staticmethod
    def _rows(lo, hi):
        ts0 = 1_704_067_200_000
        out = []
        names = ["cpu", "mem", "io", "net"]
        for i in range(lo, hi):
            out.append({"labels": {"__name__": names[i % 4],
                                   "ns": "blocked" if i % 5 == 0 else f"app-{i % 3}",
                                   "env": "prod" if i % 2 else "dev"},
                        "ts": ts0 + i * 3_600_000,
                        "value": float(i)})
        return out

    def _write_batch(self, src, name, recs):
        import json as _json
        with open(src / name, "w") as f:
            for r in recs:
                f.write(_json.dumps(r) + "\n")

    def _run_once(self, spark, src, out, ckpt):
        from filodb_spark.streaming.export import streaming_export
        stream = spark.readStream.schema(
            "labels map<string,string>, ts long, value double").json(str(src))
        q = streaming_export(stream, self._rules(), str(out), str(ckpt),
                             key_filters=(("env", "=~", "prod|dev"),),
                             label_columns=(("ns", "ns_col"),))
        q.awaitTermination(120)

    def test_matches_batch_and_survives_restart(self, spark, tmp_path):
        from filodb_spark.sources.export import export_rows
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()

        self._write_batch(src, "b1.json", self._rows(0, 40))
        self._run_once(spark, src, out, ckpt)
        batch1 = export_rows(
            spark.createDataFrame(
                [(r["labels"], r["ts"], r["value"])
                 for r in self._rows(0, 40)],
                "labels map<string,string>, ts long, value double"),
            self._rules(), key_filters=(("env", "=~", "prod|dev"),),
            label_columns=(("ns", "ns_col"),))
        cols = ["metric", "epoch_timestamp", "value", "year", "month",
                "day", "hour", "ns_col"]
        def key(df):
            return sorted((tuple(r[c] for c in cols),
                           tuple(sorted(r["labels"].items())))
                          for r in df.collect())
        got = spark.read.parquet(str(out))
        assert key(got) == key(batch1)
        assert len(key(got)) > 0
        # winning-rule drop applied in-stream: cpu rows lost env
        for r in got.collect():
            if r["metric"] == "cpu":
                assert "env" not in r["labels"]

        # restart from the same checkpoint: only the new file processes,
        # no duplicates, and the union equals the batch path over all rows
        self._write_batch(src, "b2.json", self._rows(40, 60))
        self._run_once(spark, src, out, ckpt)
        batch_all = export_rows(
            spark.createDataFrame(
                [(r["labels"], r["ts"], r["value"])
                 for r in self._rows(0, 60)],
                "labels map<string,string>, ts long, value double"),
            self._rules(), key_filters=(("env", "=~", "prod|dev"),),
            label_columns=(("ns", "ns_col"),))
        assert key(spark.read.parquet(str(out))) == key(batch_all)

    def test_partition_layout_matches_batch_job(self, spark, tmp_path):
        """The stream sink writes the same year/month/day/<label>/metric
        directory layout as export_series_table, and a metric+label
        filter partition-prunes the read."""
        from pyspark.sql import functions as F
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        self._write_batch(src, "b1.json", self._rows(0, 24))
        self._run_once(spark, src, out, ckpt)
        import glob
        parts = glob.glob(str(out) + "/year=*/month=*/day=*/ns_col=*/metric=*")
        assert parts, "expected partition directories"
        back = spark.read.parquet(str(out))
        plan = back.where((F.col("metric") == "mem")
                          & (F.col("ns_col") == "app-1")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan

    def test_rejects_batch_frame(self, spark):
        from filodb_spark.streaming.export import streaming_export_rows
        df = spark.createDataFrame(
            [({"__name__": "m"}, 0, 1.0)],
            "labels map<string,string>, ts long, value double")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="streaming"):
            streaming_export_rows(df, self._rules())

    def test_histogram_explode_in_stream(self, spark, tmp_path):
        """The `_bucket` explode path through the streaming twin: shared
        code with batch, but exercised here on a streaming frame."""
        import json as _json
        from filodb_spark.sources.export import ExportRule
        from filodb_spark.streaming.export import streaming_export
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        ts0 = 1_704_067_200_000
        with open(src / "b1.json", "w") as f:
            f.write(_json.dumps({
                "labels": {"__name__": "lat", "ns": "a"}, "ts": ts0,
                "value": 0.0,
                "hist": {"les": [1.0, 2.0, float("inf")],
                         "values": [1.0, 3.0, 5.0]}}) + "\n")
        stream = spark.readStream.schema(
            "labels map<string,string>, ts long, value double, "
            "hist struct<les: array<double>, values: array<double>>") \
            .json(str(src))
        q = streaming_export(stream, (ExportRule(),), str(out), str(ckpt),
                             explode_hist_col="hist")
        q.awaitTermination(120)
        got = spark.read.parquet(str(out))
        rows = {(r["labels"]["le"], r["value"]) for r in got.collect()}
        assert rows == {("1", 1.0), ("2", 3.0), ("+Inf", 5.0)}
        assert {r["metric"] for r in got.collect()} == {"lat_bucket"}


class TestStreamingDocDedup:
    def test_first_occurrence_survives_across_batches(self, spark, tmp_path):
        """Streaming exact dedup: duplicates inside a batch AND re-sent
        in a later batch (within the watermark) are dropped; the
        fingerprint normalizes case/whitespace like the batch operator."""
        from filodb_spark.streaming.ingest import start_doc_dedup_stream
        src = tmp_path / "in"
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        src.mkdir()

        def write_batch(name, docs):
            with open(src / name, "w") as f:
                for i, (ts, text) in enumerate(docs):
                    f.write(json.dumps(
                        {"doc_id": f"{name}-{i}", "event_time": ts,
                         "text": text}) + "\n")

        def run_once():
            raw = spark.readStream.schema(
                "doc_id string, event_time timestamp, text string"
            ).json(str(src))
            q = start_doc_dedup_stream(raw, str(out), str(ckpt),
                                       trigger_once=True)
            q.awaitTermination(120)

        t = "2026-01-01T00:0{m}:00.000Z"
        write_batch("b1.json", [
            (t.format(m=0), "alpha beta gamma"),
            (t.format(m=1), "Alpha  beta GAMMA"),     # dup modulo norm
            (t.format(m=1), "delta epsilon"),
        ])
        run_once()
        got1 = spark.read.parquet(str(out))
        assert got1.count() == 2
        # second run: one re-sent dup (state persisted), one new doc
        write_batch("b2.json", [
            (t.format(m=2), "alpha beta gamma"),
            (t.format(m=3), "zeta eta"),
        ])
        run_once()
        got2 = spark.read.parquet(str(out))
        assert got2.count() == 3
        fps = [r.fp for r in got2.collect()]
        assert len(set(fps)) == 3


class TestStreamingSessionize:
    def test_sessions_close_after_gap(self, spark, tmp_path):
        """Native session_window sessionization: events within the gap
        merge into one session; a quiet period splits; closed sessions
        flush once the watermark passes (a far-future fence event
        advances it)."""
        from filodb_spark.streaming.stateful import streaming_sessionize
        src = tmp_path / "in"
        out = tmp_path / "out"
        ckpt = tmp_path / "ckpt"
        src.mkdir()
        t0 = 1_700_000_000  # epoch seconds

        def ev(user, sec, v):
            import datetime as dt
            ts = dt.datetime.fromtimestamp(t0 + sec, dt.timezone.utc)
            return {"user": user, "event_time": ts.isoformat(),
                    "value": float(v)}

        events = [ev("u1", 0, 1), ev("u1", 60, 2),        # session A
                  ev("u1", 60 + 700, 5),                  # gap > 600s -> B
                  ev("u2", 30, 7),
                  ev("fence", 100_000, 0)]                # watermark pump
        with open(src / "b.json", "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")
        raw = spark.readStream.schema(
            "user string, event_time timestamp, value double").json(str(src))
        sess = streaming_sessionize(raw, ["user"], gap="600 seconds",
                                    watermark_delay="1 second")
        q = (sess.writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r.user, r.n_events, r.value_sum,
                (r.session_end - r.session_start).total_seconds())
               for r in spark.read.parquet(str(out)).collect()}
        # u1 session A: 2 events spanning 60s + 600s gap tail
        assert ("u1", 2, 3.0, 660.0) in got
        assert ("u1", 1, 5.0, 600.0) in got
        assert ("u2", 1, 7.0, 600.0) in got


class TestStreamingFunnel:
    def test_incremental_matches_batch_on_in_order_input(self, spark,
                                                         tmp_path):
        """Two micro-batches of in-order events: per-key final depths
        from the streaming funnel's progress rows must equal the batch
        funnel's; state carries across batches (u1 signs up in batch 1,
        converts in batch 2)."""
        import json as _json
        from filodb_spark.operators.timeseries import funnel
        from filodb_spark.streaming.stateful import streaming_funnel
        steps = ["signup", "view", "purchase"]
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        batch1 = [(1, 10, "signup"), (1, 20, "view"),
                  (2, 10, "signup"),
                  (3, 5, "view")]                     # pre-signup view
        batch2 = [(1, 30, "purchase"),
                  (2, 40, "view"), (2, 35, "purchase"),  # purchase BEFORE
                  (3, 50, "signup"), (3, 60, "view")]    # its view: no
        rows = []

        def run(batch, name):
            with open(src / name, "w") as f:
                for u, ts, et in batch:
                    f.write(_json.dumps(
                        {"user_id": u, "ts": ts, "event_type": et}) + "\n")
            raw = spark.readStream.schema(
                "user_id long, ts long, event_type string").json(str(src))
            q = (streaming_funnel(raw, steps)
                 .writeStream.format("parquet")
                 .option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .outputMode("append")
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run(batch1, "b1.json")
        run(batch2, "b2.json")
        got = spark.read.parquet(str(out))
        depths = {r["user_id"]: r["step"] for r in
                  got.groupBy("user_id")
                  .agg(F.max("step").alias("step")).collect()}
        all_events = spark.createDataFrame(
            batch1 + batch2, "user_id long, ts long, event_type string")
        want = {r["user_id"]: r["depth"]
                for r in funnel(all_events, steps).collect()}
        assert depths == want           # u1 -> 3, u2 -> 1, u3 -> 2
        completed = {r["user_id"] for r in
                     got.where(F.col("completed")).collect()}
        assert completed == {1}
        # progress rows carry the matched timestamps
        u1 = sorted((r["step"], r["ts"]) for r in
                    got.where(F.col("user_id") == 1).collect())
        assert u1 == [(1, 10), (2, 20), (3, 30)]


    def test_string_keys(self, spark, tmp_path):
        """The output/state schemas derive the key type from the input
        (ADVICE r3): string user ids must work like the batch twin."""
        import json as _json
        from filodb_spark.streaming.stateful import streaming_funnel
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        with open(src / "b1.json", "w") as f:
            for u, ts, et in [("alice", 10, "signup"), ("alice", 20, "view"),
                              ("bob", 15, "signup")]:
                f.write(_json.dumps(
                    {"user_id": u, "ts": ts, "event_type": et}) + "\n")
        raw = spark.readStream.schema(
            "user_id string, ts long, event_type string").json(str(src))
        q = (streaming_funnel(raw, ["signup", "view"])
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.read.parquet(str(out))
        assert dict(got.dtypes)["user_id"] == "string"
        depths = {r["user_id"]: r["step"] for r in
                  got.groupBy("user_id")
                  .agg(F.max("step").alias("step")).collect()}
        assert depths == {"alice": 2, "bob": 1}


class TestStreamingRolling:
    def test_matches_batch_across_microbatches(self, spark, tmp_path):
        """Two in-order micro-batches (incl. same-ts duplicates within a
        batch): per-event features from the stream equal the batch
        RANGE-frame operator; window state carries across batches and
        expires."""
        import json as _json
        from filodb_spark.operators.timeseries import rolling_features
        from filodb_spark.streaming.stateful import streaming_rolling
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        batch1 = [(1, 0, 1.0), (1, 500, 2.0), (1, 500, 3.0),
                  (2, 100, 10.0)]
        batch2 = [(1, 1000, 4.0),       # window [-1000,0]: all of batch1
                  (1, 1600, 8.0),       # 0 and 500s expired except 1000
                  (2, 2000, 20.0)]      # u2's 100 expired

        def run(batch, name):
            with open(src / name, "w") as f:
                for u, ts, v in batch:
                    f.write(_json.dumps(
                        {"user_id": u, "ts": ts, "value": v}) + "\n")
            raw = spark.readStream.schema(
                "user_id long, ts long, value double").json(str(src))
            q = (streaming_rolling(raw, "user_id", window_ms=1000)
                 .writeStream.format("parquet")
                 .option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .outputMode("append")
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        run(batch1, "b1.json")
        run(batch2, "b2.json")
        got = {(r["user_id"], r["ts"], r["value"]):
               (r["w_count"], r["w_sum"]) for r in
               spark.read.parquet(str(out)).collect()}
        all_ev = spark.createDataFrame(
            batch1 + batch2, "user_id long, ts long, value double")
        want = {(r["user_id"], r["ts"], r["value"]):
                (r["w_count"], r["w_sum"]) for r in
                rolling_features(all_ev, ["user_id"], 1000).collect()}
        assert got == want
        # spot-check the cross-batch carry: u1@1600 sees {1000, 1600}
        assert got[(1, 1600, 8.0)] == (2, 12.0)


class TestInfluxRecordSpecParity:
    """InfluxRecordSpec goldens ported (reference:
    gateway/src/test/scala/.../InfluxRecordSpec.scala) against the
    naming="measurement" reference-parity mode and the histogram-line
    parser; the engine-default naming="suffix" superset keeps its own
    battery above."""

    LINES = [
        "recovery_row_skipped_total,dataset=timeseries,host=MacBook-Pro"
        "-229.local,_ws_=demo,_ns_=filodb counter=0 1536790212000000000",
        "num_partitions,dataset=timeseries,host=MacBook-Pro-229.local,"
        "shard=1 counter=0 1536790212000000000",
        "memstore_flushes_success_total,dataset=timeseries,host=MacBook"
        "-Pro-229.local,shard=1,url=http://localhost:9095 gauge=5 "
        "1536628260000000000",
        "span_processing_time_seconds,error=false,host=MacBook-Pro-229."
        "local,operation=memstore-recover-index-latency 0.075=37,2.5=47,"
        "5=47,sum=6.287654912,0.025=8,0.05=25,0.75=47,+Inf=47,count=5,"
        "0.5=42,0.25=40,0.1=40 1536790212000000000",
    ]

    def _df(self, spark, lines):
        return spark.createDataFrame([(l,) for l in lines], "value string")

    def test_single_field_metric_is_measurement(self, spark):
        # "can getMetric": counter/gauge single-field lines keep the
        # bare measurement as the metric (InfluxPromSingleRecord)
        out = parse_influx_lines(self._df(spark, self.LINES[:3]),
                                 naming="measurement").collect()
        got = {r["labels"]["__name__"]: r for r in out}
        assert set(got) == {"recovery_row_skipped_total", "num_partitions",
                            "memstore_flushes_success_total"}
        r = got["recovery_row_skipped_total"]
        assert r["ts"] == 1536790212000 and r["value"] == 0.0
        assert dict(r["labels"]) == {
            "__name__": "recovery_row_skipped_total",
            "dataset": "timeseries", "host": "MacBook-Pro-229.local",
            "_ws_": "demo", "_ns_": "filodb"}
        g = got["memstore_flushes_success_total"]
        assert g["ts"] == 1536628260000 and g["value"] == 5.0
        assert g["labels"]["url"] == "http://localhost:9095"

    def test_multi_field_lines_excluded_from_single_parser(self, spark):
        out = parse_influx_lines(self._df(spark, [self.LINES[3]]),
                                 naming="measurement")
        assert out.count() == 0

    def test_histogram_record(self, spark):
        # "should create single BinaryRecordV2s ... FiloDB histogram"
        out = parse_influx_hist_lines(self._df(spark, self.LINES)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["labels"]["__name__"] == "span_processing_time_seconds"
        assert set(r["labels"]) == {"__name__", "error", "host",
                                    "operation"}
        assert r["labels"]["operation"] == "memstore-recover-index-latency"
        assert r["ts"] == 1536790212000
        assert r["sum"] == pytest.approx(6.287654912)
        assert r["count"] == 5.0
        assert r["hist"]["les"] == [0.025, 0.05, 0.075, 0.1, 0.25, 0.5,
                                    0.75, 2.5, 5.0, float("inf")]
        assert r["hist"]["values"][2] == 37.0   # bucketValue(2)
        assert r["hist"]["values"][4] == 40.0   # bucketValue(4)

    def test_histogram_requires_inf_bucket(self, spark):
        # gotInf gate: a multi-field line without +Inf is dropped
        no_inf = ("m,host=h 0.1=1,0.5=2,sum=3,count=2 "
                  "1536790212000000000")
        bad_key = ("m,host=h 0.1=1,wat=2,+Inf=2,sum=3,count=2 "
                   "1536790212000000000")
        out = parse_influx_hist_lines(self._df(spark, [no_inf, bad_key]))
        assert out.count() == 0

    def test_hist_rows_queryable_through_engine(self, spark):
        """The parsed histogram row is a first-class hist-schema series:
        histogram_quantile over it goes through the engine."""
        from filodb_spark.promql.compiler import PromQLEngine, TsStore
        from filodb_spark.sources.influx import parse_influx_hist_lines
        hist = parse_influx_hist_lines(self._df(spark, self.LINES))
        gauge = spark.createDataFrame(
            [], "labels map<string,string>, ts long, value double")
        store = TsStore(gauge, hist_df=hist,
                        hist_metrics=("span_processing_time_seconds",))
        eng = PromQLEngine(spark, store)
        t = 1536790212000
        out = eng.query_range(
            "histogram_quantile(0.5, span_processing_time_seconds)",
            t, t, 60_000).collect()
        assert len(out) == 1
        # rank 0.5*47 = 23.5 lands in (0.025, 0.05] (cum 8 -> 25):
        # 0.025 + (23.5-8)/(25-8) * 0.025
        assert out[0]["value"] == pytest.approx(0.047794117647)


class TestStreamingDownsampleCounter:
    def test_matches_batch_counter_downsample(self, spark, tmp_path):
        """The incremental counter marker must agree with the batch
        downsample_counter on everything except the per-series TAIL row
        (pending until a successor proves its period closed — the batch
        job's closed-chunks contract); a second micro-batch closes the
        first batch's tail."""
        import json as _json
        from filodb_spark.streaming.downsample import (
            downsample_counter, streaming_downsample_counter)
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        # counter climbing with a reset per series; 5m periods
        rows = [("a", i * 60_000, float((i * 3) % 17)) for i in range(25)] \
             + [("b", i * 60_000, float(i % 11)) for i in range(25)]
        b1 = [r for r in rows if r[1] < 15 * 60_000]
        b2 = [r for r in rows if r[1] >= 15 * 60_000]
        with open(src / "b1.json", "w") as f:
            for s, t, v in b1:
                f.write(_json.dumps(
                    {"series": s, "ts": t, "value": v}) + "\n")
        stream = spark.readStream.schema(
            "series string, ts long, value double").json(str(src))
        ds = streaming_downsample_counter(stream, 300_000)
        q = (ds.writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        with open(src / "b2.json", "w") as f:
            for s, t, v in b2:
                f.write(_json.dumps(
                    {"series": s, "ts": t, "value": v}) + "\n")
        q = (ds.writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

        got = {(r["series"], r["ts"], r["value"])
               for r in spark.read.parquet(str(out)).collect()}
        batch = downsample_counter(
            spark.createDataFrame(rows, "series string, ts long, "
                                        "value double"),
            ["series"], 300_000)
        b = {(r["series"], r["ts"], r["value"]) for r in batch.collect()}
        tails = {max((t, s) for s, t, v in rows if s == k)[::-1]
                 for k in ("a", "b")}
        pending = {(s, t, v) for (s, t, v) in b if (s, t) in
                   {(s2, t2) for (t2, s2) in [(t, s) for s, t in tails]}}
        # everything batch emits except the per-series tail row
        assert got == b - {(s, t, v) for (s, t, v) in b
                           if (s, t) in tails}


class TestStreamingDownsampleHist:
    """streaming_downsample_hist vs the batch downsample_hist: identical
    rows except the per-series TAIL (pending until a successor proves its
    period closed — the batch job's closed-chunks contract)."""

    @staticmethod
    def _rows(minmax=False):
        # cumulative hist counts with one dip per series; 5m periods
        import math
        les = [1.0, 5.0, 10.0]
        rows = []
        for s, seed, dip_at in (("a", 3, 11), ("b", 5, 17)):
            run = 0.0
            for i in range(25):
                if i == dip_at:
                    run = 1.0      # reset
                else:
                    run += (i * seed) % 4
                vals = [run * 0.2, run * 0.7, run]
                r = [s, i * 60_000, run * 0.3, run, (les, vals)]
                if minmax:
                    mn = float("nan") if i % 7 == 3 else float(i % 5)
                    r += [mn, float(10 + (i * seed) % 9)]
                rows.append(tuple(r))
        return rows

    @staticmethod
    def _key(r, minmax=False):
        import math

        def _n(x):
            return None if x is not None and math.isnan(x) else x
        k = (r["series"], r["ts"], _n(r["sum"]), _n(r["count"]),
             tuple(r["hist"]["les"]), tuple(r["hist"]["values"]))
        if minmax:
            k += (_n(r["min"]), _n(r["max"]))
        return k

    def _run(self, spark, tmp_path, minmax):
        from filodb_spark.streaming.downsample import (
            downsample_hist, streaming_downsample_hist)
        schema = ("series string, ts long, sum double, count double, "
                  "hist struct<les: array<double>, values: array<double>>")
        mm_cols = ("min", "max") if minmax else ()
        if minmax:
            schema += ", min double, max double"
        rows = self._rows(minmax)
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        b1 = [r for r in rows if r[1] < 15 * 60_000]
        b2 = [r for r in rows if r[1] >= 15 * 60_000]
        # parquet file-stream source: NaN and nested structs round-trip
        spark.createDataFrame(b1, schema).coalesce(1) \
            .write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        ds = streaming_downsample_hist(stream, 300_000,
                                       minmax_cols=mm_cols)
        for batch in (b2, None):
            q = (ds.writeStream.format("parquet")
                 .option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)
            if batch:
                spark.createDataFrame(batch, schema).coalesce(1) \
                    .write.mode("append").parquet(str(src))
        got = {self._key(r, minmax)
               for r in spark.read.parquet(str(out)).collect()}
        batch_ds = downsample_hist(
            spark.createDataFrame(rows, schema), ["series"], 300_000,
            minmax_cols=mm_cols)
        b = {self._key(r, minmax) for r in batch_ds.collect()}
        tails = {(s, max(r[1] for r in rows if r[0] == s))
                 for s in ("a", "b")}
        assert got == {k for k in b if (k[0], k[1]) not in tails}
        assert len(got) > 10

    def test_matches_batch_hist_downsample(self, spark, tmp_path):
        self._run(spark, tmp_path, minmax=False)

    def test_matches_batch_otel_minmax(self, spark, tmp_path):
        self._run(spark, tmp_path, minmax=True)


class TestStreamingDownsampleDelta:
    """Delta-schema streaming twins: pure window aggregations, row-equal
    to the batch downsamplers on watermark-closed windows."""

    def test_delta_counter_matches_batch(self, spark, tmp_path):
        import json as _json
        from filodb_spark.streaming.downsample import (
            downsample_delta_counter, streaming_downsample_delta_counter)
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        src.mkdir()
        rows = [("a", i * 60_000, float((i * 7) % 13)) for i in range(30)] \
             + [("b", i * 60_000, float(i % 4)) for i in range(30)]
        with open(src / "b1.json", "w") as f:
            for s, t, v in rows:
                f.write(_json.dumps({"series": s, "ts": t, "value": v})
                        + "\n")
        stream = spark.readStream.schema(
            "series string, ts long, value double").json(str(src))
        ds = streaming_downsample_delta_counter(
            stream, ["series"], 300_000, watermark_delay="0 seconds")
        q = (ds.writeStream.format("parquet").option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.read.parquet(str(out))
        batch = downsample_delta_counter(
            spark.createDataFrame(
                rows, "series string, ts long, value double"),
            ["series"], 300_000)
        g = {(r["series"], r["ts"], r["value"]) for r in got.collect()}
        b = {(r["series"], r["ts"], r["value"]) for r in batch.collect()}
        assert g <= b
        assert len(g) >= len(b) - 2

    def test_delta_hist_matches_batch(self, spark, tmp_path):
        import math
        from filodb_spark.streaming.downsample import (
            downsample_delta_hist, streaming_downsample_delta_hist)
        les = [1.0, 5.0, 10.0]
        schema = ("series string, ts long, sum double, count double, "
                  "hist struct<les: array<double>, values: array<double>>, "
                  "min double, max double")
        rows = []
        for s, seed in (("a", 3), ("b", 5)):
            for i in range(30):
                d = float((i * seed) % 4)
                mn = float("nan") if i % 7 == 3 else float(i % 5)
                rows.append((s, i * 60_000, d * 0.3, d,
                             (les, [d * 0.2, d * 0.7, d]),
                             mn, float(10 + (i * seed) % 9)))
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        ds = streaming_downsample_delta_hist(
            stream, ["series"], 300_000, les,
            minmax_cols=("min", "max"), watermark_delay="0 seconds")
        q = (ds.writeStream.format("parquet").option("path", str(out))
             .option("checkpointLocation", str(ckpt))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

        def key(r):
            def n(x):
                return None if x is not None and math.isnan(x) else x
            return (r["series"], r["ts"], n(r["sum"]), n(r["count"]),
                    tuple(r["hist"]["les"]), tuple(r["hist"]["values"]),
                    n(r["min"]), n(r["max"]))
        got = {key(r)
               for r in spark.read.parquet(str(out)).collect()}
        batch = downsample_delta_hist(
            spark.createDataFrame(rows, schema), ["series"], 300_000,
            minmax_cols=("min", "max"))
        b = {key(r) for r in batch.collect()}
        assert got <= b
        assert len(got) >= len(b) - 2
        assert len(got) > 5


class TestStreamingDownsampleHistRandom:
    """Randomized streaming-vs-batch battery for the hist twin: random
    cadence, dips, NaN counts and NaN mins across 8 series, replayed in
    three micro-batches. Streaming must equal batch minus the per-series
    PENDING tail (a tail already emitted as a dip row is NOT pending)."""

    RES = 300_000

    def test_random_battery(self, spark, tmp_path):
        import math
        import random
        from filodb_spark.streaming.downsample import (
            downsample_hist, streaming_downsample_hist)
        rng = random.Random(4321)
        les = [1.0, 5.0, 10.0]
        rows = []
        tails = {}       # series -> (tail_ts, emitted_at_tail)
        for i in range(8):
            n = rng.randint(2, 40)
            ts = sorted(set(rng.randint(0, 3_000_000) for _ in range(n)))
            c, prev_read, srows = 0.0, None, []
            for t in ts:
                r = rng.random()
                if r < 0.08:
                    cv = float("nan")                 # NaN count
                elif r < 0.2:
                    c = rng.uniform(0, 3)             # dip
                    cv = c
                else:
                    c += rng.uniform(0, 4)
                    cv = c
                mn = float("nan") if rng.random() < 0.15 \
                    else rng.uniform(0, 5)
                mx = rng.uniform(5, 10)
                s = float("nan") if math.isnan(cv) else cv * 0.3
                srows.append((f"s{i}", t, s, cv,
                              (les, [cv * 0.2, cv * 0.6, cv]), mn, mx))
                read = 0.0 if math.isnan(cv) else cv
                emitted = prev_read is None or read < prev_read
                prev_read = read
            tails[f"s{i}"] = (srows[-1][1], emitted)
            rows += srows
        schema = ("series string, ts long, sum double, count double, "
                  "hist struct<les: array<double>, values: array<double>>, "
                  "min double, max double")
        src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
        cuts = [1_000_000, 2_000_000, 3_000_001]
        batches = [[r for r in rows
                    if (cuts[i - 1] if i else 0) <= r[1] < cuts[i]]
                   for i in range(3)]
        spark.createDataFrame(batches[0], schema).coalesce(1) \
            .write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(schema).parquet(str(src))
        ds = streaming_downsample_hist(stream, self.RES,
                                       minmax_cols=("min", "max"))
        for nxt in batches[1:] + [None]:
            q = (ds.writeStream.format("parquet")
                 .option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)
            if nxt:
                spark.createDataFrame(nxt, schema).coalesce(1) \
                    .write.mode("append").parquet(str(src))

        def key(r):
            def n(x):
                return None if x is not None and math.isnan(x) else x
            return (r["series"], r["ts"], n(r["sum"]), n(r["count"]),
                    tuple(n(v) for v in r["hist"]["values"]),
                    n(r["min"]), n(r["max"]))
        got = {key(r) for r in spark.read.parquet(str(out)).collect()}
        b = {key(r) for r in downsample_hist(
            spark.createDataFrame(rows, schema), ["series"], self.RES,
            minmax_cols=("min", "max")).collect()}
        pending = {(s, t) for s, (t, emitted) in tails.items()
                   if not emitted}
        expected = {k for k in b if (k[0], k[1]) not in pending}
        assert got == expected
        assert len(got) > 40


class TestStreamingQualityOps:
    def test_c4_and_gopher_apply_unchanged_to_streams(self, spark,
                                                      tmp_path):
        """The r13 line-level quality ops (c4_line_clean,
        gopher_quality) are stateless column expressions, so they run
        UNCHANGED on a streaming frame — the degenerate streaming twin
        (no state, no watermark, per-row semantics). Pinned the same
        way as the stateful twins: batch vs streaming row-equality on
        identical input files. (c4_span_dedup is NOT streaming-safe —
        its canonical-occurrence choice is a corpus-global aggregate —
        and is deliberately absent here.)"""
        from filodb_spark.operators.pipeline import (c4_line_clean,
                                                     gopher_quality)
        src = tmp_path / "in"
        src.mkdir()
        docs = [
            (0, "Keep this full sentence today.\nshort\n"
                "Another keeper with enough words here!"),
            (1, "- bullet one here\n- bullet two here\nthe of and"),
            (2, "no punctuation no keeping here at all"),
        ]
        with open(src / "b1.json", "w") as f:
            for i, t in docs:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        schema = "doc_id long, text string"

        def run_stream(op, name):
            out = tmp_path / f"out_{name}"
            ckpt = tmp_path / f"ckpt_{name}"
            stream = spark.readStream.schema(schema).json(str(src))
            res = op(stream)
            assert res.isStreaming
            q = (res.writeStream.format("parquet")
                 .option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            return spark.read.parquet(str(out))

        for op, name in ((lambda d: c4_line_clean(d, min_words=4,
                                                  min_kept_lines=1),
                          "c4"),
                         (lambda d: gopher_quality(d, min_words=5),
                          "gopher")):
            got = sorted(map(tuple, run_stream(op, name).collect()))
            want = sorted(map(tuple, op(
                spark.read.schema(schema).json(str(src))).collect()))
            assert got == want, name
