"""Pre-aggregation routing rule tests (AggLpOptimization analog):
sum-family aggregations route to `<metric>:::<suffix>` tables when the
rule retains all touched labels; otherwise read raw."""

import pytest

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import AggRule, TsStore

T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def preagg_engine(spark):
    rows = []

    def series(metric, labels, value):
        for i in range(5):
            rows.append(({**labels, "__name__": metric},
                         T0 + i * 10_000, float(value)))

    # raw: 2 instances per job, value 1 each
    for job in ("web", "db"):
        for inst in ("1", "2"):
            series("m", {"job": job, "inst": inst}, 1.0)
    # preagg (by job): deliberately DIFFERENT values (100 per job) so a
    # test can detect which table served the query
    for job in ("web", "db"):
        series("m:::agg", {"job": job}, 100.0)
        series("m:::agg:count", {"job": job}, 7.0)
        series("m:::agg:min", {"job": job}, 3.0)
        series("m:::agg:max", {"job": job}, 200.0)
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    store = TsStore(df, agg_rules={
        "m": (AggRule("agg", include=frozenset({"job"})),)})
    return PromQLEngine(spark, store)


class TestPreaggRouting:
    T = T0 + 40_000
    W = "[50s]"

    def test_routes_to_preagg(self, preagg_engine):
        res = preagg_engine.query_range(
            f"sum by (job) (sum_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals == {"web": 500.0, "db": 500.0}  # preagg values

    def test_count_becomes_sum_of_count_metric(self, preagg_engine):
        res = preagg_engine.query_range(
            f"sum by (job) (count_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals == {"web": 35.0, "db": 35.0}  # 7 x 5 from :count

    def test_unretained_label_reads_raw(self, preagg_engine):
        res = preagg_engine.query_range(
            f"sum by (inst) (sum_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["inst"]: r["value"] for r in res}
        assert vals == {"1": 10.0, "2": 10.0}  # raw values

    def test_filter_on_unretained_label_reads_raw(self, preagg_engine):
        res = preagg_engine.query_range(
            f'sum(sum_over_time(m{{inst="1"}}{self.W}))',
            self.T, self.T, 10_000).collect()
        assert res[0]["value"] == 10.0  # raw

    def test_retained_filter_routes(self, preagg_engine):
        res = preagg_engine.query_range(
            f'sum(sum_over_time(m{{job="web"}}{self.W}))',
            self.T, self.T, 10_000).collect()
        assert res[0]["value"] == 500.0  # preagg

    def test_min_max_route_to_minmax_columns(self, preagg_engine):
        # min(min_over_time) / max(max_over_time) -> :min/:max metrics
        # (AggLpOptimization.scala:179-193)
        res = preagg_engine.query_range(
            f"min by (job) (min_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals == {"web": 3.0, "db": 3.0}   # from m:::agg:min
        res = preagg_engine.query_range(
            f"max by (job) (max_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals == {"web": 200.0, "db": 200.0}  # from m:::agg:max

    def test_freshness_watermark_blocks_routing(self, spark, preagg_engine):
        # AggLpOptimization aggDelay analog: a query range ending past
        # the preagg watermark must read raw even when a rule matches
        store = preagg_engine.store
        import dataclasses
        stale = dataclasses.replace(store, preagg_ready_until_ms=self.T - 1)
        eng = PromQLEngine(spark, stale)
        res = eng.query_range(
            f"sum by (job) (sum_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals == {"web": 10.0, "db": 10.0}  # raw: 2 inst x 1.0 x 5
        fresh = dataclasses.replace(store, preagg_ready_until_ms=self.T)
        res = PromQLEngine(spark, fresh).query_range(
            f"sum by (job) (sum_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        assert {r["labels"]["job"]: r["value"] for r in res} == \
            {"web": 500.0, "db": 500.0}           # preagg again

    def test_minmax_mismatched_fn_reads_raw(self, preagg_engine):
        # min(max_over_time) must NOT route — falls back to raw (value 1)
        res = preagg_engine.query_range(
            f"min by (job) (max_over_time(m{self.W}))",
            self.T, self.T, 10_000).collect()
        vals = {r["labels"]["job"]: r["value"] for r in res}
        assert vals == {"web": 1.0, "db": 1.0}


class TestLongTimeRangeRouting:
    def test_raw_ds_split_through_engine(self, spark):
        from filodb_spark.streaming.downsample import downsample
        from pyspark.sql import functions as F
        # raw data only for the recent half; DS rollups for all time
        rows = []
        full = [({"__name__": "g", "job": "a"}, T0 + i * 60_000, float(i))
                for i in range(20)]
        df_full = spark.createDataFrame(
            full, "labels map<string,string>, ts long, value double")
        boundary = T0 + 10 * 60_000
        raw = df_full.where(F.col("ts") >= boundary)
        ds = downsample(df_full.withColumn(
            "_sk", F.lit("s")), ["labels"], 5 * 60_000).drop("_sk")
        store = TsStore(raw, ds_df=ds, raw_retention_start_ms=boundary)
        eng = PromQLEngine(spark, store)
        out = eng.query_range("sum_over_time(g[5m])", T0 + 5 * 60_000,
                              T0 + 19 * 60_000, 60_000).collect()
        got = {r["t"]: r["value"] for r in out}
        # LongTimeRangePlanner split (r8): the first RAW instant is the
        # first whose whole window is raw-resident (boundary + window,
        # stepped) — NOT the boundary itself; instants in
        # [boundary, boundary+window) would under-read the truncated
        # raw table and go to DS instead
        first_raw = boundary + 6 * 60_000  # (10m-5m+5m)//1m + 1 steps
        for t in range(T0 + 16 * 60_000, T0 + 20 * 60_000, 60_000):
            i = (t - T0) // 60_000
            assert got[t] == float(sum(range(i - 5, i + 1))), t  # raw exact
        # DS instants: rollup buckets (tTime in window) ride in,
        # including the boundary-crossing ones the raw table can't
        # serve (T0 is not 5m-aligned here: buckets end at 1m, 6m,
        # 11m, 16m, 19m; window [9m,14m] holds only ttime 11m = 7+..+11)
        assert got[boundary + 4 * 60_000] == 45.0
        assert min(got) == T0 + 5 * 60_000

    def test_ds_side_honors_all_matcher_ops(self, spark):
        """Regex/!= matchers must filter the DS table too: before the
        r8 fix only `=` was applied on the DS side, so a
        boundary-spanning query with `job=~"a"` returned job=b's
        rollups on steps before the retention boundary."""
        from filodb_spark.streaming.downsample import downsample
        from pyspark.sql import functions as F
        rows = []
        for job, base in (("a", 0.0), ("b", 100.0)):
            rows += [({"__name__": "g", "job": job}, T0 + i * 60_000,
                      base + i) for i in range(20)]
        df_full = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        boundary = T0 + 10 * 60_000
        raw = df_full.where(F.col("ts") >= boundary)
        from filodb_spark.kernels.binary import canonical_labels
        ds = downsample(df_full.withColumn(
            "_sk", canonical_labels(F.col("labels"))),
            ["labels"], 5 * 60_000).drop("_sk")
        store = TsStore(raw, ds_df=ds, raw_retention_start_ms=boundary)
        eng = PromQLEngine(spark, store)
        for q in ('sum_over_time(g{job=~"a"}[5m])',
                  'sum_over_time(g{job!="b"}[5m])',
                  'sum_over_time(g{job!~"b|c"}[5m])'):
            out = eng.query_range(q, T0 + 5 * 60_000,
                                  T0 + 19 * 60_000, 60_000).collect()
            assert out and all(r["labels"]["job"] == "a" for r in out), q
            assert any(r["t"] < boundary for r in out), q  # DS side hit


def test_preagg_toggle_is_thread_local(spark, preagg_engine=None):
    """The no_optimize/optimize_with_agg hint toggles routing via
    thread-local state: a hint active on one request thread must not
    disable routing for a query compiling concurrently on another
    (the ADVICE-r6 shared-mutable-engine-state class, same fix as the
    stats collector)."""
    import threading

    from filodb_spark.promql import PromQLEngine
    from filodb_spark.promql.compiler import TsStore
    df = spark.createDataFrame(
        [({"__name__": "m"}, 1_000_000, 1.0)],
        "labels map<string,string>, ts long, value double")
    eng = PromQLEngine(spark, TsStore(df))
    eng._preagg_tls.enabled = False          # this thread: hint active
    seen = {}

    def other():
        seen["enabled"] = eng._preagg_enabled

    t = threading.Thread(target=other)
    t.start(); t.join()
    assert seen["enabled"] is True           # other thread: default
    assert eng._preagg_enabled is False      # this thread: unchanged
    eng._preagg_tls.enabled = True
