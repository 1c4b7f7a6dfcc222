"""End-to-end PromQL engine tests: parse -> compile -> execute on a
hand-built store; goldens hand-computed (semantics per the reference's
exec specs: BinaryJoinExecSpec, BinaryJoinSetOperatorSpec,
AggrOverRangeVectorsSpec, HistogramQuantileMapperSpec)."""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.promql import PromQLEngine, parse
from filodb_spark.promql import ast as A
from filodb_spark.promql.compiler import TsStore

T0 = 1_700_000_000_000  # aligned base


@pytest.fixture(scope="module")
def engine(spark):
    rows = []

    def series(metric, labels, samples):
        for ts, v in samples:
            rows.append(({**labels, "__name__": metric}, int(ts), float(v)))

    # m: two web series + one db series, 10s cadence, 13 samples
    series("m", {"job": "web", "inst": "1"},
           [(T0 + i * 10_000, i) for i in range(13)])
    series("m", {"job": "web", "inst": "2"},
           [(T0 + i * 10_000, 2 * i) for i in range(13)])
    series("m", {"job": "db", "inst": "1"},
           [(T0 + i * 10_000, 100) for i in range(13)])
    # lim: one per job (join "one" side)
    series("lim", {"job": "web"}, [(T0 + i * 10_000, 10) for i in range(13)])
    series("lim", {"job": "db"}, [(T0 + i * 10_000, 5) for i in range(13)])
    # counter with a reset
    series("ctr", {"job": "web"},
           [(T0, 0), (T0 + 10_000, 10), (T0 + 20_000, 20),
            (T0 + 30_000, 5), (T0 + 40_000, 15)])
    # histogram buckets (le on each series), cumulative counts
    for le, counts in [("1.0", 10), ("2.0", 30), ("+Inf", 40)]:
        series("lat_bucket", {"job": "web", "le": le},
               [(T0 + i * 10_000, counts) for i in range(13)])
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


def rows_of(df):
    return [(dict(r["labels"] or {}), r["t"], r["value"]) for r in df.collect()]


def at(res, t, **labels):
    out = []
    for lab, rt, v in res:
        if rt != t:
            continue
        if all(lab.get(k) == v2 for k, v2 in labels.items()):
            out.append((lab, v))
    return out


class TestSelectorsAndFunctions:
    def test_instant_selector_lookback(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('m{job="web"}', t, t, 10_000))
        assert len(res) == 2
        vals = {lab["inst"]: v for lab, _, v in res}
        assert vals == {"1": 12.0, "2": 24.0}

    def test_selector_regex(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('m{inst=~"1|3"}', t, t, 10_000))
        assert len(res) == 2  # web/1 and db/1

    def test_rate_with_reset(self, engine):
        t = T0 + 40_000
        res = rows_of(engine.query_range("rate(ctr[40s])", t, t, 10_000))
        assert len(res) == 1
        # corrected delta = 15 + 20 - 0 = 35 over exactly-spanning window
        assert res[0][2] == pytest.approx(35 / 40.0)

    def test_sum_over_time_and_offset(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'sum_over_time(m{job="web",inst="1"}[30s])', t, t, 10_000))
        assert res[0][2] == 9 + 10 + 11 + 12
        res = rows_of(engine.query_range(
            'sum_over_time(m{job="web",inst="1"}[30s] offset 20s)', t, t, 10_000))
        assert res[0][2] == 7 + 8 + 9 + 10

    def test_at_modifier(self, engine):
        t = T0 + 120_000
        q = f'sum_over_time(m{{job="web",inst="1"}}[30s] @ {(T0 + 50_000) / 1000})'
        res = rows_of(engine.query_range(q, t, t, 10_000))
        assert res[0][2] == 2 + 3 + 4 + 5

    def test_instant_fn_chain(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'clamp_max(abs(m{job="web"} - 100), 80)', t, t, 10_000))
        vals = {lab["inst"]: v for lab, _, v in res}
        assert vals == {"1": 80.0, "2": 76.0}

    def test_absent(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('absent(nosuch{job="web"})', t, t, 10_000))
        assert res == [({"job": "web"}, t, 1.0)]
        res = rows_of(engine.query_range('absent(m{job="web"})', t, t, 10_000))
        assert res == []

    def test_label_replace_join(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'label_replace(m{inst="2"}, "canary", "yes-$1", "inst", "(2)")',
            t, t, 10_000))
        assert res[0][0]["canary"] == "yes-2"
        res = rows_of(engine.query_range(
            'label_join(m{inst="2"}, "combo", "-", "job", "inst")', t, t, 10_000))
        assert res[0][0]["combo"] == "web-2"

    def test_subquery(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'max_over_time(sum_over_time(m{job="web",inst="1"}[20s])[60s:20s])',
            t, t, 10_000))
        # inner at 20s substeps: windows [t'-20s, t'] with t' aligned;
        # samples are 10s apart -> 3 samples each: max at t'=T0+120s = 10+11+12
        assert res[0][2] == 33.0

    def test_scalar_and_vector_fns(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('vector(42)', t, t, 10_000))
        assert res == [({}, t, 42.0)]
        res = rows_of(engine.query_range('scalar(m{inst="2"}) * vector(1)',
                                         t, t, 10_000))
        assert res[0][2] == 24.0


class TestLastZscoreLimit:
    T = T0 + 120_000

    def test_last_is_alias_of_last_over_time(self, engine):
        a = sorted(map(repr, rows_of(engine.query_range(
            "last(m[1m])", self.T, self.T, 10_000))))
        b = sorted(map(repr, rows_of(engine.query_range(
            "last_over_time(m[1m])", self.T, self.T, 10_000))))
        assert a == b and a

    def test_z_score(self, engine):
        # db series is constant 100 -> stddev 0 -> NaN-filtered by kernel;
        # web inst=1 over [60s, 120s]: samples 6..12, last=12,
        # mean=9, stddev_pop=2 -> z=1.5
        res = rows_of(engine.query_range(
            'z_score(m{job="web"}[1m])', self.T, self.T, 10_000))
        vals = {lab["inst"]: v for lab, _, v in res}
        assert vals["1"] == pytest.approx(1.5)
        assert vals["2"] == pytest.approx(1.5)  # scaled series, same z

    def test_noarg_time_component_functions(self, engine):
        # hour() == hour(vector(time())) etc. (ScalarFunctionId /
        # TimeScalarGeneratorExec). T0 = 2023-11-14 22:13:20 UTC.
        t = T0
        expect = {"hour()": 22.0, "minute()": 13.0, "month()": 11.0,
                  "year()": 2023.0, "day_of_week()": 2.0,
                  "day_of_month()": 14.0, "days_in_month()": 30.0}
        for q, want in expect.items():
            res = rows_of(engine.query_range(q, t, t, 1))
            assert [v for _, _, v in res] == [want], q

    def test_at_start_end_sentinels(self, engine):
        # @ start()/@ end() resolve to the query range bounds and match
        # the equivalent literal @ forms (PromQL.g4:60,178-179)
        S, E = T0 + 60_000, T0 + 120_000

        def run(q):
            return sorted(map(repr, rows_of(
                engine.query_range(q, S, E, 10_000))))

        q = 'sum_over_time(m{job="web",inst="1"}[1m] %s)'
        assert run(q % "@ end()") == run(q % f"@ {E / 1000.0}")
        assert run(q % "@ start()") == run(q % f"@ {S / 1000.0}")
        # windows [0,60s] sum=21 vs [60s,120s] sum=63 — genuinely distinct
        assert run(q % "@ start()") != run(q % "@ end()")

    def test_limit_function(self, engine):
        res = rows_of(engine.query_range(
            'limit(2, m)', self.T, self.T, 10_000))
        series = {tuple(sorted(lab.items())) for lab, _, _ in res}
        assert len(series) == 2


class TestAggregations:
    def test_sum_by(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('sum by (job) (m)', t, t, 10_000))
        vals = {lab["job"]: v for lab, _, v in res}
        assert vals == {"web": 36.0, "db": 100.0}

    def test_sum_without(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('sum without (inst) (m)', t, t, 10_000))
        vals = {lab["job"]: v for lab, _, v in res}
        assert vals == {"web": 36.0, "db": 100.0}
        assert all("__name__" not in lab for lab, _, _ in res)

    def test_topk(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('topk(2, m)', t, t, 10_000))
        assert sorted(v for _, _, v in res) == [24.0, 100.0]

    def test_quantile_count_values(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('quantile(0.5, m)', t, t, 10_000))
        assert res[0][2] == 24.0
        res = rows_of(engine.query_range('count_values("v", m)', t, t, 10_000))
        vals = {lab["v"]: v for lab, _, v in res}
        assert vals == {"12": 1.0, "24": 1.0, "100": 1.0}


class TestBinaryOps:
    def test_scalar_comparison_filter(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('m > 20', t, t, 10_000))
        assert sorted(v for _, _, v in res) == [24.0, 100.0]
        res = rows_of(engine.query_range('m > bool 20', t, t, 10_000))
        assert sorted(v for _, _, v in res) == [0.0, 1.0, 1.0]

    def test_one_to_one_join(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'sum by (job) (m) / on (job) lim', t, t, 10_000))
        vals = {lab["job"]: v for lab, _, v in res}
        assert vals == {"web": 3.6, "db": 20.0}

    def test_group_left(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('m / on (job) group_left lim',
                                         t, t, 10_000))
        vals = {(lab["job"], lab.get("inst")): v for lab, _, v in res}
        assert vals == {("web", "1"): 1.2, ("web", "2"): 2.4, ("db", "1"): 20.0}

    def test_set_ops(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('m and lim', t, t, 10_000))
        assert res == []  # different label sets (inst) -> no match
        res = rows_of(engine.query_range('m and on (job) lim', t, t, 10_000))
        assert len(res) == 3
        res = rows_of(engine.query_range('m unless on (job) lim', t, t, 10_000))
        assert res == []
        res = rows_of(engine.query_range('m or lim', t, t, 10_000))
        assert len(res) == 5

    def test_arithmetic(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range('m{inst="2"} * 2 + 1', t, t, 10_000))
        assert res[0][2] == 49.0
        assert "__name__" not in res[0][0]


class TestHistogram:
    def test_histogram_quantile_bucket_form(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'histogram_quantile(0.5, lat_bucket)', t, t, 10_000))
        assert len(res) == 1
        # rank = 0.5*40 = 20; bucket (1,2]: lo_cum=10, frac=(20-10)/(30-10)=0.5
        assert res[0][2] == pytest.approx(1.0 + (2.0 - 1.0) * 0.5)
        res = rows_of(engine.query_range(
            'histogram_quantile(0.95, lat_bucket)', t, t, 10_000))
        # rank 38 -> +Inf bucket -> returns lower bound le=2
        assert res[0][2] == pytest.approx(2.0)


class TestParser:
    def test_parse_shapes(self):
        e = parse('sum(rate(http_requests_total{job="x"}[5m]))')
        assert isinstance(e, A.Aggregation) and e.op == "sum"
        f = e.expr
        assert isinstance(f, A.FunctionCall) and f.name == "rate"
        m = f.args[0]
        assert isinstance(m, A.MatrixSelector) and m.range_ms == 300_000
        assert m.base.metric == "http_requests_total"

    def test_parse_binary_modifiers(self):
        e = parse('a / on (job) group_left (env) b')
        assert isinstance(e, A.BinaryOp)
        assert e.on == ("job",) and e.group_left and e.include == ("env",)

    def test_parse_precedence(self):
        e = parse("a + b * c")
        assert isinstance(e, A.BinaryOp) and e.op == "+"
        assert isinstance(e.rhs, A.BinaryOp) and e.rhs.op == "*"
        e = parse("a ^ b ^ c")  # right assoc
        assert e.op == "^" and isinstance(e.rhs, A.BinaryOp)

    def test_parse_subquery_offset(self):
        e = parse("sum_over_time(m[2m:30s] offset 5m)")
        sq = e.args[0]
        assert isinstance(sq, A.Subquery)
        assert sq.range_ms == 120_000 and sq.step_ms == 30_000
        assert sq.offset_ms == 300_000

    def test_parse_durations(self):
        e = parse("rate(m[1h30m])")
        assert e.args[0].range_ms == 90 * 60_000


class TestStepMultipleAndRetention:
    def test_step_multiple_parse_and_eval(self, engine):
        e = parse("sum_over_time(m[3i])")
        m = e.args[0]
        assert isinstance(m, A.MatrixSelector) and m.step_multiple \
            and m.range_ms == 3
        t = T0 + 120_000
        # step 10s -> window 30s, same as explicit [30s]
        res = rows_of(engine.query_range(
            'sum_over_time(m{job="web",inst="1"}[3i])', t, t, 10_000))
        assert res[0][2] == 9 + 10 + 11 + 12

    def test_retention_clamp(self, spark, engine):
        from filodb_spark.promql.compiler import PromQLEngine
        eng2 = PromQLEngine(spark, engine.store,
                            retention_floor_ms=T0 + 60_000)
        res = rows_of(eng2.query_range('m{job="web",inst="1"}',
                                       T0, T0 + 120_000, 30_000))
        assert min(t for _, t, _ in res) >= T0 + 60_000


class TestRawMatrixQuery:
    def test_instant_matrix_returns_raw_samples(self, engine):
        # Prometheus instant query `m[w]`: every raw sample in [t-w, t]
        t = T0 + 120_000
        res = rows_of(engine.query_instant('m{job="web",inst="1"}[30s]', t))
        assert sorted((rt, v) for _, rt, v in res) == [
            (T0 + 90_000, 9.0), (T0 + 100_000, 10.0),
            (T0 + 110_000, 11.0), (T0 + 120_000, 12.0)]

    def test_matrix_offset(self, engine):
        t = T0 + 120_000
        res = rows_of(engine.query_instant(
            'm{job="web",inst="1"}[20s] offset 60s', t))
        assert sorted(rt for _, rt, _ in res) == \
            [T0 + 40_000, T0 + 50_000, T0 + 60_000]

    def test_matrix_rejected_for_range_query(self, engine):
        with pytest.raises(ValueError, match="matrix"):
            engine.query_range('m[30s]', T0, T0 + 60_000, 10_000)


class TestTopLevelSubquery:
    def test_standalone_subquery(self, engine):
        # m{...}[60s:20s] at top level: inner evaluated on the 20s grid
        # over the trailing 60s
        t = T0 + 120_000
        res = rows_of(engine.query_range(
            'm{job="web",inst="1"}[60s:20s]', t, t, 10_000))
        ts = sorted(rt for _, rt, _ in res)
        assert ts == [T0 + 60_000, T0 + 80_000, T0 + 100_000, T0 + 120_000]
        vals = {rt: v for _, rt, v in res}
        assert vals[T0 + 120_000] == 12.0  # last sample at each instant


class TestGroupByCardinalityLimit:
    """enforcedLimits.groupByCardinality
    (AggrOverRangeVectors.scala:236-253): raised lazily during execution
    via the assert_true pattern — no extra driver action."""

    @pytest.fixture(scope="class")
    def limited_engine(self, spark):
        rows = []
        for inst in range(4):
            for i in range(3):
                rows.append(({"__name__": "m", "job": "web",
                              "inst": str(inst)}, T0 + i * 10_000, float(i)))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        return PromQLEngine(spark, TsStore(df),
                            groupby_cardinality_limit=2)

    def test_within_limit_passes(self, limited_engine):
        out = limited_engine.query_range("sum by (job) (m)",
                                         T0 + 20_000, T0 + 20_000, 10_000)
        assert out.count() == 1  # 1 group <= 2

    def test_violation_raises_during_execution(self, limited_engine):
        out = limited_engine.query_range("sum by (inst) (m)",
                                         T0 + 20_000, T0 + 20_000, 10_000)
        with pytest.raises(Exception, match="group-by cardinality limit"):
            out.collect()

    def test_topk_bucketing_counts_groups(self, limited_engine):
        out = limited_engine.query_range("topk by (inst) (1, m)",
                                         T0 + 20_000, T0 + 20_000, 10_000)
        with pytest.raises(Exception, match="group-by cardinality limit"):
            out.collect()

    def test_unlimited_by_default(self, spark, limited_engine):
        eng = PromQLEngine(spark, limited_engine.store)
        out = eng.query_range("sum by (inst) (m)",
                              T0 + 20_000, T0 + 20_000, 10_000)
        assert out.count() == 4


class TestScalarPlanShapes:
    """Scalar-plan expression shapes the reference's planner round-trips
    (LogicalPlanParserSpec / ScalarQueriesSpec): dynamic scalar function
    params, scalar() identity, aggregation over scalars, and the
    value-filter semantics of non-bool scalar comparisons
    (BinaryOperatorFunction.scala:29-35)."""

    def _q(self, engine, q, t_end=T0 + 120_000):
        return rows_of(engine.query_range(q, T0, t_end, 60_000))

    def test_scalar_comparison_value_filter(self, engine):
        # 1 + 2 < Inf  ->  3.0 (LHS value where cond holds, not 1.0)
        res = self._q(engine, "1 + 2 < Inf")
        assert res and all(v == 3.0 for _, _, v in res)
        # failing condition -> NaN (rendered stale)
        res = self._q(engine, "1 + 2 > Inf")
        assert res and all(math.isnan(v) for _, _, v in res)

    def test_scalar_comparison_bool_nan_propagates(self, engine):
        res = self._q(engine, "(0 / 0) == bool 1")
        assert res and all(math.isnan(v) for _, _, v in res)

    def test_scalar_of_scalar_identity(self, engine):
        res = self._q(engine, "scalar(time())")
        assert res and all(v == t / 1000.0 for _, t, v in res)

    def test_aggregation_over_scalar(self, engine):
        # sum(scalar(a) + scalar(b)) plans as one anonymous series
        res = self._q(engine, "sum(scalar(lim{job='db'}) + scalar(lim{job='db'}))")
        assert res and all(lab == {} and v == 10.0 for lab, _, v in res)

    def test_dynamic_scalar_param_clamp_max(self, engine):
        # clamp_max(m, scalar(lim)) — per-step dynamic bound
        # lim{job="web"} is constant 10; web inst=2 reaches 24 at T0+120s
        res = self._q(engine, "clamp_max(m{job='web'}, scalar(lim{job='web'}))")
        assert res
        for lab, t, v in res:
            assert v <= 10.0
        # the inst=1 series is below the bound at T0 (values 0,6,12)
        lo = at(res, T0, inst="1")
        assert lo and lo[0][1] == 0.0

    def test_dynamic_scalar_param_round(self, engine):
        # round(m, scalar(...)) with a dynamic nearest parameter of 5
        res = self._q(engine,
                      "round(m{job='web', inst='2'}, scalar(lim{job='db'}))")
        assert res and all(v % 5.0 == 0.0 for _, _, v in res)

    def test_extra_params_rejected_at_execution(self, engine):
        # log2(m, 5) parses (reference otherParams) but the executor
        # rejects the count
        with pytest.raises(ValueError, match="wrong number of parameters"):
            engine.query_range("log2(m, 5)", T0, T0 + 60_000, 60_000)
