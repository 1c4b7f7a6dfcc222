"""Parser battery ported from the reference ParserSpec.scala expression
corpus: every expression must parse (structure spot-checked), error
cases must raise."""

import math

import pytest

from filodb_spark.promql import parse
from filodb_spark.promql import ast as A

MUST_PARSE = [
    # selectors & matchers (ParserSpec:56-58,107-109)
    'http_requests_total{job="prometheus", method="GET"}',
    'http_requests_total{job="prometheus", method!="GET"}',
    "foo{NaN='bc'}",
    "foo{Inf='value'}",
    'http_requests_total{job=~"pro.*", method!~"GET|POST"}',
    # numbers (:90-118)
    "-5", "+5", "1", "Inf", "+Inf", "-Inf", "NaN", "inf", "INF", "nan",
    ".5", "5.", "123.4567", "5e-3", "5e3", "0755", "+5.5e-3", "-0755",
    "0x1f",
    # scalar arithmetic & bool (:119-134)
    "1 + 1", "1 - 1", "1 * 1", "1 % 1", "1 / 1",
    "1 == bool 1", "1 != bool 1", "1 > bool 1", "1 >= bool 1",
    "1 < bool 1", "1 <= bool 1", "4 == bool (2)", "4 == bool(2)",
    "+1 + -2 * 1", "1 < bool 2 - 1 * 2", "1 + 2/(3*1)",
    "-some_metric", "+some_metric",
    'Inf + 1', 'NaN * 2', 'metric > Inf', 'metric < -Inf', 'Inf * metric',
    # parens (:138-141)
    '(1 + heap_size{a="b"})',
    '(1 + heap_size{a="b"}) + 5',
    '(1 + heap_size{a="b"}) + 5 * (3 - cpu_load{c="d"})',
    '((1 + heap_size{a="b"}) + 5) * (3 - cpu_load{c="d"})',
    # recording-rule-style names
    "job:http_requests:rate5m",
    # graphite-style metric names (ParserSpec:142-143)
    'foo:ba-r:a.b{a="bc"}',
    'foo:ba-001:a.b{a="b-c"}',
    # inf/nan must not swallow identifier prefixes
    "infinity_metric", "nano_seconds",
    # keywords as metric / label names (PromQL.g4 metricKeyword /
    # labelKeyword; ParserSpec:317-319)
    'sum{_ws_="w", _ns_="n"}',
    'count:some_metric:dataset:1m{_ws_="w"}',
    'limit{job="x"}', 'rate(avg{job="x"}[5m])',
    'sum without(and, by, avg, count, alert, annotations)(some_metric)',
    'and{job="x"}', 'or{job="x"}', 'unless{job="x"}', 'by{job="x"}',
    'without{job="x"}', 'offset{job="x"}',
    'm{and="1", or="1", on="1", ignoring="1"}',
    'm{group_left="1", group_right="1", bool="1"}',
    'm{offset="1", limit="1", inf="1", nan="1", by="1", sum="1"}',
    'sum by (and, offset) (m)', 'sum without (bool, inf) (m)',
    'a + on (or, limit) b',
    # @ start()/end() (PromQL.g4:60,178-179)
    'm @ start()', 'm @ end()', 'rate(m[5m] @ end())',
    'max_over_time(m[1h:5m] @ start())',
    # expr-level limit (PromQL.g4 limitOperation; desugars to limit(N, e))
    'sum(m) limit 5', 'rate(m[5m]) limit 3', 'sum(m) limit 5 + n',
    # functions / aggregations
    'sum(rate(http_requests_total[5m]))',
    'sum by (job) (rate(m[5m]))',
    'sum(rate(m[5m])) by (job)',
    'sum without (inst) (m)',
    'topk(5, m)', 'bottomk(3, m)', 'quantile(0.9, m)',
    'count_values("version", build_info)',
    'histogram_quantile(0.9, rate(req_bucket[10m]))',
    'clamp_max(clamp_min(m, 1), 10)',
    'label_replace(up, "foo", "$1", "instance", "(.*):.*")',
    'label_join(up, "a", ",", "b", "c")',
    'absent(nonexistent{job="myjob"})',
    'holt_winters(m[1h], 0.3, 0.1)',
    'predict_linear(m[1h], 4 * 3600)',
    'quantile_over_time(0.5, m[10m])',
    'last_over_time_is_mad_outlier(3, 1, m[10m])',
    # binary modifiers
    'a / on (job) b',
    'a / ignoring (mode) b',
    'a / on (job) group_left b',
    'a / on (job) group_left (env) b',
    'a * on (instance) group_right (role) b',
    'a and b', 'a or b', 'a unless b',
    'a and on (job) b', 'a unless ignoring (mode) b',
    # offsets, @, subqueries, durations
    'sum(rate(m[5m] offset 1w))',
    'rate(m[5m] offset -1d)',
    'm offset 5m', 'm @ 1609746000',
    'max_over_time(rate(m[5m])[30m:1m])',
    'sum_over_time(m[2m:]) ',
    'rate(m[1h30m])', 'rate(m[90s])', 'rate(m[1.5h])',
    'avg_over_time(m[3i])',
    # FiloDB limit modifier (:19)
    'http_requests_total{job="prometheus"} limit 1',
    # precedence / power
    'a ^ b ^ c', '2 ^ 3 ^ 2', '-1 ^ 2',
    'foo * bar', 'foo == 1', 'foo > bool 1',
    'scalar(m) * vector(1)', 'time()',
]

MUST_FAIL = [
    "",
    "sum(rate(m[5m])",        # unbalanced
    "rate(m[5m)",             # bad bracket
    "m{job=prometheus}",      # unquoted matcher value
    "m{job=}",
    "rate(m)[5m]",            # range on non-selector
    "m[]",
    "1 +",
    "m{",
    "m}",
    "m[5m] offset",
    # ported from ParserSpec:145-178
    "# just a comment\n\n", ".", "2.5.", "100..4", "1 /", "*1",
    "(1))", "((1)", "inf{}", "+INF{}", "NaN{}", 'Inf{job="api-server"}',
    "(", "1 !~ 1", "1 =~ 1", '-"string"', "-test[5m]", "*test",
    "1 offset 1d",
    'job{__name__="prometheus"}',   # metric name set twice (:59)
]


class TestFullParserSpecCorpus:
    """Every parseSuccessfully/parseError string from the reference
    ParserSpec.scala (extracted corpus in parser_spec_corpus.py)."""

    def test_full_corpus(self):
        from tests.parser_spec_corpus import (KNOWN_DEVIATIONS, MUST_FAIL,
                                              MUST_PARSE)
        bad_parse, bad_fail = [], []
        for e in MUST_PARSE:
            if e in KNOWN_DEVIATIONS:
                continue
            try:
                parse(e)
            except Exception as ex:
                bad_parse.append((e, str(ex)))
        for e in MUST_FAIL:
            if e in KNOWN_DEVIATIONS:
                continue
            try:
                parse(e)
                bad_fail.append(e)
            except Exception:
                pass
        assert not bad_parse, f"should parse but failed: {bad_parse}"
        assert not bad_fail, f"should fail but parsed: {bad_fail}"


class TestParserBattery:
    @pytest.mark.parametrize("expr", MUST_PARSE, ids=lambda e: e[:40] or "<empty>")
    def test_parses(self, expr):
        parse(expr)

    @pytest.mark.parametrize("expr", MUST_FAIL, ids=lambda e: e[:40] or "<empty>")
    def test_fails(self, expr):
        with pytest.raises((SyntaxError, IndexError)):
            parse(expr)

    def test_limit_modifier_structure(self):
        e = parse('m{job="x"} limit 2')
        assert isinstance(e, A.VectorSelector) and e.limit == 2

    def test_number_values(self):
        assert parse("0x1f").value == 31.0
        assert parse(".5").value == 0.5
        assert math.isinf(parse("-Inf").expr.value)  # Unary(-, Inf)


@pytest.mark.slow
class TestGrammarFuzz:
    """Generative robustness: random VALID expressions built from the
    grammar must parse AND compile AND execute against a tiny store
    without crashing; random byte noise must raise SyntaxError (or
    ValueError for semantically-invalid parses), never anything else.
    Deterministic seed."""

    def _gen_expr(self, rng, depth=0):
        if depth > 3 or rng.random() < 0.3:
            leaf = rng.choice([
                'm{job="x"}', "m", "42", "3.5", 'rate(m[5m])',
                "count_over_time(m[10m])", "time()", "pi()",
                "scalar(m)", 'vector(7)'])
            return leaf
        kind = rng.randint(0, 5)
        a = self._gen_expr(rng, depth + 1)
        b = self._gen_expr(rng, depth + 1)
        if kind == 0:
            op = rng.choice(["+", "-", "*", "/", "%", "^", "atan2"])
            return f"({a} {op} {b})"
        if kind == 1:
            fn = rng.choice(["abs", "ceil", "exp", "sqrt", "sgn",
                             "sin", "tanh", "rad"])
            return f"{fn}({a})"
        if kind == 2:
            agg = rng.choice(["sum", "min", "max", "avg", "count"])
            mod = rng.choice(["", " by (job)", " without (job)"])
            return f"{agg}{mod}({a})"
        if kind == 3:
            return f"clamp({a}, 0, 100)"
        if kind == 4:
            cmp_ = rng.choice([">", "<", ">=", "<=", "==", "!="])
            return f"({a} {cmp_} bool {b})"
        return f"({a} or {b})" if rng.random() < 0.5 else f"-({a})"

    def test_random_valid_expressions_execute(self, spark):
        import random
        from filodb_spark.promql import PromQLEngine
        from filodb_spark.promql.compiler import TsStore
        from pyspark.sql import functions as F
        rng = random.Random(99)
        rows = [({"__name__": "m", "job": "x", "i": str(i % 3)},
                 1_700_000_000_000 + i * 30_000, float(i % 7))
                for i in range(40)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        eng = PromQLEngine(spark, TsStore(df))
        start, end = 1_700_000_300_000, 1_700_000_900_000
        executed = 0
        for _ in range(40):
            q = self._gen_expr(rng)
            try:
                out = eng.query_range(q, start, end, 300_000)
            except (ValueError, SyntaxError):
                continue    # semantically invalid combo (e.g. a scalar
                            # literal in an instant-vector slot, which
                            # parse-time validation now rejects like the
                            # reference's Functions.scala param specs)
            out.limit(5).collect()
            executed += 1
        assert executed >= 20   # the generator mostly emits valid combos

    def test_noise_raises_syntax_errors_only(self):
        import random
        rng = random.Random(7)
        alphabet = "abz(){}[]\"'=~!<>+-*/%^.,:5 @#"
        for _ in range(300):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 25)))
            try:
                parse(s)
            except (SyntaxError, ValueError):
                pass        # the only acceptable failure modes
            # anything else (IndexError, KeyError, RecursionError,
            # AttributeError...) propagates and fails the test
