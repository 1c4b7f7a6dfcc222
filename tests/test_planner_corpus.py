"""Compile the reference planner-spec query corpus end-to-end.

Every PromQL string the reference's planner suites materialize
(SingleClusterPlannerSpec, PlannerHierarchySpec, MultiPartitionPlannerSpec,
ShardKeyRegexPlannerSpec, HighAvailabilityPlanner, LongTimeRangePlanner,
ScalarQueriesSpec, LogicalPlanParserSpec — corpus extracted into
planner_spec_corpus.py) must parse AND compile to a DataFrame plan on a
store carrying the specs' fixture label shape. Compile-only (no collect):
this pins the whole parse -> LP -> DataFrame surface at test-suite speed;
an execution sweep of the same corpus ran green during development
(167/174 executed, the rest correctly rejected as instant-only)."""

import pytest

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

from tests.planner_spec_corpus import INSTANT_ONLY, RANGE_QUERIES


# slow battery: skipped by default for the driver's pytest budget (SPARK_GRAFT_RUN_SLOW=1 runs it; scripts/round_close.py does)
pytestmark = pytest.mark.slow

T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def engine(spark):
    rows = []
    names = ["foo", "bar", "test", "test1", "test2", "test3", "baz",
             "foo:1m", "bar:1m", "http_requests_total", "node_info",
             "heap_usage", "heap_usage0"]
    for n in names:
        for i in range(6):
            rows.append(({"__name__": n, "instance": "Inst-1", "job": "app",
                          "_ws_": "demo", "_ns_": "localNs", "le": "2.0"},
                         T0 + i * 60_000, float(i + 1)))
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


class TestPlannerCorpus:
    def test_range_corpus_compiles(self, engine):
        failures = []
        for q in RANGE_QUERIES:
            try:
                engine.query_range(q, T0, T0 + 600_000, 120_000)
            except Exception as ex:
                failures.append((q, f"{type(ex).__name__}: {ex}"))
        assert not failures, failures

    def test_instant_only_corpus(self, engine):
        # top-level raw-matrix selectors: legal for instant queries,
        # rejected for range queries (RawSeries is instant-only)
        for q in INSTANT_ONLY:
            engine.query_instant(q, T0 + 300_000)
            with pytest.raises(ValueError):
                engine.query_range(q, T0, T0 + 600_000, 120_000)
