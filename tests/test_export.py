"""Batch-export rule cascade tests (reference BatchExporter.scala
getRuleIfShouldExport semantics, pinned case by case)."""

import pytest
from pyspark.sql import functions as F

from filodb_spark.sources.export import (ExportRule, export_rows,
                                         export_series_table,
                                         key_filters_col, rule_index_col)

TS = 1_704_067_200_000   # 2024-01-01T00:00:00Z


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        ({"__name__": "cpu", "ns": "App-0", "env": "prod"}, TS, 1.0),
        ({"__name__": "cpu", "ns": "App-1", "env": "dev"},
         TS + 3_600_000, 2.0),
        ({"__name__": "mem", "ns": "App-0", "env": "prod"},
         TS + 25 * 3_600_000, 3.0),
        ({"__name__": "mem", "ns": "App-2"}, TS, 4.0),   # no env label
    ]
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")


def winners(spark, store, rules):
    out = store.select(
        F.col("labels")["__name__"].alias("m"),
        F.col("labels")["ns"].alias("ns"),
        rule_index_col(F.col("labels"), rules).alias("r"))
    return {(x["m"], x["ns"]): x["r"] for x in out.collect()}


class TestRuleCascade:
    def test_first_allow_wins_in_order(self, spark, store):
        rules = (
            ExportRule(allow_filter_groups=((("env", "=", "prod"),),)),
            ExportRule(allow_filter_groups=((("__name__", "=", "cpu"),),)),
        )
        w = winners(spark, store, rules)
        assert w[("cpu", "App-0")] == 0     # prod matches rule 0 first
        assert w[("cpu", "App-1")] == 1     # dev cpu falls to rule 1
        assert w[("mem", "App-0")] == 0
        assert w[("mem", "App-2")] is None  # neither

    def test_block_cuts_off_that_rule_and_all_later(self, spark, store):
        # reference takeWhile: the first rule whose block matches ends
        # the walk INCLUDING itself — later allows are unreachable
        rules = (
            ExportRule(allow_filter_groups=((("env", "=", "dev"),),)),
            ExportRule(block_filter_groups=((("ns", "=", "App-0"),),),
                       allow_filter_groups=()),
            ExportRule(allow_filter_groups=((("__name__", "=", "cpu"),),)),
        )
        w = winners(spark, store, rules)
        assert w[("cpu", "App-1")] == 0     # dev wins at rule 0
        # App-0 series: rule 1's block matches -> rules 1,2 unreachable
        assert w[("cpu", "App-0")] is None
        assert w[("mem", "App-0")] is None
        # App-2 mem: not blocked, rule 1 allow-empty matches everything
        assert w[("mem", "App-2")] == 1

    def test_empty_allow_matches_everything(self, spark, store):
        w = winners(spark, store, (ExportRule(),))
        assert all(v == 0 for v in w.values())

    def test_group_is_conjunction_groups_are_disjunction(self, spark, store):
        rules = (ExportRule(allow_filter_groups=(
            (("__name__", "=", "cpu"), ("env", "=", "prod")),   # AND
            (("ns", "=", "App-2"),),                            # OR group
        )),)
        w = winners(spark, store, rules)
        assert w[("cpu", "App-0")] == 0
        assert w[("cpu", "App-1")] is None   # cpu but not prod
        assert w[("mem", "App-2")] == 0
        assert w[("mem", "App-0")] is None

    def test_missing_label_never_matches_even_negated(self, spark, store):
        # partKeyMap.get(col).exists(...): mem/App-2 has NO env label,
        # so even env != prod / env !~ prod must NOT match it
        for op, val in (("!=", "prod"), ("!~", "pr.*")):
            rules = (ExportRule(allow_filter_groups=((("env", op, val),),)),)
            w = winners(spark, store, rules)
            assert w[("mem", "App-2")] is None
            assert w[("cpu", "App-1")] == 0   # env=dev satisfies both

    def test_regex_is_full_anchored(self, spark, store):
        rules = (ExportRule(allow_filter_groups=((("ns", "=~", "App"),),)),)
        assert all(v is None
                   for v in winners(spark, store, rules).values())
        rules = (ExportRule(allow_filter_groups=((("ns", "=~", "App-[01]"),),)),)
        w = winners(spark, store, rules)
        assert w[("cpu", "App-0")] == 0 and w[("mem", "App-2")] is None


class TestKeyFilters:
    """Config-level keyFilters conjunction — applied BEFORE the rule
    cascade (BatchExporter.scala:238-240), matchAllFilters semantics."""

    def test_conjunction_gates_before_cascade(self, spark, store):
        # allow-everything rule; the key filter alone decides
        out = export_rows(store, (ExportRule(),),
                          key_filters=(("env", "=", "prod"),
                                       ("__name__", "=", "cpu")))
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["labels"]["ns"] == "App-0"

    def test_missing_label_never_matches_even_negated(self, spark, store):
        # mem/App-2 has NO env label: even env != prod must exclude it
        out = export_rows(store, (ExportRule(),),
                          key_filters=(("env", "!=", "prod"),))
        got = {(r["metric"], r["labels"]["ns"]) for r in out.collect()}
        assert got == {("cpu", "App-1")}
        out = export_rows(store, (ExportRule(),),
                          key_filters=(("env", "!~", "pro.*"),))
        got = {(r["metric"], r["labels"]["ns"]) for r in out.collect()}
        assert got == {("cpu", "App-1")}

    def test_empty_key_filters_match_everything(self, spark, store):
        assert export_rows(store, (ExportRule(),),
                           key_filters=()).count() == 4

    def test_key_filter_composes_with_block(self, spark, store):
        # key filter passes prod series; rule 0 then blocks App-0
        rules = (ExportRule(block_filter_groups=((("ns", "=", "App-0"),),)),)
        out = export_rows(store, rules,
                          key_filters=(("env", "=~", "prod|dev"),))
        got = {(r["metric"], r["labels"]["ns"]) for r in out.collect()}
        assert got == {("cpu", "App-1")}


class TestExportRows:
    def test_row_shape_and_date_parts(self, spark, store):
        out = export_rows(store, (ExportRule(),)).orderBy("epoch_timestamp")
        rows = out.collect()
        assert out.columns == ["metric", "labels", "epoch_timestamp",
                               "timestamp", "value", "year", "month",
                               "day", "hour"]
        r0 = rows[0]
        assert r0["metric"] in ("cpu", "mem")
        assert (r0["year"], r0["month"], r0["day"], r0["hour"]) == \
            (2024, 1, 1, 0)
        late = [r for r in rows if r["epoch_timestamp"] ==
                TS + 25 * 3_600_000][0]
        assert (late["day"], late["hour"]) == (2, 1)

    def test_winning_rules_drop_labels_apply(self, spark, store):
        rules = (
            ExportRule(allow_filter_groups=((("env", "=", "prod"),),),
                       drop_labels=("env",)),
            ExportRule(),
        )
        out = export_rows(store, rules, drop_labels=("ns",))
        for r in out.collect():
            assert "ns" not in r["labels"]          # global drop
            if r["labels"].get("env") is not None:
                assert r["labels"]["env"] == "dev"  # rule-0 drop hit prod

    def test_label_columns_surface(self, spark, store):
        out = export_rows(store, (ExportRule(),),
                          label_columns=(("ns", "workspace"),))
        assert "workspace" in out.columns
        assert {r["workspace"] for r in out.collect()} == \
            {"App-0", "App-1", "App-2"}

    def test_histogram_buckets_explode(self, spark):
        hrows = [({"__name__": "lat", "ns": "a"}, TS,
                  0.0, ([1.0, 2.0, float("inf")], [1.0, 3.0, 5.0]))]
        df = spark.createDataFrame(
            hrows, "labels map<string,string>, ts long, value double, "
                   "hist struct<les: array<double>, values: array<double>>")
        out = export_rows(df, (ExportRule(),), explode_hist_col="hist")
        got = {(r["labels"]["le"], r["value"]) for r in out.collect()}
        assert got == {("1", 1.0), ("2", 3.0), ("+Inf", 5.0)}
        names = {r["metric"] for r in out.collect()}
        assert names == {"lat_bucket"}   # metric reflects the explode

    def test_partitioned_write_prunes_by_date_and_metric(
            self, spark, store, tmp_path):
        path = str(tmp_path / "export")
        export_series_table(store, (ExportRule(),), path,
                            label_columns=(("ns", "ws"),))
        back = spark.read.parquet(path)
        assert back.count() == 4
        plan = back.where((F.col("year") == 2024) & (F.col("day") == 1)
                          & (F.col("metric") == "cpu")
                          & (F.col("ws") == "App-0")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "metric" in plan
        # the label->column mapping is itself a partition key: the ws
        # filter must prune at planning time too (reference
        # labelColumnMapping + PARTITIONED BY, BatchExporter.scala:220-232)
        assert "ws" in plan.split("PartitionFilters")[1][:200]
        assert back.where(F.col("day") == 1).count() == 3


@pytest.mark.slow
class TestRuleCascadeProperty:
    """Hypothesis: the in-plan when-chain must agree with a direct
    Python transcription of BatchExporter.getRuleIfShouldExport on
    random label maps and rule cascades."""

    @staticmethod
    def _py_match(labels, filt):
        label, op, value = filt
        if label not in labels:
            return False
        v = labels[label]
        import re
        if op == "=":
            return v == value
        if op == "!=":
            return v != value
        if op == "=~":
            return re.fullmatch(f"(?:{value})", v) is not None
        return re.fullmatch(f"(?:{value})", v) is None

    @classmethod
    def _py_rule_index(cls, labels, rules, key_filters=()):
        # getRuleIfShouldExport: keyFilters conjunction gates first
        if not all(cls._py_match(labels, f) for f in key_filters):
            return None
        for i, rule in enumerate(rules):
            if any(all(cls._py_match(labels, f) for f in g)
                   for g in rule.block_filter_groups):
                return None                       # takeWhile cutoff
            if not rule.allow_filter_groups or any(
                    all(cls._py_match(labels, f) for f in g)
                    for g in rule.allow_filter_groups):
                return i
        return None

    def test_agrees_with_python_reference(self, spark):
        from hypothesis import given, settings, strategies as st

        label_names = ["a", "b", "c"]
        values = ["x", "y", "z"]
        filt = st.tuples(st.sampled_from(label_names),
                         st.sampled_from(["=", "!=", "=~", "!~"]),
                         st.sampled_from(values))
        group = st.lists(filt, min_size=1, max_size=2).map(tuple)
        groups = st.lists(group, min_size=0, max_size=2).map(tuple)
        rule = st.builds(ExportRule, allow_filter_groups=groups,
                         block_filter_groups=groups)
        cascades = st.lists(rule, min_size=1, max_size=3).map(tuple)
        key_filters = st.lists(filt, min_size=0, max_size=2).map(tuple)
        labelmaps = st.dictionaries(st.sampled_from(label_names),
                                    st.sampled_from(values), max_size=3)

        # collect cases first, evaluate in ONE Spark job (per-example
        # Spark round trips would make hypothesis unusably slow)
        cases = []

        @settings(max_examples=60, deadline=None)
        @given(cascades, key_filters,
               st.lists(labelmaps, min_size=1, max_size=4))
        def collect(rules, kf, lmaps):
            cases.append((rules, kf, lmaps))

        collect()
        rows, expected = [], []
        for ci, (rules, kf, lmaps) in enumerate(cases):
            for li, lm in enumerate(lmaps):
                rows.append((ci, li, lm))
                expected.append(self._py_rule_index(lm, rules, kf))
        df = spark.createDataFrame(
            rows, "ci int, li int, labels map<string,string>")
        got = {}
        # one select per cascade (rule column depends on the cascade),
        # unioned into a single action; the combined export decision is
        # NULL-if-key-filter-fails else the winning rule index, exactly
        # what export_rows' where-chain implements
        out = None
        for ci, (rules, kf, _) in enumerate(cases):
            labels = F.col("labels")
            decision = F.when(key_filters_col(labels, kf),
                              rule_index_col(labels, rules))
            part = (df.where(F.col("ci") == ci)
                    .select("ci", "li", decision.alias("r")))
            out = part if out is None else out.unionByName(part)
        for r in out.collect():
            got[(r["ci"], r["li"])] = r["r"]
        idx = 0
        for ci, (rules, kf, lmaps) in enumerate(cases):
            for li, lm in enumerate(lmaps):
                assert got[(ci, li)] == expected[idx], \
                    (rules, kf, lm, got[(ci, li)], expected[idx])
                idx += 1


class TestRegisteredOracle:
    """The round-6 registered exporter queries must be bit-exact vs
    their DuckDB oracles (the driver's own comparison, reproduced)."""

    @pytest.mark.parametrize("name", ["ts_export_rules",
                                      "ts_export_columns"])
    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_export_queries_exact(self, spark, sf, name):
        import duckdb
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "scripts"))
        from check_oracle import rows_key
        from filodb_spark.driver_queries.export_queries import (ORACLES,
                                                                QUERIES)
        sf_dir = f"/root/testdata/{sf}"
        sdf = QUERIES[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
        res = con.sql(ORACLES[name])
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
        assert sorted(scols) == sorted(ocols)
        assert len(srows) == len(orows) and len(srows) > 0
        assert rows_key(srows, scols) == rows_key(orows, ocols)
