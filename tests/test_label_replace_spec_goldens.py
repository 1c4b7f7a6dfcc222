"""Goldens ported from the reference's LabelReplaceSpec and LableJoinSpec.

Source (behavior only): query/src/test/scala/filodb/query/exec/rangefn/
LabelReplaceSpec.scala — full-string match gating, new-label creation,
nonexistent-group-reference stripping (:274-298), missing/empty source
label semantics (:300-350), empty replacement drops the label (:378-400),
plan-time validation errors (:197-220); plus LableJoinSpec's dst/src
identifier validation.
"""

import pytest

from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore

T0 = 1_700_000_000_000


@pytest.fixture(scope="module")
def lr_engine(spark):
    rows = [
        ({"__name__": "m", "src": "source-value-10",
          "dst": "original-destination-value"}, T0, 3.3),
        ({"__name__": "m", "src": "source-value-20",
          "dst": "original-destination-value"}, T0, 100.0),
        ({"__name__": "inst", "instance": "demo.io:9090", "job": "test"},
         T0, 3.3),
        ({"__name__": "inst", "instance": "demo.io:8080"}, T0, 100.0),
    ]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


def _labels(engine, q):
    res = engine.query_range(q, T0, T0, 10_000).collect()
    return sorted(
        tuple(sorted((k, v) for k, v in (r["labels"] or {}).items()
                     if k != "__name__"))
        for r in res)


def _expect(*maps):
    return sorted(tuple(sorted(m.items())) for m in maps)


class TestLabelReplaceSpec:
    def test_replace_only_on_full_match(self, lr_engine):
        # :53-101 — "(.*):90(.*)" rewrites only the :9090 instance
        got = _labels(
            lr_engine,
            'label_replace(inst, "instance", "$1 new Label Value $2", '
            '"instance", "(.*):90(.*)")')
        assert got == _expect(
            {"instance": "demo.io new Label Value 90", "job": "test"},
            {"instance": "demo.io:8080"})

    def test_add_new_dst_label(self, lr_engine):
        # :103-150 — "$1-$1" over "(.*)\\d"
        got = _labels(
            lr_engine,
            'label_replace(inst{job="test"}, "instanceNew", "$1-$1", '
            r'"instance", "(.*)\\d")')
        assert got == _expect(
            {"instance": "demo.io:9090", "job": "test",
             "instanceNew": "demo.io:909-demo.io:909"})

    def test_no_substring_match(self, lr_engine):
        # :248-272 — "value-(.*)" must NOT match "source-value-10"
        got = _labels(
            lr_engine,
            'label_replace(m, "dst", "destination-value-$1", '
            '"src", "value-(.*)")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "original-destination-value"},
            {"src": "source-value-20", "dst": "original-destination-value"})

    def test_full_match_and_replace(self, lr_engine):
        # :222-246
        got = _labels(
            lr_engine,
            'label_replace(m, "dst", "destination-value-$1", '
            '"src", "source-value-(.*)")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "destination-value-10"},
            {"src": "source-value-20", "dst": "destination-value-20"})

    def test_nonexistent_groups_removed(self, lr_engine):
        # :274-298 — "$1-value-$2 $3$67" -> "source-value-10 " (trailing
        # space; $3 and $67 stripped, not an error)
        got = _labels(
            lr_engine,
            'label_replace(m, "dst", "$1-value-$2 $3$67", '
            '"src", "(.*)-value-(.*)")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "source-value-10 "},
            {"src": "source-value-20", "dst": "source-value-20 "})

    def test_missing_src_no_overwrite(self, lr_engine):
        # :300-324 — nonexistent src label, non-empty-matching regex
        got = _labels(
            lr_engine,
            'label_replace(m, "dst", "value-$1", '
            '"nonexistent-src", "source-value-(.*)")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "original-destination-value"},
            {"src": "source-value-20", "dst": "original-destination-value"})

    def test_missing_src_empty_match_overwrites(self, lr_engine):
        # :326-350 — missing src = "" which matches ".*" -> dst = "value-"
        got = _labels(
            lr_engine,
            'label_replace(m, "dst", "value-$1", "nonexistent-src", ".*")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "value-"},
            {"src": "source-value-20", "dst": "value-"})

    def test_unmatched_regex_no_change(self, lr_engine):
        # :352-376
        got = _labels(
            lr_engine,
            'label_replace(m, "dst", "value-$1", "src", "dummy-regex")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "original-destination-value"},
            {"src": "source-value-20", "dst": "original-destination-value"})

    def test_empty_replacement_drops_label(self, lr_engine):
        # :378-400
        got = _labels(lr_engine, 'label_replace(m, "dst", "", "dst", ".*")')
        assert got == _expect({"src": "source-value-10"},
                              {"src": "source-value-20"})

    def test_invalid_regex_raises(self, lr_engine):
        with pytest.raises(Exception, match="Invalid Regular Expression"):
            lr_engine.query_range(
                'label_replace(m, "instance", "$1", "instance", "(.*)9(")',
                T0, T0, 10_000)

    def test_invalid_dst_label_raises(self, lr_engine):
        with pytest.raises(Exception, match="Invalid destination label"):
            lr_engine.query_range(
                'label_replace(m, "$instance", "$1", "instance", "(.*)")',
                T0, T0, 10_000)


@pytest.fixture(scope="module")
def lj_engine(spark):
    """LableJoinSpec's testSample: two series with src/src1/src2 (+ dst
    on the first pair), values untouched by label_join."""
    rows = [
        ({"__name__": "m", "src": "source-value", "src1": "source-value-1",
          "src2": "source-value-2", "dst": "dst-value"}, T0, 3.3),
        ({"__name__": "m", "src": "src-value", "src1": "src1-value",
          "src2": "src2-value", "dst": "original-dst-value"}, T0, 100.0),
        ({"__name__": "nodst", "src": "source-value",
          "src1": "source-value-1", "src2": "source-value-2"}, T0, 3.3),
    ]
    df = spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")
    return PromQLEngine(spark, TsStore(df))


class TestLableJoinSpec:
    """LableJoinSpec.scala goldens (behavior only)."""

    def test_joins_all_src_values_in_order(self, lj_engine):
        # :100-131 — three sources joined by "-", dst overwritten
        got = _labels(
            lj_engine, 'label_join(m, "dst", "-", "src", "src1", "src2")')
        assert got == _expect(
            {"src": "source-value", "src1": "source-value-1",
             "src2": "source-value-2",
             "dst": "source-value-source-value-1-source-value-2"},
            {"src": "src-value", "src1": "src1-value", "src2": "src2-value",
             "dst": "src-value-src1-value-src2-value"})

    def test_missing_label_treated_as_empty(self, lj_engine):
        # :132-162 — src3 absent -> empty string in its slot
        got = _labels(
            lj_engine, 'label_join(m, "dst", "-", "src", "src3", "src1")')
        assert got == _expect(
            {"src": "source-value", "src1": "source-value-1",
             "src2": "source-value-2",
             "dst": "source-value--source-value-1"},
            {"src": "src-value", "src1": "src1-value", "src2": "src2-value",
             "dst": "src-value--src1-value"})

    def test_empty_result_removes_dst(self, lj_engine):
        # :164-190 — all sources absent, sep "" -> dst dropped entirely
        got = _labels(
            lj_engine,
            'label_join(m, "dst", "", "emptysrc", "emptysrc1", "emptysrc2")')
        assert got == _expect(
            {"src": "source-value", "src1": "source-value-1",
             "src2": "source-value-2"},
            {"src": "src-value", "src1": "src1-value", "src2": "src2-value"})

    def test_creates_dst_when_absent(self, lj_engine):
        # :192-222 — series without dst gets one
        got = _labels(
            lj_engine,
            'label_join(nodst, "dst", "-", "src", "src1", "src2")')
        assert got == _expect(
            {"src": "source-value", "src1": "source-value-1",
             "src2": "source-value-2",
             "dst": "source-value-source-value-1-source-value-2"})

    def test_no_sources_removes_dst(self, lj_engine):
        # :224-252 — label_join(v, dst, sep) with zero sources -> dst gone
        got = _labels(lj_engine, 'label_join(m, "dst", "-")')
        assert got == _expect(
            {"src": "source-value", "src1": "source-value-1",
             "src2": "source-value-2"},
            {"src": "src-value", "src1": "src1-value", "src2": "src2-value"})

    def test_values_unchanged(self, lj_engine):
        # every spec case re-asserts rows pass through untouched
        res = lj_engine.query_range(
            'label_join(m, "dst", "-", "src", "src1", "src2")',
            T0, T0, 10_000).collect()
        assert sorted(r["value"] for r in res) == [3.3, 100.0]

    def test_too_few_args_raises(self, lj_engine):
        # :254-275 — "expected at least 3 argument(s)" for (v, dst) only
        with pytest.raises(Exception, match="at least 3|argument"):
            lj_engine.query_range('label_join(m, "dst")', T0, T0, 10_000)


class TestLabelJoinValidation:
    def test_invalid_dst_raises(self, lr_engine):
        with pytest.raises(Exception,
                           match="Invalid destination label name in "
                                 r"label_join\(\)"):
            lr_engine.query_range(
                'label_join(m, "$dst", "-", "src")', T0, T0, 10_000)

    def test_invalid_src_raises(self, lr_engine):
        with pytest.raises(Exception,
                           match=r"Invalid source label name in "
                                 r"label_join\(\)"):
            lr_engine.query_range(
                'label_join(m, "dst", "-", "$src")', T0, T0, 10_000)

    def test_join_golden(self, lr_engine):
        got = _labels(lr_engine, 'label_join(m, "joined", "-", "src", "dst")')
        assert got == _expect(
            {"src": "source-value-10", "dst": "original-destination-value",
             "joined": "source-value-10-original-destination-value"},
            {"src": "source-value-20", "dst": "original-destination-value",
             "joined": "source-value-20-original-destination-value"})
