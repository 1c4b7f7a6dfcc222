"""Binary join / set operator label-semantics goldens, ported from the
reference's BinaryJoinGroupingSpec.scala and BinaryJoinSetOperatorSpec.scala
(node_cpu / node_role fixture shapes)."""

import math

import pytest

from filodb_spark.kernels.binary import set_op, vector_binary_op

T = 1000


def ldf(spark, rows):
    # rows: (labels dict, t, value)
    return spark.createDataFrame(
        [(r[0], r[1], float(r[2])) for r in rows],
        "labels map<string,string>, t long, value double")


@pytest.fixture()
def node_cpu(spark):
    base = {"__name__": "node_cpu", "job": "node"}
    return ldf(spark, [
        ({**base, "instance": "abc", "mode": "idle"}, T, 3.0),
        ({**base, "instance": "abc", "mode": "user"}, T, 1.0),
        ({**base, "instance": "def", "mode": "idle"}, T, 8.0),
        ({**base, "instance": "def", "mode": "user"}, T, 2.0),
    ])


@pytest.fixture()
def node_role(spark):
    return ldf(spark, [
        ({"__name__": "node_role", "job": "node", "instance": "abc",
          "role": "prometheus"}, T, 1.0),
    ])


class TestGroupLeft:
    def test_many_to_one_on_with_include(self, spark, node_cpu, node_role):
        # BinaryJoinGroupingSpec "should join many-to-one with on"
        out = vector_binary_op(node_cpu, node_role, "*", on=["instance"],
                               cardinality="many-to-one", include=["role"])
        rows = [(dict(r["labels"]), r["value"]) for r in out.collect()]
        assert len(rows) == 2
        expected = {
            ("abc", "idle"): 3.0,
            ("abc", "user"): 1.0,
        }
        for lab, v in rows:
            assert lab["role"] == "prometheus"
            assert lab["job"] == "node"
            assert "__name__" not in lab          # math op drops metric
            assert expected[(lab["instance"], lab["mode"])] == v

    def test_many_to_one_ignoring_div(self, spark, node_cpu):
        # "should join many-to-one when group left label does not exist":
        # node_cpu / ignoring(mode) sum by (instance, job) (node_cpu)
        from filodb_spark.kernels.binary import canonical_labels
        from pyspark.sql import functions as F
        totals = ldf(spark, [
            ({"instance": "abc", "job": "node"}, T, 4.0),
            ({"instance": "def", "job": "node"}, T, 10.0),
        ])
        out = vector_binary_op(node_cpu, totals, "/", ignoring=["mode"],
                               cardinality="many-to-one", include=["dummy"])
        got = {(r["labels"]["instance"], r["labels"]["mode"]): r["value"]
               for r in out.collect()}
        assert got == {("abc", "idle"): 0.75, ("abc", "user"): 0.25,
                       ("def", "idle"): 0.8, ("def", "user"): 0.2}

    def test_comparison_keeps_metric_name(self, spark, node_cpu, node_role):
        # "should have metric name when operator is not MathOperator"
        out = vector_binary_op(node_cpu, node_role, ">", on=["instance"],
                               cardinality="many-to-one")
        rows = [dict(r["labels"]) for r in out.collect()]
        assert rows and all(lab["__name__"] == "node_cpu" for lab in rows)

    def test_empty_include_label_deleted(self, spark, node_cpu):
        # BinaryJoinExec.scala:207-212: empty include value deletes label
        one = ldf(spark, [
            ({"__name__": "meta", "instance": "abc", "role": ""}, T, 1.0),
            ({"__name__": "meta", "instance": "def", "role": "x"}, T, 1.0),
        ])
        out = vector_binary_op(node_cpu, one, "*", on=["instance"],
                               cardinality="many-to-one", include=["role"])
        labs = {r["labels"]["instance"]: dict(r["labels"])
                for r in out.collect()}
        assert "role" not in labs["abc"]
        assert labs["def"]["role"] == "x"

    def test_one_to_one_cardinality_error(self, spark, node_cpu):
        # violation: the "one" side has 2 series per join key
        # (BinaryJoinExec.scala:143). Enforcement is lazy (inside the
        # query's own job), so the error surfaces at action time as a
        # Spark runtime error carrying the reference message.
        dup_rhs = ldf(spark, [
            ({"__name__": "node_role", "instance": "abc", "role": "a"}, T, 1.0),
            ({"__name__": "node_role", "instance": "abc", "role": "b"}, T, 2.0),
        ])
        with pytest.raises(Exception, match="many found instead of one"):
            vector_binary_op(node_cpu, dup_rhs, "*", on=["instance"],
                             cardinality="many-to-one",
                             check_cardinality=True).collect()

    def test_cardinality_error_without_matching_rows(self, spark):
        # the reference errors while BUILDING the one-side hash map, even
        # if the duplicate key never matches an LHS row — so must we
        lhs = ldf(spark, [({"__name__": "m", "instance": "zzz"}, T, 1.0)])
        dup_rhs = ldf(spark, [
            ({"__name__": "o", "instance": "abc", "role": "a"}, T, 1.0),
            ({"__name__": "o", "instance": "abc", "role": "b"}, T, 2.0),
        ])
        with pytest.raises(Exception, match="many found instead of one"):
            vector_binary_op(lhs, dup_rhs, "*", on=["instance"],
                             cardinality="many-to-one").collect()


class TestSetOpsNaN:
    def test_and_skips_nan_rhs(self, spark):
        # "AND should return only non NaN RangeVectors" /
        # "AND should not return rv's when RHS has only NaN"
        base = {"__name__": "http_requests", "job": "api-server"}
        lhs = ldf(spark, [
            ({**base, "instance": "0", "group": "production"}, T, 100.0),
            ({**base, "instance": "1", "group": "production"}, T, 200.0),
        ])
        rhs = ldf(spark, [
            ({**base, "instance": "0", "group": "production"}, T, 1.0),
            ({**base, "instance": "1", "group": "production"}, T, float("nan")),
        ])
        out = set_op(lhs, rhs, "and")
        rows = [(r["labels"]["instance"], r["value"]) for r in out.collect()]
        assert rows == [("0", 100.0)]

    def test_or_rhs_only_when_no_lhs_value(self, spark):
        base = {"__name__": "m", "job": "j"}
        lhs = ldf(spark, [({**base, "i": "0"}, T, 1.0)])
        rhs = ldf(spark, [
            ({**base, "i": "0"}, T, 9.0),       # overlaps -> dropped
            ({**base, "i": "1"}, T, 5.0),       # new -> kept
        ])
        out = set_op(lhs, rhs, "or")
        got = {(r["labels"]["i"], r["value"]) for r in out.collect()}
        assert got == {("0", 1.0), ("1", 5.0)}

    def test_unless_on_labels(self, spark):
        base = {"__name__": "m"}
        lhs = ldf(spark, [({**base, "i": "0"}, T, 1.0),
                          ({**base, "i": "1"}, T, 2.0)])
        rhs = ldf(spark, [({"__name__": "other", "i": "0"}, T, 7.0)])
        out = set_op(lhs, rhs, "unless", on=["i"])
        assert [r["labels"]["i"] for r in out.collect()] == ["1"]


class TestGroupRight:
    def test_one_to_many_group_right(self, spark, node_cpu, node_role):
        # mirror of group_left: one side on the LHS ("copy sample role to
        # node using group right", BinaryJoinGroupingSpec.scala:269)
        out = vector_binary_op(node_role, node_cpu, "*", on=["instance"],
                               cardinality="one-to-many", include=["role"])
        rows = [(dict(r["labels"]), r["value"]) for r in out.collect()]
        assert len(rows) == 2
        for lab, v in rows:
            assert lab["role"] == "prometheus"
            assert "__name__" not in lab
            assert v in (3.0, 1.0)


T0 = 1_700_000_000_000


class TestJoinCardinalityLimit:
    """BinaryJoinExecSpec.scala:535-591 — joinQueryCardinality: a
    one-to-one join whose input side carries more series than the
    enforced limit fails with the reference's message; within the
    limit it runs; group_left/right joins are exempt (the reference
    only checks Cardinality.OneToOne)."""

    @pytest.fixture(scope="class")
    def lim_engine(self, spark):
        rows = []
        for tag in ("tag1-1", "tag1-2"):
            rows.append(({"__name__": "lhs_m", "tag2": tag}, T0, 1.0))
            rows.append(({"__name__": "rhs_m", "tag2": tag}, T0, 2.0))
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, value double")
        from filodb_spark.promql.compiler import PromQLEngine, TsStore
        return PromQLEngine(spark, TsStore(df), join_query_cardinality=1)

    def test_over_limit_raises(self, lim_engine):
        with pytest.raises(Exception,
                           match="input cardinality of 2 which is more "
                                 "than limit of 1"):
            lim_engine.query_range("lhs_m + on(tag2) rhs_m",
                                   T0, T0, 10_000).collect()

    def test_within_limit_passes(self, lim_engine):
        res = lim_engine.query_range(
            'lhs_m{tag2="tag1-1"} + on(tag2) rhs_m{tag2="tag1-1"}',
            T0, T0, 10_000).collect()
        assert [r["value"] for r in res] == [3.0]

    def test_group_left_exempt(self, lim_engine):
        # only OneToOne joins are checked (BinaryJoinExec.scala:95)
        res = lim_engine.query_range(
            "lhs_m + on(tag2) group_left rhs_m", T0, T0, 10_000).collect()
        assert len(res) == 2
