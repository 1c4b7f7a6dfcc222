"""Set-operator semantics goldens ported from the reference's
BinaryJoinSetOperatorSpec.scala (the http_requests job/instance/group
fixture corpus, :56-285).

Porting notes:
- Only the reference's REAL assertions are ported (result sizes, label
  sets, `shouldEqual` row values).  The spec's `assertListEquals` helper
  zips a list with ITSELF and its Boolean result is discarded
  (BinaryJoinSetOperatorSpec.scala:1972-1977), so the inline row-value
  lists of the `setOpAnd`/`setOpUnless` tuple cases are NOT verified by
  the reference suite; for those cases we assert what the reference
  actually checks (result-set size + key membership) plus our own
  NaN-as-absent reading of the masking rule.
- The reference emits NaN at masked timesteps (SetOperatorExec.scala:178:
  `if rhsRow.isNaN then NaN else lhsRow`); our set_op drops the row
  instead.  Under the engine-wide NaN==stale rendering discipline the two
  are equivalent; assertions compare the non-NaN row sets.
- The reference stitches duplicate same-key range vectors arriving from
  different shards before joining (SetOperatorExec.scala:131-136).  In
  this engine a compiled plan can never emit two series with the same
  label set (leaf scans aggregate per series), so set_op requires unique
  keys per side; the composition stitch_rvs -> set_op reproduces the
  reference behavior and is pinned below.
"""

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import scalar_op, set_op
from filodb_spark.kernels.stitch import stitch_rvs

NAN = float("nan")


def ldf(spark, rows):
    return spark.createDataFrame(
        [(r[0], r[1], float(r[2])) for r in rows],
        "labels map<string,string>, t long, value double")


def _series(out):
    """{frozen labels -> [(t, v), ...]} with NaN rows dropped."""
    res = {}
    for r in out.collect():
        if r["value"] is not None and not math.isnan(r["value"]):
            res.setdefault(frozenset(dict(r["labels"]).items()), []).append(
                (r["t"], r["value"]))
    return {k: sorted(v) for k, v in res.items()}


def _key(**labels):
    return frozenset(labels.items())


HTTP = {"__name__": "http_requests"}


@pytest.fixture(scope="module")
def corpus(spark):
    """sampleHttpRequests (BinaryJoinSetOperatorSpec.scala:56-165)."""
    rows = []
    # exact ordering of the reference fixture: value encodes the series
    for job, inst, group, v in [
            ("api-server", "0", "production", 100),
            ("api-server", "1", "production", 200),
            ("api-server", "0", "canary", 300),
            ("api-server", "1", "canary", 400),
            ("app-server", "0", "production", 500),
            ("app-server", "1", "production", 600),
            ("app-server", "0", "canary", 700),
            ("app-server", "1", "canary", 800)]:
        rows.append(({**HTTP, "job": job, "instance": inst, "group": group},
                     1, float(v)))
    return ldf(spark, rows)


def _sub(corpus, **match):
    c = corpus
    for k, v in match.items():
        c = c.where(F.col("labels")[k] == v)
    return c


@pytest.fixture(scope="module")
def no_key(spark):
    """sampleNoKey: one label-less series, value 1 at t=1."""
    return ldf(spark, [({}, 1, 1.0)])


@pytest.fixture(scope="module")
def vector_matching(spark):
    return ldf(spark, [
        ({"__name__": "vector_matching_a", "l": "x"}, 1, 100.0),
        ({"__name__": "vector_matching_a", "l": "y"}, 1, 200.0)])


def _canary_labels(job, inst):
    return _key(__name__="http_requests", job=job, instance=inst,
                group="canary")


class TestLand:
    def test_many_to_many_and(self, corpus):
        # "should join many-to-many with and" :286
        out = set_op(_sub(corpus, group="canary"), _sub(corpus, instance="0"),
                     "and")
        assert _series(out) == {
            _canary_labels("api-server", "0"): [(1, 300.0)],
            _canary_labels("app-server", "0"): [(1, 700.0)]}

    def test_and_after_scalar_op(self, corpus):
        # "... with and between vector having scalar operation" :324
        lhs = scalar_op(_sub(corpus, group="canary"), "+", 1.0)
        out = set_op(lhs, _sub(corpus, instance="0"), "and")
        assert _series(out) == {
            _canary_labels("api-server", "0"): [(1, 301.0)],
            _canary_labels("app-server", "0"): [(1, 701.0)]}

    @pytest.mark.parametrize("kw", [
        dict(on=["instance", "job"]),           # :365
        dict(on=["instance"]),                  # :406
        dict(ignoring=["group"]),               # :446
        dict(ignoring=["group", "job"]),        # :486
    ])
    def test_and_on_ignoring_variants(self, corpus, kw):
        lhs = scalar_op(_sub(corpus, group="canary"), "+", 1.0)
        rhs = _sub(corpus, group="production", instance="0")
        out = set_op(lhs, rhs, "and", **kw)
        assert _series(out) == {
            _canary_labels("api-server", "0"): [(1, 301.0)],
            _canary_labels("app-server", "0"): [(1, 701.0)]}

    def test_and_on_dummy_no_key_rhs_returns_lhs(self, corpus, no_key):
        # "should return Lhs when LAND is done with vector having no labels
        # with on dummy" :525 — neither side carries `dummy`, so every
        # series keys to the empty map and the no-key RHS matches all.
        out = set_op(corpus, no_key, "and", on=["dummy"])
        got = _series(out)
        assert len(got) == 8
        assert sorted(v for rows in got.values() for _, v in rows) == \
            [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0]

    def test_and_empty_rhs_returns_nothing(self, spark):
        # "should not return LHS when op=LAND and LHS has no labels and RHS
        # is empty" :549
        lhs = ldf(spark, [({}, 1, 100.0)])
        rhs = ldf(spark, [])
        assert _series(set_op(lhs, rhs, "and")) == {}

    def test_and_ignoring_all_lhs_labels(self, corpus, no_key):
        # :564 — ignoring(group, instance, job) keys everything to {}
        out = set_op(corpus, no_key, "and",
                     ignoring=["group", "instance", "job"])
        assert len(_series(out)) == 8

    def test_and_rhs_all_nan(self, spark, corpus):
        # "AND should not return rv's when RHS has only NaN" :1027
        rhs = ldf(spark, [({**HTTP, "job": "api-server", "instance": "0",
                            "group": "production"}, 1, NAN)])
        assert _series(set_op(corpus, rhs, "and")) == {}

    def test_and_mixed_nan_rhs(self, spark):
        # "AND should return only non NaN RangeVectors" :1058 and
        # "AND should return NaN when rhs sample has Nan..." :1086 — the
        # t=2 step masks to NaN (reference) == absent (ours).
        base = {**HTTP, "job": "api-server", "group": "production"}
        lhs = ldf(spark, [({**base, "instance": "0"}, 1, 100.0),
                          ({**base, "instance": "0"}, 2, 300.0),
                          ({**base, "instance": "1"}, 1, 200.0),
                          ({**base, "instance": "1"}, 2, 400.0)])
        rhs = ldf(spark, [({**base, "instance": "0"}, 1, 100.0),
                          ({**base, "instance": "0"}, 2, NAN),
                          ({**base, "instance": "1"}, 1, NAN)])
        out = set_op(lhs, rhs, "and")
        assert _series(out) == {
            _key(**base, instance="0"): [(1, 100.0)]}


class TestLor:
    def test_many_to_many_or(self, corpus):
        # "should join many-to-many with or" :588 — canary OR production
        # covers the whole corpus
        out = set_op(_sub(corpus, group="canary"),
                     _sub(corpus, group="production"), "or")
        got = _series(out)
        assert len(got) == 8
        assert sorted(v for rows in got.values() for _, v in rows) == \
            [100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0]

    def test_or_drops_overlapping_rhs(self, corpus):
        # "should drop overlapping samples from rhs when performing LOR"
        # :617 — join keys (all labels minus metric) of canary+1 cover the
        # canary half of instance1; production instance1 survives.
        lhs = scalar_op(_sub(corpus, group="canary"), "+", 1.0)
        out = set_op(lhs, _sub(corpus, instance="1"), "or")
        got = _series(out)
        assert len(got) == 6
        assert got[_canary_labels("api-server", "0")] == [(1, 301.0)]
        assert got[_canary_labels("api-server", "1")] == [(1, 401.0)]
        assert got[_canary_labels("app-server", "0")] == [(1, 701.0)]
        assert got[_canary_labels("app-server", "1")] == [(1, 801.0)]
        assert got[_key(__name__="http_requests", job="api-server",
                        instance="1", group="production")] == [(1, 200.0)]
        assert got[_key(__name__="http_requests", job="app-server",
                        instance="1", group="production")] == [(1, 600.0)]

    @pytest.mark.parametrize("kw", [
        dict(on=["instance"]),                  # :683
        dict(ignoring=["l", "group", "job"]),   # :770
    ])
    def test_or_on_instance_excludes_covered(self, corpus, vector_matching,
                                             kw):
        # "(http_requests{group='canary'} + 1) or on(instance)
        #  (http_requests or vector_matching_a)": every instance value 0/1
        # is covered by the LHS, so of the inner OR only the
        # instance-less vector_matching series survive.
        inner = set_op(corpus, vector_matching, "or")
        lhs = scalar_op(_sub(corpus, group="canary"), "+", 1.0)
        out = set_op(lhs, inner, "or", **kw)
        got = _series(out)
        assert len(got) == 6
        assert got[_key(__name__="vector_matching_a", l="x")] == [(1, 100.0)]
        assert got[_key(__name__="vector_matching_a", l="y")] == [(1, 200.0)]
        for job in ("api-server", "app-server"):
            for inst in ("0", "1"):
                assert _canary_labels(job, inst) in got

    def test_or_of_disjoint_keys_returns_both(self, spark):
        # "OR of two TS with no on clause should return both" :1833
        lhs = ldf(spark, [({"l1": "v1"}, t, 2.0)
                          for t in (4800, 4900, 5000)])
        rhs = ldf(spark, [({"l2": "v2"}, t, 0.0)
                          for t in (4800, 4900, 5000)])
        got = _series(set_op(lhs, rhs, "or"))
        assert got == {
            _key(l1="v1"): [(4800, 2.0), (4900, 2.0), (5000, 2.0)],
            _key(l2="v2"): [(4800, 0.0), (4900, 0.0), (5000, 0.0)]}

    def test_or_fills_lhs_nan_gaps_from_rhs(self, spark):
        # "should fill in the missing data on left with the data on RHS for
        # a range query with OR" :1714 — empty-key LHS with NaN runs, RHS
        # constant 0.  Reference merges into one RV taking LHS where
        # non-NaN else RHS; our per-timestep real-row set must match.
        steps = list(range(4800, 6701, 100))
        lhs_vals = ([2.0] * 9 + [NAN] * 4 + [2.0] * 3 + [NAN] * 4)
        lhs = ldf(spark, [({}, t, v) for t, v in zip(steps, lhs_vals)])
        rhs = ldf(spark, [({}, t, 0.0) for t in steps])
        got = _series(set_op(lhs, rhs, "or"))
        expected = [(t, v if not math.isnan(v) else 0.0)
                    for t, v in zip(steps, lhs_vals)]
        assert got == {frozenset(): expected}

    def test_or_on_empty_covers_any_lhs_series(self, spark):
        # "RHS of OR of TS with on() must return NaN values for time steps
        # where 'ANY' LHS has non NaN values" :1889 — on() keys everything
        # to the empty map, so RHS only survives at steps where NO LHS
        # series has a real value.
        lhs = ldf(spark, [({"l1": "v1"}, 4800, 2.0),
                          ({"l1": "v1"}, 4900, NAN),
                          ({"l1": "v1"}, 5000, NAN),
                          ({"l1": "v2"}, 4800, NAN),
                          ({"l1": "v2"}, 4900, 2.0),
                          ({"l1": "v2"}, 5000, NAN)])
        rhs = ldf(spark, [({"l2": "v2"}, t, 0.0)
                          for t in (4800, 4900, 5000)])
        got = _series(set_op(lhs, rhs, "or", on=[]))
        assert got == {
            _key(l1="v1"): [(4800, 2.0)],
            _key(l1="v2"): [(4900, 2.0)],
            _key(l2="v2"): [(5000, 0.0)]}


class TestLunless:
    def test_many_to_many_unless(self, corpus):
        # "should join many-to-many with unless" :849
        out = set_op(_sub(corpus, group="canary"), _sub(corpus, instance="0"),
                     "unless")
        assert _series(out) == {
            _canary_labels("api-server", "1"): [(1, 400.0)],
            _canary_labels("app-server", "1"): [(1, 800.0)]}

    def test_unless_on_job_removes_all(self, corpus):
        # :886 — canary and instance0 cover the same job values
        out = set_op(_sub(corpus, group="canary"), _sub(corpus, instance="0"),
                     "unless", on=["job"])
        assert _series(out) == {}

    def test_unless_on_job_instance(self, corpus):
        # :919 — instance=1 has no RHS counterpart on (job, instance)
        out = set_op(_sub(corpus, group="canary"), _sub(corpus, instance="0"),
                     "unless", on=["job", "instance"])
        assert _series(out) == {
            _canary_labels("api-server", "1"): [(1, 400.0)],
            _canary_labels("app-server", "1"): [(1, 800.0)]}

    def test_unless_ignoring_group(self, corpus):
        # ignoring(group) == on(job, instance) here (metric dropped too)
        out = set_op(_sub(corpus, group="canary"), _sub(corpus, instance="0"),
                     "unless", ignoring=["group"])
        assert _series(out) == {
            _canary_labels("api-server", "1"): [(1, 400.0)],
            _canary_labels("app-server", "1"): [(1, 800.0)]}


class TestStitchComposition:
    """Duplicate same-key inputs must be stitched before the set op —
    in the reference this happens inside SetOperatorExec (:131-136); here
    the composition stitch_rvs -> set_op is the supported path."""

    def test_stitch_then_unless(self, spark):
        # "should perform A - B when no on is given correctly" :1538 —
        # the two {label2,onLabel} duplicates stitch with a value conflict
        # at t=10 and t=20 (-> NaN), and the {label1:value1} LHS series is
        # erased at its only real timestep by the RHS.
        lhs = ldf(spark, [
            ({"label1": "value1"}, 0, NAN),
            ({"label1": "value1"}, 10, 1.0),
            ({"label1": "value1"}, 20, NAN),
            ({"label2": "value2", "onLabel": "onValue1"}, 0, 1.0),
            ({"label2": "value2", "onLabel": "onValue1"}, 10, 2.0),
            ({"label2": "value2", "onLabel": "onValue1"}, 20, 3.0),
            ({"label2": "value2", "onLabel": "onValue1"}, 10, 1.0),
            ({"label2": "value2", "onLabel": "onValue1"}, 20, 2.0),
            ({"label2": "value2", "onLabel": "onValue1"}, 30, 3.0),
            ({"label1": "value1", "onLabel": "onValue1"}, 100, 1.0),
            ({"label1": "value1", "onLabel": "onValue1"}, 200, 2.0),
            ({"label1": "value1", "onLabel": "onValue1"}, 300, 3.0),
        ])
        rhs = ldf(spark, [({"label1": "value1"}, 0, NAN),
                          ({"label1": "value1"}, 10, 1.0),
                          ({"label1": "value1"}, 20, NAN)])
        stitched = stitch_rvs([lhs])
        got = _series(set_op(stitched, rhs, "unless"))
        # reference asserts map.size == 2 with these two keys
        assert got == {
            _key(label2="value2", onLabel="onValue1"): [(0, 1.0), (30, 3.0)],
            _key(label1="value1", onLabel="onValue1"):
                [(100, 1.0), (200, 2.0), (300, 3.0)]}
