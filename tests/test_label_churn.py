"""Label churn finder (LabelChurnFinderSpec port + operator semantics).

Reference: spark-jobs/src/main/scala/filodb/labelchurnfinder/
LabelChurnFinder.scala:186-207 — per (ws, label) active/3d/7d series
counts and distinct-value cardinalities; churn = horizon cardinality
over active cardinality.
"""

import pytest
from pyspark.sql import functions as F

from filodb_spark.operators.label_churn import DAY_MS, label_churn_stats

NOW = 1_700_000_000_000


@pytest.fixture(scope="module")
def churn_df(spark):
    # series end-times: "active" series sampled at NOW; churned series
    # last seen 2d ago (inside 3d+7d) or 5d ago (inside 7d only)
    def series(ws, pod, inst, last_ms):
        return ({"_ws_": ws, "pod": pod, "inst": inst}, last_ms, 1.0)

    rows = [
        series("w1", "p-a", "i1", NOW),                    # active
        series("w1", "p-a", "i2", NOW),                    # active
        series("w1", "p-b", "i3", NOW - 2 * DAY_MS),       # churned < 3d
        series("w1", "p-c", "i4", NOW - 5 * DAY_MS),       # churned < 7d
        series("w1", "p-d", "i5", NOW - 30 * DAY_MS),      # out of horizon
        series("w2", "p-a", "i1", NOW),                    # other workspace
    ]
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")


class TestLabelChurn:
    @pytest.mark.parametrize("exact", [True, False])
    def test_counts_and_churn(self, spark, churn_df, exact):
        out = label_churn_stats(churn_df, NOW, exact=exact).collect()
        rows = {(r["ws"], r["label"]): r for r in out}

        pod = rows[("w1", "pod")]
        # 2 active series carry pod; 3 within 3d; 4 within 7d
        assert pod["ats_active"] == 2
        assert pod["ats_3d"] == 3
        assert pod["ats_7d"] == 4
        # distinct pod values: active {p-a}; 3d {p-a, p-b}; 7d {+p-c}
        assert pod["card_active"] == 1
        assert pod["card_3d"] == 2
        assert pod["card_7d"] == 3
        assert pod["churn_7d"] == pytest.approx(3.0)
        assert pod["churn_3d"] == pytest.approx(2.0)

        inst = rows[("w1", "inst")]
        # inst is unique per series: high-churn label
        assert inst["card_active"] == 2 and inst["card_7d"] == 4
        assert inst["churn_7d"] == pytest.approx(2.0)

        # workspaces are separate groups
        assert rows[("w2", "pod")]["card_active"] == 1

    def test_missing_ws_label_defaults(self, spark):
        df = spark.createDataFrame(
            [({"a": "x"}, NOW, 1.0)],
            "labels map<string,string>, ts long, value double")
        out = label_churn_stats(df, NOW).collect()
        assert {r["ws"] for r in out} == {"All"}

    def test_plan_has_no_window_or_driver_loop(self, churn_df):
        plan = label_churn_stats(churn_df, NOW)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Window" not in plan  # pure hash aggregations
