"""Delta-format series table (SURVEY §7 names Parquet/Delta).

The verification container has neither the delta-spark jar nor network
access (verified: no io.delta jar under pyspark/jars, `import delta`
fails), so the parity tests here skip-mark on `delta_available` —
the same pattern as the pillow guard in test_multimodal — and the
always-on tests pin the documented unavailable-path behavior.
"""

import pytest
from pyspark.sql import functions as F

from filodb_spark.sources.table import (delta_available,
                                        optimize_series_table_delta,
                                        read_series_table,
                                        write_series_table)


@pytest.fixture()
def series_df(spark):
    rows = []
    for ns in ["App-0", "App-1"]:
        for i in range(40):
            rows.append(({"__name__": "m", "_ws_": "demo", "_ns_": ns,
                          "inst": str(i % 4)},
                         1_700_000_000_000 + i * 60_000, float(i)))
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")


def test_bad_format_rejected(spark, series_df, tmp_path):
    with pytest.raises(ValueError, match="parquet.*delta"):
        write_series_table(series_df, str(tmp_path / "t"), format="orc")


def test_delta_unavailable_is_documented_error(spark, series_df, tmp_path):
    if delta_available(spark):
        pytest.skip("delta runtime present; unavailable path not testable")
    with pytest.raises(RuntimeError, match="delta-spark"):
        write_series_table(series_df, str(tmp_path / "t"), format="delta")
    with pytest.raises(RuntimeError, match="delta-spark"):
        read_series_table(spark, str(tmp_path / "t"), format="delta")
    with pytest.raises(RuntimeError, match="delta-spark"):
        optimize_series_table_delta(spark, str(tmp_path / "t"))


def test_parquet_default_unchanged(spark, series_df, tmp_path):
    # format param must not disturb the default layout/pruning contract
    path = str(tmp_path / "t")
    write_series_table(series_df, path)
    df = read_series_table(spark, path).where(F.col("_ns_") == "App-0")
    assert df.count() == 40
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


class TestDeltaParity:
    """Runs only where a Delta runtime exists. Asserts the parity
    contract the parquet path already pins: same rows back, partition
    pruning still effective."""

    @pytest.fixture(autouse=True)
    def _gate(self, spark):
        if not delta_available(spark):
            pytest.skip("delta runtime absent in this container "
                        "(no io.delta jar, no network to fetch one)")

    def test_roundtrip_and_pruning(self, spark, series_df, tmp_path):
        path = str(tmp_path / "d")
        write_series_table(series_df, path, format="delta")
        df = read_series_table(spark, path, format="delta")
        assert df.count() == 80
        pq = str(tmp_path / "p")
        write_series_table(series_df, pq)
        a = sorted((r["ts"], r["value"]) for r in df.collect())
        b = sorted((r["ts"], r["value"])
                   for r in read_series_table(spark, pq).collect())
        assert a == b
        pruned = df.where(F.col("_ns_") == "App-0")
        assert pruned.count() == 40

    def test_optimize_zorder(self, spark, series_df, tmp_path):
        path = str(tmp_path / "z")
        write_series_table(series_df, path, format="delta")
        optimize_series_table_delta(spark, path)
        assert read_series_table(spark, path, format="delta").count() == 80
