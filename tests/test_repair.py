"""Repair/DR copy jobs (spark-jobs/.../repair/): ts-band copy between
series tables, part-key band copy with merge-on-read upsert, and the
symmetric EXCEPT validators."""

from __future__ import annotations

import pyspark.sql.functions as F

from filodb_spark.operators.repair import (copy_partkeys,
                                           copy_time_slice,
                                           validate_partkeys,
                                           validate_time_slice)
from filodb_spark.partkey import read_partkey_table, write_partkey_table
from filodb_spark.sources.table import write_series_table


def _series(spark, metrics, n=48, t0=1_700_000_000_000):
    hour = 3_600_000
    rows = [({"__name__": m, "_ws_": "w", "_ns_": "n"},
             t0 + i * hour, float(i))
            for m in metrics for i in range(n)]
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double")


T0 = 1_700_000_000_000
HOUR = 3_600_000


class TestCopyTimeSlice:
    def test_copy_and_validate_roundtrip(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        write_series_table(_series(spark, ["a", "b"]), src)
        # target starts with the RECENT half; restore the older band
        write_series_table(
            _series(spark, ["a", "b"]).where(
                F.col("ts") >= T0 + 24 * HOUR), dst)
        start, end = T0, T0 + 24 * HOUR
        v = validate_time_slice(spark, src, dst, start, end)
        assert v["target_rows"] == 0 and v["source_only"] == 48
        n = copy_time_slice(spark, src, dst, start, end)
        assert n == 48
        v = validate_time_slice(spark, src, dst, start, end)
        assert v["source_only"] == 0 and v["target_only"] == 0
        assert v["source_rows"] == v["target_rows"] == 48
        # full table now whole: band [T0, T0+48h) matches end to end
        v = validate_time_slice(spark, src, dst, T0, T0 + 48 * HOUR)
        assert v["source_only"] == 0 and v["target_only"] == 0

    def test_validator_flags_partial_copy(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        write_series_table(_series(spark, ["a"]), src)
        write_series_table(
            _series(spark, ["a"]).where(F.col("ts") != T0 + 3 * HOUR),
            dst)
        v = validate_time_slice(spark, src, dst, T0, T0 + 48 * HOUR)
        assert v["source_only"] == 1 and v["target_only"] == 0

    def test_copy_is_schema_tolerant(self, spark, tmp_path):
        """Histogram tables copy through the same job (value columns
        are whatever the source carries)."""
        src, dst = str(tmp_path / "hsrc"), str(tmp_path / "hdst")
        les = [1.0, float("inf")]
        rows = [({"__name__": "h", "_ws_": "w", "_ns_": "n"},
                 T0 + i * HOUR, float(i), float(2 * i),
                 (les, [float(i), float(2 * i)]))
                for i in range(10)]
        df = spark.createDataFrame(
            rows, "labels map<string,string>, ts long, sum double, "
                  "count double, hist struct<les: array<double>, "
                  "values: array<double>>")
        write_series_table(df, src)
        write_series_table(df.where(F.col("ts") >= T0 + 5 * HOUR), dst)
        n = copy_time_slice(spark, src, dst, T0, T0 + 5 * HOUR)
        assert n == 5
        v = validate_time_slice(spark, src, dst, T0, T0 + 10 * HOUR)
        assert v["source_only"] == 0 and v["target_only"] == 0


class TestCopyPartkeys:
    def test_band_copy_merges_into_target(self, spark, tmp_path):
        src, dst = str(tmp_path / "pks"), str(tmp_path / "pkt")
        old = _series(spark, ["retired"], n=24)            # spans 24h
        recent = _series(spark, ["live"], n=48)
        write_partkey_table(old.unionByName(recent), src)
        write_partkey_table(
            recent.where(F.col("ts") >= T0 + 24 * HOUR), dst)
        # validation-only run (copy phase disabled)
        n = copy_partkeys(spark, src, dst, T0, T0 + 24 * HOUR,
                          copy=False)
        assert n == 2                    # retired + live overlap band
        assert read_partkey_table(spark, dst).count() == 1
        n = copy_partkeys(spark, src, dst, T0, T0 + 24 * HOUR)
        assert n == 2
        merged = {r["labels"]["__name__"]: r
                  for r in read_partkey_table(spark, dst).collect()}
        assert set(merged) == {"retired", "live"}
        # upsert: live's span now covers the full 48h, and samples is
        # NOT double-counted (greatest of source/target = the source's
        # full count, since its rows superset the target's)
        assert merged["live"]["first_ts"] == T0
        assert merged["live"]["last_ts"] == T0 + 47 * HOUR
        assert merged["live"]["samples"] == 48
        # re-running the copy is idempotent (record replacement, not
        # append-accumulate)
        copy_partkeys(spark, src, dst, T0, T0 + 24 * HOUR)
        again = {r["labels"]["__name__"]: r
                 for r in read_partkey_table(spark, dst).collect()}
        assert again["live"]["samples"] == 48
        v = validate_partkeys(spark, src, dst, T0, T0 + 48 * HOUR)
        assert v["source_only"] == 0 and v["target_only"] == 0
