"""Goldens ported from the reference's HistToPromSeriesMapperSpec.

Source (behavior only):
query/src/test/scala/filodb/query/exec/HistToPromSeriesMapperSpec.scala
with its MachineMetricsData.linearHistSeries fixture
(core/src/test/scala/filodb.core/TestData.scala:375-399 —
GeometricBuckets(2,2,n): bucket tops 2,4,...,2^n; at stream step n the
buckets from (n % numBuckets) upward each gain +1, cumulatively).

The mapper turns one histogram range vector into one Prometheus bucket
series per bucket (`le` label, metric suffixed `_bucket`), preserving
timestamps and bucket values. The reference emits NaN rows where a
mixed-scheme source histogram lacks a bucket; in this engine's sparse
row representation those rows are simply absent (NaN == stale — the
same downstream semantics, kernels skip NaN).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from filodb_spark.kernels.histogram import hist_to_prom_bucket_vectors


def linear_hist_rows(start_ts=100_000, time_step=1_000, num_buckets=8,
                     take=20):
    """linearHistSeries: cumulative bucket counts; row n increments
    buckets[n % num_buckets:] by 1. Returns [(ts, les, values)]."""
    les = [2.0 ** (b + 1) for b in range(num_buckets)]
    buckets = [0.0] * num_buckets
    rows = []
    for n in range(take):
        for b in range(n % num_buckets, num_buckets):
            buckets[b] += 1.0
        rows.append((start_ts + n * time_step, list(les), list(buckets)))
    return rows


def _df(spark, rows, labels=None):
    labels = labels or {"__name__": "request-latency", "dc": "0"}
    data = [(labels, t, (les, vals)) for t, les, vals in rows]
    return spark.createDataFrame(
        data, "labels map<string,string>, t long, "
              "hist struct<les: array<double>, values: array<double>>")


EIGHT = linear_hist_rows(take=20)
TEN = linear_hist_rows(start_ts=150_000, num_buckets=10, take=10)


def test_single_scheme_to_prom_bucket_series(spark):
    # :31-60 — 8 buckets -> 8 series, same timestamps, bucket values,
    # le labels, metric gains the _bucket suffix
    out = hist_to_prom_bucket_vectors(_df(spark, EIGHT)).collect()
    by_le = {}
    for r in out:
        assert r["labels"]["__name__"] == "request-latency_bucket"
        assert "le" in r["labels"]
        by_le.setdefault(float(r["labels"]["le"]), []).append(
            (r["t"], r["value"]))
    assert len(by_le) == 8
    for le, pairs in by_le.items():
        bucket_no = next(b for b, top in enumerate(EIGHT[0][1])
                         if top >= le)
        assert sorted(t for t, _ in pairs) == [t for t, _, _ in EIGHT]
        assert {t: v for t, v in pairs} == \
            {t: vals[bucket_no] for t, _, vals in EIGHT}


def test_mixed_schemes_union_of_buckets(spark):
    # :67-104 — 8-bucket rows then 10-bucket rows in ONE series:
    # 10 distinct le series; le=512/1024 exist only at the 10-bucket
    # timestamps (the reference emits NaN for the first 20 — absent
    # rows here); all other buckets cover every timestamp
    out = hist_to_prom_bucket_vectors(_df(spark, EIGHT + TEN)).collect()
    by_le = {}
    for r in out:
        by_le.setdefault(float(r["labels"]["le"]), {})[r["t"]] = r["value"]
    assert len(by_le) == 10
    all_ts = [t for t, _, _ in EIGHT + TEN]
    ten_ts = [t for t, _, _ in TEN]
    for le, got in by_le.items():
        bucket_no = int(math.log2(le)) - 1
        if bucket_no < 8:
            assert sorted(got) == sorted(all_ts)
            for t, _, vals in EIGHT:
                assert got[t] == vals[bucket_no]
        else:
            assert sorted(got) == ten_ts
        for t, _, vals in TEN:
            assert got[t] == vals[bucket_no]


def test_no_nan_rows_emitted(spark):
    # the engine's sparse-row analog of the reference's NaN padding:
    # absent buckets yield no row at all, never a null/NaN value row
    out = hist_to_prom_bucket_vectors(_df(spark, EIGHT + TEN))
    assert out.where(F.col("value").isNull() | F.isnan("value")).count() == 0
