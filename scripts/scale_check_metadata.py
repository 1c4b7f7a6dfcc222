"""Scale probe: metadata latency vs sample density — part-key table
vs raw-sample scan.

The reference answers /api/v1/labels, label values, series, and
cardinality from the per-shard part-key index in O(series)
(PartKeyLuceneIndex.scala:329-465; MetadataExecPlan.scala:334-640) —
the cost never grows with sample density. A sample-table scan pays
O(samples): at 100 TB a bare `label_values("instance")` (Grafana
autocomplete) reads every row-group's labels column across retention.

This probe holds the series count FIXED and sweeps sample density
(the 100-TB axis for metadata), measuring wall time of
label_values + ts_cardinality on
  - the sample-scan fallback (no part-key table attached)
  - the part-key table path (prebuilt parquet index)
Expected: fallback grows ~linearly with density; part-key path is flat
(it never opens the sample table — plan-asserted in
tests/test_partkey.py::test_metadata_plan_never_reads_sample_table).

Usage: python scripts/scale_check_metadata.py [densities...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filodb_spark import metadata
from filodb_spark.partkey import write_partkey_table
from filodb_spark.promql.compiler import TsStore
from filodb_spark.session import get_spark
from filodb_spark.sources.table import write_series_table

N_SERIES = 2_000
BASE_SAMPLES_PER_SERIES = 50
RANGE_MS = 24 * 3_600_000


def corpus(spark, density: int):
    """N_SERIES gauge series with density * BASE samples each, spread
    over 24h; labels carry workspace, metric and instance dims."""
    n = BASE_SAMPLES_PER_SERIES * density
    return (spark.range(N_SERIES * n)
            .select(
                F.create_map(
                    F.lit("__name__"),
                    F.concat(F.lit("metric_"),
                             ((F.col("id") % N_SERIES) % 20).cast("string")),
                    F.lit("_ws_"),
                    F.concat(F.lit("ws_"),
                             ((F.col("id") % N_SERIES) % 4).cast("string")),
                    F.lit("_ns_"), F.lit("app"),
                    F.lit("instance"),
                    (F.col("id") % N_SERIES).cast("string")).alias("labels"),
                ((F.col("id") / N_SERIES).cast("long")
                 * (RANGE_MS // n)).alias("ts"),
                (F.col("id") % 97).cast("double").alias("value")))


def run_metadata(store: TsStore) -> float:
    t0 = time.time()
    metadata.label_values(store, "instance").count()
    metadata.ts_cardinality(store, ("__name__",),
                            active_after_ms=RANGE_MS // 2).count()
    return time.time() - t0


def run_scoped_lookup(store: TsStore) -> float:
    """Grafana's hottest shape: metric+workspace-scoped autocomplete.
    On the raw-mounted index this prunes directories (_ws_ partition
    filter) and row groups (sorted _metric pushed filter) BEFORE the
    merge aggregate — the r8 plan-audit fix."""
    t0 = time.time()
    metadata.label_values(store, "instance",
                          match='metric_3{_ws_="ws_1"}').count()
    return time.time() - t0


def hist_corpus(spark, density: int):
    """N_SERIES/4 histogram series (metric hlat) with density-scaled
    rows — the r9 axis: hist-METRIC-scoped metadata lookups must ride
    the index too (the r8 sliver re-opened O(samples) for them)."""
    n_series = N_SERIES // 4
    n = BASE_SAMPLES_PER_SERIES * density
    return (spark.range(n_series * n)
            .select(
                F.create_map(
                    F.lit("__name__"), F.lit("hlat"),
                    F.lit("_ws_"),
                    F.concat(F.lit("ws_"),
                             ((F.col("id") % n_series) % 4).cast("string")),
                    F.lit("_ns_"), F.lit("app"),
                    F.lit("instance"),
                    (F.col("id") % n_series).cast("string")).alias("labels"),
                ((F.col("id") / n_series).cast("long")
                 * (RANGE_MS // n)).alias("ts"),
                (F.col("id") % 97).cast("double").alias("sum"),
                F.lit(2.0).alias("count"),
                F.struct(F.array(F.lit(1.0), F.lit(2.0)).alias("les"),
                         F.array(F.lit(1.0), F.lit(2.0)).alias("values"))
                .alias("hist")))


def run_hist_scoped(store: TsStore) -> float:
    """Hist-metric-scoped lookup through the `_sum` rewrite (r9:
    resolves on the index via hist_base_of; fallback pays the hist
    sample scan)."""
    t0 = time.time()
    metadata.label_values(store, "instance",
                          match='hlat_sum{_ws_="ws_1"}').count()
    return time.time() - t0


def run_preboundary(store: TsStore, boundary: int) -> float:
    """Long-range metadata on a downsample mount (r10): the queried
    range reaches before raw retention, so the fallback unions the DS
    tables (metadata._ds_scan) and the DS-covering index answers from
    extended spans — the downsample cluster's own part-key index
    (DownsampledTimeSeriesShard.scala:96)."""
    t0 = time.time()
    metadata.label_values(store, "instance",
                          start_ms=0, end_ms=boundary - 1).count()
    return time.time() - t0


def main() -> None:
    densities = [int(x) for x in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("scale-check-metadata", shuffle_partitions=32)
    import tempfile
    root = tempfile.mkdtemp(prefix="scale_meta_")
    print(f"{'density':>8} {'samples':>12} {'scan_s':>8} {'pk_s':>8} "
          f"{'scoped_scan':>12} {'scoped_pk':>10} "
          f"{'hist_scan':>10} {'hist_pk':>8} "
          f"{'ds_scan':>8} {'ds_pk':>8}")
    for d in densities:
        data_path = os.path.join(root, f"series_{d}")
        hist_path = os.path.join(root, f"hist_{d}")
        pk_path = os.path.join(root, f"pk_{d}")
        df = corpus(spark, d)
        write_series_table(df, data_path)
        hist_corpus(spark, d).write.parquet(hist_path)
        hist_df = spark.read.parquet(hist_path)
        t_build = time.time()
        write_partkey_table(
            spark.read.parquet(data_path).select("labels", "ts")
            .unionByName(hist_df.select("labels", "ts")), pk_path)
        t_build = time.time() - t_build
        plain = TsStore.from_table(spark, data_path, hist_df=hist_df,
                                   hist_metrics=("hlat",))
        # warm both paths once (JIT/file listing), then measure
        run_metadata(plain)
        scan_s = run_metadata(plain)
        indexed = TsStore.from_table(spark, data_path, partkey_path=pk_path,
                                     hist_df=hist_df, hist_metrics=("hlat",))
        run_metadata(indexed)
        pk_s = run_metadata(indexed)
        run_scoped_lookup(plain)
        scoped_scan = run_scoped_lookup(plain)
        run_scoped_lookup(indexed)
        scoped_pk = run_scoped_lookup(indexed)
        run_hist_scoped(plain)
        hist_scan = run_hist_scoped(plain)
        run_hist_scoped(indexed)
        hist_pk = run_hist_scoped(indexed)

        # downsample mount: raw truncated to the recent half; the DS
        # counter table (1h marker subset) carries the full history
        import dataclasses

        from filodb_spark.kernels.binary import canonical_labels
        from filodb_spark.streaming.downsample import downsample_counter
        boundary = RANGE_MS // 2
        raw_df = spark.read.parquet(data_path) \
            .select("labels", "ts", "value")
        dsc_path = os.path.join(root, f"dsc_{d}")
        downsample_counter(
            df.withColumn("_sk", canonical_labels(F.col("labels"))),
            ["_sk"], 3_600_000).drop("_sk").write.parquet(dsc_path)
        ds_store = TsStore(raw_df.where(F.col("ts") >= boundary),
                           ds_counter_df=spark.read.parquet(dsc_path),
                           raw_retention_start_ms=boundary)
        run_preboundary(ds_store, boundary)
        ds_scan = run_preboundary(ds_store, boundary)
        dspk_path = os.path.join(root, f"dspk_{d}")
        write_partkey_table(
            ds_store.df.select("labels", "ts").unionByName(
                ds_store.ds_counter_df.select("labels", "ts")),
            dspk_path, covers_ds=True)
        from filodb_spark.partkey import open_partkey_table
        ds_indexed = dataclasses.replace(
            ds_store, partkey_df=open_partkey_table(spark, dspk_path),
            partkey_covers_ds=True)
        run_preboundary(ds_indexed, boundary)
        ds_pk = run_preboundary(ds_indexed, boundary)

        n = N_SERIES * BASE_SAMPLES_PER_SERIES * d
        print(f"{d:>8} {n:>12} {scan_s:>8.2f} {pk_s:>8.2f} "
              f"{scoped_scan:>12.2f} {scoped_pk:>10.2f} "
              f"{hist_scan:>10.2f} {hist_pk:>8.2f} "
              f"{ds_scan:>8.2f} {ds_pk:>8.2f}"
              f"   (index build {t_build:.1f}s)")
    print("expected: scan_s/scoped_scan/hist_scan grow with density; pk"
          " columns flat (scoped_pk/hist_pk additionally prune dirs/"
          "row-groups at scan); ds_scan reads the marker-compressed DS"
          " rows (sub-linear in density), ds_pk flat")


if __name__ == "__main__":
    main()
