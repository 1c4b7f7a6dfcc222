"""Z-order vs metric-sorted layout probe (VERDICT r2 item 7): where does
bucket/sort pruning stop helping and multi-dimension clustering take
over?

Writes the same multi-metric series data as (a) the standard
metric-sorted layout (write_series_table) and (b) the z-order layout
(write_series_table_zorder, Morton interleave of metric+inst hashes,
bloom filters on both), then times two query classes on each:

- metric-addressed: __name__ = metric_7 (all instances) — the layout
  write_series_table/bucketed is built for;
- label-addressed:  inst = 42 (across ALL metrics) — the class the
  reference answers from its Lucene label postings and a metric-sorted
  layout must full-scan.

Decision input: if z-order recovers most of the label-query win without
giving up too much of the metric-query win, it earns its place as a
secondary projection for label-first workloads.

Usage: python scripts/scale_check_zorder.py [n_metrics] [rows_per_metric]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_metrics = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_inst = 50

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.sources.table import (write_series_table,
                                            write_series_table_zorder)

    spark = filodb_spark.get_spark("scale-check-zorder")
    spark.sparkContext.setLogLevel("ERROR")

    t0_ms = 1_700_000_000_000
    base = (spark.range(n_metrics * rows_per)
            .select((F.col("id") % n_metrics).alias("m"),
                    (F.col("id") / n_metrics).cast("long").alias("i")))
    df = base.select(
        F.create_map(
            F.lit("__name__"), F.concat(F.lit("metric_"), F.col("m")),
            F.lit("_ws_"), F.lit("demo"),
            F.lit("_ns_"), F.lit("app"),
            F.lit("inst"), (F.col("i") % n_inst).cast("string"),
        ).alias("labels"),
        (t0_ms + (F.col("i") % 7_200) * 10_000).alias("ts"),
        (F.col("i") % 997).cast("double").alias("value"))

    tmp = tempfile.mkdtemp(prefix="zorderprobe_")
    sorted_path, z_path = f"{tmp}/sorted", f"{tmp}/zorder"
    try:
        t = time.time()
        write_series_table(df, sorted_path, files_per_partition=32)
        t_ws = time.time() - t
        t = time.time()
        write_series_table_zorder(df, z_path, index_labels=("inst",),
                                  n_files=32)
        t_wz = time.time() - t

        def timed(q):
            q.count()                       # warm file listing / code paths
            t0 = time.time()
            n = q.count()
            return time.time() - t0, n

        def metric_q(scan):
            return (scan.where(F.col("_metric") == "metric_7")
                    .groupBy(F.col("labels")["inst"].alias("inst"))
                    .agg(F.sum("value").alias("s"), F.count("*").alias("n")))

        def label_q_sorted(scan):
            # metric-sorted layout has no physical inst column — the
            # predicate runs on the map value, unskippable by stats
            return (scan.where(F.col("labels")["inst"] == "42")
                    .groupBy("_metric")
                    .agg(F.sum("value").alias("s"), F.count("*").alias("n")))

        def label_q_z(scan):
            # z layout materialized _ix_inst: stats/dictionary/bloom
            # prune files+row groups
            return (scan.where(F.col("_ix_inst") == "42")
                    .groupBy("_metric")
                    .agg(F.sum("value").alias("s"), F.count("*").alias("n")))

        s_scan = spark.read.parquet(sorted_path)
        z_scan = spark.read.parquet(z_path)

        dt_m_sorted, n1 = timed(metric_q(s_scan))
        dt_m_z, n2 = timed(metric_q(z_scan))
        assert n1 == n2, (n1, n2)
        dt_l_sorted, n3 = timed(label_q_sorted(s_scan))
        dt_l_z, n4 = timed(label_q_z(z_scan))
        assert n3 == n4, (n3, n4)

        print(f"rows={n_metrics * rows_per} metrics={n_metrics} "
              f"inst={n_inst}")
        print(f"write sorted={t_ws:.1f}s zorder={t_wz:.1f}s")
        print(f"metric-addressed: sorted={dt_m_sorted:.2f}s "
              f"zorder={dt_m_z:.2f}s")
        print(f"label-addressed:  sorted={dt_l_sorted:.2f}s "
              f"zorder={dt_l_z:.2f}s "
              f"({dt_l_sorted / max(dt_l_z, 1e-9):.1f}x)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
