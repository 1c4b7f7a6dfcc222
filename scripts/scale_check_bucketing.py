"""Scaling probe: planning-time bucket pruning vs plain layout.

Writes the same synthetic multi-metric series data as (a) a plain
partitioned-sorted table and (b) a metric-bucketed table
(write_series_table_bucketed), then times a single-metric scan + window
aggregation on each. The bucketed layout must (1) show
SelectedBucketsCount 1/N in the plan and (2) not lose to the plain
layout — at real scale the win grows with file count per directory,
since pruning skips footer reads entirely (the Lucene part-key index
analog, PartKeyLuceneIndex.partIdsFromFilters).

Usage: python scripts/scale_check_bucketing.py [n_metrics] [rows_per_metric]
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
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_buckets = 16

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.sources.table import (write_series_table,
                                            write_series_table_bucketed)

    spark = filodb_spark.get_spark("scale-check-bucketing")
    spark.sparkContext.setLogLevel("ERROR")

    t0_ms = 1_700_000_000_000
    base = (spark.range(n_metrics * rows_per)
            .select((F.col("id") % n_metrics).alias("m"),
                    (F.col("id") / n_metrics).cast("long").alias("i")))
    df = base.select(
        F.create_map(
            F.lit("__name__"), F.concat(F.lit("metric_"), F.col("m")),
            F.lit("_ws_"), F.lit("demo"),
            F.lit("_ns_"), F.concat(F.lit("App-"), (F.col("m") % 4)),
            F.lit("inst"), (F.col("i") % 50).cast("string"),
        ).alias("labels"),
        (t0_ms + (F.col("i") % 7_200) * 10_000).alias("ts"),
        (F.col("i") % 997).cast("double").alias("value"))

    tmp = tempfile.mkdtemp(prefix="bucketprobe_")
    plain_path = f"{tmp}/plain"
    table_name = "probe_bucketed"
    try:
        t = time.time()
        write_series_table(df, plain_path, files_per_partition=n_buckets)
        t_write_plain = time.time() - t
        t = time.time()
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        write_series_table_bucketed(df, table_name, n_buckets=n_buckets)
        t_write_bucketed = time.time() - t

        def probe(scan):
            q = (scan.where(F.col("_metric") == "metric_7")
                 .groupBy(F.col("labels")["inst"].alias("inst"))
                 .agg(F.sum("value").alias("s"), F.count("*").alias("n")))
            q.count()                      # warm
            t0 = time.time()
            n = q.count()
            return time.time() - t0, n

        dt_plain, n1 = probe(spark.read.parquet(plain_path))
        dt_bucketed, n2 = probe(spark.table(table_name))
        assert n1 == n2, (n1, n2)
        plan = (spark.table(table_name)
                .where(F.col("_metric") == "metric_7")
                ._jdf.queryExecution().executedPlan().toString())
        pruned = f"SelectedBucketsCount: 1 out of {n_buckets}" in plan
        print(f"rows={n_metrics * rows_per} metrics={n_metrics} "
              f"buckets={n_buckets}")
        print(f"write plain={t_write_plain:.1f}s "
              f"bucketed={t_write_bucketed:.1f}s")
        print(f"single-metric agg: plain={dt_plain:.2f}s "
              f"bucketed={dt_bucketed:.2f}s pruned={pruned}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
