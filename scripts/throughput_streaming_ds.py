"""Throughput probe for the streaming downsample twins.

Measures rows/s through streaming_downsample_counter and
streaming_downsample_hist on a single availableNow micro-batch of
synthetic scrape data (N series x K samples, 5m periods, periodic
resets so the marker state machine does real work). The batch
downsampler is the 100 TB path; this bounds CONTINUOUS-INGEST
throughput only — the r10 verdict flagged the per-row Python loops
inside applyInPandasWithState as the slowest code in the repo.

Usage: python scripts/throughput_streaming_ds.py [n_series] [n_samples]
Prints one JSON line: {"counter_rows_s": ..., "hist_rows_s": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    import filodb_spark
    from filodb_spark.streaming.downsample import (
        streaming_downsample_counter, streaming_downsample_hist)
    from pyspark.sql import functions as F

    spark = filodb_spark.get_spark("throughput-streaming-ds",
                                   shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n = n_series * n_samples
    work = tempfile.mkdtemp(prefix="ds_tp_")
    results = {}
    try:
        # counter input: climb 3/min, reset every 97 samples
        base = spark.range(n).select(
            F.concat(F.lit("s"), (F.col("id") % n_series)).alias("series"),
            ((F.col("id") / n_series).cast("long") * 60_000).alias("ts"),
            (((F.col("id") / n_series).cast("long") % 97) * 3.0)
            .alias("value"))
        cpath = f"{work}/counter_in"
        base.write.parquet(cpath)

        def run(tag, src_schema, src_path, build):
            out, ckpt = f"{work}/{tag}_out", f"{work}/{tag}_ck"
            stream = spark.readStream.schema(src_schema).parquet(src_path)
            ds = build(stream)
            t0 = time.monotonic()
            q = (ds.writeStream.format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(600)
            dt = time.monotonic() - t0
            emitted = spark.read.parquet(out).count()
            results[f"{tag}_rows_s"] = round(n / dt)
            results[f"{tag}_wall_s"] = round(dt, 2)
            results[f"{tag}_emitted"] = emitted

        run("counter", "series string, ts long, value double", cpath,
            lambda s: streaming_downsample_counter(s, 300_000))

        # hist input: 3 buckets, count = counter value, dip with it
        hist = base.select(
            "series", "ts", (F.col("value") * 0.3).alias("sum"),
            F.col("value").alias("count"),
            F.struct(
                F.array(F.lit(1.0), F.lit(5.0), F.lit(10.0)).alias("les"),
                F.array(F.col("value") * 0.2, F.col("value") * 0.7,
                        F.col("value")).alias("values")).alias("hist"),
            (F.col("value") % 5).alias("min"),
            (F.lit(10.0) + F.col("value") % 9).alias("max"))
        hpath = f"{work}/hist_in"
        hist.write.parquet(hpath)
        run("hist", "series string, ts long, sum double, count double, "
                    "hist struct<les: array<double>, "
                    "values: array<double>>, min double, max double",
            hpath,
            lambda s: streaming_downsample_hist(
                s, 300_000, minmax_cols=("min", "max")))
        results["n_rows"] = n
        print(json.dumps(results))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
