"""Micro-batch sizing sweep for the streaming counter downsample twin.

The r11 vectorization of streaming_downsample_counter was
throughput-NEUTRAL (678k vs 696k rows/s) because micro-batch fixed
costs (state store open/commit, shuffle, Arrow transfer setup)
dominate at the tested shapes — the in-batch numpy work was never the
bound. This sweep measures where those fixed costs stop dominating:

  axis 1: micro-batch SIZE — the input is written as many small files
          and maxFilesPerTrigger walks batch size from ~1/64 of the
          data to the whole thing (the trigger-interval knob of a rate
          -limited production source maps to exactly this);
  axis 2: spark.sql.execution.arrow.maxRecordsPerBatch — the Arrow
          slice size inside applyInPandasWithState.

Usage: python scripts/sweep_streaming_counter.py [n_series] [n_samples]
Prints one JSON line per configuration:
  {"files_per_trigger": ..., "arrow_batch": ..., "batches": ...,
   "rows_s": ..., "wall_s": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IN_FILES = 64


def main():
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    import filodb_spark
    from filodb_spark.streaming.downsample import \
        streaming_downsample_counter
    from pyspark.sql import functions as F

    spark = filodb_spark.get_spark("sweep-streaming-counter",
                                   shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n = n_series * n_samples
    work = tempfile.mkdtemp(prefix="ds_sweep_")
    try:
        base = spark.range(n).select(
            F.concat(F.lit("s"), (F.col("id") % n_series)).alias("series"),
            ((F.col("id") / n_series).cast("long") * 60_000).alias("ts"),
            (((F.col("id") / n_series).cast("long") % 97) * 3.0)
            .alias("value"))
        cpath = f"{work}/counter_in"
        # many equal files so maxFilesPerTrigger controls batch size;
        # repartition by id range keeps each file time-contiguous per
        # series (the OOO-drop path stays quiet, like a real scrape)
        base.repartitionByRange(IN_FILES, "ts").write.parquet(cpath)

        def run(files_per_trigger, arrow_batch):
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch))
            tag = f"f{files_per_trigger}_a{arrow_batch}"
            out, ckpt = f"{work}/{tag}_out", f"{work}/{tag}_ck"
            stream = (spark.readStream
                      .schema("series string, ts long, value double")
                      .option("maxFilesPerTrigger", files_per_trigger)
                      .parquet(cpath))
            ds = streaming_downsample_counter(stream, 300_000)
            t0 = time.monotonic()
            q = (ds.writeStream.format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(1200)
            dt = time.monotonic() - t0
            batches = (IN_FILES + files_per_trigger - 1) // files_per_trigger
            print(json.dumps({
                "files_per_trigger": files_per_trigger,
                "arrow_batch": arrow_batch, "batches": batches,
                "rows_s": round(n / dt), "wall_s": round(dt, 2)}),
                flush=True)

        # axis 1: batch size at the default Arrow slice (10k)
        for fpt in (1, 4, 16, 64):
            run(fpt, 10_000)
        # axis 2: Arrow slice at the single-batch and 4-batch shapes
        for ab in (2_500, 50_000, 200_000):
            run(64, ab)
        run(4, 50_000)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
