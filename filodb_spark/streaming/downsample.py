"""Downsampling job + downsample-aware query rewrites.

Reference: the Spark batch downsampler
(spark-jobs/src/main/scala/filodb/downsampler/chunk/BatchDownsampler.scala,
DownsamplerMain.scala:26-80) rolls raw gauge chunks into 5m/1h `ds-gauge`
chunks with aggregates {tTime, dMin, dMax, dSum, dCount, dAvg}
(ChunkDownsampler.scala:20-32; schema filodb-defaults.conf:453-457).

Query-time function rewrites on ds-gauge (RangeFunction.scala:249-278):
    min_over_time  -> min(min)
    max_over_time  -> max(max)
    sum_over_time  -> sum(sum)
    count_over_time-> sum(count)
    avg_over_time  -> sum(sum) / sum(count)   (AvgWithSumAndCountOverTime)
    last_over_time -> last(avg)

Raw/downsample split (LongTimeRangePlanner.scala): queries spanning the
raw-retention boundary read the DS table for the old range and the raw
table for the recent range, stitched per series.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filodb_spark.kernels.grid import StepGrid, drop_nan, explode_to_steps

DS_COLS = ("min", "max", "sum", "count", "avg")


def downsample(df: DataFrame, series_cols: Sequence[str], resolution_ms: int,
               ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Roll raw samples into ds-gauge rows on a fixed resolution.

    Output ts = last sample timestamp in the bucket (the reference's
    tTime downsampler, ChunkDownsampler.scala:20-32) — partial buckets
    stay inside query windows that cover their samples."""
    df = drop_nan(df, value_col)
    bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(resolution_ms)))
    v = F.col(value_col)
    return (df.withColumn("_bucket", bucket)
            .groupBy(*series_cols, "_bucket")
            .agg(F.max(ts_col).alias("ttime"),
                 F.min(v).alias("min"), F.max(v).alias("max"),
                 F.sum(v).alias("sum"),
                 F.count(v).cast("double").alias("count"),
                 F.avg(v).alias("avg"))
            .withColumn("ts", F.col("ttime"))
            .drop("_bucket"))


def streaming_downsample(stream: DataFrame, series_cols: Sequence[str],
                         resolution_ms: int, ts_col: str = "ts",
                         value_col: str = "value",
                         watermark_delay: str = "10 minutes") -> DataFrame:
    """Continuous rollup: the batch downsampler's aggregate set over
    event-time windows in Structured Streaming (append mode — a window
    emits once its watermark passes; late data beyond the delay is
    dropped, where the reference's batch job instead re-reads closed
    chunks on its next run). Output schema matches downsample(), so
    range_function_ds and the raw/DS stitch work unchanged on the sink
    table."""
    v = F.col(value_col)
    ev = (drop_nan(stream, value_col)
          .withColumn("_event_time", F.timestamp_millis(F.col(ts_col))))
    win = F.window("_event_time", f"{resolution_ms} milliseconds")
    agg = (ev.withWatermark("_event_time", watermark_delay)
           .groupBy(*series_cols, win.alias("_w"))
           .agg(F.max(ts_col).alias("ttime"),
                F.min(v).alias("min"), F.max(v).alias("max"),
                F.sum(v).alias("sum"),
                F.count(v).cast("double").alias("count"),
                F.avg(v).alias("avg")))
    return agg.select(*series_cols, F.col("ttime").alias("ts"),
                      "min", "max", "sum", "count", "avg", "ttime")


# ds-gauge rewrite: fn name -> (source column, window aggregate)
_DS_REWRITE = {
    "min_over_time": ("min", F.min),
    "max_over_time": ("max", F.max),
    "sum_over_time": ("sum", F.sum),
    "count_over_time": ("count", F.sum),
    "last_over_time": ("avg", None),   # max_by(avg, ts)
    "avg_over_time": (None, None),     # sum(sum)/sum(count)
}


def downsample_cascade(ds: DataFrame, series_cols: Sequence[str],
                       resolution_ms: int,
                       ts_col: str = "ts") -> DataFrame:
    """Re-roll a ds-gauge table to a coarser resolution (the reference
    runs a 5m AND a 1h downsampler; the 1h rollup is derivable from the
    5m one because every ds-gauge aggregate re-aggregates exactly:
    min(min), max(max), sum(sum), sum(count), avg = sum/count).
    Bucketing keys on the bucket START of the source rows' tTime, so a
    coarse bucket owns exactly the fine buckets that start inside it."""
    bucket = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(resolution_ms)))
    return (ds.withColumn("_bucket", bucket)
            .groupBy(*series_cols, "_bucket")
            .agg(F.max(ts_col).alias("ttime"),
                 F.min("min").alias("min"), F.max("max").alias("max"),
                 F.sum("sum").alias("sum"), F.sum("count").alias("count"))
            .withColumn("avg", F.col("sum") / F.col("count"))
            .withColumn("ts", F.col("ttime"))
            .drop("_bucket"))


def range_function_ds(ds: DataFrame, fn: str, series_cols: Sequence[str],
                      grid: StepGrid, window: int) -> DataFrame:
    """Evaluate a *_over_time function over a ds-gauge table with the
    reference's downsample rewrites — same grid-explode plan as the raw
    kernel, different aggregate."""
    if fn not in _DS_REWRITE:
        raise ValueError(f"{fn} cannot run on downsampled gauges")
    ex = explode_to_steps(ds, grid, window)
    keys = [*series_cols, "t"]
    if fn == "avg_over_time":
        out = ex.groupBy(*keys).agg(
            (F.sum("sum") / F.sum("count")).alias("value"))
    elif fn == "last_over_time":
        out = ex.groupBy(*keys).agg(F.max_by("avg", "ts").alias("value"))
    else:
        col, agg = _DS_REWRITE[fn]
        out = ex.groupBy(*keys).agg(agg(F.col(col)).alias("value"))
    return out.select(*keys, "value")


def stitch_raw_ds(raw: DataFrame, ds: DataFrame, boundary_ms: int,
                  fn: str, series_cols: Sequence[str], grid: StepGrid,
                  window: int) -> DataFrame:
    """LongTimeRangePlanner: steps at/after the boundary evaluate on raw,
    steps before it on the DS table; results are unioned (StitchRvsExec
    is trivial here — the step sets are disjoint)."""
    from filodb_spark.kernels.range_fns import range_function
    raw_out = range_function(raw, fn, series_cols, grid, window) \
        .where(F.col("t") >= boundary_ms)
    ds_out = range_function_ds(ds, fn, series_cols, grid, window) \
        .where(F.col("t") < boundary_ms)
    return raw_out.unionByName(ds_out)
