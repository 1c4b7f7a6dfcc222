"""Downsampling job + downsample-aware query rewrites.

Reference: the Spark batch downsampler
(spark-jobs/src/main/scala/filodb/downsampler/chunk/BatchDownsampler.scala,
DownsamplerMain.scala:26-80) rolls raw chunks into 5m/1h downsample
chunks. Every schema downsamples, not just gauges
(filodb-defaults.conf:212-342):

    gauge            tTime/dMin/dMax/dSum/dCount/dAvg, time marker
    prom-counter     tTime/dLast, COUNTER marker (dip-preserving rows)
    delta-counter    tTime/dSum, time marker
    prom-histogram   tTime/dLast(sum)/dLast(count)/hLast(h), counter
                     marker on the count column
    delta-histogram  tTime/dSum/dSum/hSum [+dMin/dMax], time marker
    otel-cumulative  prom-histogram + dMin/dMax period aggregates

Downsamplers: ChunkDownsampler.scala:125-237 (dSum/dCount/dMin/dMax
aggregate over the period's rows; dLast/hLast/tTime read the period's
last row). Period markers: DownsamplePeriodMarker.scala:60-141 — the
time marker emits the last row of each resolution period, where a
period is END-inclusive ("a sample exactly at 5pm downsampled
5-minutely falls in the period 4:55:00.001–5:00:00.000", :82-88); the
counter marker additionally emits the first row of the chunk, every
row where the counter dips, and the row immediately before each dip,
so rate/increase on downsampled data still sees every reset
(DownsamplePeriodMarker.scala:100-141). Driver loop: periods are
sorted and period i aggregates rows (mark[i-1], mark[i]]
(BatchDownsampler.scala:292-330).

Query-time function rewrites on ds-gauge (RangeFunction.scala:249-278):
    min_over_time  -> min(min)
    max_over_time  -> max(max)
    sum_over_time  -> sum(sum)
    count_over_time-> sum(count)
    avg_over_time  -> sum(sum) / sum(count)   (AvgWithSumAndCountOverTime)
    last_over_time -> last(avg)
Counter and histogram downsample tables keep the RAW schema (they are
dip-preserving row subsets / re-bucketed delta rows), so the raw range
kernels run on them unchanged — no rewrite table needed.

Raw/downsample split (LongTimeRangePlanner.scala): queries spanning the
raw-retention boundary read the DS table for the old range and the raw
table for the recent range, stitched per series.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filodb_spark.kernels.grid import StepGrid, drop_nan, explode_to_steps

DS_COLS = ("min", "max", "sum", "count", "avg")


def is_eligible_for_downsample(labels_col, allow: Sequence[dict] = (),
                               block: Sequence[dict] = ()):
    """The downsampler's partition eligibility gate
    (DownsamplerSettings.scala:174-180, `allow-filters`/`block-filters`
    in filodb.downsampler config; applied per partition by both the
    chunk downsampler BatchDownsampler.scala:151 and the index
    migration DSIndexJob.scala:116): each filter is a label->value map
    that matches when EVERY pair is present in the series' labels
    (a missing label never matches). With a non-empty allow list, a
    series is eligible only if SOME allow entry matches; it is then
    blocked if ANY block entry matches. Returns a boolean Column."""
    def entry(m: dict):
        cond = F.lit(True)
        for k, v in m.items():
            cond = cond & (labels_col[k] == F.lit(v))
        return F.coalesce(cond, F.lit(False))   # missing label -> no match

    allow_ok = F.lit(True)
    if allow:
        allow_ok = F.lit(False)
        for m in allow:
            allow_ok = allow_ok | entry(m)
    blocked = F.lit(False)
    for m in block:
        blocked = blocked | entry(m)
    return allow_ok & ~blocked


def ds_bucket(ts_col, resolution_ms: int):
    """END-inclusive downsample period id: a sample exactly on a
    resolution boundary belongs to the period that ENDS there
    (TimeDownsamplePeriodMarker, DownsamplePeriodMarker.scala:82-88:
    periods run k*res+1 .. (k+1)*res inclusive)."""
    return F.floor((F.col(ts_col) - 1) / F.lit(resolution_ms))


def downsample(df: DataFrame, series_cols: Sequence[str], resolution_ms: int,
               ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Roll raw samples into ds-gauge rows on a fixed resolution.

    Output ts = last sample timestamp in the bucket (the reference's
    tTime downsampler, ChunkDownsampler.scala:20-32) — partial buckets
    stay inside query windows that cover their samples. Buckets are
    END-inclusive (ds_bucket): DownsamplerMainSpec.scala:1524-1530
    goldens."""
    df = drop_nan(df, value_col)
    bucket = ds_bucket(ts_col, resolution_ms)
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
    agg = (ev.withWatermark("_event_time", watermark_delay)
           .groupBy(*series_cols, _ds_window(resolution_ms).alias("_w"))
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
    # any rollup row in window proves the series was live (the
    # downsampler keeps >= 1 row per resolution period)
    "present_over_time": (None, None),
    # ts (sec) of the last retained rollup in window (tTime)
    "timestamp": (None, None),
}


def downsample_cascade(ds: DataFrame, series_cols: Sequence[str],
                       resolution_ms: int,
                       ts_col: str = "ts") -> DataFrame:
    """Re-roll a ds-gauge table to a coarser resolution (the reference
    runs a 5m AND a 1h downsampler; the 1h rollup is derivable from the
    5m one because every ds-gauge aggregate re-aggregates exactly:
    min(min), max(max), sum(sum), sum(count), avg = sum/count).
    Bucketing keys on the END-inclusive period of the source rows'
    tTime (ds_bucket); when the fine resolution divides the coarse one,
    each fine period nests entirely inside one coarse period."""
    bucket = ds_bucket(ts_col, resolution_ms)
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
    elif fn == "present_over_time":
        out = ex.groupBy(*keys).agg(F.max(F.lit(1.0)).alias("value"))
    elif fn == "timestamp":
        out = ex.groupBy(*keys).agg((F.max("ts") / 1000.0).alias("value"))
    elif fn == "last_over_time":
        out = ex.groupBy(*keys).agg(F.max_by("avg", "ts").alias("value"))
    else:
        col, agg = _DS_REWRITE[fn]
        out = ex.groupBy(*keys).agg(agg(F.col(col)).alias("value"))
    return out.select(*keys, "value")


def _counter_marks(df: DataFrame, series_cols: Sequence[str],
                   resolution_ms: int, ts_col: str,
                   drop_col: str) -> DataFrame:
    """Tag every row with the CounterDownsamplePeriodMarker keep flag
    (DownsamplePeriodMarker.scala:100-141): the union of
      (a) the last row of each END-inclusive resolution period,
      (b) the first row of the series (chunk start in the reference —
          chunkless here, so the series' first sample),
      (c) rows where the drop-detection column dips (NaN reads 0,
          CorrectingDoubleVectorReader semantics), and
      (d) the row immediately before each dip.
    Adds `_keep` (boolean) and `_seg` (0-based count of marked rows
    strictly before this row per series — BatchDownsampler.scala:307-330's
    period segmentation: mark i aggregates rows with _seg == i)."""
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    v = F.col(drop_col)
    read = F.when(F.isnan(v), F.lit(0.0)).otherwise(v)
    bucket = ds_bucket(ts_col, resolution_ms)
    df = (df.withColumn("_rn", F.row_number().over(w))
            .withColumn("_prev", F.lag(read).over(w))
            .withColumn("_read", read)
            .withColumn("_bucket", bucket))
    is_drop = F.col("_prev").isNotNull() & (F.col("_read") < F.col("_prev"))
    df = df.withColumn("_drop", is_drop)
    wb = Window.partitionBy(*series_cols, "_bucket")
    keep = ((F.col("_rn") == 1) | F.col("_drop")
            | F.coalesce(F.lead("_drop").over(w), F.lit(False))
            | (F.col(ts_col) == F.max(ts_col).over(wb)))
    df = df.withColumn("_keep", keep)
    seg = F.sum(F.col("_keep").cast("long")) \
           .over(w.rowsBetween(Window.unboundedPreceding, -1))
    return (df.withColumn("_seg", F.coalesce(seg, F.lit(0)))
              .drop("_rn", "_prev", "_read", "_bucket", "_drop"))


def downsample_counter(df: DataFrame, series_cols: Sequence[str],
                       resolution_ms: int, ts_col: str = "ts",
                       value_col: str = "value") -> DataFrame:
    """prom-counter downsampling: tTime(0) + dLast(1) with the counter
    period marker (filodb-defaults.conf:247-254). Because every emitted
    column reads the marked row itself, the output is a dip-preserving
    ROW SUBSET of the raw table with the raw schema — rate/increase run
    on it with the ordinary counter kernels, and the reset corrections
    they compute equal the raw ones (rows around every dip survive).
    Goldens: DownsamplerMainSpec.scala:1569-1610 (1-min), :2002-2040
    (5-min)."""
    marked = _counter_marks(df, series_cols, resolution_ms, ts_col,
                            value_col)
    return marked.where("_keep").drop("_keep", "_seg")


def downsample_delta_counter(df: DataFrame, series_cols: Sequence[str],
                             resolution_ms: int, ts_col: str = "ts",
                             value_col: str = "value") -> DataFrame:
    """delta-counter downsampling: tTime(0) + dSum(1) with the time
    period marker (filodb-defaults.conf:256-262) — each END-inclusive
    period emits (last ts, sum of deltas). Period sums preserve total
    increase, so increase/rate-of-delta kernels (sum(window)/window)
    read the same totals on bucket-aligned windows. Golden:
    DownsamplerMainSpec.scala:1612-1666."""
    df = drop_nan(df, value_col)
    return (df.withColumn("_bucket", ds_bucket(ts_col, resolution_ms))
            .groupBy(*series_cols, "_bucket")
            .agg(F.max(ts_col).alias(ts_col),
                 F.sum(value_col).alias(value_col))
            .drop("_bucket"))


def downsample_hist(df: DataFrame, series_cols: Sequence[str],
                    resolution_ms: int, ts_col: str = "ts",
                    count_col: str = "count",
                    minmax_cols: Sequence[str] = ()) -> DataFrame:
    """prom-histogram / otel-cumulative-histogram downsampling:
    tTime(0) + dLast(sum) + dLast(count) + hLast(h) [+ dMin/dMax] with
    the counter period marker on the COUNT column
    (filodb-defaults.conf:265-273, :288-301). dLast/hLast read the
    marked row, so sum/count/h form a dip-preserving row subset of the
    raw histogram table (raw schema — the raw hist kernels run on it);
    dMin/dMax aggregate over each period's rows
    (BatchDownsampler.scala:307-330 segments, NaN skipped per
    MinDownsampler/MaxDownsampler ChunkDownsampler.scala:176-258).
    Goldens: DownsamplerMainSpec.scala:1687-1771 (prom, 1-min),
    :1771-1820 (otel-cumulative), :1918-1972 (NaN), :2043-2140 (5-min).
    """
    marked = _counter_marks(df, series_cols, resolution_ms, ts_col,
                            count_col)
    for c in minmax_cols:
        # NaN -> null so min/max skip it, like the reference downsampler
        marked = marked.withColumn(
            c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)))
    if minmax_cols:
        ws = Window.partitionBy(*series_cols, "_seg")
        mm_min, mm_max = minmax_cols
        marked = (marked
                  .withColumn(mm_min, F.min(mm_min).over(ws))
                  .withColumn(mm_max, F.max(mm_max).over(ws)))
    out = marked.where("_keep").drop("_keep", "_seg")
    for c in minmax_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.lit(float("nan"))))
    return out


def downsample_delta_hist(df: DataFrame, series_cols: Sequence[str],
                          resolution_ms: int, ts_col: str = "ts",
                          sum_col: str = "sum", count_col: str = "count",
                          hist_col: str = "hist",
                          minmax_cols: Sequence[str] = ()) -> DataFrame:
    """delta-histogram / otel-delta-histogram downsampling:
    tTime(0) + dSum(sum) + dSum(count) + hSum(h) [+ dMin(min)/dMax(max)]
    with the time period marker (filodb-defaults.conf:275-286,
    :303-315). hSum is the bucket-wise histogram sum
    (HistSumDownsampler, ChunkDownsampler.scala:139-155) — delegated to
    kernels.histogram.hist_sum, whose same-scheme groups sum exactly
    (mixed schemes within one period follow its documented NaN rule).
    Goldens: DownsamplerMainSpec.scala:1761-1769 (delta),
    :1822-1878 (otel-delta), :1880-1916 (exp-delta)."""
    from filodb_spark.kernels.histogram import hist_sum
    df = df.withColumn("_bucket", ds_bucket(ts_col, resolution_ms))
    aggs = [F.max(ts_col).alias(ts_col),
            F.sum(sum_col).alias(sum_col),
            F.sum(count_col).alias(count_col)]
    for c, fn in zip(minmax_cols, (F.min, F.max)):
        nn = F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
        aggs.append(F.coalesce(fn(nn), F.lit(float("nan"))).alias(c))
    keys = [*series_cols, "_bucket"]
    scalar = df.groupBy(*keys).agg(*aggs)
    hists = hist_sum(df.select(*keys, hist_col), keys, hist_col=hist_col)
    order = [*series_cols, ts_col, sum_col, count_col, hist_col,
             *minmax_cols]
    return scalar.join(hists, keys).select(*order)


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


def _ds_window(resolution_ms: int):
    """END-inclusive event-time window (k*res, (k+1)*res] on integer-ms
    data — the batch job's ds_bucket period, as a streaming window
    (startTime offset 1ms)."""
    return F.window("_event_time", f"{resolution_ms} milliseconds",
                    f"{resolution_ms} milliseconds", "1 millisecond")


def streaming_downsample_delta_counter(
        stream: DataFrame, series_cols: Sequence[str], resolution_ms: int,
        ts_col: str = "ts", value_col: str = "value",
        watermark_delay: str = "10 minutes") -> DataFrame:
    """Continuous delta-counter downsampling (tTime/dSum,
    filodb-defaults.conf:256-262): one event-time window aggregation —
    period sums are associative, so unlike the cumulative-counter twin
    no per-series state machine is needed. Output schema matches
    downsample_delta_counter; append mode emits each window once its
    watermark passes."""
    v = F.col(value_col)
    ev = (drop_nan(stream, value_col)
          .withColumn("_event_time", F.timestamp_millis(F.col(ts_col))))
    agg = (ev.withWatermark("_event_time", watermark_delay)
           .groupBy(*series_cols, _ds_window(resolution_ms).alias("_w"))
           .agg(F.max(ts_col).alias(ts_col), F.sum(v).alias(value_col)))
    return agg.select(*series_cols, ts_col, value_col)


def streaming_downsample_delta_hist(
        stream: DataFrame, series_cols: Sequence[str], resolution_ms: int,
        les: Sequence[float], ts_col: str = "ts",
        sum_col: str = "sum", count_col: str = "count",
        hist_col: str = "hist", minmax_cols: Sequence[str] = (),
        watermark_delay: str = "10 minutes") -> DataFrame:
    """Continuous delta-histogram downsampling (tTime/dSum/dSum/hSum
    [+dMin/dMax], filodb-defaults.conf:275-286): ONE event-time window
    aggregation, entirely JVM-side. The bucket grid `les` is a job
    parameter (the gateway knows its scheme the same way), so hSum is
    a fixed-width column-wise sum — no explode, no second stateful
    operator. Inputs must already carry this grid (project through
    kernels.histogram.reconcile_hist upstream otherwise); the batch
    twin's mixed-scheme NaN rule therefore cannot trigger here.
    dMin/dMax skip NaN (all-NaN window -> NaN), as in
    downsample_delta_hist."""
    les = [float(x) for x in les]
    ev = stream.withColumn("_event_time",
                           F.timestamp_millis(F.col(ts_col)))
    vals = F.col(hist_col).getField("values")
    aggs = [F.max(ts_col).alias(ts_col),
            F.sum(sum_col).alias(sum_col),
            F.sum(count_col).alias(count_col)]
    aggs += [F.sum(vals[i]).alias(f"_b{i}") for i in range(len(les))]
    for c, fn in zip(minmax_cols, (F.min, F.max)):
        nn = F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
        aggs.append(F.coalesce(fn(nn), _nan_lit()).alias(c))
    agg = (ev.withWatermark("_event_time", watermark_delay)
           .groupBy(*series_cols, _ds_window(resolution_ms).alias("_w"))
           .agg(*aggs))
    hist = F.struct(
        F.array(*[F.lit(x) for x in les]).alias("les"),
        F.array(*[F.col(f"_b{i}") for i in range(len(les))])
        .alias("values")).alias(hist_col)
    return agg.select(*series_cols, ts_col, sum_col, count_col, hist,
                      *minmax_cols)


def _nan_lit():
    return F.lit(float("nan"))


DSC_STATE_SCHEMA = ("prev_ts long, prev_value double, prev_read double, "
                    "prev_emitted boolean")


def streaming_downsample_counter(stream: DataFrame, resolution_ms: int,
                                 series_col: str = "series",
                                 ts_col: str = "ts",
                                 value_col: str = "value") -> DataFrame:
    """Continuous prom-counter downsampling: the incremental twin of
    downsample_counter, one (prev_ts, prev_value, prev_emitted) state
    row per series (applyInPandasWithState — the same grouped-state
    shape as streaming.stateful's operators).

    Marker rules re-expressed incrementally: the series' first row
    emits immediately; a dip (NaN reads 0) emits the dip row and, if
    still pending, its predecessor; a row opening a NEW end-inclusive
    period emits the pending predecessor (it was the last row of the
    period that just closed). The per-series TAIL row stays pending
    until a successor proves its period closed — the same contract as
    the reference's batch job, which downsamples only CLOSED chunks
    (BatchDownsampler ingests flushed chunksets). Out-of-order rows
    are dropped (append-only invariant, TimeSeriesPartition).

    The in-batch marker flags are pandas/numpy-vectorized (a row's
    emitted flag is exactly head|dip — no recurrence — so dip /
    new-period / emit-predecessor are all shift comparisons); only the
    cross-batch handoff (prev_ts, prev_value, prev_read, prev_emitted)
    lives in the state row, prepended as a virtual row 0.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (f"{series_col} string, {ts_col} long, "
                  f"{value_col} double")
    out_cols = [series_col, ts_col, value_col]

    def advance(key, pdfs, state):
        (series,) = key
        if state.exists:
            prev_ts, prev_value, prev_read, prev_emitted = state.get
        else:
            prev_ts = None
        rows = pd.concat(list(pdfs)).sort_values(ts_col, kind="mergesort")
        ts = rows[ts_col].to_numpy(dtype="int64")
        v = rows[value_col].to_numpy(dtype="float64")
        if prev_ts is not None:
            keep = ts > prev_ts            # cross-batch out-of-order
            ts, v = ts[keep], v[keep]
        if len(ts):
            # in-batch duplicate timestamps: keep the first (stable sort)
            dup = np.concatenate(([False], ts[1:] == ts[:-1]))
            ts, v = ts[~dup], v[~dup]
        if not len(ts):
            if prev_ts is not None:
                state.update((prev_ts, prev_value, prev_read,
                              prev_emitted))
            yield pd.DataFrame(columns=out_cols)
            return
        read = np.where(np.isnan(v), 0.0, v)
        has_prev = prev_ts is not None
        if has_prev:
            ts = np.concatenate(([prev_ts], ts))
            v = np.concatenate(([prev_value], v))
            read = np.concatenate(([prev_read], read))
        n = len(ts)
        head = np.zeros(n, dtype=bool)
        head[0] = not has_prev
        dip = np.zeros(n, dtype=bool)
        dip[1:] = read[1:] < read[:-1]
        period = (ts - 1) // resolution_ms
        newp = np.zeros(n, dtype=bool)
        newp[1:] = period[1:] != period[:-1]
        # a row is emitted AS ITSELF iff it is the series head or a dip
        # (period closes emit the PREDECESSOR) — no recurrence
        emitted = head | dip
        if has_prev:
            emitted[0] = prev_emitted
        emit_prev = np.zeros(n, dtype=bool)
        emit_prev[1:] = (dip[1:] | newp[1:]) & ~emitted[:-1]
        # the virtual state row (index 0 when has_prev) can only enter
        # via emit_prev, which is already gated on ~emitted[0]
        idx = np.union1d(np.flatnonzero(head | dip),
                         np.flatnonzero(emit_prev) - 1)
        state.update((int(ts[-1]), float(v[-1]), float(read[-1]),
                      bool(emitted[-1])))
        yield pd.DataFrame({series_col: series, ts_col: ts[idx],
                            value_col: v[idx]}, columns=out_cols)

    return (stream.groupBy(series_col)
            .applyInPandasWithState(advance, out_schema, DSC_STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))


DSH_STATE_SCHEMA = ("prev_ts long, prev_sum double, prev_count double, "
                    "prev_les array<double>, prev_values array<double>, "
                    "prev_read double, prev_emitted boolean, "
                    "seg_min double, seg_max double")


def streaming_downsample_hist(stream: DataFrame, resolution_ms: int,
                              series_col: str = "series",
                              ts_col: str = "ts",
                              sum_col: str = "sum",
                              count_col: str = "count",
                              hist_col: str = "hist",
                              minmax_cols: Sequence[str] = ()) -> DataFrame:
    """Continuous prom-histogram / otel-cumulative downsampling: the
    incremental twin of downsample_hist. The counter period marker
    rides the COUNT column (NaN reads 0) exactly as in the batch job
    (filodb-defaults.conf:265-273, DownsamplePeriodMarker.scala:100-141):
    the series head emits immediately; a dip emits the dip row and, if
    still pending, its predecessor; a row opening a new END-inclusive
    period emits the pending predecessor. dLast/hLast read the marked
    row itself, so emitted rows carry their raw sum/count/hist; the
    optional dMin/dMax columns aggregate over the marker SEGMENT (rows
    after the previous marked row through the marked row — the batch
    job's `_seg` window, BatchDownsampler.scala:307-330), carried
    incrementally in state with NaN skipped (all-NaN segment -> NaN,
    MinDownsampler/MaxDownsampler ChunkDownsampler.scala:176-258).
    As in streaming_downsample_counter, the per-series TAIL row (and
    its open segment's min/max) pends in state until a successor proves
    its period closed — the batch job's closed-chunks contract.
    Out-of-order rows are dropped (append-only invariant).

    Vectorized like the counter twin: a row's emitted flag is exactly
    head|dip, so dip / new-period / emit-predecessor are shift
    comparisons; marker SEGMENTS are delimited where a row closes one
    (head or dip rows, and rows whose successor dips or opens a new
    period), so dMin/dMax are one NaN-skipping groupby over segment
    ids. Only the cross-batch handoff (prev row + the open segment's
    running min/max) lives in the state row, prepended as a virtual
    row 0 whose min/max ARE the carried segment aggregates."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    mm = bool(minmax_cols)
    if mm:
        mm_min, mm_max = minmax_cols
    out_cols = [series_col, ts_col, sum_col, count_col, "_les", "_values"] \
        + ([mm_min, mm_max] if mm else [])
    out_schema = (f"{series_col} string, {ts_col} long, "
                  f"{sum_col} double, {count_col} double, "
                  "_les array<double>, _values array<double>"
                  + (f", {mm_min} double, {mm_max} double" if mm else ""))

    def _hist_parts(h):
        # struct arrives as a dict (Arrow) or Row-like (driver-local);
        # plain floats so the state row pickles JVM-side
        les, vals = (h["les"], h["values"]) if isinstance(h, dict) \
            else (h[0], h[1])
        return [float(x) for x in les], [float(x) for x in vals]

    def advance(key, pdfs, state):
        (series,) = key
        if state.exists:
            (prev_ts, prev_sum, prev_count, prev_les, prev_values,
             prev_read, prev_emitted, seg_min, seg_max) = state.get
            prev_les = list(prev_les) if prev_les is not None else None
            prev_values = (list(prev_values)
                           if prev_values is not None else None)
        else:
            prev_ts = None
            seg_min = seg_max = None
        rows = pd.concat(list(pdfs)).sort_values(ts_col, kind="mergesort")
        ts = rows[ts_col].to_numpy(dtype="int64")
        s_arr = rows[sum_col].to_numpy(dtype="float64")
        c_arr = rows[count_col].to_numpy(dtype="float64")
        h_arr = rows[hist_col].to_numpy(dtype=object)
        if mm:
            mn_arr = rows[mm_min].to_numpy(dtype="float64")
            mx_arr = rows[mm_max].to_numpy(dtype="float64")
        keep = np.ones(len(ts), dtype=bool)
        if prev_ts is not None:
            keep &= ts > prev_ts           # cross-batch out-of-order
        if len(ts):
            # in-batch duplicate timestamps: keep the first (stable
            # sort; equal values are consecutive in a sorted array)
            keep[1:] &= ts[1:] != ts[:-1]
        ts, s_arr, c_arr, h_arr = ts[keep], s_arr[keep], c_arr[keep], \
            h_arr[keep]
        if mm:
            mn_arr, mx_arr = mn_arr[keep], mx_arr[keep]
        if not len(ts):
            if prev_ts is not None:
                state.update((prev_ts, prev_sum, prev_count, prev_les,
                              prev_values, prev_read, prev_emitted,
                              seg_min, seg_max))
            yield pd.DataFrame(columns=out_cols)
            return
        read = np.where(np.isnan(c_arr), 0.0, c_arr)
        has_prev = prev_ts is not None
        if has_prev:
            ts = np.concatenate(([prev_ts], ts))
            s_arr = np.concatenate(([prev_sum], s_arr))
            c_arr = np.concatenate(([prev_count], c_arr))
            read = np.concatenate(
                ([prev_read], read))
            virt = np.empty(1, dtype=object)   # keep the tuple opaque
            virt[0] = (prev_les, prev_values)
            h_arr = np.concatenate((virt, h_arr))
            if mm:
                # the virtual row's min/max ARE the carried open-segment
                # aggregates (they already include the prev row itself)
                nan = float("nan")
                mn_arr = np.concatenate(
                    ([seg_min if seg_min is not None else nan], mn_arr))
                mx_arr = np.concatenate(
                    ([seg_max if seg_max is not None else nan], mx_arr))
        n = len(ts)
        head = np.zeros(n, dtype=bool)
        head[0] = not has_prev
        dip = np.zeros(n, dtype=bool)
        dip[1:] = read[1:] < read[:-1]
        period = (ts - 1) // resolution_ms
        newp = np.zeros(n, dtype=bool)
        newp[1:] = period[1:] != period[:-1]
        emitted = head | dip
        if has_prev:
            emitted[0] = prev_emitted
        emit_prev = np.zeros(n, dtype=bool)
        emit_prev[1:] = (dip[1:] | newp[1:]) & ~emitted[:-1]
        idx = np.union1d(np.flatnonzero(head | dip),
                         np.flatnonzero(emit_prev) - 1)
        if mm:
            # segment boundaries: after head/dip rows, and after rows
            # whose successor dips or opens a new period
            close = head | dip
            close[:-1] |= dip[1:] | newp[1:]
            seg_id = np.concatenate(([0], np.cumsum(close[:-1])))
            smin = pd.Series(mn_arr).groupby(seg_id).min()  # skipna
            smax = pd.Series(mx_arr).groupby(seg_id).max()
            out_min = smin.reindex(seg_id[idx]).to_numpy()
            out_max = smax.reindex(seg_id[idx]).to_numpy()
            if close[-1]:
                new_seg_min = new_seg_max = None
            else:
                last = float(smin.iloc[-1]), float(smax.iloc[-1])
                new_seg_min = None if math.isnan(last[0]) else last[0]
                new_seg_max = None if math.isnan(last[1]) else last[1]
        else:
            new_seg_min = new_seg_max = None
        hist_parts = [_hist_parts(h_arr[i]) for i in idx]
        last_les, last_values = _hist_parts(h_arr[-1])
        state.update((int(ts[-1]), float(s_arr[-1]), float(c_arr[-1]),
                      last_les, last_values, float(read[-1]),
                      bool(emitted[-1]), new_seg_min, new_seg_max))
        data = {series_col: series, ts_col: ts[idx],
                sum_col: s_arr[idx], count_col: c_arr[idx],
                "_les": [p[0] for p in hist_parts],
                "_values": [p[1] for p in hist_parts]}
        if mm:
            data[mm_min] = out_min
            data[mm_max] = out_max
        yield pd.DataFrame(data, columns=out_cols)

    staged = (stream.groupBy(series_col)
              .applyInPandasWithState(advance, out_schema, DSH_STATE_SCHEMA,
                                      "append", GroupStateTimeout.NoTimeout))
    keep = [series_col, ts_col, sum_col, count_col,
            F.struct(F.col("_les").alias("les"),
                     F.col("_values").alias("values")).alias(hist_col)]
    if mm:
        keep += [mm_min, mm_max]
    return staged.select(*keep)
