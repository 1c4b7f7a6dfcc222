"""Driver queries: downsampler rollups + downsample-aware rewrites.

Mirrors BatchDownsampler output (ttime/min/max/sum/count/avg per
resolution bucket) and the ds-gauge query rewrite
(sum(sum)/sum(count) for avg) with exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.driver_queries.promql_events import (_bounds, DAY, STEP,
                                                       WINDOW)
from filodb_spark.kernels.grid import grid_from_bounds
from filodb_spark.streaming.downsample import downsample, range_function_ds
from filodb_spark.tsdf import events_ts

RES = 6 * 3600 * 1000  # 6h rollup resolution


def q_ds_rollup(spark, sf_dir):
    ev = events_ts(spark, sf_dir)
    ds = downsample(ev, ["event_type"], RES)
    # avg re-derived from the (exact 2-decimal) sum so the division input
    # is the identical double in any engine — raw avg can terminate
    # exactly on a round-6 half-boundary where summation-order ulp noise
    # flips the digit
    return ds.select("event_type", "ts", "ttime", "min", "max",
                     F.round("sum", 2).alias("sum"), "count",
                     F.round(F.round("sum", 2) / F.col("count"), 6)
                     .alias("avg"))


def q_ds_avg_rewrite(spark, sf_dir):
    # avg_over_time rewrite over the rollup table: sum(sum)/sum(count)
    # per window (same plan as streaming.downsample.range_function_ds,
    # inlined with boundary-safe rounding; the engine fn itself is
    # covered by TestDownsample.test_ds_rewrites_match_raw)
    from filodb_spark.kernels.grid import explode_to_steps
    ev = events_ts(spark, sf_dir)
    ds = downsample(ev, ["event_type"], RES)
    lo, hi = _bounds(spark, sf_dir)
    grid = grid_from_bounds(lo, hi, STEP)
    ex = explode_to_steps(ds, grid, DAY)
    out = ex.groupBy("event_type", "t").agg(
        (F.round(F.sum("sum"), 2) / F.sum("count")).alias("_v"))
    return out.select("event_type", "t", F.round("_v", 6).alias("value"))


def q_ds_cascade(spark, sf_dir):
    # 24h rollup derived from the 6h rollup (downsample_cascade): must
    # equal the direct 24h rollup — the oracle computes it from raw
    from filodb_spark.streaming.downsample import downsample_cascade
    ev = events_ts(spark, sf_dir)
    ds6 = downsample(ev, ["event_type"], RES)
    ds24 = downsample_cascade(ds6, ["event_type"], DAY)
    return ds24.select("event_type", "ts", "ttime", "min", "max",
                       F.round("sum", 2).alias("sum"), "count",
                       F.round(F.round("sum", 2) / F.col("count"), 6)
                       .alias("avg"))


QUERIES = {
    "ds_rollup": q_ds_rollup,
    "ds_avg_rewrite": q_ds_avg_rewrite,
    "ds_cascade": q_ds_cascade,
}

_ROLLUP_CTE = f"""
WITH raw AS (
  SELECT event_type, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2
),
ds AS (
  SELECT event_type, ts - (ts % {RES}) AS bucket,
         max(ts) AS ttime, min(value) AS "min", max(value) AS "max",
         sum(value) AS "sum", CAST(count(*) AS DOUBLE) AS "count",
         avg(value) AS "avg"
  FROM raw GROUP BY 1, 2
)
"""

ORACLES = {
    "ds_rollup": _ROLLUP_CTE + """
SELECT event_type, ttime AS ts, ttime, "min", "max",
       round("sum", 2) AS "sum", "count",
       round(round("sum", 2) / "count", 6) AS "avg"
FROM ds""",
    "ds_cascade": f"""
WITH raw AS (
  SELECT event_type, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2
),
ds AS (
  SELECT event_type, ts - (ts % {DAY}) AS bucket,
         max(ts) AS ttime, min(value) AS "min", max(value) AS "max",
         sum(value) AS "sum", CAST(count(*) AS DOUBLE) AS "count"
  FROM raw GROUP BY 1, 2
)
SELECT event_type, ttime AS ts, ttime, "min", "max",
       round("sum", 2) AS "sum", "count",
       round(round("sum", 2) / "count", 6) AS "avg"
FROM ds""",
    "ds_avg_rewrite": _ROLLUP_CTE + f""",
bounds AS (
  SELECT CAST(ceil((SELECT MIN(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gstart,
         CAST(floor((SELECT MAX(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gend
),
grid AS (
  SELECT unnest(generate_series((SELECT gstart FROM bounds),
                                (SELECT gend FROM bounds), {STEP})) AS t
)
SELECT ds.event_type, grid.t,
       round(round(sum(ds."sum"), 2) / sum(ds."count"), 6) AS value
FROM grid JOIN ds ON ds.ttime BETWEEN grid.t - {DAY} AND grid.t
GROUP BY 1, 2""",
}
