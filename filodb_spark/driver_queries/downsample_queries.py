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


def _exact_avg6(sum_col, count_col):
    """round(sum/count, 6) computed ENTIRELY in integer arithmetic so
    both engines agree bit-for-bit. Double-rounding hazard (found at
    sf0.1): when sum/count terminates exactly on a .xxxxxx5 boundary,
    Spark's BigDecimal HALF_UP and DuckDB's multiply-by-1e6 round()
    can disagree by one 6th-decimal ulp. Here: sum (2-decimal data)
    -> exact BIGINT cents; half-up rounding of p/q as (2p+q) div (2q)
    on BIGINTs (valid for the nonnegative sums/counts of this data);
    one final IEEE division by 1e6 of identical integers is identical
    everywhere."""
    cents = F.round(sum_col * 100, 0).cast("long")
    cnt = count_col.cast("long")
    num, den = cents * 20000 + cnt, cnt * 2
    # true integer division (SQL `div`, no double round-trip): exact
    # for ANY long magnitude, unlike the former subtract-remainder
    # double quotient which silently degraded past 2^53 (ADVICE r4).
    # `div` truncates while DuckDB's // floors — identical on the
    # nonnegative domain this is documented for.
    micro = F.call_function("div", num, den)
    return micro / F.lit(1e6)


def q_ds_rollup(spark, sf_dir):
    ev = events_ts(spark, sf_dir)
    ds = downsample(ev, ["event_type"], RES)
    return ds.select("event_type", "ts", "ttime", "min", "max",
                     F.round("sum", 2).alias("sum"), "count",
                     _exact_avg6(F.col("sum"), F.col("count"))
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
        F.sum("sum").alias("_s"), F.sum("count").alias("_c"))
    return out.select("event_type", "t",
                      _exact_avg6(F.col("_s"), F.col("_c")).alias("value"))


def q_ds_cascade(spark, sf_dir):
    # 24h rollup derived from the 6h rollup (downsample_cascade): must
    # equal the direct 24h rollup — the oracle computes it from raw
    from filodb_spark.streaming.downsample import downsample_cascade
    ev = events_ts(spark, sf_dir)
    ds6 = downsample(ev, ["event_type"], RES)
    ds24 = downsample_cascade(ds6, ["event_type"], DAY)
    return ds24.select("event_type", "ts", "ttime", "min", "max",
                       F.round("sum", 2).alias("sum"), "count",
                       _exact_avg6(F.col("sum"), F.col("count"))
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
  SELECT event_type, (ts - 1) // {RES} AS bucket,
         max(ts) AS ttime, min(value) AS "min", max(value) AS "max",
         sum(value) AS "sum", CAST(count(*) AS DOUBLE) AS "count",
         avg(value) AS "avg"
  FROM raw GROUP BY 1, 2
)
"""

# round(sum/count, 6) in exact BIGINT arithmetic (mirrors _exact_avg6;
# the half-boundary double-rounding hazard found at sf0.1):
# cents = round(sum*100); micro = (cents*20000 + cnt) // (2*cnt)
_AVG6 = """((CAST(round("sum" * 100) AS BIGINT) * 20000
             + CAST("count" AS BIGINT))
            // (2 * CAST("count" AS BIGINT))) / 1e6"""

ORACLES = {
    "ds_rollup": _ROLLUP_CTE + f"""
SELECT event_type, ttime AS ts, ttime, "min", "max",
       round("sum", 2) AS "sum", "count",
       {_AVG6} AS "avg"
FROM ds""",
    "ds_cascade": f"""
WITH raw AS (
  SELECT event_type, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2
),
ds AS (
  SELECT event_type, (ts - 1) // {DAY} AS bucket,
         max(ts) AS ttime, min(value) AS "min", max(value) AS "max",
         sum(value) AS "sum", CAST(count(*) AS DOUBLE) AS "count"
  FROM raw GROUP BY 1, 2
)
SELECT event_type, ttime AS ts, ttime, "min", "max",
       round("sum", 2) AS "sum", "count",
       {_AVG6} AS "avg"
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
       ((CAST(round(sum(ds."sum") * 100) AS BIGINT) * 20000
         + CAST(sum(ds."count") AS BIGINT))
        // (2 * CAST(sum(ds."count") AS BIGINT))) / 1e6 AS value
FROM grid JOIN ds ON ds.ttime BETWEEN grid.t - {DAY} AND grid.t
GROUP BY 1, 2""",
}


def q_raw_ds_split(spark, sf_dir):
    """End-to-end raw/DS split through the engine
    (LongTimeRangePlanner.scala:110-171): raw table holds only samples
    past a mid-range retention boundary, the ds table holds 6h rollups
    of ALL history; sum_over_time(...[24h]) instants whose lookback
    window crosses the boundary evaluate on rollups, instants with a
    fully raw-resident window on raw samples — the oracle replicates
    the firstInstantInRaw step math exactly."""
    from filodb_spark.kernels.binary import canonical_labels
    from filodb_spark.promql.compiler import PromQLEngine, TsStore
    ev = events_ts(spark, sf_dir)
    df = ev.select(F.create_map(F.lit("__name__"),
                                F.col("event_type")).alias("labels"),
                   "ts", "value")
    lo, hi = _bounds(spark, sf_dir)
    grid = grid_from_bounds(lo, hi, STEP)
    boundary = grid.start + ((grid.end - grid.start) // (2 * STEP)) * STEP
    raw = df.where(F.col("ts") >= boundary)
    ds = downsample(df.withColumn("_sk", canonical_labels(F.col("labels"))),
                    ["labels"], RES).drop("_sk")
    store = TsStore(raw, ds_df=ds, raw_retention_start_ms=boundary)
    eng = PromQLEngine(spark, store)
    out = eng.query_range('sum_over_time({__name__=~".+"}[24h])',
                          grid.start, grid.end, STEP)
    return out.select(F.col("labels")["__name__"].alias("event_type"),
                      "t", F.round("value", 2).alias("value"))


QUERIES["ts_raw_ds_split"] = q_raw_ds_split

ORACLES["ts_raw_ds_split"] = f"""
WITH raw AS (
  SELECT event_type, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2
),
p AS (
  SELECT CAST(ceil(MIN(ts) / {STEP}.0) AS BIGINT) * {STEP} AS gstart,
         CAST(floor(MAX(ts) / {STEP}.0) AS BIGINT) * {STEP} AS gend
  FROM raw
),
p2 AS (
  SELECT gstart, gend,
         gstart + ((gend - gstart) // (2 * {STEP})) * {STEP} AS boundary
  FROM p
),
p3 AS (
  SELECT gstart, gend, boundary,
         gstart + (((boundary - gstart + {DAY}) // {STEP}) + 1) * {STEP}
           AS first_raw
  FROM p2
),
ds AS (
  SELECT event_type, (ts - 1) // {RES} AS bucket,
         max(ts) AS ttime, sum(value) AS s
  FROM raw GROUP BY 1, 2
),
grid AS (
  SELECT unnest(generate_series((SELECT gstart FROM p3),
                                (SELECT gend FROM p3), {STEP})) AS t
)
SELECT ds.event_type, grid.t, round(sum(ds.s), 2) AS value
FROM grid JOIN ds ON ds.ttime BETWEEN grid.t - {DAY} AND grid.t
WHERE grid.t < (SELECT first_raw FROM p3)
GROUP BY 1, 2
UNION ALL
SELECT raw.event_type, grid.t, round(sum(raw.value), 2) AS value
FROM grid JOIN raw ON raw.ts BETWEEN grid.t - {DAY} AND grid.t
                   AND raw.ts >= (SELECT boundary FROM p3)
WHERE grid.t >= (SELECT first_raw FROM p3)
GROUP BY 1, 2"""
