"""Driver queries: general time-series ops (as-of join, sessionization,
gap fill) over `events` — operators the reference lacks (SURVEY §2.6:
its only join is the per-timestep equi-join) but a warehouse-grade
pipeline needs; each with a bit-exact SQL oracle (DuckDB ASOF JOIN /
window mirrors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.operators.timeseries import (asof_join, gap_fill,
                                               session_stats)

SESSION_GAP_MS = 12 * 3600 * 1000
FILL_START = 1_704_067_200_000            # driver fixture epoch range
FILL_STEP = 24 * 3600 * 1000
FILL_STEPS = 30
FILL_STALE_MS = 72 * 3600 * 1000


def _events_dedup(spark, sf_dir, event_type):
    """One series per (user, ts): max(value) — same dedupe rule as the
    PromQL adapters (tsdf.events_ts) so oracles mirror it exactly."""
    from filodb_spark.tsdf import ts_ms
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = ev.schema["ts"].dataType
    return (ev.where(F.col("event_type") == event_type)
            .select("user_id", ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                    F.col("value").cast("double").alias("value"))
            .groupBy("user_id", "ts").agg(F.max("value").alias("value")))


def q_ev_asof_join(spark, sf_dir):
    """Each purchase joined to the user's most recent click at-or-before
    it (backward as-of, 48h tolerance)."""
    purchases = _events_dedup(spark, sf_dir, "purchase")
    clicks = _events_dedup(spark, sf_dir, "click")
    out = asof_join(purchases, clicks, on=["user_id"],
                    payload_cols=["value"],
                    tolerance_ms=48 * 3600 * 1000, prefix="click_")
    return out.select("user_id", "ts", "value", "click_ts",
                      F.round("click_value", 6).alias("click_value"))


def q_ev_sessions(spark, sf_dir):
    """Per-user session stats over all of a user's events (12h gap)."""
    from filodb_spark.tsdf import ts_ms
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = ev.schema["ts"].dataType
    d = (ev.select("user_id", ts_ms(F.col("ts"), ts_dtype).alias("ts"))
         .distinct())
    return session_stats(d, ["user_id"], gap_ms=SESSION_GAP_MS)


def q_ev_gap_fill(spark, sf_dir):
    """Purchases of users 0..49 forward-filled onto a daily grid with a
    72h staleness bound (locf — the PromQL instant-lookback discipline
    as a standalone operator)."""
    p = _events_dedup(spark, sf_dir, "purchase") \
        .where(F.col("user_id") < 50)
    end = FILL_START + (FILL_STEPS - 1) * FILL_STEP
    return gap_fill(p, ["user_id"], FILL_START, end, FILL_STEP,
                    max_stale_ms=FILL_STALE_MS) \
        .select("user_id", "t", F.round("value", 6).alias("value"))


QUERIES = {
    "ev_asof_join": q_ev_asof_join,
    "ev_sessions": q_ev_sessions,
    "ev_gap_fill": q_ev_gap_fill,
}

_DEDUP = """
  SELECT user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events WHERE event_type = '{et}' GROUP BY 1, 2
"""

ORACLES = {
    "ev_asof_join": f"""
WITH p AS ({_DEDUP.format(et='purchase')}),
c AS ({_DEDUP.format(et='click')}),
j AS (
  SELECT p.user_id, p.ts, p.value, c.ts AS click_ts, c.value AS cv
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT user_id, ts, value,
       CASE WHEN ts - click_ts <= {48 * 3600 * 1000} THEN click_ts END
         AS click_ts,
       CASE WHEN ts - click_ts <= {48 * 3600 * 1000} THEN round(cv, 6) END
         AS click_value
FROM j""",
    "ev_sessions": f"""
WITH d AS (
  SELECT DISTINCT user_id, epoch_ms(ts) AS ts FROM events
),
g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING)
              AS BIGINT) - 1 AS session_idx
  FROM g
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts,
       max(ts) - min(ts) AS duration_ms
FROM s GROUP BY 1, 2""",
    "ev_gap_fill": f"""
WITH p AS ({_DEDUP.format(et='purchase')}),
p50 AS (SELECT * FROM p WHERE user_id < 50),
grid AS (
  SELECT user_id, unnest(generate_series(
           {FILL_START},
           {FILL_START + (FILL_STEPS - 1) * FILL_STEP},
           {FILL_STEP})) AS t
  FROM (SELECT DISTINCT user_id FROM p50)
),
j AS (
  SELECT grid.user_id, grid.t, p50.ts AS src_ts, p50.value AS v
  FROM grid ASOF LEFT JOIN p50
    ON grid.user_id = p50.user_id AND grid.t >= p50.ts
)
SELECT user_id, t,
       CASE WHEN t - src_ts <= {FILL_STALE_MS} THEN round(v, 6) END AS value
FROM j""",
}
