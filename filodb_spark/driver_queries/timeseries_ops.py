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


FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW_MS = 7 * 24 * 3600 * 1000
RETENTION_PERIOD_MS = 7 * 24 * 3600 * 1000


def _events_typed(spark, sf_dir):
    from filodb_spark.tsdf import ts_ms
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = ev.schema["ts"].dataType
    return ev.select("user_id", ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                     "event_type")


def q_ev_funnel(spark, sf_dir):
    """Strict-order earliest-match funnel signup -> view -> click ->
    purchase within 7 days, per user (t_1..t_4 + depth)."""
    from filodb_spark.operators.timeseries import funnel
    out = funnel(_events_typed(spark, sf_dir), FUNNEL_STEPS,
                 window_ms=FUNNEL_WINDOW_MS)
    return out.select("user_id", "t_1", "t_2", "t_3", "t_4",
                      F.col("depth").cast("long").alias("depth"))


def q_ev_funnel_summary(spark, sf_dir):
    """Funnel roll-up: per step reached-count, conversion from step 1,
    mean ms from funnel start."""
    from filodb_spark.operators.timeseries import funnel_summary
    out = funnel_summary(_events_typed(spark, sf_dir), FUNNEL_STEPS,
                         window_ms=FUNNEL_WINDOW_MS)
    return out.select(F.col("step").cast("long").alias("step"),
                      "event_type", "n_reached", "conversion",
                      "mean_ms_from_start")


def q_ev_transitions(spark, sf_dir):
    """Within-session (12h gap) event-type transition matrix with
    per-from probabilities; event_id is the deterministic tiebreak."""
    from filodb_spark.operators.timeseries import session_transitions
    from filodb_spark.tsdf import ts_ms
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = ev.schema["ts"].dataType
    d = ev.select("user_id", ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                  "event_type", "event_id")
    return session_transitions(d, ["user_id"], gap_ms=SESSION_GAP_MS,
                               tie_col="event_id")


def q_ev_cohort_retention(spark, sf_dir):
    """Weekly cohort retention triangle over all events."""
    from filodb_spark.operators.timeseries import cohort_retention
    return cohort_retention(_events_typed(spark, sf_dir),
                            period_ms=RETENTION_PERIOD_MS)


def q_ev_rfm(spark, sf_dir):
    """RFM segmentation against fixed bounds (1d/7d recency, 10/50
    frequency, 100/1000 purchase monetary) — deterministic scoring, so
    every cell assignment has an exact oracle."""
    from filodb_spark.operators.timeseries import rfm_segments
    from filodb_spark.tsdf import ts_ms
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = ev.schema["ts"].dataType
    d = ev.select("user_id", ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                  "event_type", F.col("value").cast("double").alias("value"))
    return rfm_segments(d)


ROLL_WINDOW_MS = 24 * 3600 * 1000


def q_ev_rolling(spark, sf_dir):
    """24h trailing count/sum/mean per (user, event) over deduped
    purchases — point-in-time-correct rolling features (one RANGE-frame
    window, no self-join)."""
    from filodb_spark.operators.timeseries import rolling_features
    p = _events_dedup(spark, sf_dir, "purchase")
    return rolling_features(p, ["user_id"], ROLL_WINDOW_MS)


def q_ev_anomalies(spark, sf_dir):
    """7d-trailing prior-window z-score anomalies on deduped purchase
    values (>= 3 sigma, >= 5 prior points) — self-excluding frame so an
    outlier cannot suppress its own detection."""
    from filodb_spark.operators.timeseries import rolling_anomalies
    p = _events_dedup(spark, sf_dir, "purchase")
    return rolling_anomalies(p, ["user_id"], 7 * 24 * 3600 * 1000)


def q_ev_label_churn(spark, sf_dir):
    """Label churn finder (reference spark-jobs LabelChurnFinder.scala:
    128-207): per label name over the events series table, series counts
    active now / within 3d / 7d plus distinct-label-value cardinality
    at each horizon and the churn ratios the pre-aggregation rule
    manager consumes. Exact-cardinality twin of the HLL scale path
    (operator default; tests/test_label_churn pins both)."""
    from filodb_spark.operators.label_churn import label_churn_stats
    from filodb_spark.tsdf import events_labels_ts
    df = events_labels_ts(spark, sf_dir)
    now = df.agg(F.max("ts")).first()[0]
    out = label_churn_stats(df, int(now), active_ms=24 * 3600 * 1000,
                            exact=True)
    return out.select("ws", "label", "ats_active", "ats_3d", "ats_7d",
                      "card_active", "card_3d", "card_7d",
                      "churn_3d", "churn_7d")


_LABEL_CHURN_ORACLE = """
WITH raw AS (
  SELECT event_type, user_id, epoch_ms(ts) AS ts FROM events
),
now_t AS (SELECT max(ts) AS now FROM raw),
series AS (
  SELECT event_type, user_id, max(ts) AS end_ts FROM raw GROUP BY 1, 2
),
kv AS (
  SELECT end_ts, '__name__' AS label, event_type AS v FROM series
  UNION ALL
  SELECT end_ts, 'user' AS label, CAST(user_id AS VARCHAR) AS v FROM series
),
agg AS (
  SELECT 'All' AS ws, label,
    count(CASE WHEN end_ts >= now - 86400000 THEN 1 END) AS ats_active,
    count(CASE WHEN end_ts >= now - 259200000 THEN 1 END) AS ats_3d,
    count(CASE WHEN end_ts >= now - 604800000 THEN 1 END) AS ats_7d,
    count(DISTINCT CASE WHEN end_ts >= now - 86400000 THEN v END)
      AS card_active,
    count(DISTINCT CASE WHEN end_ts >= now - 259200000 THEN v END)
      AS card_3d,
    count(DISTINCT CASE WHEN end_ts >= now - 604800000 THEN v END)
      AS card_7d
  FROM kv, now_t GROUP BY 1, 2
)
SELECT ws, label, ats_active, ats_3d, ats_7d,
       card_active, card_3d, card_7d,
       CAST(card_3d AS DOUBLE) /
         greatest(CAST(card_active AS DOUBLE), 1.0) AS churn_3d,
       CAST(card_7d AS DOUBLE) /
         greatest(CAST(card_active AS DOUBLE), 1.0) AS churn_7d
FROM agg"""


QUERIES = {
    "ev_anomalies": q_ev_anomalies,
    "ev_rolling": q_ev_rolling,
    "ev_rfm": q_ev_rfm,
    "ev_funnel": q_ev_funnel,
    "ev_funnel_summary": q_ev_funnel_summary,
    "ev_cohort_retention": q_ev_cohort_retention,
    "ev_transitions": q_ev_transitions,
    "ev_asof_join": q_ev_asof_join,
    "ev_sessions": q_ev_sessions,
    "ev_gap_fill": q_ev_gap_fill,
    # round-7 addition (LabelChurnFinder spark-job parity) — never gated
    "ev_label_churn": q_ev_label_churn,
}

_DEDUP = """
  SELECT user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events WHERE event_type = '{et}' GROUP BY 1, 2
"""

ORACLES = {
    "ev_label_churn": _LABEL_CHURN_ORACLE,
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

_FUNNEL_CTES = f"""
ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type FROM events),
s1 AS (SELECT user_id, min(ts) AS t_1 FROM ev
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t_2
       FROM ev e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'view' AND e.ts > s1.t_1
         AND e.ts - s1.t_1 <= {FUNNEL_WINDOW_MS} GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t_3
       FROM ev e JOIN s1 ON e.user_id = s1.user_id
                 JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'click' AND e.ts > s2.t_2
         AND e.ts - s1.t_1 <= {FUNNEL_WINDOW_MS} GROUP BY 1),
s4 AS (SELECT e.user_id, min(e.ts) AS t_4
       FROM ev e JOIN s1 ON e.user_id = s1.user_id
                 JOIN s3 ON e.user_id = s3.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s3.t_3
         AND e.ts - s1.t_1 <= {FUNNEL_WINDOW_MS} GROUP BY 1),
fn AS (
  SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3, s4.t_4,
         CAST(1 + (CASE WHEN s2.t_2 IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN s3.t_3 IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN s4.t_4 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS depth
  FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
          LEFT JOIN s3 ON s1.user_id = s3.user_id
          LEFT JOIN s4 ON s1.user_id = s4.user_id
)"""

ORACLES["ev_funnel"] = "WITH " + _FUNNEL_CTES + """
SELECT user_id, t_1, t_2, t_3, t_4, depth FROM fn"""

ORACLES["ev_funnel_summary"] = "WITH " + _FUNNEL_CTES + """,
steps(step, event_type) AS (
  VALUES (CAST(1 AS BIGINT), 'signup'), (CAST(2 AS BIGINT), 'view'),
         (CAST(3 AS BIGINT), 'click'), (CAST(4 AS BIGINT), 'purchase')
),
agg AS (
  SELECT s.step, s.event_type,
         CAST(sum(CASE WHEN fn.depth >= s.step THEN 1 ELSE 0 END)
              AS BIGINT) AS n_reached,
         round(avg(CASE WHEN s.step = 1 THEN fn.t_1 - fn.t_1
                        WHEN s.step = 2 AND fn.depth >= 2
                          THEN fn.t_2 - fn.t_1
                        WHEN s.step = 3 AND fn.depth >= 3
                          THEN fn.t_3 - fn.t_1
                        WHEN s.step = 4 AND fn.depth >= 4
                          THEN fn.t_4 - fn.t_1 END), 3)
           AS mean_ms_from_start
  FROM steps s CROSS JOIN fn GROUP BY 1, 2
),
n1 AS (SELECT n_reached AS base FROM agg WHERE step = 1)
SELECT step, event_type, n_reached,
       round(n_reached / CAST(base AS DOUBLE), 6) AS conversion,
       mean_ms_from_start
FROM agg CROSS JOIN n1"""

ORACLES["ev_cohort_retention"] = f"""
WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts FROM events),
first AS (SELECT user_id, min(ts) AS f FROM ev GROUP BY 1),
j AS (
  SELECT ev.user_id,
         CAST(floor(first.f / {RETENTION_PERIOD_MS}) AS BIGINT)
           AS cohort_period,
         CAST(floor(ev.ts / {RETENTION_PERIOD_MS})
              - floor(first.f / {RETENTION_PERIOD_MS}) AS BIGINT)
           AS period_offset
  FROM ev JOIN first ON ev.user_id = first.user_id
),
active AS (SELECT cohort_period, period_offset,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
           FROM j GROUP BY 1, 2),
sizes AS (SELECT cohort_period,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
          FROM j WHERE period_offset = 0 GROUP BY 1)
SELECT a.cohort_period, a.period_offset, a.n_active, s.n_cohort,
       round(a.n_active / CAST(s.n_cohort AS DOUBLE), 6) AS retention
FROM active a JOIN sizes s ON a.cohort_period = s.cohort_period"""

ORACLES["ev_transitions"] = f"""
WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type, event_id
            FROM events),
g AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
),
nxt AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id, session_idx
                                ORDER BY ts, event_id) AS to_type
  FROM s
),
trans AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS t FROM trans GROUP BY 1)
SELECT trans.from_type, trans.to_type, trans.n,
       round(trans.n / CAST(tot.t AS DOUBLE), 6) AS p
FROM trans JOIN tot ON trans.from_type = tot.from_type"""

ORACLES["ev_rfm"] = """
WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts, event_type,
                   CAST(value AS DOUBLE) AS value FROM events),
pk AS (
  SELECT user_id, max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS frequency,
         round(sum(CASE WHEN event_type = 'purchase' THEN value
                        ELSE 0.0 END), 6) AS monetary
  FROM ev GROUP BY 1),
cm AS (SELECT max(ts) AS cmax FROM ev),
sc AS (
  SELECT user_id, cmax - last_ts AS recency_ms, frequency, monetary,
         CASE WHEN cmax - last_ts <= 86400000 THEN 3
              WHEN cmax - last_ts <= 604800000 THEN 2 ELSE 1 END AS r,
         CASE WHEN frequency >= 50 THEN 3
              WHEN frequency >= 10 THEN 2 ELSE 1 END AS f,
         CASE WHEN monetary >= 1000.0 THEN 3
              WHEN monetary >= 100.0 THEN 2 ELSE 1 END AS m
  FROM pk CROSS JOIN cm)
SELECT user_id, CAST(recency_ms AS BIGINT) AS recency_ms, frequency,
       monetary, CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
       CAST(m AS BIGINT) AS m,
       CAST(r * 100 + f * 10 + m AS BIGINT) AS segment
FROM sc"""

ORACLES["ev_rolling"] = f"""
WITH p AS ({_DEDUP.format(et='purchase')})
SELECT user_id, ts, value,
       CAST(count(value) OVER w AS BIGINT) AS w_count,
       round(sum(value) OVER w, 6) AS w_sum,
       round(avg(value) OVER w, 6) AS w_mean
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN {24 * 3600 * 1000} PRECEDING AND CURRENT ROW)"""

ORACLES["ev_anomalies"] = f"""
WITH p AS ({_DEDUP.format(et='purchase')}),
st AS (
  SELECT user_id, ts, value,
         count(value) OVER w AS n,
         avg(value) OVER w AS m,
         stddev_pop(value) OVER w AS s
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN {7 * 24 * 3600 * 1000} PRECEDING
               AND 1 PRECEDING)
)
SELECT user_id, ts, value,
       round(m, 6) AS w_mean, round(s, 6) AS w_std,
       round(CASE WHEN n >= 5 AND s > 0
                  THEN (value - m) / s END, 6) AS z,
       coalesce(abs(round(CASE WHEN n >= 5 AND s > 0
                               THEN (value - m) / s END, 6)) >= 3.0,
                false) AS is_anomaly
FROM st"""
