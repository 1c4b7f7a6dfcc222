"""General time-series operators beyond PromQL: as-of join,
sessionization, gap fill.

The reference's only join is the per-timestep equi-join
(BinaryJoinExec.scala — SURVEY §2.6 notes no as-of/range joins exist);
these are the operators a warehouse-grade pipeline needs around a
metrics store. All are single-shuffle window compositions — no range
join, no cartesian product, no Python:

- asof_join: union the two sides, one sort per key, carry the latest
  right payload forward — O(n log n) per key partition, the standard
  scalable shape (vs. an O(n*m) range join).
- sessionize: gap > threshold starts a session; session index is a
  running sum over one window.
- gap_fill: explode a step grid per series, forward-fill with
  last(ignorenulls) — same staleness-carry discipline as the PromQL
  instant lookback.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              ts_col: str = "ts", payload_cols: Sequence[str] = (),
              tolerance_ms: int | None = None,
              prefix: str = "r_") -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts per `on` key (backward as-of join; DuckDB/pandas
    `ASOF JOIN` semantics — ties at equal ts match).

    Implementation: tag + union both sides, then one window per key
    ordered by (ts, side) carrying the last right payload forward.
    Exactly one shuffle on the key; at 100 TB this sort-merge shape
    beats a range join (no per-row interval probe, no blowup).

    tolerance_ms: matches older than `left.ts - tolerance_ms` are
    nulled out (still one pass). Output: left columns + prefixed right
    payload columns + `<prefix>ts`.
    """
    payload = F.struct(F.col(ts_col).alias("__ts"),
                       *[F.col(c) for c in payload_cols])
    r = right.select(*on, F.col(ts_col).alias(ts_col),
                     payload.alias("__p"), F.lit(0).alias("__side"))
    lcols = [c for c in left.columns]
    l = left.select(*lcols, F.lit(None).cast(r.schema["__p"].dataType)
                    .alias("__p"), F.lit(1).alias("__side"))
    u = l.unionByName(r.select(*on, ts_col, "__p", "__side"),
                      allowMissingColumns=True)
    # right rows sort before left rows at the same ts -> ties match
    w = (Window.partitionBy(*on)
         .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    match = F.col("__last")
    if tolerance_ms is not None:
        match = F.when(F.col(ts_col) - F.col("__last")["__ts"]
                       <= tolerance_ms, F.col("__last"))
    sel = [F.col(c) for c in lcols]
    sel.append(match["__ts"].alias(f"{prefix}ts"))
    sel += [match[c].alias(f"{prefix}{c}") for c in payload_cols]
    return out.select(*sel)


def sessionize(df: DataFrame, key_cols: Sequence[str], ts_col: str = "ts",
               gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Assign session indexes per key: a new session starts when the gap
    from the previous event exceeds gap_ms. Adds `session_idx` (0-based
    per key, ordered by ts). One window over one shuffle."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(prev.isNull() | (F.col(ts_col) - prev > gap_ms), 1) \
        .otherwise(0)
    return df.withColumn(
        "session_idx",
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
         - 1).cast("long"))


def session_stats(df: DataFrame, key_cols: Sequence[str],
                  ts_col: str = "ts",
                  gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Per (key, session): event count, start/end, duration_ms."""
    s = sessionize(df, key_cols, ts_col, gap_ms)
    return (s.groupBy(*key_cols, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("start_ts"),
                 F.max(ts_col).alias("end_ts"))
            .withColumn("duration_ms",
                        F.col("end_ts") - F.col("start_ts")))


def funnel(df: DataFrame, steps: Sequence[str],
           key_cols: Sequence[str] = ("user_id",),
           type_col: str = "event_type", ts_col: str = "ts",
           window_ms: int | None = None) -> DataFrame:
    """Strict-order funnel analysis: per key, the earliest completion of
    step_1 < step_2 < ... < step_D (each step's timestamp strictly after
    the previous step's matched timestamp). Without window_ms the greedy
    earliest-match is optimal: matching the earliest possible occurrence
    of each step never forecloses a deeper completion. With window_ms the
    funnel is ANCHORED at the key's earliest step-1 event and requires
    t_d - t_1 <= window_ms for every matched step — a later step-1
    occurrence whose window would fit deeper steps is NOT re-tried, so
    depth can be lower than a per-anchor re-matching
    ("restart-on-window-expiry") funnel would report. This
    greedy-from-earliest-anchor semantics is deliberate (single
    anchor per key, one aggregation pass) and is exactly what the
    oracle encodes.

    Output: one row per key that reached step 1, with t_1..t_D
    (NULL once the funnel stalls) and `depth` = number of steps
    reached.

    Scale shape: one filtered min-aggregation per step plus an
    equi-join on the key — D-1 hash joins on the uniform key column,
    no window over the full event stream, no ordering of raw events.
    Each step's input is pre-filtered to that step's events, so the
    joins move only per-key step timestamps (|keys| rows), not events.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    keys = list(key_cols)
    cur = (df.where(F.col(type_col) == steps[0])
           .groupBy(*keys).agg(F.min(ts_col).alias("t_1")))
    for d, step in enumerate(steps[1:], start=2):
        ev = df.where(F.col(type_col) == step) \
               .select(*keys, F.col(ts_col).alias("__ts"))
        cond = F.col("__ts") > F.col(f"t_{d - 1}")
        if window_ms is not None:
            cond = cond & (F.col("__ts") - F.col("t_1") <= window_ms)
        nxt = (ev.join(cur.select(*keys, "t_1", f"t_{d - 1}"), keys)
               .where(cond)
               .groupBy(*keys).agg(F.min("__ts").alias(f"t_{d}")))
        cur = cur.join(nxt.select(*keys, f"t_{d}"), keys, "left")
    depth = sum([F.when(F.col(f"t_{d}").isNotNull(), 1).otherwise(0)
                 for d in range(2, len(steps) + 1)], F.lit(1))
    return cur.select(*keys,
                      *[F.col(f"t_{d}") for d in range(1, len(steps) + 1)],
                      depth.cast("int").alias("depth"))


def funnel_summary(df: DataFrame, steps: Sequence[str],
                   key_cols: Sequence[str] = ("user_id",),
                   type_col: str = "event_type", ts_col: str = "ts",
                   window_ms: int | None = None) -> DataFrame:
    """Funnel roll-up: per step, how many keys reached it, conversion
    from step 1, and mean completion time (ms) from t_1 for keys that
    reached the step. One aggregation over funnel()'s per-key rows."""
    f = funnel(df, steps, key_cols, type_col, ts_col, window_ms)
    aggs = []
    for d in range(1, len(steps) + 1):
        aggs.append(F.sum(F.when(F.col("depth") >= d, 1).otherwise(0))
                    .cast("long").alias(f"_n{d}"))
        aggs.append(F.round(F.avg(F.when(
            F.col("depth") >= d, F.col(f"t_{d}") - F.col("t_1"))), 3)
            .alias(f"_m{d}"))
    one = f.agg(*aggs)        # ONE pass over the per-key funnel rows
    per_step = F.array(*[
        F.struct(F.lit(d).alias("step"),
                 F.lit(steps[d - 1]).alias("event_type"),
                 F.col(f"_n{d}").alias("n_reached"),
                 F.round(F.col(f"_n{d}") / F.col("_n1"), 6)
                 .alias("conversion"),
                 F.col(f"_m{d}").alias("mean_ms_from_start"))
        for d in range(1, len(steps) + 1)])
    return (one.select(F.explode(per_step).alias("s"))
            .select("s.step", "s.event_type", "s.n_reached",
                    "s.conversion", "s.mean_ms_from_start"))


def cohort_retention(df: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts",
                     period_ms: int = 7 * 24 * 3600 * 1000) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the period of their
    FIRST event (floor(first_ts / period)), and for each (cohort,
    periods-since-first) the distinct keys active in that period are
    counted — the standard weekly-retention triangle.

    Output: (cohort_period, period_offset, n_active, n_cohort,
    retention) with retention = n_active / n_cohort rounded to 6.

    Scale shape: one per-key min-aggregation, one equi-join back on the
    key, one distinct-count aggregation on (cohort, offset) — every
    shuffle keyed on the uniform key/cohort columns. offset 0 is 100%
    by construction (the first event is in its own period).
    """
    first = df.groupBy(key_col).agg(F.min(ts_col).alias("__first"))
    cohort = F.floor(F.col("__first") / period_ms).cast("long")
    joined = (df.select(key_col, F.col(ts_col).alias("__ts"))
              .join(first, key_col)
              .select(key_col, cohort.alias("cohort_period"),
                      (F.floor(F.col("__ts") / period_ms) - cohort)
                      .cast("long").alias("period_offset")))
    active = (joined.groupBy("cohort_period", "period_offset")
              .agg(F.count_distinct(key_col).alias("n_active")))
    sizes = (joined.where(F.col("period_offset") == 0)
             .groupBy("cohort_period")
             .agg(F.count_distinct(key_col).alias("n_cohort")))
    return (active.join(sizes, "cohort_period")
            .select("cohort_period", "period_offset", "n_active",
                    "n_cohort",
                    F.round(F.col("n_active") / F.col("n_cohort"), 6)
                    .alias("retention")))


def session_transitions(df: DataFrame, key_cols: Sequence[str],
                        type_col: str = "event_type", ts_col: str = "ts",
                        gap_ms: int = 30 * 60 * 1000,
                        tie_col: str | None = None) -> DataFrame:
    """Markov transition matrix over within-session event sequences:
    for each session (per sessionize()), count consecutive (from -> to)
    event-type pairs, then normalize per `from` — the journey/path
    report next to the funnel (funnels check ONE prescribed path; this
    surfaces what users actually do next).

    Determinism: events are ordered by (ts, type_col) within a session
    unless `tie_col` names a better tiebreak (an event id). Shape: the
    sessionize window + one lead() over the same window partitioning
    (no extra shuffle — both windows share the key partitioning), one
    (from, to) aggregation, one per-from total join. Output:
    (from_type, to_type, n, p) with p rounded to 6.
    """
    order = [F.col(ts_col), F.col(tie_col if tie_col else type_col)]
    s = sessionize(df, key_cols, ts_col, gap_ms)
    w = Window.partitionBy(*key_cols, "session_idx").orderBy(*order)
    nxt = (s.withColumn("__to", F.lead(type_col).over(w))
           .where(F.col("__to").isNotNull()))
    trans = (nxt.groupBy(F.col(type_col).alias("from_type"),
                         F.col("__to").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("__t"))
    return (trans.join(totals, "from_type")
            .select("from_type", "to_type", F.col("n").cast("long")
                    .alias("n"),
                    F.round(F.col("n") / F.col("__t"), 6).alias("p")))


def rfm_segments(df: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", type_col: str = "event_type",
                 value_col: str = "value",
                 monetary_type: str = "purchase",
                 recency_bounds_ms: tuple[int, int] = (
                     24 * 3600 * 1000, 7 * 24 * 3600 * 1000),
                 frequency_bounds: tuple[int, int] = (10, 50),
                 monetary_bounds: tuple[float, float] = (100.0, 1000.0),
                 ) -> DataFrame:
    """RFM segmentation: per key, Recency (ms since last event, against
    the corpus max ts), Frequency (event count) and Monetary (summed
    `value` of `monetary_type` events), each scored 1-3 against FIXED
    bounds (deterministic and engine-portable — production recalibrates
    bounds offline; data-dependent quantile cuts would make the segment
    of one user depend on every other user, which release pipelines
    avoid for reproducibility).

    One per-key aggregation + a broadcast of the 1-row corpus max ts.
    Output: (key, recency_ms, frequency, monetary, r, f, m, segment)
    with segment = 100*r + 10*f + m (the usual 'RFM cell' encoding).
    """
    per_key = df.groupBy(key_col).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum(F.when(F.col(type_col) == monetary_type,
                             F.col(value_col)).otherwise(0.0)), 6)
        .alias("monetary"))
    corpus_max = df.agg(F.max(ts_col).alias("_cmax"))
    rec = F.col("_cmax") - F.col("_last")
    lo_r, hi_r = recency_bounds_ms
    lo_f, hi_f = frequency_bounds
    lo_m, hi_m = monetary_bounds
    r = F.when(rec <= lo_r, 3).when(rec <= hi_r, 2).otherwise(1)
    f = F.when(F.col("frequency") >= hi_f, 3) \
         .when(F.col("frequency") >= lo_f, 2).otherwise(1)
    m = F.when(F.col("monetary") >= hi_m, 3) \
         .when(F.col("monetary") >= lo_m, 2).otherwise(1)
    return (per_key.crossJoin(F.broadcast(corpus_max))
            .select(key_col, rec.cast("long").alias("recency_ms"),
                    "frequency", "monetary",
                    r.cast("long").alias("r"), f.cast("long").alias("f"),
                    m.cast("long").alias("m"),
                    (r * 100 + f * 10 + m).cast("long").alias("segment")))


def rolling_features(df: DataFrame, key_cols: Sequence[str],
                     window_ms: int, ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """Trailing-window features per event: for every row, the count /
    sum / mean of the key's events in [ts - window_ms, ts] — the
    point-in-time-correct rolling features an ML feature store
    materializes (each row sees only its own past, so labels never
    leak future activity).

    Plan shape: ONE time-RANGE frame window (rangeBetween over the
    ordered ts, not a row frame) per key partition — a single shuffle
    on the key, no self-join, no grid explode; Spark maintains the
    sliding frame incrementally within each partition. Duplicate
    timestamps share a frame (RANGE semantics), making the result
    order-independent and engine-portable.

    Output: input keys + ts + value + (w_count, w_sum, w_mean) rounded.
    """
    w = (Window.partitionBy(*key_cols).orderBy(F.col(ts_col).cast("long"))
         .rangeBetween(-window_ms, 0))
    v = F.col(value_col)
    return df.select(
        *key_cols, ts_col, value_col,
        F.count(v).over(w).cast("long").alias("w_count"),
        F.round(F.sum(v).over(w), 6).alias("w_sum"),
        F.round(F.avg(v).over(w), 6).alias("w_mean"))


def rolling_anomalies(df: DataFrame, key_cols: Sequence[str],
                      window_ms: int, ts_col: str = "ts",
                      value_col: str = "value",
                      z_threshold: float = 3.0,
                      min_points: int = 5) -> DataFrame:
    """Trailing-window anomaly flags: each event z-scored against ITS
    OWN key's trailing [ts - window, ts) statistics — the PRIOR window,
    excluding the current instant, so an outlier cannot suppress its
    own detection. Events whose prior window has < min_points are
    unscored (NULL z, never flagged): cold-start discipline.

    Same single RangeFrame-window shape as rolling_features (one
    shuffle, no self-join); population stddev so two prior points
    already define a spread. Output: keys + ts + value + (mean, std, z
    rounded, is_anomaly).
    """
    w = (Window.partitionBy(*key_cols).orderBy(F.col(ts_col).cast("long"))
         .rangeBetween(-window_ms, -1))
    v = F.col(value_col)
    n = F.count(v).over(w)
    mean = F.avg(v).over(w)
    std = F.stddev_pop(v).over(w)
    z = F.when((n >= min_points) & (std > 0), (v - mean) / std)
    return df.select(
        *key_cols, ts_col, value_col,
        F.round(mean, 6).alias("w_mean"),
        F.round(std, 6).alias("w_std"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(F.round(z, 6)) >= z_threshold,
                   F.lit(False)).alias("is_anomaly"))


def gap_fill(df: DataFrame, series_cols: Sequence[str], start_ms: int,
             end_ms: int, step_ms: int, ts_col: str = "ts",
             value_col: str = "value",
             max_stale_ms: int | None = None) -> DataFrame:
    """Regularize each series onto the [start, end] step grid, forward-
    filling the last observed value (locf). max_stale_ms bounds how far
    a value carries (the PromQL staleness analog). Output: (series...,
    t, value) with value NULL where nothing carries."""
    grid = df.select(*series_cols).distinct().select(
        *series_cols,
        F.explode(F.sequence(F.lit(start_ms), F.lit(end_ms),
                             F.lit(step_ms))).alias("t"))
    samples = df.select(*series_cols, F.col(ts_col).alias("t"),
                        F.struct(F.col(ts_col).alias("__ts"),
                                 F.col(value_col).alias("__v")).alias("__p"),
                        F.lit(0).alias("__side"))
    g = grid.withColumn("__p", F.lit(None).cast(samples.schema["__p"]
                                                .dataType)) \
            .withColumn("__side", F.lit(1))
    u = g.unionByName(samples)
    w = (Window.partitionBy(*series_cols)
         .orderBy(F.col("t").asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.withColumn("__last", F.last("__p", ignorenulls=True).over(w))
    out = carried.where(F.col("__side") == 1)
    v = F.col("__last")["__v"]
    if max_stale_ms is not None:
        v = F.when(F.col("t") - F.col("__last")["__ts"] <= max_stale_ms, v)
    return out.select(*series_cols, "t", v.alias(value_col))
