"""Driver queries exercising the FULL PromQL path: query string ->
parser -> compiler -> DataFrame, over the events store (metric =
event_type, label user = user_id). Each has an exact DuckDB oracle.

Series here are (metric, user) pairs — higher cardinality than the
kernel-level ts_* queries, and results flow through the engine's
labels-map machinery (canonical keys, join rules, grouping).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.driver_queries.promql_events import STEP, WINDOW
from filodb_spark.kernels.grid import grid_from_bounds
from filodb_spark.promql import PromQLEngine
from filodb_spark.promql.compiler import TsStore
from filodb_spark.tsdf import events_labels_ts

DAY = 24 * 3600 * 1000


def _engine(spark, sf_dir, lookback=DAY - 1):
    from filodb_spark.driver_queries.promql_events import _bounds
    df = events_labels_ts(spark, sf_dir)
    lo, hi = _bounds(spark, sf_dir)
    return PromQLEngine(spark, TsStore(df), lookback_ms=lookback), \
        grid_from_bounds(lo, hi, STEP), grid_from_bounds(lo, hi, DAY)


def _run(spark, sf_dir, promql, grid_sel="step"):
    eng, g6, g24 = _engine(spark, sf_dir)
    g = g6 if grid_sel == "step" else g24
    return eng.query_range(promql, g.start, g.end, g.step)


def pq_sum_rate(spark, sf_dir):
    out = _run(spark, sf_dir, "sum(rate(purchase[24h]))")
    return (out.where(~F.isnan("value"))
            .select("t", F.round("value", 6).alias("value")))


def pq_count_by_metric(spark, sf_dir):
    out = _run(spark, sf_dir,
               'sum by (__name__) (count_over_time({user=~".+"}[24h]))')
    return out.select(F.col("labels")["__name__"].alias("event_type"),
                      "t", "value")


def pq_binary_user_ratio(spark, sf_dir):
    q = ("count_over_time(purchase[24h]) / on (user) "
         "count_over_time(error[24h])")
    out = _run(spark, sf_dir, q, grid_sel="day")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", F.round("value", 6).alias("value"))


def pq_set_unless(spark, sf_dir):
    q = ("count_over_time(purchase[24h]) unless on (user) "
         "count_over_time(error[24h])")
    out = _run(spark, sf_dir, q, grid_sel="day")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_set_and(spark, sf_dir):
    # `and on(user)` through the engine's set_op kernel
    # (SetOperatorExec.scala:104-196 semantics; kernel pinned by
    # tests/test_set_operator_spec.py, gated here on real data)
    q = ("count_over_time(purchase[24h]) and on (user) "
         "count_over_time(error[24h])")
    out = _run(spark, sf_dir, q, grid_sel="day")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_set_or(spark, sf_dir):
    # `or on(user)`: all purchase rows plus error rows at (user, t) holes
    # (SetOperatorExec.scala:200-300). Both sides keep their own labels;
    # the projection to (user_id, t) makes the result oracle-comparable.
    q = ("count_over_time(purchase[24h]) or on (user) "
         "count_over_time(error[24h])")
    out = _run(spark, sf_dir, q, grid_sel="day")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_quantile_last(spark, sf_dir):
    out = _run(spark, sf_dir, "quantile(0.5, {__name__=~\".+\"})")
    return (out.where(~F.isnan("value"))
            .select("t", F.round("value", 6).alias("value")))


def pq_label_join(spark, sf_dir):
    out = _run(spark, sf_dir,
               'label_join(last_over_time(purchase[24h]), "uid", ":", '
               '"__name__", "user")')
    return out.select(F.col("labels")["uid"].alias("uid"), "t", "value")


def pq_subquery(spark, sf_dir):
    # fn(expr[w:s]) through the engine's subquery machinery
    q = "max_over_time(count_over_time(purchase[24h])[24h:6h])"
    out = _run(spark, sf_dir, q)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_offset(spark, sf_dir):
    # offset modifier through the engine: windows shift back a day
    out = _run(spark, sf_dir, "count_over_time(purchase[24h] offset 24h)")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_at_modifier(spark, sf_dir):
    # @ modifier: evaluate at one fixed instant, replicate across steps
    eng, g6, _ = _engine(spark, sf_dir)
    at_s = (g6.start + 5 * STEP) / 1000.0
    out = eng.query_range(f"count_over_time(purchase[24h] @ {at_s})",
                          g6.start, g6.end, g6.step)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_instant_chain(spark, sf_dir):
    # chained instant math through the engine
    q = "clamp(round(sqrt(count_over_time(purchase[24h])) * 10), 5, 40)"
    out = _run(spark, sf_dir, q)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", F.round("value", 6).alias("value"))


def pq_label_replace(spark, sf_dir):
    # regex capture-group label rewrite through the engine
    q = ('label_replace(count_over_time(purchase[24h]), '
         '"user_bucket", "b$1", "user", "(\\\\d)\\\\d*")')
    out = _run(spark, sf_dir, q)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      F.col("labels")["user_bucket"].alias("user_bucket"),
                      "t", "value")


def pq_topk(spark, sf_dir):
    out = _run(spark, sf_dir, "topk(3, count_over_time(purchase[24h]))")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_absent(spark, sf_dir):
    out = _run(spark, sf_dir, 'absent(nosuchmetric{user="42"})')
    return out.select(F.col("labels")["user"].alias("user"), "t", "value")


def pq_trig(spark, sf_dir):
    """Prometheus 2.31+ trig dialect through the full engine path:
    tanh(sinh(rad(cnt))) * pi() chains four new instant functions plus
    the pi() scalar generator and a scalar-vector multiply."""
    q = "tanh(sinh(rad(count_over_time(purchase[24h])))) * pi()"
    out = _run(spark, sf_dir, q)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", F.round("value", 6).alias("value"))


def pq_bool_compare(spark, sf_dir):
    # scalar comparison with bool modifier: 1/0 per series per step
    out = _run(spark, sf_dir, "count_over_time(purchase[24h]) > bool 5")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_prefix_compare(spark, sf_dir):
    """Prefix-scalar filter comparison: '5 > v' keeps matching series
    with the SCALAR as the emitted value (ScalarOperationMapper emits the
    LHS operand, BinaryOperatorSpec.scala:184-205)."""
    out = _run(spark, sf_dir, "5 > count_over_time(purchase[24h])")
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


def pq_label_replace_groups(spark, sf_dir):
    """label_replace with multiple capture groups AND a nonexistent group
    reference: '$9' is stripped to empty instead of erroring
    (MiscellaneousFunction.scala:57-63 sequential substitution +
    $ref sweep)."""
    q = ('label_replace(count_over_time(purchase[24h]), '
         '"tag", "$1-u$2 $9", "user", "(.)(.*)")')
    out = _run(spark, sf_dir, q)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      F.col("labels")["tag"].alias("tag"),
                      "t", "value")


def pq_hist_scale_quantile(spark, sf_dir):
    """Bucket-wise scalar math on a histogram vector: scaling every
    bucket count by 2 leaves histogram_quantile bit-identical (the
    rank/cumulative ratios cancel exactly in binary FP), so the unscaled
    quantile oracle pins the scaled plan."""
    from filodb_spark.driver_queries.histogram_queries import Q
    eng, g = _hist_struct_engine(spark, sf_dir)
    out = eng.query_range(
        f"histogram_quantile({Q}, sum_over_time(ev_hist[24h]) * 2)",
        g.start, g.end, g.step)
    return (out.where(~F.isnan("value"))
            .select(F.col("labels")["etype"].alias("event_type"), "t",
                    F.round("value", 6).alias("value")))


def pq_hist_bucket_quantile(spark, sf_dir):
    """histogram_quantile over Prometheus-style `_bucket` series with an
    `le` label (HistogramQuantileMapper path), end-to-end through the
    engine. Bucket series are indicator gauges built from events: sample
    value 1.0 when the event value <= le, so sum_over_time[24h] yields
    the cumulative bucket count the oracle recomputes directly."""
    from filodb_spark.driver_queries.histogram_queries import LES, Q
    from filodb_spark.driver_queries.promql_events import _bounds, _events_cached
    ev = _events_cached(spark, sf_dir)
    bounds = [*LES, float("inf")]
    pairs = F.array(*[
        F.struct(F.lit("+Inf" if b == float("inf") else str(b)).alias("le"),
                 (F.col("value") <= F.lit(b)).cast("double").alias("ind"))
        for b in bounds])
    bdf = (ev.select("event_type", "ts", F.explode(pairs).alias("p"))
             .select(F.create_map(
                         F.lit("__name__"), F.lit("ev_bucket"),
                         F.lit("etype"), F.col("event_type"),
                         F.lit("le"), F.col("p.le")).alias("labels"),
                     "ts", F.col("p.ind").alias("value")))
    lo, hi = _bounds(spark, sf_dir)
    g = grid_from_bounds(lo, hi, STEP)
    eng = PromQLEngine(spark, TsStore(bdf))
    out = eng.query_range(
        f"histogram_quantile({Q}, sum_over_time(ev_bucket[24h]))",
        g.start, g.end, g.step)
    return (out.where(~F.isnan("value"))
            .select(F.col("labels")["etype"].alias("event_type"), "t",
                    F.round("value", 6).alias("value")))


def pq_hist_struct_quantile(spark, sf_dir):
    """histogram-SCHEMA metric end-to-end: struct-hist store ->
    hist range function (bucket-explode -> scalar kernel -> reassemble,
    the extrapolatedRateH shape) -> struct histogram_quantile. Each
    sample's hist is the one-observation cumulative histogram of its
    value, so sum_over_time[24h] rebuilds the window histogram and the
    quantile equals ts_hist_quantile's (shared exact oracle)."""
    from filodb_spark.driver_queries.histogram_queries import Q
    eng, g = _hist_struct_engine(spark, sf_dir)
    out = eng.query_range(
        f"histogram_quantile({Q}, sum_over_time(ev_hist[24h]))",
        g.start, g.end, g.step)
    return (out.where(~F.isnan("value"))
            .select(F.col("labels")["etype"].alias("event_type"), "t",
                    F.round("value", 6).alias("value")))


def _hist_struct_engine(spark, sf_dir):
    """Shared struct-hist store + engine for the pq_hist_* queries."""
    from filodb_spark.driver_queries.histogram_queries import LES
    from filodb_spark.driver_queries.promql_events import _bounds, _events_cached
    from filodb_spark.kernels.histogram import hist_struct
    ev = _events_cached(spark, sf_dir)
    bounds = [*LES, float("inf")]
    les_col = F.array(*[F.lit(float(b)) for b in bounds])
    vals_col = F.array(*[(F.col("value") <= F.lit(b)).cast("double")
                         for b in bounds])
    hist_df = ev.select(
        F.create_map(F.lit("__name__"), F.lit("ev_hist"),
                     F.lit("etype"), F.col("event_type")).alias("labels"),
        "ts", F.col("value").alias("sum"), F.lit(1.0).alias("count"),
        hist_struct(les_col, vals_col).alias("hist"))
    gauge = spark.createDataFrame(
        [], "labels map<string,string>, ts long, value double")
    lo, hi = _bounds(spark, sf_dir)
    g = grid_from_bounds(lo, hi, STEP)
    eng = PromQLEngine(spark, TsStore(gauge, hist_df=hist_df,
                                      hist_metrics=("ev_hist",)))
    return eng, g


def pq_hist_fraction(spark, sf_dir):
    # histogram_fraction over the struct schema through the engine;
    # lo/hi on bucket bounds -> exact cumulative-count ratio oracle
    from filodb_spark.driver_queries.histogram_queries import FRAC_HI, FRAC_LO
    eng, g = _hist_struct_engine(spark, sf_dir)
    out = eng.query_range(
        f"histogram_fraction({FRAC_LO}, {FRAC_HI}, sum_over_time(ev_hist[24h]))",
        g.start, g.end, g.step)
    return (out.where(~F.isnan("value"))
            .select(F.col("labels")["etype"].alias("event_type"), "t",
                    F.round("value", 9).alias("value")))


def pq_hist_to_prom(spark, sf_dir):
    # hist_to_prom_vectors: struct histogram exploded to one series per
    # bucket with an `le` label (HistToPromSeriesMapper)
    eng, g = _hist_struct_engine(spark, sf_dir)
    out = eng.query_range(
        "hist_to_prom_vectors(sum_over_time(ev_hist[24h]))",
        g.start, g.end, g.step)
    return (out.where(~F.isnan("value"))
            .select(F.col("labels")["etype"].alias("event_type"),
                    F.col("labels")["le"].alias("le"), "t", "value"))


def pq_preagg_route(spark, sf_dir):
    """Pre-aggregation routing rule end-to-end (AggLpOptimization analog):
    the store materializes ONLY the preagg table `ev:::byday` (per-type
    sums of the deduped events); the conceptual raw metric `ev` has no
    data. The result is non-empty iff `sum by (etype)(sum_over_time(
    ev[24h]))` is rewritten onto the preagg metric — the row-count match
    against the oracle proves the optimizer fired."""
    from filodb_spark.promql.compiler import AggRule
    from filodb_spark.driver_queries.promql_events import _bounds, _events_cached
    ev = _events_cached(spark, sf_dir, ("event_type", "user_id"))
    pre = (ev.where(~F.isnan("value"))
             .groupBy("event_type", "ts").agg(F.sum("value").alias("value"))
             .select(F.create_map(
                         F.lit("__name__"), F.lit("ev:::byday"),
                         F.lit("etype"), F.col("event_type")).alias("labels"),
                     "ts", "value"))
    lo, hi = _bounds(spark, sf_dir)
    g = grid_from_bounds(lo, hi, STEP)
    store = TsStore(pre, agg_rules={
        "ev": (AggRule("byday", include=frozenset({"etype"})),)})
    eng = PromQLEngine(spark, store)
    out = eng.query_range("sum by (etype) (sum_over_time(ev[24h]))",
                          g.start, g.end, g.step)
    return (out.where(~F.isnan("value"))
            .select(F.col("labels")["etype"].alias("event_type"), "t",
                    F.round("value", 6).alias("value")))


def pq_scalar_vector(spark, sf_dir):
    # ScalarFunctionMapper + VectorFunctionMapper chained through the
    # engine: collapse a 1-series vector to a scalar, re-vectorize
    out = _run(spark, sf_dir,
               "vector(scalar(sum(count_over_time(purchase[24h]))))")
    return out.select("t", "value")


def pq_raw_matrix(spark, sf_dir):
    # instant query with a top-level range selector: raw samples in the
    # trailing window (t = sample timestamp, not a step instant)
    eng, g6, _ = _engine(spark, sf_dir)
    out = eng.query_instant("purchase[7d]", g6.end)
    return out.select(F.col("labels")["user"].cast("long").alias("user_id"),
                      "t", "value")


QUERIES = {
    # Order matters: the driver's correctness gate covers the first 50
    # registered queries overall; entries already driver-verified in a past
    # round (pq_raw_matrix, pq_bool_compare in CORRECTNESS_r01) sort last so
    # never-gated ones rotate into the window first.
    "pq_scalar_vector": pq_scalar_vector,
    "pq_hist_bucket_quantile": pq_hist_bucket_quantile,
    "pq_hist_struct_quantile": pq_hist_struct_quantile,
    "pq_hist_fraction": pq_hist_fraction,
    "pq_hist_to_prom": pq_hist_to_prom,
    "pq_preagg_route": pq_preagg_route,
    "pq_sum_rate": pq_sum_rate,
    "pq_label_replace": pq_label_replace,
    "pq_topk": pq_topk,
    "pq_absent": pq_absent,
    "pq_subquery": pq_subquery,
    "pq_offset": pq_offset,
    "pq_at_modifier": pq_at_modifier,
    "pq_instant_chain": pq_instant_chain,
    "pq_count_by_metric": pq_count_by_metric,
    "pq_binary_user_ratio": pq_binary_user_ratio,
    "pq_set_unless": pq_set_unless,
    "pq_set_and": pq_set_and,
    "pq_set_or": pq_set_or,
    "pq_quantile_last": pq_quantile_last,
    "pq_label_join": pq_label_join,
    "pq_raw_matrix": pq_raw_matrix,
    "pq_bool_compare": pq_bool_compare,
    "pq_trig": pq_trig,
    # round-7 additions (spec-parity fixes) — never gated, r8 window heads
    "pq_prefix_compare": pq_prefix_compare,
    "pq_label_replace_groups": pq_label_replace_groups,
    "pq_hist_scale_quantile": pq_hist_scale_quantile,
}

# --- oracles ---------------------------------------------------------------

# per-(metric,user) series on the 6h grid
_BASE_MU = f"""
WITH raw AS (
  SELECT event_type, user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2, 3
),
bounds AS (
  SELECT CAST(ceil((SELECT MIN(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gstart,
         CAST(floor((SELECT MAX(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gend
),
grid AS (
  SELECT unnest(generate_series((SELECT gstart FROM bounds),
                                (SELECT gend FROM bounds), {STEP})) AS t
),
s AS (
  SELECT event_type, user_id, ts, value,
         coalesce(lag(ts) OVER (PARTITION BY event_type, user_id ORDER BY ts),
                  -4611686018427387904) AS prev_ts,
         coalesce(lag(value) OVER (PARTITION BY event_type, user_id ORDER BY ts),
                  0.0) AS prev_value
  FROM raw
),
w AS (
  SELECT s.*, grid.t
  FROM grid JOIN s ON s.ts BETWEEN grid.t - {WINDOW} AND grid.t
)
"""

_DAILY_MU = """
WITH bounds AS (
  SELECT CAST(ceil((SELECT MIN(epoch_ms(ts)) FROM events) / 86400000.0) AS BIGINT) * 86400000 AS gstart,
         CAST(floor((SELECT MAX(epoch_ms(ts)) FROM events) / 86400000.0) AS BIGINT) * 86400000 AS gend
),
grid AS (
  SELECT unnest(generate_series((SELECT gstart FROM bounds),
                                (SELECT gend FROM bounds), 86400000)) AS t
),
raw AS (
  SELECT event_type, user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2, 3
),
cnt AS (
  SELECT raw.event_type, raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
  GROUP BY 1, 2, 3
)
"""

_PURCHASE_GRID = f"""
WITH bounds AS (
  SELECT CAST(ceil((SELECT MIN(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gstart,
         CAST(floor((SELECT MAX(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gend
),
grid AS (
  SELECT unnest(generate_series((SELECT gstart FROM bounds),
                                (SELECT gend FROM bounds), {STEP})) AS t
),
raw AS (
  SELECT user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
"""

ORACLES = {
    "pq_trig": _PURCHASE_GRID + """
, cnt AS (
  SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
  GROUP BY 1, 2
),
sh AS (
  SELECT user_id, t,
         (exp(radians(value)) - exp(-radians(value))) / 2 AS s
  FROM cnt
)
SELECT user_id, t,
       round(((exp(2 * s) - 1) / (exp(2 * s) + 1)) * pi(), 6) AS value
FROM sh""",
    "pq_bool_compare": _PURCHASE_GRID + """
, cnt AS (
  SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
  GROUP BY 1, 2
)
SELECT user_id, t,
       CASE WHEN value > 5 THEN 1.0 ELSE 0.0 END AS value FROM cnt""",
    "pq_scalar_vector": _PURCHASE_GRID + """
SELECT grid.t, CAST(count(*) AS DOUBLE) AS value
FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
GROUP BY grid.t""",
    "pq_preagg_route": f"""
WITH raw AS (
  SELECT event_type, user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2, 3
),
pre AS (
  SELECT event_type, ts, sum(value) AS value FROM raw GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(ceil((SELECT MIN(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gstart,
         CAST(floor((SELECT MAX(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gend
),
grid AS (
  SELECT unnest(generate_series((SELECT gstart FROM bounds),
                                (SELECT gend FROM bounds), {STEP})) AS t
)
SELECT pre.event_type, grid.t, round(sum(pre.value), 6) AS value
FROM grid JOIN pre ON pre.ts BETWEEN grid.t - 86400000 AND grid.t
GROUP BY 1, 2""",
    "pq_raw_matrix": _PURCHASE_GRID + f"""
SELECT raw.user_id, raw.ts AS t, raw.value
FROM raw, bounds
WHERE raw.ts BETWEEN bounds.gend - {7 * DAY} AND bounds.gend
  AND NOT isnan(raw.value)""",
    "pq_label_replace": _PURCHASE_GRID + r"""
SELECT raw.user_id, 'b' || regexp_extract(CAST(raw.user_id AS VARCHAR),
                                          '^(\d)\d*$', 1) AS user_bucket,
       grid.t, CAST(count(*) AS DOUBLE) AS value
FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
GROUP BY 1, 2, 3""",
    "pq_topk": _PURCHASE_GRID + """
, cnt AS (
  SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
  GROUP BY 1, 2
),
rk AS (
  SELECT user_id, t, value,
         row_number() OVER (PARTITION BY t
                            ORDER BY value DESC,
                                     CAST(user_id AS VARCHAR)) AS r
  FROM cnt
)
SELECT user_id, t, value FROM rk WHERE r <= 3""",
    "pq_absent": _PURCHASE_GRID + """
SELECT '42' AS user, grid.t, 1.0 AS value FROM grid""",
    "pq_offset": _PURCHASE_GRID + f"""
SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
FROM grid JOIN raw
  ON raw.ts BETWEEN grid.t - {2 * DAY} AND grid.t - {DAY}
GROUP BY 1, 2""",
    "pq_at_modifier": _PURCHASE_GRID + f"""
, a AS (SELECT gstart + 5 * {STEP} AS at_ms FROM bounds),
c AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS value
  FROM raw, a WHERE raw.ts BETWEEN a.at_ms - {DAY} AND a.at_ms
  GROUP BY 1
)
SELECT c.user_id, grid.t, c.value FROM grid CROSS JOIN c""",
    "pq_instant_chain": _PURCHASE_GRID + f"""
, cnt AS (
  SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - {DAY} AND grid.t
  GROUP BY 1, 2
)
SELECT user_id, t,
       round(least(greatest(floor(sqrt(value) * 10.0 + 0.5), 5.0), 40.0), 6)
       AS value
FROM cnt""",
    "pq_subquery": f"""
WITH bounds AS (
  SELECT CAST(ceil((SELECT MIN(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gstart,
         CAST(floor((SELECT MAX(epoch_ms(ts)) FROM events) / {STEP}.0) AS BIGINT) * {STEP} AS gend
),
igrid AS (
  SELECT unnest(generate_series((SELECT gstart - 86400000 FROM bounds),
                                (SELECT gend FROM bounds), {STEP})) AS it
),
raw AS (
  SELECT user_id, epoch_ms(ts) AS ts, max(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
inner_cnt AS (
  SELECT raw.user_id, igrid.it, CAST(count(*) AS DOUBLE) AS value
  FROM igrid JOIN raw ON raw.ts BETWEEN igrid.it - 86400000 AND igrid.it
  GROUP BY 1, 2
),
ogrid AS (
  SELECT unnest(generate_series((SELECT gstart FROM bounds),
                                (SELECT gend FROM bounds), {STEP})) AS t
)
SELECT i.user_id, g.t, max(i.value) AS value
FROM ogrid g JOIN inner_cnt i ON i.it BETWEEN g.t - 86400000 AND g.t
GROUP BY 1, 2""",
    "pq_sum_rate": _BASE_MU.replace("FROM events GROUP BY 1, 2, 3",
                                    "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3") + f""",
a AS (
  SELECT event_type, user_id, t, count(*) AS cnt,
         min(ts) AS first_ts, max(ts) AS last_ts,
         arg_min(value, ts) AS first_val, arg_max(value, ts) AS last_val,
         sum(CASE WHEN prev_ts >= t - {WINDOW} AND value < prev_value
                  THEN prev_value ELSE 0.0 END) AS corr
  FROM w GROUP BY 1, 2, 3
),
c1 AS (
  SELECT event_type, user_id, t, cnt, first_val,
         (last_ts - first_ts) / 1000.0 AS si,
         (first_ts - (t - {WINDOW})) / 1000.0 AS dts0,
         (t - last_ts) / 1000.0 AS dte,
         last_val - first_val + corr AS delta
  FROM a WHERE cnt >= 2 AND last_ts > first_ts
),
c2 AS (
  SELECT *, si / (cnt - 1.0) AS ad,
         CASE WHEN delta > 0 AND first_val >= 0 AND si * (first_val / delta) < dts0
              THEN si * (first_val / delta) ELSE dts0 END AS dts
  FROM c1
),
c3 AS (
  SELECT event_type, user_id, t, delta, si,
         si + (CASE WHEN dts < ad * 1.1 THEN dts ELSE ad / 2.0 END)
            + (CASE WHEN dte < ad * 1.1 THEN dte ELSE ad / 2.0 END) AS ext
  FROM c2
)
SELECT t, round(sum(delta * (ext / si) / {WINDOW / 1000.0}), 6) AS value
FROM c3 GROUP BY t""",
    "pq_count_by_metric": _BASE_MU + """
SELECT event_type, t, sum(cnt_series) AS value FROM (
  SELECT event_type, user_id, t, CAST(count(*) AS DOUBLE) AS cnt_series
  FROM w GROUP BY 1, 2, 3
) GROUP BY event_type, t""",
    "pq_binary_user_ratio": _DAILY_MU + """
SELECT p.user_id, p.t, round(p.value / e.value, 6) AS value
FROM (SELECT * FROM cnt WHERE event_type = 'purchase') p
JOIN (SELECT * FROM cnt WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND p.t = e.t""",
    "pq_set_unless": _DAILY_MU + """
SELECT p.user_id, p.t, p.value
FROM (SELECT * FROM cnt WHERE event_type = 'purchase') p
WHERE NOT EXISTS (SELECT 1 FROM cnt e WHERE e.event_type = 'error'
                  AND e.user_id = p.user_id AND e.t = p.t)""",
    "pq_set_and": _DAILY_MU + """
SELECT p.user_id, p.t, p.value
FROM (SELECT * FROM cnt WHERE event_type = 'purchase') p
WHERE EXISTS (SELECT 1 FROM cnt e WHERE e.event_type = 'error'
              AND e.user_id = p.user_id AND e.t = p.t)""",
    "pq_set_or": _DAILY_MU + """
SELECT p.user_id, p.t, p.value
FROM (SELECT * FROM cnt WHERE event_type = 'purchase') p
UNION ALL
SELECT e.user_id, e.t, e.value
FROM (SELECT * FROM cnt WHERE event_type = 'error') e
WHERE NOT EXISTS (SELECT 1 FROM cnt p WHERE p.event_type = 'purchase'
                  AND p.user_id = e.user_id AND p.t = e.t)""",
    "pq_quantile_last": _BASE_MU + """,
last AS (
  SELECT event_type, user_id, t, arg_max(value, ts) AS value
  FROM w GROUP BY 1, 2, 3
)
SELECT t, round(quantile_cont(value, 0.5), 6) AS value FROM last GROUP BY t""",
    "pq_label_join": _BASE_MU.replace("FROM events GROUP BY 1, 2, 3",
                                      "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2, 3") + """
SELECT event_type || ':' || CAST(user_id AS VARCHAR) AS uid, t,
       arg_max(value, ts) AS value
FROM w GROUP BY event_type, user_id, t""",
}

# the engine's bucket-series quantile path must agree exactly with the
# struct-histogram path (asserted in test_promql_hist); the oracle is
# therefore shared with ts_hist_quantile (same LES, same Q)
from filodb_spark.driver_queries.histogram_queries import ORACLES as _HIST_ORACLES  # noqa: E402

ORACLES["pq_hist_bucket_quantile"] = _HIST_ORACLES["ts_hist_quantile"]
ORACLES["pq_hist_struct_quantile"] = _HIST_ORACLES["ts_hist_quantile"]
ORACLES["pq_hist_fraction"] = _HIST_ORACLES["ts_hist_fraction"]
# bucket-wise * 2 cancels exactly in the quantile interpolation ratios,
# so the scaled plan shares the unscaled oracle bit-for-bit
ORACLES["pq_hist_scale_quantile"] = _HIST_ORACLES["ts_hist_quantile"]

ORACLES["pq_prefix_compare"] = _PURCHASE_GRID + """
, cnt AS (
  SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
  GROUP BY 1, 2
)
SELECT user_id, t, 5.0 AS value FROM cnt WHERE 5 > value"""

ORACLES["pq_label_replace_groups"] = _PURCHASE_GRID + """
, cnt AS (
  SELECT raw.user_id, grid.t, CAST(count(*) AS DOUBLE) AS value
  FROM grid JOIN raw ON raw.ts BETWEEN grid.t - 86400000 AND grid.t
  GROUP BY 1, 2
)
SELECT user_id,
       substr(CAST(user_id AS VARCHAR), 1, 1) || '-u' ||
       substr(CAST(user_id AS VARCHAR), 2) || ' ' AS tag,
       t, value FROM cnt"""


def _hist_to_prom_oracle() -> str:
    from filodb_spark.driver_queries.histogram_queries import LES
    from filodb_spark.driver_queries.promql_events import _base
    vals = ", ".join(f"({b}, '{int(b)}')" for b in LES) + ", (NULL, '+Inf')"
    return _base(STEP, WINDOW) + f""",
les AS (SELECT * FROM (VALUES {vals}) AS v(le_num, le_str))
SELECT w.sk AS event_type, les.le_str AS le, w.t,
       CAST(sum(CASE WHEN les.le_num IS NULL OR w.value <= les.le_num
                     THEN 1 ELSE 0 END) AS DOUBLE) AS value
FROM w CROSS JOIN les GROUP BY 1, 2, 3"""


ORACLES["pq_hist_to_prom"] = _hist_to_prom_oracle()
