"""Pre-aggregation producer: batch + streaming materialization of the
``<metric>:::<suffix>`` metrics that AggRule query routing consumes.

Reference: the hierarchical-aggregation pipeline
(query/util/HierarchicalQueryExperience.scala defines the rules; the
aggregated metrics themselves are produced by continuously publishing
rollups that drop the non-retained labels). The query side of this
engine has routed to preagg metrics since r5
(``PromQLEngine._maybe_preagg_rewrite``,
``TsStore(agg_rules=..., preagg_ready_until_ms=...)``) but assumed an
offline job had materialized them; this module is that producer, in
both shapes:

- :func:`build_preagg` — the batch job: one hash aggregation per
  (metric, rule) over the raw series, bucketed at ``resolution_ms``,
  emitting the sum metric plus the ``:count`` / ``:min`` / ``:max``
  companions the router's rewrites target.
- :func:`streaming_preagg` — the continuous twin (same pattern as
  ``streaming_downsample``): event-time window + watermark, append
  mode, row-equal to the batch job on closed windows. One streaming
  query per (metric, rule) — the reference's publishers are likewise
  one rule pipeline each, and it keeps checkpoints independent.
- :func:`preagg_ready_until` — derives the freshness watermark
  (``preagg_ready_until_ms``) from what the producer has actually
  published, closing the loop the r6 verdict flagged: the router's
  staleness guard now has a source of truth.

Output rows are ordinary (labels, ts, value) series — union them into
(or mount them beside) the raw store; ts is the bucket's last sample
timestamp (the downsampler's tTime convention) so bucket rows fall in
exactly the query windows that cover their samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import canonical_labels
from filodb_spark.kernels.grid import drop_nan

__all__ = ["build_preagg", "streaming_preagg", "preagg_ready_until"]

METRIC = "__name__"


def _retained_labels(rule):
    """Map of labels the rule retains (metric name always kept); the
    preagg metric aggregates away everything else."""
    labels = F.col("labels")
    if rule.include is not None:
        keep = [METRIC, *sorted(rule.include)]
        return F.map_filter(labels, lambda k, _: k.isin(*keep))
    dropped = sorted(rule.exclude)
    if not dropped:
        return labels
    return F.map_filter(labels, lambda k, _: ~k.isin(*dropped))


def _variants(metric: str, rule):
    """(value column, metric name) for the four published columns —
    the names _maybe_preagg_rewrite targets (sum rides the bare
    suffix; count/min/max ride `:count`/`:min`/`:max`)."""
    from filodb_spark.promql.compiler import preagg_metric_name
    return [(c, preagg_metric_name(metric, rule.suffix + ext))
            for c, ext in (("sum", ""), ("count", ":count"),
                           ("min", ":min"), ("max", ":max"))]


def _explode_variants(agg: DataFrame, metric: str, rule) -> DataFrame:
    """Post-aggregation projection: one output series row per published
    column. Map-only (streaming-safe after the stateful agg)."""
    pairs = F.array(*[
        F.struct(F.lit(name).alias("m"), F.col(c).cast("double").alias("v"))
        for c, name in _variants(metric, rule)])
    ex = agg.select("_plab", "ts", F.explode(pairs).alias("_mv"))
    relabeled = F.map_concat(
        F.map_filter(F.col("_plab"), lambda k, _: k != METRIC),
        F.create_map(F.lit(METRIC), F.col("_mv")["m"]))
    return ex.select(relabeled.alias("labels"), "ts",
                     F.col("_mv")["v"].alias("value"))


def build_preagg(df: DataFrame, agg_rules: dict, resolution_ms: int) -> DataFrame:
    """Batch producer: materialize every (metric, rule) of `agg_rules`
    (the same dict TsStore mounts) from the raw (labels, ts, value)
    frame. One hash aggregation per pair; all pairs unioned into one
    (labels, ts, value) result ready to write beside the raw table."""
    out = None
    for metric, rules in agg_rules.items():
        for rule in rules:
            part = _build_one(df, metric, rule, resolution_ms)
            out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("agg_rules is empty")
    return out


def _build_one(df: DataFrame, metric: str, rule,
               resolution_ms: int) -> DataFrame:
    base = drop_nan(df.where(F.col("labels")[METRIC] == metric))
    keyed = base.withColumn("_plab", _retained_labels(rule)) \
                .withColumn("_pk", canonical_labels(F.col("_plab")))
    bucket = F.col("ts") - F.pmod(F.col("ts"), F.lit(resolution_ms))
    agg = (keyed.groupBy("_pk", bucket.alias("_bucket"))
           .agg(F.max("ts").alias("ts"),
                F.sum("value").alias("sum"),
                F.count("value").cast("double").alias("count"),
                F.min("value").alias("min"), F.max("value").alias("max"),
                F.first("_plab").alias("_plab")))
    return _explode_variants(agg, metric, rule)


def streaming_preagg(stream: DataFrame, metric: str, rule,
                     resolution_ms: int,
                     watermark_delay: str = "10 minutes") -> DataFrame:
    """Continuous producer for ONE (metric, rule): the batch job's
    aggregate set over event-time windows (append mode — a bucket
    publishes once the watermark passes; late data beyond the delay is
    dropped, where the batch job instead republishes on its next run).
    Row-equal to build_preagg on closed windows by construction: same
    bucket key (the window start IS ts - ts % resolution), same
    aggregates, same tTime row timestamp, same label relabeling."""
    if not stream.isStreaming:
        raise ValueError("streaming_preagg expects a streaming DataFrame; "
                         "use build_preagg for batch input")
    base = drop_nan(stream.where(F.col("labels")[METRIC] == metric))
    ev = (base.withColumn("_plab", _retained_labels(rule))
              .withColumn("_pk", canonical_labels(F.col("_plab")))
              .withColumn("_event_time", F.timestamp_millis(F.col("ts"))))
    win = F.window("_event_time", f"{resolution_ms} milliseconds")
    agg = (ev.withWatermark("_event_time", watermark_delay)
           .groupBy("_pk", win.alias("_w"))
           .agg(F.max("ts").alias("ts"),
                F.sum("value").alias("sum"),
                F.count("value").cast("double").alias("count"),
                F.min("value").alias("min"), F.max("value").alias("max"),
                F.first("_plab").alias("_plab")))
    return _explode_variants(agg, metric, rule)


def preagg_ready_until(preagg_df: DataFrame, resolution_ms: int) -> int | None:
    """Freshness watermark for ``TsStore(preagg_ready_until_ms=...)``:
    the end of the latest published bucket — queries whose grid reaches
    past it must read raw (the router's aggDelay guard). None when
    nothing is published yet (mount as 0 / leave routing off)."""
    top = preagg_df.agg(F.max("ts").alias("m")).first()["m"]
    if top is None:
        return None
    return int(top - top % resolution_ms + resolution_ms)
