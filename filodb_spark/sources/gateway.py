"""Gateway input-record conversion — remote-write series to typed
ingest records.

Reference: gateway/src/main/scala/filodb/gateway/conversion/
InputRecord.scala and the PrometheusInputRecord object (:653-799):

- `PrometheusInputRecord(tsProto)` extracts the metric from the first
  `__name__`/`_metric_` label, DROPS series with no metric label, and
  applies DatasetOptions.copyTags to the remaining tags (:762-799).
- copyTags (filodb-defaults.conf:186-195): `_ns_ = ["_ns", "exporter",
  "job"]` — when the destination tag is missing, it is created from
  the FIRST present source tag, honoring the configured order.
- `InputRecord.writePromHistRecord` (:92-133) assembles bucket
  key/values plus `sum`/`count` into one prom-histogram record:
  buckets sorted ascending by top (`+Inf` -> +infinity), bucket values
  read as LONG counts (LongHistogram), and EMPTY bucket sets write no
  record (InputRecordBuilderSpec.scala:127-143) — subsequent records
  still land.

The Spark analog assembles `<m>_bucket{le=..}` / `<m>_sum` /
`<m>_count` remote-write series into histogram-table rows (labels, ts,
sum, count, hist) — one hash aggregation keyed by (series-key, ts), so
at scale the assembly is a single shuffle of the bucket rows, no
Python in the loop. The reference's shardKeyHash routing is Spark
partitioning here (write_series_table's shard-key layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import canonical_labels

METRIC = "__name__"

# DatasetOptions.copyTags default (filodb-defaults.conf:192-194):
# destination -> source tags in priority order
COPY_TAGS = {"_ns_": ("_ns", "exporter", "job")}


def transform_tags(labels, copy_tags: dict | None = None):
    """Column expression: apply copyTags to a labels map — each missing
    destination tag is created from its first present source tag
    (PrometheusInputRecord.transformTags, InputRecord.scala:782-799)."""
    out = labels
    for dest, sources in (copy_tags or COPY_TAGS).items():
        src = F.coalesce(*[out[s] for s in sources])
        add = F.when(out[dest].isNull() & src.isNotNull(),
                     F.create_map(F.lit(dest), src)) \
               .otherwise(F.create_map().cast("map<string,string>"))
        out = F.map_concat(out, add)
    return out


def prometheus_records(df: DataFrame,
                       copy_tags: dict | None = None) -> DataFrame:
    """Gateway conversion over decoded remote-write rows (labels, ts,
    value): rows whose labels carry neither `__name__` nor `_metric_`
    are DROPPED (PrometheusInputRecordSpec "should not return any
    records if metric missing"), `_metric_` normalizes into `__name__`,
    and copyTags fills missing shard tags."""
    labels = F.col("labels")
    metric = F.coalesce(labels[METRIC], labels["_metric_"])
    out = df.where(metric.isNotNull())
    tags = transform_tags(
        F.map_filter(labels, lambda k, _: ~k.isin(METRIC, "_metric_")),
        copy_tags)
    new_labels = F.map_concat(tags, F.create_map(F.lit(METRIC), metric))
    return out.select(new_labels.alias("labels"), "ts", "value")


def assemble_prom_hist_records(df: DataFrame,
                               minmax: bool = False) -> DataFrame:
    """Remote-write bucket series -> prom-histogram table rows
    (InputRecord.writePromHistRecord semantics, InputRecord.scala:92-133
    / extractSumCountBuckets :258-271):

    `<m>_bucket{le="x"}`, `<m>_sum`, `<m>_count` rows sharing the same
    non-le tags and timestamp assemble into one (labels, ts, sum,
    count, hist) row with `__name__` = `<m>`. Buckets sort ascending by
    top (`+Inf` -> +infinity); bucket values read as LONG counts
    (LongHistogram truncation); groups with NO parseable buckets or no
    `+Inf` top write no record (the builder-spec skip-empty gate and
    the Influx gotInf gate); missing sum/count stay NaN like
    extractSumCountBuckets' defaults.

    minmax=True additionally folds `<m>_min`/`<m>_max` series into
    min/max columns (otel-cumulative-histogram shape,
    extractSumCountMinMaxBuckets :273-290).

    Pass only histogram-family rows: suffix matching cannot tell a
    histogram's `x_sum` from an unrelated counter literally named
    `x_sum` (the reference gateway knows the schema per dataset); keep
    non-histogram rows on the gauge/counter path. Rows whose metric
    matches no suffix — including `_bucket` rows missing `le` — are
    not consumed."""
    labels = F.col("labels")
    metric = labels[METRIC]
    suffixes = ["_bucket", "_sum", "_count"] + \
        (["_min", "_max"] if minmax else [])
    conds = [(metric.endswith(s), s) for s in suffixes]
    which = F.when(conds[0][0] & labels["le"].isNotNull(),
                   F.lit("_bucket"))
    for cond, s in conds[1:]:
        which = which.when(cond, F.lit(s))
    parts = df.withColumn("_part", which).where(F.col("_part").isNotNull())
    base = F.expr("substring(labels['__name__'], 1, "
                  "length(labels['__name__']) - length(_part))")
    le = F.when(labels["le"] == "+Inf", F.lit(float("inf"))) \
          .otherwise(labels["le"].cast("double"))
    group_labels = F.map_concat(
        F.map_filter(labels, lambda k, _: ~k.isin(METRIC, "le")),
        F.create_map(F.lit(METRIC), base))
    keyed = parts.select(
        group_labels.alias("labels"), "ts", "_part",
        le.alias("_le"), F.col("value").alias("_v"))
    keyed = keyed.withColumn("_sk", canonical_labels(F.col("labels")))
    bucket_pair = F.when(
        F.col("_part") == "_bucket",
        F.struct(F.col("_le").alias("le"),
                 # LongHistogram: bucket counts truncate to long
                 F.col("_v").cast("long").cast("double").alias("v")))
    scalar = {s: F.max(F.when(F.col("_part") == s, F.col("_v")))
              for s in ("_sum", "_count", "_min", "_max")}
    agg = (keyed.groupBy("_sk", "ts")
           .agg(F.first("labels").alias("labels"),
                F.array_sort(F.collect_list(bucket_pair)).alias("_bs"),
                scalar["_sum"].alias("_s"), scalar["_count"].alias("_c"),
                scalar["_min"].alias("_mn"), scalar["_max"].alias("_mx")))
    parseable = F.filter("_bs", lambda b: b["le"].isNotNull()
                         & b["v"].isNotNull())
    agg = agg.withColumn("_bs", parseable)
    got_inf = F.exists("_bs", lambda b: b["le"] == float("inf"))
    agg = agg.where((F.size("_bs") > 0) & got_inf)
    hist = F.struct(
        F.transform("_bs", lambda b: b["le"]).alias("les"),
        F.transform("_bs", lambda b: b["v"]).alias("values"))
    nan = F.lit(float("nan"))
    cols = [F.col("labels"), F.col("ts"),
            F.coalesce(F.col("_s"), nan).alias("sum"),
            F.coalesce(F.col("_c"), nan).alias("count"),
            hist.alias("hist")]
    if minmax:
        cols += [F.coalesce(F.col("_mn"), nan).alias("min"),
                 F.coalesce(F.col("_mx"), nan).alias("max")]
    return agg.select(*cols)
