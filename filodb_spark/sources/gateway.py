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


def assemble_otel_exp_hist_records(df: DataFrame) -> DataFrame:
    """OTel base-2 exponential DELTA histogram assembly
    (InputRecord.writeOtelExponentialHistRecord, InputRecord.scala:
    179-215 — cumulative exponential histograms are unsupported there
    too): `<m>_bucket{idx="i"}` series (i = 0 the zero bucket, then
    positive-bucket indices) plus `<m>_sum/_count/_min/_max` and the
    scheme-carrying `<m>_scale`/`<m>_posBucketOffset` series assemble
    into histogram-table rows whose les materialize in-plan with the
    base2_exp_les formula — downstream exp-quantile and merged-scheme
    sums read them like any other histogram. (In-plan Java Math.pow can
    differ from the Python helper by 1 ulp; rows assembled by one plan
    share bitwise-identical les, which is what hist_sum's scheme
    grouping depends on.) Bucket counts truncate to long; groups with
    no buckets write no record."""
    from filodb_spark.kernels.histogram import hist_struct
    labels = F.col("labels")
    metric = labels[METRIC]
    which = F.when(metric.endswith("_bucket")
                   & labels["idx"].isNotNull(), F.lit("_bucket"))
    for s in ("_sum", "_count", "_min", "_max", "_scale",
              "_posBucketOffset"):
        which = which.when(metric.endswith(s), F.lit(s))
    parts = df.withColumn("_part", which).where(F.col("_part").isNotNull())
    base = F.expr("substring(labels['__name__'], 1, "
                  "length(labels['__name__']) - length(_part))")
    group_labels = F.map_concat(
        F.map_filter(labels, lambda k, _: ~k.isin(METRIC, "idx")),
        F.create_map(F.lit(METRIC), base))
    keyed = parts.select(
        group_labels.alias("labels"), "ts", "_part",
        labels["idx"].cast("int").alias("_idx"),
        F.col("value").alias("_v"))
    keyed = keyed.withColumn("_sk", canonical_labels(F.col("labels")))
    bucket_pair = F.when(
        F.col("_part") == "_bucket",
        F.struct(F.col("_idx").alias("i"),
                 F.col("_v").cast("long").cast("double").alias("v")))
    scalar = {s: F.max(F.when(F.col("_part") == s, F.col("_v")))
              for s in ("_sum", "_count", "_min", "_max", "_scale",
                        "_posBucketOffset")}
    agg = (keyed.groupBy("_sk", "ts")
           .agg(F.first("labels").alias("labels"),
                F.array_sort(F.collect_list(bucket_pair)).alias("_bs"),
                *[scalar[s].alias(s) for s in scalar]))
    agg = agg.where(F.size("_bs") > 0)
    # les from the scheme: base = 2^(2^-scale), tops at
    # (posBucketOffset + i) for positive buckets; zero bucket first
    # (base2_exp_les semantics, computed in-plan)
    n_pos = F.size("_bs") - 1
    les = F.concat(
        F.array(F.lit(0.0)),
        F.transform(F.sequence(F.lit(1), n_pos),
                    lambda i: F.pow(
                        F.lit(2.0),
                        (F.col("_posBucketOffset") + i.cast("double"))
                        * F.pow(F.lit(2.0), -F.col("_scale")))))
    hist = hist_struct(les, F.transform("_bs", lambda b: b["v"]))
    nan = F.lit(float("nan"))
    return agg.select(
        F.col("labels"), F.col("ts"),
        F.coalesce(F.col("_sum"), nan).alias("sum"),
        F.coalesce(F.col("_count"), nan).alias("count"),
        hist.alias("hist"),
        F.coalesce(F.col("_min"), nan).alias("min"),
        F.coalesce(F.col("_max"), nan).alias("max"))
