"""Rule-driven batch export of time series to partitioned parquet
tables (reference: spark-jobs/src/main/scala/filodb/downsampler/chunk/
BatchExporter.scala — the job that tees a filtered slice of the ingest
stream into date-partitioned tables for external consumers).

Semantics mirrored from `getRuleIfShouldExport`
(BatchExporter.scala:235-252):

- the config-level `keyFilters` conjunction gates everything: a series
  that fails any key filter is never exported, before the rule cascade
  is even consulted (`BatchExporter.scala:238-240`); missing-label-
  never-matches applies here exactly as in the rule groups,
- rules are ORDERED; evaluation walks them in order,
- the walk stops at the first rule whose block-filter groups match
  (that rule and everything after it is unreachable — takeWhile),
- within the reachable prefix, the FIRST rule whose allow-filter
  groups are empty or match wins,
- a filter group matches iff ALL its filters match
  (`matchAllFilters:99-106`); a filter on a missing label NEVER
  matches (`partKeyMap.get(col).exists(...)` — even negative
  matchers),
- the winning rule's drop_labels (plus the global drop list) are
  removed from the exported label map (`getExportData:270-271`),
- output rows carry (metric, labels, epoch_timestamp, timestamp,
  value, year, month, day, hour) and the table is partitioned by
  (year, month, day, *label_columns, metric)
  (`getExportTableStatement:220-232`, `ExportRowData:37-48`),
- histogram columns explode to `<metric>_bucket` series with an `le`
  label, +Inf rendered Prometheus-style (`getExportData:300-325`).

Spark-first shape: the whole rule cascade compiles to ONE literal
when-chain column — the export is a map-only select + filter with
every predicate eligible for pushdown; the only shuffle is the
partitioned write's own file routing. At 100 TB the rules ride the
scan for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ExportRule", "export_rows", "export_series_table"]


@dataclass(frozen=True)
class ExportRule:
    """One entry of the ordered export-rule cascade. Filter groups are
    tuples of (label, op, value) with op in {'=', '!=', '=~', '!~'}
    (regexes full-anchored, like PromQL matchers / the reference's
    Equals/EqualsRegex ColumnFilters)."""
    allow_filter_groups: tuple = field(default_factory=tuple)
    block_filter_groups: tuple = field(default_factory=tuple)
    drop_labels: tuple = field(default_factory=tuple)


def _filter_match(labels: Column, filt) -> Column:
    """One ColumnFilter against the label map. A missing label never
    matches — including negative matchers (BatchExporter
    matchAllFilters: `partKeyMap.get(col).exists(filterFunc)`)."""
    label, op, value = filt
    lv = labels[label]
    if op == "=":
        pred = lv == value
    elif op == "!=":
        pred = lv != value
    elif op == "=~":
        pred = lv.rlike(f"^(?:{value})$")
    elif op == "!~":
        pred = ~lv.rlike(f"^(?:{value})$")
    else:
        raise ValueError(f"unknown filter op {op!r}")
    return lv.isNotNull() & pred


def _group_match(labels: Column, group) -> Column:
    """A filter group matches iff ALL its filters match."""
    out = F.lit(True)
    for filt in group:
        out = out & _filter_match(labels, filt)
    return out


def _any_group(labels: Column, groups) -> Column:
    out = F.lit(False)
    for g in groups:
        out = out | _group_match(labels, g)
    return out


def rule_index_col(labels: Column, rules) -> Column:
    """The winning rule's index (int, NULL = not exported) as one
    literal when-chain — the whole ordered cascade evaluated in-plan:
    rule i wins iff no rule j <= i has a matching block group and
    rule i's allow groups are empty or match."""
    sel = F.lit(None).cast("int")
    blocked_before = F.lit(False)
    for i, rule in enumerate(rules):
        bi = _any_group(labels, rule.block_filter_groups)
        ai = (F.lit(True) if not rule.allow_filter_groups
              else _any_group(labels, rule.allow_filter_groups))
        cand = ~blocked_before & ~bi & ai
        sel = F.coalesce(sel, F.when(cand, F.lit(i)))
        blocked_before = blocked_before | bi
    return sel


def _drop_labels_col(labels: Column, rules, drop_labels,
                     rule_idx: Column) -> Column:
    """labels minus the global drop list minus the WINNING rule's
    drop list (rule-dependent, so a when-chain again)."""
    def dropped(extra) -> Column:
        gone = sorted(set(drop_labels) | set(extra))
        if not gone:
            return labels
        return F.map_filter(labels, lambda k, _: ~k.isin(*gone))
    out = dropped(())
    for i, rule in enumerate(rules):
        if rule.drop_labels:
            out = F.when(rule_idx == i,
                         dropped(rule.drop_labels)).otherwise(out)
    return out


def key_filters_col(labels: Column, key_filters) -> Column:
    """The config-level keyFilters conjunction: ALL filters must match
    (matchAllFilters over `keyFilters` — BatchExporter.scala:238-240),
    with the same missing-label-never-matches rule as filter groups.
    Empty filter list matches everything."""
    return _group_match(labels, key_filters)


def export_rows(df: DataFrame, rules,
                drop_labels: tuple = (),
                label_columns: tuple = (),
                explode_hist_col: str | None = None,
                key_filters: tuple = ()) -> DataFrame:
    """Apply the export-rule cascade to a (labels, ts, value[, hist])
    frame and return the exportable rows in the reference's row shape:
    (metric, labels, epoch_timestamp, timestamp, value, year, month,
    day, hour, *label_columns). Map-only; not yet written anywhere.

    key_filters: the config-level ColumnFilter conjunction applied
    BEFORE the rule cascade (a series failing any key filter is never
    exported; a filter on a missing label never matches, even for
    negative matchers). label_columns: labels additionally surfaced as
    top-level columns (the reference's labelColumnMapping) so the
    write can partition by them. explode_hist_col: name of a histogram
    struct column — its buckets become `<metric>_bucket` series with
    an `le` label."""
    rules = tuple(rules)
    key_filters = tuple(key_filters)
    labels = F.col("labels")
    out = df
    if key_filters:
        out = out.where(key_filters_col(labels, key_filters))
    out = out.withColumn("_rule", rule_index_col(labels, rules)) \
             .where(F.col("_rule").isNotNull())
    if explode_hist_col is not None and explode_hist_col in out.columns:
        from filodb_spark.kernels.histogram import explode_hist, le_label
        ex = explode_hist(out, explode_hist_col)
        ex = ex.withColumn(
            "labels",
            F.map_concat(
                F.map_filter(F.col("labels"),
                             lambda k, _: k != "__name__"),
                F.create_map(
                    F.lit("__name__"),
                    F.concat(F.col("labels")["__name__"],
                             F.lit("_bucket")),
                    F.lit("le"), le_label(F.col("bucket_le"))))) \
            .drop("bucket_le")
        out = ex
    kept = _drop_labels_col(F.col("labels"), rules, drop_labels,
                            F.col("_rule"))
    ts_s = F.col("ts") / 1000.0
    t = F.timestamp_seconds(ts_s)
    cols = [
        F.col("labels")["__name__"].alias("metric"),
        kept.alias("labels"),
        F.col("ts").alias("epoch_timestamp"),
        t.alias("timestamp"),
        F.col("value").cast("double").alias("value"),
        F.year(t).alias("year"),
        F.month(t).alias("month"),
        F.dayofmonth(t).alias("day"),
        F.hour(t).alias("hour"),
    ]
    for lbl, colname in label_columns:
        cols.append(F.col("labels")[lbl].alias(colname))
    return out.select(*cols)


def export_series_table(df: DataFrame, rules, path: str,
                        drop_labels: tuple = (),
                        label_columns: tuple = (),
                        explode_hist_col: str | None = None,
                        key_filters: tuple = (),
                        mode: str = "overwrite") -> None:
    """The full export job: apply the cascade and write the
    date-partitioned table (year/month/day/<label cols>/metric — the
    reference's PARTITIONED BY clause), so downstream consumers prune
    by date and metric at planning time."""
    rows = export_rows(df, rules, drop_labels, label_columns,
                       explode_hist_col, key_filters)
    part_cols = ["year", "month", "day",
                 *[c for _, c in label_columns], "metric"]
    rows.write.mode(mode).partitionBy(*part_cols).parquet(path)
