"""Driver queries for the batch exporter (reference:
spark-jobs/src/main/scala/filodb/downsampler/chunk/BatchExporter.scala).

Registered in round 6 (staged + oracle-verified in round 5 as
driver_queries/staged_r6.py; the r4 registry freeze held until the r5
verdict mandated registration).

- ts_export_rules: the ordered allow/block rule cascade
  (getRuleIfShouldExport:235-252) + the config-level keyFilters
  conjunction (238-240) + per-rule label drops + date-part derivation.
- ts_export_columns: labelColumnMapping — a label surfaced as a
  top-level column (getExportTableStatement:220-232) — plus a negative
  anchored-regex matcher and a global label drop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.sources.export import ExportRule, export_rows
from filodb_spark.tsdf import events_labels_ts

# Exercises the full cascade: an early rule with BOTH a block group
# (user=3 series never export — and rule 1 is unreachable for them)
# and an allow group + a per-rule label drop; a later regex rule; and
# the config-level key filter (user != 9 series never reach the
# cascade at all — BatchExporter.scala:238-240).
EXPORT_RULES = (
    ExportRule(block_filter_groups=((("user", "=", "3"),),),
               allow_filter_groups=((("__name__", "=", "purchase"),),),
               drop_labels=("user",)),
    ExportRule(allow_filter_groups=((("__name__", "=~", "sign.*|click"),),)),
)
EXPORT_KEY_FILTERS = (("user", "!=", "9"),)


def _labels_csv():
    """CSV-flatten the label map for the driver canonicalizer (maps
    aren't hashable — the r3 emb_quantize lesson)."""
    return F.array_join(
        F.array_sort(F.transform(
            F.map_entries("labels"),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]))), ",")


def q_ts_export_rules(spark, sf_dir):
    """BatchExporter parity as a gated query: keyFilters gate + the
    ordered allow/block cascade + label drops + date-part derivation
    over the events store."""
    ev = events_labels_ts(spark, sf_dir)
    out = export_rows(ev, EXPORT_RULES, key_filters=EXPORT_KEY_FILTERS)
    return out.select(
        "metric", _labels_csv().alias("labels_csv"),
        "epoch_timestamp", F.round("value", 2).alias("value"),
        "year", "month", "day", "hour")


def q_ts_export_columns(spark, sf_dir):
    """labelColumnMapping parity: the `user` label surfaced as a
    top-level `user_col` (the reference partitions the export table by
    these columns), a negative anchored-regex allow matcher, and a
    global drop of the mapped label from the exported map."""
    ev = events_labels_ts(spark, sf_dir)
    out = export_rows(
        ev,
        (ExportRule(allow_filter_groups=(
            (("__name__", "!~", "error|view"),),)),),
        drop_labels=("user",),
        label_columns=(("user", "user_col"),))
    return out.select(
        "metric", _labels_csv().alias("labels_csv"),
        "epoch_timestamp", F.round("value", 2).alias("value"),
        "year", "month", "day", "hour", "user_col")


# DuckDB twin: same dedupe as events_labels_ts, the key filter as a
# plain predicate (user label always present in this fixture; the
# missing-label-never-matches edge is pinned in tests/test_export.py),
# the cascade as boolean logic (rule 0 block = user_id 3; rule 0
# allow = purchase; rule 1 allow = anchored regex), date parts from a
# naive-UTC timestamp (make_timestamp takes microseconds).
ORACLE_TS_EXPORT_RULES = """
WITH raw AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_s,
         epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2, 3
),
ruled AS (
  SELECT *,
         CASE
           WHEN user_s = '3' THEN NULL
           WHEN event_type = 'purchase' THEN 0
           WHEN regexp_full_match(event_type, '(?:sign.*|click)') THEN 1
         END AS rule
  FROM raw
  WHERE user_s <> '9'
)
SELECT event_type AS metric,
       CASE WHEN rule = 0 THEN '__name__=' || event_type
            ELSE '__name__=' || event_type || ',user=' || user_s
       END AS labels_csv,
       ts AS epoch_timestamp,
       round(value, 2) AS value,
       year(make_timestamp(ts * 1000)) AS year,
       month(make_timestamp(ts * 1000)) AS month,
       day(make_timestamp(ts * 1000)) AS day,
       hour(make_timestamp(ts * 1000)) AS hour
FROM ruled WHERE rule IS NOT NULL"""

ORACLE_TS_EXPORT_COLUMNS = """
WITH raw AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_s,
         epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type AS metric,
       '__name__=' || event_type AS labels_csv,
       ts AS epoch_timestamp,
       round(value, 2) AS value,
       year(make_timestamp(ts * 1000)) AS year,
       month(make_timestamp(ts * 1000)) AS month,
       day(make_timestamp(ts * 1000)) AS day,
       hour(make_timestamp(ts * 1000)) AS hour,
       user_s AS user_col
FROM raw
WHERE NOT regexp_full_match(event_type, '(?:error|view)')"""

def q_ts_export_remote_write(spark, sf_dir):
    """Job-level migration round trip (r6 verdict item 6): the two wire
    directions composed in one pipeline — the BatchExporter cascade
    selects and re-labels the exportable slice, records_to_frames
    encodes it as snappy+protobuf WriteRequests, frames_to_records
    decodes them back (both directions Arrow-batched mapInPandas) —
    and the decoded stream must equal the exported rows identically.
    This is exactly what a real migration replay does: export a
    partition, replay it into a remote-write endpoint, verify parity.
    Any defect in the cascade OR the codec breaks the value hash."""
    from filodb_spark.remote_write import (frames_to_records,
                                           records_to_frames)
    ev = events_labels_ts(spark, sf_dir)
    exported = export_rows(ev, EXPORT_RULES,
                           key_filters=EXPORT_KEY_FILTERS)
    recs = exported.select("labels",
                           F.col("epoch_timestamp").alias("ts"), "value")
    out = frames_to_records(records_to_frames(recs))
    return out.select(
        F.col("labels")["__name__"].alias("metric"),
        _labels_csv().alias("labels_csv"),
        F.col("ts").alias("epoch_timestamp"),
        F.round("value", 2).alias("value"))


# identity over the surviving rows: the cascade CTE of
# ORACLE_TS_EXPORT_RULES without the date parts (the wire carries
# labels/ts/value only)
ORACLE_TS_EXPORT_REMOTE_WRITE = """
WITH raw AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS user_s,
         epoch_ms(ts) AS ts, max(value) AS value
  FROM events GROUP BY 1, 2, 3
),
ruled AS (
  SELECT *,
         CASE
           WHEN user_s = '3' THEN NULL
           WHEN event_type = 'purchase' THEN 0
           WHEN regexp_full_match(event_type, '(?:sign.*|click)') THEN 1
         END AS rule
  FROM raw
  WHERE user_s <> '9'
)
SELECT event_type AS metric,
       CASE WHEN rule = 0 THEN '__name__=' || event_type
            ELSE '__name__=' || event_type || ',user=' || user_s
       END AS labels_csv,
       ts AS epoch_timestamp,
       round(value, 2) AS value
FROM ruled WHERE rule IS NOT NULL"""

QUERIES = {
    "ts_export_rules": q_ts_export_rules,
    "ts_export_columns": q_ts_export_columns,
    "ts_export_remote_write": q_ts_export_remote_write,
}
ORACLES = {
    "ts_export_rules": ORACLE_TS_EXPORT_RULES,
    "ts_export_columns": ORACLE_TS_EXPORT_COLUMNS,
    "ts_export_remote_write": ORACLE_TS_EXPORT_REMOTE_WRITE,
}
