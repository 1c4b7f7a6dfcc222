"""STAGED registry candidates for round 6 — implemented and
oracle-verified now, NOT registered in all_queries() because the r4
verdict froze registry additions to verdict-mandated ones for r5.
To register in r6: merge STAGED_QUERIES/STAGED_ORACLES into a
driver_queries module's QUERIES/ORACLES and pin the names at the head
of the r6 gate window (they will be the only never-gated entries).

tests/test_export.py::TestStagedOracle runs the exact DuckDB
comparison the driver runs, so registration is a one-line change with
pre-verified exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.sources.export import ExportRule, export_rows
from filodb_spark.tsdf import events_labels_ts

# Exercises the full cascade: an early rule with BOTH a block group
# (user=3 series never export — and rule 1 is unreachable for them)
# and an allow group + a per-rule label drop; a later regex rule.
EXPORT_RULES = (
    ExportRule(block_filter_groups=((("user", "=", "3"),),),
               allow_filter_groups=((("__name__", "=", "purchase"),),),
               drop_labels=("user",)),
    ExportRule(allow_filter_groups=((("__name__", "=~", "sign.*|click"),),)),
)


def q_ts_export_rules(spark, sf_dir):
    """BatchExporter parity as a gated query: the ordered allow/block
    cascade + label drops + date-part derivation over the events store
    (reference: spark-jobs/.../BatchExporter.scala:235-252). Labels are
    CSV-flattened for the driver canonicalizer (maps aren't hashable —
    the r3 emb_quantize lesson)."""
    ev = events_labels_ts(spark, sf_dir)
    out = export_rows(ev, EXPORT_RULES)
    labels_csv = F.array_join(
        F.array_sort(F.transform(
            F.map_entries("labels"),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]))), ",")
    return out.select(
        "metric", labels_csv.alias("labels_csv"),
        "epoch_timestamp", F.round("value", 2).alias("value"),
        "year", "month", "day", "hour")


# DuckDB twin: same dedupe as events_labels_ts, the cascade as plain
# boolean logic (rule 0 block = user_id 3; rule 0 allow = purchase;
# rule 1 allow = anchored regex), date parts from a naive-UTC
# timestamp (make_timestamp takes microseconds).
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

STAGED_QUERIES = {"ts_export_rules": q_ts_export_rules}
STAGED_ORACLES = {"ts_export_rules": ORACLE_TS_EXPORT_RULES}
