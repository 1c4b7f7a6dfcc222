"""Influx line protocol parser -> time-series rows.

Reference: gateway/src/main/scala/filodb/gateway/conversion/
InfluxProtocolParser.scala (~400 LoC imperative parser). Line format:

    measurement[,tag1=v1,tag2=v2] field1=1.0[,field2=2.0] [timestamp-ns]

Spark-first: pure column expressions (regexp/split/transform) — no
Python UDF; one JVM-side projection per line. Escaped commas/spaces
(\\,  \\ ) are handled via placeholder substitution before splitting.
One output row per field: labels = tags + __name__ = measurement_field
(matching the gateway's metric-per-field record emission).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_C = "\x01"   # escaped comma placeholder
_S = "\x02"   # escaped space placeholder
_E = "\x03"   # escaped equals placeholder


def parse_influx_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse influx protocol lines into (labels map, ts long ms, value)."""
    line = (F.regexp_replace(F.col(line_col), r"\\,", _C))
    line = F.regexp_replace(line, r"\\ ", _S)
    line = F.regexp_replace(line, r"\\=", _E)

    # split into 3 space-separated sections: key, fields, [timestamp]
    parts = F.split(line, " ")
    key = F.element_at(parts, 1)
    fields_str = F.element_at(parts, 2)
    ts_ns = F.when(F.size(parts) >= 3,
                   F.element_at(parts, 3).cast("long"))

    key_parts = F.split(key, ",")
    measurement = F.element_at(key_parts, 1)
    tag_parts = F.slice(key_parts, 2, F.greatest(F.size(key_parts) - 1, F.lit(0)))

    def unescape(c):
        out = F.regexp_replace(c, _C, ",")
        out = F.regexp_replace(out, _S, " ")
        return F.regexp_replace(out, _E, "=")

    entries = F.transform(
        tag_parts,
        lambda kv: F.struct(
            unescape(F.split(kv, "=").getItem(0)).alias("key"),
            unescape(F.split(kv, "=").getItem(1)).alias("value")))
    # hostile-line hardening (one bad line must not kill the batch job):
    # - a tag literally named __name__ would collide with the metric key
    #   in map_concat (EXCEPTION dedup policy) -> reserved, dropped
    # - duplicate tag keys would make map_from_entries raise -> first
    #   occurrence wins (O(tags^2) per line, tags are few)
    # - a tag token without '=' yields a NULL key -> dropped
    entries = F.filter(entries, lambda e: e["key"].isNotNull()
                       & (e["key"] != "__name__"))
    entries = F.aggregate(
        entries,
        F.array().cast("array<struct<key:string,value:string>>"),
        lambda acc, e: F.when(
            F.exists(acc, lambda a: a["key"] == e["key"]), acc)
        .otherwise(F.array_append(acc, e)))
    tags = F.map_from_entries(entries)

    field_parts = F.split(fields_str, ",")
    fields = F.transform(
        field_parts,
        lambda kv: F.struct(
            unescape(F.split(kv, "=").getItem(0)).alias("fname"),
            F.regexp_replace(F.split(kv, "=").getItem(1), "[iu]$", "")
             .cast("double").alias("fval")))

    ts_ms = F.coalesce(
        (ts_ns.cast("decimal(38,0)") / F.lit(1_000_000)).cast("long"),
        F.unix_millis(F.current_timestamp()))
    # a PRESENT but non-numeric timestamp must DROP the line, not
    # silently ingest it at "now" (only a genuinely absent third
    # section gets the line-protocol now() default)
    ts_valid = (F.size(parts) < 3) | ts_ns.isNotNull()

    out = (df.where(ts_valid)
             .select(measurement.alias("_m"), tags.alias("_tags"),
                     fields.alias("_fields"), ts_ms.alias("ts"))
             .select("_m", "_tags", "ts",
                     F.explode("_fields").alias("_f"))
             .where(F.col("_f.fval").isNotNull()))
    labels = F.map_concat(
        F.col("_tags"),
        F.create_map(F.lit("__name__"),
                     F.concat(F.col("_m"), F.lit("_"), F.col("_f.fname"))))
    return out.select(labels.alias("labels"), "ts",
                      F.col("_f.fval").alias("value"))


def read_influx_files(spark, path: str) -> DataFrame:
    """Batch-load influx protocol text files."""
    return parse_influx_lines(spark.read.text(path))
