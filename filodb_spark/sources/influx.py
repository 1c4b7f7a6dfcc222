"""Influx line protocol parser -> time-series rows.

Reference: gateway/src/main/scala/filodb/gateway/conversion/
InfluxProtocolParser.scala (~400 LoC imperative parser) and
InfluxRecord.scala. Line format:

    measurement[,tag1=v1,tag2=v2] field1=1.0[,field2=2.0] [timestamp-ns]

Spark-first: pure column expressions (regexp/split/transform) — no
Python UDF; one JVM-side projection per line. Escaped commas/spaces
(\\,  \\ ) are handled via placeholder substitution before splitting.

Record mapping (InfluxProtocolParser.parse:126-168):
- naming="suffix" (engine default): one output row per field with
  __name__ = measurement_field — a deliberate SUPERSET of the gateway,
  which keeps arbitrary multi-field Telegraf lines instead of dropping
  them.
- naming="measurement" (reference parity, InfluxPromSingleRecord):
  single-field lines only, __name__ = measurement (the field key only
  selects counter-vs-gauge schema in the reference — both live in the
  gauge table here); multi-field lines belong to the histogram parser.
- parse_influx_hist_lines (InfluxHistogramRecord): multi-field lines
  whose fields are bucket tops + sum + count and include "+Inf" become
  one promHistogram row (labels, ts, sum, count,
  hist struct<les, values>); lines without +Inf are dropped
  (InfluxRecord.scala "Only create histogram record ... gotInf").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_C = "\x01"   # escaped comma placeholder
_S = "\x02"   # escaped space placeholder
_E = "\x03"   # escaped equals placeholder


def _sections(df: DataFrame, line_col: str) -> DataFrame:
    """Shared line split: (_m measurement, _tags map, _fields
    array<struct<fname,fval>>, ts ms). Hostile lines are dropped or
    leniently parsed — one bad line never kills the batch."""
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

    return (df.where(ts_valid)
              .select(measurement.alias("_m"), tags.alias("_tags"),
                      fields.alias("_fields"), ts_ms.alias("ts")))


def parse_influx_lines(df: DataFrame, line_col: str = "value",
                       naming: str = "suffix") -> DataFrame:
    """Parse influx protocol lines into (labels map, ts long ms, value).
    naming: "suffix" = __name__ is measurement_field, one row per field
    (engine superset); "measurement" = reference
    InfluxPromSingleRecord parity — single-field lines only, __name__
    is the bare measurement."""
    if naming not in ("suffix", "measurement"):
        raise ValueError(f"unknown naming {naming!r}")
    base = _sections(df, line_col)
    if naming == "measurement":
        base = base.where(F.size("_fields") == 1)
    out = (base.select("_m", "_tags", "ts",
                       F.explode("_fields").alias("_f"))
               .where(F.col("_f.fval").isNotNull()))
    metric = F.col("_m") if naming == "measurement" else \
        F.concat(F.col("_m"), F.lit("_"), F.col("_f.fname"))
    labels = F.map_concat(
        F.col("_tags"), F.create_map(F.lit("__name__"), metric))
    return out.select(labels.alias("labels"), "ts",
                      F.col("_f.fval").alias("value"))


def parse_influx_hist_lines(df: DataFrame,
                            line_col: str = "value") -> DataFrame:
    """InfluxHistogramRecord parity (InfluxRecord.scala:172-230): lines
    with >= 3 fields whose keys are bucket tops plus `sum` and `count`
    and which include a `+Inf` bucket become one histogram row
    (labels, ts, sum, count, hist struct<les, values>) — buckets sorted
    ascending by top, values as published (cumulative). Lines without
    +Inf, with non-numeric bucket keys, or with unparsable counts are
    dropped, mirroring the gateway's gotInf/parse gate."""
    base = _sections(df, line_col).where(F.size("_fields") >= 3)
    # first-occurrence-wins field dedup: a hostile duplicate field key
    # would make map_from_entries raise and kill the batch
    fields = F.aggregate(
        F.col("_fields"),
        F.array().cast("array<struct<fname:string,fval:double>>"),
        lambda acc, e: F.when(
            F.exists(acc, lambda a: a["fname"] == e["fname"]), acc)
        .otherwise(F.array_append(acc, e)))
    hsum = F.element_at(F.map_from_entries(fields), "sum")
    hcount = F.element_at(F.map_from_entries(fields), "count")
    buckets = F.filter(fields, lambda f: ~f["fname"].isin("sum", "count"))
    tops = F.transform(
        buckets,
        lambda f: F.struct(
            F.when(f["fname"] == "+Inf", F.lit(float("inf")))
             .otherwise(f["fname"].cast("double")).alias("le"),
            f["fval"].alias("v")))
    got_inf = F.exists(tops, lambda t: t["le"] == float("inf"))
    parseable = ~F.exists(tops, lambda t: t["le"].isNull()
                          | t["v"].isNull())
    sorted_tops = F.array_sort(tops)
    hist = F.struct(
        F.transform(sorted_tops, lambda t: t["le"]).alias("les"),
        F.transform(sorted_tops, lambda t: t["v"]).alias("values"))
    out = (base.where(got_inf & parseable
                      & hsum.isNotNull() & hcount.isNotNull()))
    labels = F.map_concat(
        F.col("_tags"), F.create_map(F.lit("__name__"), F.col("_m")))
    return out.select(labels.alias("labels"), "ts",
                      hsum.alias("sum"), hcount.alias("count"),
                      hist.alias("hist"))


def read_influx_files(spark, path: str) -> DataFrame:
    """Batch-load influx protocol text files."""
    return parse_influx_lines(spark.read.text(path))
