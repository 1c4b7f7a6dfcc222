"""Adapters from fixture tables to the universal time-series layout.

Universal layout (SURVEY §2): series label columns + ``ts`` (long, ms
since epoch) + ``value`` (double). The reference's partition-key model
(_metric_ + tags map) maps onto plain columns here; the PromQL engine
layer uses a ``labels map<string,string>`` column built from these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ts_ms(col: Column, dtype) -> Column:
    """Normalize a timestamp column to long ms since epoch (UTC).

    Handles TimestampType and long nanoseconds (parquet TIMESTAMP(NANOS)
    read via spark.sql.legacy.parquet.nanosAsLong).
    """
    if isinstance(dtype, T.TimestampNTZType):
        # unix_millis rejects TIMESTAMP_NTZ; the cast below reinterprets
        # in the SESSION timezone, so it is only exact under UTC. Fail
        # fast instead of silently shifting epochs when called from a
        # session that did not come through filodb_spark.session.get_spark.
        active = SparkSession.getActiveSession()
        tz = active.conf.get("spark.sql.session.timeZone") if active else None
        if tz != "UTC":
            raise RuntimeError(
                f"ts_ms on TIMESTAMP_NTZ requires spark.sql.session."
                f"timeZone=UTC (got {tz!r}); create the session via "
                "filodb_spark.session.get_spark")
        return F.unix_millis(col.cast("timestamp"))
    if isinstance(dtype, T.TimestampType):
        return F.unix_millis(col)
    if isinstance(dtype, T.LongType):
        # nanoseconds -> floor ms. MUST be integral division: epoch-ns
        # (~1.7e18) exceeds double's 2^53 mantissa, so `/` (which casts
        # to double) silently loses the low bits.
        return ((col - F.pmod(col, F.lit(1_000_000))).cast("decimal(38,0)")
                / F.lit(1_000_000)).cast("long")
    raise TypeError(f"unsupported ts dtype: {dtype}")


def events_ts(spark: SparkSession, sf_dir: str,
              series_cols: tuple[str, ...] = ("event_type",),
              dedupe: bool = True) -> DataFrame:
    """events fixture -> (series..., ts long ms, value double).

    dedupe=True collapses samples sharing (series, ts) keeping max(value) —
    the reference drops duplicate timestamps per series at ingest
    (append-only invariant, TimeSeriesPartition.scala:1-26); max is the
    deterministic choice when arrival order is unknown. It also makes
    order statistics (min_by/max_by ties) engine-independent.
    """
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = df.schema["ts"].dataType
    out = df.select(*series_cols, ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                    F.col("value").cast("double").alias("value"))
    if dedupe:
        out = out.groupBy(*series_cols, "ts").agg(F.max("value").alias("value"))
    return out


def events_labels_ts(spark: SparkSession, sf_dir: str,
                     dedupe: bool = True) -> DataFrame:
    """events fixture -> PromQL layout (labels map, ts, value).

    Treats event_type as the metric name and user_id as a label —
    mirroring the reference partition-key shape (_metric_ + tags).
    Deduped per (series, ts) like events_ts.
    """
    df = events_ts(spark, sf_dir, series_cols=("event_type", "user_id"),
                   dedupe=dedupe)
    labels = F.create_map(
        F.lit("__name__"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return df.select(labels.alias("labels"), "ts", "value")
