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
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_millis(col)
    if isinstance(dtype, T.LongType):
        # nanoseconds -> floor ms (matches DuckDB epoch_ms())
        return ((col - F.pmod(col, F.lit(1_000_000))) / F.lit(1_000_000)).cast("long")
    raise TypeError(f"unsupported ts dtype: {dtype}")


def events_ts(spark: SparkSession, sf_dir: str,
              series_cols: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """events fixture -> (series..., ts long ms, value double)."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(df.dtypes)
    ts_dtype = df.schema["ts"].dataType
    keep = [F.col(c) for c in series_cols if c != "user_id"]
    if "user_id" in series_cols:
        keep.append(F.col("user_id"))
    return df.select(*keep, ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                     F.col("value").cast("double").alias("value"))


def events_labels_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> PromQL layout (labels map, ts, value).

    Treats event_type as the metric name and user_id as a label —
    mirroring the reference partition-key shape (_metric_ + tags).
    """
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = df.schema["ts"].dataType
    labels = F.create_map(
        F.lit("__name__"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return df.select(labels.alias("labels"),
                     ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                     F.col("value").cast("double").alias("value"))
