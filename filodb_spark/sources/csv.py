"""CSV time-series source (reference: coordinator/.../sources/
CsvStream.scala:1-126 — dev/CLI ingestion path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_series(spark: SparkSession, path: str, metric_col: str,
                    ts_col: str, value_col: str,
                    tag_cols: tuple[str, ...] = (),
                    header: bool = True) -> DataFrame:
    """Load CSV into the universal (labels, ts, value) layout. ts may be
    epoch ms or an ISO timestamp string."""
    df = spark.read.option("header", str(header).lower()) \
        .option("inferSchema", "true").csv(path)
    ts = F.col(ts_col)
    ts_ms = F.when(ts.cast("long").isNotNull(), ts.cast("long")) \
        .otherwise(F.unix_millis(ts.cast("timestamp")))
    entries = [F.lit("__name__"), F.col(metric_col).cast("string")]
    for t in tag_cols:
        entries += [F.lit(t), F.col(t).cast("string")]
    return df.select(F.create_map(*entries).alias("labels"),
                     ts_ms.alias("ts"),
                     F.col(value_col).cast("double").alias("value"))
