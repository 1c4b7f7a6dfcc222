"""Streaming twin of the batch exporter (reference: spark-jobs/.../
BatchExporter.scala runs as a periodic batch job over closed chunks;
here the same rule cascade also runs continuously over the ingest
stream, like streaming_downsample twins the batch downsampler).

Because export_rows compiles the whole cascade to map-only
select/filter expressions (no aggregation, no watermark state), the
stream twin is the SAME plan applied to a streaming DataFrame and
written through Spark's native partitioned file sink — which gives
exactly-once output via the sink's `_spark_metadata` commit log
(a crash mid-batch never double-exposes rows to readers that go
through `spark.read`), stronger than a hand-rolled foreachBatch
append. The output layout is identical to export_series_table's:
partitioned by (year, month, day, *label_columns, metric), so batch
and stream targets are interchangeable for downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filodb_spark.sources.export import export_rows

__all__ = ["streaming_export_rows", "streaming_export"]


def streaming_export_rows(stream: DataFrame, rules,
                          drop_labels: tuple = (),
                          label_columns: tuple = (),
                          explode_hist_col: str | None = None,
                          key_filters: tuple = ()) -> DataFrame:
    """export_rows applied to a streaming (labels, ts, value[, hist])
    frame — the cascade is stateless, so the batch compiler is reused
    verbatim and batch/stream row equality holds by construction."""
    if not stream.isStreaming:
        raise ValueError("streaming_export_rows expects a streaming "
                         "DataFrame; use export_rows for batch input")
    return export_rows(stream, rules, drop_labels, label_columns,
                       explode_hist_col, key_filters)


def streaming_export(stream: DataFrame, rules, path: str,
                     checkpoint: str,
                     drop_labels: tuple = (),
                     label_columns: tuple = (),
                     explode_hist_col: str | None = None,
                     key_filters: tuple = (),
                     available_now: bool = True):
    """Start the continuous export job: cascade -> partitioned parquet
    file sink (year/month/day/<label cols>/metric, the reference's
    PARTITIONED BY layout). Returns the started StreamingQuery.

    available_now=True drains what's currently readable then stops
    (the batch-job-shaped trigger); pass False for an always-on
    micro-batch stream. Restart-safe: the checkpoint tracks consumed
    input and the file sink's _spark_metadata log makes output commits
    atomic for spark.read consumers."""
    rows = streaming_export_rows(stream, rules, drop_labels,
                                 label_columns, explode_hist_col,
                                 key_filters)
    part_cols = ["year", "month", "day",
                 *[c for _, c in label_columns], "metric"]
    w = (rows.writeStream.format("parquet")
         .partitionBy(*part_cols)
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append"))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
