"""Streaming ingestion: Kafka/file stream -> time-series table.

Reference pipeline (SURVEY §1.4, §2.11): Kafka -> per-shard ingestion ->
TimeSeriesShard with (a) out-of-order/duplicate sample DROP per series
(append-only invariant, TimeSeriesPartition.scala:1-26), (b) recovery
via Kafka-offset watermarks (TimeSeriesShard class doc).

Spark mapping:
- Structured Streaming `readStream` (kafka or file source) replaces the
  ingestion actors; checkpointing replaces offset watermarks (free,
  exactly-once sink semantics with idempotent parquet/delta appends).
- duplicate-drop: `withWatermark(...).dropDuplicates(series, ts)` —
  state-store-backed, bounded by the watermark delay.
- strict out-of-order drop (ts must exceed the series' max ingested ts)
  is enforced inside each micro-batch; cross-batch regressions are
  bounded by the watermark (the reference has the same relaxation:
  its drop is per write-buffer, not global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


# The exact frame Spark's kafka source emits (Structured Streaming Kafka
# Integration Guide). Tests without a broker replay files of this shape
# through kafka_frame_to_records, so everything downstream of .load() is
# identical to the live-broker path.
KAFKA_WIRE_SCHEMA = ("key binary, value binary, topic string, "
                     "partition int, offset long, timestamp timestamp, "
                     "timestampType int")


def kafka_source(spark: SparkSession, brokers: str, topic: str) -> DataFrame:
    """Kafka ingestion stream (KafkaIngestionStream.scala equivalent).
    Payload: JSON {metric, tags, ts, value} per record."""
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", brokers)
           .option("subscribe", topic)
           .option("startingOffsets", "earliest")
           .load())
    return kafka_frame_to_records(raw)


def kafka_frame_to_records(raw: DataFrame) -> DataFrame:
    """Kafka wire frame (KAFKA_WIRE_SCHEMA columns) -> universal record
    layout (labels, ts, value). Shared by the live-broker source and the
    broker-less e2e tests; the only delta a real broker adds is the
    consumer itself (connection, offset tracking — which Structured
    Streaming checkpoints own anyway)."""
    return parse_json_records(raw.select(F.col("value").cast("string")))


def file_source(spark: SparkSession, path: str, schema: str,
                fmt: str = "json") -> DataFrame:
    """File-drop ingestion stream (dev-mode; CsvStream.scala analog)."""
    return (spark.readStream.format(fmt).schema(schema).load(path))


def parse_json_records(df: DataFrame) -> DataFrame:
    parsed = df.select(F.from_json(
        "value",
        "metric string, tags map<string,string>, ts long, value double"
    ).alias("r"))
    # hostile-record hardening: a tag literally named __name__ would
    # make map_concat raise under the default EXCEPTION dedup policy
    # (one bad record must not kill the micro-batch) -> reserved,
    # dropped; unparseable JSON / missing metric or ts -> row dropped
    tags = F.map_filter(
        F.coalesce(F.col("r.tags"),
                   F.create_map().cast("map<string,string>")),
        lambda k, _: k != "__name__")
    return (parsed
            .where(F.col("r.metric").isNotNull()
                   & F.col("r.ts").isNotNull())
            .select(
                F.map_concat(tags,
                             F.create_map(F.lit("__name__"),
                                          F.col("r.metric")))
                .alias("labels"),
                F.col("r.ts").alias("ts"),
                F.col("r.value").alias("value")))


def dedupe_batch(batch: DataFrame, series_cols: list[str],
                 ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """In-batch duplicate/out-of-order normalization: one row per
    (series, ts), keeping the max value (same deterministic rule as
    tsdf.events_ts)."""
    return (batch.groupBy(*series_cols, ts_col)
            .agg(F.max(value_col).alias(value_col)))


def start_doc_dedup_stream(stream: DataFrame, out_path: str,
                           checkpoint: str, text_col: str = "text",
                           event_time_col: str = "event_time",
                           watermark_delay: str = "1 hour",
                           trigger_once: bool = False):
    """Streaming exact document dedup: the incremental-ingest variant of
    operators.dedup.exact_duplicates_by_fingerprint — as new documents
    stream in, only the first occurrence of each normalized-text md5
    fingerprint within the watermark horizon is emitted downstream.

    State is BOUNDED: dropDuplicatesWithinWatermark expires fingerprint
    state once the watermark passes it, so 100 TB of historical corpus
    never accumulates in the state store — the stream deduplicates
    against a sliding horizon, and a periodic batch
    exact_duplicates_by_fingerprint pass owns cross-horizon dedup (the
    same split the reference draws between real-time ingest dedup and
    its batch downsampler jobs, SURVEY §2.11).

    Output rows keep the input schema plus the `fp` fingerprint column
    (downstream near-dup stages key on it)."""
    from filodb_spark.operators.text import fingerprint
    out = (stream
           .withColumn("fp", fingerprint(F.col(text_col)))
           .withWatermark(event_time_col, watermark_delay)
           .dropDuplicatesWithinWatermark(["fp"]))
    writer = (out.writeStream
              .format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ingest(stream: DataFrame, out_path: str, checkpoint: str,
                 watermark_delay: str = "10 minutes",
                 trigger_once: bool = False,
                 partkey_path: str | None = None):
    """Run the ingestion pipeline: watermark -> dedupe -> append parquet.

    At scale the sink is a Delta table partitioned by (_ws_, _ns_, date);
    parquet-append here (no Delta in the test container) — the plan is
    identical. Labels maps aren't valid state keys -> canonicalized.

    partkey_path: co-maintain the part-key (series-dimension) table —
    each micro-batch also upserts its per-series spans as delta rows
    (the reference's ingest-time part-key index add/update,
    TimeSeriesShard ingest path). Delivery semantics on this path:
    sample data lands in per-batch-id directories with overwrite, so a
    recovery retry is idempotent; the index delta append is
    at-least-once — first/last spans are idempotent under merge-on-read,
    only the `samples` statistic can overcount on a rare retry, and the
    next compact_series_table(partkey_path=) / compact_partkey_table
    recomputes it exactly. The default path (no partkey_path) keeps the
    file sink's _spark_metadata exactly-once log.
    """
    from filodb_spark.kernels.binary import canonical_labels
    out = (stream
           .withColumn("_sk", canonical_labels(F.col("labels")))
           .withColumn("_event_time", F.timestamp_millis(F.col("ts")))
           .withWatermark("_event_time", watermark_delay)
           .dropDuplicates(["_sk", "ts"])
           .drop("_sk", "_event_time"))
    if partkey_path is not None:
        from filodb_spark.partkey import append_partkey_updates

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            batch_df.persist()
            try:
                # per-batch-id dir + overwrite -> retries rewrite the
                # same directory instead of appending duplicates
                batch_df.write.mode("overwrite").parquet(
                    f"{out_path}/_b={batch_id}")
                append_partkey_updates(batch_df, partkey_path)
            finally:
                batch_df.unpersist()

        writer = (out.writeStream
                  .foreachBatch(_sink)
                  .option("checkpointLocation", checkpoint)
                  .outputMode("append"))
    else:
        writer = (out.writeStream
                  .format("parquet")
                  .option("path", out_path)
                  .option("checkpointLocation", checkpoint)
                  .outputMode("append"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
