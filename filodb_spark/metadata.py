"""Metadata & cardinality queries (SURVEY §2.9).

Reference endpoints: /api/v1/labels, label values, series, label
cardinality, TS cardinality (LogicalPlan.scala:282-375; exec
MetadataExecPlan.scala:334-640). The reference answers these from the
per-shard part-key index in O(series) — never from samples
(PartKeyLuceneIndex.scala:329-465). Here every endpoint reads per-series
rows from `_series_rows`:

- with a part-key table attached to the store
  (filodb_spark.partkey / TsStore.partkey_df), that is an O(series)
  scan of the compacted series-dimension table with label matchers
  pushed down — the sample table is never touched, matching the
  reference's index path and its span-overlap time-range semantics;
- without one, the fallback aggregates the sample scan to per-series
  rows (exact sample-presence semantics) — fine at small scale,
  O(samples) at 100 TB, which is exactly why the part-key table exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import canonical_labels
from filodb_spark.promql.ast import VectorSelector
from filodb_spark.promql.compiler import TsStore
from filodb_spark.promql.parser import parse


def _selector(match: str | None) -> VectorSelector:
    if not match:
        return VectorSelector(None, ())
    sel = parse(match)
    if not isinstance(sel, VectorSelector):
        raise ValueError("series match must be a plain selector")
    return sel


def _scan(store: TsStore, match: str | None, start_ms: int | None,
          end_ms: int | None) -> DataFrame:
    """Raw-sample scan fallback (exact sample-presence semantics)."""
    df = store.select(_selector(match)) if match else store.df
    if start_ms is not None:
        df = df.where(F.col("ts") >= start_ms)
    if end_ms is not None:
        df = df.where(F.col("ts") <= end_ms)
    return df


def _series_rows(store: TsStore, match: str | None, start_ms: int | None,
                 end_ms: int | None) -> DataFrame:
    """One row per series in range: (labels, _sk, first_ts, last_ts).

    Part-key path: matcher-filtered index rows with the reference's
    span-overlap range filter (a series is in range when
    [first_ts, last_ts] overlaps [start, end] —
    PartKeyLuceneIndex.scala:418-447 startTime/endTime postings).
    Fallback: aggregate the pruned sample scan per canonical key."""
    sel = _selector(match)
    pk = store.select_partkeys(sel)
    if pk is not None:
        if start_ms is not None:
            pk = pk.where(F.col("last_ts") >= start_ms)
        if end_ms is not None:
            pk = pk.where(F.col("first_ts") <= end_ms)
        return pk.select("labels", "_sk", "first_ts", "last_ts")
    df = _scan(store, match, start_ms, end_ms)
    return (df.withColumn("_sk", canonical_labels(F.col("labels")))
            .groupBy("_sk")
            .agg(F.first("labels").alias("labels"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"))
            .select("labels", "_sk", "first_ts", "last_ts"))


def label_names(store: TsStore, match: str | None = None,
                start_ms: int | None = None, end_ms: int | None = None) -> DataFrame:
    """/api/v1/labels (LabelNamesExec; index labelNamesEfficient)."""
    return (_series_rows(store, match, start_ms, end_ms)
            .select(F.explode(F.map_keys("labels")).alias("label"))
            .distinct().orderBy("label"))


def label_values(store: TsStore, label: str, match: str | None = None,
                 start_ms: int | None = None, end_ms: int | None = None) -> DataFrame:
    """/api/v1/label/{l}/values (LabelValuesExec; index
    labelValuesEfficient — the Grafana-autocomplete hot path, O(series)
    on the part-key table instead of O(samples))."""
    return (_series_rows(store, match, start_ms, end_ms)
            .select(F.col("labels")[label].alias("value"))
            .where(F.col("value").isNotNull())
            .distinct().orderBy("value"))


def label_value_freqs(store: TsStore, label: str,
                      match: str | None = None) -> DataFrame:
    """CliMain `indexvalues` parity (CliMain.scala:182-187 — the
    part-key index's (term, freq) listing): each label value with its
    series count, frequency-descending like the index dump."""
    rows = _series_rows(store, match, None, None)
    return (rows.select(F.col("labels")[label].alias("value"))
            .where(F.col("value").isNotNull())
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), "value"))


def _type_expr(store: TsStore, metric):
    """Schema name for the virtual `_type_` label, as a column expression
    (mirrors TsStore.type_name; MetadataExecSpec `_type_` in part keys)."""
    expr = F.lit("gauge")
    if store.delta_metrics:
        expr = F.when(metric.isin(*store.delta_metrics),
                      F.lit("delta-counter")).otherwise(expr)
    if store.hist_metrics:
        expr = F.when(metric.isin(*store.hist_metrics),
                      F.lit("prom-histogram")).otherwise(expr)
    if store.exp_hist_metrics:
        expr = F.when(metric.isin(*store.exp_hist_metrics),
                      F.lit("otel-exp-delta-histogram")).otherwise(expr)
    return expr


def series(store: TsStore, match: str, start_ms: int | None = None,
           end_ms: int | None = None) -> DataFrame:
    """/api/v1/series (PartKeysExec): distinct label sets with data in
    range, each carrying the virtual `_type_` schema label like the
    reference's part-key maps (MetadataExecSpec.scala:167-190)."""
    rows = _series_rows(store, match, start_ms, end_ms)
    labels = F.col("labels")
    with_type = F.map_concat(
        labels, F.create_map(F.lit("_type_"),
                             _type_expr(store, labels["__name__"])))
    return rows.select(with_type.alias("labels"))


def label_cardinality(store: TsStore, match: str | None = None) -> DataFrame:
    """LabelCardinalityExec — HLL sketches in the reference; Spark's
    approx_count_distinct is the same sketch class, here over
    O(series) part-key rows rather than O(samples)."""
    rows = _series_rows(store, match, None, None)
    kv = rows.select(F.explode("labels").alias("label", "value"))
    return (kv.groupBy("label")
            .agg(F.approx_count_distinct("value").alias("cardinality"))
            .orderBy("label"))


def chunk_meta(spark, table_path: str) -> DataFrame:
    """_filodb_chunkmeta_all analog (SelectChunkInfosExec / FiloFunctionId
    ChunkMetaAll): physical storage metadata — one row per parquet
    row-group with row counts and ts min/max (the engine's "chunks")."""
    import pyarrow.parquet as pq
    import glob as _glob
    import os
    rows = []
    paths = ([table_path] if os.path.isfile(table_path)
             else _glob.glob(os.path.join(table_path, "**", "*.parquet"),
                             recursive=True))
    for p in paths:
        f = pq.ParquetFile(p)
        for rg in range(f.metadata.num_row_groups):
            meta = f.metadata.row_group(rg)
            ts_min = ts_max = None
            for ci in range(meta.num_columns):
                col = meta.column(ci)
                if col.path_in_schema == "ts" and col.statistics is not None:
                    ts_min = col.statistics.min
                    ts_max = col.statistics.max
            rows.append((p, rg, meta.num_rows, meta.total_byte_size,
                         ts_min, ts_max))
    return spark.createDataFrame(
        rows, "file string, row_group int, num_rows long, bytes long, "
              "ts_min long, ts_max long")


def ts_cardinality(store: TsStore, group_labels: tuple[str, ...] = ("__name__",),
                   active_after_ms: int | None = None,
                   match: str | None = None) -> DataFrame:
    """TsCardExec: series counts grouped by shard-key prefixes
    (total + active), optionally restricted by a series selector.
    On part-key rows this is one count aggregation — active = series
    whose last sample is at/after the cutoff (a series has a sample
    with ts >= cutoff iff max(ts) >= cutoff, so the span-based test is
    exact here, matching the index's endTime-based active check)."""
    rows = _series_rows(store, match, None, None)
    keys = [F.col("labels")[g].alias(g) for g in group_labels]
    aggs = [F.count(F.lit(1)).alias("total_series")]
    if active_after_ms is not None:
        aggs.append(F.sum((F.col("last_ts") >= active_after_ms)
                          .cast("long")).alias("active_series"))
    return rows.groupBy(*keys).agg(*aggs)


def topk_cardinality(store: TsStore,
                     group_labels: tuple[str, ...] = ("__name__",),
                     k: int = 10,
                     active_after_ms: int | None = None,
                     match: str | None = None) -> DataFrame:
    """CliMain `topkcardlocal` parity (CliMain.scala:188-207 /
    getTopkCardinality): the k highest-cardinality shard-key groups,
    sorted by total (or active, when an active split is requested)
    series count descending."""
    card = ts_cardinality(store, group_labels, active_after_ms, match)
    order_col = ("active_series" if active_after_ms is not None
                 else "total_series")
    return card.orderBy(F.col(order_col).desc(), *group_labels).limit(k)
