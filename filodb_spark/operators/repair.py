"""Repair / disaster-recovery copy jobs.

Reference: spark-jobs/src/main/scala/filodb/repair/ —
  ChunkCopier.scala            copy chunks whose ingestion time falls in
                               [start, end) from a source Cassandra
                               cluster to a target one (:101-144)
  ChunkCopierValidator.scala   diff the copied band: sourceRows except
                               targetRows and vice versa (:229-254)
  PartitionKeysCopier.scala    copy part keys overlapping the band;
                               the copy phase can be disabled for
                               validation-only runs (:115-128)
  PartitionKeysCopierValidator.scala  same except-diff over part keys

The chunkless analog operates on series tables (parquet/Delta
directories in the sources.table layout) and part-key tables: a copy
is a ts-band-filtered append that keeps the partitioned layout, and a
validation is a symmetric EXCEPT over the band — both fully
distributed, no driver-side row handling. The reference copies by
INGESTION time because that is what Cassandra indexes; chunkless
tables are keyed by sample time, so the band filter is on `ts` (for
bit-identical replay of late-arriving data, export/remote-write wire
replays are the tool — sources/export.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filodb_spark.sources.table import (SHARD_KEY_LABELS,
                                        read_series_table,
                                        write_series_table)


def _band(df: DataFrame, start_ms: int, end_ms: int,
          ts_col: str = "ts") -> DataFrame:
    """[start, end) — ChunkCopier's ingestionTimeStart/End band."""
    return df.where((F.col(ts_col) >= start_ms) & (F.col(ts_col) < end_ms))


def copy_time_slice(spark: SparkSession, source_path: str,
                    target_path: str, start_ms: int, end_ms: int,
                    shard_labels: tuple[str, ...] = SHARD_KEY_LABELS,
                    format: str = "parquet") -> int:
    """ChunkCopier analog: append the source table's rows with
    ts in [start_ms, end_ms) to the target table, keeping the
    partitioned (shard labels + date) layout. Schema-tolerant: copies
    whatever value columns the source carries (gauge `value` or
    histogram sum/count/hist[/min/max]). Returns rows copied.

    The reference batches writes driver-free the same way
    (ChunkCopier.scala:127-144 foreachPartition); here the write IS the
    Spark job. Re-running the copy appends duplicates, as re-running
    the reference's copier re-writes the same chunks — run the
    validator first (validate_time_slice) to see whether a slice is
    already present."""
    src = read_series_table(spark, source_path, format=format)
    layout = {"_metric", "date", *shard_labels}
    sliced = _band(src.select(*[c for c in src.columns
                                if c not in layout]),
                   start_ms, end_ms)
    n = sliced.count()
    write_series_table(sliced, target_path, shard_labels=shard_labels,
                       mode="append", format=format)
    return n


def validate_time_slice(spark: SparkSession, source_path: str,
                        target_path: str, start_ms: int, end_ms: int,
                        format: str = "parquet") -> dict:
    """ChunkCopierValidator analog: symmetric EXCEPT over the band
    (ChunkCopierValidator.scala:245-254 sourceDiff/targetDiff).
    Returns {source_rows, target_rows, source_only, target_only};
    a clean copy has source_only == target_only == 0."""
    def rows(path):
        df = read_series_table(spark, path, format=format)
        layout = {"_metric", "date", "_sk"}
        cols = [c for c in df.columns if c not in layout]
        out = _band(df.select(*cols), start_ms, end_ms)
        # labels maps are not EXCEPT-comparable; canonical JSON is
        from filodb_spark.kernels.binary import canonical_labels
        return out.withColumn("labels",
                              canonical_labels(F.col("labels")))
    s, t = rows(source_path), rows(target_path)
    t = t.select(*s.columns)
    return {
        "source_rows": s.count(),
        "target_rows": t.count(),
        "source_only": s.exceptAll(t).count(),
        "target_only": t.exceptAll(s).count(),
    }


def copy_partkeys(spark: SparkSession, source_path: str,
                  target_path: str, start_ms: int, end_ms: int,
                  copy: bool = True) -> int:
    """PartitionKeysCopier analog: take the source part-key rows whose
    [first_ts, last_ts] span OVERLAPS [start_ms, end_ms) — the
    reference's copyPartitionKeysByTimeRange band
    (PartitionKeysCopier.scala:122-128) — and UPSERT them into the
    target part-key table (per-key span merge + rewrite through a
    temp-dir swap), the record replacement the reference's
    writePartKeys performs. copy=False disables the copy phase
    (PartitionKeysCopier.scala:115: validation-only / no-op runs) and
    just returns the would-copy count. Returns rows (to be) copied."""
    from filodb_spark.partkey import read_partkey_table, recover_table_dir
    from filodb_spark.sources.table import hadoop_fs
    # recover a crash-orphaned target FIRST — before the early returns,
    # so validation-only / empty-band runs also restore it rather than
    # failing a later read on the missing directory
    fs, Path = hadoop_fs(spark, target_path)
    recover_table_dir(fs, Path, target_path,
                      target_path.rstrip("/") + "__copy_old")
    # merged rows: a series' span must be judged over ALL its delta
    # rows, not per physical delta
    src = read_partkey_table(spark, source_path)
    band = src.where((F.col("last_ts") >= start_ms)
                     & (F.col("first_ts") < end_ms))
    n = band.count()
    if not copy or n == 0:
        return n
    # UPSERT, not append-accumulate: merge_partkey_rows SUMS the
    # samples column across delta rows, so appending a source row for
    # a series the target already holds would double-count its
    # samples. Merge source band + target per key (min first_ts / max
    # last_ts; samples = greatest of the two — exact when one side's
    # rows are a superset of the other's, the DR-copy case) and
    # REWRITE the target through a temp-dir swap, like the
    # reference's writePartKeys record replacement.
    from filodb_spark.partkey import (PARTKEY_COLS, checked_rename,
                                      read_partkey_manifest,
                                      swap_table_dir, write_partkey_manifest,
                                      _with_shard_cols)
    tmp = target_path.rstrip("/") + "__copy_tmp"
    old = target_path.rstrip("/") + "__copy_old"
    tgt = read_partkey_table(spark, target_path)
    s = band.select(F.col("_sk").alias("_sk"),
                    F.col("labels").alias("_s_labels"),
                    F.col("first_ts").alias("_s_first"),
                    F.col("last_ts").alias("_s_last"),
                    F.col("samples").alias("_s_samples"))
    merged = (tgt.join(s, "_sk", "full_outer")
              .select(
                  F.coalesce(F.col("labels"),
                             F.col("_s_labels")).alias("labels"),
                  F.col("_sk"),
                  F.coalesce(F.least("first_ts", "_s_first"),
                             "first_ts", "_s_first").alias("first_ts"),
                  F.coalesce(F.greatest("last_ts", "_s_last"),
                             "last_ts", "_s_last").alias("last_ts"),
                  F.coalesce(F.greatest("samples", "_s_samples"),
                             "samples", "_s_samples").alias("samples"))
              .select(*PARTKEY_COLS))
    manifest = read_partkey_manifest(spark, target_path)
    pk = _with_shard_cols(merged, SHARD_KEY_LABELS)
    pk = pk.withColumn("_metric", F.col("labels")["__name__"])
    # same two-rename swap as compact_partkey_table (swap_table_dir:
    # checked renames — Hadoop reports rename failure by RETURN VALUE —
    # plus crash-leftover recovery): never delete the target before the
    # replacement is in place — a crash between a delete and a rename
    # would strand a DR target with NO index at all; on failure the
    # original table is restored first
    try:
        (pk.repartition(*[F.col(c) for c in SHARD_KEY_LABELS])
           .sortWithinPartitions("_metric", "_sk")
           .write.mode("overwrite").partitionBy(*SHARD_KEY_LABELS)
           .parquet(tmp))
        # manifest goes into TMP so the swap installs table+manifest
        # as one rename — writing it after the swap left a manifestless
        # table installed when the manifest write failed (the old dir
        # was already gone, so the except restore could not fire)
        if manifest:
            write_partkey_manifest(spark, tmp, manifest)
        swap_table_dir(fs, Path, tmp, target_path, old)
    except BaseException:
        if not fs.exists(Path(target_path)) and fs.exists(Path(old)):
            checked_rename(fs, Path, old, target_path)
        fs.delete(Path(tmp), True)
        raise
    return n


def validate_partkeys(spark: SparkSession, source_path: str,
                      target_path: str, start_ms: int,
                      end_ms: int) -> dict:
    """PartitionKeysCopierValidator analog: symmetric EXCEPT over the
    band's MERGED part-key rows (the validator compares the logical
    records, not physical deltas). source_only/target_only compare
    exact (_sk, first_ts, last_ts) tuples, so a target whose postings
    COVER the source band with WIDER spans does NOT validate clean
    there — read the series-axis fields for that case:
    series_source_only/series_target_only diff on _sk alone, so a
    covering target reports 0 series_source_only even when its spans
    differ.

    READ-ONLY by contract (ADVICE r11): validation never renames or
    deletes anything — a validator that performed swap recovery could
    race an in-flight copy_partkeys swap on the same target and rename
    its backup mid-swap. The two distinct crash states of the
    two-rename swap are reported separately (ADVICE r12 — conflating
    them overstated the orphan condition): "orphaned_leftover" =
    ONLY `__copy_old` exists (crash between the two renames; the
    leftover IS the table, read in place and validated),
    "stale_backup" = `__copy_old` AND a healthy target both exist
    (crash after the second rename, before backup cleanup; the target
    is validated and the backup is just unreclaimed disk). Actual
    recovery stays with the copy entry points (copy_partkeys runs
    recover_table_dir first)."""
    from filodb_spark.partkey import read_partkey_table
    from filodb_spark.sources.table import hadoop_fs
    fs, Path = hadoop_fs(spark, target_path)
    old = target_path.rstrip("/") + "__copy_old"
    leftover = fs.exists(Path(old))
    target_exists = fs.exists(Path(target_path))
    orphaned = leftover and not target_exists
    read_target = old if orphaned else target_path

    def rows(path):
        pk = read_partkey_table(spark, path)
        return (pk.where((F.col("last_ts") >= start_ms)
                         & (F.col("first_ts") < end_ms))
                .select("_sk", "first_ts", "last_ts"))
    # the six counts reuse ONE read-and-merge of each table (the merge
    # aggregate is the expensive part on a large index)
    s, t = rows(source_path).cache(), rows(read_target).cache()
    sk_s, sk_t = s.select("_sk"), t.select("_sk")
    try:
        return {
            "source_keys": s.count(),
            "target_keys": t.count(),
            "source_only": s.exceptAll(t).count(),
            "target_only": t.exceptAll(s).count(),
            "series_source_only": sk_s.exceptAll(sk_t).count(),
            "series_target_only": sk_t.exceptAll(sk_s).count(),
            "orphaned_leftover": orphaned,
            "stale_backup": leftover and target_exists,
        }
    finally:
        s.unpersist()
        t.unpersist()
