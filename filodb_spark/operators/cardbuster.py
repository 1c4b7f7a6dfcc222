"""Cardinality buster: delete series by label filters within a time band.

Re-expression of the reference's spark-job
`spark-jobs/src/main/scala/filodb/cardbuster/PerShardCardinalityBuster.scala`
(driver `CadinalityBusterMain.scala`) — the incident-response tool for a
cardinality explosion: given label filters and a start/end-time band,
remove the matching part keys (and, beyond the reference, the matching
sample rows — the reference leaves chunk data to Cassandra TTL; a
parquet store has no TTL, so the data-side antijoin rewrite lives here
too).

Semantics (PerShardCardinalityBuster.bustIndexRecords):
- `delete_filters`: a list of {label: value-regex} maps. A series is
  deleted when AT LEAST ONE map matches, where a map matches when ALL
  its (label -> regex) entries fully match the series' labels
  (`filter.exists { _.forall { ... matcher(pkVal).matches } }`,
  PerShardCardinalityBuster.scala:96-102 — `matches` is fully
  anchored, like every matcher in the engine).
- time band: candidates are part keys with
  start_gte <= first_ts <= start_lte AND end_gte <= last_ts <= end_lte
  (`scanPartKeysByStartEndTimeRange`, :84-85); None bounds are open.
- `simulate=True` (the reference's isSimulation, default there too)
  counts what WOULD be deleted without touching storage.

Scale shape: filter evaluation is a predicate pushed onto the O(series)
part-key table; the data rewrite reads ONLY the shard partitions
(`_ws_=/_ns_=`) that contain doomed series (partition pruning), drops
doomed rows with a hash anti-join on the stored series key, and swaps
the rewritten directories via the Hadoop FileSystem API — untouched
shard partitions are never opened.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from filodb_spark.partkey import (partkey_from_samples, read_partkey_table,
                                  write_partkey_table)
from filodb_spark.sources.table import (SHARD_KEY_LABELS, escape_path_name,
                                        hadoop_fs)


def delete_filter_predicate(delete_filters: list[dict[str, str]]) -> Column:
    """OR-of-AND label-regex predicate over a `labels` map column
    (PerShardCardinalityBuster.scala:96-102: at least one filter map
    matches; a map matches when every entry's regex fully matches)."""
    if not delete_filters:
        raise ValueError("delete_filters should be non-empty")
    any_filter = F.lit(False)
    for filt in delete_filters:
        all_tags = F.lit(True)
        for label, regex in filt.items():
            lv = F.coalesce(F.col("labels")[label], F.lit(""))
            all_tags = all_tags & lv.rlike(f"^(?:{regex})$")
        any_filter = any_filter | all_tags
    return any_filter


def _band(col: Column, gte: int | None, lte: int | None) -> Column:
    cond = F.lit(True)
    if gte is not None:
        cond = cond & (col >= gte)
    if lte is not None:
        cond = cond & (col <= lte)
    return cond


def split_part_keys(pk: DataFrame, delete_filters: list[dict[str, str]],
                    start_gte: int | None = None,
                    start_lte: int | None = None,
                    end_gte: int | None = None,
                    end_lte: int | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    """(survivors, doomed) over part-key rows. Doomed = in the time band
    AND matching the delete filters; everything else survives."""
    in_band = _band(F.col("first_ts"), start_gte, start_lte) & \
        _band(F.col("last_ts"), end_gte, end_lte)
    doom = in_band & delete_filter_predicate(delete_filters)
    return pk.where(~doom), pk.where(doom)


def bust_part_keys(spark: SparkSession, partkey_path: str,
                   delete_filters: list[dict[str, str]],
                   start_gte: int | None = None,
                   start_lte: int | None = None,
                   end_gte: int | None = None,
                   end_lte: int | None = None,
                   simulate: bool = True,
                   shard_labels: tuple[str, ...] = SHARD_KEY_LABELS
                   ) -> dict[str, int]:
    """Bust index records: remove matching series from the part-key
    table (the reference job's whole scope — it deletes part keys, not
    chunks). Returns {"candidates": n, "deleted": m}; with
    simulate=True nothing is rewritten (isSimulation parity)."""
    # BEFORE reading: recover a leftover __busted_old from a prior hard
    # crash (it may hold the only copy of the table)
    from filodb_spark.partkey import recover_table_dir
    fs, Path = hadoop_fs(spark, partkey_path)
    recover_table_dir(fs, Path, partkey_path,
                      partkey_path.rstrip("/") + "__busted_old")
    pk = read_partkey_table(spark, partkey_path)
    survivors, doomed = split_part_keys(pk, delete_filters, start_gte,
                                        start_lte, end_gte, end_lte)
    in_band = pk.where(_band(F.col("first_ts"), start_gte, start_lte)
                       & _band(F.col("last_ts"), end_gte, end_lte))
    n_candidates = in_band.count()
    n_doomed = doomed.count()
    if not simulate and n_doomed:
        _swap_rewrite_partkeys(spark, partkey_path, survivors, shard_labels)
    return {"candidates": n_candidates, "deleted": n_doomed}


def _swap_rewrite_partkeys(spark: SparkSession, path: str,
                           survivors: DataFrame,
                           shard_labels: tuple[str, ...]) -> None:
    from filodb_spark import partkey as pkmod
    out = pkmod._with_shard_cols(survivors, shard_labels)
    out = out.withColumn("_metric", F.col("labels")["__name__"])
    fs, Path = hadoop_fs(spark, path)
    tmp = path.rstrip("/") + "__busting"
    old = path.rstrip("/") + "__busted_old"
    try:
        (out.repartition(*[F.col(c) for c in shard_labels])
            .sortWithinPartitions("_metric", "_sk")
            .write.mode("overwrite").partitionBy(*shard_labels).parquet(tmp))
        # checked renames + leftover preflight (Hadoop reports rename
        # failure by RETURN VALUE — the unchecked swap could silently
        # no-op, delete the leftover, and report the bust successful
        # while every doomed series survived)
        pkmod.swap_table_dir(fs, Path, tmp, path, old)
    except BaseException:
        # same restore discipline as compact_partkey_table: never leave
        # nothing at `path` after a mid-swap failure
        if not fs.exists(Path(path)) and fs.exists(Path(old)):
            pkmod.checked_rename(fs, Path, old, path)
        fs.delete(Path(tmp), True)
        raise


def bust_series_rows(spark: SparkSession, table_path: str,
                     delete_filters: list[dict[str, str]],
                     start_gte: int | None = None,
                     start_lte: int | None = None,
                     end_gte: int | None = None,
                     end_lte: int | None = None,
                     simulate: bool = True,
                     partkey_df: DataFrame | None = None,
                     shard_labels: tuple[str, ...] = SHARD_KEY_LABELS
                     ) -> dict[str, int]:
    """Data-side bust: antijoin-rewrite ONLY the shard partitions that
    hold doomed series, dropping their sample rows. The reference has
    no data-side step (Cassandra TTL reclaims chunks); in a parquet
    store this completes the incident response next to
    expire_partitions (time-based) — this is the series-based axis.

    partkey_df: per-series spans used for the time band; derived from
    the table itself when no part-key table is attached (one O(samples)
    aggregate — attach the index to skip it).

    Returns {"series_deleted": n, "rows_deleted": m,
    "partitions_rewritten": k}."""
    data = spark.read.parquet(table_path)
    pk = partkey_df if partkey_df is not None else \
        partkey_from_samples(data.select("labels", "ts"))
    _, doomed = split_part_keys(pk, delete_filters, start_gte, start_lte,
                                end_gte, end_lte)
    doomed_keys = doomed.select("_sk", "labels")
    shard_vals = [tuple(r[lab] for lab in shard_labels) for r in
                  (doomed_keys.select(
                      *[F.coalesce(F.col("labels")[lab], F.lit("__none__"))
                        .alias(lab) for lab in shard_labels])
                   .distinct().collect())]
    n_series = doomed_keys.count()
    if not shard_vals:
        return {"series_deleted": 0, "rows_deleted": 0,
                "partitions_rewritten": 0}
    affected = F.lit(False)
    for vals in shard_vals:
        cond = F.lit(True)
        for lab, v in zip(shard_labels, vals):
            cond = cond & (F.col(lab) == v)
        affected = affected | cond
    scoped = data.where(affected)  # partition-pruned to affected shards
    n_rows = scoped.join(doomed_keys.select("_sk").hint("broadcast")
                         if n_series <= 100_000 else doomed_keys.select("_sk"),
                         "_sk", "semi").count()
    if simulate:
        return {"series_deleted": n_series, "rows_deleted": n_rows,
                "partitions_rewritten": len(shard_vals)}
    survivors = scoped.join(doomed_keys.select("_sk"), "_sk", "anti")
    fs, Path = hadoop_fs(spark, table_path)
    tmp = table_path.rstrip("/") + "__busting"
    (survivors
     .repartition(*[F.col(c) for c in [*shard_labels, "date"]])
     .sortWithinPartitions("_metric", "_sk", "ts")
     .write.mode("overwrite").partitionBy(*shard_labels, "date")
     .parquet(tmp))
    root = table_path.rstrip("/")
    for vals in shard_vals:
        # escape values exactly as Spark's partitionBy writer does, so a
        # _ws_/_ns_ containing '/', '=', '%', ':' still targets the dir
        # Spark actually wrote (the unescaped path would not exist, and
        # the swap would silently leave the real partition untouched)
        parts = [f"{lab}={escape_path_name(v)}"
                 for lab, v in zip(shard_labels, vals)]
        rel = "/".join(parts)
        src = Path(tmp.rstrip("/") + "/" + rel)
        dst = Path(root + "/" + rel)
        fs.delete(dst, True)
        if fs.exists(src):
            fs.rename(src, dst)
        else:
            # every row in this shard partition was doomed — the delete
            # removed the leaf dir; prune now-empty ancestor dirs too
            for i in range(len(parts) - 1, 0, -1):
                parent = Path(root + "/" + "/".join(parts[:i]))
                if fs.exists(parent) and \
                        len(fs.listStatus(parent)) == 0:
                    fs.delete(parent, True)
    fs.delete(Path(tmp), True)
    return {"series_deleted": n_series, "rows_deleted": n_rows,
            "partitions_rewritten": len(shard_vals)}


def bust(spark: SparkSession, table_path: str, partkey_path: str,
         delete_filters: list[dict[str, str]],
         start_gte: int | None = None, start_lte: int | None = None,
         end_gte: int | None = None, end_lte: int | None = None,
         simulate: bool = True) -> dict[str, int]:
    """Full job (CardinalityBusterMain analog): bust the part-key index
    AND the sample rows for the same filters/band, dry-run by default.
    Run data first (it reads the index's spans), then the index."""
    pk = read_partkey_table(spark, partkey_path)
    data_stats = bust_series_rows(spark, table_path, delete_filters,
                                  start_gte, start_lte, end_gte, end_lte,
                                  simulate=simulate, partkey_df=pk)
    idx_stats = bust_part_keys(spark, partkey_path, delete_filters,
                               start_gte, start_lte, end_gte, end_lte,
                               simulate=simulate)
    return {**data_stats, "partkeys_deleted": idx_stats["deleted"],
            "partkey_candidates": idx_stats["candidates"]}
