"""Scale probe: repair band-copy cost vs band width.

copy_time_slice must cost one pushdown-pruned pass over the SOURCE
band plus the partitioned write — never a full-table scan: the ts band
filter reaches the parquet scan (row-group min/max skipping on the
ts-sorted layout), so copying 1 day out of N costs ~1/N of the full
copy regardless of table size. That is what makes the DR job usable on
a 100 TB store (the reference's ChunkCopier scans only the requested
ingestion-time token ranges the same way).

Usage: python scripts/scale_check_repair.py [n_rows] [n_series]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filodb_spark.operators.repair import copy_time_slice, validate_time_slice
from filodb_spark.session import get_spark
from filodb_spark.sources.table import write_series_table

HOUR = 3_600_000
T0 = 1_700_000_000_000 - (1_700_000_000_000 % (24 * HOUR))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    spark = get_spark("scale-check-repair", shuffle_partitions=32)
    days = 32
    span = days * 24 * HOUR
    src_df = (spark.range(n_rows).select(
        F.create_map(
            F.lit("__name__"),
            F.concat(F.lit("m"), (F.col("id") % 20).cast("string")),
            F.lit("_ws_"), F.lit("w"), F.lit("_ns_"),
            F.concat(F.lit("ns"), (F.col("id") % 4).cast("string")),
            F.lit("inst"),
            (F.col("id") % n_series).cast("string")).alias("labels"),
        (F.lit(T0) + (F.col("id") * (span // n_rows))).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value")))
    root = tempfile.mkdtemp(prefix="scale_repair_")
    src = os.path.join(root, "src")
    t_w = time.time()
    write_series_table(src_df, src)
    print(f"source: {n_rows} rows / {days} days "
          f"(written in {time.time() - t_w:.1f}s)")
    print(f"{'band_days':>9} {'rows':>10} {'copy_s':>7} {'validate_s':>10}")
    for band_days in (1, 4, 16):
        dst = os.path.join(root, f"dst_{band_days}")
        # target holds everything OUTSIDE the band
        write_series_table(
            src_df.where(F.col("ts") >= T0 + band_days * 24 * HOUR), dst)
        t0 = time.time()
        n = copy_time_slice(spark, src, dst, T0,
                            T0 + band_days * 24 * HOUR)
        copy_s = time.time() - t0
        t0 = time.time()
        v = validate_time_slice(spark, src, dst, T0, T0 + span)
        val_s = time.time() - t0
        assert v["source_only"] == 0 and v["target_only"] == 0, v
        print(f"{band_days:>9} {n:>10} {copy_s:>7.1f} {val_s:>10.1f}")
    print("expected: copy_s scales with the BAND, not the table "
          "(pushdown-pruned source scan + band-sized write)")


if __name__ == "__main__":
    main()
