"""Scale probe: cardbuster rewrite cost is scoped to affected shards.

PerShardCardinalityBuster deletes per shard — untouched shards are
never read. The Spark analog prunes the antijoin rewrite to the shard
partitions (`_ws_=/_ns_=`) that contain doomed series and swaps only
those directories. This probe holds the DOOMED set fixed (one bulk
workspace) and sweeps the number of UNTOUCHED workspaces; the bust
wall time and rewritten-partition count must stay flat while the
table grows.

Usage: python scripts/scale_check_cardbuster.py [n_cold_ws...]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filodb_spark.operators.cardbuster import bust_series_rows
from filodb_spark.session import get_spark
from filodb_spark.sources.table import write_series_table

SERIES_PER_WS = 50
SAMPLES = 200


def corpus(spark, n_cold: int):
    n_ws = n_cold + 1
    n = n_ws * SERIES_PER_WS * SAMPLES
    return (spark.range(n)
            .select(F.create_map(
                        F.lit("__name__"), F.lit("m"),
                        F.lit("_ws_"),
                        F.when((F.col("id") % n_ws) == 0, F.lit("bulk_ws"))
                         .otherwise(F.concat(F.lit("ws_"),
                                             (F.col("id") % n_ws)
                                             .cast("string"))),
                        F.lit("_ns_"), F.lit("app"),
                        F.lit("instance"),
                        ((F.col("id") / n_ws).cast("long") % SERIES_PER_WS)
                        .cast("string")).alias("labels"),
                    (F.lit(1_700_000_000_000)
                     + (F.col("id") / (n_ws * SERIES_PER_WS)).cast("long")
                     * 60_000)
                    .alias("ts"),
                    (F.col("id") % 7).cast("double").alias("value")))


def main() -> None:
    sweeps = [int(x) for x in sys.argv[1:]] or [1, 8, 64]
    spark = get_spark("scale-check-cardbuster", shuffle_partitions=32)
    root = tempfile.mkdtemp(prefix="scale_bust_")
    print(f"{'cold_ws':>8} {'rows':>10} {'bust_s':>8} {'parts_rw':>9} "
          f"{'untouched_files_kept':>21}")
    for n_cold in sweeps:
        path = os.path.join(root, f"series_{n_cold}")
        df = corpus(spark, n_cold)
        write_series_table(df, path)
        before = set(glob.glob(path + "/_ws_=ws_*/**/*.parquet",
                               recursive=True))
        t0 = time.time()
        stats = bust_series_rows(spark, path, [{"_ws_": "bulk_ws"}],
                                 simulate=False)
        dt = time.time() - t0
        after = set(glob.glob(path + "/_ws_=ws_*/**/*.parquet",
                              recursive=True))
        kept = after == before
        n_rows = (n_cold + 1) * SERIES_PER_WS * SAMPLES
        print(f"{n_cold:>8} {n_rows:>10} {dt:>8.2f} "
              f"{stats['partitions_rewritten']:>9} {str(kept):>21}")
        assert stats["partitions_rewritten"] == 1
        assert kept, "untouched shard partitions were rewritten"
    print("expected: bust_s ~flat while cold_ws (table size) grows 64x")


if __name__ == "__main__":
    main()
