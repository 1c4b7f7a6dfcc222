"""Scaling probe: as-of join wall-clock vs input size.

The union+carry-forward window shape must scale ~linearly in rows per
key partition (one shuffle + one sort); a range join would grow with
|left| x |right-per-key| instead.

Usage: python scripts/scale_check_asof.py [multipliers...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    base_rows = 250_000

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators.timeseries import asof_join

    spark = filodb_spark.get_spark("scale-check-asof")
    spark.sparkContext.setLogLevel("ERROR")

    for m in mults:
        n = base_rows * m
        keys = 1000 * m                     # rows-per-key held constant
        left = (spark.range(n).select(
            (F.col("id") % keys).alias("k"),
            (F.col("id") * 37 % 1_000_000).alias("ts"),
            F.col("id").cast("double").alias("lv")))
        right = (spark.range(n).select(
            (F.col("id") % keys).alias("k"),
            (F.col("id") * 53 % 1_000_000).alias("ts"),
            F.col("id").cast("double").alias("rv")))
        out = asof_join(left.groupBy("k", "ts").agg(F.max("lv").alias("lv")),
                        right.groupBy("k", "ts").agg(F.max("rv").alias("rv")),
                        ["k"], payload_cols=["rv"],
                        tolerance_ms=100_000)
        out.count()                         # warm
        t0 = time.time()
        cnt = out.count()
        print(f"x{m}: rows={2 * n} wall={time.time() - t0:.2f}s out={cnt}")


if __name__ == "__main__":
    main()
