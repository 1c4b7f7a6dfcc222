"""Scale probe: C4 repeated-span dedup (r13).

The 100 TB claim for c4_span_dedup: span fingerprints go through ONE
partial-aggregatable groupBy (min + count combine map-side) and one
equi-join back — duplicate-group SIZE only affects the removal list,
which is linear in occurrences, never the d^2 pair blow-up a
join-on-fingerprint dedup would pay. This probe replicates the
augmented corpus (every replica duplicates EVERY span — the worst
case: duplicate-group size grows with the multiplier) and checks wall
grows ~linearly, not quadratically.

Usage: python scripts/scale_check_span_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.session import get_spark


def main():
    from pyspark.sql import functions as F

    from filodb_spark.driver_queries.pipeline_ops import _aug_multiline
    from filodb_spark.operators.pipeline import c4_span_dedup
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-span-dedup", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = _aug_multiline(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text"))
    n0 = docs.count()
    print(f"{'mult':>5} {'rows':>8} {'removed_lines':>13} {'wall_s':>7}")
    for mult in (1, 4, 16):
        rep = docs
        for i in range(1, mult):
            rep = rep.unionByName(docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                "text"))
        rep = rep.localCheckpoint()
        t0 = time.monotonic()
        out = c4_span_dedup(rep, span=2)
        agg = out.agg(F.sum("n_lines").alias("nl"),
                      F.sum("n_lines_kept").alias("nk")).first()
        wall = time.monotonic() - t0
        print(f"{mult:>4}x {mult * n0:>8} {agg['nl'] - agg['nk']:>13} "
              f"{wall:>7.2f}", flush=True)


if __name__ == "__main__":
    main()
