"""Scale probe: winnowing near-dup pairs (r12).

The 100 TB claim for winnow_near_dup_pairs: fingerprinting is
map-only; matching is ONE equi-join on the fingerprint key, and the
stop-fingerprint df-cap (applied BEFORE the self-join) is what keeps
the join output bounded on boilerplate-heavy corpora — without it, a
fingerprint shared by d documents contributes d^2/2 join rows. This
probe replicates the fixture docs (every replica is a near-dup of its
original — the worst case for a pair finder) and times the capped vs
uncapped pair join.

Usage: python scripts/scale_check_winnow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.session import get_spark


def main():
    from pyspark.sql import functions as F

    from filodb_spark.operators.dedup import winnow_near_dup_pairs
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-winnow", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    base_n = docs.count()
    print(f"{'mult':>5} {'rows':>8} {'cap':>5} {'pairs':>10} {'wall_s':>7}")
    for mult in (1, 4, 8):
        rep = docs
        for i in range(1, mult):
            rep = rep.unionByName(docs.select(
                (F.col("doc_id") + base_n * i).alias("doc_id"), "text"))
        rep = rep.localCheckpoint()
        n = rep.count()
        for cap in (50, None):
            if cap is None and mult > 4:
                print(f"{mult:>4}x {n:>8} {'none':>5} "
                      f"{'(skipped: quadratic)':>10}")
                continue
            t0 = time.monotonic()
            pairs = winnow_near_dup_pairs(rep, k=8, w=4, min_shared=2,
                                          max_df=cap).count()
            wall = time.monotonic() - t0
            print(f"{mult:>4}x {n:>8} {str(cap or 'none'):>5} "
                  f"{pairs:>10} {wall:>7.2f}", flush=True)


if __name__ == "__main__":
    main()
