"""Worst-case probe for dedup_clusters (VERDICT r2 item 8): how many
propagation+pointer-jump rounds does a maximally deep pair graph take?

A CHAIN of L edges (0-1, 1-2, ..., L-1-L) is the diameter-L worst case —
real near-dup components are overwhelmingly stars/cliques of diameter
1-3 (every member is a near-copy of the same template), so a long chain
only arises from drifting boilerplate where doc k resembles doc k+1 but
not doc k+2. The probe measures rounds + wall time at growing L, plus a
star-heavy "realistic" mix, to decide whether the large-star/small-star
variant (fewer rounds on chains, more total work per round) is worth
implementing.

Usage: python scripts/scale_check_cc_chain.py [chain_lengths...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    lengths = [int(x) for x in sys.argv[1:]] or [100, 1000, 10_000, 100_000]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators.dedup import dedup_clusters

    spark = filodb_spark.get_spark("scale-check-cc-chain")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for L in lengths:
        chain = spark.range(L).select(F.col("id").alias("d1"),
                                      (F.col("id") + 1).alias("d2"))
        stats: dict = {}
        t0 = time.time()
        out = dedup_clusters(chain, max_iterations=40, stats=stats)
        n = out.count()
        ok = out.agg(F.max("cluster_id").alias("m")).first().m == 0
        wall = time.time() - t0
        results.append({"shape": "chain", "edges": L, "nodes": n,
                        "rounds": stats["rounds"],
                        "single_component": bool(ok),
                        "wall_s": round(wall, 2)})
        print(json.dumps(results[-1]))

    # realistic mix: 10k star components (size 5) + one 64-deep chain
    stars = spark.range(10_000).select(
        (F.col("id") * 10).alias("hub"),
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("k"))
    stars = stars.select(F.col("hub").alias("d1"),
                         (F.col("hub") + F.col("k")).alias("d2"))
    chain = spark.range(64).select(
        (F.lit(1_000_000) + F.col("id")).alias("d1"),
        (F.lit(1_000_000) + F.col("id") + 1).alias("d2"))
    mix = stars.unionByName(chain)
    stats = {}
    t0 = time.time()
    out = dedup_clusters(mix, max_iterations=40, stats=stats)
    n_clusters = out.select("cluster_id").distinct().count()
    results.append({"shape": "mix_10k_stars_plus_64chain",
                    "edges": mix.count(), "clusters": n_clusters,
                    "rounds": stats["rounds"],
                    "wall_s": round(time.time() - t0, 2)})
    print(json.dumps(results[-1]))
    print(json.dumps({"probe": "cc_chain", "results": results}))


if __name__ == "__main__":
    main()
