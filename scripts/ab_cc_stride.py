"""Interleaved A/B for the r14 dedup_clusters stride-2 change (VERDICT
item 9): two propagation steps per checkpoint/probe vs the r13 one-step
form, loop-only (the pairs input is checkpointed once and shared by both
arms), plus a row-equality assertion.

Usage: python scripts/ab_cc_stride.py [--sf /root/testdata/sf0.1] [--runs 7]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_clusters_r13(pairs: DataFrame, d1="d1", d2="d2",
                       max_iterations=25, stats=None) -> DataFrame:
    """The r13 one-step-per-probe form, verbatim (A/B arm only)."""
    edges = (pairs.select(F.col(d1).alias("a"), F.col(d2).alias("b"))
             .unionByName(
                 pairs.select(F.col(d2).alias("a"), F.col(d1).alias("b")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("a").alias("n"))
              .distinct()
              .select("n", F.col("n").alias("lbl"))
              .localCheckpoint(eager=True))
    converged = False
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        prop = (edges.join(labels, edges["a"] == labels["n"])
                .select(F.col("b").alias("n"), F.col("lbl"),
                        F.lit(False).alias("__s")))
        new = (labels.select("n", "lbl", F.lit(True).alias("__s"))
               .unionByName(prop)
               .groupBy("n").agg(
                   F.min("lbl").alias("lbl"),
                   F.min(F.when(F.col("__s"), F.col("lbl")))
                   .alias("__prev")))
        jump = new.select(F.col("n").alias("__jn"),
                          F.col("lbl").alias("__jlbl"))
        labels = (new.join(jump, new["lbl"] == jump["__jn"])
                  .select(new["n"].alias("n"),
                          F.least(new["lbl"], jump["__jlbl"]).alias("lbl"),
                          new["__prev"].alias("__prev"))
                  .localCheckpoint(eager=True))
        if labels.where(~F.col("lbl").eqNullSafe(F.col("__prev"))).isEmpty():
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError("did not converge")
    return labels.select(F.col("n").alias("doc_id"),
                         F.col("lbl").alias("cluster_id"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()

    import filodb_spark
    from filodb_spark.operators import dedup
    spark = filodb_spark.get_spark("ab-cc-stride")
    spark.sparkContext.setLogLevel("ERROR")

    d = spark.read.parquet(f"{args.sf}/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(d, 0.4, ("lang", "source")) \
        .localCheckpoint(eager=True)

    s_old: dict = {}
    s_new: dict = {}
    old = {(r.doc_id, r.cluster_id)
           for r in dedup_clusters_r13(pairs, stats=s_old).collect()}
    new = {(r.doc_id, r.cluster_id)
           for r in dedup.dedup_clusters(pairs, stats=s_new).collect()}
    assert old == new, (len(old), len(new))
    print(f"# equality OK: {len(old)} labels; "
          f"r13 rounds={s_old['rounds']} r14 steps={s_new['rounds']}")

    arms = {"r13-stride1": lambda: dedup_clusters_r13(pairs),
            "r14-stride2": lambda: dedup.dedup_clusters(pairs)}
    times = {k: [] for k in arms}
    for _ in range(args.runs):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab_cc:{name}")
            t0 = time.time()
            fn().count()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s "
              f"min {min(ts):.3f}s all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
