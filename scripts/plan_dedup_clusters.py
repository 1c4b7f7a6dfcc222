"""Capture the per-round physical plan of dedup_clusters' propagation
step (old vs new form) to verify the edge-side Exchange claim.

Builds a small synthetic pair set, materializes the edge checkpoint the
way each implementation does, then explains ONE round's labels plan.
Prints both plans; grep for Exchange.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    import filodb_spark
    spark = filodb_spark.get_spark("plan-dedup-clusters")
    spark.sparkContext.setLogLevel("ERROR")

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 2000, 2)] +
        [(i, i + 2) for i in range(0, 1000, 4)],
        "d1 long, d2 long")

    def one_round_old():
        edges = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
                 .unionByName(pairs.select(F.col("d2").alias("a"),
                                           F.col("d1").alias("b")))
                 .distinct()
                 .localCheckpoint(eager=True))
        labels = (edges.select(F.col("a").alias("n"))
                  .unionByName(edges.select(F.col("b").alias("n")))
                  .distinct()
                  .select("n", F.col("n").alias("lbl"))
                  .localCheckpoint(eager=True))
        prop = (edges.join(labels, edges["a"] == labels["n"])
                .select(F.col("b").alias("n"), F.col("lbl")))
        new = (labels.unionByName(prop)
               .groupBy("n").agg(F.min("lbl").alias("lbl")))
        jump = new.select(F.col("n").alias("__jn"),
                          F.col("lbl").alias("__jlbl"))
        return (new.join(jump, new["lbl"] == jump["__jn"])
                .select(new["n"].alias("n"),
                        F.least(new["lbl"], jump["__jlbl"]).alias("lbl")))

    def one_round_old_probe():
        # the OLD convergence probe: labels x prev join
        labels_new = one_round_old().localCheckpoint(eager=True)
        prev = (one_round_old().localCheckpoint(eager=True)
                .select(F.col("n").alias("__pn"), F.col("lbl").alias("__plbl")))
        return (labels_new.join(prev, labels_new["n"] == prev["__pn"])
                .where(labels_new["lbl"] != F.col("__plbl")))

    def one_round_new():
        edges = (pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
                 .unionByName(pairs.select(F.col("d2").alias("a"),
                                           F.col("d1").alias("b")))
                 .distinct()
                 .localCheckpoint(eager=True))
        labels = (edges.select(F.col("a").alias("n"))
                  .distinct()
                  .select("n", F.col("n").alias("lbl"))
                  .localCheckpoint(eager=True))
        prop = (edges.join(labels, edges["a"] == labels["n"])
                .select(F.col("b").alias("n"), F.col("lbl"),
                        F.lit(False).alias("__s")))
        new = (labels.select("n", "lbl", F.lit(True).alias("__s"))
               .unionByName(prop)
               .groupBy("n").agg(
                   F.min("lbl").alias("lbl"),
                   F.min(F.when(F.col("__s"), F.col("lbl"))).alias("__prev")))
        jump = new.select(F.col("n").alias("__jn"),
                          F.col("lbl").alias("__jlbl"))
        return (new.join(jump, new["lbl"] == jump["__jn"])
                .select(new["n"].alias("n"),
                        F.least(new["lbl"], jump["__jlbl"]).alias("lbl"),
                        new["__prev"].alias("__prev")))

    def one_round_new_probe():
        labels = one_round_new().localCheckpoint(eager=True)
        return labels.where(F.col("lbl") != F.col("__prev"))

    for name, fn in (("OLD", one_round_old),
                     ("OLD-PROBE", one_round_old_probe),
                     ("NEW", one_round_new),
                     ("NEW-PROBE", one_round_new_probe)):
        df = fn()
        print(f"\n===== {name} plan =====")
        df.explain("formatted")


if __name__ == "__main__":
    main()
