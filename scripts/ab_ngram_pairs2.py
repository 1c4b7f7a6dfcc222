"""Interleaved A/B round 2 for ngram_jaccard_pairs (r14, guide §3.1/§2.4).

Variants (all proved row-equal to `old` before timing):
  old     — r13 form: shingle-explode SMJ self-join + two count join-backs
  shj     — old + SHUFFLE_HASH hint on the self-join (skip both sorts)
  carry   — per-doc distinct-shingle count carried on the exploded row
            (size of the array, known before the explode) so the two
            count join-backs disappear
  shj+carry — both
  ckpt    — old + localCheckpoint of the exploded shingle frame (shared
            materialization for the two join sides + the count agg)

Usage: python scripts/ab_ngram_pairs2.py [--sf /root/testdata/sf0.1]
           [--runs 5] [--verify-sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from filodb_spark.operators.dedup import _spread
from filodb_spark.operators.text import char_shingles


def _finish(common, cnt, id_col, threshold):
    c1 = cnt.select(F.col(id_col).alias("d1"), F.col("c").alias("c1"))
    c2 = cnt.select(F.col(id_col).alias("d2"), F.col("c").alias("c2"))
    return (common.join(c1, "d1").join(c2, "d2")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("c1") + F.col("c2") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("d1", "d2", "jaccard"))


def old_pairs(df, threshold, bucket_cols=(), id_col="doc_id",
              text_col="text", n=3, shj=False, ckpt=False):
    sh = (_spread(df, id_col)
          .select(*bucket_cols, F.col(id_col),
                  F.explode(char_shingles(F.col(text_col), n)).alias("g")))
    if ckpt:
        sh = sh.localCheckpoint(eager=True)
    cnt = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("c"))
    a = sh.alias("a")
    b = sh.hint("shuffle_hash").alias("b") if shj else sh.alias("b")
    join_cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & \
        (F.col("a.g") == F.col("b.g"))
    for bc in bucket_cols:
        join_cond = join_cond & (F.col(f"a.{bc}") == F.col(f"b.{bc}"))
    common = (a.join(b, join_cond)
              .groupBy(F.col(f"a.{id_col}").alias("d1"),
                       F.col(f"b.{id_col}").alias("d2"))
              .agg(F.count(F.lit(1)).alias("inter")))
    return _finish(common, cnt, id_col, threshold)


def carry_pairs(df, threshold, bucket_cols=(), id_col="doc_id",
                text_col="text", n=3, shj=False):
    base = (_spread(df, id_col)
            .select(*bucket_cols, F.col(id_col),
                    char_shingles(F.col(text_col), n).alias("_gs")))
    sh = base.select(*bucket_cols, F.col(id_col),
                     F.size("_gs").alias("_c"), F.explode("_gs").alias("g"))
    a = sh.alias("a")
    b = sh.hint("shuffle_hash").alias("b") if shj else sh.alias("b")
    join_cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & \
        (F.col("a.g") == F.col("b.g"))
    for bc in bucket_cols:
        join_cond = join_cond & (F.col(f"a.{bc}") == F.col(f"b.{bc}"))
    agg = (a.join(b, join_cond)
           .groupBy(F.col(f"a.{id_col}").alias("d1"),
                    F.col(f"b.{id_col}").alias("d2"))
           .agg(F.count(F.lit(1)).alias("inter"),
                F.min(f"a._c").alias("c1"), F.min(f"b._c").alias("c2")))
    return (agg.withColumn("jaccard", F.round(
        F.col("inter") / (F.col("c1") + F.col("c2") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard"))


VARIANTS = {
    "old": lambda d, t, bc: old_pairs(d, t, bc),
    "shj": lambda d, t, bc: old_pairs(d, t, bc, shj=True),
    "carry": lambda d, t, bc: carry_pairs(d, t, bc),
    "shj+carry": lambda d, t, bc: carry_pairs(d, t, bc, shj=True),
    "ckpt": lambda d, t, bc: old_pairs(d, t, bc, ckpt=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--verify-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.4)
    args = ap.parse_args()

    import filodb_spark
    spark = filodb_spark.get_spark("ab-ngram-pairs2")
    spark.sparkContext.setLogLevel("ERROR")
    bc = ("lang", "source")

    d01 = spark.read.parquet(f"{args.verify_sf}/documents.parquet")
    ref = {tuple(r) for r in VARIANTS["old"](d01, args.threshold, bc).collect()}
    for name, fn in VARIANTS.items():
        if name == "old":
            continue
        got = {tuple(r) for r in fn(d01, args.threshold, bc).collect()}
        assert got == ref, (name, len(ref), len(got))
        print(f"# equality OK {name} @{args.verify_sf}: {len(ref)} pairs")

    d = spark.read.parquet(f"{args.sf}/documents.parquet")
    for name, fn in VARIANTS.items():   # warm every arm once
        fn(d, args.threshold, bc).count()
    times = {k: [] for k in VARIANTS}
    for _ in range(args.runs):
        for name, fn in VARIANTS.items():
            spark.sparkContext.setJobDescription(f"ab_ngram2:{name}")
            t0 = time.time()
            fn(d, args.threshold, bc).count()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s "
              f"all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
