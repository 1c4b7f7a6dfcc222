"""Interleaved A/B for the r14 ngram_jaccard_pairs rewrite (guide §2.4/§3).

OLD: shingle-explode self-join on (bucket, g) with a.id < b.id — the SMJ
enumerates the full d^2 merge rows per shingle group before the `<`
filter (28.9M at sf0.1 vs the 14.1M i<j rows that survive), sorts both
join sides, and joins the per-doc counts back twice.

NEW: posting-list pair generation — group the exploded shingles by
(bucket, g) into a sorted id list, emit exactly the i<j pairs map-side
from each list, and carry the per-doc distinct-shingle count on the row
(size of the shingle array, known BEFORE the explode) so the jaccard
denominator needs no join back.

Usage: python scripts/ab_ngram_pairs.py [--sf /root/testdata/sf0.1]
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


def old_pairs(df: DataFrame, threshold: float, bucket_cols=(),
              id_col="doc_id", text_col="text", n=3) -> DataFrame:
    """The r13 form, inlined verbatim for the comparison."""
    sh = (_spread(df, id_col)
          .select(*bucket_cols, F.col(id_col),
                  F.explode(char_shingles(F.col(text_col), n)).alias("g")))
    cnt = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("c"))
    a = sh.alias("a")
    b = sh.alias("b")
    join_cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & \
        (F.col("a.g") == F.col("b.g"))
    for bc in bucket_cols:
        join_cond = join_cond & (F.col(f"a.{bc}") == F.col(f"b.{bc}"))
    common = (a.join(b, join_cond)
              .groupBy(F.col(f"a.{id_col}").alias("d1"),
                       F.col(f"b.{id_col}").alias("d2"))
              .agg(F.count(F.lit(1)).alias("inter")))
    c1 = cnt.select(F.col(id_col).alias("d1"), F.col("c").alias("c1"))
    c2 = cnt.select(F.col(id_col).alias("d2"), F.col("c").alias("c2"))
    return (common.join(c1, "d1").join(c2, "d2")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("c1") + F.col("c2") - F.col("inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("d1", "d2", "jaccard"))


def new_pairs(df: DataFrame, threshold: float, bucket_cols=(),
              id_col="doc_id", text_col="text", n=3) -> DataFrame:
    """Posting-list form (the r14 candidate)."""
    base = (_spread(df, id_col)
            .select(*bucket_cols, F.col(id_col),
                    char_shingles(F.col(text_col), n).alias("_gs")))
    sh = base.select(*bucket_cols, F.col(id_col),
                     F.size("_gs").alias("_c"), F.explode("_gs").alias("g"))
    posting = (sh.groupBy(*bucket_cols, "g")
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col(id_col).alias("i"),
                            F.col("_c").alias("c")))).alias("ps"))
               .where(F.size("ps") >= 2))
    pairs = posting.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps) - i - 1), "
        "y -> struct(x.i AS d1, y.i AS d2, x.c AS c1, y.c AS c2))))"
    )).alias("p")).where(F.col("p.d1") < F.col("p.d2"))
    agg = (pairs.groupBy(F.col("p.d1").alias("d1"),
                         F.col("p.d2").alias("d2"))
           .agg(F.count(F.lit(1)).alias("inter"),
                F.min("p.c1").alias("c1"), F.min("p.c2").alias("c2")))
    return (agg.withColumn("jaccard", F.round(
        F.col("inter") / (F.col("c1") + F.col("c2") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--verify-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--threshold", type=float, default=0.4)
    args = ap.parse_args()

    import filodb_spark
    spark = filodb_spark.get_spark("ab-ngram-pairs")
    spark.sparkContext.setLogLevel("ERROR")

    bc = ("lang", "source")

    # --- row-for-row equality at both verify SFs -------------------------
    for vsf in (args.verify_sf, args.sf):
        d = spark.read.parquet(f"{vsf}/documents.parquet")
        for thr in (args.threshold, 0.7):
            o = {tuple(r) for r in old_pairs(d, thr, bc).collect()}
            nw = {tuple(r) for r in new_pairs(d, thr, bc).collect()}
            assert o == nw, (vsf, thr, len(o), len(nw),
                             list(o - nw)[:3], list(nw - o)[:3])
            print(f"# equality OK {vsf} thr={thr}: {len(o)} pairs")

    d = spark.read.parquet(f"{args.sf}/documents.parquet")
    # warm both arms
    old_pairs(d, args.threshold, bc).count()
    new_pairs(d, args.threshold, bc).count()

    times = {"old": [], "new": []}
    for _ in range(args.runs):
        for label, fn in (("old", old_pairs), ("new", new_pairs)):
            spark.sparkContext.setJobDescription(f"ab_ngram:{label}")
            t0 = time.time()
            fn(d, args.threshold, bc).count()
            times[label].append(time.time() - t0)
    for label, ts in times.items():
        print(f"{label}: median {statistics.median(ts):.3f}s "
              f"all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
