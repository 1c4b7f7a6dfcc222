"""Scale probe: BPE tokenizer-training primitives (r12).

The 100 TB claim for bpe_pair_counts / bpe_learn_merges: corpus size
is paid ONCE (the word-count hash aggregate); all pair counting and
re-segmentation run on the DISTINCT vocabulary, whose size is
corpus-sublinear (Heaps' law) and alphabet-bounded on the pair axis.
This probe sweeps corpus size with a FIXED vocabulary (fixture docs
replicated) and a GROWING vocabulary (suffixed replicas), and times
the training loop and the in-plan encoder separately.

Usage: python scripts/scale_check_bpe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.session import get_spark


def main():
    from pyspark.sql import functions as F

    from filodb_spark.operators.text import (bpe_encode, bpe_learn_merges,
                                             bpe_pair_counts)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-bpe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    print(f"{'mult':>5} {'rows':>9} {'vocab':>7} {'pairs_s':>8} "
          f"{'train4_s':>9} {'encode_rows_s':>13}")
    for mult, grow_vocab in ((1, False), (4, False), (16, False),
                             (16, True)):
        rep = docs
        for i in range(1, mult):
            nxt = docs.select("doc_id", F.concat(
                F.col("text"),
                F.lit(f" rep{i}extra") if grow_vocab else F.lit("")
            ).alias("text"))
            rep = rep.unionByName(nxt)
        rep = rep.localCheckpoint()   # isolate generation cost
        n = rep.count()
        vocab = (rep.select(F.explode(F.split(F.lower(F.trim("text")),
                                              r"\s+")).alias("w"))
                 .where(F.col("w") != "").distinct().count())
        t0 = time.monotonic()
        bpe_pair_counts(rep, top_k=200).collect()
        pairs_s = time.monotonic() - t0
        t0 = time.monotonic()
        merges = bpe_learn_merges(rep, 4)
        train_s = time.monotonic() - t0
        t0 = time.monotonic()
        bpe_encode(rep, merges).agg(F.sum("n_subwords")).first()
        enc = n / (time.monotonic() - t0)
        print(f"{mult:>4}x {n:>9} {vocab:>7} {pairs_s:>8.2f} "
              f"{train_s:>9.2f} {enc:>13.0f}", flush=True)


if __name__ == "__main__":
    main()
