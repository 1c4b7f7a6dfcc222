"""Scaling probe for the training-data dedup path: MinHash-LSH
candidate-pair generation on N-times-replicated documents.

Replication axis = MORE DISTINCT documents with the same internal
duplicate structure: replica k shifts doc_id and applies a Caesar
rotation k to the lowercase alphabet. A character bijection maps each
document's char-shingle set 1:1, so WITHIN a replica the pairwise
Jaccard structure is exactly the base corpus's (pair count grows
linearly with the multiplier), while ACROSS replicas shingles differ
(different rotation) and stay below threshold. A super-linear
wall-clock trend would indicate the LSH band self-join degenerating
(bucket skew); linear-ish growth is the evidence it holds at 100 TB.
Max multiplier 26 (distinct rotations).

Usage: python scripts/scale_check_dedup.py [sf_dir] [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators import dedup

    spark = filodb_spark.get_spark("scale-check-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")

    results = []
    for m in mults:
        tmp = tempfile.mkdtemp(prefix="scale_dedup_")
        df = base
        if m > 26:
            raise SystemExit("max multiplier is 26 (distinct rotations)")
        alpha = "abcdefghijklmnopqrstuvwxyz"
        for k in range(1, m):
            rot = alpha[k:] + alpha[:k]
            df = df.unionByName(
                base.withColumn("doc_id", F.col("doc_id")
                                + F.lit(k * 10_000_000))
                    .withColumn("text", F.translate(
                        F.lower("text"), alpha, rot)))
        (df.repartition(spark.sparkContext.defaultParallelism)
           .write.mode("overwrite").parquet(tmp))
        tbl = spark.read.parquet(tmp)
        n = tbl.count()
        # warm codegen on the smallest shape
        dedup.minhash_lsh_pairs(tbl.limit(200), threshold=0.5).count()
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(tbl, threshold=0.5).count()
        dt = time.time() - t0
        t0 = time.time()
        verified = dedup.lsh_verified_pairs(tbl).count()
        dt_v = time.time() - t0
        from filodb_spark.operators.pipeline import incremental_dedup
        t0 = time.time()
        inc = incremental_dedup(tbl).count()
        dt_i = time.time() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        results.append({"mult": m, "docs": n, "pairs": pairs,
                        "minhash_lsh_sec": round(dt, 2),
                        "lsh_verified_pairs": verified,
                        "lsh_verified_sec": round(dt_v, 2),
                        "incremental_rows": inc,
                        "incremental_sec": round(dt_i, 2)})
        print(f"# x{m}: {n} docs -> {pairs} pairs {dt:.2f}s; "
              f"verified {verified} {dt_v:.2f}s; incr {inc} {dt_i:.2f}s",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
