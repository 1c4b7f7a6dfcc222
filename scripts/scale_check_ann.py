"""Scaling probe for similarity search: brute-force cosine top-k vs
multi-probe IVF on an N-times-replicated embedding corpus (vec_id
shifts; per-replica deterministic sign flip of one dimension keeps
replicas from being bit-identical). Brute force is O(|Q| x N); IVF
should grow markedly slower (each query scans ~n_probes/n_buckets of
the corpus). The gap widening with N is the 100 TB story.

Usage: python scripts/scale_check_ann.py [sf_dir] [multipliers...]
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
    from filodb_spark.operators import similarity as sim

    spark = filodb_spark.get_spark("scale-check-ann")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")

    results = []
    for m in mults:
        tmp = tempfile.mkdtemp(prefix="scale_ann_")
        df = base
        for k in range(1, m):
            flip = F.transform(
                "embedding",
                lambda x, i: F.when(i == k % 100, -x).otherwise(x))
            df = df.unionByName(
                base.withColumn("vec_id", F.col("vec_id")
                                + F.lit(k * 10_000_000))
                    .withColumn("embedding", flip))
        (df.repartition(spark.sparkContext.defaultParallelism)
           .write.mode("overwrite").parquet(tmp))
        tbl = spark.read.parquet(tmp)
        n = tbl.count()
        q = tbl.where(F.col("vec_id") < 10)
        # warm codegen
        sim.brute_force_topk(tbl.limit(500), q, k=3).count()
        sim.ivf_topk(tbl.limit(500), q, k=3).count()
        t0 = time.time()
        sim.brute_force_topk(tbl, q, k=3).count()
        bf = time.time() - t0
        t0 = time.time()
        sim.ivf_topk(tbl, q, k=3).count()
        ivf = time.time() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        results.append({"mult": m, "vectors": n,
                        "bruteforce_sec": round(bf, 2),
                        "ivf_sec": round(ivf, 2)})
        print(f"# x{m}: {n} vectors -> brute {bf:.2f}s, ivf {ivf:.2f}s",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
