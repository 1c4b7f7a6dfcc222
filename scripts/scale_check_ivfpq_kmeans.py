"""Scaling probe for the TRAINED-bucket IVF x PQ variant
(ivfpq_kmeans_topk, round-5 addition): on an N-times-replicated
embedding corpus, measure

1. candidate fraction per query at n_probes=1 of 16 trained buckets —
   should track the probed clusters' mass share and stay flat as the
   corpus grows (replication preserves the density structure);
2. the 100 TB fit shape: centroids are fit ONCE on the base corpus
   (the sample-fit path — model is k x dim floats of driver state)
   and reused across every scale step, so fit cost does not appear in
   the per-scale search numbers at all;
3. search wall-clock with a prebuilt (id, codes, cluster) projection
   vs re-encoding per query batch — the same amortization claim as the
   sign-hash probe (scripts/scale_check_ivfpq.py), now with the
   trained coarse layer.

Usage: python scripts/scale_check_ivfpq_kmeans.py [sf_dir] [mult...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_BUCKETS = 16
N_PROBES = 1


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators import similarity as sim

    spark = filodb_spark.get_spark("scale-check-ivfpq-kmeans")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")

    # the sample-fit: centroids trained once on the base corpus, reused
    # at every scale (driver state = 16 x 64 doubles)
    t0 = time.time()
    cents = sim.kmeans_fit_portable(base, k=K_BUCKETS, iterations=2)
    fit_sec = time.time() - t0
    print(f"# centroid fit on base corpus: {fit_sec:.2f}s "
          f"({len(cents)} clusters)", file=sys.stderr)

    results = []
    for m in mults:
        tmp = tempfile.mkdtemp(prefix="scale_ivfpqkm_")
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
        n_q = q.count()

        # candidate fraction at n_probes=1: corpus assignment join
        # against each query's nearest cluster
        corp = tbl.select(F.col("vec_id").alias("nid"),
                          sim.kmeans_bucket_col(cents, "embedding")
                          .alias("_bucket"))
        qb = q.select(F.col("vec_id").alias("qid"),
                      F.explode(sim.kmeans_probe_col(
                          cents, "embedding", N_PROBES)).alias("_bucket"))
        cand = corp.join(qb, "_bucket").count()
        frac = cand / (n * n_q)

        # prebuilt (id, codes, cluster) projection — the stored artifact
        idx_path = tmp + "_idx"
        t0 = time.time()
        enc = sim.pq_encode(
            tbl.withColumn("_bucket",
                           sim.kmeans_bucket_col(cents, "embedding")),
            m=4, k=4, codebook=base, carry=("_bucket",))
        enc.write.mode("overwrite").partitionBy("_bucket").parquet(idx_path)
        build = time.time() - t0
        idx = spark.read.parquet(idx_path)

        # warm codegen, then timed searches
        sim.ivfpq_kmeans_topk(tbl, q, k=3, centroids=cents,
                              codebook=base, n_probes=N_PROBES,
                              n_buckets=K_BUCKETS).count()
        t0 = time.time()
        # prebuilt path: probe clusters + ADC over stored codes (reuse
        # the generic bucket-rank tail via ivfpq_topk's index= contract)
        seed = sim._pq_seeds(base, 4, "vec_id", "embedding", 6)
        qf = q.select(F.col("vec_id").alias("qid"),
                      sim._pq_lut(seed, 4, "embedding").alias("_lut"),
                      F.explode(sim.kmeans_probe_col(
                          cents, "embedding", N_PROBES)).alias("_bucket"))
        sim._adc_bucket_rank(idx, qf, 3, "vec_id", 6).count()
        stored_sec = time.time() - t0
        t0 = time.time()
        sim.ivfpq_kmeans_topk(tbl, q, k=3, centroids=cents,
                              codebook=base, n_probes=N_PROBES,
                              n_buckets=K_BUCKETS).count()
        reenc_sec = time.time() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(idx_path, ignore_errors=True)
        results.append({"mult": m, "vectors": n,
                        "candidate_frac": round(frac, 4),
                        "index_build_sec": round(build, 2),
                        "stored_search_sec": round(stored_sec, 2),
                        "reencode_search_sec": round(reenc_sec, 2)})
        print(f"# x{m}: {n} vectors, cand frac {frac:.4f} -> "
              f"build {build:.2f}s, stored-search {stored_sec:.2f}s, "
              f"re-encode search {reenc_sec:.2f}s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
