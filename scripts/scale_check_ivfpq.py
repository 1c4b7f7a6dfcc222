"""Scaling probe for the composed IVF x PQ index (r3 verdict item 3):
on an N-times-replicated embedding corpus, measure

1. candidate fraction — the share of the corpus each query actually
   ADC-scores. Should track n_probes / 2^6 (the sign-bucket space) and
   stay flat as the corpus grows: the sub-linear claim.
2. SEARCH wall-clock against a PREBUILT index (ivfpq_index written to
   parquet partitioned by bucket, read back) vs pq_topk's full ADC
   scan over the same prebuilt codes and vs ivf_topk_portable's
   float-distance bucket scan. Build time is reported separately —
   at 100 TB the index is written once and searched forever, so the
   search-side slope is the claim: ivfpq touches ~n_probes/64 of the
   codes while pq-full touches all of them.

Usage: python scripts/scale_check_ivfpq.py [sf_dir] [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROBES = 4
BUCKETS = 64    # 2^_SIGN_BITS


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators import similarity as sim

    spark = filodb_spark.get_spark("scale-check-ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")

    results = []
    for m in mults:
        tmp = tempfile.mkdtemp(prefix="scale_ivfpq_")
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

        # candidate fraction: pairs entering ADC scoring per query
        b = sim.sign_bucket("embedding")
        corp = tbl.select(F.col("vec_id").alias("nid"), b.alias("_bucket"))
        probes = F.array(*[b.bitwiseXOR(0 if p == 0 else 1 << (p - 1))
                           for p in range(N_PROBES)])
        qb = q.select(F.col("vec_id").alias("qid"),
                      F.explode(probes).alias("_bucket"))
        cand = corp.join(qb, "_bucket").count()
        frac = cand / (n * n_q)

        # build the stored index once (the amortized cost), search many
        idx_path = tmp + "_idx"
        t0 = time.time()
        (sim.ivfpq_index(tbl).write.mode("overwrite")
            .partitionBy("_bucket").parquet(idx_path))
        build = time.time() - t0
        idx = spark.read.parquet(idx_path)

        # warm codegen
        sim.ivfpq_topk(tbl, q, k=3, n_probes=N_PROBES,
                       index=idx.limit(500)).count()
        t0 = time.time()
        sim.ivfpq_topk(tbl, q, k=3, n_probes=N_PROBES, index=idx).count()
        ivfpq = time.time() - t0
        t0 = time.time()
        sim.pq_topk(tbl, q, k=3, encoded=idx.drop("_bucket")).count()
        pq = time.time() - t0
        t0 = time.time()
        sim.ivf_topk_portable(tbl, q, k=3, n_probes=N_PROBES).count()
        ivf = time.time() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(idx_path, ignore_errors=True)
        results.append({"mult": m, "vectors": n,
                        "candidate_frac": round(frac, 4),
                        "expected_frac": round(N_PROBES / BUCKETS, 4),
                        "index_build_sec": round(build, 2),
                        "ivfpq_search_sec": round(ivfpq, 2),
                        "pq_full_scan_sec": round(pq, 2),
                        "ivf_float_sec": round(ivf, 2)})
        print(f"# x{m}: {n} vectors, cand frac {frac:.4f} "
              f"(expect ~{N_PROBES / BUCKETS:.4f}) -> build {build:.2f}s, "
              f"ivfpq {ivfpq:.2f}s, pq-full {pq:.2f}s, "
              f"ivf-float {ivf:.2f}s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
