"""Scaling probe for the round-3 second-batch operators: kmeans_portable
and token_budget_select on N-times-replicated inputs.

k-means: vectors are replicated with a deterministic per-replica offset
added to the first component (keeps cluster geometry non-degenerate
while growing the corpus linearly). Per round the work is one map-only
assignment pass + one explode/agg centroid update, so wall-clock should
grow ~linearly with data while driver state stays O(k*dim).

token-budget: documents replicated with shifted ids (quality profile is
identical per replica). The banded prefix sum must grow ~linearly; a
super-linear blowup would indicate the within-band windows are not
actually running bands-way parallel.

Usage: python scripts/scale_check_kmeans.py [sf_dir] [multipliers...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    import filodb_spark
    from functools import reduce
    from pyspark.sql import functions as F
    from filodb_spark.operators.pipeline import token_budget_select
    from filodb_spark.operators.similarity import (kmeans_portable,
                                                   pq_encode, pq_topk)

    spark = filodb_spark.get_spark("scale-check-kmeans")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    n_emb, n_docs = emb.count(), docs.count()

    def rep_emb(k: int):
        parts = [emb.select(
            (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
            F.col("embedding") if i == 0 else
            F.concat(F.array((F.element_at("embedding", 1)
                              + F.lit(float(i)) * 0.1).cast("float")),
                     F.slice("embedding", 2, 10_000)).alias("embedding"))
            for i in range(k)]
        return reduce(lambda a, b: a.unionByName(b), parts) \
            .repartition(spark.sparkContext.defaultParallelism)

    def rep_docs(k: int):
        parts = [docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text")
            for i in range(k)]
        return reduce(lambda a, b: a.unionByName(b), parts) \
            .repartition(spark.sparkContext.defaultParallelism)

    out = {"sf_dir": sf_dir, "base_vectors": n_emb, "base_docs": n_docs,
           "points": []}
    for k in mults:
        e = rep_emb(k).localCheckpoint(eager=True)
        d = rep_docs(k).localCheckpoint(eager=True)
        t0 = time.time()
        asg = kmeans_portable(e, k=8, iterations=2)
        n_asg = asg.count()
        t_km = round(time.time() - t0, 2)
        t0 = time.time()
        sel = token_budget_select(d, budget=20_000 * k)
        n_sel = sel.count()
        t_tb = round(time.time() - t0, 2)
        t0 = time.time()
        n_pq = pq_encode(e, m=4, k=4).count()
        t_pq = round(time.time() - t0, 2)
        t0 = time.time()
        q = e.where(F.col("vec_id") < 10)
        n_adc = pq_topk(e, q, k=3, m=4, n_codes=4).count()
        t_adc = round(time.time() - t0, 2)
        pt = {"mult": k, "vectors": n_emb * k, "kmeans_s": t_km,
              "assigned": n_asg, "docs": n_docs * k,
              "token_budget_s": t_tb, "selected": n_sel,
              "pq_encode_s": t_pq, "pq_rows": n_pq,
              "pq_adc_s": t_adc, "adc_rows": n_adc}
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)
        e.unpersist(); d.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
