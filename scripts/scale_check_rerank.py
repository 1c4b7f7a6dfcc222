"""Scale probe: the full production ANN pipeline — trained coarse
buckets -> prebuilt PQ index -> broadcast-table ADC LUT -> exact
re-rank — measured across corpus sizes at production codebook shape
(m=8, n_codes=256, 64 buckets, probes=4, rerank_k=200).

What should scale how:
- index build (encode): map-only, ~linear in corpus (plus a fixed
  ~1 min codegen constant for the literal argmin encode expression);
- ADC search: candidates/query = (p/n_buckets) x n — linear in corpus
  but it's the cheap stage (m int lookups per candidate, codes-only
  shuffle);
- re-rank: |Q| x rerank_k exact distances — CONSTANT in corpus size;
- recall@10: roughly stable (coverage fraction is scale-free).

Centroids and PQ codebook are fit ONCE on the smallest corpus prefix
(deterministic lowest-id rows) and reused at every scale — the
sample-fit production pattern (model state is k x dim driver floats).

Usage: python scripts/scale_check_rerank.py [sizes...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prodshape_ivfpq import DIM, synth_corpus  # noqa: E402  (same corpus)

M, N_CODES, N_BUCKETS = 8, 256, 64
PROBES, RERANK_K, K, N_QUERIES = 4, 200, 10, 16


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [8_000, 64_000, 256_000]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators import similarity as sim

    spark = filodb_spark.get_spark("scale-rerank", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = synth_corpus(max(sizes))
    fit_df = spark.createDataFrame(
        base[: min(sizes)], "vec_id long, embedding array<double>") \
        .localCheckpoint(eager=True)
    cents = sim.kmeans_fit_portable(fit_df, k=N_BUCKETS, iterations=3)
    codebook = fit_df.where(F.col("vec_id") < N_CODES)

    rows = []
    for n in sizes:
        corpus = spark.createDataFrame(
            base[:n], "vec_id long, embedding array<double>") \
            .repartition(32).localCheckpoint(eager=True)
        q = corpus.where(F.col("vec_id") < N_QUERIES)
        t0 = time.time()
        enc = sim.ivfpq_kmeans_index(corpus, cents, m=M, n_codes=N_CODES,
                                     codebook=codebook) \
            .localCheckpoint(eager=True)
        t_index = time.time() - t0
        t0 = time.time()
        approx = sim.ivfpq_kmeans_topk(
            corpus, q, k=K, m=M, n_codes=N_CODES, n_buckets=N_BUCKETS,
            n_probes=PROBES, centroids=cents, codebook=codebook,
            index=enc, validate=False, lut="table", rerank_k=RERANK_K)
        got = approx.localCheckpoint(eager=True)
        t_search = time.time() - t0
        exact = sim.brute_force_topk_l2(corpus, q, k=K)
        rec = (sim.topk_recall(got, exact)
               .agg(F.avg("recall")).first()[0])
        row = {"n": n, "index_sec": round(t_index, 1),
               "search_sec": round(t_search, 1),
               "recall_at_10": round(rec, 4)}
        rows.append(row)
        print(json.dumps(row))

    print("\nn        index_s  search_s  recall@10")
    for r in rows:
        print(f"{r['n']:>8}  {r['index_sec']:>6}  {r['search_sec']:>7}"
              f"   {r['recall_at_10']}")


if __name__ == "__main__":
    main()
