"""Production-codebook-shape IVF x PQ study (r5 verdict item 5).

The gated fixture queries keep codebooks tiny (m=4, n_codes=4) so the
DuckDB oracle unrolls stay tractable; PERF.md documents that at that
shape recall saturates at the 4-symbol codebook ceiling and the probe
knob can go NON-monotone (kmeans p=2 < p=1). This script runs the SAME
portable pipeline at the shape a production deployment would use —
m=8 subspaces, n_codes=256 symbols, 64 trained coarse buckets — on a
synthesized clustered corpus, and records the recall/candidate-fraction
curve as the probe budget rises.

Expected (and measured — see PERF.md round-6 entry): with a 256-symbol
codebook the ADC layer stops being the ceiling and recall@10 rises
MONOTONICALLY with n_probes, tracking the candidate fraction
p/n_buckets, exactly the FAISS-style knob a production operator tunes.

Corpus: deterministic numpy (seed 7) isotropic gaussian in dim 16 —
a structureless blob is the regime where the probe knob is cleanly
visible: the trained coarse cells Voronoi-partition the blob, a
query's true top-10 straddle adjacent cells (coverage binds), and at
sub=dim/m=2 dims per subspace a 256-symbol codebook quantizes almost
exactly (ADC ranking ~= exact ranking). A first attempt used 40 dense
gaussian clusters of 500 points each — there recall was FLAT ~0.38 at
every probe budget because within a dense cluster the true top-10 are
nearly equidistant (pairwise gaps << PQ cell size), so ADC error, not
coverage, binds; that regime is recorded in PERF.md as the negative
control. Row order shuffled so the lowest-id PQ codebook seeds are
unbiased draws. No driver-state growth: centroid model is k x dim
floats, PQ codebook 256 rows.

Usage: python scripts/prodshape_ivfpq.py [n_corpus] [probes...]
Prints one JSON line per probe budget, then a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16
M = 8
N_CODES = 256
N_BUCKETS = 64
N_QUERIES = 32
K = 10


def synth_corpus(n: int):
    import numpy as np
    rng = np.random.default_rng(7)
    vecs = rng.normal(0.0, 1.0, size=(n, DIM))
    return [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lut = "literal"
    rerank_k = None
    for a in sys.argv[1:]:
        if a.startswith("--lut="):
            lut = a.split("=", 1)[1]
        if a.startswith("--rerank="):
            rerank_k = int(a.split("=", 1)[1])
    n = int(args[0]) if args else 20_000
    probes = [int(p) for p in args[1:]] or [1, 2, 4, 8, 16]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators import similarity as sim

    spark = filodb_spark.get_spark("prodshape-ivfpq", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.createDataFrame(
        synth_corpus(n), "vec_id long, embedding array<double>") \
        .repartition(32).localCheckpoint(eager=True)
    q = corpus.where(F.col("vec_id") < N_QUERIES)

    t0 = time.time()
    exact = sim.brute_force_topk_l2(corpus, q, k=K) \
        .localCheckpoint(eager=True)
    t_exact = time.time() - t0

    t0 = time.time()
    cents = sim.kmeans_fit_portable(corpus, k=N_BUCKETS, iterations=3)
    t_fit = time.time() - t0

    # Build the trained-bucket index ONCE (the write-once artifact —
    # at this codebook shape the encode is also the expression-compile-
    # heavy stage, ~1 min of codegen regardless of corpus size, so
    # per-search re-encode would swamp the study; production amortizes
    # it the same way via ivfpq_write_index)
    t0 = time.time()
    enc = sim.ivfpq_kmeans_index(corpus, cents, m=M, n_codes=N_CODES) \
        .localCheckpoint(eager=True)
    t_enc = time.time() - t0
    print(f"# corpus={n} dim={DIM} m={M} n_codes={N_CODES} "
          f"buckets={N_BUCKETS}  exact={t_exact:.1f}s fit={t_fit:.1f}s "
          f"encode={t_enc:.1f}s (one-time)", file=sys.stderr)

    # candidate fractions from the bucket-size histogram x each query's
    # probe list — no second ADC pass needed
    sizes = {r["_bucket"]: r["c"] for r in
             enc.groupBy("_bucket").agg(F.count(F.lit(1)).alias("c"))
                .collect()}
    max_p = max(probes)
    probe_lists = {r["qid"]: r["pl"] for r in q.select(
        F.col("vec_id").alias("qid"),
        sim.kmeans_probe_col(cents, "embedding", max_p).alias("pl"))
        .collect()}

    rows = []
    for p in probes:
        cand = sum(sizes.get(b, 0) for pl in probe_lists.values()
                   for b in pl[:p])
        t0 = time.time()
        approx = sim.ivfpq_kmeans_topk(
            corpus, q, k=K, m=M, n_codes=N_CODES, n_buckets=N_BUCKETS,
            n_probes=p, centroids=cents, index=enc,
            validate=(p == probes[0]), lut=lut, rerank_k=rerank_k)
        rec = (sim.topk_recall(approx, exact)
               .agg(F.avg("recall")).first()[0])
        dt = time.time() - t0
        row = {"n_probes": p, "lut": lut, "rerank_k": rerank_k,
               "theory_fraction": round(p / N_BUCKETS, 4),
               "cand_fraction": round(cand / (N_QUERIES * n), 4),
               "mean_recall_at_10": round(rec, 4),
               "search_sec": round(dt, 1)}
        rows.append(row)
        print(json.dumps(row))

    print("\nprobes  theory  measured  recall@10  sec")
    for r in rows:
        print(f"{r['n_probes']:>6}  {r['theory_fraction']:.4f}  "
              f"{r['cand_fraction']:.4f}    {r['mean_recall_at_10']:.4f} "
              f"  {r['search_sec']}")
    mono = all(rows[i]["mean_recall_at_10"] <= rows[i + 1]["mean_recall_at_10"]
               for i in range(len(rows) - 1))
    print(f"\nrecall monotone in n_probes: {mono}")


if __name__ == "__main__":
    main()
