"""Recall lift of trained (k-means) coarse buckets over sign-hash
buckets in the composed IVF x PQ index (r4 verdict item 2), compared
AT EQUAL CANDIDATE FRACTION.

For each probe budget, runs both variants against the exact
squared-L2 top-3 baseline and reports, per variant:

- measured candidate fraction: the share of the corpus each query
  actually ADC-scored (bucket sizes are data-dependent, so the
  fraction is measured, not assumed)
- mean recall@3

Sign-hash has 64 buckets; k-means is fit with 16 (both map-only
assignment at search time), so sign-hash probes 4p buckets where
k-means probes p — the theoretical fraction p/16 matches on both
sides and the lift is attributable to bucket QUALITY, not budget.

Usage: python scripts/recall_lift_ivfpq_kmeans.py [sf_dir]
Prints one JSON line per (variant, probes) and a summary table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KM_BUCKETS = 16
# (kmeans probes, sign-hash probes): p/16 vs p'/64 — equal fraction at
# (1, 4); sign-hash XOR probing caps at 7 (identity + one flip per
# bit), so the second pair gives sign-hash a slightly SMALLER budget
# (0.109 vs 0.125 theoretical) — measured fractions are reported.
PAIRS = [(1, 4), (2, 7)]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators import similarity as sim

    spark = filodb_spark.get_spark("recall-lift-ivfpq", shuffle_partitions=16)
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    q = e.where(F.col("vec_id") < 10)
    n_q = q.count()
    exact = sim.brute_force_topk_l2(e, q, k=3).localCheckpoint(eager=True)
    cents = sim.kmeans_fit_portable(e, k=KM_BUCKETS, iterations=2)

    def fraction(approx_pairs_df):
        # candidates actually scored per query / corpus size
        c = approx_pairs_df.agg(F.count(F.lit(1))).first()[0]
        return c / (n_q * n)

    def run(label, topk_df, cand_df):
        rec = (sim.topk_recall(topk_df, exact)
               .agg(F.avg("recall")).first()[0])
        row = {"variant": label, "corpus": n, "queries": n_q,
               "cand_fraction": round(fraction(cand_df), 4),
               "mean_recall_at_3": round(rec, 4)}
        print(json.dumps(row))
        return row

    rows = []
    for km_p, sh_p in PAIRS:
        # candidate counts: re-run the join side without the top-k cut
        km = sim.ivfpq_kmeans_topk(e, q, k=3, n_buckets=KM_BUCKETS,
                                   n_probes=km_p, centroids=cents)
        km_cand = sim.ivfpq_kmeans_topk(e, q, k=10 ** 9,
                                        n_buckets=KM_BUCKETS,
                                        n_probes=km_p, centroids=cents)
        rows.append(run(f"kmeans16 p={km_p}", km, km_cand))
        sh = sim.ivfpq_topk(e, q, k=3, n_probes=sh_p)
        sh_cand = sim.ivfpq_topk(e, q, k=10 ** 9, n_probes=sh_p)
        rows.append(run(f"signhash64 p={sh_p}", sh, sh_cand))

    print("\nvariant            fraction  recall@3")
    for r in rows:
        print(f"{r['variant']:<18} {r['cand_fraction']:<9} "
              f"{r['mean_recall_at_3']}")


if __name__ == "__main__":
    main()
