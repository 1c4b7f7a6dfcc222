"""Scaling probe for the round-3 pipeline operators: segment_dedup and
pack_sequences on N-times-replicated documents.

Replication keeps per-replica text distinct (Caesar-rotated alphabet,
shifted ids — same scheme as scale_check_dedup), so segment_dedup's
within-corpus duplicate structure is constant per replica while corpus
size grows linearly. Linear-ish wall-clock growth is the evidence the
segment-hash window and the per-shard packing window hold at 100 TB;
super-linear growth would indicate hash skew or window-state blowup.
pack_sequences scales `shards` with the multiplier, mirroring how a
real deployment sizes shards to the cluster.

Usage: python scripts/scale_check_pipeline.py [sf_dir] [multipliers...]
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
    from pyspark.sql import functions as F
    from filodb_spark.operators.dedup import segment_dedup
    from filodb_spark.operators.pipeline import pack_sequences

    spark = filodb_spark.get_spark("scale-check-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    n_base = base.count()

    def replicate(k: int):
        # translate() takes literal alphabets -> one branch per replica,
        # unioned (k <= 26 distinct rotations)
        from functools import reduce
        src = "abcdefghijklmnopqrstuvwxyz"
        parts = []
        for i in range(k):
            rot = src[i:] + src[:i]
            parts.append(base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.translate(F.col("text"), src, rot).alias("text")))
        return reduce(lambda a, b: a.unionByName(b), parts)

    results = []
    for k in mults:
        df = replicate(k).localCheckpoint(eager=True)   # isolate gen cost
        t0 = time.time()
        sd = segment_dedup(df, seg_tokens=10)
        n_kept = sd.agg(F.sum("n_kept")).first()[0]
        t_seg = time.time() - t0
        t0 = time.time()
        ps = pack_sequences(df, budget=256, shards=8 * k)
        n_pieces = ps.count()
        t_pack = time.time() - t0
        df.unpersist()
        results.append({"mult": k, "docs": n_base * k,
                        "segment_dedup_s": round(t_seg, 2),
                        "kept_segments": int(n_kept),
                        "pack_s": round(t_pack, 2),
                        "pieces": n_pieces})
        print(json.dumps(results[-1]))
    print(json.dumps({"probe": "pipeline_ops", "results": results}))


if __name__ == "__main__":
    main()
