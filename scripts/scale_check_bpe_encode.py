"""Scale probe: in-plan vs broadcast-dict BPE encoder (r13).

The claim behind bpe_encode_dict: the in-plan encoder bakes one fold
expression per merge into the plan, so per-row work is
O(merges x tokens) — right for the bounded tables the training loop
emits, a cliff at production vocabulary sizes (GPT-2: 50k merges).
The dict encoder ships the merge table as a broadcast rank dict into
one Arrow-batched Pandas UDF; per-word cost depends on word LENGTH,
not table size, so total work is O(tokens) and flat in the merge
count. This probe encodes the same corpus with both encoders across a
merge-count sweep and prints rows/s; the in-plan column should fall
roughly linearly with merges while the dict column stays flat.

Both encoders are row-equal by construction (the twin battery in
test_text_ops.TestBpe); this probe re-asserts total-subword equality
per cell as a cheap cross-check.

Usage: python scripts/scale_check_bpe_encode.py [sf_dir] [merge_counts...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.session import get_spark


def main():
    from pyspark.sql import functions as F

    from filodb_spark.operators.text import (bpe_encode, bpe_encode_dict,
                                             bpe_learn_merges)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    counts = [int(a) for a in sys.argv[2:]] or [8, 32, 128]
    spark = get_spark("scale-bpe-encode", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").localCheckpoint()
    n = docs.count()
    t0 = time.monotonic()
    merges = bpe_learn_merges(docs, max(counts))
    print(f"trained {len(merges)} merges on {n} docs in "
          f"{time.monotonic() - t0:.1f}s")
    print(f"{'merges':>7} {'inplan_rows_s':>13} {'dict_rows_s':>12} "
          f"{'dict/inplan':>11}")
    for m in counts:
        table = merges[:m]
        try:
            t0 = time.monotonic()
            a = bpe_encode(docs, table) \
                .agg(F.sum("n_subwords")).first()[0]
            inplan = n / (time.monotonic() - t0)
        except Exception as e:
            # the cliff is not only slowness: past ~100 merges the
            # nested fold chain exceeds Catalyst's analyzer iteration
            # budget and the plan FAILS TO ANALYZE at default config
            a, inplan = None, None
            reason = type(e).__name__
        t0 = time.monotonic()
        b = bpe_encode_dict(docs, table) \
            .agg(F.sum("n_subwords")).first()[0]
        ddict = n / (time.monotonic() - t0)
        if inplan is None:
            print(f"{m:>7} {'FAIL:' + reason:>13} {ddict:>12.0f} "
                  f"{'inf':>11}", flush=True)
        else:
            assert a == b, (m, a, b)
            print(f"{m:>7} {inplan:>13.0f} {ddict:>12.0f} "
                  f"{ddict / inplan:>11.2f}", flush=True)


if __name__ == "__main__":
    main()
