"""Interleaved A/B: tpch_q5 r12 chained-dim form vs r13 pre-joined snr
form (VERDICT r13 item 5 — the driver measured the touched q5 13.5%
slower on a cold heavily-degraded box while the builder's interleaved
A/B said -22%; settle it with a same-process interleaved median).

Usage: python scripts/ab_tpch_q5.py [--sf /root/testdata/sf0.1] [--runs 7]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q5_r12(spark, sf_dir):
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01")))
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), (l.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("revenue"))
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=7)
    args = ap.parse_args()

    import filodb_spark
    from filodb_spark.driver_queries.tpch import q_tpch_q5 as q5_r13
    spark = filodb_spark.get_spark("ab-tpch-q5")
    spark.sparkContext.setLogLevel("ERROR")

    old_rows = sorted(map(tuple, q5_r12(spark, args.sf).collect()))
    new_rows = sorted(map(tuple, q5_r13(spark, args.sf).collect()))
    assert old_rows == new_rows, (old_rows, new_rows)
    print(f"# equality OK: {len(old_rows)} rows")

    arms = {"r12-chained": q5_r12, "r13-prejoin": q5_r13}
    for fn in arms.values():        # warm both arms
        fn(spark, args.sf).count()
    times = {k: [] for k in arms}
    for _ in range(args.runs):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab_q5:{name}")
            t0 = time.time()
            fn(spark, args.sf).count()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s "
              f"all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
