"""Scaling probe for the analytical join path: replicate the two fact
tables (lineitem, orders) N times with shifted order keys — more orders,
same dimensions, the realistic fact-growth axis — and time a q5-shaped
query (fact-fact equi-join + broadcast dims + aggregation).

Linear-ish growth is the evidence that the join plan has no super-linear
term: the lineitem-orders join shuffles both sides on the order key
(partitioned hash join — scales with data per core), the dimension joins
stay broadcast (no growth in shuffle volume), and the final aggregation
is partial (map-side combine before the one small shuffle).

Usage: python scripts/scale_check_tpch.py [sf_dir] [multipliers...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 1_000_000_000


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    import filodb_spark
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    spark = filodb_spark.get_spark("scale-check-tpch")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")

    results = []
    for m in mults:
        # materialize replicated facts so the timed query reads a
        # realistic on-disk table; key shift preserves join cardinality
        # (each lineitem still matches exactly one order)
        tmp = tempfile.mkdtemp(prefix="scale_tpch_")
        ks = spark.range(m).select(F.col("id").alias("_k"))
        (li.crossJoin(ks)
           .withColumn("l_orderkey",
                       F.col("l_orderkey") + F.col("_k") * KEY_STRIDE)
           .drop("_k")
           .repartition(spark.sparkContext.defaultParallelism)
           .write.mode("overwrite").parquet(f"{tmp}/lineitem"))
        (od.crossJoin(ks)
           .withColumn("o_orderkey",
                       F.col("o_orderkey") + F.col("_k") * KEY_STRIDE)
           .drop("_k")
           .repartition(spark.sparkContext.defaultParallelism)
           .write.mode("overwrite").parquet(f"{tmp}/orders"))
        lt = spark.read.parquet(f"{tmp}/lineitem")
        ot = spark.read.parquet(f"{tmp}/orders")
        n = lt.count()

        def q5_shape(lt=lt, ot=ot):
            return (lt.join(ot, lt.l_orderkey == ot.o_orderkey)
                    .join(broadcast(cu), ot.o_custkey == cu.c_custkey)
                    .join(broadcast(na), cu.c_nationkey == na.n_nationkey)
                    .groupBy("n_name")
                    .agg(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))).alias("revenue")))

        q5_shape().count()          # warm: codegen + file listing
        t0 = time.time()
        rows = q5_shape().count()
        dt = time.time() - t0
        shutil.rmtree(tmp, ignore_errors=True)
        results.append({"mult": m, "lineitems": n, "out_rows": rows,
                        "q5_join_sec": round(dt, 2)})
        print(f"# x{m}: {n} lineitems -> {dt:.2f}s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
