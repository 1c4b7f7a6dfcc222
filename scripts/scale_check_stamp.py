"""Scale probe: write-time schema stamps vs existence probes for
per-metric DS routing (r12 — VERDICT r11 item 1).

ds_schema_of on an index-less dual mount resolves a metric by probing
each DS table's labels MAP column — no parquet row-group stats, so an
ABSENT metric costs a full scan of the column per table (present ones
exit on first match). The write-time stamp (_ds_schema.json, written
by retention_ladder / refresh_ds_schema_stamp) replaces that with a
driver-side set lookup. This probe measures both, on ON-DISK parquet
DS tables (the production shape), across a size sweep:

  probed_absent_s : first-seen absent metric, probe path (the scan)
  stamped_absent_s: same resolution on a stamped mount
  probed_hit_s    : first-seen PRESENT metric, probe path
  stamped_hit_s   : same on the stamped mount

Usage: python scripts/scale_check_stamp.py [n_series] [base_rows]
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.session import get_spark

N_SERIES = int(sys.argv[1]) if len(sys.argv) > 1 else 200
BASE = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
MIN = 60_000
T0 = 1_704_067_200_000


def main():
    from pyspark.sql import functions as F

    from filodb_spark.promql.compiler import TsStore
    spark = get_spark("scale-stamp", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stamp_probe_")
    print(f"{'ds_rows':>10} {'probed_absent_s':>15} {'stamped_absent_s':>16} "
          f"{'probed_hit_s':>12} {'stamped_hit_s':>13}")
    try:
        for mult in (1, 4, 16):
            per = BASE * mult
            n = N_SERIES * per
            # DS-shaped rows: labels map with a metric per series group
            base = spark.range(n).select(
                (F.col("id") % N_SERIES).alias("s"),
                (T0 + (F.col("id") / N_SERIES).cast("long") * MIN)
                .alias("ts"),
                (F.col("id") % 9973).cast("double").alias("value"))
            mk = lambda name: F.create_map(
                F.lit("__name__"), F.lit(name),
                F.lit("et"), F.concat(F.lit("s"), F.col("s")))
            gp, cp = f"{work}/g{mult}", f"{work}/c{mult}"
            base.select(mk("g").alias("labels"), "ts", "value") \
                .write.parquet(gp)
            base.select(mk("ctr").alias("labels"), "ts", "value") \
                .write.parquet(cp)
            raw = spark.createDataFrame(
                [], "labels map<string,string>, ts long, value double")
            store = TsStore(raw,
                            ds_df=spark.read.parquet(gp),
                            ds_counter_df=spark.read.parquet(cp),
                            raw_retention_start_ms=T0 + per * MIN,
                            ds_resolution_ms=5 * MIN)
            stamped = dataclasses.replace(
                store, ds_gauge_metrics=frozenset({"g"}),
                ds_counter_metrics=frozenset({"ctr"}))

            def t(st, metric):
                t0 = time.monotonic()
                st.ds_schema_of(metric)
                return time.monotonic() - t0

            pa = t(store, f"absent_{mult}")      # first-seen: the scan
            sa = t(stamped, f"absent2_{mult}")
            ph = t(store, "ctr")
            sh = t(stamped, "ctr")
            print(f"{2 * n:>10} {pa:>15.3f} {sa:>16.6f} "
                  f"{ph:>12.3f} {sh:>13.6f}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
