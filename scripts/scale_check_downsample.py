"""Scale probe: counter downsampling — output ratio and wall time vs
dip density and resolution.

The prom-counter downsampler is a dip-preserving ROW SUBSET
(streaming/downsample.downsample_counter; marker rules
DownsamplePeriodMarker.scala:100-141). Its 100-TB story rests on two
claims this probe measures:

1. **One shuffle.** The whole job is window functions over a single
   series-keyed Exchange (plan-asserted in
   tests/test_downsampler_main_spec.py::TestScaleShape) — wall time
   should scale with input rows, not dip density.
2. **Output ~ periods + dips, not samples.** The subset keeps one row
   per (series, period) plus 2 rows per dip (+ the series head), so
   the compression ratio at a 5m resolution on 10s scrapes is ~30x
   for well-behaved counters and degrades only with ACTUAL resets —
   the same storage behavior the reference's chunk downsampler has.

Sweeps dip probability at fixed size, and resolution at fixed dips,
printing rows_in -> rows_out (ratio) and wall seconds.

Usage: python scripts/scale_check_downsample.py [n_series] [per_series]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.session import get_spark
from filodb_spark.streaming.downsample import downsample_counter

N_SERIES = int(sys.argv[1]) if len(sys.argv) > 1 else 500
PER_SERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
SCRAPE_MS = 10_000


def build(spark, dip_p: float):
    rng = random.Random(7)
    rows = []
    for s in range(N_SERIES):
        v = 0.0
        for i in range(PER_SERIES):
            if rng.random() < dip_p:
                v = 0.0
            v += rng.uniform(0, 10)
            rows.append((f"s{s}", i * SCRAPE_MS, v))
    return spark.createDataFrame(
        rows, "series string, ts long, value double").cache()


def main():
    spark = get_spark("scale-check-downsample", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_in = N_SERIES * PER_SERIES
    print(f"# {N_SERIES} series x {PER_SERIES} samples = {n_in} rows, "
          f"scrape {SCRAPE_MS}ms")
    print("dip_p  res    rows_out   ratio   wall_s")
    for dip_p in (0.0, 0.001, 0.01, 0.1):
        df = build(spark, dip_p)
        df.count()
        for res in (300_000, 3_600_000):
            t0 = time.time()
            n_out = downsample_counter(df, ["series"], res).count()
            dt = time.time() - t0
            print(f"{dip_p:<6} {res // 60000:>3}m  {n_out:>9} "
                  f"{n_in / n_out:>7.1f}x  {dt:6.2f}")
        df.unpersist()


if __name__ == "__main__":
    main()
