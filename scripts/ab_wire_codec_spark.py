"""Interleaved Spark-level A/B for the r14 vectorized remote-write
codec: alternates the OLD (scalar varint loops, r13 tree) and NEW
(numpy-vectorized) filodb_spark/remote_write.py between processes —
the codec runs inside mapInPandas Python workers, which import the
module from disk, so a driver-side monkeypatch cannot A/B it.

Usage:
  python scripts/ab_wire_codec_spark.py swap-old <ref>   # writes the old file
  python scripts/ab_wire_codec_spark.py restore          # git checkout -- the file
  python scripts/ab_wire_codec_spark.py time [sf_dir]    # one timing process

Orchestrate with the shell loop in OPTIMIZATION_r14.md §10 (alternating
arms, medians over >=3 process rounds each).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
MOD = os.path.join(REPO, "filodb_spark", "remote_write.py")


def time_arm(sf_dir: str):
    import filodb_spark
    from filodb_spark.driver_queries import all_queries
    spark = filodb_spark.get_spark("ab-wire-codec")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = all_queries()
    out = {}
    for name in ("ts_remote_write_roundtrip", "ts_export_remote_write"):
        fn = queries[name]
        def act():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        act(); act()                      # warm: codegen + worker spin-up
        ts = []
        for _ in range(3):
            t0 = time.time()
            act()
            ts.append(time.time() - t0)
        out[name] = {"median": round(statistics.median(ts), 3),
                     "min": round(min(ts), 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "swap-old":
        old = subprocess.run(
            ["git", "show", f"{sys.argv[2]}:filodb_spark/remote_write.py"],
            cwd=REPO, capture_output=True, text=True, check=True).stdout
        open(MOD, "w").write(old)
    elif cmd == "restore":
        subprocess.run(["git", "checkout", "--", MOD], cwd=REPO, check=True)
    elif cmd == "time":
        time_arm(sys.argv[2] if len(sys.argv) > 2 else
                 "/root/testdata/sf0.01")
    else:
        raise SystemExit(f"unknown {cmd}")
