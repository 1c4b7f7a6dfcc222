"""Anchor-normalized bench comparison (VERDICT r11 item 6).

Raw BENCH_r*.json totals track the box's memory-bandwidth phases
(calibration anchors swing 3.7-7.7 GB/s), so cross-round deltas of
raw seconds mostly measure the environment. This prints per-query
ratios NEW/OLD both raw and anchor-normalized:

    norm_ratio = (new_sec * new_gbps) / (old_sec * old_gbps)

i.e. each query's wall is first scaled by its run's own measured
memory bandwidth (scan-heavy queries track that anchor ~linearly —
the r10/r11 cross-check), so a norm_ratio near 1.0 means "no code
delta" even across phases. CPU-bound queries (ann_bruteforce,
ts_join_ratio historically) are flat in raw seconds regardless; read
those raw. Neither number is trustworthy when either artifact says
heavily-degraded AND the anchors moved mid-run (calibration_start vs
_end disagree badly).

Usage: python scripts/bench_compare.py BENCH_rA.json BENCH_rB.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    d = d.get("parsed", d)
    anchors = [a.get("mem_gbps") for a in
               (d.get("calibration_start"), d.get("calibration_end"))
               if a]
    d["_gbps"] = min(anchors) if anchors else None
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    og, ng = old["_gbps"], new["_gbps"]
    print(f"old: {old['value']}s  gbps={og}  "
          f"verdict={old.get('env_verdict', '?')}")
    print(f"new: {new['value']}s  gbps={ng}  "
          f"verdict={new.get('env_verdict', '?')}")
    norm_note = "" if og and ng else " (anchors missing: raw only)"
    print(f"{'query':24s} {'old_s':>7} {'new_s':>7} {'raw':>6} "
          f"{'norm':>6}{norm_note}")
    total_o = total_n = 0.0
    for q in old["queries"]:
        if q not in new["queries"]:
            continue
        o, n = old["queries"][q], new["queries"][q]
        total_o += o
        total_n += n
        raw = n / o if o else float("nan")
        norm = (n * ng) / (o * og) if (og and ng and o) else float("nan")
        print(f"{q:24s} {o:>7.3f} {n:>7.3f} {raw:>6.2f} {norm:>6.2f}")
    raw = total_n / total_o if total_o else float("nan")
    norm = (total_n * ng) / (total_o * og) if (og and ng) else float("nan")
    print(f"{'TOTAL (common)':24s} {total_o:>7.2f} {total_n:>7.2f} "
          f"{raw:>6.2f} {norm:>6.2f}")


if __name__ == "__main__":
    main()
