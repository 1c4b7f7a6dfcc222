"""Measure the remote-write wire-codec split: encode vs decode vs
snappy, per sample, driver-side (no Spark) — guide §1 "measure first"
for r13 verdict item 8 (varint codec vectorization).

Also serves as the byte-for-byte pin when the codec internals change:
it asserts encode(decode(encode(x))) == encode(x) and compares against
the frozen reference implementation if one is importable.

Usage: python scripts/ab_remote_write_codec.py [n_series] [n_samples]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filodb_spark.remote_read import snappy_compress, snappy_decompress
from filodb_spark.remote_write import (decode_write_request,
                                       encode_write_request)


def main():
    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    t0 = 1_700_000_000_000
    series = []
    for s in range(n_series):
        labels = {"__name__": f"metric_{s % 7}", "instance": str(s),
                  "_ws_": "demo"}
        samples = [(t0 + i * 10_000, 50.0 + (s * 7 + i) % 13 / 6.5)
                   for i in range(n_samples)]
        series.append((labels, samples))
    n_total = n_series * n_samples

    for trial in range(3):
        t = time.perf_counter()
        raw = encode_write_request(series)
        t_enc = time.perf_counter() - t

        t = time.perf_counter()
        comp = snappy_compress(raw)
        t_sc = time.perf_counter() - t

        t = time.perf_counter()
        raw2 = snappy_decompress(comp)
        t_sd = time.perf_counter() - t
        assert raw2 == raw

        t = time.perf_counter()
        dec = decode_write_request(raw2)
        t_dec = time.perf_counter() - t

        # round-trip equality: the decode must reproduce the source
        assert [(l, s) for l, s in dec] == \
               [(l, [(int(ts), float(v)) for ts, v in ss])
                for l, ss in series]
        # byte determinism: re-encode of the decode is identical
        assert encode_write_request(dec) == raw

        print(f"trial {trial}: n={n_total} samples, {len(raw)} raw B, "
              f"{len(comp)} snappy B | encode {t_enc:.3f}s "
              f"({n_total / t_enc / 1e6:.2f} M/s) | "
              f"snappy_c {t_sc:.3f}s | snappy_d {t_sd:.3f}s | "
              f"decode {t_dec:.3f}s ({n_total / t_dec / 1e6:.2f} M/s)")


if __name__ == "__main__":
    main()
