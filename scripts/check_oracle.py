"""Local mimic of the driver's correctness gate: run each queries() entry
via Spark and its oracle_sql() via DuckDB, compare row count, schema
(column names), and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        if x == int(x) and abs(x) < 2**53:
            return int(x)
        return x
    return x


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=repr)
    return out


def approx_equal(a, b, rel=1e-9):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, (float, int)):
                if not math.isclose(x, float(y), rel_tol=rel, abs_tol=1e-12):
                    return False
            elif isinstance(y, float) and isinstance(x, (float, int)):
                if not math.isclose(float(x), y, rel_tol=rel, abs_tol=1e-12):
                    return False
            elif x != y:
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2:]

    import filodb_spark
    from filodb_spark.driver_queries import all_queries
    spark = filodb_spark.get_spark("oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    queries, oracles = all_queries()
    n_pass = n_fail = n_noora = 0
    for name, fn in queries.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"NOORA {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_noora += 1
            if len(srows) == 0:
                print(f"      WARNING: rows-only query returned 0 rows")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        sk, ok = rows_key(srows, scols), rows_key(orows, ocols)
        if sk == ok:
            print(f"PASS  {name}: rows={len(srows)} exact ({time.time()-t0:.1f}s)")
            n_pass += 1
        elif approx_equal(sk, ok):
            print(f"PASS~ {name}: rows={len(srows)} approx-only "
                  f"({time.time()-t0:.1f}s)  <-- value-hash would MISMATCH")
            n_fail += 1
        else:
            print(f"FAIL  {name}: rows spark={len(srows)} oracle={len(orows)}")
            for i, (x, y) in enumerate(zip(sk, ok)):
                if x != y:
                    print(f"      first diff row {i}:\n        spark={x}\n        duck ={y}")
                    break
            if len(sk) != len(ok):
                only_s = set(map(repr, sk)) - set(map(repr, ok))
                only_o = set(map(repr, ok)) - set(map(repr, sk))
                for s in list(only_s)[:2]:
                    print(f"      spark-only: {s}")
                for s in list(only_o)[:2]:
                    print(f"      duck-only : {s}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
